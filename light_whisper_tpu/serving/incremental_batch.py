"""Batched interim ticks: N dictation streams extend in ONE device program.

The reference serves one recording per process (``interim.rs:21-196`` drives
a single C++ session); the per-stream TPU generalization is
``serving/incremental.py`` (KV rollback + self-speculative draft). This
module batches that tick across streams: decode is weight-DMA bound, so N
sequential ticks pay N weight-stack reads per step while one batched tick
pays one (`decoder.forward_decode_batch` economics, measured 4.7× aggregate
throughput at B=8 — DEVNOTES round-3).

Shape constraints for one compiled program: every stream in a batch shares
the audio bucket (→ mel_frames/num_chunks) and cache capacity; segments pad
to the group max (inert end padding — decode overwrites stale K/V before
reading). :func:`tick_batch` groups compatible EXTENDING sessions through
one fused program (batched mel → batched encoder → batched segment prefill
with per-stream draft verification → batched greedy decode with per-stream
budgets), groups compatible FRESH sessions through one batched full prefill
that primes their KV sessions, and solos everything else (mismatched
buckets, clip-guard redos, capacity-overflow guards, batched-program
failures).
Results are greedy-exact: token-identical to running each stream's
``IncrementalTranscriber.transcribe_window`` sequentially (asserted in
``tests/test_incremental_batch.py``), up to the float-ULP tie caveat
documented in ``serving/incremental.py`` — batched and sequential programs
compute identical math in different reduction orders, so a near-tied
argmax can flip between them (visible with random test weights, vanishing
with trained checkpoints).
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional, Sequence

log = logging.getLogger(__name__)

# Batched ticks that raised and degraded to per-stream fallbacks — surfaced
# in server stats (``batched_tick_degrades``) so a persistent batched-program
# failure (every coalesced tick paying a failed attempt) is visible.
# ``last_degrade_error`` keeps the most recent cause (repr) for stats — the
# warning log may live in a data dir a test harness has already deleted.
degrade_count = 0
last_degrade_error: Optional[str] = None

import jax
import jax.numpy as jnp
import numpy as np

from light_whisper_tpu.audio import mel as wmel
from light_whisper_tpu.models.qwen3_asr import decoder as dec
from light_whisper_tpu.models.qwen3_asr.model import (
    _decode_greedy_batch,
    _round_up,
    as_device_audio,
    bucket_audio_samples,
)
from light_whisper_tpu.serving.incremental import (
    CLIP_MAX_EPS,
    DRAFT_TOKENS,
    SEGMENT_BUCKET,
    IncrementalTranscriber,
    cache_capacity_for,
)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_chunks", "mel_frames", "prefix_len", "seg_bucket"),
    donate_argnames=("caches",),
)
def _encode_prefill_segment_batch(
    cfg,
    encoder_params,
    decoder_params,
    waveforms,  # [B, bucket] f32/int16, zero-padded
    n_audio,  # [B] int32: total valid audio tokens per stream
    stable,  # [B] int32: audio tokens already resident per stream
    suffix_ids,  # [S] int32 (shared — same prompt template)
    draft_ids,  # [B, Db] int32
    n_draft,  # [B] int32
    caches,  # batched KVCache: k/v [B, L, Hkv, C, hd], pos [B] = prefix+stable
    num_chunks: int,
    mel_frames: int,
    prefix_len: int,
    seg_bucket: int,
):
    """Batched one-dispatch tick pre-decode with per-stream draft verification.

    The batched twin of ``incremental._encode_prefill_segment`` — identical
    per-stream math (mel → encoder → segment splice → rollback prefill →
    teacher-forced draft acceptance), with projections batched on the matmul
    row axis (``decoder.forward_prefill_batch``).
    """
    from light_whisper_tpu.audio.mel import _log_mel_with_max
    from light_whisper_tpu.models.qwen3_asr.encoder import encode_chunks_batch

    B = waveforms.shape[0]
    mel, clip_max = jax.vmap(lambda w: _log_mel_with_max(w, mel_frames))(waveforms)
    chunk = cfg.audio.chunk_frames
    mel = jnp.pad(mel, ((0, 0), (0, num_chunks * chunk - mel.shape[1]), (0, 0)))
    audio_embeds = encode_chunks_batch(
        cfg.audio, encoder_params, mel, n_audio, num_chunks
    )  # [B, A, D]

    S = suffix_ids.shape[0]
    Db = draft_ids.shape[1]
    seg_audio = n_audio - stable  # [B]
    first_index = seg_audio + S - 1  # [B]

    token_ids = jnp.concatenate(
        [jnp.broadcast_to(suffix_ids[None], (B, S)), draft_ids], axis=1
    ).astype(jnp.int32)  # [B, S+Db]
    token_embeds = jax.vmap(
        lambda ids: dec.embed_tokens(decoder_params, ids)
    )(token_ids).astype(cfg.decoder.dtype)

    idx = jnp.arange(seg_bucket)[None, :]  # [1, seg]
    audio_row = jnp.clip(stable[:, None] + idx, 0, audio_embeds.shape[1] - 1)
    token_row = jnp.clip(idx - seg_audio[:, None], 0, S + Db - 1)
    is_audio = idx < seg_audio[:, None]
    embeds = jnp.where(
        is_audio[..., None],
        jnp.take_along_axis(
            audio_embeds.astype(cfg.decoder.dtype), audio_row[..., None], axis=1
        ),
        jnp.take_along_axis(token_embeds, token_row[..., None], axis=1),
    )  # [B, seg, D]

    hidden, caches = dec.forward_prefill_batch(cfg.decoder, decoder_params, embeds, caches)

    # Per-stream draft verification on the (Db+1)-row window starting at
    # first_index — gathering the window BEFORE the vocab matmul keeps the
    # logits tensor at [B, Db+1, V] instead of [B, seg_bucket, V].
    win = jnp.clip(
        first_index[:, None] + jnp.arange(Db + 1)[None, :], 0, seg_bucket - 1
    )  # [B, Db+1]
    window_hidden = jnp.take_along_axis(hidden, win[..., None], axis=1)
    logits = dec.logits_for(cfg.decoder, decoder_params, window_hidden)
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, Db+1]

    first = preds[:, 0]
    expected = jnp.where(
        jnp.arange(Db)[None, :] == 0, first[:, None], preds[:, :Db]
    )  # [B, Db]: preds[:, i] predicts draft position i (window row i = first_index+i)
    match = (draft_ids == expected) & (jnp.arange(Db)[None, :] < n_draft[:, None])
    accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # [B]
    next_token = jnp.take_along_axis(
        preds, jnp.minimum(accepted, Db)[:, None], axis=1
    )[:, 0].astype(jnp.int32)
    return next_token, accepted, caches, clip_max


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_chunks", "mel_frames", "prefix_len", "bucket_len"),
    donate_argnames=("caches",),
)
def _encode_prefill_full_batch(
    cfg,
    encoder_params,
    decoder_params,
    waveforms,  # [B, bucket] f32/int16, zero-padded
    n_audio,  # [B] int32
    ids,  # [B, bucket_len] int32 full prompts (audio placeholders), end-padded
    last_index,  # [B] int32: true prompt length - 1
    caches,  # batched KVCache, pos must be zeros
    num_chunks: int,
    mel_frames: int,
    prefix_len: int,
    bucket_len: int,
):
    """Batched full pre-decode: the fresh-session twin of
    ``_encode_prefill_segment_batch`` (mirrors ``model._encode_and_prefill``
    per stream: mel → encoder → prompt splice → prefill → first argmax)."""
    from light_whisper_tpu.audio.mel import _log_mel_with_max
    from light_whisper_tpu.models.qwen3_asr.encoder import encode_chunks_batch

    B = waveforms.shape[0]
    mel, clip_max = jax.vmap(lambda w: _log_mel_with_max(w, mel_frames))(waveforms)
    chunk = cfg.audio.chunk_frames
    mel = jnp.pad(mel, ((0, 0), (0, num_chunks * chunk - mel.shape[1]), (0, 0)))
    audio_embeds = encode_chunks_batch(
        cfg.audio, encoder_params, mel, n_audio, num_chunks
    )  # [B, A, D]

    token_embeds = jax.vmap(
        lambda row: dec.embed_tokens(decoder_params, row)
    )(ids).astype(cfg.decoder.dtype)
    idx = jnp.arange(bucket_len)[None, :]
    audio_row = jnp.clip(idx - prefix_len, 0, audio_embeds.shape[1] - 1)
    is_audio = (idx >= prefix_len) & (idx < prefix_len + n_audio[:, None])
    embeds = jnp.where(
        is_audio[..., None],
        jnp.take_along_axis(
            audio_embeds.astype(cfg.decoder.dtype), audio_row[..., None], axis=1
        ),
        token_embeds,
    )

    hidden, caches = dec.forward_prefill_batch(cfg.decoder, decoder_params, embeds, caches)
    last_hidden = jnp.take_along_axis(
        hidden, last_index[:, None, None], axis=1
    )  # [B, 1, D]
    logits = dec.logits_for(cfg.decoder, decoder_params, last_hidden)[:, 0]
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return first, caches, clip_max


class _TickPlan:
    """Per-stream static/dynamic tick parameters (host-side)."""

    __slots__ = (
        "transcriber", "window", "window_start", "n_audio", "stable",
        "true_len", "draft", "bucket", "seg_bucket", "capacity",
    )

    def __init__(self, transcriber, window, window_start):
        model = transcriber.model
        self.transcriber = transcriber
        self.window = as_device_audio(np.asarray(window).reshape(-1))
        self.window_start = window_start
        self.n_audio = model._audio_tokens_for(len(self.window))
        self.stable = transcriber._stable_tokens
        prefix_len = len(model.prefix_ids)
        self.true_len = prefix_len + self.n_audio + len(model.suffix_ids)
        self.draft = transcriber._last_generated[:DRAFT_TOKENS]
        self.bucket = bucket_audio_samples(len(self.window))
        seg_true = (
            (self.n_audio - self.stable) + len(model.suffix_ids) + DRAFT_TOKENS
        )
        self.seg_bucket = _round_up(max(1, seg_true), SEGMENT_BUCKET)
        needed = self.true_len + DRAFT_TOKENS + transcriber.max_new_tokens
        # shared policy: must equal _ensure_cache's bucket for can_extend
        self.capacity = cache_capacity_for(needed)

    def can_extend(self) -> bool:
        t = self.transcriber
        return (
            t._cache is not None
            and t._cache_capacity == self.capacity
            and t._window_start == self.window_start
            and 0 <= self.stable <= self.n_audio
        )

    def group_key(self):
        # seg_bucket deliberately NOT in the key: the segment program
        # tolerates end padding (decode overwrites stale K/V before reading
        # — the same inert-padding contract the single-stream seg bucket
        # uses), so a group pads every stream to its max seg_bucket.
        t = self.transcriber
        return (
            id(t.model),  # one model (weights + prompt template) per program
            self.bucket,
            self.capacity,
            t.max_new_tokens,
            self.window.dtype.str,
        )

    # Fresh full prefills share a program per (audio bucket, capacity) —
    # the same compatibility tuple as extending ticks now that seg_bucket
    # is group-max-padded rather than keyed.
    fresh_key = group_key


def tick_batch(
    transcribers: Sequence[IncrementalTranscriber],
    windows: Sequence[np.ndarray],
    window_starts: Optional[Sequence[int]] = None,
):
    """Run one interim tick for each (transcriber, window) pair.

    Compatible extending sessions (same audio bucket / segment bucket /
    cache capacity / decode budget) batch into one device program; the rest
    run the per-stream path. Output order matches input order; results are
    token-identical to sequential per-stream ticks.
    """
    if window_starts is None:
        window_starts = [0] * len(transcribers)
    results: List = [None] * len(transcribers)
    plans: List[_TickPlan] = []
    solo: List[int] = []
    groups: dict = {}
    fresh_groups: dict = {}
    for i, (t, w, ws) in enumerate(zip(transcribers, windows, window_starts)):
        plan = _TickPlan(t, w, ws)
        plans.append(plan)
        if plan.can_extend():
            groups.setdefault(plan.group_key(), []).append(i)
        else:
            fresh_groups.setdefault(plan.fresh_key(), []).append(i)

    max_b = _max_group()

    def _run_chunks(members: List[int], runner) -> None:
        for c0 in range(0, len(members), max_b):
            chunk = members[c0 : c0 + max_b]
            if len(chunk) == 1:
                solo.extend(chunk)
                continue
            try:
                batch_results = runner([plans[i] for i in chunk])
            except Exception as exc:
                # A batched-program failure must not fail every coalesced
                # request: sessions are untouched on failure (the runners
                # work on stacked cache COPIES and apply session state in a
                # non-fallible pass after all device work), so degrading to
                # the per-stream path keeps each stream's cheap extending
                # tick — a genuinely broken request fails alone there.
                global degrade_count, last_degrade_error
                degrade_count += 1
                last_degrade_error = repr(exc)
                log.warning(
                    "batched tick failed; degrading %d streams to per-stream",
                    len(chunk),
                    exc_info=True,
                )
                solo.extend(chunk)
                continue
            for i, r in zip(chunk, batch_results):
                if r is None:  # clip-guard redo → per-stream full prefill
                    solo.append(i)
                else:
                    results[i] = r

    for members in groups.values():
        if len(members) == 1:
            solo.extend(members)
        else:
            _run_chunks(members, _run_group)
    for members in fresh_groups.values():
        if len(members) == 1:
            solo.extend(members)
        else:
            _run_chunks(members, _run_group_fresh)

    for i in solo:
        p = plans[i]
        # Isolate per-stream failures: one broken request must fail ALONE.
        # Without this, a raise here discards the already-applied batched
        # results of every other coalesced stream (their sessions advanced
        # in the runner's apply pass) and fails all their wire requests.
        # The exception travels positionally; the waiter re-raises it.
        try:
            results[i] = p.transcriber.transcribe_window(p.window, p.window_start)
        except Exception as exc:
            results[i] = exc
    return results


def _max_group() -> int:
    # Respect an operator bound of 1 (LWT_MAX_DECODE_BATCH=1 means "never
    # stack KV caches"): chunks of one route solo, no batched programs.
    from light_whisper_tpu.models.qwen3_asr.model import max_decode_batch

    return max(1, max_decode_batch())


def _bucket_b(n: int) -> int:
    """Pad group size to a power of two: every distinct B is a fresh XLA
    program (minutes through a remote-compile relay), while a padded row
    costs ≤2× compute on a step batching already amortizes — the same
    static-shape policy as audio/prompt/batch-decode buckets. Capped at
    the operator's batch bound: each padded row stacks a full per-stream
    KV cache (~117 MB at 1.7B)."""
    b = 2
    while b < n:
        b *= 2
    return min(b, _max_group())


def _run_group_fresh(plans: List[_TickPlan]):
    """One batched FULL prefill + decode for ≥2 fresh sessions.

    N dictations starting together (or clip-guard redos) prime their KV
    sessions in one device program instead of N sequential full ticks —
    same state handoff as the per-stream fresh branch, so subsequent ticks
    ride the extending path either way."""
    t0 = plans[0].transcriber
    model = t0.model
    cfg = model.config
    prefix_len = len(model.prefix_ids)
    B = len(plans)
    pad_b = _bucket_b(B)
    bucket = plans[0].bucket
    capacity = plans[0].capacity
    max_new = t0.max_new_tokens

    mel_frames = wmel.num_mel_frames(bucket)
    chunk = cfg.audio.chunk_frames
    num_chunks = max(1, (mel_frames + chunk - 1) // chunk)
    bucket_len = _round_up(max(p.true_len for p in plans), SEGMENT_BUCKET)

    rows = plans + [plans[0]] * (pad_b - B)
    waveforms = np.zeros((pad_b, bucket), dtype=plans[0].window.dtype)
    n_audio = np.empty(pad_b, np.int32)
    ids = np.full((pad_b, bucket_len), cfg.pad_token_id, np.int32)
    last_index = np.empty(pad_b, np.int32)
    for b, p in enumerate(rows):
        waveforms[b, : len(p.window)] = p.window
        n_audio[b] = p.n_audio
        ids[b, :prefix_len] = model.prefix_ids
        ids[b, prefix_len : prefix_len + p.n_audio] = cfg.audio_token_id
        ids[b, prefix_len + p.n_audio : p.true_len] = model.suffix_ids
        last_index[b] = p.true_len - 1

    caches = jax.vmap(
        lambda _: dec.init_cache(cfg.decoder, capacity, model.cache_dtype)
    )(jnp.arange(pad_b))

    first, caches, clip_dev = _encode_prefill_full_batch(
        cfg,
        model.encoder_params,
        model.decoder_params,
        jnp.asarray(waveforms),
        jnp.asarray(n_audio),
        jnp.asarray(ids),
        jnp.asarray(last_index),
        caches,
        num_chunks,
        mel_frames,
        prefix_len,
        bucket_len,
    )
    true_lens = jnp.asarray(np.asarray([p.true_len for p in rows], np.int32))
    caches = caches._replace(pos=true_lens)
    tokens, caches = _decode_greedy_batch(
        cfg.decoder,
        model.decoder_params,
        first,
        caches,
        cfg.eos_token_id,
        max_new,
    )
    tokens_np, clip_np = jax.device_get((tokens, clip_dev))

    # Parse first (fallible), then apply session state (pure assignments) —
    # see _run_group: the degrade path relies on failures leaving sessions
    # untouched.
    staged = []
    for b, p in enumerate(plans):
        generated = [int(tok) for tok in tokens_np[b] if tok >= 0]
        staged.append((generated, model._parse_output(generated)))

    results: List = []
    for b, (p, (generated, parsed)) in enumerate(zip(plans, staged)):
        t = p.transcriber
        t._cache = dec.KVCache(k=caches.k[b], v=caches.v[b], pos=caches.pos[b])
        t._cache_capacity = capacity
        # Invalidate the device-resident audio buffer: this full prefill ran
        # from host arrays, and a stale buffer seeded under a DIFFERENT
        # window_start would otherwise satisfy the next solo tick's delta
        # path and splice two windows together.
        t._audio_dev = None
        t._sent = 0
        t.full_prefills += 1
        t._window_start = p.window_start
        t._clip_max = float(clip_np[b])  # anchored at full prefills
        t._stable_tokens = t._stable_boundary(len(p.window), p.n_audio)
        t._last_generated = generated
        results.append(parsed)
    return results


def _run_group(plans: List[_TickPlan]):
    """One batched tick for ≥2 compatible extending sessions.

    The device batch is padded to a power-of-two B by repeating stream 0's
    inputs against a DETACHED copy of its cache row (pad rows' writes and
    results are discarded)."""
    t0 = plans[0].transcriber
    model = t0.model
    cfg = model.config
    prefix_len = len(model.prefix_ids)
    bucket = plans[0].bucket
    seg_bucket = max(p.seg_bucket for p in plans)
    capacity_cap = plans[0].capacity
    # Group-max padding safety: the segment prefill writes seg_bucket
    # positions from prefix+stable; a stream whose own segment is small but
    # whose stable prefix is deep could overflow its cache under another
    # stream's larger seg_bucket — solo those (None → caller fallback).
    ok = [
        p
        for p in plans
        if prefix_len + p.stable + seg_bucket <= capacity_cap
    ]
    if len(ok) < 2:
        return [None] * len(plans)
    if len(ok) < len(plans):
        dropped = {id(p) for p in plans} - {id(p) for p in ok}
        inner = _run_group(ok)
        by_id = {id(p): r for p, r in zip(ok, inner)}
        return [None if id(p) in dropped else by_id[id(p)] for p in plans]

    B = len(plans)
    pad_b = _bucket_b(B)
    max_new = t0.max_new_tokens

    mel_frames = wmel.num_mel_frames(bucket)
    chunk = cfg.audio.chunk_frames
    num_chunks = max(1, (mel_frames + chunk - 1) // chunk)

    rows = plans + [plans[0]] * (pad_b - B)  # pad rows: discarded results
    waveforms = np.zeros((pad_b, bucket), dtype=plans[0].window.dtype)
    n_audio = np.empty(pad_b, np.int32)
    stable = np.empty(pad_b, np.int32)
    drafts = np.zeros((pad_b, DRAFT_TOKENS), np.int32)
    n_draft = np.empty(pad_b, np.int32)
    for b, p in enumerate(rows):
        waveforms[b, : len(p.window)] = p.window
        n_audio[b] = p.n_audio
        stable[b] = p.stable
        drafts[b, : len(p.draft)] = p.draft
        n_draft[b] = len(p.draft)

    caches = dec.KVCache(
        k=jnp.stack([p.transcriber._cache.k for p in rows]),
        v=jnp.stack([p.transcriber._cache.v for p in rows]),
        pos=jnp.asarray(prefix_len + stable),
    )

    first, accepted_dev, caches, clip_dev = _encode_prefill_segment_batch(
        cfg,
        model.encoder_params,
        model.decoder_params,
        jnp.asarray(waveforms),
        jnp.asarray(n_audio),
        jnp.asarray(stable),
        jnp.asarray(np.asarray(model.suffix_ids, dtype=np.int32)),
        jnp.asarray(drafts),
        jnp.asarray(n_draft),
        caches,
        num_chunks,
        mel_frames,
        prefix_len,
        seg_bucket,
    )
    true_lens = jnp.asarray(np.asarray([p.true_len for p in rows], np.int32))
    caches = caches._replace(pos=true_lens + accepted_dev.astype(jnp.int32))
    budgets = jnp.int32(max_new) - accepted_dev.astype(jnp.int32)
    tokens, caches = _decode_greedy_batch(
        cfg.decoder,
        model.decoder_params,
        first,
        caches,
        cfg.eos_token_id,
        max_new,
        budgets=budgets,
    )
    tokens_np, accepted_np, clip_np = jax.device_get(
        (tokens, accepted_dev, clip_dev)
    )

    # Pass 1 (fallible): parse every stream's outcome WITHOUT touching
    # session state, so an exception anywhere leaves all sessions intact
    # (the degrade path in tick_batch relies on this to keep cheap
    # extending fallbacks). Pass 2 (pure assignments) applies the state.
    staged = []
    for b, p in enumerate(plans):
        t = p.transcriber
        clip_max = float(clip_np[b])
        if t._clip_max is not None and clip_max > t._clip_max + CLIP_MAX_EPS:
            staged.append(None)
            continue
        accepted = int(accepted_np[b])
        generated = list(p.draft[:accepted]) + [
            int(tok) for tok in tokens_np[b] if tok >= 0
        ]
        staged.append((accepted, generated, model._parse_output(generated)))

    results: List = []
    for b, (p, s) in enumerate(zip(plans, staged)):
        t = p.transcriber
        if s is None:
            # Same deferred clip guard as the per-stream tick: the mel clamp
            # floor moved, cached KV is stale — redo this stream solo.
            t.clip_guard_prefills += 1
            t.reset()
            results.append(None)
            continue
        accepted, generated, parsed = s
        t._cache = dec.KVCache(
            k=caches.k[b], v=caches.v[b], pos=caches.pos[b]
        )
        t.incremental_prefills += 1
        t.draft_tokens_offered += len(p.draft)
        t.draft_tokens_accepted += accepted
        t._window_start = p.window_start
        t._stable_tokens = t._stable_boundary(len(p.window), p.n_audio)
        t._last_generated = generated
        results.append(parsed)
    return results
