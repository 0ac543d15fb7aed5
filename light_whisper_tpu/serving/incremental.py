"""Incremental streaming transcription with KV-prefix reuse.

The reference re-feeds the whole 12 s window to its C++ session every
interim tick (``interim.rs:21-196``); the persistent-KV win there is only
model residency. This module goes further, exploiting two structural facts
of the TPU build:

1. **audio tokens are append-only while the buffer fits the window** —
   ``StreamingSession`` aligns window starts to whole encoder chunks, so a
   growing recording never changes previously produced mel chunks;
2. **encoder attention windows are block-diagonal** — tokens inside a
   *complete* attention window group (``window_tokens`` post-conv frames)
   are final the moment the group fills and never change afterwards.

Per tick the decoder therefore rolls its KV cache back to
``prefix + stable_audio_tokens`` (position rollback is free — stale K/V
beyond ``pos`` are overwritten before they can be read) and prefills only
the unstable audio tail + suffix, instead of the whole prompt. When the
window starts sliding (buffer > 12 s) the prefix changes every tick and the
session transparently falls back to full prefill — the reference's behavior.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from light_whisper_tpu.audio import mel as wmel
from light_whisper_tpu.models.qwen3_asr import decoder as dec
from light_whisper_tpu.models.qwen3_asr.model import (
    Qwen3ASRModel,
    TranscriptionResult,
    _encode_and_prefill,
    _round_up,
    bucket_audio_samples,
)

SEGMENT_BUCKET = 64
INTERIM_MAX_NEW_TOKENS = 96
DRAFT_TOKENS = 64  # previous-tick transcript tokens verified per tick


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_chunks", "mel_frames", "prefix_len", "seg_bucket"),
    donate_argnames=("cache",),
)
def _encode_prefill_segment(
    cfg,
    encoder_params,
    decoder_params,
    waveform,  # [bucket] f32, zero-padded
    n_audio,  # int32: total valid audio tokens in the window
    stable,  # int32: audio tokens already resident in the cache
    suffix_ids,  # [S] int32
    draft_ids,  # [Db] int32: previous tick's transcript (speculative draft)
    n_draft,  # int32: valid draft tokens (0 disables verification)
    cache,  # pos must already equal prefix_len + stable
    num_chunks: int,
    mel_frames: int,
    prefix_len: int,
    seg_bucket: int,
):
    """One-dispatch incremental tick pre-decode with draft verification.

    mel → encoder → segment embeds (unstable audio tail + suffix + draft) →
    prefill from the rollback position → greedy acceptance of the draft.

    The draft is the *previous tick's* transcript: consecutive 12 s windows
    mostly share their text, and greedy decoding is deterministic, so
    verifying the whole draft in this single teacher-forced pass (one weights
    read) replaces most of the per-token decode loop while remaining
    **greedy-exact** — positions after the first mismatch are recomputed by
    the normal loop. Returns (next_token, accepted, cache); the caller sets
    ``cache.pos = true_len + accepted`` (stale K/V beyond it are overwritten
    by the decode loop before any read).

    Fusing one dispatch also matters on remote-attached TPUs where every
    dispatch pays tunnel latency.
    """
    from light_whisper_tpu.audio.mel import _log_mel_impl
    from light_whisper_tpu.models.qwen3_asr.encoder import encode_chunks

    mel = _log_mel_impl(waveform, mel_frames)
    chunk = cfg.audio.chunk_frames
    mel = jnp.pad(mel, ((0, num_chunks * chunk - mel.shape[0]), (0, 0)))
    audio_embeds = encode_chunks(cfg.audio, encoder_params, mel, n_audio, num_chunks)

    S = suffix_ids.shape[0]
    Db = draft_ids.shape[0]
    seg_audio = n_audio - stable
    first_index = seg_audio + S - 1  # logits here predict the first token

    token_ids = jnp.concatenate([suffix_ids, draft_ids]).astype(jnp.int32)
    token_embeds = dec.embed_tokens(decoder_params, token_ids).astype(jnp.bfloat16)

    idx = jnp.arange(seg_bucket)
    audio_row = jnp.clip(stable + idx, 0, audio_embeds.shape[0] - 1)
    token_row = jnp.clip(idx - seg_audio, 0, S + Db - 1)
    is_audio = idx < seg_audio
    embeds = jnp.where(
        is_audio[:, None],
        audio_embeds.astype(jnp.bfloat16)[audio_row],
        token_embeds[token_row],
    )

    hidden, cache = dec.forward(cfg.decoder, decoder_params, embeds, cache)
    logits = dec.logits_for(cfg.decoder, decoder_params, hidden)
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [seg_bucket]

    first = preds[first_index]
    # expected[i] for draft position i: first for i==0, else the model's
    # prediction at the previous draft position.
    draft_pos = first_index + 1 + jnp.arange(Db)
    expected = jnp.where(
        jnp.arange(Db) == 0, first, preds[jnp.clip(draft_pos - 1, 0, seg_bucket - 1)]
    )
    match = (draft_ids == expected) & (jnp.arange(Db) < n_draft)
    accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
    next_token = jnp.where(
        accepted == 0,
        first,
        preds[jnp.clip(first_index + accepted, 0, seg_bucket - 1)],
    ).astype(jnp.int32)
    return next_token, accepted, cache


class IncrementalTranscriber:
    """Streaming transcriber bound to one model + one persistent cache."""

    def __init__(self, model: Qwen3ASRModel, max_new_tokens: int = INTERIM_MAX_NEW_TOKENS):
        self.model = model
        self.max_new_tokens = max_new_tokens
        wt = model.config.audio.window_tokens
        self._window_tokens = wt
        self._cache: Optional[dec.KVCache] = None
        self._cache_capacity = 0
        self._window_start: Optional[int] = None
        self._stable_tokens = 0
        self._last_generated: list = []
        self.full_prefills = 0
        self.incremental_prefills = 0
        self.draft_tokens_offered = 0
        self.draft_tokens_accepted = 0

    # ------------------------------------------------------------------

    def reset(self) -> None:
        self._cache = None
        self._window_start = None
        self._stable_tokens = 0
        self._last_generated = []

    def _ensure_cache(self, needed: int) -> None:
        capacity = 512
        while capacity < needed:
            capacity *= 2
        if self._cache is None or self._cache_capacity < capacity:
            self._cache = dec.init_cache(
                self.model.config.decoder, capacity, self.model.cache_dtype
            )
            self._cache_capacity = capacity
            self._stable_tokens = -1  # force full prefill

    def transcribe_window(
        self, window: np.ndarray, window_start_sample: int = 0
    ) -> TranscriptionResult:
        try:
            return self._transcribe_window(window, window_start_sample)
        except Exception:
            # The cache buffers are donated into prefill/decode; an exception
            # mid-tick may leave them consumed. Drop the session state so the
            # next tick starts from a fresh cache instead of a dead buffer.
            self.reset()
            raise

    def _transcribe_window(
        self, window: np.ndarray, window_start_sample: int
    ) -> TranscriptionResult:
        model = self.model
        cfg = model.config
        window = np.asarray(window, dtype=np.float32).reshape(-1)

        bucket = bucket_audio_samples(len(window))
        padded = np.zeros(bucket, dtype=np.float32)
        padded[: len(window)] = window
        n_audio = model._audio_tokens_for(len(window))
        mel_frames = wmel.num_mel_frames(bucket)
        chunk = cfg.audio.chunk_frames
        num_chunks = max(1, (mel_frames + chunk - 1) // chunk)

        prefix_len = len(model.prefix_ids)
        suffix_len = len(model.suffix_ids)
        true_len = prefix_len + n_audio + suffix_len
        self._ensure_cache(true_len + DRAFT_TOKENS + self.max_new_tokens)

        can_extend = (
            self._window_start == window_start_sample
            and 0 <= self._stable_tokens <= n_audio
        )

        if not can_extend:
            # Full fused prefill of prefix + audio + suffix.
            bucket_len = _round_up(true_len, SEGMENT_BUCKET)
            ids = np.full(bucket_len, cfg.pad_token_id, dtype=np.int32)
            ids[:prefix_len] = model.prefix_ids
            ids[prefix_len : prefix_len + n_audio] = cfg.audio_token_id
            ids[prefix_len + n_audio : true_len] = model.suffix_ids
            cache = self._cache._replace(pos=jnp.int32(0))
            first, cache = _encode_and_prefill(
                cfg,
                model.encoder_params,
                model.decoder_params,
                jnp.asarray(padded),
                jnp.int32(n_audio),
                jnp.asarray(ids),
                jnp.int32(true_len - 1),
                cache,
                num_chunks,
                mel_frames,
                prefix_len,
            )
            self.full_prefills += 1
            accepted = 0
            draft: list = []
        else:
            # One fused dispatch: encode + tail-segment prefill from rollback,
            # with the previous tick's transcript verified as a draft.
            stable = self._stable_tokens
            draft = self._last_generated[:DRAFT_TOKENS]
            draft_padded = np.zeros(DRAFT_TOKENS, dtype=np.int32)
            draft_padded[: len(draft)] = draft
            seg_true = (n_audio - stable) + suffix_len + DRAFT_TOKENS
            seg_bucket = _round_up(max(1, seg_true), SEGMENT_BUCKET)
            cache = self._cache._replace(pos=jnp.int32(prefix_len + stable))
            first, accepted_dev, cache = _encode_prefill_segment(
                cfg,
                model.encoder_params,
                model.decoder_params,
                jnp.asarray(padded),
                jnp.int32(n_audio),
                jnp.int32(stable),
                jnp.asarray(np.asarray(model.suffix_ids, dtype=np.int32)),
                jnp.asarray(draft_padded),
                jnp.int32(len(draft)),
                cache,
                num_chunks,
                mel_frames,
                prefix_len,
                seg_bucket,
            )
            accepted = int(accepted_dev)
            self.incremental_prefills += 1
            self.draft_tokens_offered += len(draft)
            self.draft_tokens_accepted += accepted

        cache = cache._replace(pos=jnp.int32(true_len + accepted))
        tokens, count, cache = dec.decode_greedy(
            cfg.decoder,
            model.decoder_params,
            first,
            cache,
            cfg.eos_token_id,
            self.max_new_tokens,
            budget=jnp.int32(max(0, self.max_new_tokens - accepted)),
        )
        self._cache = cache
        self._window_start = window_start_sample
        # Tokens inside complete attention-window groups are final.
        self._stable_tokens = (n_audio // self._window_tokens) * self._window_tokens

        generated = list(draft[:accepted]) + [
            int(t) for t in np.asarray(tokens)[: int(count)]
        ]
        self._last_generated = generated
        return model._parse_output(generated)

    # StreamingSession duck-type: plain transcribe = full window, start 0.
    def transcribe(self, audio: np.ndarray) -> TranscriptionResult:
        return self.transcribe_window(audio, window_start_sample=0)
