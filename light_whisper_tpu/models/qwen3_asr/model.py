"""End-to-end Qwen3-ASR transcriber: audio → mel → encoder → decode → text.

This is the JAX replacement for transcribe.cpp's ``Model`` + ``Session``
objects (``qwen3_asr_server.py:114-133,318-321``): load once, keep the KV
cache resident, transcribe float32 16 kHz audio to text with greedy decoding.

Static-shape strategy (XLA compiles one program per shape):

- audio is bucketed in 0.5 s steps (then powers of two) before the mel
  frontend; the encoder runs on whole chunks with a valid-token count;
- the prompt is end-padded to a 64-token bucket; the final-position logits
  are gathered at the true last index (causality makes tail padding inert);
- the KV cache is allocated per power-of-two capacity bucket and reused
  across requests; greedy decoding is one on-device ``lax.while_loop``.

The prompt template comes from GGUF metadata (``tokenizer.chat_template``:
either an explicit ``{audio}``-placeholder string or a real artifact's
Jinja template — resolved by ``models/qwen3_asr/prompt.py``) so the engine
follows the artifact, not hardcoded strings.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import re
import threading
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

_log = logging.getLogger(__name__)

from light_whisper_tpu.audio import mel as wmel
from light_whisper_tpu.models.qwen3_asr import decoder as dec
from light_whisper_tpu.models.qwen3_asr.config import Qwen3ASRConfig
from light_whisper_tpu.models.qwen3_asr.encoder import encode as encode_audio
from light_whisper_tpu.models.qwen3_asr.loader import Qwen3ASRWeights
from light_whisper_tpu.models.qwen3_asr.prompt import (
    DEFAULT_TEMPLATE,
    resolve_prompt_ids,
)
PROMPT_BUCKET = 64
_LANG_TOKEN = re.compile(r"^<\|([a-z]{2,3}(?:-[a-z]+)?)\|>$")

SAMPLE_RATE = 16_000
_FINE_STEP = SAMPLE_RATE // 2
_FINE_MAX = 16 * SAMPLE_RATE


def bucket_audio_samples(n: int) -> int:
    if n <= _FINE_MAX:
        return max(_FINE_STEP, (n + _FINE_STEP - 1) // _FINE_STEP * _FINE_STEP)
    b = _FINE_MAX
    while b < n:
        b *= 2
    return b


def as_device_audio(audio: np.ndarray) -> np.ndarray:
    """Ship audio as int16 when it is exactly s16-representable.

    The engine's wire protocol is pcm_s16le (reference
    ``qwen3_asr_server.py:245-267``), so serving inputs are int16/32768.0
    floats; sending the int16 samples and scaling on device is bit-identical
    and halves host→device bytes — 36 → 6 ms for a 12 s window through the
    remote relay (scripts/exp_profile_rtf.py). Audio that is not exactly on
    the s16 grid (e.g. the engine's own 48 kHz linear resample, which the
    reference also keeps in float) stays float32 and rides the f32 program.
    ``LWT_AUDIO_INT16=0`` disables the fast path.
    """
    audio = np.asarray(audio)
    if audio.dtype == np.int16:
        return audio
    import os

    if os.environ.get("LWT_AUDIO_INT16", "1") in ("", "0"):
        return np.asarray(audio, dtype=np.float32)
    audio = audio.astype(np.float32, copy=False)
    scaled = audio * np.float32(32768.0)  # exact: power-of-two scale
    rounded = np.rint(scaled)
    if (
        audio.size == 0
        or (
            np.array_equal(scaled, rounded)
            and scaled.min() >= -32768.0
            and scaled.max() <= 32767.0
        )
    ):
        return rounded.astype(np.int16)
    return audio


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def max_decode_batch() -> int:
    """Operator bound on device decode batch size (``LWT_MAX_DECODE_BATCH``).

    KV memory scales with it (B × L × Hkv × C × hd × 2); malformed values
    fall back to the default rather than failing requests."""
    import os

    try:
        return max(1, int(os.environ.get("LWT_MAX_DECODE_BATCH", "8")))
    except ValueError:
        return 8


@dataclasses.dataclass
class TranscriptionResult:
    text: str
    language: str
    tokens: List[int]


@functools.partial(jax.jit, static_argnames=("prefix_len", "dtype"))
def _build_prompt_embeds(params, ids, audio_embeds, n_audio, prefix_len: int, dtype=jnp.bfloat16):
    """Token embeddings with audio rows spliced in at [prefix, prefix+n)."""
    token_embeds = dec.embed_tokens(params, ids).astype(dtype)
    idx = jnp.arange(ids.shape[0])
    audio_row = jnp.clip(idx - prefix_len, 0, audio_embeds.shape[0] - 1)
    is_audio = (idx >= prefix_len) & (idx < prefix_len + n_audio)
    return jnp.where(
        is_audio[:, None], audio_embeds.astype(dtype)[audio_row], token_embeds
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_chunks", "mel_frames", "prefix_len"),
    donate_argnames=("cache",),
)
def _encode_and_prefill(
    cfg,
    encoder_params,
    decoder_params,
    waveform,  # [bucket] f32, zero-padded
    n_audio,  # int32: valid audio tokens
    ids,  # [L_bucket] int32 prompt with audio placeholders, end-padded
    last_index,  # int32: true prompt length - 1
    cache,
    num_chunks: int,
    mel_frames: int,
    prefix_len: int,
):
    """Whole pre-decode pipeline in ONE dispatch: log-mel → AuT encoder →
    prompt embedding splice → decoder prefill → first-token argmax.

    Keeping this fused matters doubly on remote-attached TPUs, where every
    dispatch pays tunnel latency on top of the usual host sync.
    """
    from light_whisper_tpu.audio.mel import _log_mel_with_max
    from light_whisper_tpu.models.qwen3_asr.encoder import encode_chunks

    mel, clip_max = _log_mel_with_max(waveform, mel_frames)
    chunk = cfg.audio.chunk_frames
    mel = jnp.pad(mel, ((0, num_chunks * chunk - mel.shape[0]), (0, 0)))
    audio_embeds = encode_chunks(cfg.audio, encoder_params, mel, n_audio, num_chunks)

    embeds = _build_prompt_embeds(
        decoder_params, ids, audio_embeds, n_audio, prefix_len, cfg.decoder.dtype
    )
    hidden, cache = dec.forward(cfg.decoder, decoder_params, embeds, cache)
    logits = dec.logits_for(cfg.decoder, decoder_params, hidden[last_index][None])
    first = jnp.argmax(logits[-1]).astype(jnp.int32)
    # clip_max lets streaming callers detect when the mel clamp floor moved
    # (which silently changes every earlier frame — cached KV goes stale).
    return first, cache, clip_max


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("caches",))
def _prefill_batch(cfg, params, embeds, caches, last_indices):
    """vmapped prefill over a batch of equal-bucket prompts."""

    def one(e, c, idx):
        hidden, c = dec.forward(cfg, params, e, c)
        logits = dec.logits_for(cfg, params, hidden[idx][None])
        return jnp.argmax(logits[-1]).astype(jnp.int32), c

    return jax.vmap(one, in_axes=(0, 0, 0))(embeds, caches, last_indices)


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens"), donate_argnames=("caches",)
)
def _decode_greedy_batch(
    cfg, params, first_tokens, caches, eos_token_id, max_new_tokens, budgets=None
):
    """Batched greedy decode: all streams step together until every one has
    emitted EOS (or exhausted its budget). Finished streams keep stepping on
    dead positions — wasted FLOPs bounded by the batch's slowest stream,
    which is what hardware-efficient batched serving amortizes anyway.

    Each step runs :func:`decoder.forward_decode_batch`: the stream
    dimension rides the matmul ROW axis, so the Q8 weight stack (the
    dominant decode HBM traffic) is read once per step for the whole batch,
    not once per stream as a ``vmap`` of the single-stream forward would.

    ``budgets`` ([B] int32, optional) caps tokens per stream below the
    shared ``max_new_tokens`` — the batched-tick path passes
    ``max_new - accepted_draft`` per stream (speculative acceptance differs
    across streams). ``None`` traces the exact pre-budget program."""

    B = first_tokens.shape[0]

    def cond(state):
        _tokens, count, _cur, _caches, done = state
        return jnp.logical_and(count < max_new_tokens, jnp.logical_not(jnp.all(done)))

    def step(state):
        tokens, count, current, caches, done = state
        tokens = tokens.at[:, count].set(jnp.where(done, tokens[:, count], current))
        embeds = dec.embed_tokens(params, current)  # [B, D]
        hidden, caches = dec.forward_decode_batch(cfg, params, embeds, caches)
        logits = dec.logits_for(cfg, params, hidden)  # [B, V]
        next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        newly_done = next_tokens == eos_token_id
        if budgets is not None:
            newly_done = jnp.logical_or(newly_done, count + 1 >= budgets)
        return tokens, count + 1, next_tokens, caches, jnp.logical_or(done, newly_done)

    tokens0 = jnp.full((B, max_new_tokens), -1, dtype=jnp.int32)  # -1 = unused
    counts0 = jnp.int32(0)
    done0 = first_tokens == eos_token_id
    if budgets is not None:
        done0 = jnp.logical_or(done0, budgets <= 0)
    tokens, _count, _cur, caches, done = jax.lax.while_loop(
        cond, step, (tokens0, counts0, first_tokens.astype(jnp.int32), caches, done0)
    )
    return tokens, caches


def start_shadow_warmup(
    config,
    enc_shapes,
    dec_shapes,
    *,
    max_new_tokens: int,
    cache_dtype,
    tokenizer,
    prefix_ids,
    suffix_ids,
) -> threading.Thread:
    """Warm the serving program set on a zeros-params shadow model, async.

    ``enc_shapes`` / ``dec_shapes``: pytrees whose leaves are either
    ``jax.ShapeDtypeStruct`` (materialized as on-device zeros — no host
    transfer) or real arrays (used as-is). Compiled programs key on shapes,
    so every program the shadow dispatches lands in the same in-process jit
    caches — and, on relay backends, the same server-side executable state —
    that the real model's identical-shaped dispatches will hit. Used by the
    GGUF load overlap (``Qwen3ASRModel._start_load_prewarm``) and by
    synthetic-weight harnesses (``scripts/measure_init_to_ready.py``) whose
    fabricated models skip ``__init__``. The returned daemon thread never
    raises; join it before measuring warm-path latency.

    Returns ``None`` without spawning when the device can't hold the shadow
    params NEXT TO the real ones — the zeros trees double parameter
    residency for the duration of the overlap, and an OOM here would
    surface as a hard failure in the racing real upload.
    """
    try:
        param_bytes = sum(
            int(np.prod(l.shape)) * np.dtype(l.dtype).itemsize
            for tree in (enc_shapes, dec_shapes)
            for l in jax.tree.leaves(tree)
        )
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        margin = 2 << 30  # KV caches + compile workspace
        if limit is not None and in_use + 2 * param_bytes + margin > limit:
            _log.warning(
                "skipping load-overlapped warmup: shadow params (%.1f GB) "
                "don't fit next to the real ones (%.1f GB free)",
                param_bytes / 2**30,
                (limit - in_use) / 2**30,
            )
            return None
    except Exception:
        pass  # no memory stats on this backend — proceed

    def _run():
        import time as _time

        t0 = _time.perf_counter()
        try:
            def zeros(leaf):
                if isinstance(leaf, jax.ShapeDtypeStruct):
                    return jnp.zeros(leaf.shape, leaf.dtype)
                return jnp.asarray(leaf)

            shadow = object.__new__(Qwen3ASRModel)
            shadow._prewarm_thread = None
            shadow.config = config
            shadow.tokenizer = tokenizer
            shadow.max_new_tokens = max_new_tokens
            shadow.cache_dtype = cache_dtype
            shadow.mesh = None
            shadow._cache_sharding = None
            shadow.prefix_ids = prefix_ids
            shadow.suffix_ids = suffix_ids
            shadow.encoder_params = jax.tree.map(zeros, enc_shapes)
            shadow.decoder_params = dec.prepare_stacked_scales(
                jax.tree.map(zeros, dec_shapes)
            )
            shadow.warmup()
            _log.info(
                "load-overlapped warmup done in %.1fs",
                _time.perf_counter() - t0,
            )
        except Exception:
            _log.warning("load-overlapped warmup failed", exc_info=True)

    t = threading.Thread(target=_run, name="lwt-load-prewarm", daemon=True)
    t.start()
    return t


class Qwen3ASRModel:
    def __init__(
        self,
        gguf_path: str,
        max_new_tokens: int = 448,
        cache_dtype=jnp.bfloat16,
        mesh=None,
        precise: bool = False,
    ) -> None:
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``tp`` axis —
        parameters shard Megatron-style (attention heads / FFN columns) and
        XLA inserts the per-block all-reduces over ICI. The KV cache shards
        on its KV-head axis. Single-chip serving passes ``mesh=None``.

        ``precise=True`` is the fidelity mode for bit-match comparisons
        against the reference's f32 CPU path: dense float32 weights,
        float32 compute, float32 KV cache (slower; not for serving)."""
        import os as _os

        self._prewarm_thread = None
        self._resolved_prompt_ids = None
        # Load-overlapped warmup (LWT_LOAD_OVERLAP_WARMUP, default on):
        # compiled programs key on parameter SHAPES, which the GGUF header
        # fully determines — so a shadow model with on-device zeros params
        # starts compiling (and, on relay backends, executable-loading) the
        # warmup program set the moment the header is parsed, while the
        # multi-GB host prep + HBM upload still runs. The real warmup()
        # joins the thread and then re-dispatches through warm caches.
        # Single-chip quantized artifacts only (mesh sharding and the
        # dense/precise legacy path skip the overlap).
        overlap = (
            mesh is None
            and not precise
            and _os.environ.get("LWT_LOAD_OVERLAP_WARMUP", "1") not in ("0", "")
        )
        on_parsed = (
            (lambda w: self._start_load_prewarm(w, max_new_tokens, cache_dtype))
            if overlap
            else None
        )
        try:
            weights = Qwen3ASRWeights(
                gguf_path, precise=precise, on_parsed=on_parsed
            )
        except Exception:
            # A load failure after the header parse would orphan the shadow
            # thread mid-dispatch — jax teardown under a live dispatch
            # aborts the process, turning a clean init error into a crash.
            # Bounded: error reporting must not wait out a wedged compile.
            t = self._prewarm_thread
            if t is not None:
                t.join(timeout=60)
                self._prewarm_thread = None
            raise
        if precise:
            cache_dtype = jnp.float32
        self.load_timings = dict(getattr(weights, "load_timings", {}))
        if self._prewarm_thread is not None:
            # With the shadow running, the upload's block_until_ready waits
            # behind its compile/executable-load RPCs on relay backends —
            # device_upload_s then reads as wall time absorbed into the
            # overlap, not transfer speed. Flag it for attribution readers.
            self.load_timings["overlap_warmup"] = True
        self.config: Qwen3ASRConfig = weights.config
        self.tokenizer = weights.tokenizer
        self.decoder_params = weights.decoder_params
        self.encoder_params = weights.encoder_params
        self.max_new_tokens = max_new_tokens
        self.cache_dtype = cache_dtype
        self.mesh = mesh
        self._cache_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from light_whisper_tpu.parallel.sharding import shard_params

            tp = mesh.shape.get("tp", 1)
            if self.config.decoder.head_count_kv % tp != 0:
                raise ValueError(
                    f"tp={tp} must divide kv heads {self.config.decoder.head_count_kv}"
                )
            self.decoder_params = shard_params(self.decoder_params, mesh)
            self.encoder_params = shard_params(self.encoder_params, mesh)
            # cache [L, Hkv, C, hd] → shard the KV-head axis
            self._cache_sharding = NamedSharding(mesh, P(None, "tp", None, None))
        else:
            # Single-chip serving: pre-transpose stacked Q8 scales so decode
            # rides the layer-indexed kernel (decoder.prepare_stacked_scales).
            self.decoder_params = dec.prepare_stacked_scales(self.decoder_params)

        # Real llama.cpp-family GGUFs carry a Jinja chat template here —
        # never a literal {audio} string — so resolution handles both (and
        # never refuses to serve). See models/qwen3_asr/prompt.py. The
        # overlap path already resolved (and the shadow compiled against)
        # these ids — reuse, so the two can never drift.
        if self._resolved_prompt_ids is not None:
            self.prefix_ids, self.suffix_ids = self._resolved_prompt_ids
        else:
            self.prefix_ids, self.suffix_ids = resolve_prompt_ids(
                weights.metadata.get("tokenizer.chat_template"),
                self.tokenizer,
                self.config.audio_token_id,
                context=_os.environ.get("LWT_ASR_CONTEXT", ""),
            )

    # ------------------------------------------------------------------

    def _start_load_prewarm(self, weights, max_new_tokens, cache_dtype) -> None:
        """Spawn the shadow-warmup thread from the loader's on_parsed hook."""
        shapes = weights.device_tree_shapes()
        if shapes is None:
            return
        enc_shapes, dec_shapes = shapes
        import os as _os

        prefix_ids, suffix_ids = resolve_prompt_ids(
            weights.metadata.get("tokenizer.chat_template"),
            weights.tokenizer,
            weights.config.audio_token_id,
            context=_os.environ.get("LWT_ASR_CONTEXT", ""),
        )
        # Stash for __init__: the shadow MUST compile the same prompt
        # buckets the real model dispatches — one resolution, used by both.
        self._resolved_prompt_ids = (prefix_ids, suffix_ids)
        self._prewarm_thread = start_shadow_warmup(
            weights.config,
            enc_shapes,
            dec_shapes,
            max_new_tokens=max_new_tokens,
            cache_dtype=cache_dtype,
            tokenizer=weights.tokenizer,
            prefix_ids=prefix_ids,
            suffix_ids=suffix_ids,
        )

    def _join_prewarm(self) -> None:
        t = getattr(self, "_prewarm_thread", None)
        if t is not None:
            waited = 0.0
            while t.is_alive():
                # Bounded join slices with a heartbeat: a wedged relay
                # compile otherwise turns the first transcribe into a
                # silent hang with nothing in the log attributing it.
                t.join(timeout=60)
                if t.is_alive():
                    waited += 60
                    _log.warning(
                        "still waiting on load-overlapped warmup (%.0fs)",
                        waited,
                    )
            self._prewarm_thread = None

    def _cache_for(self, needed: int) -> dec.KVCache:
        capacity = 1024
        while capacity < needed:
            capacity *= 2
        capacity = min(capacity, self.config.decoder.context_length)
        if needed > capacity:
            raise ValueError(
                f"prompt+decode budget {needed} exceeds context "
                f"{self.config.decoder.context_length}"
            )
        # Buffers are donated into prefill/decode, so always start fresh.
        cache = dec.init_cache(self.config.decoder, capacity, self.cache_dtype)
        return self.place_cache(cache)

    def place_cache(self, cache: dec.KVCache) -> dec.KVCache:
        """Lay a fresh KV cache out in the model's sharding (tp shards the
        KV-head axis; no-op single-chip). The one sharding site for every
        cache owner — serving sessions included (incremental._ensure_cache)."""
        if self._cache_sharding is None:
            return cache
        return dec.KVCache(
            k=jax.device_put(cache.k, self._cache_sharding),
            v=jax.device_put(cache.v, self._cache_sharding),
            pos=cache.pos,
        )

    def transcribe(self, audio: np.ndarray) -> TranscriptionResult:
        """Greedy transcription of mono 16 kHz audio (float32 or int16)."""
        # getattr: fabricated instances (bench/probe scripts build the model
        # via __new__ with explicit fields) predate the prewarm attribute
        if getattr(self, "_prewarm_thread", None) is not None:
            self._join_prewarm()
        audio = as_device_audio(np.asarray(audio).reshape(-1))
        bucket = bucket_audio_samples(len(audio))
        padded = np.zeros(bucket, dtype=audio.dtype)
        padded[: len(audio)] = audio
        n_audio = self._audio_tokens_for(len(audio))

        ids = (
            self.prefix_ids
            + [self.config.audio_token_id] * n_audio
            + self.suffix_ids
        )
        true_len = len(ids)
        bucket_len = _round_up(true_len, PROMPT_BUCKET)
        ids_padded = np.full(bucket_len, self.config.pad_token_id, dtype=np.int32)
        ids_padded[:true_len] = ids

        mel_frames = wmel.num_mel_frames(bucket)
        chunk = self.config.audio.chunk_frames
        num_chunks = max(1, (mel_frames + chunk - 1) // chunk)

        cache = self._cache_for(bucket_len + self.max_new_tokens)
        first, cache, _clip_max = _encode_and_prefill(
            self.config,
            self.encoder_params,
            self.decoder_params,
            jnp.asarray(padded),
            jnp.int32(n_audio),
            jnp.asarray(ids_padded),
            jnp.int32(true_len - 1),
            cache,
            num_chunks,
            mel_frames,
            len(self.prefix_ids),
        )
        # The padded tail wrote garbage K/V at positions ≥ true_len; decode
        # starts there and overwrites before reading (causal masking keeps
        # positions < true_len exact).
        cache = cache._replace(pos=jnp.int32(true_len))

        tokens, count, _cache = dec.decode_greedy(
            self.config.decoder,
            self.decoder_params,
            first,
            cache,
            self.config.eos_token_id,
            self.max_new_tokens,
        )
        generated = [int(t) for t in np.asarray(tokens)[: int(count)]]
        return self._parse_output(generated)

    def _parse_output(self, generated: List[int]) -> TranscriptionResult:
        language = "unknown"
        for token_id in generated[:4]:
            if 0 <= token_id < len(self.tokenizer.tokens):
                m = _LANG_TOKEN.match(self.tokenizer.tokens[token_id])
                if m:
                    language = m.group(1)
                    break
        text = self.tokenizer.decode(generated).strip()
        return TranscriptionResult(text=text, language=language, tokens=generated)

    def transcribe_batch(self, audios: List[np.ndarray]) -> List[TranscriptionResult]:
        """Batched greedy transcription of several utterances on one chip.

        All streams are padded into one shape bucket and stepped together —
        the multi-stream serving path (BASELINE configs #2/#5). Results match
        per-stream :meth:`transcribe` output for the same bucket shapes.
        """
        if not audios:
            return []
        if getattr(self, "_prewarm_thread", None) is not None:
            self._join_prewarm()
        if len(audios) == 1:
            return [self.transcribe(audios[0])]

        audios = [as_device_audio(np.asarray(a).reshape(-1)) for a in audios]
        bucket = max(bucket_audio_samples(len(a)) for a in audios)

        embeds_list = []
        n_audio_list = []
        for audio in audios:
            padded = np.zeros(bucket, dtype=audio.dtype)
            padded[: len(audio)] = audio
            embeds, _ = self._encode_padded(padded, true_samples=len(audio))
            embeds_list.append(embeds)
            n_audio_list.append(self._audio_tokens_for(len(audio)))

        prompt_lens = [
            len(self.prefix_ids) + n + len(self.suffix_ids) for n in n_audio_list
        ]
        bucket_len = _round_up(max(prompt_lens), PROMPT_BUCKET)
        ids_padded = np.full((len(audios), bucket_len), self.config.pad_token_id, np.int32)
        for row, n_audio in enumerate(n_audio_list):
            ids = (
                self.prefix_ids
                + [self.config.audio_token_id] * n_audio
                + self.suffix_ids
            )
            ids_padded[row, : len(ids)] = ids

        # same policy as _cache_for: context clamp + clean overflow error
        # (the batched path must not silently decode past trained positions)
        needed = bucket_len + self.max_new_tokens
        capacity = 1024
        while capacity < needed:
            capacity *= 2
        capacity = min(capacity, self.config.decoder.context_length)
        if needed > capacity:
            raise ValueError(
                f"prompt+decode budget {needed} exceeds context "
                f"{self.config.decoder.context_length}"
            )

        # KV memory bounds the decode batch (B × L × Hkv × C × hd × 2 × k/v);
        # long-form recordings can plan dozens of windows, so run the batch
        # in fixed-size chunks — tail chunks pad by repeating row 0 (results
        # discarded) to keep one compiled shape per chunk size.
        max_b = max_decode_batch()

        def _run_rows(rows: List[int], pad_to: int) -> List[List[int]]:
            padded_rows = rows + [rows[0]] * (pad_to - len(rows))
            embeds = jnp.stack(
                [
                    _build_prompt_embeds(
                        self.decoder_params,
                        jnp.asarray(ids_padded[row]),
                        embeds_list[row],
                        jnp.int32(n_audio_list[row]),
                        len(self.prefix_ids),
                        # match the per-stream path: precise=True must stay
                        # f32 through the batched prefill too
                        self.config.decoder.dtype,
                    )
                    for row in padded_rows
                ]
            )
            caches = jax.vmap(
                lambda _: dec.init_cache(self.config.decoder, capacity, self.cache_dtype)
            )(jnp.arange(pad_to))
            lens = [prompt_lens[row] for row in padded_rows]
            firsts, caches = _prefill_batch(
                self.config.decoder,
                self.decoder_params,
                embeds,
                caches,
                jnp.asarray([l - 1 for l in lens], dtype=jnp.int32),
            )
            caches = caches._replace(pos=jnp.asarray(lens, dtype=jnp.int32))
            tokens, _caches = _decode_greedy_batch(
                self.config.decoder,
                self.decoder_params,
                firsts,
                caches,
                self.config.eos_token_id,
                self.max_new_tokens,
            )
            tokens_np = np.asarray(tokens)
            return [
                [int(t) for t in tokens_np[i] if t >= 0] for i in range(len(rows))
            ]

        def _bucket_b(n: int) -> int:
            # Batch-size buckets (2, 4, 8, …): every distinct B is a fresh
            # XLA program — minutes through a remote-compile relay — while a
            # padded row costs ≤2× compute on a step that batching already
            # amortizes. Same static-shape policy as audio/prompt buckets.
            b = 2
            while b < n:
                b *= 2
            return min(b, max_b)

        results: List[TranscriptionResult] = [None] * len(audios)  # type: ignore[list-item]
        all_rows = list(range(len(audios)))
        for c0 in range(0, len(all_rows), max_b):
            chunk = all_rows[c0 : c0 + max_b]
            for row, generated in zip(chunk, _run_rows(chunk, _bucket_b(len(chunk)))):
                results[row] = self._parse_output(generated)
        return results

    def _encode_padded(self, padded: np.ndarray, true_samples: int):
        mel_full = wmel.log_mel(padded)
        embeds, _ = encode_audio(self.config.audio, self.encoder_params, np.asarray(mel_full))
        return embeds, self._audio_tokens_for(true_samples)

    def _audio_tokens_for(self, n_samples: int) -> int:
        from light_whisper_tpu.models.qwen3_asr.config import conv_output_length

        true_frames = wmel.num_mel_frames(n_samples)
        chunk = self.config.audio.chunk_frames
        full_chunks, tail = divmod(true_frames, chunk)
        return full_chunks * self.config.audio.tokens_per_chunk + (
            conv_output_length(tail) if tail else 0
        )

    def warmup(self) -> None:
        # s16-grid noise: warms the int16 device-input program — the one
        # every wire request (pcm_s16le) rides.
        rng = np.random.default_rng(0)
        self.transcribe(
            (rng.standard_normal(SAMPLE_RATE) * 0.002 * 32768.0).astype(np.int16)
        )
