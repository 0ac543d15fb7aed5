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

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from light_whisper_tpu.audio import mel as wmel
from light_whisper_tpu.models.qwen3_asr import decoder as dec
from light_whisper_tpu.models.qwen3_asr.model import (
    Qwen3ASRModel,
    TranscriptionResult,
    _build_prompt_embeds,
    _prefill_padded,
    _round_up,
)

SEGMENT_BUCKET = 64
INTERIM_MAX_NEW_TOKENS = 96


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
        self.full_prefills = 0
        self.incremental_prefills = 0

    # ------------------------------------------------------------------

    def reset(self) -> None:
        self._cache = None
        self._window_start = None
        self._stable_tokens = 0

    def _audio_embeds(self, window: np.ndarray):
        """Encode the (bucketed) window; returns (embeds, n_audio_tokens)."""
        from light_whisper_tpu.models.qwen3_asr.encoder import encode as encode_audio
        from light_whisper_tpu.models.qwen3_asr.model import bucket_audio_samples

        bucket = bucket_audio_samples(len(window))
        padded = np.zeros(bucket, dtype=np.float32)
        padded[: len(window)] = window
        mel = wmel.log_mel(padded)
        embeds, _ = encode_audio(self.model.config.audio, self.model.encoder_params, np.asarray(mel))
        return embeds, self.model._audio_tokens_for(len(window))

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
        model = self.model
        cfg = model.config
        window = np.asarray(window, dtype=np.float32).reshape(-1)
        audio_embeds, n_audio = self._audio_embeds(window)

        prefix_len = len(model.prefix_ids)
        suffix_len = len(model.suffix_ids)
        true_len = prefix_len + n_audio + suffix_len
        self._ensure_cache(true_len + self.max_new_tokens)

        can_extend = (
            self._window_start == window_start_sample
            and 0 <= self._stable_tokens <= n_audio
        )

        if not can_extend:
            # Full prefill of prefix + audio + suffix (end-padded bucket).
            bucket_len = _round_up(true_len, SEGMENT_BUCKET)
            ids = np.full(bucket_len, cfg.pad_token_id, dtype=np.int32)
            ids[:prefix_len] = model.prefix_ids
            ids[prefix_len : prefix_len + n_audio] = cfg.audio_token_id
            ids[prefix_len + n_audio : true_len] = model.suffix_ids
            embeds = _build_prompt_embeds(
                model.decoder_params,
                jnp.asarray(ids),
                audio_embeds,
                jnp.int32(n_audio),
                prefix_len,
            )
            cache = self._cache._replace(pos=jnp.int32(0))
            first, cache = _prefill_padded(
                cfg.decoder, model.decoder_params, embeds, cache, jnp.int32(true_len - 1)
            )
            self.full_prefills += 1
        else:
            # Roll back to the stable prefix and prefill only the tail.
            stable = self._stable_tokens
            seg_audio = n_audio - stable
            seg_true = seg_audio + suffix_len
            seg_bucket = _round_up(max(1, seg_true), SEGMENT_BUCKET)
            ids = np.full(seg_bucket, cfg.pad_token_id, dtype=np.int32)
            ids[:seg_audio] = cfg.audio_token_id
            ids[seg_audio:seg_true] = model.suffix_ids
            embeds = _build_prompt_embeds(
                model.decoder_params,
                jnp.asarray(ids),
                audio_embeds[stable:],
                jnp.int32(seg_audio),
                0,
            )
            cache = self._cache._replace(pos=jnp.int32(prefix_len + stable))
            first, cache = _prefill_padded(
                cfg.decoder, model.decoder_params, embeds, cache, jnp.int32(seg_true - 1)
            )
            self.incremental_prefills += 1

        cache = cache._replace(pos=jnp.int32(true_len))
        tokens, count, cache = dec.decode_greedy(
            cfg.decoder,
            model.decoder_params,
            first,
            cache,
            cfg.eos_token_id,
            self.max_new_tokens,
        )
        self._cache = cache
        self._window_start = window_start_sample
        # Tokens inside complete attention-window groups are final.
        self._stable_tokens = (n_audio // self._window_tokens) * self._window_tokens

        generated = [int(t) for t in np.asarray(tokens)[: int(count)]]
        return model._parse_output(generated)

    # StreamingSession duck-type: plain transcribe = full window, start 0.
    def transcribe(self, audio: np.ndarray) -> TranscriptionResult:
        return self.transcribe_window(audio, window_start_sample=0)
