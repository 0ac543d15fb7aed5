"""Exact streaming DFSMN: per-stage activation caches for append-only audio.

The interim loop re-sends the same recording with ~0.5 s appended every tick
(reference ``interim.rs:21-196``); the VAD must re-score the whole window.
``VadPrefixSession`` already reuses the probability *prefix* and recomputes a
halo'd tail — but that tail is ~450 frames through all 8 memory stages
(~0.5 GFLOP on the single-core bench host, p50 ~54 ms of every wire tick).

This module streams the DFSMN itself. Each memory block is a depthwise FIR
over its stage input (19 lookback + 20 lookahead taps, ``dfsmn.py:29-51``),
and everything between blocks is frame-local, so the output of stage ``l``
(0-based; stage 0 = fsmn1, stages 1-7 = the residual blocks) at frame ``t``
depends on input features up to ``t + 20·(l+1)``. Caching every stage's
activations therefore makes frames ``< T - 20·(l+1)`` of stage ``l`` final:
on a tick that appends ``d`` frames, stage ``l`` recomputes only its last
``d + 20·(l+1)`` rows instead of the whole halo'd tail — ~3× less arithmetic
per tick, and the results equal the monolithic pass up to float
reassociation (asserted in tests against ``dfsmn_probs``).

Runs in plain numpy: the VAD is pinned to the host when the accelerator is a
remote relay (``api._vad_device``), per-tick row counts vary with the audio
delta (no static shapes to bucket), and the matmuls are a few hundred rows —
exactly the regime where an eager BLAS call beats a jitted dispatch chain.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from light_whisper_tpu.audio import fbank as kfb
from light_whisper_tpu.models.vad.onnx_import import FILTER_TAPS, NUM_BLOCKS
from light_whisper_tpu.native import binding

_STAGES = NUM_BLOCKS + 1  # fsmn1 + residual blocks
_BACK = FILTER_TAPS - 1  # lookback frames (taps cover t-19 .. t+20)
_AHEAD = FILTER_TAPS


def fbank_np(waveform: np.ndarray) -> np.ndarray:
    """Vectorized numpy mirror of ``fbank._fbank_impl`` (float32).

    waveform is in int16 scale (±32768) like the jitted path's input.
    Frames are sample-local (windowing, DC offset and pre-emphasis all
    happen inside the 400-sample frame), so computing frames of a suffix
    slice equals slicing the full computation — the property streaming
    relies on.
    """
    frames = kfb.num_frames(len(waveform))
    if frames == 0:
        return np.zeros((0, kfb.NUM_BINS), dtype=np.float32)
    idx = (
        np.arange(frames)[:, None] * kfb.FRAME_SHIFT
        + np.arange(kfb.FRAME_LENGTH)[None, :]
    )
    x = waveform.astype(np.float32)[idx]
    x = x - x.mean(axis=-1, keepdims=True)
    prev = np.concatenate([x[:, :1], x[:, :-1]], axis=-1)
    x = x - kfb.PREEMPH * prev
    x = x * kfb.povey_window()
    spec = np.fft.rfft(x, n=kfb.PADDED_WINDOW, axis=-1)
    power = (spec.real.astype(np.float32) ** 2) + (spec.imag.astype(np.float32) ** 2)
    mel = power @ kfb.kaldi_mel_matrix()
    return np.log(np.maximum(mel, kfb.LOG_FLOOR)).astype(np.float32)


def _conv_rows(
    src: np.ndarray,  # buffer holding absolute rows [off, T) at index a - off
    off: int,
    T: int,  # absolute stream length; rows ≥ T are implicit zeros
    filt: np.ndarray,  # [2*TAPS, C] combined lookback/lookahead kernel
    r0: int,
    r1: int,
) -> np.ndarray:
    """FIR output rows [r0, r1): out[t] = Σ_j filt[j] · src[t - 19 + j].

    Indices are absolute stream rows; ``src`` stores rows from ``off`` on
    (earlier rows were compacted away — callers guarantee off ≤ r0 - 19)."""
    C = src.shape[1]
    n = r1 - r0
    lo = r0 - _BACK
    hi = r1 + _AHEAD  # exclusive; src index range needed is [lo, hi)
    span = np.zeros((hi - lo, C), dtype=np.float32)
    s0, s1 = max(lo, off), min(hi, T)
    if s1 > s0:
        span[s0 - lo : s1 - lo] = src[s0 - off : s1 - off]
    # Native single-pass depthwise FIR (liblwt_native); the fallback inside
    # fir_rows is the shifted-FMA numpy loop (one vectorized sweep per tap).
    return binding.fir_rows(span, filt, n)


class StreamingDfsmn:
    """DFSMN probabilities over an append-only frame stream.

    ``update(feat_new)`` appends CMVN-normalized feature rows and returns the
    full probability vector for all frames seen so far. Provisional rows
    (those whose lookahead window was incomplete) are transparently
    recomputed on the next call, so the returned vector always equals the
    monolithic ``dfsmn_probs`` over the whole buffer.
    """

    def __init__(
        self,
        params: Dict[str, np.ndarray],
        compact_at: int = 4096,
        keep: int = 512,
    ):
        """``compact_at``/``keep``: once the activation caches exceed
        ``compact_at`` live rows, rows older than ``keep`` behind the stream
        head are dropped (a future update only ever reads back
        20·stages + 19 = 179 rows). Keeps memory flat for arbitrarily long
        audio: ~9 · compact_at · 128 · 4 B ≈ 19 MB at the default."""
        self._p = {k: np.asarray(v, dtype=np.float32) for k, v in params.items()}
        if keep < _AHEAD * _STAGES + _BACK:
            raise ValueError(
                f"keep={keep} is inside the DFSMN lookback horizon "
                f"({_AHEAD * _STAGES + _BACK} rows) — compaction would drop "
                "rows future updates read"
            )
        self._compact_at = max(compact_at, 2 * keep)
        self._keep = keep
        self.reset()

    def reset(self) -> None:
        self._T = 0
        self._off = 0  # absolute row index of each buffer's first row
        self._h: Optional[np.ndarray] = None  # stage-0 input rows [off, T)
        self._s = [None] * _STAGES  # per-stage outputs rows [off, T)
        self._valid = [0] * _STAGES  # final rows per stage (absolute)
        self._probs = np.zeros(0, dtype=np.float32)  # full history (tiny)
        self._probs_valid = 0

    @property
    def total_frames(self) -> int:
        return self._T

    def _append(self, buf: Optional[np.ndarray], rows: np.ndarray, at: int) -> np.ndarray:
        """Overwrite/extend ``buf`` with ``rows`` from absolute row ``at``.

        Rows before ``at`` are preserved; rows at/after it are overwritten
        (they were provisional — recomputed this tick)."""
        at -= self._off
        need = at + len(rows)
        if buf is None or buf.shape[0] < need:
            cap = max(need, 256, (buf.shape[0] * 2) if buf is not None else 0)
            grown = np.empty((cap, rows.shape[1]), dtype=np.float32)
            if buf is not None and at > 0:
                grown[:at] = buf[:at]
            buf = grown
        buf[at:need] = rows
        return buf

    def update(self, feat_new: np.ndarray) -> np.ndarray:
        """Append feature rows; return probs for all ``total_frames`` frames."""
        p = self._p
        off = self._off
        feat_new = np.asarray(feat_new, dtype=np.float32)
        T_old, d = self._T, len(feat_new)
        T = T_old + d
        if d:
            h_new = np.maximum(feat_new @ p["fc1.w"] + p["fc1.b"], 0.0)
            h_new = np.maximum(h_new @ p["fc2.w"] + p["fc2.b"], 0.0)
            self._h = self._append(self._h, h_new, T_old)
        self._T = T
        if T == 0:
            return np.zeros(0, dtype=np.float32)

        src = self._h
        for l in range(_STAGES):
            r0 = self._valid[l]
            if r0 >= T and d == 0:
                src = self._s[l]
                continue
            if l == 0:
                # stage-0 input is h itself: all rows final, conv directly
                conv = _conv_rows(src, off, T, p["fsmn1.filt"], r0, T)
                rows = src[r0 - off : T - off] + conv
            else:
                b = l - 1
                i0 = max(0, r0 - _BACK)
                zin = src[i0 - off : T - off]
                z = np.maximum(zin @ p[f"blocks.{b}.fc1.w"] + p[f"blocks.{b}.fc1.b"], 0.0)
                z = z @ p[f"blocks.{b}.fc2.w"]
                # z holds rows [i0, T); the conv's lookback window starts at
                # r0 - 19 = i0 (when r0 ≥ 19), so no [off, i0) copy is needed
                conv = _conv_rows(z, i0, T, p[f"blocks.{b}.filt"], r0, T)
                rows = z[r0 - i0 :] + conv + src[r0 - off : T - off]
            self._s[l] = self._append(self._s[l], rows, r0)
            self._valid[l] = max(0, T - _AHEAD * (l + 1))
            src = self._s[l]

        r0 = self._probs_valid
        tail = src[r0 - off : T - off]
        ho = np.maximum(tail @ p["dnn.w"] + p["dnn.b"], 0.0)
        logit = ho @ p["out.w"] + p["out.b"]
        probs_tail = (1.0 / (1.0 + np.exp(-logit[:, 0]))).astype(np.float32)
        if self._probs.shape[0] < T:
            grown = np.empty(max(T, 256, self._probs.shape[0] * 2), dtype=np.float32)
            grown[:r0] = self._probs[:r0]
            self._probs = grown
        self._probs[r0:T] = probs_tail
        # probs are final where the top stage is final
        self._probs_valid = self._valid[_STAGES - 1]
        self._maybe_compact()
        return self._probs[: self._T].copy()

    def _maybe_compact(self) -> None:
        """Drop cache rows no future update can read (older than ``keep``
        behind the stream head); the probs history stays whole."""
        T, off = self._T, self._off
        if T - off <= max(self._compact_at, 2 * self._keep):
            return
        # Clamp against direct attribute pokes: dropping rows inside the
        # lookback horizon would silently zero-substitute real history.
        new_off = T - max(self._keep, _AHEAD * _STAGES + _BACK + 1)
        shift = new_off - off
        live = T - new_off
        self._h[:live] = self._h[shift : shift + live]
        for l in range(_STAGES):
            self._s[l][:live] = self._s[l][shift : shift + live]
        self._off = new_off


class StreamingVad:
    """Audio-level wrapper: append-only float32 PCM → frame probabilities.

    Mirrors the frontend of ``api._vad_probs_padded`` (int16 scaling, fbank,
    CMVN) in numpy, feeding :class:`StreamingDfsmn`. The caller guarantees
    the sample buffer only ever grows (checked cheaply by length; content
    equality is the session's responsibility).
    """

    def __init__(self, params: Dict[str, np.ndarray], cmvn_mean: np.ndarray, cmvn_inv_std: np.ndarray):
        self._net = StreamingDfsmn(params)
        self._mean = np.asarray(cmvn_mean, dtype=np.float32)
        self._inv_std = np.asarray(cmvn_inv_std, dtype=np.float32)
        self._n_samples = 0

    def reset(self) -> None:
        self._net.reset()
        self._n_samples = 0

    @property
    def total_frames(self) -> int:
        return self._net.total_frames

    def retained_bytes(self) -> int:
        net = self._net
        total = int(net._probs.nbytes)
        if net._h is not None:
            total += int(net._h.nbytes)
        total += sum(int(s.nbytes) for s in net._s if s is not None)
        return total

    def extend(self, samples: np.ndarray) -> np.ndarray:
        """``samples``: the FULL buffer so far (float32 ±1.0 scale). Returns
        probabilities for every complete frame in it."""
        samples = np.asarray(samples, dtype=np.float32).reshape(-1)
        if len(samples) < self._n_samples:
            raise ValueError("StreamingVad buffer must be append-only")
        T_old = self._net.total_frames
        T = kfb.num_frames(len(samples))
        self._n_samples = len(samples)
        if T <= T_old:
            return self._net.update(np.zeros((0, kfb.NUM_BINS), np.float32))
        s0 = T_old * kfb.FRAME_SHIFT
        s1 = (T - 1) * kfb.FRAME_SHIFT + kfb.FRAME_LENGTH
        pcm = np.clip(samples[s0:s1] * 32768.0, -32768.0, 32767.0)
        feat = fbank_np(pcm)
        feat = (feat - self._mean) * self._inv_std
        return self._net.update(feat)
