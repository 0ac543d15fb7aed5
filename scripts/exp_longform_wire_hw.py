#!/usr/bin/env python3
"""Long-form to the product cap, through the WIRE (VERDICT r3 #7).

The reference accepts 30-minute recordings (``capture.rs:18``) under a
64 MB IPC cap (``commands/funasr.rs:17-25``). This drives ≥10 minutes of
prosodic synthetic speech through the REAL protocol surface — JSON line →
base64 decode → FireRedVAD (bundled weights, long-form batched scoring) →
windowed long-form batching → chunked prefill → batched decode → JSON
response over OS pipes — on the flagship model, and reports RTF, peak RSS,
and the per-request vad/inference attribution the wire carries.

Run on the axon TPU:
    python scripts/exp_longform_wire_hw.py            # 600 s, 1.7b
    LONGFORM_SECONDS=1800 BENCH_MODEL=0.6b python ... # other points
"""

from __future__ import annotations

import base64
import json
import os
import resource
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("LIGHT_WHISPER_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

SECONDS = float(os.environ.get("LONGFORM_SECONDS", "600"))
SR = 16_000


def log(msg: str) -> None:
    print(f"[wire-longform {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    size = os.environ.get("BENCH_MODEL", "1.7b")
    t0 = time.perf_counter()
    if size == "tiny":
        import tempfile

        sys.path.insert(0, os.path.join(REPO, "tests"))
        from helpers.tiny_model import write_tiny_model

        from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

        path = os.path.join(tempfile.gettempdir(), "lwt_wire_longform_tiny.gguf")
        write_tiny_model(path, quantize=True)
        model = Qwen3ASRModel(path, max_new_tokens=8)
    else:
        from exp_longform_hw import _bench_model  # same flagship construction

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        model = _bench_model(size)
    log(f"model ready in {time.perf_counter() - t0:.1f}s ({size})")

    from light_whisper_tpu.eval.speechlike import speechlike
    from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer
    from light_whisper_tpu.runtime.server import EngineServer

    engine = Qwen3EngineServer(
        engine=f"qwen3-asr-{size if size != 'tiny' else '0.6b'}",
        model_factory=lambda _p: model,
        model_path="/bench/synthetic.gguf",
    )

    c2s_r, c2s_w = os.pipe()
    s2c_r, s2c_w = os.pipe()
    to_server = os.fdopen(c2s_w, "w")
    from_server = os.fdopen(s2c_r, "r")
    server = EngineServer(
        engine.hooks(), stdin=os.fdopen(c2s_r, "r"), stdout=os.fdopen(s2c_w, "w")
    )
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    init_line = json.loads(from_server.readline())
    assert init_line.get("success"), init_line
    log("engine initialized over the wire (warmup done)")

    # Prosodic speech in 60 s tiles (speechlike synthesis is O(n); tiling
    # keeps generation cheap while every frame still looks voiced to VAD).
    tile = speechlike(60.0, seed=9).astype(np.float32)
    n = int(SECONDS * SR)
    audio = np.tile(tile, -(-n // tile.size))[:n]
    pcm = np.clip(audio * 32767, -32768, 32767).astype("<i2")

    # The reference's IPC cap is 64 MB per message (commands/funasr.rs:17-25);
    # recordings whose base64 would blow it (a 30-min product-cap capture =
    # 76.8 MB) go through the client's WAV tempfile fallback instead
    # (qwen3_asr_server.py:245-267 contract) — same route here, so the soak
    # exercises exactly what the product does at capture.rs:18's cap.
    IPC_CAP_BYTES = 64 * 1024 * 1024
    b64_bytes = -(-pcm.nbytes // 3) * 4
    wav_path = None
    if b64_bytes > IPC_CAP_BYTES:
        import tempfile

        from light_whisper_tpu.audio.pcm import encode_wav_mono_pcm16

        wav_path = os.path.join(
            tempfile.gettempdir(), f"lwt_soak_{int(SECONDS)}s.wav"
        )
        t_wav = time.perf_counter()
        with open(wav_path, "wb") as f:
            f.write(encode_wav_mono_pcm16(pcm, SR))
        log(
            f"payload: {SECONDS:.0f}s audio, base64 would be "
            f"{b64_bytes / 1e6:.1f} MB > 64 MB IPC cap → WAV path fallback "
            f"({os.path.getsize(wav_path) / 1e6:.1f} MB file, "
            f"written in {time.perf_counter() - t_wav:.1f}s)"
        )
        request_audio = {"audio_path": wav_path, "audio_format": "wav"}
        payload = ""
    else:
        payload = base64.b64encode(pcm.tobytes()).decode()
        log(
            f"payload: {SECONDS:.0f}s audio, {len(payload) / 1e6:.1f} MB "
            f"base64 (reference IPC cap: 64 MB)"
        )
        request_audio = {
            "audio_base64": payload,
            "audio_format": "pcm_s16le",
            "sample_rate": SR,
        }

    results = []
    for trial in range(2):
        t0 = time.perf_counter()
        to_server.write(
            json.dumps(
                {
                    "action": "transcribe",
                    "request_id": trial + 1,
                    **request_audio,
                }
            )
            + "\n"
        )
        to_server.flush()
        resp = json.loads(from_server.readline())
        wall = time.perf_counter() - t0
        assert resp.get("success"), resp
        peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        results.append(
            {
                "trial": trial,
                "wall_s": round(wall, 2),
                "rtf": round(wall / SECONDS, 5),
                "x_realtime": round(SECONDS / wall, 1),
                "vad_ms": resp.get("vad_ms"),
                "inference_ms": resp.get("inference_ms"),
                "vad_segments": resp.get("vad_segments"),
                "long_form": resp.get("long_form"),
                "asr_ms": resp.get("long_form_asr_ms"),
                "window_seconds": resp.get("long_form_window_seconds"),
                "peak_rss_mb": round(peak_mb, 0),
            }
        )
        log(json.dumps(results[-1]))

    # ---- post-soak health: the no-degradation-cliff witness ------------
    # After the cap-scale request(s), steady-state dictation ticks must
    # cost what they always cost, and host retention must stay byte-
    # bounded (VERDICT r4 #8). Five 12 s interim-style requests + stats.
    post = []
    short = np.clip(
        np.tile(tile[: 12 * SR], 1) * 32767, -32768, 32767
    ).astype("<i2")
    short_payload = base64.b64encode(short.tobytes()).decode()
    for i in range(5):
        t0 = time.perf_counter()
        to_server.write(
            json.dumps(
                {
                    "action": "transcribe",
                    "request_id": 50 + i,
                    "audio_base64": short_payload,
                    "audio_format": "pcm_s16le",
                    "sample_rate": SR,
                    "options": {"stream": "postsoak"},
                }
            )
            + "\n"
        )
        to_server.flush()
        resp = json.loads(from_server.readline())
        assert resp.get("success"), resp
        post.append(round((time.perf_counter() - t0) * 1000, 1))
    to_server.write(json.dumps({"action": "stats", "request_id": 98}) + "\n")
    to_server.flush()
    stats = json.loads(from_server.readline()).get("stats", {})
    retained = {
        k: stats.get(k)
        for k in (
            "trim_pin_retained_bytes",
            "vad_session_retained_bytes",
            "session_parked_audio_bytes",
        )
    }
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    log(f"post-soak 12s ticks: {post} ms; retained: {retained}")

    to_server.write(json.dumps({"action": "exit", "request_id": 99}) + "\n")
    to_server.flush()
    thread.join(timeout=15)

    best = min(results, key=lambda r: r["wall_s"])
    print(
        json.dumps(
            {
                "experiment": "wire_longform",
                "model": size,
                "audio_seconds": SECONDS,
                "payload_mb_base64": round(len(payload) / 1e6, 1) if payload else None,
                "wav_path_mb": (
                    round(os.path.getsize(wav_path) / 1e6, 1) if wav_path else None
                ),
                "trials": results,
                "best_rtf": best["rtf"],
                "best_x_realtime": best["x_realtime"],
                "post_soak_12s_ms": post,
                "retained_bytes": retained,
                "peak_rss_mb": round(peak_mb, 0),
            }
        )
    )
    if wav_path:
        try:
            os.remove(wav_path)
        except OSError:
            pass


if __name__ == "__main__":
    main()
