"""Engine CLI: ``serve`` / ``download`` / ``install`` / ``dictate``.

Same command surface as the reference's packaged entry point
(``engine.py:25-57``), so the Rust shell can spawn this engine with identical
arguments: ``light-whisper-engine serve --engine qwen3-asr-0.6b`` etc.
``dictate`` additionally exposes the full capture→interim→finalize
dictation loop headlessly (the shell's recording path without a shell).
"""

from __future__ import annotations

import argparse

ENGINE_CHOICES = ["qwen3-asr-0.6b", "qwen3-asr-1.7b"]


def cmd_serve(engine: str) -> None:
    import os

    # Some deployments preload a TPU plugin through sitecustomize and force
    # the platform via jax.config (env vars lose). Honor an explicit CPU
    # request before any backend initializes.
    if os.environ.get("LIGHT_WHISPER_FORCE_CPU") or os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from light_whisper_tpu.runtime import compile_cache
    from light_whisper_tpu.runtime.logging_util import setup_rotating_logger
    from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer

    logger = setup_rotating_logger(__name__, "qwen3_asr_server.log", "Qwen3-ASR server")
    # Cold-start contract: warmup must be a cache-hit walk, not a compile
    # storm — the shell's init timeout is 120 s (funasr_service.rs:273).
    compile_cache.configure(logger)
    Qwen3EngineServer(engine=engine, logger=logger).serve_forever()


def cmd_download(engine: str) -> None:
    from light_whisper_tpu.download.downloader import download_model

    download_model(engine)


def cmd_install(archive: str, dest: str) -> None:
    """Extract a packaged engine archive with fingerprint gating.

    Shell-side counterpart of the reference's bundled-engine extraction
    (``funasr_service.rs:502-544``): reuses an install whose ``.version``
    marker matches, otherwise stages + atomically swaps. Progress goes to
    stdout as JSON lines (the shell's extraction progress events).
    """
    import json
    import sys

    from light_whisper_tpu.runtime.install import ensure_installed

    def progress(done: int, final: bool) -> None:
        print(json.dumps({"status": "extracting", "entries": done, "final": final}))
        sys.stdout.flush()

    result = ensure_installed(archive, dest, progress=progress)
    print(
        json.dumps(
            {
                "status": "installed",
                "engine_dir": result.engine_dir,
                "fingerprint": result.fingerprint,
                "extracted": result.extracted,
            }
        )
    )


def cmd_dictate(
    engine: str, wav: str, realtime: bool = True, json_events: bool = True
) -> None:
    """Replay a WAV as a live dictation through the recording stack.

    Drives the same call chain the shell's hotkey press does
    (SURVEY §3: start_recording → capture thread → interim loop →
    finalize), with the file standing in for the microphone: blocks are
    paced at their audio duration (``--no-realtime`` floods them), interim
    stable/tentative hypotheses stream as JSON lines, and the final
    transcript (interim-cache reuse included) closes the session.
    """
    import json
    import os
    import sys
    import time

    import numpy as np

    if os.environ.get("LIGHT_WHISPER_FORCE_CPU") or os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from light_whisper_tpu.runtime import compile_cache

    compile_cache.configure()

    from light_whisper_tpu.audio.capture import ScriptedSource
    from light_whisper_tpu.audio.pcm import read_audio_file_mono_f32, resample_linear
    from light_whisper_tpu.download.cache import QWEN3_ASR_MODELS, find_snapshot_file
    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel
    from light_whisper_tpu.runtime.recording import RecordingController
    from light_whisper_tpu.serving.incremental import IncrementalTranscriber

    audio, rate = read_audio_file_mono_f32(wav)
    if rate != 16_000:
        audio = resample_linear(audio, rate, 16_000)
    audio = np.asarray(audio, dtype=np.float32)

    # same resolution order as the server: explicit env override, then the
    # HF cache snapshot (qwen3_server._resolve_model_path)
    model_path = os.environ.get("LIGHT_WHISPER_MODEL_PATH")
    if not model_path or not os.path.isfile(model_path):
        cfg = QWEN3_ASR_MODELS[engine]
        model_path = find_snapshot_file(cfg["repo_id"], cfg["filename"])
    if not model_path:
        print(json.dumps({"event": "error", "error": "model not downloaded"}))
        raise SystemExit(2)

    model = Qwen3ASRModel(model_path)
    controller = RecordingController(IncrementalTranscriber(model))

    def emit(kind: str, **payload) -> None:
        if json_events:
            print(json.dumps({"event": kind, **payload}, ensure_ascii=False))
        else:
            print(f"[{kind}] {payload}")
        sys.stdout.flush()

    block = 16_000 // 4  # 250 ms blocks, the capture callback cadence
    blocks = [audio[i : i + block] for i in range(0, len(audio), block)]
    source = ScriptedSource(blocks, sample_rate=16_000, realtime=realtime)
    controller.start_recording(
        source,
        on_interim=lambda r: emit(
            "interim",
            stable=r.stable,
            tentative=r.tentative,
            covered_samples=r.covered_samples,
            tick_ms=round(r.tick_ms, 1),
        ),
    )
    deadline = time.time() + max(60.0, 3 * len(audio) / 16_000)
    while not source.drained() and time.time() < deadline:
        time.sleep(0.05)
    result = controller.stop_recording()
    emit(
        "final",
        text=result.text,
        language=result.language,
        duration_seconds=round(result.duration_seconds, 2),
        from_interim_cache=result.from_interim_cache,
        interim_ticks=result.interim_ticks,
        asr_ms=round(result.asr_ms, 1),
        too_short=result.too_short,
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="light-whisper-engine")
    sub = parser.add_subparsers(dest="command", required=True)

    serve_p = sub.add_parser("serve")
    serve_p.add_argument("--engine", choices=ENGINE_CHOICES)

    dl_p = sub.add_parser("download")
    dl_p.add_argument("--engine", required=True, choices=ENGINE_CHOICES)

    inst_p = sub.add_parser("install")
    inst_p.add_argument("--archive", required=True)
    inst_p.add_argument("--dest", required=True)

    dict_p = sub.add_parser("dictate")
    dict_p.add_argument("--engine", choices=ENGINE_CHOICES)
    dict_p.add_argument("--wav", required=True)
    dict_p.add_argument(
        "--no-realtime",
        action="store_true",
        help="flood audio instead of pacing it at recording speed",
    )

    args = parser.parse_args(argv)
    if args.command == "serve":
        cmd_serve(args.engine or _configured_local_engine())
    elif args.command == "download":
        cmd_download(args.engine)
    elif args.command == "install":
        cmd_install(args.archive, args.dest)
    elif args.command == "dictate":
        cmd_dictate(
            args.engine or _configured_local_engine(),
            args.wav,
            realtime=not args.no_realtime,
        )


def _configured_local_engine() -> str:
    """No --engine: env wins, then the atomic engine.json store, then the
    default — online engines (glm/alibaba) can't be served locally and fall
    back too (paths.rs:55-65 whitelist semantics)."""
    import os

    env_engine = os.environ.get("LIGHT_WHISPER_ASR_ENGINE")
    if env_engine in ENGINE_CHOICES:
        return env_engine
    from light_whisper_tpu.runtime.config import read_engine_config

    configured = read_engine_config()
    return configured if configured in ENGINE_CHOICES else ENGINE_CHOICES[0]


if __name__ == "__main__":
    main()
