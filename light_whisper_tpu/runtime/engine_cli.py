"""Engine CLI: ``serve`` / ``download`` subcommands.

Same command surface as the reference's packaged entry point
(``engine.py:25-57``), so the Rust shell can spawn this engine with identical
arguments: ``light-whisper-engine serve --engine qwen3-asr-0.6b`` etc.
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

    from light_whisper_tpu.runtime.logging_util import setup_rotating_logger
    from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer

    logger = setup_rotating_logger(__name__, "qwen3_asr_server.log", "Qwen3-ASR server")
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

    args = parser.parse_args(argv)
    if args.command == "serve":
        cmd_serve(args.engine or _configured_local_engine())
    elif args.command == "download":
        cmd_download(args.engine)
    elif args.command == "install":
        cmd_install(args.archive, args.dest)


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
