#!/usr/bin/env python3
"""Full-scale real-artifact rehearsal through the PRODUCT install flow.

Every perf number so far rode the in-memory ``_random_params`` path the
bench uses. This script rehearses what a real user's machine does
(VERDICT r4 #6), end to end, at flagship scale:

1. **Build** a flagship-shaped artifact (1.7B by default — exact product
   dims from ``__graft_entry__._flagship_config``) with the GGUF writer:
   Q8_0 tensors, a full 151,936-entry vocab with the real Qwen special-token
   ids, and a Jinja chat template of the Qwen-Omni family (the kind real
   ``handy-computer/Qwen3-ASR-*-gguf`` artifacts carry).
2. **Snapshot** it into an HF cache layout with the completion manifest
   (sha256 + sizes), exactly what the downloader writes
   (``hf_cache_utils.py:143-180`` parity: ``download/cache.py``), and prove
   ``is_repo_ready`` + ``find_snapshot_file`` accept it.
3. **Package + install** the engine archive through
   ``scripts/package_engine.py`` → ``engine_cli install`` (staged atomic
   replace, ``funasr_service.rs:502-544`` parity), shipping the repo's
   compile cache like a release does.
4. **Serve from the INSTALLED engine** (fresh process, installed code, HF
   cache resolution — no LIGHT_WHISPER_MODEL_PATH shortcut), measure
   init-to-ready against the shell's budget, pull the GGUF load
   attribution (parse / host dequant-prep / HBM upload) from the wire
   ``stats`` action, and run growing-window transcribes over the wire.

Prints one JSON line with every phase timed. Run on the TPU host:

    python scripts/rehearse_real_artifact.py --model 1.7b
    python scripts/rehearse_real_artifact.py --model 0.6b --skip-build  # reuse workdir
"""

from __future__ import annotations

import argparse
import base64
import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Real Qwen3 special-token ids (config.py defaults = the product contract).
PAD_ID = 151_643  # <|endoftext|>
IM_START_ID = 151_644
IM_END_ID = 151_645
AUDIO_PAD_ID = 151_676
AUDIO_START_ID = 151_669
AUDIO_END_ID = 151_670

# Qwen-Omni-family Jinja template (the multimodal message-loop convention
# real artifacts ship; prompt.py renders it through the same sandboxed
# environment transformers uses).
JINJA_TEMPLATE = (
    "{% for message in messages %}"
    "{% if loop.first and message['role'] != 'system' %}"
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    "{% endif %}"
    "<|im_start|>{{ message['role'] }}\n"
    "{% if message['content'] is string %}"
    "{{ message['content'] }}<|im_end|>\n"
    "{% else %}"
    "{% for content in message['content'] %}"
    "{% if content['type'] == 'audio' or 'audio' in content or 'audio_url' in content %}"
    "<|audio_start|><|audio_pad|><|audio_end|>"
    "{% elif content['type'] == 'text' %}"
    "{{ content['text'] }}"
    "{% endif %}"
    "{% endfor %}"
    "<|im_end|>\n"
    "{% endif %}"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
)


def log(msg: str) -> None:
    print(f"[rehearse {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def flagship_vocab(vocab_size: int):
    """151,936 tokens with real special ids: 256 byte tokens, filler BPE
    pieces, and the Qwen specials at their product positions."""
    from light_whisper_tpu.models.qwen3_asr.tokenizer import byte_to_unicode

    b2u = byte_to_unicode()
    tokens = [b2u[b] for b in range(256)]
    tokens += [f"tok{i}" for i in range(256, vocab_size)]
    types = [1] * vocab_size
    for tid, text in (
        (PAD_ID, "<|endoftext|>"),
        (IM_START_ID, "<|im_start|>"),
        (IM_END_ID, "<|im_end|>"),
        (AUDIO_START_ID, "<|audio_start|>"),
        (AUDIO_PAD_ID, "<|audio_pad|>"),
        (AUDIO_END_ID, "<|audio_end|>"),
    ):
        tokens[tid] = text
        types[tid] = 3  # control
    return tokens, types


def build_artifact(size: str, path: str) -> dict:
    import __graft_entry__ as graft
    from helpers.tiny_model import tiny_tensors
    from light_whisper_tpu.models.qwen3_asr.export import write_model

    cfg = graft._flagship_config(size)
    t0 = time.perf_counter()
    log(f"generating {size} random tensors (exact product dims)…")
    tensors = tiny_tensors(cfg, seed=5)
    gen_s = time.perf_counter() - t0
    tokens, types = flagship_vocab(cfg.decoder.vocab_size)
    tokenizer_meta = {
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": types,
        "tokenizer.ggml.merges": [],
        "tokenizer.chat_template": JINJA_TEMPLATE,
    }
    t1 = time.perf_counter()
    log("writing GGUF (Q8_0 quantization happens in the writer)…")
    write_model(path, cfg, tensors, tokenizer_meta, quantize=True)
    write_s = time.perf_counter() - t1
    return {
        "tensor_gen_s": round(gen_s, 1),
        "gguf_write_s": round(write_s, 1),
        "artifact_bytes": os.path.getsize(path),
    }


def snapshot_into_cache(artifact: str, hf_root: str, engine: str) -> dict:
    """Lay the artifact out exactly as the downloader leaves a completed
    repo: snapshot dir + refs/main + completion manifest with sha256."""
    from light_whisper_tpu.download.cache import (
        MANIFEST_NAME,
        QWEN3_ASR_MODELS,
        find_snapshot_file,
        is_repo_ready,
        repo_dir,
    )

    spec = QWEN3_ASR_MODELS[engine]
    os.environ["HF_HUB_CACHE"] = hf_root
    base = repo_dir(spec["repo_id"])
    rev = "rehearsal0000000000000000000000000000000"
    snapshot = os.path.join(base, "snapshots", rev)
    os.makedirs(snapshot, exist_ok=True)
    os.makedirs(os.path.join(base, "refs"), exist_ok=True)
    with open(os.path.join(base, "refs", "main"), "w") as f:
        f.write(rev)

    dest = os.path.join(snapshot, spec["filename"])
    t0 = time.perf_counter()
    if os.path.abspath(artifact) != os.path.abspath(dest):
        shutil.move(artifact, dest)
    move_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    digest = hashlib.sha256()
    with open(dest, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            digest.update(chunk)
    sha_s = time.perf_counter() - t0
    manifest = {
        "repo_id": spec["repo_id"],
        "files": [
            {
                "path": spec["filename"],
                "size": os.path.getsize(dest),
                "sha256": digest.hexdigest(),
            }
        ],
    }
    with open(os.path.join(snapshot, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)

    t0 = time.perf_counter()
    ready = is_repo_ready(spec["repo_id"])  # full manifest re-validation
    validate_s = time.perf_counter() - t0
    resolved = find_snapshot_file(spec["repo_id"], spec["filename"])
    assert ready, "manifest validation rejected the rehearsal snapshot"
    assert resolved == dest, (resolved, dest)
    log(f"snapshot validated in {validate_s:.1f}s (sha256 {sha_s:.1f}s)")
    return {
        "snapshot_move_s": round(move_s, 1),
        "sha256_s": round(sha_s, 1),
        "cache_validate_s": round(validate_s, 1),
        "cache_ready": ready,
    }


def package_and_install(workdir: str) -> dict:
    from light_whisper_tpu.runtime.install import ensure_installed

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package_engine

    archive = os.path.join(workdir, "engine.tar.xz")
    t0 = time.perf_counter()
    package_engine.build_archive(
        archive, cache_dir=os.path.join(REPO, ".jax_cache")
    )
    package_s = time.perf_counter() - t0

    dest = os.path.join(workdir, "engine")
    t0 = time.perf_counter()
    result = ensure_installed(archive, dest)
    install_s = time.perf_counter() - t0
    log(f"packaged {package_s:.1f}s, installed {install_s:.1f}s → {result.engine_dir}")
    return {
        "archive_bytes": os.path.getsize(archive),
        "package_s": round(package_s, 1),
        "install_s": round(install_s, 1),
        "installed_path": result.engine_dir,
        "install_reused": not result.extracted,
    }


def serve_and_drive(installed: str, workdir: str, engine: str, hf_root: str) -> dict:
    """Fresh process serving the INSTALLED code; wire protocol only."""
    from light_whisper_tpu.eval.speechlike import speechlike
    from light_whisper_tpu.runtime.client import INIT_TIMEOUT_SECONDS

    # PREPEND the installed tree (replacing PYTHONPATH would drop the
    # host's entries — e.g. the axon relay registers its PJRT plugin via a
    # sitecustomize directory on PYTHONPATH, and losing it kills the TPU
    # backend with "Unable to initialize backend 'axon'").
    pythonpath = installed + (
        os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
    )
    env = dict(
        os.environ,
        HF_HUB_CACHE=hf_root,
        LIGHT_WHISPER_DATA_DIR=os.path.join(workdir, "data"),
        PYTHONPATH=pythonpath,
    )
    env.pop("LIGHT_WHISPER_MODEL_PATH", None)  # HF cache resolution only
    t_spawn = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "light_whisper_tpu.runtime.engine_cli",
         "serve", "--engine", engine],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
        cwd=installed,
        env=env,
    )
    try:
        init = json.loads(proc.stdout.readline())
        init_to_ready_s = time.perf_counter() - t_spawn
        assert init.get("success"), init
        log(f"init-to-ready {init_to_ready_s:.1f}s (budget {INIT_TIMEOUT_SECONDS}s)")

        rid = 0

        def send(cmd):
            nonlocal rid
            rid += 1
            cmd["request_id"] = rid
            proc.stdin.write(json.dumps(cmd) + "\n")
            proc.stdin.flush()
            resp = json.loads(proc.stdout.readline())
            assert resp.get("request_id") == rid, (rid, resp)
            return resp

        sr = 16_000
        base = np.asarray(speechlike(10.0, sr=sr))
        grown = np.concatenate([base, np.asarray(speechlike(0.5, sr=sr, seed=9))])

        def pcm(x):
            return base64.b64encode(
                np.clip(x * 32767, -32768, 32767).astype("<i2").tobytes()
            ).decode()

        ticks = []
        for trial in range(3):
            for window in (base, grown):
                t0 = time.perf_counter()
                r = send(
                    {
                        "action": "transcribe",
                        "audio_base64": pcm(window),
                        "audio_format": "pcm_s16le",
                        "sample_rate": sr,
                        "options": {"stream": "rehearsal"},
                    }
                )
                wall = (time.perf_counter() - t0) * 1000
                assert r.get("success"), r
                ticks.append(
                    {
                        "trial": trial,
                        "grown": window is grown,
                        "wall_ms": round(wall, 1),
                        "vad_ms": r.get("vad_ms"),
                        "inference_ms": r.get("inference_ms"),
                        "vad_segments": r.get("vad_segments"),
                    }
                )
                log(f"tick {ticks[-1]}")
        stats = send({"action": "stats"}).get("stats", {})
        send({"action": "exit"})
        rc = proc.wait(timeout=60)
        grown_walls = sorted(t["wall_ms"] for t in ticks if t["grown"] and t["trial"] > 0)
        return {
            "init_to_ready_s": round(init_to_ready_s, 1),
            "init_budget_s": INIT_TIMEOUT_SECONDS,
            "init_within_budget": init_to_ready_s <= INIT_TIMEOUT_SECONDS,
            "init_phases": stats.get("init_phases"),
            "ticks": ticks,
            "grown_tick_p50_ms": grown_walls[len(grown_walls) // 2] if grown_walls else None,
            "session_hit_rate": stats.get("session_hit_rate"),
            "server_rc": rc,
        }
    finally:
        if proc.poll() is None:
            proc.kill()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="1.7b", choices=["0.6b", "1.7b"])
    parser.add_argument("--workdir", default="/tmp/lwt_rehearsal")
    parser.add_argument(
        "--skip-build", action="store_true",
        help="reuse an existing workdir snapshot (iterate on serve only)",
    )
    parser.add_argument(
        "--keep", action="store_true", help="keep the workdir afterwards"
    )
    parser.add_argument(
        "--build-only", action="store_true",
        help="build + snapshot + package/install, skip the serve drive "
        "(lets the CPU-heavy build run while the chip is busy)",
    )
    args = parser.parse_args()

    engine = f"qwen3-asr-{args.model}"
    hf_root = os.path.join(args.workdir, "hf")
    report = {"engine": engine, "workdir": args.workdir}
    os.makedirs(args.workdir, exist_ok=True)

    if not args.skip_build:
        artifact = os.path.join(args.workdir, "artifact.gguf")
        report.update(build_artifact(args.model, artifact))
        report.update(snapshot_into_cache(artifact, hf_root, engine))
    else:
        os.environ["HF_HUB_CACHE"] = hf_root
    report.update(package_and_install(args.workdir))
    if not args.build_only:
        report.update(
            serve_and_drive(report["installed_path"], args.workdir, engine, hf_root)
        )
    print(json.dumps(report), flush=True)
    if not args.keep and not args.skip_build and not args.build_only:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
