#!/usr/bin/env python3
"""Build a distributable engine archive with staged atomic output.

Counterpart of the reference's packaging pipeline
(``scripts/build_engine.py`` + ``build.rs``): produce one compressed archive
a shell can download/extract, with

- a staged build directory renamed into place only when complete (a crash
  mid-build can never leave a half-written archive where a consumer looks),
- a ``.version`` fingerprint (sha256 of the archive) written next to it, the
  marker install-side code compares before atomically swapping engine dirs,
- an exclusion list keeping the bundle lean (tests, caches, build residue).

Usage:
    python scripts/package_engine.py --out dist/engine.tar.xz
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tarfile
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXCLUDE_DIRS = {
    "__pycache__",
    ".git",
    ".jax_cache",
    ".pytest_cache",
    "tests",
    "build",
    "dist",
    "*.egg-info",
}
EXCLUDE_SUFFIXES = (".pyc", ".pyo", ".o", ".log")
INCLUDE_TOP = ("light_whisper_tpu", "pyproject.toml", "README.md")


def _want(path: str) -> bool:
    parts = path.split(os.sep)
    for part in parts:
        if part in EXCLUDE_DIRS or part.endswith(".egg-info"):
            return False
    return not path.endswith(EXCLUDE_SUFFIXES)


def sha256_file(path: str) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def build_archive(
    out_path: str, source_root: str = REPO_ROOT, cache_dir: str | None = None
) -> str:
    """Create the archive atomically; returns its sha256 fingerprint.

    ``cache_dir``: a persistent XLA compilation-cache directory whose
    entries ship as ``jax_cache/`` inside the archive. A fresh install
    hard-links them into its durable cache (``runtime/compile_cache.py``)
    so warmup is a cache-hit walk — the reference's engine needs zero
    compilation at install (``build_engine.py:79-118``) and its shell
    kills engines not ready in 120 s (``funasr_service.rs:273``); without
    the shipped cache this engine's first compile is ~15 min (BENCH_r03).
    """
    out_dir = os.path.dirname(os.path.abspath(out_path)) or "."
    os.makedirs(out_dir, exist_ok=True)

    # Stage in the destination directory so the final rename is same-device
    # atomic (the reference stages next to the target for the same reason).
    fd, staging = tempfile.mkstemp(prefix=".engine-staging-", dir=out_dir)
    os.close(fd)
    try:
        with tarfile.open(staging, "w:xz") as tar:
            for top in INCLUDE_TOP:
                src = os.path.join(source_root, top)
                if not os.path.exists(src):
                    continue
                if os.path.isfile(src):
                    tar.add(src, arcname=top)
                    continue
                for root, dirs, files in os.walk(src):
                    dirs[:] = [d for d in dirs if _want(d)]
                    for name in files:
                        full = os.path.join(root, name)
                        rel = os.path.relpath(full, source_root)
                        if _want(rel):
                            tar.add(full, arcname=rel)
            if cache_dir and os.path.isdir(cache_dir):
                cache_names = [
                    n
                    for n in sorted(os.listdir(cache_dir))
                    if os.path.isfile(os.path.join(cache_dir, n))
                ]
                for name in cache_names:
                    tar.add(
                        os.path.join(cache_dir, name),
                        arcname=os.path.join("jax_cache", name),
                    )
                # The cold-start story rides these entries; a wiped cache
                # would silently ship a cold archive (first compile ~15 min
                # vs the shell's 120 s kill). Warn loudly — dev archives may
                # legitimately pack cold, a release should not.
                if not any(n.startswith("jit_decode_greedy-") for n in cache_names):
                    print(
                        "WARNING: cache_dir has no jit_decode_greedy-* entry — "
                        "the archive ships a COLD compile cache; run bench.py "
                        "(or the warmup ladder) first to seed it",
                        file=sys.stderr,
                    )
        fingerprint = sha256_file(staging)
        os.replace(staging, out_path)
    except BaseException:
        try:
            os.remove(staging)
        except OSError:
            pass
        raise

    version_path = out_path + ".version"
    tmp_version = version_path + ".tmp"
    with open(tmp_version, "w", encoding="utf-8") as f:
        f.write(fingerprint + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_version, version_path)
    return fingerprint


def build_native(source_root: str = REPO_ROOT) -> str | None:
    """Stage 1: compile the native host runtime so the archive ships a .so.

    Counterpart of the reference's PyInstaller + CUDA-provider stage
    (``build_engine.py:79-151``): the bundle must be runnable without a
    toolchain on the install host. Failure is non-fatal — the binding has
    numpy fallbacks — but is reported.
    """
    sys.path.insert(0, source_root)
    try:
        from light_whisper_tpu.native.binding import build_library

        return build_library(force=True)
    except Exception as exc:  # pragma: no cover - toolchain-dependent
        print(f"warning: native build skipped ({exc})", file=sys.stderr)
        return None
    finally:
        sys.path.pop(0)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="dist/light-whisper-tpu-engine.tar.xz")
    parser.add_argument(
        "--skip-native", action="store_true", help="don't compile the C++ runtime"
    )
    parser.add_argument(
        "--cache-dir",
        default=os.path.join(REPO_ROOT, ".jax_cache"),
        help="XLA compilation cache to ship as jax_cache/ (cold-start seed); "
        "pass an empty string to ship none",
    )
    args = parser.parse_args()

    print("step 1/3: native runtime")
    if args.skip_native:
        print("  skipped (--skip-native)")
    else:
        lib = build_native()
        print(f"  {'built ' + lib if lib else 'unavailable (numpy fallbacks ship instead)'}")

    print("step 2/3: stage + prune (tests, caches, build residue excluded)")
    print("step 3/3: archive (staged, atomic) + fingerprint stamp")
    cache = args.cache_dir or None
    if cache and not os.path.isdir(cache):
        print(f"  note: no compile cache at {cache} — shipping none (cold installs compile)")
        cache = None
    elif cache:
        n = sum(1 for f in os.listdir(cache) if os.path.isfile(os.path.join(cache, f)))
        print(f"  shipping {n} compiled-program cache entries from {cache}")
    fingerprint = build_archive(args.out, cache_dir=cache)
    size = os.path.getsize(args.out)
    print(f"wrote {args.out} ({size / 1e6:.1f} MB, sha256={fingerprint})")
    print(f"stamped {args.out}.version")


if __name__ == "__main__":
    main()
