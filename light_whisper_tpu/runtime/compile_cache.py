"""Persistent XLA compilation cache wiring + shipped-seed placement.

The reference ships a runtime that needs zero compilation at install
(prebuilt ``transcribe-cpp`` wheel, ``pyproject.toml:15``), and its shell
kills an engine that isn't ready in 120 s (``funasr_service.rs:273``).
This engine's production program set takes ~15 min to compile cold
(BENCH_r03: 920 s first compile), so compiled executables must travel
with the install:

- every engine process points JAX's persistent compilation cache at a
  durable per-install location (``LWT_JAX_CACHE_DIR`` env override, else
  ``<data_dir>/jax_cache``), so programs compile at most once per machine;
- a packaged engine archive carries a ``jax_cache/`` directory of
  pre-compiled executables (``scripts/package_engine.py``); on first
  start the entries are hard-linked (copy fallback) into the durable
  cache, making a fresh install's warmup a cache-hit walk instead of a
  compile storm. XLA keys entries by program/device/flags fingerprint, so
  merging is name-based and stale entries are simply never looked up.
"""

from __future__ import annotations

import os
from typing import Optional


def cache_dir() -> str:
    override = os.environ.get("LWT_JAX_CACHE_DIR")
    if override:
        return override
    from light_whisper_tpu.runtime.config import data_dir

    return os.path.join(data_dir(), "jax_cache")


def shipped_seed_dir() -> Optional[str]:
    """The ``jax_cache/`` directory the engine archive ships next to the
    package tree (``<engine_root>/jax_cache``), if present."""
    import light_whisper_tpu

    root = os.path.dirname(os.path.dirname(os.path.abspath(light_whisper_tpu.__file__)))
    seed = os.path.join(root, "jax_cache")
    return seed if os.path.isdir(seed) else None


def seed_cache(dest: str, seed: Optional[str] = None) -> int:
    """Merge shipped cache entries into ``dest`` (missing names only).

    Hard links when possible (same filesystem: zero copy, zero space),
    byte copy otherwise. Returns the number of entries placed. Never
    raises — a failed seed just means first-run compiles.
    """
    seed = seed or shipped_seed_dir()
    if not seed or not os.path.isdir(seed):
        return 0
    placed = 0
    try:
        os.makedirs(dest, exist_ok=True)
        for name in os.listdir(seed):
            src = os.path.join(seed, name)
            dst = os.path.join(dest, name)
            if not os.path.isfile(src) or os.path.exists(dst):
                continue
            try:
                os.link(src, dst)
            except OSError:
                import shutil

                shutil.copy2(src, dst)
            placed += 1
    except OSError:
        return placed
    return placed


def configure(logger=None) -> Optional[str]:
    """Point this process's JAX at the durable cache (idempotent).

    Returns the cache directory, or None when configuration failed (the
    engine still works — it just compiles every start)."""
    try:
        import jax

        dest = cache_dir()
        os.makedirs(dest, exist_ok=True)
        placed = seed_cache(dest)
        jax.config.update("jax_compilation_cache_dir", dest)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        if logger is not None:
            logger.info(
                "compilation cache at %s (%d shipped entries placed)", dest, placed
            )
        return dest
    except Exception as exc:  # never block serving on cache plumbing
        if logger is not None:
            logger.warning("compilation cache unavailable: %s", exc)
        return None
