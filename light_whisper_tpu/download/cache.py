"""HuggingFace cache layout: model registry, readiness checks, resolution.

Behavior parity with the reference's cache tooling
(``hf_cache_utils.py:11-204``), which both the Python engine and the Rust
shell rely on:

- cache root priority: ``HF_HUB_CACHE`` > ``HF_HOME``/hub > ``~/.cache``;
- a repo is "ready" when some snapshot either carries a completion manifest
  (``.light_whisper_complete.json`` — every listed file present with exact
  size and, when given, sha256) or passes the legacy >1 MB weight scan;
- exact-file resolution honors ``refs/main`` first and never confuses other
  quantizations in the same repo.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Dict, List, Optional

QWEN3_ASR_MODELS: Dict[str, Dict] = {
    "qwen3-asr-0.6b": {
        "repo_id": "handy-computer/Qwen3-ASR-0.6B-gguf",
        "filename": "Qwen3-ASR-0.6B-Q8_0.gguf",
        "revision": "e4e16599b900eb0cb36e524514756bb92eb092b7",
        "size": 850_423_456,
        "sha256": "f081b2d5e23bd669d92cc331d722a8a0681943b8e6f34b48996fd5c319b5acd8",
    },
    "qwen3-asr-1.7b": {
        "repo_id": "handy-computer/Qwen3-ASR-1.7B-gguf",
        "filename": "Qwen3-ASR-1.7B-Q8_0.gguf",
        "revision": "92282af1610a2db19d66f2bef1e260f5deca782d",
        "size": 2_185_030_624,
        "sha256": "9a0d81792dfea2d5f278b8a63deb3ea6e02139ce42c2301f32ea19c4f77526b7",
    },
}

WEIGHT_EXTENSIONS = (".pt", ".bin", ".safetensors", ".onnx", ".gguf")
MIN_WEIGHT_SIZE = 1_000_000
MANIFEST_NAME = ".light_whisper_complete.json"


def hf_cache_root() -> str:
    explicit = os.environ.get("HF_HUB_CACHE")
    if explicit:
        return explicit
    home = os.environ.get("HF_HOME")
    if home:
        return os.path.join(home, "hub")
    return os.path.join(os.path.expanduser("~"), ".cache", "huggingface", "hub")


def repo_dir(repo_id: str) -> str:
    return os.path.join(hf_cache_root(), "models--" + repo_id.replace("/", "--"))


def is_repo_ready(repo_id: str) -> bool:
    snapshots = os.path.join(repo_dir(repo_id), "snapshots")
    if not os.path.isdir(snapshots):
        return False
    for name in os.listdir(snapshots):
        snapshot = os.path.join(snapshots, name)
        if not os.path.isdir(snapshot):
            continue
        if _manifest_validates(snapshot) or _legacy_weights_present(snapshot):
            return True
    return False


def find_snapshot_file(repo_id: str, filename: str) -> Optional[str]:
    base = repo_dir(repo_id)
    snapshots = os.path.join(base, "snapshots")
    if not os.path.isdir(snapshots):
        return None

    ordered = []
    try:
        with open(os.path.join(base, "refs", "main"), "r", encoding="utf-8") as f:
            ordered.append(f.read().strip())
    except OSError:
        pass
    ordered.extend(n for n in os.listdir(snapshots) if n not in ordered)

    rel = filename.replace("/", os.sep)
    for name in ordered:
        snapshot = os.path.join(snapshots, name)
        candidate = os.path.join(snapshot, rel)
        try:
            size = os.path.getsize(candidate)
        except OSError:
            continue
        if size < MIN_WEIGHT_SIZE:
            continue
        manifest_path = os.path.join(snapshot, MANIFEST_NAME)
        try:
            with open(manifest_path, "r", encoding="utf-8") as f:
                manifest = json.load(f)
            entry = next(
                (item for item in manifest.get("files", []) if item.get("path") == filename),
                None,
            )
            if entry is None or entry.get("size") != size:
                continue
        except (OSError, json.JSONDecodeError):
            pass  # legacy caches predate the manifest
        return candidate
    return None


def cleanup_incomplete_blobs(repo_id: str) -> int:
    blobs = os.path.join(repo_dir(repo_id), "blobs")
    if not os.path.isdir(blobs):
        return 0
    removed = 0
    for root, _dirs, files in os.walk(blobs):
        for name in files:
            if name.endswith(".incomplete"):
                try:
                    os.remove(os.path.join(root, name))
                    removed += 1
                except OSError:
                    pass
    return removed


def sha256_file(path: str) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def _manifest_validates(snapshot: str) -> bool:
    try:
        with open(os.path.join(snapshot, MANIFEST_NAME), "r", encoding="utf-8") as f:
            manifest = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    files = manifest.get("files")
    if not isinstance(files, list) or not files:
        return False

    saw_weight = False
    for item in files:
        if not isinstance(item, dict):
            return False
        rel = item.get("path")
        size = item.get("size")
        digest = item.get("sha256")
        if not isinstance(rel, str) or not isinstance(size, int):
            return False
        if digest is not None and not isinstance(digest, str):
            return False
        normalized = rel.replace("\\", "/")
        if os.path.isabs(rel) or ".." in normalized.split("/"):
            return False
        path = os.path.join(snapshot, normalized.replace("/", os.sep))
        try:
            actual = os.path.getsize(path)
        except OSError:
            return False
        if actual != size:
            return False
        if digest and sha256_file(path).lower() != digest.lower():
            return False
        if rel.endswith(WEIGHT_EXTENSIONS) and actual >= MIN_WEIGHT_SIZE:
            saw_weight = True
    return saw_weight


def _legacy_weights_present(snapshot: str) -> bool:
    found = False
    for root, _dirs, files in os.walk(snapshot):
        for name in files:
            if name.endswith(".incomplete"):
                return False
            if name.endswith(WEIGHT_EXTENSIONS):
                try:
                    if os.path.getsize(os.path.join(root, name)) >= MIN_WEIGHT_SIZE:
                        found = True
                except OSError:
                    return False
    return found


# ---------------------------------------------------------------------------
# models-directory migration (funasr.rs:635-720)
# ---------------------------------------------------------------------------


def migrate_model_dirs(src: str, dst: str, progress=None) -> List[str]:
    """Prepare-copy every ``models--*`` repo from ``src`` into ``dst``.

    Sources are PRESERVED — the caller removes them only after the new
    directory is committed to config (crash-safe ordering). The target may
    already hold partial copies; they are completed/overwritten. Refuses a
    destination nested inside the source. Returns the copied source paths.
    """
    canonical_src = os.path.realpath(src)
    canonical_dst = os.path.realpath(dst)
    if canonical_dst == canonical_src or canonical_dst.startswith(
        canonical_src + os.sep
    ):
        raise ValueError("目标模型目录不能位于当前模型目录内部")

    entries = [
        name
        for name in sorted(os.listdir(src))
        if name.startswith("models--") and os.path.isdir(os.path.join(src, name))
    ]
    copied: List[str] = []
    for i, name in enumerate(entries):
        src_path = os.path.join(src, name)
        dst_path = os.path.join(dst, name)
        shutil.copytree(src_path, dst_path, dirs_exist_ok=True)
        copied.append(src_path)
        if progress is not None:
            progress(
                {
                    "status": "migrating",
                    "message": f"正在迁移 {i + 1}/{len(entries)}...",
                    "progress": round((i + 1) / len(entries) * 100.0),
                }
            )
    return copied


def cleanup_migrated_sources(sources: List[str]) -> List[str]:
    """Remove migrated source repos; failures are reported, never raised —
    a locked file must not invalidate a completed migration."""
    failures: List[str] = []
    for source in sources:
        try:
            shutil.rmtree(source)
        except OSError as exc:
            failures.append(f"{source} — {exc}")
    return failures
