"""Atomic engine configuration store (``engine.json``).

Behavior parity with the reference's config helpers
(``src-tauri/src/utils/paths.rs:51-338``):

- ``engine.json`` lives in the data dir; reads are tolerant (missing file,
  invalid JSON, or a non-object all read as an empty config);
- the active engine is whitelist-validated with ``qwen3-asr-0.6b`` as the
  fallback, so a corrupt or hand-edited config can never select an unknown
  engine;
- every write is a read-modify-write of the full object followed by an
  atomic replace (unique temp file in the same directory, fsync, then
  ``os.replace``) — a crash mid-write leaves either the old or the new
  config, never a torn file;
- region fields normalize to ``international`` unless explicitly
  ``domestic``; the Alibaba model id is NOT whitelisted (DashScope ships
  models faster than a hardcoded list could track) but is trimmed and
  validated for header-safe characters at the write entry.
"""

from __future__ import annotations

import itertools
import json
import os
import re
import tempfile
import threading
from typing import Any, Dict, Optional

VALID_ENGINES = ("qwen3-asr-0.6b", "qwen3-asr-1.7b", "glm-asr", "alibaba-asr")
DEFAULT_ENGINE = "qwen3-asr-0.6b"
ONLINE_ENGINES = ("glm-asr", "alibaba-asr")

GLM_ENDPOINT_INTERNATIONAL = "https://api.z.ai"
GLM_ENDPOINT_DOMESTIC = "https://open.bigmodel.cn"
ALIBABA_ENDPOINT_INTERNATIONAL = "https://dashscope-intl.aliyuncs.com"
ALIBABA_ENDPOINT_DOMESTIC = "https://dashscope.aliyuncs.com"
ALIBABA_DEFAULT_MODEL = "qwen3-asr-flash"

_WRITE_COUNTER = itertools.count(1)
_RMW_LOCK = threading.Lock()  # serialize in-process read-modify-writes


def data_dir() -> str:
    return os.environ.get(
        "LIGHT_WHISPER_DATA_DIR", os.path.join(tempfile.gettempdir(), "light-whisper")
    )


def engine_config_path() -> str:
    return os.path.join(data_dir(), "engine.json")


# -- atomic write ------------------------------------------------------------


def atomic_write(path: str, data: bytes) -> None:
    """Write-to-temp + fsync + rename; cleans the temp file on failure."""
    parent = os.path.dirname(path) or "."
    os.makedirs(parent, exist_ok=True)
    name = os.path.basename(path) or "atomic"
    tmp_path = os.path.join(
        parent, f".{name}.{os.getpid()}.{next(_WRITE_COUNTER)}.tmp"
    )
    try:
        fd = os.open(tmp_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            os.close(fd)
        os.replace(tmp_path, path)
    except OSError:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        raise


# -- engine.json object ---------------------------------------------------


def read_engine_json() -> Dict[str, Any]:
    try:
        with open(engine_config_path(), "r", encoding="utf-8") as f:
            value = json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}
    return value if isinstance(value, dict) else {}


def _write_engine_json(obj: Dict[str, Any]) -> None:
    serialized = json.dumps(obj, ensure_ascii=False, indent=2)
    atomic_write(engine_config_path(), serialized.encode("utf-8"))


def update_engine_json_field(key: str, value: str) -> None:
    with _RMW_LOCK:
        obj = read_engine_json()
        obj[key] = value
        _write_engine_json(obj)


# -- typed accessors -------------------------------------------------------


def read_engine_config() -> str:
    engine = read_engine_json().get("engine")
    return engine if engine in VALID_ENGINES else DEFAULT_ENGINE


def write_engine_config(engine: str) -> None:
    if engine not in VALID_ENGINES:
        raise ValueError(f"不支持的引擎: {engine}")
    update_engine_json_field("engine", engine)


def is_online_engine(engine: str) -> bool:
    return engine in ONLINE_ENGINES


def _read_region_field(field: str) -> str:
    return "domestic" if read_engine_json().get(field) == "domestic" else "international"


def read_glm_region() -> str:
    return _read_region_field("glm_endpoint")


def write_glm_region(region: str) -> None:
    _validate_region(region)
    update_engine_json_field("glm_endpoint", region)


def read_alibaba_region() -> str:
    return _read_region_field("alibaba_region")


def write_alibaba_region(region: str) -> None:
    _validate_region(region)
    update_engine_json_field("alibaba_region", region)


def _validate_region(region: str) -> None:
    if region not in ("international", "domestic"):
        raise ValueError(f"未知区域: {region}")


def read_alibaba_model() -> str:
    model = read_engine_json().get("alibaba_model")
    if isinstance(model, str) and model.strip():
        return model.strip()
    return ALIBABA_DEFAULT_MODEL


def write_alibaba_model(model: str) -> None:
    model = model.strip()
    # entry-point character validation (the read path trusts the store)
    if not model or not re.fullmatch(r"[A-Za-z0-9._\-]+", model):
        raise ValueError(f"非法模型 ID: {model!r}")
    update_engine_json_field("alibaba_model", model)


def read_glm_endpoint() -> str:
    return (
        GLM_ENDPOINT_DOMESTIC
        if read_glm_region() == "domestic"
        else GLM_ENDPOINT_INTERNATIONAL
    )


def read_alibaba_endpoint() -> str:
    return (
        ALIBABA_ENDPOINT_DOMESTIC
        if read_alibaba_region() == "domestic"
        else ALIBABA_ENDPOINT_INTERNATIONAL
    )


def read_online_asr_region() -> str:
    if read_engine_config() == "alibaba-asr":
        return read_alibaba_region()
    return read_glm_region()


def read_online_asr_endpoint() -> str:
    if read_engine_config() == "alibaba-asr":
        return read_alibaba_endpoint()
    return read_glm_endpoint()


def write_online_asr_endpoint(region: str) -> None:
    if read_engine_config() == "alibaba-asr":
        write_alibaba_region(region)
    else:
        write_glm_region(region)


def is_asr_capable_model_id(model_id: str) -> bool:
    """Filter DashScope's /v1/models list down to transcription-capable ids
    (paths.rs:99-127): asr/omni/audio/stt families in, known non-ASR
    families (realtime/tts/vl/coder/...) out."""
    lowered = model_id.lower()
    if not any(k in lowered for k in ("asr", "omni", "audio", "stt")):
        return False
    blocked = (
        "realtime", "tts", "embedding", "embed", "rerank", "caption",
        "coder", "math", "thinking", "image", "video-gen",
    )
    if any(b in lowered for b in blocked):
        return False
    if "-vl-" in lowered or lowered.endswith("-vl"):
        return False
    return True


# -- models directory (funasr.rs:444-735, paths.rs:420-434) -----------------


def remove_engine_json_field(key: str) -> None:
    with _RMW_LOCK:
        obj = read_engine_json()
        if key in obj:
            del obj[key]
            _write_engine_json(obj)


def read_models_dir() -> Optional[str]:
    """The custom models directory, or None when using the default cache."""
    value = read_engine_json().get("models_dir")
    if isinstance(value, str) and value.strip():
        return value.strip()
    return None


def get_effective_models_dir() -> str:
    """Where model repos actually live: custom override, else the HF cache."""
    custom = read_models_dir()
    if custom:
        return custom
    from light_whisper_tpu.download.cache import hf_cache_root

    return hf_cache_root()


def set_models_dir(
    path: Optional[str],
    migrate: bool = False,
    progress=None,
) -> Dict[str, Any]:
    """Point the engine at a new models directory, optionally migrating repos.

    Mirrors ``set_models_dir`` (``funasr.rs:484-633``): the migration is
    prepare-then-commit — every ``models--*`` repo is COPIED to the target
    (sources preserved) before the config is written, and sources are only
    removed after the new config is committed. A crash at any point leaves
    a usable state: either the old config with intact sources, or the new
    config with complete copies. Passing ``None``/empty restores the
    default directory.

    Returns ``{"message", "migrated", "cleanup_failures"}``.
    """
    from light_whisper_tpu.download.cache import (
        cleanup_migrated_sources,
        hf_cache_root,
        migrate_model_dirs,
    )

    restore_default = not (path and path.strip())
    old_dir = get_effective_models_dir()
    new_dir = hf_cache_root() if restore_default else os.path.abspath(path.strip())

    if restore_default:
        remove_engine_json_field("models_dir")
        return {"message": "已恢复默认模型目录", "migrated": 0, "cleanup_failures": []}

    os.makedirs(new_dir, exist_ok=True)
    sources = []
    if migrate and os.path.isdir(old_dir) and os.path.abspath(old_dir) != new_dir:
        sources = migrate_model_dirs(old_dir, new_dir, progress=progress)

    update_engine_json_field("models_dir", new_dir)

    cleanup_failures = cleanup_migrated_sources(sources) if sources else []
    return {
        "message": "模型目录已更新",
        "migrated": len(sources),
        "cleanup_failures": cleanup_failures,
    }
