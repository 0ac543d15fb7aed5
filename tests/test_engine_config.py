"""Atomic engine.json store tests (reference: utils/paths.rs:51-338)."""

import json
import os
import threading

import pytest

from light_whisper_tpu.runtime import config


@pytest.fixture(autouse=True)
def _data_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("LIGHT_WHISPER_DATA_DIR", str(tmp_path))
    yield tmp_path


def test_missing_invalid_and_nonobject_read_as_empty(tmp_path):
    assert config.read_engine_json() == {}
    path = config.engine_config_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, "w").write("{not json")
    assert config.read_engine_json() == {}
    open(path, "w").write('["an", "array"]')
    assert config.read_engine_json() == {}


def test_engine_whitelist_with_default():
    assert config.read_engine_config() == "qwen3-asr-0.6b"
    config.write_engine_config("qwen3-asr-1.7b")
    assert config.read_engine_config() == "qwen3-asr-1.7b"
    config.update_engine_json_field("engine", "whisper-9000")  # hand-edited junk
    assert config.read_engine_config() == "qwen3-asr-0.6b"
    with pytest.raises(ValueError):
        config.write_engine_config("whisper-9000")


def test_rmw_preserves_other_fields():
    config.write_engine_config("glm-asr")
    config.write_glm_region("domestic")
    config.write_alibaba_model("qwen3-omni-flash")
    obj = config.read_engine_json()
    assert obj == {
        "engine": "glm-asr",
        "glm_endpoint": "domestic",
        "alibaba_model": "qwen3-omni-flash",
    }


def test_atomic_write_leaves_no_temp_files(tmp_path):
    config.write_engine_config("qwen3-asr-0.6b")
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    assert leftovers == []
    # file is valid JSON right after the replace
    assert json.load(open(config.engine_config_path()))["engine"] == "qwen3-asr-0.6b"


def test_concurrent_field_updates_lose_no_writes():
    def writer(field, value):
        for _ in range(20):
            config.update_engine_json_field(field, value)

    threads = [
        threading.Thread(target=writer, args=(f"field{i}", f"v{i}")) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    obj = config.read_engine_json()
    assert {obj[f"field{i}"] for i in range(4)} == {"v0", "v1", "v2", "v3"}


def test_regions_normalize_and_endpoints_follow():
    assert config.read_glm_region() == "international"
    assert config.read_glm_endpoint() == config.GLM_ENDPOINT_INTERNATIONAL
    config.write_glm_region("domestic")
    assert config.read_glm_endpoint() == config.GLM_ENDPOINT_DOMESTIC
    config.update_engine_json_field("glm_endpoint", "mars")  # junk → international
    assert config.read_glm_region() == "international"
    with pytest.raises(ValueError):
        config.write_alibaba_region("lunar")


def test_online_engine_routing():
    assert not config.is_online_engine("qwen3-asr-0.6b")
    assert config.is_online_engine("alibaba-asr")
    config.write_engine_config("alibaba-asr")
    config.write_online_asr_endpoint("domestic")
    assert config.read_alibaba_region() == "domestic"
    assert config.read_online_asr_endpoint() == config.ALIBABA_ENDPOINT_DOMESTIC
    config.write_engine_config("glm-asr")
    assert config.read_online_asr_endpoint() == config.GLM_ENDPOINT_INTERNATIONAL


def test_alibaba_model_validation_and_default():
    assert config.read_alibaba_model() == config.ALIBABA_DEFAULT_MODEL
    config.write_alibaba_model("  qwen3.5-omni-plus  ")
    assert config.read_alibaba_model() == "qwen3.5-omni-plus"
    with pytest.raises(ValueError):
        config.write_alibaba_model("bad model\nid")


def test_asr_capable_model_filter():
    assert config.is_asr_capable_model_id("qwen3-asr-flash")
    assert config.is_asr_capable_model_id("qwen3-omni-plus")
    assert not config.is_asr_capable_model_id("qwen3-coder")
    assert not config.is_asr_capable_model_id("qwen-audio-realtime")
    assert not config.is_asr_capable_model_id("qwen3-vl")
    assert not config.is_asr_capable_model_id("omni-tts-pro")


def test_cli_serve_defaults_to_config_store(monkeypatch):
    from light_whisper_tpu.runtime import engine_cli

    monkeypatch.delenv("LIGHT_WHISPER_ASR_ENGINE", raising=False)
    config.write_engine_config("qwen3-asr-1.7b")
    assert engine_cli._configured_local_engine() == "qwen3-asr-1.7b"
    # online engines can't be served locally → default
    config.write_engine_config("glm-asr")
    assert engine_cli._configured_local_engine() == "qwen3-asr-0.6b"
    # env wins over the store
    monkeypatch.setenv("LIGHT_WHISPER_ASR_ENGINE", "qwen3-asr-1.7b")
    assert engine_cli._configured_local_engine() == "qwen3-asr-1.7b"


# -- models directory management (funasr.rs:444-735) --------------------------


def test_models_dir_set_and_restore(tmp_path, monkeypatch):
    from light_whisper_tpu.runtime import config

    monkeypatch.setenv("LIGHT_WHISPER_DATA_DIR", str(tmp_path / "data"))
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "default_cache"))

    assert config.read_models_dir() is None
    assert config.get_effective_models_dir() == str(tmp_path / "default_cache")

    custom = tmp_path / "custom_models"
    result = config.set_models_dir(str(custom))
    assert result["message"] == "模型目录已更新"
    assert config.read_models_dir() == str(custom)
    assert config.get_effective_models_dir() == str(custom)

    restored = config.set_models_dir(None)
    assert restored["message"] == "已恢复默认模型目录"
    assert config.read_models_dir() is None


def test_models_dir_migration_moves_repos_crash_safely(tmp_path, monkeypatch):
    from light_whisper_tpu.runtime import config

    monkeypatch.setenv("LIGHT_WHISPER_DATA_DIR", str(tmp_path / "data"))
    old = tmp_path / "old_cache"
    monkeypatch.setenv("HF_HUB_CACHE", str(old))
    repo = old / "models--org--model" / "snapshots" / "abc"
    repo.mkdir(parents=True)
    (repo / "weights.gguf").write_bytes(b"W" * 64)
    (old / "not-a-repo").mkdir()  # ignored by migration

    new = tmp_path / "new_cache"
    events = []
    result = config.set_models_dir(str(new), migrate=True, progress=events.append)
    assert result["migrated"] == 1
    assert result["cleanup_failures"] == []
    migrated = new / "models--org--model" / "snapshots" / "abc" / "weights.gguf"
    assert migrated.read_bytes() == b"W" * 64
    assert not (old / "models--org--model").exists()  # source cleaned up
    assert (old / "not-a-repo").exists()  # unrelated dirs untouched
    assert events and events[-1]["progress"] == 100


def test_models_dir_rejects_nested_destination(tmp_path, monkeypatch):
    import pytest

    from light_whisper_tpu.download.cache import migrate_model_dirs

    src = tmp_path / "cache"
    (src / "models--a--b").mkdir(parents=True)
    with pytest.raises(ValueError, match="内部"):
        migrate_model_dirs(str(src), str(src / "sub"))
