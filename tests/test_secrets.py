"""Secret store: keyring-parity addressing, permissions, migration."""

import json
import os
import stat

from light_whisper_tpu.storage.secrets import (
    SERVICE,
    SecretStore,
    online_asr_user,
    user_for_provider,
    web_search_user,
)


def test_user_naming_matches_reference():
    assert user_for_provider("openai") == "openai-api-key"
    assert user_for_provider("cerebras") == "cerebras-api-key"
    assert user_for_provider("my-vllm") == "custom-my-vllm-api-key"
    assert web_search_user("tavily") == "web-search-tavily-key"
    assert web_search_user("exa") is None  # keyless provider
    assert online_asr_user("glm-asr") == "glm-asr-api-key"
    assert online_asr_user("alibaba-asr", "domestic") == "alibaba-asr-cn-api-key"
    assert online_asr_user("alibaba-asr", "international") == "alibaba-asr-intl-api-key"


def test_roundtrip_delete_and_permissions(tmp_path):
    store = SecretStore(str(tmp_path / "secrets.json"))
    assert store.get_password(SERVICE, "openai-api-key") is None
    store.set_password(SERVICE, "openai-api-key", "sk-123")
    assert store.get_password(SERVICE, "openai-api-key") == "sk-123"
    mode = stat.S_IMODE(os.stat(tmp_path / "secrets.json").st_mode)
    assert mode == 0o600  # owner-only
    assert store.delete_password(SERVICE, "openai-api-key")
    assert not store.delete_password(SERVICE, "openai-api-key")
    assert store.get_password(SERVICE, "openai-api-key") is None


def test_corrupt_file_degrades_to_empty(tmp_path):
    path = tmp_path / "secrets.json"
    path.write_text("{not json")
    store = SecretStore(str(path))
    assert store.get_password(SERVICE, "x") is None
    store.set_password(SERVICE, "x", "v")  # write recovers the file
    assert json.loads(path.read_text())[SERVICE]["x"] == "v"


def test_legacy_custom_key_migration(tmp_path):
    store = SecretStore(str(tmp_path / "secrets.json"))
    store.set_password(SERVICE, "custom-api-key", "legacy-key")
    # migrates into the dedicated slot only when empty
    assert store.migrate_legacy_custom_key("my-provider")
    assert store.provider_api_key("my-provider") == "legacy-key"
    # second run is a no-op (target populated)
    store.set_password(SERVICE, "custom-api-key", "changed")
    assert not store.migrate_legacy_custom_key("my-provider")
    assert store.provider_api_key("my-provider") == "legacy-key"
    # the plain "custom" provider maps to the legacy slot itself → no-op
    assert not store.migrate_legacy_custom_key("custom")


def test_provider_convenience_api(tmp_path):
    store = SecretStore(str(tmp_path / "s.json"))
    store.set_provider_api_key("deepseek", "dsk")
    assert store.provider_api_key("deepseek") == "dsk"
    assert store.provider_api_key("missing") == ""
    store.set_password(SERVICE, "alibaba-asr-cn-api-key", "ali-cn")
    assert store.online_asr_api_key("alibaba-asr", "domestic") == "ali-cn"
    assert store.online_asr_api_key("glm-asr") == ""


def test_non_dict_bucket_degrades_to_no_key(tmp_path):
    import json

    from light_whisper_tpu.storage.secrets import SecretStore

    path = str(tmp_path / "secrets.json")
    with open(path, "w") as f:
        json.dump({"light-whisper": "oops-not-a-dict"}, f)
    store = SecretStore(path)
    assert store.get_password("light-whisper", "openai-api-key") is None
    assert store.delete_password("light-whisper", "openai-api-key") is False
    store.set_password("light-whisper", "openai-api-key", "sk-new")
    assert store.get_password("light-whisper", "openai-api-key") == "sk-new"


def test_legacy_custom_key_never_migrates_into_builtin_slots(tmp_path):
    from light_whisper_tpu.storage.secrets import SERVICE, SecretStore

    store = SecretStore(str(tmp_path / "secrets.json"))
    store.set_password(SERVICE, "custom-api-key", "sk-custom-legacy")
    # builtin provider: must NOT receive the custom endpoint's secret
    assert store.migrate_legacy_custom_key("openai") is False
    assert store.get_password(SERVICE, "openai-api-key") is None
    # custom provider id: migrates
    assert store.migrate_legacy_custom_key("my-endpoint") is True
    assert store.get_password(SERVICE, "custom-my-endpoint-api-key") == "sk-custom-legacy"
