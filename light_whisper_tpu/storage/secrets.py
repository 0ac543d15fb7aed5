"""File-backed secret store: the engine's analogue of the OS keyring.

The reference keeps every API key in the platform keyring under service
``light-whisper`` with per-provider user names
(``llm_provider.rs:1294-1302``, ``assistant.rs:289-296``,
``funasr.rs:139-149``) and migrates legacy entries at startup
(``lib.rs:52-75``). An OS keyring is host-shell infrastructure; the portable
engine equivalent is a single JSON file in the data directory with owner-only
permissions, atomic replace on write, and the same (service, user) addressing
so shell integrations can swap in a real keyring without touching callers.

What carries over exactly:

- per-provider user naming (``user_for_provider``): builtin providers get
  fixed names, custom providers ``custom-<id>-api-key``;
- online-ASR key selection by engine + region;
- web-search provider keys (Tavily/Google only — Exa is keyless, model-native
  search uses the LLM provider's own key);
- the legacy ``custom-api-key`` → ``custom-<id>-api-key`` migration, only
  when the target entry is absent/empty.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Optional

SERVICE = "light-whisper"
_FILENAME = "secrets.json"

GLM_ASR_USER = "glm-asr-api-key"
ALIBABA_ASR_CN_USER = "alibaba-asr-cn-api-key"
ALIBABA_ASR_INTL_USER = "alibaba-asr-intl-api-key"

_BUILTIN_USERS = {
    "openai": "openai-api-key",
    "deepseek": "deepseek-api-key",
    "siliconflow": "siliconflow-api-key",
    "custom": "custom-api-key",
    "cerebras": "cerebras-api-key",
}

_WEB_SEARCH_USERS = {
    "tavily": "web-search-tavily-key",
    "google": "web-search-google-key",
}


def user_for_provider(provider: str) -> str:
    """Per-backend secret slot (``keyring_user_for_provider``)."""
    return _BUILTIN_USERS.get(provider, f"custom-{provider}-api-key")


def web_search_user(provider: str) -> Optional[str]:
    """Search providers that need a stored key; Exa/model-native are keyless."""
    return _WEB_SEARCH_USERS.get(provider)


def online_asr_user(engine: str, alibaba_region: str = "international") -> str:
    """Which slot the active online ASR engine reads
    (``active_online_keyring_user``)."""
    if engine == "alibaba-asr":
        return ALIBABA_ASR_CN_USER if alibaba_region == "domestic" else ALIBABA_ASR_INTL_USER
    return GLM_ASR_USER


class SecretStore:
    """(service, user) → secret, persisted with 0600 perms + atomic replace."""

    def __init__(self, path: Optional[str] = None) -> None:
        if path is None:
            from light_whisper_tpu.runtime.config import data_dir

            path = os.path.join(data_dir(), _FILENAME)
        self._path = path
        self._lock = threading.Lock()

    # -- persistence --------------------------------------------------------

    def _load(self) -> Dict[str, Dict[str, str]]:
        try:
            with open(self._path, "r", encoding="utf-8") as f:
                value = json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}
        return value if isinstance(value, dict) else {}

    def _save(self, data: Dict[str, Dict[str, str]]) -> None:
        directory = os.path.dirname(self._path) or "."
        os.makedirs(directory, exist_ok=True)
        tmp = f"{self._path}.tmp.{os.getpid()}"
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(data, f, ensure_ascii=False, indent=2)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    # -- keyring surface ----------------------------------------------------

    def get_password(self, service: str, user: str) -> Optional[str]:
        with self._lock:
            bucket = self._load().get(service)
            # a corrupted-but-valid-JSON bucket (string/list) degrades to
            # "no key", same as an unparseable file — not an AttributeError
            # on every lookup
            value = bucket.get(user) if isinstance(bucket, dict) else None
        return value if isinstance(value, str) and value else None

    def set_password(self, service: str, user: str, secret: str) -> None:
        with self._lock:
            data = self._load()
            if not isinstance(data.get(service), dict):
                data[service] = {}
            data[service][user] = secret
            self._save(data)

    def delete_password(self, service: str, user: str) -> bool:
        with self._lock:
            data = self._load()
            bucket = data.get(service)
            if not isinstance(bucket, dict) or user not in bucket:
                return False
            del bucket[user]
            if not bucket:
                del data[service]
            self._save(data)
            return True

    # -- startup migration (lib.rs:52-75) ------------------------------------

    def migrate_legacy_custom_key(self, active_provider: str) -> bool:
        """Copy the legacy shared ``custom-api-key`` into the active custom
        provider's dedicated slot, only when the target is absent/empty.
        Returns True when a migration happened."""
        if active_provider in _BUILTIN_USERS:
            # The migration exists for CUSTOM provider ids only
            # (lib.rs:53 gates on the migrated-custom active provider);
            # copying the legacy custom key into a builtin slot would make
            # e.g. OpenAI requests authenticate with the custom endpoint's
            # secret.
            return False
        target_user = user_for_provider(active_provider)
        if target_user == "custom-api-key":
            return False  # the legacy slot IS the target
        if self.get_password(SERVICE, target_user):
            return False
        legacy = self.get_password(SERVICE, "custom-api-key")
        if not legacy:
            return False
        self.set_password(SERVICE, target_user, legacy)
        return True

    # -- convenience (provider-level API used by the engine) ----------------

    def provider_api_key(self, provider: str) -> str:
        return self.get_password(SERVICE, user_for_provider(provider)) or ""

    def set_provider_api_key(self, provider: str, secret: str) -> None:
        self.set_password(SERVICE, user_for_provider(provider), secret)

    def online_asr_api_key(self, engine: str, alibaba_region: str = "international") -> str:
        return self.get_password(SERVICE, online_asr_user(engine, alibaba_region)) or ""
