"""ChatGPT/Codex OAuth sessions: device-code login, refresh, token encoding.

Portable core of the reference's OAuth service (``codex_oauth_service.rs``);
the browser-callback listener and OS keyring stay host-shell concerns. This
module covers:

- the device-code flow (`/api/accounts/deviceauth/usercode` → poll
  `/api/accounts/deviceauth/token` on 403/404 until authorized, 15 min cap),
- authorization-code/refresh-token/token-exchange grants against
  ``/oauth/token`` (form-encoded), including the id_token → API-key exchange,
- JWT claim decoding (email, chatgpt account id / plan type) to enrich a
  session without extra round trips,
- the bearer-material encodings the LLM client recognizes
  (``openai-codex-chatgpt:<b64url-json>`` and ``openai-codex-oauth-api-key:``),
- expiry-aware refresh with a 60 s skew.
"""

from __future__ import annotations

import base64
import dataclasses
import json
import secrets
import time
from typing import Any, Dict, Optional
from urllib.parse import urlencode

CLIENT_ID = "app_EMoamEEZ73f0CkXaXp7hrann"
ISSUER = "https://auth.openai.com"
CHATGPT_BEARER_PREFIX = "openai-codex-chatgpt:"
OAUTH_API_KEY_PREFIX = "openai-codex-oauth-api-key:"
REFRESH_SKEW_SECONDS = 60
DEVICE_POLL_MAX_SECONDS = 15 * 60


class OauthError(RuntimeError):
    pass


@dataclasses.dataclass
class OauthSession:
    id_token: str = ""
    access_token: str = ""
    refresh_token: str = ""
    api_key: str = ""
    expires_at_ms: Optional[int] = None
    account_id: Optional[str] = None
    email: Optional[str] = None
    plan_type: Optional[str] = None

    @property
    def logged_in(self) -> bool:
        return bool(self.access_token or self.api_key)

    def needs_refresh(self, now_ms: Optional[int] = None) -> bool:
        if self.expires_at_ms is None:
            return False
        now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
        return now_ms + REFRESH_SKEW_SECONDS * 1000 >= self.expires_at_ms


@dataclasses.dataclass
class DeviceCodeChallenge:
    verification_url: str
    user_code: str
    device_auth_id: str
    interval_secs: int


# ---------------------------------------------------------------------------
# token encodings (client-recognized bearer material)
# ---------------------------------------------------------------------------


def _b64url_decode(payload: str) -> bytes:
    padded = payload + "=" * (-len(payload) % 4)
    return base64.urlsafe_b64decode(padded)


def encode_chatgpt_bearer(access_token: str, account_id: Optional[str]) -> str:
    raw = json.dumps(
        {"access_token": access_token, "account_id": account_id}
    ).encode()
    return CHATGPT_BEARER_PREFIX + base64.urlsafe_b64encode(raw).decode().rstrip("=")


def decode_chatgpt_bearer(value: str) -> Optional[Dict[str, Any]]:
    value = value.strip()
    if not value.startswith(CHATGPT_BEARER_PREFIX):
        return None
    try:
        return json.loads(_b64url_decode(value[len(CHATGPT_BEARER_PREFIX) :]))
    except (ValueError, json.JSONDecodeError):
        return None


def encode_oauth_api_key(api_key: str) -> Optional[str]:
    api_key = api_key.strip()
    return f"{OAUTH_API_KEY_PREFIX}{api_key}" if api_key else None


def decode_oauth_api_key(value: str) -> Optional[str]:
    value = value.strip()
    if not value.startswith(OAUTH_API_KEY_PREFIX):
        return None
    payload = value[len(OAUTH_API_KEY_PREFIX) :]
    return payload if payload.strip() else None


def is_oauth_origin_auth(value: str) -> bool:
    return decode_chatgpt_bearer(value) is not None or decode_oauth_api_key(value) is not None


# ---------------------------------------------------------------------------
# JWT claims
# ---------------------------------------------------------------------------


def decode_jwt_claims(jwt: str) -> Dict[str, Any]:
    parts = jwt.split(".")
    if len(parts) != 3:
        return {}
    try:
        return json.loads(_b64url_decode(parts[1]))
    except (ValueError, json.JSONDecodeError):
        return {}


def enrich_session_from_tokens(session: OauthSession) -> OauthSession:
    claims = decode_jwt_claims(session.id_token) if session.id_token else {}
    profile = claims.get("https://api.openai.com/profile") or {}
    auth = claims.get("https://api.openai.com/auth") or {}
    session.email = claims.get("email") or profile.get("email") or session.email
    session.account_id = auth.get("chatgpt_account_id") or session.account_id
    session.plan_type = auth.get("chatgpt_plan_type") or session.plan_type
    if session.expires_at_ms is None and claims.get("exp"):
        session.expires_at_ms = int(claims["exp"]) * 1000
    return session


# ---------------------------------------------------------------------------
# flows
# ---------------------------------------------------------------------------


def generate_code_verifier() -> str:
    return secrets.token_urlsafe(48)[:64]


class CodexOauthClient:
    """OAuth flows against the OpenAI issuer (transport injectable)."""

    def __init__(self, transport=None, sleep=time.sleep, clock=time.monotonic):
        self._transport = transport or _UrllibOauthTransport()
        self._sleep = sleep
        self._clock = clock

    # -- device code -----------------------------------------------------

    def start_device_code_login(self) -> DeviceCodeChallenge:
        status, payload = self._transport.post_json(
            f"{ISSUER}/api/accounts/deviceauth/usercode", {"client_id": CLIENT_ID}
        )
        if status == 404:
            raise OauthError("设备码登录未启用，请使用浏览器登录。")
        if not 200 <= status < 300:
            raise OauthError(f"请求设备码失败 HTTP {status}")
        interval = payload.get("interval", 5)
        try:
            interval = max(1, int(interval))
        except (TypeError, ValueError):
            interval = 5
        return DeviceCodeChallenge(
            verification_url=f"{ISSUER}/codex/device",
            user_code=payload.get("user_code") or payload.get("usercode") or "",
            device_auth_id=payload["device_auth_id"],
            interval_secs=interval,
        )

    def complete_device_code_login(self, challenge: DeviceCodeChallenge) -> OauthSession:
        deadline = self._clock() + DEVICE_POLL_MAX_SECONDS
        interval = min(max(challenge.interval_secs, 1), 30)
        while True:
            status, payload = self._transport.post_json(
                f"{ISSUER}/api/accounts/deviceauth/token",
                {
                    "device_auth_id": challenge.device_auth_id,
                    "user_code": challenge.user_code,
                },
            )
            if 200 <= status < 300:
                code = (payload.get("authorization_code") or "").strip()
                verifier = (payload.get("code_verifier") or "").strip()
                if not code or not verifier:
                    raise OauthError("设备码授权响应缺少授权码，请重试。")
                tokens = self.exchange_code(
                    code, redirect_uri=f"{ISSUER}/deviceauth/callback", code_verifier=verifier
                )
                return self._session_from_tokens(tokens)
            if status in (403, 404):  # pending — user hasn't approved yet
                if self._clock() >= deadline:
                    raise OauthError("设备码登录超时，请重新开始登录。")
                self._sleep(interval)
                continue
            raise OauthError(f"设备码授权失败 HTTP {status}")

    # -- grants ------------------------------------------------------------

    def exchange_code(self, code: str, redirect_uri: str, code_verifier: str) -> Dict[str, Any]:
        return self._token_grant(
            {
                "grant_type": "authorization_code",
                "code": code,
                "redirect_uri": redirect_uri,
                "client_id": CLIENT_ID,
                "code_verifier": code_verifier,
            }
        )

    def refresh(self, session: OauthSession) -> OauthSession:
        tokens = self._token_grant(
            {
                "grant_type": "refresh_token",
                "refresh_token": session.refresh_token,
                "client_id": CLIENT_ID,
            }
        )
        refreshed = self._session_from_tokens(tokens)
        # A refresh response may omit fields; keep prior material.
        refreshed.refresh_token = refreshed.refresh_token or session.refresh_token
        refreshed.id_token = refreshed.id_token or session.id_token
        refreshed.api_key = refreshed.api_key or session.api_key
        refreshed.account_id = refreshed.account_id or session.account_id
        refreshed.email = refreshed.email or session.email
        refreshed.plan_type = refreshed.plan_type or session.plan_type
        return refreshed

    def ensure_fresh(self, session: OauthSession) -> OauthSession:
        return self.refresh(session) if session.needs_refresh() else session

    def exchange_id_token_for_api_key(self, id_token: str) -> str:
        payload = self._token_grant(
            {
                "grant_type": "urn:ietf:params:oauth:grant-type:token-exchange",
                "client_id": CLIENT_ID,
                "requested_token": "openai-api-key",
                "subject_token": id_token,
                "subject_token_type": "urn:ietf:params:oauth:token-type:id_token",
            }
        )
        return payload["access_token"]

    # ----------------------------------------------------------------------

    def _token_grant(self, form: Dict[str, str]) -> Dict[str, Any]:
        status, payload = self._transport.post_form(f"{ISSUER}/oauth/token", form)
        if not 200 <= status < 300:
            raise OauthError(f"OAuth token 请求失败 HTTP {status}")
        return payload

    def _session_from_tokens(self, tokens: Dict[str, Any]) -> OauthSession:
        session = OauthSession(
            id_token=tokens.get("id_token") or "",
            access_token=tokens.get("access_token") or "",
            refresh_token=tokens.get("refresh_token") or "",
        )
        if tokens.get("expires_in"):
            session.expires_at_ms = int(time.time() * 1000) + int(tokens["expires_in"]) * 1000
        return enrich_session_from_tokens(session)


class _UrllibOauthTransport:  # pragma: no cover - network edge
    def post_json(self, url: str, body: Dict[str, Any]):
        return self._post(url, json.dumps(body).encode(), "application/json")

    def post_form(self, url: str, form: Dict[str, str]):
        return self._post(url, urlencode(form).encode(), "application/x-www-form-urlencoded")

    def _post(self, url: str, data: bytes, content_type: str):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url, data=data, headers={"Content-Type": content_type}, method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, json.loads(resp.read().decode("utf-8", "replace"))
        except urllib.error.HTTPError as err:
            try:
                return err.code, json.loads(err.read().decode("utf-8", "replace"))
            except (ValueError, json.JSONDecodeError):
                return err.code, {}
