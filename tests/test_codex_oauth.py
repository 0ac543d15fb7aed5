"""Codex OAuth flows over a fake transport."""

import base64
import json
import time

import pytest

from light_whisper_tpu.llm.codex_oauth import (
    CLIENT_ID,
    CodexOauthClient,
    DeviceCodeChallenge,
    OauthError,
    OauthSession,
    decode_chatgpt_bearer,
    decode_jwt_claims,
    decode_oauth_api_key,
    encode_chatgpt_bearer,
    encode_oauth_api_key,
    enrich_session_from_tokens,
    is_oauth_origin_auth,
)


def make_jwt(claims):
    def seg(obj):
        return base64.urlsafe_b64encode(json.dumps(obj).encode()).decode().rstrip("=")

    return f"{seg({'alg': 'none'})}.{seg(claims)}.sig"


class FakeTransport:
    def __init__(self, script):
        self.script = list(script)  # [(url_suffix, status, payload)]
        self.calls = []

    def _next(self, url, body):
        self.calls.append((url, body))
        suffix, status, payload = self.script.pop(0)
        assert url.endswith(suffix), (url, suffix)
        return status, payload

    def post_json(self, url, body):
        return self._next(url, body)

    def post_form(self, url, form):
        return self._next(url, form)


def test_bearer_encodings_roundtrip():
    token = encode_chatgpt_bearer("at-123", "acct-9")
    assert decode_chatgpt_bearer(token) == {"access_token": "at-123", "account_id": "acct-9"}
    assert decode_chatgpt_bearer("nonsense") is None

    key = encode_oauth_api_key("sk-abc")
    assert decode_oauth_api_key(key) == "sk-abc"
    assert encode_oauth_api_key("   ") is None
    assert is_oauth_origin_auth(token) and is_oauth_origin_auth(key)
    assert not is_oauth_origin_auth("Bearer sk-plain")


def test_jwt_claims_enrich_session():
    jwt = make_jwt(
        {
            "exp": 1900000000,
            "email": "a@b.c",
            "https://api.openai.com/auth": {
                "chatgpt_account_id": "acct-1",
                "chatgpt_plan_type": "plus",
            },
        }
    )
    session = enrich_session_from_tokens(OauthSession(id_token=jwt))
    assert session.email == "a@b.c"
    assert session.account_id == "acct-1"
    assert session.plan_type == "plus"
    assert session.expires_at_ms == 1900000000 * 1000
    assert decode_jwt_claims("not-a-jwt") == {}


def test_device_code_flow_polls_until_authorized():
    jwt = make_jwt({"email": "u@x.y"})
    transport = FakeTransport(
        [
            ("/deviceauth/usercode", 200, {"device_auth_id": "d1", "user_code": "ABCD", "interval": "3"}),
            ("/deviceauth/token", 403, {}),  # pending
            ("/deviceauth/token", 403, {}),  # pending
            ("/deviceauth/token", 200, {"authorization_code": "authz", "code_verifier": "ver"}),
            ("/oauth/token", 200, {"access_token": "at", "refresh_token": "rt", "id_token": jwt, "expires_in": 3600}),
        ]
    )
    sleeps = []
    client = CodexOauthClient(transport=transport, sleep=sleeps.append, clock=lambda: 0)
    challenge = client.start_device_code_login()
    assert challenge.user_code == "ABCD" and challenge.interval_secs == 3

    session = client.complete_device_code_login(challenge)
    assert session.logged_in and session.access_token == "at"
    assert session.email == "u@x.y"
    assert sleeps == [3, 3]
    # the code exchange carried PKCE material
    grant = transport.calls[-1][1]
    assert grant["grant_type"] == "authorization_code"
    assert grant["code_verifier"] == "ver"
    assert grant["client_id"] == CLIENT_ID


def test_device_code_timeout():
    transport = FakeTransport([("/deviceauth/token", 403, {})] * 3)
    ticks = iter([0, 1000])  # past the 900 s cap on the second check

    client = CodexOauthClient(transport=transport, sleep=lambda s: None, clock=lambda: next(ticks))
    challenge = DeviceCodeChallenge("u", "CODE", "d1", 1)
    with pytest.raises(OauthError):
        client.complete_device_code_login(challenge)


def test_refresh_preserves_material_and_skew():
    jwt = make_jwt({"email": "keep@me"})
    session = OauthSession(
        id_token=jwt,
        access_token="old",
        refresh_token="rt-1",
        api_key="sk-old",
        expires_at_ms=int(time.time() * 1000) + 30_000,  # < 60 s skew → refresh
        email="keep@me",
    )
    assert session.needs_refresh()
    transport = FakeTransport(
        [("/oauth/token", 200, {"access_token": "new", "expires_in": 3600})]
    )
    client = CodexOauthClient(transport=transport)
    refreshed = client.ensure_fresh(session)
    assert refreshed.access_token == "new"
    assert refreshed.refresh_token == "rt-1"  # omitted in response → kept
    assert refreshed.api_key == "sk-old"
    assert refreshed.email == "keep@me"
    assert not refreshed.needs_refresh()
    form = transport.calls[0][1]
    assert form["grant_type"] == "refresh_token" and form["refresh_token"] == "rt-1"


def test_api_key_token_exchange():
    transport = FakeTransport([("/oauth/token", 200, {"access_token": "sk-live-1"})])
    client = CodexOauthClient(transport=transport)
    assert client.exchange_id_token_for_api_key("idtok") == "sk-live-1"
    form = transport.calls[0][1]
    assert form["grant_type"].endswith("token-exchange")
    assert form["requested_token"] == "openai-api-key"


def test_device_code_not_enabled():
    transport = FakeTransport([("/deviceauth/usercode", 404, {})])
    client = CodexOauthClient(transport=transport)
    with pytest.raises(OauthError):
        client.start_device_code_login()
