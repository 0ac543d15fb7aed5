"""Protocol contract tests over in-memory pipes.

Mirrors the robustness contracts the reference pins on the Rust client side
(``funasr_service.rs:1978-2072``) and the Python dispatch loop
(``server_common.py:339-437``).
"""

import io
import json

from light_whisper_tpu.runtime.server import EngineServer, ServerHooks


def _hooks(**overrides):
    base = dict(
        initialize=lambda: {"success": True, "message": "ready", "engine": "fake"},
        transcribe=lambda **kw: {"success": True, "text": "hi", "input_mode": "memory"},
        status=lambda: {"success": True, "initialized": True},
        stats=lambda: {"transcription_count": 0},
    )
    base.update(overrides)
    return ServerHooks(**base)


def run_server(lines, hooks=None):
    stdin = io.StringIO("".join(line + "\n" for line in lines))
    stdout = io.StringIO()
    EngineServer(hooks or _hooks(), stdin=stdin, stdout=stdout).run()
    return [json.loads(line) for line in stdout.getvalue().splitlines()]


def test_init_result_is_first_line():
    out = run_server([])
    assert out[0] == {"success": True, "message": "ready", "engine": "fake"}


def test_request_id_echoed_on_every_action():
    out = run_server(
        [
            json.dumps({"action": "status", "request_id": 7}),
            json.dumps({"action": "stats", "request_id": 8}),
            json.dumps({"action": "cleanup", "request_id": 9}),
        ]
    )
    assert [r.get("request_id") for r in out[1:]] == [7, 8, 9]
    assert out[2]["stats"] == {"transcription_count": 0}


def test_legacy_commands_without_request_id_still_answered():
    out = run_server([json.dumps({"action": "status"})])
    assert "request_id" not in out[1]
    assert out[1]["success"] is True


def test_invalid_json_line_gets_error_without_request_id():
    out = run_server(["this is not json", json.dumps({"action": "status", "request_id": 1})])
    assert out[1]["success"] is False
    assert "request_id" not in out[1]
    # The loop must survive garbage and keep serving.
    assert out[2]["request_id"] == 1


def test_unknown_action_is_reported():
    out = run_server([json.dumps({"action": "fly", "request_id": 3})])
    assert out[1]["success"] is False
    assert "fly" in out[1]["error"]
    assert out[1]["request_id"] == 3


def test_exit_echoes_request_id_and_stops_loop():
    out = run_server(
        [
            json.dumps({"action": "exit", "request_id": 5}),
            json.dumps({"action": "status", "request_id": 6}),
        ]
    )
    assert out[1]["request_id"] == 5
    assert len(out) == 2  # nothing served after exit


def test_blank_lines_are_skipped():
    out = run_server(["", "   ", json.dumps({"action": "status", "request_id": 2})])
    assert len(out) == 2
    assert out[1]["request_id"] == 2


def test_transcribe_hook_receives_all_fields():
    seen = {}

    def transcribe(**kw):
        seen.update(kw)
        return {"success": True, "text": "", "input_mode": "memory"}

    cmd = {
        "action": "transcribe",
        "request_id": 11,
        "audio_base64": "AAAA",
        "audio_format": "pcm_s16le",
        "sample_rate": 16000,
        "hot_words": ["foo"],
    }
    out = run_server([json.dumps(cmd)], hooks=_hooks(transcribe=transcribe))
    assert out[1]["request_id"] == 11
    assert seen["audio_base64"] == "AAAA"
    assert seen["sample_rate"] == 16000
    assert seen["hot_words"] == ["foo"]
    assert seen["audio_path"] is None


def test_hook_exception_becomes_error_response_with_traceback():
    def boom(**kw):
        raise RuntimeError("kaboom")

    out = run_server(
        [json.dumps({"action": "transcribe", "request_id": 4})],
        hooks=_hooks(transcribe=boom),
    )
    assert out[1]["success"] is False
    assert "kaboom" in out[1]["error"]
    assert out[1]["request_id"] == 4
    assert "traceback" in out[1]


def test_failing_initialize_still_emits_init_line():
    def bad_init():
        raise RuntimeError("no model")

    out = run_server([], hooks=_hooks(initialize=bad_init))
    assert out[0]["success"] is False
    assert "no model" in out[0]["error"]


def test_bool_request_id_is_not_an_id():
    out = run_server([json.dumps({"action": "status", "request_id": True})])
    assert "request_id" not in out[1]


def test_fuzz_garbage_never_kills_the_loop():
    """50 adversarial lines → one response each (or skip for blanks), then a
    normal command still works. The loop must never die from a request
    (reference contract: server_common.py:339-437)."""
    import random

    rng = random.Random(42)
    garbage = []
    for _ in range(50):
        kind = rng.randrange(6)
        if kind == 0:
            garbage.append("".join(chr(rng.randrange(32, 0x2FFF)) for _ in range(rng.randrange(1, 80))))
        elif kind == 1:  # valid JSON, wrong shape
            garbage.append(json.dumps(rng.choice([[], 42, "str", None, True, {"no_action": 1}])))
        elif kind == 2:  # huge / weird request ids
            garbage.append(json.dumps({"action": "status", "request_id": rng.choice([2**63, -1, 0.5, "x", None])}))
        elif kind == 3:  # unknown actions with nested junk
            garbage.append(json.dumps({"action": "x" * rng.randrange(1, 200), "payload": {"a": [1, {"b": None}]}}))
        elif kind == 4:  # truncated / mixed JSON
            s = json.dumps({"action": "transcribe", "audio_base64": "!!!not-base64!!!", "audio_format": "pcm_s16le", "sample_rate": 16000})
            garbage.append(s[: rng.randrange(1, len(s))] if rng.random() < 0.5 else "noise " + s)
        else:  # blank-ish
            garbage.append(rng.choice(["", " ", "\t"]))

    lines = garbage + [json.dumps({"action": "status", "request_id": 777})]
    responses = run_server(lines)

    final = [r for r in responses if r.get("request_id") == 777]
    assert len(final) == 1 and final[0]["success"] is True
    # every response is a JSON object with a boolean success field
    assert all(isinstance(r, dict) and isinstance(r.get("success"), bool) for r in responses[1:])


def test_exit_shutdown_failure_does_not_duplicate_response():
    calls = []

    def bad_shutdown():
        calls.append("shutdown")
        raise RuntimeError("scheduler wedged")

    out = run_server(
        [json.dumps({"action": "exit", "request_id": 7}),
         json.dumps({"action": "status", "request_id": 8})],  # must NOT run
        hooks=_hooks(shutdown=bad_shutdown),
    )
    assert calls == ["shutdown"]
    # exactly one response carries request_id 7, and nothing after it
    exits = [r for r in out if r.get("request_id") == 7]
    assert len(exits) == 1 and exits[0]["success"]
    assert not any(r.get("request_id") == 8 for r in out)


def test_eof_runs_shutdown_hook():
    calls = []
    run_server([], hooks=_hooks(shutdown=lambda: calls.append("shutdown")))
    assert calls == ["shutdown"]


def test_exit_runs_shutdown_exactly_once():
    calls = []
    run_server(
        [json.dumps({"action": "exit", "request_id": 1})],
        hooks=_hooks(shutdown=lambda: calls.append("x")),
    )
    assert calls == ["x"]


def test_broken_stdout_pipe_shuts_down_gracefully():
    """A vanished reader (parent died / test closed the pipe) is EOF, not a
    thread-killing EPIPE: the loop must stop and still run the shutdown hook
    so scheduler/sessions aren't abandoned mid-job."""

    class BrokenAfterInit(io.StringIO):
        def __init__(self):
            super().__init__()
            self.writes = 0

        def write(self, s):
            self.writes += 1
            if self.writes > 1:  # init line lands, everything after EPIPEs
                raise BrokenPipeError(32, "Broken pipe")
            return super().write(s)

    calls = []
    stdin = io.StringIO(
        json.dumps({"action": "status", "request_id": 1})
        + "\n"
        + json.dumps({"action": "status", "request_id": 2})
        + "\n"
    )
    stdout = BrokenAfterInit()
    EngineServer(
        _hooks(shutdown=lambda: calls.append("shutdown")), stdin=stdin, stdout=stdout
    ).run()  # must return, not raise
    assert calls == ["shutdown"]
    out = [json.loads(line) for line in stdout.getvalue().splitlines()]
    assert out[0]["success"] is True  # only the init line made it out


def test_closed_stdout_stream_shuts_down_gracefully():
    """A closed text stream raises ValueError, not OSError — same treatment."""
    calls = []
    stdin = io.StringIO(json.dumps({"action": "status", "request_id": 1}) + "\n")
    stdout = io.StringIO()
    server = EngineServer(
        _hooks(
            initialize=lambda: (stdout.close(), {"success": True})[1],
            shutdown=lambda: calls.append("shutdown"),
        ),
        stdin=stdin,
        stdout=stdout,
    )
    server.run()
    assert calls == ["shutdown"]


def test_malformed_max_concurrency_falls_back(monkeypatch):
    monkeypatch.setenv("LIGHT_WHISPER_MAX_CONCURRENCY", "auto")
    out = run_server([json.dumps({"action": "status", "request_id": 1})])
    assert out[0]["success"] and any(r.get("request_id") == 1 for r in out)
