"""bench._init_to_ready_probe: self-seeding retry on a cold cache.

``.jax_cache`` is a working-tree artifact; when it has been wiped the first
fresh-process probe measures packaging-time compile cost, not the install
experience (the archive ships the cache). The probe must then re-run once
and report the shipped-cache number, keeping the cold run visible.
"""

import json
import sys


def _probe_with(monkeypatch, lines):
    import bench

    calls = []

    class _Proc:
        def __init__(self, line):
            self.stdout = line + "\n"
            self.stderr = ""

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _Proc(lines[min(len(calls) - 1, len(lines) - 1)])

    monkeypatch.setattr("subprocess.run", fake_run)
    out = bench._init_to_ready_probe("1.7b")
    return out, calls


def test_cold_cache_triggers_one_reseeded_rerun(monkeypatch):
    cold = json.dumps({"init_to_ready_s": 770.1, "budget_s": 120})
    warm = json.dumps({"init_to_ready_s": 90.7, "budget_s": 120})
    out, calls = _probe_with(monkeypatch, [cold, warm])
    assert len(calls) == 2
    assert out["init_to_ready_s"] == 90.7
    assert out["first_ever_compile_s"] == 770.1
    assert out["cold_cache_probe"]["init_to_ready_s"] == 770.1


def test_warm_cache_runs_once(monkeypatch):
    warm = json.dumps({"init_to_ready_s": 90.7, "budget_s": 120})
    out, calls = _probe_with(monkeypatch, [warm])
    assert len(calls) == 1
    assert out["init_to_ready_s"] == 90.7
    assert "first_ever_compile_s" not in out


def test_probe_failure_returns_empty(monkeypatch):
    out, calls = _probe_with(monkeypatch, ["not json"])
    assert out == {}
