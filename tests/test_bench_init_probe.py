"""bench fail-proof structure (VERDICT r4 #1).

Round 4's driver bench produced rc=124 with an EMPTY tail: the init probe
ran first in a capture_output black hole and could re-run on a cold cache,
while the headline JSON printed last. The round-5 contract, pinned here:

- ``_init_to_ready_probe`` runs ONCE (no silent cold-cache re-run — ADVICE
  r4 #4), streams output, and degrades to an error field, never a raise;
- an over-budget result is labeled (``init_to_ready_cache_was_cold``)
  instead of being re-measured;
- the bench process emits a parseable headline JSON line under a deadline
  hit even before any phase completes.
"""

import json
import os
import subprocess
import sys

import bench


class _FakeProc:
    def __init__(self, lines, rc=0):
        import io

        self.stdout = io.StringIO("".join(line + "\n" for line in lines))
        self.returncode = rc

    def wait(self, timeout=None):
        return self.returncode

    def kill(self):
        pass


def _probe_with(monkeypatch, lines, rc=0):
    calls = []

    def fake_popen(cmd, **kw):
        calls.append(cmd)
        return _FakeProc(lines, rc)

    monkeypatch.setattr("subprocess.Popen", fake_popen)
    emitter = bench._Emitter("1.7b")
    bench._init_to_ready_probe(emitter, "1.7b")
    return emitter.details, calls


def test_warm_cache_single_run_records_fields(monkeypatch):
    warm = json.dumps({"init_to_ready_s": 90.7, "budget_s": 120})
    details, calls = _probe_with(monkeypatch, ["noise line", warm])
    assert len(calls) == 1
    assert details["init_to_ready_s"] == 90.7
    assert details["init_to_ready_budget_s"] == 120
    assert "init_to_ready_cache_was_cold" not in details


def test_cold_cache_runs_once_and_is_labeled(monkeypatch):
    cold = json.dumps({"init_to_ready_s": 770.1, "budget_s": 120})
    details, calls = _probe_with(monkeypatch, [cold])
    assert len(calls) == 1  # ONE run only — no silent re-measure
    assert details["init_to_ready_s"] == 770.1
    assert details["init_to_ready_cache_was_cold"] is True


def test_probe_failure_degrades_to_error_field(monkeypatch):
    details, calls = _probe_with(monkeypatch, ["not json"], rc=1)
    assert "init_to_ready_s" not in details
    assert "probe" in details["init_to_ready_error"]


def test_deadline_emits_parseable_headline_and_exits_zero():
    """A deadline hit before ANY phase still leaves a parseable JSON line —
    the exact failure mode of BENCH_r04.json (rc=124, tail empty)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, BENCH_DEADLINE_S="3", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=repo,
        env=env,
    )
    assert proc.returncode == 0
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, proc.stdout
    doc = json.loads(lines[-1])
    assert doc["metric"] == "rtf"
    assert doc["details"]["aborted"] == "deadline"


def test_absorb_merges_child_lines_and_keeps_parent_deadline():
    """The orchestrator's merge: child JSON lines update value/details but
    the parent's own deadline field survives (the child runs under a
    REDUCED deadline; the artifact must report the global one)."""
    emitter = bench._Emitter("1.7b")
    parent_deadline = emitter.details["deadline_s"]
    bench._absorb(
        emitter,
        {
            "metric": "rtf",
            "value": 0.0188,
            "details": {"deadline_s": 1120.0, "xrt": 53.2},
        },
    )
    assert emitter.value == 0.0188
    assert emitter.details["xrt"] == 53.2
    assert emitter.details["deadline_s"] == parent_deadline
    # a non-rtf or malformed line is ignored
    bench._absorb(emitter, {"metric": "other", "value": 1})
    assert emitter.value == 0.0188


def test_absorb_drops_stale_provisional_flag():
    """A key the child pops between emissions (provisional headline
    superseded by the median) must not survive the merge of an earlier
    absorbed line — BENCH artifacts flagged a final median as provisional."""
    emitter = bench._Emitter("1.7b")
    bench._absorb(
        emitter,
        {
            "metric": "rtf",
            "value": 0.0191,
            "details": {"headline_provisional": True},
        },
    )
    assert emitter.details["headline_provisional"] is True
    bench._absorb(
        emitter,
        {
            "metric": "rtf",
            "value": 0.0184,
            "details": {"wall_seconds_median": 0.221},
        },
    )
    assert "headline_provisional" not in emitter.details
    assert emitter.value == 0.0184
    # the semantics are general (any popped child key), not a one-off:
    # wall_seconds_median vanished from the next snapshot too
    bench._absorb(
        emitter,
        {"metric": "rtf", "value": 0.0185, "details": {"xrt": 54.0}},
    )
    assert "wall_seconds_median" not in emitter.details
    # parent-owned fields survive child-line turnover
    assert "deadline_s" in emitter.details
