"""The bench's wire-to-wire EOS path must run end-to-end on the tiny model.

This is the driver's BENCH surface (VERDICT r2 #3): JSON command → real
FireRedVAD → per-stream KV session → decode → hot words → JSON response,
measured over OS pipes. The test pins that the harness itself works (init,
VAD acceptance of the synthetic speech, session reuse, clean exit) so the
TPU bench run can't fail on harness bugs.
"""

import sys

import pytest

sys.path.insert(0, "tests")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from helpers.tiny_model import write_tiny_model

    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    path = str(tmp_path_factory.mktemp("model") / "tiny.gguf")
    write_tiny_model(path, quantize=True)
    return Qwen3ASRModel(path, max_new_tokens=8)


def test_wire_eos_bench_runs(model):
    import bench

    out = bench._wire_eos_bench(model, "0.6b", trials=2)
    assert len(out["samples"]) == 2
    assert out["p50_ms"] > 0
    assert out["vad_ms_p50"] >= 0
    # the grown window extends the base → the bench stream must hit its session
    assert out["session_hit_rate"] is None or out["session_hit_rate"] > 0


def test_wire_bench_first_tick_and_two_streams(model):
    """VERDICT r3 #3: the bench must report the fresh dictation's first
    tick (full prefill) and witness two interleaved streams hitting their
    own KV sessions."""
    import bench

    out = bench._wire_eos_bench(model, "0.6b", trials=2)
    assert out["first_tick_p50_ms"] > 0
    assert len(out["first_tick_samples"]) == 2
    assert out["two_stream_tick_ms_p50"] is None or out["two_stream_tick_ms_p50"] > 0
    rates = out["two_stream_hit_rates"]
    assert set(rates) == {"s1", "s2"}
    # each stream is a growing dictation (1 fresh + 4 extensions per round):
    # every extension must hit its own session → 0.8 per round exactly
    for key, rate in rates.items():
        assert rate is not None and rate >= 0.75, (key, rate, out)
