"""Batched interim ticks must be token-identical to sequential per-stream ticks.

``serving/incremental_batch.tick_batch`` batches N extending dictation
streams into one device program (batched segment prefill + batched greedy
decode with per-stream budgets). Greedy decoding is deterministic, so every
stream's transcript must equal what its own ``IncrementalTranscriber`` would
have produced running alone — the same greedy-exact contract the per-stream
speculative path holds. Reference behavior being generalized: one interim
session per process (``interim.rs:21-196``).
"""

import numpy as np
import pytest

from helpers.tiny_model import write_tiny_model
from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel
from light_whisper_tpu.serving.incremental import IncrementalTranscriber
from light_whisper_tpu.serving.incremental_batch import tick_batch

SR = 16_000


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    write_tiny_model(path, quantize=True)
    return Qwen3ASRModel(path, max_new_tokens=10)


def _stream_audio(seed, seconds):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(int(seconds * SR)) * 0.25).astype(np.float32)
    return (np.clip(np.rint(x * 32768), -32768, 32767).astype(np.int16)).astype(
        np.float32
    ) / 32768.0


def _grow_ticks(full, steps):
    # unequal growth per tick; all ticks share the 0.5 s bucket ladder
    return [full[: int((i + 1) * len(full) / steps)] for i in range(steps)]


def test_batched_ticks_match_sequential(model):
    n_streams = 3
    fulls = [_stream_audio(seed, 2.0 + 0.0 * seed) for seed in range(n_streams)]
    ticks = [_grow_ticks(full, 3) for full in fulls]

    # sequential oracle: each stream alone
    seq_results = []
    for s in range(n_streams):
        inc = IncrementalTranscriber(model, max_new_tokens=8)
        outs = [inc.transcribe_window(w, window_start_sample=0) for w in ticks[s]]
        seq_results.append(outs)

    # batched: first tick is fresh (solo fallback), later ticks batch
    from light_whisper_tpu.serving import incremental_batch as ib

    group_calls = []
    real_run_group = ib._run_group
    batch_incs = [IncrementalTranscriber(model, max_new_tokens=8) for _ in range(n_streams)]
    try:
        ib._run_group = lambda plans: group_calls.append(len(plans)) or real_run_group(plans)
        for tick_i in range(3):
            windows = [ticks[s][tick_i] for s in range(n_streams)]
            outs = tick_batch(batch_incs, windows)
            for s in range(n_streams):
                assert outs[s].tokens == seq_results[s][tick_i].tokens, (tick_i, s)
    finally:
        ib._run_group = real_run_group

    # extending ticks actually rode the batched program (all 3 streams per group)
    assert group_calls and all(n == n_streams for n in group_calls), group_calls
    assert all(inc.incremental_prefills >= 1 for inc in batch_incs)


def test_batched_ticks_mixed_buckets_fall_back(model):
    """Streams in different audio buckets can't share a program — they must
    still produce correct (sequential-path) results."""
    a = _stream_audio(1, 1.0)
    b = _stream_audio(2, 3.0)  # different bucket
    incs = [IncrementalTranscriber(model, max_new_tokens=8) for _ in range(2)]
    tick_batch(incs, [a[: SR // 2], b[: 2 * SR]])
    outs = tick_batch(incs, [a, b])

    ref_a = IncrementalTranscriber(model, max_new_tokens=8)
    ref_a.transcribe_window(a[: SR // 2], window_start_sample=0)
    want_a = ref_a.transcribe_window(a, window_start_sample=0)
    ref_b = IncrementalTranscriber(model, max_new_tokens=8)
    ref_b.transcribe_window(b[: 2 * SR], window_start_sample=0)
    want_b = ref_b.transcribe_window(b, window_start_sample=0)
    assert outs[0].tokens == want_a.tokens
    assert outs[1].tokens == want_b.tokens


def test_batched_tick_session_state_advances(model):
    """After a batched tick, each session's cache/stable state must support
    continuing with per-stream ticks (state handoff both directions)."""
    fulls = [_stream_audio(seed + 10, 2.0) for seed in range(2)]
    incs = [IncrementalTranscriber(model, max_new_tokens=8) for _ in range(2)]
    # establish sessions per-stream, batch the middle tick, finish per-stream
    for s in range(2):
        incs[s].transcribe_window(fulls[s][: SR // 2], window_start_sample=0)
    tick_batch(incs, [f[: 3 * SR // 2] for f in fulls])
    final_batchpath = [
        incs[s].transcribe_window(fulls[s], window_start_sample=0) for s in range(2)
    ]

    for s in range(2):
        ref = IncrementalTranscriber(model, max_new_tokens=8)
        ref.transcribe_window(fulls[s][: SR // 2], window_start_sample=0)
        ref.transcribe_window(fulls[s][: 3 * SR // 2], window_start_sample=0)
        want = ref.transcribe_window(fulls[s], window_start_sample=0)
        assert final_batchpath[s].tokens == want.tokens


def test_batched_fresh_prefills_match_sequential(model):
    """N dictations starting together prime their sessions in one batched
    full prefill; transcripts and subsequent extending ticks must equal the
    per-stream path."""
    from light_whisper_tpu.serving import incremental_batch as ib

    fulls = [_stream_audio(seed + 20, 2.0) for seed in range(2)]
    bases = [f[: SR] for f in fulls]

    fresh_calls = []
    real = ib._run_group_fresh
    incs = [IncrementalTranscriber(model, max_new_tokens=8) for _ in range(2)]
    try:
        ib._run_group_fresh = lambda plans: fresh_calls.append(len(plans)) or real(plans)
        outs = tick_batch(incs, bases)  # both fresh → one batched full prefill
    finally:
        ib._run_group_fresh = real
    assert fresh_calls == [2], fresh_calls

    refs = []
    for s in range(2):
        ref = IncrementalTranscriber(model, max_new_tokens=8)
        refs.append(ref)
        want = ref.transcribe_window(bases[s], window_start_sample=0)
        assert outs[s].tokens == want.tokens, s

    # state handoff: the NEXT tick extends and still matches per-stream
    outs2 = tick_batch(incs, fulls)
    for s in range(2):
        want2 = refs[s].transcribe_window(fulls[s], window_start_sample=0)
        assert outs2[s].tokens == want2.tokens, s
        # counters track the sequential path exactly — including clip-guard
        # redos, which must trip (or not) identically in both paths
        assert incs[s].full_prefills == refs[s].full_prefills, s
        assert incs[s].incremental_prefills == refs[s].incremental_prefills, s
        assert incs[s].clip_guard_prefills == refs[s].clip_guard_prefills, s


def test_batched_ticks_divergent_growth_stages(model):
    """Streams at different window lengths inside the SAME audio bucket
    (different n_audio / stable / draft lengths) must batch and still match
    their sequential runs — the per-stream scalar plumbing under one shared
    program."""
    fulls = [_stream_audio(seed + 30, 2.0) for seed in range(2)]
    # stream 0 ticks 0.9s → 1.6s; stream 1 ticks 1.2s → 1.9s:
    # second ticks share the 2.0s bucket with different valid lengths
    schedules = [
        [int(0.9 * SR), int(1.6 * SR)],
        [int(1.2 * SR), int(1.9 * SR)],
    ]

    seq = []
    for s in range(2):
        inc = IncrementalTranscriber(model, max_new_tokens=8)
        outs = [
            inc.transcribe_window(fulls[s][:n], window_start_sample=0)
            for n in schedules[s]
        ]
        seq.append(outs)

    from light_whisper_tpu.serving import incremental_batch as ib

    calls = []
    real = ib._run_group
    incs = [IncrementalTranscriber(model, max_new_tokens=8) for _ in range(2)]
    try:
        ib._run_group = lambda plans: calls.append(
            [(p.n_audio, p.stable) for p in plans]
        ) or real(plans)
        for tick_i in range(2):
            outs = tick_batch(
                incs, [fulls[s][: schedules[s][tick_i]] for s in range(2)]
            )
            for s in range(2):
                assert outs[s].tokens == seq[s][tick_i].tokens, (tick_i, s)
    finally:
        ib._run_group = real

    # the second tick batched with genuinely divergent per-stream scalars
    assert calls and any(
        len({na for na, _st in call}) > 1 for call in calls
    ), calls


def test_transcribe_extending_batch_bridge_semantics(model):
    """The bridge-level batch API must mirror per-bridge transcribe_extending:
    hits/resets counters, prefix tracking, and token-identical results for a
    mix of one extending and one fresh stream."""
    from light_whisper_tpu.serving.session_bridge import (
        SessionBridge,
        transcribe_extending_batch,
    )

    a = _stream_audio(40, 2.0)
    b = _stream_audio(41, 2.0)
    bridges = [SessionBridge(model), SessionBridge(model)]
    bridges[0].transcribe_extending(a[: SR])  # prime stream 0

    outs = transcribe_extending_batch(bridges, [a[: 3 * SR // 2], b[: SR]])

    ref0 = SessionBridge(model)
    ref0.transcribe_extending(a[: SR])
    want0 = ref0.transcribe_extending(a[: 3 * SR // 2])
    ref1 = SessionBridge(model)
    want1 = ref1.transcribe_extending(b[: SR])
    assert outs[0].tokens == want0.tokens
    assert outs[1].tokens == want1.tokens
    assert bridges[0].session_hits == 1 and bridges[0].session_resets == 1
    assert bridges[1].session_hits == 0 and bridges[1].session_resets == 1

    # both bridges now extend together in one batched group
    outs2 = transcribe_extending_batch(bridges, [a[: 2 * SR], b[: 3 * SR // 2]])
    want0b = ref0.transcribe_extending(a[: 2 * SR])
    want1b = ref1.transcribe_extending(b[: 3 * SR // 2])
    assert outs2[0].tokens == want0b.tokens
    assert outs2[1].tokens == want1b.tokens
    assert bridges[0].session_hits == 2 and bridges[1].session_hits == 1


def test_batched_fresh_invalidates_stale_device_buffer(model):
    """Reviewer-found hazard: a batched fresh prefill (e.g. after a window
    slide) must invalidate the device-resident audio buffer seeded under the
    OLD window_start, or the next solo extending tick would splice two
    windows together via the delta path."""
    full = _stream_audio(50, 6.0)
    incs = [IncrementalTranscriber(model, max_new_tokens=8) for _ in range(2)]
    # seed device buffers with solo ticks at window_start=0
    for inc in incs:
        inc.transcribe_window(full[: 2 * SR], window_start_sample=0)
        assert inc._audio_dev is not None

    # window slides: fresh batch at a new window_start
    slid = [full[SR : 3 * SR], full[SR : 3 * SR]]
    tick_batch(incs, slid, window_starts=[SR, SR])
    assert all(inc._audio_dev is None for inc in incs)

    # next solo extending tick at the new start must match a clean sequential run
    outs = [
        inc.transcribe_window(full[SR : 7 * SR // 2], window_start_sample=SR)
        for inc in incs
    ]
    ref = IncrementalTranscriber(model, max_new_tokens=8)
    ref.transcribe_window(full[: 2 * SR], window_start_sample=0)
    ref.transcribe_window(full[SR : 3 * SR], window_start_sample=SR)
    want = ref.transcribe_window(full[SR : 7 * SR // 2], window_start_sample=SR)
    assert all(o.tokens == want.tokens for o in outs)


def test_batched_tick_failure_degrades_to_per_stream(model):
    """A batched-program failure (compile error, relay drop) must not fail
    every coalesced request: the group degrades to per-stream ticks."""
    from light_whisper_tpu.serving import incremental_batch as ib

    fulls = [_stream_audio(seed + 60, 2.0) for seed in range(2)]
    incs = [IncrementalTranscriber(model, max_new_tokens=8) for _ in range(2)]
    for s in range(2):
        incs[s].transcribe_window(fulls[s][: SR], window_start_sample=0)

    real = ib._run_group
    try:
        def boom(plans):
            raise RuntimeError("simulated batched-program failure")

        ib._run_group = boom
        outs = tick_batch(incs, [f[: 3 * SR // 2] for f in fulls])
    finally:
        ib._run_group = real

    for s in range(2):
        ref = IncrementalTranscriber(model, max_new_tokens=8)
        ref.transcribe_window(fulls[s][: SR], window_start_sample=0)
        # sessions are untouched on failure → the per-stream fallback keeps
        # the cheap EXTENDING tick, matching an uninterrupted sequential run
        want = ref.transcribe_window(fulls[s][: 3 * SR // 2], window_start_sample=0)
        assert outs[s].tokens == want.tokens, s
        assert incs[s].incremental_prefills == ref.incremental_prefills, s


def test_solo_fallback_failure_is_isolated_per_stream(model):
    """One broken stream in the solo-fallback loop must fail ALONE: other
    coalesced streams keep their results (shipped positionally), and the
    failure arrives as the exception instance in its slot."""
    fulls = [_stream_audio(seed + 80, 2.0) for seed in range(3)]
    incs = [IncrementalTranscriber(model, max_new_tokens=8) for _ in range(3)]
    for s in range(3):
        incs[s].transcribe_window(fulls[s][: SR], window_start_sample=0)

    boom = RuntimeError("stream 1 device error")

    def failing(window, window_start_sample=0):
        incs[1].reset()  # keep donated-buffer semantics
        raise boom

    incs[1].transcribe_window = failing
    # Degrade the batched group so every stream routes through the solo
    # loop, where stream 1's per-stream failure must stay its own.
    from light_whisper_tpu.serving import incremental_batch as ib

    def degrade(plans):
        raise RuntimeError("simulated batched-program failure")

    real_group = ib._run_group
    try:
        ib._run_group = degrade
        outs = tick_batch(incs, [f[: 3 * SR // 2] for f in fulls])
    finally:
        ib._run_group = real_group

    assert outs[1] is boom
    for s in (0, 2):
        ref = IncrementalTranscriber(model, max_new_tokens=8)
        ref.transcribe_window(fulls[s][: SR], window_start_sample=0)
        want = ref.transcribe_window(fulls[s][: 3 * SR // 2], window_start_sample=0)
        assert outs[s].tokens == want.tokens, s


def test_bridge_batch_failure_resets_prev(model):
    """A failing stream's bridge must not keep a stale _prev: the session
    was reset mid-tick, and _prev claiming consumed audio would let a later
    diverging window skip the reset."""
    from light_whisper_tpu.serving.session_bridge import (
        SessionBridge,
        transcribe_extending_batch,
    )

    fulls = [_stream_audio(seed + 90, 2.0) for seed in range(2)]
    bridges = [SessionBridge(model) for _ in range(2)]
    for s in range(2):
        bridges[s].transcribe_extending(fulls[s][: SR])

    boom = RuntimeError("stream 0 device error")

    def failing(window, window_start_sample=0):
        bridges[0]._inc.reset()
        raise boom

    bridges[0]._inc.transcribe_window = failing
    from light_whisper_tpu.serving import incremental_batch as ib

    def degrade(plans):
        raise RuntimeError("simulated batched-program failure")

    real_group = ib._run_group
    try:
        ib._run_group = degrade
        outs = transcribe_extending_batch(
            bridges, [f[: 3 * SR // 2] for f in fulls]
        )
    finally:
        ib._run_group = real_group
    assert outs[0] is boom
    assert bridges[0]._prev is None  # aligned with the reset session
    assert bridges[1]._prev is not None and len(bridges[1]._prev) == 3 * SR // 2
    assert outs[1].tokens  # the healthy stream kept its result


def test_decode_batch_bound_of_one_forces_solo(model, monkeypatch):
    """LWT_MAX_DECODE_BATCH=1 is an operator memory bound: no batched
    programs (no 2-row stacked KV) may be built."""
    from light_whisper_tpu.serving import incremental_batch as ib

    monkeypatch.setenv("LWT_MAX_DECODE_BATCH", "1")
    fulls = [_stream_audio(seed + 70, 2.0) for seed in range(2)]
    incs = [IncrementalTranscriber(model, max_new_tokens=8) for _ in range(2)]
    for s in range(2):
        incs[s].transcribe_window(fulls[s][: SR], window_start_sample=0)

    def forbidden(plans):
        raise AssertionError("batched program built despite bound=1")

    real_g, real_f = ib._run_group, ib._run_group_fresh
    try:
        ib._run_group = forbidden
        ib._run_group_fresh = forbidden
        outs = tick_batch(incs, [f[: 3 * SR // 2] for f in fulls])
    finally:
        ib._run_group, ib._run_group_fresh = real_g, real_f

    for s in range(2):
        ref = IncrementalTranscriber(model, max_new_tokens=8)
        ref.transcribe_window(fulls[s][: SR], window_start_sample=0)
        want = ref.transcribe_window(fulls[s][: 3 * SR // 2], window_start_sample=0)
        assert outs[s].tokens == want.tokens, s
