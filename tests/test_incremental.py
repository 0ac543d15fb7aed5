"""Incremental KV-prefix-reuse decoding vs full re-prefill."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers.tiny_model import write_tiny_model

from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel
from light_whisper_tpu.serving.incremental import IncrementalTranscriber
from light_whisper_tpu.serving.streaming import StreamingSession


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("model") / "tiny.gguf")
    write_tiny_model(path, quantize=False)
    return Qwen3ASRModel(path, max_new_tokens=8)


def test_incremental_matches_full_on_growing_audio(model):
    rng = np.random.default_rng(0)
    # window_tokens = 52 → a complete attention group needs 4 s of audio;
    # grow past it so the incremental path actually reuses a stable prefix.
    full_audio = (rng.standard_normal(16000 * 9) * 0.3).astype(np.float32)

    inc = IncrementalTranscriber(model, max_new_tokens=8)
    results_inc = []
    results_full = []
    for seconds in (3, 5, 7, 9):
        window = full_audio[: seconds * 16000]
        results_inc.append(inc.transcribe_window(window, window_start_sample=0))
        results_full.append(model.transcribe(window))

    for r_inc, r_full in zip(results_inc, results_full):
        assert r_inc.tokens == r_full.tokens

    assert inc.full_prefills == 1
    assert inc.incremental_prefills == 3


def test_window_slide_forces_full_prefill(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 6) * 0.3).astype(np.float32)
    inc = IncrementalTranscriber(model, max_new_tokens=8)
    inc.transcribe_window(audio[:80000], window_start_sample=0)
    # slide: start moved → stable prefix invalid
    r = inc.transcribe_window(audio[16000:], window_start_sample=16000)
    assert inc.full_prefills == 2
    want = model.transcribe(audio[16000:])
    assert r.tokens == want.tokens


def test_reset_clears_state(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000 * 5) * 0.3).astype(np.float32)
    inc = IncrementalTranscriber(model, max_new_tokens=8)
    inc.transcribe_window(audio, window_start_sample=0)
    inc.reset()
    inc.transcribe_window(audio, window_start_sample=0)
    assert inc.full_prefills == 2


def test_streaming_session_with_incremental_transcriber(model):
    rng = np.random.default_rng(3)
    inc = IncrementalTranscriber(model, max_new_tokens=8)
    session = StreamingSession(inc)
    session.accept((rng.standard_normal(16000 * 5) * 0.3).astype(np.float32))
    r1 = session.tick()
    assert r1 is not None
    session.accept((rng.standard_normal(16000) * 0.3).astype(np.float32))
    r2 = session.tick()
    assert isinstance(r2.text, str)
    final = session.finalize()
    assert final.from_interim_cache


def test_speculative_draft_acceptance(model):
    """The previous tick's transcript must be verified (greedy-exact) and
    mostly accepted on the next tick."""
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal(16000 * 8) * 0.3).astype(np.float32)
    inc = IncrementalTranscriber(model, max_new_tokens=8)

    r1 = inc.transcribe_window(audio[: 16000 * 6], window_start_sample=0)
    r2 = inc.transcribe_window(audio[: 16000 * 8], window_start_sample=0)
    # exact greedy equivalence with a fresh non-speculative transcribe
    want = model.transcribe(audio[: 16000 * 8])
    assert r2.tokens == want.tokens
    assert inc.draft_tokens_offered > 0
    # budget respected even when the draft is fully accepted
    assert len(r2.tokens) <= 8


def test_speculation_disabled_on_first_tick(model):
    rng = np.random.default_rng(10)
    inc = IncrementalTranscriber(model, max_new_tokens=8)
    inc.transcribe_window((rng.standard_normal(16000 * 5) * 0.3).astype(np.float32), 0)
    assert inc.draft_tokens_offered == 0  # full prefill path has no draft


def test_server_session_bridge_matches_stateless(model, tmp_path):
    """Protocol-level session reuse must be invisible in results."""
    from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer
    from light_whisper_tpu.serving.session_bridge import SessionBridge

    class PassVad:
        def speech_timestamps(self, audio):
            return [{"start": 0, "end": len(audio)}]

        def warmup(self):
            pass

    server = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda p: model,
        vad_factory=PassVad,
        model_path="/fake/m.gguf",
        apply_hot_words=False,
    )
    server.initialize()

    import base64

    rng = np.random.default_rng(12)
    audio = (rng.standard_normal(16000 * 7) * 0.3).astype(np.float32)

    def send(samples):
        pcm = np.clip(samples * 32768, -32768, 32767).astype("<i2")
        return server.transcribe(
            audio_base64=base64.b64encode(pcm.tobytes()).decode(),
            audio_format="pcm_s16le",
            sample_rate=16000,
        )

    r1 = send(audio[: 16000 * 5])
    r2 = send(audio[: 16000 * 7])  # extends → session hit
    pool = server._session_pool
    assert pool is not None and pool is not False
    bridge = pool.bridge_for(None)
    assert isinstance(bridge, SessionBridge)
    assert bridge.session_hits >= 1

    # quantization to int16 on the wire loses the float prefix property only
    # if re-encoding differs — same pipeline, so prefix holds; results must
    # equal a stateless transcribe of the same decoded audio.
    decoded = np.frombuffer(
        np.clip(audio[: 16000 * 7] * 32768, -32768, 32767).astype("<i2").tobytes(),
        dtype="<i2",
    ).astype(np.float32) / 32768.0
    want = model.transcribe(decoded)
    assert r2["text"] == want.text

    # unrelated audio resets, still correct
    other = (np.random.default_rng(13).standard_normal(16000 * 3) * 0.3).astype(np.float32)
    r3 = send(other)
    assert bridge.session_resets >= 2  # first request + this one
    assert r3["success"]


def test_fake_models_fall_back_without_session(model):
    from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer

    class Fake:
        def transcribe(self, audio):
            import types

            return types.SimpleNamespace(text="x", language="en", tokens=[])

        def warmup(self):
            pass

    class PassVad:
        def speech_timestamps(self, audio):
            return [{"start": 0, "end": len(audio)}]

        def warmup(self):
            pass

    server = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda p: Fake(),
        vad_factory=PassVad,
        model_path="/fake/m.gguf",
    )
    server.initialize()
    import base64

    pcm = np.zeros(16000, dtype="<i2")
    r = server.transcribe(
        audio_base64=base64.b64encode(pcm.tobytes()).decode(),
        audio_format="pcm_s16le",
        sample_rate=16000,
    )
    assert r["success"] and r["text"] == "x"
    assert server._session_pool is False  # pool unavailable for fakes


def test_streaming_session_slide_passes_window_start(model):
    """Once the buffer outgrows the window, the session must convey the slid
    window start so the KV-reusing transcriber full-prefills instead of
    reusing cached audio tokens that describe different samples."""
    rng = np.random.default_rng(11)
    inc = IncrementalTranscriber(model, max_new_tokens=8)
    session = StreamingSession(inc)

    session.accept((rng.standard_normal(16000 * 11) * 0.3).astype(np.float32))
    session.tick()  # start 0 → full prefill
    session.accept((rng.standard_normal(16000 * 3) * 0.3).astype(np.float32))
    r2 = session.tick()  # window slid → MUST full-prefill again

    assert inc.full_prefills == 2
    window = session._window()
    want = model.transcribe(window)
    assert r2.text == want.text

    # a tick whose aligned start did not move may extend incrementally
    session.accept((rng.standard_normal(1600) * 0.3).astype(np.float32))
    session.tick()
    assert inc.incremental_prefills >= 1


def test_quiet_then_loud_stays_greedy_exact(model):
    """ADVICE r1 (high): the mel clamp floor is per-clip global — late loud
    audio changes previously computed quiet frames, so cached stable-prefix
    KV goes stale. The clip-max guard must detect it and redo the tick as a
    full prefill, keeping the incremental output identical to stateless."""
    rng = np.random.default_rng(7)
    quiet = (rng.standard_normal(16000 * 6) * 0.002).astype(np.float32)
    loud = (rng.standard_normal(16000 * 3) * 0.9).astype(np.float32)
    audio = np.concatenate([quiet, loud])

    inc = IncrementalTranscriber(model, max_new_tokens=8)
    # Warm the session on the quiet prefix (past one attention group so a
    # stable prefix actually exists), then extend with the loud tail.
    r1 = inc.transcribe_window(audio[: 16000 * 6], window_start_sample=0)
    assert r1.tokens == model.transcribe(audio[: 16000 * 6]).tokens
    assert inc.incremental_prefills + inc.full_prefills >= 1

    r2 = inc.transcribe_window(audio, window_start_sample=0)
    want = model.transcribe(audio)
    assert r2.tokens == want.tokens
    assert inc.clip_guard_prefills >= 1  # the guard actually fired

    # Steady amplitude afterwards: reuse must resume (no spurious guards).
    more = np.concatenate([audio, loud[:16000]])
    guards_before = inc.clip_guard_prefills
    r3 = inc.transcribe_window(more, window_start_sample=0)
    assert r3.tokens == model.transcribe(more).tokens
    assert inc.clip_guard_prefills == guards_before
    assert inc.incremental_prefills >= 1


def test_clip_guard_redo_reuses_device_buffer(model, monkeypatch):
    """The clip-guard redo must not re-upload the full window: the extend
    attempt already composed the [bucket] device buffer (zero-tail invariant
    makes it bit-identical to a full send) and the segment prefill does not
    donate it. On a remote-attached TPU the saved upload is the largest
    non-decode term of a tick (scripts/exp_profile_rtf.py)."""
    import light_whisper_tpu.serving.incremental as incremental
    from light_whisper_tpu.models.qwen3_asr.model import bucket_audio_samples

    rng = np.random.default_rng(7)
    quiet = (rng.standard_normal(16000 * 6) * 0.002).astype(np.float32)
    loud = (rng.standard_normal(16000 * 3) * 0.9).astype(np.float32)
    audio = np.concatenate([quiet, loud])
    bucket = bucket_audio_samples(len(audio))

    inc = IncrementalTranscriber(model, max_new_tokens=8)
    inc.transcribe_window(audio[: 16000 * 6], window_start_sample=0)

    real_jnp = incremental.jnp
    big_uploads: list = []

    class _JnpSpy:
        def __getattr__(self, name):
            return getattr(real_jnp, name)

        @staticmethod
        def asarray(x, *args, **kwargs):
            size = getattr(x, "size", None)
            if size is not None and size >= bucket:
                big_uploads.append(getattr(x, "shape", None))
            return real_jnp.asarray(x, *args, **kwargs)

    monkeypatch.setattr(incremental, "jnp", _JnpSpy())
    r2 = inc.transcribe_window(audio, window_start_sample=0)
    assert inc.clip_guard_prefills >= 1  # the guard fired → redo happened
    assert r2.tokens == model.transcribe(audio).tokens
    assert big_uploads == []  # the redo rode the resident device buffer


def test_stable_boundary_excludes_mel_receptive_bleed(model):
    """Window ends landing within N_FFT/2 of a group boundary must not mark
    that group stable (its last mel frames still read future samples)."""
    cfg = model.config.audio
    inc = IncrementalTranscriber(model, max_new_tokens=8)
    group_frames = cfg.chunk_frames * max(1, cfg.n_window_infer // cfg.chunk_frames)
    group_samples = group_frames * 160
    wt = inc._window_tokens

    # Exactly one group of samples: the group's final frames read past the
    # end → not yet stable.
    n_audio = model._audio_tokens_for(group_samples)
    assert inc._stable_boundary(group_samples, n_audio) == 0
    # 200 samples later the receptive fields close → the group is final.
    n_audio2 = model._audio_tokens_for(group_samples + 200)
    assert inc._stable_boundary(group_samples + 200, n_audio2) == wt


def test_randomized_growth_patterns_stay_greedy_exact(model):
    """Property sweep: any growth pattern (tiny deltas, bucket jumps, window
    slides) must produce exactly the stateless transcribe of each window.

    Per-second amplitude steps up and down so the per-clip mel max moves
    between ticks (exercising the clip-max guard), not just constant noise."""
    rng = np.random.default_rng(123)
    amp = np.repeat(
        np.array([0.01, 0.05, 0.3, 0.9] * 4, dtype=np.float32), 16000
    )
    audio = (rng.standard_normal(16000 * 16) * amp).astype(np.float32)

    for scenario in range(4):
        srng = np.random.default_rng(1000 + scenario)
        inc = IncrementalTranscriber(model, max_new_tokens=8)
        session = StreamingSession(inc)
        consumed = 0
        for tick in range(3):
            delta = int(srng.choice([800, 4000, 16000, 48000]))
            session.accept(audio[consumed : consumed + delta])
            consumed += delta
            r = session.tick()
            if r is None:
                continue
            window = session._window()
            want = model.transcribe(window)
            assert r.text == want.text, (
                f"scenario {scenario} tick {tick}: {r.text!r} != {want.text!r} "
                f"(buffered {consumed}, window {len(window)})"
            )


def test_warmup_ladder_precompiles_buckets(model):
    """The ladder walk must visit every bucket ≤ max_seconds and leave the
    transcriber pool warm (full prefill + extend programs compiled)."""
    from light_whisper_tpu.serving.incremental import warmup_ladder

    # Pass 1 walks the growing window (extend segments); pass 2 resets per
    # bucket so the FULL-prefill program is compiled for every bucket, not
    # just the first tick and capacity doublings (clip-guard redos and fresh
    # sessions land on arbitrary buckets); pass 3 (default-on) walks two
    # scratch streams together to warm the B=2 batched-tick programs.
    ticks = warmup_ladder(model, max_seconds=1.5, step_seconds=0.5)
    assert ticks == 9

    # threaded passes (compile RPCs overlap across threads) warm the same
    # tick set — concurrency changes wall time only
    ticks_conc = warmup_ladder(model, max_seconds=1.5, step_seconds=0.5, concurrency=3)
    assert ticks_conc == 9

    # budget cuts the walk short but never below one tick
    few = warmup_ladder(model, max_seconds=5.0, step_seconds=0.5, budget_seconds=0.0)
    assert few <= 1


def test_device_audio_buffer_exactness(model):
    """Device-resident window buffers (ship only the delta per tick) must be
    token-identical to full sends across unaligned growth and bucket
    crossings, and the composed buffer must equal the zero-padded window."""
    import os

    import jax

    from light_whisper_tpu.serving.incremental import IncrementalTranscriber

    sr = 16_000
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(3 * sr) * 0.25).astype(np.float32)
    x = (np.clip(np.rint(x * 32768), -32768, 32767).astype(np.int16)).astype(
        np.float32
    ) / 32768.0
    ends = [7000, 15000, 16000, 23000, 39000, 48000]

    def run(flag):
        os.environ["LWT_DEVICE_AUDIO_BUF"] = flag
        try:
            inc = IncrementalTranscriber(model, max_new_tokens=6)
            return [
                inc.transcribe_window(x[:n], window_start_sample=0).tokens
                for n in ends
            ], inc
        finally:
            os.environ.pop("LWT_DEVICE_AUDIO_BUF", None)

    with_buf, inc = run("1")
    without, _ = run("0")
    assert with_buf == without

    buf = np.asarray(jax.device_get(inc._audio_dev))
    want = np.zeros(buf.shape[0], np.float32)
    want[:48000] = x[:48000]
    if buf.dtype == np.int16:
        want = np.clip(np.rint(want * 32768), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(buf, want)


def test_warmup_ladder_wait_turn_excluded_from_budget(model):
    """warmup_ladder(wait_turn=...) blocks before each tick, and the time
    spent waiting does not burn budget_seconds — a long dictation right
    after ready must not expire the background ladder without warming
    anything."""
    import time as _time

    from light_whisper_tpu.serving.incremental import warmup_ladder

    waits = []

    def gate():
        if not waits:  # one long yield before the first tick
            _time.sleep(0.8)
        waits.append(1)

    ticks = warmup_ladder(
        model,
        max_seconds=0.5,
        step_seconds=0.5,
        budget_seconds=0.5,
        wait_turn=gate,
    )
    # with the wait counted against the budget this would be 0
    assert ticks >= 1
    assert len(waits) >= 1
