"""GGUF container round-trip and Q8_0 codec tests."""

import numpy as np
import pytest

from light_whisper_tpu.formats import gguf


def test_q8_0_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    q, d = gguf.quantize_q8_0(x)
    back = gguf.dequantize_q8_0(q, d)
    # Max error per block is scale/2 = absmax/254.
    absmax = np.abs(x.reshape(8, 2, 32)).max(axis=-1, keepdims=True)
    bound = np.broadcast_to(absmax / 254 * 1.01 + 1e-3, (8, 2, 32)).reshape(8, 64)
    assert np.all(np.abs(back - x) <= bound)


def test_q8_0_zero_block():
    x = np.zeros((1, 32), dtype=np.float32)
    q, d = gguf.quantize_q8_0(x)
    assert np.all(q == 0)
    np.testing.assert_array_equal(gguf.dequantize_q8_0(q, d), x)


def test_q8_0_rejects_bad_block_size():
    with pytest.raises(ValueError):
        gguf.quantize_q8_0(np.zeros((2, 33), dtype=np.float32))


def test_gguf_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((16, 64)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    ids = np.arange(10, dtype=np.int32)
    meta = {
        "general.architecture": "qwen3-asr",
        "qwen3asr.block_count": 28,
        "qwen3asr.rope.freq_base": 1000000.0,
        "tokenizer.ggml.tokens": ["a", "b", "<eos>"],
        "tokenizer.ggml.token_type": [1, 1, 3],
        "some.flag": True,
        "some.big": 1 << 40,
    }
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(
        path,
        meta,
        {
            "w.q8": (w, gguf.GGML_Q8_0),
            "w.f32": w,
            "w.f16": (w, gguf.GGML_F16),
            "w.bf16": (w, gguf.GGML_BF16),
            "b": b,
            "ids": ids,
        },
    )
    f = gguf.read_gguf(path)
    assert f.metadata["general.architecture"] == "qwen3-asr"
    assert f.metadata["qwen3asr.block_count"] == 28
    assert f.metadata["qwen3asr.rope.freq_base"] == pytest.approx(1e6)
    assert f.metadata["tokenizer.ggml.tokens"] == ["a", "b", "<eos>"]
    assert f.metadata["tokenizer.ggml.token_type"] == [1, 1, 3]
    assert f.metadata["some.flag"] is True
    assert f.metadata["some.big"] == 1 << 40

    assert f.tensors["w.f32"].shape == (16, 64)
    np.testing.assert_array_equal(f.tensors["w.f32"].array(), w)
    np.testing.assert_array_equal(f.tensors["b"].array(), b)
    np.testing.assert_array_equal(f.tensors["ids"].array(), ids)
    np.testing.assert_allclose(f.tensors["w.f16"].array(), w.astype(np.float16), rtol=1e-3)
    np.testing.assert_allclose(f.tensors["w.bf16"].array(), w, rtol=1e-2)

    # Q8_0: dequant path and parts path agree.
    t = f.tensors["w.q8"]
    q, d = t.q8_0_parts()
    assert q.dtype == np.int8 and d.dtype == np.float16
    assert q.shape == (16, 64) and d.shape == (16, 2)
    np.testing.assert_array_equal(gguf.dequantize_q8_0(q, d), t.array())
    np.testing.assert_allclose(t.array(), w, atol=np.abs(w).max() / 100)


def test_gguf_alignment_and_offsets(tmp_path):
    path = str(tmp_path / "a.gguf")
    tensors = {f"t{i}": np.full((7,), i, dtype=np.float32) for i in range(5)}
    gguf.write_gguf(path, {}, tensors, alignment=64)
    f = gguf.read_gguf(path)
    for i in range(5):
        t = f.tensors[f"t{i}"]
        assert t.data_offset % 64 == 0
        np.testing.assert_array_equal(t.array(), np.full((7,), i, dtype=np.float32))


def test_gguf_rejects_non_gguf(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        gguf.read_gguf(str(p))


def test_q4_0_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    path = str(tmp_path / "q4.gguf")
    gguf.write_gguf(path, {}, {"w": (w, gguf.GGML_Q4_0)})
    f = gguf.read_gguf(path)
    t = f.tensors["w"]
    assert t.ggml_type == gguf.GGML_Q4_0
    # 4-bit symmetric [-8,7]: worst case is the clipped positive extreme,
    # error ≤ one scale step (absmax/8).
    back = t.array()
    absmax = np.abs(w.reshape(8, 2, 32)).max(axis=-1, keepdims=True)
    bound = np.broadcast_to(absmax / 8 * 1.05 + 1e-3, (8, 2, 32)).reshape(8, 64)
    assert np.all(np.abs(back - w) <= bound)
    # int8 expansion path feeds the shared kernel layout
    q, d = t.q8_0_parts()
    assert q.dtype == np.int8 and q.min() >= -8 and q.max() <= 7
    np.testing.assert_array_equal(gguf.dequantize_q8_0(q, d), back)


def test_bf16_writer_rounds_to_nearest_even(tmp_path):
    """ggml_compute_fp32_to_bf16 rounds ties to even and quiets NaNs;
    plain +0x8000 (half-up) would bump 0x...8000 ties to the odd value."""
    bits = np.array(
        [0x3F808000, 0x3F818000, 0x7FC00000, 0x3F800001], dtype=np.uint32
    )
    x = bits.view(np.float32)
    path = str(tmp_path / "bf16.gguf")
    gguf.write_gguf(path, {}, {"w": (x, gguf.GGML_BF16)})
    t = gguf.read_gguf(path).tensors["w"]
    raw = t.raw().copy().view("<u2")
    # 0x3F808000: tie → even → 0x3F80 (half-up gives 0x3F81)
    # 0x3F818000: tie → even → 0x3F82
    # NaN stays NaN (quiet bit forced); 0x3F800001 rounds down
    assert list(raw[:2]) == [0x3F80, 0x3F82]
    assert np.isnan(t.array()[2])
    assert raw[3] == 0x3F80


def test_q8_0_matches_ggml_reference_quantizer():
    """Byte parity with ggml's ``quantize_row_q8_0_ref``: scale stays f32
    until the f16 store, quants use the UNROUNDED inverse (1/d before f16
    rounding), and rounding is half-away-from-zero (C roundf) — np.rint's
    ties-to-even flips exact .5 quants."""
    # Deterministic tie case: d = 1.0 exactly, elements landing on .5
    tie = np.zeros(32, dtype=np.float32)
    tie[0] = 127.0  # absmax → d32 = 1.0 (f16-exact)
    tie[1:7] = [2.5, -2.5, 0.5, -0.5, 1.5, -1.5]
    q, d = gguf.quantize_q8_0(tie)
    assert float(d[0]) == 1.0
    np.testing.assert_array_equal(q[:7], [127, 3, -3, 1, -1, 2, -2])

    # Random blocks vs a literal float32 transcription of the C reference
    rng = np.random.default_rng(23)
    x = rng.standard_normal((64, 32)).astype(np.float32) * rng.uniform(
        0.001, 8.0, size=(64, 1)
    ).astype(np.float32)
    x[5] = 0.0  # zero block → d = 0, q = 0
    q, d = gguf.quantize_q8_0(x)
    for row in range(x.shape[0]):
        blk = x[row]
        amax = np.float32(np.max(np.abs(blk)))
        d_ref = np.float32(amax / np.float32(127.0))
        assert float(np.float16(d_ref)) == float(d[row, 0])
        id_ref = np.float32(0.0) if d_ref == 0 else np.float32(1.0) / d_ref
        scaled = blk * id_ref
        q_ref = np.sign(scaled) * np.floor(np.abs(scaled) + np.float32(0.5))
        np.testing.assert_array_equal(q[row], q_ref.astype(np.int8))


def test_q4_0_matches_ggml_reference_quantizer():
    """ADVICE r1: writer must use ggml's scheme — signed extreme → index 0
    exactly (d = extreme/-8), indices min(15, floor(x/d + 8.5))."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal((64, 32)).astype(np.float32) * rng.uniform(
        0.01, 4.0, size=(64, 1)
    ).astype(np.float32)
    # Force blocks whose extreme is positive (the old symmetric scheme
    # saturated these at 7/8 of their value).
    x[0] = np.linspace(-1, 2.0, 32, dtype=np.float32)

    q, d = gguf.quantize_q4_0(x)

    for row in range(x.shape[0]):
        blk = x[row]
        amax_i = int(np.argmax(np.abs(blk)))
        extreme = float(blk[amax_i])
        d_ref = extreme / -8.0
        assert float(np.float16(d_ref)) == float(d[row, 0])
        inv = 0.0 if d_ref == 0 else 1.0 / d_ref
        idx_ref = np.minimum(15, np.floor(blk * inv + 8.5)).astype(np.int8)
        np.testing.assert_array_equal(q[row], idx_ref - 8)
        # the extreme survives quantization exactly (up to f16 scale)
        back = (q[row].astype(np.float32)) * float(np.float16(d_ref))
        assert abs(back[amax_i] - extreme * float(np.float16(d_ref)) / d_ref) < 1e-6


def test_q4_0_nibble_order():
    """ggml packs element j in the low nibble and j+16 in the high nibble."""
    x = np.arange(-8, 8, 0.5, dtype=np.float32).reshape(1, 32)  # -8..7.5
    q, d = gguf.quantize_q4_0(x * 1.0)
    raw = np.frombuffer(gguf._q4_0_to_bytes(q, d), dtype=np.uint8)
    q2, d2 = gguf._q4_0_from_bytes(raw, (1, 32))
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(np.asarray(d, np.float16), np.asarray(d2))


def test_truncated_header_raises_not_crashes(tmp_path):
    """A download cut off mid-header must raise a Python exception (which the
    engine's initialize() wraps as a typed ``init_error``), never segfault or
    silently parse."""
    good = str(tmp_path / "good.gguf")
    gguf.write_gguf(good, {"k": "v"}, {"t": np.zeros((64,), np.float32)})
    blob = open(good, "rb").read()
    for cut in (6, 20, len(blob) // 4):
        bad = tmp_path / f"cut{cut}.gguf"
        bad.write_bytes(blob[:cut])
        with pytest.raises(Exception):
            gguf.read_gguf(str(bad))


def test_truncated_data_section_fails_on_materialize(tmp_path):
    """Header intact but tensor bytes missing: the mmap slice comes up short
    and materialization must raise (numpy slicing is silent — the reshape is
    the guard), both for float and Q8_0 tensors."""
    good = str(tmp_path / "good.gguf")
    gguf.write_gguf(
        good,
        {},
        {
            "f": np.arange(4096, dtype=np.float32),
            "q": (np.random.default_rng(0).standard_normal((64, 64)).astype(np.float32), gguf.GGML_Q8_0),
        },
    )
    blob = open(good, "rb").read()
    f = gguf.read_gguf(good)
    data_start = min(t.data_offset for t in f.tensors.values())
    f.close()
    bad = tmp_path / "short.gguf"
    bad.write_bytes(blob[: data_start + 100])
    short = gguf.read_gguf(str(bad))
    with pytest.raises(Exception):
        short.tensors["f"].array()
    with pytest.raises(Exception):
        short.tensors["q"].q8_0_parts()


def test_empty_file_raises(tmp_path):
    p = tmp_path / "empty.gguf"
    p.write_bytes(b"")
    with pytest.raises(Exception):
        gguf.read_gguf(str(p))
