"""Q8_0 Pallas matmul kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_whisper_tpu.formats.gguf import quantize_q8_0
from light_whisper_tpu.ops.linear import q8_matmul_xla
from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas


def _case(T, out_f, in_f, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((out_f, in_f)).astype(np.float32) / np.sqrt(in_f)
    q, s = quantize_q8_0(w)
    x = rng.standard_normal((T, in_f)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(q), jnp.asarray(s)


@pytest.mark.parametrize(
    "T,out_f,in_f",
    [
        (1, 256, 512),  # decode step
        (8, 512, 1024),
        (64, 256, 512),
        (200, 384, 512),  # T padded to a tile multiple
    ],
)
def test_kernel_matches_xla_path(T, out_f, in_f):
    x, q, s = _case(T, out_f, in_f)
    want = np.asarray(q8_matmul_xla(x, q, s))
    got = np.asarray(q8_matmul_pallas(x, q, s, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_kernel_exact_on_integer_values():
    """With integer activations and power-of-two scales, both paths are exact."""
    rng = np.random.default_rng(1)
    q = rng.integers(-127, 127, size=(256, 512), dtype=np.int8)
    s = np.full((256, 512 // 32), 0.5, dtype=np.float16)
    x = rng.integers(-4, 4, size=(16, 512)).astype(np.float32)
    got = np.asarray(q8_matmul_pallas(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), interpret=True))
    want = x @ (q.astype(np.float32) * 0.5).T
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_batched_leading_dims():
    x, q, s = _case(12, 256, 512, seed=2)
    x3 = x.reshape(3, 4, 512)
    got = np.asarray(q8_matmul_pallas(x3, q, s, interpret=True))
    want = np.asarray(q8_matmul_xla(x3, q, s))
    assert got.shape == (3, 4, 256)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
