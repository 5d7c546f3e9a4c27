"""Pallas flash attention vs XLA oracle (interpret mode on CPU) — the
reference's dual-implementation kernel-test pattern (ops/test.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmask3d_tpu.ops.flash_attention import flash_attention, reference_attention


@pytest.mark.parametrize("tq,tk", [(256, 256), (512, 128), (256, 512)])
def test_flash_matches_reference(tq, tk):
    rng = np.random.RandomState(0)
    b, h, d = 1, 2, 32
    q = jnp.asarray(rng.randn(b, h, tq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, tk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, tk, d).astype(np.float32))
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fallback_on_odd_shapes():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 1, 77, 16).astype(np.float32))
    out = flash_attention(q, q, q, interpret=True)
    ref = reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
