"""Pallas deformable-attention kernel vs the XLA oracle.

The XLA formulation (ms_deform_attn) is itself golden-tested against the
reference's ms_deform_attn_core_pytorch in tests/test_golden_reference.py;
here the Pallas masked-matmul kernel (interpret mode on CPU) must match it
bit-for-tolerance, including out-of-bounds samples and padding tails.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmask3d_tpu.ops.deform_attn import ms_deform_attn, ms_deform_attn_pallas


def _random_case(key, b=2, heads=4, d=8, lq=37, npts=4, shapes=((6, 9), (3, 5))):
    ks = jax.random.split(key, 3)
    n = sum(h * w for h, w in shapes)
    value = jax.random.normal(ks[0], (b, n, heads, d), jnp.float32)
    # locations span beyond [0,1] to exercise the zero-padding path
    loc = jax.random.uniform(
        ks[1], (b, lq, heads, len(shapes), npts, 2), minval=-0.3, maxval=1.3
    )
    aw = jax.nn.softmax(
        jax.random.normal(ks[2], (b, lq, heads, len(shapes), npts)), axis=-1
    )
    return value, shapes, loc, aw


@pytest.mark.parametrize("q_tile", [128, 512])
def test_pallas_matches_xla_oracle(q_tile):
    value, shapes, loc, aw = _random_case(jax.random.PRNGKey(0))
    ref = ms_deform_attn(value, shapes, loc, aw)
    out = ms_deform_attn_pallas(
        value, shapes, loc, aw, q_tile=q_tile, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_pallas_bf16_value():
    value, shapes, loc, aw = _random_case(jax.random.PRNGKey(1), heads=2, d=32)
    ref = ms_deform_attn(value.astype(jnp.bfloat16), shapes, loc, aw)
    out = ms_deform_attn_pallas(
        value.astype(jnp.bfloat16), shapes, loc, aw, interpret=True
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


def test_pallas_sorted_grid_queries_match():
    """lq == sum(H*W) engages the static target-position column sort; the
    permuted kernel must be exactly equivalent to the unsorted one."""
    shapes = ((6, 9), (3, 5))
    n = sum(h * w for h, w in shapes)
    value, shapes, loc, aw = _random_case(
        jax.random.PRNGKey(3), lq=n, shapes=shapes
    )
    ref = ms_deform_attn(value, shapes, loc, aw)
    srt = ms_deform_attn_pallas(
        value, shapes, loc, aw, q_tile=128, sort_queries=True, interpret=True
    )
    uns = ms_deform_attn_pallas(
        value, shapes, loc, aw, q_tile=128, sort_queries=False, interpret=True
    )
    np.testing.assert_allclose(np.asarray(srt), np.asarray(ref), atol=2e-5, rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(srt), np.asarray(uns))


def test_pallas_all_out_of_bounds_is_zero():
    value, shapes, loc, aw = _random_case(jax.random.PRNGKey(2))
    far = jnp.full_like(loc, 5.0)  # every sample far outside every level
    out = ms_deform_attn_pallas(value, shapes, far, aw, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)
