"""ms_deform_attn (stacked-tap gather) vs a naive per-tap oracle — the
reference's kernel-vs-fallback test pattern (ops/test.py)."""

import numpy as np
import jax.numpy as jnp

from xmask3d_tpu.ops.deform_attn import bilinear_sample_nhwc, ms_deform_attn


def oracle(value, shapes, loc, w):
    b, _, heads, d = value.shape
    lq, npts = loc.shape[1], loc.shape[4]
    offs = [0]
    for hh, ww in shapes:
        offs.append(offs[-1] + hh * ww)
    out = np.zeros((b, lq, heads, d), np.float64)
    for li, (hh, ww) in enumerate(shapes):
        v = value[:, offs[li] : offs[li + 1]].transpose(0, 2, 1, 3)
        v = v.reshape(b * heads, hh, ww, d)
        px = loc[:, :, :, li, :, 0] * ww - 0.5
        py = loc[:, :, :, li, :, 1] * hh - 0.5
        px = px.transpose(0, 2, 1, 3).reshape(b * heads, lq * npts)
        py = py.transpose(0, 2, 1, 3).reshape(b * heads, lq * npts)
        s = np.asarray(
            bilinear_sample_nhwc(jnp.asarray(v), jnp.asarray(px), jnp.asarray(py))
        )
        s = s.reshape(b, heads, lq, npts, d)
        out += np.einsum("bhqpd,bhqp->bqhd", s, w[:, :, :, li].transpose(0, 2, 1, 3))
    return out.reshape(b, lq, heads * d)


def test_matches_per_tap_oracle():
    rng = np.random.RandomState(0)
    shapes = [(4, 6), (8, 12), (16, 24)]
    b, heads, d, lq, npts = 2, 4, 8, 37, 4
    total = sum(h * w for h, w in shapes)
    value = rng.randn(b, total, heads, d).astype(np.float32)
    # include out-of-range samples (negative / beyond the map)
    loc = rng.uniform(-0.3, 1.3, (b, lq, heads, len(shapes), npts, 2)).astype(
        np.float32
    )
    w = rng.rand(b, lq, heads, len(shapes), npts).astype(np.float32)
    out = np.asarray(
        ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    )
    ref = oracle(value, shapes, loc, w)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
