"""Fused GroupNorm->SiLU->Conv3x3 kernel vs the unfused oracle.

The Pallas kernel runs in interpret mode on CPU (mosaic lowering is
validated on TPU by the bench); the oracle is the unfused reference
computation, itself asserted against flax GroupNorm + nn.Conv.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xmask3d_tpu.ops.gn_conv import (
    _fused_forward,
    gn_silu_conv,
    gn_silu_conv_reference,
)


def _data(bsz=1, h=32, wd=128, c=128, cout=128, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(bsz, h, wd, c), dtype)
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, c, cout) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    return x, scale, bias, w, b


def test_reference_matches_flax_modules():
    from flax import linen as nn

    x, scale, bias, w, b = _data()

    class Unfused(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="gn")(x)
            h = nn.silu(h)
            return nn.Conv(w.shape[-1], (3, 3), padding=1, name="conv")(h)

    mod = Unfused()
    variables = mod.init(jax.random.PRNGKey(0), x)
    variables["params"]["gn"]["scale"] = scale
    variables["params"]["gn"]["bias"] = bias
    variables["params"]["conv"]["kernel"] = w
    variables["params"]["conv"]["bias"] = b
    want = mod.apply(variables, x)
    got = gn_silu_conv_reference(x, scale, bias, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("h,wd,th", [(32, 128, 16), (16, 256, 4), (8, 128, 8)])
def test_fused_kernel_matches_oracle(h, wd, th):
    x, scale, bias, w, b = _data(h=h, wd=wd, seed=h + wd)
    want = gn_silu_conv_reference(x, scale, bias, w, b)
    got = _fused_forward(x, scale, bias, w, b, 32, 1e-6, th, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_kernel_batch_and_edges():
    # batch 2 exercises per-batch stats; constant interior + random border
    # exercises the zero-pad edges specifically
    x, scale, bias, w, b = _data(bsz=2, h=32, wd=128, seed=3)
    want = gn_silu_conv_reference(x, scale, bias, w, b)
    got = _fused_forward(x, scale, bias, w, b, 32, 1e-6, 16, interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(want))
    # check edges as strictly as the interior
    assert err[:, 0, :, :].max() < 2e-4
    assert err[:, -1, :, :].max() < 2e-4
    assert err[:, :, 0, :].max() < 2e-4
    assert err[:, :, -1, :].max() < 2e-4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_bf16():
    x, scale, bias, w, b = _data(h=32, wd=128, seed=5, dtype=jnp.bfloat16)
    want = gn_silu_conv_reference(x, scale, bias, w, b)
    got = _fused_forward(x, scale, bias, w, b, 32, 1e-6, 16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_gradients_flow_via_reference_vjp():
    from xmask3d_tpu.ops.gn_conv import _gn_silu_conv_fused

    x, scale, bias, w, b = _data(h=16, wd=128, seed=7)

    def loss_fused(x, scale, bias, w, b):
        return _gn_silu_conv_fused(x, scale, bias, w, b, 32, 1e-6, 8, True).sum()

    def loss_ref(x, scale, bias, w, b):
        return gn_silu_conv_reference(x, scale, bias, w, b).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 3))(x, scale, bias, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 3))(x, scale, bias, w, b)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def test_resnet_block_branches_share_param_tree(monkeypatch):
    """The fused branch's parameter containers must create EXACTLY the
    module branch's tree (names+shapes), and produce matching outputs with
    the same weights — so init/apply can take different branches across
    processes and checkpoints stay compatible."""
    import xmask3d_tpu.models.vae as vae

    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 128, 128),
                    jnp.float32)
    block = vae.ResnetBlock(out_ch=128)
    v_mod = block.init(jax.random.PRNGKey(0), x)

    monkeypatch.setattr(vae, "fused_available", lambda *a, **k: True)
    v_fused = block.init(jax.random.PRNGKey(0), x)

    tree_mod = jax.tree_util.tree_map(jnp.shape, v_mod)
    tree_fused = jax.tree_util.tree_map(jnp.shape, v_fused)
    assert tree_mod == tree_fused

    # same weights -> same outputs (fused branch falls back to the
    # reference computation on CPU, which matches the modules numerically)
    out_fused = block.apply(v_mod, x)
    monkeypatch.undo()
    out_mod = block.apply(v_mod, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_mod),
                               rtol=1e-4, atol=1e-5)


def test_dispatch_falls_back_off_tpu():
    x, scale, bias, w, b = _data(h=16, wd=128)
    got = gn_silu_conv(x, scale, bias, w, b)  # CPU -> reference path
    want = gn_silu_conv_reference(x, scale, bias, w, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
