"""Spatial activation sharding == replicated numerics.

The flagship AOT finding (AOT_FLAGSHIP_TP.json): kernel-only TP leaves
batch-1 activations replicated, so the B15N4 train step does not fit
16 GiB v5e chips. `parallel.mesh.activation_sharding` constrains the SD
UNet/VAE block activations to shard their H dim over the `model` axis —
XLA's SPMD partitioner then splits the convs spatially (inserting halo
exchanges for the 3x3 windows). These tests prove (a) the constrained
forward is numerically identical to the replicated one, (b) the constraint
really lands in the lowered program, and (c) indivisible dims no-op safely.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.models.sd_unet import SDUNet, UNET_TINY
from xmask3d_tpu.models.vae import AutoencoderKL, VAE_TINY
from xmask3d_tpu.parallel.mesh import (
    activation_sharding,
    create_mesh,
    shard_spatial,
)

# compile-heavy kernel/model tests (excluded from make test-fast)
pytestmark = pytest.mark.e2e


def _unet_and_inputs(hw=32):
    model = SDUNet(cfg=UNET_TINY, tap_indices=(2, 5, 8, 11))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, hw, hw, 4), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(key, (1, 77, UNET_TINY.context_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, t, ctx)
    return model, variables, (x, t, ctx)


def test_act_sharded_unet_matches_replicated():
    model, variables, (x, t, ctx) = _unet_and_inputs()

    def fwd(v, x, t, ctx):
        eps, taps = model.apply(v, x, t, ctx)
        return (eps, *taps)

    ref = jax.jit(fwd)(variables, x, t, ctx)

    mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
    with mesh, activation_sharding(mesh):
        out = jax.jit(fwd)(variables, x, t, ctx)
        # the constraint must actually appear in the lowered program
        txt = jax.jit(fwd).lower(variables, x, t, ctx).as_text()
    assert "sharding" in txt and '"model"' in txt

    for r, o in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=0, atol=1e-4,
        )


def test_act_sharded_vae_matches_replicated():
    model = AutoencoderKL(cfg=VAE_TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)

    def enc(v, x):
        latent, taps = model.apply(v, x, method=model.encode)
        return (latent, *taps)

    ref = jax.jit(enc)(variables, x)
    mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
    with mesh, activation_sharding(mesh):
        out = jax.jit(enc)(variables, x)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=0, atol=1e-4,
        )


def test_indivisible_and_disabled_are_noops():
    mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
    x6 = jnp.ones((1, 7, 8, 3))  # H=7 not divisible by 2
    with activation_sharding(mesh):
        assert shard_spatial(x6) is x6
        scalarish = jnp.ones((3,))
        assert shard_spatial(scalarish) is scalarish
    # disabled (no context): identity
    x8 = jnp.ones((1, 8, 8, 3))
    assert shard_spatial(x8) is x8
    # divisible + enabled: still executes fine outside jit
    with activation_sharding(mesh):
        y = shard_spatial(x8)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x8))


def test_act_sharding_train_grads_match():
    """Backward through the constrained UNet (the training case) matches the
    replicated gradients — halo-exchange transposes must be exact."""
    model, variables, (x, t, ctx) = _unet_and_inputs(hw=16)

    def loss(v, x, t, ctx):
        eps, taps = model.apply(v, x, t, ctx)
        return jnp.sum(eps ** 2) + sum(jnp.sum(tp ** 2) for tp in taps)

    gref = jax.jit(jax.grad(loss))(variables, x, t, ctx)
    mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
    with mesh, activation_sharding(mesh):
        gout = jax.jit(jax.grad(loss))(variables, x, t, ctx)
    flat_r = jax.tree_util.tree_leaves(gref)
    flat_o = jax.tree_util.tree_leaves(gout)
    assert len(flat_r) == len(flat_o)
    for r, o in zip(flat_r, flat_o):
        r = np.asarray(r, np.float32)
        o = np.asarray(o, np.float32)
        # sum-of-squares loss grads reach O(1e3); spatial partitioning
        # reassociates the fp32 reductions, so compare relative to the
        # gradient scale (measured max rel err 4e-3 at hw=16 / model=2 —
        # a real transpose/halo bug corrupts at O(1))
        rel = np.abs(o - r) / np.maximum(np.abs(r), 1.0)
        assert rel.max() < 0.02, rel.max()
