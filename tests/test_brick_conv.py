"""Brick-dense conv vs the gather-table sparse conv oracle.

Same hierarchy, same weights: the dense halo'd-brick formulation must
reproduce the kmap formulation exactly on every voxel whose brick survived
the brick capacity (ops/brick_conv.py docstring)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xmask3d_tpu.data.batching import Capacities
from xmask3d_tpu.data.synthetic import _room_surface_points
from xmask3d_tpu.data.voxelizer import Voxelizer
from xmask3d_tpu.ops.brick_conv import brick_conv, from_brick, to_brick
from xmask3d_tpu.ops.sparse_conv import build_hierarchy, sparse_conv

# compile-heavy kernel/model tests (excluded from make test-fast)
pytestmark = pytest.mark.e2e


def _surface_hierarchy(seed=0, cap=2048):
    rng = np.random.RandomState(seed)
    pts = _room_surface_points(rng, 16000, room=(2.0, 2.0, 1.5))
    vox = Voxelizer(voxel_size=0.05)
    coords, _, _, _ = vox.voxelize(pts, np.ones((len(pts), 3)), None)
    coords = coords[:cap]
    return build_hierarchy(
        coords, [cap, cap // 2, cap // 4, cap // 8, cap // 16], brick_divisor=8
    )


@pytest.mark.parametrize("kernel", [3, 5])
def test_brick_conv_matches_gather_oracle(kernel):
    h = _surface_hierarchy()
    lv = h.levels[0]
    assert lv.nbr27 is not None
    rng = np.random.RandomState(1)
    cap = lv.valid.shape[0]
    cin, cout = 8, 16
    feats = rng.randn(1, cap, cin).astype(np.float32)
    feats[0, ~lv.valid] = 0.0
    kmap = h.kmap5 if kernel == 5 else lv.kmap3
    k = kmap.shape[0]
    w = rng.randn(k, cin, cout).astype(np.float32) * 0.1

    ref = sparse_conv(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(kmap)[None],
        out_valid=jnp.asarray(lv.valid)[None],
    )

    sor = jnp.asarray(lv.slot_of_rank)[None]
    bricks = to_brick(jnp.asarray(feats), sor, lv.slot_valid.shape[0])
    out_b = brick_conv(
        bricks, jnp.asarray(w), jnp.asarray(lv.nbr27)[None],
        slot_valid=jnp.asarray(lv.slot_valid)[None],
    )
    out = from_brick(out_b, sor)

    kept = lv.valid & (lv.slot_of_rank >= 0)
    assert kept.sum() == lv.valid.sum(), "brick capacity overflowed in fixture"
    np.testing.assert_allclose(
        np.asarray(out)[0, kept], np.asarray(ref)[0, kept], atol=2e-4, rtol=2e-4
    )


def test_brick_roundtrip_and_slot_consistency():
    h = _surface_hierarchy(seed=2)
    for lv in h.levels:
        n = int(lv.num)
        sor = lv.slot_of_rank
        # each surviving voxel owns a unique slot; slot_valid marks exactly those
        kept = sor[:n][sor[:n] >= 0]
        assert len(np.unique(kept)) == len(kept)
        assert lv.slot_valid.sum() == len(kept)
        # padding ranks carry no slot
        assert (sor[n:] == -1).all()

    lv = h.levels[0]
    rng = np.random.RandomState(3)
    feats = rng.randn(1, lv.valid.shape[0], 4).astype(np.float32)
    sor = jnp.asarray(lv.slot_of_rank)[None]
    back = from_brick(to_brick(jnp.asarray(feats), sor, lv.slot_valid.shape[0]), sor)
    kept = lv.slot_of_rank >= 0
    np.testing.assert_array_equal(np.asarray(back)[0, kept], feats[0, kept])


def test_minkunet_brick_path_matches_gather_path(monkeypatch):
    """Full MinkUNet forward: the brick-dense stage path must reproduce the
    gather-table path (same params, same hierarchy) voxel-for-voxel."""
    import jax

    from xmask3d_tpu.models.minkunet import mink_unet

    h1 = _surface_hierarchy(seed=6, cap=1024)
    for lv in h1.levels:
        n = int(lv.num)
        assert (lv.slot_of_rank[:n] >= 0).all(), "fixture overflowed bricks"
    h = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[None]), h1)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(1, 1024, 3).astype(np.float32))

    mu = mink_unet(out_channels=16, arch="MinkUNet14A")

    monkeypatch.setenv("XMASK3D_BRICK", "0")
    variables = mu.init(jax.random.PRNGKey(0), feats, h, False)
    ref_bot, ref_out = mu.apply(variables, feats, h, False)

    monkeypatch.setenv("XMASK3D_BRICK", "1")
    bot, out = mu.apply(variables, feats, h, False)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=2e-3, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(bot), np.asarray(ref_bot), atol=2e-3, rtol=2e-3
    )


def test_to_brick_negative_slots_are_dropped_not_wrapped():
    """Regression: jnp `.at[...].set(mode="drop")` keeps numpy negative-index
    semantics, so a raw slot of -1 would WRAP into the last brick slot and
    clobber whichever voxel owns it. to_brick must remap -1 to a truly
    out-of-range sentinel first."""
    feats = jnp.asarray(
        np.stack([np.full((3,), v, np.float32) for v in (1.0, 2.0, 9.9)])
    )[None]  # rows: slot 0, LAST slot, invalid (-1)
    n_slots = 128
    sor = jnp.asarray([[0, n_slots - 1, -1]], jnp.int32)
    out = np.asarray(to_brick(feats, sor, n_slots))
    np.testing.assert_array_equal(out[0, 0], [1.0, 1.0, 1.0])
    np.testing.assert_array_equal(out[0, n_slots - 1], [2.0, 2.0, 2.0])
    assert (np.abs(out).sum(axis=-1) > 0).sum() == 2  # -1 row truly dropped


def test_device_vote_add_negative_ids_are_dropped():
    """Same numpy-wrapping hazard for the on-device voter: -1 point ids
    must not increment the LAST point's votes."""
    from xmask3d_tpu.engine.infer import device_vote_add

    votes = jnp.zeros((10, 4), jnp.int32)
    counter = jnp.zeros((10,), jnp.int32)
    ids = jnp.asarray([0, 3, -1, -1])
    preds = jnp.asarray([1, 2, 3, 3])
    valid = jnp.asarray([True, True, True, True])
    v, c = device_vote_add(votes, counter, ids, preds, valid)
    assert int(c[9]) == 0 and int(v[9].sum()) == 0
    assert int(c.sum()) == 2 and int(v[0, 1]) == 1 and int(v[3, 2]) == 1


def test_brick_conv_bias_and_bf16():
    h = _surface_hierarchy(seed=4, cap=1024)
    lv = h.levels[1]
    rng = np.random.RandomState(5)
    cap = lv.valid.shape[0]
    feats = rng.randn(1, cap, 16).astype(np.float32)
    feats[0, ~lv.valid] = 0.0
    w = rng.randn(27, 16, 8).astype(np.float32) * 0.1
    bias = np.arange(8, dtype=np.float32) * 0.01

    ref = sparse_conv(
        jnp.asarray(feats, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
        jnp.asarray(lv.kmap3)[None], bias=jnp.asarray(bias),
        out_valid=jnp.asarray(lv.valid)[None],
    )
    sor = jnp.asarray(lv.slot_of_rank)[None]
    bricks = to_brick(
        jnp.asarray(feats, jnp.bfloat16), sor, lv.slot_valid.shape[0]
    )
    out = from_brick(
        brick_conv(
            bricks, jnp.asarray(w, jnp.bfloat16), jnp.asarray(lv.nbr27)[None],
            slot_valid=jnp.asarray(lv.slot_valid)[None], bias=jnp.asarray(bias),
        ),
        sor,
    )
    kept = lv.valid & (lv.slot_of_rank >= 0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[0, kept],
        np.asarray(ref, np.float32)[0, kept],
        atol=0.1, rtol=0.1,
    )
