"""Device hierarchy builder vs host builder: level-0 maps must match
exactly; deeper levels may permute rows, so equivalence is checked through
the MinkUNet output (which only depends on level-0 row order)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from xmask3d_tpu.ops.hierarchy_device import build_hierarchy_on_device
from xmask3d_tpu.ops.sparse_conv import build_hierarchy, stack_hierarchies
from xmask3d_tpu.models.minkunet import mink_unet

# compile-heavy kernel/model tests (excluded from make test-fast)
pytestmark = pytest.mark.e2e

CAPS = (256, 256, 128, 64, 32)


def _coords(n=180, hi=14, seed=0):
    rng = np.random.RandomState(seed)
    return np.unique(rng.randint(0, hi, (n, 3)).astype(np.int32), axis=0)


def _stage(cs):
    b = len(cs)
    coords = np.zeros((b, CAPS[0], 3), np.int32)
    num = np.zeros((b,), np.int32)
    for i, c in enumerate(cs):
        coords[i, : len(c)] = c
        num[i] = len(c)
    return jnp.asarray(coords), jnp.asarray(num)


def test_level0_maps_match_host():
    cs = [_coords(seed=0), _coords(seed=1)]
    coords, num = _stage(cs)
    hd = build_hierarchy_on_device(coords, num, CAPS)
    hh = stack_hierarchies([build_hierarchy(c, CAPS) for c in cs])
    np.testing.assert_array_equal(np.asarray(hd.levels[0].kmap3), hh.levels[0].kmap3)
    np.testing.assert_array_equal(np.asarray(hd.kmap5), hh.kmap5)
    np.testing.assert_array_equal(np.asarray(hd.levels[0].valid), hh.levels[0].valid)
    # level1 voxel SETS match (row order may differ: device is key-sorted)
    for b in range(2):
        n_d = int(hd.levels[1].num[b])
        n_h = int(hh.levels[1].num[b])
        assert n_d == n_h
        set_d = {tuple(r) for r in np.asarray(hd.levels[1].coords[b][:n_d])}
        set_h = {tuple(r) for r in hh.levels[1].coords[b][:n_h]}
        assert set_d == set_h


def test_unet_output_equal_under_both_builders(monkeypatch):
    # compare the BUILDERS, not the conv formulations: the device builder
    # carries no brick metadata, so pin both forwards to the gather path
    monkeypatch.setenv("XMASK3D_BRICK", "0")
    cs = [_coords(seed=2), _coords(seed=3)]
    coords, num = _stage(cs)
    hd = build_hierarchy_on_device(coords, num, CAPS)
    hh = jax.tree_util.tree_map(
        jnp.asarray, stack_hierarchies([build_hierarchy(c, CAPS) for c in cs])
    )
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, CAPS[0], 3).astype(np.float32))
    feats = jnp.where(hd.levels[0].valid[..., None], feats, 0)
    model = mink_unet(out_channels=8, arch="MinkUNet14A")
    variables = model.init(jax.random.PRNGKey(0), feats, hh, train=False)
    _, out_h = model.apply(variables, feats, hh, train=False)
    _, out_d = model.apply(variables, feats, hd, train=False)
    np.testing.assert_allclose(
        np.asarray(out_h), np.asarray(out_d), rtol=2e-4, atol=2e-4
    )
