"""Sparse conv engine: kernel-map invariants + conv vs naive numpy oracle.

Mirrors the reference's only test pattern (optimized kernel vs naive
reference, third_party .../ops/test.py) for our engine.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmask3d_tpu.ops.sparse_conv import (
    build_hierarchy,
    stack_hierarchies,
    sparse_conv,
    sparse_conv_transpose,
    global_max_pool,
    _offsets,
    _pack,
)

CAPS = (256, 256, 128, 64, 32)


def random_coords(n, lo=0, hi=24, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.randint(lo, hi, size=(n * 2, 3))
    c = np.unique(c, axis=0)[:n]
    return c.astype(np.int32)


def naive_sparse_conv(coords, feats, weights, offsets, out_coords=None):
    """O(N*K) dict-based oracle."""
    out_coords = coords if out_coords is None else out_coords
    table = {tuple(c): i for i, c in enumerate(coords)}
    out = np.zeros((len(out_coords), weights.shape[2]), np.float64)
    for j, oc in enumerate(out_coords):
        for k, off in enumerate(offsets):
            i = table.get(tuple(oc + off))
            if i is not None:
                out[j] += feats[i].astype(np.float64) @ weights[k].astype(np.float64)
    return out


def test_hierarchy_shapes_and_validity():
    coords = random_coords(200, hi=14)
    h = build_hierarchy(coords, CAPS)
    assert len(h.levels) == 5
    assert int(h.levels[0].num) == len(coords)
    for lv, level in enumerate(h.levels):
        n = int(level.num)
        assert level.valid[:n].all() and not level.valid[n:].any()
        # coords at level lv are multiples of 2^lv
        assert (level.coords[:n] % (2**lv) == 0).all()
        # kmap center offset (index 13 of 27) maps each voxel to itself
        assert (level.kmap3[13, :n] == np.arange(n)).all()
        assert (level.kmap3[:, n:] == -1).all()
    # downsampled coords are exactly the unique parents
    for lv in range(4):
        s = 2 ** (lv + 1)
        n = int(h.levels[lv].num)
        parents = np.unique(
            _pack((h.levels[lv].coords[:n] // s) * s)
        )
        n2 = int(h.levels[lv + 1].num)
        got = np.sort(_pack(h.levels[lv + 1].coords[:n2]))
        assert np.array_equal(parents, got)


def test_up_parent_exists_and_octant_range():
    coords = random_coords(300, hi=14, seed=1)
    h = build_hierarchy(coords, (512, 512, 256, 128, 64))
    for lv in range(4):
        n = int(h.levels[lv].num)
        assert (h.up_parent[lv][:n] >= 0).all(), "every fine voxel has a parent"
        assert (h.up_octant[lv][:n] >= 0).all() and (h.up_octant[lv][:n] < 8).all()


@pytest.mark.parametrize("kernel", [3, 5])
def test_sparse_conv_matches_oracle(kernel):
    coords = random_coords(120, hi=12, seed=2)
    h = build_hierarchy(coords, CAPS)
    hb = stack_hierarchies([h])
    n = len(coords)
    cin, cout = 7, 5
    rng = np.random.RandomState(3)
    feats = rng.randn(n, cin).astype(np.float32)
    k = kernel**3
    w = rng.randn(k, cin, cout).astype(np.float32) * 0.1

    feats_pad = np.zeros((1, CAPS[0], cin), np.float32)
    feats_pad[0, :n] = feats
    kmap = hb.levels[0].kmap3 if kernel == 3 else hb.kmap5
    out = sparse_conv(
        jnp.asarray(feats_pad), jnp.asarray(w), jnp.asarray(kmap),
        out_valid=jnp.asarray(hb.levels[0].valid),
    )
    ref = naive_sparse_conv(coords, feats, w, _offsets(kernel, 1))
    np.testing.assert_allclose(np.asarray(out)[0, :n], ref, rtol=1e-4, atol=1e-4)
    assert np.abs(np.asarray(out)[0, n:]).max() == 0


def test_downsample_conv_matches_oracle():
    coords = random_coords(150, hi=16, seed=4)
    h = build_hierarchy(coords, CAPS)
    hb = stack_hierarchies([h])
    n0, n1 = int(h.levels[0].num), int(h.levels[1].num)
    cin, cout = 4, 6
    rng = np.random.RandomState(5)
    feats = rng.randn(n0, cin).astype(np.float32)
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.1

    feats_pad = np.zeros((1, CAPS[0], cin), np.float32)
    feats_pad[0, :n0] = feats
    out = sparse_conv(
        jnp.asarray(feats_pad), jnp.asarray(w), jnp.asarray(hb.down[0]),
        out_valid=jnp.asarray(hb.levels[1].valid),
    )
    out_coords = h.levels[1].coords[:n1]
    ref = naive_sparse_conv(coords, feats, w, _offsets(2, 1), out_coords=out_coords)
    np.testing.assert_allclose(np.asarray(out)[0, :n1], ref, rtol=1e-4, atol=1e-4)


def test_transpose_conv_matches_oracle():
    coords = random_coords(150, hi=16, seed=6)
    h = build_hierarchy(coords, CAPS)
    hb = stack_hierarchies([h])
    n0, n1 = int(h.levels[0].num), int(h.levels[1].num)
    cin, cout = 4, 3
    rng = np.random.RandomState(7)
    feats1 = rng.randn(n1, cin).astype(np.float32)
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.1

    feats_pad = np.zeros((1, CAPS[1], cin), np.float32)
    feats_pad[0, :n1] = feats1
    out = sparse_conv_transpose(
        jnp.asarray(feats_pad), jnp.asarray(w),
        jnp.asarray(hb.up_parent[0]), jnp.asarray(hb.up_octant[0]),
    )
    # oracle: out[j] = feats1[parent(j)] @ W[octant(j)]
    coords1 = h.levels[1].coords[:n1]
    table = {tuple(c): i for i, c in enumerate(coords1)}
    ref = np.zeros((n0, cout), np.float64)
    for j, c in enumerate(coords[: n0]):
        pc = tuple((c // 2) * 2)
        k = int(c[0] % 2) * 4 + int(c[1] % 2) * 2 + int(c[2] % 2)
        ref[j] = feats1[table[pc]].astype(np.float64) @ w[k].astype(np.float64)
    np.testing.assert_allclose(np.asarray(out)[0, :n0], ref, rtol=1e-4, atol=1e-4)


def test_global_max_pool_masks_padding():
    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    valid = jnp.asarray([[True, True, False, False]])
    out = global_max_pool(feats, valid)
    np.testing.assert_allclose(np.asarray(out)[0], [3.0, 4.0, 5.0])
