"""Native C++ kernel-map builder vs the numpy implementation."""

import os

import numpy as np
import pytest

from xmask3d_tpu.data import native


def _coords(n=500, hi=20, seed=0):
    rng = np.random.RandomState(seed)
    return np.unique(rng.randint(0, hi, (n, 3)).astype(np.int32), axis=0)


needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native lib unavailable (no compiler)"
)


@needs_native
def test_hierarchy_native_equals_numpy():
    from xmask3d_tpu.ops import sparse_conv as sc

    coords = _coords()
    caps = (1024, 512, 256, 128, 64)
    h_native = sc.build_hierarchy(coords, caps)

    os.environ["XMASK3D_NATIVE"] = "0"
    native._TRIED, native._LIB = True, None  # force numpy path
    try:
        h_numpy = sc.build_hierarchy(coords, caps)
    finally:
        os.environ.pop("XMASK3D_NATIVE")
        native._TRIED = False

    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(h_native), jax.tree_util.tree_leaves(h_numpy)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_native
def test_sparse_quantize_native_inverse():
    coords = np.repeat(_coords(100, hi=6, seed=1), 3, axis=0)
    inds, inverse = native.sparse_quantize_native(coords)
    # every point maps to a voxel with identical coords
    np.testing.assert_array_equal(coords[inds][inverse], coords)


@needs_native
def test_native_speedup_smoke():
    import time

    coords = _coords(40000, hi=80, seed=2)
    from xmask3d_tpu.ops.sparse_conv import _offsets

    t0 = time.time()
    native.build_kmap(coords, coords, _offsets(3, 1), len(coords))
    dt = time.time() - t0
    assert dt < 2.0, f"native kmap build too slow: {dt:.2f}s"
