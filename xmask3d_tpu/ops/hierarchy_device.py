"""On-device sparse hierarchy construction (sort + searchsorted, fully jit).

The host builders (ops/sparse_conv.build_hierarchy, native/kernel_maps.cpp)
produce ~15 MB of kernel maps per view that must cross host->device every
step. This module builds the identical structure *inside* the jit program
from just the (V, 3) voxel coordinates: radix-sorted packed keys + vectorized
binary search. TPU-native replacement for MinkowskiEngine's coordinate
manager on the device side; level 0 keeps the caller's row order (it must
match voxel features / inds_reconstruct), deeper levels are stored in
sorted-key order (internal, order-free).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.ops.sparse_conv import SparseHierarchy, SparseLevel, _offsets

# jax runs with x64 disabled by default, so device keys are int32:
# 10 bits per axis = 1024 voxels/axis (a 20m scene at 2cm voxels). The host
# builders (numpy/native) use 20-bit int64 keys; the loaders clamp stride-1
# coords below _EXTENT so both agree.
_BITS = 10
_EXTENT = 1 << _BITS
_SENT = jnp.int32((1 << 30) + 1)


def _pack(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    c = coords.astype(jnp.int32)
    key = (c[..., 0] << (2 * _BITS)) | (c[..., 1] << _BITS) | c[..., 2]
    # out-of-range components (negative neighbor queries at the grid
    # boundary) must never alias a real key
    in_range = ((c >= 0) & (c < _EXTENT)).all(-1)
    return jnp.where(valid & in_range, key, _SENT)


def _unpack(keys: jnp.ndarray) -> jnp.ndarray:
    mask = _EXTENT - 1
    x = (keys >> (2 * _BITS)) & mask
    y = (keys >> _BITS) & mask
    z = keys & mask
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


class _SortedIndex:
    """Sorted key table with original-row indirection."""

    def __init__(self, keys: jnp.ndarray):
        self.order = jnp.argsort(keys)
        self.sorted_keys = keys[self.order]

    def lookup(self, queries: jnp.ndarray) -> jnp.ndarray:
        pos = jnp.searchsorted(self.sorted_keys, queries)
        pos = jnp.clip(pos, 0, self.sorted_keys.shape[0] - 1)
        hit = (self.sorted_keys[pos] == queries) & (queries != _SENT)
        return jnp.where(hit, self.order[pos].astype(jnp.int32), -1)


def _build_kmap(index: _SortedIndex, out_coords, out_valid, offsets_np) -> jnp.ndarray:
    """(K, cap) gather map via a scan over offsets (constant HLO size)."""
    offs = jnp.asarray(offsets_np, jnp.int32)

    def step(_, off):
        q = _pack(out_coords + off[None, :], out_valid)
        return None, index.lookup(q)

    _, kmap = jax.lax.scan(step, None, offs)
    return kmap


def _downsample(coords, valid, stride2: int, cap_out: int):
    """Unique (c // stride2 * stride2) in sorted-key order, compacted."""
    par = (coords // stride2) * stride2
    keys = _pack(par, valid)
    sk = jnp.sort(keys)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sk[:-1]])
    is_new = (sk != prev) & (sk != _SENT)
    pos = jnp.cumsum(is_new) - 1
    # strictly in-bounds min-scatter (never rely on OOB dropping: some
    # backends turn OOB scatters into raw writes). Non-new / overflow rows
    # write SENT (the max key) at a clamped slot; since sk is ascending and
    # scatter is min-combined, the correct (smallest) key always wins.
    scatter_idx = jnp.clip(jnp.where(is_new, pos, cap_out - 1), 0, cap_out - 1)
    scatter_val = jnp.where(is_new & (pos < cap_out), sk, _SENT)
    out_keys = jnp.full((cap_out,), _SENT, jnp.int32)
    out_keys = out_keys.at[scatter_idx].min(scatter_val)
    n_out = jnp.minimum(is_new.sum(), cap_out).astype(jnp.int32)
    out_valid = jnp.arange(cap_out) < n_out
    out_coords = jnp.where(out_valid[:, None], _unpack(out_keys), 0)
    return out_coords, out_valid, n_out


def _single_hierarchy(coords, num, capacities, stem_kernel):
    num_levels = len(capacities)
    v0 = capacities[0]
    valid0 = jnp.arange(v0) < num

    level_coords = [jnp.where(valid0[:, None], coords, 0)]
    level_valid = [valid0]
    level_num = [num.astype(jnp.int32)]
    for lv in range(1, num_levels):
        c, v, n = _downsample(
            level_coords[-1], level_valid[-1], 2**lv, capacities[lv]
        )
        level_coords.append(c)
        level_valid.append(v)
        level_num.append(n)

    indexes = [
        _SortedIndex(_pack(c, v)) for c, v in zip(level_coords, level_valid)
    ]

    levels, downs, ups_p, ups_o = [], [], [], []
    kmap5 = None
    for lv in range(num_levels):
        c, v = level_coords[lv], level_valid[lv]
        stride = 2**lv
        kmap3 = _build_kmap(indexes[lv], c, v, _offsets(3, stride))
        levels.append(
            SparseLevel(coords=c, valid=v, kmap3=kmap3, num=level_num[lv])
        )
        if lv == 0 and stem_kernel:
            kmap5 = _build_kmap(indexes[0], c, v, _offsets(stem_kernel, 1))
        if lv + 1 < num_levels:
            downs.append(
                _build_kmap(
                    indexes[lv],
                    level_coords[lv + 1],
                    level_valid[lv + 1],
                    _offsets(2, stride),
                )
            )
            s2 = 2 * stride
            par_q = _pack((c // s2) * s2, v)
            ups_p.append(indexes[lv + 1].lookup(par_q))
            oct3 = (c // stride) % 2
            ups_o.append(
                (oct3[:, 0] * 4 + oct3[:, 1] * 2 + oct3[:, 2]).astype(jnp.int32)
            )

    return SparseHierarchy(
        levels=tuple(levels),
        down=tuple(downs),
        up_parent=tuple(ups_p),
        up_octant=tuple(ups_o),
        kmap5=kmap5,
    )


@partial(jax.jit, static_argnames=("capacities", "stem_kernel"))
def build_hierarchy_on_device(
    coords: jnp.ndarray,  # (B, V0, 3) int32, zero-padded
    num: jnp.ndarray,  # (B,) int32 valid voxel counts
    capacities: Sequence[int],
    stem_kernel: int = 5,
) -> SparseHierarchy:
    fn = partial(
        _single_hierarchy, capacities=tuple(capacities), stem_kernel=stem_kernel
    )
    return jax.vmap(fn)(coords, num)
