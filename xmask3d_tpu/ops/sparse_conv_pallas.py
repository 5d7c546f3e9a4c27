"""Pallas TPU kernel for the sparse 3D convolution.

The XLA formulation in ops/sparse_conv.py (`out = sum_k take(feats, kmap[k])
@ W[k]`) is gather-rate-bound on TPU (~70M rows/s; a kernel-3 conv at 24k
voxels issues 663k gather rows, the kernel-5 stem 3M). The TPU has no
hardware gather — the TPU-native fix is the same masked-matmul trick as
ops/deform_attn.py: a row gather from a VMEM-resident table is
`onehot(idx) @ table`, i.e. MXU work, and the one-hot tile is built with one
vector compare and never touches HBM.

Layout (everything transposed so voxels ride the 128-wide LANES):

  ft   (B, C_in, Vp)    the per-sample feature table, VMEM-resident for the
                        whole grid sweep (levels fit: 24k x 32 .. 3k x 256
                        in bf16 < 2 MB)
  wt   (K, C_out, C_in) one small weight block DMA'd per tap step
  idx  (B, Kp, Qp)      f32 gather indices (exact below 2^24; -1 = miss)
  out  (B, C_out, Qp)   f32, written once per (b, q-tile) at the last tap

Grid is (B, NQ, K) with the tap dimension innermost: a VMEM scratch
accumulator carries the running sum across taps, so each output block is
written exactly once. Because voxel coordinates are spatially coherent (the
host builder emits them in scan order; neighbours at a fixed geometric
offset land in a narrow index band), each (tap, q-tile) cell only visits the
[lo, hi] band of 128-voxel table tiles — bounds are computed XLA-side and
scalar-prefetched, and provably-empty cells skip their matmuls entirely.

Matches ME.MinkowskiConvolution semantics exactly (same contract as
`sparse_conv`, reference mink_unet.py:47-115); the backward pass reuses the
XLA formulation's VJP via jax.custom_vjp (training stays correct; this
kernel is the forward hot path).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xmask3d_tpu.ops.sparse_conv import round_up as _round_up, sparse_conv


def _spconv_kernel(
    lo_ref,  # (B, Kp, NQ) int32 SMEM — inclusive band bounds per (b, k, j)
    hi_ref,
    idx_ref,  # (1, Kp, QT) f32 — gather indices for this q-tile, all taps
    wt_ref,  # (1, C_out, C_in) — this tap's weight
    ft_ref,  # (1, C_in, Vp) — VMEM-resident feature table
    out_ref,  # (1, C_out, QT) f32
    acc_ref,  # (C_out, QT) f32 scratch, persists across the tap sweep
    *,
    n_taps: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kp, qt = idx_ref.shape[1], idx_ref.shape[2]
    cin = ft_ref.shape[1]
    # row k of the resident idx block, without dynamic sublane slicing:
    # mask + max (indices are >= -1, so -1 is an identity for max)
    rows_k = jax.lax.broadcasted_iota(jnp.int32, (kp, qt), 0)
    idxk = jnp.max(
        jnp.where(rows_k == k, idx_ref[0], -1.0), axis=0, keepdims=True
    ).astype(jnp.int32)  # (1, QT)

    t0 = lo_ref[b, k, j]
    t1 = hi_ref[b, k, j]

    @pl.when(t1 >= t0)
    def _():
        def body(t, accg):
            c0 = pl.multiple_of(t * 128, 128)
            rows = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) + c0
            onehot = (rows == idxk).astype(ft_ref.dtype)  # (128, QT)
            vt = ft_ref[0, :, pl.ds(c0, 128)]  # (C_in, 128)
            return accg + jnp.dot(vt, onehot, preferred_element_type=jnp.float32)

        accg = jax.lax.fori_loop(
            t0, t1 + 1, body, jnp.zeros((cin, qt), jnp.float32)
        )
        acc_ref[:] += jnp.dot(
            wt_ref[0],
            accg.astype(wt_ref.dtype),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_taps - 1)
    def _():
        out_ref[0] = acc_ref[:]


def sparse_conv_pallas(
    feats: jnp.ndarray,  # (B, V_in, C_in)
    weights: jnp.ndarray,  # (K, C_in, C_out)
    kmap: jnp.ndarray,  # (B, K, V_out) int32, -1 = no neighbor
    bias: Optional[jnp.ndarray] = None,
    out_valid: Optional[jnp.ndarray] = None,  # (B, V_out) bool
    *,
    q_tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas forward of `sparse_conv` (same contract/semantics)."""
    b, v_in, cin = feats.shape
    k, _, cout = weights.shape
    v_out = kmap.shape[2]

    vp = _round_up(v_in, 128)
    qt = min(q_tile, _round_up(v_out, 128))
    qp = _round_up(v_out, qt)
    nq = qp // qt
    nt = vp // 128
    kp = _round_up(k, 8)

    ft = jnp.pad(feats, ((0, 0), (0, vp - v_in), (0, 0))).swapaxes(1, 2)
    wt = weights.swapaxes(1, 2).astype(feats.dtype)  # (K, C_out, C_in)
    idx = jnp.pad(
        kmap, ((0, 0), (0, kp - k), (0, qp - v_out)), constant_values=-1
    )
    tl = idx.reshape(b, kp, nq, qt) // 128
    vl = idx.reshape(b, kp, nq, qt) >= 0
    lo = jnp.where(vl, tl, nt).min(axis=-1).astype(jnp.int32)  # (B, Kp, NQ)
    hi = jnp.where(vl, tl, -1).max(axis=-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nq, k),
        in_specs=[
            pl.BlockSpec(
                (1, kp, qt),
                lambda bb, j, kk, lo, hi: (bb, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cout, cin),
                lambda bb, j, kk, lo, hi: (kk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cin, vp),
                lambda bb, j, kk, lo, hi: (bb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, qt),
            lambda bb, j, kk, lo, hi: (bb, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((cout, qt), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_spconv_kernel, n_taps=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cout, qp), jnp.float32),
        interpret=interpret,
    )(lo, hi, idx.astype(jnp.float32), wt, ft)

    out = out[:, :, :v_out].swapaxes(1, 2).astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if out_valid is not None:
        out = jnp.where(out_valid[..., None], out, 0)
    return out


# ---------------------------------------------------------------------------
# v2: union-band kernel — one band sweep per query tile, shared by all taps
# ---------------------------------------------------------------------------
#
# The v1 kernel issues ~(K x band + K) MXU dots per query tile (7.3k/conv at
# 24k voxels) and lands ~2.5 ms/conv — dominated by small-matmul issue
# latency, not FLOPs. Per-tap bands at a fixed geometric offset are all
# ~4-6 tiles wide and mutually overlapping (scan order shifts ranks by at
# most one x-slab), so sweeping the UNION band once and comparing each
# 128-row tile against ALL taps' indices at once turns the gather work into
# `union_band` big dots of shape (Cin, 128) @ (128, Kp*QT) — ~8 + K dots
# per tile instead of ~K x (band + 1).


def _tap_groups(k: int) -> int:
    """Number of contiguous tap groups sharing a narrow index band.

    The host builder enumerates kernel offsets last-axis-fastest
    (ops/sparse_conv.py::_offsets), and voxels are stored in packed-key scan
    order with axis 0 most significant (::_pack) — so taps with the same
    axis-0 offset see neighbour ranks shifted by nearly the same slab-sized
    delta. Sweeping each axis-0 group's band separately (instead of the
    union of all taps) cuts the visited table rows ~2-3.6x at 24k-voxel
    levels (measured on synthetic scene kmaps). Grouping is a performance
    hint only: per-group bounds are computed from the actual indices, so
    correctness never depends on the enumeration order.
    """
    return {27: 3, 125: 5, 8: 2}.get(k, 1)


def _spconv2_kernel(
    lo_ref, hi_ref, idx_ref, wt_ref, ft_ref, out_ref, *, n_taps, n_groups
):
    """One (b, q-tile) cell.

    idx_ref: (1, 1, 8, KQT) f32 — row (j % 8) holds this q-tile's tap-major
             concatenated indices (k*QT+q ordering); the 8 sublanes carry 8
             CONSECUTIVE q-tiles' indices, so the block is pure payload (a
             zero-padded single-row layout cost 8x the idx HBM/DMA traffic —
             ~21 MB per 24k-voxel conv)
    lo_ref/hi_ref: (B, G, NQ) int32 SMEM — per tap-GROUP band bounds
    wt_ref:  (K, C_out, C_in) — all tap weights, VMEM-resident
    ft_ref:  (1, C_in, Vp) — feature table, VMEM-resident
    out_ref: (1, C_out, QT) in the feature dtype
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    kqt = idx_ref.shape[3]
    qt = kqt // n_taps
    cin = ft_ref.shape[1]
    gs = n_taps // n_groups  # taps per group (exact for 27/125/8; else 1 grp)
    gqt = gs * qt
    # row (j % 8) of the resident idx block, without dynamic sublane
    # slicing: mask + max (indices are >= -1, so -1 is a max identity)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, kqt), 0)
    idxv = jnp.max(
        jnp.where(rows8 == j % 8, idx_ref[0, 0], -1.0), axis=0, keepdims=True
    ).astype(jnp.int32)  # (1, KQT)

    empty = lo_ref[b, 0, j] > hi_ref[b, 0, j]
    for g in range(1, n_groups):
        empty = jnp.logical_and(empty, lo_ref[b, g, j] > hi_ref[b, g, j])

    # A fully-padded q-tile (all indices -1: capacity padding past the
    # level's live voxel count) has every group band empty. Skip not just
    # the band sweeps but the K weight matmuls too — at deep levels (256ch,
    # caps 2-4x the live count) those dots are the whole cost of a dead tile.
    @pl.when(empty)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(jnp.logical_not(empty))
    def _():
        pieces = []
        for g in range(n_groups):  # static unroll
            idxg = idxv[:, g * gqt : (g + 1) * gqt]  # (1, GQT)

            def body(t, acc, idxg=idxg):
                c0 = pl.multiple_of(t * 128, 128)
                rows = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) + c0
                onehot = (rows == idxg).astype(ft_ref.dtype)  # (128, GQT)
                vt = ft_ref[0, :, pl.ds(c0, 128)]  # (C_in, 128)
                return acc + jnp.dot(
                    vt, onehot, preferred_element_type=jnp.float32
                )

            pieces.append(
                jax.lax.fori_loop(
                    lo_ref[b, g, j], hi_ref[b, g, j] + 1, body,
                    jnp.zeros((cin, gqt), jnp.float32),
                )
            )
        gath = jnp.concatenate(pieces, axis=1).astype(wt_ref.dtype)

        acc = jnp.zeros((out_ref.shape[1], qt), jnp.float32)
        for k in range(n_taps):  # static unroll; tap count is static
            acc += jnp.dot(
                wt_ref[k], gath[:, k * qt : (k + 1) * qt],
                preferred_element_type=jnp.float32,
            )
        out_ref[0] = acc.astype(out_ref.dtype)


def sparse_conv_pallas_v2(
    feats: jnp.ndarray,
    weights: jnp.ndarray,
    kmap: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_valid: Optional[jnp.ndarray] = None,
    *,
    q_tile: int = 0,  # 0 = auto from the VMEM gather-buffer budget
    interpret: bool = False,
) -> jnp.ndarray:
    """Union-band Pallas forward of `sparse_conv` (same contract)."""
    b, v_in, cin = feats.shape
    k, _, cout = weights.shape
    v_out = kmap.shape[2]

    if q_tile == 0:
        q_tile = int(os.environ.get("XMASK3D_SPCONV_QTILE", "0"))
    if q_tile == 0:
        # 128 everywhere: sweep MACs scale as V*K*Cin*128*(QT/128 + spread
        # + 1), so the narrowest tile minimizes band work; measured on-chip
        # (v5e, 20k pts) it beats the old ~2 MB-buffer auto policy at EVERY
        # level — 34C 4.33->3.51 ms, k5 stem 0.53->0.30 (2026-08-19 sweep).
        q_tile = 128

    vp = _round_up(v_in, 128)
    qt = min(q_tile, _round_up(v_out, 128))
    qp = _round_up(v_out, qt)
    nq = qp // qt
    nt = vp // 128

    ft = jnp.pad(feats, ((0, 0), (0, vp - v_in), (0, 0))).swapaxes(1, 2)
    wt = weights.swapaxes(1, 2).astype(feats.dtype)  # (K, C_out, C_in)
    idx = jnp.pad(kmap, ((0, 0), (0, 0), (0, qp - v_out)), constant_values=-1)
    # tap-major concat per tile: (B, K, NQ, QT) -> (B, NQ, K*QT)
    idx_t = idx.reshape(b, k, nq, qt).transpose(0, 2, 1, 3).reshape(b, nq, k * qt)
    # band bounds per contiguous tap GROUP of a tile (see _tap_groups)
    ng = _tap_groups(k)
    idx_g = idx_t.reshape(b, nq, ng, (k // ng) * qt)
    tiles = jnp.where(idx_g >= 0, idx_g // 128, -1)
    lo = (
        jnp.where(idx_g >= 0, idx_g // 128, nt).min(axis=-1)
        .swapaxes(1, 2).astype(jnp.int32)  # (B, G, NQ)
    )
    hi = tiles.max(axis=-1).swapaxes(1, 2).astype(jnp.int32)
    # pack 8 CONSECUTIVE q-tiles' indices into the (8, KQT) f32 idx block —
    # all payload, no sublane padding (the kernel selects row j % 8); the
    # block only changes every 8th grid step, so Pallas re-DMAs it 8x less
    nq8 = _round_up(nq, 8)
    idx8 = jnp.pad(
        idx_t.astype(jnp.float32), ((0, 0), (0, nq8 - nq), (0, 0)),
        constant_values=-1.0,
    ).reshape(b, nq8 // 8, 8, k * qt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8, k * qt), lambda bb, j, lo, hi: (bb, j // 8, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, cout, cin), lambda bb, j, lo, hi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cin, vp), lambda bb, j, lo, hi: (bb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, qt), lambda bb, j, lo, hi: (bb, 0, j),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_spconv2_kernel, n_taps=k, n_groups=ng),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cout, qp), feats.dtype),
        interpret=interpret,
    )(lo, hi, idx8, wt, ft)

    out = out[:, :, :v_out].swapaxes(1, 2).astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if out_valid is not None:
        out = jnp.where(out_valid[..., None], out, 0)
    return out


@jax.custom_vjp
def _spconv_hybrid(feats, weights, kmapf):
    return sparse_conv_pallas(feats, weights, kmapf.astype(jnp.int32))


def _spconv_fwd(feats, weights, kmapf):
    return _spconv_hybrid(feats, weights, kmapf), (feats, weights, kmapf)


@jax.custom_vjp
def _spconv2_hybrid(feats, weights, kmapf):
    return sparse_conv_pallas_v2(feats, weights, kmapf.astype(jnp.int32))


def _spconv2_fwd(feats, weights, kmapf):
    return _spconv2_hybrid(feats, weights, kmapf), (feats, weights, kmapf)


def _spconv_bwd(res, g):
    feats, weights, kmapf = res
    _, vjp = jax.vjp(
        lambda f, w: sparse_conv(f, w, kmapf.astype(jnp.int32)), feats, weights
    )
    df, dw = vjp(g.astype(feats.dtype))
    return df, dw, jnp.zeros_like(kmapf)


_spconv_hybrid.defvjp(_spconv_fwd, _spconv_bwd)
_spconv2_hybrid.defvjp(_spconv2_fwd, _spconv_bwd)


def sparse_conv_auto(
    feats: jnp.ndarray,
    weights: jnp.ndarray,
    kmap: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pallas kernel on TPU (XLA-VJP backward), XLA formulation elsewhere.

    XMASK3D_SPCONV_IMPL selects the formulation for A/B benching:
    "pallas2" (default, union-band kernel), "pallas" (per-tap band kernel),
    "xla" (gather+matmul).
    """
    impl = os.environ.get("XMASK3D_SPCONV_IMPL", "pallas2")
    # VMEM feasibility: the band kernels stage the FULL padded feature table
    # (C_in, Vp) per grid cell. At view-level caps that is <2 MB, but
    # scene-level caps (engine/scene_reuse.py, factor 4 -> ~98k voxels at
    # 128ch = 25 MB bf16) blow the ~16 MB VMEM budget — the compile fails
    # with a scoped-vmem OOM. Use the XLA gather path for over-budget levels.
    vp = -(-feats.shape[1] // 128) * 128
    table_bytes = vp * feats.shape[2] * feats.dtype.itemsize
    if impl != "xla" and jax.default_backend() == "tpu" \
            and table_bytes <= 10 * 1024 * 1024:
        # gather indices ride through float32 inside the kernel (exact only
        # below 2^24); fail loudly if capacities ever outgrow that.
        assert feats.shape[1] < (1 << 24), (
            f"sparse_conv_pallas: v_in={feats.shape[1]} >= 2^24 — float32 "
            "index round-trip would corrupt gather indices; use the XLA path"
        )
        hybrid = _spconv2_hybrid if impl == "pallas2" else _spconv_hybrid
        out = hybrid(feats, weights, kmap.astype(jnp.float32))
        if bias is not None:
            out = out + bias.astype(out.dtype)
        if out_valid is not None:
            out = jnp.where(out_valid[..., None], out, 0)
        return out
    return sparse_conv(feats, weights, kmap, bias=bias, out_valid=out_valid)
