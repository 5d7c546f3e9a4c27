"""Fused GroupNorm -> SiLU -> 3x3 Conv for the SD VAE/UNet resblocks.

The reference runs this pattern as three torch ops
(ldm first_stage_model ResnetBlock: norm1/silu/conv1, norm2/silu/conv2);
under XLA the normalize+silu elementwise stage cannot fuse INTO the
convolution input, so every GN->conv pair materializes the normalized
activation to HBM and reads it back — at the VAE's level-0 512x512x128
that is ~128 MB of avoidable traffic per pair (~0.16 ms/pair on v5e).

This kernel computes the conv directly from the RAW activation: group
statistics are a cheap XLA reduce outside (one read of x); the Pallas
kernel then streams H-tiles of x, applies the per-channel affine + SiLU in
VMEM, assembles a zero-padded halo tile from two 1-row neighbor blocks,
and performs the 3x3 conv as 9 shifted (tile*W, C) @ (C, Cout) MXU
matmuls with fp32 accumulation — one read of x, one write of out.

Differentiable via jax.custom_vjp: the backward pass is the VJP of the
unfused reference computation (rematerialized) — the same cost profile
block-level remat would give.

Shape gates (fall back to the unfused path otherwise): C and C_out
multiples of 128 (lane alignment for the sublane/lane reshape), W a
multiple of the sublane granularity (16), H divisible by the row tile,
VMEM estimate under budget.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU-only at runtime; import lazily-safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def gn_silu_conv_reference(x, scale, bias, w, b, groups: int = 32,
                           eps: float = 1e-6):
    """Unfused oracle: GroupNorm(groups) -> SiLU -> 3x3 SAME conv.

    x: (B, H, W, C); scale/bias: (C,); w: (3, 3, C, Cout); b: (Cout,).
    Matches flax GroupNorm (fp32 stats) + nn.Conv semantics.
    """
    bsz, h, wd, c = x.shape
    xf = x.astype(jnp.float32).reshape(bsz, h, wd, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    n = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(bsz, h, wd, c)
    n = n * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    n = (n * jax.nn.sigmoid(n)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        n, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _affine_from_stats(x, scale, bias, groups, eps):
    """Per-(batch, channel) a, s with y = x*a + s == groupnorm affine."""
    bsz, h, wd, c = x.shape
    xf = x.astype(jnp.float32).reshape(bsz, h, wd, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4))  # (B, G)
    var = ((xf - mean[:, None, None, :, None]) ** 2).mean(axis=(1, 2, 4))
    rstd = jax.lax.rsqrt(var + eps)  # (B, G)
    per_ch = lambda g: jnp.repeat(g, c // groups, axis=1)  # noqa: E731
    a = per_ch(rstd) * scale.astype(jnp.float32)[None]  # (B, C)
    s = bias.astype(jnp.float32)[None] - per_ch(mean * rstd) * scale.astype(
        jnp.float32
    )[None]
    return a, s


def _kernel(a_ref, s_ref, x_ref, top_ref, bot_ref, w_ref, b_ref, o_ref,
            xp_ref, *, th, wd, cin, cout, dtype):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    a = a_ref[0]  # (C,) fp32
    s = s_ref[0]

    def norm(v):  # (r, W, C) raw -> normalized+silu in compute dtype
        z = v.astype(jnp.float32) * a + s
        return (z * jax.nn.sigmoid(z)).astype(dtype)

    # row-halo'd normalized tile (th+2, W, C); column halo is handled by
    # pltpu.roll + edge masking, so W stays the (aligned) sublane axis and
    # the dy slices ride the untiled leading axis
    xp_ref[1 : th + 1] = norm(x_ref[0])
    zrow = jnp.zeros((1, wd, cin), dtype)

    @pl.when(i > 0)
    def _top():
        # top_ref holds 2 rows ending at this tile; its LAST row is the halo
        xp_ref[0:1] = norm(top_ref[0, 1:2])

    @pl.when(i == 0)
    def _top_zero():
        xp_ref[0:1] = zrow

    @pl.when(i < n - 1)
    def _bot():
        xp_ref[th + 1 : th + 2] = norm(bot_ref[0, 0:1])

    @pl.when(i == n - 1)
    def _bot_zero():
        xp_ref[th + 1 : th + 2] = zrow

    zcol = jnp.zeros((th, 1, cin), dtype)

    acc = jnp.zeros((th * wd, cout), jnp.float32)
    for dy in range(3):
        rows = xp_ref[dy : dy + th]  # (th, W, C)
        for dx in (-1, 0, 1):
            if dx == 0:
                patch = rows
            elif dx == 1:
                # out[., j] needs in[., j+1]; SAME zero padding at the
                # right edge. Static slice+concat instead of pltpu.roll:
                # Mosaic's tpu.dynamic_rotate has no bf16 lowering
                # ("Rotate with non-32-bit data", v5e, 2026-08-18).
                patch = jnp.concatenate([rows[:, 1:, :], zcol], axis=1)
            else:
                patch = jnp.concatenate([zcol, rows[:, : wd - 1, :]], axis=1)
            acc = acc + jnp.dot(
                patch.reshape(th * wd, cin), w_ref[dy * 3 + (dx + 1)],
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(th, wd, cout).astype(o_ref.dtype)


def _fused_forward(x, scale, bias, w, b, groups, eps, th, interpret=False):
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]
    dtype = x.dtype
    a, s = _affine_from_stats(x, scale, bias, groups, eps)
    wk = w.astype(dtype).reshape(9, c, cout)
    n_tiles = h // th
    # halo blocks are 2-row so the row offset (in block units) is integral:
    # top rows [th*i - 2, th*i), bottom rows [th*(i+1), th*(i+1)+2)
    assert th % 2 == 0
    kern = functools.partial(
        _kernel, th=th, wd=wd, cin=c, cout=cout, dtype=dtype
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, c), lambda bi, i: (bi, 0)),  # a
            pl.BlockSpec((1, c), lambda bi, i: (bi, 0)),  # s
            pl.BlockSpec((1, th, wd, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(  # 2 rows ending at the tile's first row
                (1, 2, wd, c),
                lambda bi, i: (bi, jnp.maximum(i * (th // 2) - 1, 0), 0, 0),
            ),
            pl.BlockSpec(  # 2 rows starting at the tile's end
                (1, 2, wd, c),
                lambda bi, i: (
                    bi,
                    jnp.minimum((i + 1) * (th // 2), n_tiles * (th // 2) - 1),
                    0,
                    0,
                ),
            ),
            pl.BlockSpec((9, c, cout), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cout), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), dtype),
        scratch_shapes=[pltpu.VMEM((th + 2, wd, c), dtype)],
        # Mosaic's default 16 MB scoped-vmem stack is too small for the
        # 512^2x128 tile once patch/norm temporaries are counted (measured
        # 19.18M inside the bench program, 2026-08-18); the physical VMEM
        # is 128 MB so a 48 MB stack is comfortably safe
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(a, s, x, x, x, wk, b.reshape(1, cout))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _gn_silu_conv_fused(x, scale, bias, w, b, groups, eps, th, interpret=False):
    return _fused_forward(x, scale, bias, w, b, groups, eps, th, interpret)


def _fused_fwd(x, scale, bias, w, b, groups, eps, th, interpret=False):
    return _fused_forward(x, scale, bias, w, b, groups, eps, th, interpret), (
        x, scale, bias, w, b,
    )


def _fused_bwd(groups, eps, th, interpret, res, g):
    x, scale, bias, w, b = res
    _, vjp = jax.vjp(
        lambda *args: gn_silu_conv_reference(*args, groups=groups, eps=eps),
        x, scale, bias, w, b,
    )
    return vjp(g)


_gn_silu_conv_fused.defvjp(_fused_fwd, _fused_bwd)


def default_tile_h(h: int) -> int:
    return 16 if h >= 16 else h


def fused_available(x_shape, cout: int, dtype,
                    tile_h: Optional[int] = None) -> bool:
    """True iff the Pallas path will engage for this (B,H,W,C) shape."""
    if not _HAS_PALLAS or jax.default_backend() != "tpu":
        return False
    # OPT-IN until first validated on a real chip: a mosaic lowering
    # failure inside the bench program would lose the round's headline
    # measurement (the kernel is interpret-mode validated only; flip the
    # default to "1" once scripts/tpu_round4_sequence.sh step 1b passes)
    if os.environ.get("XMASK3D_FUSED_GN", "0") != "1":
        return False
    bsz, h, wd, c = x_shape
    th = tile_h or default_tile_h(h)
    # C/Cout 128-multiples keep the lane dim aligned (reshape across
    # sublane/lane needs it); W only needs sublane granularity
    if c % 128 or cout % 128 or wd % 16 or h % th or th % 2:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (
        th * wd * c * itemsize            # x block
        + (th + 2) * wd * c * itemsize    # halo scratch
        + th * wd * cout * itemsize       # out block
        + th * wd * cout * 4              # fp32 accum
        + 9 * c * cout * itemsize         # weights
        + 2 * 2 * wd * c * itemsize       # top/bottom 2-row halo blocks
        + th * wd * c * 4                 # fp32 norm temp inside norm()
        + 2 * th * wd * c * itemsize      # shifted-patch temporaries
    )
    # must stay under the kernel's scoped-vmem stack (vmem_limit_bytes in
    # _fused_forward), with margin for Mosaic's own copies
    return vmem <= 32 * 1024 * 1024


def gn_silu_conv(x, scale, bias, w, b, groups: int = 32, eps: float = 1e-6,
                 tile_h: Optional[int] = None):
    """GroupNorm -> SiLU -> 3x3 SAME conv, fused on TPU when shapes allow.

    x: (B, H, W, C) activations; scale/bias: (C,) GN affine; w: (3,3,C,Cout)
    HWIO conv kernel; b: (Cout,). Falls back to the unfused computation off
    TPU / at unsupported shapes / with XMASK3D_FUSED_GN=0.
    """
    th = tile_h or default_tile_h(x.shape[1])
    if w.shape[:2] == (3, 3) and fused_available(
        x.shape, w.shape[-1], x.dtype, th
    ):
        return _gn_silu_conv_fused(x, scale, bias, w, b, groups, eps, th)
    return gn_silu_conv_reference(x, scale, bias, w, b, groups=groups, eps=eps)
