"""Multi-scale deformable attention sampling, XLA-native.

Replaces the reference's CUDA MSDeformAttn op (third_party Mask2Former
ops/src/cuda/ms_deform_im2col_cuda.cuh + the pure-torch fallback
ms_deform_attn_core_pytorch at ops/functions/ms_deform_attn_func.py:52-72)
with a vectorized bilinear-gather formulation. All level shapes are static
(3 levels at strides 32/16/8 of a fixed input), so the whole op jits to
fused gathers + one weighted reduction — no custom kernel needed for these
sizes (sum(HW) = 256+1024+4096 at 512^2 inputs, 8 heads, 4 points).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample_nhwc(
    img: jnp.ndarray,  # (B, H, W, C)
    x: jnp.ndarray,  # (B, N) pixel x coords (continuous)
    y: jnp.ndarray,  # (B, N) pixel y coords
) -> jnp.ndarray:
    """Bilinear sampling with zero padding outside (grid_sample
    align_corners=False, padding_mode=zeros semantics)."""
    b, h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]

    def tap(ix, iy):
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix_c = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, h * w, c)
        v = jnp.take_along_axis(flat, (iy_c * w + ix_c)[..., None], axis=1)
        return jnp.where(inb[..., None], v, 0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def ms_deform_attn(
    value: jnp.ndarray,  # (B, sum_HW, heads, head_dim)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H, W)] per level
    sampling_locations: jnp.ndarray,  # (B, Lq, heads, levels, points, 2) in [0,1]
    attention_weights: jnp.ndarray,  # (B, Lq, heads, levels, points), softmaxed
) -> jnp.ndarray:
    """Returns (B, Lq, heads*head_dim). Matches the reference fallback
    (bilinear grid_sample per level, weighted sum over levels x points).

    TPU formulation: the four bilinear taps of every sample come from ONE
    gather of a zero-padded, 2x2-shifted-stacked value map (4*d = 128
    channels = full lane width), instead of four d=32 gathers — 4x fewer
    gather rows and full-width rows (the gathers dominate this op's cost).
    """
    b, _, heads, d = value.shape
    lq = sampling_locations.shape[1]
    npts = sampling_locations.shape[4]
    offsets = [0]
    for hh, ww in spatial_shapes:
        offsets.append(offsets[-1] + hh * ww)

    out = jnp.zeros((b, lq, heads, d), value.dtype)
    for li, (hh, ww) in enumerate(spatial_shapes):
        v = value[:, offsets[li] : offsets[li + 1]]  # (B, H*W, heads, d)
        v = v.transpose(0, 2, 1, 3).reshape(b * heads, hh, ww, d)
        # zero-pad one pixel on every side; the 2x2 shifted stack then holds
        # all four taps of sample (x0, y0) at padded index (x0+1, y0+1)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        v4 = jnp.concatenate(
            [
                vp[:, : hh + 1, : ww + 1],      # (y0, x0)
                vp[:, : hh + 1, 1 : ww + 2],    # (y0, x0+1)
                vp[:, 1 : hh + 2, : ww + 1],    # (y0+1, x0)
                vp[:, 1 : hh + 2, 1 : ww + 2],  # (y0+1, x0+1)
            ],
            axis=-1,
        ).reshape(b * heads, (hh + 1) * (ww + 1), 4 * d)

        loc = sampling_locations[:, :, :, li]  # (B, Lq, heads, points, 2)
        px = loc[..., 0] * ww - 0.5  # grid_sample align_corners=False
        py = loc[..., 1] * hh - 0.5
        px = px.transpose(0, 2, 1, 3).reshape(b * heads, lq * npts)
        py = py.transpose(0, 2, 1, 3).reshape(b * heads, lq * npts)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        dx = (px - x0)[..., None].astype(value.dtype)
        dy = (py - y0)[..., None].astype(value.dtype)
        # samples fully outside [-1, size) contribute zero (the padded ring
        # covers the partial-overlap cases exactly)
        inb = (x0 >= -1) & (x0 < ww) & (y0 >= -1) & (y0 < hh)
        xi = jnp.clip(x0 + 1, 0, ww).astype(jnp.int32)
        yi = jnp.clip(y0 + 1, 0, hh).astype(jnp.int32)
        g = jnp.take_along_axis(
            v4, (yi * (ww + 1) + xi)[..., None], axis=1
        )  # (B*heads, Lq*P, 4d)
        t00, t01, t10, t11 = jnp.split(g, 4, axis=-1)
        sampled = (t00 * (1 - dx) + t01 * dx) * (1 - dy) + (
            t10 * (1 - dx) + t11 * dx
        ) * dy
        sampled = jnp.where(inb[..., None], sampled, 0)
        sampled = sampled.reshape(b, heads, lq, npts, d)
        wgt = attention_weights[:, :, :, li].transpose(0, 2, 1, 3)
        out = out + jnp.einsum(
            "bhqpd,bhqp->bqhd", sampled, wgt.astype(sampled.dtype)
        )
    return out.reshape(b, lq, heads * d)
