"""MSDeformAttn pixel decoder (deformable-DETR encoder + FPN lateral).

Capability parity with the reference's vendored
mask2former/modeling/pixel_decoder/msdeformattn.py:232-358: 6 deformable
self-attention layers over the s3/s4/s5 feature pyramid (256 ch, 8 heads,
4 points, FFN 1024), one FPN lateral step down to stride-4 `mask_features`.
The CUDA MSDeformAttn kernel is replaced by the XLA bilinear-gather op in
xmask3d_tpu/ops/deform_attn.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xmask3d_tpu.models.layers import group_norm

from xmask3d_tpu.ops.deform_attn import ms_deform_attn_auto as ms_deform_attn


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int = 128, temperature: float = 10000.0
) -> np.ndarray:
    """DETR sine positional embedding, normalized (static -> host numpy).

    Returns (h, w, 2*num_pos_feats); matches the vendored
    position_encoding.py:12-60 layout (y features then x features).
    """
    eps, scale = 1e-6, 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = temperature ** (
        2 * (np.arange(num_pos_feats, dtype=np.float32) // 2) / num_pos_feats
    )
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=-1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=-1)
    return np.concatenate(
        [pos_y.reshape(h, w, -1), pos_x.reshape(h, w, -1)], axis=-1
    )


def _offsets_init(heads: int, levels: int, points: int):
    """Directional grid init for sampling offsets (the deformable-DETR
    scheme used by the vendored op, ops/modules/ms_deform_attn.py:54-76)."""
    thetas = np.arange(heads, dtype=np.float64) * (2.0 * np.pi / heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, levels, points, 1))
    for i in range(points):
        grid[:, :, i, :] *= i + 1
    return grid.astype(np.float32)  # (heads, levels, points, 2)


class MSDeformAttnLayer(nn.Module):
    d_model: int = 256
    heads: int = 8
    points: int = 4
    levels: int = 3
    ffn_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        b, n, c = src.shape
        h, l, p = self.heads, self.levels, self.points
        q = src + pos

        def offset_bias_init(key, shape, dtype=jnp.float32):
            return _offsets_init(h, l, p).reshape(-1)

        sampling_offsets = nn.Dense(
            h * l * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=offset_bias_init,
            dtype=self.dtype,
            name="sampling_offsets",
        )(q).reshape(b, n, h, l, p, 2)
        attn_w = nn.Dense(
            h * l * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(q).reshape(b, n, h, l * p)
        attn_w = jax.nn.softmax(attn_w, axis=-1).reshape(b, n, h, l, p)
        value = nn.Dense(c, dtype=self.dtype, name="value_proj")(src)
        value = value.reshape(b, n, h, c // h)

        wh = jnp.asarray([[ww, hh] for hh, ww in spatial_shapes], jnp.float32)
        loc = (
            reference_points[:, :, None, :, None, :]
            + sampling_offsets / wh[None, None, None, :, None, :]
        )
        out = ms_deform_attn(value, spatial_shapes, loc, attn_w)
        out = nn.Dense(c, dtype=self.dtype, name="output_proj")(out)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src + out)
        # FFN
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype, name="linear2")(y)
        src = nn.LayerNorm(dtype=self.dtype, name="norm2")(src + y)
        return src


class MSDeformAttnPixelDecoder(nn.Module):
    """Encoder over (s3, s4, s5) + FPN step to stride-4 mask features.

    __call__(features: {"s2".."s5": (B,H,W,C)}) ->
        (mask_features (B, H/4, W/4, mask_dim),
         multi_scale_features [stride32, stride16, stride8])
    """

    conv_dim: int = 256
    mask_dim: int = 256
    heads: int = 8
    points: int = 4
    enc_layers: int = 6
    ffn_dim: int = 1024
    transformer_in_features: Sequence[str] = ("s3", "s4", "s5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        # top-down order (lowest resolution first), like the reference
        # msdeformattn.py:316-323
        names = list(self.transformer_in_features)[::-1]  # s5, s4, s3
        srcs, poss, shapes = [], [], []
        for i, name in enumerate(names):
            x = features[name]
            x = nn.Conv(self.conv_dim, (1, 1), dtype=self.dtype, name=f"input_proj_{i}")(x)
            x = group_norm(x.shape[-1], self.dtype, f"input_norm_{i}")(x)
            b, hh, ww, c = x.shape
            pos = jnp.asarray(
                position_embedding_sine(hh, ww, self.conv_dim // 2), self.dtype
            )
            level_embed = self.param(
                f"level_embed_{i}", nn.initializers.normal(1.0), (self.conv_dim,)
            )
            shapes.append((hh, ww))
            srcs.append(x.reshape(b, hh * ww, c))
            poss.append((pos.reshape(1, hh * ww, c) + level_embed).astype(self.dtype))

        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate([jnp.broadcast_to(p, s.shape) for p, s in zip(poss, srcs)], axis=1)

        # reference points: normalized pixel centers per level, tiled over levels
        ref_list = []
        for hh, ww in shapes:
            ys = (np.arange(hh, dtype=np.float32) + 0.5) / hh
            xs = (np.arange(ww, dtype=np.float32) + 0.5) / ww
            gy, gx = np.meshgrid(ys, xs, indexing="ij")
            ref_list.append(np.stack([gx, gy], -1).reshape(hh * ww, 2))
        ref = jnp.asarray(np.concatenate(ref_list, 0), jnp.float32)
        ref = jnp.broadcast_to(
            ref[None, :, None, :], (src.shape[0], ref.shape[0], len(shapes), 2)
        )

        for li in range(self.enc_layers):
            src = MSDeformAttnLayer(
                d_model=self.conv_dim,
                heads=self.heads,
                points=self.points,
                levels=len(shapes),
                ffn_dim=self.ffn_dim,
                dtype=self.dtype,
                name=f"encoder_layer_{li}",
            )(src, pos, ref, shapes)

        # split back to maps, top-down order: [stride32, stride16, stride8]
        outs, off = [], 0
        b = src.shape[0]
        for hh, ww in shapes:
            outs.append(src[:, off : off + hh * ww].reshape(b, hh, ww, self.conv_dim))
            off += hh * ww

        # FPN lateral from s2 (stride 4), nearest reference behavior:
        # bilinear upsample + 1x1 lateral + 3x3 output conv (msdeformattn.py:343-351)
        x2 = features["s2"]
        lateral = nn.Conv(
            self.conv_dim, (1, 1), use_bias=False, dtype=self.dtype, name="adapter_1"
        )(x2)
        lateral = group_norm(lateral.shape[-1], self.dtype, "adapter_norm_1")(lateral)
        up = jax.image.resize(
            outs[-1],
            (b, x2.shape[1], x2.shape[2], self.conv_dim),
            method="bilinear",
        )
        y = lateral + up
        y = nn.Conv(
            self.conv_dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="layer_1",
        )(y)
        y = group_norm(y.shape[-1], self.dtype, "layer_norm_1")(y)
        y = nn.relu(y)

        mask_features = nn.Conv(
            self.mask_dim, (1, 1), dtype=self.dtype, name="mask_features"
        )(y)
        return mask_features, outs
