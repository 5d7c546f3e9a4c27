"""ODISE-style multi-scale masked transformer decoder + mask-embed heads.

Capability parity with:
- the vendored mask2former transformer decoder
  (mask2former_transformer_decoder.py:363-460): 9 rounds of [masked
  cross-attention over one pyramid level, self-attention, FFN] on 50 learned
  queries with per-layer prediction heads and attention masks derived from
  the previous layer's predicted masks;
- the reference ODISE subclass (models/modeling/meta_arch/odise.py:329-491)
  whose prediction heads also emit ODISE mask embeddings;
- PooledMaskEmbed / MaskPooling / PseudoClassEmbed / CategoryEmbed
  (odise.py:494-700).

Static shapes throughout: queries Q=50, 3 pyramid levels, fixed spatial
sizes. The per-layer Python list bookkeeping of the reference becomes an
unrolled loop (9 layers is static).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xmask3d_tpu.models.pixel_decoder import position_embedding_sine


class MHA(nn.Module):
    """Standard multi-head attention (separate q/kv sources) with an optional
    boolean `blocked` mask (True = no attention), torch-MHA semantics."""

    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, blocked=None):
        c = q_in.shape[-1]
        h = self.heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(q_in)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(k_in)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(v_in)

        def split(z):
            return z.reshape(z.shape[0], z.shape[1], h, c // h).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * ((c // h) ** -0.5), k,
            preferred_element_type=jnp.float32,
        )
        if blocked is not None:
            scores = jnp.where(blocked, jnp.finfo(jnp.float32).min / 2, scores)
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(q_in.shape[0], q_in.shape[1], c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class MLP(nn.Module):
    """num_layers-deep relu MLP (the mask2former MLP head)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layer_{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype, name=f"layer_{self.num_layers - 1}")(x)


class PseudoClassEmbed(nn.Module):
    """Constant fg/bg logits (odise.py:494-506); real class logits come from
    the CLIP-space ensemble in XMask3D.cal_pred_logits."""

    num_classes: int

    def __call__(self, x):
        fg = jnp.ones(x.shape[:-1] + (self.num_classes,), x.dtype)
        bg = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
        return jnp.concatenate([fg, bg], axis=-1)


def mask_pooling(x: jnp.ndarray, mask: jnp.ndarray, hard: bool = True) -> jnp.ndarray:
    """Average x (B,H,W,C) under each of Q masks (B,Q,H,W) (odise.py:509-547).

    mask is pre-sigmoid logits; hard pooling thresholds at 0.5.
    """
    m = jax.nn.sigmoid(jax.lax.stop_gradient(mask))
    if hard:
        m = (m > 0.5).astype(x.dtype)
    # fp32 count: summing tens of thousands of bf16 mask values on the VPU
    # rounds the denominator (bf16 integers above 256 are inexact); the
    # einsum itself accumulates fp32 on the MXU regardless
    denom = m.astype(jnp.float32).sum(axis=(-1, -2), keepdims=False)[..., None] + 1e-8
    pooled = jnp.einsum(
        "bhwc,bqhw->bqc", x, m.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return (pooled / denom).astype(x.dtype)


class PooledMaskEmbed(nn.Module):
    """Mask-pooled CLIP-space embedding head (odise.py:550-597)."""

    hidden_dim: int = 256
    mask_dim: int = 256
    projection_dim: int = 768
    temperature: float = 0.07
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, decoder_output, mask_features, pred_masks):
        pooled = mask_pooling(mask_features, pred_masks)
        pooled = nn.LayerNorm(dtype=self.dtype, name="pool_norm")(pooled)
        pooled = nn.Dense(self.hidden_dim, dtype=self.dtype, name="pool_proj")(pooled)
        pooled = pooled + decoder_output
        y = nn.LayerNorm(dtype=self.dtype, name="embed_norm")(pooled)
        mask_embed = MLP(
            self.hidden_dim, self.projection_dim, 3, dtype=self.dtype, name="embed_mlp"
        )(y)
        logit_scale = self.param(
            "logit_scale",
            lambda k: jnp.asarray(np.log(1 / self.temperature), jnp.float32),
        )
        return {
            "mask_embed": mask_embed,
            "mask_pooled_features": pooled,
            "logit_scale": jnp.clip(jnp.exp(logit_scale), max=100.0),
        }


class DecoderLayer(nn.Module):
    """One round: masked cross-attn -> self-attn -> FFN (post-norm)."""

    heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, output, query_embed, src, pos, blocked):
        # masked cross-attention (mask2former_transformer_decoder.py:363-420)
        y = MHA(self.heads, dtype=self.dtype, name="cross_attn")(
            output + query_embed, src + pos, src, blocked=blocked
        )
        output = nn.LayerNorm(dtype=self.dtype, name="norm1")(output + y)
        q = output + query_embed
        y = MHA(self.heads, dtype=self.dtype, name="self_attn")(q, q, output)
        output = nn.LayerNorm(dtype=self.dtype, name="norm2")(output + y)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(output)
        y = nn.Dense(output.shape[-1], dtype=self.dtype, name="ffn2")(nn.relu(y))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(output + y)


class ODISEMaskedTransformerDecoder(nn.Module):
    """9-layer masked-attention query decoder with per-layer ODISE heads.

    __call__(multi_scale_features [s32, s16, s8], mask_features (B,H4,W4,C))
      -> dict with pred_logits / pred_masks / mask_embed / logit_scale /
         aux_outputs (one per intermediate layer, reference odise.py:429-443).
    """

    num_classes: int = 15
    hidden_dim: int = 256
    num_queries: int = 50
    heads: int = 8
    ffn_dim: int = 2048
    dec_layers: int = 9
    mask_dim: int = 256
    projection_dim: int = 768
    dtype: Any = jnp.float32

    def setup(self):
        self.query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, self.hidden_dim)
        )
        self.layers = [
            DecoderLayer(self.heads, self.ffn_dim, dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.dec_layers)
        ]
        self.decoder_norm = nn.LayerNorm(dtype=self.dtype)
        self.class_embed = PseudoClassEmbed(self.num_classes)
        self.mask_embed_mlp = MLP(
            self.hidden_dim, self.mask_dim, 3, dtype=self.dtype, name="mask_embed_mlp"
        )
        self.post_mask_embed = PooledMaskEmbed(
            self.hidden_dim, self.mask_dim, self.projection_dim, dtype=self.dtype
        )

    def _prediction_heads(self, output, mask_features, target_hw):
        """(reference odise.py:445-491) -> (class, mask, blocked, extras)."""
        x = self.decoder_norm(output)
        outputs_class = self.class_embed(x)
        mask_embed_in = self.mask_embed_mlp(x)
        outputs_mask = jnp.einsum(
            "bqc,bhwc->bqhw", mask_embed_in, mask_features,
            preferred_element_type=jnp.float32,
        ).astype(mask_features.dtype)
        extras = self.post_mask_embed(x, mask_features, outputs_mask)

        th, tw = target_hw
        b, q = outputs_mask.shape[:2]
        # antialias=False: torch F.interpolate(bilinear, align_corners=False)
        # does NOT antialias on downsampling; jax.image.resize does by
        # default, which shifts mask logits near the 0.5 gate and flips
        # blocked-attention bits (caught by test_golden_round4's decoder
        # golden vs reference odise.py:473-487)
        am = jax.image.resize(
            outputs_mask, (b, q, th, tw), method="bilinear", antialias=False
        )
        blocked = (jax.nn.sigmoid(am.reshape(b, q, th * tw)) < 0.5)
        # un-block rows that would otherwise attend to nothing
        # (mask2former_transformer_decoder.py:395 / odise.py:395 trick)
        all_blocked = blocked.all(axis=-1, keepdims=True)
        blocked = blocked & ~all_blocked
        blocked = jax.lax.stop_gradient(blocked)[:, None]  # (B,1,Q,HW)
        return outputs_class, outputs_mask, blocked, extras

    def __call__(
        self, multi_scale_features: List[jnp.ndarray], mask_features: jnp.ndarray
    ) -> Dict[str, Any]:
        assert len(multi_scale_features) == 3
        srcs, poss, sizes = [], [], []
        for i, f in enumerate(multi_scale_features):
            b, hh, ww, c = f.shape
            pos = jnp.asarray(
                position_embedding_sine(hh, ww, self.hidden_dim // 2), f.dtype
            ).reshape(1, hh * ww, c)
            srcs.append(f.reshape(b, hh * ww, c) + self.level_embed[i])
            poss.append(pos)
            sizes.append((hh, ww))

        b = multi_scale_features[0].shape[0]
        output = jnp.broadcast_to(
            self.query_feat[None], (b, self.num_queries, self.hidden_dim)
        ).astype(self.dtype)
        query_embed = self.query_embed[None].astype(self.dtype)

        classes, masks, extras_list = [], [], []
        oc, om, blocked, extras = self._prediction_heads(
            output, mask_features, sizes[0]
        )
        classes.append(oc)
        masks.append(om)
        extras_list.append(extras)

        for i in range(self.dec_layers):
            li = i % 3
            output = self.layers[i](output, query_embed, srcs[li], poss[li], blocked)
            oc, om, blocked, extras = self._prediction_heads(
                output, mask_features, sizes[(i + 1) % 3]
            )
            classes.append(oc)
            masks.append(om)
            extras_list.append(extras)

        out = {
            "pred_logits": classes[-1],
            "pred_masks": masks[-1],
            **extras_list[-1],
            "aux_outputs": [
                {"pred_logits": c, "pred_masks": m, **e}
                for c, m, e in zip(classes[:-1], masks[:-1], extras_list[:-1])
            ],
        }
        return out


class CategoryEmbed(nn.Module):
    """Learnable null embedding + (precomputed, frozen) CLIP text banks
    (odise.py:600-700). The text banks are computed once on host by the
    CLIP text tower and passed in as constants; this module holds only the
    learnable null embed and optional projection.
    """

    embed_dim: int = 768
    projection_dim: int = -1  # <0 => identity (reference B15N4 setting)
    dtype: Any = jnp.float32

    def setup(self):
        self.null_embed = self.param(
            "null_embed", nn.initializers.normal(0.02), (1, self.embed_dim)
        )
        if self.projection_dim > 0:
            self.text_proj = nn.Dense(
                self.projection_dim, dtype=self.dtype, name="text_proj"
            )

    def project(self, x: jnp.ndarray) -> jnp.ndarray:
        """The reference's category_head.text_proj (odise.py:618-622;
        identity in all shipped configs, Dense when projection_dim > 0) —
        also applied to caption embeddings (xmask3d.py:185)."""
        if self.projection_dim > 0:
            return self.text_proj(x)
        return x

    def __call__(self, text_embed: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {
            "text_embed": self.project(text_embed),
            "null_embed": self.project(self.null_embed),
        }
