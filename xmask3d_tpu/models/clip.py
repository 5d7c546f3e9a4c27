"""CLIP ViT (text + vision towers) and MaskCLIP, TPU-native Flax.

Capability parity with the reference models/modeling/meta_arch/clip.py:
`ClipAdapter` (frozen open_clip ViT-L-14 text/image towers, clip.py:66-227),
`build_clip_text_embed` (clip.py:21-63) and `MaskCLIP` — the masked-attention
image forward that embeds all `num_queries` masks in a single transformer
pass (clip.py:230-348).

Architecture follows the published CLIP ViT recipe (pre-norm transformer,
QuickGELU, joint 768-d embedding space for ViT-L/14); weights are converted
from open_clip checkpoints by xmask3d_tpu/checkpoint/convert_torch.py.
Attention is a plain fused-softmax formulation that XLA maps onto the MXU;
a Pallas flash-attention kernel (ops/flash_attention.py) is used on TPU for
the long-sequence MaskCLIP pass.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 768


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    embed_dim: int = 768


VIT_L_14 = (CLIPTextConfig(), CLIPVisionConfig())
VIT_L_14_336 = (CLIPTextConfig(), CLIPVisionConfig(image_size=336))
# tiny configs for tests; embed_dim stays 768 because the whole pipeline's
# joint text/mask embedding space is 768-d (projection_dim)
VIT_TINY = (
    CLIPTextConfig(vocab_size=512, context_length=16, width=32, layers=2, heads=2, embed_dim=768),
    CLIPVisionConfig(image_size=32, patch_size=8, width=32, layers=2, heads=2, embed_dim=768),
)

CLIP_CONFIGS = {
    "ViT-L-14": VIT_L_14,
    "ViT-L-14-336": VIT_L_14_336,
    "ViT-tiny": VIT_TINY,
}

# OpenAI CLIP preprocessing constants (normalize step of the open_clip
# preprocess pipeline used by ClipAdapter.clip_preprocess, clip.py:77-79)
CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    """MHA with a combined in-projection (matches CLIP's packed qkv weights).

    `blocked` is an optional boolean mask, True = attention NOT allowed
    (torch MultiheadAttention bool-mask semantics, which the reference's
    MaskCLIP attn_mask uses, clip.py:296-308). Shape broadcastable to
    (B, H, Tq, Tk). `bias` is an optional additive mask (e.g. causal).
    """

    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, blocked=None, bias=None):
        b, t, c = x.shape
        h = self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(z):
            return z.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        scale = (c // h) ** -0.5
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        if bias is not None:
            scores = scores + bias
        if blocked is not None:
            scores = jnp.where(blocked, jnp.finfo(jnp.float32).min / 2, scores)
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, blocked=None, bias=None):
        c = x.shape[-1]
        y = nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        x = x + MultiHeadAttention(self.heads, dtype=self.dtype, name="attn")(
            y, blocked=blocked, bias=bias
        )
        y = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * c, dtype=self.dtype, name="mlp_c_fc")(y)
        y = quick_gelu(y)
        x = x + nn.Dense(c, dtype=self.dtype, name="mlp_c_proj")(y)
        return x


class Transformer(nn.Module):
    layers: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, blocked=None, bias=None):
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.heads, dtype=self.dtype, name=f"resblock_{i}"
            )(x, blocked=blocked, bias=bias)
        return x


class CLIPTextTower(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens (B, T) int32 -> (text_embed (B, E), text_encodings (B, T, W)).

        Pooled embed is the ln_final output at the argmax (EOT) token
        projected by text_projection, as in clip.py:132-145.
        """
        c = self.cfg
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (c.vocab_size, c.width)
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.width),
        )
        x = jnp.take(tok_emb, tokens, axis=0).astype(self.dtype)
        x = x + pos_emb[None, : x.shape[1]].astype(self.dtype)
        t = x.shape[1]
        causal = jnp.triu(jnp.full((t, t), jnp.finfo(jnp.float32).min / 2), k=1)
        x = Transformer(c.layers, c.heads, dtype=self.dtype, name="transformer")(
            x, bias=causal[None, None]
        )
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(c.width**-0.5), (c.width, c.embed_dim)
        )
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        text_embed = pooled @ proj.astype(self.dtype)
        return text_embed, x


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32

    def grid_size(self) -> int:
        return self.cfg.image_size // self.cfg.patch_size

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,  # (B, H, W, 3) normalized, NHWC
        num_mask_tokens: int = 0,
        blocked: Optional[jnp.ndarray] = None,
    ):
        """Standard ViT forward, optionally with `num_mask_tokens` replicated
        cls tokens prepended and a boolean blocked-attention mask — the
        single-pass MaskCLIP trick (clip.py:239-270).

        Returns projected tokens (B, num_mask_tokens + 1 + N, E).
        """
        c = self.cfg
        b = image.shape[0]
        x = nn.Conv(
            c.width,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(image.astype(self.dtype))
        x = x.reshape(b, -1, c.width)  # (B, N, W)
        n = x.shape[1]
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.width,))
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (n + 1, c.width)
        )
        cls_tok = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.width))
        x = jnp.concatenate([cls_tok, x], axis=1) + pos[None].astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(x)

        if num_mask_tokens:
            mask_toks = jnp.broadcast_to(
                x[:, 0:1], (b, num_mask_tokens, c.width)
            )
            x = jnp.concatenate([mask_toks, x], axis=1)

        x = Transformer(c.layers, c.heads, dtype=self.dtype, name="transformer")(
            x, blocked=blocked
        )
        x = nn.LayerNorm(dtype=self.dtype, name="ln_post")(x)
        proj = self.param(
            "proj", nn.initializers.normal(c.width**-0.5), (c.width, c.embed_dim)
        )
        return x @ proj.astype(self.dtype)


class CLIP(nn.Module):
    """Joint text+vision CLIP with the MaskCLIP masked-attention forward."""

    text_cfg: CLIPTextConfig = CLIPTextConfig()
    vision_cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.text = CLIPTextTower(self.text_cfg, dtype=self.dtype)
        self.visual = CLIPVisionTower(self.vision_cfg, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

    def __call__(self, tokens, image):  # for init only
        te, _ = self.text(tokens)
        vi = self.visual(self.preprocess(image))
        return te, vi

    def preprocess(self, image: jnp.ndarray) -> jnp.ndarray:
        """Normalize 0..1 NHWC images with CLIP stats (the resize+normalize
        `clip_preprocess` of clip.py:77-79; resizing happens in the caller
        where target size is static)."""
        mean = jnp.asarray(CLIP_PIXEL_MEAN, image.dtype)
        std = jnp.asarray(CLIP_PIXEL_STD, image.dtype)
        return (image - mean) / std

    def embed_text(self, tokens: jnp.ndarray, normalize: bool = False):
        text_embed, encodings = self.text(tokens)
        if normalize:
            text_embed = text_embed / jnp.linalg.norm(
                text_embed, axis=-1, keepdims=True
            )
        return text_embed, encodings

    def embed_image(self, image: jnp.ndarray, normalize: bool = False):
        """image: (B,H,W,3) in 0..1 at the tower's native size."""
        toks = self.visual(self.preprocess(image))
        image_embed, encodings = toks[:, 0], toks[:, 1:]
        if normalize:
            image_embed = image_embed / jnp.linalg.norm(
                image_embed, axis=-1, keepdims=True
            )
        return image_embed, encodings

    def encode_image_with_mask(self, image: jnp.ndarray, mask: jnp.ndarray):
        """Single-pass masked CLIP embedding of Q masks (clip.py:272-310).

        image: (B, S, S, 3) in 0..1 at the tower's native size S.
        mask: (B, Q, S, S) mask logits (pre-sigmoid).
        Returns (B, Q, E) mask embeddings.
        """
        q = mask.shape[1]
        blocked = mask_attn_blocked(mask, self.vision_cfg.patch_size)
        toks = self.visual(
            self.preprocess(image), num_mask_tokens=q, blocked=blocked
        )
        return toks[:, :q]

    def clamped_logit_scale(self, max_scale: float = 100.0):
        return jnp.clip(jnp.exp(self.logit_scale), max=max_scale)


def mask_attn_blocked(mask: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """MaskCLIP attention-mask construction (reference clip.py:272-310).

    mask: (B, Q, S, S) mask logits at the tower's input size. Token layout
    is [Q mask tokens, cls, S/p * S/p patches]. Returns (B, 1, T, T) bool,
    True = may-not-attend (broadcast over heads): nobody attends to mask
    tokens; mask token q attends only cls + its own >=0.5-pooled patches.
    """
    b, q = mask.shape[0], mask.shape[1]
    p = patch_size
    g = mask.shape[2] // p
    m = jax.nn.sigmoid(mask)
    # max-pool to the patch grid (reference F.max_pool2d k=s=patch)
    patch = m.reshape(b, q, g, p, g, p).max(axis=(3, 5))
    blocked_patches = (patch < 0.5).reshape(b, q, g * g)

    n_img = g * g
    t = q + 1 + n_img
    blocked = jnp.zeros((b, t, t), dtype=bool)
    # nothing may attend to the mask tokens
    blocked = blocked.at[:, :, :q].set(True)
    # mask tokens may only attend to their own patches (+ cls token)
    blocked = blocked.at[:, :q, q + 1 :].set(blocked_patches)
    return blocked[:, None]  # (B, 1, T, T)


def build_clip(name: str, dtype=jnp.float32) -> CLIP:
    """Factory by open_clip-style model name (reference clip.py:66-75)."""
    text_cfg, vision_cfg = CLIP_CONFIGS[name]
    return CLIP(text_cfg=text_cfg, vision_cfg=vision_cfg, dtype=dtype)


def ensemble_logits_with_labels(
    logits: jnp.ndarray, group_sizes, method: str = "max"
) -> jnp.ndarray:
    """Reduce per-synonym logits into per-label logits
    (reference helper.py:72-97). `group_sizes` is the static list of synonym
    counts per label; logits last dim == sum(group_sizes)."""
    outs, off = [], 0
    for gs in group_sizes:
        seg = logits[..., off : off + gs]
        outs.append(seg.max(-1) if method == "max" else seg.mean(-1))
        off += gs
    return jnp.stack(outs, axis=-1)
