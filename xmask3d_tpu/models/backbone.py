"""Multi-scale projection backbone over LDM feature taps.

Capability parity with the reference
models/modeling/backbone/feature_extractor.py:19-234
(FeatureExtractorBackbone): per-tap bottleneck projection to 512 channels,
stride clamping to [4, 32], grouping into s2/s3/s4/s5, nearest-resize
restore + per-group sum. Sliding-window forward is supported for
high-resolution inputs. Gradient checkpointing (the reference's
feature_extractor.py:138-143 toggle) is the `remat_backbone` config knob:
it applies flax.linen.remat at BLOCK granularity inside the SD UNet/VAE
(per res/transformer block), which is what actually caps backward peak.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from xmask3d_tpu.models.layers import group_norm, upsample_nearest_int

from xmask3d_tpu.models.ldm_extractor import LdmConfig, LdmImplicitCaptionerExtractor


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual projection with GroupNorm (the detectron2
    BottleneckBlock shape used at feature_extractor.py:36-49)."""

    out_channels: int
    bottleneck_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.bottleneck_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.relu(group_norm(y.shape[-1], self.dtype, "norm1")(y))
        y = nn.Conv(
            self.bottleneck_channels, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(group_norm(y.shape[-1], self.dtype, "norm2")(y))
        y = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = group_norm(y.shape[-1], self.dtype, "norm3")(y)
        if x.shape[-1] != self.out_channels:
            sc = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                name="shortcut",
            )(x)
            sc = group_norm(sc.shape[-1], self.dtype, "shortcut_norm")(sc)
        else:
            sc = x
        return nn.relu(y + sc)


class FeatureExtractorBackbone(nn.Module):
    """Wraps the implicit-captioner LDM extractor into a detectron2-style
    multi-scale backbone emitting {"s2": stride4, ..., "s5": stride32}."""

    ldm_cfg: LdmConfig = LdmConfig()
    out_features: Sequence[str] = ("s2", "s3", "s4", "s5")
    min_stride: int = 4
    max_stride: int = 32
    projection_dim: int = 512
    dtype: Any = jnp.float32
    remat: bool = False  # block-level remat inside the SD UNet/VAE

    def _grouping(self):
        strides = self.ldm_cfg.feature_strides()
        clamped = [min(max(s, self.min_stride), self.max_stride) for s in strides]
        groups: Dict[int, List[int]] = defaultdict(list)
        for idx, s in enumerate(clamped):
            groups[s].append(idx)
        return {s: groups[s] for s in sorted(groups)}

    def output_shape(self) -> Dict[str, Dict[str, int]]:
        """{name: {channels, stride}} for head construction (matches the
        reference Backbone.output_shape contract)."""
        out = {}
        for stride in self._grouping():
            name = f"s{int(math.log2(stride))}"
            if name in self.out_features:
                out[name] = {"channels": self.projection_dim, "stride": stride}
        return out

    def setup(self):
        self.feature_extractor = LdmImplicitCaptionerExtractor(
            self.ldm_cfg, dtype=self.dtype, remat=self.remat
        )
        n_taps = len(self.ldm_cfg.feature_strides())
        self.feature_projections = [
            BottleneckBlock(
                self.projection_dim,
                self.projection_dim // 4,
                dtype=self.dtype,
                name=f"proj_{i}",
            )
            for i in range(n_taps)
        ]

    def __call__(
        self,
        image: jnp.ndarray,  # (B, H, W, 3) in [0, 1]
        prefix: jnp.ndarray,  # (B, 768)
        uncond_tokens: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        h, w = image.shape[1], image.shape[2]
        taps = self.feature_extractor(image, prefix, uncond_tokens)
        out: Dict[str, jnp.ndarray] = {}
        for stride, indices in self._grouping().items():
            name = f"s{int(math.log2(stride))}"
            if name not in self.out_features:
                continue
            acc = None
            for idx in indices:
                f = taps[idx]
                target = (f.shape[0], h // stride, w // stride, f.shape[-1])
                # reference F.interpolate default = nearest
                # (feature_extractor.py:153-159); integer upscales take the
                # broadcast form (resize lowers to TPU gathers — layers.py)
                if f.shape[1:3] != target[1:3]:
                    sh, rh = divmod(target[1], f.shape[1])
                    sw, rw = divmod(target[2], f.shape[2])
                    if rh == 0 and rw == 0 and sh >= 1 and sw >= 1:
                        f = upsample_nearest_int(f, sh, sw)
                    else:
                        f = jax.image.resize(f, target, method="nearest")
                p = self.feature_projections[idx](f)
                acc = p if acc is None else acc + p
            out[name] = acc
        return out

    def slide_forward(
        self,
        image: jnp.ndarray,  # (B, H, W, 3), H/W multiples of crop
        prefix: jnp.ndarray,
        uncond_tokens: jnp.ndarray,
        crop: int = 512,
    ) -> Dict[str, jnp.ndarray]:
        """Sliding-window forward for inputs larger than the training crop
        (reference feature_extractor.py:169-226): per-window single_forward,
        averaged into full-size maps. Static window grid (no-overlap stride =
        crop, the reference's short-side tiling specialized to exact
        multiples — crops always align, count==1 everywhere)."""
        b, h, w, _ = image.shape
        assert h % crop == 0 and w % crop == 0, "pad inputs to crop multiples"
        outs: Dict[str, jnp.ndarray] = {}
        for yi in range(h // crop):
            for xi in range(w // crop):
                sl = image[:, yi * crop : (yi + 1) * crop, xi * crop : (xi + 1) * crop]
                feats = self(sl, prefix, uncond_tokens)
                for k, v in feats.items():
                    if k not in outs:
                        stride = crop // v.shape[1]
                        outs[k] = jnp.zeros(
                            (b, h // stride, w // stride, v.shape[-1]), v.dtype
                        )
                    stride = crop // v.shape[1]
                    outs[k] = jax.lax.dynamic_update_slice(
                        outs[k],
                        v,
                        (0, yi * crop // stride, xi * crop // stride, 0),
                    )
        return outs
