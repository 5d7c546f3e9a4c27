"""MinkowskiNet-style sparse UNet, TPU-native.

Capability parity with the reference 3D backbone
(models/modeling/meta_arch/mink_unet.py:30-268, resnet_base.py:64-96) on top
of the gather-matmul sparse conv engine (xmask3d_tpu/ops/sparse_conv.py)
instead of MinkowskiEngine. Returns (bottleneck stride-16 features, full-res
stride-1 features), exactly like the reference forward (mink_unet.py:118-178).

All tensors are batch-padded: feats (B, V_l, C) with validity masks carried by
the SparseHierarchy. BatchNorm is masked (statistics over valid voxels only)
and optionally cross-device synced via `axis_name` (replacing
ME.MinkowskiSyncBatchNorm, reference run/train.py:185-187).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xmask3d_tpu.ops.brick_conv import (
    brick_conv,
    from_brick,
    level_brick,
    to_brick,
)
from xmask3d_tpu.ops.sparse_conv import (
    SparseHierarchy,
    sparse_conv_transpose,
)
from xmask3d_tpu.ops.sparse_conv_pallas import sparse_conv_auto


def _bricks_enabled() -> bool:
    """XMASK3D_BRICK=1 opts into the brick-dense conv path (ops/brick_conv).

    Default OFF: on v5e the brick formulation measured ~1.7x slower per conv
    and ~5x slower in-net than the gather/Pallas path (XLA materializes the
    27 shifted-window slices at C=32 minor-dim, and per-stage layout
    conversions dominate at the small deep-level voxel counts) — see
    BASELINE.md round-2 notes. Kept as a numerically-exact A/B alternative;
    a fused Pallas halo+conv kernel is the path to making it win."""
    import os

    return os.environ.get("XMASK3D_BRICK", "0") == "1"


def _kaiming_out(key, shape, dtype=jnp.float32):
    """Kaiming-normal fan_out init for (K, Cin, Cout) sparse kernels
    (reference: resnet_base.py:55-58)."""
    fan_out = shape[0] * shape[2]
    std = (2.0 / fan_out) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid voxels of a (B, V, C) tensor.

    Matches torch BatchNorm semantics (biased variance for normalization,
    **unbiased** variance for the running-stat update — torch's
    torch.var(unbiased=True) convention — so eval numerics agree with
    checkpoints trained under ME.MinkowskiBatchNorm; running stats updated
    with momentum 0.1). When `axis_name` is set and the
    module runs inside shard_map/pmap, statistics are synced with psum —
    the TPU-native SyncBN.
    """

    momentum: float = 0.9  # running = m*running + (1-m)*batch
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if train:
            m = valid[..., None].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            cnt = jnp.sum(m)
            s1 = jnp.sum(xf * m, axis=(0, 1))
            s2 = jnp.sum(xf * xf * m, axis=(0, 1))
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                var_unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var_unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype)


class SparseConv(nn.Module):
    """Sparse conv layer over a precomputed kernel map (K offsets)."""

    features: int
    num_offsets: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, kmap: Optional[jnp.ndarray], out_valid=None, brick=None,
        weights_only: bool = False,
    ):
        w = self.param(
            "kernel", _kaiming_out, (self.num_offsets, x.shape[-1], self.features)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if weights_only:
            # caller runs the contraction itself (fused-stem path: run_3d
            # concatenates both UNets' stem kernels into one conv); params
            # are created identically so the tree is unchanged
            return w
        if kmap is None:  # 1x1 conv == plain matmul on the same coord map
            assert self.num_offsets == 1
            out = jnp.einsum(
                "bvc,co->bvo", x, w[0].astype(self.dtype),
                preferred_element_type=x.dtype,
            )
            if b is not None:
                out = out + b.astype(out.dtype)
            if out_valid is not None:
                out = jnp.where(out_valid[..., None], out, 0)
            return out
        if brick is not None and self.num_offsets in (27, 125):
            # brick-dense path: x/out are in the (B, NB*64, C) layout and
            # out_valid is the slot-validity mask (ops/brick_conv.py)
            nbr27, _, _ = brick
            return brick_conv(
                x, w.astype(self.dtype), nbr27, slot_valid=out_valid, bias=b
            )
        return sparse_conv_auto(
            x, w.astype(self.dtype), kmap, bias=b, out_valid=out_valid
        )


class SparseConvTranspose(nn.Module):
    """Generative transposed conv (kernel 2, stride 2): parent gather."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, parent: jnp.ndarray, octant: jnp.ndarray):
        w = self.param("kernel", _kaiming_out, (8, x.shape[-1], self.features))
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return sparse_conv_transpose(x, w.astype(self.dtype), parent, octant, bias=b)


class BasicBlock(nn.Module):
    """ME-style residual BasicBlock (expansion 1): two kernel-3 convs."""

    planes: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kmap3, valid, train: bool, brick=None):
        residual = x
        out = SparseConv(self.planes, 27, dtype=self.dtype, name="conv1")(
            x, kmap3, out_valid=valid, brick=brick
        )
        out = MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm1")(
            out, valid, train
        )
        out = nn.relu(out)
        out = SparseConv(self.planes, 27, dtype=self.dtype, name="conv2")(
            out, kmap3, out_valid=valid, brick=brick
        )
        out = MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm2")(
            out, valid, train
        )
        if x.shape[-1] != self.planes:
            residual = SparseConv(self.planes, 1, dtype=self.dtype, name="downsample_conv")(
                x, None
            )
            residual = MaskedBatchNorm(
                axis_name=self.axis_name, dtype=self.dtype, name="downsample_norm"
            )(residual, valid, train)
        out = nn.relu(out + residual)
        return jnp.where(valid[..., None], out, 0)


class MinkUNet(nn.Module):
    """Choy-style MinkUNet over a SparseHierarchy.

    planes/layers follow the reference variants (mink_unet.py:181-243).
    Returns (bottleneck stride-16 feats (B, V4, planes[3]), stride-1 output
    (B, V0, out_channels)).
    """

    out_channels: int
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)  # 34C
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)  # 34
    init_dim: int = 32
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def _stage(self, x, planes, n_blocks, level, train, name):
        """A run of residual blocks at one hierarchy level.

        When the level carries brick metadata, the whole stage runs in the
        brick-dense layout (one scatter in, one gather out) so every kernel-3
        conv inside is a dense MXU conv instead of 27 row gathers."""
        brick = level_brick(level) if _bricks_enabled() else None
        if brick is not None:
            _, sor, sv = brick
            x = to_brick(x, sor, sv.shape[-1])
            valid = sv
        else:
            valid = level.valid
        for i in range(n_blocks):
            x = BasicBlock(
                planes, axis_name=self.axis_name, dtype=self.dtype, name=f"{name}_{i}"
            )(x, level.kmap3, valid, train, brick=brick)
        if brick is not None:
            x = from_brick(x, sor)
            x = jnp.where(level.valid[..., None], x, 0)
        return x

    @nn.compact
    def __call__(
        self, feats: jnp.ndarray, h: SparseHierarchy, train: bool = False,
        stem_conv: Optional[jnp.ndarray] = None,
        stem_weights_only: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dt, ax = self.dtype, self.axis_name
        lv = h.levels
        x = feats.astype(dt)

        def bn(name):
            return MaskedBatchNorm(axis_name=ax, dtype=dt, name=name)

        if stem_weights_only:
            # fused-stem serving path (xmask3d.run_3d): hand the caller the
            # conv0 kernel so both flagship UNets' stems run as ONE sparse
            # conv over the shared kmap5 table (same gather + band sweep,
            # concatenated output channels — numerically identical)
            return SparseConv(
                self.init_dim, h.kmap5.shape[1], dtype=dt, name="conv0"
            )(x, h.kmap5, weights_only=True)

        # stem: kernel-5 conv at stride 1 (brick-dense when metadata present:
        # the 125-tap map was the single most gather-heavy op in the net)
        brick0 = level_brick(lv[0]) if _bricks_enabled() else None
        if stem_conv is not None:
            # precomputed conv0 output (fused-stem path); params already
            # created by the stem_weights_only pass
            out_p1 = nn.relu(bn("bn0")(stem_conv.astype(dt), lv[0].valid, train))
        elif brick0 is not None:
            _, sor0, sv0 = brick0
            x = to_brick(x, sor0, sv0.shape[-1])
            x = SparseConv(self.init_dim, h.kmap5.shape[1], dtype=dt, name="conv0")(
                x, h.kmap5, out_valid=sv0, brick=brick0
            )
            x = nn.relu(bn("bn0")(x, sv0, train))
            out_p1 = jnp.where(lv[0].valid[..., None], from_brick(x, sor0), 0)
        else:
            x = SparseConv(self.init_dim, h.kmap5.shape[1], dtype=dt, name="conv0")(
                x, h.kmap5, out_valid=lv[0].valid
            )
            out_p1 = nn.relu(bn("bn0")(x, lv[0].valid, train))

        skips = [out_p1]
        x = out_p1
        # encoder: 4x [strided conv k2s2 -> BN -> relu -> blocks]
        for s in range(4):
            x = SparseConv(x.shape[-1], 8, dtype=dt, name=f"conv{s + 1}")(
                x, h.down[s], out_valid=lv[s + 1].valid
            )
            x = nn.relu(bn(f"bn{s + 1}")(x, lv[s + 1].valid, train))
            x = self._stage(
                x, self.planes[s], self.layers[s], lv[s + 1], train, f"block{s + 1}"
            )
            if s < 3:
                skips.append(x)

        bottleneck = x  # stride 16, planes[3] channels

        # decoder: 4x [transposed conv -> BN -> relu -> cat skip -> blocks]
        for d in range(4):
            tgt = 3 - d  # target level index
            x = SparseConvTranspose(self.planes[4 + d], dtype=dt, name=f"convtr{4 + d}")(
                x, h.up_parent[tgt], h.up_octant[tgt]
            )
            x = nn.relu(bn(f"bntr{4 + d}")(x, lv[tgt].valid, train))
            x = jnp.concatenate([x, skips[tgt]], axis=-1)
            x = self._stage(
                x, self.planes[4 + d], self.layers[4 + d], lv[tgt], train, f"block{5 + d}"
            )

        out = SparseConv(self.out_channels, 1, dtype=dt, name="final")(
            x, None, out_valid=lv[0].valid
        )
        return bottleneck, out


_VARIANTS = {
    # name: (planes, layers)
    "MinkUNet14A": ((32, 64, 128, 256, 128, 128, 96, 96), (1,) * 8),
    "MinkUNet14B": ((32, 64, 128, 256, 128, 128, 128, 128), (1,) * 8),
    "MinkUNet14C": ((32, 64, 128, 256, 192, 192, 128, 128), (1,) * 8),
    "MinkUNet14D": ((32, 64, 128, 256, 384, 384, 384, 384), (1,) * 8),
    "MinkUNet18A": ((32, 64, 128, 256, 128, 128, 96, 96), (2,) * 8),
    "MinkUNet18B": ((32, 64, 128, 256, 128, 128, 128, 128), (2,) * 8),
    "MinkUNet18D": ((32, 64, 128, 256, 384, 384, 384, 384), (2,) * 8),
    "MinkUNet34A": ((32, 64, 128, 256, 256, 128, 64, 64), (2, 3, 4, 6, 2, 2, 2, 2)),
    "MinkUNet34B": ((32, 64, 128, 256, 256, 128, 64, 32), (2, 3, 4, 6, 2, 2, 2, 2)),
    "MinkUNet34C": ((32, 64, 128, 256, 256, 128, 96, 96), (2, 3, 4, 6, 2, 2, 2, 2)),
}


def mink_unet(
    out_channels: int = 20,
    arch: str = "MinkUNet18A",
    axis_name: Optional[str] = None,
    dtype: Any = jnp.float32,
) -> MinkUNet:
    """Factory matching the reference mink_unet (mink_unet.py:246-268)."""
    if arch not in _VARIANTS:
        raise ValueError(f"architecture {arch} not supported")
    planes, layers = _VARIANTS[arch]
    return MinkUNet(
        out_channels=out_channels,
        planes=planes,
        layers=layers,
        axis_name=axis_name,
        dtype=dtype,
    )
