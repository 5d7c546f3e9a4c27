"""Flag-gated int8 (W8A8) serving path for the dense/conv hot layers.

v5e's MXU runs int8 contractions at 2x its bf16 rate (measured on this
chip: 387.6 TOP/s vs 189.6 TF/s for a 4096^3 matmul, /tmp probe round 4).
This module provides drop-in replacements for `nn.Dense` / `nn.Conv` with
the IDENTICAL parameter tree (kernel/bias names, shapes, fp32 storage,
lecun_normal init), so checkpoints, converters
(checkpoint/convert_torch.py) and every existing test keep working; only
the apply-time arithmetic changes when the mode is on.

Quantization scheme (dynamic, no calibration pass):
  - weights: symmetric per-output-channel scales (abs-max over all input
    dims / 127), rounded to int8 at apply time — the extra pass over the
    kernel fuses into the weight read the matmul does anyway;
  - dense activations: symmetric per-token scales (abs-max over the
    contraction dim) — the LLM.int8-style outer-product rescale
    y * (s_x[:, None] * s_w[None, :]) is exact for dot;
  - conv activations: one per-tensor scale (the output pixel's reduction
    window spans many pixels, so the scale must be constant across it);
  - accumulation in int32 (`preferred_element_type`), rescale in fp32.

STATUS (round 5): RETIRED from the model wiring. The full-model W8A8 bench
measured 3x SLOWER than bf16 on v5e (0.179 vs 0.574 scenes/sec, BASELINE.md
round 4) — dynamic activation quantization breaks XLA producer fusion and
triples HBM traffic. models/{vae,sd_unet}.py use plain nn.Conv/nn.Dense
again; QConv/QDense remain here as a tested standalone op. A revival needs
calibrated STATIC activation scales plus a fused quantize+conv Pallas
kernel; until then `XMASK3D_INT8` affects nothing in the model.

Layers below a size floor (contraction or output dim < 64) keep the exact
bf16 path — they contribute no measurable time but concentrate
quantization damage (time embeddings, heads).

The reference has no quantized path (fp16 autocast only); this is a
TPU-native serving feature.
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


_FORCE_INT8 = None  # test/tooling override (trace-time, like the env var)


def set_int8(value) -> None:
    """Override int8_enabled() (True/False), or None to defer to the env.
    Takes effect at TRACE time — already-compiled programs keep whatever
    the flag was when they traced."""
    global _FORCE_INT8
    _FORCE_INT8 = value


def int8_enabled() -> bool:
    if _FORCE_INT8 is not None:
        return bool(_FORCE_INT8)
    return os.environ.get("XMASK3D_INT8", "0") == "1"


_EPS = 1e-8
_MIN_QUANT_DIM = 64


def _quant_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 kernel + per-output-channel fp32 scale (last dim = out)."""
    wf = w.astype(jnp.float32)
    red = tuple(range(w.ndim - 1))
    s = jnp.max(jnp.abs(wf), axis=red, keepdims=True) / 127.0
    s = jnp.maximum(s, _EPS)
    wq = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return wq, s


def quant_dot(x: jnp.ndarray, w: jnp.ndarray, dtype: Any) -> jnp.ndarray:
    """int8 x @ w with per-token activation scales. x: (..., K), w: (K, N)."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, _EPS)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    wq, sw = _quant_weight(w)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * sx * sw.reshape(1, -1)).astype(dtype)


def quant_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    strides: Sequence[int],
    padding: Union[str, Sequence[Tuple[int, int]]],
    dtype: Any,
) -> jnp.ndarray:
    """int8 NHWC/HWIO conv with a per-tensor activation scale."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, _EPS)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    wq, sw = _quant_weight(w)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        xq, wq, tuple(strides), padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * sx * sw.reshape(1, 1, 1, -1)).astype(dtype)


class QDense(nn.Module):
    """nn.Dense-compatible layer that runs the matmul W8A8 when
    XMASK3D_INT8=1 (checked at trace time) and the layer is big enough."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        if (
            int8_enabled()
            and x.shape[-1] >= _MIN_QUANT_DIM
            and self.features >= _MIN_QUANT_DIM
        ):
            y = quant_dot(x, kernel, self.dtype)
        else:
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,)
            )
            y = y + bias.astype(self.dtype)
        return y


class QConv(nn.Module):
    """nn.Conv-compatible NHWC conv (square-window subset this codebase
    uses) with the W8A8 path when XMASK3D_INT8=1."""

    features: int
    kernel_size: Sequence[int]
    strides: Union[None, int, Sequence[int]] = 1
    padding: Union[str, int, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
        )
        strides = self.strides if self.strides is not None else 1
        if isinstance(strides, int):
            strides = (strides, strides)
        padding = self.padding
        if isinstance(padding, int):
            padding = [(padding, padding), (padding, padding)]
        if (
            int8_enabled()
            and cin >= _MIN_QUANT_DIM
            and self.features >= _MIN_QUANT_DIM
        ):
            y = quant_conv(x, kernel, strides, padding, self.dtype)
        else:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                strides,
                padding,
                dimension_numbers=dn,
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,)
            )
            y = y + bias.astype(self.dtype)
        return y
