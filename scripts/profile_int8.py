"""Measure the W8A8 int8 serving path (ops/int8_quant.py) per shape class.

Times quant_dot / quant_conv END-TO-END (dynamic activation quantization,
int8 MXU contraction, fp32 rescale) against the plain bf16 op, at the
shapes the SD towers and decoders actually run, using the chained-scan
methodology (the carry feeds every compute input, LICM can't hoist).

Peak context (v5e, measured round 4): bf16 matmul 189.6 TF/s, int8
matmul 387.6 TOP/s — the MXU doubles. Whether a given layer wins depends
on whether it was MXU-bound at bf16 and on the VPU cost of the dynamic
quantize/rescale passes.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/profile_int8.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

sys.path.insert(0, "scripts")
from profile_sd import measure  # noqa: E402

from xmask3d_tpu.ops.int8_quant import quant_conv, quant_dot  # noqa: E402


def chain(a, c):
    return a + (c * 1e-12).astype(a.dtype)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)

    # matmul shapes: UNet transformer (4096 tok fused qkv c320->960, GEGLU
    # 320->2560, ff 1280->320), CLIP ViT-L (257 tok, 1024->4096)
    mm_shapes = [
        (4096, 320, 960, "unet qkv"),
        (4096, 320, 2560, "unet geglu"),
        (4096, 1280, 320, "unet ff_out"),
        (1024, 1280, 5120, "unet lv2 geglu"),
        (257, 1024, 4096, "clip mlp"),
    ]
    for t, cin, cout, label in mm_shapes:
        x = jax.random.normal(k, (t, cin), jnp.bfloat16)
        w = jax.random.normal(k, (cin, cout), jnp.bfloat16) * 0.02
        gf = 2 * t * cin * cout / 1e9

        def f16(v, c, x=x, w=w):
            xx = chain(x, c)
            return jnp.sum((xx @ w).astype(jnp.float32))

        def f8(v, c, x=x, w=w):
            xx = chain(x, c)
            return jnp.sum(quant_dot(xx, w, jnp.bfloat16).astype(jnp.float32))

        measure(f"mm {label} bf16 ({gf:.2f} GF)", f16, 8, 64, 5, variables=0)
        measure(f"mm {label} int8", f8, 8, 64, 5, variables=0)

    # conv shapes: VAE level-0 (512^2 c128), level-1 (256^2 c256),
    # level-2/3 (128^2/64^2 c512), UNet levels (64^2 c320, 32^2 c640,
    # 16^2/8^2 c1280)
    conv_shapes = [
        (512, 128, "vae L0"),
        (256, 256, "vae L1"),
        (128, 512, "vae L2"),
        (64, 512, "vae L3"),
        (64, 320, "unet L0"),
        (32, 640, "unet L1"),
        (16, 1280, "unet L2"),
    ]
    for hw, ch, label in conv_shapes:
        x = jax.random.normal(k, (1, hw, hw, ch), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, ch, ch), jnp.bfloat16) * 0.02
        gf = 2 * hw * hw * 9 * ch * ch / 1e9
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )

        def f16(v, c, x=x, w=w, dn=dn):
            xx = chain(x, c)
            return jnp.sum(
                jax.lax.conv_general_dilated(
                    xx, w, (1, 1), "SAME", dimension_numbers=dn
                ).astype(jnp.float32)
            )

        def f8(v, c, x=x, w=w):
            xx = chain(x, c)
            return jnp.sum(
                quant_conv(xx, w, (1, 1), "SAME", jnp.bfloat16).astype(
                    jnp.float32
                )
            )

        n_s, n_l = (4, 32) if hw >= 256 else (8, 64)
        measure(f"conv3x3 {label} {hw}^2 c{ch} bf16 ({gf:.2f} GF)", f16,
                n_s, n_l, 5, variables=0)
        measure(f"conv3x3 {label} {hw}^2 c{ch} int8", f8, n_s, n_l, 5,
                variables=0)


if __name__ == "__main__":
    main()
