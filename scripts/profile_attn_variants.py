"""A/B the SD UNet transformer-block grind candidates on the chip.

Candidates (all exact-numerics — same matmuls, same per-element
reduction order, only operand layout / fusion changes):
  1. fused QKV: one (T, c)@(c, 3c) matmul instead of three (T, c)@(c, c)
     (kernels concatenated at apply time; params unchanged, converter
     compatibility preserved).
  2. flash kernel dot_general: contract k on its last dim instead of
     materializing k.T per KV block inside the kernel.
  3. flash block sizes at d=40 (the SD UNet head dim): (512,512) default
     vs (1024,512), (1024,1024), (2048,1024).

Usage: PYTHONPATH=.:/root/.axon_site python scripts/profile_attn_variants.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

sys.path.insert(0, "scripts")
from profile_sd import measure  # noqa: E402

from xmask3d_tpu.ops.flash_attention import flash_attention  # noqa: E402


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    B, H, T, D = 1, 8, 4096, 40
    C = H * D  # 320
    q = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
    x = jax.random.normal(key, (B, T, C), jnp.bfloat16)
    wq = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.02
    wk = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.02
    wv = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.02

    def chain(a, c):
        return a + (c * 1e-12).astype(a.dtype)

    # --- qkv projection forms -------------------------------------------
    def qkv_separate(vv, c):
        xx = chain(x, c)
        a = xx @ wq
        b_ = xx @ wk
        d_ = xx @ wv
        return jnp.sum((a + b_ + d_).astype(jnp.float32))

    def qkv_fused(vv, c):
        xx = chain(x, c)
        w = jnp.concatenate([wq, wk, wv], axis=1)
        o = xx @ w
        a, b_, d_ = jnp.split(o, 3, axis=-1)
        return jnp.sum((a + b_ + d_).astype(jnp.float32))

    measure("qkv separate (3 matmuls)", qkv_separate, 8, 64, 5, variables=0)
    measure("qkv fused (1 matmul)", qkv_fused, 8, 64, 5, variables=0)

    # --- flash block sizes at d=40, transpose vs dot_general scores ------
    for bq, bk in [(512, 512), (1024, 512), (1024, 1024), (2048, 1024),
                   (2048, 2048)]:
        for dg in (False, True):
            def fl(vv, c, bq=bq, bk=bk, dg=dg):
                qq = chain(q, c)
                return jnp.sum(
                    flash_attention(
                        qq, k, v, block_q=bq, block_k=bk, dg_scores=dg
                    ).astype(jnp.float32)
                )

            measure(
                f"flash d40 ({bq},{bk}) {'dg' if dg else 'kT'}",
                fl, 8, 64, 5, variables=0,
            )

    # --- VAE mid-block shape (single head d=512, 4096 tokens) ------------
    qw = jax.random.normal(key, (1, 1, 4096, 512), jnp.bfloat16)
    for dg in (False, True):
        def flw(vv, c, dg=dg):
            qq = chain(qw, c)
            return jnp.sum(
                flash_attention(qq, qw, qw, dg_scores=dg).astype(jnp.float32)
            )

        measure(f"flash d512 {'dg' if dg else 'kT'}", flw, 8, 64, 5,
                variables=0)


if __name__ == "__main__":
    main()
