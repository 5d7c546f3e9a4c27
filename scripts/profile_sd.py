"""Honest per-submodule SD-backbone profiling on the current backend.

Method (NOTES_ROUND3.md): chain the op through a lax.scan carry so XLA
cannot hoist it (constant-input bodies get LICM'd and you time only the
~36 ms relay dispatch floor), and time TWO scan lengths — the per-iteration
cost is (T_long - T_short) / (n_long - n_short), which cancels the dispatch
floor exactly. Programs are kept SMALL (short scans) because the relay's
remote-compile service dies on very large programs.

Measures the in-net costs (taps-only outputs — in the e2e program XLA
dead-code-eliminates the VAE-decoder tail behind the last tap and the UNet
eps head, so full-output timings overstate them) next to full-output
variants, plus the level-0 4096-token self-attention under several flash
block sizes.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_sd.py
       [--n-short 1] [--n-long 3] [--reps 5] [--only vae_enc,unet,...]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def chain_scan(fn, n):
    """Build jit(program) running fn n times, output chained through the
    carry: fn must map (variables, f32 scalar) -> f32 scalar. Variables are
    an explicit argument — closing over multi-GB param trees bakes them into
    the program as CONSTANTS (3.4 GB for the SD UNet), which crawls through
    lowering and can kill the relay's remote-compile service."""

    def prog(variables, c0):
        def body(c, _):
            return fn(variables, c), ()

        c, _ = jax.lax.scan(body, c0, None, length=n)
        return c

    return jax.jit(prog)


def timed(prog, variables, reps):
    c0 = jnp.asarray(0.0, jnp.float32)
    float(np.asarray(prog(variables, c0)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(np.asarray(prog(variables, c0)))
        ts.append(time.time() - t0)
    return min(ts)


def measure(name, fn, n_short, n_long, reps, variables=None):
    t_s = timed(chain_scan(fn, n_short), variables, reps)
    t_l = timed(chain_scan(fn, n_long), variables, reps)
    per = (t_l - t_s) / (n_long - n_short)
    print(f"{name:44s} {per * 1e3:8.2f} ms/iter "
          f"(T{n_short}={t_s*1e3:.0f} T{n_long}={t_l*1e3:.0f})", flush=True)
    return per


def leaves_sum(tree):
    return sum(
        jnp.sum(x).astype(jnp.float32)
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-short", type=int, default=1)
    p.add_argument("--n-long", type=int, default=3)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--only", default="")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(key):
        return only is None or key in only

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    ns, nl, reps = args.n_short, args.n_long, args.reps

    # health check (memory: ping the relay before queuing work)
    jnp.ones((128, 128)).sum().block_until_ready()

    from xmask3d_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    img = jax.random.normal(key, (1, 512, 512, 3), jnp.bfloat16) * 0.1 + 0.5
    if want("vae_enc") or want("vae_dec") or want("vae_dec_full"):
        vv = jax.jit(vae.init)(key, img)

    if want("vae_enc"):
        def vae_enc(v, c):
            lat, taps = vae.apply(v, img + c * 1e-12, method=vae.encode)
            return leaves_sum((lat, taps))

        measure("VAE encode 512^2 (lat+taps)", vae_enc, ns, nl, reps,
                variables=vv)

    if want("vae_dec") or want("vae_dec_full"):
        lat, _ = jax.jit(lambda v, x: vae.apply(v, x, method=vae.encode))(vv, img)

        if want("vae_dec"):
            def vae_dec_taps(v, c):
                _, taps = vae.apply(v, lat + c * 1e-12, method=vae.decode)
                return leaves_sum(taps)  # rgb unused -> tail DCE'd (in-net cost)

            measure("VAE decode taps-only (in-net)", vae_dec_taps, ns, nl,
                    reps, variables=vv)

        if want("vae_dec_full"):
            def vae_dec_full(v, c):
                rgb, taps = vae.apply(v, lat + c * 1e-12, method=vae.decode)
                return leaves_sum((rgb, taps))

            measure("VAE decode full 64^2->512^2", vae_dec_full, ns, nl,
                    reps, variables=vv)

    from xmask3d_tpu.models.sd_unet import SDUNet, UNetConfig

    if want("unet") or want("unet_full"):
        unet = SDUNet(UNetConfig(), dtype=jnp.bfloat16)
        zz = jax.random.normal(key, (1, 64, 64, 4), jnp.bfloat16)
        tt = jnp.zeros((1,), jnp.int32)
        ctx = jax.random.normal(key, (1, 77, 768), jnp.bfloat16)
        uv = jax.jit(unet.init)(key, zz, tt, ctx)

        if want("unet"):
            def unet_taps(v, c):
                _, taps = unet.apply(v, zz + c * 1e-12, tt, ctx)
                return leaves_sum(taps)  # eps unused -> head DCE'd

            measure("SD UNet taps-only (in-net)", unet_taps, ns, nl, reps,
                    variables=uv)

        if want("unet_full"):
            def unet_full(v, c):
                eps, taps = unet.apply(v, zz + c * 1e-12, tt, ctx)
                return leaves_sum((eps, taps))

            measure("SD UNet full (eps+taps)", unet_full, ns, nl, reps,
                    variables=uv)

    # UNet-internal breakdown: one ResBlock / SpatialTransformer per level
    # at the REAL shapes (512^2 input -> 64^2 latent, SD v1 widths). Block
    # counts in the full UNet (num_res_blocks=2, ch_mult (1,2,4,4), attn at
    # levels 0-2 + mid): res 22, attn l0(64^2,320) 5, l1(32^2,640) 5,
    # l2(16^2,1280) 5, mid(8^2,1280) 1.
    if want("unet_blocks"):
        from xmask3d_tpu.models.sd_unet import SpatialTransformer, UNetResBlock

        emb = jax.random.normal(key, (1, 1280), jnp.bfloat16)
        ctx = jax.random.normal(key, (1, 77, 768), jnp.bfloat16)
        for res, ch in ((64, 320), (32, 640), (16, 1280), (8, 1280)):
            x = jax.random.normal(key, (1, res, res, ch), jnp.bfloat16)

            rb = UNetResBlock(ch, dtype=jnp.bfloat16)
            rv = jax.jit(rb.init)(key, x, emb)

            def res_fn(v, c, rb=rb, x=x):
                return leaves_sum(rb.apply(v, x + c * 1e-12, emb))

            measure(f"UNet ResBlock {res}^2 c{ch}", res_fn, ns, nl, reps,
                    variables=rv)

            # up-path resblock: skip-concat doubles the input channels
            rb2 = UNetResBlock(ch, dtype=jnp.bfloat16)
            x2 = jnp.concatenate([x, x], axis=-1)
            rv2 = jax.jit(rb2.init)(key, x2, emb)

            def res2_fn(v, c, rb2=rb2, x2=x2):
                return leaves_sum(rb2.apply(v, x2 + c * 1e-12, emb))

            measure(f"UNet ResBlock {res}^2 c{2*ch}->c{ch}", res2_fn, ns, nl,
                    reps, variables=rv2)

            if ch < 1280 or res == 16 or res == 8:
                st = SpatialTransformer(8, dtype=jnp.bfloat16)
                sv = jax.jit(st.init)(key, x, ctx)

                def st_fn(v, c, st=st, x=x):
                    return leaves_sum(st.apply(v, x + c * 1e-12, ctx))

                measure(f"UNet SpatialTransformer {res}^2 c{ch}", st_fn, ns,
                        nl, reps, variables=sv)

    # level-0 self-attention in isolation: 8 heads x 4096 tokens x d=40
    if want("attn"):
        from xmask3d_tpu.ops.flash_attention import (
            flash_attention,
            reference_attention,
        )

        kq = jax.random.normal(key, (1, 8, 4096, 40), jnp.bfloat16)
        kk = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 4096, 40), jnp.bfloat16)
        kv = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 4096, 40), jnp.bfloat16)

        def attn_fn(impl):
            def f(v, c):
                q = kq + (c * 1e-12).astype(kq.dtype)
                return jnp.sum(impl(q, kk, kv)).astype(jnp.float32)

            return f

        measure("attn 4096 d40 XLA", attn_fn(reference_attention), ns, nl, reps)
        for bq, bk in ((256, 256), (512, 512), (1024, 512), (512, 1024),
                       (1024, 1024), (2048, 1024)):
            measure(
                f"attn 4096 d40 flash bq{bq} bk{bk}",
                attn_fn(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                    q, k, v, block_q=bq, block_k=bk
                )),
                ns, nl, reps,
            )

    # 1024-token level-1 attention (d=80)
    if want("attn1"):
        from xmask3d_tpu.ops.flash_attention import (
            flash_attention,
            reference_attention,
        )

        kq = jax.random.normal(key, (1, 8, 1024, 80), jnp.bfloat16)
        kk = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024, 80), jnp.bfloat16)
        kv = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 1024, 80), jnp.bfloat16)

        def attn_fn(impl):
            def f(v, c):
                q = kq + (c * 1e-12).astype(kq.dtype)
                return jnp.sum(impl(q, kk, kv)).astype(jnp.float32)

            return f

        measure("attn 1024 d80 XLA", attn_fn(reference_attention), ns, nl, reps)
        for bq, bk in ((256, 256), (512, 512), (1024, 512), (1024, 1024)):
            measure(
                f"attn 1024 d80 flash bq{bq} bk{bk}",
                attn_fn(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                    q, k, v, block_q=bq, block_k=bk
                )),
                ns, nl, reps,
            )


if __name__ == "__main__":
    main()
