"""Pixel-decoder piecewise profile (chained-scan, dispatch-floor-cancelling).

The pixel decoder measures ~7.9 ms/view on v5e while its matmul FLOPs bound
is well under 1 ms — this script splits the cost: full decoder, one encoder
layer, the deformable-attention op alone (Pallas q_tile sweep + XLA
formulation), and the layer's dense-only remainder (projections + FFN).
Reference op: third_party Mask2Former ms_deform_attn_core_pytorch
(ops/functions/ms_deform_attn_func.py:52-72); 512^2-view shapes
(levels 64/32/16, 5376 tokens, 8 heads x 4 points, 256 ch).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_pixel.py \
       [--n-short 8] [--n-long 64] [--reps 5] [--only op,layer,full,dense]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import sys

sys.path.insert(0, "scripts")
from profile_sd import leaves_sum, measure  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-short", type=int, default=8)
    p.add_argument("--n-long", type=int, default=64)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--only", default="")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(k):
        return only is None or k in only

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    ns, nl, reps = args.n_short, args.n_long, args.reps
    jnp.ones((128, 128)).sum().block_until_ready()  # relay health check

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    from xmask3d_tpu.models.pixel_decoder import (
        MSDeformAttnLayer,
        MSDeformAttnPixelDecoder,
    )
    from xmask3d_tpu.ops.deform_attn import (
        ms_deform_attn,
        ms_deform_attn_pallas,
    )

    # bench shapes: 512^2 input -> taps at strides 4..32, 512 ch from the
    # backbone bottleneck projections
    feats = {
        "s2": jax.random.normal(key, (1, 128, 128, 512), dt),
        "s3": jax.random.normal(key, (1, 64, 64, 512), dt),
        "s4": jax.random.normal(key, (1, 32, 32, 512), dt),
        "s5": jax.random.normal(key, (1, 16, 16, 512), dt),
    }

    if want("full"):
        dec = MSDeformAttnPixelDecoder(dtype=dt)
        dv = jax.jit(dec.init)(key, feats)

        def full_fn(v, c):
            mf, outs = dec.apply(v, {k: x + c * 1e-12 for k, x in feats.items()})
            return leaves_sum((mf, outs))

        measure("pixel decoder FULL (6 layers + FPN)", full_fn, ns // 4 or 1,
                nl // 4 or 2, reps, variables=dv)

    # one encoder layer at the concatenated-token shape
    shapes = ((16, 16), (32, 32), (64, 64))
    n_tok = sum(h * w for h, w in shapes)
    src = jax.random.normal(key, (1, n_tok, 256), dt)
    pos = jax.random.normal(key, (1, n_tok, 256), dt)
    ref = jax.random.uniform(key, (1, n_tok, 3, 2), jnp.float32)

    if want("layer"):
        layer = MSDeformAttnLayer(dtype=dt)
        lv = jax.jit(lambda k, s, p, r: layer.init(k, s, p, r, shapes))(
            key, src, pos, ref
        )

        def layer_fn(v, c):
            return leaves_sum(layer.apply(v, src + c * 1e-12, pos, ref, shapes))

        measure("one MSDeformAttn layer", layer_fn, ns, nl, reps, variables=lv)

    # the deform op alone (value/loc/weights precomputed)
    b, heads, d, npts = 1, 8, 32, 4
    value = jax.random.normal(key, (b, n_tok, heads, d), dt)
    loc = jax.random.uniform(key, (b, n_tok, heads, 3, npts, 2), jnp.float32)
    # local sampling like the real net: reference point + small offsets
    base = jnp.broadcast_to(ref[:, :, None, :, None, :], loc.shape)
    loc = base + (loc - 0.5) * 0.05
    attn = jax.nn.softmax(
        jax.random.normal(key, (b, n_tok, heads, 3, npts), jnp.float32), axis=-1
    )

    if want("op"):
        for qt in (1024, 2048, 4096):
            fn = functools.partial(ms_deform_attn_pallas, q_tile=qt)

            def op_fn(v, c, fn=fn):
                return jnp.sum(
                    fn(value + c.astype(dt) * 1e-12, shapes, loc, attn).astype(
                        jnp.float32
                    )
                )

            measure(f"deform op pallas q_tile={qt}", op_fn, ns, nl, reps)

        def op_xla(v, c):
            return jnp.sum(
                ms_deform_attn(
                    value + c.astype(dt) * 1e-12, shapes, loc, attn
                ).astype(jnp.float32)
            )

        measure("deform op XLA gather", op_xla, ns, nl, reps)

    if want("dense"):
        # dense-only remainder: the layer with the deform op replaced by the
        # value projection itself (same matmul count minus sampling)
        layer = MSDeformAttnLayer(dtype=dt)
        lv = jax.jit(lambda k, s, p, r: layer.init(k, s, p, r, shapes))(
            key, src, pos, ref
        )
        params = lv["params"]

        def dense_fn(v, c):
            import flax.linen as nn

            s = src + c * 1e-12
            q = s + pos
            pj = lambda name, x: x @ params[name]["kernel"].astype(dt) + params[
                name
            ]["bias"].astype(dt)
            so = pj("sampling_offsets", q)
            aw = jax.nn.softmax(
                pj("attention_weights", q).reshape(1, n_tok, heads, 12), -1
            )
            val = pj("value_proj", s)
            out = pj("output_proj", val)
            y = pj("linear1", s + out)
            y = pj("linear2", jax.nn.relu(y))
            return leaves_sum((so, aw, y))

        measure("layer dense-only (projections+FFN)", dense_fn, ns, nl, reps)


if __name__ == "__main__":
    main()
