"""Honest in-net MinkUNet timing (chained-scan, dispatch-floor-cancelling).

Same methodology as profile_sd.py: chain the net through a lax.scan carry
(a tiny data dependence per iteration defeats LICM), time two scan lengths,
report the slope. Measures both flagship sparse nets on a surface-like
synthetic scene at bench capacities, under the current kernel impl
(XMASK3D_SPARSE_IMPL env selects pallas/xla for A/B).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_minkunet.py \
       [--n-short 4] [--n-long 16] [--reps 5] [--points 20000]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import sys

sys.path.insert(0, "scripts")
from profile_sd import measure  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-short", type=int, default=4)
    p.add_argument("--n-long", type=int, default=16)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--points", type=int, default=20000)
    p.add_argument("--only", type=str, default="",
                   help="skip the UNet sections; run only stem sections when 'stem'")
    args = p.parse_args()

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    from xmask3d_tpu.data.batching import Capacities
    from xmask3d_tpu.data.synthetic import synthetic_batch
    from xmask3d_tpu.models.minkunet import mink_unet

    caps = Capacities(max_points=32768, max_voxels=24576, max_targets=24)
    b = synthetic_batch(1, caps, seed=0, num_points=args.points,
                        image_size=(64, 64))
    h = jax.tree_util.tree_map(jnp.asarray, b["hierarchy"])
    feats = jnp.asarray(b["voxel_feats"], jnp.bfloat16)
    occ = [int(jnp.sum(lv["valid"])) for lv in h["levels"]] \
        if isinstance(h, dict) and "levels" in h else None
    if occ:
        print("level occupancy:", occ, flush=True)

    archs = () if args.only == "stem" else (
        ("MinkUNet34C", 256),
        ("MinkUNet14A", 2),
        # the REAL binary-head body: PCBinaryProcessor runs 14A with
        # out_channels=last_dim=256 (xmask3d.py:148-161) — the out_ch=2
        # row above under-measures it (round-4 in-context decomposition
        # found the binary branch at ~9.2 ms vs this profiler's 4.75)
        ("MinkUNet14A", 256),
    )
    for arch, out_ch in archs:
        mu = mink_unet(out_channels=out_ch, arch=arch, dtype=jnp.bfloat16)
        mv = jax.jit(lambda k, f, hh, mu=mu: mu.init(k, f, hh, False))(
            key, feats, h
        )

        def fn(v, c, mu=mu):
            bottleneck, out = mu.apply(v, feats + c * 1e-12, h, False)
            return (jnp.sum(out) + jnp.sum(bottleneck)).astype(jnp.float32)

        measure(f"{arch} out{out_ch} in-net ({args.points} pts)", fn,
                args.n_short, args.n_long, args.reps, variables=mv)

    if args.only != "stem":
        # the full PCBinaryProcessor (14A out256 + MaskedBN + relu + fc(1)),
        # exactly as run_3d invokes it
        from xmask3d_tpu.models.xmask3d import PCBinaryProcessor

        pb = PCBinaryProcessor(arch="MinkUNet14A", dtype=jnp.bfloat16)
        pv = jax.jit(lambda k, f: pb.init(k, f, h, False))(key, feats)

        def pb_fn(v, c):
            out = pb.apply(v, feats + c * 1e-12, h, False)
            return jnp.sum(out).astype(jnp.float32)

        measure("PCBinaryProcessor (14A+BN+fc)", pb_fn, args.n_short,
                args.n_long, args.reps, variables=pv)

    # k5 stem in isolation, and the shared-gather variant: both flagship
    # UNets run an identical-topology stem (same kmap5 table, same input
    # voxels) with different weights — one conv with the two kernels
    # concatenated along the output dim computes both in a single
    # gather+band sweep (numerically identical after a split)
    from xmask3d_tpu.ops.sparse_conv_pallas import sparse_conv_auto

    kmap5 = h.kmap5  # (B, 125, V)
    v0 = h.levels[0].valid
    for cout, label in ((32, "one stem"), (64, "both stems, concat out")):
        wk = jax.random.normal(key, (kmap5.shape[1], feats.shape[-1], cout),
                               jnp.bfloat16) * 0.1

        def stem_fn(v, c, wk=wk):
            # keep the chain add in bf16: f32 promotion would silently run
            # the kernel (and its VMEM staging) in fp32
            x = feats + (c * 1e-12).astype(feats.dtype)
            out = sparse_conv_auto(x, wk, kmap5, out_valid=v0)
            return jnp.sum(out).astype(jnp.float32)

        measure(f"k5 stem {label} ({cout}ch)", stem_fn, args.n_short,
                args.n_long, args.reps, variables=0)


if __name__ == "__main__":
    main()
