"""Run real training steps on the current backend (TPU) and time them.

Round-1 note: train-step RE-execution crashed the relay-backed dev TPU
worker (NOTES_ROUND2.md item 3); this script is the repro/retest. It runs
N steps of the jitted full train step (fwd+bwd+AdamW update) on synthetic
data and reports compile time, per-step wall time, and loss trajectory.

  python scripts/train_step_tpu.py            # reduced-depth model (fast)
  python scripts/train_step_tpu.py --full     # flagship-size model
  python scripts/train_step_tpu.py --steps 10
"""

import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="flagship-size model")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--lr-scale", type=float, default=1.0,
                    help="scale both lrs (the tiny synthetic config diverges "
                         "to NaN logits by step 2 at the flagship lr; use "
                         "0.01 for sustained-execution runs)")
    args = ap.parse_args()

    import __graft_entry__ as g
    from xmask3d_tpu.engine.builder import init_model
    from xmask3d_tpu.engine.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    if args.full:
        from xmask3d_tpu.config import load_config
        from xmask3d_tpu.data.batching import Capacities
        from xmask3d_tpu.data.synthetic import synthetic_batch

        cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
        caps = Capacities(max_points=32768, max_voxels=24576, max_targets=24)
        # mask_shape must be set BEFORE the batch is built: the synthetic
        # x/y point-label coordinates are sampled against this grid
        cfg.mask_shape = [240, 320]
        batch = synthetic_batch(
            1, caps, seed=0, num_points=20000, image_size=(512, 512),
            mask_shape=(240, 320),
        )
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        model, variables, statics = init_model(cfg, batch)
    else:
        cfg, caps, batch = g._tiny_cfg_and_batch()
        cfg.arch_3d = "MinkUNet14A"
        cfg.arch_binary_head = "MinkUNet14A"
        cfg.dec_layers = 2
        cfg.pixel_enc_layers = 2
        model, variables, statics = init_model(cfg, batch, tiny=True)

    optimizer = make_optimizer(
        cfg.lr_3d * args.lr_scale, cfg.lr_others * args.lr_scale,
        total_steps=1000,
    )
    state = create_train_state(model, variables, optimizer)
    donate = os.environ.get("XMASK3D_DONATE", "1") == "1"
    train_step = jax.jit(
        make_train_step(model, optimizer, dict(cfg.loss_weight)),
        donate_argnums=(0,) if donate else (),
    )
    statics = jax.tree_util.tree_map(jnp.asarray, statics)

    t0 = time.time()
    state, metrics = train_step(state, batch, statics, jnp.asarray(1.0))
    loss = float(metrics["loss_total"])
    print(f"step 0 (compile+run {time.time() - t0:.1f}s): loss={loss:.4f}", flush=True)

    # the relay-backed dev worker has crashed mid-run before (round 4: steps
    # 0-1 OK, crash at step 2) — keep the evidence of how far we got instead
    # of dying with a bare traceback; the backend is unrecoverable in-process
    # after a worker crash, so a partial run exits rc=2 for the caller to
    # retry in a fresh process
    done, times = 1, []
    try:
        for i in range(1, args.steps):
            t0 = time.time()
            state, metrics = train_step(state, batch, statics, jnp.asarray(1.0))
            loss = float(metrics["loss_total"])
            times.append(time.time() - t0)
            print(f"step {i}: {times[-1]:.3f}s loss={loss:.4f}", flush=True)
            if loss != loss:
                print(f"NaN loss at step {i} (training diverged; the step "
                      "itself executed and returned) — lower --lr-scale for "
                      "sustained runs", flush=True)
                raise SystemExit(3)
            done = i + 1
    except Exception as e:  # jax.errors.JaxRuntimeError on worker crash
        print(f"WORKER CRASH after {done}/{args.steps} steps: {e}", flush=True)
        if times:
            print(f"steady-state step time: {min(times):.3f}s", flush=True)
        raise SystemExit(2)

    if times:
        print(f"steady-state step time: {min(times):.3f}s", flush=True)
    print("train steps OK", flush=True)


if __name__ == "__main__":
    main()
