"""Scene-inference throughput benchmark (the BASELINE.json primary metric).

Measures scenes/sec/chip for the full XMask3D eval pipeline (SD v1 backbone
at 512x512, MinkUNet34C/18A 3D branches, Mask2Former head, MaskCLIP ViT-L,
on-device ensemble + routing) on synthetic ScanNet-like scenes following the
reference inference protocol: batch = 1 view, VIEWS_PER_SCENE accepted views
per scene, multi-view per-point voting (run/infer.py:375-694).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator is the documented A100 fp32 estimate of 0.15 scenes/sec
(SD UNet+VAE ~1.2 TFLOP/view fp32 + MinkUNet re-run per view, ~0.2 s/view,
30 views/scene). Update BASELINE.md when a measured A100 number exists.
"""

import json
import os
import sys
import time

import numpy as np

A100_BASELINE_SCENES_PER_SEC = 0.15
VIEWS_PER_SCENE = 30
NUM_SCENES = 3

# keep the TPU plugin env intact; bench runs on the real chip when present.


def main():
    import jax
    import jax.numpy as jnp

    from xmask3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from xmask3d_tpu.config import load_config
    from xmask3d_tpu.data.batching import Capacities
    from xmask3d_tpu.data.synthetic import synthetic_batch
    from xmask3d_tpu.engine.builder import init_model
    from xmask3d_tpu.engine.infer import ensemble_and_route

    size = os.environ.get("BENCH_SIZE", "full")
    tiny = size == "tiny"
    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    if tiny:
        caps = Capacities(max_points=512, max_voxels=256, max_targets=8)
        image = 64
        cfg.mask_shape = [24, 32]
        ctx, vocab = 16, 512
        npts = 400
    else:
        caps = Capacities(max_points=32768, max_voxels=24576, max_targets=24)
        image = 512
        ctx, vocab = 77, 49408
        npts = 20000

    # Device-side hierarchy building (ops/hierarchy_device.py) is correct on
    # CPU/TPU single-shot, but on the current axon relay runtime the full
    # model + builder program corrupts device state on RE-execution
    # (INVALID_ARGUMENT on every later dispatch; minimal repros of
    # builder+conv / builder+attention re-execute fine). Default to the
    # host-built kernel maps until the runtime stabilizes.
    device_hier = os.environ.get("BENCH_DEVICE_HIER", "0") == "1"
    view_batch = int(os.environ.get("BENCH_VIEW_BATCH", "1"))
    batch = synthetic_batch(
        view_batch, caps, seed=0, num_points=npts, image_size=(image, image),
        mask_shape=tuple(cfg.mask_shape), context_length=ctx, vocab_size=vocab,
        device_hierarchy=device_hier,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    model, variables, statics = init_model(cfg, batch, tiny=tiny)
    mc = model.cfg

    @jax.jit
    def infer_step(variables, batch, statics):
        _, outputs = model.apply(
            variables, batch, statics, train=False,
            rngs={"points": jax.random.PRNGKey(0)},
        )
        return ensemble_and_route(
            outputs, mc.base_category, mc.novel_category, mc.num_test_classes,
            cfg.base_ratio, cfg.novel_ratio,
        )["pred"]

    # compile + warmup
    pred = infer_step(variables, batch, statics)
    pred.block_until_ready()

    # stage a bounded window of distinct views and cycle it (models a
    # pipelined loader keeping a few batches in flight; the relay-backed
    # dev backend evicts/re-uploads when too many buffers sit resident)
    n_distinct = int(os.environ.get("BENCH_DISTINCT_VIEWS", "6"))
    views = []
    for v in range(0, min(VIEWS_PER_SCENE, n_distinct * view_batch), view_batch):
        b = synthetic_batch(
            view_batch, caps, seed=100 + v, num_points=npts,
            image_size=(image, image), mask_shape=tuple(cfg.mask_shape),
            context_length=ctx, vocab_size=vocab, device_hierarchy=device_hier,
        )
        views.append(jax.tree_util.tree_map(jnp.asarray, b))
    for b in views:  # pre-touch every leaf: force full residency pre-timing
        jax.block_until_ready(b)
    steps_per_scene = max(1, VIEWS_PER_SCENE // view_batch)

    def measure():
        # untimed warmup pass: first-touch of program workspace + buffers
        for b in views:
            np.asarray(infer_step(variables, b, statics))
        t0 = time.time()
        sink = 0
        for s in range(NUM_SCENES):
            ts = time.time()
            for i in range(steps_per_scene):
                pred = infer_step(variables, views[i % len(views)], statics)
                # force materialization: async dispatch queues (and
                # relay-backed backends) cannot fake a host transfer
                sink += int(np.asarray(pred).sum())
            print(f"# scene {s}: {time.time() - ts:.2f}s", flush=True)
        return NUM_SCENES / (time.time() - t0)

    # the tunnel-backed backend occasionally drops a transfer; retry the
    # whole measurement rather than reporting a corrupted number
    scenes_per_sec = None
    for attempt in range(3):
        try:
            scenes_per_sec = measure()
            break
        except Exception as e:  # jax.errors.JaxRuntimeError etc.
            print(f"# measurement attempt {attempt} failed: {e}", flush=True)
            time.sleep(5)
    if scenes_per_sec is None:
        raise RuntimeError("benchmark failed after 3 attempts")

    print(
        json.dumps(
            {
                "metric": "scene_inference_throughput",
                "value": round(scenes_per_sec, 5),
                "unit": "scenes/sec/chip",
                "vs_baseline": round(scenes_per_sec / A100_BASELINE_SCENES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
