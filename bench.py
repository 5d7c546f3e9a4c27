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

    from xmask3d_tpu.engine.infer import device_vote_add

    n_classes = mc.num_test_classes

    @jax.jit
    def infer_step(variables, batch, statics, votes, counter):
        _, outputs = model.apply(
            variables, batch, statics, train=False,
            rngs={"points": jax.random.PRNGKey(0)},
        )
        routed = ensemble_and_route(
            outputs, mc.base_category, mc.novel_category, mc.num_test_classes,
            cfg.base_ratio, cfg.novel_ratio,
        )
        # multi-view voting stays ON DEVICE (reference infer.py:642-647);
        # the host pulls one argmax per scene, not one prediction per view
        pred = routed["pred"]
        ids = jnp.broadcast_to(jnp.arange(pred.shape[1]), pred.shape)
        return device_vote_add(
            votes, counter, ids.reshape(-1), pred.reshape(-1),
            batch["point_valid"].reshape(-1),
        )

    def fresh_vote_state():
        return (
            jnp.zeros((caps.max_points, n_classes), jnp.int32),
            jnp.zeros((caps.max_points,), jnp.int32),
        )

    # compile + warmup
    votes, counter = infer_step(variables, batch, statics, *fresh_vote_state())
    jax.block_until_ready((votes, counter))

    # BENCH_INCLUDE_HOST=1: the honest end-to-end mode — every view is
    # built on the host DURING the timed window (synthetic stand-ins for
    # load+voxelize+project+kernel-map build, the same host code path the
    # real loader runs), prefetched by a worker pool (data/prefetch.py) and
    # device_put'd, so the number includes host pipeline + H2D + device
    # compute. Matches the reference's inference protocol cost model
    # (run/infer.py: loader workers + per-view forward).
    if os.environ.get("BENCH_INCLUDE_HOST", "0") == "1":
        from xmask3d_tpu.data.prefetch import parallel_map_iterator

        workers = int(os.environ.get("BENCH_HOST_WORKERS", "4"))

        def build_view(seed):
            b = synthetic_batch(
                view_batch, caps, seed=seed, num_points=npts,
                image_size=(image, image), mask_shape=tuple(cfg.mask_shape),
                context_length=ctx, vocab_size=vocab,
                device_hierarchy=device_hier,
            )
            return b

        steps_per_scene = max(1, VIEWS_PER_SCENE // view_batch)

        def seeds():
            s = 1000
            while True:
                yield s
                s += 1

        def measure_host():
            it = parallel_map_iterator(build_view, seeds(), workers=workers)
            # warmup: one untimed scene fills the prefetch window
            vc = fresh_vote_state()
            for _ in range(steps_per_scene):
                vc = infer_step(variables, jax.device_put(next(it)), statics, *vc)
            np.asarray(vc[0].argmax(1))
            t0 = time.time()
            sink = 0
            for s in range(NUM_SCENES):
                ts = time.time()
                vc = fresh_vote_state()
                for _ in range(steps_per_scene):
                    b = jax.device_put(next(it))
                    vc = infer_step(variables, b, statics, *vc)
                sink += int(np.asarray(vc[0].argmax(1)).sum())
                print(f"# scene {s} (host incl.): {time.time() - ts:.2f}s", flush=True)
            return NUM_SCENES / (time.time() - t0)

        scenes_per_sec = None
        for attempt in range(3):
            try:
                scenes_per_sec = measure_host()
                break
            except Exception as e:
                print(f"# measurement attempt {attempt} failed: {e}", flush=True)
                time.sleep(5)
        if scenes_per_sec is None:
            raise RuntimeError("benchmark failed after 3 attempts")
        print(
            json.dumps(
                {
                    "metric": "scene_inference_throughput_e2e",
                    "value": round(scenes_per_sec, 5),
                    "unit": "scenes/sec/chip",
                    "vs_baseline": round(
                        scenes_per_sec / A100_BASELINE_SCENES_PER_SEC, 3
                    ),
                }
            )
        )
        return

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
        vc = fresh_vote_state()
        for b in views:
            vc = infer_step(variables, b, statics, *vc)
        np.asarray(vc[0].argmax(1))
        t0 = time.time()
        sink = 0
        for s in range(NUM_SCENES):
            ts = time.time()
            vc = fresh_vote_state()
            for i in range(steps_per_scene):
                vc = infer_step(variables, views[i % len(views)], statics, *vc)
            # one host transfer per scene: the voted per-point prediction
            # (forces materialization of the whole scene's compute)
            sink += int(np.asarray(vc[0].argmax(1)).sum())
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
