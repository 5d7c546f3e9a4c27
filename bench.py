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
import subprocess
import sys
import time

import numpy as np

A100_BASELINE_SCENES_PER_SEC = 0.15
VIEWS_PER_SCENE = 30
NUM_SCENES = 3

# keep the TPU plugin env intact; bench runs on the real chip when present.

# --- outage guard (VERDICT r3 weak #1) -------------------------------------
# BENCH_r03.json was lost to a transient relay outage: the first device op
# raised "Unable to initialize backend 'axon'" BEFORE measure()'s retry loop
# could help. Worse, the relay can also HANG (device init blocks forever), so
# in-process retries alone can't guard init. The fix: run the actual bench as
# a child process, preceded by a tiny-matmul health probe that also runs in a
# subprocess (a hung probe is killed by timeout, not inherited). Bounded
# backoff until BENCH_MAX_WAIT is exhausted.

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128), jnp.bfloat16);"
    "(x @ x).block_until_ready();"
    "print('PROBE_OK')"
)


def _probe_backend(timeout):
    """True iff a 128x128 matmul completes on the default backend in time."""
    cmd = os.environ.get("BENCH_PROBE_CMD")
    if cmd:  # test hook: substitute an arbitrary probe command
        argv = ["sh", "-c", cmd]
    else:
        argv = [sys.executable, "-c", _PROBE_SRC]
    try:
        r = subprocess.run(
            argv, timeout=timeout, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def orchestrate():
    """Probe-then-run loop. Returns the child's exit code (0 on success)."""
    max_wait = float(os.environ.get("BENCH_MAX_WAIT", "2700"))
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "180"))
    child_timeout = float(os.environ.get("BENCH_CHILD_TIMEOUT", "2400"))
    deadline = time.time() + max_wait
    backoff = 15.0
    attempt = 0
    while True:
        attempt += 1
        if not _probe_backend(probe_timeout):
            print(f"# backend probe {attempt} failed", flush=True)
            if time.time() + backoff > deadline:
                print("# backend never became healthy", flush=True)
                return 1
            time.sleep(backoff)
            backoff = min(backoff * 2, 300.0)
            continue
        cmd = os.environ.get("BENCH_CHILD_CMD")
        argv = ["sh", "-c", cmd] if cmd else [sys.executable, sys.argv[0]]
        env = dict(os.environ, BENCH_CHILD="1")
        try:
            r = subprocess.run(argv, timeout=child_timeout, env=env)
        except subprocess.TimeoutExpired:
            print(f"# bench child timed out (attempt {attempt})", flush=True)
            r = None
        if r is not None and r.returncode == 0:
            return 0
        if r is not None:
            print(f"# bench child rc={r.returncode} (attempt {attempt})",
                  flush=True)
        if time.time() + backoff > deadline:
            return 1
        time.sleep(backoff)
        backoff = min(backoff * 2, 300.0)


def main():
    import jax
    import jax.numpy as jnp

    from xmask3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from xmask3d_tpu.config import load_config
    from xmask3d_tpu.data.batching import Capacities
    from xmask3d_tpu.data.synthetic import synthetic_batch
    from xmask3d_tpu.engine.builder import init_model

    size = os.environ.get("BENCH_SIZE", "full")
    tiny = size == "tiny"
    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    if tiny:
        caps = Capacities(max_points=512, max_voxels=256, max_targets=8)
        image = 64
        cfg.mask_shape = [24, 32]
        ctx, vocab = 16, 512
        npts = 400
    elif size == "worst":
        # protocol worst case: the reference accepts views up to 65k
        # projected points (config caps 65536/49152); the default bench view
        # (20k pts / 24k voxels) is a mid-sized view. BENCH_SIZE=worst runs
        # the full config caps with a dense synthetic scene so the headline
        # can be qualified against the protocol ceiling (VERDICT r2 weak #2).
        caps = Capacities(max_points=65536, max_voxels=49152, max_targets=24)
        image = 512
        ctx, vocab = 77, 49408
        npts = 60000
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

    # bf16 weight storage (default ON; BENCH_BF16_PARAMS=0 reverts): the
    # modules already COMPUTE in bf16 (model dtype), but flax keeps params
    # fp32 and casts per use — so every view re-reads ~6.3 GB of fp32
    # weights from HBM where ~3.2 GB of bf16 would do. Storing bf16 yields
    # the SAME bf16 values those per-use casts produce, so this is the
    # serving configuration, not a numerics trade (measured 0.496 -> 0.517
    # scenes/sec, round 3). Keeps batch_stats fp32 (BN running stats);
    # fp32-sensitive scalars (logit_scale) survive the cast exactly.
    if os.environ.get("BENCH_BF16_PARAMS", "1") == "1":
        from xmask3d_tpu.engine.infer_cli import cast_params_bf16

        variables = cast_params_bf16(variables)


    n_classes = mc.num_test_classes

    # BENCH_SCENE_REUSE=1: the scene-reuse serving mode (one 3D pass per
    # scene at scene-level caps, per-view 2D passes consuming its outputs —
    # engine/scene_reuse.py; protocol divergence, flag-gated).
    scene_reuse = os.environ.get("BENCH_SCENE_REUSE", "0") == "1"
    scene3d = None
    scene_3d_step = None
    scene_batch_dev = None
    if scene_reuse:
        from xmask3d_tpu.data.synthetic import synthetic_scene
        from xmask3d_tpu.engine.scene_reuse import (
            make_scene_3d_step,
            scene_3d_batch,
            scene_caps_from_view_caps,
        )

        scene_caps = scene_caps_from_view_caps(
            caps, factor=int(os.environ.get("BENCH_SCENE_FACTOR", "4"))
        )
        sc = synthetic_scene(
            caps, seed=7, num_points=min(scene_caps.max_points, 8 * npts),
            num_views=1, num_classes=cfg.classes,
            image_size=(image, image), mask_shape=tuple(cfg.mask_shape),
            context_length=ctx, vocab_size=vocab,
        )
        sb = scene_3d_batch(
            sc["coords"], sc["colors"], scene_caps, voxel_size=0.05
        )
        scene_batch_dev = jax.tree_util.tree_map(jnp.asarray, sb)
        scene_3d_step = make_scene_3d_step(model)

    from xmask3d_tpu.engine import serve

    infer_step = jax.jit(serve.make_view_body(model, cfg))

    # BENCH_SCAN_VIEWS=1 (default): run the whole scene's view loop INSIDE
    # one device program — lax.scan over view indices into a stacked view
    # buffer, voting in the scan carry (engine/serve.py). The per-view
    # protocol is unchanged (batch-1 sequential forwards, on-device voting,
    # reference infer.py:375-694); it bounds dispatch overhead at one
    # round-trip per scene (measured +0.003 scenes/sec on the relay, whose
    # async dispatch already pipelines — bigger on hosts where per-view
    # launches aren't free). The program is the same size as one infer_step
    # (scan bodies are traced once).
    scan_views = os.environ.get("BENCH_SCAN_VIEWS", "1") == "1"
    scene_scan = serve.make_scene_scan_step(model, cfg, scene_reuse=scene_reuse)

    def fresh_vote_state():
        return serve.fresh_vote_state(caps.max_points, n_classes)

    _scene_state = {}

    def scene_begin():
        """Per-scene prelude: in scene-reuse mode, the ONE 3D pass whose
        outputs all of the scene's views consume."""
        if scene_reuse:
            _scene_state["s3"] = scene_3d_step(variables, scene_batch_dev)

    def step_view(b, vc):
        if scene_reuse:
            return infer_step(variables, b, statics, *vc, _scene_state["s3"])
        return infer_step(variables, b, statics, *vc)

    # compile + warmup (scan mode compiles the scene program in measure()'s
    # warmup pass instead — compiling both programs doubles relay compile
    # time for no benefit)
    if not scan_views or os.environ.get("BENCH_INCLUDE_HOST", "0") == "1":
        scene_begin()
        votes, counter = step_view(batch, fresh_vote_state())
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
            scene_begin()
            vc = fresh_vote_state()
            for _ in range(steps_per_scene):
                vc = step_view(jax.device_put(next(it)), vc)
            np.asarray(vc[0].argmax(1))
            t0 = time.time()
            sink = 0
            for s in range(NUM_SCENES):
                ts = time.time()
                scene_begin()
                vc = fresh_vote_state()
                for _ in range(steps_per_scene):
                    b = jax.device_put(next(it))
                    vc = step_view(b, vc)
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

    stacked = None
    idxseq = None
    if scan_views:
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *views
        )
        idxseq = jnp.arange(steps_per_scene, dtype=jnp.int32) % len(views)

    def run_scene():
        scene_begin()
        vc = fresh_vote_state()
        if scan_views:
            extra = (_scene_state["s3"],) if scene_reuse else ()
            return scene_scan(variables, stacked, idxseq, statics, *vc, *extra)
        for i in range(steps_per_scene):
            vc = step_view(views[i % len(views)], vc)
        return vc

    def measure():
        # untimed warmup pass: first-touch of program workspace + buffers
        vc = run_scene()
        np.asarray(vc[0].argmax(1))
        # BENCH_PIPELINE_SCENES (default on): scenes are independent (fresh
        # vote state each), so dispatch scene s+1 before syncing scene s —
        # the per-scene dispatch round-trip (~36 ms through the relay)
        # overlaps device compute instead of serializing with it. Every
        # scene's voted per-point prediction is still materialized on the
        # host inside the timed window; only the SYNC POINT moves, exactly
        # as a pipelined serving loop would run. BENCH_PIPELINE_SCENES=0
        # restores the strict dispatch->sync-per-scene loop.
        pipelined = os.environ.get("BENCH_PIPELINE_SCENES", "1") == "1"
        t0 = time.time()
        sink = 0
        if pipelined:
            preds = []
            for s in range(NUM_SCENES):
                vc = run_scene()
                preds.append(vc[0].argmax(1))  # dispatched, not synced
            for s, p in enumerate(preds):
                sink += int(np.asarray(p).sum())
        else:
            for s in range(NUM_SCENES):
                ts = time.time()
                vc = run_scene()
                # one host transfer per scene: the voted per-point
                # prediction (materializes the whole scene's compute)
                sink += int(np.asarray(vc[0].argmax(1)).sum())
                print(f"# scene {s}: {time.time() - ts:.2f}s", flush=True)
        dt = time.time() - t0
        print(f"# {NUM_SCENES} scenes in {dt:.2f}s", flush=True)
        return NUM_SCENES / dt

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

    metric = (
        "scene_inference_throughput_reuse"
        if scene_reuse
        else "scene_inference_throughput"
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(scenes_per_sec, 5),
                "unit": "scenes/sec/chip",
                "vs_baseline": round(scenes_per_sec / A100_BASELINE_SCENES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD", "0") == "1":
        main()
    else:
        sys.exit(orchestrate())
