"""Multi-chip dry run (8 virtual CPU devices) + optimizer labeling."""

import numpy as np
import jax
import jax.numpy as jnp


def test_param_labels():
    from xmask3d_tpu.engine.train_step import param_label

    assert param_label(("params", "pc_decoder", "x", "kernel")) == "3d"
    assert param_label(("params", "pc_binary_head", "bn", "scale")) == "3d"
    assert (
        param_label(
            ("params", "backbone", "feature_extractor", "ldm_extractor", "unet", "k")
        )
        == "frozen"
    )
    assert param_label(("params", "clip", "visual", "proj")) == "frozen"
    assert (
        param_label(("params", "backbone", "feature_extractor", "clip_project", "k"))
        == "others"
    )
    assert param_label(("params", "mask_decoder", "layer_0", "q_proj")) == "others"


def test_dryrun_multichip_8():
    # run in a fresh subprocess: the full-train-step compile on top of a
    # long pytest session's accumulated executables can abort the host
    # (observed XLA-CPU OOM abort); isolation keeps the suite stable
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [
            sys.executable, "-c",
            "from xmask3d_tpu.utils.cache import enable_compilation_cache;"
            "enable_compilation_cache();"
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=env, capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "dryrun_multichip OK" in out.stdout, out.stderr[-2000:]


def test_mesh_and_sharding_helpers():
    from xmask3d_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    batch = {"x": np.zeros((8, 3), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")
