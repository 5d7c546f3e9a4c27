"""Device mesh + sharding utilities (the framework's distributed layer).

TPU-native replacement for the reference's NCCL DDP wiring
(run/train.py:113-141,173-187, DistributedSampler :229-264, diffdist
all_gather odise.py:81-107): one jax.sharding.Mesh with a `data` axis
(batch/scene parallelism, replacing DDP) and a `model` axis (tensor
parallelism for the dense towers). Gradients are psum'd by pjit from the
sharding specs; BN statistics sync via lax.psum inside MaskedBatchNorm
(models/minkunet.py) — the SyncBN equivalent; metric histograms psum like
the reference's dist.all_reduce (train.py:640-652).

Multi-host: call jax.distributed.initialize() before create_mesh; data
loading shards by process_index (shard_batch_by_host), replacing
DistributedSampler.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = -1, model: int = 1, devices=None
) -> Mesh:
    """Create a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch/scene) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def param_sharding_rules(path_tuple, value, mesh: Mesh) -> NamedSharding:
    """Tensor-parallel layout for the dense towers.

    Heuristic TP sharding over the `model` axis: attention/MLP projection
    kernels of the SD UNet and CLIP shard on their output features; second
    projections shard on input features; everything else replicates. XLA
    inserts the all-reduces (scaling-book recipe: annotate, let the compiler
    place collectives on ICI).
    """
    if mesh.shape.get("model", 1) == 1:
        return NamedSharding(mesh, P())
    name = "/".join(str(p) for p in path_tuple)
    is_kernel = name.endswith("kernel") and value.ndim == 2
    if not is_kernel:
        return NamedSharding(mesh, P())
    shard_out = any(
        key in name
        for key in (
            "in_proj", "to_q", "to_k", "to_v", "mlp_c_fc", "ff_geglu", "ffn1",
            "linear1", "emb_proj",
        )
    )
    shard_in = any(
        key in name
        for key in ("out_proj", "to_out", "mlp_c_proj", "ffn2", "linear2")
    )
    if shard_out and value.shape[1] % mesh.shape["model"] == 0:
        return NamedSharding(mesh, P(None, "model"))
    if shard_in and value.shape[0] % mesh.shape["model"] == 0:
        return NamedSharding(mesh, P("model", None))
    return NamedSharding(mesh, P())


def shard_params(variables, mesh: Mesh):
    """Apply param_sharding_rules across a variables pytree."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    leaves = []
    for path, value in flat:
        keys = tuple(
            getattr(p, "key", getattr(p, "idx", None)) for p in path
        )
        sh = param_sharding_rules(keys, value, mesh)
        leaves.append(jax.device_put(value, sh))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Activation (spatial) sharding — the v5e training-fit lever.
#
# Kernel-only TP leaves batch-1 activations replicated: the flagship B15N4
# train step's 21.4 GiB of temps barely shrink under a 1x4 `model` mesh
# (AOT_FLAGSHIP_TP.json), so it cannot fit 16 GiB v5e chips. Constraining the
# spatial H dim of every SD UNet/VAE block activation to shard over `model`
# makes XLA's SPMD partitioner split the convs spatially (it inserts the halo
# exchanges for the 3x3 windows) and the attention over rows, dividing the
# activation footprint by the axis size. Opt-in via the context manager:
# model code calls shard_spatial() unconditionally; it is a no-op unless a
# mesh has been installed here (and for dims the axis doesn't divide).
#
# Note: Pallas kernels are opaque to the SPMD partitioner (operands would be
# all-gathered around them), so runs that enable this should also force the
# XLA attention path (XMASK3D_FLASH_IMPL=xla); on CPU AOT lowerings the XLA
# path is already the default.

_ACT_SHARD: Dict[str, Any] = {"mesh": None, "axis": "model"}


@contextlib.contextmanager
def activation_sharding(mesh: Optional[Mesh], axis: str = "model"):
    """Enable spatial activation sharding inside the block. Pass mesh=None
    for a no-op (lets callers thread one flag through)."""
    prev = dict(_ACT_SHARD)
    _ACT_SHARD["mesh"], _ACT_SHARD["axis"] = mesh, axis
    try:
        yield
    finally:
        _ACT_SHARD.update(prev)


def shard_spatial(x: jax.Array) -> jax.Array:
    """Constrain dim 1 (H of NHWC / rows of a token grid) of an activation to
    shard over the activation-sharding axis. No-op when disabled, when the
    axis has size 1, or when the dim isn't divisible by the axis size."""
    mesh, axis = _ACT_SHARD["mesh"], _ACT_SHARD["axis"]
    if mesh is None or mesh.shape.get(axis, 1) == 1:
        return x
    n = mesh.shape[axis]
    if x.ndim < 2 or x.shape[1] % n or x.shape[1] < n:
        return x
    spec = P(*([None, axis] + [None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_batch_by_host(global_index: np.ndarray) -> np.ndarray:
    """Select this host's slice of a global sample index (replaces
    DistributedSampler)."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    return global_index[pid::n_proc]
