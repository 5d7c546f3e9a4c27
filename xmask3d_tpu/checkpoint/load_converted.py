"""Load a converted-npz weight bundle (scripts/convert_checkpoints.py) into
model variables — the deployment-side counterpart of the reference's
XMask3dCheckpointer.load (odise_checkpointer.py:132-160)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from xmask3d_tpu.checkpoint.convert_torch import apply_flat_updates


def load_converted_npz(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    data = np.load(path)
    params, stats = {}, {}
    for k in data.files:
        if k.startswith("params/"):
            params[k[len("params/"):]] = data[k]
        elif k.startswith("batch_stats/"):
            stats[k[len("batch_stats/"):]] = data[k]
    return params, stats


def apply_converted(variables, path: str, strict: bool = False):
    """Write converted weights into a variables pytree in place.

    strict=False skips converted tensors with no destination (e.g. aux
    layers beyond the configured depth); shape mismatches always raise.
    Returns (variables, applied_param_names, applied_stat_names).
    """
    params, stats = load_converted_npz(path)
    applied_p = apply_flat_updates(variables["params"], params, strict=strict)
    applied_s = apply_flat_updates(
        variables.get("batch_stats", {}), stats, strict=strict
    )
    return variables, applied_p, applied_s
