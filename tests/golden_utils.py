"""Loaders for the reference implementation's CPU-runnable torch modules.

The reference at /root/reference is plain PyTorch; a few of its modules are
importable as-is, the rest need small dependency stubs (detectron2 / fvcore
are not installed here). The stubs reimplement only the tiny public
utilities the imported code calls (point_sample = grid_sample wrapper,
Conv2d-with-norm, no-op registries) so the REFERENCE code itself runs
unmodified and can serve as the numeric oracle for our JAX ops.

Parent packages are registered in sys.modules with bare __path__ entries so
importing a submodule does NOT execute the real package __init__ (which
pulls in the whole detectron2-dependent training stack).
"""

from __future__ import annotations

import importlib
import importlib.machinery
import sys
import types

REF = "/root/reference"
M2F = REF + "/third_party/Mask2Former"


def _register(name: str, mod: types.ModuleType) -> None:
    """Register a stub in sys.modules WITH a ModuleSpec: a module whose
    __spec__ is missing makes importlib.util.find_spec(name) raise
    ValueError, which breaks unrelated imports that probe for optional
    packages (e.g. transformers probing detectron2)."""
    mod.__spec__ = importlib.machinery.ModuleSpec(
        name, None, is_package=hasattr(mod, "__path__")
    )
    if hasattr(mod, "__path__"):
        mod.__spec__.submodule_search_locations = list(mod.__path__)
    sys.modules[name] = mod


def _pkg(name: str, path: str) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    _register(name, mod)


def install_detectron2_stubs() -> None:
    """Minimal stand-ins for the detectron2/fvcore surface the reference's
    matcher/criterion/decoder modules import. Each function mirrors the
    documented public behavior (detectron2 point_rend.point_features and
    layers.Conv2d)."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    if "detectron2" in sys.modules:
        return

    d2 = types.ModuleType("detectron2")
    d2.__path__ = []

    config = types.ModuleType("detectron2.config")

    def configurable(init=None, *, from_config=None):
        if init is None:
            return lambda f: f
        return init

    config.configurable = configurable

    layers = types.ModuleType("detectron2.layers")

    class Conv2d(nn.Conv2d):
        def __init__(self, *a, norm=None, activation=None, **kw):
            super().__init__(*a, **kw)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = super().forward(x)
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    layers.Conv2d = Conv2d

    class ShapeSpec:
        def __init__(self, channels=None, stride=None, height=None, width=None):
            self.channels = channels
            self.stride = stride
            self.height = height
            self.width = width

    layers.ShapeSpec = ShapeSpec

    def get_norm(norm, out_channels):
        # detectron2.layers.get_norm subset: GN = GroupNorm(32, C)
        if norm == "GN":
            return nn.GroupNorm(32, out_channels)
        if norm in ("", None):
            return None
        raise NotImplementedError(norm)

    layers.get_norm = get_norm

    utils = types.ModuleType("detectron2.utils")
    utils.__path__ = []
    registry_mod = types.ModuleType("detectron2.utils.registry")

    class Registry:
        def __init__(self, name):
            self._name = name

        def register(self, obj=None):
            if obj is None:
                return lambda o: o
            return obj

        def __call__(self, obj=None):
            return self.register(obj)

    registry_mod.Registry = Registry
    comm = types.ModuleType("detectron2.utils.comm")
    comm.get_world_size = lambda: 1

    projects = types.ModuleType("detectron2.projects")
    projects.__path__ = []
    point_rend = types.ModuleType("detectron2.projects.point_rend")
    point_rend.__path__ = []
    point_features = types.ModuleType(
        "detectron2.projects.point_rend.point_features"
    )

    def point_sample(input, point_coords, **kwargs):
        # detectron2's point_sample: grid_sample at 2*coords-1
        add_dim = False
        if point_coords.dim() == 3:
            add_dim = True
            point_coords = point_coords.unsqueeze(2)
        output = F.grid_sample(input, 2.0 * point_coords - 1.0, **kwargs)
        if add_dim:
            output = output.squeeze(3)
        return output

    def get_uncertain_point_coords_with_randomness(
        coarse_logits, uncertainty_func, num_points, oversample_ratio,
        importance_sample_ratio,
    ):
        num_boxes = coarse_logits.shape[0]
        num_sampled = int(num_points * oversample_ratio)
        point_coords = torch.rand(num_boxes, num_sampled, 2,
                                  device=coarse_logits.device)
        point_logits = point_sample(coarse_logits, point_coords,
                                    align_corners=False)
        point_uncertainties = uncertainty_func(point_logits)
        num_uncertain_points = int(importance_sample_ratio * num_points)
        num_random_points = num_points - num_uncertain_points
        idx = torch.topk(point_uncertainties[:, 0, :], k=num_uncertain_points,
                         dim=1)[1]
        shift = num_sampled * torch.arange(num_boxes, dtype=torch.long,
                                           device=coarse_logits.device)
        idx += shift[:, None]
        point_coords = point_coords.view(-1, 2)[idx.view(-1), :].view(
            num_boxes, num_uncertain_points, 2
        )
        if num_random_points > 0:
            point_coords = torch.cat(
                [point_coords,
                 torch.rand(num_boxes, num_random_points, 2,
                            device=coarse_logits.device)],
                dim=1,
            )
        return point_coords

    point_features.point_sample = point_sample
    point_features.get_uncertain_point_coords_with_randomness = (
        get_uncertain_point_coords_with_randomness
    )

    modeling = types.ModuleType("detectron2.modeling")
    modeling.__path__ = []

    class _Registry2(Registry):
        pass

    modeling.SEM_SEG_HEADS_REGISTRY = _Registry2("SEM_SEG_HEADS")

    fvcore = types.ModuleType("fvcore")
    fvcore.__path__ = []
    fv_nn = types.ModuleType("fvcore.nn")
    fv_nn.__path__ = []
    weight_init = types.ModuleType("fvcore.nn.weight_init")
    weight_init.c2_xavier_fill = lambda m: nn.init.xavier_uniform_(m.weight)
    weight_init.c2_msra_fill = lambda m: nn.init.kaiming_normal_(m.weight)
    fv_nn.weight_init = weight_init

    for name, mod in [
        ("detectron2", d2),
        ("detectron2.modeling", modeling),
        ("detectron2.config", config),
        ("detectron2.layers", layers),
        ("detectron2.utils", utils),
        ("detectron2.utils.registry", registry_mod),
        ("detectron2.utils.comm", comm),
        ("detectron2.projects", projects),
        ("detectron2.projects.point_rend", point_rend),
        ("detectron2.projects.point_rend.point_features", point_features),
        ("fvcore", fvcore),
        ("fvcore.nn", fv_nn),
        ("fvcore.nn.weight_init", weight_init),
    ]:
        _register(name, mod)


def install_m2f_misc_stub() -> None:
    """Stub for mask2former.utils.misc (the real file imports torchvision,
    absent here). Only the two names the vendored criterion.py uses; for
    same-shaped mask lists `nested_tensor_from_tensor_list` reduces to a
    stack with an all-False padding mask (detr util/misc.py semantics)."""
    name = "mask2former.utils.misc"
    if name in sys.modules:
        return
    import torch

    _pkg("mask2former", M2F + "/mask2former")
    _pkg("mask2former.utils", M2F + "/mask2former/utils")

    class _Nested:
        def __init__(self, tensors, mask):
            self.tensors = tensors
            self.mask = mask

        def decompose(self):
            return self.tensors, self.mask

    def nested_tensor_from_tensor_list(tensor_list):
        assert len({tuple(t.shape) for t in tensor_list}) == 1, (
            "stub only supports same-shape mask lists"
        )
        tensors = torch.stack(list(tensor_list))
        mask = torch.zeros(
            (tensors.shape[0],) + tensors.shape[2:], dtype=torch.bool
        )
        return _Nested(tensors, mask)

    mod = types.ModuleType(name)
    mod.is_dist_avail_and_initialized = lambda: False
    mod.nested_tensor_from_tensor_list = nested_tensor_from_tensor_list
    _register(name, mod)


def load_ref_classes(relpath: str, class_names, extra_globals=None):
    """Exec selected top-level class definitions from a reference source
    file, UNMODIFIED, into a fresh namespace.

    Lets reference classes whose module has un-stubbable import chains
    (e.g. ldm.py pulling the whole stable-diffusion package, odise.py
    pulling maskformer_model) serve as numeric oracles: the class bodies
    run verbatim; only the names they reference are supplied via
    `extra_globals`. Returns the namespace dict.
    """
    import ast

    import numpy as np
    import torch
    import torch.nn.functional as F
    from torch import nn

    path = relpath if relpath.startswith("/") else f"{REF}/{relpath}"
    with open(path) as f:
        src = f.read()
    tree = ast.parse(src)
    lines = src.splitlines(keepends=True)
    ns = {
        "torch": torch, "nn": nn, "F": F, "np": np,
        "logging": __import__("logging"),
        "Optional": __import__("typing").Optional,
        "List": __import__("typing").List,
        "Tuple": __import__("typing").Tuple,
    }
    if extra_globals:
        ns.update(extra_globals)
    found = set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name in set(class_names):
            block = "".join(lines[node.lineno - 1 : node.end_lineno])
            exec(compile(block, path, "exec"), ns)
            found.add(node.name)
    missing = set(class_names) - found
    assert not missing, f"classes not found in {path}: {missing}"
    return ns


def exec_ref_block(relpath: str, start_marker: str, end_marker: str, ns: dict):
    """Execute a contiguous statement block of a reference source file,
    UNMODIFIED, inside `ns`.

    For oracle code that lives inside a function body and cannot be imported
    (e.g. the multi-view ensemble + routing block of run/infer.py:484-648,
    which sits inside `validate`). The block is located by its first and last
    line's stripped source text (robust to line-number drift), the common
    leading indentation is removed, and the statements run verbatim against
    the variables prepared in `ns`.
    """
    import textwrap

    path = relpath if relpath.startswith("/") else f"{REF}/{relpath}"
    with open(path) as f:
        lines = f.read().splitlines(keepends=True)
    start = end = None
    for i, line in enumerate(lines):
        s = line.strip()
        if start is None and s == start_marker:
            start = i
        elif start is not None and s == end_marker:
            end = i
            break
    assert start is not None and end is not None, (
        f"markers not found in {path}: {start_marker!r} .. {end_marker!r}"
    )
    block = textwrap.dedent("".join(lines[start : end + 1]))
    exec(compile(block, f"{path}:{start + 1}", "exec"), ns)
    return ns


def load_ref_module(dotted: str):
    """Import a reference module without executing real package __init__s.

    dotted: e.g. 'mask2former.modeling.matcher' (rooted at Mask2Former) or
    'dataset.voxelization_utils' / 'models.utils.fusion_util' (rooted at
    the reference repo).
    """
    install_detectron2_stubs()
    # py3.12 compat for the reference's `from collections import Sequence`
    import collections
    import collections.abc

    if not hasattr(collections, "Sequence"):
        collections.Sequence = collections.abc.Sequence

    parts = dotted.split(".")
    root = M2F if parts[0] == "mask2former" else REF
    # register bare parent packages pointing into the reference tree
    path = root
    for i, p in enumerate(parts[:-1]):
        path = path + "/" + p
        _pkg(".".join(parts[: i + 1]), path)
    return importlib.import_module(dotted)
