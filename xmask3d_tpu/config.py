"""Config system: YAML -> attribute dict with CLI `KEY VALUE` overrides.

Equivalent capability to the reference's util/config.py:8-90 (CfgNode,
load_cfg_from_cfg_file, merge_cfg_from_list) but a fresh implementation:
nested sections are flattened one level (like the reference), values are
type-coerced on override, and the result is an immutable-ish attrdict that
is also a plain dict (safe to stash in a dataclass or close over in jit).
"""

from __future__ import annotations

import ast
import copy
from typing import Any, List, Optional

import yaml


class Config(dict):
    """Attribute-accessible dict. Nested dicts are wrapped on access."""

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(value, dict) and not isinstance(value, Config):
            value = Config(value)
            self[name] = value
        return value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return Config(copy.deepcopy(dict(self), memo))

    def clone(self) -> "Config":
        return copy.deepcopy(self)


def load_config(path: str, overrides: Optional[List[str]] = None) -> Config:
    """Load a YAML config, flattening top-level sections one level.

    Mirrors the reference behavior (util/config.py:58-74): a YAML with
    sections like DATA:/Model:/Distributed: is flattened so every leaf key
    is a top-level attribute.
    """
    import os

    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config()
    for key, value in raw.items():
        if isinstance(value, dict):
            for k, v in value.items():
                cfg[k] = v
        else:
            cfg[key] = value
    # large benchmark vocabularies (e.g. ScanNet200) live in side-car data
    # files referenced by `meta_file`, merged under the main config
    if "meta_file" in cfg:
        meta_path = cfg["meta_file"]
        if not os.path.isabs(meta_path):
            meta_path = os.path.join(os.path.dirname(path), meta_path)
        with open(meta_path) as f:
            for k, v in (yaml.safe_load(f) or {}).items():
                cfg[k] = v
    if overrides:
        merge_overrides(cfg, overrides)
    return cfg


def _decode_value(value: str) -> Any:
    """Decode a CLI string into a Python literal when possible."""
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _coerce(new: Any, old: Any, key: str) -> Any:
    """Coerce `new` to the type of `old` for compatible container types."""
    if old is None or type(new) is type(old):
        return new
    casts = [(tuple, list), (list, tuple), (int, float), (float, int)]
    for src, dst in casts:
        if isinstance(new, src) and isinstance(old, dst):
            return dst(new)
    raise ValueError(
        f"type mismatch for key {key}: cannot coerce {type(new)} to {type(old)}"
    )


def merge_overrides(cfg: Config, kv_list: List[str]) -> Config:
    """Apply positional `KEY VALUE KEY VALUE ...` overrides in place."""
    assert len(kv_list) % 2 == 0, f"override list must be even-length: {kv_list}"
    for key, raw in zip(kv_list[0::2], kv_list[1::2]):
        subkeys = key.split(".")
        node = cfg
        for sk in subkeys[:-1]:
            node = getattr(node, sk)
        leaf = subkeys[-1]
        value = _decode_value(raw)
        if leaf in node:
            value = _coerce(value, node[leaf], key)
        node[leaf] = value
    return cfg
