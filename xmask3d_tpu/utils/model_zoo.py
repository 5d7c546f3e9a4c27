"""Model-zoo path resolution.

Capability parity with the reference's odise:// and sd:// PathHandlers
(models/utils/file_io.py:1-81): URL-style checkpoint names resolve to local
cache paths (env XMASK3D_MODEL_ZOO, default ~/.cache/xmask3d_tpu). Zero
egress here — resolution never downloads; it reports the expected cache
location for pre-staged files.
"""

from __future__ import annotations

import os
from typing import Dict

_SD_FILES: Dict[str, str] = {
    "sd://v1-3": "sd-v1-3.ckpt",
    "sd://v1-4": "sd-v1-4.ckpt",
    "sd://v1-5": "sd-v1-5.ckpt",
}

_ODISE_FILES: Dict[str, str] = {
    "odise://b15n4": "b15n4.pth.tar",
    "odise://b12n7": "b12n7.pth.tar",
    "odise://b10n9": "b10n9.pth.tar",
    "odise://b170n30": "b170n30.pth.tar",
    "odise://b150n50": "b150n50.pth.tar",
}


def cache_dir() -> str:
    return os.environ.get(
        "XMASK3D_MODEL_ZOO",
        os.path.join(os.path.expanduser("~"), ".cache", "xmask3d_tpu"),
    )


def resolve(path: str) -> str:
    """Resolve sd:// and odise:// URLs to local cache paths; pass through
    plain filesystem paths."""
    table = {**_SD_FILES, **_ODISE_FILES}
    if path in table:
        local = os.path.join(cache_dir(), table[path])
        if not os.path.exists(local):
            raise FileNotFoundError(
                f"{path} resolves to {local}; stage the file there "
                f"(this environment has no network egress)"
            )
        return local
    return path
