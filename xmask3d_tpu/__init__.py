"""xmask3d_tpu — a TPU-native (JAX/XLA/Pallas) open-vocabulary 3D semantic
segmentation framework with the capabilities of XMask3D (NeurIPS 2024).

Built from scratch for TPU: static shapes, functional modules, pjit/shard_map
data+tensor parallelism, Pallas kernels for the hot ops, and a host-side
numpy (later C++) preprocessing pipeline.

Reference capability map: /root/reference (Zifeng-Zhang/XMask3D); see SURVEY.md.
"""

__version__ = "0.1.0"

from xmask3d_tpu.config import Config, load_config  # noqa: F401
