import os

# Tests run on a virtual 8-device CPU mesh — the TPU-native answer to testing
# multi-chip sharding without a pod (SURVEY.md §4).
os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may pre-set a TPU platform

# The suite is compile-dominated (tiny-model inits take minutes each);
# the persistent compilation cache makes repeat `make test` runs fast.
# XLA's CPU AOT loader logs a benign machine-feature banner per cache hit
# (pseudo-features like +prefer-no-scatter); keep test output readable.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
from xmask3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(
    os.environ.get("XMASK3D_TEST_CACHE", "/tmp/xmask3d_jax_test_cache")
)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A dev-box site hook may register a TPU-relay PJRT plugin at interpreter
# startup and pin jax_platforms to it via jax.config (which outranks the
# env var) — silently moving "CPU" tests onto a real chip with bf16-matmul
# numerics. Re-pin the config itself so the suite is CPU no matter what
# the interpreter boot did.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
