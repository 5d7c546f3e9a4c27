import os

# Tests run on a virtual 8-device CPU mesh — the TPU-native answer to testing
# multi-chip sharding without a pod (SURVEY.md §4).
os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may pre-set a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
