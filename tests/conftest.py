import os
import pathlib
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware. The axon site hook registers the TPU
# backend programmatically (overriding JAX_PLATFORMS from the environment),
# so the platform must be forced through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE_SAMPLES = pathlib.Path("/root/reference/vision-common/samples")


def reference_samples_available() -> bool:
    return REFERENCE_SAMPLES.is_dir()
