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

# Persistent compilation cache for the suite: the wall time is dominated by
# XLA CPU compiles of the per-shape jit buckets (profiled: one 27 s test
# spends 20.7 s in 4 pjit compiles; a warm frame is 0.04 s). NOTE the env
# var JAX_COMPILATION_CACHE_DIR is silently DEAD on jax 0.9.0 — it must be
# activated via jax.config.update (smh_tpu.jax_cache.enable). Subprocesses
# spawned by tests (dryrun, worker) still see the env var and activate the
# same directory themselves through jax_cache.enable. Editing ops/*.py
# invalidates exactly the touched buckets (the key is the HLO).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_test_cache")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from smh_tpu import jax_cache  # noqa: E402

jax_cache.enable(min_compile_secs=0.2)

REFERENCE_SAMPLES = pathlib.Path("/root/reference/vision-common/samples")


def reference_samples_available() -> bool:
    return REFERENCE_SAMPLES.is_dir()
