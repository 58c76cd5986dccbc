import os
import sys

# Tests always run on CPU with 8 virtual devices so multi-chip sharding logic
# is exercised without TPU hardware.  The image's axon sitecustomize force-
# registers the TPU backend regardless of JAX_PLATFORMS, so the platform is
# pinned via jax.config instead (must happen before any computation).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytrace_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

REFERENCE_ASSETS = "/root/reference/assets"


def reference_asset(name: str) -> str:
    return os.path.join(REFERENCE_ASSETS, name)
