"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets JAX_PLATFORMS=axon
# prevent the axon PJRT plugin from even registering — it opens the (single
# client) TPU tunnel at import, which deadlocks tests against any TPU job
for _v in ("PJRT_LIBRARY_PATH", "_AXON_REGISTERED", "AXON_LOOPBACK_RELAY",
           "PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS"):
    os.environ.pop(_v, None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
