"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference (lly00412/MF-NeRF) has no test suite and its kernels require a
physical GPU. Ours run anywhere: we force the CPU backend with 8 virtual
devices so multi-chip sharding paths are exercised without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may pin a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment injects an 'axon' TPU platform plugin that overrides the
# env var; force the CPU backend explicitly so tests are deterministic
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.devices()[0].platform == "cpu"
