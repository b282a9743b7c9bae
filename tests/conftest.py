"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (the driver separately
dry-runs the multi-chip path); kernels are tested in Pallas interpret mode.
Env vars must be set before jax initializes its backends, hence this conftest
sets them at import time.
"""

import os

# The environment pins JAX_PLATFORMS=axon (single real TPU via tunnel); tests must
# run on the virtual CPU mesh, so overwrite rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize may have initialized the TPU backend already at
# interpreter startup; force-reset onto CPU.
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge  # noqa: E402

xla_bridge._clear_backends()

assert jax.default_backend() == "cpu", "tests must run on CPU"
assert jax.device_count() == 8, "tests expect the 8-device virtual CPU mesh"
