"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container's ``sitecustomize`` imports jax at interpreter start and the
environment pins ``JAX_PLATFORMS=axon`` (the real TPU).  Tests must run on
CPU with 8 fake devices, and backends have not been initialized yet when
conftest loads, so overriding via ``jax.config`` (not just the env) is both
necessary and sufficient.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:  # pragma: no cover
    pass
