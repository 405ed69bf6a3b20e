"""Test configuration: run the suite on CPU with a virtual 8-device mesh.

Mirrors the reference's test strategy of an ndarray CPU backend for all
tensor tests (e.g. src/ppo.rs:2117-2119): deterministic, no accelerator
needed. Multi-chip sharding logic is exercised against 8 virtual CPU
devices via XLA_FLAGS.
"""

import os

# Force CPU: the ambient environment may set JAX_PLATFORMS=axon (a real
# TPU behind a network tunnel), which would make the unit suite crawl.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The ambient JAX install may prepend the 'axon' TPU platform regardless of
# JAX_PLATFORMS; force the CPU backend explicitly before any device query.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
