"""Root pytest config: force JAX onto virtual CPU devices so the test
suite is hermetic, fast, and can exercise 8-device sharding
(`jax.sharding.Mesh`) without TPU hardware.

Note: the environment pre-sets JAX_PLATFORMS to the TPU platform and the
platform plugin re-asserts it at import, so the env var alone is not
enough -- we must also update jax.config after import. Benchmarks
(bench.py) deliberately do NOT go through this path and run on the real
TPU chip.
"""

import os

_platform = os.environ.get("KISS_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
