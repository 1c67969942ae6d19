"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-host/multi-chip code paths are exercised without a pod slice via
XLA's host-platform device-count flag (SURVEY.md §4 point 3).  Must run
before the first `import jax` anywhere in the test session.
"""

import os

# force CPU: the surrounding environment pins JAX_PLATFORMS=axon (a
# tunneled TPU with slow remote compiles) and its sitecustomize register()
# sets jax_platforms programmatically at interpreter start — unit tests
# must stay local, so override via jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 parity mode: make MXU-path matmuls use full float32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
