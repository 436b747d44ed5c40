"""Test harness config: run everything on a virtual 8-device CPU mesh.

Pallas kernels auto-detect the CPU backend and run in interpreter mode (the
race-free reference executor — the analog of the reference's CPU scalar simulator
path, ``cpp_simulate.cc``); sharding tests get 8 fake devices.  Must run before
the first ``import jax``.
"""

import os

# The environment pins JAX_PLATFORMS to the real-TPU tunnel backend; tests must
# run on the virtual CPU mesh, so force-override (not setdefault).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The TPU-tunnel sitecustomize force-sets jax_platforms programmatically, which
# trumps the env var — override it back after import, before any backend init.
jax.config.update("jax_platforms", "cpu")

