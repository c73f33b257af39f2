"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in this environment; multi-chip sharding is
validated on XLA's host-platform virtual devices (same compiled collectives).

Note: this container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so the platform must be overridden via jax.config (env
edits are too late).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# the refcompat harness runs the UPSTREAM suite via its own runner;
# tests/tpu is the real-hardware leg (own process, no CPU override):
#   python -m pytest tests/tpu -q        (ci/run_tests.sh runs it when a
#                                         TPU is present and idle)
collect_ignore = ["refcompat", "tpu"]
