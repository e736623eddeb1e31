"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers an 'axon' TPU platform and pins
# jax_platforms to it before conftest runs; re-pin to cpu (backends are lazy,
# so this wins as long as no jax computation ran yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
