"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are
validated on 8 virtual CPU devices instead (the driver separately dry-runs
the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image ignores JAX_PLATFORMS; force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
