"""Test configuration: force an 8-virtual-device CPU platform.

Tests must not require TPU hardware; sharding tests exercise the multi-chip
code paths on a virtual host-device mesh exactly as the driver's
``dryrun_multichip`` does.

Note: the environment's sitecustomize imports jax at interpreter startup (to
register the axon TPU plugin), so ``JAX_PLATFORMS`` from the environment is
already baked in — we must override via ``jax.config`` after import, and set
``XLA_FLAGS`` before the (lazy) CPU backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
