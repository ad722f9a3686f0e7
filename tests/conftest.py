"""Test configuration: force an 8-virtual-device CPU platform.

Tests must not require TPU hardware; sharding tests exercise the multi-chip
code paths on a virtual host-device mesh exactly as the driver's
``dryrun_multichip`` does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
