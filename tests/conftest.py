"""Test config: run everything on a fake 8-device CPU mesh.

Mirrors the project plan's test strategy (SURVEY.md §4): multi-chip sharding
logic is validated on virtual CPU devices via
--xla_force_host_platform_device_count, the TPU-native analogue of the
reference's (missing) multi-node tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
