"""Test config: run everything on a fake 8-device CPU mesh.

Mirrors the project plan's test strategy (SURVEY.md §4): multi-chip sharding
logic is validated on virtual CPU devices, the TPU-native analogue of the
reference's (missing) multi-node tests.

The ambient environment may pre-import jax pointed at a (single, shared)
real TPU via sitecustomize, so mutating os.environ here is too late —
the jax config API is the reliable override.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above covers older jax

# Persistent compilation cache: the suite's cost is dominated by XLA
# compiles of the jitted search/env/net programs, which are identical
# across runs. Caching them makes repeat runs ~10x faster (cold runs
# still pay the compile once).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".cache", "jax")
try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
