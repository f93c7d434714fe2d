"""Test config: run everything on a fake 8-device CPU mesh.

Mirrors the project plan's test strategy (SURVEY.md §4): multi-chip sharding
logic is validated on virtual CPU devices, the TPU-native analogue of the
reference's (missing) multi-node tests.

The ambient environment may pre-import jax pointed at a (single, shared)
real TPU via sitecustomize, so mutating os.environ here is too late —
the jax config API is the reliable override.
"""

import os

# XLA:CPU's LLVM pipeline recurses deeply while compiling the big
# interpret-mode Pallas programs; with the default 8 MiB stack this
# segfaults late in the suite (observed in backend_compile_and_load).
# Raise the stack rlimit to the hard limit before jax loads — the main
# thread's stack then grows on demand and compile threads inherit it.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except Exception:
    pass

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
# NOTE: the persistent compilation cache is deliberately NOT enabled for
# the CPU test suite.  XLA:CPU serializes AOT executables pinned to the
# compile host's exact CPU-feature set; deserializing one whose features
# don't match the running host (jax warns "Machine type used for XLA:CPU
# compilation doesn't match ... SIGILL") segfaults the process — observed
# reproducibly even for entries written moments earlier on the same
# machine in this container environment.  Cold compiles are slower but
# never crash; keep the suite lean instead (small nets, shared shapes,
# heavy tests marked `slow`).
