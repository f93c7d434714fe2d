"""sayuri-tpu: a TPU-native AlphaZero Go framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference engine CGLemon/Sayuri (GTP Go engine + AlphaZero self-play learning
system), re-designed accelerator-first:

- ``sayuri_tpu.game``     — vectorized Go rules engine (batched boards under jit)
- ``sayuri_tpu.models``   — masked policy/value ResNet (flax) + encoder
- ``sayuri_tpu.mcts``     — array-based batched MCTS (PUCT + Gumbel root)
- ``sayuri_tpu.selfplay`` — vectorized self-play actor + training-data emit
- ``sayuri_tpu.train``    — pjit data-parallel learner (full Sayuri loss)
- ``sayuri_tpu.parallel`` — mesh/sharding utilities (ICI/DCN layouts)
- ``sayuri_tpu.gtp``      — GTP v2 front-end
- ``sayuri_tpu.native``   — C++ host-side runtime (data chunk codec, SGF)
"""

__version__ = "0.1.0"
