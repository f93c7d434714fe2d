"""Pallas TPU kernels for the rules-engine hot ops.

XLA executes each `lax.while_loop` iteration as separate device kernels, so
board fixpoints (flood fill, label propagation) pay ~10-30us per ring even
though the data is tiny. Inside a Pallas kernel the same loop runs on-core
with the board resident in VMEM — one launch per batch. These kernels are
drop-in backends for sayuri_tpu.game.board's `flood` / `chain_labels`; the
pure-XLA paths remain as CPU/test fallbacks.
"""
