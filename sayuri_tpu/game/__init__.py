"""Vectorized Go rules engine.

TPU-first re-design of the reference game layer (/root/reference/src/game):
boards are dense ``[N, N]`` int8 arrays stepped in lockstep under ``jit``;
union-find string tracking is recast as flood-fill (masked dilation fixpoints)
and label propagation; all per-move logic is branchless array code.
"""

from sayuri_tpu.game.types import BLACK, WHITE, EMPTY, PASS, AREA_RULE, TERRITORY_RULE
from sayuri_tpu.game.state import GoEnv, GoState
