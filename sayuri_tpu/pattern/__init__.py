"""Pattern subsystem: spatial pattern hashing + MM gamma fitting.

Parity port of the reference's legacy pre-NN move-prediction stack
(/root/reference/src/pattern/): 3x3/spatial pattern hashes with 8-fold
symmetry canonicalization, Minorization-Maximization gamma training from
SGF games (Remi Coulom, "Computing Elo Ratings of Move Patterns"), a
gammas dictionary probed by GameState::GetGammasPolicy
(game_state.cc:620), and the policy-mixing hook used by the search
(gammas_policy_factor, parameters.h:35). Host-side Python — this path is
for data generation/analysis, not the hot loop.
"""

from sayuri_tpu.pattern.gammas import GammasDict
from sayuri_tpu.pattern.mm import fit_mm
