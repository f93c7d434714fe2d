"""Constants for the vectorized Go engine.

Semantics follow the reference's type definitions
(/root/reference/src/game/types.h:30-97) but the encodings are chosen for
dense array code: colors are 0/1 so ``opp = 1 - c``; cell contents are a
separate small enum so boards pack into int8; vertices are flat row-major
indices (no letterbox padding — off-board handling is done with masks,
matching the mask-based variable-board-size design of the reference trainer,
/root/reference/train/torch/network.py:1131-1134).
"""

# --- colors (players) ---
BLACK = 0
WHITE = 1

# --- cell contents (int8 board values) ---
EMPTY = 0
C_BLACK = 1  # stone of BLACK
C_WHITE = 2  # stone of WHITE


def stone_of(color):
    """Player color (0/1) -> cell content value (1/2)."""
    return color + 1


# --- actions ---
# Flat vertex v = y * size + x in [0, size*size); PASS is the extra action.
# (The engine also accepts RESIGN at the front-end level; the array env only
# models board actions + pass, as resign never reaches the board:
# /root/reference/src/game/game_state.cc PlayMove handles kResign before board.)
def pass_action(num_intersections: int) -> int:
    return num_intersections


PASS = -1          # sentinel used in "last move vertex" fields
NO_VERTEX = -1     # sentinel for "no ko", "no move"

# --- scoring rules (reference types.h:70-82 ScoringRuleType) ---
AREA_RULE = 0        # Tromp-Taylor / Chinese-like area scoring
TERRITORY_RULE = 1   # Japanese-like territory scoring

# --- limits ---
MAX_BOARD_SIZE = 19
DEFAULT_BOARD_SIZE = 19
# Longest supported game in move records / superko rings: the reference bounds
# games at ~3 * intersections in practice; 2 * N^2 + margin is ample for data.
def max_game_len(size: int) -> int:
    return 2 * size * size + 32
