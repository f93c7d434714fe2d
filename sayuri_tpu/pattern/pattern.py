"""Spatial pattern features around a candidate move.

Mirrors the reference's pattern hashing (/root/reference/src/pattern/
pattern.cc, src/game/pattern_board.cc): the colored neighborhood of a
candidate vertex within a distance-d diamond, canonicalized over the 8
dihedral symmetries and color inversion so equivalent shapes share one
key. Numpy implementation (pattern training is offline).
"""

from __future__ import annotations

import numpy as np

# diamond (Manhattan-ball) offsets per distance, matching the reference's
# kPointIndex spatial ordering idea (pattern.h:9-17)
def diamond_offsets(dist: int):
    out = []
    for dy in range(-dist, dist + 1):
        for dx in range(-dist, dist + 1):
            if abs(dy) + abs(dx) <= dist and not (dy == 0 and dx == 0):
                out.append((dy, dx))
    return out


_SYMS = [
    lambda y, x: (y, x),
    lambda y, x: (y, -x),
    lambda y, x: (-y, x),
    lambda y, x: (-y, -x),
    lambda y, x: (x, y),
    lambda y, x: (x, -y),
    lambda y, x: (-x, y),
    lambda y, x: (-x, -y),
]

# cell codes: 0 empty, 1 own, 2 opp, 3 off-board
def _cell_code(board: np.ndarray, size: int, y: int, x: int, to_move: int):
    if not (0 <= y < size and 0 <= x < size):
        return 3
    v = int(board[y, x])
    if v == 0:
        return 0
    color = v - 1
    return 1 if color == to_move else 2


def pattern_key(board: np.ndarray, size: int, vertex: int, to_move: int,
                dist: int = 3) -> int:
    """Canonical (min over 8 symmetries) base-4 packed neighborhood key.
    Own/opp relative coding makes the key color-symmetric, matching the
    reference's color-indexed tables (pattern.h)."""
    y0, x0 = divmod(vertex, size)
    offs = diamond_offsets(dist)
    best = None
    for sym in _SYMS:
        key = 0
        for dy, dx in offs:
            sy, sx = sym(dy, dx)
            key = key * 4 + _cell_code(board, size, y0 + sy, x0 + sx, to_move)
        if best is None or key < best:
            best = key
    return (best << 4) | dist


def tactical_features(board: np.ndarray, size: int, vertex: int,
                      to_move: int, last_move: int | None):
    """Small tactical feature set (capture/atari/self-atari/proximity),
    the reference's board feature hashes (board.h:226-233) reduced to the
    load-bearing ones. Returns a list of string feature ids."""
    from sayuri_tpu.game import board as B_
    import jax.numpy as jnp

    feats = []
    y0, x0 = divmod(vertex, size)
    if last_move is not None and last_move >= 0:
        ly, lx = divmod(last_move, size)
        d = abs(ly - y0) + abs(lx - x0)
        if d <= 4:
            feats.append(f"dist_last:{d}")
    # liberties of adjacent chains via the jax helpers (small boards: fine)
    stones = jnp.asarray(board)
    empty = (stones == 0)
    for color, tag in ((to_move, "own"), (1 - to_move, "opp")):
        mask = stones == color + 1
        lbl = B_.chain_labels(mask)
        libs = B_.chain_liberty_map(mask, lbl, empty)
        libs = np.asarray(libs)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            yy, xx = y0 + dy, x0 + dx
            if 0 <= yy < size and 0 <= xx < size and np.asarray(mask)[yy, xx]:
                l = int(libs[yy, xx])
                if l == 1:
                    feats.append(f"{tag}_atari_adjacent")
                elif l == 2:
                    feats.append(f"{tag}_2libs_adjacent")
    return sorted(set(feats))
