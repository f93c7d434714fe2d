"""Dense-array Go board primitives.

TPU-first re-design of the reference board engine
(/root/reference/src/game/board.cc, strings.cc): instead of a letterboxed
array + union-find string lists (board.cc:1345-1484), the board is a plain
``[N, N]`` int8 grid and every rules question is answered with masked
morphological operations:

- string connectivity  -> flood fill = masked-dilation fixpoint (`flood`)
- string identity      -> label propagation to min flat index (`chain_labels`)
- exact liberty counts -> direction-deduped scatter-add over chain labels
                          (`chain_liberty_map`, mirrors the pseudo-liberty-free
                          exact counts of strings.h:8-19)
- captures             -> "reaches empty" reachability (Tromp-Taylor style,
                          board.cc:1526-1616)

All functions operate on ONE board and are designed to be `jax.vmap`-ped;
`lax.while_loop` fixpoints batch correctly (lanes that converge early are
masked by JAX's batching rule). ``size`` is a traced scalar: smaller boards
live in the top-left corner of a fixed ``n x n`` buffer with an on-board mask,
the same mask trick the reference trainer uses for mixed board sizes
(/root/reference/train/torch/network.py:1131-1134).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sayuri_tpu.game.types import EMPTY, C_BLACK, C_WHITE, NO_VERTEX


@functools.lru_cache(maxsize=None)
def _use_pallas() -> bool:
    """True on real TPU backends: board fixpoints run as Pallas kernels
    (on-core loops) instead of XLA while-loops (one launch per ring).
    CPU tests keep the portable XLA path."""
    import os

    if os.environ.get("SAYURI_NO_PALLAS"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


# ---------------------------------------------------------------------------
# masks and shifts
# ---------------------------------------------------------------------------

def board_mask(size, n: int):
    """[n, n] bool: True on playable cells of a size x size board."""
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r < size) & (c < size)


def flat_iota(n: int):
    """[n, n] int32 of flat row-major indices."""
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return r * n + c


def shift(x, dy: int, dx: int, fill):
    """out[y, x] = x[y - dy, x - dx], `fill` outside. Static small shifts."""
    n = x.shape[-1]
    padded = jnp.pad(x, ((1, 1), (1, 1)), constant_values=fill)
    return lax.dynamic_slice(padded, (1 - dy, 1 - dx), (n, n))


def nbr_or(m):
    """bool [n,n] -> True where ANY 4-neighbor is True (self excluded)."""
    return (
        shift(m, 1, 0, False)
        | shift(m, -1, 0, False)
        | shift(m, 0, 1, False)
        | shift(m, 0, -1, False)
    )


def dilate(m):
    return m | nbr_or(m)


# ---------------------------------------------------------------------------
# connectivity
# ---------------------------------------------------------------------------

def _prop_combine(a, b):
    """Associative combine for segmented OR-propagation: each element is
    the function x -> v | (x & p); composition stays in that family."""
    pa, va = a
    pb, vb = b
    return pa & pb, vb | (va & pb)


def _min_combine(a, b):
    """Associative combine for segmented MIN-propagation (labels)."""
    pa, va = a
    pb, vb = b
    big = jnp.iinfo(va.dtype).max
    return pa & pb, jnp.minimum(vb, jnp.where(pb, va, big))


def _sweep_or(m, allowed):
    """One full row+column propagation pass: resolves arbitrarily long
    straight runs in O(log n) depth via segmented scans (vs one ring per
    dilation step)."""
    v = m & allowed
    nd = v.ndim
    for axis in (nd - 1, nd - 2):  # positive axes: reverse=True needs them
        _, v = lax.associative_scan(_prop_combine, (allowed, v), axis=axis)
        _, v = lax.associative_scan(
            _prop_combine, (allowed, v), axis=axis, reverse=True
        )
    return v


def flood(seed, allowed):
    """Grow `seed` within `allowed` via 4-connectivity until fixpoint.

    TPU: one Pallas program with an on-core loop (ops/flood.py).
    CPU/tests: row/column segmented-scan sweeps — fixpoint in O(#bends)
    sweeps (2-3 for typical Go shapes) instead of O(path length)
    dilations."""
    if _use_pallas() and seed.ndim == 2:
        from sayuri_tpu.ops.flood import flood_tpu

        return flood_tpu(seed, allowed)
    seed = seed & allowed

    def body(carry):
        m, _ = carry
        m2 = _sweep_or(m, allowed)
        return m2, jnp.any(m2 != m)

    def cond(carry):
        return carry[1]

    m, _ = lax.while_loop(cond, body, (seed, jnp.array(True)))
    return m


def reach(color_mask, target_mask):
    """Cells of `color_mask` connected (through color_mask) to a cell
    4-adjacent to `target_mask`. Tromp-Taylor 'reach' (board.cc:1526-1616)."""
    return flood(color_mask & nbr_or(target_mask), color_mask)


def chain_labels(stone_mask):
    """Label each chain by the min flat index of its cells; -1 off-chain.

    Replaces the union-find parent array (strings.h:8-19) with min-index
    label propagation: lbl <- min(lbl, neighbor lbl) over same-mask cells.
    """
    if _use_pallas() and stone_mask.ndim == 2:
        from sayuri_tpu.ops.flood import chain_labels_tpu

        return chain_labels_tpu(stone_mask)
    n = stone_mask.shape[-1]
    big = jnp.iinfo(jnp.int32).max
    lbl0 = jnp.where(stone_mask, flat_iota(n), big)

    def sweep(l):
        v = l
        nd = v.ndim
        for axis in (nd - 1, nd - 2):
            _, v = lax.associative_scan(
                _min_combine, (stone_mask, v), axis=axis
            )
            _, v = lax.associative_scan(
                _min_combine, (stone_mask, v), axis=axis, reverse=True
            )
        return jnp.where(stone_mask, v, big)

    def body(carry):
        l, _ = carry
        l2 = sweep(l)
        return l2, jnp.any(l2 != l)

    l, _ = lax.while_loop(lambda c: c[1], body, (lbl0, jnp.array(True)))
    return jnp.where(stone_mask, l, -1)


def _neighbor_labels(labels):
    """[4, n, n] labels of the 4 neighbors (-1 where none)."""
    return jnp.stack(
        [
            shift(labels, 1, 0, -1),
            shift(labels, -1, 0, -1),
            shift(labels, 0, 1, -1),
            shift(labels, 0, -1, -1),
        ]
    )


def _dedup_dir_mask(nbr_lbl):
    """[4, n, n] bool: direction d kept if its label >= 0 and differs from
    all labels at directions d' < d (distinct-neighbor-chain dedup)."""
    keep0 = nbr_lbl[0] >= 0
    keep1 = (nbr_lbl[1] >= 0) & (nbr_lbl[1] != nbr_lbl[0])
    keep2 = (nbr_lbl[2] >= 0) & (nbr_lbl[2] != nbr_lbl[0]) & (nbr_lbl[2] != nbr_lbl[1])
    keep3 = (
        (nbr_lbl[3] >= 0)
        & (nbr_lbl[3] != nbr_lbl[0])
        & (nbr_lbl[3] != nbr_lbl[1])
        & (nbr_lbl[3] != nbr_lbl[2])
    )
    return jnp.stack([keep0, keep1, keep2, keep3])


def chain_liberty_counts(labels, empty):
    """Exact per-chain liberty counts, indexed by chain-root flat index.

    Returns [n*n] int32 where slot r = #distinct empty cells adjacent to the
    chain whose root is r (0 elsewhere). Matches the exact liberty tracking of
    strings.h (no pseudo-liberties)."""
    n = labels.shape[-1]
    nn = n * n
    nbr_lbl = _neighbor_labels(labels)           # chains next to each cell
    nbr_lbl = jnp.where(empty[None], nbr_lbl, -1)  # only liberties count
    keep = _dedup_dir_mask(nbr_lbl)
    idx = jnp.where(keep, nbr_lbl, nn).reshape(4, -1)
    counts = jnp.zeros((nn + 1,), jnp.int32)
    counts = counts.at[idx.reshape(-1)].add(
        keep.reshape(-1).astype(jnp.int32), mode="drop"
    )
    return counts[:nn]


def chain_liberty_map(stone_mask, labels, empty):
    """[n, n] int32: liberty count of the chain each stone belongs to."""
    counts = chain_liberty_counts(labels, empty)
    per_cell = counts[jnp.clip(labels, 0, None).reshape(-1)].reshape(labels.shape)
    return jnp.where(stone_mask, per_cell, 0)


# ---------------------------------------------------------------------------
# move legality and application
# ---------------------------------------------------------------------------

def legal_moves(stones, size, to_move, ko):
    """[n*n] bool pseudo-legal mask (no suicide, respects simple ko).

    A board point is legal iff empty, on-board, not the ko point, and playing
    there leaves the stone with a liberty: it has an empty neighbor, or joins
    an own chain with >= 2 liberties, or captures an adjacent opponent chain
    in atari. Same predicate as Board::IsLegalMove minus superko, which the
    search handles at the root (node.cc:1824-1841) and the self-play env via
    hash history (game_state.h:203)."""
    n = stones.shape[-1]
    mask = board_mask(size, n)
    own_c = to_move + 1
    opp_c = 2 - to_move
    empty = (stones == EMPTY) & mask
    own = (stones == own_c) & mask
    opp = (stones == opp_c) & mask

    lbl_own = chain_labels(own)
    lbl_opp = chain_labels(opp)
    libs_own = chain_liberty_map(own, lbl_own, empty)
    libs_opp = chain_liberty_map(opp, lbl_opp, empty)

    has_empty_nb = nbr_or(empty)
    own_safe_nb = nbr_or(own & (libs_own >= 2))
    opp_cap_nb = nbr_or(opp & (libs_opp == 1))

    legal = empty & (has_empty_nb | own_safe_nb | opp_cap_nb)
    legal = legal.reshape(-1)
    ko_onehot = flat_iota(n).reshape(-1) == ko
    return legal & ~ko_onehot


def play_move(stones, size, color, v):
    """Apply a (assumed-legal) board move; returns
    (new_stones, n_captured int32, new_ko int32).

    Mirrors Board::PlayMoveAssumeLegal/UpdateBoard semantics
    (board.cc:1407-1484): place stone, remove opponent chains left without
    liberties, set the simple-ko vertex when exactly one stone was captured
    by a lone stone that ends in atari."""
    n = stones.shape[-1]
    mask = board_mask(size, n)
    own_c = color + 1
    opp_c = 2 - color

    stones1 = stones.reshape(-1).at[v].set(own_c.astype(stones.dtype)).reshape(n, n)
    empty1 = (stones1 == EMPTY) & mask
    opp1 = (stones1 == opp_c) & mask

    alive_opp = reach(opp1, empty1)
    captured = opp1 & ~alive_opp
    n_cap = jnp.sum(captured, dtype=jnp.int32)
    stones2 = jnp.where(captured, EMPTY, stones1)

    own2 = (stones2 == own_c) & mask
    empty2 = (stones2 == EMPTY) & mask
    v_mask = (flat_iota(n).reshape(-1) == v).reshape(n, n)
    own_group = flood(v_mask, own2)
    group_size = jnp.sum(own_group, dtype=jnp.int32)
    group_libs = jnp.sum(nbr_or(own_group) & empty2, dtype=jnp.int32)

    is_ko = (n_cap == 1) & (group_size == 1) & (group_libs == 1)
    cap_v = jnp.argmax(captured.reshape(-1)).astype(jnp.int32)
    new_ko = jnp.where(is_ko, cap_v, NO_VERTEX)
    return stones2, n_cap, new_ko


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------

def area_ownership(stones, size):
    """[n, n] int32 in {-1, 0, +1}: Tromp-Taylor area ownership.

    +1 black (stone or empty reaching only black), -1 white, 0 dame/neutral.
    Matches Board::ComputeReachColor / ComputeScoreArea (board.cc:1526-1616).
    """
    n = stones.shape[-1]
    mask = board_mask(size, n)
    b = (stones == C_BLACK) & mask
    w = (stones == C_WHITE) & mask
    empty = (stones == EMPTY) & mask
    reach_b = flood(empty & nbr_or(b), empty)
    reach_w = flood(empty & nbr_or(w), empty)
    own = (
        b.astype(jnp.int32)
        - w.astype(jnp.int32)
        + (reach_b & ~reach_w).astype(jnp.int32)
        - (reach_w & ~reach_b).astype(jnp.int32)
    )
    return own


def area_score(stones, size, komi):
    """Black-minus-white Tromp-Taylor score (before sign/result mapping)."""
    return jnp.sum(area_ownership(stones, size), dtype=jnp.float32) - komi


# ---------------------------------------------------------------------------
# zobrist hashing (2 x uint32 lanes ~ the reference's 64-bit keys,
# /root/reference/src/game/zobrist.h:16-26; uint64 is avoided so the engine
# runs without jax_enable_x64)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _zobrist_tables(n: int):
    import numpy as np

    rng = np.random.Generator(np.random.Philox(key=0x5A9E12))
    cells = rng.integers(0, 2**32, size=(2, 3, n * n), dtype=np.uint32)
    cells[:, EMPTY, :] = 0  # empty contributes nothing
    stm = rng.integers(0, 2**32, size=(2, 2), dtype=np.uint32)
    return jnp.asarray(cells), jnp.asarray(stm)


def position_hash(stones, n: int):
    """[2] uint32 board-only hash (superko identity, game_state.h:203).

    Gather-free: XLA lowers fancy gathers to serialized scalar loads on
    TPU, so the per-cell key lookup is a masked select over the two color
    key tables instead."""
    cells, _ = _zobrist_tables(n)
    flat = stones.reshape(-1).astype(jnp.int32)
    k1 = cells[:, C_BLACK, :]  # [2, n*n]
    k2 = cells[:, C_WHITE, :]
    vals = jnp.where(flat[None, :] == C_BLACK, k1, jnp.uint32(0)) ^ jnp.where(
        flat[None, :] == C_WHITE, k2, jnp.uint32(0)
    )
    return lax.reduce(
        vals, jnp.uint32(0), lax.bitwise_xor, dimensions=(1,)
    )


def situation_hash(stones, to_move, n: int):
    """[2] uint32 position + side-to-move hash (NN cache key)."""
    _, stm = _zobrist_tables(n)
    return position_hash(stones, n) ^ stm[:, to_move]
