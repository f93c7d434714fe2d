"""Exact ladder-reading kernel (bitboard AND-OR search).

The reference reads ladders with a recursive hunter/prey minimax over an
incrementally-updated board (/root/reference/src/game/board.cc:520-821):
``PreyMove``/``HunterMove`` alternate; each side enumerates its candidate
moves (``PreySelections``: the escape liberty plus every capture of an
adjacent hunter chain in atari, legality-filtered, board.cc:519-573;
``HunterSelections``: the prey's two liberties with pliberty pruning and
the adjacent-liberties special case, board.cc:575-644) and the board is
FORKED only at multi-selection points (``next_fork = selections > 1``,
board.cc:683-688). The prey wins if ANY of its options wins; the hunter
wins if ANY of its options wins. A shared node budget (kMaxLadderNodes =
2000, types.h:68) unwinds the whole search as good-for-prey when hit
(board.cc:655-658).

This module re-derives that search as an ITERATIVE depth-first loop over
lockstep bitboard lanes so it runs under jit on TPU:

- boards are uint32 bitboards laid out [ROWS, lanes]: row r of lane l's
  board is the 32-bit word at [r, l]; north/south are sublane rolls,
  east/west are bit shifts — a flood-fill iteration is ~10 VPU ops.
- every chase is one lane (one per candidate chain x first-hunter
  branch); all lanes of a batch step in lockstep inside one launch,
  per-lane convergence masked.
- the reference's recursion becomes an explicit per-lane FORK STACK in
  VMEM: frames hold the board snapshot + the untried alternative moves,
  pushed only at multi-selection points (exactly the reference's
  ``next_fork`` rule). One loop iteration either DESCENDS one ply (apply
  the pending move, compute the opposite side's selections/terminals) or
  RETURNS one frame (propagate a subtree result, try the next
  alternative or pop). The prey chain itself is NOT stored per frame: it
  is re-derived by flooding the (static) candidate root through the
  restored own-stones board.

The same search body runs two ways: as a Pallas TPU kernel
(``run_chases``, `pltpu.roll` for row shifts, where-scan stack access)
and as plain XLA (``run_chases_xla``, `jnp.roll`, gather/scatter stack
access) for CPU hosts and differential tests. Both are validated
chain-by-chain against the recursive oracle port in
tests/ladder_oracle.py on golden games.

Documented deviations from board.cc (all budget-shaped, not logic-shaped):
- the 2000-node budget is per candidate lane; the reference shares one
  budget across the two first-hunter branches of a 2-liberty candidate
  (board.cc:801-813). Differs only when the budget is hit (exotic
  positions), where both report good-for-prey anyway.
- the fork stack holds MAX_FORKS frames; overflow reads as the budget
  cap (good-for-prey). The deepest fork stack over every golden game is
  27 (pliberty pruning keeps clean ladders fork-free), so 56 has 2x
  headroom. Chain-liberty floods run to convergence (exact for snake
  chains of any length).
- prey capture moves peel at most 4 adjacent hunter chains that pass the
  cannot-be-atari pre-filter; with >4 simultaneously capturable chains
  the extras are dropped, matching the 5-selection slot layout
  (escape + MAX_ALTS alternatives).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this to run the kernel on CPU

ROWS = 32          # padded row count (board size <= 19 < 32)
MAX_FORKS = 56     # fork-stack frames per lane (observed golden max: 27)
MAX_ALTS = 4       # stored alternatives per frame (<= 5 selections)
NODE_CAP = 2000    # kMaxLadderNodes (types.h:68)
BIGI = 10**9

# chase results (game/ladder.py values)
UNDECIDED = 0
PREY_GOOD = 1
HUNTER_GOOD = 2

# DFS modes
DESCEND = 0
RETURN = 1


def _rows_iota(shape):
    return lax.broadcasted_iota(jnp.int32, shape, 0)


def _nbr(roll, b, colmask):
    """OR of the 4 neighbors (center excluded) on [32, C] bitboards.
    `colmask` zeroes bits >= board size (east shifts spill into them)."""
    e = (b << 1) & colmask
    w = b >> 1
    s = roll(b, 1)            # row r <- row r-1
    n_ = roll(b, ROWS - 1)    # row r <- row r+1
    return e | w | s | n_


def _flood(roll, seed, allowed, colmask, iters):
    """Grow seed within allowed for `iters` dilations. `allowed` must
    already be masked to the board region (its AND enforces row bounds)."""
    def body(_, x):
        return (x | _nbr(roll, x, colmask)) & allowed

    return lax.fori_loop(0, iters, body, seed & allowed)


def _flood_conv(roll, seed, allowed, colmask):
    """Flood to convergence (adaptive: stops when no lane grows)."""
    def body(carry):
        x, _ = carry
        x2 = (x | _nbr(roll, x, colmask)) & allowed
        return x2, jnp.all(x2 == x)

    def cond(carry):
        return ~carry[1]

    x, _ = lax.while_loop(cond, body, (seed & allowed, jnp.bool_(False)))
    return x


def _popcount(b):
    """[1, C] int32 total bits per lane."""
    return jnp.sum(
        lax.population_count(b).astype(jnp.int32), axis=0, keepdims=True
    )


def _lowest_vertex(b, n):
    """[1, C] int32: smallest flat vertex (row * n + bit) set in each lane,
    BIGI when the lane is empty."""
    low = b & (jnp.uint32(0) - b)              # isolate lowest bit per word
    pos = lax.population_count(low - jnp.uint32(1)).astype(jnp.int32)
    rows = _rows_iota(b.shape)
    vert = jnp.where(b != 0, rows * n + pos, BIGI)
    return jnp.min(vert, axis=0, keepdims=True)


def _vertex_bit(v, shape, n):
    """[32, C] uint32 one-hot bitboard of flat vertex `v` ([1, C] int32);
    v < 0 or v >= n*n (or BIGI) -> all zeros."""
    rows = _rows_iota(shape)
    r = v // n
    c = jnp.clip(v - r * n, 0, 31)
    bit = jnp.uint32(1) << c.astype(jnp.uint32)
    return jnp.where((rows == r) & (v >= 0) & (v < n * n), bit,
                     jnp.uint32(0))


def _dir_seeds(roll, bit, colmask):
    """The 4 single-bit neighbors of a one-hot board (E, W, S, N)."""
    return (
        (bit << 1) & colmask,
        bit >> 1,
        roll(bit, 1),
        roll(bit, ROWS - 1),
    )


def _chain_queries(roll, vbit, stones_own, stones_opp, empty, colmask):
    """Liberty/atari info of the <=4 own and <=4 opp chains adjacent to a
    vertex (GetLadderLiberties semantics, board.cc:483-517), for BOTH
    colors at once so one call answers own-side bounds AND opp-side
    legality.

    Returns dict of per-lane [1, C] int32/bool:
      conn       sum over distinct own neighbor chains of (libs - 1)
      maxconn    max over them of (libs - 1)
      own_safe   any own neighbor chain with >= 2 libs
      own_atari  any own neighbor chain with exactly 1 lib
      ncaps      count of distinct opp neighbor chains in atari
      potential  total stones of those atari chains
      opp_safe   any opp neighbor chain with >= 2 libs
    """
    zero_i = jnp.zeros((1, vbit.shape[1]), jnp.int32)
    conn = zero_i
    maxconn = zero_i
    own_safe = zero_i > 1
    own_atari = zero_i > 1
    opp_safe = zero_i > 1
    ncaps = zero_i
    potential = zero_i
    own_prev = jnp.zeros_like(vbit)
    opp_prev = jnp.zeros_like(vbit)

    for seed in _dir_seeds(roll, vbit, colmask):
        # own-color chain in this direction
        so = seed & stones_own
        dup_o = _popcount(so & own_prev) > 0
        ch_o = _flood_conv(roll, so, stones_own, colmask)
        libs_o = _popcount(_nbr(roll, ch_o, colmask) & empty)
        has_o = (_popcount(so) > 0) & ~dup_o
        conn = conn + jnp.where(has_o, libs_o - 1, 0)
        maxconn = jnp.maximum(maxconn, jnp.where(has_o, libs_o - 1, 0))
        own_safe = own_safe | (has_o & (libs_o >= 2))
        own_atari = own_atari | (has_o & (libs_o == 1))
        own_prev = own_prev | ch_o

        # opp-color chain in this direction
        sp = seed & stones_opp
        dup_p = _popcount(sp & opp_prev) > 0
        ch_p = _flood_conv(roll, sp, stones_opp, colmask)
        libs_p = _popcount(_nbr(roll, ch_p, colmask) & empty)
        has_p = (_popcount(sp) > 0) & ~dup_p
        atari_p = has_p & (libs_p == 1)
        ncaps = ncaps + atari_p.astype(jnp.int32)
        potential = potential + jnp.where(atari_p, _popcount(ch_p), 0)
        opp_safe = opp_safe | (has_p & (libs_p >= 2))
        opp_prev = opp_prev | ch_p

    return dict(
        conn=conn,
        maxconn=maxconn,
        own_safe=own_safe,
        own_atari=own_atari,
        ncaps=ncaps,
        potential=potential,
        opp_safe=opp_safe,
    )


def _adjacent_atari_union(roll, bit, stones, empty, colmask):
    """Union bitboard of `stones` chains adjacent to one-hot `bit` that
    have exactly 1 liberty (playing `bit` captures them)."""
    prev = jnp.zeros_like(bit)
    atari_union = jnp.zeros_like(bit)
    for seed in _dir_seeds(roll, bit, colmask):
        s = seed & stones
        dup = _popcount(s & prev) > 0
        ch = _flood_conv(roll, s, stones, colmask)
        libs = _popcount(_nbr(roll, ch, colmask) & empty)
        has = (_popcount(s) > 0) & ~dup
        atari = has & (libs == 1)
        atari_union = atari_union | jnp.where(atari, ch, jnp.uint32(0))
        prev = prev | ch
    return atari_union


def _place_stone(roll, bit, mover_stones, other_stones, empty, colmask, n):
    """Play a stone at one-hot `bit` for the mover (PlayMoveAssumeLegal):
    returns (mover2, other2, new_ko [1,C] int32) with exact captures of
    adjacent 1-liberty `other` chains and simple-ko detection
    (UpdateBoard, board.cc:1407-1465: captured exactly one stone while
    every orthogonal neighbor of the move was opponent-or-border)."""
    captured = _adjacent_atari_union(roll, bit, other_stones, empty, colmask)
    mover2 = mover_stones | bit
    other2 = other_stones & ~captured
    empty2 = (empty & ~bit) | (captured & ~bit)
    ncap = _popcount(captured)
    grp_single = _popcount(bit & _nbr(roll, mover2 & ~bit, colmask)) == 0
    mlibs = _popcount(_nbr(roll, bit, colmask) & empty2)
    ko = jnp.where(
        (ncap == 1) & grp_single & (mlibs == 1),
        _lowest_vertex(captured, n),
        -1,
    )
    return mover2, other2, ko


# ---- per-lane fork-stack access --------------------------------------
# Two implementations of "read/write stack level sp_idx[lane] of lane":
# a where-scan over all MAX_FORKS frames (vectorizes cleanly on the TPU
# VPU, no gathers — used inside the Pallas kernel) and a gather/scatter
# along the frame axis (O(1) in MAX_FORKS — used on the XLA/CPU path).


def _bsel(c, a, b):
    """Boolean select (c ? a : b) for i1 vectors. jnp.where on boolean
    operands lowers to an i8->i1 arith.trunci that Mosaic rejects
    ("Unsupported target bitwidth for truncation"); masked OR is native."""
    return (c & a) | (~c & b)


def _stack_read_scan(st, sp_idx, f_iota):
    """Where-scan read of stack level `sp_idx` ([1, C]) from st [F, ...].

    `sel` is one-hot along F, so a sum IS the select. Mosaic has no
    unsigned reductions, so uint32 rides through int32 (same-width int
    converts are modular, i.e. bit-exact both ways)."""
    sel = f_iota == sp_idx[None]
    if st.dtype == jnp.uint32:
        picked = jnp.where(sel, st.astype(jnp.int32), 0)
        return jnp.sum(picked, axis=0).astype(jnp.uint32)
    return jnp.sum(jnp.where(sel, st, 0), axis=0)


def _stack_write_scan(st, sp_idx, f_iota, value, do_write):
    sel = (f_iota == sp_idx[None]) & do_write[None]
    return jnp.where(sel, value[None], st)


def _stack_read_gather(st, sp_idx, f_iota):
    del f_iota
    idx = jnp.clip(sp_idx, 0, st.shape[0] - 1)          # [1, C]
    idxb = jnp.broadcast_to(idx[:, None, :], (1,) + st.shape[1:])
    return jnp.take_along_axis(st, idxb, axis=0)[0]


def _stack_write_gather(st, sp_idx, f_iota, value, do_write):
    del f_iota
    idx = jnp.clip(sp_idx, 0, st.shape[0] - 1)
    idxb = jnp.broadcast_to(idx[:, None, :], (1,) + st.shape[1:])
    cur = jnp.take_along_axis(st, idxb, axis=0)[0]
    new = jnp.where(jnp.broadcast_to(do_write, cur.shape), value, cur)
    return jnp.put_along_axis(st, idxb, new[None], axis=0, inplace=False)


def _step_select(roll, n, shape, colmask, full, prey_bit,
                 s_own, s_opp, s_prey, s_ko, pend_v, pend_prey):
    """One ply of the hunter/prey machine, shared by the DFS and greedy
    passes: apply the pending move, then compute the NEXT side's
    selections and terminal test (PreySelections board.cc:519-573,
    HunterSelections board.cc:575-644). Returns a dict with the updated
    boards and the selection slots."""
    zero_i = jnp.zeros(s_ko.shape, jnp.int32)
    false_b = zero_i > 0

    has_move = pend_v >= 0
    mbit = _vertex_bit(pend_v, shape, n)
    empty = full & ~s_own & ~s_opp
    mover = jnp.where(pend_prey, s_own, s_opp)
    other = jnp.where(pend_prey, s_opp, s_own)
    mover2, other2, ko_new = _place_stone(
        roll, mbit, mover, other, empty, colmask, n
    )
    own1 = jnp.where(has_move, jnp.where(pend_prey, mover2, other2), s_own)
    opp1 = jnp.where(has_move, jnp.where(pend_prey, other2, mover2), s_opp)
    ko1 = jnp.where(has_move, ko_new, s_ko)
    prey1 = _flood_conv(roll, s_prey & own1, own1, colmask)
    empty1 = full & ~own1 & ~opp1

    selector_prey = ~pend_prey         # prey selects after hunter move
    think_ko = has_move & selector_prey

    prey_libs = _nbr(roll, prey1, colmask) & empty1
    nlibs = _popcount(prey_libs)
    l1 = _lowest_vertex(prey_libs, n)
    l1bit = _vertex_bit(l1, shape, n)
    l2 = _lowest_vertex(prey_libs & ~l1bit, n)
    l2bit = _vertex_bit(l2, shape, n)

    q1 = _chain_queries(roll, l1bit, own1, opp1, empty1, colmask)
    q2 = _chain_queries(roll, l2bit, own1, opp1, empty1, colmask)
    p1 = _popcount(_nbr(roll, l1bit, colmask) & empty1)
    p2 = _popcount(_nbr(roll, l2bit, colmask) & empty1)

    # ---- PreySelections (board.cc:519-573) ----
    escape_legal = (
        (nlibs == 1)
        & (l1 != ko1)
        & ((p1 > 0) | q1["own_safe"] | (q1["ncaps"] > 0))
    )
    # capture-gaining moves: peel <=4 hunter chains in atari adjacent
    # to the prey (FindStringLibertiesGainingCaptures, board.cc:451-479).
    # Pre-filter: a chain containing a stone with >=2 empty neighbors
    # has >=2 liberties and cannot be in atari, so one flood from all
    # such stones removes nearly every safe chain — the 4 peel slots
    # then go to genuine atari candidates (a merged prey group can
    # border many hunter chains; without the filter the lowest-vertex
    # peel order wastes slots on safe chains).
    eE = (empty1 << 1) & colmask
    eW = empty1 >> 1
    eS = roll(empty1, 1)
    eN = roll(empty1, ROWS - 1)
    two_empty = (
        (eE & eW) | (eE & eS) | (eE & eN)
        | (eW & eS) | (eW & eN) | (eS & eN)
    )
    not_atari = _flood_conv(roll, two_empty & opp1, opp1, colmask)
    A = _nbr(roll, prey1, colmask) & opp1 & ~not_atari
    cap_vs = []
    for _ in range(4):
        v0 = _lowest_vertex(A, n)
        sbit = _vertex_bit(v0, shape, n)
        ch = _flood_conv(roll, sbit, opp1, colmask)
        libs_mask = _nbr(roll, ch, colmask) & empty1
        is_atari = (v0 < BIGI) & (_popcount(libs_mask) == 1)
        cap_vs.append(
            jnp.where(is_atari, _lowest_vertex(libs_mask, n), BIGI)
        )
        A = A & ~ch
    # selection slots: escape first, then deduped legal captures
    sel_v = [jnp.where(escape_legal, l1, BIGI)]
    sel_ok = [escape_legal]
    for i, cv in enumerate(cap_vs):
        dup = cv == l1
        for prev in cap_vs[:i]:
            dup = dup | (cv == prev)
        ok_c = (cv < BIGI) & (cv != ko1) & ~dup
        sel_v.append(cv)
        sel_ok.append(ok_c)
    kp = sum(o.astype(jnp.int32) for o in sel_ok)

    lower = q1["ncaps"] + jnp.maximum(p1, q1["maxconn"])
    upper = p1 + q1["potential"] + q1["conn"]
    prey_term = jnp.where(
        (nlibs >= 2) | (think_ko & (ko1 >= 0)),
        PREY_GOOD,
        jnp.where(
            kp == 0,
            HUNTER_GOOD,
            jnp.where(
                escape_legal & (lower >= 3),
                PREY_GOOD,
                jnp.where(
                    escape_legal & (kp == 1) & (upper == 1),
                    HUNTER_GOOD,
                    UNDECIDED,
                ),
            ),
        ),
    )

    # ---- HunterSelections (board.cc:575-644) ----
    adjacent_libs = _popcount(_nbr(roll, l1bit, colmask) & l2bit) > 0
    legal1 = (l1 < BIGI) & (l1 != ko1) & (
        (p1 > 0) | q1["opp_safe"] | q1["own_atari"]
    )
    legal2 = (l2 < BIGI) & (l2 != ko1) & (
        (p2 > 0) | q2["opp_safe"] | q2["own_atari"]
    )
    both_open = ~adjacent_libs & (p1 >= 3) & (p2 >= 3)
    # boolean algebra, not jnp.where: a select over i1 vectors lowers
    # to an i8->i1 arith.trunci that Mosaic cannot compile
    h_ok1 = (
        (adjacent_libs & (l1 < BIGI))
        # p1>=3 forces m1; p2>=3 skips m1
        | (~adjacent_libs & legal1 & (p2 < 3))
    ) & ~both_open
    h_ok2 = (
        (adjacent_libs & (l2 < BIGI))
        | (~adjacent_libs & legal2 & (p1 < 3))
    ) & ~both_open
    kh = h_ok1.astype(jnp.int32) + h_ok2.astype(jnp.int32)
    hunter_term = jnp.where(
        nlibs >= 3,
        PREY_GOOD,
        jnp.where(
            nlibs <= 1,
            HUNTER_GOOD,
            jnp.where(both_open | (kh == 0), PREY_GOOD, UNDECIDED),
        ),
    )

    # ---- merge by selector side ----
    term = jnp.where(selector_prey, prey_term, hunter_term)
    ok = [
        _bsel(selector_prey, sel_ok[i], h_ok1 if i == 0 else
              (h_ok2 if i == 1 else false_b))
        for i in range(5)
    ]
    vals = [
        jnp.where(selector_prey, sel_v[i], l1 if i == 0 else
                  (l2 if i == 1 else zero_i))
        for i in range(5)
    ]
    k = sum(o.astype(jnp.int32) for o in ok)
    # first valid slot + compact the rest into alt slots 0..3
    first_v = jnp.full_like(zero_i, -1)
    rank = zero_i
    alts = [jnp.full_like(zero_i, -1) for _ in range(MAX_ALTS)]
    for i in range(5):
        is_first = ok[i] & (rank == 0)
        first_v = jnp.where(is_first, vals[i], first_v)
        for a in range(MAX_ALTS):
            hit = ok[i] & (rank == a + 1)
            alts[a] = jnp.where(hit, vals[i], alts[a])
        rank = rank + ok[i].astype(jnp.int32)

    return dict(
        own1=own1, opp1=opp1, prey1=prey1, ko1=ko1,
        selector_prey=selector_prey, term=term,
        is_term=term != UNDECIDED, first_v=first_v, k=k, alts=alts,
    )


def _dfs_machine(roll, n, own0, opp0, size, ko0, prey_v, fh_v, valid,
                 gather_stacks=False):
    """Builds the DFS state machine: returns (state0 dict, body, cond)
    over state tuples. Split from _dfs_chases so tests can single-step
    the body eagerly."""
    shape = own0.shape
    C = shape[1]
    rows = _rows_iota(shape)
    colmask = (jnp.uint32(1) << size.astype(jnp.uint32)) - jnp.uint32(1)
    colmask = jnp.broadcast_to(colmask, shape)
    rowvalid = rows < size
    full = jnp.where(rowvalid, colmask, jnp.uint32(0))
    own0 = own0 & full
    opp0 = opp0 & full

    sread = _stack_read_gather if gather_stacks else _stack_read_scan
    swrite = _stack_write_gather if gather_stacks else _stack_write_scan

    prey_bit = _vertex_bit(prey_v, shape, n)
    prey0 = _flood_conv(roll, prey_bit, own0, colmask)

    zero_i = jnp.zeros((1, C), jnp.int32)
    false_b = zero_i > 0

    # fork stack
    f_iota_b = lax.broadcasted_iota(jnp.int32, (MAX_FORKS, ROWS, C), 0)
    f_iota_s = lax.broadcasted_iota(jnp.int32, (MAX_FORKS, 1, C), 0)
    f_iota_a = lax.broadcasted_iota(jnp.int32, (MAX_FORKS, MAX_ALTS, C), 0)
    st_board0 = jnp.zeros((MAX_FORKS, ROWS, C), jnp.uint32)
    st_scalar0 = jnp.zeros((MAX_FORKS, 1, C), jnp.int32)
    st_alts0 = jnp.zeros((MAX_FORKS, MAX_ALTS, C), jnp.int32)

    state0 = dict(
        own=own0, opp=opp0, prey=prey0,
        ko=ko0,
        pend_v=fh_v,                       # move to apply next (or -1)
        # pending mover is the prey? carried as int32 0/1: an i1 vector in
        # the while carry hits a Mosaic scf.yield layout-legalization
        # failure (vpad "none" on the i1 operand)
        pend_prey=zero_i,
        mode=zero_i + DESCEND,
        ret=zero_i,
        result=jnp.where(valid > 0, UNDECIDED, PREY_GOOD).astype(jnp.int32),
        nodes=zero_i,
        sp=zero_i,
        st_own=st_board0, st_opp=st_board0,
        st_ko=st_scalar0,
        st_alts=st_alts0,
        st_cnt=st_scalar0, st_idx=st_scalar0, st_side=st_scalar0,
        it=jnp.int32(0),
    )
    keys = list(state0.keys())

    def body(state_tuple):
        s = dict(zip(keys, state_tuple))
        pend_prey = s["pend_prey"] > 0
        active = s["result"] == UNDECIDED
        descend = active & (s["mode"] == DESCEND)
        returning = active & (s["mode"] == RETURN)

        # ================= DESCEND: apply pending move, select =========
        nodes1 = s["nodes"] + 1
        budget_dead = nodes1 >= NODE_CAP

        sel = _step_select(roll, n, shape, colmask, full, prey_bit,
                           s["own"], s["opp"], s["prey"], s["ko"],
                           s["pend_v"], pend_prey)
        own1, opp1, prey1, ko1 = (sel["own1"], sel["opp1"], sel["prey1"],
                                  sel["ko1"])
        selector_prey = sel["selector_prey"]
        term, is_term = sel["term"], sel["is_term"]
        first_v, k, alts = sel["first_v"], sel["k"], sel["alts"]
        need_push = ~is_term & (k >= 2)
        overflow = need_push & (s["sp"] >= MAX_FORKS)
        freeze = descend & (budget_dead | overflow)

        do_push = descend & need_push & ~freeze & ~is_term
        alt_stack = jnp.concatenate(alts, axis=0)         # [MAX_ALTS, C]

        st_own = swrite(s["st_own"], s["sp"], f_iota_b, own1, do_push)
        st_opp = swrite(s["st_opp"], s["sp"], f_iota_b, opp1, do_push)
        st_ko = swrite(s["st_ko"], s["sp"], f_iota_s, ko1, do_push)
        st_alts = swrite(s["st_alts"], s["sp"], f_iota_a, alt_stack,
                         do_push)
        st_cnt = swrite(s["st_cnt"], s["sp"], f_iota_s, k - 1, do_push)
        st_idx = swrite(s["st_idx"], s["sp"], f_iota_s, zero_i, do_push)
        st_side = swrite(
            s["st_side"], s["sp"], f_iota_s,
            selector_prey.astype(jnp.int32), do_push
        )

        d_sp = jnp.where(do_push, s["sp"] + 1, s["sp"])
        d_mode = jnp.where(is_term, RETURN, DESCEND)
        d_ret = jnp.where(is_term, term, s["ret"])
        d_pend_v = jnp.where(is_term, s["pend_v"], first_v)
        d_pend_prey = _bsel(is_term, pend_prey, selector_prey)

        # ================= RETURN: propagate a subtree result ===========
        sp1 = s["sp"] - 1
        stack_empty = s["sp"] <= 0
        top_side_prey = sread(s["st_side"], sp1, f_iota_s) > 0
        top_cnt = sread(s["st_cnt"], sp1, f_iota_s)
        top_idx = sread(s["st_idx"], sp1, f_iota_s)
        decided = _bsel(
            top_side_prey, s["ret"] == PREY_GOOD, s["ret"] == HUNTER_GOOD
        )
        pop = decided | (top_idx >= top_cnt)
        resume = returning & ~stack_empty & ~pop

        r_own = sread(s["st_own"], sp1, f_iota_b)
        r_opp = sread(s["st_opp"], sp1, f_iota_b)
        r_prey = _flood_conv(roll, prey_bit, r_own, colmask)
        r_ko = sread(s["st_ko"], sp1, f_iota_s)
        alt_iota = lax.broadcasted_iota(jnp.int32, (MAX_ALTS, C), 0)
        top_alts = sread(s["st_alts"], sp1, f_iota_a)      # [MAX_ALTS, C]
        r_alt = jnp.sum(
            jnp.where(alt_iota == top_idx, top_alts, 0), axis=0,
            keepdims=True,
        )
        st_idx = swrite(st_idx, sp1, f_iota_s, top_idx + 1, resume)

        r_sp = jnp.where(stack_empty, s["sp"], jnp.where(pop, sp1, s["sp"]))
        r_mode = jnp.where(resume, DESCEND, RETURN)
        r_freeze = returning & stack_empty

        # ================= commit per-lane by mode ======================
        def pick(d_val, r_val, old):
            return jnp.where(descend, d_val, jnp.where(returning, r_val,
                                                       old))

        def pick_b(d_val, r_val, old):
            dm = jnp.broadcast_to(descend, old.shape)
            rm = jnp.broadcast_to(returning, old.shape)
            return jnp.where(dm, d_val, jnp.where(rm, r_val, old))

        out = dict(s)
        out["own"] = pick_b(own1, jnp.where(resume, r_own, s["own"]),
                            s["own"])
        out["opp"] = pick_b(opp1, jnp.where(resume, r_opp, s["opp"]),
                            s["opp"])
        out["prey"] = pick_b(prey1, jnp.where(resume, r_prey, s["prey"]),
                             s["prey"])
        out["ko"] = pick(ko1, jnp.where(resume, r_ko, s["ko"]), s["ko"])
        out["pend_v"] = pick(d_pend_v, jnp.where(resume, r_alt,
                                                 s["pend_v"]), s["pend_v"])
        out["pend_prey"] = _bsel(
            descend,
            d_pend_prey,
            _bsel(
                returning,
                _bsel(resume, top_side_prey, pend_prey),
                pend_prey,
            ),
        ).astype(jnp.int32)
        out["mode"] = pick(d_mode, r_mode, s["mode"])
        out["ret"] = pick(d_ret, s["ret"], s["ret"])
        out["nodes"] = pick(nodes1, s["nodes"], s["nodes"])
        out["sp"] = pick(d_sp, r_sp, s["sp"])
        out["result"] = jnp.where(
            freeze,
            PREY_GOOD,                       # budget/overflow -> prey good
            jnp.where(r_freeze, s["ret"], s["result"]),
        )
        # stack arrays already carry both modes' writes (push vs idx bump
        # target disjoint lanes)
        out["st_own"], out["st_opp"] = st_own, st_opp
        out["st_ko"], out["st_alts"] = st_ko, st_alts
        out["st_cnt"], out["st_idx"], out["st_side"] = st_cnt, st_idx, st_side
        out["it"] = s["it"] + 1
        return tuple(out[kk] for kk in keys)

    def cond(state_tuple):
        s = dict(zip(keys, state_tuple))
        return jnp.any(s["result"] == UNDECIDED) & (
            s["it"] < 2 * NODE_CAP + 16
        )

    return state0, body, cond


def _greedy_machine(roll, n, own0, opp0, size, ko0, prey_v, fh_v, valid):
    """Stack-free first pass: follow the FIRST viable selection at every
    ply (the reference's own move ordering) and record whether any
    multi-selection point (`next_fork`, board.cc:683-688) was seen. A
    lane that never forked has a chain-shaped game tree, so the greedy
    terminal IS the exact AND-OR result; forked lanes are re-searched by
    the DFS pass. Budget-frozen lanes read good-for-prey exactly like the
    DFS/reference budget, so they are final too. ~10x cheaper per
    iteration than the DFS body (no [MAX_FORKS, ...] stack traffic) and
    converges in path-length (not tree-size) iterations."""
    shape = own0.shape
    rows = _rows_iota(shape)
    colmask = (jnp.uint32(1) << size.astype(jnp.uint32)) - jnp.uint32(1)
    colmask = jnp.broadcast_to(colmask, shape)
    rowvalid = rows < size
    full = jnp.where(rowvalid, colmask, jnp.uint32(0))
    own0 = own0 & full
    opp0 = opp0 & full

    prey_bit = _vertex_bit(prey_v, shape, n)
    prey0 = _flood_conv(roll, prey_bit, own0, colmask)
    zero_i = jnp.zeros(ko0.shape, jnp.int32)

    state0 = dict(
        own=own0, opp=opp0, prey=prey0, ko=ko0,
        pend_v=fh_v,
        pend_prey=zero_i,
        result=jnp.where(valid > 0, UNDECIDED, PREY_GOOD).astype(jnp.int32),
        forked=zero_i,
        nodes=zero_i,
        it=jnp.int32(0),
    )
    keys = list(state0.keys())

    def body(state_tuple):
        s = dict(zip(keys, state_tuple))
        pend_prey = s["pend_prey"] > 0
        active = s["result"] == UNDECIDED

        nodes1 = s["nodes"] + 1
        sel = _step_select(roll, n, shape, colmask, full, prey_bit,
                           s["own"], s["opp"], s["prey"], s["ko"],
                           s["pend_v"], pend_prey)
        freeze = active & (nodes1 >= NODE_CAP)
        done = active & (sel["is_term"] | freeze)

        def keep(new, old):
            m = jnp.broadcast_to(active & ~done, old.shape)
            return jnp.where(m, new, old)

        out = dict(s)
        out["own"] = keep(sel["own1"], s["own"])
        out["opp"] = keep(sel["opp1"], s["opp"])
        out["prey"] = keep(sel["prey1"], s["prey"])
        out["ko"] = keep(sel["ko1"], s["ko"])
        out["pend_v"] = keep(sel["first_v"], s["pend_v"])
        out["pend_prey"] = keep(
            sel["selector_prey"].astype(jnp.int32), s["pend_prey"]
        )
        out["forked"] = jnp.where(
            active & ~freeze & ~sel["is_term"] & (sel["k"] >= 2),
            1, s["forked"],
        )
        out["nodes"] = jnp.where(active, nodes1, s["nodes"])
        out["result"] = jnp.where(
            done,
            jnp.where(freeze, PREY_GOOD, sel["term"]),
            s["result"],
        )
        out["it"] = s["it"] + 1
        return tuple(out[kk] for kk in keys)

    def cond(state_tuple):
        s = dict(zip(keys, state_tuple))
        return jnp.any(s["result"] == UNDECIDED) & (s["it"] < NODE_CAP + 8)

    final = dict(zip(keys, lax.while_loop(
        cond, body, tuple(state0[kk] for kk in keys)
    )))
    result = jnp.where(
        final["result"] == UNDECIDED, PREY_GOOD, final["result"]
    )
    return result, final["forked"]


def _greedy_kernel(n, own_ref, opp_ref, size_ref, ko_ref,
                   preyv_ref, fh_ref, valid_ref, res_ref, forked_ref):
    def roll(b, shift):
        return pltpu.roll(b, shift, 0)

    res, forked = _greedy_machine(
        roll, n, own_ref[:], opp_ref[:], size_ref[:], ko_ref[:],
        preyv_ref[:], fh_ref[:], valid_ref[:],
    )
    res_ref[:] = res
    forked_ref[:] = forked


def run_greedy(own_words, opp_words, size, ko, prey_v, first_hunter_v,
               valid, n, lane_chunk=512):
    """Greedy first pass over L lanes (Pallas). Returns (result [L],
    forked [L]); `result` is exact wherever forked == 0."""
    L = own_words.shape[0]
    chunk = min(lane_chunk, max(128, L))
    Lp, args = _prep(own_words, opp_words, size, ko, prey_v,
                     first_hunter_v, valid, chunk)
    res, forked = pl.pallas_call(
        functools.partial(_greedy_kernel, n),
        grid=(Lp // chunk,),
        out_shape=(
            jax.ShapeDtypeStruct((1, Lp), jnp.int32),
            jax.ShapeDtypeStruct((1, Lp), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((ROWS, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        out_specs=(
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=INTERPRET,
    )(*args)
    return res.reshape(Lp)[:L], forked.reshape(Lp)[:L]


def run_greedy_xla(own_words, opp_words, size, ko, prey_v, first_hunter_v,
                   valid, n):
    """Greedy pass in plain XLA (CPU hosts, tests)."""
    L = own_words.shape[0]
    Lp, args = _prep(own_words, opp_words, size, ko, prey_v,
                     first_hunter_v, valid, L)

    def roll(b, shift):
        return jnp.roll(b, shift, axis=0)

    res, forked = _greedy_machine(roll, n, *args)
    return res.reshape(Lp)[:L], forked.reshape(Lp)[:L]


def _dfs_chases(roll, n, own0, opp0, size, ko0, prey_v, fh_v, valid,
                gather_stacks=False):
    """The exact ladder search over [ROWS, C] bitboard lanes.

    own0/opp0: prey-color / hunter-color stones. size/ko0/prey_v/fh_v/
    valid: [1, C] int32 (fh_v = -1 starts with the prey to answer in
    atari, board.cc:795-799; else the forced first hunter move,
    board.cc:801-813). Returns [1, C] int32 chase results."""
    state0, body, cond = _dfs_machine(
        roll, n, own0, opp0, size, ko0, prey_v, fh_v, valid,
        gather_stacks=gather_stacks,
    )
    keys = list(state0.keys())
    final = lax.while_loop(cond, body, tuple(state0[kk] for kk in keys))
    result = dict(zip(keys, final))["result"]
    return jnp.where(result == UNDECIDED, PREY_GOOD, result)


def _chase_kernel(n, own_ref, opp_ref, size_ref, ko_ref,
                  preyv_ref, fh_ref, valid_ref, res_ref):
    """Pallas wrapper: exact DFS chases, one lane per (candidate, branch)."""
    def roll(b, shift):
        return pltpu.roll(b, shift, 0)

    res_ref[:] = _dfs_chases(
        roll, n, own_ref[:], opp_ref[:], size_ref[:], ko_ref[:],
        preyv_ref[:], fh_ref[:], valid_ref[:],
    )


def pack_bitboards(mask):
    """[B, n, n] bool -> [B, ROWS] uint32 row-major bitboards."""
    n = mask.shape[-1]
    bits = mask.astype(jnp.uint32) << jnp.arange(n, dtype=jnp.uint32)
    words = jnp.sum(bits, axis=-1, dtype=jnp.uint32)       # [B, n]
    pad = jnp.zeros(mask.shape[:-2] + (ROWS - n,), jnp.uint32)
    return jnp.concatenate([words, pad], axis=-1)


def _prep(own_words, opp_words, size, ko, prey_v, first_hunter_v, valid,
          chunk):
    L = own_words.shape[0]
    pad = (-L) % chunk
    Lp = L + pad

    def prep_board(w):
        if pad:
            w = jnp.concatenate([w, jnp.zeros((pad, ROWS), jnp.uint32)])
        return w.T.copy()  # [ROWS, Lp]

    def prep_scalar(x, fill=0):
        x = x.astype(jnp.int32).reshape(L)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, jnp.int32)])
        return x.reshape(1, Lp)

    return Lp, (
        prep_board(own_words),
        prep_board(opp_words),
        prep_scalar(size, fill=1),
        prep_scalar(ko, fill=-1),
        prep_scalar(prey_v, fill=0),
        prep_scalar(first_hunter_v, fill=-1),
        prep_scalar(valid),
    )


def run_chases(own_words, opp_words, size, ko, prey_v, first_hunter_v,
               valid, n, lane_chunk=128):
    """Run L exact lockstep ladder chases (Pallas); inputs lane-major.

    own_words/opp_words: [L, ROWS] uint32 (own = prey color);
    size/ko/prey_v/first_hunter_v/valid: [L] int32 (first_hunter_v = -1
    for the prey-in-atari start). Returns [L] int32 chase results."""
    L = own_words.shape[0]
    chunk = min(lane_chunk, max(128, L))
    Lp, args = _prep(own_words, opp_words, size, ko, prey_v,
                     first_hunter_v, valid, chunk)

    res = pl.pallas_call(
        functools.partial(_chase_kernel, n),
        grid=(Lp // chunk,),
        out_shape=jax.ShapeDtypeStruct((1, Lp), jnp.int32),
        in_specs=[
            pl.BlockSpec((ROWS, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(*args)
    return res.reshape(Lp)[:L]


def run_chases_xla(own_words, opp_words, size, ko, prey_v, first_hunter_v,
                   valid, n):
    """Same exact search as run_chases, in plain XLA (CPU hosts, tests)."""
    L = own_words.shape[0]
    Lp, args = _prep(own_words, opp_words, size, ko, prey_v,
                     first_hunter_v, valid, L)

    def roll(b, shift):
        return jnp.roll(b, shift, axis=0)

    res = _dfs_chases(roll, n, *args, gather_stacks=True)
    return res.reshape(Lp)[:L]
