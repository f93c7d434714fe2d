"""Pallas ladder-chase kernel.

The reference reads ladders with a recursive hunter/prey search over an
incrementally-updated board (/root/reference/src/game/board.cc:484-821).
The XLA re-derivation (game/ladder.py) replays the same greedy chase with
full-board label-propagation per ply, which costs seconds per 256-board
batch — each ply re-runs several O(diameter) fixpoints through XLA ops.

This kernel runs the SAME greedy chase (ladder.py's exact decision rules,
cited there against board.cc) with every chase as one lane of a bitboard
array held in VMEM:

- boards are uint32 bitboards laid out [32 rows, lanes]: row r of lane
  l's board is the 32-bit word at [r, l]; north/south are sublane rolls,
  east/west are bit shifts — a flood-fill iteration is ~10 VPU ops.
- all candidate chases of a batch run in lockstep (one lane per chase:
  up to MAX_CHAINS candidate chains x 2 first-hunter branches per board)
  inside one kernel launch; per-lane convergence is masked.
- chain-liberty queries flood only the <=8 chains adjacent to the move
  under test, with a bounded flood (ITER_QUERY dilations) — the analogue
  of the reference's kMaxLadderNodes cap (types.h:68).

Documented approximations (all shared with or strictly smaller than
ladder.py's documented deviations from board.cc):
- greedy principal variation instead of branch-forking (ladder.py:14-17);
- query floods are capped at ITER_QUERY dilations: a merged chain longer
  than that reads as truncated (kMaxLadderNodes-style cap).
Captures are exact for every move of the chase (prey escapes/snapbacks,
hunter captures of third-party chains, simple-ko bookkeeping).
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
MAX_CHAINS = 12    # candidate chains per board (matches game/ladder.py)
ITER_QUERY = 16    # bounded flood for neighbor-chain queries
BIGI = 10**9

# chase results (game/ladder.py values)
UNDECIDED = 0
PREY_GOOD = 1
HUNTER_GOOD = 2

_U1 = None  # placeholder to keep linters quiet


def _rows_iota(shape):
    return lax.broadcasted_iota(jnp.int32, shape, 0)


def _nbr(b, colmask):
    """OR of the 4 neighbors (center excluded) on [32, C] bitboards.
    `colmask` zeroes bits >= board size (east shifts spill into them)."""
    e = (b << 1) & colmask
    w = b >> 1
    s = pltpu.roll(b, 1, 0)     # row r <- row r-1
    n_ = pltpu.roll(b, ROWS - 1, 0)  # row r <- row r+1
    return e | w | s | n_


def _flood(seed, allowed, colmask, iters):
    """Grow seed within allowed for `iters` dilations. `allowed` must
    already be masked to the board region (its AND enforces row bounds)."""
    def body(_, x):
        return (x | _nbr(x, colmask)) & allowed

    return lax.fori_loop(0, iters, body, seed & allowed)


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
    v >= n*n (or BIGI) -> all zeros."""
    rows = _rows_iota(shape)
    r = v // n
    c = jnp.minimum(v - r * n, 31)
    bit = jnp.uint32(1) << c.astype(jnp.uint32)
    return jnp.where((rows == r) & (v < n * n), bit, jnp.uint32(0))


def _dir_seeds(bit, colmask):
    """The 4 single-bit neighbors of a one-hot board (E, W, S, N)."""
    return (
        (bit << 1) & colmask,
        bit >> 1,
        pltpu.roll(bit, 1, 0),
        pltpu.roll(bit, ROWS - 1, 0),
    )


def _chain_queries(vbit, stones_own, stones_opp, empty, colmask):
    """Liberty/atari info of the <=4 own and <=4 opp chains adjacent to a
    vertex (GetLadderLiberties semantics, board.cc:484-518).

    Returns dict with per-lane [1, C] int32/bool:
      conn      sum over distinct own neighbor chains of (libs - 1)
      maxconn   max over them of (libs - 1)
      own_safe  any own neighbor chain with >= 2 libs
      ncaps     count of distinct opp neighbor chains in atari
      potential capped total stones of those atari chains
      opp_atari_union  [32, C] union bitboard of opp atari neighbor chains
    """
    zero_i = jnp.zeros(vbit.shape[:0] + (1, vbit.shape[1]), jnp.int32)
    conn = zero_i
    maxconn = zero_i
    own_safe = zero_i > 1
    ncaps = zero_i
    potential = zero_i
    atari_union = jnp.zeros_like(vbit)
    own_prev = jnp.zeros_like(vbit)
    opp_prev = jnp.zeros_like(vbit)

    for seed in _dir_seeds(vbit, colmask):
        # own-color chain in this direction
        so = seed & stones_own
        dup_o = _popcount(so & own_prev) > 0
        ch_o = _flood(so, stones_own, colmask, ITER_QUERY)
        libs_o = _popcount(_nbr(ch_o, colmask) & empty)
        has_o = (_popcount(so) > 0) & ~dup_o
        conn = conn + jnp.where(has_o, libs_o - 1, 0)
        maxconn = jnp.maximum(maxconn, jnp.where(has_o, libs_o - 1, 0))
        own_safe = own_safe | (has_o & (libs_o >= 2))
        own_prev = own_prev | ch_o

        # opp-color chain in this direction
        sp = seed & stones_opp
        dup_p = _popcount(sp & opp_prev) > 0
        ch_p = _flood(sp, stones_opp, colmask, ITER_QUERY)
        libs_p = _popcount(_nbr(ch_p, colmask) & empty)
        has_p = (_popcount(sp) > 0) & ~dup_p
        atari_p = has_p & (libs_p == 1)
        ncaps = ncaps + atari_p.astype(jnp.int32)
        potential = potential + jnp.where(atari_p, _popcount(ch_p), 0)
        atari_union = atari_union | jnp.where(atari_p, ch_p, jnp.uint32(0))
        opp_prev = opp_prev | ch_p

    return dict(
        conn=conn,
        maxconn=maxconn,
        own_safe=own_safe,
        ncaps=ncaps,
        potential=potential,
        atari_union=atari_union,
    )


def _adjacent_chains(vbit, stones, empty, colmask):
    """Chains of `stones` adjacent to the one-hot vertex `vbit`:
    (atari_union bitboard, any_atari [1,C] bool, any_safe [1,C] bool).
    atari_union = union of adjacent chains with exactly 1 liberty (their
    liberty is v when v is empty, so playing v captures them)."""
    prev = jnp.zeros_like(vbit)
    atari_union = jnp.zeros_like(vbit)
    any_atari = jnp.zeros((1, vbit.shape[1]), jnp.bool_)
    any_safe = jnp.zeros((1, vbit.shape[1]), jnp.bool_)
    for seed in _dir_seeds(vbit, colmask):
        s = seed & stones
        dup = _popcount(s & prev) > 0
        ch = _flood(s, stones, colmask, ITER_QUERY)
        libs = _popcount(_nbr(ch, colmask) & empty)
        has = (_popcount(s) > 0) & ~dup
        atari = has & (libs == 1)
        atari_union = atari_union | jnp.where(atari, ch, jnp.uint32(0))
        any_atari = any_atari | atari
        any_safe = any_safe | (has & (libs >= 2))
        prev = prev | ch
    return atari_union, any_atari, any_safe


def _place_stone(bit, mover_stones, other_stones, empty, colmask, n):
    """Play a stone at one-hot `bit` for the mover: returns
    (mover2, other2, new_ko [1,C] int32) with exact captures of adjacent
    1-liberty `other` chains and simple-ko detection."""
    captured, _, _ = _adjacent_chains(bit, other_stones, empty, colmask)
    mover2 = mover_stones | bit
    other2 = other_stones & ~captured
    # the board-region mask is implied by the operands (all masked)
    empty2 = empty & ~bit | (captured & ~bit)
    ncap = _popcount(captured)
    grp_single = _popcount(bit & _nbr(mover2 & ~bit, colmask)) == 0
    mlibs = _popcount(_nbr(bit, colmask) & empty2)
    ko = jnp.where(
        (ncap == 1) & grp_single & (mlibs == 1),
        _lowest_vertex(captured, n),
        -1,
    )
    return mover2, other2, ko


def _chase_kernel(n, max_iters, own_ref, opp_ref, size_ref, ko_ref,
                  preyv_ref, fh_ref, valid_ref, res_ref):
    """Lockstep greedy ladder chases (ladder.py ladder_chase, one lane per
    chase). own = prey color stones, opp = hunter color stones."""
    own0 = own_ref[:]
    opp0 = opp_ref[:]
    size = size_ref[:]            # [1, C] int32
    ko0 = ko_ref[:]               # [1, C] int32 (-1 none)
    prey_v = preyv_ref[:]         # [1, C] int32
    fh_v = fh_ref[:]              # [1, C] int32 (-1 => prey starts in atari)
    valid = valid_ref[:] > 0      # [1, C]

    shape = own0.shape
    rows = _rows_iota(shape)
    colmask = (
        (jnp.uint32(1) << size.astype(jnp.uint32)) - jnp.uint32(1)
    ) * jnp.uint32(1)
    colmask = jnp.broadcast_to(colmask, shape)
    rowvalid = rows < size
    full = jnp.where(rowvalid, colmask, jnp.uint32(0))

    # forced first hunter move (IsLadder libs==2 case, board.cc:801-813)
    # with exact captures of prey-color chains it puts at 0 liberties
    fh_bit = _vertex_bit(fh_v, shape, n)
    empty00 = full & ~own0 & ~opp0
    opp0_c, own0_c, ko_fh = _place_stone(
        fh_bit, opp0, own0, empty00, colmask, n
    )
    has_fh = fh_v >= 0
    opp0 = jnp.where(has_fh, opp0_c, opp0)
    own0 = jnp.where(has_fh, own0_c, own0)
    ko0 = jnp.where(has_fh, ko_fh, ko0)
    think_ko = has_fh

    prey_bit = _vertex_bit(prey_v, shape, n)
    prey0 = _flood(prey_bit, own0 & full, colmask, 2 * n)

    res0 = jnp.where(valid, UNDECIDED, PREY_GOOD).astype(jnp.int32)

    def body(carry):
        own, opp, prey, ko, result, it = carry
        empty = full & ~own & ~opp

        # ---- prey phase (PreySelections, board.cc:520-574) ----
        prey_libs = _nbr(prey, colmask) & empty
        nlibs = _popcount(prey_libs)
        l1 = _lowest_vertex(prey_libs, n)
        l1bit = _vertex_bit(l1, shape, n)

        q = _chain_queries(l1bit, own, opp, empty, colmask)
        stone_libs = _popcount(_nbr(l1bit, colmask) & empty)
        lower = q["ncaps"] + jnp.maximum(stone_libs, q["maxconn"])
        upper = stone_libs + q["potential"] + q["conn"]
        escape_legal = (
            (l1 < BIGI)
            & (l1 != ko)
            & ((stone_libs > 0) | q["own_safe"] | (q["ncaps"] > 0))
        )

        # capture-gaining move: peel <=4 opp chains adjacent to the prey
        # (FindStringLibertiesGainingCaptures, board.cc:543)
        A = _nbr(prey, colmask) & opp
        cap_v = jnp.full_like(l1, BIGI)
        for _ in range(4):
            v0 = _lowest_vertex(A, n)
            sbit = _vertex_bit(v0, shape, n)
            ch = _flood(sbit, opp, colmask, ITER_QUERY)
            libs_mask = _nbr(ch, colmask) & empty
            is_atari = (v0 < BIGI) & (_popcount(libs_mask) == 1)
            libv = _lowest_vertex(libs_mask, n)
            cap_v = jnp.minimum(cap_v, jnp.where(is_atari, libv, BIGI))
            A = A & ~ch
        cap_legal = (cap_v < BIGI) & (cap_v != ko)

        prey_escaped = (
            (nlibs >= 2)
            | (think_ko & (ko >= 0))
            | (escape_legal & (lower >= 3))
        )
        prey_dead = (
            (~prey_escaped & ~escape_legal & ~cap_legal)
            | (~prey_escaped & escape_legal & ~cap_legal & (upper <= 1))
        )
        use_cap = cap_legal & ((upper <= 1) | ~escape_legal)
        prey_move = jnp.where(use_cap, cap_v, l1)
        mbit = _vertex_bit(prey_move, shape, n)

        # apply the prey move (PlayMoveAssumeLegal on bitboards):
        # exact captures of adjacent 1-liberty hunter chains + simple ko
        own1, opp1, ko1 = _place_stone(mbit, own, opp, empty, colmask, n)
        empty1 = full & ~own1 & ~opp1
        # prey may merge through the played stone
        prey1 = _flood(prey | (mbit & _nbr(prey, colmask)), own1, colmask,
                       2 * n)

        # ---- hunter phase (HunterSelections, board.cc:576-646) ----
        p_libs = _nbr(prey1, colmask) & empty1
        nlibs1 = _popcount(p_libs)
        h1 = _lowest_vertex(p_libs, n)
        h1bit = _vertex_bit(h1, shape, n)
        rest = p_libs & ~h1bit
        h2 = _lowest_vertex(rest, n)
        h2bit = _vertex_bit(h2, shape, n)

        prey_escaped2 = nlibs1 >= 3
        hunter_won = nlibs1 <= 1

        p1 = _popcount(_nbr(h1bit, colmask) & empty1)
        p2 = _popcount(_nbr(h2bit, colmask) & empty1)
        both_open = (p1 >= 3) & (p2 >= 3)

        # hunter-move legality: empty neighbor, adjacent hunter chain with
        # >= 2 libs, or capture of an adjacent prey-color chain in atari
        def legal_at(hbit_, hv):
            _, h_caps, _ = _adjacent_chains(hbit_, own1, empty1, colmask)
            _, _, h_safe = _adjacent_chains(hbit_, opp1, empty1, colmask)
            stone = _popcount(_nbr(hbit_, colmask) & empty1)
            return (hv < BIGI) & (hv != ko1) & (
                (stone > 0) | h_safe | h_caps
            )

        legal1 = legal_at(h1bit, h1)
        legal2 = legal_at(h2bit, h2)
        # same decision table as ladder.py's nested where, written as pure
        # and/or — Mosaic cannot materialize bool-vector select constants
        pick1 = legal1 & (
            (p1 >= 3) | (~(p2 >= 3) & ((p1 >= p2) | ~legal2))
        )
        pick2 = ~pick1 & legal2 & ~(p1 >= 3)
        no_move = ~pick1 & ~pick2
        hbit = jnp.where(pick1, h1bit, h2bit)
        hunter_plays = ~(hunter_won | prey_escaped2 | both_open | no_move)
        # exact captures (third-party prey-color chains) + ko
        opp2_c, own1_c, ko_h = _place_stone(
            hbit, opp1, own1, empty1, colmask, n
        )
        opp2 = jnp.where(hunter_plays, opp2_c, opp1)
        own1 = jnp.where(hunter_plays, own1_c, own1)
        prey1 = prey1 & own1    # a captured third-party chain never holds
                                # prey cells (prey has 2 libs here)
        ko2 = jnp.where(hunter_plays, ko_h, ko1)

        new_result = jnp.where(
            prey_escaped,
            PREY_GOOD,
            jnp.where(
                prey_dead,
                HUNTER_GOOD,
                jnp.where(
                    hunter_won,
                    HUNTER_GOOD,
                    jnp.where(
                        prey_escaped2 | both_open | no_move,
                        PREY_GOOD,
                        UNDECIDED,
                    ),
                ),
            ),
        ).astype(jnp.int32)
        undecided = result == UNDECIDED
        result2 = jnp.where(undecided, new_result, result)
        # frozen lanes keep their boards (their content no longer matters,
        # but avoid growing garbage)
        own_n = jnp.where(undecided, own1, own)
        opp_n = jnp.where(undecided, opp2, opp)
        prey_n = jnp.where(undecided, prey1, prey)
        ko_n = jnp.where(undecided, ko2, ko)
        return own_n, opp_n, prey_n, ko_n, result2, it + 1

    def cond(carry):
        _, _, _, _, result, it = carry
        return jnp.any(result == UNDECIDED) & (it < max_iters)

    _, _, _, _, result, _ = lax.while_loop(
        cond, body, (own0, opp0, prey0, ko0, res0, jnp.int32(0))
    )
    # exhaustion counts as escape (board.cc:655-658)
    res_ref[:] = jnp.where(result == UNDECIDED, PREY_GOOD, result)


def pack_bitboards(mask):
    """[B, n, n] bool -> [B, ROWS] uint32 row-major bitboards."""
    n = mask.shape[-1]
    bits = mask.astype(jnp.uint32) << jnp.arange(n, dtype=jnp.uint32)
    words = jnp.sum(bits, axis=-1, dtype=jnp.uint32)       # [B, n]
    pad = jnp.zeros(mask.shape[:-2] + (ROWS - n,), jnp.uint32)
    return jnp.concatenate([words, pad], axis=-1)


def run_chases(own_words, opp_words, size, ko, prey_v, first_hunter_v,
               valid, n, lane_chunk=1024):
    """Run L lockstep greedy ladder chases; all inputs lane-major.

    own_words/opp_words: [L, ROWS] uint32 (own = prey color);
    size/ko/prey_v/first_hunter_v/valid: [L] int32 (first_hunter_v = -1
    for the prey-in-atari start). Returns [L] int32 chase results."""
    L = own_words.shape[0]
    chunk = min(lane_chunk, max(128, L))
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

    max_iters = 2 * n + 8
    res = pl.pallas_call(
        functools.partial(_chase_kernel, n, max_iters),
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
    )(
        prep_board(own_words),
        prep_board(opp_words),
        prep_scalar(size, fill=1),
        prep_scalar(ko, fill=-1),
        prep_scalar(prey_v, fill=0),
        prep_scalar(first_hunter_v, fill=-1),
        prep_scalar(valid),
    )
    return res.reshape(Lp)[:L]
