"""Pallas board-analysis mega-kernel.

One launch computes everything the per-playout hot path needs from a batch
of boards — the work that costs ~25 separate kernel launches and scatter
ops on the XLA path (legal mask, per-chain liberty counts, reach
ownership):

- chain labels via in-kernel min-propagation
- exact chain liberty counts CAPPED AT 5 via the k-th-liberty trick:
  propagate the chain-wide minimum adjacent-empty index, then the minimum
  excluding the first, etc. — each a fixpoint, no scatters; count =
  #{k : kth exists}. (caps do not affect any consumer: the encoder planes
  need 1..4 exactly, legality needs >=2, atari detection needs ==1)
- legality (empty + not-ko + not-suicide, Board::IsLegalMove semantics)
- Tromp-Taylor reach ownership (board.cc:1526-1616)
- Benson pass-alive/pass-dead + score-area ownership
- the 2x32-bit Zobrist position hash of the child board (the XLA-side
  `position_hash` folded into the launch: per-cell key select + a
  log-fold XOR reduction over lanes)

Everything is elementwise + on-core fixpoints over [C, n*n] flattened
boards in VMEM (lane-dim shifts only — see ops/flood.py).

Fixpoint economy: the dominant cost of the kernel is not vector work but
the *scalar* overhead of many small `while_loop` fixpoints (one
convergence reduction + branch per sweep). Independent propagations are
therefore STACKED along the sublane axis and solved as one wider
fixpoint: black+white chain liberties run as a single [2C, nn] problem,
Benson for both colors as one [2C, nn] problem whose candidate/vital
sub-fixpoints stack 4 slots x 2 colors into [8C, nn]. Same vector-op
volume, ~3x fewer loops and convergence checks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128
# the LIGHT step kernel holds far fewer live arrays than the analysis
# kernels, so it can run wider grid blocks: measured 1.14M -> 1.20M
# env-steps/s going 128 -> 512 at B=4096 on v5e (1024 spills VMEM)
_CHUNK_LIGHT = 512
# Mosaic's default scoped-vmem budget is 16M; the stacked fixpoints peak
# slightly above it at chunk 64 (and well above at 128). v5e/v5p VMEM is
# larger than the default scope, so raise the cap rather than shrink the
# chunk (None = use default, set below when supported).
_COMPILER_PARAMS = None
try:
    _COMPILER_PARAMS = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024
    )
except Exception:  # older jax without the knob
    pass
INTERPRET = False  # tests flip this to run the kernel on CPU
_BIG = 1e9  # plain python float: jnp constants at module scope leak into kernels
_NUM_LIBS = 5  # count liberties up to 5 (planes need 1..4 exactly)
# exact inner-region eye refinements per board (two-headed-dragon rescue);
# MUST equal game/analysis.INNER_SLOTS so kernel and XLA paths agree on
# the overflow fallback (tests/test_pallas_kernels.py pins this)
_INNER_SLOTS = 6


def _idx(shape):
    return lax.broadcasted_iota(jnp.int32, shape, 1)


def _nbrs(x, n, fill):
    """The four neighbor values on [C, n*n] flattened boards (lane rolls)."""
    nn = n * n
    idx = _idx(x.shape)
    col = idx % n
    lf = jnp.where(col > 0, pltpu.roll(x, 1, 1), fill)
    rt = jnp.where(col < n - 1, pltpu.roll(x, nn - 1, 1), fill)
    up = jnp.where(idx >= n, pltpu.roll(x, n, 1), fill)
    dn = jnp.where(idx < nn - n, pltpu.roll(x, nn - n, 1), fill)
    return lf, rt, up, dn


def _nbr_or(m, n):
    lf, rt, up, dn = _nbrs(m, n, 0.0)
    return jnp.maximum(jnp.maximum(lf, rt), jnp.maximum(up, dn))


def _nbr_sum(m, n):
    lf, rt, up, dn = _nbrs(m, n, 0.0)
    return lf + rt + up + dn


def _nbr_min(x, n):
    lf, rt, up, dn = _nbrs(x, n, _BIG)
    return jnp.minimum(jnp.minimum(lf, rt), jnp.minimum(up, dn))


def _min_prop(values, mask, n, gates=None, tile=1, k0=1):
    """Fixpoint: component-wise minimum of `values` over `mask` chains
    (segmented run-min sweeps, ops/prop.py: O(#bends) sweeps of log-shift
    scans instead of O(diameter) single-cell hops). Pass precomputed
    `gates` (prop.run_gates) whenever the same mask hosts several
    fixpoints — it halves the per-sweep vector work."""
    from sayuri_tpu.ops import prop as P

    return P.min_prop(values, mask, n, gates=gates, tile=tile, k0=k0)


def _flood(seed, allowed, n, gates=None, tile=1):
    from sayuri_tpu.ops import prop as P

    return P.flood(seed, allowed, n, gates=gates, tile=tile)


def _run_gates(mask, n):
    from sayuri_tpu.ops import prop as P

    return P.run_gates(mask, n)


_run_gates_prop = _run_gates


def _stack(*xs):
    return jnp.concatenate(xs, axis=0)


def _split2(x):
    c = x.shape[0] // 2
    return x[:c], x[c:]


def _chain_liberty_counts(bw_mask, empty2, n, labels=None):
    """Per-stone chain liberty count, capped at _NUM_LIBS, for a STACKED
    [2C, nn] color mask (black rows then white rows, shared empty mask).

    Returns (labels [2C, nn], counts [2C, nn]). The k-th-liberty
    propagations run as one stacked fixpoint per k."""
    idxf = _idx(bw_mask.shape).astype(jnp.float32)
    gates = _run_gates(bw_mask, n)    # shared by labels + the 5 kth props
    if labels is None:
        labels = _min_prop(idxf, bw_mask, n, gates=gates)

    empty_idx = jnp.where(empty2 > 0, idxf, _BIG)
    nb_empty = _nbrs(empty_idx, n, _BIG)

    count = jnp.zeros_like(idxf)
    prev = []
    for _k in range(_NUM_LIBS):
        cand = _BIG * jnp.ones_like(idxf)
        for nb in nb_empty:
            keep = nb < _BIG
            for p in prev:
                keep = keep & (nb != p)
            cand = jnp.minimum(cand, jnp.where(keep, nb, _BIG))
        kth = _min_prop(cand, bw_mask, n, gates=gates)
        count = count + (kth < _BIG).astype(jnp.float32)
        prev.append(kth)
    return labels, count * bw_mask


def _diag_sum(m, n):
    """Sum of the 4 diagonal neighbors on flattened boards."""
    nn = n * n
    idx = _idx(m.shape)
    col = idx % n
    ul = jnp.where((idx >= n) & (col > 0), pltpu.roll(m, n + 1, 1), 0.0)
    ur = jnp.where((idx >= n) & (col < n - 1), pltpu.roll(m, n - 1, 1), 0.0)
    dl = jnp.where(
        (idx < nn - n) & (col > 0), pltpu.roll(m, nn - (n - 1), 1), 0.0
    )
    dr = jnp.where(
        (idx < nn - n) & (col < n - 1), pltpu.roll(m, nn - (n + 1), 1), 0.0
    )
    return ul + ur + dl + dr


def _benson_both(black, white, empty, mask, n, lbl_bw=None):
    """Pass-alive area for BOTH colors in one stacked [2C, nn] pass:
    Benson + vital regions + pass-dead opponent regions, mirroring
    game/analysis.py's XLA implementation exactly — INCLUDING the
    inner-region (two-headed-dragon) eye refinement, board.cc:2013-2107,
    behind a rarely-taken branch. All aggregations are
    min/or-propagations — no scatters. Returns
    (pass_area_black, pass_area_white), each [C, nn].

    Stacking layout: rows [0, C) analyze black chains (opponent white),
    rows [C, 2C) analyze white chains. The 4 vital-candidate slots fan
    out to [8C, nn] for their (independent) propagations."""
    c = _stack(black, white)               # [2C, nn] own chains
    opp_real = _stack(white, black)
    empty = _stack(empty, empty)
    mask = _stack(mask, mask)

    idxf = _idx(c.shape).astype(jnp.float32)
    other = mask * (1.0 - c)
    # `other` hosts ~10 fixpoints and `c` ~5: precompute their run gates
    gates_o = _run_gates(other, n)
    gates_c = _run_gates(c, n)

    # --- potential vitality ---
    bad = empty * (1.0 - _nbr_or(c, n)) * other
    not_potential = _flood(bad, other, n, gates=gates_o)
    potential = other * (1.0 - not_potential)

    # --- chain / candidate setup ---
    if lbl_bw is None:
        lbl_bw = _min_prop(idxf, c, n, gates=gates_c)
    lbl_c_v = jnp.where(c > 0, lbl_bw, _BIG)
    nbrl = _nbrs(lbl_c_v, n, _BIG)                   # 4 neighbor chain labels

    # region labels + first-empty-in-region: one stacked [4C] fixpoint
    fe_lr = _min_prop(
        _stack(jnp.where(empty > 0, idxf, _BIG), idxf),
        other,
        n,
        gates=gates_o,
        tile=2,
    )
    first_empty, lbl_r = _split2(fe_lr)
    is_root = empty * (idxf == first_empty).astype(jnp.float32) * other

    # k-th distinct neighbor chain label at each cell (<=4), elementwise
    s = []
    for k in range(4):
        cand = _BIG * jnp.ones_like(idxf)
        for nb in nbrl:
            keep = nb < _BIG
            for p in s:
                keep = keep & (nb != p)
            cand = jnp.minimum(cand, jnp.where(keep, nb, _BIG))
        s.append(cand)
    # broadcast the ROOT cell's candidates over the region: one stacked
    # [8C, nn] fixpoint for all 4 slots x 2 colors
    cand_all = _min_prop(
        jnp.concatenate(
            [jnp.where(is_root > 0, sk, _BIG) for sk in s], axis=0
        ),
        other,
        n,
        gates=gates_o,
        tile=4,
    )
    cand_R = jnp.split(cand_all, 4, axis=0)

    # vitality per slot: every empty in the region adjacent to that chain;
    # the 4 not-vital floods stack into one [8C, nn] fixpoint
    bad_seeds = []
    for ck in cand_R:
        adj = jnp.zeros_like(idxf)
        for nb in nbrl:
            adj = jnp.maximum(adj, (nb == ck).astype(jnp.float32))
        bad_seeds.append(empty * other * (1.0 - adj))
    not_vital_all = _flood(
        jnp.concatenate(bad_seeds, axis=0), other, n, gates=gates_o, tile=4
    )
    vital = [
        potential
        * (1.0 - nv)
        * (ck < _BIG).astype(jnp.float32)
        for nv, ck in zip(jnp.split(not_vital_all, 4, axis=0), cand_R)
    ]

    # --- Benson iteration over per-chain alive bits ---
    lbl_r_v = jnp.where(other > 0, lbl_r, _BIG)
    nbr_r = _nbrs(lbl_r_v, n, _BIG)                  # region roots next door
    my = lbl_c_v
    # direction-wise "a region vital to MY chain lies next door" flags.
    # These are round-INVARIANT (only the usable factor changes between
    # Benson rounds), so the k-slot reduction folds into 4 arrays here
    # instead of 4x4x2 precomputed ones — the VMEM high-water mark of the
    # kernel.
    flag_dir = [jnp.zeros_like(idxf) for _ in range(4)]
    for ck, vk in zip(cand_R, vital):
        ck_v = jnp.where(other > 0, ck, _BIG)
        m4 = _nbrs(ck_v, n, _BIG)
        v4 = _nbrs(vk, n, 0.0)
        for d in range(4):
            flag_dir[d] = jnp.maximum(
                flag_dir[d], v4[d] * (m4[d] == my).astype(jnp.float32)
            )

    def alive_round(alive_cell):
        dead_adj = _nbr_or(c * (1.0 - alive_cell), n)
        unusable = _flood(other * dead_adj, other, n, gates=gates_o)
        usable = other * (1.0 - unusable)
        nbr_us = _nbrs(usable, n, 0.0)
        vr = _BIG * jnp.ones_like(idxf)
        for d in range(4):
            flag = flag_dir[d] * nbr_us[d]
            vr = jnp.minimum(vr, jnp.where(flag > 0, nbr_r[d], _BIG))
        first = _min_prop(vr, c, n, gates=gates_c)
        vr2 = jnp.where(vr != first, vr, _BIG)
        second = _min_prop(vr2, c, n, gates=gates_c)
        return c * (second < _BIG).astype(jnp.float32), usable

    def body(carry):
        alive, _, _ = carry
        alive2, usable = alive_round(alive)
        return alive2, usable, jnp.sum(alive2) < jnp.sum(alive)

    alive, usable, _ = lax.while_loop(
        lambda cr: cr[2], body, (c, other, jnp.array(True))
    )
    _, usable = alive_round(alive)  # usable w.r.t. final alive set
    # region is vital if potential & usable (game/analysis.py semantics)
    vital_final = potential * usable

    # --- pass-dead opponent regions ---
    occupied2 = jnp.maximum(alive, vital_final)
    others2 = mask * (1.0 - occupied2)
    no_c_side = 1.0 - _nbr_or(occupied2, n)
    corner_c = _diag_sum(occupied2, n)
    corner_onboard = _diag_sum(mask, n)
    interior = (corner_onboard == 4.0).astype(jnp.float32)
    corner_ok = interior * (corner_c <= 1.0).astype(jnp.float32) + (
        1.0 - interior
    ) * (corner_c == 0.0).astype(jnp.float32)
    cand_eye = others2 * (1.0 - opp_real) * no_c_side
    is_eye = cand_eye * corner_ok

    gates_o2 = _run_gates(others2, n)  # eye-count + label fixpoints

    # --- inner-region refinement (IsPotentialEye + ComputeInnerRegions,
    # board.cc:1964-2107; mirror of game/analysis.py:186-236): a corner
    # cell in a blocker component that cannot reach the board edge
    # outside the region counts as the region owner, rescuing false-eye
    # life (two-headed dragons). Only failed eye candidates whose bad
    # corners are all maybe-inner can flip, so the whole pass — the
    # region labels, the edge flood, and up to INNER_SLOTS exact
    # per-region border floods — hides behind a branch that typical
    # boards (no failed eye candidate next to pass-alive stones) never
    # take.
    pre = cand_eye * (1.0 - corner_ok)
    idxf2 = _idx(pre.shape).astype(jnp.float32)
    nbm = _nbrs(mask, n, 0.0)
    edge = mask * (1.0 - nbm[0] * nbm[1] * nbm[2] * nbm[3])

    def _refined(_):
        border = _flood(occupied2 * edge, occupied2, n)
        maybe_inner = occupied2 * (1.0 - border)
        corner_maybe = _diag_sum(maybe_inner, n)
        resc = pre * (
            interior * (corner_c - corner_maybe <= 1.0)
            + (1.0 - interior) * (corner_c == corner_maybe)
        ).astype(jnp.float32)
        lbl_r2 = _min_prop(idxf2, others2, n, gates=gates_o2)
        # the first INNER_SLOTS needy region roots, in flat-index order
        # (game/analysis.py:215-218): k-th distinct lane-min of the
        # region label over rescuable cells
        cur = jnp.where(resc > 0, lbl_r2, _BIG)
        ref = jnp.zeros_like(pre)
        for _k in range(_INNER_SLOTS):
            mk = jnp.min(cur, axis=1, keepdims=True)        # [2C, 1]
            cur = jnp.where(cur == mk, _BIG, cur)
            has = (mk < _BIG).astype(jnp.float32)
            in_region = (
                (lbl_r2 == mk).astype(jnp.float32) * others2 * has
            )
            allowed = mask * (1.0 - in_region)
            outer = _flood(allowed * edge, allowed, n)
            inner_m = allowed * (1.0 - outer)
            cc = _diag_sum(occupied2 * (1.0 - inner_m), n)
            ok2 = interior * (cc <= 1.0).astype(jnp.float32) + (
                1.0 - interior
            ) * (cc == 0.0).astype(jnp.float32)
            ref = jnp.maximum(ref, pre * in_region * ok2)
        return ref

    refined = lax.cond(
        jnp.any(pre > 0), _refined, lambda _: jnp.zeros_like(pre), 0
    )
    is_eye = jnp.maximum(is_eye, refined)

    e1 = _min_prop(jnp.where(is_eye > 0, idxf, _BIG), others2, n,
                   gates=gates_o2)
    e2 = _min_prop(
        jnp.where((is_eye > 0) & (idxf != e1), idxf, _BIG), others2, n,
        gates=gates_o2,
    )
    e3 = _min_prop(
        jnp.where((is_eye > 0) & (idxf != e1) & (idxf != e2), idxf, _BIG),
        others2,
        n,
        gates=gates_o2,
    )
    r1, c1 = jnp.floor(e1 / n), e1 % n
    r2, c2 = jnp.floor(e2 / n), e2 % n
    adj12 = (jnp.abs(r1 - r2) + jnp.abs(c1 - c2)) == 1.0
    eff_ge2 = ((e2 < _BIG) & ~adj12) | (e3 < _BIG)
    pass_dead = others2 * (1.0 - eff_ge2.astype(jnp.float32))

    pa = jnp.minimum(
        jnp.maximum(alive, jnp.maximum(vital_final, pass_dead)), 1.0
    )
    return _split2(pa)


def _analyze_board(stones2, ko2, tm2, mask, empty2, n,
                   legal_ref, libs_ref, own_ref, safe_ref, sown_ref):
    """Shared analysis tail: from a (post-move) board, fill the legality,
    liberty, ownership, safe-area, and score-ownership output refs."""
    idx = _idx(stones2.shape)
    black = (stones2 == 1.0) * mask
    white = (stones2 == 2.0) * mask

    bw = _stack(black, white)
    lbl_bw, cnt_bw = _chain_liberty_counts(
        bw, _stack(empty2, empty2), n
    )
    cnt_b, cnt_w = _split2(cnt_bw)
    libs_ref[:] = (cnt_b + cnt_w).astype(jnp.int32)

    # legality (board.py legal_moves semantics): empty & in-board & not-ko
    # & (empty nbr | own chain with >=2 libs nbr | opp chain in atari nbr)
    own_is_b = tm2 == 0.0
    own_cnt = jnp.where(own_is_b, cnt_b, cnt_w)
    opp_cnt = jnp.where(own_is_b, cnt_w, cnt_b)
    has_empty_nb = _nbr_or(empty2, n)
    own_safe_nb = _nbr_or((own_cnt >= 2.0).astype(jnp.float32), n)
    opp_cap_nb = _nbr_or((opp_cnt == 1.0).astype(jnp.float32), n)
    not_ko = (idx.astype(jnp.float32) != ko2).astype(jnp.float32)
    legal = empty2 * not_ko * jnp.maximum(
        has_empty_nb, jnp.maximum(own_safe_nb, opp_cap_nb)
    )
    legal_ref[:] = legal > 0.5

    # Tromp-Taylor reach ownership: both colors as one stacked flood
    reach_bw = _flood(
        _stack(empty2 * _nbr_or(black, n), empty2 * _nbr_or(white, n)),
        _stack(empty2, empty2),
        n,
    )
    reach_b, reach_w = _split2(reach_bw)
    own = (
        black - white + reach_b * (1.0 - reach_w) - reach_w * (1.0 - reach_b)
    )
    own_ref[:] = own.astype(jnp.int32)

    # Benson pass-alive/pass-dead areas + score-area ownership
    # (ComputeSafeArea / ComputeScoreArea, board.cc:1581-1718)
    pa_b, pa_w = _benson_both(black, white, empty2, mask, n, lbl_bw=lbl_bw)
    safe_ref[:] = (pa_b + pa_w) > 0.5
    sown = jnp.where(pa_b > 0, 1.0, own)
    sown = jnp.where(pa_w > 0, -1.0, sown)
    sown_ref[:] = sown.astype(jnp.int32)


def _analysis_kernel(n, stones_ref, size_ref, ko_ref, tm_ref,
                     legal_ref, libs_ref, own_ref, safe_ref, sown_ref):
    stones = stones_ref[:].astype(jnp.float32)       # [C, nn] 0/1/2
    size = size_ref[:].astype(jnp.float32)           # [C, 1]
    ko = ko_ref[:].astype(jnp.float32)               # [C, 1]
    tm = tm_ref[:].astype(jnp.float32)               # [C, 1] 0/1

    idx = _idx(stones.shape)
    row = (idx // n).astype(jnp.float32)
    col_f = (idx % n).astype(jnp.float32)
    mask = ((row < size) & (col_f < size)).astype(jnp.float32)
    empty = (stones == 0.0) * mask

    _analyze_board(stones, ko, tm, mask, empty, n,
                   legal_ref, libs_ref, own_ref, safe_ref, sown_ref)


def _apply_move(stones, tm, action, empty, mask, n):
    """In-kernel play_move (board.py play_move semantics): place the stone,
    remove opponent chains left with no liberty, compute the simple-ko
    vertex. Returns (stones2, n_cap [C,1], ko2 [C,1], is_pass [C,1]).

    Ko detection is LOCAL: the ko rule requires the played group to be a
    single stone with exactly one liberty after capturing exactly one
    stone — group size 1 means "no own-color neighbors", so no flood is
    needed (vs. Board::PlayMoveAssumeLegal's string walk, board.cc:1484)."""
    nn = n * n
    idxf = _idx(stones.shape).astype(jnp.float32)
    v = action  # [C, 1] f32
    is_pass = (v >= float(nn)).astype(jnp.float32)
    onehot = (idxf == v).astype(jnp.float32) * mask * (1.0 - is_pass)

    own_c = tm + 1.0
    opp_c = 2.0 - tm
    stones1 = stones * (1.0 - onehot) + onehot * own_c

    opp1 = (stones1 == opp_c).astype(jnp.float32) * mask
    empty1 = (stones1 == 0.0).astype(jnp.float32) * mask
    # first liberty of each opp chain on stones1; BIG => captured
    adj_empty = _BIG * jnp.ones_like(idxf)
    for nb in _nbrs(jnp.where(empty1 > 0, idxf, _BIG), n, _BIG):
        adj_empty = jnp.minimum(adj_empty, nb)
    first_opp = _min_prop(adj_empty, opp1, n)
    captured = opp1 * (first_opp >= _BIG).astype(jnp.float32)
    n_cap = jnp.sum(captured, axis=1, keepdims=True)
    stones2 = stones1 * (1.0 - captured)

    own2 = (stones2 == own_c).astype(jnp.float32) * mask
    empty2 = (stones2 == 0.0).astype(jnp.float32) * mask
    own_nb_cnt = jnp.sum(onehot * _nbr_sum(own2, n), axis=1, keepdims=True)
    lib_cnt = jnp.sum(onehot * _nbr_sum(empty2, n), axis=1, keepdims=True)
    cap_v = jnp.min(
        jnp.where(captured > 0, idxf, _BIG), axis=1, keepdims=True
    )
    is_ko = (
        (n_cap == 1.0) & (own_nb_cnt == 0.0) & (lib_cnt == 1.0)
    ).astype(jnp.float32)
    ko2 = jnp.where((is_ko > 0) & (is_pass == 0.0), cap_v, -1.0)

    out_stones = jnp.where(is_pass > 0, stones, stones2)
    out_ncap = n_cap * (1.0 - is_pass)
    return out_stones, out_ncap, ko2, is_pass


def _xor_fold(y, n):
    """XOR-reduce [C, nn] int32 along lanes into lane 0 (log fold)."""
    nn = n * n
    idx = _idx(y.shape)
    width = nn
    while width > 1:
        d = (width + 1) // 2
        rolled = pltpu.roll(y, nn - d, 1)  # lane i <- y[(i + d) % nn]
        y = y ^ jnp.where(idx < width - d, rolled, 0)
        width = d
    return y


def _step_analysis_kernel(n, stones_ref, size_ref, ko_ref, tm_ref, act_ref,
                          zob_ref,
                          new_stones_ref, ncap_ref, ko2_ref, hash_ref,
                          legal_ref, libs_ref, own_ref, safe_ref, sown_ref):
    """step + full child-position analysis in one launch: the entire
    per-simulation board work (env transition + everything the encoder and
    legality need at the leaf), plus the child position's Zobrist hash."""
    stones = stones_ref[:].astype(jnp.float32)
    size = size_ref[:].astype(jnp.float32)
    tm = tm_ref[:].astype(jnp.float32)
    act = act_ref[:].astype(jnp.float32)

    idx = _idx(stones.shape)
    row = (idx // n).astype(jnp.float32)
    col_f = (idx % n).astype(jnp.float32)
    mask = ((row < size) & (col_f < size)).astype(jnp.float32)
    empty = (stones == 0.0).astype(jnp.float32) * mask

    stones2, ncap, ko2, _ = _apply_move(stones, tm, act, empty, mask, n)
    new_stones_ref[:] = stones2.astype(jnp.int32)
    ncap_ref[:] = ncap.astype(jnp.int32)
    ko2_ref[:] = ko2.astype(jnp.int32)

    # Zobrist hash of the child board (game/board.py position_hash): select
    # the color key per cell, XOR-fold over lanes. zob rows: black word0,
    # black word1, white word0, white word1.
    zob = zob_ref[:]
    si = stones2.astype(jnp.int32)
    # both hash words fold as ONE stacked [2C, nn] reduction
    vals = _stack(
        jnp.where(si == 1, zob[0:1], 0) ^ jnp.where(si == 2, zob[2:3], 0),
        jnp.where(si == 1, zob[1:2], 0) ^ jnp.where(si == 2, zob[3:4], 0),
    )
    folded = _xor_fold(vals, n)[:, :1]
    hash_ref[:] = jnp.concatenate(_split2(folded), axis=1)

    # analysis of the CHILD position: side to move flips
    tm2 = 1.0 - tm
    empty2 = (stones2 == 0.0) * mask
    _analyze_board(stones2, ko2, tm2, mask, empty2, n,
                   legal_ref, libs_ref, own_ref, safe_ref, sown_ref)


@functools.lru_cache(maxsize=4)
def _zobrist_rows(n: int):
    """[4, nn] int32 NUMPY zobrist key rows (black w0/w1, white w0/w1).
    Kept as numpy so the lru_cache never captures a jit tracer."""
    import numpy as np

    from sayuri_tpu.game.types import C_BLACK, C_WHITE, EMPTY

    # same generator/seed as game/board.py _zobrist_tables (pure numpy so
    # this works inside a jit trace)
    rng = np.random.Generator(np.random.Philox(key=0x5A9E12))
    cells = rng.integers(0, 2**32, size=(2, 3, n * n), dtype=np.uint32)
    cells[:, EMPTY, :] = 0
    rows = np.stack(
        [
            cells[0, C_BLACK],
            cells[1, C_BLACK],
            cells[0, C_WHITE],
            cells[1, C_WHITE],
        ]
    )
    return rows.view(np.int32)  # numpy: safe to cache across jit traces


def step_and_analyze_tpu(stones, size, ko, to_move, action):
    """Batched env-step + child analysis in one Pallas launch.

    Inputs: [B, n, n] stones + [B] scalars + [B] actions (>= n*n = pass).
    Returns dict(new_stones [B,n,n] i32, n_captured [B], new_ko [B],
    new_hash [B,2] uint32, legal [B,nn] bool, libs/ownership/safe/
    score_ownership [B,n,n])."""
    b, n = stones.shape[0], stones.shape[-1]
    nn = n * n
    chunk = min(b, _CHUNK)
    pad = (-b) % chunk
    bp = b + pad

    def prep(x):
        x = x.reshape(b, -1).astype(jnp.int32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), jnp.int32)])
        return x

    outs = pl.pallas_call(
        functools.partial(_step_analysis_kernel, n),
        grid=(bp // chunk,),
        out_shape=(
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),   # new stones
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),    # n_cap
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),    # new ko
            jax.ShapeDtypeStruct((bp, 2), jnp.int32),    # zobrist hash
            jax.ShapeDtypeStruct((bp, nn), jnp.bool_),   # legal
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),   # libs
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),   # ownership
            jax.ShapeDtypeStruct((bp, nn), jnp.bool_),   # safe
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),   # score ownership
        ),
        in_specs=[
            pl.BlockSpec((chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, nn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (chunk, sh), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            for sh in (nn, 1, 1, 2, nn, nn, nn, nn, nn)
        ),
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(prep(stones), prep(size), prep(ko), prep(to_move), prep(action),
      _zobrist_rows(n))
    sl = slice(0, b)
    new_stones, ncap, ko2, h, legal, libs, own, safe, sown = outs
    return {
        "new_stones": new_stones[sl].reshape(b, n, n),
        "n_captured": ncap[sl].reshape(b),
        "new_ko": ko2[sl].reshape(b),
        "new_hash": lax.bitcast_convert_type(h[sl], jnp.uint32),
        "legal": legal[sl],
        "libs": libs[sl].reshape(b, n, n),
        "ownership": own[sl].reshape(b, n, n),
        "safe": safe[sl].reshape(b, n, n),
        "score_ownership": sown[sl].reshape(b, n, n),
    }


def board_analysis_tpu(stones, size, ko, to_move):
    """Batched analysis: [B, n, n] int8 stones (+ [B] scalars) ->
    dict(legal [B, nn] bool, libs [B, n, n] int32 capped at 5,
    ownership [B, n, n] int32)."""
    b, n = stones.shape[0], stones.shape[-1]
    nn = n * n
    chunk = min(b, _CHUNK)
    pad = (-b) % chunk
    bp = b + pad

    def prep(x, dtype):
        x = x.reshape(b, -1).astype(dtype)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), dtype)])
        return x

    stones_f = prep(stones, jnp.int32)
    size_f = prep(size, jnp.int32)
    ko_f = prep(ko, jnp.int32)
    tm_f = prep(to_move, jnp.int32)

    legal, libs, own, safe, sown = pl.pallas_call(
        functools.partial(_analysis_kernel, n),
        grid=(bp // chunk,),
        out_shape=(
            jax.ShapeDtypeStruct((bp, nn), jnp.bool_),
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),
            jax.ShapeDtypeStruct((bp, nn), jnp.bool_),
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(stones_f, size_f, ko_f, tm_f)
    sl = slice(0, b)
    return {
        "legal": legal[sl],
        "libs": libs[sl].reshape(b, n, n),
        "ownership": own[sl].reshape(b, n, n),
        "safe": safe[sl].reshape(b, n, n),
        "score_ownership": sown[sl].reshape(b, n, n),
    }


def _ladder_prep_kernel(n, stones_ref, size_ref, ko_ref,
                        lbl_ref, nlibs_ref, lib1_ref, lib2_ref,
                        legb_ref, legw_ref):
    """Candidate prep for the ladder chases (game/ladder.py
    _prep_candidates), kernel-side: chain labels, per-chain liberty count
    capped at 3, the chain's first/second liberty VERTICES, and the
    single-vertex legality maps for BOTH colors (the hunter color varies
    per candidate chain). Replaces ~6 per-board XLA label-propagation
    fixpoints that cost ~25 ms at B=256 on v5e (the dominant cost of
    root ladder planes on sparse boards)."""
    stones = stones_ref[:].astype(jnp.float32)
    size = size_ref[:].astype(jnp.float32)
    ko = ko_ref[:].astype(jnp.float32)

    idx = _idx(stones.shape)
    idxf = idx.astype(jnp.float32)
    row = (idx // n).astype(jnp.float32)
    col_f = (idx % n).astype(jnp.float32)
    mask = ((row < size) & (col_f < size)).astype(jnp.float32)
    empty = (stones == 0.0) * mask
    black = (stones == 1.0) * mask
    white = (stones == 2.0) * mask

    bw = _stack(black, white)
    empty2 = _stack(empty, empty)
    gates = _run_gates(bw, n)
    idxf2 = _idx(bw.shape).astype(jnp.float32)
    labels2 = _min_prop(idxf2, bw, n, gates=gates)

    # k-th distinct chain liberty VERTEX, k < 3 (chains with 1 or 2 libs
    # are the ladder candidates, board.cc:795-813); count = #existing
    empty_idx = jnp.where(empty2 > 0, idxf2, _BIG)
    nb_empty = _nbrs(empty_idx, n, _BIG)
    kth = []
    for _k in range(3):
        cand = _BIG * jnp.ones_like(idxf2)
        for nb in nb_empty:
            keep = nb < _BIG
            for p in kth:
                keep = keep & (nb != p)
            cand = jnp.minimum(cand, jnp.where(keep, nb, _BIG))
        kth.append(_min_prop(cand, bw, n, gates=gates))
    count2 = (
        (kth[0] < _BIG).astype(jnp.float32)
        + (kth[1] < _BIG).astype(jnp.float32)
        + (kth[2] < _BIG).astype(jnp.float32)
    ) * bw

    lbl_b, lbl_w = _split2(jnp.where(bw > 0, labels2, -1.0))
    lbl_ref[:] = jnp.maximum(lbl_b, lbl_w).astype(jnp.int32)
    cnt_b, cnt_w = _split2(count2)
    nlibs_ref[:] = (cnt_b + cnt_w).astype(jnp.int32)
    l1b, l1w = _split2(jnp.where(kth[0] < _BIG, kth[0], float(n * n)))
    l2b, l2w = _split2(jnp.where(kth[1] < _BIG, kth[1], float(n * n)))
    lib1_ref[:] = jnp.where(black > 0, l1b, l1w).astype(jnp.int32)
    lib2_ref[:] = jnp.where(black > 0, l2b, l2w).astype(jnp.int32)

    # single-vertex legality for both colors (_single_vertex_legal
    # semantics: empty & not-ko & (empty-nbr | own>=2-libs-nbr |
    # opp-in-atari-nbr))
    has2_b = black * (cnt_b >= 2.0).astype(jnp.float32)
    has2_w = white * (cnt_w >= 2.0).astype(jnp.float32)
    only1_b = black * (cnt_b == 1.0).astype(jnp.float32)
    only1_w = white * (cnt_w == 1.0).astype(jnp.float32)
    base = empty * (idxf != ko).astype(jnp.float32)
    emp_nb = _nbr_or(empty, n)
    legb_ref[:] = (
        base
        * jnp.maximum(
            emp_nb,
            jnp.maximum(_nbr_or(has2_b, n), _nbr_or(only1_w, n)),
        )
    ) > 0.5
    legw_ref[:] = (
        base
        * jnp.maximum(
            emp_nb,
            jnp.maximum(_nbr_or(has2_w, n), _nbr_or(only1_b, n)),
        )
    ) > 0.5


def ladder_prep_tpu(stones, size, ko):
    """Batched ladder candidate prep: [B, n, n] stones (+ [B] scalars) ->
    dict(labels [B, nn] i32 (-1 off-chain), nlibs [B, nn] i32 capped 3,
    lib1/lib2 [B, nn] i32 (nn = absent), legal_black/legal_white
    [B, nn] bool)."""
    b, n = stones.shape[0], stones.shape[-1]
    nn = n * n
    chunk = min(b, _CHUNK)
    pad = (-b) % chunk
    bp = b + pad

    def prep(x):
        x = x.reshape(b, -1).astype(jnp.int32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), jnp.int32)])
        return x

    outs = pl.pallas_call(
        functools.partial(_ladder_prep_kernel, n),
        grid=(bp // chunk,),
        out_shape=(
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),   # labels
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),   # nlibs
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),   # lib1
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),   # lib2
            jax.ShapeDtypeStruct((bp, nn), jnp.bool_),   # legal black
            jax.ShapeDtypeStruct((bp, nn), jnp.bool_),   # legal white
        ),
        in_specs=[
            pl.BlockSpec((chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            for _ in range(6)
        ),
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(prep(stones), prep(size), prep(ko))
    sl = slice(0, b)
    labels, nlibs, lib1, lib2, legb, legw = outs
    return {
        "labels": labels[sl],
        "nlibs": nlibs[sl],
        "lib1": lib1[sl],
        "lib2": lib2[sl],
        "legal_black": legb[sl],
        "legal_white": legw[sl],
    }


def _step_legal_kernel(n, stones_ref, size_ref, ko_ref, tm_ref, act_ref,
                       zob_ref,
                       new_stones_ref, ncap_ref, ko2_ref, hash_ref,
                       legal_ref):
    """LIGHT step kernel: board transition + child legality + hash only.

    This is the raw environment-stepping path (rollouts, env benchmarks,
    opening randomization) — the full Benson/liberty-plane analysis is
    search-leaf work and lives in `_step_analysis_kernel`. Legality needs
    only the existence of each chain's 1st and 2nd liberty:
      legal(v) = empty & not-ko & (empty-nbr
                 | own-nbr-chain with a 2nd liberty
                 | opp-nbr-chain without a 2nd liberty)
    (an adjacent opp chain's single liberty is necessarily v itself), so
    the whole launch runs 3 fixpoints instead of ~30
    (Board::IsLegalMove semantics, board.cc:269-321)."""
    stones = stones_ref[:].astype(jnp.float32)
    size = size_ref[:].astype(jnp.float32)
    tm = tm_ref[:].astype(jnp.float32)
    act = act_ref[:].astype(jnp.float32)

    idx = _idx(stones.shape)
    row = (idx // n).astype(jnp.float32)
    col_f = (idx % n).astype(jnp.float32)
    mask = ((row < size) & (col_f < size)).astype(jnp.float32)
    empty = (stones == 0.0).astype(jnp.float32) * mask

    stones2, ncap, ko2, _ = _apply_move(stones, tm, act, empty, mask, n)
    new_stones_ref[:] = stones2.astype(jnp.int32)
    ncap_ref[:] = ncap.astype(jnp.int32)
    ko2_ref[:] = ko2.astype(jnp.int32)

    zob = zob_ref[:]
    si = stones2.astype(jnp.int32)
    # both hash words fold as ONE stacked [2C, nn] reduction
    vals = _stack(
        jnp.where(si == 1, zob[0:1], 0) ^ jnp.where(si == 2, zob[2:3], 0),
        jnp.where(si == 1, zob[1:2], 0) ^ jnp.where(si == 2, zob[3:4], 0),
    )
    folded = _xor_fold(vals, n)[:, :1]
    hash_ref[:] = jnp.concatenate(_split2(folded), axis=1)

    # child legality from liberty existence (stacked colors). "Chain has
    # >= 2 distinct liberties" == "min liberty index < max liberty index",
    # so ONE stacked [4C, nn] fixpoint (min + negated-min) replaces the
    # two SEQUENTIAL kth-liberty fixpoints of the round-2 kernel — same
    # vector volume, half the while-loop/convergence overhead.
    tm2 = 1.0 - tm
    idxf = idx.astype(jnp.float32)
    black = (stones2 == 1.0) * mask
    white = (stones2 == 2.0) * mask
    empty2 = (stones2 == 0.0) * mask
    bw = _stack(black, white)
    empty_bw = _stack(empty2, empty2)
    gates = _run_gates_prop(bw, n)
    adj = jnp.where(empty_bw > 0, _stack(idxf, idxf), _BIG)
    nb = _nbrs(adj, n, _BIG)
    cand_min = jnp.minimum(
        jnp.minimum(nb[0], nb[1]), jnp.minimum(nb[2], nb[3])
    )
    cand_neg = _BIG * jnp.ones_like(cand_min)
    for x in nb:
        cand_neg = jnp.minimum(cand_neg, jnp.where(x < _BIG, -x, _BIG))
    both = _min_prop(
        _stack(cand_min, cand_neg), bw, n, gates=gates, tile=2, k0=2
    )
    lib_min, neg_max = _split2(both)
    has_lib = lib_min < _BIG
    has2 = has_lib & (-neg_max > lib_min)
    has2_b, has2_w = _split2(has2.astype(jnp.float32) * bw)
    only1_b, only1_w = _split2(
        (has_lib & ~has2).astype(jnp.float32) * bw
    )
    own_is_b = tm2 == 0.0
    own_safe = jnp.where(own_is_b, has2_b, has2_w)
    opp_cap = jnp.where(own_is_b, only1_w, only1_b)
    legal = (
        empty2
        * (idxf != ko2).astype(jnp.float32)
        * jnp.maximum(
            _nbr_or(empty2, n),
            jnp.maximum(_nbr_or(own_safe, n), _nbr_or(opp_cap, n)),
        )
    )
    legal_ref[:] = legal > 0.5


def step_and_legal_tpu(stones, size, ko, to_move, action):
    """Batched env-step + child legality + hash (light kernel — the raw
    env-stepping hot path). Same input/output conventions as
    `step_and_analyze_tpu` minus the leaf-analysis planes."""
    b, n = stones.shape[0], stones.shape[-1]
    nn = n * n
    chunk = min(b, _CHUNK_LIGHT)
    pad = (-b) % chunk
    bp = b + pad

    def prep(x):
        x = x.reshape(b, -1).astype(jnp.int32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), jnp.int32)])
        return x

    outs = pl.pallas_call(
        functools.partial(_step_legal_kernel, n),
        grid=(bp // chunk,),
        out_shape=(
            jax.ShapeDtypeStruct((bp, nn), jnp.int32),   # new stones
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),    # n_cap
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),    # new ko
            jax.ShapeDtypeStruct((bp, 2), jnp.int32),    # zobrist hash
            jax.ShapeDtypeStruct((bp, nn), jnp.bool_),   # legal
        ),
        in_specs=[
            pl.BlockSpec((chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, nn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (chunk, sh), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            for sh in (nn, 1, 1, 2, nn)
        ),
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(prep(stones), prep(size), prep(ko), prep(to_move), prep(action),
      _zobrist_rows(n))
    sl = slice(0, b)
    new_stones, ncap, ko2, h, legal = outs
    return {
        "new_stones": new_stones[sl].reshape(b, n, n),
        "n_captured": ncap[sl].reshape(b),
        "new_ko": ko2[sl].reshape(b),
        "new_hash": lax.bitcast_convert_type(h[sl], jnp.uint32),
        "legal": legal[sl],
    }
