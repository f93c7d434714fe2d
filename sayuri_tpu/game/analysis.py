"""Vectorized board-safety analysis: Benson pass-alive, pass-dead, safe area.

Re-derives the reference's ComputePassAliveArea / ComputeSafeArea /
ComputeScoreArea (/root/reference/src/game/board.cc:1581-2051) as dense array
fixpoints. The reference walks circular linked lists of region/string cells;
here regions and chains are min-index labels and every per-region / per-chain
aggregate is a scatter(add/or/min) over label roots:

- a region's candidate "vital" chains are the <=4 chains adjacent to its
  min-index empty cell (the true vital set is an intersection of per-empty
  adjacency sets, so it is contained in any one of them);
- Benson's iteration ("remove strings with <2 vital regions; kill regions
  adjacent to removed strings") runs as a while_loop over per-chain alive
  bits — monotone, so it terminates in <= #chains trips.

The pass-dead potential-eye count includes the reference's "inner region"
refinement for false-eye life / two-headed dragons (board.cc:2013-2107):
regions whose failed eye candidates could be rescued by promoting enclosed
c-stone corners get an exact per-region border flood (at most INNER_SLOTS
regions per board — overflow falls back to the unrefined eye, erring the
same direction as the reference's own greedy heuristic, board.cc:1968-1970).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sayuri_tpu.game import board as B
from sayuri_tpu.game.types import EMPTY

# exact inner-region refinements per board (pass-dead two-headed-dragon
# rescue); regions needing it beyond this fall back to the unrefined eye
INNER_SLOTS = 6


def _scatter_or(vals, labels, nn):
    """OR `vals` into label slots; [nn] bool, valid at label roots."""
    idx = jnp.where(labels >= 0, labels, nn).reshape(-1)
    out = jnp.zeros((nn + 1,), bool).at[idx].max(vals.reshape(-1), mode="drop")
    return out[:nn]


def _scatter_add(vals, labels, nn):
    idx = jnp.where(labels >= 0, labels, nn).reshape(-1)
    out = (
        jnp.zeros((nn + 1,), jnp.int32)
        .at[idx]
        .add(vals.reshape(-1).astype(jnp.int32), mode="drop")
    )
    return out[:nn]


def _scatter_min(vals, labels, nn, fill):
    idx = jnp.where(labels >= 0, labels, nn).reshape(-1)
    out = (
        jnp.full((nn + 1,), fill, jnp.int32)
        .at[idx]
        .min(vals.reshape(-1), mode="drop")
    )
    return out[:nn]


def _diag_shifts(m):
    return (
        B.shift(m, 1, 1, False),
        B.shift(m, 1, -1, False),
        B.shift(m, -1, 1, False),
        B.shift(m, -1, -1, False),
    )


def pass_alive_area(stones, size, color):
    """[n, n] bool: `color`'s pass-alive strings + vital regions + pass-dead
    opponent regions. Semantics of Board::ComputePassAliveArea(color, true,
    true) (board.cc:1720-1901)."""
    import jax.numpy as jnp
    from jax import lax

    n = stones.shape[-1]
    nn = n * n
    mask = B.board_mask(size, n)
    own = (stones == color + 1) & mask
    other = mask & ~own                      # empty or opponent cells
    empty_real = (stones == EMPTY) & mask
    opp_real = (stones == 2 - color) & mask

    lbl_r = B.chain_labels(other)            # regions of non-color cells
    lbl_c = B.chain_labels(own)              # my chains
    flat = B.flat_iota(n)

    # --- potential vitality: every empty cell of the region touches my color,
    # opponent stones are auto-vital under no-suicide (board.cc:1756-1775) ---
    cell_ok = jnp.where(empty_real, B.nbr_or(own), True)
    region_bad = _scatter_or(other & ~cell_ok, lbl_r, nn)
    potential = ~region_bad                  # [nn] at region roots

    # --- candidate vital chains: <=4 chains around the region's min empty ---
    root_empty = _scatter_min(jnp.where(empty_real, flat, nn), lbl_r, nn, nn)
    nbrA = B._neighbor_labels(lbl_c)         # [4, n, n] chain next to each cell
    nbrA = jnp.where(empty_real[None], nbrA, -1)
    keep = B._dedup_dir_mask(nbrA)
    nbrA = jnp.where(keep, nbrA, -1)
    nbrA_flat = nbrA.reshape(4, nn)
    safe_root = jnp.clip(root_empty, 0, nn - 1)
    cand = jnp.where(
        root_empty < nn, nbrA_flat[:, safe_root], -1
    )                                        # [4, nn] candidate chain per region

    # --- vitality per (region, candidate slot): every empty cell of the
    # region is adjacent to that chain (board.cc:1914-1950) ---
    cand_at_cell = cand[:, jnp.clip(lbl_r, 0, None).reshape(-1)].reshape(
        (4,) + lbl_r.shape
    )                                        # [4, n, n] candidate of my region
    member = (nbrA[None, 0] == cand_at_cell) | (nbrA[None, 1] == cand_at_cell)
    member = member | (nbrA[None, 2] == cand_at_cell) | (nbrA[None, 3] == cand_at_cell)
    member = member & (cand_at_cell >= 0)
    vital = jnp.stack(
        [
            potential
            & (cand[i] >= 0)
            & ~_scatter_or(empty_real & ~member[i], lbl_r, nn)
            for i in range(4)
        ]
    )                                        # [4, nn] at region roots

    # --- Benson iteration over per-chain alive bits ---
    is_chain_root = (lbl_c == flat) & own
    alive0 = _scatter_or(own, lbl_c, nn)     # all chains start alive
    lbl_c_safe = jnp.clip(lbl_c, 0, None)

    def body(carry):
        alive, _ = carry
        alive_cell = alive[lbl_c_safe.reshape(-1)].reshape(n, n) & own
        dead_adj = B.nbr_or(own & ~alive_cell)
        usable = ~_scatter_or(other & dead_adj, lbl_r, nn)
        count = jnp.zeros((nn + 1,), jnp.int32)
        for i in range(4):
            flag = vital[i] & usable
            idx = jnp.where(flag, cand[i], nn)
            count = count.at[idx].add(flag.astype(jnp.int32), mode="drop")
        alive2 = alive & (count[:nn] >= 2)
        return alive2, jnp.any(alive2 != alive)

    alive, _ = lax.while_loop(
        lambda c: c[1], body, (alive0, jnp.array(True))
    )

    alive_cells = alive[lbl_c_safe.reshape(-1)].reshape(n, n) & own
    dead_adj = B.nbr_or(own & ~alive_cells)
    usable = ~_scatter_or(other & dead_adj, lbl_r, nn)
    vital_region = potential & usable
    vital_cells = other & vital_region[
        jnp.clip(lbl_r, 0, None).reshape(-1)
    ].reshape(n, n)

    # --- pass-dead opponent regions (board.cc:1882-2051) ---
    # `ocupied` at this stage = pass-ALIVE c stones + marked vital cells:
    # Benson's loop erased removed (dead) c strings back to empty
    # (board.cc:1817-1821), so dead c stones are region cells and can even
    # be potential eyes (IsPotentialEye only rejects real o stones).
    blockers = alive_cells | vital_cells
    others2 = mask & ~blockers
    lbl_r2 = B.chain_labels(others2)

    no_c_side = ~B.nbr_or(blockers)
    d1, d2, d3, d4 = _diag_shifts(blockers)
    corner_c = (
        d1.astype(jnp.int32)
        + d2.astype(jnp.int32)
        + d3.astype(jnp.int32)
        + d4.astype(jnp.int32)
    )
    m1, m2, m3, m4 = _diag_shifts(mask)
    corner_onboard = (
        m1.astype(jnp.int32)
        + m2.astype(jnp.int32)
        + m3.astype(jnp.int32)
        + m4.astype(jnp.int32)
    )
    interior = corner_onboard == 4
    corner_ok = jnp.where(interior, corner_c <= 1, corner_c == 0)
    cand_eye = others2 & ~opp_real & no_c_side
    is_eye = cand_eye & corner_ok

    # --- inner-region refinement (IsPotentialEye + ComputeInnerRegions,
    # board.cc:1964-2107): a corner cell belonging to a complement
    # component of the region that does NOT reach the board edge counts
    # as the region owner, rescuing false-eye life (two-headed dragons).
    # Only c-valued corners can change the verdict, and only c stones in
    # a blocker component that avoids the edge can be inner, so regions
    # are screened cheaply and at most INNER_SLOTS regions per board get
    # the exact border-flood (overflow falls back to the unrefined eye —
    # the reference's own heuristic is greedy here, board.cc:1968-1970).
    edge = mask & ~(
        B.shift(mask, 1, 0, False)
        & B.shift(mask, -1, 0, False)
        & B.shift(mask, 0, 1, False)
        & B.shift(mask, 0, -1, False)
    )
    border_blockers = B.flood(blockers & edge, blockers)
    maybe_inner = blockers & ~border_blockers
    i1, i2, i3, i4 = _diag_shifts(maybe_inner)
    corner_maybe = (
        i1.astype(jnp.int32)
        + i2.astype(jnp.int32)
        + i3.astype(jnp.int32)
        + i4.astype(jnp.int32)
    )
    rescuable = cand_eye & ~corner_ok & jnp.where(
        interior, corner_c - corner_maybe <= 1, corner_c == corner_maybe
    )
    need_region = _scatter_or(rescuable, lbl_r2, nn)         # at roots
    flat = B.flat_iota(n)
    root_order = jnp.argsort(jnp.where(need_region, flat.reshape(-1), nn))[
        :INNER_SLOTS
    ]
    slot_root = jnp.where(need_region.reshape(-1)[root_order], root_order, -1)

    def refine_one(root):
        in_region = lbl_r2 == root
        allowed = mask & ~in_region
        outer = B.flood(allowed & edge, allowed)
        inner = allowed & ~outer
        ni1, ni2, ni3, ni4 = _diag_shifts(blockers & ~inner)
        cc = (
            ni1.astype(jnp.int32)
            + ni2.astype(jnp.int32)
            + ni3.astype(jnp.int32)
            + ni4.astype(jnp.int32)
        )
        ok2 = jnp.where(interior, cc <= 1, cc == 0)
        return cand_eye & in_region & ok2 & (root >= 0)

    refined = jax.vmap(refine_one)(slot_root)                # [K, n, n]
    is_eye = is_eye | jnp.any(refined, axis=0)

    eye_count = _scatter_add(is_eye, lbl_r2, nn)
    same_reg_adj_eye = (
        (B.shift(is_eye, 1, 0, False) & (B.shift(lbl_r2, 1, 0, -1) == lbl_r2))
        | (B.shift(is_eye, -1, 0, False) & (B.shift(lbl_r2, -1, 0, -1) == lbl_r2))
        | (B.shift(is_eye, 0, 1, False) & (B.shift(lbl_r2, 0, 1, -1) == lbl_r2))
        | (B.shift(is_eye, 0, -1, False) & (B.shift(lbl_r2, 0, -1, -1) == lbl_r2))
    )
    adj_flag = _scatter_or(is_eye & same_reg_adj_eye, lbl_r2, nn)
    eff_eyes = eye_count - ((eye_count == 2) & adj_flag).astype(jnp.int32)
    pass_dead = eff_eyes < 2
    pass_dead_cells = others2 & pass_dead[
        jnp.clip(lbl_r2, 0, None).reshape(-1)
    ].reshape(n, n)

    return alive_cells | vital_cells | pass_dead_cells


def safe_and_ownership(stones, size):
    """(safe [n,n] bool, ownership [n,n] int32): both colors' pass-alive
    areas computed ONCE and shared between ComputeSafeArea and
    ComputeScoreArea (the encoder needs both, encoder.cc:193-222; the
    reference recomputes, board.cc:1602-1615 — here Benson is the single
    most expensive analysis so it is deduplicated)."""
    pa_b = pass_alive_area(stones, size, 0)
    pa_w = pass_alive_area(stones, size, 1)
    own = B.area_ownership(stones, size)
    own = jnp.where(pa_b, 1, own)
    own = jnp.where(pa_w, -1, own)
    return pa_b | pa_w, own


def safe_area(stones, size, mark_seki: bool = False):
    """[n, n] bool: pass-alive/pass-dead area of either color
    (Board::ComputeSafeArea(result, mark_seki), board.cc:1706-1718).
    With mark_seki, seki points are added (ComputeSekiPoints,
    board.cc:1693-1704)."""
    out = pass_alive_area(stones, size, 0) | pass_alive_area(stones, size, 1)
    if mark_seki:
        out = out | seki_points(stones, size)
    return out


def _unique_neighbor_label(lbl, at_mask):
    """Per cell: the label of adjacent `lbl` chains, or -1 if zero or
    more than one DISTINCT adjacent chain. Only meaningful where at_mask."""
    nbr = B._neighbor_labels(lbl)                   # [4, n, n]
    present = nbr >= 0
    mn = jnp.min(jnp.where(present, nbr, jnp.iinfo(jnp.int32).max), axis=0)
    mx = jnp.max(jnp.where(present, nbr, -1), axis=0)
    one = (mx >= 0) & (mn == mx)
    return jnp.where(at_mask & one, mx, -1), (mx >= 0) & (mn != mx)


def _chain_liberty_minmax(lbl, empty, nn):
    """(min, max) flat index of each chain's liberty cells, keyed by chain
    root. With exactly two liberties this IS the liberty set."""
    nbr = B._neighbor_labels(lbl)                   # chains adjacent to cells
    nbr = jnp.where(empty[None], nbr, -1)           # liberties only
    n = lbl.shape[-1]
    cell = B.flat_iota(n)[None].repeat(4, 0)
    lmin = jnp.full((nn + 1,), nn, jnp.int32)
    lmax = jnp.full((nn + 1,), -1, jnp.int32)
    for d in range(4):
        idx = jnp.where(nbr[d] >= 0, nbr[d], nn).reshape(-1)
        c = cell[d].reshape(-1)
        lmin = lmin.at[idx].min(c, mode="drop")
        lmax = lmax.at[idx].max(c, mode="drop")
    return lmin[:nn], lmax[:nn]


def _seki_parts(stones, size):
    """Shared core of seki_points / seki_at: everything except the
    per-candidate nakade analysis (which seki_points vmaps over the whole
    board and seki_at evaluates at one vertex).

    An empty point v is seki iff:
      - exactly one black and one white chain are orthogonally adjacent,
      - both chains have exactly 2 liberties,
      - and either the chains do NOT share both liberties (3-liberty union:
        treated as seki, false-seki included, board.cc:1007-1019), or no
        chain is an "inner" chain (simple no-eye seki), or the inner
        chain + v forms an eye space the surrounder cannot kill by nakade
        (bent-four-in-corner / squared-four / bulky-five / rabbitty-six /
        rectangular-six-in-corner are killable, board.cc:1153-1263).
    """
    n = stones.shape[-1]
    nn = n * n
    mask = B.board_mask(size, n)
    empty = (stones == EMPTY) & mask
    black = (stones == 1) & mask
    white = (stones == 2) & mask
    lbl_b = B.chain_labels(black)
    lbl_w = B.chain_labels(white)

    # one adjacent chain of each color (board.cc:966-986)
    ub, multi_b = _unique_neighbor_label(lbl_b, empty)
    uw, multi_w = _unique_neighbor_label(lbl_w, empty)
    cand = empty & (ub >= 0) & (uw >= 0) & ~multi_b & ~multi_w

    # both chains must have exactly two liberties (board.cc:988-999)
    libs_b = B.chain_liberty_counts(lbl_b, empty)
    libs_w = B.chain_liberty_counts(lbl_w, empty)
    ub_s = jnp.clip(ub, 0, nn - 1)
    uw_s = jnp.clip(uw, 0, nn - 1)
    cand = cand & (libs_b[ub_s] == 2) & (libs_w[uw_s] == 2)

    # liberty-union size: each chain's 2-liberty set as (min, max) flat idx
    bmin, bmax = _chain_liberty_minmax(lbl_b, empty, nn)
    wmin, wmax = _chain_liberty_minmax(lbl_w, empty, nn)
    shared_both = (bmin[ub_s] == wmin[uw_s]) & (bmax[ub_s] == wmax[uw_s])
    seki = cand & ~shared_both                       # 3-liberty union

    # inner chain: surrounded by exactly one opponent chain
    # (FindStringSurround counts distinct opponent strings, board.cc:1022-1029)
    def _sur_minmax(lbl_own, lbl_opp):
        nbr = B._neighbor_labels(lbl_opp)            # opp chains at each cell
        own_cell = lbl_own >= 0
        mn = jnp.full((nn + 1,), nn, jnp.int32)
        mx = jnp.full((nn + 1,), -1, jnp.int32)
        for d in range(4):
            val = jnp.where(own_cell & (nbr[d] >= 0), nbr[d], -1)
            idx = jnp.where(val >= 0, jnp.clip(lbl_own, 0, None), nn)
            mn = mn.at[idx.reshape(-1)].min(
                jnp.where(val >= 0, val, nn).reshape(-1), mode="drop"
            )
            mx = mx.at[idx.reshape(-1)].max(val.reshape(-1), mode="drop")
        return mn[:nn], mx[:nn]

    bsmin, bsmax = _sur_minmax(lbl_b, lbl_w)
    wsmin, wsmax = _sur_minmax(lbl_w, lbl_b)
    one_sur_b = (bsmax[ub_s] >= 0) & (bsmin[ub_s] == bsmax[ub_s])
    one_sur_w = (wsmax[uw_s] >= 0) & (wsmin[uw_s] == wsmax[uw_s])
    # reference checks black first (board.cc:1021-1026)
    inner_is_b = one_sur_b
    inner_is_w = ~one_sur_b & one_sur_w
    no_inner = ~one_sur_b & ~one_sur_w
    seki = seki | (cand & shared_both & no_inner)    # simple no-eye seki

    # eye-space nakade analysis for the remaining candidates
    csize_b = _scatter_add(black, lbl_b, nn)
    csize_w = _scatter_add(white, lbl_w, nn)
    need = cand & shared_both & ~no_inner
    inner_lbl = jnp.where(inner_is_b, ub, uw)
    eye_size = jnp.where(
        inner_is_b, csize_b[ub_s], csize_w[uw_s]
    ) + 1
    border = mask & ~(
        B.shift(mask, 1, 0, False)
        & B.shift(mask, -1, 0, False)
        & B.shift(mask, 0, 1, False)
        & B.shift(mask, 0, -1, False)
    )

    flat = B.flat_iota(n)

    def _killable(v_flat, lbl_v, is_b, esize):
        """IsKillableSekiEyeShape for one candidate (bounded 4..6 sizes)."""
        lblmap = jnp.where(is_b, lbl_b, lbl_w)
        region = (lblmap == lbl_v) & (lbl_v >= 0)
        region = region | (flat == v_flat)
        # orthogonal / diagonal region-neighbor counts per cell
        s_orth = (
            B.shift(region, 1, 0, False).astype(jnp.int32)
            + B.shift(region, -1, 0, False)
            + B.shift(region, 0, 1, False)
            + B.shift(region, 0, -1, False)
        )
        d1, d2, d3, d4 = _diag_shifts(region)
        s_diag = (
            d1.astype(jnp.int32) + d2 + d3 + d4
        )
        influence = s_orth + s_diag
        boundary_cnt = jnp.sum(region & border)
        nakade = region & (influence + 1 == esize) & (s_diag >= 1)
        nakade_cnt = jnp.sum(nakade)
        # representative nakade (the reference reads potential_eyes[0]; any
        # representative is equivalent in the shapes that reach these
        # branches, e.g. all four cells of a squared four are nakade with
        # identical eye counts) — use the min-flat-index one
        rep_flat = jnp.min(jnp.where(nakade, flat, nn))
        rep = nakade & (flat == rep_flat)
        eye_cnt = jnp.sum(jnp.where(rep, s_diag, 0))
        side_of_eye = jnp.sum(
            jnp.where(
                rep,
                d1 * B.shift(s_orth, 1, 1, 0)
                + d2 * B.shift(s_orth, 1, -1, 0)
                + d3 * B.shift(s_orth, -1, 1, 0)
                + d4 * B.shift(s_orth, -1, -1, 0),
                0,
            )
        )
        sq_kill = (eye_cnt == 1) & (side_of_eye == 2)
        k4 = (boundary_cnt == 4) | sq_kill           # bent/squared four
        k5 = sq_kill                                 # bulky five
        k6 = ((nakade_cnt == 1) & sq_kill) | (
            (nakade_cnt == 2) & (boundary_cnt == 4)
        )
        killable = jnp.where(
            esize <= 3,
            True,
            jnp.where(
                esize >= 7,
                False,
                jnp.where(
                    nakade_cnt == 0,
                    False,                           # alive -> not killable
                    jnp.where(
                        esize == 4, k4, jnp.where(esize == 5, k5, k6)
                    ),
                ),
            ),
        )
        return killable

    return seki, need, inner_lbl, inner_is_b, eye_size, _killable, flat


def seki_points(stones, size):
    """[n, n] bool seki map (Board::IsSeki, board.cc:961-1072 +
    IsKillableSekiEyeShape board.cc:1090-1267), fully vectorized: the
    per-candidate nakade pass is vmapped over every intersection."""
    import jax

    n = stones.shape[-1]
    seki, need, inner_lbl, inner_is_b, eye_size, _killable, flat = (
        _seki_parts(stones, size)
    )
    killable = jax.vmap(_killable)(
        flat.reshape(-1),
        inner_lbl.reshape(-1),
        inner_is_b.reshape(-1),
        eye_size.reshape(-1),
    ).reshape(n, n)
    return seki | (need & ~killable)


def seki_at(stones, size, v_flat):
    """Scalar bool: IsSeki at one flat vertex (board.cc:961) — the cheap
    single-point probe the search's score-bonus path needs
    (node.cc:813-831): only one nakade analysis instead of n*n."""
    n = stones.shape[-1]
    seki, need, inner_lbl, inner_is_b, eye_size, _killable, flat = (
        _seki_parts(stones, size)
    )
    v = jnp.clip(v_flat, 0, n * n - 1)
    f = seki.reshape(-1)[v]
    nd = need.reshape(-1)[v]
    killable = _killable(
        v,
        inner_lbl.reshape(-1)[v],
        inner_is_b.reshape(-1)[v],
        eye_size.reshape(-1)[v],
    )
    return f | (nd & ~killable)


def score_area_ownership(stones, size):
    """[n, n] int32 {-1, 0, +1}: reach-area ownership overridden by each
    color's pass-alive area (Board::ComputeScoreArea area rule,
    board.cc:1581-1616). +1 black, -1 white, 0 neutral."""
    _, own = safe_and_ownership(stones, size)
    return own


def remove_dead_stones(stones, size, helper_own):
    """[n, n] int8 board with helper-marked dead strings removed.

    Board::ComputeScoreArea's territory branch (board.cc:1581-1600): every
    stone whose color contradicts the territory-helper ownership is marked,
    and RemoveMarkedStrings drops the WHOLE string containing any marked
    stone. `helper_own` is [n, n] in {-1, 0, +1} (black +1), produced by the
    area-rule playout of Search::UpdateTerritoryHelper (search.cc:1139-1162).
    """
    n = stones.shape[-1]
    nn = n * n
    mask = B.board_mask(size, n)
    black = (stones == 1) & mask
    white = (stones == 2) & mask
    dead = jnp.zeros(stones.shape, bool)
    for color_mask, dead_owner in ((black, -1), (white, 1)):
        marked = color_mask & (helper_own == dead_owner)
        lbl = B.chain_labels(color_mask)
        dead_lbl = _scatter_or(marked, lbl, nn)
        dead = dead | jnp.where(
            lbl >= 0,
            dead_lbl[jnp.clip(lbl, 0, nn - 1).reshape(-1)].reshape(lbl.shape),
            False,
        )
    return jnp.where(dead, 0, stones).astype(stones.dtype)


def score_area_ownership_territory(stones, size, helper_own):
    """Territory-rule score area: remove helper-marked dead strings, then
    score the cleaned board under the area rule (board.cc:1581-1600)."""
    return score_area_ownership(
        remove_dead_stones(stones, size, helper_own), size
    )
