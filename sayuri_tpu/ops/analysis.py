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

Everything is elementwise + on-core fixpoints over [C, n*n] flattened
boards in VMEM (lane-dim shifts only — see ops/flood.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128
INTERPRET = False  # tests flip this to run the kernel on CPU
_BIG = 1e9  # plain python float: jnp constants at module scope leak into kernels
_NUM_LIBS = 5  # count liberties up to 5 (planes need 1..4 exactly)


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


def _nbr_min(x, n):
    lf, rt, up, dn = _nbrs(x, n, _BIG)
    return jnp.minimum(jnp.minimum(lf, rt), jnp.minimum(up, dn))


def _min_prop(values, mask, n):
    """Fixpoint: component-wise minimum of `values` over `mask` chains
    (segmented run-min sweeps, ops/prop.py: O(#bends) sweeps of log-shift
    scans instead of O(diameter) single-cell hops)."""
    from sayuri_tpu.ops import prop as P

    return P.min_prop(values, mask, n)


def _flood(seed, allowed, n):
    from sayuri_tpu.ops import prop as P

    return P.flood(seed, allowed, n)


def _chain_liberty_props(color_mask, empty, n):
    """(labels, kth_lib[0.._NUM_LIBS-1]) for one color.

    labels: component-min flat index (f32, _BIG off-chain).
    kth_lib[k]: the chain's (k+1)-th smallest liberty index, broadcast to
    every chain cell (_BIG when the chain has <= k liberties)."""
    idxf = _idx(color_mask.shape).astype(jnp.float32)
    labels = _min_prop(idxf, color_mask, n)

    kths = []
    prev = []
    for _k in range(_NUM_LIBS):
        # per-cell: min adjacent empty index not in {prev kth's}
        cand = _BIG * jnp.ones_like(idxf)
        for nb in _nbrs(jnp.where(empty > 0, idxf, _BIG), n, _BIG):
            keep = nb < _BIG
            for p in prev:
                keep = keep & (nb != p)
            cand = jnp.minimum(cand, jnp.where(keep, nb, _BIG))
        kth = _min_prop(cand, color_mask, n)
        kths.append(kth)
        prev.append(kth)
    return labels, kths


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


def _benson(c, opp_real, empty, mask, n):
    """In-kernel pass-alive area for one color: Benson + vital regions +
    pass-dead opponent regions, mirroring game/analysis.py's XLA
    implementation exactly (same inner-region approximation). All
    aggregations are min/or-propagations — no scatters."""
    idxf = _idx(c.shape).astype(jnp.float32)
    other = mask * (1.0 - c)

    # --- potential vitality ---
    bad = empty * (1.0 - _nbr_or(c, n)) * other
    not_potential = _flood(bad, other, n)
    potential = other * (1.0 - not_potential)

    # --- chain / candidate setup ---
    lbl_c = _min_prop(idxf, c, n)                    # chain labels (f32)
    lbl_c_v = jnp.where(c > 0, lbl_c, _BIG)
    nbrl = _nbrs(lbl_c_v, n, _BIG)                   # 4 neighbor chain labels

    first_empty = _min_prop(jnp.where(empty > 0, idxf, _BIG), other, n)
    is_root = empty * (idxf == first_empty).astype(jnp.float32) * other

    # k-th distinct neighbor chain label at each cell (<=4)
    s = []
    for k in range(4):
        cand = _BIG * jnp.ones_like(idxf)
        for nb in nbrl:
            keep = nb < _BIG
            for p in s:
                keep = keep & (nb != p)
            cand = jnp.minimum(cand, jnp.where(keep, nb, _BIG))
        s.append(cand)
    # broadcast the ROOT cell's candidates over the region
    cand_R = [
        _min_prop(jnp.where(is_root > 0, sk, _BIG), other, n) for sk in s
    ]

    # vitality per slot: every empty in the region adjacent to that chain
    vital = []
    for ck in cand_R:
        adj = jnp.zeros_like(idxf)
        for nb in nbrl:
            adj = jnp.maximum(adj, (nb == ck).astype(jnp.float32))
        bad_k = empty * other * (1.0 - adj)
        not_vital = _flood(bad_k, other, n)
        vital.append(
            potential * (1.0 - not_vital) * (ck < _BIG).astype(jnp.float32)
        )

    # --- Benson iteration over per-chain alive bits ---
    lbl_r = _min_prop(idxf, other, n)
    lbl_r_v = jnp.where(other > 0, lbl_r, _BIG)
    nbr_r = _nbrs(lbl_r_v, n, _BIG)                  # region roots next door
    my = lbl_c_v
    # precompute direction-wise (neighbor cand_k == my chain) masks; only
    # the usable factor changes between rounds
    nbr_match = []   # [4][K] bool-as-f32: neighbor's slot-k chain is mine
    nbr_vk_base = []  # [4][K] neighbor vital flags (pre-usable)
    for ck, vk in zip(cand_R, vital):
        ck_v = jnp.where(other > 0, ck, _BIG)
        m4 = _nbrs(ck_v, n, _BIG)
        v4 = _nbrs(vk, n, 0.0)
        nbr_match.append([(m4[d] == my).astype(jnp.float32) for d in range(4)])
        nbr_vk_base.append([v4[d] for d in range(4)])

    def alive_round(alive_cell):
        dead_adj = _nbr_or(c * (1.0 - alive_cell), n)
        unusable = _flood(other * dead_adj, other, n)
        usable = other * (1.0 - unusable)
        nbr_us = _nbrs(usable, n, 0.0)
        vr = _BIG * jnp.ones_like(idxf)
        for d in range(4):
            flag = jnp.zeros_like(idxf)
            for k in range(len(cand_R)):
                flag = jnp.maximum(
                    flag, nbr_vk_base[k][d] * nbr_match[k][d]
                )
            flag = flag * nbr_us[d]
            vr = jnp.minimum(vr, jnp.where(flag > 0, nbr_r[d], _BIG))
        first = _min_prop(vr, c, n)
        vr2 = jnp.where(vr != first, vr, _BIG)
        second = _min_prop(vr2, c, n)
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
    is_eye = others2 * (1.0 - opp_real) * no_c_side * corner_ok

    e1 = _min_prop(jnp.where(is_eye > 0, idxf, _BIG), others2, n)
    e2 = _min_prop(
        jnp.where((is_eye > 0) & (idxf != e1), idxf, _BIG), others2, n
    )
    e3 = _min_prop(
        jnp.where((is_eye > 0) & (idxf != e1) & (idxf != e2), idxf, _BIG),
        others2,
        n,
    )
    r1, c1 = jnp.floor(e1 / n), e1 % n
    r2, c2 = jnp.floor(e2 / n), e2 % n
    adj12 = (jnp.abs(r1 - r2) + jnp.abs(c1 - c2)) == 1.0
    eff_ge2 = ((e2 < _BIG) & ~adj12) | (e3 < _BIG)
    pass_dead = others2 * (1.0 - eff_ge2.astype(jnp.float32))

    return jnp.minimum(jnp.maximum(alive, jnp.maximum(vital_final, pass_dead)), 1.0)


def _analysis_kernel(n, stones_ref, size_ref, ko_ref, tm_ref,
                     legal_ref, libs_ref, own_ref, safe_ref, sown_ref):
    nn = n * n
    stones = stones_ref[:].astype(jnp.float32)       # [C, nn] 0/1/2
    size = size_ref[:].astype(jnp.float32)           # [C, 1]
    ko = ko_ref[:].astype(jnp.float32)               # [C, 1]
    tm = tm_ref[:].astype(jnp.float32)               # [C, 1] 0/1

    idx = _idx(stones.shape)
    row = (idx // n).astype(jnp.float32)
    col_f = (idx % n).astype(jnp.float32)
    mask = ((row < size) & (col_f < size)).astype(jnp.float32)

    black = (stones == 1.0) * mask
    white = (stones == 2.0) * mask
    empty = (stones == 0.0) * mask

    lbl_b, libs_b = _chain_liberty_props(black, empty, n)
    lbl_w, libs_w = _chain_liberty_props(white, empty, n)

    # liberty count capped at _NUM_LIBS
    def count(kths, cmask):
        c = jnp.zeros_like(cmask)
        for kth in kths:
            c = c + (kth < _BIG).astype(jnp.float32)
        return c * cmask

    cnt_b = count(libs_b, black)
    cnt_w = count(libs_w, white)
    libs_ref[:] = (cnt_b + cnt_w).astype(jnp.int32)

    # legality (board.py legal_moves semantics): empty & in-board & not-ko
    # & (empty nbr | own chain with >=2 libs nbr | opp chain in atari nbr)
    own_is_b = tm == 0.0
    own_cnt = jnp.where(own_is_b, cnt_b, cnt_w)
    opp_cnt = jnp.where(own_is_b, cnt_w, cnt_b)
    has_empty_nb = _nbr_or(empty, n)
    own_safe_nb = _nbr_or((own_cnt >= 2.0).astype(jnp.float32), n)
    opp_cap_nb = _nbr_or((opp_cnt == 1.0).astype(jnp.float32), n)
    not_ko = (idx.astype(jnp.float32) != ko).astype(jnp.float32)
    legal = empty * not_ko * jnp.maximum(
        has_empty_nb, jnp.maximum(own_safe_nb, opp_cap_nb)
    )
    legal_ref[:] = legal > 0.5

    # Tromp-Taylor reach ownership
    reach_b = _flood(empty * _nbr_or(black, n), empty, n)
    reach_w = _flood(empty * _nbr_or(white, n), empty, n)
    own = (
        black
        - white
        + reach_b * (1.0 - reach_w)
        - reach_w * (1.0 - reach_b)
    )
    own_ref[:] = own.astype(jnp.int32)

    # Benson pass-alive/pass-dead areas + score-area ownership
    # (ComputeSafeArea / ComputeScoreArea, board.cc:1581-1718)
    pa_b = _benson(black, white, empty, mask, n)
    pa_w = _benson(white, black, empty, mask, n)
    safe_ref[:] = (pa_b + pa_w) > 0.5
    sown = jnp.where(pa_b > 0, 1.0, own)
    sown = jnp.where(pa_w > 0, -1.0, sown)
    sown_ref[:] = sown.astype(jnp.int32)


def _apply_move(stones, tm, action, empty, mask, n):
    """In-kernel play_move (board.py play_move semantics): place the stone,
    remove opponent chains left with no liberty, compute the simple-ko
    vertex. Returns (stones2, n_cap [C,1], ko2 [C,1], is_pass [C,1])."""
    nn = n * n
    idxf = _idx(stones.shape).astype(jnp.float32)
    v = action  # [C, 1] f32
    is_pass = (v >= float(nn)).astype(jnp.float32)
    onehot = (idxf == v).astype(jnp.float32) * mask * (1.0 - is_pass)

    own_c = tm + 1.0
    opp_c = 2.0 - tm
    stones1 = stones * (1.0 - onehot) + onehot * own_c

    opp1 = jnp.zeros_like(stones1)
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
    grp = _flood(onehot, own2, n)
    grp_size = jnp.sum(grp, axis=1, keepdims=True)
    grp_libs = jnp.sum(_nbr_or(grp, n) * empty2, axis=1, keepdims=True)
    cap_v = jnp.min(
        jnp.where(captured > 0, idxf, _BIG), axis=1, keepdims=True
    )
    is_ko = (
        (n_cap == 1.0) & (grp_size == 1.0) & (grp_libs == 1.0)
    ).astype(jnp.float32)
    ko2 = jnp.where((is_ko > 0) & (is_pass == 0.0), cap_v, -1.0)

    out_stones = jnp.where(is_pass > 0, stones, stones2)
    out_ncap = n_cap * (1.0 - is_pass)
    return out_stones, out_ncap, ko2, is_pass


def _step_analysis_kernel(n, stones_ref, size_ref, ko_ref, tm_ref, act_ref,
                          new_stones_ref, ncap_ref, ko2_ref,
                          legal_ref, libs_ref, own_ref, safe_ref, sown_ref):
    """step + full child-position analysis in one launch: the entire
    per-simulation board work (env transition + everything the encoder and
    legality need at the leaf)."""
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

    # analysis of the CHILD position: side to move flips
    tm2 = 1.0 - tm
    black = (stones2 == 1.0) * mask
    white = (stones2 == 2.0) * mask
    empty2 = (stones2 == 0.0) * mask

    _, libs_b = _chain_liberty_props(black, empty2, n)
    _, libs_w = _chain_liberty_props(white, empty2, n)

    def count(kths, cmask):
        c = jnp.zeros_like(cmask)
        for kth in kths:
            c = c + (kth < _BIG).astype(jnp.float32)
        return c * cmask

    cnt_b = count(libs_b, black)
    cnt_w = count(libs_w, white)
    libs_ref[:] = (cnt_b + cnt_w).astype(jnp.int32)

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

    reach_b = _flood(empty2 * _nbr_or(black, n), empty2, n)
    reach_w = _flood(empty2 * _nbr_or(white, n), empty2, n)
    own = (
        black - white + reach_b * (1.0 - reach_w) - reach_w * (1.0 - reach_b)
    )
    own_ref[:] = own.astype(jnp.int32)

    pa_b = _benson(black, white, empty2, mask, n)
    pa_w = _benson(white, black, empty2, mask, n)
    safe_ref[:] = (pa_b + pa_w) > 0.5
    sown = jnp.where(pa_b > 0, 1.0, own)
    sown = jnp.where(pa_w > 0, -1.0, sown)
    sown_ref[:] = sown.astype(jnp.int32)


def step_and_analyze_tpu(stones, size, ko, to_move, action):
    """Batched env-step + child analysis in one Pallas launch.

    Inputs: [B, n, n] stones + [B] scalars + [B] actions (>= n*n = pass).
    Returns dict(new_stones [B,n,n] i32, n_captured [B], new_ko [B],
    legal [B,nn] bool, libs/ownership/safe/score_ownership [B,n,n])."""
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
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (chunk, sh), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            for sh in (nn, 1, 1, nn, nn, nn, nn, nn)
        ),
        interpret=INTERPRET,
    )(prep(stones), prep(size), prep(ko), prep(to_move), prep(action))
    sl = slice(0, b)
    new_stones, ncap, ko2, legal, libs, own, safe, sown = outs
    return {
        "new_stones": new_stones[sl].reshape(b, n, n),
        "n_captured": ncap[sl].reshape(b),
        "new_ko": ko2[sl].reshape(b),
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
    )(stones_f, size_f, ko_f, tm_f)
    sl = slice(0, b)
    return {
        "legal": legal[sl],
        "libs": libs[sl].reshape(b, n, n),
        "ownership": own[sl].reshape(b, n, n),
        "safe": safe[sl].reshape(b, n, n),
        "score_ownership": sown[sl].reshape(b, n, n),
    }
