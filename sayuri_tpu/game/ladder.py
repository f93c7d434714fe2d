"""Vectorized exact ladder reading.

Re-derives the reference's ladder searcher (/root/reference/src/game/
board.cc:520-821: PreySelections / HunterSelections / PreyMove /
HunterMove / IsLadder / GetLadderMap) with the SAME branch-forking AND-OR
semantics: the prey tries its escape liberty plus every capture of an
adjacent hunter chain in atari, the hunter tries both prey liberties
(with the reference's pliberty pruning), and the board is forked at
multi-selection points. The search itself runs as lockstep bitboard
lanes with an explicit fork stack — see ops/ladder_kernel.py for the
full derivation and the (budget-shaped) deviations.

This module is the front-end: candidate-chain discovery (chains with 1
or 2 liberties, board.cc:795-813), lane assembly (one lane per
candidate x first-hunter branch), and GetLadderMap's plane marking
(board.cc:1618-1691):

- 1-lib ladder chains -> death; their capture point -> take
- 2-lib ladder chains -> escapable; winning atari points -> atari

Results feed the 4 encoder ladder planes [death, escapable, atari, take]
(encoder.cc:248-265).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sayuri_tpu.game import board as B
from sayuri_tpu.game.types import EMPTY, NO_VERTEX

# ladder classification results (shared with ops/ladder_kernel.py)
UNDECIDED = 0
PREY_GOOD = 1
HUNTER_GOOD = 2


def max_chains(n):
    """Per-board simulation slots for candidate chains (chains with 1 or
    2 libs). The reference searches EVERY such chain (GetLadderMap scans
    all strings, board.cc:1629-1641); observed maxima over golden games
    are 17 (9x9) and 48 (19x19), so n*n//4 slots (90 at 19x19, ~1.9x the
    observed max) cover real positions with margin. Invalid slots
    converge instantly in the lockstep search (and lanes are compacted
    valid-first), but every slot still pays lane assembly + the two
    compaction argsorts, so the margin is deliberately not larger."""
    return max(24, (n * n) // 4)


# back-compat alias used by tools; per-size value preferred
MAX_CHAINS = 24


def _single_vertex_legal(stones, mask, empty, libs_map, v, color, ko):
    """IsLegalMove for one vertex without building the full board mask."""
    n = stones.shape[-1]
    vm = (B.flat_iota(n).reshape(-1) == v).reshape(n, n)
    nbr = B.nbr_or(vm)
    own = (stones == color + 1) & mask
    opp = (stones == 2 - color) & mask
    is_empty = jnp.sum(jnp.where(vm, empty, False)) > 0
    has_empty_nb = jnp.any(nbr & empty)
    own_safe = jnp.any(nbr & own & (libs_map >= 2))
    opp_cap = jnp.any(nbr & opp & (libs_map == 1))
    return is_empty & (has_empty_nb | own_safe | opp_cap) & (v != ko)


def _chain_lib_vertices(labels, empty, n):
    """Per-chain-root first and second liberty vertices ([nn] int32 each,
    nn where absent), via scatter-min of liberty indices into roots."""
    nn = n * n
    flat = B.flat_iota(n)
    nbr_lbl = B._neighbor_labels(labels)
    nbr_lbl = jnp.where(empty[None], nbr_lbl, -1)
    idx4 = jnp.broadcast_to(flat.reshape(-1), (4, nn))
    tgt = jnp.where(
        nbr_lbl.reshape(4, -1) >= 0, nbr_lbl.reshape(4, -1), nn
    )
    lib1 = (
        jnp.full((nn + 1,), nn, jnp.int32)
        .at[tgt.reshape(-1)]
        .min(idx4.reshape(-1), mode="drop")[: nn + 1]
    )
    is_first = idx4 == lib1[jnp.clip(tgt, 0, nn)]
    tgt2 = jnp.where(is_first, nn, tgt)
    lib2 = (
        jnp.full((nn + 1,), nn, jnp.int32)
        .at[tgt2.reshape(-1)]
        .min(idx4.reshape(-1), mode="drop")[:nn]
    )
    return lib1[:nn], lib2


def _prep_candidates(stones, size, ko, M=None):
    """Single-board candidate prep for the chase lanes: roots, libs,
    first-two liberty vertices, hunter-move legality. All label-map based
    (no per-candidate floods)."""
    n = stones.shape[-1]
    nn = n * n
    if M is None:
        M = max_chains(n)
    mask = B.board_mask(size, n)
    empty = (stones == EMPTY) & mask
    own_b = (stones == 1) & mask
    own_w = (stones == 2) & mask
    lbl_b = B.chain_labels(own_b)
    lbl_w = B.chain_labels(own_w)
    labels = jnp.where(lbl_b >= 0, lbl_b, lbl_w)
    libs_map = B.chain_liberty_map(own_b, lbl_b, empty) + B.chain_liberty_map(
        own_w, lbl_w, empty
    )
    flat = B.flat_iota(n)
    is_root = (labels == flat) & (labels >= 0)
    root_libs = jnp.where(is_root, libs_map, 0)
    cand = is_root & ((root_libs == 1) | (root_libs == 2))
    order = jnp.argsort(
        jnp.where(cand.reshape(-1), flat.reshape(-1), nn)
    )[:M]
    cand_v = jnp.where(cand.reshape(-1)[order], order, -1)   # [M]

    lib1, lib2 = _chain_lib_vertices(labels, empty, n)
    root_safe = jnp.maximum(cand_v, 0)
    l1 = lib1[root_safe]
    l2 = lib2[root_safe]
    nlibs = root_libs.reshape(-1)[root_safe]
    color = jnp.where(stones.reshape(-1)[root_safe] == 1, 0, 1)

    def legal_at(v, c):
        return _single_vertex_legal(
            stones, mask, empty, libs_map, jnp.minimum(v, nn - 1), c, ko
        ) & (v < nn)

    legal_a = jax.vmap(legal_at)(l1, 1 - color)
    legal_b = jax.vmap(legal_at)(l2, 1 - color)
    return dict(
        labels=labels,
        cand_v=cand_v,
        l1=l1,
        l2=l2,
        nlibs=nlibs,
        color=color,
        legal_a=legal_a,
        legal_b=legal_b,
    )


def _prep_candidates_kernel(stones, size, ko, M):
    """Batched candidate prep on the Pallas prep kernel
    (ops/analysis.ladder_prep_tpu): the per-board label/liberty/legality
    fixpoints run in-kernel (~25 ms -> ~2 ms at B=256 on v5e); only the
    cheap top-M candidate extraction stays in XLA. Output-compatible
    with the vmapped `_prep_candidates`."""
    from sayuri_tpu.ops.analysis import ladder_prep_tpu

    b, n = stones.shape[0], stones.shape[-1]
    nn = n * n
    k = ladder_prep_tpu(stones, size, ko)
    labels = k["labels"]                               # [B, nn]
    nlibs = k["nlibs"]
    iota = jnp.arange(nn, dtype=jnp.int32)[None]
    is_root = (labels == iota) & (labels >= 0)
    cand = is_root & ((nlibs == 1) | (nlibs == 2))
    order = jnp.argsort(jnp.where(cand, iota, nn), axis=1)[:, :M]
    bb = jnp.arange(b)[:, None]
    cand_v = jnp.where(cand[bb, order], order, -1)     # [B, M]
    root_safe = jnp.maximum(cand_v, 0)
    l1 = k["lib1"][bb, root_safe]
    l2 = k["lib2"][bb, root_safe]
    nl = nlibs[bb, root_safe]
    stones_flat = stones.reshape(b, nn)
    color = jnp.where(stones_flat[bb, root_safe] == 1, 0, 1)
    # hunter = opponent of the candidate chain; probe both color maps at
    # l1/l2 and select per candidate
    l1s = jnp.minimum(l1, nn - 1)
    l2s = jnp.minimum(l2, nn - 1)
    hunter_is_b = color == 1
    legal_a = (
        jnp.where(
            hunter_is_b,
            k["legal_black"][bb, l1s],
            k["legal_white"][bb, l1s],
        )
        & (l1 < nn)
    )
    legal_b = (
        jnp.where(
            hunter_is_b,
            k["legal_black"][bb, l2s],
            k["legal_white"][bb, l2s],
        )
        & (l2 < nn)
    )
    return dict(
        labels=labels,
        cand_v=cand_v,
        l1=l1,
        l2=l2,
        nlibs=nl,
        color=color,
        legal_a=legal_a,
        legal_b=legal_b,
    )


def ladder_planes_batch(stones, size, ko=None, use_kernel=None):
    """[B, n, n, 4] float32 ladder planes for a batch of boards.

    On TPU the exact chases run inside the Pallas ladder kernel
    (ops/ladder_kernel.py) — one lane per (candidate, branch); elsewhere
    the SAME search body runs as plain XLA (run_chases_xla). `use_kernel`
    overrides the platform check (tests run the kernel in interpret mode
    on CPU)."""
    from sayuri_tpu.ops import ladder_kernel as LK

    if use_kernel is None:
        use_kernel = B._use_pallas()

    b, n = stones.shape[0], stones.shape[-1]
    nn = n * n
    if ko is None:
        ko = jnp.full((b,), NO_VERTEX, jnp.int32)

    M = max_chains(n)
    if use_kernel:
        prep = _prep_candidates_kernel(stones, size, ko, M)
    else:
        prep = jax.vmap(lambda s, z, k: _prep_candidates(s, z, k, M))(
            stones, size, ko
        )
    cand_v = prep["cand_v"]          # [B, M]
    valid = cand_v >= 0
    nlibs = prep["nlibs"]
    color = prep["color"]
    l1, l2 = prep["l1"], prep["l2"]
    legal_a, legal_b = prep["legal_a"], prep["legal_b"]

    mask_b = jax.vmap(lambda z: B.board_mask(z, n))(size)
    bwords = LK.pack_bitboards((stones == 1) & mask_b)      # [B, 32]
    wwords = LK.pack_bitboards((stones == 2) & mask_b)

    own = jnp.where(
        (color == 0)[:, :, None], bwords[:, None], wwords[:, None]
    )                                                        # [B, M, 32]
    opp = jnp.where(
        (color == 0)[:, :, None], wwords[:, None], bwords[:, None]
    )
    # two chase lanes per candidate:
    # lane 0: atari chase (1 lib) or first-liberty hunter branch (2 libs)
    # lane 1: second-liberty hunter branch (2 libs only)
    fh0 = jnp.where(nlibs == 1, NO_VERTEX, l1)
    ok0 = valid & ((nlibs == 1) | ((nlibs == 2) & legal_a))
    fh1 = l2
    ok1 = valid & (nlibs == 2) & legal_b

    def lanes(x0, x1):
        return jnp.stack([x0, x1], axis=2).reshape(b * M * 2, -1).squeeze(-1)

    own2 = jnp.broadcast_to(own[:, :, None], (b, M, 2, LK.ROWS)).reshape(
        b * M * 2, LK.ROWS
    )
    opp2 = jnp.broadcast_to(opp[:, :, None], (b, M, 2, LK.ROWS)).reshape(
        b * M * 2, LK.ROWS
    )
    size_l = jnp.broadcast_to(size[:, None, None], (b, M, 2)).reshape(-1)
    ko_l = jnp.broadcast_to(ko[:, None, None], (b, M, 2)).reshape(-1)
    prey_l = jnp.broadcast_to(
        jnp.maximum(cand_v, 0)[:, :, None], (b, M, 2)
    ).reshape(-1)
    fh_l = lanes(fh0[..., None], fh1[..., None])
    ok_l = lanes(ok0[..., None].astype(jnp.int32),
                 ok1[..., None].astype(jnp.int32))

    # compact valid lanes to the front so the lockstep chunks that do real
    # work are few (invalid lanes converge in one iteration anyway)
    perm = jnp.argsort(ok_l == 0, stable=True)
    inv = jnp.argsort(perm)
    permuted = [
        x[perm]
        for x in (own2, opp2, size_l, ko_l, prey_l, fh_l, ok_l)
    ]

    # two-phase exact search: a stack-free greedy pass resolves every
    # chain-shaped (fork-free) chase — the common case — and flags the
    # lanes that hit a multi-selection point; only those re-run under the
    # fork-stack DFS, compacted to the front so idle chunks exit at once.
    # On TPU each phase dispatches on the ACTIVE lane count to a prefix
    # bucket (lax.switch over static sizes): real boards have tens of
    # candidate chains, so the grid runs 1-2 chunks instead of
    # ceil(B*M*2 / chunk) mostly-idle ones.
    Ltot = permuted[0].shape[0]

    def bucketed(runner, args, n_active, chunk):
        sizes = []
        s = chunk
        while s < Ltot:
            sizes.append(s)
            s *= 4
        sizes.append(Ltot)
        if not use_kernel or len(sizes) == 1:
            return runner(*args, n)
        branches = []
        for sz in sizes:
            def br(args, sz=sz):
                outs = runner(*[x[:sz] for x in args], n)
                if not isinstance(outs, tuple):
                    outs = (outs,)
                full = tuple(
                    jnp.zeros((Ltot,), o.dtype).at[:sz].set(o)
                    for o in outs
                )
                return full if len(full) > 1 else full[0]
            branches.append(br)
        which = jnp.searchsorted(
            jnp.asarray(sizes, jnp.int32), n_active.astype(jnp.int32)
        )
        return jax.lax.switch(
            jnp.minimum(which, len(sizes) - 1), branches, args
        )

    g_runner = LK.run_greedy if use_kernel else LK.run_greedy_xla
    runner = LK.run_chases if use_kernel else LK.run_chases_xla
    n_act = jnp.sum(permuted[6] > 0)
    res_g, forked = bucketed(g_runner, tuple(permuted), n_act, 512)
    fv = (forked > 0) & (permuted[6] > 0)
    perm2 = jnp.argsort(~fv, stable=True)
    inv2 = jnp.argsort(perm2)
    dfs_args = tuple(
        [x[perm2] for x in permuted[:6]] + [fv[perm2].astype(jnp.int32)]
    )
    res_d = bucketed(runner, dfs_args, jnp.sum(fv), 128)[inv2]
    res = jnp.where(fv, res_d, res_g)[inv].reshape(b, M, 2)

    died = (nlibs == 1) & valid & (res[..., 0] == HUNTER_GOOD)
    vital_a = (nlibs == 2) & ok0 & (res[..., 0] == HUNTER_GOOD)
    vital_b = (nlibs == 2) & ok1 & (res[..., 1] == HUNTER_GOOD)
    is_ladder = vital_a | vital_b

    labels = prep["labels"].reshape(b, 1, nn)
    chain_of = (labels == jnp.maximum(cand_v, 0)[:, :, None]) & valid[
        :, :, None
    ]                                                        # [B, M, nn]
    cells = jnp.arange(nn)
    oh_l1 = (l1[:, :, None] == cells) & (l1[:, :, None] < nn)
    oh_l2 = (l2[:, :, None] == cells) & (l2[:, :, None] < nn)

    # stone marks (death/escapable) live on disjoint chains; vital-move
    # marks (take/atari) follow GetLadderMap's raster overwrite
    # (board.cc:1673-1685): chains are scanned in ascending root order
    # and the LAST chain to mark a cell wins, so when two chains share a
    # vital cell the higher-root chain's mark type replaces the other.
    death = jnp.any(chain_of & died[:, :, None], axis=1)
    esc = jnp.any(chain_of & is_ladder[:, :, None], axis=1)

    mark_take = oh_l1 & died[:, :, None]                     # [B, M, nn]
    mark_atari = (oh_l1 & vital_a[:, :, None]) | (oh_l2 & vital_b[:, :, None])
    m_iota = jnp.arange(M)[None, :, None]
    last = jnp.max(
        jnp.where(mark_take | mark_atari, m_iota, -1), axis=1
    )                                                        # [B, nn]
    win = m_iota == last[:, None, :]
    take = jnp.any(mark_take & win, axis=1)
    atari = jnp.any(mark_atari & win, axis=1)
    out = jnp.stack(
        [
            death.reshape(b, n, n),
            esc.reshape(b, n, n),
            atari.reshape(b, n, n),
            take.reshape(b, n, n),
        ],
        axis=-1,
    )
    return out.astype(jnp.float32)


def ladder_planes(stones, size, ko=None, use_kernel=False):
    """[n, n, 4] float32 ladder planes of a single board (batch front-end
    with B=1; plain-XLA search unless `use_kernel`)."""
    if ko is None:
        ko = jnp.int32(NO_VERTEX)
    return ladder_planes_batch(
        stones[None],
        jnp.asarray(size).reshape(1),
        jnp.asarray(ko).reshape(1),
        use_kernel=use_kernel,
    )[0]
