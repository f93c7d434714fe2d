"""Vectorized ladder reading.

Re-derives the reference's ladder searcher (/root/reference/src/game/
board.cc:484-821: PreySelections / HunterSelections / PreyMove / HunterMove /
IsLadder / GetLadderMap) as a fixed-depth, branch-free principal-variation
rollout so it runs under jit/vmap:

- prey in atari plays its single liberty (escape), or captures an adjacent
  hunter chain in atari when the escape is hopeless (upper liberty bound <= 1,
  board.cc:561-571);
- hunter answers on whichever of the prey's two liberties keeps the chase
  going, preferring the outside liberty (more empty neighbors), mirroring the
  pruning rules of HunterSelections (board.cc:605-638);
- the reference forks the board and tries BOTH options at the rare branch
  points; this implementation commits to the greedy choice instead. The
  known effect is mis-reading exotic multi-branch ladders; plain ladders,
  the overwhelmingly common case, agree.

Results feed the 4 encoder ladder planes [death, escapable, atari, take]
(encoder.cc:248-265) with GetLadderMap's marking rules (board.cc:1618-1691).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sayuri_tpu.game import board as B
from sayuri_tpu.game.types import EMPTY, NO_VERTEX

# ladder classification results
UNDECIDED = 0
PREY_GOOD = 1
HUNTER_GOOD = 2

# per-board simulation slots for candidate chains (chains with 1 or 2 libs);
# positions with more candidates than slots silently skip the extras, like
# the reference's kMaxLadderNodes search cap skips deep reads (types.h:68)
MAX_CHAINS = 12


def _analyze(stones, mask):
    """Labels + per-cell chain liberty/size maps for both colors at once."""
    empty = (stones == EMPTY) & mask
    own_b = (stones == 1) & mask
    own_w = (stones == 2) & mask
    lbl_b = B.chain_labels(own_b)
    lbl_w = B.chain_labels(own_w)
    libs_b = B.chain_liberty_map(own_b, lbl_b, empty)
    libs_w = B.chain_liberty_map(own_w, lbl_w, empty)
    return empty, (lbl_b, lbl_w), libs_b + libs_w


def _chain_mask(stones, mask, v, color):
    """Chain containing vertex v of `color` (one-hot flood)."""
    n = stones.shape[-1]
    seed = (B.flat_iota(n).reshape(-1) == v).reshape(n, n)
    return B.flood(seed, (stones == color + 1) & mask)


def _pliberties(empty, v, n):
    """CountPliberties: empty 4-neighbors of vertex v (board.cc:485)."""
    vm = (B.flat_iota(n).reshape(-1) == v).reshape(n, n)
    return jnp.sum(B.nbr_or(vm) & empty, dtype=jnp.int32)


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


def _ladder_liberty_bounds(stones, mask, empty, libs_map, v, color):
    """GetLadderLiberties bounds for playing at v (board.cc:484-518).

    Returns (lower, upper) estimates of the prey's liberties if it plays v.
    Uses per-cell maps instead of walking strings: for each neighbor dir,
    own chains contribute libs-1 (sum and max), opponent chains in atari
    contribute their stone count to the capture upside."""
    n = stones.shape[-1]
    vm = (B.flat_iota(n).reshape(-1) == v).reshape(n, n)
    stone_libs = jnp.sum(B.nbr_or(vm) & empty, dtype=jnp.int32)

    own = (stones == color + 1) & mask
    opp = (stones == 2 - color) & mask
    lbl_own = B.chain_labels(own)
    lbl_opp = B.chain_labels(opp)
    sizes_opp = jnp.zeros((n * n + 1,), jnp.int32).at[
        jnp.where(opp, lbl_opp, n * n).reshape(-1)
    ].add(1, mode="drop")[: n * n]

    # distinct neighbor own-chains: sum/max of (libs - 1)
    nbrL = B._neighbor_labels(lbl_own)
    nbrL = jnp.where((vm & mask)[None], nbrL, -1)  # restrict to v's neighbors
    keepO = B._dedup_dir_mask(nbrL)
    own_chain_libs = jnp.where(
        keepO,
        libs_map.reshape(-1)[jnp.clip(nbrL, 0, None).reshape(4, -1)].reshape(
            nbrL.shape
        )
        - 1,
        0,
    )
    num_connection_libs = jnp.sum(jnp.where(keepO, own_chain_libs, 0))
    max_connection_libs = jnp.maximum(
        stone_libs, jnp.max(jnp.where(keepO, own_chain_libs, 0))
    )

    # distinct neighbor opp-chains in atari: count + total stones
    nbrP = B._neighbor_labels(lbl_opp)
    nbrP = jnp.where((vm & mask)[None], nbrP, -1)
    keepP = B._dedup_dir_mask(nbrP)
    opp_libs = libs_map.reshape(-1)[
        jnp.clip(nbrP, 0, None).reshape(4, -1)
    ].reshape(nbrP.shape)
    in_atari = keepP & (opp_libs == 1)
    num_captures = jnp.sum(in_atari, dtype=jnp.int32)
    potential = jnp.sum(
        jnp.where(in_atari, sizes_opp[jnp.clip(nbrP, 0, None).reshape(4, -1)].reshape(nbrP.shape), 0)
    )

    lower = num_captures + max_connection_libs
    upper = stone_libs + potential + num_connection_libs
    return lower, upper


def _liberty_vertices(chain, empty, n):
    """(lib1, lib2, count) lowest-index liberties of a chain mask."""
    lib_mask = B.nbr_or(chain) & empty
    flat = B.flat_iota(n).reshape(-1)
    lm = lib_mask.reshape(-1)
    count = jnp.sum(lm, dtype=jnp.int32)
    first = jnp.min(jnp.where(lm, flat, n * n))
    second = jnp.min(jnp.where(lm & (flat != first), flat, n * n))
    return first, second, count


def _capture_vertex(stones, mask, empty, libs_map, chain, color, n):
    """Lowest-index move capturing an opponent chain adjacent to `chain`
    that is in atari (FindStringLibertiesGainingCaptures, board.cc:543)."""
    opp = (stones == 2 - color) & mask
    atari_opp_adj = opp & (libs_map == 1) & B.nbr_or(chain)
    # the capturing move is that chain's single liberty
    cap_libs = B.nbr_or(B.flood(atari_opp_adj, opp)) & empty
    flat = B.flat_iota(n).reshape(-1)
    v = jnp.min(jnp.where(cap_libs.reshape(-1), flat, n * n))
    return v, v < n * n


def ladder_chase(stones, size, ko, prey_v, prey_color, first_hunter_v):
    """Run one greedy ladder chase; returns PREY_GOOD or HUNTER_GOOD.

    `prey_v`: a vertex of the prey chain. `first_hunter_v`: forced first
    hunter move (IsLadder libs==2 case, board.cc:801-813) or NO_VERTEX to
    start with the prey in atari (libs==1 case)."""
    n = stones.shape[-1]
    mask = B.board_mask(size, n)
    max_iters = 2 * n + 8

    def apply(bs, ko_, v, color):
        s2, _, ko2 = B.play_move(bs, size, color, v)
        return s2, ko2

    stones0, ko0 = lax.cond(
        first_hunter_v == NO_VERTEX,
        lambda: (stones, ko),
        lambda: apply(stones, ko, first_hunter_v, 1 - prey_color),
    )
    think_ko0 = first_hunter_v != NO_VERTEX

    def body(carry):
        bs, ko_, result, it, think_ko = carry

        empty, _, libs_map = _analyze(bs, mask)
        prey = _chain_mask(bs, mask, prey_v, prey_color)
        l1, l2, nlibs = _liberty_vertices(prey, empty, n)

        # --- prey phase (PreySelections, board.cc:520-574) ---
        prey_escaped = (nlibs >= 2) | (think_ko & (ko_ != NO_VERTEX))
        low, up = _ladder_liberty_bounds(bs, mask, empty, libs_map, l1, prey_color)
        escape_legal = _single_vertex_legal(
            bs, mask, empty, libs_map, l1, prey_color, ko_
        )
        cap_v, has_cap = _capture_vertex(
            bs, mask, empty, libs_map, prey, prey_color, n
        )
        cap_legal = has_cap & _single_vertex_legal(
            bs, mask, empty, libs_map, cap_v, prey_color, ko_
        )
        prey_escaped = prey_escaped | (escape_legal & (low >= 3))
        prey_dead = ~prey_escaped & ~escape_legal & ~cap_legal
        prey_dead = prey_dead | (
            ~prey_escaped & escape_legal & ~cap_legal & (up <= 1)
        )
        use_cap = cap_legal & ((up <= 1) | ~escape_legal)
        prey_move = jnp.where(use_cap, cap_v, l1)

        bs1, ko1 = apply(bs, ko_, prey_move, prey_color)

        # --- hunter phase (HunterSelections, board.cc:576-646) ---
        empty1, _, libs_map1 = _analyze(bs1, mask)
        prey1 = _chain_mask(bs1, mask, prey_v, prey_color)
        h1, h2, nlibs1 = _liberty_vertices(prey1, empty1, n)
        prey_escaped2 = nlibs1 >= 3
        hunter_won = nlibs1 <= 1

        p1 = _pliberties(empty1, h1, n)
        p2 = _pliberties(empty1, h2, n)
        both_open = (p1 >= 3) & (p2 >= 3)
        legal1 = _single_vertex_legal(
            bs1, mask, empty1, libs_map1, h1, 1 - prey_color, ko1
        )
        legal2 = _single_vertex_legal(
            bs1, mask, empty1, libs_map1, h2, 1 - prey_color, ko1
        )
        # forced choices per the reference's pruning; else prefer the
        # outside liberty (more empty neighbors), tie -> lower index
        pick1 = jnp.where(
            p1 >= 3,
            legal1,
            jnp.where(p2 >= 3, False, legal1 & ((p1 >= p2) | ~legal2)),
        )
        pick2 = ~pick1 & legal2 & ~(p1 >= 3)
        no_move = ~pick1 & ~pick2
        hunter_move = jnp.where(pick1, h1, h2)

        bs2, ko2 = lax.cond(
            (hunter_won | prey_escaped2 | both_open | no_move),
            lambda: (bs1, ko1),
            lambda: apply(bs1, ko1, hunter_move, 1 - prey_color),
        )

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
        )
        # pick the pre-move board state when prey phase already decided
        bs_out = jnp.where(prey_escaped | prey_dead, 0, 1)
        bs_next = lax.cond(bs_out == 0, lambda: (bs, ko_), lambda: (bs2, ko2))
        return bs_next[0], bs_next[1], new_result, it + 1, jnp.array(True)

    def cond(carry):
        _, _, result, it, _ = carry
        return (result == UNDECIDED) & (it < max_iters)

    _, _, result, _, _ = lax.while_loop(
        cond,
        body,
        (stones0, ko0, jnp.int32(UNDECIDED), jnp.int32(0), jnp.asarray(think_ko0)),
    )
    # node-cap exhaustion counts as escape (board.cc:655-658)
    return jnp.where(result == UNDECIDED, PREY_GOOD, result)


def ladder_planes(stones, size, ko=None):
    """[n, n, 4] float32 ladder planes [death, escapable, atari, take]
    following GetLadderMap's marking (board.cc:1618-1691):

    - 1-lib ladder chains -> death; their capture point -> take
    - 2-lib ladder chains -> escapable; winning atari points -> atari
    """
    n = stones.shape[-1]
    nn = n * n
    mask = B.board_mask(size, n)
    if ko is None:
        ko = jnp.int32(NO_VERTEX)

    empty, (lbl_b, lbl_w), libs_map = _analyze(stones, mask)
    labels = jnp.where(lbl_b >= 0, lbl_b, lbl_w)
    flat = B.flat_iota(n)
    is_root = (labels == flat) & (labels >= 0)
    root_libs = jnp.where(is_root, libs_map, 0)

    # candidate roots: chains with exactly 1 or 2 liberties, first MAX_CHAINS
    cand = is_root & ((root_libs == 1) | (root_libs == 2))
    order = jnp.argsort(
        jnp.where(cand.reshape(-1), flat.reshape(-1), nn)
    )[:MAX_CHAINS]
    cand_v = jnp.where(cand.reshape(-1)[order], order, -1)  # [MAX_CHAINS]

    def run_one(v):
        valid = v >= 0
        vv = jnp.maximum(v, 0)
        color = jnp.where(
            stones.reshape(-1)[vv] == 1, 0, 1
        ).astype(jnp.int32)
        chain = _chain_mask(stones, mask, vv, color)
        l1, l2, nl = _liberty_vertices(chain, empty, n)

        def one_lib():
            res = ladder_chase(stones, size, ko, vv, color, jnp.int32(NO_VERTEX))
            died = res == HUNTER_GOOD
            death = jnp.where(died & valid, chain, False)
            take = jnp.where(
                died & valid, (flat.reshape(-1) == l1).reshape(n, n), False
            )
            return death, jnp.zeros_like(chain), jnp.zeros_like(chain), take

        def two_lib():
            legal_a = _single_vertex_legal(
                stones, mask, empty, libs_map, l1, 1 - color, ko
            )
            legal_b = _single_vertex_legal(
                stones, mask, empty, libs_map, l2, 1 - color, ko
            )
            res_a = jnp.where(
                legal_a,
                ladder_chase(stones, size, ko, vv, color, l1),
                PREY_GOOD,
            )
            res_b = jnp.where(
                legal_b,
                ladder_chase(stones, size, ko, vv, color, l2),
                PREY_GOOD,
            )
            vital_a = res_a == HUNTER_GOOD
            vital_b = res_b == HUNTER_GOOD
            is_ladder = (vital_a | vital_b) & valid
            esc = jnp.where(is_ladder, chain, False)
            atari = jnp.where(
                is_ladder,
                (vital_a & (flat.reshape(-1) == l1).reshape(n, n))
                | (vital_b & (flat.reshape(-1) == l2).reshape(n, n)),
                False,
            )
            return jnp.zeros_like(chain), esc, atari, jnp.zeros_like(chain)

        return lax.cond(nl == 1, one_lib, two_lib)

    death, esc, atari, take = jax.vmap(run_one)(cand_v)
    out = jnp.stack(
        [
            death.any(axis=0),
            esc.any(axis=0),
            atari.any(axis=0),
            take.any(axis=0),
        ],
        axis=-1,
    )
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# batched front-end: Pallas chase kernel on TPU, vmapped rollout elsewhere
# ---------------------------------------------------------------------------

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


def _prep_candidates(stones, size, ko):
    """Single-board candidate prep for the chase kernel: roots, libs,
    first-two liberty vertices, hunter-move legality. All label-map based
    (no per-candidate floods)."""
    n = stones.shape[-1]
    nn = n * n
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
    )[:MAX_CHAINS]
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


def ladder_planes_batch(stones, size, ko=None, use_kernel=None):
    """[B, n, n, 4] ladder planes for a batch of boards.

    On TPU the greedy chases run inside the Pallas ladder kernel
    (ops/ladder_kernel.py) — one lane per (candidate, branch); elsewhere
    this is vmapped ladder_planes. Semantics match ladder_planes up to the
    kernel's documented query-flood cap. `use_kernel` overrides the
    platform check (tests run the kernel in interpret mode on CPU)."""
    if use_kernel is None:
        use_kernel = B._use_pallas()
    if not use_kernel:
        return jax.vmap(
            lambda s, z, k: ladder_planes(s, z, k)
        )(stones, size, ko if ko is not None
          else jnp.full(stones.shape[:1], NO_VERTEX, jnp.int32))

    from sayuri_tpu.ops import ladder_kernel as LK

    b, n = stones.shape[0], stones.shape[-1]
    nn = n * n
    if ko is None:
        ko = jnp.full((b,), NO_VERTEX, jnp.int32)

    prep = jax.vmap(_prep_candidates)(stones, size, ko)
    M = MAX_CHAINS
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

    res = LK.run_chases(
        own2, opp2, size_l, ko_l, prey_l, fh_l, ok_l, n
    ).reshape(b, M, 2)

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

    death = jnp.any(chain_of & died[:, :, None], axis=1)
    take = jnp.any(oh_l1 & died[:, :, None], axis=1)
    esc = jnp.any(chain_of & is_ladder[:, :, None], axis=1)
    atari = jnp.any(
        (oh_l1 & vital_a[:, :, None]) | (oh_l2 & vital_b[:, :, None]),
        axis=1,
    )
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
