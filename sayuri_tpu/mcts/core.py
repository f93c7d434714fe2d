"""Array-based batched MCTS.

TPU-first re-design of the reference search (/root/reference/src/mcts/
search.cc, node.cc): instead of a heap tree of atomically-inflated edge
pointers walked by worker threads (node_pointer.h:11-67, search.cc:342-351),
the forest of B independent game trees lives in dense arrays
``[B, max_nodes, ...]`` and one simulation per tree advances in lockstep
under ``jit``:

    select (vectorized PUCT descent)  ->  env.step to the leaf
    ->  ONE batched network forward over all B leaves  ->  scatter backup

Thread-safety machinery (virtual loss, expand-state CAS, ownership mutex —
node.h:273-331) disappears: within a tree the simulations are sequential, so
results are bit-deterministic; parallelism comes from the game batch, which
is also what fills the accelerator (the role of BatchForwardPipe's
cross-thread queue, batch_forward_pipe.cc:99-193).

Implemented Sayuri search semantics, with source citations inline:
- PUCT with FPU reduction (node.cc:423-438), dynamic cpuct scaled by child
  value variance (node.cc:440-461), log-growth cpuct (node.cc:463-473)
- score-utility term E[atan((s - center)/(div*bsize))]*2/pi under
  N(score_mean, score_stddev) (score_value.h:40-134) — computed by
  Gauss-Hermite quadrature instead of the reference's lookup table
- forced playouts at root (node.cc:474-485)
- Dirichlet root noise mixed at selection time (node.cc:576-585)
- Welford online variance for WL and score (node.cc:692-734)
- terminal two-pass leaves valued by final score (search.cc:71-88)
- Gumbel / Sequential-Halving root selection with completed-Q
  (node.cc:1606-1760) — see gumbel.py
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from flax import struct

from sayuri_tpu.game import board as B_
from sayuri_tpu.game.state import GoEnv, GoState


@dataclasses.dataclass(frozen=True)
class StatePacker:
    """Packs a GoState pytree into two dtype-grouped flat buffers.

    The tree stores per-node game states. As 17 separate arrays, fetching
    the leaf's parent state costs 17 small dynamic-row gathers per
    simulation (~1.8 ms at B=256 on v5e — pure per-gather overhead);
    packed into one uint8 and one int32 buffer it is 2 gathers (and the
    expand scatter shrinks the same way). float32/uint32/bool leaves are
    bitcast/widened in; unpacking is slicing + bitcast, which XLA fuses
    into the consumers."""

    treedef: Any
    entries: tuple  # (dtype_str, trailing_shape, group, offset, size)
    k8: int
    k32: int

    @staticmethod
    def build(template) -> "StatePacker":
        leaves, treedef = jax.tree.flatten(template)
        entries = []
        off8 = off32 = 0
        for leaf in leaves:
            shp = tuple(leaf.shape[1:])
            size = int(np.prod(shp)) if shp else 1
            if leaf.dtype in (jnp.int8, jnp.uint8, jnp.bool_):
                entries.append((str(leaf.dtype), shp, 8, off8, size))
                off8 += size
            else:  # int32 / uint32 / float32
                entries.append((str(leaf.dtype), shp, 32, off32, size))
                off32 += size
        return StatePacker(treedef, tuple(entries), off8, off32)

    def pack(self, states):
        """states (leading dims L) -> (u8 [*L, k8], i32 [*L, k32])."""
        leaves = jax.tree.leaves(states)
        lead = leaves[0].shape[: leaves[0].ndim - len(self.entries[0][1])]
        p8, p32 = [], []
        for leaf, (_, shp, group, _, size) in zip(leaves, self.entries):
            lead = leaf.shape[: leaf.ndim - len(shp)]
            flat = leaf.reshape(lead + (size,))
            if group == 8:
                p8.append(flat.astype(jnp.uint8))
            else:
                if flat.dtype != jnp.int32:
                    flat = lax.bitcast_convert_type(flat, jnp.int32)
                p32.append(flat)
        cat = lambda xs, k, dt: (
            jnp.concatenate(xs, axis=-1)
            if xs
            else jnp.zeros(lead + (0,), dt)
        )
        return cat(p8, self.k8, jnp.uint8), cat(p32, self.k32, jnp.int32)

    def unpack(self, a8, a32):
        lead = a8.shape[:-1]
        leaves = []
        for dt, shp, group, off, size in self.entries:
            src = a8 if group == 8 else a32
            flat = lax.slice_in_dim(src, off, off + size, axis=src.ndim - 1)
            if dt == "bool":
                flat = flat.astype(jnp.bool_)
            elif group == 8:
                flat = flat.astype(jnp.dtype(dt))
            elif dt != "int32":
                flat = lax.bitcast_convert_type(flat, jnp.dtype(dt))
            leaves.append(flat.reshape(lead + shp))
        return jax.tree.unflatten(self.treedef, leaves)


class NetEvals(NamedTuple):
    """Evaluation of a batch of states, black perspective (the reference's
    NodeEvals, node.h)."""

    priors: jnp.ndarray          # [B, A] legal-masked softmax policy
    black_wl: jnp.ndarray        # [B] P(black wins) in [0, 1]
    draw: jnp.ndarray            # [B]
    black_score: jnp.ndarray     # [B] predicted black score lead
    black_ownership: jnp.ndarray  # [B, HW] in [-1, 1]


# eval_fn(states, ctx) -> NetEvals. `ctx` is an arbitrary per-search pytree
# (e.g. root-position ladder planes when ladder_mode="root"); None when the
# evaluator needs nothing.
EvalFn = Callable[[GoState, Any], NetEvals]


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """Search knobs, named after the reference option map
    (/root/reference/src/config.cc:64-111, mcts/parameters.h:14-84)."""

    max_nodes: int = 256
    max_depth: int = 96
    # PUCT
    cpuct_init: float = 0.5
    cpuct_base: float = 19652.0
    cpuct_base_factor: float = 1.0
    cpuct_dynamic: bool = True
    cpuct_dynamic_k_factor: float = 4.0
    cpuct_dynamic_k_base: float = 10000.0
    fpu_reduction: float = 0.25
    root_fpu_reduction: float = 0.25
    # score utility (config.cc:73-74: factor 0.4, div 1.0 — round-5 fix:
    # the old 0.1/20.0 defaults flattened E[atan((s-c)/(div*bsize))] to
    # ~1e-3 and effectively disabled the score term; the reference's
    # score utility is ~0.1-magnitude and shapes every selection)
    score_utility_factor: float = 0.4
    score_utility_div: float = 1.0
    # noise / exploration
    dirichlet_noise: bool = False
    dirichlet_epsilon: float = 0.25
    dirichlet_init: float = 0.03
    dirichlet_factor: float = 361.0
    forced_playouts_k: float = 0.0
    # Gumbel root (bash/configs: --gumbel, gumbel_considered_moves=16)
    gumbel: bool = False
    gumbel_c_visit: float = 50.0
    gumbel_c_scale: float = 1.0
    gumbel_considered_moves: int = 16
    # SH promotion visits + sigma visit cap (config.cc:102,104)
    gumbel_prom_visits: int = 1
    gumbel_playouts_threshold: int = 400
    # the reference draws FRESH Gumbel noise at every selection and at the
    # final move pick (std::extreme_value_distribution constructed inside
    # ProcessGumbelLogits, node.cc:1734); False = one draw per search
    # (the original Gumbel-AlphaZero formulation)
    gumbel_per_selection: bool = True
    # LCB best-move selection; ci_alpha = complement probability of the
    # confidence interval (config.cc:63,140)
    lcb_reduction: float = 0.02
    ci_alpha: float = 1e-5
    # NN eval cache (cache.h / network.cc:102-121): entries per lane;
    # 0 disables. Hit/frozen/terminal lanes are compacted out of the
    # forward (see mcts/nncache.py).
    nn_cache_size: int = 0
    # endgame score bonus encouraging pass/seki resolution under area
    # scoring and dame-filling under territory (--first-pass-bonus,
    # config.cc:120, node.cc:813-869); off by default like the reference
    first_pass_bonus: bool = False
    # value in-tree two-pass terminals by plain Tromp-Taylor reach
    # ownership instead of the reference-exact score-area pass
    # (FromGameOver -> ComputeScoreArea, search.cc:71-88) — kept for the
    # A/B harness; default is the exact behavior
    terminal_tt_score: bool = False


@struct.dataclass
class Tree:
    """Forest of B trees in dense arrays. Node 0 of each tree is its root
    (tree reuse re-roots by copying the kept subtree forward)."""

    # edge data [B, N, A]
    prior: jnp.ndarray       # f32, exactly 0 for illegal actions
    child: jnp.ndarray       # i32 node index or -1
    # NOTE: there is deliberately NO per-edge stats array. Selection reads
    # child-node stats through a one-hot matmul gather (_child_stats) —
    # a round-1 [B, N, A, 5] packed-edge cache needed a scatter-set per
    # simulation that measured ~14 ms/sim at B=256 on v5e (the single
    # largest cost in the whole search); the MXU gather is ~0.3 ms.

    # node data [B, N]
    parent: jnp.ndarray          # i32 (-1 for root)
    parent_action: jnp.ndarray   # i32
    # packed per-node stats [B, N, 8] f32 — ONE gather + scatter per backup
    # instead of an indexed op per field:
    #   0 visits, 1 acc_wl (black), 2 acc_draw, 3 acc_score (black),
    #   4 sq_eval_diff, 5 sq_score_diff (Welford, node.cc:692-734),
    #   6 score_eval cache (black; E[atan] is odd so white = negation,
    #     center = per-search constant, node.cc:757-768), 7 net_wl (black)
    stats: jnp.ndarray
    net_score: jnp.ndarray       # f32 raw NN score (black)
    terminal: jnp.ndarray        # bool
    valid: jnp.ndarray           # bool (root superko purge clears these)
    # first-pass-bonus score offset of the move leading to the node
    # (black perspective, Node::black_sb_, node.cc:813-869); all-zero
    # unless cfg.first_pass_bonus
    black_sb: jnp.ndarray        # f32 [B, N]

    # ---- read-compatibility views over the packed stats ----
    @property
    def visits(self):
        return self.stats[..., 0].astype(jnp.int32)

    @property
    def acc_wl(self):
        return self.stats[..., 1]

    @property
    def acc_draw(self):
        return self.stats[..., 2]

    @property
    def acc_score(self):
        return self.stats[..., 3]

    @property
    def sq_eval_diff(self):
        return self.stats[..., 4]

    @property
    def sq_score_diff(self):
        return self.stats[..., 5]

    @property
    def score_eval(self):
        return self.stats[..., 6]

    @property
    def net_wl(self):
        return self.stats[..., 7]

    # per-node game state (leading dims [B, N]), dtype-group packed
    # (see StatePacker): ONE gather fetches a parent state per dtype
    # group instead of one per GoState leaf
    states_p8: jnp.ndarray   # [B, N, K8] uint8
    states_p32: jnp.ndarray  # [B, N, K32] int32

    # per-tree data [B]
    next_free: jnp.ndarray   # i32
    root_noise: jnp.ndarray  # [B, A] dirichlet noise buffer (parameters.h:156)
    root_ownership: jnp.ndarray  # [B, HW] running average (node.cc:724-733)
    # gumbel root state: one pre-drawn noise buffer (used when
    # gumbel_per_selection=False) + the PRNG key fresh per-selection noise
    # is folded from (node.cc:1734 draws fresh noise every selection)
    root_gumbel: jnp.ndarray     # [B, A] gumbel noise (node.cc:1606+)
    gumbel_key: jnp.ndarray      # [B, 2] uint32 PRNG key (row-replicated;
    #                              [B]-leading so tree merges broadcast)
    # frozen per-search score-utility center: the root's mean score at
    # search-prepare time (recent_expected_black_score, search.cc:184 —
    # under tree reuse this carries the previous move's estimate)
    score_center: jnp.ndarray  # [B]
    # per-lane exploration switches: the reference swaps in a "no exploring"
    # parameter set for fast-search lanes (search.cc:33-45, 269-271)
    use_noise: jnp.ndarray       # [B] bool
    use_gumbel: jnp.ndarray      # [B] bool

    # optional NN eval cache (mcts/nncache.py) riding with the search
    # state so it survives tree reuse and game boundaries; None = off
    cache: Any = None

    # static pack/unpack spec for the per-node states
    state_spec: StatePacker = struct.field(pytree_node=False, default=None)

    @property
    def states(self) -> GoState:
        """Per-node GoState view (leading dims [B, N]), unpacked lazily —
        XLA keeps only the fields a consumer actually reads."""
        return self.state_spec.unpack(self.states_p8, self.states_p32)

    @property
    def num_actions(self) -> int:
        return self.prior.shape[-1]


def _batched(x, b):
    return jnp.broadcast_to(x, (b,) + x.shape)


# Gauss-Hermite nodes/weights for E[f(mean + stddev*Z)], Z ~ N(0,1)
_GH_X, _GH_W = np.polynomial.hermite_e.hermegauss(11)
_GH_W = _GH_W / _GH_W.sum()


def _norm_to_t_approx(z, dof):
    """Normal quantile -> Student-t quantile approximation
    (lcb.h:36-45, KataGo fancymath)."""
    dof = np.asarray(dof, np.float64)
    n_hi = np.maximum(dof + 1.0, 2.0)  # clamp: branch only used for dof > 8
    n_lo = dof + 2.0
    hi = np.sqrt(
        n_hi * np.exp(z * z * (n_hi - 1.5) / ((n_hi - 1.0) * (n_hi - 1.0)))
        - n_hi
    )
    lo = np.sqrt(
        n_lo
        * np.exp(
            z
            * z
            * (n_lo - 0.853999327911)
            / ((n_lo - 1.044042304114) * (n_lo - 0.954115472059))
        )
        - n_lo
    )
    return np.where(dof > 8, hi, lo)


def _phi_inv(p):
    # Abramowitz & Stegun 26.2.23 (lcb.h:9-33)
    t = np.sqrt(-2.0 * np.log(1.0 - p))
    c = (2.515517, 0.802853, 0.010328)
    d = (1.432788, 0.189269, 0.001308)
    return t - ((c[2] * t + c[1]) * t + c[0]) / (
        ((d[2] * t + d[1]) * t + d[0]) * t + 1.0
    )


@functools.lru_cache(maxsize=None)
def _make_lcb_z_table(ci_alpha=1e-5, size=1000):
    """Cached t-quantile table (LcbEntries::Initialize, lcb.h:47-87):
    entry i = NormToTApprox(Phi^-1(1 - ci_alpha), dof=i)."""
    try:
        from scipy.stats import norm  # available via jax deps

        z = float(norm.ppf(1.0 - ci_alpha))
    except Exception:  # no scipy: inline Acklam-style inverse-normal
        z = float(_phi_inv(1.0 - ci_alpha))
    return _norm_to_t_approx(z, np.arange(size)).astype(np.float32)


_LCB_Z_TABLE = _make_lcb_z_table()


def expected_score_value(mean, stddev, center, div, board_size):
    """E[atan((s - center)/(div*bsize))*2/pi], s ~ N(mean, stddev)
    (ScoreValue::ExpectedScoreValue semantics, score_value.h:40-134)."""
    x = mean[..., None] + stddev[..., None] * _GH_X  # [..., K]
    sv = jnp.arctan((x - center[..., None]) / (div * board_size)) * (2.0 / jnp.pi)
    return jnp.sum(sv * _GH_W, axis=-1)


class MCTS:
    """Batched search driver bound to an env + eval function."""

    def __init__(self, env: GoEnv, eval_fn: EvalFn, cfg: SearchConfig,
                 root_eval_fn: EvalFn | None = None):
        self.env = env
        self.eval_fn = eval_fn
        # the reference evaluates the ROOT with the normal policy head and
        # root_policy_temp, leaves with the default head and policy_temp
        # (Node::GetNetOutput, node.cc:130-143); a distinct root evaluator
        # bypasses the shared NN cache so root-flavored outputs never
        # pollute leaf entries
        self.root_eval_fn = root_eval_fn
        self.cfg = cfg
        self.A = env.num_actions

    # ------------------------------------------------------------------
    # tree construction
    # ------------------------------------------------------------------

    def init_tree(
        self,
        root_states: GoState,
        rng,
        use_noise=None,
        use_gumbel=None,
        prior_mask=None,
        ctx=None,
        cache=None,
    ) -> Tree:
        """Evaluate roots and build a fresh forest (PrepareRootNode,
        search.cc:139-181 + node.cc:32). `use_noise`/`use_gumbel` are
        per-lane overrides of the config flags (fast-search lanes disable
        exploring, search.cc:33-45). `prior_mask` ([B, A] bool) zeroes root
        priors, e.g. for the superko purge (KillRootSuperkos,
        node.cc:1824-1841)."""
        cfg = self.cfg
        b = root_states.stones.shape[0]
        n_nodes, A = cfg.max_nodes, self.A
        hw = self.env.n * self.env.n

        if cache is None and cfg.nn_cache_size > 0:
            from sayuri_tpu.mcts import nncache as NC

            cache = NC.make_cache(b, cfg.nn_cache_size, A, hw)
        if self.root_eval_fn is not None:
            # root-flavored evaluator (root temp / normal head): never
            # cached — one eval per search, and the cache must only hold
            # leaf-flavored outputs
            evals = self.root_eval_fn(root_states, ctx)
        elif cache is not None:
            from sayuri_tpu.mcts import nncache as NC

            evals, cache = NC.cached_eval(cache, self.eval_fn,
                                          root_states, ctx)
        else:
            evals = self.eval_fn(root_states, ctx)
        if prior_mask is not None:
            priors = jnp.where(prior_mask, evals.priors, 0.0)
            priors = priors / jnp.maximum(
                jnp.sum(priors, axis=-1, keepdims=True), 1e-12
            )
            evals = evals._replace(priors=priors)

        def zeros(shape, dt=jnp.float32):
            return jnp.zeros(shape, dt)

        # tree nodes never consult the superko ring (the purge happens at
        # the root only, node.cc:1824); keep a length-1 stub so the GoState
        # pytree stays uniform without replicating [max_len, 2] x nodes
        slim_roots = root_states.replace(
            hash_history=root_states.hash_history[:, :1, :]
        )
        spec = StatePacker.build(slim_roots)
        root_p8, root_p32 = spec.pack(slim_roots)
        states_p8 = jnp.zeros((b, n_nodes, spec.k8), jnp.uint8).at[:, 0].set(
            root_p8
        )
        states_p32 = jnp.zeros(
            (b, n_nodes, spec.k32), jnp.int32
        ).at[:, 0].set(root_p32)

        noise = self._sample_dirichlet(rng, evals.priors)
        gumbel = self._sample_gumbel(rng, evals.priors)

        root_se = (
            expected_score_value(
                evals.black_score,
                jnp.ones((b,)),
                evals.black_score,
                cfg.score_utility_div,
                float(self.env.n),
            )
            * cfg.score_utility_factor
        )
        root_stats = jnp.stack(
            [
                jnp.ones((b,)),          # visits
                evals.black_wl,          # acc_wl
                evals.draw,              # acc_draw
                evals.black_score,       # acc_score
                jnp.zeros((b,)),         # sq_eval_diff
                jnp.zeros((b,)),         # sq_score_diff
                root_se,                 # score_eval cache
                evals.black_wl,          # net_wl
            ],
            axis=-1,
        )
        tree = Tree(
            prior=zeros((b, n_nodes, A)).at[:, 0].set(evals.priors),
            child=jnp.full((b, n_nodes, A), -1, jnp.int32),
            parent=jnp.full((b, n_nodes), -1, jnp.int32),
            parent_action=jnp.full((b, n_nodes), -1, jnp.int32),
            stats=zeros((b, n_nodes, 8)).at[:, 0].set(root_stats),
            net_score=zeros((b, n_nodes)).at[:, 0].set(evals.black_score),
            terminal=zeros((b, n_nodes), bool).at[:, 0].set(
                root_states.terminated
            ),
            valid=zeros((b, n_nodes), bool).at[:, 0].set(True),
            black_sb=zeros((b, n_nodes)),
            states_p8=states_p8,
            states_p32=states_p32,
            state_spec=spec,
            next_free=jnp.ones((b,), jnp.int32),
            root_noise=noise,
            root_ownership=evals.black_ownership,
            root_gumbel=gumbel,
            gumbel_key=jnp.broadcast_to(
                jax.random.fold_in(rng, 0x6B31)[None], (b, 2)
            ),
            score_center=evals.black_score,
            use_noise=(
                jnp.full((b,), cfg.dirichlet_noise)
                if use_noise is None
                else use_noise
            ),
            use_gumbel=(
                jnp.full((b,), cfg.gumbel) if use_gumbel is None else use_gumbel
            ),
            cache=cache,
        )
        return tree

    def _score_bonus(self, parent_states, action, root_own):
        """[B] black-perspective score bonus of playing `action` from
        `parent_states` (Node::ComputeScoreBonus, node.cc:813-869).

        Deviation: the ownership test uses the tree's running root
        ownership average instead of the parent node's stored NN ownership
        (the array tree does not keep a [B, N, HW] per-node ownership;
        the root average is the same estimator the reference exposes for
        move selection, node.cc:724-733)."""
        from sayuri_tpu.game import analysis as A
        from sayuri_tpu.game.types import AREA_RULE

        n = self.env.n
        nn = n * n
        b = action.shape[0]
        b_idx = jnp.arange(b)
        thr, tail, end_bonus = 0.8, 0.2, 0.5
        color = parent_states.to_move                    # mover
        is_pass = action >= nn
        v = jnp.clip(action, 0, nn - 1)
        own_at = root_own[b_idx, v]                      # black view

        seki = jax.vmap(A.seki_at)(parent_states.stones, parent_states.size, v)
        opp = 2 - color                                  # opp stone value
        st = parent_states.stones.reshape(b, nn)
        def nbr(dy, dx):
            y, x = v // n + dy, v % n + dx
            ok = (y >= 0) & (y < n) & (x >= 0) & (x < n)
            idx = jnp.clip(y * n + x, 0, nn - 1)
            return ok & (st[b_idx, idx] == opp)
        nbr_opp = nbr(1, 0) | nbr(-1, 0) | nbr(0, 1) | nbr(0, -1)

        own_sign = jnp.where(color == 0, own_at, -own_at)  # mover view
        area_pt = seki | ((own_sign > thr) & nbr_opp)
        area_bonus = jnp.where(is_pass | area_pt, end_bonus, 0.0)

        penal = jnp.maximum(jnp.abs(own_at) - thr, 0.0) / tail
        terr_bonus = jnp.where(
            is_pass, -(2.0 / 3.0) * end_bonus, -penal * end_bonus
        )

        bonus = jnp.where(
            parent_states.rule == AREA_RULE, area_bonus, terr_bonus
        )
        bonus = jnp.where(color == 0, bonus, -bonus)     # black perspective
        # no bonus while a ko is pending (node.cc:814-817)
        return jnp.where(parent_states.ko >= 0, 0.0, bonus)

    def _score_center(self, tree):
        """Per-search score-utility center (recent_expected_black_score,
        search.cc:184): frozen at search-prepare time to the root's mean
        score — the raw NN score on fresh trees, the carried-over previous
        estimate on reused roots."""
        return tree.score_center

    def _sample_dirichlet(self, rng, priors):
        """Root Dirichlet buffer (node.cc:1395-1423): alpha =
        dirichlet_init * dirichlet_factor / num_legal_moves over legal moves."""
        cfg = self.cfg
        if not cfg.dirichlet_noise:
            return jnp.zeros_like(priors)
        legal = priors > 0
        num_legal = jnp.maximum(jnp.sum(legal, axis=-1, keepdims=True), 1)
        alpha = cfg.dirichlet_init * cfg.dirichlet_factor / num_legal
        k1, _ = jax.random.split(rng)
        g = jax.random.gamma(k1, jnp.broadcast_to(alpha, priors.shape))
        g = jnp.where(legal, g, 0.0)
        return g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-12)

    def _sample_gumbel(self, rng, priors):
        if not self.cfg.gumbel:
            return jnp.zeros_like(priors)
        _, k2 = jax.random.split(rng)
        g = jax.random.gumbel(k2, priors.shape)
        return jnp.where(priors > 0, g, -jnp.inf)

    # ------------------------------------------------------------------
    # stats helpers (all black-perspective accumulators)
    # ------------------------------------------------------------------

    @staticmethod
    def _wl_of(tree, idx, b_idx):
        v = tree.visits[b_idx, idx]
        return tree.acc_wl[b_idx, idx] / jnp.maximum(v, 1)

    def _score_eval(self, tree, child_idx, b_idx, color, root_score):
        """Score-utility term of the Q value (node.cc:757-768), read from
        the per-node cache (black perspective; E[atan] is odd so the white
        value is the negation). `root_score` is unused (kept for signature
        stability) — the center is baked into the cache at backup time."""
        sign = jnp.where(color == 0, 1.0, -1.0)
        return sign * tree.score_eval[b_idx, child_idx]

    # ------------------------------------------------------------------
    # selection
    # ------------------------------------------------------------------

    def _child_stats(self, tree, node_idx=None):
        """([B, A, 8] stats of each action's child node, [B, A] child-exists
        mask). Zeros where no child. `node_idx=None` means the root (a
        static slice instead of a gather).

        TPU note: the [B, A]-indexed gather from the [B, N, 8] node stats
        is expressed as a one-hot ``dot_general`` so it runs on the MXU;
        the equivalent XLA gather/scatter at these shapes measured 2-50x
        slower on v5e (see the Tree docstring)."""
        if node_idx is None:
            ch = tree.child[:, 0]
        else:
            b_idx = jnp.arange(node_idx.shape[0])
            ch = tree.child[b_idx, node_idx]
        has = ch >= 0
        n_nodes = tree.stats.shape[1]
        oh = (
            jnp.where(has, ch, -1)[:, :, None]
            == jnp.arange(n_nodes)[None, None, :]
        )
        g = jax.lax.dot_general(
            oh.astype(jnp.float32),
            tree.stats,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return g, has

    def _puct_scores(self, tree, node_idx, is_root, root_score,
                     color=None):
        """[B, A] PUCT selection scores at `node_idx` (node.cc:499-576).
        `node_idx=None` selects at the root statically.

        `is_root` is a STATIC python bool: the descent hoists depth 0 out
        of its loop, so root-only terms (forced playouts, Dirichlet
        mixing, root FPU) are elided from the per-level loop body at
        trace time instead of multiplied by an all-False lane mask."""
        cfg = self.cfg
        b = tree.stats.shape[0]
        b_idx = jnp.arange(b)
        A = tree.num_actions

        if node_idx is None:
            p_raw = tree.prior[:, 0]
            node_idx = jnp.zeros((b,), jnp.int32)
            g, _ = self._child_stats(tree)
            node_row = tree.stats[:, 0]           # [B, 8] static slice
            if color is None:
                color = tree.states.to_move[:, 0]
        else:
            p_raw = tree.prior[b_idx, node_idx]   # [B, A] (row slice)
            g, _ = self._child_stats(tree, node_idx)
            # ONE row gather for every per-node scalar the formula needs
            # (visits slot 0, acc_wl slot 1, net_wl slot 7) — separate
            # [B]-gathers measured ~5us each on v5e and the descent body
            # pays this every level
            node_row = tree.stats[b_idx, node_idx]
            if color is None:
                color = tree.states.to_move[b_idx, node_idx]
        legal = p_raw > 0

        nv = g[..., 0]                            # f32 child visits
        wl_sum = g[..., 1]
        se_b = g[..., 6]
        # dynamic-cpuct variance factor from the child's Welford stats
        # (node.cc:440-461)
        ch_var = jnp.where(
            nv > 1.0, g[..., 4] / jnp.maximum(nv - 1.0, 1.0), 1.0
        )
        k_raw = jnp.clip(
            cfg.cpuct_dynamic_k_factor
            * jnp.sqrt(jnp.maximum(ch_var, 0.0))
            / jnp.maximum(nv, 1.0),
            0.5,
            1.4,
        )
        cv = jnp.sum(nv, axis=-1)                 # children_visits (f32)
        tvp = jnp.sum(jnp.where(nv > 0, p_raw, 0.0), axis=-1)

        sign = jnp.where(color == 0, 1.0, -1.0)

        # fpu (node.cc:423-438); values converted to node color perspective
        parent_v = node_row[:, 0]
        node_net_wl = node_row[:, 7]
        node_wl = node_row[:, 1] / jnp.maximum(parent_v, 1.0)
        net_wl_c = jnp.where(color == 0, node_net_wl, 1.0 - node_net_wl)
        wl_c = jnp.where(color == 0, node_wl, 1.0 - node_wl)
        fpu_red = (
            cfg.root_fpu_reduction if is_root else cfg.fpu_reduction
        ) * jnp.sqrt(tvp)
        avg_factor = jnp.square(tvp)
        fpu = jnp.where(
            parent_v <= 0,
            net_wl_c - fpu_red,
            (1.0 - avg_factor) * net_wl_c + avg_factor * wl_c - fpu_red,
        )

        # per-child Q (color perspective) + cached score utility
        wl_child_b = wl_sum / jnp.maximum(nv, 1.0)
        wl_child = jnp.where(color[:, None] == 0, wl_child_b, 1.0 - wl_child_b)
        score_eval = sign[:, None] * se_b
        visited = nv > 0
        q = jnp.where(visited, wl_child + score_eval, fpu[:, None])

        # forced playouts (root only, node.cc:474-485)
        if cfg.forced_playouts_k > 0 and is_root:
            forced_n = jnp.floor(
                jnp.sqrt(
                    jnp.maximum(
                        1e-4,
                        cfg.forced_playouts_k
                        * jnp.minimum(0.2, p_raw)
                        * cv[:, None],
                    )
                )
            )
            q = q + jnp.where(
                visited & (forced_n > nv),
                (forced_n - nv) * 1e6,
                0.0,
            )

        # policy with root noise (node.cc:576-585)
        if cfg.dirichlet_noise and is_root:
            psa = jnp.where(
                tree.use_noise[:, None],
                p_raw * (1 - cfg.dirichlet_epsilon)
                + cfg.dirichlet_epsilon * tree.root_noise,
                p_raw,
            )
        else:
            psa = p_raw

        # cpuct (node.cc:463-473) + dynamic factor (node.cc:440-461);
        # the per-child variance factor k_raw is cached at backup
        cpuct = cfg.cpuct_init + cfg.cpuct_base_factor * jnp.log(
            (cv + cfg.cpuct_base + 1.0) / cfg.cpuct_base
        )
        if cfg.cpuct_dynamic:
            alpha = 1.0 / (
                1.0 + jnp.sqrt(cv[:, None] / cfg.cpuct_dynamic_k_base)
            )
            k = alpha * k_raw + (1.0 - alpha)
            k = jnp.where(nv > 1, k, 1.0)
            cpuct_a = cpuct[:, None] * k
        else:
            cpuct_a = jnp.broadcast_to(cpuct[:, None], psa.shape)

        numerator = jnp.sqrt(cv)
        puct = cpuct_a * psa * (numerator[:, None] / (1.0 + nv))
        score = q + puct
        return jnp.where(legal, score, -jnp.inf)

    @staticmethod
    def _argmax_prior_tiebreak(scores, priors):
        """[B] argmax of `scores` with exact PUCT-value ties resolved to
        the highest-prior action.

        The reference iterates children in DESCENDING-policy order
        (LinkNodeList stable-sorts the (policy, vertex) list,
        node.cc:287-293) with a strict `value > best_value` compare
        (node.cc:568), so equal selection values go to the highest-prior
        child. A plain argmax over the action axis breaks ties toward
        action index 0 instead — on the first simulation (children_visits
        = 0 makes every child score exactly the parent's FPU) that
        systematically expanded the A1 corner and snowballed the whole
        search onto it; measured at ~-600 Elo vs the reference binary
        with shared weights (tools/ref_match.py, round 5)."""
        m = jnp.max(scores, axis=-1, keepdims=True)
        return jnp.argmax(
            jnp.where(scores >= m, priors, -jnp.inf), axis=-1
        ).astype(jnp.int32)

    def _select_action(self, tree, node_idx, is_root, root_score,
                       sim_idx, color=None):
        """PUCT everywhere; Gumbel at root when enabled (node.cc:372-382).
        `node_idx=None` = the root (static slice)."""
        scores = self._puct_scores(tree, node_idx, is_root, root_score,
                                   color=color)
        if node_idx is None:
            priors = tree.prior[:, 0]
        else:
            priors = tree.prior[jnp.arange(scores.shape[0]), node_idx]
        if self.cfg.gumbel and is_root:
            from sayuri_tpu.mcts import gumbel as G

            gumbel_scores = G.root_scores(self, tree, sim_idx=sim_idx)
            # SH budget exhausted (all -inf) -> PUCT fallback
            # (ProcessGumbelLogits returning false, node.cc:1729-1731)
            g_ok = jnp.any(jnp.isfinite(gumbel_scores), axis=-1)
            scores = jnp.where(
                (tree.use_gumbel & g_ok)[:, None],
                gumbel_scores,
                scores,
            )
        return self._argmax_prior_tiebreak(scores, priors)

    # ------------------------------------------------------------------
    # one simulation for the whole batch
    # ------------------------------------------------------------------

    def simulate(self, tree: Tree, sim_idx, active=None, ctx=None) -> Tree:
        """One playout per tree (PlaySimulation, search.cc:65-137).

        `active`: optional [B] bool — lanes past their playout budget are
        frozen (playout-cap randomization gives lanes different budgets,
        search.cc:948-1005)."""
        cfg = self.cfg
        b = tree.visits.shape[0]
        b_idx = jnp.arange(b)
        if active is None:
            active = jnp.ones((b,), bool)
        root_score = tree.acc_score[:, 0] / jnp.maximum(tree.visits[:, 0], 1)

        # ---- descent ----
        # depth 0 is hoisted out of the loop: every lane is at the root
        # there, which is the ONLY level where Gumbel/noise selection
        # applies — the loop body then runs plain PUCT with no per-level
        # Gumbel sort/SH work
        path0 = jnp.full((b, cfg.max_depth), -1, jnp.int32)
        done0 = tree.terminal[:, 0]
        a0 = self._select_action(tree, None, True, root_score, sim_idx)
        path = path0.at[:, 0].set(jnp.where(done0, -1, 0))
        path_a = path0.at[:, 0].set(jnp.where(done0, -1, a0))
        child0 = tree.child[b_idx, 0, a0]
        child0_term = jnp.where(
            child0 >= 0, tree.terminal[b_idx, jnp.maximum(child0, 0)], False
        )
        done1 = done0 | (child0 < 0) | child0_term
        cur1 = jnp.where(done1, 0, jnp.maximum(child0, 0))

        def cond(carry):
            _, _, _, done, depth = carry
            return jnp.any(~done) & (depth < cfg.max_depth)

        root_color = tree.states.to_move[:, 0].astype(jnp.int32)

        def body(carry):
            cur, path, path_a, done, depth = carry
            # to_move alternates every ply (pass included), so the node's
            # color is the root color xor the depth parity — no per-level
            # gather from the packed states
            color = root_color ^ (depth & 1)
            scores = self._puct_scores(
                tree, cur, False, root_score, color=color
            )
            a = self._argmax_prior_tiebreak(
                scores, tree.prior[b_idx, cur]
            )
            child = tree.child[b_idx, cur, a]
            # record step
            path = path.at[:, depth].set(jnp.where(done, -1, cur))
            path_a = path_a.at[:, depth].set(jnp.where(done, -1, a))
            # stop if no child (expand here) or child is terminal
            child_term = jnp.where(
                child >= 0, tree.terminal[b_idx, jnp.maximum(child, 0)], False
            )
            new_done = done | (child < 0) | child_term
            cur = jnp.where(new_done, cur, jnp.maximum(child, 0))
            return cur, path, path_a, new_done, depth + 1

        cur, path, path_a, done, depth = lax.while_loop(
            cond,
            body,
            (cur1, path, path_a, done1, jnp.int32(1)),
        )

        # leaf edge = last recorded (node, action) per lane
        last_d = jnp.maximum(
            jnp.sum(path >= 0, axis=-1) - 1, 0
        )  # index of final step
        leaf_parent = jnp.where(
            tree.terminal[:, 0], 0, path[b_idx, last_d]
        )
        leaf_parent = jnp.maximum(leaf_parent, 0)
        leaf_action = jnp.maximum(path_a[b_idx, last_d], 0)
        existing_child = tree.child[b_idx, leaf_parent, leaf_action]

        # ---- step env to the leaf (fused step+analysis kernel on TPU) ----
        # two row gathers (one per dtype group) fetch the packed parent
        # states; unpack is fused slicing
        parent_states = tree.state_spec.unpack(
            tree.states_p8[b_idx, leaf_parent],
            tree.states_p32[b_idx, leaf_parent],
        )
        child_states, analysis = self.env.step_batch_with_analysis(
            parent_states, leaf_action
        )

        # ---- evaluate ----
        eval_ctx = ctx
        if analysis is not None:
            eval_ctx = dict(ctx or {}, analysis=analysis)
        term = child_states.terminated
        if tree.cache is not None:
            # cache probe before the forward (network.cc:102-121); frozen
            # and terminal lanes drop out of the compacted forward too
            from sayuri_tpu.mcts import nncache as NC

            evals, new_cache = NC.cached_eval(
                tree.cache, self.eval_fn, child_states, eval_ctx,
                live=active & ~term,
            )
            tree = tree.replace(cache=new_cache)
        else:
            evals = self.eval_fn(child_states, eval_ctx)
        # terminal two-pass leaves valued by the final score
        # (search.cc:71-88): the reference's FromGameOver scores the area
        # rule with the pass-alive override (ComputeScoreArea), which the
        # analysis kernel already emits as score_ownership — used by
        # default. cfg.terminal_tt_score=True restores the plain
        # Tromp-Taylor reach ownership of rounds 1-4 (the A/B harness
        # measures the two). Terminal leaves are rare, so the whole
        # scoring pass is behind a real branch.
        def term_scores(_):
            if analysis is not None:
                key = (
                    "ownership" if cfg.terminal_tt_score
                    else "score_ownership"
                )
                own_map = analysis[key].reshape(b, -1)
            elif cfg.terminal_tt_score:
                own_map = jax.vmap(self.env.ownership)(child_states).reshape(
                    b, -1
                )
            else:
                from sayuri_tpu.game import analysis as GA_

                own_map = jax.vmap(
                    lambda s: GA_.score_area_ownership(s.stones, s.size)
                )(child_states).reshape(b, -1)
            t_score = jnp.sum(own_map, axis=-1).astype(
                jnp.float32
            ) - jax.vmap(self.env.komi_with_penalty)(child_states)
            return own_map.astype(jnp.float32), t_score

        own_map, t_score = lax.cond(
            jnp.any(term),
            term_scores,
            lambda _: (
                jnp.zeros((b, self.env.n * self.env.n), jnp.float32),
                jnp.zeros((b,), jnp.float32),
            ),
            None,
        )
        t_wl = jnp.where(t_score > 0, 1.0, jnp.where(t_score < 0, 0.0, 0.5))
        black_wl = jnp.where(term, t_wl, evals.black_wl)
        black_score = jnp.where(term, t_score, evals.black_score)
        black_own = jnp.where(
            term[:, None], own_map, evals.black_ownership
        )
        draw = jnp.where(term, 0.0, evals.draw)

        # ---- expand (unless child exists / tree full / root terminal) ----
        new_idx = tree.next_free
        can_expand = (
            (existing_child < 0)
            & (new_idx < cfg.max_nodes)
            & ~tree.terminal[:, 0]
            & active
        )
        node_for_stats = jnp.where(
            existing_child >= 0, existing_child, jnp.minimum(new_idx, cfg.max_nodes - 1)
        )
        reuse_root = tree.terminal[:, 0]
        node_for_stats = jnp.where(reuse_root, 0, node_for_stats)

        # masked rows scatter out of bounds and are DROPPED — no gather of
        # the old row + select (halves the expand's memory traffic and op
        # count vs the round-2 gather/where/scatter formulation)
        child_p8, child_p32 = tree.state_spec.pack(child_states)
        exp_idx = jnp.where(can_expand, node_for_stats, cfg.max_nodes)
        exp_act = jnp.where(can_expand, leaf_action, self.A)

        def set_node(buf, vals):
            return buf.at[b_idx, exp_idx].set(vals, mode="drop")

        tree = tree.replace(
            prior=set_node(tree.prior, evals.priors),
            child=tree.child.at[b_idx, leaf_parent, exp_act].set(
                node_for_stats, mode="drop"
            ),
            parent=set_node(tree.parent, leaf_parent),
            parent_action=set_node(tree.parent_action, leaf_action),
            # net_wl lives in stats slot 7; visits/accumulators start at 0
            stats=tree.stats.at[b_idx, exp_idx, 7].set(
                black_wl, mode="drop"
            ),
            net_score=set_node(tree.net_score, black_score),
            terminal=set_node(tree.terminal, term),
            valid=tree.valid.at[b_idx, exp_idx].set(True, mode="drop"),
            states_p8=tree.states_p8.at[b_idx, exp_idx].set(
                child_p8, mode="drop"
            ),
            states_p32=tree.states_p32.at[b_idx, exp_idx].set(
                child_p32, mode="drop"
            ),
            next_free=tree.next_free + can_expand.astype(jnp.int32),
        )
        if cfg.first_pass_bonus:
            sb = self._score_bonus(
                parent_states, leaf_action, tree.root_ownership
            )
            tree = tree.replace(black_sb=set_node(tree.black_sb, sb))

        # ---- backup: Update() along path + the leaf (node.cc:692-734) ----
        # All path nodes of one simulation are distinct, so the whole
        # backup is ONE gather + ONE scatter per stat array (no sequential
        # walk — the array-search equivalent of the reference's per-node
        # atomic adds).
        leaf_ok = (can_expand | (existing_child >= 0)) & ~reuse_root & active
        upd_idx = jnp.concatenate(
            [
                path,                                     # [B, D]
                jnp.where(leaf_ok, node_for_stats, -1)[:, None],
                jnp.where(reuse_root & active, 0, -1)[:, None],
            ],
            axis=1,
        )                                                 # [B, D+2]
        ok = (upd_idx >= 0) & active[:, None]
        idx_safe = jnp.maximum(upd_idx, 0)
        bb = b_idx[:, None]

        old = tree.stats[bb, idx_safe]                   # [B, D+2, 8]
        old_v = old[..., 0]
        old_wl = old[..., 1]
        old_sc = old[..., 3]

        def wdelta(x, old_acc, ov):
            old_delta = jnp.where(
                ov > 0, x - old_acc / jnp.maximum(ov, 1.0), 0.0
            )
            new_delta = x - (old_acc + x) / (ov + 1.0)
            return old_delta * new_delta

        wl_e = black_wl[:, None]
        dr_e = draw[:, None]
        sc_e = black_score[:, None]
        vf = ok.astype(jnp.float32)

        # score-utility cache for the updated node (computed from the
        # POST-update stats; the center is the per-search constant — see
        # the Tree.stats docstring)
        nv2 = old_v + 1.0
        acc_sc2 = old_sc + sc_e
        sqs2 = old[..., 5] + wdelta(sc_e, old_sc, old_v)
        mean2 = acc_sc2 / nv2
        if cfg.first_pass_bonus:
            # GetScoreEval adds the node's bonus to the score mean before
            # the utility transform (node.cc:757-760); fold it into the
            # cached value here
            mean2 = mean2 + tree.black_sb[bb, idx_safe]
        var2 = jnp.where(nv2 > 1.0, sqs2 / jnp.maximum(nv2 - 1.0, 1.0), 1.0)
        center = self._score_center(tree)[:, None]
        se_new = (
            expected_score_value(
                mean2,
                jnp.sqrt(jnp.maximum(var2, 0.0)),
                center,
                cfg.score_utility_div,
                float(self.env.n),
            )
            * cfg.score_utility_factor
        )

        delta = jnp.stack(
            [
                vf,                                        # visits
                wl_e * vf,
                dr_e * vf,
                sc_e * vf,
                wdelta(wl_e, old_wl, old_v) * vf,
                wdelta(sc_e, old_sc, old_v) * vf,
                (se_new - old[..., 6]) * vf,               # cache -> se_new
                jnp.zeros_like(vf),                        # net_wl unchanged
            ],
            axis=-1,
        )
        # masked-out entries scatter out of bounds and are dropped
        idx_scatter = jnp.where(ok, idx_safe, tree.stats.shape[1])
        tree = tree.replace(
            stats=tree.stats.at[bb, idx_scatter].add(delta, mode="drop")
        )

        # root ownership running average (node.cc:724-733)
        rv = tree.visits[:, 0].astype(jnp.float32)
        tree = tree.replace(
            root_ownership=jnp.where(
                active[:, None],
                tree.root_ownership
                + (black_own - tree.root_ownership) / rv[:, None],
                tree.root_ownership,
            )
        )
        return tree

    def run(self, tree: Tree, num_sims: int, budget=None, ctx=None) -> Tree:
        """Run `num_sims` lockstep simulations (Computation's playout loop,
        search.cc:342-386). `budget` ([B] int32) caps playouts per lane;
        `ctx` is forwarded to the evaluator."""

        def body(i, t):
            active = None if budget is None else i < budget
            return self.simulate(t, i, active, ctx)

        return lax.fori_loop(0, num_sims, body, tree)

    # ------------------------------------------------------------------
    # tree reuse across moves (AdvanceToNewRootState, search.cc:1345-1414)
    # ------------------------------------------------------------------

    def advance_root(self, tree: Tree, actions, new_root_states: GoState,
                     rng, use_noise=None, use_gumbel=None, prior_mask=None,
                     ctx=None):
        """Re-root each tree at the chosen move's child and compact the
        retained subtree to the front of the node arrays; lanes whose child
        was never expanded fall back to a fresh tree.

        The reference walks the old tree and grafts the kept subtree
        (search.cc:1345-1414); here membership is computed by pointer-
        doubling over the parent array and the compaction is a prefix-sum
        renumbering + scatter — one batched pass per move."""
        cfg = self.cfg
        b = tree.visits.shape[0]
        n_nodes = cfg.max_nodes
        b_idx = jnp.arange(b)
        bb = b_idx[:, None]
        nodes = jnp.arange(n_nodes)[None, :]

        new_root = tree.child[b_idx, 0, actions]          # [B] (-1 = none)
        has_reuse = (new_root >= 0) & ~tree.terminal[:, 0]
        root_safe = jnp.maximum(new_root, 0)

        # --- membership via pointer doubling over parents ---
        in_sub = nodes == root_safe[:, None]
        # parent pointers with self-loops at roots (-1) for safe jumping
        anc = jnp.where(tree.parent >= 0, tree.parent, nodes)
        steps = max(1, int(np.ceil(np.log2(max(cfg.max_depth, 2)))) + 1)
        for _ in range(steps):
            in_sub = in_sub | jnp.take_along_axis(in_sub, anc, axis=1)
            anc = jnp.take_along_axis(anc, anc, axis=1)
        in_sub = in_sub & (nodes < tree.next_free[:, None])

        # --- renumber: new_root -> 0, others by old-index rank ---
        is_other = in_sub & (nodes != root_safe[:, None])
        rank = jnp.cumsum(is_other.astype(jnp.int32), axis=1)
        new_id = jnp.where(nodes == root_safe[:, None], 0, rank)
        new_id = jnp.where(in_sub, new_id, n_nodes)       # drop non-members
        count = 1 + rank[:, -1]

        def remap_nodes(c):
            """old child/parent index -> new index (-1 preserved)."""
            safe = jnp.maximum(c, 0)
            mapped = jnp.take_along_axis(
                jnp.concatenate([new_id, jnp.full((b, 1), n_nodes)], 1),
                safe.reshape(b, -1),
                axis=1,
            ).reshape(c.shape)
            return jnp.where((c >= 0) & (mapped < n_nodes), mapped, -1)

        def compact(arr):
            """scatter members to their new slots ([B, N, ...] arrays)."""
            return jnp.zeros_like(arr).at[bb, new_id].set(arr, mode="drop")

        reused = tree.replace(
            prior=compact(tree.prior),
            child=jnp.full_like(tree.child, -1).at[bb, new_id].set(
                remap_nodes(tree.child), mode="drop"
            ),
            parent=jnp.full_like(tree.parent, -1).at[bb, new_id].set(
                remap_nodes(tree.parent), mode="drop"
            ).at[:, 0].set(-1),
            parent_action=compact(tree.parent_action),
            stats=compact(tree.stats),
            net_score=compact(tree.net_score),
            terminal=compact(tree.terminal),
            valid=compact(tree.valid),
            black_sb=compact(tree.black_sb),
            states_p8=compact(tree.states_p8),
            states_p32=compact(tree.states_p32),
            next_free=count,
        )

        # --- fresh tree for all lanes (also supplies new root evals,
        # noise, gumbel); select per lane ---
        # the cache rides through: reuse lanes' root positions were cached
        # when first expanded, so their (discarded) fresh-root evals drop
        # out of the compacted forward as hits
        fresh = self.init_tree(
            new_root_states,
            rng,
            use_noise=use_noise,
            use_gumbel=use_gumbel,
            prior_mask=prior_mask,
            ctx=ctx,
            cache=tree.cache,
        )

        # reused lanes: overwrite root state with the authoritative game
        # state, refresh noise/gumbel buffers, apply the superko prior mask
        slim = new_root_states.replace(
            hash_history=new_root_states.hash_history[:, :1, :]
        )
        slim_p8, slim_p32 = tree.state_spec.pack(slim)
        reused = reused.replace(
            states_p8=reused.states_p8.at[:, 0].set(slim_p8),
            states_p32=reused.states_p32.at[:, 0].set(slim_p32),
            # a reused root was expanded as a LEAF; refill its priors with
            # the fresh root-flavored eval (root policy temp / normal
            # head / root gammas), the reference's RecomputePolicy on
            # reuse (node.cc:41-45, 83-125)
            prior=reused.prior.at[:, 0].set(fresh.prior[:, 0]),
            root_noise=fresh.root_noise,
            root_gumbel=fresh.root_gumbel,
            gumbel_key=fresh.gumbel_key,
            use_noise=fresh.use_noise,
            use_gumbel=fresh.use_gumbel,
            root_ownership=fresh.root_ownership,
        )
        if prior_mask is not None:
            pri = jnp.where(prior_mask, reused.prior[:, 0], 0.0)
            pri = pri / jnp.maximum(
                jnp.sum(pri, axis=-1, keepdims=True), 1e-12
            )
            reused = reused.replace(
                prior=reused.prior.at[:, 0].set(pri)
            )

        # merge per lane; the cache is merged out-of-band (fresh.cache is
        # the evolved shared cache for ALL lanes — a per-lane where would
        # broadcast its scalar counter and drop fresh lanes' entries)
        cache_out = fresh.cache
        out = jax.tree.map(
            lambda r, f: jnp.where(
                jnp.reshape(
                    has_reuse,
                    has_reuse.shape + (1,) * (r.ndim - 1),
                ),
                r,
                f,
            ),
            reused.replace(cache=None),
            fresh.replace(cache=None),
        )
        # freeze the score-utility center AFTER the reuse merge: reused
        # roots carry the previous search's accumulated estimate
        # (PrepareParam runs after PrepareRootNode's reuse, search.cc:184)
        out = out.replace(
            cache=cache_out,
            score_center=out.acc_score[:, 0]
            / jnp.maximum(out.visits[:, 0], 1),
        )
        return out, has_reuse

    # ------------------------------------------------------------------
    # results
    # ------------------------------------------------------------------

    def root_child_visits(self, tree: Tree) -> jnp.ndarray:
        """[B, A] visit counts of root children."""
        g, _ = self._child_stats(tree)
        return g[..., 0].astype(jnp.int32)

    def root_child_q(self, tree: Tree, color) -> jnp.ndarray:
        """[B, A] mean child values in `color` perspective; unvisited -> 0."""
        g, _ = self._child_stats(tree)
        nv = g[..., 0]
        wl_b = g[..., 1] / jnp.maximum(nv, 1.0)
        wl = jnp.where(color[:, None] == 0, wl_b, 1.0 - wl_b)
        return jnp.where(nv > 0, wl, 0.0)

    def root_lcb_scores(self, tree: Tree) -> jnp.ndarray:
        """[B, A] reference LCB utility per root child
        (GetSortedLcbUtilityList, node.cc): for each visited child

            lcb   = mean - z * stddev / visits       (GetLcb, node.cc:792-811)
            z     = cached t-quantile at dof = visits - 2 (lcb.h:47-87,
                    complement probability ci_alpha = 1e-5, config.cc:63,140)
            mixed = lcb + score_eval(color)
            rlcb  = mixed*(1 - lcb_reduction) + lcb_reduction*visits/cv

        Children with visits <= 1 get prior - 1e6 (GetLcb's sentinel);
        unvisited children get -inf."""
        cfg = self.cfg
        g, _ = self._child_stats(tree)
        nv = g[..., 0]
        visits = nv.astype(jnp.int32)
        color = tree.states.to_move[:, 0]
        wl_b = g[..., 1] / jnp.maximum(nv, 1.0)
        mean = jnp.where(color[:, None] == 0, wl_b, 1.0 - wl_b)
        var = jnp.where(visits > 1, g[..., 4] / jnp.maximum(nv - 1.0, 1.0), 1.0)
        stddev = jnp.sqrt(jnp.maximum(var, 0.0))
        if cfg.ci_alpha == 1e-5:
            z_tab = jnp.asarray(_LCB_Z_TABLE)
        else:  # non-default --ci-alpha (config.cc:63,140)
            z_tab = jnp.asarray(_make_lcb_z_table(cfg.ci_alpha))
        z = z_tab[jnp.clip(visits - 2, 0, z_tab.shape[0] - 1)]
        lcb = mean - z * stddev / jnp.maximum(nv, 1.0)
        sign = jnp.where(color == 0, 1.0, -1.0)[:, None]
        mixed = lcb + sign * g[..., 6]
        cv = jnp.maximum(jnp.sum(nv, axis=-1, keepdims=True), 1.0)
        red = float(np.clip(cfg.lcb_reduction, 0.0, 1.0))
        rlcb = mixed * (1.0 - red) + red * (nv / cv)
        prior = tree.prior[:, 0]
        rlcb = jnp.where(visits <= 1, prior - 1e6, rlcb)
        return jnp.where(visits > 0, rlcb, -jnp.inf)

    def best_move(self, tree: Tree, allow_pass=None) -> jnp.ndarray:
        """Reference best-move selection (GetBestMove, node.cc): argmax of
        the LCB utility list over visited children; when nothing is visited,
        fall back to the raw prior (ProbSelectChild). `allow_pass` ([B] bool)
        masks the pass move when the self-play forbid-pass rule fires
        (search.cc:870-946)."""
        visits = self.root_child_visits(tree)
        score = self.root_lcb_scores(tree)
        pass_a = tree.num_actions - 1
        if allow_pass is not None:
            # keep pass only if it is the sole visited move
            others = visits.at[:, pass_a].set(0)
            has_other = jnp.any(others > 0, axis=-1)
            kill = ~allow_pass & has_other
            score = score.at[:, pass_a].set(
                jnp.where(kill, -jnp.inf, score[:, pass_a])
            )
            visits = visits.at[:, pass_a].set(
                jnp.where(kill, 0, visits[:, pass_a])
            )
        any_visited = jnp.any(visits > 0, axis=-1)
        best_lcb = jnp.argmax(score, axis=-1)
        best_prior = jnp.argmax(tree.prior[:, 0], axis=-1)
        return jnp.where(any_visited, best_lcb, best_prior).astype(jnp.int32)


def _bcast(flag, like):
    """Broadcast [B] bool against [B, ...] array."""
    return jnp.reshape(flag, flag.shape + (1,) * (like.ndim - 1))
