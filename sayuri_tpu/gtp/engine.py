"""GTP agent: one game + network + search, host-driven.

The reference's GtpLoop::Agent bundles {GameState, Network, Search}
(/root/reference/src/game/gtp.h:21-72); here the bundle is a single-game
wrapper over the batched jitted engine (batch dim 1). Undo is a host-side
state stack (the reference keeps full board history in GameState,
game_state.h:201).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sayuri_tpu.game.state import GoEnv, GoState
from sayuri_tpu.game.types import AREA_RULE, TERRITORY_RULE
from sayuri_tpu.mcts.core import MCTS, SearchConfig
from sayuri_tpu.mcts import gumbel as G
from sayuri_tpu.models.evaluator import make_dummy_eval_fn, make_eval_fn
from sayuri_tpu.models.network import NetConfig, SayuriNet

COLS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"  # GTP columns skip 'I'


def vertex_to_gtp(v, size):
    if v is None:
        return "pass"
    if v >= size * size or v < 0:
        return "pass"
    y, x = divmod(int(v), size)
    return f"{COLS[x]}{y + 1}"


def gtp_to_vertex(s, size):
    s = s.strip().lower()
    if s in ("pass", "p"):
        return size * size
    if s == "resign":
        return "resign"
    col = COLS.lower().index(s[0])
    row = int(s[1:]) - 1
    if not (0 <= col < size and 0 <= row < size):
        raise ValueError(f"vertex {s} out of board")
    return row * size + col


class Agent:
    """Single-game engine instance."""

    def __init__(
        self,
        boardsize: int = 19,
        komi: float = 7.5,
        playouts: int = 400,
        net_cfg: NetConfig | None = None,
        variables=None,
        search_cfg: SearchConfig | None = None,
        max_nodes: int | None = None,
        seed: int = 0,
        ponder: bool = False,
        kldgain_per_node: float = 0.0,
        kldgain_interval: int = 0,
        chunk: int = 16,
        friendly_pass: bool = False,
        capture_all_dead: bool = False,
        patterns_file: str | None = None,
        gammas_policy_factor: float = 0.0,
        use_rollout: bool = False,
        symmetry_ensemble: bool = True,
        policy_temp: float = 1.0,
        root_policy_temp: float = -1.0,
        suppress_pass_factor: float = 0.1667,
        use_stm_winrate: bool = False,
        use_optimistic_policy: bool = False,
        timemanage: str = "off",
        ponder_factor: int = 100,
        symm_pruning: bool = False,
    ):
        self.n_buffer = boardsize
        self.playouts = playouts
        self.seed = seed
        self.net_cfg = net_cfg
        self.variables = variables
        self.search_cfg = search_cfg or SearchConfig(
            max_nodes=max_nodes or (playouts + 16)
        )
        self._rng = jax.random.PRNGKey(seed)
        self.book = None  # optional opening book (game/book.py)
        # host-side search control (search.cc:353-386 stop-poll loop)
        self.ponder_enabled = ponder
        self.kldgain_per_node = kldgain_per_node
        self.kldgain_interval = kldgain_interval
        self.chunk = chunk
        self.reuse_tree = True
        # post-search move hygiene (search.cc:830-861; defaults off like
        # the reference's friendly_pass / capture_all_dead options,
        # config.cc:29,34)
        self.friendly_pass = friendly_pass
        self.capture_all_dead = capture_all_dead
        # legacy pattern-gammas policy mixing for dynamic strength
        # (--patterns + gammas_policy_factor, node.cc:151-160)
        self.gammas = None
        if patterns_file:
            from sayuri_tpu.pattern.gammas import GammasDict

            self.gammas = GammasDict.load(patterns_file)
        self.gammas_policy_factor = float(gammas_policy_factor)
        # MC-rollout ownership fallback (--use-rollout, rollout.h,
        # node.cc:342-347)
        self.use_rollout = use_rollout
        self.symmetry_ensemble = symmetry_ensemble
        self.policy_temp = float(policy_temp)
        # root follows policy_temp unless set explicitly (config.cc:289-292)
        self.root_policy_temp = float(root_policy_temp)
        self.suppress_pass_factor = float(suppress_pass_factor)
        self.use_stm_winrate = bool(use_stm_winrate)
        self.use_optimistic_policy = bool(use_optimistic_policy)
        # early-stop time management (off/on/fast/keep, search.cc:1435-1498)
        self.timemanage = timemanage
        self.ponder_factor = max(1, int(ponder_factor))
        # root symmetry pruning in the opening (node.cc:193-247)
        self.symm_pruning = bool(symm_pruning)
        self._np_rng = np.random.RandomState(seed)
        self._build(boardsize, komi)

    # -- construction / reconstruction (Network::Reconstruct path,
    # network.h:37) --

    def _build(self, size: int, komi: float, rule: int = AREA_RULE):
        self.env = GoEnv(n=size)
        self.size = size
        self.komi = komi
        self.rule = rule
        self._build_eval_fns()
        self.state = self._single(self.env.new_state(komi=komi, rule=rule))
        self.history: list[GoState] = []
        self.moves: list[tuple[int, int]] = []  # (color, vertex)
        # territory-rule dead-stone map from the last area playout
        # (GameState::territory_helper_, game_state.h:211)
        self._territory_helper = None
        self._drop_tree()

    def _gammas_arg(self):
        """(DeviceGammas, factor) for per-expansion policy mixing
        (node.cc:151-160), or None when patterns are off. The compiled
        device table is cached per GammasDict instance."""
        if self.gammas is None or self.gammas_policy_factor <= 0:
            return None
        from sayuri_tpu.pattern.gammas_jax import DeviceGammas

        if getattr(self, "_gammas_dev_src", None) is not self.gammas:
            self._gammas_dev = DeviceGammas.compile(self.gammas)
            self._gammas_dev_src = self.gammas
        return (self._gammas_dev, float(self.gammas_policy_factor))

    def refresh_gammas(self):
        """Live setoption change of patterns/factor: the mixing factor and
        table are baked into the jitted eval path, so rebuild it (without
        touching the game state)."""
        self._build_eval_fns()
        self._drop_tree()

    def _build_eval_fns(self):
        gammas_arg = self._gammas_arg()
        self._gammas_in_eval = gammas_arg is not None
        root_eval_fn = None
        if self.variables is not None and self.net_cfg is not None:
            net = SayuriNet(self.net_cfg)
            # search queries ensemble over a random symmetry per leaf
            # (Network::kRandom, node.cc:146); debug probes (raw_nn,
            # wdl_rating) use the direct evaluator (kDirect, gtp.cc:789)
            # and never mix gammas or suppress pass (the reference does
            # both in Node::GetNetOutput/ExpandChildren, not in
            # Network::GetOutput)
            sym = "random" if self.symmetry_ensemble else 0
            leaf_head = (
                "optimistic_prob" if self.use_optimistic_policy else "prob"
            )
            self.eval_fn = make_eval_fn(
                self.env, net, self.variables, symmetry=sym,
                policy_temp=self.policy_temp, gammas=gammas_arg,
                policy_head=leaf_head,
                suppress_pass_factor=self.suppress_pass_factor,
                use_stm_winrate=self.use_stm_winrate,
            )
            # the ROOT is always evaluated with the normal policy head and
            # root_policy_temp (Node::GetNetOutput, node.cc:130-143)
            root_temp = (
                self.root_policy_temp
                if self.root_policy_temp > 0
                else self.policy_temp
            )
            if leaf_head != "prob" or root_temp != self.policy_temp:
                root_eval_fn = make_eval_fn(
                    self.env, net, self.variables, symmetry=sym,
                    policy_temp=root_temp, gammas=gammas_arg,
                    policy_head="prob",
                    suppress_pass_factor=self.suppress_pass_factor,
                    use_stm_winrate=self.use_stm_winrate,
                )
            self.eval_fn_direct = make_eval_fn(
                self.env, net, self.variables, symmetry=0,
                policy_temp=self.policy_temp, suppress_pass_factor=0.0,
            )
            self.eval_fn_avg = make_eval_fn(
                self.env, net, self.variables, symmetry="average",
                policy_temp=self.policy_temp, suppress_pass_factor=0.0,
            )
            self.has_net = True
        else:
            self.eval_fn = make_dummy_eval_fn(
                self.env, suppress_pass_factor=self.suppress_pass_factor
            )
            self.eval_fn_direct = self.eval_fn
            self.eval_fn_avg = self.eval_fn
            self.has_net = False
            if gammas_arg is not None:
                from sayuri_tpu.pattern.gammas_jax import (
                    wrap_eval_with_gammas,
                )

                self.eval_fn = wrap_eval_with_gammas(
                    self.env, self.eval_fn, *gammas_arg
                )
        if getattr(self, "use_rollout", False):
            from sayuri_tpu.mcts.rollout import wrap_eval_with_rollout

            self.eval_fn = wrap_eval_with_rollout(self.env, self.eval_fn)
        self.mcts = MCTS(
            self.env, self.eval_fn, self.search_cfg,
            root_eval_fn=root_eval_fn,
        )
        self._jit_cache = {}

    def _drop_tree(self):
        """Forget the retained search tree (ReleaseTree, search.cc)."""
        self._tree = None
        self._ctx = None
        self._tree_moves = 0
        self._last_reused = False

    @staticmethod
    def _single(state):
        return jax.tree.map(lambda x: x[None], state)

    # -- game commands --

    def clear_board(self):
        self.state = self._single(
            self.env.new_state(komi=self.komi, rule=self.rule)
        )
        self.history = []
        self.moves = []
        self._territory_helper = None
        self._drop_tree()

    def set_boardsize(self, size: int):
        self._build(size, self.komi, self.rule)

    def set_komi(self, komi: float):
        self.komi = komi
        self.state = self.state.replace(
            komi=jnp.full_like(self.state.komi, komi)
        )
        self._drop_tree()  # node values depend on komi

    def set_rule(self, rule: int):
        self.rule = rule
        self.state = self.state.replace(
            rule=jnp.full_like(self.state.rule, rule)
        )
        self._drop_tree()

    def to_move(self) -> int:
        return int(self.state.to_move[0])

    def play(self, color: int, vertex: int):
        """Play a move (forcing side-to-move like GTP play does)."""
        if int(self.state.to_move[0]) != color:
            self.state = self.state.replace(
                to_move=jnp.full_like(self.state.to_move, color)
            )
            # the retained tree's edges assume the natural side-to-move
            self._drop_tree()
        self.history.append(self.state)
        step = self._get_jit("step", lambda: jax.jit(jax.vmap(self.env.step)))
        self.state = step(self.state, jnp.asarray([vertex], jnp.int32))
        self.moves.append((color, vertex))

    def undo(self):
        if self.history:
            self.state = self.history.pop()
            self.moves.pop()
            self._drop_tree()

    def is_legal(self, color: int, vertex: int) -> bool:
        st = self.state.replace(
            to_move=jnp.full_like(self.state.to_move, color)
        )
        mask = self._get_jit(
            "legal", lambda: jax.jit(jax.vmap(self.env.legal_action_mask))
        )(st)
        return bool(np.asarray(mask)[0, vertex])

    def stones(self) -> np.ndarray:
        return np.asarray(self.state.stones[0])

    # -- search --

    def _get_jit(self, name, builder):
        if name not in self._jit_cache:
            self._jit_cache[name] = builder()
        return self._jit_cache[name]

    def _init_fn(self):
        """jit: root ladders + fresh forest (PrepareRootNode)."""
        if "init_tree" not in self._jit_cache:
            mcts = self.mcts

            @jax.jit
            def init(states, rng, prior_mask):
                from sayuri_tpu.game import ladder as L

                ctx = {
                    "ladders": L.ladder_planes_batch(
                        states.stones, states.size, states.ko
                    )
                }
                tree = mcts.init_tree(
                    states, rng, prior_mask=prior_mask, ctx=ctx
                )
                return tree, ctx

            self._jit_cache["init_tree"] = init
        return self._jit_cache["init_tree"]

    def _advance_fn(self):
        """jit: re-root the retained tree at a played move
        (AdvanceToNewRootState, search.cc:1345-1414)."""
        if "advance" not in self._jit_cache:
            mcts = self.mcts

            @jax.jit
            def advance(tree, action, new_states, rng, prior_mask):
                from sayuri_tpu.game import ladder as L

                ctx = {
                    "ladders": L.ladder_planes_batch(
                        new_states.stones, new_states.size, new_states.ko
                    )
                }
                tree, reused = mcts.advance_root(
                    tree, action, new_states, rng,
                    prior_mask=prior_mask, ctx=ctx,
                )
                return tree, ctx, reused

            self._jit_cache["advance"] = advance
        return self._jit_cache["advance"]

    def _chunk_fn(self, chunk):
        key = ("chunk", chunk)
        if key not in self._jit_cache:
            mcts = self.mcts

            @jax.jit
            def run(tree, ctx):
                return mcts.run(tree, chunk, ctx=ctx)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _superko_mask(self):
        return self._get_jit(
            "superko", lambda: jax.jit(jax.vmap(self.env.superko_action_mask))
        )(self.state)

    def _symm_prune_keep(self):
        """[A] bool keep-mask pruning symmetric duplicate root moves in
        the opening (apply while move_number <= board_size,
        node.cc:193-247): each vertex's orbit key is the lexicographic
        min over the 8 dihedral symmetries of
        symmetry_hash(board, s) ^ zobrist_key(mover, T_s(vertex)); only
        the lowest-index member of each orbit is kept. Like the
        reference, capture effects on the hash are ignored (captures are
        rare in the opening)."""
        from sayuri_tpu.game import board as B_
        from sayuri_tpu.game.types import C_BLACK, C_WHITE
        from sayuri_tpu.models import symmetry as S

        n = self.size

        def fn(state):
            stones = state.stones[0]
            tm = state.to_move[0]
            cells, _ = B_._zobrist_tables(n)
            keys = jnp.where(
                tm[None, None] == 0, cells[:, C_BLACK], cells[:, C_WHITE]
            )  # [2, n*n]
            best = None
            for s in range(8):
                # the transforms are pure flips/transposes — dtype-safe
                # for int8 boards and uint32 key tables alike
                base = B_.position_hash(
                    S.transform_planes(stones[:, :, None], s)[:, :, 0],
                    n,
                )  # [2]
                # key(T_s(v)) for all v: transform_planes(x,s)[u] reads
                # x[T_s^-1(u)], so the stone played at v lands at T_s(v)
                # in the transformed frame — the INVERSE transform of the
                # key planes yields keys[T_s(v)] at v
                k_s = (
                    S.inverse_transform_planes(keys.T.reshape(n, n, 2), s)
                    .reshape(n * n, 2)
                    .T
                )
                h = base[:, None] ^ k_s  # [2, n*n]
                if best is None:
                    best = h
                else:
                    better = (h[0] < best[0]) | (
                        (h[0] == best[0]) & (h[1] < best[1])
                    )
                    best = jnp.where(better[None], h, best)
            # keep the lowest flat index per orbit key
            same = (best[0][:, None] == best[0][None, :]) & (
                best[1][:, None] == best[1][None, :]
            )
            idx = jnp.arange(n * n)
            earlier = same & (idx[None, :] < idx[:, None])
            keep_board = ~jnp.any(earlier, axis=1)
            return jnp.concatenate(
                [keep_board, jnp.ones((1,), bool)]
            )

        return self._get_jit("symm_prune", lambda: jax.jit(fn))(self.state)

    def _prepare_root(self, prior_mask=None):
        """Reuse-or-rebuild the root forest for the current position
        (PrepareRootNode, search.cc:139-181). Returns (tree, ctx).

        `prior_mask` ([1, A] bool, True = keep) is ANDed with the superko
        purge mask; move restrictions force a fresh tree (the reference
        releases the tree when analyze avoid/allow are set, gtp.cc)."""
        mask = np.asarray(~self._superko_mask())
        if self.symm_pruning and len(self.moves) <= self.size:
            # opening-only root orbit pruning (node.cc:194: applies while
            # board_size >= move_number)
            mask = mask & np.asarray(self._symm_prune_keep())[None]
        if prior_mask is not None:
            mask = mask & np.asarray(prior_mask)
            self._drop_tree()
        mask = jnp.asarray(mask)
        self._rng, sub = jax.random.split(self._rng)
        delta = len(self.moves) - self._tree_moves
        if self.reuse_tree and self._tree is not None and 0 <= delta <= 2:
            tree, ctx = self._tree, self._ctx
            self._last_reused = delta == 0
            for i in range(delta):
                action = self.moves[self._tree_moves + i][1]
                k = self._tree_moves + i + 1
                new_state = (
                    self.history[k] if k < len(self.history) else self.state
                )
                self._rng, sub_i = jax.random.split(self._rng)
                tree, ctx, reused = self._advance_fn()(
                    tree,
                    jnp.asarray([action], jnp.int32),
                    new_state,
                    sub_i,
                    mask,
                )
                self._last_reused = bool(np.asarray(reused)[0])
        else:
            tree, ctx = self._init_fn()(self.state, sub, mask)
            self._last_reused = False
        tree = self._mix_gammas_policy(tree)
        self._tree = tree
        self._ctx = ctx
        self._tree_moves = len(self.moves)
        return tree, ctx

    def _mix_gammas_policy(self, tree):
        """Host-side ROOT gammas mix (node.cc:151-160: p = (1-f)*nn +
        f*(1-pass_prob)*gammas, gammas scaled by NN ownership through the
        Pachi MC-owner table). Only a fallback: when patterns were loaded
        at construction/refresh time, the device table mixes at EVERY
        expansion inside the jitted eval path (pattern/gammas_jax.py) —
        including the root — so this host probe must not double-mix."""
        f = self.gammas_policy_factor
        if self.gammas is None or f <= 0:
            return tree
        if getattr(self, "_gammas_in_eval", False):
            return tree
        size = self.size
        prior = np.asarray(tree.prior[0, 0]).copy()
        legal = prior > 0
        own = np.asarray(tree.root_ownership[0])
        if self.to_move() == 1:
            own = -own
        last = self.moves[-1][1] if self.moves else None
        if last is not None and last >= size * size:
            last = None
        gp = self.gammas.policy(
            self.stones(), size, self.to_move(), legal,
            last_move=last, ownership=own,
        )
        reduction = 1.0 - prior[size * size]
        mixed = prior.copy()  # pass stays untouched (node.cc:157 loop
        # covers board cells only)
        mixed[: size * size] = (1.0 - f) * prior[: size * size] + (
            f * reduction * gp[: size * size]
        )
        mixed = np.where(legal, mixed, 0.0)
        s = mixed.sum()
        if s > 0:
            mixed /= s
        return tree.replace(
            prior=tree.prior.at[:, 0].set(jnp.asarray(mixed)[None])
        )

    def gammas_policy_map(self):
        """Pattern-gammas policy over the current position for the gogui
        visualizations (GameState::GetGammasPolicy, game_state.cc:620),
        or None when no patterns are loaded."""
        if self.gammas is None:
            return None
        size = self.size
        legal = np.asarray(
            jax.jit(jax.vmap(self.env.legal_action_mask))(self.state)
        )[0]
        last = self.moves[-1][1] if self.moves else None
        if last is not None and last >= size * size:
            last = None
        return self.gammas.policy(
            self.stones(), size, self.to_move(), legal[: size * size + 1],
            last_move=last,
        )

    def _one_reasonable_move(self, tree, done, cap_left, elapsed, budget):
        """True when exactly one root child can still matter: every other
        child can neither catch the visit leader with the playouts that
        remain nor beat the leader's LCB (the timemanage early-stop test,
        search.cc:1447-1476)."""
        visits = np.asarray(self.mcts.root_child_visits(tree))[0]
        prior = np.asarray(tree.prior[0, 0])
        cand = prior > 0
        if cand.sum() <= 1:
            return True
        est = cap_left
        remaining = max(budget - elapsed, 0.0)
        est = min(est, int(round(remaining * done / max(elapsed, 1e-9))))
        top = visits.max()
        lcb = np.asarray(self.mcts.root_lcb_scores(tree))[0]
        q = np.asarray(
            self.mcts.root_child_q(
                tree, jnp.asarray([self.to_move()], jnp.int32)
            )
        )[0]
        visited = visits > 0
        toplcb = lcb[visited].max() if visited.any() else -np.inf
        good = (visits + est >= top) | (visited & (q >= toplcb))
        bad_cnt = int((cand & ~good).sum())
        return bad_cnt == int(cand.sum()) - 1

    def think(
        self,
        playouts=None,
        time_budget=None,
        analyze_cb=None,
        analyze_interval=0.0,
        prior_mask=None,
        stop_check=None,
        tm_allowed=False,
    ):
        """Search the current position with the reference's stop conditions
        (Computation's main-thread poll, search.cc:353-386): playout cap,
        wall-clock budget, KLD-gain plateau (search.cc:1524-1549), and
        only-one-legal-move. The search runs in jitted chunks with host
        polls between chunks. Returns (tree, stats)."""
        playouts = playouts or self.playouts
        t0 = time.monotonic()
        tree, ctx = self._prepare_root(prior_mask)
        start_visits = int(np.asarray(tree.visits[0, 0]))

        # only-one-move early exit (HaveAlternateMoves, search.cc:1416-1443)
        legal_count = int(np.asarray((tree.prior[0, 0] > 0).sum()))
        only_one = legal_count <= 1

        chunk = max(1, min(self.chunk, playouts))
        run = self._chunk_fn(chunk)
        done = 0
        prev_kld_visits = start_visits
        prev_kld_policy = None
        next_analyze = (
            t0 + analyze_interval if analyze_cb and analyze_interval else None
        )
        stopped_by = "cap"
        while done < playouts:
            if only_one and done > 0:
                stopped_by = "only_move"
                break
            if stop_check is not None and stop_check():
                stopped_by = "input"
                break
            if time_budget is not None and (
                time.monotonic() - t0 >= time_budget
            ):
                stopped_by = "time"
                break
            # tree full: visits can still accumulate but no new nodes --
            # stop instead of spinning (the reference tree is unbounded)
            if int(np.asarray(tree.next_free[0])) >= self.search_cfg.max_nodes:
                stopped_by = "tree_full"
                break
            tree = run(tree, ctx)
            done += chunk
            self._tree = tree

            # timemanage early stop: save clock when only one move is
            # still reasonable (search.cc:1435-1498; mode gating done by
            # the GTP loop via tm_allowed)
            if (
                tm_allowed
                and self.timemanage != "off"
                and time_budget is not None
                and done >= 100
            ):
                el = time.monotonic() - t0
                if el >= 1.0 and self._one_reasonable_move(
                    tree, done, playouts - done, el, time_budget
                ):
                    stopped_by = "timemanage"
                    break

            if next_analyze is not None and time.monotonic() >= next_analyze:
                analyze_cb(tree)
                next_analyze = time.monotonic() + analyze_interval

            # KLD-gain stop (StoppedByKldGain, search.cc:1524-1549); the
            # stop statistic uses the root visit distribution (the
            # reference uses the assembled target policy -- equivalent for
            # stopping purposes at these intervals)
            if self.kldgain_per_node > 0 and self.kldgain_interval > 0:
                visits_now = int(np.asarray(tree.visits[0, 0]))
                vdiff = visits_now - prev_kld_visits
                if vdiff >= self.kldgain_interval:
                    dist = np.asarray(
                        self.mcts.root_child_visits(tree), np.float64
                    )[0]
                    dist = np.maximum(dist / max(dist.sum(), 1.0), 1e-8)
                    if prev_kld_policy is not None:
                        kld = float(
                            np.sum(dist * np.log(dist / prev_kld_policy))
                        )
                        if kld / vdiff < self.kldgain_per_node:
                            prev_kld_visits = visits_now
                            prev_kld_policy = dist
                            stopped_by = "kldgain"
                            break
                    prev_kld_visits = visits_now
                    prev_kld_policy = dist

        jax.block_until_ready(tree.stats)
        elapsed = time.monotonic() - t0
        self._tree = tree
        return tree, {
            "playouts": done,
            "visits": int(np.asarray(tree.visits[0, 0])),
            "time": elapsed,
            "stopped_by": stopped_by,
            "reused": self._last_reused,
        }

    def ponder(self, stop_check, max_playouts=None):
        """Search the opponent's position on their time (TryPonder,
        search.cc:1071-1091); `stop_check()` -> True aborts (the
        reference's InputPending poll). The grown tree is retained for
        reuse by the next think()."""
        if not self.ponder_enabled:
            return None
        # ponder_playouts = playouts * ponder_factor (GetPonderPlayouts,
        # search.cc:1551-1560)
        max_playouts = max_playouts or self.ponder_factor * self.playouts
        tree, stats = self.think(playouts=max_playouts, stop_check=stop_check)
        return stats

    def genmove(
        self,
        color: int,
        playouts=None,
        resign_threshold=0.1,
        time_budget=None,
        analyze_cb=None,
        analyze_interval=0.0,
        tm_allowed=False,
    ):
        """Search and play the best move (ThinkBestMove, search.cc:864).
        An opening-book hit short-circuits the search (search.cc:295-300)."""
        if int(self.state.to_move[0]) != color:
            self.state = self.state.replace(
                to_move=jnp.full_like(self.state.to_move, color)
            )
            self._drop_tree()
        book = getattr(self, "book", None)
        if book is not None:
            single = jax.tree.map(lambda x: x[0], self.state)
            legal = np.asarray(
                self._get_jit(
                    "legal",
                    lambda: jax.jit(jax.vmap(self.env.legal_action_mask)),
                )(self.state)
            )[0]
            mv = book.probe(single, legal)
            if mv is not None:
                self.play(color, mv)
                return mv, None
        tree, _ = self.think(
            playouts,
            time_budget=time_budget,
            analyze_cb=analyze_cb,
            analyze_interval=analyze_interval,
            tm_allowed=tm_allowed,
        )
        best = int(np.asarray(self.mcts.best_move(tree))[0])
        root_v = np.asarray(tree.visits[:, 0])[0]
        wl_black = float(np.asarray(tree.acc_wl[:, 0])[0]) / max(root_v, 1)
        wl = wl_black if color == 0 else 1.0 - wl_black
        if wl < resign_threshold and self.moves:
            return "resign", tree
        if self.friendly_pass or self.capture_all_dead:
            best = self._apply_move_hygiene(best, tree, color)
        self.play(color, best)
        return best, tree

    # -- in-process self-play probes (gtp.cc:334-372) -------------------

    def _selfplay_actor(self):
        """One-lane SelfplayActor with exploration on, for the
        selfplay-genmove / selfplay GTP probes (gtp.cc:334-355)."""
        from sayuri_tpu.selfplay.actor import SelfplayActor, SelfplayConfig

        actor = getattr(self, "_sp_actor", None)
        if actor is None:
            actor = SelfplayActor(
                self.env,
                self.mcts,
                SelfplayConfig(
                    playouts=self.playouts,
                    fastsearch_playouts=max(1, self.playouts // 3),
                ),
                reuse_tree=False,
            )
            self._sp_actor = actor
            self._sp_records = []
            self._sp_lost = jnp.zeros((1,), bool)
        return actor

    def selfplay_move(self, color: int):
        """One self-play-policy move from the current position, recorded
        into the training buffer (GetSelfPlayMove + PlayMove,
        gtp.cc:334-347). Returns the vertex played."""
        actor = self._selfplay_actor()
        if int(self.state.to_move[0]) != color:
            self.state = self.state.replace(
                to_move=jnp.full_like(self.state.to_move, color)
            )
        self._rng, sub = jax.random.split(self._rng)
        new_states, record, self._sp_lost, _, move = actor._move_step(
            self.state, sub, self._sp_lost
        )
        self._sp_records.append(jax.tree.map(np.asarray, record))
        v = int(np.asarray(move)[0])
        self.history.append(self.state)
        self.state = new_states
        self.moves.append((color, v))
        self._drop_tree()
        if bool(np.asarray(self.state.terminated)[0]):
            self.update_territory_helper()
        return v

    def game_over(self) -> bool:
        return bool(np.asarray(self.state.terminated)[0])

    def dump_training_buffer(self, filename: str):
        """Serialize the self-play buffer to a training-data text file
        (Search::SaveTrainingBuffer, search.cc:1124-1137)."""
        from sayuri_tpu.selfplay.actor import assemble_targets
        from sayuri_tpu.selfplay import data as D

        records = getattr(self, "_sp_records", [])
        if not records:
            raise ValueError("training buffer is empty")
        helper = None
        if self._territory_helper is not None:
            helper = jnp.asarray(self._territory_helper)[None]
        targets = assemble_targets(
            self.env, self.state, records, territory_helper=helper
        )
        games = D.games_to_text(self.env, records, targets)
        with open(filename, "w") as f:
            for game in games:
                for pos in game:
                    f.write(pos)

    def clear_training_buffer(self):
        self._sp_records = []
        self._sp_lost = jnp.zeros((1,), bool)

    def gen_openings(self, num_sgfs: int, opening_moves: int,
                     max_attempts: int | None = None):
        """Generate fair random openings (gtp.cc:682-743): policy-sampled
        (temperature 1.2) opening sequences kept only when a bounded search
        rates them within ±0.025 winrate of the empty board's, dedup'd over
        all 8 symmetry reflections. Returns a list of SGF strings. The
        agent's game state is reset afterwards."""
        from sayuri_tpu.game import board as B_
        from sayuri_tpu.game.sgf import game_to_sgf

        size = self.size
        saved = (self.state, list(self.history), list(self.moves))
        out, seen = [], set()
        legal_fn = self._get_jit(
            "legal", lambda: jax.jit(jax.vmap(self.env.legal_action_mask))
        )

        def sym_hashes(stones):
            hs = []
            for k in range(4):
                r = np.rot90(stones, k)
                for bmat in (r, np.fliplr(r)):
                    h = np.asarray(
                        B_.position_hash(jnp.asarray(bmat.copy()), size)
                    )
                    hs.append((int(h[0]), int(h[1])))
            return hs

        self.clear_board()
        fair_tree, _ = self.think(playouts=min(self.playouts, 400))
        v0 = max(int(np.asarray(fair_tree.visits[0, 0])), 1)
        fair_wl_b = float(np.asarray(fair_tree.acc_wl[0, 0])) / v0
        attempts = 0
        cap = max_attempts if max_attempts is not None else 20 * max(
            num_sgfs, 1
        )
        while len(out) < num_sgfs and attempts < cap:
            attempts += 1
            self.clear_board()
            moves = []
            for _ in range(opening_moves):
                evals = self.eval_fn(self.state, None)
                pri = np.asarray(evals.priors)[0][: size * size]
                legal = np.asarray(legal_fn(self.state))[0][: size * size]
                w = np.where(legal, np.maximum(pri, 1e-12), 0.0)
                w = w ** (1.0 / 1.2)
                if w.sum() <= 0:
                    break
                v = int(self._np_rng.choice(size * size, p=w / w.sum()))
                color = self.to_move()
                self.play(color, v)
                moves.append((color, v, None))
            hs = sym_hashes(self.stones())
            if hs[0] in seen:
                continue
            tree, _ = self.think(playouts=min(self.playouts, 400))
            v1 = max(int(np.asarray(tree.visits[0, 0])), 1)
            wl_b = float(np.asarray(tree.acc_wl[0, 0])) / v1
            # the reference compares in the CANDIDATE's to-move
            # perspective, flipping the fair winrate when the opening
            # leaves the other color to move (gtp.cc:723-729)
            if self.to_move() == 0:
                fair_tm, eval_tm = fair_wl_b, wl_b
            else:
                fair_tm, eval_tm = 1.0 - fair_wl_b, 1.0 - wl_b
            upper = fair_tm + 0.025
            if eval_tm > upper or eval_tm < 1.0 - upper:
                continue
            seen.update(hs)
            out.append(game_to_sgf(size, self.komi, moves))
        self.state, self.history, self.moves = saved
        self._drop_tree()
        return out

    # -- post-search move hygiene (search.cc:640-861) -------------------

    def _hygiene_maps(self):
        """(safe [n,n] bool, safe_own [n,n] {-1,0,1}, raw_own [n,n]) for
        the current position (GetStrictSafeArea / GetOwnership /
        GetRawOwnership, game_state.cc:505-521, 832-836)."""

        def build():
            from sayuri_tpu.game import analysis as A
            from sayuri_tpu.game import board as B

            def one(s):
                safe, own = A.safe_and_ownership(s.stones, s.size)
                raw = B.area_ownership(s.stones, s.size)
                return safe, own, raw

            return jax.jit(jax.vmap(one))

        safe, own, raw = self._get_jit("hygiene", build)(self.state)
        return (
            np.asarray(safe)[0],
            np.asarray(own)[0],
            np.asarray(raw)[0],
        )

    def _score_black_cleaned(self, cleaned_stones):
        """Final score from BLACK's view after dead-stone removal
        (fork_state.GetFinalScore, search.cc:819-822)."""
        fn = self._get_jit(
            "score_cleaned", lambda: jax.jit(jax.vmap(self.env.final_score))
        )
        st = self.state.replace(
            stones=jnp.asarray(cleaned_stones, self.state.stones.dtype)[None]
        )
        return float(np.asarray(fn(st))[0])

    def dead_alive(self, tree=None):
        """(dead, alive) [n,n] stone masks from search root ownership
        (search.cc:640-683). Runs a fresh bounded search when no tree is
        given (final_status_list's Computation(400), gtp.cc:498-500)."""
        from sayuri_tpu.mcts import hygiene as H

        if tree is None:
            tree, _ = self.think(playouts=min(self.playouts, 400))
        color = self.to_move()
        safe, safe_own, _ = self._hygiene_maps()
        own_black = np.asarray(tree.root_ownership[0]).reshape(
            self.size, self.size
        )
        owner = H.owner_map(safe, safe_own, own_black, color)
        return H.dead_alive_masks(self.stones(), owner, color)

    def _apply_move_hygiene(self, best, tree, color):
        """Friendly pass + capture-all-dead filters on the chosen move
        (GetBestMove, search.cc:846-860). Area scoring only."""
        from sayuri_tpu.mcts import hygiene as H

        if self.rule != AREA_RULE:
            return best
        pass_a = self.size * self.size
        safe, safe_own, raw = self._hygiene_maps()
        stones = self.stones()
        own_black = np.asarray(tree.root_ownership[0]).reshape(
            self.size, self.size
        )
        owner = H.owner_map(safe, safe_own, own_black, color)
        last_was_pass = bool(self.moves) and self.moves[-1][1] >= pass_a
        if self.friendly_pass and last_was_pass:
            dead, _ = H.dead_alive_masks(stones, owner, color)
            if H.should_pass(
                stones,
                dead,
                color,
                len(self.moves),
                True,
                self._score_black_cleaned,
            ):
                best = pass_a
        if self.capture_all_dead and best == pass_a:
            legal = np.asarray(
                self._get_jit(
                    "legal",
                    lambda: jax.jit(jax.vmap(self.env.legal_action_mask)),
                )(self.state)
            )[0]
            sk = np.asarray(self._superko_mask())[0]
            cad = H.capture_all_dead_move(
                stones, owner, raw, legal, sk, color, self._np_rng
            )
            if cad is not None:
                best = cad
        return best

    def analysis_data(self, tree, max_moves=10):
        """Per-move stats rows for analyze commands, ranked by the
        reference's LCB utility (GetSortedLcbUtilityList + ToAnalysisString,
        node.cc:982-1088). Each row carries visits/winrate/drawrate/
        scorelead/prior/lcb/pv; the PV walks best-LCB children
        (GetPvString, node.cc:1092-1107)."""
        from sayuri_tpu.mcts.core import _LCB_Z_TABLE

        child = np.asarray(tree.child[0])    # [N, A]
        stats = np.asarray(tree.stats[0])    # [N, 8]
        prior = np.asarray(tree.prior[0])    # [N, A]
        red = float(np.clip(self.search_cfg.lcb_reduction, 0.0, 1.0))

        def child_rows(node, color):
            """(action, child_idx, visits, rlcb, winrate, draw, score, p)"""
            ch = child[node]
            acts = np.nonzero(ch >= 0)[0]
            rows = []
            cv = 0.0
            for a in acts:
                cv += stats[ch[a], 0]
            cv = max(cv, 1.0)
            sign = 1.0 if color == 0 else -1.0
            for a in acts:
                c = ch[a]
                v = stats[c, 0]
                if v <= 0:
                    continue
                wl_b = stats[c, 1] / v
                mean = wl_b if color == 0 else 1.0 - wl_b
                draw = stats[c, 2] / v
                score = sign * stats[c, 3] / v
                if v <= 1:
                    rlcb = prior[node, a] - 1e6
                else:
                    var = max(stats[c, 4] / (v - 1.0), 0.0)
                    z = _LCB_Z_TABLE[
                        min(max(int(v) - 2, 0), len(_LCB_Z_TABLE) - 1)
                    ]
                    lcb = mean - z * np.sqrt(var) / v
                    mixed = lcb + sign * stats[c, 6]
                    rlcb = mixed * (1.0 - red) + red * v / cv
                rows.append(
                    (int(a), int(c), int(v), float(rlcb), float(mean),
                     float(draw), float(score), float(prior[node, a]))
                )
            rows.sort(key=lambda r: -r[3])
            return rows

        def pv_from(node, color, first_action, depth=12):
            pv = [first_action]
            cur, col = node, 1 - color
            for _ in range(depth):
                rows = child_rows(cur, col)
                if not rows:
                    break
                a, c = rows[0][0], rows[0][1]
                pv.append(a)
                cur, col = c, 1 - col
            return pv

        color = int(self.state.to_move[0])
        rows = []
        for a, c, v, rlcb, wl, draw, score, p in child_rows(0, color)[
            :max_moves
        ]:
            rows.append(
                dict(
                    move=int(a),
                    visits=v,
                    winrate=wl,
                    drawrate=draw,
                    scorelead=score,
                    prior=p,
                    lcb=max(rlcb, 0.0),
                    order=len(rows),
                    pv=pv_from(c, color, a),
                )
            )
        return rows

    def root_info(self, tree):
        """Root summary for the sayuri analyze header (node.cc:1002-1010)."""
        v = max(int(np.asarray(tree.visits[0, 0])), 1)
        color = int(self.state.to_move[0])
        wl_b = float(np.asarray(tree.acc_wl[0, 0])) / v
        score_b = float(np.asarray(tree.acc_score[0, 0])) / v
        return dict(
            visits=v,
            winrate=wl_b if color == 0 else 1.0 - wl_b,
            drawrate=float(np.asarray(tree.acc_draw[0, 0])) / v,
            scorelead=score_b if color == 0 else -score_b,
        )

    def ownership(self) -> np.ndarray:
        own = self._get_jit(
            "ownership", lambda: jax.jit(jax.vmap(self.env.ownership))
        )(self.state)
        return np.asarray(own)[0]

    def update_territory_helper(self):
        """Label dead stones for territory scoring by playing the position
        out under the area rule with fast no-exploring searches
        (Search::UpdateTerritoryHelper, search.cc:1139-1162). Stores the
        end position's score-area ownership as the helper."""
        from sayuri_tpu.selfplay.actor import SelfplayActor, SelfplayConfig

        if self.rule != TERRITORY_RULE:
            self._territory_helper = None
            return
        actor = getattr(self, "_playout_actor", None)
        if actor is None:
            actor = SelfplayActor(
                self.env,
                self.mcts,
                SelfplayConfig(
                    playouts=max(1, min(self.playouts, 100)),
                    fastsearch_playouts=0,
                ),
                reuse_tree=False,
            )
            self._playout_actor = actor
        self._rng, sub = jax.random.split(self._rng)
        helper = actor.territory_playout(self.state, sub)
        self._territory_helper = np.asarray(helper)[0]

    def final_score_str(self) -> str:
        if self.rule == TERRITORY_RULE and self._territory_helper is not None:
            fn = self._get_jit(
                "final_score_helper",
                lambda: jax.jit(jax.vmap(self.env.final_score_with_helper)),
            )
            helper = jnp.asarray(self._territory_helper)[None]
            score = float(np.asarray(fn(self.state, helper))[0])
        else:
            score = float(
                np.asarray(
                    self._get_jit(
                        "final_score",
                        lambda: jax.jit(jax.vmap(self.env.final_score)),
                    )(self.state)
                )[0]
            )
        if abs(score) < 1e-4:
            return "0"
        if score > 0:
            return f"B+{abs(score):g}"
        return f"W+{abs(score):g}"

    def raw_nn(self, use_avg: bool = False):
        """Raw network heads at the current position (sayuri-raw_nn,
        gtp.cc:603-620): direct symmetry, or the 8-fold average ensemble
        when `use_avg` (gtp.cc:615)."""
        fn = self.eval_fn_avg if use_avg else self.eval_fn_direct
        evals = fn(self.state, None)
        return jax.tree.map(lambda x: np.asarray(x)[0], evals._asdict())

    def raw_heads(self):
        """Full network output dict (all 5 policy heads + value misc) at
        the current position, or None without loaded weights. Used by the
        gogui policy-offset visualizations (gtp.cc:818-930)."""
        if self.variables is None or self.net_cfg is None:
            return None
        from sayuri_tpu.models.encoder import encode
        from sayuri_tpu.models.network import SayuriNet

        net = SayuriNet(self.net_cfg)
        planes = jax.jit(jax.vmap(lambda s: encode(self.env, s)))(
            self.state
        )
        out = jax.jit(
            lambda x: net.apply(self.variables, x, train=False)
        )(planes)
        return jax.tree.map(lambda x: np.asarray(x)[0], out)

    def eval_children_wl(self, actions):
        """Batched one-forward lookahead: step each action, evaluate all
        children in ONE forward, return the mover's winrate per action
        (the TPU-native version of gogui-wdl_rating's serial
        play/eval/undo loop, gtp.cc:790-817)."""
        acts = jnp.asarray(actions, jnp.int32)
        base = jax.tree.map(
            lambda x: jnp.broadcast_to(x[0], (len(actions),) + x.shape[1:]),
            self.state,
        )
        children = jax.jit(jax.vmap(self.env.step))(base, acts)
        evals = self.eval_fn_direct(children, None)
        # black_wl -> mover's perspective
        wl = np.asarray(evals.black_wl)
        if int(np.asarray(self.state.to_move)[0]) == 1:
            wl = 1.0 - wl
        return wl

    def planes_str(self) -> str:
        """Encoder plane dump (sayuri-planes, encoder.cc:52-78 format)."""
        from sayuri_tpu.models.encoder import encode

        planes = np.asarray(
            jax.jit(jax.vmap(lambda s: encode(self.env, s)))(self.state)
        )[0]
        size = self.size
        out = ["encoder version: 2"]
        for p in range(planes.shape[-1]):
            out.append(f"plane: {p + 1}")
            for y in range(size):
                row = []
                for x in range(size):
                    v = planes[y, x, p]
                    row.append("     x" if abs(v) < 1e-4 else f"{v:6.2f}")
                out.append("".join(row))
        return "\n".join(out)
