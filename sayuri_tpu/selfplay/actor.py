"""Vectorized self-play actor.

TPU-first re-design of the reference self-play engine
(/root/reference/src/selfplay/engine.cc, src/mcts/search.cc:948-1309): the
reference runs `parallel_games` worker threads, each driving one GameState +
Search against a shared network; here B games advance in lockstep — one
jitted `move_step` does (superko purge -> batched search -> move selection ->
env step) for every game at once, and the host loop simply iterates moves,
collecting per-move records until all games end.

Implemented semantics with citations:
- playout-cap randomization: each move each lane independently runs a fast
  (no-exploring, reduced-playout) or full (Gumbel/noise) search
  (search.cc:948-1005); fast-search data is marked discard
  (search.cc:1040-1046)
- forbid-pass for data quality (ShouldForbidPass, search.cc:870-946)
- resign bookkeeping: lanes whose eval collapses keep playing but further
  positions are mostly fast-searched/discarded (search.cc:961-979)
- random opening moves proportional to visits (search.cc:1026-1035)
- training targets: completed-Q target policy with damping + policy target
  pruning (search.cc:571-634), windowed average Q/score, KataGo short/mid/
  long-term values with exact lambda coefficients, ownership, aux next-move
  policy (GatherTrainingBuffer, search.cc:1169-1309)
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sayuri_tpu.game import board as B_
from sayuri_tpu.game.state import GoEnv, GoState
from sayuri_tpu.game.types import AREA_RULE
from sayuri_tpu.mcts.core import MCTS
from sayuri_tpu.mcts import gumbel as G


@dataclasses.dataclass(frozen=True)
class SelfplayConfig:
    """Self-play knobs, named after the reference options
    (config.cc:95-128, bash/configs/selfplay-config.txt)."""

    playouts: int = 150
    fastsearch_playouts: int = 50
    fastsearch_playouts_prob: float = 0.75
    resign_threshold: float = 0.1
    resign_playouts: int = 0
    resign_discard_prob: float = 0.8
    random_moves_factor: float = 0.0
    random_moves_temp: float = 1.0
    random_fastsearch_prob: float = 0.0
    # low-visit pruning of the proportional random move ("On Strength
    # Adjustment for MCTS-Based Programs"; GetRandomMoveProportionally,
    # node.cc:578-609): keep children with
    # visits > max(round(max_visits * min_ratio), min_visits)
    random_min_ratio: float = 0.0
    random_min_visits: int = 1
    max_moves_factor: float = 1.8  # game length cap, in units of n*n
    # random opening sampling (engine.cc:245-284, config.cc:97-98);
    # prob < 0 = legacy auto (0.75 when random_moves_factor > 0)
    random_opening_prob: float = -1.0
    random_opening_temp: float = 1.2
    komi_stddev: float = 0.0
    komi_big_stddev: float = 0.0
    komi_big_stddev_prob: float = 0.0


class MoveRecord(NamedTuple):
    """Per-move training record (the reference's TrainingData fields that
    are known at move time, training_data.h:6-36)."""

    states: GoState           # position BEFORE the move (root state)
    target_policy: jnp.ndarray  # [B, A]
    q_value: jnp.ndarray        # [B] stm perspective (buffer convention)
    score_lead: jnp.ndarray     # [B] stm perspective
    q_stddev: jnp.ndarray       # [B]
    score_stddev: jnp.ndarray   # [B]
    kld: jnp.ndarray            # [B] policy surprise
    discard: jnp.ndarray        # [B] bool
    move: jnp.ndarray           # [B] chosen action
    active: jnp.ndarray         # [B] game still running at this move
    visits: jnp.ndarray         # [B] root children visit total (for the
    #                             SGF search-stat comment, search.cc:1056)


class SelfplayActor:
    def __init__(self, env: GoEnv, mcts: MCTS, cfg: SelfplayConfig,
                 reuse_tree: bool = True, mesh=None):
        self.env = env
        self.mcts = mcts
        self.cfg = cfg
        # tree reuse across moves = the reference's default "visit cap
        # oscillation" mode (GetSelfPlayMove, search.cc:948-960)
        self.reuse_tree = reuse_tree
        # optional jax.sharding.Mesh: self-play batches are sharded over
        # the mesh's "data" axis (SURVEY.md §2.10 P3/P4 — the TPU-native
        # replacement for the reference's one-thread-per-GPU forward pipe,
        # cuda_forward_pipe.cc:14-33). jit propagates the input sharding
        # through search + env step, so lanes stay device-resident.
        self.mesh = mesh
        self.last_query_stats = None
        self._move_step = jax.jit(self._move_step_impl)
        self._move_step_reuse = jax.jit(self._move_step_impl)
        self._playout_step = jax.jit(self._playout_step_impl)

    # ------------------------------------------------------------------

    def _target_policy(self, tree, visits_dist, children_visits):
        """Completed-Q target policy with damping + policy target pruning
        (search.cc:571-634)."""
        mcts = self.mcts
        cfg = mcts.cfg
        b = visits_dist.shape[0]
        b_idx = jnp.arange(b)

        cq = G.completed_q_policy(mcts, tree)
        # gumbel lanes: pure completed-Q policy
        gumbel_target = cq

        # PUCT lanes: damped mix + pruning
        damping = 800.0
        factor = jnp.minimum(
            jnp.minimum(children_visits.astype(jnp.float32), damping) / damping,
            1.0,
        )[:, None]
        mixed = factor * visits_dist + (1.0 - factor) * cq

        best = jnp.argmax(mixed, axis=-1)
        vv = jnp.maximum(3200, children_visits).astype(jnp.float32)
        cpuct = cfg.cpuct_init + cfg.cpuct_base_factor * jnp.log(
            (vv + cfg.cpuct_base + 1.0) / cfg.cpuct_base
        )
        prior = tree.prior[b_idx, 0]
        color = tree.states.to_move[b_idx, 0]
        q = mcts.root_child_q(tree, color)
        child = tree.child[b_idx, 0]
        nv = mcts.root_child_visits(tree)
        # unvisited children: estimate with the completed-Q approximate value
        raw = jnp.where(
            color == 0, tree.net_wl[b_idx, 0], 1.0 - tree.net_wl[b_idx, 0]
        )
        est_q = jnp.where(nv > 0, q, raw[:, None])
        best_q = jnp.take_along_axis(est_q, best[:, None], axis=-1)
        value_diff = best_q - est_q
        wanted_visits = jnp.maximum(
            0.0,
            jnp.round(
                cpuct[:, None] * prior * vv[:, None]
                / jnp.maximum(value_diff, 1e-8)
            )
            - 1.0,
        )
        wanted_prob = wanted_visits / vv[:, None]
        pruned = jnp.where(
            (value_diff > 0)
            & (jnp.arange(visits_dist.shape[-1])[None, :] != best[:, None]),
            jnp.minimum(mixed, wanted_prob),
            mixed,
        )
        total = jnp.sum(pruned, axis=-1, keepdims=True)
        puct_target = jnp.where(
            total > 1e-4, pruned / jnp.maximum(total, 1e-8), visits_dist
        )

        target = jnp.where(
            tree.use_gumbel[:, None], gumbel_target, puct_target
        )
        # no visits at all -> raw visit dist (uniform-ish fallback)
        target = jnp.where(
            (children_visits > 0)[:, None], target, visits_dist
        )
        return target

    def _forbid_pass(self, states, tree, raw_ownership):
        """ShouldForbidPass (search.cc:870-946), vectorized."""
        env = self.env
        n = env.n
        b = states.stones.shape[0]
        nn_count = states.size * states.size
        move_thresh = nn_count // 6
        early = states.move_count <= move_thresh

        # safe ownership = score-area ownership of the CURRENT position
        from sayuri_tpu.game import analysis as A

        safe_own = jax.vmap(A.score_area_ownership)(
            states.stones, states.size
        ).reshape(b, -1)                       # +1 black / -1 white / 0
        color = states.to_move
        sign = jnp.where(color == 0, 1, -1)[:, None]
        safe_mine = safe_own * sign            # +1 = mine

        mask = jax.vmap(lambda s: B_.board_mask(s, n))(states.size).reshape(
            b, -1
        )

        # MCTS-ownership dead opponent stones (search.cc:894-906):
        # opp stone judged mine by search ownership, not already safe-mine
        mcts_own_mine = tree.root_ownership * sign.astype(jnp.float32)
        stones_flat = states.stones.reshape(b, -1)
        opp_c = (2 - color)[:, None]
        opp_stone = (stones_flat == opp_c) & mask
        dead_opp = jnp.any(
            opp_stone & (mcts_own_mine > 0.75) & (safe_mine != 1), axis=-1
        )

        # raw-NN-ownership dead area (search.cc:908-922)
        raw_mine = raw_ownership * sign.astype(jnp.float32)
        raw_dead = jnp.any(
            mask & (raw_mine >= 0.8) & (safe_mine != 1), axis=-1
        )

        # large undecided empty region (search.cc:924-940)
        neutral = (safe_own == 0) & mask
        lbl = jax.vmap(B_.chain_labels)(neutral.reshape(b, n, n))
        sizes = jax.vmap(
            lambda l: jnp.zeros((n * n + 1,), jnp.int32)
            .at[jnp.where(l >= 0, l, n * n).reshape(-1)]
            .add(1, mode="drop")[: n * n]
        )(lbl)
        big_empty = jnp.any(sizes >= 8, axis=-1)

        area_checks = dead_opp | raw_dead | big_empty
        is_area = states.rule == AREA_RULE
        return early | (is_area & area_checks)

    def _move_step_impl(self, states, rng, already_lost, prev_tree=None,
                        prev_action=None):
        env, mcts, cfg = self.env, self.mcts, self.cfg
        b = states.stones.shape[0]
        b_idx = jnp.arange(b)
        k_fast, k_tree, k_rand, k_pick = jax.random.split(rng, 4)

        # --- playout-cap randomization (search.cc:961-994) ---
        fast_prob = jnp.where(
            already_lost,
            1.0
            - (1.0 - cfg.fastsearch_playouts_prob)
            * (1.0 - cfg.resign_discard_prob),
            cfg.fastsearch_playouts_prob,
        )
        use_fast = (
            jax.random.uniform(k_fast, (b,)) < fast_prob
        ) & (0 < cfg.fastsearch_playouts < cfg.playouts)
        budget = jnp.where(use_fast, cfg.fastsearch_playouts, cfg.playouts)
        if cfg.resign_playouts > 0:
            budget = jnp.where(
                use_fast & already_lost,
                jnp.minimum(budget, cfg.resign_playouts),
                budget,
            )

        use_noise = ~use_fast & mcts.cfg.dirichlet_noise
        use_gumbel = ~use_fast & mcts.cfg.gumbel

        # --- root superko purge (node.cc:1824-1841) ---
        superko = jax.vmap(env.superko_action_mask)(states)

        # root ladder planes reused for every leaf eval this move
        # (ladder_mode="root"; see models/evaluator.py)
        from sayuri_tpu.game import ladder as L

        ctx = {
            "ladders": L.ladder_planes_batch(
                states.stones, states.size, states.ko
            )
        }

        if prev_tree is None:
            tree = mcts.init_tree(
                states,
                k_tree,
                use_noise=use_noise,
                use_gumbel=use_gumbel,
                prior_mask=~superko,
                ctx=ctx,
            )
        else:
            tree, _ = mcts.advance_root(
                prev_tree,
                prev_action,
                states,
                k_tree,
                use_noise=use_noise,
                use_gumbel=use_gumbel,
                prior_mask=~superko,
                ctx=ctx,
            )
        raw_priors = tree.prior[:, 0]
        raw_nn_ownership = tree.root_ownership  # == NN ownership before sims
        # visit-cap semantics under reuse: the budget tops the root up to
        # the target visit count (search.cc:948-960)
        budget_eff = jnp.maximum(budget - (tree.visits[:, 0] - 1), 0)
        tree = mcts.run(tree, cfg.playouts, budget=budget_eff, ctx=ctx)

        # --- root stats ---
        root_v = jnp.maximum(tree.visits[:, 0], 1)
        root_wl_b = tree.acc_wl[:, 0] / root_v       # black persp
        root_score_b = tree.acc_score[:, 0] / root_v
        color = states.to_move
        root_wl_stm = jnp.where(color == 0, root_wl_b, 1.0 - root_wl_b)
        root_score_stm = jnp.where(color == 0, root_score_b, -root_score_b)
        q_stddev = jnp.sqrt(
            jnp.maximum(
                jnp.where(
                    root_v > 1, tree.sq_eval_diff[:, 0] / jnp.maximum(root_v - 1, 1), 1.0
                ),
                0.0,
            )
        )
        score_stddev = jnp.sqrt(
            jnp.maximum(
                jnp.where(
                    root_v > 1, tree.sq_score_diff[:, 0] / jnp.maximum(root_v - 1, 1), 1.0
                ),
                0.0,
            )
        )

        # --- move selection ---
        forbid_pass = self._forbid_pass(states, tree, raw_nn_ownership)
        allow_pass = ~forbid_pass
        best = mcts.best_move(tree, allow_pass=allow_pass)
        gmove = G.gumbel_move(mcts, tree, allow_pass=allow_pass)
        move = jnp.where(use_gumbel, gmove, best)

        # random opening / fast-search moves ~ visits^(1/temp)
        # (GetRandomMoveProportionally, node.cc:578-629), with low-visit
        # pruning: visits > max(round(max_visits*min_ratio), min_visits)
        visits = mcts.root_child_visits(tree).astype(jnp.float32)
        min_v = jnp.maximum(
            jnp.round(
                jnp.max(visits, axis=-1, keepdims=True)
                * cfg.random_min_ratio
            ),
            float(cfg.random_min_visits),
        )
        logw = jnp.where(
            visits > min_v,
            jnp.log(jnp.maximum(visits, 1e-9))
            / max(cfg.random_moves_temp, 1e-4),
            -jnp.inf,
        )
        # if pruning empties the candidate set, fall back to the best move
        # (node.cc:611-613) by keeping the max-visit child
        none_left = ~jnp.any(jnp.isfinite(logw), axis=-1, keepdims=True)
        is_top = visits >= jnp.max(visits, axis=-1, keepdims=True)
        logw = jnp.where(none_left & is_top & (visits > 0), 0.0, logw)
        pass_a = env.num_actions - 1
        logw = jnp.where(
            forbid_pass[:, None]
            & (jnp.arange(env.num_actions)[None] == pass_a),
            -jnp.inf,
            logw,
        )
        rand_move = jax.random.categorical(k_pick, logw, axis=-1).astype(
            jnp.int32
        )
        nn_count = states.size * states.size
        opening = states.move_count < (
            cfg.random_moves_factor * nn_count.astype(jnp.float32)
        ).astype(jnp.int32)
        use_rand = (opening & ~use_gumbel) | (
            ~already_lost
            & use_fast
            & (jax.random.uniform(k_rand, (b,)) < cfg.random_fastsearch_prob)
        )
        has_rand = jnp.any(jnp.isfinite(logw), axis=-1)
        move = jnp.where(use_rand & has_rand, rand_move, move)

        # --- training record ---
        children_visits = jnp.sum(
            mcts.root_child_visits(tree), axis=-1
        )
        visits_dist = visits / jnp.maximum(
            jnp.sum(visits, axis=-1, keepdims=True), 1.0
        )
        target = self._target_policy(tree, visits_dist, children_visits)
        kld = jnp.sum(
            jnp.where(
                target > 0,
                target
                * jnp.log(
                    jnp.maximum(target, 1e-25)
                    / jnp.maximum(raw_priors, 1e-25)
                ),
                0.0,
            ),
            axis=-1,
        )
        discard = use_fast

        # --- resign bookkeeping (search.cc:961-965) ---
        lost_now = (root_wl_stm < cfg.resign_threshold) | (
            root_wl_stm > 1.0 - cfg.resign_threshold
        )
        new_lost = already_lost | (lost_now & ~use_fast)

        active = ~states.terminated
        # strip the superko ring from the record (only needed live; the
        # encoder never reads it) to keep per-move memory small
        slim_states = states.replace(
            hash_history=states.hash_history[..., :1, :]
        )
        record = MoveRecord(
            states=slim_states,
            target_policy=target,
            q_value=root_wl_stm,
            score_lead=root_score_stm,
            q_stddev=q_stddev,
            score_stddev=score_stddev,
            kld=kld,
            discard=discard,
            move=move,
            active=active,
            visits=children_visits.astype(jnp.int32),
        )
        new_states, _ = env.step_batch_with_analysis(states, move)
        return new_states, record, new_lost, tree, move

    # ------------------------------------------------------------------
    # territory-rule dead-stone labeling (UpdateTerritoryHelper,
    # search.cc:1139-1162)
    # ------------------------------------------------------------------

    def _playout_step_impl(self, states, rng):
        """One fast no-exploring move for the territory-helper playout
        (GetSelfPlayMove with kNoExploring | kNoBuffer, search.cc:1154-1156).
        Forbid-pass keeps lanes capturing dead stones until the position is
        resolved, then games end by two passes."""
        env, mcts, cfg = self.env, self.mcts, self.cfg
        b = states.stones.shape[0]
        superko = jax.vmap(env.superko_action_mask)(states)
        from sayuri_tpu.game import ladder as L

        ctx = {
            "ladders": L.ladder_planes_batch(
                states.stones, states.size, states.ko
            )
        }
        off = jnp.zeros((b,), bool)
        tree = mcts.init_tree(
            states, rng, use_noise=off, use_gumbel=off,
            prior_mask=~superko, ctx=ctx,
        )
        playouts = (
            cfg.fastsearch_playouts
            if 0 < cfg.fastsearch_playouts < cfg.playouts
            else cfg.playouts
        )
        tree = mcts.run(tree, playouts, ctx=ctx)
        forbid = self._forbid_pass(states, tree, tree.root_ownership)
        move = mcts.best_move(tree, allow_pass=~forbid)
        new_states, _ = env.step_batch_with_analysis(states, move)
        return new_states

    def territory_playout(self, final_states: GoState, rng,
                          max_steps: int | None = None):
        """[B, n, n] territory-helper ownership for a finished batch.

        For territory-rule lanes: resume the ended game (the two ending
        passes are undone — board and to-move are unchanged by an even
        number of passes), switch it to area scoring with the
        score-preserving komi offset (GetPenaltyOffset, game_state.cc:711),
        play it out with fast no-exploring searches until every dead string
        is captured, and return the end position's score-area ownership
        (Search::UpdateTerritoryHelper, search.cc:1139-1162). Area-rule
        lanes stay frozen and their helper slots are unused."""
        env = self.env
        from sayuri_tpu.game import analysis as A
        from sayuri_tpu.game.types import TERRITORY_RULE

        # reduce to a replicated scalar before reading on the host: the
        # batch may be a multi-host global array whose shards are not all
        # addressable here (np.asarray on it would throw)
        terr = final_states.rule == TERRITORY_RULE
        if not bool(jnp.any(terr)):
            return jax.vmap(A.score_area_ownership)(
                final_states.stones, final_states.size
            )
        if max_steps is None:
            max_steps = env.n * env.n
        offset = jax.vmap(env.penalty_offset_to_area)(final_states)
        states = final_states.replace(
            # area lanes stay terminated (step() freezes them)
            terminated=jnp.where(terr, False, final_states.terminated),
            pass_count=jnp.where(terr, 0, final_states.pass_count),
            rule=jnp.where(terr, AREA_RULE, final_states.rule),
            komi=jnp.where(terr, final_states.komi + offset,
                           final_states.komi),
        )
        for _ in range(max_steps):
            rng, sub = jax.random.split(rng)
            states = self._playout_step(states, sub)
            if bool(states.terminated.all()):
                break
        return jax.vmap(A.score_area_ownership)(states.stones, states.size)

    # ------------------------------------------------------------------

    def play_games(self, states: GoState, rng, max_moves: int | None = None):
        """Play all B games to completion (or the move cap); returns
        (final_states, list[MoveRecord])."""
        env, cfg = self.env, self.cfg
        if max_moves is None:
            max_moves = int(cfg.max_moves_factor * env.n * env.n)
        b = states.stones.shape[0]
        if self.mesh is not None:
            from sayuri_tpu.parallel import distributed as DI, mesh as M

            if jax.process_count() > 1:
                # each process contributes its local lanes; B is global
                states = DI.make_global_batch(self.mesh, states)
                b = states.stones.shape[0]
            elif b % self.mesh.devices.size == 0:
                states = M.shard_batch(self.mesh, states)
            # else: B not divisible by the mesh — run unsharded (the jit
            # falls back to single-device placement)
        already_lost = jnp.zeros((b,), bool)
        records = []
        tree = move = None
        import numpy as np

        qtotals = np.zeros((4,), np.int64)  # queries, hits, dups, fwd rows
        for t in range(max_moves):
            rng, sub = jax.random.split(rng)
            if tree is None or not self.reuse_tree:
                states, rec, already_lost, tree, move = self._move_step(
                    states, sub, already_lost
                )
            else:
                states, rec, already_lost, tree, move = (
                    self._move_step_reuse(
                        states, sub, already_lost, tree, move
                    )
                )
            records.append(rec)
            if tree.cache is not None:
                # COUNTED query accounting (network.h:44-45), not the
                # round-1 estimate: with tree reuse the cache counters are
                # cumulative; without, each move has a fresh cache
                cur = np.array(
                    [
                        int(jnp.sum(tree.cache.queries)),
                        int(jnp.sum(tree.cache.hits)),
                        int(jnp.sum(tree.cache.dups)),
                        int(tree.cache.forward_rows),
                    ],
                    np.int64,
                )
                if self.reuse_tree:
                    qtotals = cur
                else:
                    qtotals += cur
            if bool(states.terminated.all()):
                break
        self.last_query_stats = dict(
            queries=int(qtotals[0]),
            hits=int(qtotals[1]),
            dups=int(qtotals[2]),
            forward_rows=int(qtotals[3]),
        )
        return states, records


# ----------------------------------------------------------------------
# post-game target assembly (GatherTrainingBuffer, search.cc:1169-1309)
# ----------------------------------------------------------------------

def assemble_targets(env: GoEnv, final_states: GoState, records,
                     territory_helper=None):
    """Compute game-outcome training targets for a finished batch.

    Returns a dict of [T, B, ...] arrays aligned with `records`:
    result (stm ±1/0), final_score (stm), ownership (stm ±1/0 flat),
    avg/short/middle/long q & score, aux_policy.

    `territory_helper` ([B, n, n] {-1,0,+1} from
    SelfplayActor.territory_playout) marks dead stones for territory-rule
    lanes (search.cc:1139-1162); without it those lanes are scored as-is.
    """
    T = len(records)
    b = final_states.stones.shape[0]
    A = records[0].target_policy.shape[-1]
    hw = env.n * env.n

    stm = jnp.stack([r.states.to_move for r in records])          # [T, B]
    q = jnp.stack([r.q_value for r in records])                   # [T, B] stm
    score = jnp.stack([r.score_lead for r in records])            # [T, B] stm
    active = jnp.stack([r.active for r in records])               # [T, B]

    # winner from the final position (area scoring with pass-alive override;
    # territory lanes first drop helper-marked dead strings)
    if territory_helper is not None:
        black_final = jax.vmap(env.final_score_with_helper)(
            final_states, territory_helper
        )
    else:
        black_final = jax.vmap(env.final_score)(final_states)      # [B]
    winner = jnp.where(
        jnp.abs(black_final) < 1e-4, 0, jnp.where(black_final > 0, 1, -1)
    )  # 0 draw, 1 black, -1 white

    sign_stm = jnp.where(stm == 0, 1.0, -1.0)                      # [T, B]
    result = jnp.where(
        winner[None] == 0, 0.0, jnp.where(
            winner[None] == 1, sign_stm, -sign_stm
        )
    )
    final_score_stm = jnp.where(
        winner[None] == 0, 0.0, sign_stm * black_final[None]
    )

    if territory_helper is not None:
        own_black = jax.vmap(env.ownership_with_helper)(
            final_states, territory_helper
        ).reshape(b, hw)
    else:
        own_black = jax.vmap(env.ownership)(final_states).reshape(b, hw)
    ownership_stm = own_black[None] * sign_stm[..., None]          # [T,B,HW]

    # per-game buffer length: rows with active=False are past the game end
    end = jnp.sum(active.astype(jnp.int32), axis=0)                # [B]

    # windowed average Q/score (search.cc:1212-1236): signed sum over a
    # +-half window, flipping opponent entries; the window stays inside
    # each game's own buffer [0, end)
    half = max(3, env.n // 2)
    q_b = q * sign_stm          # to black perspective
    s_b = score * sign_stm
    idx = jnp.arange(T)
    offs = jnp.arange(-half, half + 1)
    win_idx = idx[:, None] + offs[None, :]                         # [T, W]
    valid = (
        (win_idx >= 0)[..., None] & (win_idx[..., None] < end[None, None, :])
    )                                                              # [T, W, B]
    win_idx_c = jnp.clip(win_idx, 0, T - 1)
    q_win = q_b[win_idx_c]                                         # [T, W, B]
    s_win = s_b[win_idx_c]
    avg_q_b = jnp.sum(jnp.where(valid, q_win, 0.0), axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1
    )
    avg_s_b = jnp.sum(jnp.where(valid, s_win, 0.0), axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1
    )
    avg_q = avg_q_b * sign_stm
    avg_s = avg_s_b * sign_stm

    # short/middle/long-term discounted values (search.cc:1238-1288). The
    # reference clamps the forward sum's index at the last buffer entry;
    # forward-filling past each game's end and running the backward
    # recursion acc_t = (1-lam)*avg_t + lam*acc_{t+1} with acc_end = avg_end
    # reproduces the clamped geometric tail exactly.
    clamp_t = jnp.minimum(idx[:, None], jnp.maximum(end - 1, 0)[None, :])
    q_fill = jnp.take_along_axis(avg_q_b, clamp_t, axis=0)
    s_fill = jnp.take_along_axis(avg_s_b, clamp_t, axis=0)

    nn_count = (final_states.size * final_states.size).astype(jnp.float32)
    out = {}
    for name, coef in (("short", 0.18), ("middle", 0.06), ("long", 0.02)):
        lam = 1.0 / (1.0 + nn_count * coef)                        # [B]

        def scan_back(carry, xs, lam=lam):
            acc_q, acc_s = carry
            aq, as_ = xs
            acc_q = (1.0 - lam) * aq + lam * acc_q
            acc_s = (1.0 - lam) * as_ + lam * acc_s
            return (acc_q, acc_s), (acc_q, acc_s)

        init = (q_fill[-1], s_fill[-1])
        (_, _), (dq, ds) = jax.lax.scan(
            scan_back, init, (q_fill[::-1], s_fill[::-1])
        )
        out[f"{name}_q"] = dq[::-1] * sign_stm
        out[f"{name}_score"] = ds[::-1] * sign_stm

    # aux policy: next move's target; the game's LAST row gets the pass
    # one-hot (search.cc:1290-1300)
    pass_onehot = jnp.zeros((b, A)).at[:, A - 1].set(1.0)
    aux = jnp.stack(
        [r.target_policy for r in records[1:]] + [pass_onehot]
    )
    is_last = idx[:, None] == (end - 1)[None, :]                   # [T, B]
    aux = jnp.where(is_last[..., None], pass_onehot[None], aux)

    return dict(
        result=result,
        final_score=final_score_stm,
        ownership=ownership_stm,
        avg_q=avg_q,
        avg_score=avg_s,
        aux_policy=aux,
        winner=winner,
        end=end,
        **out,
    )
