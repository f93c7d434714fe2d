"""Batched Go game state and environment.

The reference's GameState (/root/reference/src/game/game_state.cc) carries a
board, full board history, ko-hash history for superko, komi/rule metadata and
scoring helpers. Here the same information lives in a flat pytree of arrays so
thousands of games step in lockstep under ``jit``:

- ``GoState`` holds everything per game, with NO leading batch dim; batching
  is pure ``vmap`` (the TPU-native replacement for `parallel_games` worker
  threads, /root/reference/src/selfplay/engine.cc:39-52).
- An 8-deep board-history ring feeds the encoder's history planes
  (/root/reference/src/neural/encoder.h:25-38).
- Superko is positional, via a fixed-length ring of board hashes
  (game_state.h:203); `superko_violation` answers "would this move repeat".
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from flax import struct

from sayuri_tpu.game import board as B
from sayuri_tpu.game.types import (
    AREA_RULE,
    BLACK,
    EMPTY,
    NO_VERTEX,
)

HISTORY_LEN = 8  # encoder history depth (encoder.h:25-38)


@struct.dataclass
class GoState:
    """Single-game state (vmap for batches). All arrays fixed-shape."""

    stones: jnp.ndarray        # [n, n] int8: 0 empty, 1 black, 2 white
    to_move: jnp.ndarray       # () int32: 0 black / 1 white
    ko: jnp.ndarray            # () int32 flat vertex or -1
    pass_count: jnp.ndarray    # () int32 consecutive passes
    move_count: jnp.ndarray    # () int32
    last_moves: jnp.ndarray    # [HISTORY_LEN] int32 vertex of move t-1..t-H (-1 pass/none)
    history: jnp.ndarray       # [HISTORY_LEN, n, n] int8 boards AFTER moves t-1..t-H
    hash: jnp.ndarray          # [2] uint32 board-only hash
    hash_history: jnp.ndarray  # [max_len, 2] uint32 hashes of past positions
    size: jnp.ndarray          # () int32 board size <= n
    komi: jnp.ndarray          # () float32
    rule: jnp.ndarray          # () int32 AREA_RULE / TERRITORY_RULE
    handicap: jnp.ndarray      # () int32 (area-rule komi penalty, game_state.cc:699-707)
    prisoners: jnp.ndarray     # [2] int32 captures by (black, white)
    played_stones: jnp.ndarray # [2] int32 non-pass moves by (black, white)
    terminated: jnp.ndarray    # () bool

    @property
    def n(self) -> int:
        return self.stones.shape[-1]

    @property
    def num_actions(self) -> int:
        return self.n * self.n + 1  # board points + pass


class GoEnv:
    """Vectorized Go environment over a fixed n x n buffer.

    ``n`` (compile-time buffer size) bounds the per-game board ``size``
    (a runtime scalar), exactly like the reference reusing a 19x19 network
    buffer for smaller boards with a mask
    (/root/reference/src/neural/batch_forward_pipe.cc:12-33).
    """

    def __init__(self, n: int = 19, max_len: int | None = None):
        self.n = n
        self.max_len = max_len if max_len is not None else 2 * n * n + 32
        self.pass_action = n * n
        self.num_actions = n * n + 1

    # -- construction ------------------------------------------------------

    def new_state(
        self,
        size: int | jnp.ndarray | None = None,
        komi: float | jnp.ndarray = 7.5,
        rule: int | jnp.ndarray = AREA_RULE,
        handicap: int | jnp.ndarray = 0,
    ) -> GoState:
        n = self.n
        if size is None:
            size = n
        return GoState(
            stones=jnp.zeros((n, n), jnp.int8),
            to_move=jnp.asarray(BLACK, jnp.int32),
            ko=jnp.asarray(NO_VERTEX, jnp.int32),
            pass_count=jnp.zeros((), jnp.int32),
            move_count=jnp.zeros((), jnp.int32),
            last_moves=jnp.full((HISTORY_LEN,), NO_VERTEX, jnp.int32),
            history=jnp.zeros((HISTORY_LEN, n, n), jnp.int8),
            hash=B.position_hash(jnp.zeros((n, n), jnp.int8), n),
            hash_history=jnp.zeros((self.max_len, 2), jnp.uint32),
            size=jnp.asarray(size, jnp.int32),
            komi=jnp.asarray(komi, jnp.float32),
            rule=jnp.asarray(rule, jnp.int32),
            handicap=jnp.asarray(handicap, jnp.int32),
            prisoners=jnp.zeros((2,), jnp.int32),
            played_stones=jnp.zeros((2,), jnp.int32),
            terminated=jnp.asarray(False),
        )

    def new_batch(self, batch: int, size=None, komi=7.5, rule=AREA_RULE) -> GoState:
        s = self.new_state(size=size, komi=komi, rule=rule)
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), s)

    # -- core transitions --------------------------------------------------

    def step(self, state: GoState, action) -> GoState:
        """Apply one action (flat vertex or pass). Single game; vmap me.

        Assumes the action is legal (like Board::PlayMoveAssumeLegal,
        board.cc:1484); use `legal_action_mask` / `superko_violation` to
        filter. Stepping a terminated game is a no-op."""
        n = self.n
        action = jnp.asarray(action, jnp.int32)
        is_pass = action >= self.pass_action
        color = state.to_move

        stones_p, n_cap, ko_p = B.play_move(
            state.stones, state.size, color, jnp.minimum(action, n * n - 1)
        )
        new_stones = jnp.where(is_pass, state.stones, stones_p)
        new_ko = jnp.where(is_pass, NO_VERTEX, ko_p)
        new_hash = B.position_hash(new_stones, n)

        move_v = jnp.where(is_pass, NO_VERTEX, action)
        new_last = jnp.concatenate([move_v[None], state.last_moves[:-1]])
        new_history = jnp.concatenate(
            [new_stones[None], state.history[:-1]], axis=0
        )
        new_prisoners = state.prisoners.at[color].add(
            jnp.where(is_pass, 0, n_cap)
        )
        new_played = state.played_stones.at[color].add(
            jnp.where(is_pass, 0, 1)
        )
        # record the position being LEFT into the superko ring
        hh = state.hash_history.at[state.move_count % self.max_len].set(state.hash)

        new_pass = jnp.where(is_pass, state.pass_count + 1, 0)
        terminated = state.terminated | (new_pass >= 2)

        stepped = state.replace(
            stones=new_stones,
            to_move=1 - color,
            ko=new_ko,
            pass_count=new_pass,
            move_count=state.move_count + 1,
            last_moves=new_last,
            history=new_history,
            hash=new_hash,
            hash_history=hh,
            prisoners=new_prisoners,
            played_stones=new_played,
            terminated=terminated,
        )
        # freeze terminated games
        return jax.tree.map(
            lambda new, old: jnp.where(
                _bshape(state.terminated, new), old, new
            ),
            stepped,
            state,
        )

    def step_batch_with_analysis(self, states: GoState, actions):
        """Batched step + child-position analysis.

        On TPU this is ONE Pallas launch doing the whole board transition
        plus everything the leaf evaluation needs (legality, liberty map,
        safe area, score ownership — ops/analysis.py); elsewhere it falls
        back to vmap(step) and returns analysis=None. Returns
        (new_states, analysis_dict_or_None)."""
        from sayuri_tpu.game import board as B

        if not B._use_pallas():
            return jax.vmap(self.step)(states, actions), None

        from sayuri_tpu.ops.analysis import step_and_analyze_tpu

        actions = jnp.asarray(actions, jnp.int32)
        out = step_and_analyze_tpu(
            states.stones, states.size, states.ko, states.to_move, actions
        )
        return self._merge_kernel_step(states, actions, out), out

    def step_batch_light(self, states: GoState, actions):
        """Batched step + child legality only (the raw env-stepping hot
        path: rollouts, env benchmarks, opening randomization). On TPU a
        LIGHT Pallas launch (3 fixpoints vs ~30 — ops/analysis.py
        `_step_legal_kernel`); elsewhere vmap(step) + legal mask. Returns
        (new_states, legal [B, n*n] bool)."""
        from sayuri_tpu.game import board as B

        if not B._use_pallas():
            new_states = jax.vmap(self.step)(states, actions)
            legal = jax.vmap(self.legal_action_mask)(new_states)
            return new_states, legal[:, : self.n * self.n]

        from sayuri_tpu.ops.analysis import step_and_legal_tpu

        actions = jnp.asarray(actions, jnp.int32)
        out = step_and_legal_tpu(
            states.stones, states.size, states.ko, states.to_move, actions
        )
        return self._merge_kernel_step(states, actions, out), out["legal"]

    def _merge_kernel_step(self, states: GoState, actions, out) -> GoState:
        """Fold a step-kernel output dict into the full GoState update
        (history ring, superko ring, prisoner/pass bookkeeping, freeze of
        terminated games)."""
        n = self.n
        is_pass = actions >= self.pass_action
        color = states.to_move
        new_stones = out["new_stones"].astype(jnp.int8)
        new_ko = out["new_ko"]
        new_hash = out["new_hash"]  # computed in-kernel (same zobrist keys)

        move_v = jnp.where(is_pass, NO_VERTEX, actions)
        new_last = jnp.concatenate(
            [move_v[:, None], states.last_moves[:, :-1]], axis=1
        )
        new_history = jnp.concatenate(
            [new_stones[:, None], states.history[:, :-1]], axis=1
        )
        b_idx = jnp.arange(color.shape[0])
        new_prisoners = states.prisoners.at[b_idx, color].add(
            jnp.where(is_pass, 0, out["n_captured"])
        )
        new_played = states.played_stones.at[b_idx, color].add(
            jnp.where(is_pass, 0, 1)
        )
        hh = states.hash_history.at[
            b_idx, states.move_count % self.max_len
        ].set(states.hash)
        new_pass = jnp.where(is_pass, states.pass_count + 1, 0)
        terminated = states.terminated | (new_pass >= 2)

        stepped = states.replace(
            stones=new_stones,
            to_move=1 - color,
            ko=new_ko,
            pass_count=new_pass,
            move_count=states.move_count + 1,
            last_moves=new_last,
            history=new_history,
            hash=new_hash,
            hash_history=hh,
            prisoners=new_prisoners,
            played_stones=new_played,
            terminated=terminated,
        )
        frozen = states.terminated
        new_states = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(
                    frozen, frozen.shape + (1,) * (new.ndim - frozen.ndim)
                ),
                old,
                new,
            ),
            stepped,
            states,
        )
        return new_states

    # -- queries -----------------------------------------------------------

    def legal_action_mask(self, state: GoState) -> jnp.ndarray:
        """[n*n + 1] bool; pass always legal. No superko filtering (the
        search purges superko at the root, node.cc:1824-1841)."""
        board_legal = B.legal_moves(state.stones, state.size, state.to_move, state.ko)
        board_legal = board_legal & ~state.terminated
        return jnp.concatenate([board_legal, jnp.ones((1,), bool)])

    def superko_violation(self, state: GoState, action) -> jnp.ndarray:
        """() bool: would `action` recreate a previous position?

        Positional superko over the hash ring (game_state.h:203). Pass never
        violates."""
        n = self.n
        action = jnp.asarray(action, jnp.int32)
        is_pass = action >= self.pass_action
        stones_p, _, _ = B.play_move(
            state.stones, state.size, state.to_move, jnp.minimum(action, n * n - 1)
        )
        h = B.position_hash(stones_p, n)
        valid = (
            jnp.arange(self.max_len) < jnp.minimum(state.move_count, self.max_len)
        )
        hit = jnp.any(valid & jnp.all(state.hash_history == h[None, :], axis=-1))
        # playing on the board always changes the position vs. current;
        # still compare against current hash for completeness
        hit = hit | jnp.all(state.hash == h)
        return jnp.where(is_pass, False, hit)

    def komi_penalty(self, state: GoState) -> jnp.ndarray:
        """GameState::GetPenalty (game_state.cc:695-708): territory rule adds
        (black played stones - white played stones); area rule adds handicap."""
        territory_pen = (
            state.played_stones[0] - state.played_stones[1]
        ).astype(jnp.float32)
        area_pen = state.handicap.astype(jnp.float32)
        return jnp.where(state.rule == AREA_RULE, area_pen, territory_pen)

    def komi_with_penalty(self, state: GoState) -> jnp.ndarray:
        """GameState::GetKomiWithPenalty (game_state.cc:726-728)."""
        return state.komi + self.komi_penalty(state)

    def wave(self, state: GoState) -> jnp.ndarray:
        """Drawable-komi triangle-wave dither (game_state.cc:868-899):
        0 under territory rule; else distance of to-move komi from the
        nearest drawable komi, folded into a [-0.5, 0.5] triangle wave."""
        k = self.komi_with_penalty(state)
        k = jnp.where(state.to_move == 1, -k, k)
        even_area = (state.size * state.size) % 2 == 0
        floor_even = jnp.floor(k / 2.0) * 2.0
        floor_odd = jnp.floor((k - 1.0) / 2.0) * 2.0 + 1.0
        delta = jnp.clip(k - jnp.where(even_area, floor_even, floor_odd), 0.0, 2.0)
        wave = jnp.where(
            delta < 0.5, delta, jnp.where(delta < 1.5, 1.0 - delta, delta - 2.0)
        )
        return jnp.where(state.rule == AREA_RULE, wave, 0.0)

    def superko_action_mask(self, state: GoState) -> jnp.ndarray:
        """[n*n + 1] bool: True where the action would violate positional
        superko (KillRootSuperkos semantics, node.cc:1824-1841). Pass is
        never a violation. Only capturing moves can recreate a position, but
        the check is run for all actions branchlessly."""
        actions = jnp.arange(self.num_actions, dtype=jnp.int32)
        return jax.vmap(lambda a: self.superko_violation(state, a))(actions)

    def final_score(self, state: GoState) -> jnp.ndarray:
        """Black-minus-white score under the game's rule, from BLACK's view.

        GameState::GetFinalScore (game_state.cc:646-656): board score under
        the scoring rule minus komi-with-penalty. Under the territory rule the
        reference first removes dead stones marked by the territory helper
        (board.cc:1584-1600); callers doing dead-stone removal should pass a
        cleaned state."""
        from sayuri_tpu.game import analysis

        board_score = jnp.sum(
            analysis.score_area_ownership(state.stones, state.size),
            dtype=jnp.float32,
        )
        return board_score - self.komi_with_penalty(state)

    def ownership(self, state: GoState) -> jnp.ndarray:
        return B.area_ownership(state.stones, state.size)

    def penalty_offset_to_area(self, state: GoState) -> jnp.ndarray:
        """GetPenaltyOffset(kArea, old_rule) (game_state.cc:711-724):
        komi adjustment that preserves the score when switching a game to
        area scoring. Zero when the game is already area-ruled."""
        territory_pen = (
            state.played_stones[0] - state.played_stones[1]
        ).astype(jnp.float32)
        area_pen = state.handicap.astype(jnp.float32)
        return jnp.where(
            state.rule == AREA_RULE, 0.0, territory_pen - area_pen
        )

    def final_score_with_helper(self, state: GoState, helper_own) -> jnp.ndarray:
        """Black-minus-white final score honoring a territory helper.

        GameState::GetFinalScore (game_state.cc:646-656): under the
        territory rule, strings contradicted by `helper_own` ([n, n]
        {-1, 0, +1} from the area-rule playout, search.cc:1139-1162) are
        removed before area scoring (board.cc:1581-1600). Area-rule games
        ignore the helper."""
        from sayuri_tpu.game import analysis

        cleaned = jnp.where(
            state.rule == AREA_RULE,
            state.stones,
            analysis.remove_dead_stones(state.stones, state.size, helper_own),
        ).astype(state.stones.dtype)
        board_score = jnp.sum(
            analysis.score_area_ownership(cleaned, state.size),
            dtype=jnp.float32,
        )
        return board_score - self.komi_with_penalty(state)

    def ownership_with_helper(self, state: GoState, helper_own) -> jnp.ndarray:
        """[n, n] score-area ownership honoring the territory helper
        (GameState::GetOwnership, game_state.cc:507-513)."""
        from sayuri_tpu.game import analysis

        cleaned = jnp.where(
            state.rule == AREA_RULE,
            state.stones,
            analysis.remove_dead_stones(state.stones, state.size, helper_own),
        ).astype(state.stones.dtype)
        return analysis.score_area_ownership(cleaned, state.size)


def _bshape(flag, like):
    """Broadcast a scalar bool against `like`'s shape."""
    return jnp.reshape(flag, flag.shape + (1,) * (like.ndim - flag.ndim))
