"""Territory-rule scoring with dead-stone labeling.

Covers the reference's territory pipeline (search.cc:1139-1162 +
board.cc:1581-1600): a helper ownership map marks dead strings, whole
strings get removed (RemoveMarkedStrings semantics), and the cleaned board
is scored under the area rule with the score-preserving komi offset.
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from sayuri_tpu.game import analysis as A
from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.game.types import AREA_RULE, TERRITORY_RULE


def board_from_rows(rows):
    """'.' empty, 'X' black, 'O' white."""
    n = len(rows)
    out = np.zeros((n, n), np.int8)
    for y, row in enumerate(rows):
        for x, c in enumerate(row):
            out[y, x] = {".": 0, "X": 1, "O": 2}[c]
    return out


class TestRemoveDeadStones:
    def test_whole_string_removed_on_partial_mark(self):
        # two-stone white string; helper marks only one stone dead ->
        # RemoveMarkedStrings drops the whole string (board.cc:1346-1370)
        stones = board_from_rows(
            [
                "XXXXX",
                "XOO.X",
                "X.X.X",
                "XXXXX",
                "XXXXX",
            ]
        )
        helper = np.ones((5, 5), np.int32)  # everything black's
        helper[1, 2] = 0  # second white stone NOT explicitly marked
        cleaned = np.asarray(
            A.remove_dead_stones(
                jnp.asarray(stones), jnp.asarray(5), jnp.asarray(helper)
            )
        )
        assert (cleaned[1, 1], cleaned[1, 2]) == (0, 0)
        # black stones untouched
        assert (cleaned == 1).sum() == (stones == 1).sum()

    def test_live_strings_kept(self):
        stones = board_from_rows(
            [
                "X.X.O",
                "XXX.O",
                ".X.OO",
                "XXOO.",
                ".XO.O",
            ]
        )
        helper = np.asarray(
            A.score_area_ownership(jnp.asarray(stones), jnp.asarray(5))
        )
        cleaned = np.asarray(
            A.remove_dead_stones(
                jnp.asarray(stones), jnp.asarray(5), jnp.asarray(helper)
            )
        )
        # helper agrees with stone colors -> nothing removed
        np.testing.assert_array_equal(cleaned, stones)


class TestFinalScoreWithHelper:
    def test_territory_score_removes_dead_group(self):
        env = GoEnv(n=5)
        # dead white pair inside black's area; black sealed everything
        stones = board_from_rows(
            [
                "XXXXX",
                "XOO.X",
                "X.X.X",
                "XXXXX",
                "XXXXX",
            ]
        )
        st = env.new_state(komi=0.5, rule=TERRITORY_RULE).replace(
            stones=jnp.asarray(stones)
        )
        helper = jnp.ones((5, 5), jnp.int32)  # playout says all black
        score = float(env.final_score_with_helper(st, helper))
        # cleaned board is all-black area = 25; komi 0.5, no played stones
        assert score == 25.0 - 0.5

        # without the helper the dead pair survives and shrinks the score
        naive = float(env.final_score(st))
        assert naive < score

    def test_area_rule_ignores_helper(self):
        env = GoEnv(n=5)
        stones = board_from_rows(
            [
                "XXXXX",
                "XOO.X",
                "X.X.X",
                "XXXXX",
                "XXXXX",
            ]
        )
        st = env.new_state(komi=0.5, rule=AREA_RULE).replace(
            stones=jnp.asarray(stones)
        )
        helper = jnp.ones((5, 5), jnp.int32)
        assert float(env.final_score_with_helper(st, helper)) == float(
            env.final_score(st)
        )

    def test_penalty_offset_preserves_score_at_switch(self):
        env = GoEnv(n=5)
        st = env.new_state(komi=6.5, rule=TERRITORY_RULE).replace(
            played_stones=jnp.asarray([10, 8], jnp.int32)
        )
        # GetPenaltyOffset(kArea, kTerritory) = P_terr - P_area
        # (game_state.cc:711-724)
        off = float(env.penalty_offset_to_area(st))
        assert off == (10 - 8) - 0
        switched = st.replace(
            rule=jnp.asarray(AREA_RULE, jnp.int32),
            komi=st.komi + off,
        )
        assert float(env.komi_with_penalty(switched)) == float(
            env.komi_with_penalty(st)
        )


class TestTerritoryPlayout:
    def _actor(self, env):
        from sayuri_tpu.mcts.core import MCTS, SearchConfig
        from sayuri_tpu.selfplay.actor import SelfplayActor, SelfplayConfig
        from tests.test_mcts import make_dummy_eval

        mcts = MCTS(
            env,
            make_dummy_eval(env),
            SearchConfig(max_nodes=24, max_depth=8),
        )
        return SelfplayActor(
            env, mcts, SelfplayConfig(playouts=8, fastsearch_playouts=0),
            reuse_tree=False,
        )

    @pytest.mark.slow
    def test_playout_resumes_and_labels(self):
        env = GoEnv(n=5)
        actor = self._actor(env)
        b = 2
        states = env.new_batch(b, komi=0.5, rule=TERRITORY_RULE)
        # end both games immediately by two passes
        step = jax.jit(jax.vmap(env.step))
        pa = jnp.full((b,), env.pass_action, jnp.int32)
        states = step(step(states, pa), pa)
        assert bool(states.terminated.all())
        helper = actor.territory_playout(
            states, jax.random.PRNGKey(0), max_steps=12
        )
        assert helper.shape == (b, 5, 5)
        assert set(np.unique(np.asarray(helper))) <= {-1, 0, 1}

    def test_area_lanes_skip_playout(self):
        env = GoEnv(n=5)
        actor = self._actor(env)
        states = env.new_batch(2, komi=7.5, rule=AREA_RULE)
        helper = actor.territory_playout(states, jax.random.PRNGKey(0))
        # pure area batch: helper is just the current score-area ownership
        expect = np.asarray(
            jax.vmap(A.score_area_ownership)(states.stones, states.size)
        )
        np.testing.assert_array_equal(np.asarray(helper), expect)
