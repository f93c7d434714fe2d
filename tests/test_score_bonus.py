"""first_pass_bonus endgame score bonus (node.cc:813-869)."""

import jax
import jax.numpy as jnp
import numpy as np

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.game.types import AREA_RULE, TERRITORY_RULE
from sayuri_tpu.mcts.core import MCTS, SearchConfig
from sayuri_tpu.models.evaluator import make_dummy_eval_fn


def make_mcts(n=5, first_pass_bonus=True):
    env = GoEnv(n=n)
    cfg = SearchConfig(
        max_nodes=24, max_depth=16, first_pass_bonus=first_pass_bonus,
        dirichlet_noise=False, gumbel=False,
    )
    return env, MCTS(env, make_dummy_eval_fn(env), cfg)


class TestScoreBonus:
    def test_pass_gets_area_bonus(self):
        env, mcts = make_mcts()
        states = env.new_batch(2, komi=5.5)
        own = jnp.zeros((2, 25))
        sb = mcts._score_bonus(states, jnp.asarray([25, 12], jnp.int32), own)
        sb = np.asarray(sb)
        # lane 0 passes (black mover): +0.5 black bonus under area rule
        assert sb[0] == 0.5
        # lane 1 plays a neutral point: no bonus
        assert sb[1] == 0.0

    def test_white_pass_negates(self):
        env, mcts = make_mcts()
        states = env.new_batch(1, komi=5.5)
        states = states.replace(to_move=jnp.asarray([1], jnp.int32))
        sb = mcts._score_bonus(states, jnp.asarray([25], jnp.int32),
                               jnp.zeros((1, 25)))
        assert np.asarray(sb)[0] == -0.5

    def test_strong_ownership_point_next_to_opp(self):
        env, mcts = make_mcts()
        states = env.new_batch(1, komi=5.5)
        # white stone at vertex 13 = (2,3); black plays 12 = (2,2), a
        # black-owned point (own > 0.8) adjacent to white
        stones = jnp.zeros((1, 5, 5), jnp.int8).at[0, 2, 3].set(2)
        states = states.replace(stones=stones)
        own = jnp.zeros((1, 25)).at[0, 12].set(0.95)
        sb = mcts._score_bonus(states, jnp.asarray([12], jnp.int32), own)
        assert np.asarray(sb)[0] == 0.5
        # same point but weak ownership: no bonus
        own2 = jnp.zeros((1, 25)).at[0, 12].set(0.5)
        sb2 = mcts._score_bonus(states, jnp.asarray([12], jnp.int32), own2)
        assert np.asarray(sb2)[0] == 0.0

    def test_territory_rule_discourages_pass(self):
        env, mcts = make_mcts()
        states = env.new_batch(1, komi=5.5, rule=TERRITORY_RULE)
        sb = mcts._score_bonus(states, jnp.asarray([25], jnp.int32),
                               jnp.zeros((1, 25)))
        np.testing.assert_allclose(np.asarray(sb)[0], -(2 / 3) * 0.5)

    def test_territory_rule_own_territory_penalty(self):
        env, mcts = make_mcts()
        states = env.new_batch(1, komi=5.5, rule=TERRITORY_RULE)
        own = jnp.zeros((1, 25)).at[0, 12].set(0.9)
        sb = mcts._score_bonus(states, jnp.asarray([12], jnp.int32), own)
        np.testing.assert_allclose(
            np.asarray(sb)[0], -((0.9 - 0.8) / 0.2) * 0.5, rtol=1e-5
        )

    def test_search_runs_with_bonus(self):
        env, mcts = make_mcts()
        states = env.new_batch(2, komi=5.5)
        tree = mcts.init_tree(states, jax.random.PRNGKey(0))
        tree = jax.jit(lambda t: mcts.run(t, 8))(tree)
        assert int(np.asarray(tree.visits[:, 0]).min()) >= 8
        # expanded non-root nodes carry a bonus field (mostly zeros early
        # game, but finite)
        assert np.isfinite(np.asarray(tree.black_sb)).all()
