"""Game randomization tests: query parsing, komi quantization, batch
preparation with mixed sizes/handicaps/openings."""

import jax
import jax.numpy as jnp
import numpy as np

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.game.types import AREA_RULE, TERRITORY_RULE
from sayuri_tpu.selfplay import randomize as R
from tests.test_mcts import make_dummy_eval


class TestQueries:
    def test_parse_bkp_bhp_srs(self):
        dist = R.parse_queries(
            ["bkp:9:7.5:0.8", "bkp:7:6.5:0.2", "bhp:9:4:0.3",
             "srs:area:territory"]
        )
        assert dist.board_queries == ((9, 7.5, 0.8), (7, 6.5, 0.2))
        assert dist.handicap_queries == ((9, 4, 0.3),)
        assert set(dist.scoring_set) == {AREA_RULE, TERRITORY_RULE}
        assert dist.max_boardsize == 9

    def test_prob_normalization(self):
        dist = R.parse_queries(["bkp:9:7:2.0", "bkp:5:7:2.0"])
        assert abs(sum(p for _, _, p in dist.board_queries) - 1.0) < 1e-6

    def test_territory_implies_area(self):
        dist = R.parse_queries(["srs:territory"], default_size=5)
        assert AREA_RULE in dist.scoring_set

    def test_adjust_komi(self):
        vals = np.asarray(
            R.adjust_komi(jnp.asarray([7.5, 7.1, 7.4, 7.8, -6.6, 0.1, 0.0]))
        )
        np.testing.assert_allclose(
            vals, [7.5, 7.0, 7.5, 8.0, -6.5, 0.0, 0.0]
        )


class TestRandomizer:
    def test_prepare_mixed_batch(self):
        env = GoEnv(n=9)
        dist = R.parse_queries(
            ["bkp:9:7.5:0.5", "bkp:7:6.5:0.5", "bhp:9:3:0.5",
             "srs:area:territory"],
            random_opening_prob=0.5,
            random_moves_factor=0.1,
            komi_stddev=1.0,
        )
        rz = R.GameRandomizer(env, dist, make_dummy_eval(env))
        states = rz.prepare(8, jax.random.PRNGKey(0))
        sizes = np.asarray(states.size)
        assert set(sizes).issubset({7, 9})
        komis = np.asarray(states.komi)
        # komi quantized to half points
        np.testing.assert_allclose((komis * 2) % 1, 0.0, atol=1e-5)
        # handicap lanes have black stones and black to move
        h = np.asarray(states.handicap)
        stones = np.asarray(states.stones)
        for i in range(8):
            if h[i] >= 2:
                assert (stones[i] == 1).sum() >= h[i] - 1
        # all states are playable
        legal = np.asarray(jax.vmap(env.legal_action_mask)(states))
        assert legal[:, :-1].any(axis=-1).all()

    def test_opening_moves_played(self):
        env = GoEnv(n=5)
        dist = R.GameDistribution(
            board_queries=((5, 5.5, 1.0),),
            random_opening_prob=1.0,
            random_moves_factor=0.3,
        )
        rz = R.GameRandomizer(env, dist, make_dummy_eval(env))
        states = rz.prepare(4, jax.random.PRNGKey(1))
        mc = np.asarray(states.move_count)
        assert (mc > 0).any()
