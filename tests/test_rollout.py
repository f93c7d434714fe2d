"""MC rollout fallback (rollout.h + PlayRandomMove, game_state.cc:523)."""

import jax
import jax.numpy as jnp
import numpy as np

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.mcts import rollout as R

from tests.test_seki import board_from_diagram


def masks_for(diagram, n, to_move):
    stones = board_from_diagram(diagram, n)
    env = GoEnv(n=n)
    st = env.new_state(komi=5.5)
    st = st.replace(stones=stones, to_move=jnp.int32(to_move))
    legal = env.legal_action_mask(st)[: n * n].reshape(n, n)
    return jax.tree.map(
        np.asarray,
        R.tactical_masks(stones, jnp.int32(n), legal, jnp.int32(to_move)),
    )


class TestTacticalMasks:
    def test_capture_and_escape(self):
        # white stone (0,1) in atari: black B captures at (1,1);
        # white to move escapes at (1,1) too
        d = """
            xox..
            .....
            .....
            .....
            .....
        """
        mb = masks_for(d, 5, 0)  # black to move
        assert mb["capture"][1 * 5 + 1]  # (1,1) captures o
        mw = masks_for(d, 5, 1)  # white to move
        assert mw["escape"][1 * 5 + 1]

    def test_atari(self):
        # white chain (0,1),(0,2) has 3 libs ((0,3),(1,1),(1,2)); black
        # playing (1,1) leaves 2 -> not atari; craft a 2-lib chain instead
        d = """
            xoox.
            .....
            .....
            .....
            .....
        """
        # white (0,1),(0,2): libs {(1,1),(1,2)} -> exactly 2
        mb = masks_for(d, 5, 0)
        assert mb["atari"][1 * 5 + 1] and mb["atari"][1 * 5 + 2]

    def test_self_atari(self):
        # black playing (0,3) next to own (0,4)? craft: lone point with one
        # liberty left
        d = """
            .x...
            xox..
            .x...
            .....
            .....
        """
        # white (1,1) captured already? no - it has 0 libs... make it 1 lib:
        d = """
            .x...
            xo.x.
            .x...
            .....
            .....
        """
        # white to move at (1,2): connects to o(1,1) giving chain with
        # libs... (1,1)+(1,2) libs = {} around: (0,2),(2,2),(1,3)? (1,3)=x.
        # libs {(0,2),(2,2)} = 2 -> not self-atari.
        mw = masks_for(d, 5, 1)
        assert not mw["self_atari"][1 * 5 + 2]
        # black filling own eye-ish point (0,0): neighbors (0,1)=x,(1,0)=x:
        # merged chain liberties: (0,2)? via (0,1): libs of that chain...
        # crafted simpler: lone black stone at (4,4) corner: playing (4,3)?
        d2 = """
            .....
            .....
            .....
            ....o
            ...ox
        """
        # black at (4,4) has 0 libs? (3,4)=o,(4,3)=o -> captured state is
        # unreachable; instead test the textbook case: playing into a
        # corner point with one liberty
        d3 = """
            .....
            .....
            .....
            o....
            .o...
        """
        # black plays (4,0): neighbors (3,0)=o,(4,1)=o -> suicide (0 libs),
        # illegal, so not self-atari; black plays (3,1)? neighbors: (3,0)o,
        # (4,1)o,(2,1).,(3,2). -> 2 libs, not self-atari
        mb = masks_for(d3, 5, 0)
        assert not mb["self_atari"][3 * 5 + 1]
        # white plays (4,0): connects both chains; libs {(2,0),(3,1)... }
        # >1, not self-atari
        mw = masks_for(d3, 5, 1)
        assert not mw["self_atari"][4 * 5 + 0]

    def test_self_atari_positive(self):
        # black stone at (0,0) with single liberty (1,0); black playing
        # (1,0)... gives libs {(2,0),(1,1)} -> not self-atari. True
        # self-atari: point whose merged group ends with exactly 1 lib:
        d = """
            xo.o.
            oo.o.
            .....
            .....
            .....
        """
        # black plays (0,2): neighbors (0,1)=o(alive), (0,3)=o, (1,2)='.'
        # -> lone stone 1 lib -> self-atari
        mb = masks_for(d, 5, 0)
        assert mb["self_atari"][0 * 5 + 2]

    def test_simple_eye(self):
        d = """
            .x...
            xx...
            .....
            .....
            .....
        """
        mb = masks_for(d, 5, 0)
        assert mb["simple_eye"][0]          # (0,0) surrounded by black
        mw = masks_for(d, 5, 1)
        assert not mw["simple_eye"][0]


class TestMcOwnership:
    def test_playout_terminates_and_scores(self):
        env = GoEnv(n=5)
        states = env.new_batch(4, komi=5.5)
        own, score = jax.jit(
            lambda s, r: R.mc_ownership(env, s, r, max_moves=60)
        )(states, jax.random.PRNGKey(1))
        own = np.asarray(own)
        assert own.shape == (4, 25)
        assert set(np.unique(own)).issubset({-1.0, 0.0, 1.0})
        # a full random playout should claim most of the board
        assert (np.abs(own).sum(axis=-1) > 5).all()

    def test_wrapped_evaluator(self):
        from sayuri_tpu.models.evaluator import make_dummy_eval_fn

        env = GoEnv(n=5)
        base = make_dummy_eval_fn(env)
        fn = R.wrap_eval_with_rollout(env, base, max_moves=40)
        states = env.new_batch(2, komi=5.5)
        evals = jax.jit(fn)(states)
        own = np.asarray(evals.black_ownership)
        assert set(np.unique(own)).issubset({-1.0, 0.0, 1.0})
        # priors still come from the base evaluator
        assert np.asarray(evals.priors).sum() > 0
