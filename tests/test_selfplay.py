"""End-to-end self-play test with a dummy network.

Mirrors the reference's de-facto integration harness: run the full pipeline
(selfplay -> chunk files) with a random-output network (network.cc:144-165),
then validate the emitted 53-line format — including parsing it with the
reference trainer's own parser when the reference tree is available.
"""

import gzip
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.mcts.core import MCTS, SearchConfig
from sayuri_tpu.selfplay.actor import (
    SelfplayActor,
    SelfplayConfig,
    assemble_targets,
)
from sayuri_tpu.selfplay import data as D
from tests.test_mcts import make_dummy_eval


def small_setup(b=2, n=5, gumbel=True):
    env = GoEnv(n=n)
    scfg = SearchConfig(
        max_nodes=40,
        max_depth=12,
        gumbel=gumbel,
        gumbel_considered_moves=4,
        dirichlet_noise=not gumbel,
    )
    mcts = MCTS(env, make_dummy_eval(env), scfg)
    sp = SelfplayConfig(
        playouts=24,
        fastsearch_playouts=8,
        fastsearch_playouts_prob=0.6,
    )
    return env, SelfplayActor(env, mcts, sp)


class TestSelfplay:
    @pytest.mark.slow
    def test_games_run_to_completion(self):
        env, actor = small_setup()
        states = env.new_batch(2, komi=4.5)
        final, records = actor.play_games(
            states, jax.random.PRNGKey(0), max_moves=50
        )
        assert len(records) > 4
        # every move in the records was legal at its position
        for rec in records:
            legal = np.asarray(
                jax.jit(jax.vmap(env.legal_action_mask))(rec.states)
            )
            mv = np.asarray(rec.move)
            act = np.asarray(rec.active)
            for i in range(2):
                if act[i]:
                    assert legal[i, mv[i]], f"illegal move {mv[i]}"

    @pytest.mark.slow
    def test_targets_and_serialization(self):
        env, actor = small_setup()
        states = env.new_batch(2, komi=4.5)
        final, records = actor.play_games(
            states, jax.random.PRNGKey(1), max_moves=50
        )
        targets = assemble_targets(env, final, records)
        T = len(records)
        end = np.asarray(targets["end"])
        assert (end > 0).all() and (end <= T).all()
        res = np.asarray(targets["result"])
        assert set(np.unique(res)).issubset({-1.0, 0.0, 1.0})
        # short-term value decays toward the windowed average; all in range
        assert np.all(np.abs(np.asarray(targets["short_q"])) <= 1.0 + 1e-4)

        games = D.games_to_text(env, records, targets)
        all_positions = [p for g in games for p in g]
        assert all_positions, "no positions serialized"
        pos = all_positions[0]
        lines = pos.strip("\n").split("\n")
        assert len(lines) == 53, f"expected 53 lines, got {len(lines)}"
        assert lines[0] == "2" and lines[1] == "0"
        assert lines[2] == "5"
        # 37 binary plane lines, hex packed: 25 cells -> 6 hex + 1 bit char
        for ln in lines[6:43]:
            assert len(ln) == 7, ln
        assert lines[43] in ("0", "1")
        probs = [float(x) for x in lines[44].split()]
        assert len(probs) == 26
        assert abs(sum(probs) - 1.0) < 1e-3
        assert len(lines[46]) == 25  # ownership chars
        assert set(lines[46]).issubset(set("013"))

    @pytest.mark.slow
    def test_chunk_writing(self, tmp_path):
        env, actor = small_setup()
        states = env.new_batch(2, komi=4.5)
        final, records = actor.play_games(
            states, jax.random.PRNGKey(2), max_moves=40
        )
        targets = assemble_targets(env, final, records)
        games = D.games_to_text(env, records, targets)
        n = D.write_chunks(games, str(tmp_path), "testrun")
        files = list(tmp_path.glob("*data/testrun/*.txt.gz"))
        assert len(files) == n > 0
        with gzip.open(files[0], "rt") as f:
            content = f.read()
        assert content.count("\n") % 53 == 0

    @pytest.mark.slow
    def test_reference_parser_accepts_chunks(self, tmp_path):
        """Differential check: the reference trainer's Data parser reads our
        chunks (only when the reference tree is mounted)."""
        ref = Path("/root/reference/train/torch")
        if not ref.exists():
            pytest.skip("reference tree not available")
        import sys

        sys.path.insert(0, str(ref))
        try:
            from data import Data  # the reference parser (read-only import)
        except Exception as e:
            pytest.skip(f"cannot import reference parser: {e}")
        finally:
            sys.path.pop(0)

        env, actor = small_setup()
        states = env.new_batch(2, komi=4.5)
        final, records = actor.play_games(
            states, jax.random.PRNGKey(3), max_moves=40
        )
        targets = assemble_targets(env, final, records)
        games = D.games_to_text(env, records, targets)
        text = "".join(p for g in games for p in g)
        from io import StringIO

        stream = StringIO(text)
        data = Data()
        ok = data.load_from_stream(stream)
        assert ok is not False
        data.parse()  # lazy parse (data.py:228-257)
        assert data.board_size == 5
        assert data.to_move in (0, 1)
        assert abs(sum(data.prob) - 1.0) < 1e-3


class TestDeterminism:
    @pytest.mark.slow
    def test_fixed_seed_exact_match(self):
        """North-star config 1 (BASELINE.json): identical seeds produce
        bit-identical self-play trajectories — the array search has no
        thread scheduling or unordered float accumulation to break it."""
        env, actor = small_setup()
        states = env.new_batch(2, komi=4.5)
        f1, r1 = actor.play_games(states, jax.random.PRNGKey(42), max_moves=20)
        env2, actor2 = small_setup()
        states2 = env2.new_batch(2, komi=4.5)
        f2, r2 = actor2.play_games(
            states2, jax.random.PRNGKey(42), max_moves=20
        )
        assert len(r1) == len(r2)
        for a, b in zip(r1, r2):
            np.testing.assert_array_equal(np.asarray(a.move), np.asarray(b.move))
            np.testing.assert_array_equal(
                np.asarray(a.states.stones), np.asarray(b.states.stones)
            )
            np.testing.assert_allclose(
                np.asarray(a.target_policy), np.asarray(b.target_policy)
            )
        np.testing.assert_array_equal(
            np.asarray(f1.stones), np.asarray(f2.stones)
        )
