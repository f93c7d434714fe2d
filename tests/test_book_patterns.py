"""Opening book + pattern/MM subsystem tests."""

import numpy as np
import pytest

import jax

from sayuri_tpu.game import sgf as SGF
from sayuri_tpu.game.book import Book, BOOK_BOARD_SIZE
from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.pattern import pattern as P
from sayuri_tpu.pattern.mm import fit_mm
from sayuri_tpu.pattern.gammas import GammasDict, train_from_sgfs


def make_sgf_file(tmp_path, name, moves, size=19):
    text = SGF.game_to_sgf(size, 7.5, moves)
    p = tmp_path / name
    p.write_text(text)
    return p


class TestBook:
    def test_generate_probe_roundtrip(self, tmp_path):
        # 6 identical games: opening D4 (row 3, col 3)
        v0 = 3 * BOOK_BOARD_SIZE + 3
        v1 = 15 * BOOK_BOARD_SIZE + 15
        paths = [
            make_sgf_file(tmp_path, f"g{i}.sgf", [(0, v0), (1, v1)])
            for i in range(6)
        ]
        book = Book.generate(paths)
        assert len(book) >= 1
        env = GoEnv(n=BOOK_BOARD_SIZE)
        s = env.new_state(komi=7.5)
        legal = np.ones(env.num_actions, bool)
        assert book.probe(s, legal) == v0

        out = tmp_path / "book.json"
        book.save(out)
        book2 = Book.load(out)
        assert book2.probe(s, legal) == v0

    def test_below_frequency_excluded(self, tmp_path):
        v0 = 3 * BOOK_BOARD_SIZE + 3
        paths = [
            make_sgf_file(tmp_path, f"g{i}.sgf", [(0, v0)]) for i in range(3)
        ]
        book = Book.generate(paths)  # freq 3 < 5
        assert len(book) == 0


class TestPatterns:
    def test_pattern_key_symmetry_invariant(self):
        size = 9
        b1 = np.zeros((size, size), np.int8)
        b1[4, 5] = 1  # stone right of center
        b2 = np.zeros((size, size), np.int8)
        b2[5, 4] = 1  # stone below center (transposed shape)
        v = 4 * size + 4
        k1 = P.pattern_key(b1, size, v, 0)
        k2 = P.pattern_key(b2, size, v, 0)
        assert k1 == k2  # same canonical shape under symmetry

    def test_pattern_key_color_relative(self):
        size = 9
        b = np.zeros((size, size), np.int8)
        b[4, 5] = 1
        v = 4 * size + 4
        k_black = P.pattern_key(b, size, v, 0)  # own stone nearby
        b2 = np.zeros((size, size), np.int8)
        b2[4, 5] = 2
        k_white = P.pattern_key(b2, size, v, 1)  # own stone nearby (white)
        assert k_black == k_white

    def test_mm_prefers_winning_feature(self):
        # feature "a" wins 9 of 10 competitions against "b"
        comps = []
        for i in range(10):
            teams = [("a",), ("b",)]
            comps.append((0 if i < 9 else 1, teams))
        g = fit_mm(comps, iterations=50)
        assert g["a"] > g["b"]

    @pytest.mark.slow
    def test_train_from_sgfs_and_policy(self, tmp_path):
        size = 5
        # tiny games on 5x5
        moves = [(0, 12), (1, 6), (0, 8)]
        paths = [
            make_sgf_file(tmp_path, f"g{i}.sgf", moves, size=size)
            for i in range(2)
        ]
        gd = train_from_sgfs(paths, dist=2, mm_iterations=5)
        assert len(gd.table) > 0

        env = GoEnv(n=size)
        s = env.new_state()
        legal = np.asarray(jax.jit(env.legal_action_mask)(s))
        pol = gd.policy(np.asarray(s.stones), size, 0, legal)
        assert pol.shape == (size * size + 1,)
        np.testing.assert_allclose(pol.sum(), 1.0, atol=1e-6)


class TestGammasMixing:
    @pytest.mark.slow
    def test_factor_changes_root_priors(self, tmp_path):
        """gammas_policy_factor > 0 mixes the pattern policy into the
        search's root priors (node.cc:151-160 equivalent)."""
        size = 5
        moves = [(0, 12), (1, 6), (0, 8)]
        paths = [
            make_sgf_file(tmp_path, f"m{i}.sgf", moves, size=size)
            for i in range(2)
        ]
        gd = train_from_sgfs(paths, dist=2, mm_iterations=5)

        from sayuri_tpu.gtp.engine import Agent

        agent = Agent(boardsize=size, komi=4.5, playouts=4, max_nodes=12)
        agent.gammas = gd
        agent.gammas_policy_factor = 0.0
        tree0, _ = agent.think(playouts=2)
        p0 = np.asarray(tree0.prior[0, 0]).copy()

        agent.gammas_policy_factor = 0.5
        agent._drop_tree()
        tree1, _ = agent.think(playouts=2)
        p1 = np.asarray(tree1.prior[0, 0])

        assert not np.allclose(p0, p1)
        np.testing.assert_allclose(p1.sum(), 1.0, atol=1e-5)
        # mixing keeps the legal support
        assert ((p1 > 0) == (p0 > 0)).all()
