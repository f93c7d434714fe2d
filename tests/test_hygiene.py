"""Post-search move hygiene (friendly pass / capture-all-dead / dead-alive
strings), search.cc:640-861 semantics on crafted endgame positions."""

import pytest
import numpy as np

from sayuri_tpu.mcts import hygiene as H


def parse(rows):
    n = len(rows)
    b = np.zeros((n, n), np.int8)
    for y, r in enumerate(rows):
        for x, ch in enumerate(r):
            b[y, x] = {".": 0, "X": 1, "O": 2}[ch]
    return b


class TestChains:
    def test_labels_and_liberties(self):
        b = parse(
            [
                "XX...",
                "X.O..",
                "..OO.",
                ".....",
                "....X",
            ]
        )
        labels = H.chain_labels_np(b)
        # the 3 black corner stones are one chain, the Os another
        assert labels[0, 0] == labels[0, 1] == labels[1, 0]
        assert labels[1, 2] == labels[2, 2] == labels[2, 3]
        assert labels[0, 0] != labels[1, 2]
        assert labels[4, 4] >= 0 and labels[4, 4] != labels[0, 0]
        libs = H.chain_liberty_map_np(b, labels)
        assert libs[4, 4] == 2  # corner stone
        assert libs[0, 0] == 3  # corner L-chain: (0,2),(1,1),(2,0)
        assert libs[1, 2] == 7  # distinct empty neighbors of the O chain


class TestDeadAlive:
    def test_dead_group_in_my_territory(self):
        # small white group inside overwhelming black territory
        b = parse(
            [
                ".X.X.",
                "XXXX.",
                ".XOO.",
                ".X.O.",
                ".XXX.",
            ]
        )
        owner = np.ones((5, 5), np.float32)  # search: all black's
        safe = np.zeros((5, 5), bool)
        dead, alive = H.dead_alive_masks(b, owner, color=0)
        assert dead[(b == 2)].all()  # whole white chain dead
        assert not dead[(b == 1)].any()
        assert alive[(b == 1)].all()

    def test_safe_area_overrides_search_ownership(self):
        b = parse(
            [
                ".X.X.",
                "XXXX.",
                "OO...",
                ".O...",
                "OO...",
            ]
        )
        # search (wrongly) gives everything to white...
        owner_white = -np.ones((5, 5), np.float32)
        # ...but the top black group sits in black's pass-alive area
        safe = np.zeros((5, 5), bool)
        safe[:2] = True
        safe_own = np.zeros((5, 5), np.int32)
        safe_own[:2] = 1
        owner = H.owner_map(safe, safe_own, owner_white, color=0)
        dead, alive = H.dead_alive_masks(b, owner, color=0)
        assert not dead[(b == 1)].any()
        assert alive[(b == 1)].all()


class TestShouldPass:
    def rows(self):
        # black clearly winning; one dead white stone at (2,4)
        return parse(
            [
                "XX.X.",
                ".XXXX",
                "XX.XO",
                "X.XX.",
                ".XX..",
            ]
        )

    def test_pass_when_won(self):
        b = self.rows()
        dead = b == 2
        assert H.should_pass(
            b,
            dead,
            color=0,
            movenum=20,
            last_move_was_pass=True,
            score_fn=lambda cleaned: float(
                (cleaned == 1).sum() - (cleaned == 2).sum()
            ),
        )

    def test_no_pass_before_threshold(self):
        b = self.rows()
        assert not H.should_pass(
            b, b == 2, 0, movenum=5, last_move_was_pass=True,
            score_fn=lambda c: 50.0,
        )

    def test_no_pass_without_opponent_pass(self):
        b = self.rows()
        assert not H.should_pass(
            b, b == 2, 0, movenum=20, last_move_was_pass=False,
            score_fn=lambda c: 50.0,
        )

    def test_no_pass_with_atari_string(self):
        # the black (0,0),(1,0) chain has a single liberty at (2,0):
        # a live string in atari -> the game is not settled, keep playing
        b = parse(
            [
                "XO...",
                "XO.X.",
                "..XXX",
                ".XXX.",
                ".XXX.",
            ]
        )
        assert not H.should_pass(
            b,
            np.zeros_like(b, bool),
            0,
            movenum=20,
            last_move_was_pass=True,
            score_fn=lambda c: 50.0,
        )

    def test_no_pass_when_losing(self):
        b = self.rows()
        assert not H.should_pass(
            b, b == 2, 0, movenum=20, last_move_was_pass=True,
            score_fn=lambda c: -3.0,
        )


class TestEngineIntegration:
    @pytest.mark.slow
    def test_genmove_with_hygiene_flags(self):
        """genmove exercises the hygiene filters end-to-end
        (GetBestMove, search.cc:830-861) without crashing; with an
        empty early board they must not rewrite the move."""
        from sayuri_tpu.gtp.engine import Agent

        a = Agent(
            boardsize=5,
            playouts=8,
            max_nodes=32,
            friendly_pass=True,
            capture_all_dead=True,
        )
        mv, tree = a.genmove(0, resign_threshold=0.0)
        assert mv != "resign" and 0 <= int(mv) <= 25
        # after an opponent pass the friendly-pass branch runs
        a.play(1, 25)
        mv2, _ = a.genmove(0, resign_threshold=0.0)
        assert mv2 != "resign" and 0 <= int(mv2) <= 25


class TestCaptureAllDead:
    def test_capture_comes_first(self):
        # dead white stone in atari at (0,1); dame at (4,4) side
        b = parse(
            [
                "XO...",
                "XX.X.",
                ".XXX.",
                ".X...",
                ".X...",
            ]
        )
        n = 5
        owner = np.ones((n, n), np.float32)
        raw = np.zeros((n, n), np.int32)
        raw[b == 1] = 1
        raw[b == 2] = -1
        raw[0, 2] = -1  # the dead stone's last liberty: white's eye
        legal = np.zeros(n * n + 1, bool)
        legal[0 * n + 2] = True  # captures the O
        legal[3 * n + 2] = True  # plain dame next to black
        sk = np.zeros(n * n + 1, bool)
        rng = np.random.RandomState(0)
        v = H.capture_all_dead_move(b, owner, raw, legal, sk, 0, rng)
        assert v == 0 * n + 2  # the capture, not the dame

    def test_superko_skipped(self):
        b = parse(
            [
                "XO...",
                "XX.X.",
                ".XXX.",
                ".....",
                ".....",
            ]
        )
        n = 5
        owner = np.ones((n, n), np.float32)
        raw = np.zeros((n, n), np.int32)
        raw[b == 1] = 1
        raw[b == 2] = -1
        legal = np.zeros(n * n + 1, bool)
        legal[2] = True
        sk = np.zeros(n * n + 1, bool)
        sk[2] = True  # superko repetition -> must be skipped
        rng = np.random.RandomState(0)
        assert H.capture_all_dead_move(b, owner, raw, legal, sk, 0, rng) is None

    def test_none_when_nothing_to_fill(self):
        b = parse(
            [
                ".....",
                ".X...",
                ".....",
                "...O.",
                ".....",
            ]
        )
        n = 5
        owner = np.zeros((n, n), np.float32)  # nothing confidently ours
        raw = np.zeros((n, n), np.int32)
        legal = np.ones(n * n + 1, bool)
        sk = np.zeros(n * n + 1, bool)
        rng = np.random.RandomState(0)
        assert H.capture_all_dead_move(b, owner, raw, legal, sk, 0, rng) is None
