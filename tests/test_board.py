"""Unit tests for the dense-array board primitives.

Scenario coverage mirrors the rules behaviors of the reference board engine
(capture, multi-capture, ko, suicide, liberties, Tromp-Taylor scoring —
/root/reference/src/game/board.cc), exercised on hand-built positions with
known outcomes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sayuri_tpu.game import board as B
from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.game.types import BLACK, WHITE, EMPTY, C_BLACK, C_WHITE, NO_VERTEX


def make_board(rows, n=None):
    """'.XO' text rows -> int8 board padded to n x n."""
    size = len(rows)
    n = n or size
    b = np.zeros((n, n), np.int8)
    for y, row in enumerate(rows):
        for x, ch in enumerate(row):
            b[y, x] = {".": EMPTY, "X": C_BLACK, "O": C_WHITE}[ch]
    return jnp.asarray(b), size


def v(y, x, n):
    return y * n + x


class TestConnectivity:
    def test_chain_labels_two_chains(self):
        b, size = make_board(
            [
                "XX...",
                "X....",
                "...XX",
                ".....",
                ".....",
            ]
        )
        lbl = B.chain_labels((b == C_BLACK))
        lbl = np.asarray(lbl)
        assert lbl[0, 0] == lbl[0, 1] == lbl[1, 0] == 0
        assert lbl[2, 3] == lbl[2, 4] == v(2, 3, 5)
        assert lbl[4, 4] == -1

    def test_liberty_counts(self):
        b, size = make_board(
            [
                "XX...",
                "X....",
                "...XX",
                ".....",
                ".....",
            ]
        )
        empty = b == EMPTY
        lbl = B.chain_labels(b == C_BLACK)
        libs = np.asarray(B.chain_liberty_map(b == C_BLACK, lbl, empty))
        assert libs[0, 0] == 3  # corner L-shape: (0,2),(1,1),(2,0)
        assert libs[2, 3] == 5  # (1,3),(1,4),(2,2),(3,3),(3,4)

    def test_liberty_shared_between_stones_counted_once(self):
        b, _ = make_board(
            [
                ".....",
                ".X.X.",
                "..X..",
                ".....",
                ".....",
            ]
        )
        # three separate single stones; middle empty (1,2) adjacent to two
        empty = b == EMPTY
        lbl = B.chain_labels(b == C_BLACK)
        libs = np.asarray(B.chain_liberty_map(b == C_BLACK, lbl, empty))
        assert libs[1, 1] == 4
        assert libs[2, 2] == 4  # (1,2),(2,1),(2,3),(3,2)


class TestPlayMove:
    def test_simple_capture(self):
        b, size = make_board(
            [
                ".X...",
                "XOX..",
                ".....",
                ".....",
                ".....",
            ]
        )
        # black plays (2,1) capturing the white stone
        nb, n_cap, ko = B.play_move(b, jnp.int32(size), jnp.int32(BLACK), jnp.int32(v(2, 1, 5)))
        nb = np.asarray(nb)
        assert int(n_cap) == 1
        assert nb[1, 1] == EMPTY
        assert nb[2, 1] == C_BLACK
        # single-stone capture into a ko shape -> but black group at (2,1) has
        # many liberties, so NOT a ko
        assert int(ko) == NO_VERTEX

    def test_ko_detection(self):
        b, size = make_board(
            [
                ".XO..",
                "X.XO.",
                ".XO..",
                ".....",
                ".....",
            ]
        )
        # white plays (1,1)? no — classic ko: white plays at (1,2)'s left...
        # Board: black X at (0,1),(1,0),(2,1) and (1,2); white O at (0,2),(1,3),(2,2)
        # White plays (1,1) capturing black (1,2)? (1,2) is X with neighbors
        # (0,2)=O,(1,1)=empty->W,(2,2)=O,(1,3)=O -> captured. The new white
        # stone at (1,1)... wait (1,1) neighbors: (0,1)=X,(1,0)=X,(2,1)=X,(1,2)=X
        # that's suicide-then-capture of (1,2)? (1,2) is black adjacent to (1,1).
        # Use the canonical shape instead:
        b, size = make_board(
            [
                ".....",
                ".XO..",
                "X.XO.",
                ".XO..",
                ".....",
            ]
        )
        # point (2,1) empty; white plays (2,1)? neighbors (1,1)=X,(2,0)=X,(3,1)=X,(2,2)=X -> illegal.
        # Correct ko: white at (2,2) is flanked. Let black capture:
        b, size = make_board(
            [
                ".....",
                ".XO..",
                "X.OX.",  # black to play at (2,1): captures? (2,2)=O libs: (2,1) only? (2,2) nbrs: (1,2)=O,(3,2)=O,(2,1)=.,(2,3)=X
                ".XO..",
                ".....",
            ]
        )
        # that's a 3-stone white wall, not ko. Build exact single-stone ko:
        b, size = make_board(
            [
                ".XO..",
                "XO.O.",
                ".XO..",
                ".....",
                ".....",
            ]
        )
        # empty point (1,2); black plays (1,2): captures white (1,1)
        # (white (1,1) nbrs: (0,1)=X,(1,0)=X,(2,1)=X,(1,2)=new X).
        # new black stone at (1,2): nbrs (0,2)=O,(1,3)=O,(2,2)=O,(1,1)=captured->empty
        # => lone stone, 1 liberty, 1 capture => ko at (1,1)
        nb, n_cap, ko = B.play_move(b, jnp.int32(5), jnp.int32(BLACK), jnp.int32(v(1, 2, 5)))
        assert int(n_cap) == 1
        assert int(ko) == v(1, 1, 5)
        assert np.asarray(nb)[1, 1] == EMPTY

    def test_multi_capture_no_ko(self):
        b, _ = make_board(
            [
                "OO...",
                "XX...",
                ".....",
                ".....",
                ".....",
            ]
        )
        # black plays (0,2): white chain (0,0),(0,1) has last liberty (0,2)
        nb, n_cap, ko = B.play_move(b, jnp.int32(5), jnp.int32(BLACK), jnp.int32(v(0, 2, 5)))
        nb = np.asarray(nb)
        assert int(n_cap) == 2
        assert nb[0, 0] == EMPTY and nb[0, 1] == EMPTY
        assert int(ko) == NO_VERTEX


class TestLegalMoves:
    def test_suicide_illegal(self):
        b, _ = make_board(
            [
                ".X...",
                "X.X..",
                ".X...",
                ".....",
                ".....",
            ]
        )
        legal = np.asarray(
            B.legal_moves(b, jnp.int32(5), jnp.int32(WHITE), jnp.int32(NO_VERTEX))
        )
        assert not legal[v(1, 1, 5)]  # white suicide in black's eye
        legal_b = np.asarray(
            B.legal_moves(b, jnp.int32(5), jnp.int32(BLACK), jnp.int32(NO_VERTEX))
        )
        assert legal_b[v(1, 1, 5)]  # black filling own eye is legal

    def test_capture_move_is_legal(self):
        b, _ = make_board(
            [
                ".X...",
                "XOX..",
                ".O...",
                "XOX..",
                ".X...",
            ]
        )
        # white chain (1,1),(2,1),(3,1) has one liberty (2,0)... check (2,2):
        # nbrs of (2,1): (1,1)=O,(3,1)=O,(2,0)=empty,(2,2)=empty -> libs {(2,0),(2,2)}
        # black at (2,2) then (2,0) kills; (2,2) is legal (own stones nearby)
        legal = np.asarray(
            B.legal_moves(b, jnp.int32(5), jnp.int32(BLACK), jnp.int32(NO_VERTEX))
        )
        assert legal[v(2, 2, 5)]
        assert legal[v(2, 0, 5)]

    def test_single_liberty_fill_legal_only_if_captures(self):
        # white stone in corner with 1 lib; black playing that lib captures
        b, _ = make_board(
            [
                "OX...",
                "X....",
                ".....",
                ".....",
                ".....",
            ]
        )
        # wait: white (0,0) nbrs (0,1)=X, (1,0)=X -> zero libs already invalid.
        b, _ = make_board(
            [
                "O.X..",
                "X....",
                ".....",
                ".....",
                ".....",
            ]
        )
        legal = np.asarray(
            B.legal_moves(b, jnp.int32(5), jnp.int32(BLACK), jnp.int32(NO_VERTEX))
        )
        assert legal[v(0, 1, 5)]  # captures white corner stone

    def test_ko_point_blocked(self):
        b, _ = make_board(
            [
                ".XO..",
                "XO.O.",
                ".XO..",
                ".....",
                ".....",
            ]
        )
        nb, _, ko = B.play_move(b, jnp.int32(5), jnp.int32(BLACK), jnp.int32(v(1, 2, 5)))
        legal = np.asarray(B.legal_moves(nb, jnp.int32(5), jnp.int32(WHITE), ko))
        assert not legal[v(1, 1, 5)]  # ko recapture forbidden
        # but without ko flag it would be pseudo-legal
        legal2 = np.asarray(
            B.legal_moves(nb, jnp.int32(5), jnp.int32(WHITE), jnp.int32(NO_VERTEX))
        )
        assert legal2[v(1, 1, 5)]


class TestScoring:
    def test_empty_board_score(self):
        b = jnp.zeros((5, 5), jnp.int8)
        s = B.area_score(b, jnp.int32(5), jnp.float32(7.5))
        assert float(s) == -7.5  # all dame on empty board

    def test_full_control(self):
        b, _ = make_board(
            [
                ".....",
                "XXXXX",
                ".....",
                ".....",
                ".....",
            ]
        )
        s = B.area_score(b, jnp.int32(5), jnp.float32(0.0))
        assert float(s) == 25.0

    def test_split_board(self):
        b, _ = make_board(
            [
                "..X O".replace(" ", ""),
                "..XO.",
                "..XO.",
                "..XO.",
                "..XO.",
            ]
        )
        # columns 0-2 black (15), col 3 white... black stones col2 (5) + empty
        # cols 0,1 reach only black (10) = 15; white stones col3 (5)+col4 (5)=10
        s = B.area_score(b, jnp.int32(5), jnp.float32(0.0))
        assert float(s) == 5.0

    def test_variable_size_masked(self):
        # 5x5 position embedded in 9x9 buffer: off-board must not count
        b, _ = make_board(
            [
                ".....",
                "XXXXX",
                ".....",
                ".....",
                ".....",
            ],
            n=9,
        )
        s = B.area_score(b, jnp.int32(5), jnp.float32(0.0))
        assert float(s) == 25.0


class TestEnv:
    def test_game_flow_and_termination(self):
        env = GoEnv(n=5)
        s = env.new_state(komi=0.5)
        s = env.step(s, v(2, 2, 5))
        assert int(s.to_move) == WHITE
        assert int(s.move_count) == 1
        s = env.step(s, env.pass_action)
        assert int(s.pass_count) == 1
        s = env.step(s, env.pass_action)
        assert bool(s.terminated)
        # black owns everything: 25 - 0.5
        assert float(env.final_score(s)) == 24.5

    def test_terminated_is_frozen(self):
        env = GoEnv(n=5)
        s = env.new_state()
        s = env.step(s, env.pass_action)
        s = env.step(s, env.pass_action)
        before = jax.tree.map(np.asarray, s)
        s2 = env.step(s, v(0, 0, 5))
        after = jax.tree.map(np.asarray, s2)
        for a, b2 in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b2)

    def test_superko_detected(self):
        env = GoEnv(n=5)
        s = env.new_state(komi=0.0)
        # build the ko shape by playing moves
        # .XO..
        # XO.O.
        # .XO..
        moves = [
            (BLACK, v(0, 1, 5)),
            (WHITE, v(0, 2, 5)),
            (BLACK, v(1, 0, 5)),
            (WHITE, v(1, 1, 5)),
            (BLACK, v(2, 1, 5)),
            (WHITE, v(1, 3, 5)),
            (BLACK, v(4, 4, 5)),  # tenuki so colors line up
            (WHITE, v(2, 2, 5)),
        ]
        for color, mv in moves:
            assert int(s.to_move) == color, f"expected {color} to move"
            s = env.step(s, mv)
        # black captures the ko at (1,2)
        s = env.step(s, v(1, 2, 5))
        assert int(s.ko) == v(1, 1, 5)
        # white immediate recapture at (1,1) is blocked by the ko point
        legal = np.asarray(env.legal_action_mask(s))
        assert not legal[v(1, 1, 5)]
        # ...and it would also recreate the pre-capture position: superko
        assert bool(env.superko_violation(s, v(1, 1, 5)))
        # after a tenuki exchange the board differs -> recapture is NOT a
        # positional-superko violation (this is why ko threats work)
        s = env.step(s, v(4, 0, 5))
        s = env.step(s, v(3, 4, 5))
        assert not bool(env.superko_violation(s, v(1, 1, 5)))

    def test_batched_step_vmap(self):
        env = GoEnv(n=5)
        batch = env.new_batch(8, komi=0.0)
        actions = jnp.arange(8, dtype=jnp.int32)  # 8 different first moves
        step = jax.jit(jax.vmap(env.step))
        s = step(batch, actions)
        stones = np.asarray(s.stones).reshape(8, -1)
        for i in range(8):
            assert stones[i, i] == C_BLACK
        masks = jax.jit(jax.vmap(env.legal_action_mask))(s)
        masks = np.asarray(masks)
        for i in range(8):
            assert not masks[i, i]  # occupied
            assert masks[i, 24] or i == 24
            assert masks[i, env.pass_action]
