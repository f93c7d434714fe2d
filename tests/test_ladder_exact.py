"""Exact-ladder differential tests.

The vectorized fork-stack ladder search (sayuri_tpu/ops/ladder_kernel.py
via game/ladder.py) vs a direct recursive Python port of the reference's
reader (tests/ladder_oracle.py: PreyMove/HunterMove/IsLadder/GetLadderMap,
/root/reference/src/game/board.cc:429-821, 1618-1691). The oracle itself
is validated plane-exactly against reference-engine goldens in
test_goldens.py (all 43 planes, ladder planes included).

Covers what golden games can't: crafted classic ladders with and without
breakers, and random midgame boards dense with 1-2 liberty chains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladder_oracle import ladder_map
from sayuri_tpu.game.ladder import ladder_planes_batch
from sayuri_tpu.game.state import GoEnv


def oracle_planes(stones_flat, n, ko):
    lm = np.array(ladder_map(list(stones_flat), n, ko))
    return np.stack(
        [(lm == t).astype(np.float32).reshape(n, n) for t in (1, 2, 3, 4)],
        axis=-1,
    )


def assert_matches_oracle(stones, size, ko):
    """stones [B, n, n] int array, size/ko [B] ints."""
    n = stones.shape[-1]
    got = np.asarray(
        jax.jit(lambda s, z, k: ladder_planes_batch(s, z, k))(
            jnp.asarray(stones, jnp.int32),
            jnp.asarray(size, jnp.int32),
            jnp.asarray(ko, jnp.int32),
        )
    )
    for i in range(stones.shape[0]):
        want = oracle_planes(np.asarray(stones[i]).reshape(-1), n, int(ko[i]))
        np.testing.assert_array_equal(
            got[i], want, err_msg=f"board {i} ladder planes != oracle"
        )


def board_from_diagram(rows):
    """'.XO' diagram -> [n, n] int32."""
    n = len(rows)
    out = np.zeros((n, n), np.int32)
    for r, line in enumerate(rows):
        for c, ch in enumerate(line):
            out[r, c] = {".": 0, "X": 1, "O": 2}[ch]
    return out


def test_classic_ladder_works_and_breaker():
    """A standard corner ladder: prey (O) in atari runs; without a
    breaker the hunter wins everywhere (death+take marks), with a stone
    on the ladder path the prey escapes (no marks)."""
    base = [
        ".........",
        "...X.....",
        "..XO.....",
        "..X......",
        ".........",
        ".........",
        ".........",
        ".........",
        ".........",
    ]
    works = board_from_diagram(base)
    breaker = works.copy()
    breaker[6, 7] = 2  # O stone on the ladder diagonal
    boards = np.stack([works, breaker])
    assert_matches_oracle(boards, [9, 9], [-1, -1])

    got = np.asarray(
        ladder_planes_batch(
            jnp.asarray(boards), jnp.asarray([9, 9]), jnp.asarray([-1, -1])
        )
    )
    # ladder works: O(2,3) escapable, winning atari at (2,4)
    assert got[0][2, 3, 1] == 1.0
    assert got[0][2, 4, 2] == 1.0
    # breaker on the diagonal: not a ladder at all
    assert got[1].sum() == 0.0


def test_random_boards_match_oracle():
    env = GoEnv(n=9)
    rng = np.random.RandomState(7)
    states = env.new_batch(6, komi=7.5)
    step = jax.jit(jax.vmap(env.step))
    legal_fn = jax.jit(jax.vmap(env.legal_action_mask))
    for _ in range(34):
        legal = np.asarray(legal_fn(states))[:, :81]
        acts = np.array(
            [rng.choice(np.nonzero(l)[0]) if l.any() else 81 for l in legal]
        )
        states = step(states, jnp.asarray(acts, jnp.int32))
    assert_matches_oracle(
        np.asarray(states.stones), np.asarray(states.size),
        np.asarray(states.ko),
    )


@pytest.mark.slow
def test_random_13x13_match_oracle():
    env = GoEnv(n=13)
    rng = np.random.RandomState(3)
    states = env.new_batch(4, komi=7.5)
    step = jax.jit(jax.vmap(env.step))
    legal_fn = jax.jit(jax.vmap(env.legal_action_mask))
    for _ in range(70):
        legal = np.asarray(legal_fn(states))[:, : 13 * 13]
        acts = np.array(
            [
                rng.choice(np.nonzero(l)[0]) if l.any() else 13 * 13
                for l in legal
            ]
        )
        states = step(states, jnp.asarray(acts, jnp.int32))
    assert_matches_oracle(
        np.asarray(states.stones), np.asarray(states.size),
        np.asarray(states.ko),
    )
