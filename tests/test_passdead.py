"""Pass-dead / safe-area differential tests.

Three layers:
- reference-binary goldens (tests/goldens/passdead_goldens.json, from
  tools/gen_passdead_goldens.py): crafted inner-region / two-headed-dragon
  boards + random games, compared plane-exactly against our encoder's
  area planes (encoder.cc:176-223);
- the Python oracle port (tests/score_oracle.py) against the same goldens;
- the vectorized analysis against the oracle on random boards
  (broader shapes than the goldens).
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import score_oracle as SO
from sayuri_tpu.game import analysis as A
from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.models.encoder import encode

GOLDEN = Path(__file__).parent / "goldens" / "passdead_goldens.json"


def load():
    if not GOLDEN.exists():
        pytest.skip("no passdead goldens")
    return json.load(open(GOLDEN))


def replay(env, moves, komi):
    s = env.new_state(size=None, komi=komi)
    step = jax.jit(env.step)
    expect = 0
    for color, v in moves:
        assert (color == "b") == (expect == 0), "moves must alternate"
        expect ^= 1
        s = step(s, jnp.int32(env.pass_action if v < 0 else v))
    return s


def test_area_planes_match_reference():
    data = load()
    n = data["size"]
    env = GoEnv(n=n)
    enc = jax.jit(lambda s: encode(env, s))
    for rec in data["records"]:
        s = replay(env, rec["moves"], data["komi"])
        if rec["stones"] is not None:
            np.testing.assert_array_equal(
                np.asarray(s.stones).reshape(-1), np.array(rec["stones"]),
                err_msg=f"{rec['name']}: replay mismatch",
            )
        got = np.moveaxis(np.asarray(enc(s)), -1, 0)[25:29]
        want = np.array(rec["area_planes"], np.float32)
        np.testing.assert_array_equal(
            got, want, err_msg=f"{rec['name']}: area planes"
        )


def test_oracle_matches_reference_safe():
    """safe&mine | safe&theirs == oracle ComputeSafeArea wherever the
    score-area owner is decided (the planes AND safe with ownership)."""
    data = load()
    n = data["size"]
    env = GoEnv(n=n)
    for rec in data["records"]:
        s = replay(env, rec["moves"], data["komi"])
        stones = np.asarray(s.stones).reshape(-1).tolist()
        safe = np.array(SO.safe_area(stones, n)).reshape(n, n)
        planes = np.array(rec["area_planes"], np.float32)
        marked = (planes[0] + planes[1]) > 0
        # every plane-marked cell is oracle-safe; oracle-safe cells with
        # an undecided owner may be unmarked
        assert (safe | ~marked).all(), rec["name"]


def test_vectorized_matches_oracle_random():
    env = GoEnv(n=9)
    rng = np.random.RandomState(23)
    states = env.new_batch(6, komi=7.5)
    step = jax.jit(jax.vmap(env.step))
    legal_fn = jax.jit(jax.vmap(env.legal_action_mask))
    pa = jax.jit(
        jax.vmap(
            lambda s, z: jnp.stack(
                [A.pass_alive_area(s, z, 0), A.pass_alive_area(s, z, 1)]
            )
        )
    )
    for _ in range(60):
        legal = np.asarray(legal_fn(states))[:, :81]
        acts = np.array(
            [rng.choice(np.nonzero(l)[0]) if l.any() else 81 for l in legal]
        )
        states = step(states, jnp.asarray(acts, jnp.int32))
    got = np.asarray(pa(states.stones, states.size))
    for i in range(6):
        flat = np.asarray(states.stones)[i].reshape(-1).tolist()
        for col in (0, 1):
            want = np.array(SO.pass_alive_area(flat, 9, col)).reshape(9, 9)
            np.testing.assert_array_equal(
                got[i, col], want, err_msg=f"board {i} color {col}"
            )


def test_inner_region_semantics():
    """The crafted pair pins the refinement itself: enclosed island ->
    ring NOT pass-dead; island touching the edge -> ring pass-dead."""
    data = load()
    by_name = {r["name"]: r for r in data["records"]}
    if "edge_ring_inner" not in by_name:
        pytest.skip("crafted records absent")
    n = data["size"]
    pa = jax.jit(lambda s, z: A.pass_alive_area(s, z, 0))

    inner = by_name["edge_ring_inner"]
    stones = jnp.asarray(
        np.array(inner["stones"], np.int32).reshape(n, n)
    )
    got = np.asarray(pa(stones, jnp.int32(n)))
    assert not got[0].any() and not got[:, 0].any(), "ring wrongly marked"
    assert got[1:8, 1:8].all(), "island should be pass-alive"

    touching = by_name["edge_ring_touching"]
    stones = jnp.asarray(
        np.array(touching["stones"], np.int32).reshape(n, n)
    )
    got = np.asarray(pa(stones, jnp.int32(n)))
    assert got.all(), "arcs + island should all be marked"
