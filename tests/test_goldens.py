"""Differential tests against reference-engine goldens.

Replays reference-generated random games (tools/gen_goldens.py) through the
vectorized env and compares, position by position:

- the full legality bitmap vs GameState::IsLegalMove
- all 43 encoder planes vs Encoder::GetPlanesString (2-decimal dump)

Ladder planes (33-36) are compared in a separate test because our ladder
reader follows the greedy principal variation instead of the reference's
forking search (see sayuri_tpu/game/ladder.py docstring).
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.models.encoder import encode

GOLDEN_DIR = Path(__file__).parent / "goldens"

LADDER_PLANES = range(33, 37)
EXACT_PLANES = [p for p in range(43) if p not in LADDER_PLANES]


def load(size):
    path = GOLDEN_DIR / f"go_goldens_{size}.json"
    if not path.exists():
        pytest.skip(f"no goldens for size {size}")
    return json.load(open(path))


_STEP_CACHE = {}


def _jit_step(env):
    if env.n not in _STEP_CACHE:
        import jax

        _STEP_CACHE[env.n] = jax.jit(env.step)
    return _STEP_CACHE[env.n]


def replay(env, record, komi):
    step = _jit_step(env)
    s = env.new_state(size=None, komi=komi)
    for mv in record["moves"]:
        a = env.pass_action if mv == "pass" else int(mv)
        s = step(s, a)
    return s


def stack_states(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@pytest.mark.parametrize(
    "size,stride",
    [(9, 1), pytest.param(19, 4, marks=pytest.mark.slow)],
)
def test_goldens(size, stride):
    data = load(size)
    records = data["records"][::stride]
    env = GoEnv(n=size)
    states = [replay(env, r, data["komi"]) for r in records]
    batch = stack_states(states)

    legal = np.asarray(jax.jit(jax.vmap(env.legal_action_mask))(batch))
    planes = np.asarray(
        jax.jit(jax.vmap(lambda s: encode(env, s)))(batch)
    )

    ladder_mismatch = 0
    ladder_total = 0
    for i, rec in enumerate(records):
        ref_legal = np.array(rec["legal"], bool)
        got = legal[i, : size * size]
        assert (got == ref_legal).all(), (
            f"size {size} rec {i} legality mismatch at "
            f"{np.nonzero(got != ref_legal)[0][:10]} after {len(rec['moves'])} moves"
        )

        ref_planes = np.array(rec["planes"], np.float32)  # [43, n, n]
        got_planes = np.moveaxis(planes[i], -1, 0)  # NHWC -> CHW
        for p in EXACT_PLANES:
            np.testing.assert_allclose(
                got_planes[p],
                ref_planes[p],
                atol=6e-3,
                err_msg=f"size {size} rec {i} plane {p}",
            )
        for p in LADDER_PLANES:
            ladder_total += ref_planes[p].size
            ladder_mismatch += int(
                (np.abs(got_planes[p] - ref_planes[p]) > 0.5).sum()
            )

    # greedy ladder reading: demand high agreement, not exactness
    if ladder_total:
        rate = ladder_mismatch / ladder_total
        assert rate < 0.02, f"ladder plane disagreement {rate:.2%}"
