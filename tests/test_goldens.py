"""Differential tests against reference-engine goldens.

Replays reference-generated random games (tools/gen_goldens.py) through the
vectorized env and compares, position by position:

- the full legality bitmap vs GameState::IsLegalMove
- all 43 encoder planes vs Encoder::GetPlanesString (2-decimal dump),
  INCLUDING the 4 ladder planes: the exact fork-stack ladder search
  (sayuri_tpu/ops/ladder_kernel.py) reproduces the reference's AND-OR
  reader cell-exactly (board.cc:520-821, 1618-1691).
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

EXACT_PLANES = range(43)


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
