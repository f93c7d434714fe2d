"""Device pattern-gammas policy vs the host GammasDict (differential) and
per-expansion mixing in the evaluator (node.cc:151-160)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.pattern import pattern as P
from sayuri_tpu.pattern import gammas_jax as GJ
from sayuri_tpu.pattern.gammas import GammasDict


def _random_states(n=7, batch=4, moves=14, seed=0):
    env = GoEnv(n=n)
    states = env.new_batch(batch, komi=7.0)
    rng = np.random.RandomState(seed)
    step = jax.jit(jax.vmap(env.step))
    legal_fn = jax.jit(jax.vmap(env.legal_action_mask))
    for _ in range(moves):
        legal = np.asarray(legal_fn(states))
        acts = []
        for b in range(batch):
            cand = np.nonzero(legal[b][: n * n])[0]
            acts.append(rng.choice(cand) if len(cand) else n * n)
        states = step(states, jnp.asarray(acts, jnp.int32))
    return env, states


def _make_dict(states, n, dist=3, seed=1):
    """A dict hitting real keys from these boards + tactical features."""
    rng = np.random.RandomState(seed)
    table = {}
    stones = np.asarray(states.stones)
    to_move = np.asarray(states.to_move)
    for b in range(stones.shape[0]):
        for v in rng.choice(n * n, size=20, replace=False):
            k = P.pattern_key(stones[b], n, int(v), int(to_move[b]), dist)
            table[str(k)] = float(rng.uniform(0.2, 5.0))
    for d in range(1, 5):
        table[f"dist_last:{d}"] = float(rng.uniform(0.5, 3.0))
    for f in ("own_atari_adjacent", "own_2libs_adjacent",
              "opp_atari_adjacent", "opp_2libs_adjacent"):
        table[f] = float(rng.uniform(0.5, 3.0))
    return GammasDict(table, dist)


def test_spatial_keys_match_host():
    env, states = _random_states()
    n = env.n
    hi, lo = jax.jit(GJ.spatial_keys_batch, static_argnums=3)(
        states.stones, states.size, states.to_move, 3
    )
    hi, lo = np.asarray(hi), np.asarray(lo)
    stones = np.asarray(states.stones)
    to_move = np.asarray(states.to_move)
    for b in range(stones.shape[0]):
        for v in range(0, n * n, 3):
            want = P.pattern_key(stones[b], n, v, int(to_move[b]), 3)
            y, x = divmod(v, n)
            got = (int(hi[b, y, x]) << 28) | int(lo[b, y, x])
            assert got == want, (b, v)


def test_policy_matches_host():
    env, states = _random_states(seed=3)
    n = env.n
    gd = _make_dict(states, n)
    dev = GJ.DeviceGammas.compile(gd)
    legal = np.asarray(jax.jit(jax.vmap(env.legal_action_mask))(states))
    libs = GJ.libs_map_batch(states.stones)
    rng = np.random.RandomState(7)
    own = rng.uniform(-1, 1, size=(states.stones.shape[0], n * n)).astype(
        np.float32
    )
    got = np.asarray(
        jax.jit(GJ.gammas_policy_device)(
            dev,
            states.stones,
            states.size,
            states.to_move,
            jnp.asarray(legal[:, : n * n]),
            states.last_moves[:, 0],
            libs,
            ownership=jnp.asarray(own),
        )
    )
    stones = np.asarray(states.stones)
    to_move = np.asarray(states.to_move)
    last = np.asarray(states.last_moves[:, 0])
    for b in range(stones.shape[0]):
        want = gd.policy(
            stones[b], n, int(to_move[b]), legal[b],
            last_move=int(last[b]) if last[b] >= 0 else None,
            ownership=own[b],
        )
        np.testing.assert_allclose(got[b], want[: n * n], rtol=2e-5,
                                   atol=1e-7)


def test_eval_fn_mixes_per_expansion():
    """finish() applies p = (1-f)*nn + f*(1-pass)*gammas on EVERY eval."""
    from sayuri_tpu.models.evaluator import make_eval_fn
    from sayuri_tpu.models.network import NetConfig, SayuriNet

    env, states = _random_states(seed=5)
    n = env.n
    gd = _make_dict(states, n, seed=11)
    dev = GJ.DeviceGammas.compile(gd)
    cfg = NetConfig(
        boardsize=n, residual_channels=16, stack=("ResidualBlock",)
    )
    net = SayuriNet(cfg)
    dummy = jnp.zeros((1, n, n, cfg.input_channels)).at[..., -1].set(1.0)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
    f = 0.37
    plain = make_eval_fn(env, net, variables, symmetry=0)
    mixed = make_eval_fn(env, net, variables, symmetry=0,
                         gammas=(dev, f))
    ev0 = jax.jit(plain)(states)
    ev1 = jax.jit(mixed)(states)
    legal = np.asarray(jax.jit(jax.vmap(env.legal_action_mask))(states))
    stones = np.asarray(states.stones)
    to_move = np.asarray(states.to_move)
    last = np.asarray(states.last_moves[:, 0])
    own = np.asarray(ev0.black_ownership) * np.where(
        to_move == 0, 1.0, -1.0
    )[:, None]
    p0 = np.asarray(ev0.priors)
    for b in range(stones.shape[0]):
        g = gd.policy(
            stones[b], n, int(to_move[b]), legal[b],
            last_move=int(last[b]) if last[b] >= 0 else None,
            ownership=own[b],
        )
        # pass probability is left untouched (node.cc's loop only covers
        # board cells)
        want = p0[b].copy()
        want[: n * n] = (1 - f) * p0[b, : n * n] + f * (
            1 - p0[b, n * n]
        ) * g[: n * n]
        want = np.where(legal[b], want, 0.0)
        want /= want.sum()
        np.testing.assert_allclose(
            np.asarray(ev1.priors)[b], want, rtol=3e-4, atol=2e-6
        )
    # values untouched by the mix
    np.testing.assert_allclose(
        np.asarray(ev1.black_wl), np.asarray(ev0.black_wl), rtol=1e-5
    )


def test_agent_per_expansion_gammas(tmp_path):
    """Agent with patterns loaded searches with device mixing active and
    the host root-mix disabled (no double mixing)."""
    from sayuri_tpu.gtp.engine import Agent

    gd = GammasDict({"dist_last:1": 2.0}, 3)
    pf = tmp_path / "g.json"
    gd.save(pf)
    agent = Agent(
        boardsize=5, komi=7.0, playouts=12,
        patterns_file=str(pf), gammas_policy_factor=0.5,
    )
    assert agent._gammas_in_eval
    v = agent.genmove(0)[0]
    assert 0 <= v <= 25
    # live factor change rebuilds the eval path
    agent.gammas_policy_factor = 0.0
    agent.refresh_gammas()
    assert not agent._gammas_in_eval
    v = agent.genmove(1)[0]
    assert 0 <= v <= 25
