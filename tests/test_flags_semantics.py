"""Semantics of the round-4 flag batch: pass suppression, stm-winrate,
optimistic policy head, root policy temp, symmetry pruning, timemanage,
random-move min-visit filtering, option parsing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sayuri_tpu.config import Options
from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.gtp.engine import Agent


def _tiny_net(n):
    from sayuri_tpu.models.network import NetConfig, SayuriNet

    cfg = NetConfig(boardsize=n, residual_channels=16,
                    stack=("ResidualBlock",))
    net = SayuriNet(cfg)
    dummy = jnp.zeros((1, n, n, cfg.input_channels)).at[..., -1].set(1.0)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
    return cfg, net, variables


def test_suppress_pass_factor():
    from sayuri_tpu.models.evaluator import make_eval_fn

    n = 5
    env = GoEnv(n=n)
    cfg, net, variables = _tiny_net(n)
    states = env.new_batch(1, komi=7.0)
    on = jax.jit(make_eval_fn(env, net, variables, symmetry=0))(states)
    off = jax.jit(
        make_eval_fn(env, net, variables, symmetry=0,
                     suppress_pass_factor=0.0)
    )(states)
    # empty board: 25 legal moves > (1-0.1667)*25 -> pass suppressed
    assert float(on.priors[0, n * n]) == 0.0
    assert float(off.priors[0, n * n]) > 0.0
    np.testing.assert_allclose(float(jnp.sum(on.priors[0])), 1.0, rtol=1e-5)


def test_stm_winrate_and_optimistic_head():
    from sayuri_tpu.models.evaluator import make_eval_fn

    n = 5
    env = GoEnv(n=n)
    cfg, net, variables = _tiny_net(n)
    states = env.new_batch(2, komi=7.0)
    base = jax.jit(make_eval_fn(env, net, variables, symmetry=0))(states)
    stm = jax.jit(
        make_eval_fn(env, net, variables, symmetry=0, use_stm_winrate=True)
    )(states)
    opt = jax.jit(
        make_eval_fn(env, net, variables, symmetry=0,
                     policy_head="optimistic_prob")
    )(states)
    # a random-init net gives different heads different outputs
    assert not np.allclose(np.asarray(base.black_wl), np.asarray(stm.black_wl))
    assert not np.allclose(np.asarray(base.priors), np.asarray(opt.priors))
    # stm winrate is a valid probability
    assert np.all((np.asarray(stm.black_wl) >= 0)
                  & (np.asarray(stm.black_wl) <= 1))


def test_symm_prune_orbits():
    agent = Agent(boardsize=5, komi=7.0, playouts=8, symm_pruning=True)
    keep = np.asarray(agent._symm_prune_keep())
    # empty 5x5: dihedral orbits of 25 cells = triangle(3) = 6, pass kept
    assert keep[-1]
    assert keep[:25].sum() == 6
    # the search runs with the pruned root
    v = agent.genmove(0)[0]
    assert keep[v]
    # after one asymmetric move most symmetries break; orbit count grows
    keep2 = np.asarray(agent._symm_prune_keep())
    assert keep2[:25].sum() > 6


def test_root_policy_temp_builds_root_eval():
    n = 5
    cfg, net, variables = _tiny_net(n)
    agent = Agent(
        boardsize=n, komi=7.0, playouts=8, net_cfg=cfg, variables=variables,
        root_policy_temp=2.0,
    )
    assert agent.mcts.root_eval_fn is not None
    agent2 = Agent(
        boardsize=n, komi=7.0, playouts=8, net_cfg=cfg, variables=variables,
    )
    assert agent2.mcts.root_eval_fn is None
    v = agent.genmove(0)[0]
    assert 0 <= v <= n * n


def test_timemanage_early_stop():
    # a position with one overwhelming move: after the threshold the
    # engine stops early with stopped_by=timemanage
    agent = Agent(boardsize=5, komi=7.0, playouts=400, max_nodes=450,
                  timemanage="fast", chunk=64)
    tree, stats = agent.think(400, time_budget=3600.0, tm_allowed=True)
    # cannot guarantee the dummy net concentrates, so just check the path
    # runs and reports a valid stop reason
    assert stats["stopped_by"] in (
        "cap", "timemanage", "tree_full", "kldgain", "time", "only_move",
    )


def test_random_min_visits_filter():
    from sayuri_tpu.selfplay.actor import SelfplayConfig

    cfg = SelfplayConfig(random_min_ratio=0.5, random_min_visits=2)
    # pure-numpy mirror of the actor's filter
    visits = np.array([10.0, 6.0, 1.0, 0.0])
    min_v = max(round(visits.max() * cfg.random_min_ratio),
                cfg.random_min_visits)
    kept = visits > min_v
    assert list(kept) == [True, True, False, False]


def test_option_parse_new_flags():
    o = Options().parse_args([
        "--no-cpuct-dynamic", "--no-cache", "--timemanage", "fast",
        "--ponder-factor", "7", "--use-stm-winrate",
        "--use-optimistic-policy", "--symm-pruning",
        "--root-policy-temp", "1.5", "--suppress-pass-factor", "0.5",
        "--gumbel-prom-visits", "2", "--gumbel-playouts-threshold", "100",
        "--ci-alpha", "0.001", "--random-min-ratio", "0.25",
        "--random-min-visits", "3", "--kgs-hint", "hi",
        "--random-opening-prob", "0.5",
    ])
    assert o.get("cpuct_dynamic") is False
    assert o.get("nn_cache_size") == 0
    assert o.get("timemanage") == "fast"
    assert o.get("ponder_factor") == 7
    assert o.get("use_stm_winrate") and o.get("use_optimistic_policy")
    assert o.get("symm_pruning")
    cfg = o.search_config()
    assert cfg.gumbel_prom_visits == 2
    assert cfg.gumbel_playouts_threshold == 100
    assert cfg.ci_alpha == 0.001
    sp = o.selfplay_config()
    assert sp.random_min_ratio == 0.25 and sp.random_min_visits == 3
    assert sp.random_opening_prob == 0.5
    with pytest.raises(ValueError):
        Options().parse_args(["--timemanage", "sometimes"])


def test_cache_memory_mib_conversion():
    o = Options().parse_args(["--cache-memory-mib", "400"])
    assert o.get("nn_cache_size") > 1000
    o2 = Options().parse_args(["--cache-memory-mib", "400", "--no-cache"])
    assert o2.get("nn_cache_size") == 0


def test_noop_reference_flags_accepted():
    o = Options().parse_args([
        "--gpu", "0", "--gpu", "1", "--threads", "8", "--no-fp16",
        "--no-winograd", "--virtual-loss-count", "2",
        "--gpu-waittime", "5", "--early-symm-cache",
        "--fixed-nn-boardsize", "19", "--logfile", "/tmp/x.log",
    ])
    assert o.get("gpu") == [0, 1]
