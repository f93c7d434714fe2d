#!/usr/bin/env python3
"""Attribute the headline-bench time: phase-by-phase timing of exactly
what bench.py's jitted search() does (ladder prep / init_tree / run-96),
plus sim-cost vs tree size. Run on the TPU."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.game import ladder as L
from sayuri_tpu.mcts.core import MCTS, SearchConfig
from sayuri_tpu.models.evaluator import make_eval_fn
from sayuri_tpu.models.network import NetConfig, SayuriNet


def bench(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / iters
    print(f"{name:46s} {dt * 1000:9.2f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    playouts = 96
    env = GoEnv(n=19)
    net_cfg = NetConfig(boardsize=19, compute_dtype=jnp.bfloat16)
    net = SayuriNet(net_cfg)
    n = 19
    dummy = jnp.zeros((1, n, n, net_cfg.input_channels))
    dummy = dummy.at[..., -1].set(1.0)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
    eval_fn = make_eval_fn(env, net, variables, symmetry="random")
    cfg = SearchConfig(max_nodes=playouts + 16, max_depth=64)
    mcts = MCTS(env, eval_fn, cfg)
    states = env.new_batch(batch, komi=7.5)
    rng = jax.random.PRNGKey(0)

    lad = jax.jit(
        lambda s: L.ladder_planes_batch(s.stones, s.size, s.ko)
    )
    bench("ladder_planes_batch (empty boards)", lad, states)

    lp = lad(states)

    @jax.jit
    def init_only(states, rng, lp):
        return mcts.init_tree(states, rng, ctx={"ladders": lp})

    bench("init_tree (given ladders)", init_only, states, rng, lp)
    tree0 = init_only(states, rng, lp)

    def make_run(k):
        @jax.jit
        def r(tree, lp):
            return mcts.run(tree, k, ctx={"ladders": lp})
        return r

    for k in (16, 48, 96):
        t = bench(f"run({k} sims)", make_run(k), tree0, lp, iters=2)
        print(f"   -> marginal ms/sim: {t * 1000 / k:.2f}")

    @jax.jit
    def full(states, rng):
        lpz = L.ladder_planes_batch(states.stones, states.size, states.ko)
        tree = mcts.init_tree(states, rng, ctx={"ladders": lpz})
        tree = mcts.run(tree, playouts, ctx={"ladders": lpz})
        return tree.visits[:, 0]

    t = bench("FULL bench search (ladders+init+96)", full, states, rng)
    print(f"   -> implied playouts/s: {batch * playouts / t:,.0f}")


if __name__ == "__main__":
    main()
