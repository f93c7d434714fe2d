#!/usr/bin/env python3
"""Component-wise timing on the current JAX backend.

Measures, at a given batch size: env.step, legal mask, encoder (with and
without ladders / area planes), network forward, one full MCTS simulate.
Run on the TPU (default env) to find the sequential-latency hot spots.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.game import analysis as A
from sayuri_tpu.game import ladder as L
from sayuri_tpu.models.encoder import encode
from sayuri_tpu.models.network import NetConfig, SayuriNet
from sayuri_tpu.mcts.core import MCTS, SearchConfig
from sayuri_tpu.models.evaluator import make_eval_fn


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / iters
    print(f"{name:40s} {dt * 1000:9.2f} ms")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 19
    print(f"batch={b} board={n} devices={jax.devices()}")

    env = GoEnv(n=n)
    states = env.new_batch(b, komi=7.5)
    # play a few stones for realism
    step = jax.jit(jax.vmap(env.step))
    import numpy as np

    rng = np.random.RandomState(0)
    for i in range(20):
        acts = jnp.asarray(rng.randint(0, n * n, b), jnp.int32)
        states = step(states, acts)

    bench("env.step (vmap)", step, states, jnp.zeros((b,), jnp.int32))
    bench(
        "legal_action_mask",
        jax.jit(jax.vmap(env.legal_action_mask)),
        states,
    )
    bench(
        "superko_action_mask",
        jax.jit(jax.vmap(env.superko_action_mask)),
        states,
    )
    bench(
        "benson safe_area",
        jax.jit(jax.vmap(lambda s: A.safe_area(s.stones, s.size))),
        states,
    )
    bench(
        "ladder_planes",
        jax.jit(jax.vmap(lambda s: L.ladder_planes(s.stones, s.size))),
        states,
    )
    zero_ladders = jnp.zeros((b, n, n, 4))
    bench(
        "encode full",
        jax.jit(jax.vmap(lambda s: encode(env, s))),
        states,
    )
    bench(
        "encode no-ladders",
        jax.jit(
            jax.vmap(lambda s, lp: encode(env, s, ladder_planes=lp))
        ),
        states,
        zero_ladders,
    )

    cfg = NetConfig(boardsize=n, compute_dtype=jnp.bfloat16)
    net = SayuriNet(cfg)
    dummy = jnp.zeros((b, n, n, 43)).at[..., 42].set(1.0)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
    bench(
        "net forward b6c96 bf16",
        jax.jit(lambda x: net.apply(variables, x, train=False)),
        dummy,
    )

    eval_fn = make_eval_fn(env, net, variables)
    mcts = MCTS(env, eval_fn, SearchConfig(max_nodes=64, max_depth=32))

    @jax.jit
    def one_sim(states, rng):
        tree = mcts.init_tree(states, rng)
        return mcts.simulate(tree, 1).visits

    bench("mcts init+1 simulate", one_sim, states, jax.random.PRNGKey(0))

    @jax.jit
    def sims16(states, rng):
        tree = mcts.init_tree(states, rng)
        return mcts.run(tree, 16).visits

    d = bench("mcts init+16 sims", sims16, states, jax.random.PRNGKey(0))
    print(f"-> playouts/s at batch {b}: {16 * b / d:.0f}")


if __name__ == "__main__":
    main()
