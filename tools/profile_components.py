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

    # the search's actual hot ops: the FUSED step+analysis launch and the
    # Pallas ladder-chase kernel (what simulate()/init_tree() call), not
    # the slow per-component fallbacks
    bench(
        "env.step_batch_with_analysis (fused)",
        jax.jit(env.step_batch_with_analysis),
        states,
        jnp.zeros((b,), jnp.int32),
    )
    bench(
        "ladder_planes_batch (root, amortized)",
        jax.jit(
            lambda s: L.ladder_planes_batch(s.stones, s.size, s.ko)
        ),
        states,
    )
    zero_ladders = jnp.zeros((b, n, n, 4))
    bench(
        "encode no-ladders",
        jax.jit(
            jax.vmap(lambda s, lp: encode(env, s, ladder_planes=lp))
        ),
        states,
        zero_ladders,
    )
    if "--slow" in sys.argv:
        bench("env.step (vmap, unfused)", step, states,
              jnp.zeros((b,), jnp.int32))
        bench(
            "legal_action_mask",
            jax.jit(jax.vmap(env.legal_action_mask)),
            states,
        )
        bench(
            "benson safe_area",
            jax.jit(jax.vmap(lambda s: A.safe_area(s.stones, s.size))),
            states,
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

    # search machinery alone: constant evaluator isolates descent + env
    # step + expand + backup from encode/forward
    from sayuri_tpu.mcts.core import NetEvals

    def const_eval(s, ctx=None):
        bb = s.stones.shape[0]
        return NetEvals(
            priors=jnp.full((bb, env.num_actions), 1.0 / env.num_actions),
            black_wl=jnp.full((bb,), 0.5),
            draw=jnp.zeros((bb,)),
            black_score=jnp.zeros((bb,)),
            black_ownership=jnp.zeros((bb, n * n)),
        )

    mcts2 = MCTS(env, const_eval, SearchConfig(max_nodes=64, max_depth=32))

    @jax.jit
    def sims16_noeval(states, rng):
        tree = mcts2.init_tree(states, rng)
        return mcts2.run(tree, 16).visits

    d2 = bench(
        "mcts 16 sims, const eval (machinery)",
        sims16_noeval, states, jax.random.PRNGKey(0),
    )
    per_sim = (d - d2) / 16 * 1000
    print(f"-> eval cost per simulate: {per_sim:.2f} ms (encode+forward)")


if __name__ == "__main__":
    main()
