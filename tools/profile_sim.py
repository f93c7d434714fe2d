#!/usr/bin/env python3
"""Per-simulation cost breakdown at the real bench config.

Times the components of MCTS.simulate at bench.py's shapes (batch 256,
19x19, b6c96, max_nodes=playouts+16) and the marginal cost of tree
depth/fullness, to target the single-chip playouts/s work.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.mcts.core import MCTS, SearchConfig
from sayuri_tpu.models.evaluator import make_eval_fn
from sayuri_tpu.models.network import NetConfig, SayuriNet


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / iters
    print(f"{name:44s} {dt * 1000:9.2f} ms")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    playouts = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    n = 19
    print(f"batch={b} board={n} playouts={playouts} devices={jax.devices()}")

    env = GoEnv(n=n)
    net_cfg = NetConfig(boardsize=n, compute_dtype=jnp.bfloat16)
    net = SayuriNet(net_cfg)
    dummy = jnp.zeros((1, n, n, net_cfg.input_channels)).at[..., -1].set(1.0)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
    eval_fn = make_eval_fn(env, net, variables)
    cfg = SearchConfig(max_nodes=playouts + 16, max_depth=64)
    mcts = MCTS(env, eval_fn, cfg)

    states = env.new_batch(b, komi=7.5)
    rng = jax.random.PRNGKey(0)
    ctx = {"ladders": jnp.zeros((b, n, n, 4))}

    # --- components ---
    from sayuri_tpu.game import board as B_

    acts = jnp.zeros((b,), jnp.int32)
    bench(
        "step_batch_with_analysis",
        jax.jit(lambda s, a: env.step_batch_with_analysis(s, a)),
        states,
        acts,
    )

    bench("eval_fn (encode+net+post)", jax.jit(lambda s: eval_fn(s, ctx)), states)

    x = jnp.zeros((b, n, n, 43)).at[..., 42].set(1.0)
    bench(
        "net forward only",
        jax.jit(lambda x: net.apply(variables, x, train=False)),
        x,
    )

    # --- tree at different fill levels ---
    @jax.jit
    def make_tree(states, rng):
        return mcts.init_tree(states, rng, ctx=ctx)

    tree0 = make_tree(states, rng)
    jax.block_until_ready(tree0.stats)

    run_k = jax.jit(lambda t, k: mcts.run(t, 16, ctx=ctx))

    @jax.jit
    def fill(t, k):
        return mcts.run(t, k, ctx=ctx)

    # fill to ~80% of playouts
    tree_full = fill(tree0, playouts - 16)
    jax.block_until_ready(tree_full.stats)

    d_empty = bench("16 sims on fresh tree", run_k, tree0, 16)
    d_full = bench("16 sims on full tree", run_k, tree_full, 16)
    print(f"-> per-sim: fresh {d_empty/16*1000:.2f} ms, "
          f"full {d_full/16*1000:.2f} ms")

    # --- selection / backup isolated (single sim pieces) ---
    @jax.jit
    def one_sim(t):
        return mcts.simulate(t, 0, ctx=ctx)

    bench("1 sim on full tree", one_sim, tree_full)

    @jax.jit
    def sel_only(t):
        # descent scores at root + one deep level
        s0 = mcts._puct_scores(t, None, jnp.ones((b,), bool), t.net_score[:, 0])
        idx = jnp.ones((b,), jnp.int32)
        s1 = mcts._puct_scores(t, idx, jnp.zeros((b,), bool), t.net_score[:, 0])
        return s0 + s1

    bench("puct_scores x2 (root + 1 level)", sel_only, tree_full)

    @jax.jit
    def gather_states(t):
        idx = jnp.ones((b,), jnp.int32)
        return jax.tree.map(lambda x: x[jnp.arange(b), idx], t.states)

    bench("gather parent states", gather_states, tree_full)


if __name__ == "__main__":
    main()
