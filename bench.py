#!/usr/bin/env python3
"""Benchmark: NN-evaluated MCTS playouts/s per chip at 19x19.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline rate is what decides engine strength per unit compute: full
batched searches (env step + 43-plane encode + network forward + tree
update, B games in lockstep) on the default RL net (6 blocks x 96
channels, /root/reference/bash/configs/selfplay-setting.json).

vs_baseline compares against the reference's practical single-GPU search
throughput at the same playout budget (~1-2k playouts/s on the consumer
GPUs it was developed on; we use 1500 p/s as the comparison point —
benchmark.cc's own Elo model values each doubling at ~250 Elo).
"""

import json
import sys
import time

BASELINE_PLAYOUTS_PER_S = 1500.0
# project north-star for the raw vectorized env (BASELINE.md: >=1M
# env-steps/s per chip at 19x19)
TARGET_ENV_STEPS_PER_S = 1.0e6


def bench_env_steps(batch=4096, n=19, steps=64):
    """Raw vectorized env throughput: fused light step+legality launches
    with legal random moves chained on-device (no host round-trip per
    step). The measured op is the full board transition of
    board.cc:1407-1484 (captures, ko, Zobrist, superko ring) PLUS the
    child legality map (Board::IsLegalMove, board.cc:269-321) needed to
    pick the next move — the reference's own UpdateBoard+IsLegalMove
    stepping contract. The heavyweight leaf analysis (liberty planes,
    Benson) is NN-evaluation work and is benched via the playouts/s
    metric instead."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sayuri_tpu.game.state import GoEnv

    env = GoEnv(n=n)
    states = env.new_batch(batch, komi=7.5)

    @jax.jit
    def rollout(states, seed):
        # initial legality from the light kernel via a pass pre-step: the
        # unfused XLA legal_action_mask fallback costs ~136 ms at B=4096
        # on v5e (~2.1 ms/step amortized!); every in-loop legality already
        # comes from the kernel, so the seed mask should too
        states, legal0 = env.step_batch_light(
            states, jnp.full((batch,), n * n, jnp.int32)
        )
        legal0 = legal0[:, : n * n]
        lane = jnp.arange(batch, dtype=jnp.uint32)[:, None]
        cell = jnp.arange(n * n, dtype=jnp.uint32)[None, :]

        def body(i, carry):
            states, legal, seed = carry
            # uniform legal move = argmax of a cheap per-cell integer hash
            # over legal cells (threefry-based jax.random.categorical was
            # measured at ~2.3 ms/step at B=4096 — 37% of the loop — and
            # move choice is harness, not the stepping contract; the
            # reference's own rollouts use a cheap xoroshiro pick,
            # src/utils/random.h)
            h = (
                lane * jnp.uint32(2654435761)
                ^ (i.astype(jnp.uint32) * jnp.uint32(0x9E3779B9) + seed)
                ^ cell * jnp.uint32(2246822519)
            )
            h = h ^ (h >> 15)
            h = h * jnp.uint32(2654435761)
            h = h ^ (h >> 13)
            score = jnp.where(legal, h, jnp.uint32(0))
            acts = jnp.argmax(score, axis=-1).astype(jnp.int32)
            acts = jnp.where(legal.any(axis=-1), acts, n * n)
            new_states, new_legal = env.step_batch_light(states, acts)
            return new_states, new_legal, seed

        return lax.fori_loop(0, steps, body, (states, legal0, seed))[0]

    out = rollout(states, jnp.uint32(0))
    float(jnp.sum(out.move_count))  # true device sync (readback)
    t0 = time.monotonic()
    iters = 3
    for i in range(iters):
        out = rollout(states, jnp.uint32(i + 1))
    float(jnp.sum(out.move_count))  # block_until_ready can return early
    dt = time.monotonic() - t0
    rate = iters * batch * steps / dt
    print(
        json.dumps(
            {
                "metric": f"env_steps_per_s_{n}x{n}",
                "value": round(rate, 1),
                "unit": "steps/s",
                "vs_baseline": round(rate / TARGET_ENV_STEPS_PER_S, 3),
            }
        )
    )


def bench_playouts(batch, playouts, metric_suffix="", nn_cache_size=0,
                   quiet=False):
    """Full batched searches on the default RL net; returns the rate and
    prints the JSON metric line (suppressed with quiet=True)."""
    import jax
    import jax.numpy as jnp

    from sayuri_tpu.game.state import GoEnv
    from sayuri_tpu.mcts.core import MCTS, SearchConfig
    from sayuri_tpu.models.evaluator import make_eval_fn
    from sayuri_tpu.models.network import NetConfig, SayuriNet

    env = GoEnv(n=19)
    net_cfg = NetConfig(boardsize=19, compute_dtype=jnp.bfloat16)
    net = SayuriNet(net_cfg)
    n = 19
    dummy = jnp.zeros((1, n, n, net_cfg.input_channels))
    dummy = dummy.at[..., -1].set(1.0)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)

    # random-symmetry leaf ensembling on, like real play (node.cc:146)
    eval_fn = make_eval_fn(env, net, variables, symmetry="random")
    cfg = SearchConfig(
        max_nodes=playouts + 16, max_depth=64, nn_cache_size=nn_cache_size
    )
    mcts = MCTS(env, eval_fn, cfg)

    @jax.jit
    def search(states, rng):
        from sayuri_tpu.game import ladder as L

        ctx = {
            "ladders": L.ladder_planes_batch(
                states.stones, states.size, states.ko
            )
        }
        tree = mcts.init_tree(states, rng, ctx=ctx)
        tree = mcts.run(tree, playouts, ctx=ctx)
        if nn_cache_size:
            stats = jnp.stack(
                [
                    jnp.sum(tree.cache.queries),
                    jnp.sum(tree.cache.hits),
                    jnp.sum(tree.cache.dups),
                ]
            )
        else:
            stats = jnp.zeros((3,), jnp.int32)
        return tree.visits[:, 0], stats

    states = env.new_batch(batch, komi=7.5)
    rng = jax.random.PRNGKey(0)

    # compile + warmup (sum readback: block_until_ready alone can return
    # before the device is done under tunneled/async runtimes)
    float(jnp.sum(search(states, rng)[0]))

    t0 = time.monotonic()
    iters = 3
    for i in range(iters):
        out, qstats = search(states, jax.random.fold_in(rng, i))
    float(jnp.sum(out))
    dt = time.monotonic() - t0

    total_playouts = iters * batch * playouts
    rate = total_playouts / dt
    suffix = metric_suffix + ("_cached" if nn_cache_size else "")
    if not quiet:
        line = {
            "metric": "mcts_playouts_per_s_19x19_b6c96" + suffix,
            "value": round(rate, 1),
            "unit": "playouts/s",
            "vs_baseline": round(rate / BASELINE_PLAYOUTS_PER_S, 3),
        }
        if nn_cache_size:
            # counted device stats of the LAST timed search
            # (network.cc:102-121 probe-then-forward accounting)
            q, h, d = (int(x) for x in qstats)
            line["cache_hit_rate"] = round((h + d) / max(q, 1), 4)
        print(json.dumps(line))
    return rate


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "envsteps":
        bench_env_steps(
            batch=int(sys.argv[2]) if len(sys.argv) > 2 else 4096,
            n=int(sys.argv[3]) if len(sys.argv) > 3 else 19,
        )
        return

    if len(sys.argv) > 1 and sys.argv[1] == "deep":
        # deeper-tree variant: the reference's config-2 class budget
        # (400 visits); playouts on big trees are costlier per playout
        # than the default 96-playout searches, so report separately
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        bench_playouts(batch, 400, metric_suffix="_deep400")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "cached":
        # NN-cache-on variant (the reference's cache is always on,
        # network.cc:102-121); empty-board lanes transpose heavily, so
        # this is an upper bound, not the headline
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        bench_playouts(batch, 96, nn_cache_size=1024)
        return

    # default driver run: BOTH north-star metrics (BASELINE.md) — the raw
    # env-stepping line first, the headline NN-evaluated playouts LAST
    # (the driver's parsed metric)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    playouts = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    bench_env_steps()
    bench_playouts(batch, playouts)


if __name__ == "__main__":
    main()
