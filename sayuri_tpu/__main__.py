"""Mode dispatch: gtp / selfplay / benchmark.

The reference binary's entry point (/root/reference/src/main.cc:42-57)
maps here: `python -m sayuri_tpu --mode gtp|selfplay|benchmark [flags]
[--config file]`.
"""

from __future__ import annotations

import sys

from sayuri_tpu.config import Options


def run_gtp(opts: Options):
    from sayuri_tpu.gtp.loop import GtpLoop

    kwargs = dict(
        boardsize=opts.get("boardsize"),
        komi=opts.get("komi"),
        playouts=opts.get("playouts"),
        search_cfg=opts.search_config(),
        patterns_file=opts.get("patterns_file") or None,
        gammas_policy_factor=opts.get("gammas_policy_factor"),
        use_rollout=opts.get("use_rollout"),
        ponder=opts.get("ponder"),
        ponder_factor=opts.get("ponder_factor"),
        kldgain_per_node=opts.get("kldgain_per_node"),
        kldgain_interval=opts.get("kldgain_interval"),
        policy_temp=opts.get("policy_temp"),
        root_policy_temp=opts.get("root_policy_temp"),
        suppress_pass_factor=opts.get("suppress_pass_factor"),
        use_stm_winrate=opts.get("use_stm_winrate"),
        use_optimistic_policy=opts.get("use_optimistic_policy"),
        timemanage=opts.get("timemanage"),
        symm_pruning=opts.get("symm_pruning"),
        friendly_pass=opts.get("friendly_pass"),
        capture_all_dead=opts.get("capture_all_dead"),
    )
    wf = opts.get("weights_file")
    if wf:
        from sayuri_tpu.models import weights_io

        net_cfg, variables = weights_io.load_checkpoint_for_inference(wf)
        kwargs.update(net_cfg=net_cfg, variables=variables)
    from sayuri_tpu.gtp.engine import Agent

    agent = Agent(**kwargs)
    agent.reuse_tree = opts.get("reuse_tree")
    bf = opts.get("book_file")
    if bf:
        from sayuri_tpu.game.book import Book

        agent.book = Book.load(bf)
    GtpLoop(
        agent=agent,
        const_time=opts.get("const_time"),
        lag_buffer=opts.get("lag_buffer"),
        resign_threshold=opts.get("resign_threshold"),
        kgs_hint=opts.get("kgs_hint"),
        logfile=opts.get("logfile") or None,
    ).run()


def run_selfplay(opts: Options):
    import jax

    from sayuri_tpu.parallel import distributed as DI, mesh as M
    from sayuri_tpu.selfplay.pipe import SelfPlayPipe

    # multi-host: join the jax.distributed job when SAYURI_COORDINATOR /
    # SAYURI_NUM_PROCS / SAYURI_PROC_ID are set (one process per host);
    # self-play lanes shard over all chips of all hosts on one mesh
    DI.initialize_from_env()
    mesh = None
    if jax.device_count() > 1:
        mesh = (
            DI.global_mesh() if DI.is_multiprocess() else M.make_mesh()
        )

    pipe = SelfPlayPipe(
        out_dir=opts.get("target_directory") or "selfplay-out",
        boardsize=opts.get("boardsize"),
        komi=opts.get("komi"),
        parallel_games=opts.get("parallel_games"),
        search_cfg=opts.search_config(),
        sp_cfg=opts.selfplay_config(),
        weights_dir=opts.get("weights_dir") or None,
        mesh=mesh,
    )
    max_games = opts.get("num_games") or opts.get("parallel_games")
    pipe.loop(max_games)
    print(f"selfplay done: {pipe.games_done} games -> {pipe.out_dir}")


def run_benchmark(opts: Options):
    """Playout-throughput benchmark (benchmark.cc:110-161 semantics:
    playouts/s + the KataGo Elo-effect estimate of benchmark.cc:14-28)."""
    import math
    import time

    import jax

    from sayuri_tpu.game.state import GoEnv
    from sayuri_tpu.mcts.core import MCTS
    from sayuri_tpu.models.evaluator import make_dummy_eval_fn, make_eval_fn

    queries = opts.get("benchmark_query") or ["bg:64:96"]
    boardsize = opts.get("boardsize")
    env = GoEnv(n=boardsize)

    wf = opts.get("weights_file")
    if wf:
        from sayuri_tpu.models import weights_io
        from sayuri_tpu.models.network import NetConfig, SayuriNet

        net_cfg, variables = weights_io.load_checkpoint_for_inference(wf)
        net_cfg = NetConfig(**{**net_cfg.__dict__, "boardsize": boardsize})
        eval_fn = make_eval_fn(
            env, SayuriNet(net_cfg), variables, symmetry="random"
        )
    else:
        eval_fn = make_dummy_eval_fn(env)

    for q in queries:
        parts = q.split(":")
        batch = int(parts[1]) if len(parts) > 1 else 64
        playouts = int(parts[2]) if len(parts) > 2 else 96

        cfg = opts.search_config(max_nodes=playouts + 16)
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
            return mcts.run(tree, playouts, ctx=ctx).visits[:, 0]

        states = env.new_batch(batch, komi=opts.get("komi"))
        rng = jax.random.PRNGKey(0)
        search(states, rng).block_until_ready()  # compile
        t0 = time.monotonic()
        iters = 3
        for i in range(iters):
            out = search(states, jax.random.fold_in(rng, i))
        out.block_until_ready()
        dt = time.monotonic() - t0
        rate = iters * batch * playouts / dt
        # ad-hoc Elo effect vs 800-playout baseline (benchmark.cc:14-28)
        base_p, p = 800.0, rate / batch
        elo = 250.0 * math.log2(max(p, 1) / base_p)
        print(
            f"batch {batch} x {playouts} playouts: {rate:.1f} p/s "
            f"(per-game {p:.1f} p/s, elo-effect {elo:+.0f})"
        )


def main(argv=None):
    opts = Options().parse_args(argv if argv is not None else sys.argv[1:])
    mode = opts.get("mode")
    if mode == "gtp":
        run_gtp(opts)
    elif mode == "selfplay":
        run_selfplay(opts)
    elif mode == "benchmark":
        run_benchmark(opts)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
