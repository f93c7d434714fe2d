#!/usr/bin/env python3
"""Sequential self-play -> train -> gate loop.

The reference orchestrates its AlphaZero loop with bash workers
(/root/reference/bash/simple.sh:39-52: selfplay-worker, training-worker,
gate-worker in sequence, kill-file protocol); this driver is the same loop
in-process:

  round:
    1. self-play a batch of games with the newest gated weights
    2. train on the growing window of chunks
    3. export checkpoint + engine-format weights; "gate" = copy the newest
       SWA weights into the weights dir (gate-worker.sh:29-39 — the
       reference's gate is a copy, with real strength gating an explicit
       TODO in its source)

Usage: python tools/rl_loop.py --workdir /tmp/rl --rounds 2 \
           --games-per-round 16 --boardsize 9 --steps-per-round 40
"""

import argparse
import dataclasses
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--games-per-round", type=int, default=16)
    ap.add_argument("--parallel-games", type=int, default=16)
    ap.add_argument("--boardsize", type=int, default=9)
    ap.add_argument("--komi", type=float, default=7.5)
    ap.add_argument("--steps-per-round", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--playouts", type=int, default=150)
    ap.add_argument("--fast-playouts", type=int, default=50)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument(
        "--cache-entries-per-lane",
        type=int,
        default=512,
        help="NN cache entries per selfplay lane (cache.h:42-60; 0 = off)."
        " With the cache on, net_queries/ records COUNTED forwards"
        " (network.h:44-45), not estimates.",
    )
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sayuri_tpu.mcts.core import SearchConfig
    from sayuri_tpu.models.network import NetConfig
    from sayuri_tpu.selfplay.actor import SelfplayConfig
    from sayuri_tpu.selfplay.pipe import SelfPlayPipe
    from sayuri_tpu.train import dataset as DS
    from sayuri_tpu.train.pipeline import TrainConfig, Trainer

    work = Path(args.workdir)
    weights_dir = work / "weights"
    ckpt_dir = work / "checkpoint"
    for d in (weights_dir, ckpt_dir):
        d.mkdir(parents=True, exist_ok=True)

    stack = tuple(
        ["ResidualBlock"] * (args.blocks - 2)
        + ["ResidualBlock-SE", "ResidualBlock-SE"]
    )
    net_cfg = NetConfig(
        boardsize=args.boardsize,
        residual_channels=args.channels,
        stack=stack,
        se_ratio=4,
        policy_head_channels=min(32, args.channels),
        value_head_channels=min(32, args.channels),
    )
    trainer = Trainer(
        net_cfg,
        TrainConfig(
            batch_size=args.batch_size,
            lr_schedule=((0, args.lr),),
            warmup_steps=20,
        ),
    )
    latest = Trainer.latest_checkpoint(str(ckpt_dir))
    if latest:
        print(f"resuming from {latest}")
        trainer.load_checkpoint(latest)

    pipe = SelfPlayPipe(
        out_dir=str(work / "selfplay"),
        boardsize=args.boardsize,
        komi=args.komi,
        parallel_games=args.parallel_games,
        search_cfg=SearchConfig(
            max_nodes=args.playouts + 26,
            gumbel=True,
            nn_cache_size=args.cache_entries_per_lane,
        ),
        sp_cfg=SelfplayConfig(
            playouts=args.playouts,
            fastsearch_playouts=args.fast_playouts,
        ),
        weights_dir=str(weights_dir),
    )

    for rnd in range(args.rounds):
        t0 = time.time()
        if pipe.should_reload():
            pipe._build_actor()
        target = pipe.games_done + args.games_per_round
        while pipe.games_done < target:
            pipe.play_round()
        t_sp = time.time() - t0

        # train on the growing window
        chunks, n_all = DS.select_window_chunks(
            str(work / "selfplay" / "tdata")
        )
        loader = DS.ChunkLoader(
            chunks,
            nn_size=args.boardsize,
            batch_size=args.batch_size,
            down_sample_rate=4,
            policy_surprise_factor=0.5,
            shuffle_capacity=2048,
            virtual_buffsize=64,
            seed=rnd,
        )
        t1 = time.time()
        steps = 0
        losses = []
        train_log = work / "training.log"
        with open(train_log, "a") as lf:
            for planes, targets in loader:
                parts = trainer.train_batch(planes, targets)
                losses.append(parts["loss"])
                steps += 1
                lf.write(
                    f"step={int(trainer.state.steps)} "
                    + " ".join(f"{k}={v:.6f}" for k, v in parts.items())
                    + "\n"
                )
                if steps >= args.steps_per_round:
                    break
        loader.close()
        t_tr = time.time() - t1

        # validation pass on held-out vdata (train.py:590-621)
        vchunks = list(
            (work / "selfplay" / "vdata").rglob("*.txt.gz")
        )
        if vchunks:
            vloader = DS.ChunkLoader(
                vchunks[-20:],
                nn_size=args.boardsize,
                batch_size=args.batch_size,
                down_sample_rate=1,
                policy_surprise_factor=0.0,
                shuffle_capacity=256,
                virtual_buffsize=1,
                loop=False,
                seed=rnd,
            )
            vparts, vn = None, 0
            for planes, targets in vloader:
                p = trainer.eval_batch(planes, targets)
                vparts = (
                    p
                    if vparts is None
                    else {k: vparts[k] + p[k] for k in p}
                )
                vn += 1
                if vn >= 10:
                    break
            vloader.close()
            if vparts:
                with open(work / "validation.log", "a") as lf:
                    lf.write(
                        f"step={int(trainer.state.steps)} "
                        + " ".join(
                            f"{k}={v / vn:.6f}" for k, v in vparts.items()
                        )
                        + "\n"
                    )

        # checkpoint + gate (copy weights into weights_dir,
        # gate-worker.sh:29-39)
        name = trainer.checkpoint_name(num_chunks=n_all, window=len(chunks))
        ckpt = ckpt_dir / f"{name}.ckpt"
        trainer.save_checkpoint(str(ckpt))
        shutil.copy(ckpt, weights_dir / f"{name}.ckpt")

        avg_loss = sum(losses) / max(len(losses), 1)
        print(
            f"round {rnd}: games={pipe.games_done} chunks={n_all} "
            f"steps={steps} loss={avg_loss:.4f} "
            f"selfplay={t_sp:.1f}s train={t_tr:.1f}s -> {name}"
        )


if __name__ == "__main__":
    main()
