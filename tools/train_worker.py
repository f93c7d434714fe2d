#!/usr/bin/env python3
"""Standalone training worker driven by a reference setting.json.

The TPU-native equivalent of the reference's training worker
(/root/reference/bash/training-worker.sh:45: loop of
`python3 torch/train.py -j setting.json -w workspace`): one invocation
runs up to MaxStepsPerRunning optimizer steps on the growing window of
self-play chunks, then stores a checkpoint plus engine-format weights and
SWA weights (train/torch/train.py:623-708 fit_and_store semantics).

    python tools/train_worker.py -j setting.json [-w workspace] [--cpu]

Paths inside the JSON (TrainDirectory, StorePath) are taken relative to
`-w` when given, matching the reference worker's layout.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", "--setting", required=True,
                    help="reference setting.json")
    ap.add_argument("-w", "--workspace", default=".",
                    help="base dir for relative paths in the JSON")
    ap.add_argument("--max-steps", type=int, default=None,
                    help="override MaxStepsPerRunning (for smoke tests)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sayuri_tpu.models.weights_io import export_reference_weights
    from sayuri_tpu.train import dataset as DS
    from sayuri_tpu.train.pipeline import Trainer
    from sayuri_tpu.train.setting import load_setting

    setting = load_setting(args.setting)
    loop = setting.loop
    base = Path(args.workspace)

    def rel(p):
        p = Path(p)
        return p if p.is_absolute() else base / p

    store = rel(loop.store_path)
    ckpt_dir = store / "checkpoint"
    weights_dir = store / "weights"
    swa_dir = store / "swa"
    for d in (ckpt_dir, weights_dir, swa_dir):
        d.mkdir(parents=True, exist_ok=True)

    trainer = Trainer(setting.net, setting.train)
    latest = Trainer.latest_checkpoint(str(ckpt_dir))
    if latest:
        print(f"resume <- {latest}")
        trainer.load_checkpoint(latest)

    # growing window over the newest chunks (train.py:439-461)
    kw = {}
    if loop.chunks_increasing_c:
        kw = dict(
            c=loop.chunks_increasing_c,
            scale=loop.chunks_increasing_scale,
            alpha=loop.chunks_increasing_alpha,
            beta=loop.chunks_increasing_beta,
        )
    chunks, n_all = DS.select_window_chunks(str(rel(loop.train_dir)), **kw)
    if not chunks:
        print(f"no chunks under {rel(loop.train_dir)} — nothing to do")
        return
    print(f"window: {len(chunks)}/{n_all} chunks")

    loader = DS.ChunkLoader(
        chunks,
        nn_size=setting.net.boardsize,
        batch_size=setting.train.batch_size,
        down_sample_rate=loop.down_sample_rate,
        policy_surprise_factor=loop.policy_surprise_factor,
        shuffle_capacity=max(256, loop.buffer_size // 64),
        virtual_buffsize=64,
        seed=int(time.time()) % (1 << 31),
    )

    max_steps = args.max_steps or loop.max_steps_per_running
    t0 = time.time()
    done = 0
    log_path = store / "training.log"
    with open(log_path, "a") as lf:
        for planes, targets in loader:
            parts = trainer.train_batch(planes, targets)
            done += 1
            step = int(trainer.state.steps)
            if done % max(1, loop.verbose_steps) == 0 or done == 1:
                rate = done * setting.train.batch_size / (time.time() - t0)
                print(f"step {step}: loss={parts['loss']:.4f} "
                      f"({rate:.0f} samples/s)")
            lf.write(
                f"step={step} "
                + " ".join(f"{k}={v:.6f}" for k, v in parts.items())
                + "\n"
            )
            if done >= max_steps:
                break
    loader.close()

    # validation pass (train.py:590-621)
    vdir = rel(loop.validation_dir) if loop.validation_dir else None
    if vdir and vdir.exists():
        vchunks = sorted(vdir.rglob("*.txt.gz"))[-50:]
        if vchunks:
            vloader = DS.ChunkLoader(
                vchunks, nn_size=setting.net.boardsize,
                batch_size=setting.train.batch_size,
                down_sample_rate=1, policy_surprise_factor=0.0,
                shuffle_capacity=256, virtual_buffsize=1, loop=False,
                seed=0,
            )
            acc, vn = None, 0
            for planes, targets in vloader:
                p = trainer.eval_batch(planes, targets)
                acc = p if acc is None else {k: acc[k] + p[k] for k in p}
                vn += 1
                if vn >= loop.validation_steps:
                    break
            vloader.close()
            if acc:
                with open(store / "validation.log", "a") as lf:
                    lf.write(
                        f"step={int(trainer.state.steps)} "
                        + " ".join(f"{k}={v / vn:.6f}"
                                   for k, v in acc.items())
                        + "\n"
                    )

    # store: checkpoint + engine weights + swa weights (train.py:407-433)
    name = trainer.checkpoint_name(num_chunks=n_all, window=len(chunks))
    trainer.save_checkpoint(str(ckpt_dir / f"{name}.ckpt"),
                            extra={"setting_json": setting.json_str})
    variables = {
        "params": trainer.unreplicated_params(),
        "batch_stats": trainer.unreplicated_batch_stats(),
    }
    export_reference_weights(
        setting.net, variables, str(weights_dir / f"{name}.bin.txt")
    )
    swa_vars = {
        "params": trainer.unreplicated_swa_params(),
        "batch_stats": trainer.unreplicated_batch_stats(),
    }
    export_reference_weights(
        setting.net, swa_vars, str(swa_dir / f"{name}-swa.bin.txt")
    )
    print(f"stored {name} ({done} steps, {time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
