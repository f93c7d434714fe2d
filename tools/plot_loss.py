#!/usr/bin/env python3
"""Loss-curve plots from training logs.

Equivalent of the reference's train/torch/plot_loss.py: reads
training.log / validation.log lines (step + loss components) emitted by
tools/rl_loop.py / the Trainer, writes PNG curves (matplotlib if
available, else a plain-text sparkline summary).

Log line format: "step=N loss=X prob_loss=Y ..." (one line per step).
"""

import argparse
import sys
from collections import defaultdict
from pathlib import Path


def parse_log(path):
    rows = defaultdict(list)
    for line in Path(path).read_text().splitlines():
        fields = dict(
            kv.split("=", 1) for kv in line.split() if "=" in kv
        )
        if "step" not in fields:
            continue
        step = int(fields.pop("step"))
        for k, v in fields.items():
            try:
                rows[k].append((step, float(v)))
            except ValueError:
                pass
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+", help="training/validation log files")
    ap.add_argument("--out", default="loss.png")
    ap.add_argument("--keys", default="loss,prob_loss,wdl_loss")
    args = ap.parse_args()

    keys = args.keys.split(",")
    curves = {p: parse_log(p) for p in args.logs}

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(
            1, len(keys), figsize=(5 * len(keys), 4), squeeze=False
        )
        for i, key in enumerate(keys):
            ax = axes[0][i]
            for path, rows in curves.items():
                if key in rows:
                    xs, ys = zip(*rows[key])
                    ax.plot(xs, ys, label=Path(path).stem)
            ax.set_title(key)
            ax.set_xlabel("step")
            ax.legend()
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    except ImportError:
        for path, rows in curves.items():
            for key in keys:
                if key not in rows:
                    continue
                ys = [v for _, v in rows[key]]
                print(
                    f"{path} {key}: first={ys[0]:.4f} last={ys[-1]:.4f} "
                    f"min={min(ys):.4f} n={len(ys)}"
                )


if __name__ == "__main__":
    main()
