#!/usr/bin/env python3
"""Search differential vs the reference binary: same weights, same
position, same playout budget — compare root child visit distributions,
root values, and chosen moves.

The game-level ref_match measures strength; this tool localizes WHERE
the searches diverge: priors (should be exact — diff_raw_nn), PUCT
selection shape (visit distribution), value backup (root winrate), or
final move pick. Reference side: `kata-genmove_analyze` info lines
(gtp.cc:389-417); move is undone afterwards so positions stay aligned.

Usage:
  python tools/diff_search.py --weights /tmp/rand9_b4c64.ckpt \
      --playouts 100 --moves 12 --cpu
"""

import argparse
import re
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

COLS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"


def vertex_to_gtp(v, size):
    if v >= size * size or v < 0:
        return "pass"
    y, x = divmod(int(v), size)
    return f"{COLS[x]}{y + 1}"


def gtp_to_vertex(s, size):
    s = s.strip().lower()
    if s in ("pass", "p"):
        return size * size
    col = COLS.lower().index(s[0])
    return (int(s[1:]) - 1) * size + col


class Gtp:
    def __init__(self, cmd):
        self.p = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1,
        )

    def cmd(self, line):
        self.p.stdin.write(line + "\n")
        self.p.stdin.flush()
        out = []
        while True:
            ln = self.p.stdout.readline()
            if not ln:
                raise RuntimeError("reference died")
            if ln.strip() == "" and out:
                break
            out.append(ln.rstrip("\n"))
        return "\n".join(out)

    def close(self):
        try:
            self.p.stdin.write("quit\n")
            self.p.stdin.flush()
            self.p.wait(timeout=5)
        except Exception:
            self.p.kill()


def parse_analyze(text, n):
    """kata-genmove_analyze -> (played_move, {move: (visits, winrate,
    prior)})."""
    played = None
    infos = {}
    for ln in text.splitlines():
        ln = ln.strip()
        if ln.startswith("play "):
            played = ln.split()[1]
        for m in re.finditer(
            r"info move (\S+) visits (\d+) winrate ([\d.eE+-]+)"
            r".*?prior ([\d.eE+-]+)",
            ln,
        ):
            infos[m.group(1).lower()] = (
                int(m.group(2)),
                float(m.group(3)),
                float(m.group(4)),
            )
        if ln.startswith("= ") and played is None and len(ln) > 2:
            played = ln[2:].split()[0]
    return played, infos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--binary", default="/tmp/sayuri_ref_build/sayuri")
    ap.add_argument("--boardsize", type=int, default=9)
    ap.add_argument("--komi", type=float, default=7.5)
    ap.add_argument("--playouts", type=int, default=100)
    ap.add_argument("--moves", type=int, default=10,
                    help="positions to compare along a played-out game"
                         " (reference's own moves drive the game)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sayuri_tpu.game import ladder as L
    from sayuri_tpu.game.state import GoEnv
    from sayuri_tpu.mcts.core import MCTS, SearchConfig
    from sayuri_tpu.models import weights_io
    from sayuri_tpu.models.evaluator import make_eval_fn
    from sayuri_tpu.models.network import NetConfig, SayuriNet

    n = args.boardsize
    net_cfg, variables = weights_io.load_checkpoint_for_inference(
        args.weights
    )
    net_cfg = NetConfig(**{**net_cfg.__dict__, "boardsize": n})
    ref_w = "/tmp/diff_search_weights.bin.txt"
    weights_io.export_reference_weights(net_cfg, variables, ref_w)

    env = GoEnv(n=n)
    eval_fn = make_eval_fn(env, SayuriNet(net_cfg), variables,
                           symmetry="random")
    cfg = SearchConfig(max_nodes=args.playouts + 16, max_depth=64,
                       dirichlet_noise=False)
    mcts = MCTS(env, eval_fn, cfg)

    @jax.jit
    def our_search(states, rng):
        ctx = {
            "ladders": L.ladder_planes_batch(
                states.stones, states.size, states.ko
            )
        }
        superko = jax.vmap(env.superko_action_mask)(states)
        tree = mcts.init_tree(states, rng, prior_mask=~superko, ctx=ctx)
        tree = mcts.run(tree, args.playouts, ctx=ctx)
        visits = mcts.root_child_visits(tree)
        return tree, visits, mcts.best_move(tree)

    gtp = Gtp([args.binary, "--quiet", "--weights", ref_w,
               "--board-size", str(n), "--komi", str(args.komi),
               "--playouts", str(args.playouts),
               "--resign-threshold", "0", "--lag-buffer", "0"])

    states = env.new_batch(1, komi=args.komi)
    step = jax.jit(jax.vmap(env.step))
    rng = jax.random.PRNGKey(0)

    for mv in range(args.moves):
        color = "b" if int(np.asarray(states.to_move)[0]) == 0 else "w"
        out = gtp.cmd(f"kata-genmove_analyze {color}")
        played, infos = parse_analyze(out, n)
        gtp.cmd("undo")

        rng, k = jax.random.split(rng)
        tree, visits, best = our_search(states, k)
        visits = np.asarray(visits)[0]
        best = int(np.asarray(best)[0])

        ours_sorted = np.argsort(-visits)[:6]
        our_str = " ".join(
            f"{vertex_to_gtp(a, n)}:{int(visits[a])}"
            for a in ours_sorted
            if visits[a] > 0
        )
        ref_sorted = sorted(
            infos.items(), key=lambda kv: -kv[1][0]
        )[:6]
        ref_str = " ".join(f"{m.upper()}:{v[0]}" for m, v in ref_sorted)
        root_q = float(
            np.asarray(tree.stats[0, 0, 1] / np.maximum(
                np.asarray(tree.stats[0, 0, 0]), 1))
        )
        print(f"move {mv} ({color}):")
        print(f"  ref : plays {played:5s} | {ref_str}")
        print(
            f"  ours: plays {vertex_to_gtp(best, n):5s} | {our_str} "
            f"| root_q(black)={root_q:.3f}"
        )

        # advance the shared game with the reference's own move
        gtp.cmd(f"play {color} {played}")
        v = gtp_to_vertex(played, n)
        states = step(states, jnp.asarray([v], jnp.int32))

    gtp.close()


if __name__ == "__main__":
    main()
