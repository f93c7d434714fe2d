#!/usr/bin/env python3
"""Parity match: sayuri-tpu vs the reference binary, SAME weights.

The definitive whole-search oracle (/root/reference/src/mcts/search.cc,
node.cc): both engines load identical network weights (ours from the
flax checkpoint, the reference from the exported v5 engine file —
models/weights_io.py) and play fixed-opening games at equal playout
budgets. A win rate whose CI overlaps 0.50 means the searches are
strength-equivalent; a systematic gap localizes a semantic divergence.

Mechanics: G games run in lockstep — our side is ONE batched jitted
search over all G lanes (lanes where the reference is to move just get
their move from its GTP process instead). One reference GTP subprocess
mirrors each game (our moves are `play`ed into it, its own moves come
from `genmove`). Our side plays black in lanes [0, G/2).

Scoring: games end on two consecutive passes (or reference resign =
our win); final boards are scored by Tromp-Taylor area with our
env.final_score — both engines' pass behavior must clean up dead
stones, as in the reference's own selfplay (search.cc:870-946).

Usage:
  python tools/ref_match.py --binary /tmp/sayuri_ref_build/sayuri \
      --weights /path/ckpt --games 256 --boardsize 9 --playouts 100
"""

import argparse
import json
import math
import subprocess
import sys
import threading
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
    if s == "resign":
        return -2
    col = COLS.lower().index(s[0])
    row = int(s[1:]) - 1
    return row * size + col


class RefProc:
    """One reference GTP subprocess mirroring one game."""

    def __init__(self, binary, weights, size, komi, playouts, extra):
        cmd = [
            binary, "--quiet", "--weights", weights,
            "--playouts", str(playouts),
            "--board-size", str(size), "--komi", str(komi),
            "--resign-threshold", "0",  # play to the end; score on board
            "--lag-buffer", "0",
        ] + (extra or [])
        self.p = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1,
        )
        self.size = size
        self.dead = False

    def cmd(self, line):
        if self.dead:
            return ""
        try:
            self.p.stdin.write(line + "\n")
            self.p.stdin.flush()
            out = []
            while True:
                ln = self.p.stdout.readline()
                if not ln:
                    self.dead = True
                    return ""
                if ln.strip() == "" and out:
                    break
                out.append(ln.strip())
            return out[0] if out else ""
        except Exception:
            self.dead = True
            return ""

    def close(self):
        try:
            self.p.stdin.write("quit\n")
            self.p.stdin.flush()
        except Exception:
            pass
        try:
            self.p.wait(timeout=5)
        except Exception:
            self.p.kill()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default="/tmp/sayuri_ref_build/sayuri")
    ap.add_argument("--weights", required=True, help="flax checkpoint")
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--boardsize", type=int, default=9)
    ap.add_argument("--komi", type=float, default=7.5)
    ap.add_argument("--playouts", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gumbel", action="store_true",
                    help="Gumbel root on both sides (selfplay-style)")
    ap.add_argument("--max-procs", type=int, default=256)
    ap.add_argument("--out", default=None, help="append JSON line here")
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
    G = min(args.games, args.max_procs)
    G_lanes = G
    half = G // 2

    net_cfg, variables = weights_io.load_checkpoint_for_inference(
        args.weights
    )
    net_cfg = NetConfig(**{**net_cfg.__dict__, "boardsize": n})
    ref_w = "/tmp/ref_match_weights.bin.txt"
    weights_io.export_reference_weights(net_cfg, variables, ref_w)

    env = GoEnv(n=n)
    eval_fn = make_eval_fn(env, SayuriNet(net_cfg), variables,
                           symmetry="random")
    cfg = SearchConfig(
        max_nodes=args.playouts + 16,
        max_depth=64,
        gumbel=args.gumbel,
        dirichlet_noise=False,
    )
    mcts = MCTS(env, eval_fn, cfg)

    @jax.jit
    def our_move(states, rng):
        ctx = {
            "ladders": L.ladder_planes_batch(
                states.stones, states.size, states.ko
            )
        }
        superko = jax.vmap(env.superko_action_mask)(states)
        tree = mcts.init_tree(states, rng, prior_mask=~superko, ctx=ctx)
        tree = mcts.run(tree, args.playouts, ctx=ctx)
        if args.gumbel:
            # mirror the reference: genmove plays the Gumbel pick when
            # gumbel is on and under the playouts threshold
            # (search.cc:1009-1013 -> GetGumbelMove)
            from sayuri_tpu.mcts import gumbel as G

            allow = jnp.ones((G_lanes,), bool)
            return G.gumbel_move(mcts, tree, allow)
        return mcts.best_move(tree)

    step = jax.jit(jax.vmap(env.step))

    extra = ["--gumbel"] if args.gumbel else []
    print(f"spawning {G} reference procs...", file=sys.stderr)
    procs = [
        RefProc(args.binary, ref_w, n, args.komi, args.playouts, extra)
        for _ in range(G)
    ]

    states = env.new_batch(G, komi=args.komi)
    we_are_black = np.arange(G) < half
    rng = jax.random.PRNGKey(args.seed)
    resigned = np.zeros(G, dtype=np.int8)  # +1 = ref resigned (our win)
    max_moves = int(1.8 * n * n)

    def ref_round(idxs, color_s, moves_out):
        def one(i):
            r = procs[i].cmd(f"genmove {color_s}")
            v = r.split()[-1] if r.startswith("=") and len(r) > 1 else "pass"
            try:
                moves_out[i] = gtp_to_vertex(v, n)
            except Exception:
                moves_out[i] = n * n

        threads = [threading.Thread(target=one, args=(i,)) for i in idxs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    for mv in range(max_moves):
        term = np.asarray(states.terminated) | (resigned != 0)
        if term.all():
            break
        color = int(np.asarray(states.to_move)[~term][0])
        color_s = "b" if color == 0 else "w"
        ours_turn = we_are_black if color == 0 else ~we_are_black

        rng, k = jax.random.split(rng)
        ours = np.asarray(our_move(states, k))

        moves = np.full(G, n * n, np.int32)
        ref_lanes = [
            i for i in range(G) if not term[i] and not ours_turn[i]
        ]
        ref_round(ref_lanes, color_s, moves)
        for i in range(G):
            if term[i]:
                continue
            if ours_turn[i]:
                moves[i] = int(ours[i])
            elif moves[i] == -2:  # reference resigned
                resigned[i] = 1
                moves[i] = n * n
        # mirror the played move into each live reference proc
        for i in range(G):
            if term[i] or resigned[i]:
                continue
            if ours_turn[i]:
                procs[i].cmd(
                    f"play {color_s} {vertex_to_gtp(moves[i], n)}"
                )
        states = step(states, jnp.asarray(moves, jnp.int32))
        if mv % 20 == 0:
            done = int(term.sum())
            print(f"move {mv}: {done}/{G} finished", file=sys.stderr)

    for p in procs:
        p.close()

    score_b = np.asarray(jax.jit(jax.vmap(env.final_score))(states))
    our_margin = np.where(we_are_black, score_b, -score_b)
    our_margin = np.where(resigned != 0, 1.0, our_margin)
    wins = int((our_margin > 1e-4).sum())
    losses = int((our_margin < -1e-4).sum())
    draws = G - wins - losses
    decided = max(wins + losses, 1)
    wr = wins / decided
    se = math.sqrt(wr * (1 - wr) / decided)
    out = {
        "games": G,
        "playouts": args.playouts,
        "boardsize": n,
        "komi": args.komi,
        "gumbel": args.gumbel,
        "our_wins": wins,
        "our_losses": losses,
        "draws": draws,
        "ref_resigns": int(resigned.sum()),
        "our_winrate": round(wr, 4),
        "ci95": [
            round(max(0.0, wr - 1.96 * se), 4),
            round(min(1.0, wr + 1.96 * se), 4),
        ],
        "elo_delta": round(
            -400 * math.log10(1 / min(max(wr, 1e-6), 1 - 1e-6) - 1), 1
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
