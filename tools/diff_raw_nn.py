#!/usr/bin/env python3
"""NN forward differential vs the reference binary, SAME weights.

Exports the checkpoint to the reference's v5 engine format
(models/weights_io.py), feeds identical move sequences to both the
reference binary (`sayuri-raw_nn 0`, network.cc:294-331: identity
symmetry, cache off) and our evaluator (symmetry=0), and reports
max-abs deltas on winrate / final score / policy / ownership.

This isolates weights-export + encoder + network-forward parity from
search parity: if these match, any ref_match strength gap is a search
semantics issue, not an inference one.

Usage:
  python tools/diff_raw_nn.py --weights /tmp/rand9_b4c64.ckpt \
      --binary /tmp/sayuri_ref_build/sayuri --positions 16
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


def parse_raw_nn(text, n):
    """Parse GetOutputString (network.cc:294-331)."""
    vals = {}
    for key in ("stm winrate", "wdl winrate", "win probability",
                "loss probability", "final score"):
        m = re.search(rf"{key}: *(-?[\d.e+-]+)", text)
        vals[key] = float(m.group(1))
    floats = []
    grab = False
    probs, ownership, pass_p = [], [], None
    for ln in text.splitlines():
        if ln.startswith("probabilities"):
            grab, floats = True, probs
            continue
        if ln.startswith("pass probabilities"):
            pass_p = float(ln.split(":")[1])
            grab = False
            continue
        if ln.startswith("ownership"):
            grab, floats = True, ownership
            continue
        if grab:
            floats.extend(float(x) for x in ln.split())
    assert len(probs) == n * n and len(ownership) == n * n, (
        len(probs), len(ownership))
    vals["probs"] = probs + [pass_p]
    vals["ownership"] = ownership
    return vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--binary", default="/tmp/sayuri_ref_build/sayuri")
    ap.add_argument("--boardsize", type=int, default=9)
    ap.add_argument("--komi", type=float, default=7.5)
    ap.add_argument("--positions", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
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
    from sayuri_tpu.models import weights_io
    from sayuri_tpu.models.evaluator import make_eval_fn
    from sayuri_tpu.models.network import NetConfig, SayuriNet

    n = args.boardsize
    net_cfg, variables = weights_io.load_checkpoint_for_inference(
        args.weights
    )
    net_cfg = NetConfig(**{**net_cfg.__dict__, "boardsize": n})
    ref_w = "/tmp/diff_raw_nn_weights.bin.txt"
    weights_io.export_reference_weights(net_cfg, variables, ref_w)

    env = GoEnv(n=n)
    # suppress_pass is a search-prior transform (node.cc:253-263), not
    # part of the raw forward the reference prints — disable for parity
    eval_fn = make_eval_fn(env, SayuriNet(net_cfg), variables, symmetry=0,
                           suppress_pass_factor=0.0)

    @jax.jit
    def our_eval(states):
        ctx = {
            "ladders": L.ladder_planes_batch(
                states.stones, states.size, states.ko
            )
        }
        return eval_fn(states, ctx)

    gtp = Gtp([args.binary, "--quiet", "--weights", ref_w,
               "--board-size", str(n), "--komi", str(args.komi),
               "--playouts", "1"])

    rng = np.random.default_rng(args.seed)
    states = env.new_batch(1, komi=args.komi)
    step = jax.jit(jax.vmap(env.step))
    legal_fn = jax.jit(jax.vmap(env.legal_action_mask))

    worst = {"winrate": 0.0, "score": 0.0, "policy": 0.0, "own": 0.0}
    for pos in range(args.positions):
        ref = parse_raw_nn(gtp.cmd("sayuri-raw_nn 0"), n)
        ours = jax.tree.map(lambda x: np.asarray(x), our_eval(states))
        stm_black = int(np.asarray(states.to_move)[0]) == 0
        sign = 1.0 if stm_black else -1.0

        # printed row 0 is the TOP row (IndexToRowMajorIndex,
        # board.h:507-514): flip rows to our v = y*n+x (y=0 bottom)
        def unprint(seq):
            return np.asarray(seq, np.float64).reshape(n, n)[::-1].ravel()

        ref_probs = np.concatenate(
            [unprint(ref["probs"][: n * n]), [ref["probs"][-1]]]
        )
        ref_own = unprint(ref["ownership"]) * sign  # stm -> black view

        # our black_wl/black_score -> stm view like the printout
        our_stm_wl = (
            float(ours.black_wl[0])
            if stm_black
            else 1.0 - float(ours.black_wl[0])
        )
        our_stm_score = sign * float(ours.black_score[0])
        d_win = abs(our_stm_wl - ref["wdl winrate"])
        d_score = abs(our_stm_score - ref["final score"])

        # priors are legality-masked + renormalized; renormalize the
        # reference's raw softmax over the same legal support
        legal = np.asarray(legal_fn(states))[0]
        ref_legal = np.where(legal, ref_probs, 0.0)
        ref_legal = ref_legal / max(ref_legal.sum(), 1e-9)
        d_pol = float(
            np.max(np.abs(np.asarray(ours.priors[0]) - ref_legal))
        )
        d_own = float(
            np.max(np.abs(np.asarray(ours.black_ownership[0]) - ref_own))
        )
        worst["winrate"] = max(worst["winrate"], d_win)
        worst["score"] = max(worst["score"], d_score)
        worst["policy"] = max(worst["policy"], d_pol)
        worst["own"] = max(worst["own"], d_own)
        print(
            f"pos {pos}: d_winrate={d_win:.5f} d_score={d_score:.4f} "
            f"d_policy={d_pol:.5f} d_own={d_own:.5f}"
        )
        # advance both boards by one random legal move
        legal = np.asarray(legal_fn(states))[0]
        choices = np.flatnonzero(legal[: n * n])
        mv = int(rng.choice(choices)) if len(choices) else n * n
        color = "b" if int(np.asarray(states.to_move)[0]) == 0 else "w"
        gtp.cmd(f"play {color} {vertex_to_gtp(mv, n)}")
        states = step(states, jnp.asarray([mv], jnp.int32))

    gtp.close()
    print("worst:", {k: round(v, 5) for k, v in worst.items()})


if __name__ == "__main__":
    main()
