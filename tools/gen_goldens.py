#!/usr/bin/env python3
"""Generate golden rules/encoder data from the reference engine via GTP.

Drives the reference binary (built from /root/reference with the BUILT_IN
CPU backend, no weights -> DummyForward random net, network.cc:144-165) and
records, at sampled positions of random legal games:

- the move sequence so far (replayable in our vectorized env)
- the full is_legal bitmap (GameState::IsLegalMove incl. superko)
- the 43-plane encoder dump (sayuri-planes = Encoder::GetPlanesString)

Output: tests/goldens/go_goldens_{size}.json, consumed by
tests/test_goldens.py. Run offline; the JSON is committed so CI needs no
reference binary.

Usage: python tools/gen_goldens.py --binary /tmp/sayuri_ref_build/sayuri \
           --size 9 --games 8 --seed 1
"""

import argparse
import json
import random
import re
import subprocess
import sys
from pathlib import Path

COLS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"  # GTP skips 'I'


def vertex_name(idx, size):
    y, x = divmod(idx, size)
    return f"{COLS[x]}{y + 1}"


class Gtp:
    def __init__(self, binary):
        self.proc = subprocess.Popen(
            [binary, "--quiet", "--playouts", "1"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )

    def cmd(self, line):
        self.proc.stdin.write(line + "\n")
        self.proc.stdin.flush()
        out = []
        while True:
            ln = self.proc.stdout.readline()
            if ln == "":
                raise RuntimeError(f"engine died on: {line}")
            if ln.strip() == "" and out:
                break
            if ln.strip() or out:
                out.append(ln.rstrip("\n"))
        resp = "\n".join(out)
        if not resp.startswith(("=", "?")):
            raise RuntimeError(f"bad GTP response to {line!r}: {resp[:200]}")
        ok = resp.startswith("=")
        body = re.sub(r"^[=?]\d*\s?", "", resp, count=1)
        return ok, body

    def close(self):
        try:
            self.cmd("quit")
        except Exception:
            pass
        self.proc.wait(timeout=5)


def legal_bitmap(gtp, size, color):
    bits = []
    for idx in range(size * size):
        ok, body = gtp.cmd(f"is_legal {color} {vertex_name(idx, size)}")
        assert ok, body
        bits.append(int(body.strip()))
    return bits


def parse_planes(text, size):
    """Parse Encoder::GetPlanesString: 'plane: N' then size rows of %6.2f
    or 'x' for zero (encoder.cc:52-78)."""
    planes = []
    cur = None
    for line in text.splitlines():
        if line.startswith("plane:"):
            if cur is not None:
                planes.append(cur)
            cur = []
        elif cur is not None and line.strip():
            row = []
            for tok in [line[i : i + 6] for i in range(0, len(line), 6)]:
                tok = tok.strip()
                if not tok:
                    continue
                row.append(0.0 if tok == "x" else float(tok))
            if row:
                cur.append(row)
    if cur is not None:
        planes.append(cur)
    return planes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default="/tmp/sayuri_ref_build/sayuri")
    ap.add_argument("--size", type=int, default=9)
    ap.add_argument("--games", type=int, default=6)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--komi", type=float, default=7.5)
    ap.add_argument("--sample-every", type=int, default=11)
    ap.add_argument("--max-moves", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    size = args.size
    max_moves = args.max_moves or int(1.7 * size * size)
    records = []

    gtp = Gtp(args.binary)
    for game in range(args.games):
        gtp.cmd(f"boardsize {size}")
        gtp.cmd("clear_board")
        gtp.cmd(f"komi {args.komi}")
        moves = []
        for mv_num in range(max_moves):
            color = "b" if mv_num % 2 == 0 else "w"
            bits = legal_bitmap(gtp, size, color)
            legal_idx = [i for i, b in enumerate(bits) if b]

            if mv_num % args.sample_every == 0:
                ok, planes_txt = gtp.cmd("sayuri-planes")
                records.append(
                    {
                        "game": game,
                        "moves": list(moves),
                        "to_move": color,
                        "legal": bits,
                        "planes": parse_planes(planes_txt, size),
                    }
                )
                sys.stderr.write(
                    f"game {game} move {mv_num}: {len(legal_idx)} legal\n"
                )

            # bias away from pass-heavy endings: play while moves exist
            if not legal_idx or (mv_num > size * size and rng.random() < 0.05):
                moves.append("pass")
                gtp.cmd(f"play {color} pass")
                if len(moves) >= 2 and moves[-2] == "pass":
                    break
                continue
            idx = rng.choice(legal_idx)
            moves.append(idx)
            ok, _ = gtp.cmd(f"play {color} {vertex_name(idx, size)}")
            assert ok
    gtp.close()

    out = args.out or f"tests/goldens/go_goldens_{size}.json"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump({"size": size, "komi": args.komi, "records": records}, f)
    print(f"wrote {len(records)} records to {out}")


if __name__ == "__main__":
    main()
