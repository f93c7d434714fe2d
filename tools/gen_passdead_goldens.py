"""Generate pass-dead / safe-area goldens from the reference engine.

Crafted positions (inner-region / two-headed-dragon cases that random
games never produce) + sampled random games are replayed into the
reference binary via GTP `play`; the 4 area planes (25-28 of the 43-plane
encoder dump, encoder.cc:176-223: [safe&mine, safe&theirs, owner mine,
owner theirs]) are recorded. tests/test_passdead.py replays the same
positions through sayuri_tpu's analysis and demands exact agreement.

Usage: python tools/gen_passdead_goldens.py --binary /tmp/refbuild/sayuri
"""

import argparse
import json
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from gen_goldens import Gtp, parse_planes, vertex_name  # noqa: E402


def diagram(rows):
    return [
        {".": 0, "X": 1, "O": 2}[ch] for line in rows for ch in line
    ]


def crafted_boards():
    """Boards keyed by name -> (size, flat stones). All are reachable by
    alternating play (black stone / white pass etc.) without captures."""
    boards = {}

    # Pass-alive black block filling rows 1-7 with two real eyes; the
    # empty EDGE RING around it has zero unrefined white potential eyes
    # (edge rule: any c corner kills the eye) but the island is an inner
    # region, so refinement promotes the corners and the ring is NOT
    # pass-dead (board.cc:2013-2051).
    ring = [
        ".........",
        ".XXXXXXX.",
        ".XXXXXXX.",
        ".XXXXXXX.",
        ".XXX.X.X.",
        ".XXXXXXX.",
        ".XXXXXXX.",
        ".XXXXXXX.",
        ".........",
    ]
    boards["edge_ring_inner"] = (9, diagram(ring))

    # Negative control: the same island wired to the edge by one stone —
    # the complement now reaches the border, no promotion, and the two
    # ring arcs really are pass-dead for white.
    ring2 = [r for r in ring]
    ring2[0] = "....X...."
    boards["edge_ring_touching"] = (9, diagram(ring2))

    return boards


def board_to_moves(stones, size):
    """Turn a crafted board into an alternating GTP move list (colors
    play their stones in raster order, passing when out of stones).
    Asserts no captures happen along the way."""
    blacks = [v for v in range(size * size) if stones[v] == 1]
    whites = [v for v in range(size * size) if stones[v] == 2]
    moves = []  # (color, vertex or None)
    bi = wi = 0
    while bi < len(blacks) or wi < len(whites):
        if bi < len(blacks):
            moves.append(("b", blacks[bi]))
            bi += 1
        else:
            moves.append(("b", None))
        if wi < len(whites):
            moves.append(("w", whites[wi]))
            wi += 1
        elif bi < len(blacks):
            moves.append(("w", None))
    return moves


def dump_position(gtp, size, moves):
    gtp.cmd("clear_board")
    for color, v in moves:
        name = "pass" if v is None else vertex_name(v, size)
        ok, body = gtp.cmd(f"play {color} {name}")
        assert ok, f"play {color} {name}: {body}"
    ok, body = gtp.cmd("sayuri-planes")
    assert ok, body
    planes = parse_planes(body, size)
    assert len(planes) == 43, len(planes)
    return [planes[p] for p in (25, 26, 27, 28)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default="/tmp/refbuild/sayuri")
    ap.add_argument("--size", type=int, default=9)
    ap.add_argument("--games", type=int, default=4)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).parent.parent
            / "tests"
            / "goldens"
            / "passdead_goldens.json"
        ),
    )
    args = ap.parse_args()

    gtp = Gtp(args.binary)
    gtp.cmd(f"boardsize {args.size}")
    gtp.cmd("komi 7.5")

    records = []
    for name, (size, stones) in crafted_boards().items():
        assert size == args.size
        moves = board_to_moves(stones, size)
        area = dump_position(gtp, size, moves)
        records.append(
            {
                "name": name,
                "moves": [
                    [c, -1 if v is None else v] for c, v in moves
                ],
                "stones": stones,
                "area_planes": area,
            }
        )
        print(f"crafted {name}: ok")

    # random games, sampled at a few depths
    rng = random.Random(args.seed)
    for g in range(args.games):
        gtp.cmd("clear_board")
        moves = []
        color = "b"
        for mv in range(int(1.5 * args.size * args.size)):
            legal = []
            for idx in range(args.size * args.size):
                ok, body = gtp.cmd(
                    f"is_legal {color} {vertex_name(idx, args.size)}"
                )
                if int(body.strip()):
                    legal.append(idx)
            if not legal:
                v = None
            else:
                v = rng.choice(legal)
            name = "pass" if v is None else vertex_name(v, args.size)
            gtp.cmd(f"play {color} {name}")
            moves.append((color, v))
            color = "w" if color == "b" else "b"
            if mv in (40, 80, 110):
                ok, body = gtp.cmd("sayuri-planes")
                planes = parse_planes(body, args.size)
                records.append(
                    {
                        "name": f"random_g{g}_m{mv}",
                        "moves": [
                            [c, -1 if v is None else v] for c, v in moves
                        ],
                        "stones": None,
                        "area_planes": [
                            planes[p] for p in (25, 26, 27, 28)
                        ],
                    }
                )
        print(f"random game {g}: ok")

    gtp.close()
    json.dump(
        {"size": args.size, "komi": 7.5, "records": records},
        open(args.out, "w"),
    )
    print(f"wrote {len(records)} records -> {args.out}")


if __name__ == "__main__":
    main()
