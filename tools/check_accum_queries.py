#!/usr/bin/env python3
"""Compute accounting: accumulated NN query cost vs games.

Equivalent of the reference's train/torch/check_accum_queries.py:27-45 —
reads the self-play pipe's net_queries/ logs ("games total_queries" lines)
and accumulates theory-cost = blocks * channels^2 per query, producing the
compute-vs-games curve behind the Elo-per-FLOP efficiency claims.
"""

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+", help="selfplay out dirs (contain net_queries/)")
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--channels", type=int, default=96)
    args = ap.parse_args()

    cost_per_query = args.blocks * args.channels**2
    total_games = 0
    total_queries = 0
    for d in args.dirs:
        for f in sorted(Path(d).glob("net_queries/*.txt")):
            parts = f.read_text().split()
            if len(parts) >= 2:
                total_games = max(total_games, int(parts[0]))
                total_queries += int(parts[1])
    accum_cost = total_queries * cost_per_query
    print(f"games:            {total_games}")
    print(f"net queries:      {total_queries}")
    print(f"cost/query:       {cost_per_query} (blocks*channels^2)")
    print(f"accumulated cost: {accum_cost:.3e}")
    if total_games:
        print(f"queries/game:     {total_queries / total_games:.1f}")


if __name__ == "__main__":
    main()
