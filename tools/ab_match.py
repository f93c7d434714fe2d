"""A/B strength harness: two search configurations play fixed-seed games.

Measures the strength impact of search-semantics knobs (the PARITY.md
deviation table) with color-balanced, vectorized matches: B parallel
games in lockstep, A playing black in the first half and white in the
second. Both configurations share one evaluator (and its weights), so
any win-rate delta is the search knob itself.

Usage:
  python tools/ab_match.py --games 128 --boardsize 9 --playouts 64 \
      --weights /path/net.ckpt \
      --a gumbel_per_selection=true --b gumbel_per_selection=false

Each --a/--b takes key=value SearchConfig overrides (repeatable).
Prints one JSON line: wins/losses/draws for A, win rate, and the
two-sided 95% normal interval.
"""

import argparse
import dataclasses
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        lv = v.lower()
        if lv in ("true", "false"):
            out[k] = lv == "true"
        else:
            try:
                out[k] = int(v)
            except ValueError:
                out[k] = float(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=128)
    ap.add_argument("--boardsize", type=int, default=9)
    ap.add_argument("--komi", type=float, default=7.0)
    ap.add_argument("--playouts", type=int, default=64)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--weights-b", default=None,
                    help="separate checkpoint for side B (strength-trend "
                         "matches: round-k vs round-0 nets at equal "
                         "playouts)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--a", action="append", help="SearchConfig k=v for A")
    ap.add_argument("--b", action="append", help="SearchConfig k=v for B")
    ap.add_argument("--eval-a", action="append",
                    help="make_eval_fn k=v override for A (e.g. "
                         "ladder_mode=full, symmetry=0)")
    ap.add_argument("--eval-b", action="append",
                    help="make_eval_fn k=v override for B")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
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
    from sayuri_tpu.models.evaluator import make_dummy_eval_fn, make_eval_fn

    def parse_eval_overrides(pairs):
        out = {}
        for p in pairs or []:
            k, v = p.split("=", 1)
            if k == "symmetry" and v not in ("random", "average"):
                out[k] = int(v)
            elif v.lower() in ("true", "false"):
                out[k] = v.lower() == "true"
            else:
                try:
                    out[k] = float(v) if "." in v else v
                except ValueError:
                    out[k] = v
        return out

    ev_a = parse_eval_overrides(args.eval_a)
    ev_b = parse_eval_overrides(args.eval_b)

    env = GoEnv(n=args.boardsize)
    if args.weights:
        from sayuri_tpu.models import weights_io
        from sayuri_tpu.models.network import NetConfig, SayuriNet

        net_cfg, variables = weights_io.load_checkpoint_for_inference(
            args.weights
        )
        net_cfg = NetConfig(
            **{**net_cfg.__dict__, "boardsize": args.boardsize}
        )

        def build_eval(over, cfg=None, var=None):
            return make_eval_fn(
                env, SayuriNet(cfg or net_cfg), var or variables,
                **{"symmetry": "random", **over},
            )

        eval_a = build_eval(ev_a)
        if args.weights_b:
            cfg_b_, var_b = weights_io.load_checkpoint_for_inference(
                args.weights_b
            )
            cfg_b_ = NetConfig(
                **{**cfg_b_.__dict__, "boardsize": args.boardsize}
            )
            eval_b = build_eval(ev_b, cfg_b_, var_b)
        else:
            eval_b = build_eval(ev_b) if ev_b != ev_a else eval_a
    else:
        eval_a = eval_b = make_dummy_eval_fn(env)
        if ev_a or ev_b:
            print("note: --eval-a/--eval-b ignored without --weights",
                  file=sys.stderr)

    base = dict(
        max_nodes=args.playouts + 16,
        max_depth=64,
        gumbel=True,
        dirichlet_noise=False,
    )
    cfg_a = SearchConfig(**{**base, **parse_overrides(args.a)})
    cfg_b = SearchConfig(**{**base, **parse_overrides(args.b)})
    mcts_a = MCTS(env, eval_a, cfg_a)
    mcts_b = MCTS(env, eval_b, cfg_b)

    B = args.games
    half = B // 2
    n = args.boardsize

    def make_move(mcts):
        def fn(states, rng):
            ctx = {
                "ladders": L.ladder_planes_batch(
                    states.stones, states.size, states.ko
                )
            }
            superko = jax.vmap(env.superko_action_mask)(states)
            tree = mcts.init_tree(states, rng, prior_mask=~superko, ctx=ctx)
            tree = mcts.run(tree, args.playouts, ctx=ctx)
            return mcts.best_move(tree)

        return jax.jit(fn)

    move_a = make_move(mcts_a)
    move_b = make_move(mcts_b)
    step = jax.jit(jax.vmap(env.step))

    states = env.new_batch(B, komi=args.komi)
    # A is black in lanes [0, half), white in [half, B)
    a_is_black = jnp.arange(B) < half
    rng = jax.random.PRNGKey(args.seed)

    max_moves = int(1.8 * n * n)
    for mv in range(max_moves):
        rng, ka, kb = jax.random.split(rng, 3)
        ma = move_a(states, ka)
        mb = move_b(states, kb)
        a_to_act = jnp.where(
            states.to_move == 0, a_is_black, ~a_is_black
        )
        move = jnp.where(a_to_act, ma, mb)
        states = step(states, move)
        if bool(states.terminated.all()):
            break

    score_b = np.asarray(jax.jit(jax.vmap(env.final_score))(states))
    a_black = np.asarray(a_is_black)
    a_margin = np.where(a_black, score_b, -score_b)
    wins = int((a_margin > 1e-4).sum())
    losses = int((a_margin < -1e-4).sum())
    draws = B - wins - losses
    decided = max(wins + losses, 1)
    wr = wins / decided
    se = math.sqrt(wr * (1 - wr) / decided)
    print(
        json.dumps(
            {
                "a": args.label_a,
                "b": args.label_b,
                "overrides_a": {**parse_overrides(args.a), **ev_a},
                "overrides_b": {**parse_overrides(args.b), **ev_b},
                **(
                    {
                        "weights_a": Path(args.weights).name,
                        "weights_b": Path(args.weights_b).name,
                    }
                    if args.weights_b
                    else {}
                ),
                "games": B,
                "moves_played": mv + 1,
                "a_wins": wins,
                "a_losses": losses,
                "draws": draws,
                "a_winrate": round(wr, 4),
                "ci95": [
                    round(max(0.0, wr - 1.96 * se), 4),
                    round(min(1.0, wr + 1.96 * se), 4),
                ],
                "elo_delta": round(
                    -400 * math.log10(1 / max(wr, 1e-6) - 1)
                    if 0 < wr < 1
                    else float("inf") * (1 if wr >= 1 else -1),
                    1,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
