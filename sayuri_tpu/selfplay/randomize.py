"""Self-play game randomization: board/komi/rule sampling, handicaps,
random openings, fair/unfair komi.

Vectorized re-design of the reference's game preparation
(/root/reference/src/selfplay/engine.cc:92-341):

- `bkp:<size>:<komi>:<prob>` queries pick each game's board size + komi
- `bhp:<size>:<handicaps>:<prob>` add free-handicap games
- `srs:area[:territory]` sets the scoring-rule pool
- random openings play policy-sampled moves with an exp-decaying
  temperature floor 0.8 (engine.cc:271-295)
- handicap stones are policy-sampled at temp 0.8 without alternating
  (engine.cc:253-269)
- fair komi from a quick no-exploring search's score lead; unfair komi
  jitter ~ N(0, sigma) with a big-sigma tail; all komi quantized to the
  nearest half point (AdjustKomi, utils/komi.cc:14-44)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sayuri_tpu.game.state import GoEnv, GoState
from sayuri_tpu.game.types import AREA_RULE, TERRITORY_RULE


@dataclasses.dataclass(frozen=True)
class GameDistribution:
    board_queries: tuple = ((19, 7.5, 1.0),)   # (size, komi, prob)
    handicap_queries: tuple = ()               # (size, max_handicap, prob)
    scoring_set: tuple = (AREA_RULE,)
    random_opening_prob: float = 0.0
    random_opening_temp: float = 1.2
    random_moves_factor: float = 0.08
    komi_stddev: float = 0.0
    komi_big_stddev: float = 0.0
    komi_big_stddev_prob: float = 0.0
    handicap_fair_komi_prob: float = 0.0

    @property
    def max_boardsize(self) -> int:
        return max(q[0] for q in self.board_queries)


def parse_queries(queries, default_size=19, default_komi=7.5, **kwargs):
    """Parse `selfplay_query` strings (Engine::ParseQueries,
    engine.cc:92-183)."""
    board, handicap, scoring = [], [], []
    for q in queries or []:
        parts = q.replace(":", " ").split()
        if not parts:
            continue
        if parts[0] == "bkp" and len(parts) == 4:
            board.append((int(parts[1]), float(parts[2]), float(parts[3])))
        elif parts[0] == "bhp" and len(parts) == 4:
            if int(parts[2]) >= 2:
                handicap.append(
                    (int(parts[1]), int(parts[2]), float(parts[3]))
                )
        elif parts[0] == "srs":
            for tok in parts[1:]:
                scoring.append(
                    TERRITORY_RULE if tok == "territory" else AREA_RULE
                )
    if not board:
        board = [(default_size, default_komi, 1.0)]
    total = sum(p for _, _, p in board)
    board = [(s, k, p / total) for s, k, p in board]
    if not scoring:
        scoring = [AREA_RULE]
    if TERRITORY_RULE in scoring and AREA_RULE not in scoring:
        scoring.append(AREA_RULE)
    scoring = sorted(set(scoring))
    return GameDistribution(
        board_queries=tuple(board),
        handicap_queries=tuple(handicap),
        scoring_set=tuple(scoring),
        **kwargs,
    )


def adjust_komi(komi):
    """Quantize komi to the nearest half point (AdjustKomi,
    utils/komi.cc:14-44)."""
    sign = jnp.sign(komi)
    a = jnp.abs(komi)
    ip = jnp.floor(a)
    fp = a - ip
    fp = jnp.where(fp < 0.25, 0.0, jnp.where(fp < 0.75, 0.5, 1.0))
    return sign * (ip + fp)


class GameRandomizer:
    """Prepares a batch of randomized starting positions
    (Engine::PrepareGame, engine.cc:197-232)."""

    def __init__(self, env: GoEnv, dist: GameDistribution, eval_fn,
                 fair_komi_search=None):
        self.env = env
        self.dist = dist
        self.eval_fn = eval_fn
        # optional callable(states) -> stm score lead for fair komi
        self.fair_komi_search = fair_komi_search
        self._policy_step = jax.jit(self._policy_step_impl)

    # -- policy-sampled move (Network::GetVertexWithPolicy) --

    def _policy_step_impl(self, states, rng, temp, play_color):
        """Sample a non-pass move ~ policy^(1/temp) and play it.
        `play_color`: -1 = side to move, else forces color (handicap
        AppendMove). Pass is always excluded, matching both reference call
        sites (GetVertexWithPolicy(..., false))."""
        evals = self.eval_fn(states, None)
        logits = jnp.log(jnp.maximum(evals.priors, 1e-25)) / temp
        logits = logits.at[:, -1].set(-jnp.inf)
        rngs = jax.random.split(rng, states.stones.shape[0])
        moves = jax.vmap(
            lambda k, l: jax.random.categorical(k, l)
        )(rngs, logits).astype(jnp.int32)
        states = jax.lax.cond(
            play_color >= 0,
            lambda s: s.replace(
                to_move=jnp.full_like(s.to_move, play_color)
            ),
            lambda s: s,
            states,
        )
        return jax.vmap(self.env.step)(states, moves)

    # -- batch preparation --

    def prepare(self, batch: int, rng) -> GoState:
        dist = self.dist
        n = self.env.n
        rng_np = np.random.default_rng(
            np.asarray(jax.random.key_data(rng))[0].item()
        )

        # per-lane board size / komi / rule (host-side sampling; these are
        # per-game scalars)
        probs = np.asarray([q[2] for q in dist.board_queries])
        picks = rng_np.choice(len(dist.board_queries), size=batch, p=probs)
        sizes = np.asarray([dist.board_queries[i][0] for i in picks])
        komis = np.asarray([dist.board_queries[i][1] for i in picks])
        rules = rng_np.choice(np.asarray(dist.scoring_set), size=batch)

        states = self.env.new_batch(batch)
        states = states.replace(
            size=jnp.asarray(sizes, jnp.int32),
            komi=jnp.asarray(komis, jnp.float32),
            rule=jnp.asarray(rules, jnp.int32),
        )

        # handicaps (engine.cc:253-269, 325-341)
        handicaps = np.zeros(batch, np.int64)
        for size, max_h, prob in dist.handicap_queries:
            match = sizes == size
            roll = rng_np.random(batch) < prob
            h = rng_np.integers(2, max(max_h, 2) + 1, size=batch)
            handicaps = np.where(match & roll, h, handicaps)
        max_h = int(handicaps.max()) if batch else 0
        if max_h > 0:
            for i in range(max_h - 1):
                rng, sub = jax.random.split(rng)
                stepped = self._policy_step(
                    states, sub, jnp.float32(0.8), jnp.int32(0)
                )
                need = jnp.asarray(handicaps - 1 > i)
                states = jax.tree.map(
                    lambda new, old: jnp.where(
                        _bshape(need, new), new, old
                    ),
                    stepped,
                    states,
                )
            states = states.replace(
                handicap=jnp.asarray(handicaps, jnp.int32),
                to_move=jnp.zeros_like(states.to_move),
            )

        # random openings (engine.cc:271-295)
        do_open = rng_np.random(batch) < dist.random_opening_prob
        cnt = (
            dist.random_moves_factor * sizes.astype(np.float64) ** 2
            + rng_np.normal(0.0, sizes / 4.0)
        ).astype(np.int64)
        open_moves = np.where(do_open, np.maximum(cnt, 0), 0)
        lam = 0.69314718056 / sizes
        max_open = int(open_moves.max()) if batch else 0
        for i in range(max_open):
            rng, sub = jax.random.split(rng)
            temp = np.maximum(
                dist.random_opening_temp * np.exp(-lam * i), 0.8
            )
            # single shared temp per step (use mean; per-lane temps differ
            # only across board sizes)
            stepped = self._policy_step(
                states, sub, jnp.float32(float(temp.mean())),
                jnp.int32(-1),
            )
            need = jnp.asarray(open_moves > i)
            states = jax.tree.map(
                lambda new, old: jnp.where(_bshape(need, new), new, old),
                stepped,
                states,
            )

        # fair komi for handicap/opening lanes (engine.cc:313-323)
        need_fair = (handicaps > 0) | (open_moves > 0)
        if need_fair.any() and self.fair_komi_search is not None:
            lead_stm = np.asarray(self.fair_komi_search(states))
            to_move = np.asarray(states.to_move)
            lead_black = np.where(to_move == 0, lead_stm, -lead_stm)
            new_komi = adjust_komi(
                jnp.asarray(
                    np.where(
                        need_fair, komis + lead_black, komis
                    ),
                    jnp.float32,
                )
            )
            states = states.replace(komi=new_komi)
            komis = np.asarray(new_komi)

        # unfair komi jitter (engine.cc:297-311); handicap games keep fair
        # komi with prob handicap_fair_komi_prob
        stddev = np.where(
            rng_np.random(batch) < dist.komi_big_stddev_prob,
            dist.komi_big_stddev,
            dist.komi_stddev,
        )
        bonus = rng_np.normal(0.0, np.maximum(stddev, 1e-9))
        bonus = np.where(stddev > 0, bonus, 0.0)
        keep_fair = (handicaps > 0) & (
            rng_np.random(batch) < dist.handicap_fair_komi_prob
        )
        new_komi = np.where(keep_fair, komis, komis + bonus)
        states = states.replace(
            komi=adjust_komi(jnp.asarray(new_komi, jnp.float32))
        )
        return states


def _bshape(flag, like):
    return jnp.reshape(flag, flag.shape + (1,) * (like.ndim - flag.ndim))
