"""GTP agent: one game + network + search, host-driven.

The reference's GtpLoop::Agent bundles {GameState, Network, Search}
(/root/reference/src/game/gtp.h:21-72); here the bundle is a single-game
wrapper over the batched jitted engine (batch dim 1). Undo is a host-side
state stack (the reference keeps full board history in GameState,
game_state.h:201).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sayuri_tpu.game.state import GoEnv, GoState
from sayuri_tpu.game.types import AREA_RULE, TERRITORY_RULE
from sayuri_tpu.mcts.core import MCTS, SearchConfig
from sayuri_tpu.mcts import gumbel as G
from sayuri_tpu.models.evaluator import make_dummy_eval_fn, make_eval_fn
from sayuri_tpu.models.network import NetConfig, SayuriNet

COLS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"  # GTP columns skip 'I'


def vertex_to_gtp(v, size):
    if v is None:
        return "pass"
    if v >= size * size or v < 0:
        return "pass"
    y, x = divmod(int(v), size)
    return f"{COLS[x]}{y + 1}"


def gtp_to_vertex(s, size):
    s = s.strip().lower()
    if s in ("pass", "p"):
        return size * size
    if s == "resign":
        return "resign"
    col = COLS.lower().index(s[0])
    row = int(s[1:]) - 1
    if not (0 <= col < size and 0 <= row < size):
        raise ValueError(f"vertex {s} out of board")
    return row * size + col


class Agent:
    """Single-game engine instance."""

    def __init__(
        self,
        boardsize: int = 19,
        komi: float = 7.5,
        playouts: int = 400,
        net_cfg: NetConfig | None = None,
        variables=None,
        search_cfg: SearchConfig | None = None,
        max_nodes: int | None = None,
        seed: int = 0,
    ):
        self.n_buffer = boardsize
        self.playouts = playouts
        self.seed = seed
        self.net_cfg = net_cfg
        self.variables = variables
        self.search_cfg = search_cfg or SearchConfig(
            max_nodes=max_nodes or (playouts + 16)
        )
        self._rng = jax.random.PRNGKey(seed)
        self.book = None  # optional opening book (game/book.py)
        self._build(boardsize, komi)

    # -- construction / reconstruction (Network::Reconstruct path,
    # network.h:37) --

    def _build(self, size: int, komi: float, rule: int = AREA_RULE):
        self.env = GoEnv(n=size)
        self.size = size
        self.komi = komi
        self.rule = rule
        if self.variables is not None and self.net_cfg is not None:
            net = SayuriNet(self.net_cfg)
            self.eval_fn = make_eval_fn(self.env, net, self.variables)
            self.has_net = True
        else:
            self.eval_fn = make_dummy_eval_fn(self.env)
            self.has_net = False
        self.mcts = MCTS(self.env, self.eval_fn, self.search_cfg)
        self.state = self._single(self.env.new_state(komi=komi, rule=rule))
        self.history: list[GoState] = []
        self.moves: list[tuple[int, int]] = []  # (color, vertex)
        self._jit_cache = {}

    @staticmethod
    def _single(state):
        return jax.tree.map(lambda x: x[None], state)

    # -- game commands --

    def clear_board(self):
        self.state = self._single(
            self.env.new_state(komi=self.komi, rule=self.rule)
        )
        self.history = []
        self.moves = []

    def set_boardsize(self, size: int):
        self._build(size, self.komi, self.rule)

    def set_komi(self, komi: float):
        self.komi = komi
        self.state = self.state.replace(
            komi=jnp.full_like(self.state.komi, komi)
        )

    def set_rule(self, rule: int):
        self.rule = rule
        self.state = self.state.replace(
            rule=jnp.full_like(self.state.rule, rule)
        )

    def to_move(self) -> int:
        return int(self.state.to_move[0])

    def play(self, color: int, vertex: int):
        """Play a move (forcing side-to-move like GTP play does)."""
        if int(self.state.to_move[0]) != color:
            self.state = self.state.replace(
                to_move=jnp.full_like(self.state.to_move, color)
            )
        self.history.append(self.state)
        step = self._get_jit("step", lambda: jax.jit(jax.vmap(self.env.step)))
        self.state = step(self.state, jnp.asarray([vertex], jnp.int32))
        self.moves.append((color, vertex))

    def undo(self):
        if self.history:
            self.state = self.history.pop()
            self.moves.pop()

    def is_legal(self, color: int, vertex: int) -> bool:
        st = self.state.replace(
            to_move=jnp.full_like(self.state.to_move, color)
        )
        mask = self._get_jit(
            "legal", lambda: jax.jit(jax.vmap(self.env.legal_action_mask))
        )(st)
        return bool(np.asarray(mask)[0, vertex])

    def stones(self) -> np.ndarray:
        return np.asarray(self.state.stones[0])

    # -- search --

    def _get_jit(self, name, builder):
        if name not in self._jit_cache:
            self._jit_cache[name] = builder()
        return self._jit_cache[name]

    def _search_fn(self, playouts):
        key = ("search", playouts)
        if key not in self._jit_cache:
            mcts = self.mcts
            env = self.env

            @jax.jit
            def run(states, rng, prior_mask):
                from sayuri_tpu.game import ladder as L

                ctx = {
                    "ladders": jax.vmap(
                        lambda s: L.ladder_planes(s.stones, s.size, s.ko)
                    )(states)
                }
                tree = mcts.init_tree(
                    states, rng, prior_mask=prior_mask, ctx=ctx
                )
                tree = mcts.run(tree, playouts, ctx=ctx)
                return tree

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def think(self, playouts=None):
        """Run a search from the current position; returns (tree, stats)."""
        playouts = playouts or self.playouts
        playouts = min(playouts, self.search_cfg.max_nodes - 8)
        self._rng, sub = jax.random.split(self._rng)
        superko = self._get_jit(
            "superko", lambda: jax.jit(jax.vmap(self.env.superko_action_mask))
        )(self.state)
        t0 = time.monotonic()
        tree = self._search_fn(playouts)(self.state, sub, ~superko)
        jax.block_until_ready(tree.visits)
        elapsed = time.monotonic() - t0
        return tree, {"playouts": playouts, "time": elapsed}

    def genmove(self, color: int, playouts=None, resign_threshold=0.1):
        """Search and play the best move (ThinkBestMove, search.cc:864).
        An opening-book hit short-circuits the search (search.cc:295-300)."""
        if int(self.state.to_move[0]) != color:
            self.state = self.state.replace(
                to_move=jnp.full_like(self.state.to_move, color)
            )
        book = getattr(self, "book", None)
        if book is not None:
            single = jax.tree.map(lambda x: x[0], self.state)
            legal = np.asarray(
                self._get_jit(
                    "legal",
                    lambda: jax.jit(jax.vmap(self.env.legal_action_mask)),
                )(self.state)
            )[0]
            mv = book.probe(single, legal)
            if mv is not None:
                self.play(color, mv)
                return mv, None
        tree, _ = self.think(playouts)
        best = int(np.asarray(self.mcts.best_move(tree))[0])
        root_v = np.asarray(tree.visits[:, 0])[0]
        wl_black = float(np.asarray(tree.acc_wl[:, 0])[0]) / max(root_v, 1)
        wl = wl_black if color == 0 else 1.0 - wl_black
        if wl < resign_threshold and self.moves:
            return "resign", tree
        self.play(color, best)
        return best, tree

    def analysis_data(self, tree, max_moves=10):
        """Per-move stats rows for analyze commands (node.cc:982-1088)."""
        visits = np.asarray(self.mcts.root_child_visits(tree))[0]
        color = self.state.to_move
        q = np.asarray(self.mcts.root_child_q(tree, color))[0]
        prior = np.asarray(tree.prior[0, 0])
        order = np.argsort(-visits)
        rows = []
        total = max(visits.sum(), 1)
        for a in order[:max_moves]:
            if visits[a] <= 0:
                continue
            rows.append(
                dict(
                    move=int(a),
                    visits=int(visits[a]),
                    winrate=float(q[a]),
                    prior=float(prior[a]),
                    lcb=float(q[a]),
                    order=len(rows),
                )
            )
        return rows

    def ownership(self) -> np.ndarray:
        own = self._get_jit(
            "ownership", lambda: jax.jit(jax.vmap(self.env.ownership))
        )(self.state)
        return np.asarray(own)[0]

    def final_score_str(self) -> str:
        score = float(
            np.asarray(
                self._get_jit(
                    "final_score",
                    lambda: jax.jit(jax.vmap(self.env.final_score)),
                )(self.state)
            )[0]
        )
        if abs(score) < 1e-4:
            return "0"
        if score > 0:
            return f"B+{abs(score):g}"
        return f"W+{abs(score):g}"

    def raw_nn(self):
        """Raw network heads at the current position (sayuri-raw_nn,
        gtp.cc:603-620)."""
        evals = self.eval_fn(self.state, None)
        return jax.tree.map(lambda x: np.asarray(x)[0], evals._asdict())

    def planes_str(self) -> str:
        """Encoder plane dump (sayuri-planes, encoder.cc:52-78 format)."""
        from sayuri_tpu.models.encoder import encode

        planes = np.asarray(
            jax.jit(jax.vmap(lambda s: encode(self.env, s)))(self.state)
        )[0]
        size = self.size
        out = ["encoder version: 2"]
        for p in range(planes.shape[-1]):
            out.append(f"plane: {p + 1}")
            for y in range(size):
                row = []
                for x in range(size):
                    v = planes[y, x, p]
                    row.append("     x" if abs(v) < 1e-4 else f"{v:6.2f}")
                out.append("".join(row))
        return "\n".join(out)
