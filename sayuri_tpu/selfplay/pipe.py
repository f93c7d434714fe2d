"""Self-play pipe: game generation + data writing + weights refresh.

Re-design of the reference SelfPlayPipe (/root/reference/src/selfplay/
pipe.cc): N parallel worker threads + a writer thread become one batched
actor emitting whole game batches; the filesystem contract is preserved —
gzip chunks to tdata/<run_id>/ and vdata/<run_id>/ (90/10 split,
pipe.cc:143-151,184), SGFs to sgf/, query counts to net_queries/, and the
"halt and reload when new weights appear" protocol against weights_dir
(Engine::ShouldHalt, engine.cc:63-90)."""

from __future__ import annotations

import os
import time
from pathlib import Path

import jax
import numpy as np

from sayuri_tpu.game import sgf as SGF
from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.mcts.core import MCTS, SearchConfig
from sayuri_tpu.models.evaluator import make_dummy_eval_fn, make_eval_fn
from sayuri_tpu.models.network import SayuriNet
from sayuri_tpu.selfplay import data as D
from sayuri_tpu.selfplay.actor import (
    SelfplayActor,
    SelfplayConfig,
    assemble_targets,
)


def newest_weights(weights_dir) -> str | None:
    """Newest weight file in the dir (Engine picks by mtime,
    engine.cc:63-86)."""
    if not weights_dir or not Path(weights_dir).is_dir():
        return None
    files = [
        p
        for p in Path(weights_dir).iterdir()
        if p.suffix in (".txt", ".ckpt") or p.name.endswith(".bin.txt")
    ]
    if not files:
        return None
    return str(max(files, key=os.path.getmtime))


class SelfPlayPipe:
    def __init__(
        self,
        out_dir: str,
        boardsize: int = 9,
        komi: float = 7.5,
        parallel_games: int = 32,
        search_cfg: SearchConfig | None = None,
        sp_cfg: SelfplayConfig | None = None,
        weights_dir: str | None = None,
        queries: list[str] | None = None,
        seed: int = 0,
        mesh=None,
    ):
        from sayuri_tpu.selfplay.randomize import parse_queries

        self.out_dir = Path(out_dir)
        self.sp_cfg = sp_cfg or SelfplayConfig()
        self.dist = parse_queries(
            queries,
            default_size=boardsize,
            default_komi=komi,
            komi_stddev=self.sp_cfg.komi_stddev,
            komi_big_stddev=self.sp_cfg.komi_big_stddev,
            komi_big_stddev_prob=self.sp_cfg.komi_big_stddev_prob,
            random_moves_factor=max(
                self.sp_cfg.random_moves_factor, 0.0
            ),
            random_opening_prob=(
                self.sp_cfg.random_opening_prob
                if self.sp_cfg.random_opening_prob >= 0
                else (
                    0.0 if self.sp_cfg.random_moves_factor <= 0 else 0.75
                )
            ),
            random_opening_temp=self.sp_cfg.random_opening_temp,
        )
        # the board buffer covers the largest queried size (Engine adjusts
        # the NN size to max_bsize, engine.cc:180-183)
        self.env = GoEnv(n=max(boardsize, self.dist.max_boardsize))
        self.komi = komi
        self.parallel_games = parallel_games
        self.weights_dir = weights_dir
        self.search_cfg = search_cfg or SearchConfig(
            max_nodes=176, gumbel=True
        )
        self.mesh = mesh
        # per-process rng + run id: lanes on different hosts must play
        # different games (engine.cc seeds per worker thread)
        pid = jax.process_index()
        self.rng = jax.random.PRNGKey(seed * 7919 + pid)
        self.run_id = f"{int(time.time()):x}{seed:02x}" + (
            f"p{pid}" if jax.process_count() > 1 else ""
        )
        self.current_weights = None
        self.games_done = 0
        self.total_queries = 0
        self._build_actor()

        for sub in ("sgf", "net_queries"):
            (self.out_dir / sub).mkdir(parents=True, exist_ok=True)

    def _build_actor(self):
        path = newest_weights(self.weights_dir)
        if path:
            from sayuri_tpu.models import weights_io

            net_cfg, variables = weights_io.load_checkpoint_for_inference(path)
            # multi-host: host 0's weights are authoritative — broadcast
            # over the fabric so a mid-write or stale file on a worker
            # host can't skew lanes (engine.cc:63-90 re-read, TPU-native)
            from sayuri_tpu.parallel import distributed as DI

            variables = DI.broadcast_from_host0(variables)
            net = SayuriNet(
                type(net_cfg)(**{**net_cfg.__dict__, "boardsize": self.env.n})
            )
            # random-symmetry leaf ensembling, like all reference search
            # queries (Network::kRandom, node.cc:146)
            eval_fn = make_eval_fn(self.env, net, variables,
                                   symmetry="random")
            self.current_weights = path
        else:
            eval_fn = make_dummy_eval_fn(self.env)
            self.current_weights = None
        mcts = MCTS(self.env, eval_fn, self.search_cfg)
        sp = self.sp_cfg
        if self.current_weights is None:
            # dummy net: playouts / 10 (search.cc:996-1001)
            sp = type(sp)(
                **{
                    **sp.__dict__,
                    "playouts": max(1, sp.playouts // 10),
                    "fastsearch_playouts": max(
                        1, sp.fastsearch_playouts // 10
                    ),
                }
            )
        self.actor = SelfplayActor(self.env, mcts, sp, mesh=self.mesh)

        # game randomizer shares the actor's evaluator; fair komi probes
        # with a quick no-exploring search (engine.cc:313-323)
        from sayuri_tpu.selfplay.randomize import GameRandomizer

        def fair_komi_search(states):
            import jax.numpy as jnp

            rng = jax.random.PRNGKey(0)
            tree = mcts.init_tree(states, rng)
            tree = mcts.run(
                tree, max(8, self.sp_cfg.fastsearch_playouts or 8)
            )
            v = jnp.maximum(tree.visits[:, 0], 1)
            score_b = tree.acc_score[:, 0] / v
            stm = states.to_move
            return jnp.where(stm == 0, score_b, -score_b)

        self.randomizer = GameRandomizer(
            self.env, self.dist, mcts.eval_fn,
            fair_komi_search=jax.jit(fair_komi_search),
        )

    def should_reload(self) -> bool:
        """New weights appeared (pipe.cc:246-258)."""
        return newest_weights(self.weights_dir) != self.current_weights

    def play_round(self):
        """One batch of games: play, serialize, write chunks + SGFs."""
        self.rng, sub, sub2 = jax.random.split(self.rng, 3)
        states = self.randomizer.prepare(self.parallel_games, sub2)
        final, records = self.actor.play_games(states, sub)
        # territory-rule lanes: label dead stones by area-rule playout
        # before scoring (UpdateTerritoryHelper, search.cc:1139-1162)
        self.rng, sub3 = jax.random.split(self.rng)
        helper = self.actor.territory_playout(final, sub3)
        targets = assemble_targets(
            self.env, final, records, territory_helper=helper
        )
        if jax.process_count() > 1:
            # every host serializes only the lanes it owns; targets built
            # eagerly from global arrays may come back replicated, so
            # slice by deterministic lane range ([B] leaves batch on axis
            # 0, [T, B, ...] leaves on axis 1)
            from sayuri_tpu.parallel import distributed as DI

            # parallel_games is per-host lanes; the global batch spans all
            # processes (make_global_batch stacks host contributions)
            gb = self.parallel_games * jax.process_count()
            records = jax.tree.map(
                lambda x: DI.local_batch(x, 0, gb), records
            )
            targets = {
                k: DI.local_batch(v, 0 if v.ndim == 1 else 1, gb)
                for k, v in targets.items()
            }
        games = D.games_to_text(self.env, records, targets)
        n = D.write_chunks(
            games, str(self.out_dir), self.run_id, seed=self.games_done
        )
        self._write_sgfs(records, targets)
        self._write_queries(records)
        self.games_done += self.parallel_games
        return n

    def _write_sgfs(self, records, targets):
        end = np.asarray(targets["end"])
        winner = np.asarray(targets["winner"])
        sgf_dir = self.out_dir / "sgf"
        sizes = np.asarray(records[0].states.size)
        komis = np.asarray(records[0].states.komi)
        n = self.env.n
        fast_p = self.actor.cfg.fastsearch_playouts
        full_p = self.actor.cfg.playouts
        if not (0 < fast_p < full_p):
            fast_p = full_p
        for i in range(self.parallel_games):
            size = int(sizes[i])
            moves = []
            for t in range(int(end[i])):
                rec = records[t]
                color = int(np.asarray(rec.states.to_move)[i])
                mv = int(np.asarray(rec.move)[i])
                if mv >= self.env.pass_action:
                    v = None
                else:
                    # buffer-flat index -> board-flat index for this size
                    y, x = divmod(mv, n)
                    v = y * size + x if (y < size and x < size) else None
                # per-move search-stat comment, black's viewpoint
                # (search.cc:1046-1062: "playouts, visits, eval, score,
                # kld, T|F" with F = fast-search position, discarded)
                discard = bool(np.asarray(rec.discard)[i])
                ev = float(np.asarray(rec.q_value)[i])
                sc = float(np.asarray(rec.score_lead)[i])
                if color == 1:  # white to move: flip stm -> black view
                    ev, sc = 1.0 - ev, -sc
                comment = "%d, %d, %.2f, %.2f, %.2f, %c" % (
                    fast_p if discard else full_p,
                    int(np.asarray(rec.visits)[i]),
                    ev, sc,
                    float(np.asarray(rec.kld)[i]),
                    "F" if discard else "T",
                )
                moves.append((color, v, comment))
            result = {1: "B+R", -1: "W+R", 0: "0"}[int(winner[i])]
            text = SGF.game_to_sgf(
                size, float(komis[i]), moves, result=result
            )
            idx = self.games_done + i
            (sgf_dir / f"{self.run_id}_{idx:06d}.sgf").write_text(text)

    def _write_queries(self, records):
        """Accumulate NN query counts for compute accounting
        (pipe.cc:161-175, check_accum_queries.py).

        With the NN cache on, the count is COUNTED like the reference's
        num_queries_ — incremented per actual net forward, after the cache
        probe (network.cc:178) — via the device counters in
        mcts/nncache.py. Fallback (cache off): the round-1 estimate."""
        stats = getattr(self.actor, "last_query_stats", None)
        if stats is not None and stats["queries"] > 0:
            total = (
                stats["queries"] - stats["hits"] - stats.get("dups", 0)
            )
        else:
            # one eval per playout per active lane + one root eval per move
            total = 0
            for rec in records:
                active = int(np.asarray(rec.active).sum())
                total += active * (self.actor.cfg.playouts + 1)
        self.total_queries += total
        path = self.out_dir / "net_queries" / f"{self.run_id}.txt"
        path.write_text(f"{self.games_done} {self.total_queries}\n")

    def loop(self, max_games: int):
        """Generate until max_games, reloading weights between rounds
        (SelfPlayPipe::Loop, pipe.cc:298)."""
        while self.games_done < max_games:
            if self.should_reload():
                self._build_actor()
            self.play_round()
        return self.games_done
