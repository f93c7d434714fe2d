"""Opening book: position-hash -> move-frequency map built from SGFs.

Re-implements the reference's Book (/root/reference/src/game/book.cc,
book.h): built from a directory of SGF games — 19x19 only, first 30 moves,
kept when seen at least 5 times (book.h:43-45) — and probed before search
(search.cc:295-300; a hit returns the book move immediately).

Storage is a plain JSON file {hash_hex: {move: count}}; probing picks the
most frequent legal move.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import jax
import numpy as np

BOOK_BOARD_SIZE = 19   # book.h:43
MAX_BOOK_MOVES = 30    # book.h:44
MIN_FREQUENCY = 5      # book.h:45


def _hash_key(state) -> str:
    h = np.asarray(state.hash)
    return f"{int(h[0]):08x}{int(h[1]):08x}-{int(state.to_move)}"


class Book:
    def __init__(self, table: dict | None = None):
        self.table = table or {}

    # -- generation (GenerateBook, book.cc) --

    @classmethod
    def generate(cls, sgf_paths, verbose=False):
        from sayuri_tpu.game import sgf as SGF
        from sayuri_tpu.game.state import GoEnv

        env = GoEnv(n=BOOK_BOARD_SIZE)
        step = jax.jit(env.step)
        counts: dict[str, dict[int, int]] = defaultdict(
            lambda: defaultdict(int)
        )
        n_games = 0
        for path in sgf_paths:
            try:
                games = SGF.parse_file(str(path))
            except OSError:
                continue
            for game in games:
                if game.board_size() != BOOK_BOARD_SIZE:
                    continue
                if game.handicap_stones():
                    continue
                state = env.new_state(komi=game.komi())
                for i, (color, vertex) in enumerate(game.moves()):
                    if i >= MAX_BOOK_MOVES or vertex is None:
                        break
                    if int(state.to_move) != color:
                        break
                    counts[_hash_key(state)][int(vertex)] += 1
                    state = step(state, vertex)
                n_games += 1
        table = {}
        for key, moves in counts.items():
            kept = {
                str(mv): c for mv, c in moves.items() if c >= MIN_FREQUENCY
            }
            if kept:
                table[key] = kept
        if verbose:
            print(f"book: {n_games} games -> {len(table)} positions")
        return cls(table)

    # -- persistence --

    def save(self, path):
        Path(path).write_text(json.dumps(self.table))

    @classmethod
    def load(cls, path):
        return cls(json.loads(Path(path).read_text()))

    # -- probing (Book::Probe, search.cc:295-300) --

    def probe(self, state, legal_mask=None) -> int | None:
        """Most frequent legal book move for `state`, or None."""
        if int(state.size) != BOOK_BOARD_SIZE:
            return None
        moves = self.table.get(_hash_key(state))
        if not moves:
            return None
        order = sorted(moves.items(), key=lambda kv: -kv[1])
        for mv, _cnt in order:
            mv = int(mv)
            if legal_mask is None or bool(legal_mask[mv]):
                return mv
        return None

    def __len__(self):
        return len(self.table)
