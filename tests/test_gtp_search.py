"""GTP search-control + analyze-option tests (split from test_gtp.py
so pytest-xdist loadfile scheduling balances the two compile-heavy
halves across workers)."""
import io

import numpy as np
import pytest

from sayuri_tpu.gtp.loop import GtpLoop
from sayuri_tpu.game import sgf as SGF


@pytest.fixture(scope="module")
def loop():
    return GtpLoop(boardsize=5, komi=4.5, playouts=12, max_nodes=24)



class TestSearchControl:
    """Time management, tree reuse, KLD stop, ponder, analyze options
    (search.cc:353-386, 1071-1091, 1345-1414, 1524-1549)."""

    @pytest.fixture(scope="class")
    def agent(self):
        from sayuri_tpu.gtp.engine import Agent

        return Agent(boardsize=5, komi=5.5, playouts=24, max_nodes=96,
                     chunk=8)

    @pytest.mark.slow
    def test_tree_reuse_across_genmoves(self, agent):
        agent.clear_board()
        agent.genmove(0)
        # opponent-side think: the tree advances through our played move
        # (delta=1); the best child was expanded, so the subtree carries
        tree, stats = agent.think(playouts=8)
        assert stats["reused"]
        # visits carried over from the previous search's subtree
        assert stats["visits"] > 9

    def test_time_budget_stops_search(self, agent):
        agent.clear_board()
        tree, stats = agent.think(playouts=10**6, time_budget=0.3)
        assert stats["stopped_by"] in ("time", "tree_full")
        # behavioral check, not wall clock (CI boxes stall arbitrarily
        # under load/compiles): the budget must have cut the playout
        # count far below the requested cap
        assert stats["playouts"] < 10**5

    def test_kldgain_stop(self, agent):
        agent.clear_board()
        agent.kldgain_per_node = 10.0  # absurdly high -> stop asap
        agent.kldgain_interval = 4
        tree, stats = agent.think(playouts=80)
        agent.kldgain_per_node = 0.0
        assert stats["stopped_by"] == "kldgain"
        assert stats["playouts"] < 80

    def test_ponder_grows_tree_for_reuse(self, agent):
        agent.clear_board()
        agent.genmove(0)
        agent.ponder_enabled = True
        stats = agent.ponder(stop_check=lambda: False, max_playouts=16)
        assert stats["playouts"] > 0
        # opponent answers with the move we pondered on -> tree advances
        agent.play(1, int(np.asarray(agent.mcts.best_move(agent._tree))[0]))
        _, stats = agent.think(playouts=8)
        assert stats["reused"]
        agent.ponder_enabled = False

    def test_undo_drops_tree(self, agent):
        agent.clear_board()
        agent.genmove(0)
        agent.undo()
        assert agent._tree is None


class TestAnalyzeOptions:
    def test_avoid_restricts_root(self):
        loop = GtpLoop(boardsize=5, komi=5.5, playouts=16, max_nodes=32)
        from sayuri_tpu.gtp.loop import StreamBody

        # avoid everything except A1/B1 for black
        ok, body = loop.execute(
            "lz-analyze b 10 allow b A1,B1 50"
        )
        assert ok and isinstance(body, StreamBody)
        text = body.collect()
        for line in text.split("info "):
            if line.startswith("move "):
                mv = line.split()[1]
                assert mv in ("A1", "B1")

    def test_streaming_emits_play_line(self):
        loop = GtpLoop(boardsize=5, komi=5.5, playouts=12, max_nodes=24)
        import io as _io

        out = _io.StringIO()
        loop.run(
            _io.StringIO("lz-genmove_analyze b 5\nquit\n"), out
        )
        text = out.getvalue()
        assert "play " in text

    def test_setoption_extended(self):
        loop = GtpLoop(boardsize=5, komi=5.5, playouts=12, max_nodes=24)
        assert loop.execute(
            "sayuri-setoption name pondering value true"
        )[0]
        assert loop.agent.ponder_enabled
        assert loop.execute(
            "sayuri-setoption name reuse tree value false"
        )[0]
        assert not loop.agent.reuse_tree
        assert loop.execute(
            "sayuri-setoption name scoring rule value territory"
        )[0]
        ok, _ = loop.execute("sayuri-setoption name bogus value 1")
        assert not ok


class TestGoguiRatings:
    """The gogui rating/influence/debug command family
    (gtp.cc:744-1040)."""

    @pytest.fixture(scope="class")
    def lp(self):
        from sayuri_tpu.gtp.loop import GtpLoop

        return GtpLoop(boardsize=5, komi=4.5, playouts=8, max_nodes=16)

    def test_aliases_and_debug(self, lp):
        lp.execute("clear_board")
        lp.execute("play b C3")
        ok, body = lp.execute("help")
        assert ok and "genmove" in body
        assert lp.execute("debug_search 8") == (True, "done")
        ok, body = lp.execute("debug_moves C4 pass")
        assert ok and "move C4 prior" in body and "move pass" in body
        ok, _ = lp.execute("debug_search -3")
        assert not ok

    def test_rating_family(self, lp):
        ok, body = lp.execute("gogui-wdl_rating")
        assert ok and (body == "" or body.startswith("LABEL "))
        ok, body = lp.execute("gogui-policy_rating normal")
        assert ok and "TEXT pass" in body
        ok, _ = lp.execute("gogui-policy_rating bogus")
        assert not ok
        ok, body = lp.execute("gogui-ownership_influence 0")
        assert ok and body.startswith("INFLUENCE ")
        ok, body = lp.execute("gogui-ladder_map")
        assert ok and body.startswith("COLOR #")
        ok, body = lp.execute("gogui-rank_selection")
        assert ok and "LABEL" in body
        ok, body = lp.execute("gogui-book_rating")
        assert ok  # empty without a loaded book
        ok, body = lp.execute("gogui-analyze_commands")
        assert ok and "gogui-wdl_rating" in body
