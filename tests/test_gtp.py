"""GTP front-end tests (dummy network): protocol behavior, game flow,
SGF round-trip, analysis output shape."""

import io

import numpy as np
import pytest

from sayuri_tpu.gtp.loop import GtpLoop
from sayuri_tpu.game import sgf as SGF


@pytest.fixture(scope="module")
def loop():
    return GtpLoop(boardsize=5, komi=4.5, playouts=12, max_nodes=24)


class TestGtp:
    def test_admin_commands(self, loop):
        assert loop.execute("protocol_version") == (True, "2")
        ok, name = loop.execute("name")
        assert ok and name == "sayuri-tpu"
        ok, cmds = loop.execute("list_commands")
        assert "genmove" in cmds and "kata-analyze" in cmds
        assert loop.execute("known_command genmove") == (True, "true")
        assert loop.execute("known_command frobnicate") == (True, "false")
        ok, _ = loop.execute("bogus_command")
        assert not ok

    def test_play_and_board(self, loop):
        loop.execute("clear_board")
        ok, _ = loop.execute("play b C3")
        assert ok
        assert loop.execute("color C3") == (True, "black")
        ok, _ = loop.execute("play w C3")
        assert not ok  # occupied
        ok, body = loop.execute("showboard")
        assert ok and "X" in body
        loop.execute("undo")
        assert loop.execute("color C3") == (True, "empty")

    def test_genmove_legal(self, loop):
        loop.execute("clear_board")
        ok, mv = loop.execute("genmove b")
        assert ok
        assert mv != "resign"
        if mv != "pass":
            ok2, col = loop.execute(f"color {mv}")
            assert ok2 and col == "black"

    def test_komi_and_score(self, loop):
        loop.execute("clear_board")
        loop.execute("komi 0.5")
        loop.execute("play b C3")
        ok, score = loop.execute("final_score")
        assert ok and score.startswith("B+")
        loop.execute("komi 4.5")

    def test_sgf_roundtrip(self, loop, tmp_path):
        loop.execute("clear_board")
        loop.execute("play b C3")
        loop.execute("play w D3")
        path = str(tmp_path / "game.sgf")
        ok, _ = loop.execute(f"printsgf {path}")
        assert ok
        games = SGF.parse_file(path)
        assert len(games) == 1
        assert games[0].board_size() == 5
        moves = games[0].moves()
        assert len(moves) == 2
        # replay through loadsgf
        ok, _ = loop.execute(f"loadsgf {path}")
        assert ok
        assert loop.execute("color C3") == (True, "black")
        assert loop.execute("color D3") == (True, "white")

    def test_analysis(self, loop):
        loop.execute("clear_board")
        ok, body = loop.execute("lz-analyze b 10")
        from sayuri_tpu.gtp.loop import StreamBody

        assert isinstance(body, StreamBody)
        text = body.collect()
        assert ok and "info move" in text and "visits" in text

    def test_planes_and_raw_nn(self, loop):
        loop.execute("clear_board")
        ok, body = loop.execute("sayuri-planes")
        assert ok and body.count("plane:") == 43
        ok, body = loop.execute("sayuri-raw_nn")
        assert ok and "black wl" in body

    def test_time_settings(self, loop):
        assert loop.execute("time_settings 300 30 5")[0]
        assert loop.execute("time_left b 250 0")[0]
        assert loop.execute("kgs-time_settings byoyomi 300 30 5")[0]

    def test_fixed_handicap(self, loop):
        loop.execute("boardsize 9")
        loop.execute("clear_board")
        ok, verts = loop.execute("fixed_handicap 4")
        assert ok and len(verts.split()) == 4
        assert loop.execute("get_handicap") == (True, "4")
        # back to the module default
        loop.execute("boardsize 5")
        loop.execute("clear_board")

    def test_run_loop_io(self):
        lp = GtpLoop(boardsize=5, komi=4.5, playouts=8, max_nodes=16)
        out = io.StringIO()
        lp.run(io.StringIO("name\nbogus\nquit\n"), out)
        text = out.getvalue()
        assert "= sayuri-tpu" in text
        assert "? unknown command" in text


class TestGoguiCommands:
    def test_gogui_family(self, loop):
        loop.execute("clear_board")
        loop.execute("play b C3")
        ok, body = loop.execute("gogui-analyze_commands")
        assert ok and "dboard" in body
        assert loop.execute("gogui-rules_game_id") == (True, "Go")
        assert loop.execute("gogui-rules_board_size") == (True, "5")
        assert loop.execute("gogui-rules_side_to_move") == (True, "white")
        ok, board = loop.execute("gogui-rules_board")
        assert ok and "X" in board
        ok, moves = loop.execute("gogui-rules_legal_moves")
        assert ok and "pass" in moves and "C3" not in moves.split()
        ok, hm = loop.execute("gogui-policy_heatmap")
        assert ok and len(hm.splitlines()) == 5
        ok, om = loop.execute("gogui-ownership_heatmap")
        assert ok and len(om.splitlines()) == 5
        ok, mv = loop.execute("selfplay-genmove w")
        assert ok
        loop.execute("undo")
        loop.execute("undo")


class TestSearchControl:
    """Time management, tree reuse, KLD stop, ponder, analyze options
    (search.cc:353-386, 1071-1091, 1345-1414, 1524-1549)."""

    @pytest.fixture(scope="class")
    def agent(self):
        from sayuri_tpu.gtp.engine import Agent

        return Agent(boardsize=5, komi=5.5, playouts=24, max_nodes=96,
                     chunk=8)

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
        assert stats["time"] < 5.0

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
