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
