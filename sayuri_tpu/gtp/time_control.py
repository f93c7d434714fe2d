"""GTP time management.

Re-implements the reference TimeControl (/root/reference/src/mcts/
time_control.cc, time_control.h): absolute / byo-yomi / canadian time
systems, centisecond accounting, thinking-time heuristic with a lag
buffer. Host-side pure Python (the search budget it produces feeds the
playout loop)."""

from __future__ import annotations

import dataclasses
import time


@dataclasses.dataclass
class ClockState:
    main_time: float = 0.0          # seconds remaining
    byo_time: float = 0.0           # byo-yomi period length
    byo_stones: int = 0             # canadian stones per period (0 = japanese)
    byo_periods: int = 0            # japanese periods remaining
    in_byo: bool = False
    stones_left: int = 0
    periods_left: int = 0


class TimeControl:
    """Tracks both players' clocks (time_control.h:51-63)."""

    def __init__(self):
        self.infinite = True
        self.clocks = [ClockState(), ClockState()]
        self.lag_buffer = 0.25  # seconds safety margin (search.cc:438-455)

    def time_settings(self, main_time, byo_time, byo_stones):
        """GTP time_settings (canadian when byo_stones > 0)."""
        self.infinite = main_time <= 0 and byo_time <= 0
        for c in self.clocks:
            c.main_time = float(main_time)
            c.byo_time = float(byo_time)
            c.byo_stones = int(byo_stones)
            c.byo_periods = 0
            c.in_byo = main_time <= 0 < byo_time
            c.stones_left = int(byo_stones)
            c.periods_left = 0

    def kgs_time_settings(self, system, main_time, byo_time, extra):
        """kgs-time_settings none|absolute|byoyomi|canadian (gtp.cc:427)."""
        system = system.lower()
        if system == "none":
            self.infinite = True
            return
        if system == "absolute":
            self.time_settings(main_time, 0, 0)
        elif system == "canadian":
            self.time_settings(main_time, byo_time, extra)
        elif system == "byoyomi":
            self.infinite = False
            for c in self.clocks:
                c.main_time = float(main_time)
                c.byo_time = float(byo_time)
                c.byo_stones = 0
                c.byo_periods = int(extra)
                c.in_byo = main_time <= 0 < byo_time
                c.periods_left = int(extra)

    def time_left(self, color, main_time, stones):
        c = self.clocks[color]
        if stones > 0:
            c.in_byo = True
            c.byo_time = float(main_time)
            c.stones_left = int(stones)
        else:
            c.main_time = float(main_time)
            c.in_byo = False

    def thinking_time(self, color, board_size, move_num) -> float:
        """Time budget for this move (TimeControl::GetThinkingTime
        semantics: divide remaining time over expected remaining moves,
        byo-yomi gives the period length minus lag)."""
        if self.infinite:
            return float("inf")
        c = self.clocks[color]
        est_remaining = max(board_size * board_size // 2 - move_num, 12)
        if c.in_byo:
            if c.byo_stones > 0:  # canadian: byo_time for stones_left moves
                per_move = c.byo_time / max(c.stones_left, 1)
            else:                 # japanese: one period per move
                per_move = c.byo_time
            return max(per_move - self.lag_buffer, 0.05)
        budget = c.main_time / est_remaining
        if c.byo_time > 0:
            budget += c.byo_time * 0.75  # can flow into byo-yomi
        return max(budget - self.lag_buffer, 0.05)

    def consume(self, color, seconds):
        c = self.clocks[color]
        if self.infinite:
            return
        if c.in_byo:
            if c.byo_stones > 0:
                c.stones_left -= 1
                if c.stones_left <= 0:
                    c.stones_left = c.byo_stones
            return
        c.main_time -= seconds
        if c.main_time <= 0 and c.byo_time > 0:
            c.in_byo = True
            c.stones_left = c.byo_stones
            c.periods_left = c.byo_periods

    def should_stop(self, color, start_time, budget) -> bool:
        return (time.monotonic() - start_time) >= budget
