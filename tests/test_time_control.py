"""Clock semantics vs /root/reference/src/mcts/time_control.cc.

Pure host-side tests (no JAX): script byo-yomi / canadian / absolute
games against TimeSettings / TimeLeft / TookTime / GetThinkingTime
behavior."""

from sayuri_tpu.gtp.time_control import TimeControl


def test_infinite_by_default():
    tc = TimeControl()
    assert tc.is_infinite()
    assert tc.thinking_time(0, 19, 0) == float("inf")


def test_validation_mutually_exclusive():
    # stones and periods both > 0 -> byo system dropped (time_control.cc:40-48)
    tc = TimeControl()
    tc.time_settings(60, 30, 5, 3)
    assert tc.byo_time == 0 and tc.byo_periods == 0
    # byo_time <= 0 and no periods -> stones dropped
    tc.time_settings(60, 0, 5, 0)
    assert tc.byo_stones == 0


def test_japanese_byoyomi_period_decrement():
    tc = TimeControl()
    tc.kgs_time_settings("byoyomi", 0, 30, 5)
    assert tc.in_byo[0] and tc.periods_left[0] == 5
    # within the period: no period lost, clock refills
    tc.took_time(0, 20)
    assert tc.periods_left[0] == 5 and tc.byotime_left[0] == 30
    # overrun: spend a period, refill (TookTime, time_control.cc:104-112)
    tc.took_time(0, 35)
    assert tc.periods_left[0] == 4 and tc.byotime_left[0] == 30
    # burn down to the last period
    for _ in range(3):
        tc.took_time(0, 31)
    assert tc.periods_left[0] == 1
    assert not tc.is_time_over(0)
    # overrunning the last period: no refill -> time over
    tc.took_time(0, 31)
    assert tc.periods_left[0] == 0
    assert tc.is_time_over(0)
    assert tc.thinking_time(0, 19, 100) == 0.0


def test_japanese_thinking_time_uses_periods():
    tc = TimeControl()
    tc.kgs_time_settings("byoyomi", 60, 30, 3)
    tc.lag_buffer = 1.0
    # main time: budget = (main + byo_time*(periods-1) - lag)/moves
    #            + (byo_time - lag)   (GetThinkingTime, time_control.cc:215+)
    moves = tc.estimate_moves_expected(19, 0)
    expect = (60 + 30 * 2 - 1.0) / moves + (30 - 1.0)
    assert abs(tc.thinking_time(0, 19, 0) - expect) < 1e-9
    # in byo: budget = period length - lag (1s overflows into the first
    # period, which then refills because periods remain)
    tc.took_time(0, 61)
    assert tc.in_byo[0] and tc.byotime_left[0] == 30
    assert abs(tc.thinking_time(0, 19, 50) - 29.0) < 1e-9


def test_japanese_time_left_updates_periods():
    tc = TimeControl()
    tc.kgs_time_settings("byoyomi", 300, 30, 5)
    # GTP time_left with stones>0 means periods in japanese
    # (TimeLeft, time_control.cc:62-71)
    tc.time_left(0, 30, 2)
    assert tc.in_byo[0] and tc.periods_left[0] == 2
    assert tc.maintime_left[0] == 0
    # the other clock is untouched
    assert tc.maintime_left[1] == 300 and not tc.in_byo[1]


def test_canadian_stones_refill():
    tc = TimeControl()
    tc.time_settings(0, 60, 10)
    assert tc.in_byo[0]
    for i in range(9):
        tc.took_time(0, 1.0)
        assert tc.stones_left[0] == 10 - 1 - i
    # 10th stone inside the budget: refill both (time_control.cc:113-122)
    tc.took_time(0, 1.0)
    assert tc.stones_left[0] == 10
    assert tc.byotime_left[0] == 60
    # thinking time divides remaining byo time over remaining stones
    assert abs(tc.thinking_time(0, 19, 30) - 6.0) < 1e-9


def test_canadian_timeout():
    tc = TimeControl()
    tc.time_settings(0, 10, 5)
    tc.took_time(0, 11)  # byotime_left < 0 with stones remaining
    assert tc.is_time_over(0)


def test_absolute_main_time_flows_into_byo():
    tc = TimeControl()
    tc.time_settings(30, 60, 10)
    assert not tc.in_byo[0]
    tc.took_time(0, 45)  # 15s overflow into the byo period
    assert tc.in_byo[0]
    assert abs(tc.byotime_left[0] - 45.0) < 1e-9
    assert tc.stones_left[0] == 9


def test_can_accumulate():
    tc = TimeControl()
    tc.kgs_time_settings("byoyomi", 0, 30, 3)
    assert not tc.can_accumulate(0)  # japanese byo: never
    tc2 = TimeControl()
    tc2.time_settings(0, 60, 2)
    assert tc2.can_accumulate(0)
    tc2.took_time(0, 1.0)  # down to the last stone of the period
    assert tc2.stones_left[0] == 1
    assert not tc2.can_accumulate(0)


def test_estimate_moves_expected_reference_values():
    tc = TimeControl()
    # base_move_num: 153 on 19x19, 71 on 13x13, 32 on 9x9
    # (time_control.cc:324-327)
    assert tc.estimate_moves_expected(19, 300) == max(
        153 - 150, max(int(0.3 * 153), 15)
    )
    assert tc.estimate_moves_expected(9, 300) == 15
    # opening surcharge at move 0 (opening_factor 2.5)
    assert tc.estimate_moves_expected(19, 0) == 153 + int(2.5 * 36)


def test_lag_buffer_adaptive_growth():
    tc = TimeControl()
    tc.time_settings(60, 0, 0)
    tc.lag_buffer = 0.25
    # overran the conservative budget by 1s -> buffer grows by 1.5x diff
    tc.update_lag_buffer(
        thinking_time=2.0, buffer_effect=0.0, elapsed=3.0,
        lag_buffer_floor=0.25,
    )
    assert abs(tc.lag_buffer - (0.25 + 1.5)) < 1e-9


def test_to_string_stream():
    tc = TimeControl()
    tc.kgs_time_settings("byoyomi", 0, 30, 5)
    s = tc.to_string()
    assert "Periods left: 5" in s and "Black time:" in s
