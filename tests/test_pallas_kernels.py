"""Differential tests for the Pallas board kernels (interpreter mode).

The kernels are the TPU hot path; the XLA implementations in game/ are the
reference semantics. Every output must be cell-exact. These run in Pallas
interpreter mode on CPU (SELF_CHECK-style differential testing, the role
the reference fills with its GPU-vs-CPU -DSELF_CHECK build,
network.cc:333-360 — here applied to the rules kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sayuri_tpu.ops import analysis as AK
from sayuri_tpu.ops import flood as FK
from sayuri_tpu.game import analysis as GA
from sayuri_tpu.game import board as B
from sayuri_tpu.game.state import GoEnv


@pytest.fixture(autouse=True)
def interpret_mode():
    AK.INTERPRET = True
    yield
    AK.INTERPRET = False


def random_states(b=4, n=9, moves=15, seed=0):
    env = GoEnv(n=n)
    rng = np.random.RandomState(seed)
    states = env.new_batch(b, komi=7.5)
    step = jax.jit(jax.vmap(env.step))
    legal_fn = jax.jit(jax.vmap(env.legal_action_mask))
    for _ in range(moves):
        legal = np.asarray(legal_fn(states))[:, : n * n]
        acts = np.array(
            [
                rng.choice(np.nonzero(l)[0]) if l.any() else n * n
                for l in legal
            ]
        )
        states = step(states, jnp.asarray(acts, jnp.int32))
    return env, states


class TestAnalysisKernel:
    def test_matches_xla_reference(self):
        env, states = random_states()
        n = env.n
        out = AK.board_analysis_tpu(
            states.stones, states.size, states.ko, states.to_move
        )
        legal_fn = jax.jit(jax.vmap(env.legal_action_mask))
        ref_legal = np.asarray(legal_fn(states))[:, : n * n]
        assert (ref_legal == np.asarray(out["legal"])).all()

        def ref_libs(s):
            mask = B.board_mask(s.size, n)
            empty = (s.stones == 0) & mask
            lb = B.chain_labels((s.stones == 1) & mask)
            lw = B.chain_labels((s.stones == 2) & mask)
            return B.chain_liberty_map(
                (s.stones == 1) & mask, lb, empty
            ) + B.chain_liberty_map((s.stones == 2) & mask, lw, empty)

        rl = np.asarray(jax.vmap(ref_libs)(states))
        assert (np.minimum(rl, 5) == np.asarray(out["libs"])).all()

        ro = np.asarray(
            jax.vmap(lambda s: B.area_ownership(s.stones, s.size))(states)
        )
        assert (ro == np.asarray(out["ownership"])).all()

        for i in range(states.stones.shape[0]):
            s_i = jax.tree.map(lambda x: x[i], states)
            sf, so = GA.safe_and_ownership(s_i.stones, s_i.size)
            assert (
                np.asarray(sf) == np.asarray(out["safe"][i])
            ).all(), f"safe mismatch lane {i}"
            assert (
                np.asarray(so) == np.asarray(out["score_ownership"][i])
            ).all(), f"score ownership mismatch lane {i}"

    def test_benson_pass_alive_shape(self):
        rows = [
            ".X.X.OO..",
            "XXXX.O.O.",
            ".....OO..",
            ".........",
            "..OOO....",
            "..O.O....",
            "..OOO....",
            "XX.......",
            ".X.......",
        ]
        n = 9
        b = np.zeros((n, n), np.int8)
        for y, r in enumerate(rows):
            for x, ch in enumerate(r):
                b[y, x] = {".": 0, "X": 1, "O": 2}[ch]
        out = AK.board_analysis_tpu(
            jnp.asarray(b)[None],
            jnp.asarray([9]),
            jnp.asarray([-1]),
            jnp.asarray([0]),
        )
        sf, so = GA.safe_and_ownership(jnp.asarray(b), jnp.int32(9))
        assert (np.asarray(sf) == np.asarray(out["safe"][0])).all()
        assert (np.asarray(so) == np.asarray(out["score_ownership"][0])).all()
        assert np.asarray(out["safe"][0]).sum() > 0  # real pass-alive group


class TestInnerRegionKernel:
    """The crafted two-headed-dragon goldens through the KERNEL path:
    round-4 shipped the inner-region pass-dead refinement only in the
    XLA path (game/analysis.py:183-239) while the production TPU planes
    came from this kernel's old approximation — these boards pin the
    kernel to the golden-gated behavior (board.cc:2013-2107)."""

    def test_inner_slots_synced(self):
        assert AK._INNER_SLOTS == GA.INNER_SLOTS

    def test_dragon_goldens_match_xla(self):
        import json
        from pathlib import Path

        golden = (
            Path(__file__).parent / "goldens" / "passdead_goldens.json"
        )
        if not golden.exists():
            pytest.skip("no passdead goldens")
        data = json.load(open(golden))
        n = data["size"]
        env = GoEnv(n=n)
        boards = []
        names = []
        for rec in data["records"]:
            if rec["stones"] is None:
                continue
            boards.append(
                np.array(rec["stones"], np.int8).reshape(n, n)
            )
            names.append(rec["name"])
        assert boards, "goldens hold no direct stone layouts"
        stones = jnp.asarray(np.stack(boards))
        b = stones.shape[0]
        out = AK.board_analysis_tpu(
            stones,
            jnp.full((b,), n, jnp.int32),
            jnp.full((b,), -1, jnp.int32),
            jnp.zeros((b,), jnp.int32),
        )
        for i, name in enumerate(names):
            sf, so = GA.safe_and_ownership(stones[i], jnp.int32(n))
            assert (
                np.asarray(sf) == np.asarray(out["safe"][i])
            ).all(), f"{name}: kernel safe != XLA"
            assert (
                np.asarray(so) == np.asarray(out["score_ownership"][i])
            ).all(), f"{name}: kernel score ownership != XLA"

    def test_ring_refinement_direction(self):
        """Enclosed island: ring must NOT be pass-dead for black (the
        kernel's pre-refinement verdict was the opposite)."""
        import json
        from pathlib import Path

        golden = (
            Path(__file__).parent / "goldens" / "passdead_goldens.json"
        )
        if not golden.exists():
            pytest.skip("no passdead goldens")
        data = json.load(open(golden))
        by_name = {r["name"]: r for r in data["records"]}
        if "edge_ring_inner" not in by_name:
            pytest.skip("crafted records absent")
        n = data["size"]
        stones = jnp.asarray(
            np.array(by_name["edge_ring_inner"]["stones"], np.int8).reshape(
                n, n
            )
        )[None]
        out = AK.board_analysis_tpu(
            stones,
            jnp.asarray([n]),
            jnp.asarray([-1]),
            jnp.asarray([0]),
        )
        safe = np.asarray(out["safe"][0])
        assert not safe[0].any() and not safe[:, 0].any(), (
            "ring wrongly marked pass-dead by the kernel"
        )
        assert safe[1:8, 1:8].all(), "island should be pass-alive"


class TestStepKernel:
    @pytest.mark.slow
    def test_step_matches_env(self):
        env, states = random_states(b=4, n=7, moves=10, seed=3)
        n = env.n
        rng = np.random.RandomState(7)
        step = jax.jit(jax.vmap(env.step))
        legal_fn = jax.jit(jax.vmap(env.legal_action_mask))
        for i in range(12):
            legal = np.asarray(legal_fn(states))[:, : n * n]
            acts = np.array(
                [
                    rng.choice(np.nonzero(l)[0]) if l.any() else n * n
                    for l in legal
                ]
            )
            if i % 5 == 2:
                acts[0] = n * n  # pass
            out = AK.step_and_analyze_tpu(
                states.stones,
                states.size,
                states.ko,
                states.to_move,
                jnp.asarray(acts),
            )
            ref = step(states, jnp.asarray(acts, jnp.int32))
            np.testing.assert_array_equal(
                np.asarray(ref.stones), np.asarray(out["new_stones"])
            )
            np.testing.assert_array_equal(
                np.asarray(ref.ko), np.asarray(out["new_ko"])
            )
            ref_legal = np.asarray(legal_fn(ref))[:, : n * n]
            np.testing.assert_array_equal(
                ref_legal, np.asarray(out["legal"])
            )
            states = ref


class TestLadderKernel:
    """Pallas ladder-chase kernel vs the XLA greedy chase (game/ladder.py).

    Cell-exact over random midgame boards; the kernel replays the identical
    decision rules (board.cc:484-821 semantics) on bitboard lanes."""

    @pytest.mark.slow
    def test_matches_xla_reference(self):
        from sayuri_tpu.game import ladder as L
        from sayuri_tpu.ops import ladder_kernel as LK

        LK.INTERPRET = True
        try:
            for b, n, moves, seed in [(4, 9, 30, 0), (2, 13, 55, 4)]:
                env, states = random_states(b=b, n=n, moves=moves, seed=seed)
                ref = jax.vmap(
                    lambda s: L.ladder_planes(s.stones, s.size, s.ko)
                )(states)
                ker = L.ladder_planes_batch(
                    states.stones, states.size, states.ko, use_kernel=True
                )
                np.testing.assert_array_equal(
                    np.asarray(ref), np.asarray(ker)
                )
        finally:
            LK.INTERPRET = False
