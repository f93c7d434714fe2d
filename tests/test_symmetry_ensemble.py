"""Random-symmetry leaf ensembling (Network::kRandom, node.cc:146).

Validates the batched per-row transform plumbing against the static
single-symmetry transforms, and the full evaluator equivariance property:
evaluating a transformed position under symmetry r equals evaluating the
original under the composed symmetry and mapping the outputs — i.e. a
rotated board yields identically-distributed evals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.models import symmetry as S
from sayuri_tpu.models.evaluator import make_eval_fn
from sayuri_tpu.models.network import NetConfig, SayuriNet

N = 5


def _np_transform(a, s):
    if s & 4:
        a = a.T
    if s & 2:
        a = a[::-1, :]
    if s & 1:
        a = a[:, ::-1]
    return a


def compose_table():
    """[8, 8] c with T_{c[r, s]} = T_r . T_s (applied s first)."""
    iota = np.arange(N * N).reshape(N, N)
    images = [
        tuple(_np_transform(iota, s).reshape(-1).tolist()) for s in range(8)
    ]
    c = np.zeros((8, 8), int)
    for r in range(8):
        for s in range(8):
            comp = _np_transform(_np_transform(iota, s), r).reshape(-1)
            c[r, s] = images.index(tuple(comp.tolist()))
    return c


def map_vertex(v, s, n=N):
    """Where vertex `v` lands when the board is transformed by `s`."""
    _, inv = S._perm_tables(n)
    return int(inv[s, v])


class TestBatchedTransforms:
    def test_matches_static_planes(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (3, N, N, 7))
        for s in range(8):
            want = S.transform_planes(x, s)
            got = S.transform_planes_batch(x, jnp.full((3,), s, jnp.int32))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_matches_static_policy_inverse(self):
        p = jax.random.uniform(jax.random.PRNGKey(1), (3, N * N + 1))
        for s in range(8):
            want = S.inverse_transform_policy(p, s, N)
            got = S.inverse_transform_policy_batch(
                p, jnp.full((3,), s, jnp.int32), N
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_roundtrip(self):
        p = jax.random.uniform(jax.random.PRNGKey(2), (8, N * N + 1))
        syms = jnp.arange(8, dtype=jnp.int32)
        fwd = S.transform_policy_batch(p, syms, N)
        back = S.inverse_transform_policy_batch(fwd, syms, N)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(p))

    def test_random_draw_uniform_ish(self):
        env = GoEnv(n=9)
        b = 512
        states = env.new_batch(b, komi=7.5)
        # two distinct moves per lane -> 512 distinct positions/hashes
        a1 = jnp.arange(b, dtype=jnp.int32) % 81
        a2 = (jnp.arange(b, dtype=jnp.int32) // 81 + 7) % 81
        states = jax.vmap(env.step)(states, a1)
        states = jax.vmap(env.step)(states, a2)
        syms = np.asarray(S.random_symmetries(states))
        counts = np.bincount(syms, minlength=8)
        assert counts.min() > b / 8 / 4, counts
        assert counts.max() < b / 2, counts


@pytest.fixture(scope="module")
def setup():
    env = GoEnv(n=N)
    cfg = NetConfig(
        boardsize=N,
        residual_channels=16,
        stack=("ResidualBlock",),
        policy_head_channels=8,
        value_head_channels=8,
    )
    net = SayuriNet(cfg)
    dummy = jnp.zeros((1, N, N, 43)).at[..., 42].set(1.0)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
    return env, net, variables


def play_seq(env, moves):
    st = env.new_batch(1, komi=7.5)
    for v in moves:
        st = jax.vmap(env.step)(st, jnp.asarray([v], jnp.int32))
    return st


MOVES = [6, 12, 7, 18, 11]  # asymmetric little position


class TestEnsembleEquivariance:
    def test_forced_random_equals_static(self, setup):
        """The per-row random path with a forced index must reproduce the
        static single-symmetry evaluator exactly. Two static symmetries
        (identity + transpose*flip) pin the plumbing; the full 8-fold
        orbit math is covered by test_rotated_board_identically_
        distributed through the single jitted random path."""
        env, net, variables = setup
        st = play_seq(env, MOVES)
        rnd = jax.jit(make_eval_fn(env, net, variables, symmetry="random",
                                   ladder_mode="off"))
        for s in (0, 5):
            static = jax.jit(make_eval_fn(env, net, variables, symmetry=s,
                                          ladder_mode="off"))
            want = static(st, None)
            got = rnd(st, {"sym": jnp.asarray([s], jnp.int32)})
            np.testing.assert_allclose(
                np.asarray(got.priors), np.asarray(want.priors), atol=1e-5
            )
            np.testing.assert_allclose(
                float(got.black_wl[0]), float(want.black_wl[0]), atol=1e-5
            )

    def test_rotated_board_identically_distributed(self, setup):
        """eval(T_s(P), sym=r) == map_s(eval(P, sym=r.s)): the 8-fold output
        set of a transformed position is the (mapped) output set of the
        original — rotated boards see identically-distributed evals."""
        env, net, variables = setup
        comp = compose_table()
        rnd = jax.jit(make_eval_fn(env, net, variables, symmetry="random",
                                   ladder_mode="off"))
        st = play_seq(env, MOVES)
        for s in (1, 3, 6):
            moved = [map_vertex(v, s) for v in MOVES]
            st_s = play_seq(env, moved)
            for r in (0, 2, 5):
                u = comp[r, s]
                ev_orig = rnd(st, {"sym": jnp.asarray([u], jnp.int32)})
                ev_rot = rnd(st_s, {"sym": jnp.asarray([r], jnp.int32)})
                np.testing.assert_allclose(
                    float(ev_rot.black_wl[0]),
                    float(ev_orig.black_wl[0]),
                    atol=1e-5,
                )
                # priors map by the same vertex re-indexing
                mapped = np.asarray(
                    S.transform_policy_batch(
                        ev_orig.priors, jnp.asarray([s], jnp.int32), N
                    )
                )
                np.testing.assert_allclose(
                    np.asarray(ev_rot.priors), mapped, atol=1e-5
                )

    def test_average_ensemble_invariant(self, setup):
        """kAverage output is invariant under board transforms (scalar
        heads) and equivariant on the policy (network.cc:258-283)."""
        env, net, variables = setup
        avg = jax.jit(make_eval_fn(env, net, variables, symmetry="average",
                                   ladder_mode="off"))
        st = play_seq(env, MOVES)
        ev = avg(st, None)
        s = 5
        st_s = play_seq(env, [map_vertex(v, s) for v in MOVES])
        ev_s = avg(st_s, None)
        np.testing.assert_allclose(
            float(ev_s.black_wl[0]), float(ev.black_wl[0]), atol=1e-5
        )
        mapped = np.asarray(
            S.transform_policy_batch(
                ev.priors, jnp.asarray([s], jnp.int32), N
            )
        )
        np.testing.assert_allclose(np.asarray(ev_s.priors), mapped, atol=1e-5)

    def test_default_draws_vary_by_position(self, setup):
        """The default draw differs across positions (it is hash-derived),
        so a search actually ensembles over symmetries."""
        env, _, _ = setup
        sts = [play_seq(env, MOVES[:k]) for k in range(1, 6)]
        stacked = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *sts
        )
        syms = np.asarray(S.random_symmetries(stacked))
        assert len(set(syms.tolist())) > 1, syms
