"""Batched MCTS tests with a dummy evaluator.

The reference runs its whole pipeline with a random-output network when no
weights are given (DummyForward, network.cc:144-165); the same trick makes
the search testable without a trained model. Correctness probes: visit
accounting, legality of chosen moves, value convergence on a decided
position, Gumbel mode, and jit/vmap cleanliness.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sayuri_tpu.game.state import GoEnv
from sayuri_tpu.mcts.core import MCTS, NetEvals, SearchConfig


def make_dummy_eval(env, value_fn=None):
    """Uniform priors over legal moves; value from `value_fn(states)` or 0.5."""

    def eval_fn(states, ctx=None):
        b = states.stones.shape[0]
        legal = jax.vmap(env.legal_action_mask)(states)
        priors = legal.astype(jnp.float32)
        priors = priors / jnp.maximum(
            jnp.sum(priors, axis=-1, keepdims=True), 1.0
        )
        if value_fn is None:
            wl = jnp.full((b,), 0.5)
        else:
            wl = value_fn(states)
        return NetEvals(
            priors=priors,
            black_wl=wl,
            draw=jnp.zeros((b,)),
            black_score=jnp.zeros((b,)),
            black_ownership=jnp.zeros((b, env.n * env.n)),
        )

    return eval_fn


def run_search(env, states, sims, cfg, value_fn=None, seed=0):
    mcts = MCTS(env, make_dummy_eval(env, value_fn), cfg)

    @jax.jit
    def go(states):
        tree = mcts.init_tree(states, jax.random.PRNGKey(seed))
        return mcts.run(tree, sims)

    return mcts, go(states)


class TestSearch:
    def test_visit_accounting(self):
        env = GoEnv(n=5)
        states = env.new_batch(4, komi=0.5)
        cfg = SearchConfig(max_nodes=64, max_depth=16)
        mcts, tree = run_search(env, states, 30, cfg)
        visits = np.asarray(tree.visits[:, 0])
        # root visits = 1 (init eval) + 30 sims
        np.testing.assert_array_equal(visits, 31)
        child_visits = np.asarray(mcts.root_child_visits(tree))
        assert (child_visits.sum(axis=-1) == 30).all()
        # nodes allocated <= sims + 1
        assert (np.asarray(tree.next_free) <= 31).all()

    def test_best_move_is_legal(self):
        env = GoEnv(n=5)
        states = env.new_batch(3, komi=0.5)
        step = jax.jit(jax.vmap(env.step))
        states = step(states, jnp.array([12, 6, 7]))
        cfg = SearchConfig(max_nodes=64, max_depth=16)
        mcts, tree = run_search(env, states, 40, cfg)
        best = np.asarray(mcts.best_move(tree))
        legal = np.asarray(jax.jit(jax.vmap(env.legal_action_mask))(states))
        for b in range(3):
            assert legal[b, best[b]], f"lane {b} picked illegal {best[b]}"

    def test_value_converges_on_winning_position(self):
        """Black massively ahead: with a value function reading the true
        area score of terminal positions, root value should drift above 0.5
        for black."""
        env = GoEnv(n=5)
        b = 2
        states = env.new_batch(b, komi=0.5)
        # black plays 4 stones in a row; white passes between
        step = jax.jit(jax.vmap(env.step))
        for mv in [6, 25, 7, 25, 8, 25, 11]:
            states = step(states, jnp.full((b,), mv, jnp.int32))

        def value_fn(s):
            # oracle-ish: sign of current area score
            sc = jax.vmap(lambda st: env.final_score(st))(s)
            return jnp.clip(0.5 + 0.4 * jnp.tanh(sc / 5.0), 0.0, 1.0)

        cfg = SearchConfig(max_nodes=128, max_depth=16)
        mcts, tree = run_search(env, states, 60, cfg, value_fn=value_fn)
        root_wl = np.asarray(tree.acc_wl[:, 0] / tree.visits[:, 0])
        # black to move and winning big
        assert (root_wl > 0.6).all(), root_wl

    def test_gumbel_mode_runs(self):
        env = GoEnv(n=5)
        states = env.new_batch(2, komi=0.5)
        cfg = SearchConfig(
            max_nodes=64, max_depth=16, gumbel=True,
            gumbel_considered_moves=4,
        )
        mcts, tree = run_search(env, states, 20, cfg, seed=3)
        child_visits = np.asarray(mcts.root_child_visits(tree))
        assert (child_visits.sum(axis=-1) == 20).all()
        # SH with m=4 spreads visits over multiple children
        assert ((child_visits > 0).sum(axis=-1) >= 4).all()

        from sayuri_tpu.mcts import gumbel as G

        move = np.asarray(G.gumbel_move(mcts, tree, allow_pass=jnp.array([True, True])))
        assert (move >= 0).all() and (move <= env.pass_action).all()
        pol = np.asarray(G.completed_q_policy(mcts, tree))
        np.testing.assert_allclose(pol.sum(axis=-1), 1.0, atol=1e-5)
        assert (pol >= 0).all()

    def test_dirichlet_noise_mode_runs(self):
        env = GoEnv(n=5)
        states = env.new_batch(2, komi=0.5)
        cfg = SearchConfig(max_nodes=64, max_depth=16, dirichlet_noise=True)
        mcts, tree = run_search(env, states, 16, cfg, seed=7)
        noise = np.asarray(tree.root_noise)
        np.testing.assert_allclose(noise.sum(axis=-1), 1.0, atol=1e-5)

    def test_terminal_root_is_stable(self):
        env = GoEnv(n=5)
        states = env.new_batch(2, komi=0.5)
        step = jax.jit(jax.vmap(env.step))
        states = step(states, jnp.full((2,), env.pass_action, jnp.int32))
        states = step(states, jnp.full((2,), env.pass_action, jnp.int32))
        assert bool(states.terminated.all())
        cfg = SearchConfig(max_nodes=32, max_depth=8)
        mcts, tree = run_search(env, states, 10, cfg)
        # no children expanded on a terminated game
        assert (np.asarray(tree.next_free) == 1).all()


class TestTreeReuse:
    def test_advance_root_preserves_subtree(self):
        env = GoEnv(n=5)
        states = env.new_batch(3, komi=0.5)
        cfg = SearchConfig(max_nodes=64, max_depth=16)
        mcts, tree = run_search(env, states, 40, cfg)
        best = mcts.best_move(tree)
        b_idx = np.arange(3)
        old_child = np.asarray(tree.child[:, 0])[b_idx, np.asarray(best)]
        old_child_visits = np.asarray(
            mcts.root_child_visits(tree)
        )[b_idx, np.asarray(best)]
        # child-visit totals of the reused subtree's new root, via the
        # same child-stats view selection reads
        old_stats = np.asarray(tree.stats)
        old_child_arr = np.asarray(tree.child)
        old_subroot_children = old_child_arr[b_idx, np.maximum(old_child, 0)]
        old_subroot_child_visits = np.where(
            old_subroot_children >= 0,
            old_stats[
                b_idx[:, None], np.maximum(old_subroot_children, 0), 0
            ],
            0.0,
        ).sum(-1)

        step = jax.jit(jax.vmap(env.step))
        new_states = step(states, best)
        new_tree, has_reuse = mcts.advance_root(
            tree, best, new_states, jax.random.PRNGKey(5)
        )
        has_reuse = np.asarray(has_reuse)
        assert has_reuse.any(), "best move should have an expanded child"
        for i in range(3):
            if not has_reuse[i]:
                continue
            # the new root carries the old child's visit count
            assert int(new_tree.visits[i, 0]) == old_child_visits[i]
            # its children moved with it (rows renumbered but visit
            # totals preserved)
            assert (
                np.asarray(mcts.root_child_visits(new_tree))[i].sum()
                == old_subroot_child_visits[i]
            )
            # node count shrank to the subtree
            assert int(new_tree.next_free[i]) <= int(tree.next_free[i])
            # parents of the new root are cleared
            assert int(new_tree.parent[i, 0]) == -1

    def test_advance_then_search_continues(self):
        env = GoEnv(n=5)
        states = env.new_batch(2, komi=0.5)
        cfg = SearchConfig(max_nodes=64, max_depth=16)
        mcts, tree = run_search(env, states, 30, cfg)
        best = mcts.best_move(tree)
        step = jax.jit(jax.vmap(env.step))
        new_states = step(states, best)
        new_tree, _ = mcts.advance_root(
            tree, best, new_states, jax.random.PRNGKey(6)
        )
        v0 = np.asarray(new_tree.visits[:, 0]).copy()
        new_tree = mcts.run(new_tree, 20)
        v1 = np.asarray(new_tree.visits[:, 0])
        np.testing.assert_array_equal(v1, v0 + 20)
        # consistency: root child visits sum = root visits - 1
        cv = np.asarray(mcts.root_child_visits(new_tree)).sum(-1)
        np.testing.assert_array_equal(cv, v1 - 1)
        best2 = np.asarray(mcts.best_move(new_tree))
        legal = np.asarray(jax.jit(jax.vmap(env.legal_action_mask))(new_states))
        for i in range(2):
            assert legal[i, best2[i]]


class TestNNCache:
    """Device NN eval cache (mcts/nncache.py ~ cache.h + network.cc:102-121):
    cached searches must select identically, count real queries, and hit on
    warm re-searches."""

    def _setup(self, cache_size):
        env = GoEnv(n=5)
        states = env.new_batch(4, komi=7.5)
        cfg = SearchConfig(
            max_nodes=40, max_depth=24, nn_cache_size=cache_size
        )
        mcts = MCTS(env, make_dummy_eval(env), cfg)
        budget = jnp.asarray([24, 8, 24, 8], jnp.int32)

        @jax.jit
        def go(states, cache=None):
            tree = mcts.init_tree(
                states, jax.random.PRNGKey(3), cache=cache
            )
            return mcts.run(tree, 24, budget=budget)

        return env, mcts, go, states

    def test_cached_matches_uncached(self):
        _, m0, go0, states = self._setup(0)
        _, m1, go1, _ = self._setup(64)
        t0 = go0(states)
        t1 = go1(states)
        np.testing.assert_array_equal(
            np.asarray(m0.root_child_visits(t0)),
            np.asarray(m1.root_child_visits(t1)),
        )
        assert t0.cache is None and t1.cache is not None

    def test_counters_and_warm_hits(self):
        _, mcts, go, states = self._setup(64)
        t1 = go(states)
        q = np.asarray(t1.cache.queries)
        h = np.asarray(t1.cache.hits)
        # budget+1 evals requested per live lane (root + playouts)
        np.testing.assert_array_equal(q, [25, 9, 25, 9])
        assert int(t1.cache.forward_rows) <= int(q.sum())
        # warm rerun on the same positions: (almost) everything hits
        t2 = go(states, t1.cache)
        h2 = np.asarray(t2.cache.hits) - h
        q2 = np.asarray(t2.cache.queries) - q
        d2 = np.asarray(t2.cache.dups) - np.asarray(t1.cache.dups)
        # warm rerun: everything is served by a hit or an in-batch dup
        assert ((h2 + d2) > 0.8 * q2).all(), (h2, d2, q2)
        assert (h2 + d2 > 0).all()
        np.testing.assert_array_equal(
            np.asarray(mcts.root_child_visits(t1)),
            np.asarray(mcts.root_child_visits(t2)),
        )

    def test_cross_lane_sharing(self):
        """An entry inserted while serving lane i hits when lane j later
        queries the same position — the shared-cache property of
        cache.h:42-60 that a per-lane cache cannot provide."""
        from sayuri_tpu.mcts import nncache as NC
        from sayuri_tpu.mcts.core import NetEvals

        env = GoEnv(n=5)
        calls = []

        def eval_fn(states, ctx=None):
            b = states.stones.shape[0]
            calls.append(b)
            return NetEvals(
                priors=jnp.ones((b, 26)) / 26.0,
                black_wl=jnp.full((b,), 0.5),
                draw=jnp.zeros((b,)),
                black_score=jnp.zeros((b,)),
                black_ownership=jnp.zeros((b, 25)),
            )

        base = env.new_batch(4, komi=7.5)
        pos_a = jax.vmap(env.step)(
            base, jnp.asarray([7, 7, 7, 7], jnp.int32)
        )
        cache = NC.make_cache(4, 64, 26, 25)
        # only lane 0 live: inserts position A once
        live0 = jnp.asarray([True, False, False, False])
        _, cache = NC.cached_eval(cache, eval_fn, pos_a, None, live=live0)
        np.testing.assert_array_equal(np.asarray(cache.hits), [0, 0, 0, 0])
        # now lanes 1-3 query the same position: all hit lane 0's entry
        live123 = jnp.asarray([False, True, True, True])
        _, cache = NC.cached_eval(cache, eval_fn, pos_a, None, live=live123)
        np.testing.assert_array_equal(np.asarray(cache.hits), [0, 1, 1, 1])

    def test_two_way_association_survives_collision(self):
        """Two distinct keys hashing to the same set coexist (2-way), and a
        third evicts the oldest generation (cache.h generation eviction)."""
        from sayuri_tpu.mcts import nncache as NC
        from sayuri_tpu.mcts.core import NetEvals

        b = 1
        cache = NC.make_cache(b, 8, 4, 4)

        def ev(v):
            return NetEvals(
                priors=jnp.full((b, 4), v),
                black_wl=jnp.full((b,), v),
                draw=jnp.zeros((b,)),
                black_score=jnp.zeros((b,)),
                black_ownership=jnp.zeros((b, 4)),
            )

        def key(k0):
            return jnp.asarray([[k0, k0 * 7 + 1]], jnp.uint32)

        # keys 8, 16, 24 all map to set 0 (k % 8 == 0)
        ones = jnp.ones((b,), bool)
        cache = NC.insert(cache, key(8), ev(0.1), ones)
        cache = NC.insert(cache, key(16), ev(0.2), ones)
        h8, _, _ = NC.probe(cache, key(8))
        h16, _, _ = NC.probe(cache, key(16))
        assert bool(h8[0]) and bool(h16[0])
        # third collision evicts the OLDEST (key 8), keeps key 16
        cache = NC.insert(cache, key(24), ev(0.3), ones)
        h8, _, _ = NC.probe(cache, key(8))
        h16, _, _ = NC.probe(cache, key(16))
        h24, _, _ = NC.probe(cache, key(24))
        assert not bool(h8[0]) and bool(h16[0]) and bool(h24[0])


class TestSelectionTiebreak:
    def test_first_expansion_follows_prior_not_index(self):
        """All-equal PUCT scores (children_visits=0 makes every child
        score the parent FPU exactly) must tie-break to the HIGHEST-PRIOR
        action like the reference (LinkNodeList descending-policy order +
        strict `>` compare, node.cc:287-293,568) — a plain argmax expands
        action 0 (the A1 corner) and snowballs the search onto it."""
        env = GoEnv(n=5)
        target = 12  # C3, an arbitrary non-zero action

        def eval_fn(states, ctx=None):
            b = states.stones.shape[0]
            legal = jax.vmap(env.legal_action_mask)(states)
            base = jnp.where(legal, 1.0, 0.0)
            peaked = base.at[:, target].mul(3.0)
            priors = peaked / jnp.sum(peaked, axis=-1, keepdims=True)
            return NetEvals(
                priors=priors,
                black_wl=jnp.full((b,), 0.5),
                draw=jnp.zeros((b,)),
                black_score=jnp.zeros((b,)),
                black_ownership=jnp.zeros((b, env.n * env.n)),
            )

        cfg = SearchConfig(max_nodes=40, max_depth=16)
        mcts = MCTS(env, eval_fn, cfg)
        states = env.new_batch(2, komi=7.0)

        @jax.jit
        def one_sim(states):
            tree = mcts.init_tree(states, jax.random.PRNGKey(0))
            return mcts.run(tree, 1)

        tree = one_sim(states)
        visits = np.asarray(mcts.root_child_visits(tree))
        assert (visits[:, target] == 1).all(), visits[0].nonzero()
        assert visits.sum() == 2  # exactly one child expanded per lane
