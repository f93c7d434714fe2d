"""Network evaluator: GoState batch -> NetEvals for the search.

The JAX-native replacement for the reference's Network facade
(/root/reference/src/neural/network.cc): encoder + forward + output
post-processing (policy softmax over legal moves, wdl -> winrate, score
head). Output conventions follow the engine's v2 mapping
(blas_forward_pipe.cc:566-620): value = (wdl_win - wdl_loss + 1)/2,
score = scores[0] (the final-score head, already x20 in the network).

Optional symmetry ensembling mirrors network.h:17 (random symmetry per
query): the input planes are transformed, spatial outputs inverse-
transformed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sayuri_tpu.game.state import GoEnv, GoState
from sayuri_tpu.mcts.core import NetEvals
from sayuri_tpu.models import symmetry as S
from sayuri_tpu.models.encoder import encode
from sayuri_tpu.models.network import SayuriNet


def suppress_pass(priors, legal, size, factor):
    """Zero the pass prior while more than (1 - factor) * size^2 legal
    board moves remain (Node::ExpandChildren, node.cc:253-263), then
    renormalize — in the early game pass is never a useful candidate."""
    n_legal = jnp.sum(legal[:, :-1], axis=-1).astype(jnp.float32)
    thresh = (1.0 - factor) * (size * size).astype(jnp.float32)
    keep_pass = ~(n_legal > thresh)
    pri = priors.at[:, -1].multiply(keep_pass.astype(priors.dtype))
    return pri / jnp.maximum(jnp.sum(pri, axis=-1, keepdims=True), 1e-12)


def make_eval_fn(
    env: GoEnv,
    net: SayuriNet,
    variables,
    policy_temp: float = 1.0,
    symmetry: int | str = 0,
    ladder_mode: str = "root",
    sym_seed: int = 0,
    gammas=None,
    policy_head: str = "prob",
    suppress_pass_factor: float = 0.1667,
    use_stm_winrate: bool = False,
):
    """Build eval_fn(states [B], ctx) -> NetEvals. `variables` holds
    {'params', 'batch_stats'}.

    `gammas`: optional (DeviceGammas, factor) — mixes the pattern-gammas
    policy into the priors at EVERY evaluation, the reference's
    per-expansion mixing (node.cc:151-160); see pattern/gammas_jax.py.

    `policy_head`: which policy output feeds the search priors ("prob" or
    "optimistic_prob"; --use-optimistic-policy evaluates NON-root nodes
    with the optimistic head, node.cc:130-143 — pair a "prob" root
    evaluator with an optimistic leaf evaluator via MCTS(root_eval_fn=)).

    `suppress_pass_factor`: drop pass from the expansion candidates while
    more than (1 - factor) * size^2 legal board moves remain
    (node.cc:253-263; reference default 0.1667). 0 disables.

    `use_stm_winrate`: value from the net's stm-winrate head
    ((tanh+1)/2, network.cc:399) instead of (wdl_w - wdl_l + 1)/2
    (node.cc:319-325).

    `symmetry`:
    - int in [0, 8): a fixed symmetry index (0 = identity, Network::kDirect)
    - "random": random-symmetry leaf ensembling — every query is evaluated
      under its own dihedral transform and the spatial outputs are
      inverse-transformed (Network::kRandom, network.cc:238-245; the search
      evaluates EVERY leaf this way, node.cc:146). The draw is a pure
      function of the position hash (see symmetry.random_symmetries) so
      results stay deterministic and cache-coherent. `ctx["sym"]` ([B]
      int32), when present, overrides the draw (tests / debug).
    - "average": evaluate all 8 symmetries and average the outputs
      (Network::kAverage, network.cc:258-283; the sayuri-raw_nn avg probe,
      gtp.cc:615).

    `ladder_mode` controls the ladder feature planes (encoder.cc:248-265),
    the single most expensive board analysis:
    - "full": recompute per evaluated position (exact reference behavior)
    - "root": reuse the ROOT position's ladder planes for every leaf of a
      search — passed via `ctx["ladders"]` ([B, n, n, 4]); ~150x cheaper
      per playout, leaves see slightly stale ladder features (documented
      deviation; strength cost is small, the other 39 planes are exact)
    - "off": zero planes (dummy/bootstrap runs)
    """
    n = env.n

    def eval_fn(states: GoState, ctx=None) -> NetEvals:
        if ladder_mode == "full":
            lp = None  # encoder computes per position
        elif ladder_mode == "root" and ctx is not None and "ladders" in ctx:
            lp = ctx["ladders"]
        else:
            lp = jnp.zeros(states.stones.shape[:1] + (n, n, 4))

        # Pallas fast path: legality + liberty maps from one analysis
        # kernel launch (ops/analysis.py) instead of per-board label
        # propagation + scatters
        from sayuri_tpu.game import board as B_

        analysis = None
        if ctx is not None and "analysis" in ctx:
            # precomputed by the fused step+analysis kernel (mcts simulate)
            analysis = ctx["analysis"]
        elif B_._use_pallas():
            from sayuri_tpu.ops.analysis import board_analysis_tpu

            analysis = board_analysis_tpu(
                states.stones, states.size, states.ko, states.to_move
            )
        if lp is None:
            # full ladder mode: compute ladder planes per position
            from sayuri_tpu.game import ladder as L

            lp = L.ladder_planes_batch(states.stones, states.size, states.ko)

        if analysis is None:
            planes = jax.vmap(
                lambda s, l: encode(env, s, ladder_planes=l)
            )(states, lp)
        else:
            planes = jax.vmap(
                lambda s, l, lib, sf, so: encode(
                    env,
                    s,
                    ladder_planes=l,
                    libs_map=lib,
                    safe_map=sf,
                    score_own_map=so,
                )
            )(
                states,
                lp,
                analysis["libs"],
                analysis["safe"],
                analysis["score_ownership"],
            )  # [B, n, n, 43]
        if analysis is not None:
            board_legal = analysis["legal"] & ~states.terminated[:, None]
            legal = jnp.concatenate(
                [board_legal, jnp.ones((board_legal.shape[0], 1), bool)],
                axis=-1,
            )
        else:
            legal = jax.vmap(env.legal_action_mask)(states)

        def finish(evals: NetEvals) -> NetEvals:
            """Per-expansion post-processing in the reference's order:
            gammas mixing (node.cc:151-160) THEN pass suppression at
            candidate-list build time (node.cc:253-263)."""
            if gammas is not None:
                from sayuri_tpu.pattern import gammas_jax as GJ

                dev, factor = gammas
                libs = analysis["libs"] if analysis is not None else None
                evals = GJ.apply_to_evals(
                    dev, factor, states, evals, legal, libs=libs
                )
            if suppress_pass_factor > 0.0:
                evals = evals._replace(
                    priors=suppress_pass(
                        evals.priors, legal, states.size,
                        suppress_pass_factor,
                    )
                )
            return evals

        def postprocess(prob, wdl_logits, stm_score, ownership, stm_q=None):
            """(prob logits, wdl logits, stm score, ownership, stm q) ->
            NetEvals (output mapping of blas_forward_pipe.cc:566-620)."""
            logits = jnp.where(legal, prob / policy_temp, -jnp.inf)
            priors = jax.nn.softmax(logits, axis=-1)
            priors = jnp.where(legal, priors, 0.0)
            wdl = jax.nn.softmax(wdl_logits, axis=-1)
            if use_stm_winrate and stm_q is not None:
                # q_vals[0] is already tanh'd; (x + 1) / 2 maps to a
                # winrate (network.cc:399, node.cc:319-325)
                stm_wl = (stm_q + 1.0) / 2.0
            else:
                stm_wl = (wdl[:, 0] - wdl[:, 2] + 1.0) / 2.0
            is_black = states.to_move == 0
            black_wl = jnp.where(is_black, stm_wl, 1.0 - stm_wl)
            black_score = jnp.where(is_black, stm_score, -stm_score)
            black_ownership = (
                ownership * jnp.where(is_black, 1.0, -1.0)[:, None]
            )
            return NetEvals(
                priors=priors,
                black_wl=black_wl,
                draw=wdl[:, 1],
                black_score=black_score,
                black_ownership=black_ownership,
            )

        if symmetry == "average":
            # Network::kAverage (network.cc:258-283): evaluate all 8
            # symmetries, average the ACTIVATED outputs
            acc = None
            for s in range(8):
                out = net.apply(
                    variables, S.transform_planes(planes, s), train=False
                )
                ev = postprocess(
                    S.inverse_transform_policy(out[policy_head], s, n),
                    out["wdl"],
                    out["scores"][:, 0],
                    S.inverse_transform_policy(out["ownership"], s, n),
                    out["q_vals"][:, 0],
                )
                acc = ev if acc is None else jax.tree.map(
                    lambda a, b: a + b, acc, ev
                )
            acc = jax.tree.map(lambda a: a / 8.0, acc)
            # renormalize the averaged priors over legal moves
            pri = jnp.where(legal, acc.priors, 0.0)
            pri = pri / jnp.maximum(jnp.sum(pri, -1, keepdims=True), 1e-12)
            return finish(acc._replace(priors=pri))

        if symmetry == "random":
            # Network::kRandom (network.cc:243-245, node.cc:146): one
            # dihedral transform per query, drawn from the position hash
            if ctx is not None and "sym" in ctx:
                syms = ctx["sym"]
            else:
                syms = S.random_symmetries(states, sym_seed)
            planes = S.transform_planes_batch(planes, syms)
            out = net.apply(variables, planes, train=False)
            return finish(postprocess(
                S.inverse_transform_policy_batch(out[policy_head], syms, n),
                out["wdl"],
                out["scores"][:, 0],
                S.inverse_transform_policy_batch(out["ownership"], syms, n),
                out["q_vals"][:, 0],
            ))

        if symmetry:
            planes = S.transform_planes(planes, symmetry)
        out = net.apply(variables, planes, train=False)
        prob = out[policy_head]
        ownership = out["ownership"]
        if symmetry:
            prob = S.inverse_transform_policy(prob, symmetry, n)
            ownership = S.inverse_transform_policy(ownership, symmetry, n)
        return finish(
            postprocess(prob, out["wdl"], out["scores"][:, 0], ownership,
                        out["q_vals"][:, 0])
        )

    return eval_fn


def make_dummy_eval_fn(env: GoEnv, rng_seed: int = 0,
                       suppress_pass_factor: float = 0.0):
    """Random-output evaluator for weightless runs (DummyForward,
    network.cc:144-165): uniform-ish random legal priors, ~0.5 value."""

    def eval_fn(states: GoState, ctx=None) -> NetEvals:
        b = states.stones.shape[0]
        legal = jax.vmap(env.legal_action_mask)(states)
        # fold the position hash into the noise so it is deterministic
        # per position (keeps search results reproducible)
        noise = jax.vmap(
            lambda h: jax.random.uniform(
                jax.random.wrap_key_data(h), (env.num_actions,)
            )
        )(states.hash)
        priors = jnp.where(legal, 0.5 + noise, 0.0)
        priors = priors / jnp.maximum(
            jnp.sum(priors, axis=-1, keepdims=True), 1e-9
        )
        if suppress_pass_factor > 0.0:
            priors = suppress_pass(
                priors, legal, states.size, suppress_pass_factor
            )
        return NetEvals(
            priors=priors,
            black_wl=jnp.full((b,), 0.5),
            draw=jnp.zeros((b,)),
            black_score=jnp.zeros((b,)),
            black_ownership=jnp.zeros((b, env.n * env.n)),
        )

    return eval_fn
