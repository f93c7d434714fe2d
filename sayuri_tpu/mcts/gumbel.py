"""Gumbel / Sequential-Halving root selection and completed-Q targets.

Vectorized re-derivation of the reference's reuse-tolerant Gumbel search
(/root/reference/src/mcts/node.cc:1476-1841):

- ProcessGumbelLogits walks a Sequential-Halving allocation over the
  visit-sorted children until it finds the first slot whose SH quota is not
  yet covered by existing visits (this is what makes it tolerate tree reuse,
  node.cc:1689-1726). The walk order is DATA-INDEPENDENT given the config,
  so here it is precomputed as a static (slot, occurrence) sequence and the
  search becomes one gather + argmax instead of a loop.
- Candidates are all children whose visit count equals the target; the
  winner maximizes gumbel + log(prior) + sigma(completed-Q), with
  sigma(q) = (c_visit + min(thres, max_visits)) * c_scale * q
  (node.cc:1476-1484) and completed-Q = WL + score utility
  (GetGumbelEval, node.cc:1467-1474).
- MixLogitsCompletedQ produces the improved policy target: softmax of
  log(prior) + sigma(completed-Q) with approximate-Q fill for unvisited
  children and small-probability pruning (node.cc:1504-1600).

Like the reference, FRESH Gumbel noise is drawn at every selection and at
the final move pick (std::extreme_value_distribution constructed inside
ProcessGumbelLogits, node.cc:1734) — folded from tree.gumbel_key by
simulation index. SearchConfig.gumbel_per_selection=False restores the
original Gumbel-AlphaZero formulation (one draw per search, stored in
tree.root_gumbel); the A/B harness (tools/ab_match.py) measures the two
against each other.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _selection_gumbel(mcts, tree, sim_idx):
    """[B, A] Gumbel noise for this selection: fresh per sim_idx when
    gumbel_per_selection (sim_idx=None tags the final move pick)."""
    if not mcts.cfg.gumbel_per_selection:
        return tree.root_gumbel
    key = tree.gumbel_key[0]
    tag = 0x00BE57 if sim_idx is None else sim_idx
    return jax.random.gumbel(
        jax.random.fold_in(key, tag), tree.root_gumbel.shape
    )


@functools.lru_cache(maxsize=None)
def sh_sequence(considered_moves: int, prom_visits: int, threshold: int):
    """Static SH walk: (slot_rank[t], occurrence_count[t]) for t < threshold
    (the loop at node.cc:1697-1726)."""
    n = int(math.log2(max(1, considered_moves))) + 1
    width0 = 2 ** (n - 1)
    seq = []
    width, level = width0, max(1, prom_visits)
    while len(seq) < threshold:
        for _ in range(level):
            for j in range(width):
                seq.append(j)
                if len(seq) >= threshold:
                    break
            if len(seq) >= threshold:
                break
        if len(seq) >= threshold:
            break
        if width == 1:
            width, level = width0, max(1, prom_visits)
        else:
            width //= 2
            level *= 2
    seq = np.asarray(seq[:threshold], np.int32)
    occ = np.zeros_like(seq)
    counts = {}
    for t, j in enumerate(seq):
        counts[j] = counts.get(j, 0) + 1
        occ[t] = counts[j]
    # NOTE: numpy (not jnp) on purpose — this function is called inside jit
    # traces and is lru_cached, so returning traced constants would leak
    # tracers across traces.
    return seq, occ


def _child_gumbel_eval(mcts, tree, color):
    """GetGumbelEval per child: WL(color) + score utility (node.cc:1467),
    read from the root children's node stats (one MXU gather)."""
    g, _ = mcts._child_stats(tree)             # [B, A, 8]
    nv = g[..., 0]
    wl_b = g[..., 1] / jnp.maximum(nv, 1.0)
    wl = jnp.where(color[:, None] == 0, wl_b, 1.0 - wl_b)
    sign = jnp.where(color[:, None] == 0, 1.0, -1.0)
    se = sign * g[..., 6]
    return jnp.where(nv > 0, wl + se, 0.0), nv.astype(jnp.int32)


def _sigma(mcts, q, max_visits):
    cfg = mcts.cfg
    thres = cfg.gumbel_playouts_threshold  # config.cc:104
    return (
        (cfg.gumbel_c_visit + jnp.minimum(thres, max_visits))
        * cfg.gumbel_c_scale
        * q
    )


def root_scores(mcts, tree, sim_idx=None):
    """[B, A] Gumbel-SH selection scores at the root, -inf outside the
    candidate set; lanes where the SH budget is exhausted return all -inf so
    the caller falls back to PUCT (ProcessGumbelLogits returning false)."""
    cfg = mcts.cfg
    b = tree.stats.shape[0]
    b_idx = jnp.arange(b)
    A = tree.num_actions
    thres = cfg.gumbel_playouts_threshold

    prior = tree.prior[:, 0]
    legal = prior > 0
    color = tree.states.to_move[:, 0]

    q, nv = _child_gumbel_eval(mcts, tree, color)
    visits = jnp.where(legal, nv, -1)
    # visit-sorted (desc) table over legal children (node.cc:1662)
    sorted_v = -jnp.sort(-jnp.where(legal, visits, -1), axis=-1)
    max_visits = jnp.maximum(sorted_v[:, 0], 0)

    seq, occ = sh_sequence(
        min(cfg.gumbel_considered_moves, A), cfg.gumbel_prom_visits, thres
    )
    c_at_seq = sorted_v[:, seq]                        # [B, thres]
    cond = (occ[None, :] > c_at_seq) & (c_at_seq >= 0)
    active = jnp.any(cond, axis=-1)
    t_star = jnp.argmax(cond, axis=-1)
    target = c_at_seq[b_idx, t_star]                   # [B]

    sig = jnp.where(nv > 0, _sigma(mcts, q, max_visits[:, None]), 0.0)
    gumbel = _selection_gumbel(mcts, tree, sim_idx)
    logits = gumbel + jnp.log(jnp.maximum(prior, 1e-25)) + sig

    cand = legal & (visits == target[:, None])
    return jnp.where(cand & active[:, None], logits, -jnp.inf)


def completed_q_policy(mcts, tree):
    """[B, A] improved policy target via completed-Q mixing
    (MixLogitsCompletedQ, node.cc:1504-1600)."""
    b = tree.visits.shape[0]
    b_idx = jnp.arange(b)
    A = tree.num_actions

    prior = tree.prior[:, 0]
    legal = prior > 0
    color = tree.states.to_move[:, 0]

    q, nv = _child_gumbel_eval(mcts, tree, color)
    cv = jnp.sum(nv, axis=-1)
    max_visits = jnp.max(nv, axis=-1)
    weighted_q = jnp.sum(jnp.where(nv > 0, prior * q, 0.0), axis=-1)
    weighted_pi = jnp.sum(jnp.where(nv > 0, prior, 0.0), axis=-1)

    raw = jnp.where(
        color == 0, tree.net_wl[b_idx, 0], 1.0 - tree.net_wl[b_idx, 0]
    )
    approx_q = (
        raw
        + jnp.where(
            weighted_pi > 0, cv.astype(jnp.float32) / weighted_pi, 0.0
        )
        * weighted_q
    ) / (1.0 + cv.astype(jnp.float32))

    completed = jnp.where(nv > 0, q, approx_q[:, None])
    logits = jnp.log(jnp.maximum(prior, 1e-25)) + _sigma(
        mcts, completed, max_visits[:, None]
    )
    logits = jnp.where(legal, logits, -jnp.inf)
    p = _softmax(logits)

    # prune negligible probabilities (node.cc:1583-1599)
    thresh = 1.0 / (100.0 + A)
    p = jnp.where(p >= thresh, p, 0.0)
    return p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-12)


def gumbel_move(mcts, tree, allow_pass):
    """[B] best move after a Gumbel search (GetGumbelMove,
    node.cc:1798-1822): among max-visit children, argmax of
    gumbel + log(prior) + sigma(Q)."""
    b = tree.visits.shape[0]
    b_idx = jnp.arange(b)
    A = tree.num_actions
    pass_a = A - 1

    prior = tree.prior[:, 0]
    legal = prior > 0
    color = tree.states.to_move[:, 0]

    q, nv = _child_gumbel_eval(mcts, tree, color)
    max_visits = jnp.max(jnp.where(legal, nv, 0), axis=-1)
    sig = jnp.where(nv > 0, _sigma(mcts, q, max_visits[:, None]), 0.0)
    gumbel = _selection_gumbel(mcts, tree, None)
    logits = gumbel + jnp.log(jnp.maximum(prior, 1e-25)) + sig

    cand = legal & (nv == max_visits[:, None]) & (max_visits[:, None] > 0)
    scores = jnp.where(cand, logits, -jnp.inf)

    num_candidates = jnp.sum((nv > 0) & legal, axis=-1)
    allow = allow_pass | (num_candidates <= 1)
    no_pass_scores = scores.at[:, pass_a].set(-jnp.inf)
    has_np = jnp.any(jnp.isfinite(no_pass_scores), axis=-1)
    use_np = ~allow & has_np
    best = jnp.where(
        use_np,
        jnp.argmax(no_pass_scores, axis=-1),
        jnp.argmax(scores, axis=-1),
    )
    return best.astype(jnp.int32)


def _softmax(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(logits - m)
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-12)
