"""Monte-Carlo rollout fallback (the reference's `--use-rollout`,
/root/reference/src/mcts/rollout.h + node.cc:342-347): when enabled,
the NN's ownership map is replaced by the ownership of ONE random
playout from the evaluated position.

The playout policy re-derives GameState::PlayRandomMove
(game_state.cc:523-589) as fully-batched mask arithmetic:
prioritized move classes sampled with the same roulette probabilities —
capture 90%, atari 90%, escape 90% (each skipping self-atari), else a
uniform legal move that does not fill a real one-point eye. The
reference's 95% pattern3 tier is folded into the uniform tier
(documented deviation: Pachi 3x3 source patterns are a playout-quality
heuristic, not a behavioral contract; the reference itself labels the
rollout optional dead-reckoning for weightless runs).

Tactical predicates are exact re-derivations of board.cc:822-898:
- IsCaptureMove:   empty point adjacent to an opponent chain in atari
- IsAtariMove:     legal point adjacent to an opponent 2-liberty chain
- IsEscapeMove:    legal point adjacent to an own chain in atari
- IsSelfAtariMove: |union of merged-chain liberties| + pseudo-libs == 1
  (the merged-liberty union is a boolean [HW, HW] reachability product —
  MXU work instead of the reference's per-string list walk)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sayuri_tpu.game import board as B
from sayuri_tpu.game.state import GoEnv, GoState
from sayuri_tpu.game.types import EMPTY


def tactical_masks(stones, size, legal, to_move):
    """[nn]-flat bool masks {capture, atari, escape, self_atari,
    simple_eye} for `to_move` on one board. All inputs single-board."""
    n = stones.shape[-1]
    nn = n * n
    mask = B.board_mask(size, n)
    empty = (stones == EMPTY) & mask
    own = (stones == to_move + 1) & mask
    opp = (stones == 2 - to_move) & mask

    lbl_own = B.chain_labels(own)
    lbl_opp = B.chain_labels(opp)
    libs_own = B.chain_liberty_counts(lbl_own, empty)
    libs_opp = B.chain_liberty_counts(lbl_opp, empty)

    def nbr_chain_libs_eq(lbl, libs, k):
        """[n, n] bool: some orthogonally-adjacent chain of `lbl` has
        exactly k liberties."""
        nbr = B._neighbor_labels(lbl)                # [4, n, n]
        safe = jnp.clip(nbr, 0, nn - 1)
        hit = (nbr >= 0) & (libs[safe.reshape(4, -1)].reshape(nbr.shape) == k)
        return hit.any(axis=0)

    capture = empty & nbr_chain_libs_eq(lbl_opp, libs_opp, 1)
    atari = legal & nbr_chain_libs_eq(lbl_opp, libs_opp, 2)
    escape = legal & nbr_chain_libs_eq(lbl_own, libs_own, 1)

    # IsSimpleEye (board.cc:900-902): every orthogonal neighbor own or
    # off-board; IsRealEye additionally constrains diagonals
    # (board.cc:904-936) — PlayRandomMove's eye filter uses IsSimpleEye.
    orth_ok = (
        (B.shift(own, 1, 0, False) | ~B.shift(mask, 1, 0, False))
        & (B.shift(own, -1, 0, False) | ~B.shift(mask, -1, 0, False))
        & (B.shift(own, 0, 1, False) | ~B.shift(mask, 0, 1, False))
        & (B.shift(own, 0, -1, False) | ~B.shift(mask, 0, -1, False))
    )
    simple_eye = empty & orth_ok

    # --- IsSelfAtariMove (board.cc:822-849) ---
    # self_libs: empty orthogonal neighbors + per-direction capture credit
    pl = (
        B.shift(empty, 1, 0, False).astype(jnp.int32)
        + B.shift(empty, -1, 0, False)
        + B.shift(empty, 0, 1, False)
        + B.shift(empty, 0, -1, False)
    )
    nbr_opp = B._neighbor_labels(lbl_opp)
    safe_o = jnp.clip(nbr_opp, 0, nn - 1)
    cap_credit = (
        (nbr_opp >= 0)
        & (libs_opp[safe_o.reshape(4, -1)].reshape(nbr_opp.shape) <= 1)
    ).sum(axis=0)
    self_libs = pl + cap_credit

    # potential_libs: |union over own chains adjacent to v of their
    # liberties| excluding v itself. adj[v, c] @ lib_inc[c, u] as a
    # boolean matmul over chain-root slots.
    nbr_own = B._neighbor_labels(lbl_own)            # [4, n, n]
    adj = jnp.zeros((nn, nn), jnp.float32)
    v_idx = B.flat_iota(n).reshape(-1)
    for d in range(4):
        c = nbr_own[d].reshape(-1)
        adj = adj.at[v_idx, jnp.clip(c, 0, nn - 1)].max(
            (c >= 0).astype(jnp.float32)
        )
    lib_inc = jnp.zeros((nn, nn), jnp.float32)       # [chain, u]
    nbr_own_at_empty = jnp.where(empty[None], nbr_own, -1)
    u_idx = v_idx
    for d in range(4):
        c = nbr_own_at_empty[d].reshape(-1)
        lib_inc = lib_inc.at[jnp.clip(c, 0, nn - 1), u_idx].max(
            (c >= 0).astype(jnp.float32)
        )
    merged = (adj @ lib_inc) > 0.5                   # [v, u] liberty union
    merged = merged & ~jnp.eye(nn, dtype=bool)       # exclude v itself
    potential = merged.sum(axis=-1).reshape(n, n)
    self_atari = legal & ((potential + self_libs) == 1)

    flat = lambda m: m.reshape(-1)
    return {
        "capture": flat(capture & legal),
        "atari": flat(atari),
        "escape": flat(escape),
        "self_atari": flat(self_atari),
        "simple_eye": flat(simple_eye),
    }


def _pick(rng, mask):
    """Uniform random true index of [A] bool mask (or 0 if none)."""
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jnp.where(
        mask.any(), jax.random.categorical(rng, logits), 0
    ).astype(jnp.int32)


def random_move_batch(env: GoEnv, states: GoState, rng):
    """[B] prioritized random move per lane (PlayRandomMove,
    game_state.cc:523-589). Terminated lanes get pass."""
    n = env.n
    nn = n * n
    b = states.stones.shape[0]
    legal_full = jax.vmap(env.legal_action_mask)(states)  # [B, nn+1]
    legal = legal_full[:, :nn].reshape(b, n, n)

    masks = jax.vmap(tactical_masks)(
        states.stones, states.size, legal, states.to_move
    )
    no_sa = ~masks["self_atari"]
    tiers = jnp.stack(
        [
            masks["capture"],
            masks["atari"] & no_sa,
            masks["escape"] & no_sa,
            # uniform tier: legal minus pointless eye fills
            legal.reshape(b, nn)
            & ~(
                masks["simple_eye"]
                & ~masks["capture"]
                & ~masks["escape"]
            ),
        ],
        axis=1,
    )                                                # [B, 4, nn]

    k_r, k_c = jax.random.split(rng)
    roll = jax.random.uniform(k_r, (b, 3))
    want = jnp.stack(
        [roll[:, 0] < 0.9, roll[:, 1] < 0.9, roll[:, 2] < 0.9],
        axis=1,
    )
    usable = tiers.any(axis=-1)                      # [B, 4]
    take = jnp.concatenate(
        [want & usable[:, :3], usable[:, 3:4]], axis=1
    )
    tier = jnp.argmax(take, axis=1)                  # first usable tier
    chosen = jnp.take_along_axis(
        tiers, tier[:, None, None], axis=1
    )[:, 0]                                          # [B, nn]
    keys = jax.random.split(k_c, b)
    mv = jax.vmap(_pick)(keys, chosen)
    mv = jnp.where(chosen.any(axis=-1), mv, nn)      # pass if nothing
    return jnp.where(states.terminated, nn, mv).astype(jnp.int32)


def mc_ownership(env: GoEnv, states: GoState, rng, max_moves=None):
    """([B, nn] ownership in {-1,0,+1}, [B] black score) from ONE random
    playout per lane (GetBlackRolloutResult, rollout.h:31-77)."""
    nn = env.n * env.n
    cap = max_moves if max_moves is not None else 2 * nn + 1

    def body(i, carry):
        st, key = carry
        key, k = jax.random.split(key)
        mv = random_move_batch(env, st, k)
        st, _ = env.step_batch_with_analysis(st, mv)
        return st, key

    final, _ = lax.fori_loop(0, cap, body, (states, rng))
    own = jax.vmap(lambda s: B.area_ownership(s.stones, s.size))(final)
    own = own.reshape(own.shape[0], -1).astype(jnp.float32)
    score = own.sum(axis=-1) - jax.vmap(env.komi_with_penalty)(states)
    return own, score


def wrap_eval_with_rollout(env: GoEnv, base_eval_fn, max_moves=None):
    """Evaluator wrapper: replace NN/dummy black_ownership with the MC
    rollout ownership (node.cc:342-347 under --use-rollout). The RNG is
    folded from the position hashes so searches stay deterministic."""

    def eval_fn(states: GoState, ctx=None):
        evals = base_eval_fn(states, ctx)
        seed = jnp.sum(states.hash[:, 0]).astype(jnp.uint32)
        rng = jax.random.fold_in(
            jax.random.PRNGKey(0), seed
        )
        own, _ = mc_ownership(env, states, rng, max_moves=max_moves)
        return evals._replace(black_ownership=own)

    return eval_fn
