"""Device-resident NN evaluation cache with miss compaction.

The reference probes a fixed-capacity hash cache of network outputs before
every forward and inserts after (/root/reference/src/utils/cache.h:42-60,
src/neural/network.cc:102-121).  A lockstep batched search cannot "skip"
one lane's forward, so the TPU-native equivalent does two things:

1. a **direct-mapped per-lane cache** in HBM (keys + NetEvals fields as
   dense arrays) probed with pure gathers under jit; and
2. **miss compaction**: hit / frozen / terminal lanes are dropped from the
   forward by permuting misses to the front and running the encoder+net on
   the smallest power-of-two row bucket that covers them (`lax.cond`
   ladder — each bucket is its own compiled tower, only one runs).  With
   playout-cap randomization most lanes freeze early, so late simulations
   run the net at B/4 or B/8 instead of B.

The key covers everything the encoder reads except the 8-move history
planes and wave: position+side hash, ko, komi, scoring rule, board size.
The reference's cache key has the same blind spot for history (its
GetHash() ignores move order too) — two paths transposing into one
position share an entry even though their history planes differ slightly.

Cache entries therefore stay valid across games, moves and tree reuse —
but NOT across weight reloads; callers must `clear()` on new weights
(the reference reallocates its cache there, network.cc:102-121).

Counters double as the REAL query accounting the Elo-per-FLOP north star
needs (network.h:44-45): `queries` = evaluations requested by live lanes,
`hits` = cache hits among them, `forward_rows` = rows actually run
through the net (padded bucket rows included — the honest FLOP count).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from flax import struct

from sayuri_tpu.game import board as B
from sayuri_tpu.game.state import GoState


@struct.dataclass
class NNCache:
    keys: jnp.ndarray       # [B, C, 2] uint32
    valid: jnp.ndarray      # [B, C] bool
    priors: jnp.ndarray     # [B, C, A] f32
    wl: jnp.ndarray         # [B, C] f32 (black)
    draw: jnp.ndarray       # [B, C] f32
    score: jnp.ndarray      # [B, C] f32 (black)
    ownership: jnp.ndarray  # [B, C, HW] f32 (black)
    queries: jnp.ndarray    # [B] i32 — requested evals (live lanes)
    hits: jnp.ndarray       # [B] i32 — cache hits among them
    forward_rows: jnp.ndarray  # [] i32 — net rows actually computed

    @property
    def capacity(self) -> int:
        return self.keys.shape[1]


def make_cache(batch: int, capacity: int, num_actions: int, hw: int) -> NNCache:
    return NNCache(
        keys=jnp.zeros((batch, capacity, 2), jnp.uint32),
        valid=jnp.zeros((batch, capacity), bool),
        priors=jnp.zeros((batch, capacity, num_actions), jnp.float32),
        wl=jnp.zeros((batch, capacity), jnp.float32),
        draw=jnp.zeros((batch, capacity), jnp.float32),
        score=jnp.zeros((batch, capacity), jnp.float32),
        ownership=jnp.zeros((batch, capacity, hw), jnp.float32),
        queries=jnp.zeros((batch,), jnp.int32),
        hits=jnp.zeros((batch,), jnp.int32),
        forward_rows=jnp.zeros((), jnp.int32),
    )


def clear(cache: NNCache) -> NNCache:
    """Invalidate all entries (keep the counters): call on weight reload."""
    return cache.replace(valid=jnp.zeros_like(cache.valid))


def state_keys(states: GoState) -> jnp.ndarray:
    """[B, 2] uint32 cache keys: situation hash + metadata fold.

    Folds ko, komi (x2 quantized), rule and board size on top of the
    position+side-to-move Zobrist — the inputs that change the encoder
    planes (komi/rule/size are per-game scalars, so entries survive game
    boundaries only when genuinely comparable)."""
    n = states.stones.shape[-1]
    # position hash is maintained incrementally by the step kernels
    # (states.hash); fold in the side-to-move key to get situation_hash
    # without re-reducing the board (board.py situation_hash semantics)
    _, stm = B._zobrist_tables(n)
    h = states.hash ^ stm[:, states.to_move].T  # [B, 2]
    mix = (
        (states.ko + 2).astype(jnp.uint32) * jnp.uint32(2654435761)
        ^ (states.komi * 2.0).astype(jnp.int32).astype(jnp.uint32)
        * jnp.uint32(40503)
        ^ states.rule.astype(jnp.uint32) * jnp.uint32(2246822519)
        ^ states.size.astype(jnp.uint32) * jnp.uint32(3266489917)
    )
    # spread the fold over both lanes with different rotations
    k0 = h[:, 0] ^ mix
    k1 = h[:, 1] ^ ((mix << 13) | (mix >> 19))
    return jnp.stack([k0, k1], axis=-1)


def _slot(keys: jnp.ndarray, capacity: int) -> jnp.ndarray:
    return (keys[:, 0] % jnp.uint32(capacity)).astype(jnp.int32)


def probe(cache: NNCache, keys: jnp.ndarray):
    """-> (hit [B] bool, NetEvals-field tuple gathered from the cache)."""
    b_idx = jnp.arange(keys.shape[0])
    idx = _slot(keys, cache.capacity)
    hit = cache.valid[b_idx, idx] & jnp.all(
        cache.keys[b_idx, idx] == keys, axis=-1
    )
    return hit, (
        cache.priors[b_idx, idx],
        cache.wl[b_idx, idx],
        cache.draw[b_idx, idx],
        cache.score[b_idx, idx],
        cache.ownership[b_idx, idx],
    )


def insert(cache: NNCache, keys: jnp.ndarray, evals, mask) -> NNCache:
    """Scatter `evals` (NetEvals) into the cache for lanes where `mask`.

    Direct-mapped overwrite = the generation eviction of cache.h: the
    newest entry for a slot wins."""
    b = keys.shape[0]
    b_idx = jnp.arange(b)
    idx = _slot(keys, cache.capacity)
    # masked-out lanes redirect their write to their current slot content
    def upd(buf, vals):
        cur = buf[b_idx, idx]
        shaped = mask.reshape((b,) + (1,) * (vals.ndim - 1))
        return buf.at[b_idx, idx].set(jnp.where(shaped, vals, cur))

    return cache.replace(
        keys=upd(cache.keys, keys),
        valid=upd(cache.valid, jnp.ones((b,), bool)),
        priors=upd(cache.priors, evals.priors.astype(jnp.float32)),
        wl=upd(cache.wl, evals.black_wl.astype(jnp.float32)),
        draw=upd(cache.draw, evals.draw.astype(jnp.float32)),
        score=upd(cache.score, evals.black_score.astype(jnp.float32)),
        ownership=upd(
            cache.ownership, evals.black_ownership.astype(jnp.float32)
        ),
    )


def cached_eval(
    cache: NNCache,
    eval_fn,
    states: GoState,
    ctx: Any,
    live=None,
    buckets=(8, 4, 2),
):
    """Evaluate `states` through the cache. -> (NetEvals, NNCache).

    `live` ([B] bool): lanes whose output will actually be consumed
    (active and non-terminal); dead lanes are excluded from the forward
    and from the query counters.  `buckets`: divisors of B to try for the
    compacted forward, smallest batch first.
    """
    from sayuri_tpu.mcts.core import NetEvals  # circular-safe at call time

    b = states.stones.shape[0]
    if live is None:
        live = jnp.ones((b,), bool)

    keys = state_keys(states)
    hit, cached = probe(cache, keys)
    hit = hit & live
    need = live & ~hit                      # rows that must hit the net
    n_need = jnp.sum(need.astype(jnp.int32))

    # misses to the front (stable: preserves lane order within groups)
    perm = jnp.argsort(jnp.where(need, 0, 1), stable=True)
    inv_scatter = perm  # rows r of the compact eval -> lane perm[r]

    def rows(x, r):
        return jax.tree.map(lambda a: a[perm][:r], x)

    def run_bucket(r):
        def f(_):
            ev = eval_fn(rows(states, r), rows(ctx, r))

            def expand(a):
                out = jnp.zeros((b,) + a.shape[1:], a.dtype)
                return out.at[inv_scatter[:r]].set(a)

            return jax.tree.map(expand, ev), jnp.int32(r)

        return f

    # lax.cond ladder, lazily nested: the smallest covering bucket is the
    # ONLY tower that executes (each bucket compiles its own conv tower)
    sizes = sorted({b} | {b // d for d in buckets if b // d >= 1})

    def level(i):
        r = sizes[i]
        if i == len(sizes) - 1:
            return run_bucket(r)
        return lambda _: lax.cond(
            n_need <= r, run_bucket(r), level(i + 1), None
        )

    def no_misses(_):
        zero = NetEvals(
            priors=jnp.zeros((b, cache.priors.shape[-1]), jnp.float32),
            black_wl=jnp.zeros((b,), jnp.float32),
            draw=jnp.zeros((b,), jnp.float32),
            black_score=jnp.zeros((b,), jnp.float32),
            black_ownership=jnp.zeros(
                (b, cache.ownership.shape[-1]), jnp.float32
            ),
        )
        return zero, jnp.int32(0)

    evals, rows_run = lax.cond(n_need == 0, no_misses, level(0), None)

    merged = NetEvals(
        priors=jnp.where(hit[:, None], cached[0], evals.priors),
        black_wl=jnp.where(hit, cached[1], evals.black_wl),
        draw=jnp.where(hit, cached[2], evals.draw),
        black_score=jnp.where(hit, cached[3], evals.black_score),
        black_ownership=jnp.where(
            hit[:, None], cached[4], evals.black_ownership
        ),
    )
    cache = insert(cache, keys, merged, need)
    cache = cache.replace(
        queries=cache.queries + live.astype(jnp.int32),
        hits=cache.hits + hit.astype(jnp.int32),
        forward_rows=cache.forward_rows + rows_run,
    )
    return merged, cache
