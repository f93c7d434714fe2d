"""Device-resident shared NN evaluation cache with miss compaction.

The reference probes a fixed-capacity hash cache of network outputs before
every forward and inserts after (/root/reference/src/utils/cache.h:42-60,
src/neural/network.cc:102-121).  A lockstep batched search cannot "skip"
one lane's forward, so the TPU-native equivalent does three things:

1. a **shared set-associative cache** in HBM (keys + NetEvals fields as
   dense arrays [sets, ways, ...]) probed with pure gathers under jit.
   The cache is shared across ALL lanes — openings and transpositions hit
   across games, exactly the case the reference's process-wide cache
   catches (cache.h:42-60).  2-way association with insertion-generation
   eviction stops the unconditional slot-collision evictions of a
   direct-mapped table (the analogue of cache.h's generation eviction).
2. **cross-lane dedup**: lanes querying the SAME position in one batch
   (synchronized openings, transposed searches) are collapsed to one
   forward row; the duplicates copy the representative's outputs.
3. **miss compaction**: hit / duplicate / frozen / terminal lanes are
   dropped from the forward by permuting unique misses to the front and
   running the encoder+net on the smallest power-of-two row bucket that
   covers them (`lax.cond` ladder — each bucket is its own compiled
   tower, only one runs).  With playout-cap randomization most lanes
   freeze early, so late simulations run the net at B/4 or B/8 instead
   of B.

The key covers everything the encoder reads except the 8-move history
planes, wave, and root-amortized ladder planes: position+side hash, ko,
komi, scoring rule, board size.  The reference's cache key has the same
blind spot for history (its GetHash() ignores move order too) — two paths
transposing into one position share an entry even though their history
planes differ slightly.

Entries stay valid across games, moves and tree reuse — but NOT across
weight reloads; callers must `clear()` on new weights (the reference
reallocates its cache there, network.cc:102-121).

Counters double as the REAL query accounting the Elo-per-FLOP north star
needs (network.h:44-45): `queries` = evaluations requested by live lanes,
`hits` = cache hits among them, `dups` = in-batch duplicates served from a
representative row, `forward_rows` = rows actually run through the net
(padded bucket rows included — the honest FLOP count).
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
    keys: jnp.ndarray       # [S, W, 2] uint32
    valid: jnp.ndarray      # [S, W] bool
    age: jnp.ndarray        # [S, W] uint32 insertion generation
    tick: jnp.ndarray       # [] uint32 monotone generation counter
    priors: jnp.ndarray     # [S, W, A] f32
    wl: jnp.ndarray         # [S, W] f32 (black)
    draw: jnp.ndarray       # [S, W] f32
    score: jnp.ndarray      # [S, W] f32 (black)
    ownership: jnp.ndarray  # [S, W, HW] f32 (black)
    queries: jnp.ndarray    # [B] i32 — requested evals (live lanes)
    hits: jnp.ndarray       # [B] i32 — cache hits among them
    dups: jnp.ndarray       # [B] i32 — in-batch duplicate rows collapsed
    forward_rows: jnp.ndarray  # [] i32 — net rows actually computed

    @property
    def num_sets(self) -> int:
        return self.keys.shape[0]

    @property
    def num_ways(self) -> int:
        return self.keys.shape[1]


def make_cache(
    batch: int, capacity: int, num_actions: int, hw: int, ways: int = 2
) -> NNCache:
    """`capacity` = number of sets; total entries = capacity * ways.
    `batch` only sizes the per-lane accounting counters."""
    return NNCache(
        keys=jnp.zeros((capacity, ways, 2), jnp.uint32),
        valid=jnp.zeros((capacity, ways), bool),
        age=jnp.zeros((capacity, ways), jnp.uint32),
        tick=jnp.zeros((), jnp.uint32),
        priors=jnp.zeros((capacity, ways, num_actions), jnp.float32),
        wl=jnp.zeros((capacity, ways), jnp.float32),
        draw=jnp.zeros((capacity, ways), jnp.float32),
        score=jnp.zeros((capacity, ways), jnp.float32),
        ownership=jnp.zeros((capacity, ways, hw), jnp.float32),
        queries=jnp.zeros((batch,), jnp.int32),
        hits=jnp.zeros((batch,), jnp.int32),
        dups=jnp.zeros((batch,), jnp.int32),
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


def _slot(keys: jnp.ndarray, num_sets: int) -> jnp.ndarray:
    return (keys[:, 0] % jnp.uint32(num_sets)).astype(jnp.int32)


def probe(cache: NNCache, keys: jnp.ndarray):
    """-> (hit [B] bool, NetEvals-field tuple gathered from the cache)."""
    idx = _slot(keys, cache.num_sets)                 # [B]
    way_keys = cache.keys[idx]                        # [B, W, 2]
    match = cache.valid[idx] & jnp.all(
        way_keys == keys[:, None, :], axis=-1
    )                                                 # [B, W]
    hit = jnp.any(match, axis=-1)
    way = jnp.argmax(match, axis=-1)                  # [B]
    return hit, (
        cache.priors[idx, way],
        cache.wl[idx, way],
        cache.draw[idx, way],
        cache.score[idx, way],
        cache.ownership[idx, way],
    ), (idx, match)


def insert(cache: NNCache, keys: jnp.ndarray, evals, mask,
           probe_aux=None) -> NNCache:
    """Scatter `evals` (NetEvals) into the cache for lanes where `mask`.

    Victim way: an existing same-key way (refresh), else an invalid way,
    else the oldest generation (cache.h's generation eviction). Duplicate
    (set, way) writes in one batch resolve to one winner — a cache can
    drop racing inserts."""
    b = keys.shape[0]
    if probe_aux is not None:
        idx, match = probe_aux
    else:
        idx = _slot(keys, cache.num_sets)
        match = cache.valid[idx] & jnp.all(
            cache.keys[idx] == keys[:, None, :], axis=-1
        )
    vld = cache.valid[idx]                            # [B, W]
    ages = cache.age[idx]                             # [B, W]
    has_match = jnp.any(match, axis=-1)
    match_way = jnp.argmax(match, axis=-1)
    free_way = jnp.argmin(vld, axis=-1)               # first invalid way
    all_valid = jnp.all(vld, axis=-1)
    old_way = jnp.argmin(ages, axis=-1)
    way = jnp.where(
        has_match, match_way, jnp.where(all_valid, old_way, free_way)
    )

    # masked-out lanes scatter out of bounds and are dropped — in a SHARED
    # cache they may alias an inserting lane's (set, way) and a redirected
    # stale write could race out its fresh entry
    drop_idx = jnp.where(mask, idx, cache.num_sets)

    def upd(buf, vals):
        return buf.at[drop_idx, way].set(vals, mode="drop")

    new_tick = cache.tick + jnp.uint32(1)
    return cache.replace(
        keys=upd(cache.keys, keys),
        valid=upd(cache.valid, jnp.ones((b,), bool)),
        age=upd(cache.age, jnp.broadcast_to(new_tick, (b,))),
        tick=new_tick,
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
    buckets=(16, 8, 4, 2),
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
    hit, cached, probe_aux = probe(cache, keys)
    hit = hit & live
    miss = live & ~hit

    # cross-lane dedup: collapse identical keys among missing rows to one
    # representative forward row (first missing lane with that key)
    eq = jnp.all(keys[:, None, :] == keys[None, :, :], axis=-1)  # [B, B]
    cand = eq & miss[None, :]
    rep = jnp.argmax(cand, axis=1)                    # [B] first missing twin
    lane = jnp.arange(b)
    need = miss & (rep == lane)                       # unique missing rows
    dup = miss & (rep != lane)
    n_need = jnp.sum(need.astype(jnp.int32))

    # unique misses to the front (stable: preserves lane order in groups)
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

    # duplicates copy their representative's fresh output
    def fill_dups(a):
        picked = a[rep]
        shaped = dup.reshape((b,) + (1,) * (a.ndim - 1))
        return jnp.where(shaped, picked, a)

    evals = jax.tree.map(fill_dups, evals)

    merged = NetEvals(
        priors=jnp.where(hit[:, None], cached[0], evals.priors),
        black_wl=jnp.where(hit, cached[1], evals.black_wl),
        draw=jnp.where(hit, cached[2], evals.draw),
        black_score=jnp.where(hit, cached[3], evals.black_score),
        black_ownership=jnp.where(
            hit[:, None], cached[4], evals.black_ownership
        ),
    )
    cache = insert(cache, keys, merged, need, probe_aux)
    cache = cache.replace(
        queries=cache.queries + live.astype(jnp.int32),
        hits=cache.hits + hit.astype(jnp.int32),
        dups=cache.dups + dup.astype(jnp.int32),
        forward_rows=cache.forward_rows + rows_run,
    )
    return merged, cache
