"""Device-side pattern-gammas policy: per-expansion mixing under jit.

The reference mixes the pattern-gammas policy into the NN policy at EVERY
node expansion (/root/reference/src/mcts/node.cc:151-160):

    p[v] = (1-f) * nn[v] + f * (1 - pass_prob) * gammas_policy[v]

with the gammas policy computed per position from spatial pattern hashes +
tactical features, scaled by NN ownership through Pachi's MC-owner table
(GameState::GetGammasPolicy, game_state.cc:620-640).

The host GammasDict (pattern/gammas.py) is a Python dict probed per vertex
— fine for the once-per-search root mix but unusable inside the fused leaf
batch. This module compiles the dict into a device-resident open-addressed
hash table and computes the full gammas policy for a [B] batch of boards
as a fixed-shape jit program:

- canonical spatial keys: 24 static board shifts (the dist-3 diamond) +
  8 per-symmetry base-4 packings (each symmetry permutes the SAME shifted
  code maps), lexicographic min over the 8 — byte-identical to the host
  pattern.pattern_key() ordering;
- keys are 52-bit ((base4 << 4) | dist) and JAX defaults to 32-bit, so
  keys live as (hi, lo) uint32 lane pairs (first 12 digits / last 12
  digits + dist nibble), like the board Zobrist hashes;
- tactical features (dist-to-last-move, adjacent atari / 2-libs chains)
  come from the chain-liberty map the fused analysis kernel already
  produces for the encoder, so per-expansion mixing adds no extra flood;
- the dict lookup is a bounded linear probe (miss -> gamma 1.0, exactly
  the host table.get(key, 1.0)).

Cache interaction: eval results are cached POST-mix (the mixed policy is
a deterministic function of the position), whereas the reference caches
the raw net output and re-mixes on every probe (node.cc:157 after
network.GetOutput) — same fixed point, fewer host ops.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from sayuri_tpu.pattern import pattern as P
from sayuri_tpu.pattern.gammas import GammasDict

_MAX_PROBE = 16
_OFFBOARD = 3  # cell code for off-board, pattern.py _cell_code


_C1 = np.uint32(2654435761)
_C2 = np.uint32(2246822519)


def _mix_hash(hi, lo):
    """uint32 slot hash; identical numpy/jnp arithmetic (both wrap).
    Constants are pre-wrapped np.uint32: a bare literal > 2^31 fails
    jax's weak int32 typing."""
    h = hi * _C1 ^ lo * _C2
    h = h ^ (h >> 15)
    h = h * _C1
    h = h ^ (h >> 13)
    return h


def _split_key(key: int):
    """Host pattern_key int -> (hi, lo) uint32 lanes.

    key = (base4(24 digits) << 4) | dist, so
    hi = digits 0..11 (24 bits), lo = (digits 12..23 << 4) | dist."""
    return (key >> 28) & 0xFFFFFFFF, key & 0xFFFFFFF


_TACT4 = (
    "own_atari_adjacent",
    "own_2libs_adjacent",
    "opp_atari_adjacent",
    "opp_2libs_adjacent",
)


@jax.tree_util.register_pytree_node_class
class DeviceGammas:
    """GammasDict compiled to device arrays (spatial hash table + tactical
    gamma vectors). A pytree, safe to close over / pass through jit."""

    def __init__(self, keys_hi, keys_lo, used, vals, tact_dist, tact4,
                 dist: int = 3):
        self.keys_hi = keys_hi
        self.keys_lo = keys_lo
        self.used = used
        self.vals = vals
        self.tact_dist = tact_dist  # [6]: gamma for dist_last 0..4, [5]=1
        self.tact4 = tact4          # [4]: _TACT4 order
        self.dist = dist

    def tree_flatten(self):
        return (
            (self.keys_hi, self.keys_lo, self.used, self.vals,
             self.tact_dist, self.tact4),
            self.dist,
        )

    @classmethod
    def tree_unflatten(cls, dist, children):
        return cls(*children, dist=dist)

    @classmethod
    def compile(cls, gd: GammasDict) -> "DeviceGammas":
        if gd.dist > 3:
            raise ValueError(
                "device gammas support pattern dist <= 3 (24 base-4 digits"
                " per uint32 lane pair); host GammasDict handles larger"
            )
        spatial = {}
        tact_dist = np.ones(6, np.float32)
        tact4 = np.ones(4, np.float32)
        for k, g in gd.table.items():
            if k.startswith("dist_last:"):
                d = int(k.split(":")[1])
                if 0 <= d <= 4:
                    tact_dist[d] = g
            elif k in _TACT4:
                tact4[_TACT4.index(k)] = g
            else:
                spatial[int(k)] = g
        size = 64
        while size < 2 * max(1, len(spatial)):
            size *= 2
        keys_hi = np.zeros(size, np.uint32)
        keys_lo = np.zeros(size, np.uint32)
        used = np.zeros(size, bool)
        vals = np.ones(size, np.float32)
        mask = np.uint32(size - 1)
        for key, g in spatial.items():
            hi, lo = _split_key(key)
            hi, lo = np.uint32(hi), np.uint32(lo)
            with np.errstate(over="ignore"):
                slot = int(_mix_hash(hi, lo) & mask)
            for _ in range(size):
                if not used[slot]:
                    break
                slot = (slot + 1) & int(mask)
            used[slot] = True
            keys_hi[slot] = hi
            keys_lo[slot] = lo
            vals[slot] = g
        return cls(
            jnp.asarray(keys_hi), jnp.asarray(keys_lo), jnp.asarray(used),
            jnp.asarray(vals), jnp.asarray(tact_dist), jnp.asarray(tact4),
            dist=gd.dist,
        )

    def lookup(self, hi, lo):
        """Batched probe: gamma for each (hi, lo) key, 1.0 on miss."""
        mask = jnp.uint32(self.keys_hi.shape[0] - 1)
        slot0 = _mix_hash(hi, lo) & mask

        def body(_, carry):
            g, done, slot = carry
            k_hi = self.keys_hi[slot]
            k_lo = self.keys_lo[slot]
            u = self.used[slot]
            match = u & (k_hi == hi) & (k_lo == lo)
            g = jnp.where(match & ~done, self.vals[slot], g)
            done = done | match | ~u  # empty slot terminates the probe
            return g, done, (slot + 1) & mask

        g, _, _ = jax.lax.fori_loop(
            0, _MAX_PROBE, body,
            (jnp.ones_like(hi, jnp.float32), jnp.zeros_like(hi, bool),
             slot0),
        )
        return g


def _sym_perms(dist: int) -> np.ndarray:
    """[8, m] index permutations: perm[s][j] = which shifted code map the
    j-th base-4 digit reads under symmetry s (pattern.py _SYMS order)."""
    offs = P.diamond_offsets(dist)
    index = {o: i for i, o in enumerate(offs)}
    return np.array(
        [[index[sym(dy, dx)] for (dy, dx) in offs] for sym in P._SYMS],
        np.int32,
    )


def spatial_keys_batch(stones, size, to_move, dist: int = 3):
    """Canonical pattern keys for every vertex: [B, n, n] (hi, lo) uint32.

    Matches pattern.pattern_key exactly: base-4 pack of the dist-diamond
    neighborhood (0 empty / 1 own / 2 opp / 3 off-board), min over the 8
    dihedral symmetries, (key << 4) | dist."""
    b, n, _ = stones.shape
    own = to_move.astype(jnp.int8)[:, None, None] + 1
    code = jnp.where(
        stones == 0, 0, jnp.where(stones == own, 1, 2)
    ).astype(jnp.uint32)
    rng = jnp.arange(n)
    inb = (rng[None, :] < size[:, None]).astype(jnp.uint32)
    onb = inb[:, :, None] * inb[:, None, :]
    code = jnp.where(onb == 1, code, _OFFBOARD)
    pad = jnp.pad(
        code, ((0, 0), (dist, dist), (dist, dist)),
        constant_values=_OFFBOARD,
    )
    offs = P.diamond_offsets(dist)
    shifted = jnp.stack(
        [pad[:, dist + dy:dist + dy + n, dist + dx:dist + dx + n]
         for dy, dx in offs]
    )  # [m, B, n, n]
    perms = _sym_perms(dist)
    m = len(offs)
    half = m // 2
    best_hi = best_lo = None
    for s in range(8):
        hi = jnp.zeros_like(code)
        lo = jnp.zeros_like(code)
        for j in range(half):
            hi = hi * 4 + shifted[int(perms[s, j])]
        for j in range(half, m):
            lo = lo * 4 + shifted[int(perms[s, j])]
        lo = (lo << 4) | jnp.uint32(dist)
        if best_hi is None:
            best_hi, best_lo = hi, lo
        else:
            better = (hi < best_hi) | ((hi == best_hi) & (lo < best_lo))
            best_hi = jnp.where(better, hi, best_hi)
            best_lo = jnp.where(better, lo, best_lo)
    return best_hi, best_lo


def _shift4(x, fill):
    """The four neighbor shifts of [B, n, n] x, edges filled."""
    return (
        jnp.pad(x[:, 1:, :], ((0, 0), (0, 1), (0, 0)),
                constant_values=fill),
        jnp.pad(x[:, :-1, :], ((0, 0), (1, 0), (0, 0)),
                constant_values=fill),
        jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1)),
                constant_values=fill),
        jnp.pad(x[:, :, :-1], ((0, 0), (0, 0), (1, 0)),
                constant_values=fill),
    )


# Pachi's MC-owner gamma table (game_state.cc:624-626)
_MC_OWNER = jnp.asarray(GammasDict.MC_OWNER_GAMMAS, jnp.float32)


def gammas_policy_device(
    dev: DeviceGammas,
    stones,       # [B, n, n] int8
    size,         # [B] int32
    to_move,      # [B] int32
    legal_board,  # [B, n*n] bool
    last_move,    # [B] int32 flat vertex, -1 none/pass
    libs,         # [B, n, n] per-chain liberty counts (0 on empty)
    ownership=None,  # [B, n*n] to-move perspective in [-1, 1]
):
    """[B, n*n] normalized gammas policy — the jit replica of
    GammasDict.policy (GetGammasPolicy, game_state.cc:620-640)."""
    b, n, _ = stones.shape
    hi, lo = spatial_keys_batch(stones, size, to_move, dev.dist)
    g = dev.lookup(hi.reshape(b, -1), lo.reshape(b, -1))  # [B, n*n]

    # dist-to-last-move feature ("dist_last:d", d <= 4)
    ly, lx = last_move // n, last_move % n
    yy = jnp.arange(n)[None, :, None]
    xx = jnp.arange(n)[None, None, :]
    d = jnp.abs(yy - ly[:, None, None]) + jnp.abs(xx - lx[:, None, None])
    d = jnp.where((last_move >= 0)[:, None, None], jnp.minimum(d, 5), 5)
    g = g * dev.tact_dist[d].reshape(b, -1)

    # adjacent-chain tacticals from the liberty map (host
    # tactical_features: a feature fires once if ANY neighbor matches)
    own = stones == (to_move[:, None, None] + 1).astype(stones.dtype)
    opp = stones == (2 - to_move[:, None, None]).astype(stones.dtype)
    for color_mask, atari_g, two_g in (
        (own, dev.tact4[0], dev.tact4[1]),
        (opp, dev.tact4[2], dev.tact4[3]),
    ):
        m1 = m2 = False
        for cm, lb in zip(_shift4(color_mask, False), _shift4(libs, 0)):
            m1 = m1 | (cm & (lb == 1))
            m2 = m2 | (cm & (lb == 2))
        g = g * jnp.where(m1.reshape(b, -1), atari_g, 1.0)
        g = g * jnp.where(m2.reshape(b, -1), two_g, 1.0)

    if ownership is not None:
        owner = (ownership + 1.0) * 0.5
        idx = jnp.clip((owner * 8).astype(jnp.int32), 0, 7)
        g = g * _MC_OWNER[idx]

    g = jnp.where(legal_board, g, 0.0)
    total = jnp.sum(g, axis=-1, keepdims=True)
    uniform = legal_board.astype(jnp.float32)
    uniform = uniform / jnp.maximum(
        jnp.sum(uniform, axis=-1, keepdims=True), 1.0
    )
    return jnp.where(total > 0, g / jnp.maximum(total, 1e-30), uniform)


def libs_map_batch(stones):
    """[B, n, n] per-chain liberty counts (both colors; 0 on empty) — the
    non-Pallas fallback for the analysis kernel's libs map."""
    from sayuri_tpu.game import board as B_

    def one(s):
        empty = s == 0
        out = jnp.zeros(s.shape, jnp.int32)
        for c in (1, 2):
            mask = s == c
            lbl = B_.chain_labels(mask)
            out = out + jnp.where(
                mask, B_.chain_liberty_map(mask, lbl, empty), 0
            )
        return out

    return jax.vmap(one)(stones)


def mix_gammas_priors(factor, priors, g):
    """node.cc:151-160: board cells get (1-f)*nn + f*(1-pass)*gammas; the
    pass probability is left untouched (the mixed row still sums to 1
    because the gammas policy itself sums to 1 over board cells)."""
    nn_board, nn_pass = priors[:, :-1], priors[:, -1]
    reduction = (1.0 - nn_pass)[:, None]
    board = (1.0 - factor) * nn_board + factor * reduction * g
    return jnp.concatenate([board, nn_pass[:, None]], axis=-1)


def apply_to_evals(dev, factor, states, evals, legal, libs=None):
    """Mix the device gammas policy into a NetEvals batch (the
    per-expansion hook shared by the real and dummy evaluators)."""
    n = states.stones.shape[-1]
    if libs is None:
        libs = libs_map_batch(states.stones)
    stm_sign = jnp.where(states.to_move == 0, 1.0, -1.0)
    g = gammas_policy_device(
        dev,
        states.stones,
        states.size,
        states.to_move,
        legal[:, : n * n],
        states.last_moves[:, 0],
        libs,
        ownership=evals.black_ownership * stm_sign[:, None],
    )
    pri = mix_gammas_priors(factor, evals.priors, g)
    pri = jnp.where(legal, pri, 0.0)
    pri = pri / jnp.maximum(jnp.sum(pri, axis=-1, keepdims=True), 1e-12)
    return evals._replace(priors=pri)


def wrap_eval_with_gammas(env, eval_fn, dev: DeviceGammas, factor: float):
    """Wrap any eval_fn with per-expansion gammas mixing (the dummy-net
    path; the real evaluator applies the mix inline to reuse the analysis
    kernel's liberty map)."""

    def wrapped(states, ctx=None):
        evals = eval_fn(states, ctx)
        legal = jax.vmap(env.legal_action_mask)(states)
        return apply_to_evals(dev, factor, states, evals, legal)

    return wrapped
