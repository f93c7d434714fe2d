"""Dihedral (8-fold) symmetry transforms for planes and policies.

The reference applies a random symmetry inside the training forward and
inverts it on spatial outputs (network.py:1126-1171, symmetry.py in
train/torch); the engine side ensembles over symmetries at inference
(network.h:17). Because mixed board sizes live in a fixed buffer with an
on-board mask that is itself an input plane, transforming the whole buffer
is self-consistent: the board simply occupies a different corner and the
mask moves with it.

Symmetry index encoding matches src/game/symmetry.h: bit 0 = horizontal
flip (x), bit 1 = vertical flip (y), bit 2 = transpose (applied first on
the forward transform).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def transform_planes(x, sym: int):
    """Apply symmetry `sym` (static int in [0,8)) to [..., H, W, C]."""
    if sym & 4:
        x = jnp.swapaxes(x, -3, -2)
    if sym & 2:
        x = jnp.flip(x, axis=-3)
    if sym & 1:
        x = jnp.flip(x, axis=-2)
    return x


def inverse_transform_planes(x, sym: int):
    if sym & 1:
        x = jnp.flip(x, axis=-2)
    if sym & 2:
        x = jnp.flip(x, axis=-3)
    if sym & 4:
        x = jnp.swapaxes(x, -3, -2)
    return x


def transform_policy(p, sym: int, n: int):
    """Apply symmetry to a flat policy [..., N*N(+1)]; the trailing pass
    entry (if present) is untouched."""
    has_pass = p.shape[-1] == n * n + 1
    spatial = p[..., : n * n].reshape(p.shape[:-1] + (n, n, 1))
    spatial = transform_planes(spatial, sym).reshape(p.shape[:-1] + (n * n,))
    if has_pass:
        return jnp.concatenate([spatial, p[..., n * n :]], axis=-1)
    return spatial


def inverse_transform_policy(p, sym: int, n: int):
    has_pass = p.shape[-1] == n * n + 1
    spatial = p[..., : n * n].reshape(p.shape[:-1] + (n, n, 1))
    spatial = inverse_transform_planes(spatial, sym).reshape(
        p.shape[:-1] + (n * n,)
    )
    if has_pass:
        return jnp.concatenate([spatial, p[..., n * n :]], axis=-1)
    return spatial


# ---------------------------------------------------------------------------
# Per-row (batched, traced symmetry index) transforms — the random-symmetry
# leaf ensembling path (Network::kRandom, network.cc:238-245 + node.cc:146):
# every query draws its own dihedral transform, so the transform index is a
# traced [B] array. Implemented as three flip/transpose + per-row select
# steps: XLA lowers reverses/transposes to layout copies, which measure
# ~100x faster on TPU than the equivalent per-row [B, HW] gather inside the
# fused eval graph (the gather forced a bad layout on the conv input).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _perm_tables(n: int):
    """(fwd [8, n*n], inv [8, n*n]) int32 permutation tables (tests /
    reference cross-checks): ``out_flat = x_flat[fwd[s]]`` equals
    ``transform_planes(x, s)`` and ``x_flat = out_flat[inv[s]]`` inverts."""

    def np_transform(a, s):
        if s & 4:
            a = a.T
        if s & 2:
            a = a[::-1, :]
        if s & 1:
            a = a[:, ::-1]
        return a

    iota = np.arange(n * n).reshape(n, n)
    fwd = np.stack(
        [np_transform(iota, s).reshape(-1) for s in range(8)]
    ).astype(np.int32)
    inv = np.argsort(fwd, axis=-1).astype(np.int32)
    return fwd, inv


def _spatial_transform_batch(x, syms, inverse: bool):
    """Per-row dihedral transform of [B, ..., H, W] (trailing dims after
    H, W allowed via ndim bookkeeping by callers reshaping to [B, H, W] or
    [B, H, W, C])."""
    sb = syms.reshape(syms.shape + (1,) * (x.ndim - 1))
    ops = [
        lambda a: jnp.swapaxes(a, -3 if a.ndim >= 4 else -2,
                               -2 if a.ndim >= 4 else -1),
        lambda a: jnp.flip(a, axis=-3 if a.ndim >= 4 else -2),
        lambda a: jnp.flip(a, axis=-2 if a.ndim >= 4 else -1),
    ]
    bits = (4, 2, 1)
    order = range(3) if not inverse else reversed(range(3))
    for i in order:
        x = jnp.where((sb & bits[i]) != 0, ops[i](x), x)
    return x


def transform_planes_batch(x, syms):
    """Apply per-row symmetries to [B, H, W, C] planes; `syms` is [B] int32
    in [0, 8)."""
    return _spatial_transform_batch(x, syms, inverse=False)


def _policy_spatial_batch(p, syms, n: int, inverse: bool):
    b = p.shape[0]
    sp = _spatial_transform_batch(
        p[:, : n * n].reshape(b, n, n), syms, inverse
    ).reshape(b, n * n)
    if p.shape[-1] == n * n + 1:
        return jnp.concatenate([sp, p[:, n * n :]], axis=-1)
    return sp


def transform_policy_batch(p, syms, n: int):
    """Per-row symmetry on a flat policy [B, n*n(+1)] (pass untouched)."""
    return _policy_spatial_batch(p, syms, n, inverse=False)


def inverse_transform_policy_batch(p, syms, n: int):
    """Invert `transform_*_batch` on a flat spatial output [B, n*n(+1)]."""
    return _policy_spatial_batch(p, syms, n, inverse=True)


def random_symmetries(states, seed: int = 0):
    """[B] int32 symmetry draw per query (Random<>::RandFix(8),
    network.cc:243-245).

    Derived from the position hash instead of a stateful RNG so that (a)
    the draw needs no threaded rng state in the jitted search and (b) the
    NN cache stays coherent: the reference caches the post-ensemble result
    (network.cc:283-287), so a re-queried position must see the SAME
    symmetry its cached entry was computed under."""
    h = states.hash  # [B, 2] uint32
    mix = (
        h[:, 0] * jnp.uint32(2654435761)
        ^ h[:, 1] * jnp.uint32(2246822519)
        ^ jnp.uint32(seed) * jnp.uint32(3266489917)
        ^ states.to_move.astype(jnp.uint32) * jnp.uint32(668265263)
    )
    mix = mix ^ (mix >> 15)
    mix = mix * jnp.uint32(2246822519)
    return (mix >> 29).astype(jnp.int32)
