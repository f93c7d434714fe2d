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

import jax.numpy as jnp


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
