"""Pallas kernels: flood fill and min-label propagation on Go boards.

XLA runs each fixpoint ring as separate device kernels (~10-30us each);
here the whole batch of boards sits in VMEM and the fixpoint while-loop
runs on-core in ONE kernel launch.

The public entry points take a single [n, n] board but carry a
custom_vmap rule that collapses any stack of batch dimensions into one
leading axis and dispatches the batched kernel — so the game layer's
`vmap(vmap(...))` compositions (boards x ladder slots) still produce a
single launch.

Dtypes are float32/int32 (VPU-native); boards are [n, n], n <= 25.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: CHUNK * n^2 * 4B * ~6 buffers; 512 * 361 * 24 = 4.4 MB
_CHUNK = 512


def _ids(shape, dim):
    return lax.broadcasted_iota(jnp.int32, shape, dim)


def _nbr_max_flat(m, n):
    """max over 4-neighbors on [C, n*n] row-major flattened boards — all
    shifts are lane rotations (cheap on the VPU; sublane/middle-dim rolls
    are not). pltpu.roll needs non-negative shifts: nn-k == -k."""
    nn = n * n
    idx = _ids(m.shape, 1)
    col = idx % n
    lf = jnp.where(col > 0, pltpu.roll(m, 1, 1), 0.0)
    rt = jnp.where(col < n - 1, pltpu.roll(m, nn - 1, 1), 0.0)
    up = jnp.where(idx >= n, pltpu.roll(m, n, 1), 0.0)
    dn = jnp.where(idx < nn - n, pltpu.roll(m, nn - n, 1), 0.0)
    return jnp.maximum(jnp.maximum(up, dn), jnp.maximum(lf, rt))


def _nbr_min_flat(l, n, big):
    nn = n * n
    idx = _ids(l.shape, 1)
    col = idx % n
    lf = jnp.where(col > 0, pltpu.roll(l, 1, 1), big)
    rt = jnp.where(col < n - 1, pltpu.roll(l, nn - 1, 1), big)
    up = jnp.where(idx >= n, pltpu.roll(l, n, 1), big)
    dn = jnp.where(idx < nn - n, pltpu.roll(l, nn - n, 1), big)
    return jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt))


def _flood_kernel(n, seed_ref, allowed_ref, out_ref):
    allowed = allowed_ref[:].astype(jnp.float32)
    m0 = seed_ref[:].astype(jnp.float32) * allowed

    def body(carry):
        m, _ = carry
        m2 = jnp.maximum(m, _nbr_max_flat(m, n)) * allowed
        m2 = jnp.maximum(m2, _nbr_max_flat(m2, n)) * allowed
        m2 = jnp.maximum(m2, _nbr_max_flat(m2, n)) * allowed
        return m2, jnp.sum(m2) > jnp.sum(m)

    m, _ = lax.while_loop(
        lambda c: c[1], body, (m0, jnp.array(True))
    )
    out_ref[:] = m > 0.5


def _labels_kernel(n, mask_ref, out_ref):
    mask = mask_ref[:]
    big = jnp.float32(1e9)
    l0 = jnp.where(mask, _ids(mask.shape, 1).astype(jnp.float32), big)
    finite0 = jnp.sum(jnp.where(mask, l0, 0.0))

    def body(carry):
        l, _ = carry
        l2 = jnp.where(mask, jnp.minimum(l, _nbr_min_flat(l, n, big)), big)
        l3 = jnp.where(mask, jnp.minimum(l2, _nbr_min_flat(l2, n, big)), big)
        decreased = jnp.sum(jnp.where(mask, l3, 0.0)) < jnp.sum(
            jnp.where(mask, l, 0.0)
        )
        return l3, decreased

    l, _ = lax.while_loop(
        lambda c: c[1], body, (l0, finite0 > 0)
    )
    out_ref[:] = jnp.where(mask, l, -1.0).astype(jnp.int32)


def _batched_call(kernel, out_dtype, args):
    """Run `kernel` over [B, n, n] inputs in one (chunked) launch with
    row-major flattened [chunk, n*n] blocks."""
    b, n = args[0].shape[0], args[0].shape[-1]
    nn = n * n
    chunk = min(b, _CHUNK)
    pad = (-b) % chunk
    args = tuple(a.reshape(b, nn) for a in args)
    if pad:
        args = tuple(
            jnp.concatenate([a, jnp.zeros((pad, nn), a.dtype)])
            for a in args
        )
    bp = b + pad
    out = pl.pallas_call(
        functools.partial(kernel, n),
        grid=(bp // chunk,),
        out_shape=jax.ShapeDtypeStruct((bp, nn), out_dtype),
        in_specs=[
            pl.BlockSpec(
                (chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            for _ in args
        ],
        out_specs=pl.BlockSpec(
            (chunk, nn), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(*args)
    out = out[:b] if pad else out
    return out.reshape(b, n, n)


@jax.custom_batching.custom_vmap
def flood_tpu(seed, allowed):
    """[..., n, n] bool flood fill. All leading dims collapse into one
    batched Pallas launch; the custom_vmap rule is recursive, so any depth
    of vmap nesting (boards x ladder slots x actions ...) still reshapes
    instead of growing the kernel block."""
    n = seed.shape[-1]
    lead = seed.shape[:-2]
    out = _batched_call(
        _flood_kernel,
        jnp.bool_,
        (seed.reshape((-1, n, n)), allowed.reshape((-1, n, n))),
    )
    return out.reshape(lead + (n, n))


@flood_tpu.def_vmap
def _flood_vmap(axis_size, in_batched, seed, allowed):
    if not in_batched[0]:
        seed = jnp.broadcast_to(seed, (axis_size,) + seed.shape)
    if not in_batched[1]:
        allowed = jnp.broadcast_to(allowed, (axis_size,) + allowed.shape)
    return flood_tpu(seed, allowed), True


@jax.custom_batching.custom_vmap
def chain_labels_tpu(stone_mask):
    """[..., n, n] int32 min-index chain labels (one Pallas launch)."""
    n = stone_mask.shape[-1]
    lead = stone_mask.shape[:-2]
    out = _batched_call(
        _labels_kernel, jnp.int32, (stone_mask.reshape((-1, n, n)),)
    )
    return out.reshape(lead + (n, n))


@chain_labels_tpu.def_vmap
def _labels_vmap(axis_size, in_batched, stone_mask):
    if not in_batched[0]:
        stone_mask = jnp.broadcast_to(
            stone_mask, (axis_size,) + stone_mask.shape
        )
    return chain_labels_tpu(stone_mask), True
