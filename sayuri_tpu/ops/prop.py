"""In-kernel propagation primitives for flattened [C, n*n] boards.

Shared by the Pallas board kernels (ops/analysis.py, ops/ladder_kernel.py).
Everything here runs INSIDE a Pallas kernel body: lane-dim rolls only, no
gathers/scatters.

The workhorse is a segmented run-min: for each cell, the minimum of a value
over the maximal contiguous masked run containing it along one axis,
computed with log2(n) doubling steps instead of n single-cell hops. A
row+column pair of run-mins is one "sweep"; iterating sweeps to a fixpoint
yields the 4-connected component minimum in O(#bends-of-the-component)
sweeps — the same label/min propagation the reference gets from union-find
walks (/root/reference/src/game/strings.cc), restated for the VPU.

Run-length gates: the doubling step `f[i] = min(f[i], f[i-d])` is valid
exactly when cells (i-d, i] are all masked and in the same row/column —
i.e. when the directional run length ending at i is >= d. Precomputing
the 4 run-length arrays once per mask (`run_gates`) reduces each sweep
step to roll + compare + select + min, with the compare also subsuming
the board-edge masking (run lengths never cross rows by construction).
This more than halves the per-sweep vector work vs. re-deriving
connectivity chains inside every sweep, and the gates are shared by every
fixpoint over the same mask (the chain-liberty and Benson masks host 5-10
fixpoints each).

Layout convention: boards are [C, n*n] row-major flats (lane dim = cells);
values f32; `_BIG` marks off-mask / +inf.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _idx(shape):
    return lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_col(shape, n):
    idx = _idx(shape)
    return idx // n, idx % n


def _shift_from(x, d, n, fill, axis_is_row: bool, forward: bool):
    """out[i] = x[i - d*stride] (forward) or x[i + d*stride] (backward),
    `fill` where the source crosses a row/column boundary."""
    nn = n * n
    row, col = _row_col(x.shape, n)
    stride = 1 if axis_is_row else n
    pos = col if axis_is_row else row
    if forward:
        ok = pos >= d
        rolled = pltpu.roll(x, d * stride, 1)
    else:
        ok = pos < n - d
        rolled = pltpu.roll(x, nn - d * stride, 1)
    return jnp.where(ok, rolled, fill)


def run_gates(mask, n):
    """Directional run lengths of `mask` (0/1 f32), capped at the next
    power of two >= n: rl[i] = number of consecutive masked cells ending
    at i, approaching along (axis, direction). The doubling-step gate at
    distance d is simply rl >= d. Returns
    [(axis_is_row, forward, rl), ...] for the 4 (axis, dir) pairs."""
    gates = []
    for axis_is_row in (True, False):
        for forward in (True, False):
            rl = mask
            d = 1
            while d < n:
                rl_s = _shift_from(rl, d, n, 0.0, axis_is_row, forward)
                rl = rl + jnp.where(rl >= d, rl_s, 0.0)
                d *= 2
            gates.append((axis_is_row, forward, rl))
    return gates


def _tile(x, tile):
    return jnp.concatenate([x] * tile, axis=0) if tile > 1 else x


def sweep_min(v, gates, n, tile=1):
    """One row+column run-min sweep (values `_BIG` off-mask). `gates`
    comes from `run_gates`; `tile` repeats the gate arrays along the
    sublane axis for problems stacked over one mask."""
    nn = n * n
    out = v
    for axis_is_row, forward, rl in gates:
        rl = _tile(rl, tile)
        stride = 1 if axis_is_row else n
        f = v
        d = 1
        while d < n:
            # Gate rl > d == "cells [i-d, i] all masked", which requires
            # the SOURCE cell masked and in the same row/col run — so a
            # raw cyclic roll is safe (wrapped lanes are gated), and
            # blocking off-mask sources is a no-op (they hold _BIG).
            s = d * stride if forward else nn - d * stride
            f = jnp.minimum(f, jnp.where(rl > d, pltpu.roll(f, s, 1), _BIG))
            d *= 2
        out = jnp.minimum(out, f)
    return out


def _locally_unstable(v, mask_t, n):
    """True iff `v` is NOT a component-min fixpoint: some masked cell has
    a masked 4-neighbor with a strictly smaller value. A run-min sweep
    never increases values and a locally-stable field is constant on each
    component, so this elementwise test (4 rolls + compares, ~1/5 of a
    sweep) is an exact convergence criterion."""
    nn = n * n
    idx = _idx(v.shape)
    col = idx % n
    vm = jnp.where(mask_t > 0, v, _BIG)
    m = jnp.minimum(
        jnp.where(col > 0, pltpu.roll(vm, 1, 1), _BIG),
        jnp.where(col < n - 1, pltpu.roll(vm, nn - 1, 1), _BIG),
    )
    m = jnp.minimum(m, jnp.where(idx >= n, pltpu.roll(vm, n, 1), _BIG))
    m = jnp.minimum(
        m, jnp.where(idx < nn - n, pltpu.roll(vm, nn - n, 1), _BIG)
    )
    return jnp.any((m < v) & (mask_t > 0))


def min_prop(values, mask, n, gates=None, tile=1, k0=1):
    """Fixpoint: component-wise minimum of `values` over 4-connected
    components of `mask`, broadcast over each component. Returns `_BIG`
    off-mask. `mask` is 0/1 f32. Pass precomputed `gates` whenever the
    same mask hosts several fixpoints.

    Convergence: `k0` unchecked sweeps (almost every real board chain or
    region converges within two), then a while_loop gated on the CHEAP
    local-stability test — so the typical fixpoint pays exactly one
    scalar reduction, and the loop body is a single sweep (no wasted
    idempotent re-sweeps)."""
    mask_t = _tile(mask, tile)
    if gates is None:
        gates = run_gates(mask_t, n)
        tile = 1
    v = jnp.where(mask_t > 0, values, _BIG)
    for _ in range(k0):
        v = sweep_min(v, gates, n, tile=tile)

    v = lax.while_loop(
        lambda v: _locally_unstable(v, mask_t, n),
        lambda v: sweep_min(v, gates, n, tile=tile),
        v,
    )
    return v


def flood(seed, allowed, n, gates=None, tile=1):
    """Fixpoint flood fill: grow 0/1 `seed` within 0/1 `allowed`
    (4-connected). Implemented as a component-min of (1 - seed): any
    component holding a seed cell floods entirely. Returns 0/1 f32."""
    v = min_prop(1.0 - seed, allowed, n, gates=gates, tile=tile)
    allowed_t = _tile(allowed, tile)
    return jnp.where((allowed_t > 0) & (v < 0.5), 1.0, 0.0)
