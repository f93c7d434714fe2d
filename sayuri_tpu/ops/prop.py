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


def _run_min_axis(v, m, n, axis_is_row: bool):
    """[C, nn] run-min of `v` over maximal contiguous runs of mask `m`
    along one axis. `v` must already be `_BIG` off-mask."""
    out = v
    for forward in (True, False):
        f, c = v, m
        d = 1
        while d < n:
            f_s = _shift_from(f, d, n, _BIG, axis_is_row, forward)
            c_s = _shift_from(c, d, n, 0.0, axis_is_row, forward)
            f = jnp.minimum(f, jnp.where(c > 0, f_s, _BIG))
            c = c * c_s
            d *= 2
        out = jnp.minimum(out, f)
    return out


def sweep_min(v, m, n):
    """One row+column run-min sweep (values `_BIG` off-mask)."""
    v = _run_min_axis(v, m, n, True)
    v = _run_min_axis(v, m, n, False)
    return v


def min_prop(values, mask, n):
    """Fixpoint: component-wise minimum of `values` over 4-connected
    components of `mask`, broadcast over each component. Returns `_BIG`
    off-mask. `mask` is 0/1 f32."""
    v0 = jnp.where(mask > 0, values, _BIG)

    def body(carry):
        v, _ = carry
        v2 = sweep_min(v, mask, n)
        # Exact decrease test: summing would drown small deltas in the
        # f32 rounding of the ~1e9 off-mask fill values.
        return v2, jnp.any(v2 < v)

    v, _ = lax.while_loop(lambda c: c[1], body, (v0, jnp.array(True)))
    return v


def flood(seed, allowed, n):
    """Fixpoint flood fill: grow 0/1 `seed` within 0/1 `allowed`
    (4-connected). Implemented as a component-min of (1 - seed): any
    component holding a seed cell floods entirely. Returns 0/1 f32."""
    v = min_prop(1.0 - seed, allowed, n)
    return jnp.where((allowed > 0) & (v < 0.5), 1.0, 0.0)
