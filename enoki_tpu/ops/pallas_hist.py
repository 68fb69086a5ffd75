"""Dense histogram op -- the hot path of the reference's histogram
workload (tests/histogram.cpp:54: 16M samples through a conflict-safe
scatter_add into a small dense target), with a weights VJP.

Default implementation: the fused equality-reduction (ops.scatter_add's
dense rewrite). MEASURED on the chip (16M -> 64 bins, scan-chained
two-point timing): XLA's fusion runs it at **14.1 G samples/s**
(1.19 ms) -- ~1.8 Tops/s of compare+select+add, i.e. near the VPU
compare-bound roofline; there is no order-of-magnitude left on the
table.

``impl="pallas"`` keeps the hand-written kernel for the record: a
(rows, 128) tile per grid step with bins on the lane axis and a
128-iteration column loop accumulating (rows, bins) partials into one
VMEM block revisited across the sequential grid. Measured **1.4 G
samples/s** -- 10x SLOWER than the fusion, because each column step is
a narrow (rows, 1)-broadcast vector op while XLA's fused form runs
full-width; a flat (L, 1) x (1, bins) formulation needs a
sublane<->lane reshape Mosaic cannot lay out. Negative result,
documented in docs/benchmarks.md; the op-level API (named histogram
with weights + VJP) is the keeper.

Out-of-range and negative indices match no bin (dropped) -- exactly the
masked-scatter_add semantics of the reference.

AD: counting histograms are piecewise-constant in ``index`` (float0
gradient); with ``weights`` the VJP w.r.t. weights is a gather of the
bin cotangent -- provided via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _hist_kernel(idx_ref, w_ref, out_ref, *, bins):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[...]                        # (rows, 128) int32
    w = w_ref[...]                            # (rows, 128) f32
    rows, lanes = idx.shape
    # bins ride the LANE axis: one (rows, bins) compare per index
    # column, accumulated in registers. A flat (L, 1) x (1, bins)
    # formulation needs a sublane<->lane reshape Mosaic cannot lay out;
    # the column loop stays in natively-supported (sublane, lane) shapes
    # (a (rows, 1) slice lane-broadcasts against the bin iota).
    binids = lax.broadcasted_iota(jnp.int32, (rows, bins), 1)
    acc = jnp.zeros((rows, bins), jnp.float32)
    for c in range(lanes):
        col = idx[:, c:c + 1]                 # (rows, 1)
        acc += jnp.where(col == binids, w[:, c:c + 1], 0.0)
    out_ref[...] += jnp.sum(acc, axis=0, keepdims=True)


def _hist_pallas(idx2d, w2d, bins, rows):
    n_rows = idx2d.shape[0]
    grid = (n_rows // rows,)
    return pl.pallas_call(
        functools.partial(_hist_kernel, bins=bins),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bins), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, bins), jnp.float32),
    )(idx2d, w2d)[0]


def histogram(index, bins: int, weights=None, impl: str = "fused"):
    """``hist[b] = sum_i (index_i == b) * weights_i`` -> (bins,) f32.

    ``index`` is a flat int array; out-of-range/negative entries are
    dropped. ``weights`` defaults to ones (a counting histogram).
    ``impl``: "fused" (default -- the equality-reduction XLA fuses to
    14.1 G samples/s on v5e) or "pallas" (the measured-slower kernel,
    kept for the record; bins <= 128). LazyArray operands record a
    masked scatter_add chain instead (one source, every backend);
    their gradients flow through the trace tape.
    """
    from .backend import is_lazy

    if is_lazy(index) or is_lazy(weights):
        return _hist_lazy(index, bins, weights)
    return _histogram_vjp(index, bins, weights, impl)


def _hist_lazy(index, bins, weights):
    # OOB lanes redirect to a dropped slot like the eager path (the
    # FloatC histogram of examples/lazy_histogram.py)
    import enoki_tpu.trace as t

    from .router import _lift_arr

    index = _lift_arr(index)
    if not jnp.issubdtype(index.dtype, jnp.integer):
        index = index.cast(jnp.int32)  # match the eager path's cast
    w = (t.LazyArray.literal(1.0, 1, jnp.float32) if weights is None
         else _lift_arr(weights))
    tgt = t.LazyArray.zeros(bins, jnp.float32)
    ok = (index >= 0) & (index < bins)
    safe = t.select(ok, index, bins)  # dropped by .at[].add default
    tgt.scatter_add(safe, t.select(ok, w, 0.0))
    return tgt


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def _histogram_vjp(index, bins: int, weights=None, impl: str = "fused"):
    return _hist_fwd(index, bins, weights, impl)[0]


def _hist_impl(index, bins, weights, impl, rows: int = 8):
    index = jnp.asarray(index, jnp.int32).reshape(-1)
    n = index.shape[0]
    w = (jnp.ones((n,), jnp.float32) if weights is None
         else jnp.asarray(weights, jnp.float32).reshape(-1))
    if impl != "pallas" or jax.default_backend() == "cpu":
        from .router import scatter_add

        oob = (index < 0) | (index >= bins)
        return scatter_add(jnp.zeros(bins, jnp.float32), w, index,
                           mask=~oob)
    pb = max(bins, _LANES)
    if pb % _LANES:
        pb = ((pb + _LANES - 1) // _LANES) * _LANES
    tile = rows * _LANES
    pad = (-n) % tile
    if n == 0:
        # an empty grid runs ZERO kernel instances, so the pl.when(i==0)
        # zeroing never executes and the output is uninitialized memory;
        # one all-dropped dummy tile makes the kernel write the zeros
        pad = tile
    if pad:
        index = jnp.concatenate([index, jnp.full(pad, -1, jnp.int32)])
        w = jnp.concatenate([w, jnp.zeros(pad, jnp.float32)])
    idx2d = index.reshape(-1, _LANES)
    w2d = w.reshape(-1, _LANES)
    out = _hist_pallas(idx2d, w2d, pb, rows)
    return out[:bins]


def _hist_fwd(index, bins, weights, impl):
    out = _hist_impl(index, bins, weights, impl)
    return out, (jnp.asarray(index, jnp.int32).reshape(-1), weights)


def _hist_bwd(bins, impl, res, g):
    import numpy as np

    index, weights = res
    # d hist / d index = 0 (piecewise constant in the bin index: the
    # symbolic-zero float0 cotangent for the integer primal)
    zi = np.zeros(index.shape, jax.dtypes.float0)
    if weights is None:
        return (zi, None)
    # d / d weights_i = g[index_i] for in-range lanes, 0 for dropped
    inr = (index >= 0) & (index < bins)
    gi = jnp.where(inr, jnp.take(g, jnp.where(inr, index, 0)), 0.0)
    return (zi, gi.reshape(jnp.shape(weights)))


_histogram_vjp.defvjp(_hist_fwd, _hist_bwd)
