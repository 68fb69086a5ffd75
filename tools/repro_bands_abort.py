"""Minimal reproducer hunt for the bands>1 Mosaic SIGABRT
(Check failed: limits[i] <= dim(i) (2 vs. 1), BENCH_r04 tail).

Strips the banded fwd kernel down feature by feature; each variant is
compiled on the chip (the crash is compile-time, surfaced as a tunnel
HTTP 500). Prints one line per variant.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N, TILE, BANDS, STEPS = 256, 128, 8, 16
BR = TILE // BANDS


def try_compile(name, kernel, n_out=1):
    out_shape = tuple(jax.ShapeDtypeStruct((N, N), jnp.float32)
                      for _ in range(n_out))
    if n_out == 1:
        out_shape = out_shape[0]
    spec = pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=(N // TILE, N // TILE),
        in_specs=[pl.BlockSpec((1, 16), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM), spec],
        out_specs=spec if n_out == 1 else (spec,) * n_out,
        out_shape=out_shape)
    x = jnp.zeros((N, N), jnp.float32)
    p = jnp.arange(16, dtype=jnp.float32).reshape(1, 16)
    try:
        r = jax.jit(lambda p, x: f(p, x))(p, x)
        jax.block_until_ready(r)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        msg = str(e).replace(chr(10), " ")[:120]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def march(px, n_steps=STEPS, chunk=4):
    t = jnp.zeros_like(px)

    def step(t, k):
        d = px + t * 0.1 + 1.0
        alive = (d >= 1e-4) & (t + d <= 10.0)
        adv = (k < n_steps - 1).astype(d.dtype)
        return jnp.where(alive, t + d * adv, t), alive

    def cond(c):
        k, t, go = c
        return (k < n_steps) & go

    def body(c):
        k, t, _ = c
        for i in range(chunk - 1):
            t, _ = step(t, k + i)
        t, alive = step(t, k + chunk - 1)
        return k + chunk, t, jnp.any(alive)

    d0 = px + 1.0
    go0 = jnp.any((d0 >= 1e-4) & (t + d0 <= 10.0))
    _, t, _ = lax.while_loop(cond, body, (0, t, go0))
    return t, t < 5.0


# v1: full structure -- banded while_loops + pl.when stores + SMEM scalar
def k_full(params_ref, x_ref, out_ref):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    for b in range(BANDS):
        sl = slice(b * BR, (b + 1) * BR)
        t_b, hit_b = march(rows[sl])
        hit_any = jnp.any(hit_b)

        @pl.when(hit_any)
        def _(t_b=t_b, sl=sl):
            out_ref[sl, :] = t_b * 2.0

        @pl.when(jnp.logical_not(hit_any))
        def _(sl=sl, tc=tc):
            out_ref[sl, :] = jnp.broadcast_to(params_ref[0, 4], (BR, tc))


# v2: banded loops, plain stores (no pl.when)
def k_nowhen(params_ref, x_ref, out_ref):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    for b in range(BANDS):
        sl = slice(b * BR, (b + 1) * BR)
        t_b, _ = march(rows[sl])
        out_ref[sl, :] = t_b * 2.0


# v3: banded, single while_loop per band but no chunk unroll
def k_nounroll(params_ref, x_ref, out_ref):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    for b in range(BANDS):
        sl = slice(b * BR, (b + 1) * BR)
        t_b, _ = march(rows[sl], chunk=1)
        out_ref[sl, :] = t_b * 2.0


# v4: one band only (whole tile) with pl.when -- the bands=1 shape
def k_whole(params_ref, x_ref, out_ref):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    t_b, hit_b = march(rows)
    hit_any = jnp.any(hit_b)

    @pl.when(hit_any)
    def _():
        out_ref[:, :] = t_b * 2.0

    @pl.when(jnp.logical_not(hit_any))
    def _():
        out_ref[:, :] = jnp.broadcast_to(params_ref[0, 4], (tr, tc))


# v5: banded pl.when stores, no while_loop at all
def k_noloop(params_ref, x_ref, out_ref):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    for b in range(BANDS):
        sl = slice(b * BR, (b + 1) * BR)
        t_b = rows[sl] * 3.0
        hit_any = jnp.any(t_b > 1.0)

        @pl.when(hit_any)
        def _(t_b=t_b, sl=sl):
            out_ref[sl, :] = t_b * 2.0

        @pl.when(jnp.logical_not(hit_any))
        def _(sl=sl, tc=tc):
            out_ref[sl, :] = jnp.broadcast_to(params_ref[0, 4], (BR, tc))


# v6: banded while_loops, stores unconditioned, 2 bands only
def k_2bands(params_ref, x_ref, out_ref):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    for b in range(2):
        sl = slice(b * 64, (b + 1) * 64)
        t_b, _ = march(rows[sl])
        out_ref[sl, :] = t_b * 2.0


if __name__ == "__main__":
    which = sys.argv[1:] or ["full", "nowhen", "nounroll", "whole",
                             "noloop", "2bands"]
    table = dict(full=k_full, nowhen=k_nowhen, nounroll=k_nounroll,
                 whole=k_whole, noloop=k_noloop, _2bands=k_2bands,
                 **{"2bands": k_2bands})
    for name in which:
        try_compile(name, table[name])


# v7: two outputs, banded stores to both (the real kernel writes img+ts)
def k_2out(params_ref, x_ref, out_ref, t_ref):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    for b in range(BANDS):
        sl = slice(b * BR, (b + 1) * BR)
        t_b, hit_b = march(rows[sl])
        hit_any = jnp.any(hit_b)

        @pl.when(hit_any)
        def _(t_b=t_b, sl=sl):
            out_ref[sl, :] = t_b * 2.0

        @pl.when(jnp.logical_not(hit_any))
        def _(sl=sl, tc=tc):
            out_ref[sl, :] = jnp.broadcast_to(params_ref[0, 4], (BR, tc))

        t_ref[sl, :] = jnp.where(hit_b, t_b, -t_b - 1.0)


# v8: shade-with-jax.grad inside the pl.when (the real store payload)
def k_shade(params_ref, x_ref, out_ref):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    p4 = params_ref[0, 4]
    for b in range(BANDS):
        sl = slice(b * BR, (b + 1) * BR)
        t_b, hit_b = march(rows[sl])
        hit_any = jnp.any(hit_b)

        @pl.when(hit_any)
        def _(t_b=t_b, hit_b=hit_b, sl=sl):
            def s_sum(tv):
                return jnp.sum(jnp.sqrt(tv * tv + 1e-12) - p4)
            g = jax.grad(s_sum)(t_b)
            out_ref[sl, :] = jnp.where(hit_b, g * 2.0, g)

        @pl.when(jnp.logical_not(hit_any))
        def _(sl=sl, tc=tc):
            out_ref[sl, :] = jnp.broadcast_to(p4, (BR, tc))


# v9: t0 from an input ref slice as the march init (the real carry init)
def k_t0(params_ref, x_ref, out_ref):
    tr, tc = out_ref.shape
    t0_full = x_ref[:, :]
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    for b in range(BANDS):
        sl = slice(b * BR, (b + 1) * BR)
        px = rows[sl]
        t = t0_full[sl]

        def step(t, k, px=px):
            d = px + t * 0.1 + 1.0
            alive = (d >= 1e-4) & (t + d <= 10.0)
            adv = (k < STEPS - 1).astype(d.dtype)
            return jnp.where(alive, t + d * adv, t), alive

        def cond(c):
            k, t, go = c
            return (k < STEPS) & go

        def body(c, step=step):
            k, t, _ = c
            for i in range(3):
                t, _ = step(t, k + i)
            t, alive = step(t, k + 3)
            return k + 4, t, jnp.any(alive)

        d0 = px + 1.0
        go0 = jnp.any((d0 >= 1e-4) & (t + d0 <= 10.0))
        _, t, _ = lax.while_loop(cond, body, (0, t, go0))
        out_ref[sl, :] = t * 2.0


# v10: stacked (9,) param vector consumed inside the banded pl.when
def k_stack(params_ref, x_ref, out_ref):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    pvec = jnp.stack([params_ref[0, k] for k in range(9)])
    for b in range(BANDS):
        sl = slice(b * BR, (b + 1) * BR)
        t_b, hit_b = march(rows[sl])
        hit_any = jnp.any(hit_b)

        @pl.when(hit_any)
        def _(t_b=t_b, hit_b=hit_b, sl=sl):
            def f(pv):
                return jnp.sum((t_b - pv[0]) * pv[5] + pv[4])
            g = jax.grad(f)(pvec)
            out_ref[sl, :] = jnp.where(hit_b, t_b * g[4], t_b)

        @pl.when(jnp.logical_not(hit_any))
        def _(sl=sl, tc=tc):
            out_ref[sl, :] = jnp.broadcast_to(pvec[4], (BR, tc))
