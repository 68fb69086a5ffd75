"""Vectorized method calls mini-app -- parity with docs/calls.rst.

The reference's showcase: an array of material "pointers" where
``materials->shade(...)`` dispatches each lane to its instance's virtual
method (array_call.h; GPU path = cub partition + per-instance
gather/scatter). Here: a sphere scene where every pixel's hit point is
shaded by one of three registered material instances, dispatched three
ways (masked select tree / sort-based partition / uniform switch) with
identical results, timed.

Run: python examples/calls.py [n]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from enoki_tpu.struct import dispatch_masked, dispatch_partition

# --- three "materials" (the virtual classes of docs/calls.rst) -----------


def lambert(mask, n_dot_l, base):
    return 0.2 + jnp.maximum(n_dot_l, 0.0) * base


def glossy(mask, n_dot_l, base):
    s = jnp.maximum(n_dot_l, 0.0)
    return 0.1 + (s ** 8) * base * 1.5


def emissive(mask, n_dot_l, base):
    return base * 2.0 + 0 * n_dot_l


MATERIALS = [lambert, glossy, emissive]


def scene_rays(n):
    """n*n lanes: per-lane shading inputs + a material id per lane."""
    ax = jnp.linspace(-1.2, 1.2, n)
    px, py = jnp.meshgrid(ax, ax)
    px, py = px.ravel(), py.ravel()
    r2 = px * px + py * py
    n_dot_l = jnp.where(r2 < 1.0, jnp.sqrt(jnp.maximum(1 - r2, 0.0)), 0.0)
    # material id: 3 vertical stripes; background lanes get id 0
    ids = jnp.clip(((px + 1.2) / 0.8).astype(jnp.int32), 0, 2)
    base = jnp.full_like(px, 60.0)
    return ids, n_dot_l, base


@jax.jit
def shade_masked(ids, n_dot_l, base):
    return dispatch_masked(MATERIALS, ids, n_dot_l, base)


@jax.jit
def shade_partition(ids, n_dot_l, base):
    return dispatch_partition(MATERIALS, ids, n_dot_l, base)


def bench(fn, *args, iters=50):
    # chained scan (see docs/benchmarks.md for why): serial dependency +
    # single readback, two chain lengths to cancel the round-trip cost
    def make(k):
        @jax.jit
        def run(a0):
            def step(x, i):
                out = fn(args[0], x, args[2])
                # the 1e-6*i term keeps the carry varying per step even
                # when the loss term underflows -- otherwise XLA hoists
                # the whole body out of the loop
                return a0 + jnp.mean(out) * 1e-12 \
                    + 1e-6 * i.astype(jnp.float32), None

            s, _ = jax.lax.scan(step, a0, jnp.arange(k))
            return s

        return run

    def fence(r):
        return float(np.asarray(r)[0])

    # modest chain lengths: the partition path sorts every step and long
    # chains at large n can exhaust the worker
    lo, hi = make(iters), make(iters * 4)
    fence(lo(args[1])); fence(hi(args[1]))
    deltas = []
    for _ in range(5):
        t0 = time.perf_counter(); fence(lo(args[1]))
        tl = time.perf_counter() - t0
        t0 = time.perf_counter(); fence(hi(args[1]))
        th = time.perf_counter() - t0
        deltas.append((th - tl) / (iters * 3))
    deltas.sort()
    return max(deltas[len(deltas) // 2], 1e-9)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ids, n_dot_l, base = scene_rays(n)

    a = np.asarray(shade_masked(ids, n_dot_l, base))
    b = np.asarray(shade_partition(ids, n_dot_l, base))
    print("masked == partition:", np.allclose(a, b, rtol=1e-6, atol=1e-5))

    t_m = bench(shade_masked, ids, n_dot_l, base)
    t_p = bench(shade_partition, ids, n_dot_l, base)
    lanes = n * n

    def fmt(t):
        if t < 2e-6:
            return f"< 0.002 ms (below timer resolution)"
        return f"{t * 1e3:7.3f} ms ({lanes / t / 1e9:6.2f} G lanes/s)"

    print(f"dispatch_masked    : {fmt(t_m)}")
    print(f"dispatch_partition : {fmt(t_p)}  [pays the sort; wins when "
          f"callees are heavy]")


if __name__ == "__main__":
    main()
