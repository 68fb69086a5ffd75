"""Vcall dispatch-strategy benchmark (round 4; VERDICT r3 #8).

The reference keeps a sort+partition vcall path BECAUSE it wins at high
instance counts on GPU (horiz.cu:35, array_call.h:147-165). On TPU the
trade is different -- XLA's static shapes mean every callee runs at full
lane width under BOTH strategies, so partition only pays off through
memory coherence inside the callees, not through reduced FLOPs. This
tool measures the real crossover on the chip:

  k in {2, 8, 32} instances x {uniform, skewed} id distributions
  x {compute-heavy, gather-heavy} callees, masked vs partition.

Timing: two-point scan-chained windows (bench.py::_bench_scan
methodology -- block_until_ready lies through the axon tunnel).

Run on the TPU box:  PYTHONPATH=/root/repo python tools/bench_vcall.py
The results table lives in docs/structs.md; the measured crossover sets
_AUTO_PARTITION_MIN_K in struct/call.py (strategy="auto").
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import functools

import jax
import jax.numpy as jnp
import numpy as np

from enoki_tpu.struct.call import dispatch_masked, dispatch_partition

print = functools.partial(print, flush=True)

N = 1 << 20  # lanes
TABLE = 1 << 14


def make_funcs(k, kind):
    """k callees. compute: ~40 flops of distinct transcendental work per
    callee; gather: callee-specific permutation into a shared table (the
    memory-coherence case partition exists for)."""
    table = jnp.asarray(np.random.default_rng(0).normal(
        size=(TABLE,)).astype(np.float32))

    funcs = []
    for i in range(k):
        c = 0.1 + 0.03 * i
        if kind == "compute":
            def f(m, x, c=c):
                y = x
                for _ in range(5):
                    y = jnp.sin(y * c) + jnp.cos(y + c)
                return y
        else:
            def f(m, x, i=i, c=c):
                idx = (x.astype(jnp.int32) * (2 * i + 1)) & (TABLE - 1)
                return table[idx] * c + x
        funcs.append(f)
    return funcs


def make_ids(k, dist, seed=0):
    rng = np.random.default_rng(seed)
    if dist == "uniform":
        ids = rng.integers(0, k, N)
    else:  # skewed: 90% of lanes hit instance 0
        ids = np.where(rng.random(N) < 0.9, 0, rng.integers(0, k, N))
    return jnp.asarray(ids.astype(np.int32))


def bench(step_fn, x0, k_lo=20, k_hi=80):
    def make(iters):
        @jax.jit
        def run(x):
            def body(carry, j):
                out = step_fn(carry)
                # data-dependence + per-step variation so XLA cannot
                # hoist the body (memory: axon timing pitfalls)
                return (x + out * 1e-12 + 1e-6 * j.astype(jnp.float32)
                        ).astype(jnp.float32), out[0]
            _, outs = jax.lax.scan(body, x, jnp.arange(iters))
            return outs[-1]
        return run

    lo, hi = make(k_lo), make(k_hi)
    np.asarray(lo(x0)); np.asarray(hi(x0))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(lo(x0)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(hi(x0)); th = time.perf_counter() - t0
        samples.append((th - tl) / (k_hi - k_lo))
    samples.sort()
    return samples[1]


def main():
    x0 = jnp.asarray(np.random.default_rng(1).normal(
        size=(N,)).astype(np.float32) * 100)
    print(f"platform: {jax.default_backend()}, lanes: {N}")
    print("| callee | k | ids | masked ms | partition ms | winner |")
    print("|---|---|---|---|---|---|")
    for kind in ("compute", "gather"):
        for k in (2, 8, 32):
            funcs = make_funcs(k, kind)
            for dist in ("uniform", "skewed"):
                ids = make_ids(k, dist)
                tm = bench(lambda x: dispatch_masked(funcs, ids, x), x0)
                tp = bench(lambda x: dispatch_partition(funcs, ids, x), x0)
                w = "masked" if tm <= tp else "partition"
                print(f"| {kind} | {k} | {dist} | {tm*1e3:.3f} | "
                      f"{tp*1e3:.3f} | {w} |")


if __name__ == "__main__":
    main()
