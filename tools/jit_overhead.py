"""JIT-overhead microbenchmark -- parity with BASELINE.md §B.

The reference publishes three trace-JIT overhead numbers (docs/gpu.rst:
260-271, docs/autodiff.rst:386-387):

  * trace -> PTX string assembly:      541 us (toy), 22.763 ms (10,444-op)
  * PTX -> SASS (ptxas):               43 ms (toy), 299.26 ms (10,444-op)
  * kernel-cache hit:                  re-trace only, compile skipped

This tool measures the equivalents for the TPU lazy-trace runtime
(enoki_tpu.trace over native/trace.cpp):

  * trace+schedule: Python op recording into the C++ graph + the C++ DFS
    schedule + structural hash (the "PTX assembly" analog)
  * compile: first-eval jax trace + XLA compilation of the fused program
  * cache hit: full re-trace + hash lookup + executable dispatch

Run: python tools/jit_overhead.py [n_ops]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax

import enoki_tpu.trace as tr
from enoki_tpu.trace import LazyArray


def build_chain(data, n_ops):
    """A ~n_ops-long fused op chain (the 10,444-op analog)."""
    x = LazyArray(data)
    y = x
    for i in range(n_ops // 4):
        # 4 trace appends per iteration (mul, add-literal makes 2, sqrt)
        y = tr.sqrt(y * y + (1.0 + 1e-6 * (i % 7)))
    return y


def main():
    n_ops = int(sys.argv[1]) if len(sys.argv) > 1 else 10_444
    data = np.linspace(0.5, 1.5, 1 << 16).astype(np.float32)

    # warm the jax backend and the ctypes/bytecode paths (device
    # connection, first transfer and CPython first-call specialization are
    # not trace overhead; the reference's numbers exclude CUDA context
    # creation too -- one-time process costs, ~0.5 s total)
    jax.block_until_ready(jax.numpy.asarray(data))
    build_chain(data, 64).eval()
    tr.reset()

    # --- trace + schedule (no eval) -------------------------------------
    t0 = time.perf_counter()
    y = build_chain(data, n_ops)
    t_trace = time.perf_counter() - t0
    n_appends = tr.stats()["n_appends"]

    # --- first eval: jax trace + XLA compile ----------------------------
    t0 = time.perf_counter()
    y.eval()
    jax.block_until_ready(y.jax())
    t_compile = time.perf_counter() - t0

    # --- cache hit: full re-trace, hash lookup, dispatch ------------------
    del y
    times = []
    for k in range(5):
        t0 = time.perf_counter()
        y2 = build_chain(data + np.float32(k), n_ops)
        y2.eval()
        jax.block_until_ready(y2.jax())
        times.append(time.perf_counter() - t0)
        del y2
    t_hit = sorted(times)[len(times) // 2]
    hits, misses = tr.cache_stats()
    assert hits >= 4, f"expected cache hits, got {(hits, misses)}"

    print(f"fused-chain ops (trace appends) : {n_appends:,}")
    print(f"trace + C++ graph build         : {t_trace * 1e3:9.3f} ms   "
          f"(reference trace->PTX: 22.763 ms @ 10,444 ops)")
    print(f"first eval (jax trace + XLA)    : {t_compile * 1e3:9.3f} ms   "
          f"(reference ptxas: 299.26 ms @ 10,444 ops)")
    print(f"cache-hit re-dispatch (median)  : {t_hit * 1e3:9.3f} ms   "
          f"(reference: ~22.8 ms re-trace, compile skipped)")


if __name__ == "__main__":
    main()
