"""Histogram mini-app -- parity with reference tests/histogram.cpp.

16M normal-distributed samples generated on device (PCG32 -> uniform ->
probit via erfinv, histogram.cpp:37-47), binned with conflict-safe masked
scatter_add (histogram.cpp:54), timed, and printed as a terminal bar
chart like the reference's main().

Run: python examples/histogram.py [n]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from enoki_tpu import ops
from enoki_tpu.types import PCG32

BINS = 64
LO, HI = -4.0, 4.0


@jax.jit
def build_histogram(gen: PCG32):
    u, gen = gen.next_float32()
    g = ops.erfinv(2.0 * u - 1.0) * np.sqrt(2.0)  # probit sampling
    bins = jnp.floor((g - LO) * (BINS / (HI - LO))).astype(jnp.int32)
    # ops.histogram: the named dense-histogram op (OOB indices drop, the
    # reference's masked-scatter_add semantics; 14.1 G samples/s for the
    # binning alone -- docs/benchmarks.md)
    hist = ops.histogram(bins, BINS)
    return hist, gen


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24  # 16M
    gen = PCG32.create(n)

    hist, gen2 = build_histogram(gen)
    np.asarray(hist)  # warm (a host readback is the only reliable fence
    # through the remote tunnel; block_until_ready returns early there)

    iters = 10
    t0 = time.perf_counter()
    g = gen2
    for _ in range(iters):
        hist, g = build_histogram(g)  # chained: iteration i+1 needs i
    np.asarray(hist)
    dt = (time.perf_counter() - t0) / iters

    hist = np.asarray(hist)
    print(f"samples: {n:,}   time: {dt * 1e3:.3f} ms   "
          f"({n / dt / 1e9:.2f} G samples/s: RNG + erfinv + scatter_add)")
    peak = hist.max()
    for i in range(0, BINS, 2):  # 32 rows
        x = LO + (i + 0.5) * (HI - LO) / BINS
        bar = "*" * int(round(40 * (hist[i] + hist[i + 1]) / (2 * peak)))
        print(f"{x:+5.2f} | {bar}")


if __name__ == "__main__":
    main()
