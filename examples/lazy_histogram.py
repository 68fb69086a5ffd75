"""Histogram mini-app on the LAZY trace -- the reference's
tests/histogram.cpp as it runs on CUDAArray: PCG32<UInt64C> generation,
uniform transform and conflict-safe scatter_add all recorded into one
trace and fused into a single program at eval (the reference fuses the
same pipeline into one PTX megakernel; docs/gpu.rst).

Run: python examples/lazy_histogram.py [n]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import enoki_tpu.trace as tr
from enoki_tpu.trace import LazyArray
from enoki_tpu.types.random import PCG32

BINS = 32


def main(n=1 << 20):
    gen = PCG32.create_lazy(n)          # lazy RNG lanes
    u, gen = gen.next_float32()         # still lazy
    idx = (u * float(BINS)).cast(np.int32)
    hist = LazyArray(np.zeros(BINS, np.float32))
    hist.scatter_add(idx, LazyArray.full(1.0, n))

    evals_before = tr.stats()["n_evals"]
    counts = hist.numpy()               # ONE fused program: seed ->
    #                                     draws -> binning -> scatter_add
    assert tr.stats()["n_evals"] == evals_before + 1
    assert counts.sum() == n

    peak = counts.max()
    for b in range(BINS):
        bar = "*" * int(round(40 * counts[b] / peak))
        print(f"{b / BINS:5.2f} | {bar}")
    print(f"\n{n:,} samples, {BINS} bins, one fused lazy program "
          f"(uniformity spread {counts.std() / counts.mean():.4f})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20)
