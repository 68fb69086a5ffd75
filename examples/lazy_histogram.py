"""Histogram mini-app on the LAZY trace -- the reference's
tests/histogram.cpp as it runs on CUDAArray: PCG32<UInt64C> generation,
probit transform (erfinv, histogram.cpp:37-47) and conflict-safe
scatter_add all recorded into one trace and fused into a single program
at eval (the reference fuses the same pipeline into one PTX megakernel;
docs/gpu.rst).

Run: python examples/lazy_histogram.py [n]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import enoki_tpu.trace as tr
from enoki_tpu.ops.special import erfinv
from enoki_tpu.trace import LazyArray
from enoki_tpu.types.random import PCG32

BINS = 32
LO, HI = -4.0, 4.0


def main(n=1 << 20):
    gen = PCG32.create_lazy(n)          # lazy RNG lanes
    u, gen = gen.next_float32()         # still lazy
    # probit sampling: uniform -> normal via erfinv (histogram.cpp:37-47),
    # the Giles fit composed entirely from trace opcodes
    g = erfinv(2.0 * u - 1.0) * float(np.sqrt(2.0))
    idx = ((g - LO) * (BINS / (HI - LO))).cast(np.int32)
    hist = LazyArray(np.zeros(BINS, np.float32))
    hist.scatter_add(tr.clamp(idx, 0, BINS - 1), LazyArray.full(1.0, n))

    evals_before = tr.stats()["n_evals"]
    counts = hist.numpy()               # ONE fused program: seed ->
    #                                     draws -> erfinv -> scatter_add
    assert tr.stats()["n_evals"] == evals_before + 1
    assert counts.sum() == n

    peak = counts.max()
    for b in range(BINS):
        bar = "*" * int(round(40 * counts[b] / peak))
        print(f"{LO + (HI - LO) * b / BINS:5.1f} | {bar}")
    print(f"\n{n:,} normal samples via lazy PCG32 + erfinv, {BINS} bins, "
          "one fused program")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20)
