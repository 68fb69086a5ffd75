"""Measured transcendental-accuracy table -- parity with the reference's
published tables (docs/reference.rst:1285-1527, BASELINE.md §A).

Sweeps each function over the same domain the reference documents,
measures mean/max ULP error of the polynomial path ("poly") and the
XLA-native path against high-precision references, and prints markdown
tables for BOTH precisions (the reference publishes f32 and f64 rows,
docs/reference.rst:1285-1527). Methodology = probe_accuracy (reference
tests/test.h:206-307): the correctly-rounded answer scores 0 ULP. The
f64 rows use mpmath at 40 digits as the reference.

Run: python tools/accuracy_table.py [n_samples]   (CPU references)
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os
os.environ.setdefault("ENOKI_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.special as sps

from enoki_tpu.ops import math as m
from enoki_tpu.ops import special as sp


def ulp_error(result, reference, dtype=np.float32):
    result = np.asarray(result, np.float64)
    want = np.asarray(reference, np.float64).astype(dtype)
    spacing = np.spacing(np.abs(want)).astype(np.float64)
    return np.abs(result - want.astype(np.float64)) / spacing


# (name, fn(x, impl), f64 reference, lo, hi, log_space, reference-claimed
#  "avg / max ulp" string from docs/reference.rst)
CASES = [
    ("sin", lambda x, i: m.sin(x, impl=i), np.sin, -8192, 8192, False,
     "0.25 / 19"),
    ("cos", lambda x, i: m.cos(x, impl=i), np.cos, -8192, 8192, False,
     "0.25 / 47"),
    ("tan", lambda x, i: m.tan(x, impl=i), np.tan, -8192, 8192, False,
     "0.42 / 30"),
    ("asin", lambda x, i: m.asin(x, impl=i), np.arcsin, -1, 1, False,
     "- / 2"),
    ("acos", lambda x, i: m.acos(x, impl=i), np.arccos, -1, 1, False,
     "- / 1"),
    ("atan", lambda x, i: m.atan(x, impl=i), np.arctan, -1, 1, False,
     "4.9 / 12"),
    ("exp", lambda x, i: m.exp(x, impl=i), np.exp, -20, 30, False,
     "0.27 / 1"),
    ("log", lambda x, i: m.log(x, impl=i), np.log, 1e-20, 2e30, True,
     "0.0013 / 1"),
    ("sinh", lambda x, i: m.sinh(x, impl=i), np.sinh, -10, 10, False,
     "- / 3"),
    ("cosh", lambda x, i: m.cosh(x, impl=i), np.cosh, -10, 10, False,
     "- / 4"),
    ("tanh", lambda x, i: m.tanh(x, impl=i), np.tanh, -10, 10, False,
     "- / 7"),
    ("erf", lambda x, i: sp.erf(x, i), sps.erf, -1, 1, False,
     "(special.h)"),
    ("erfinv", lambda x, i: sp.erfinv(x, i), sps.erfinv, -0.999, 0.999,
     False, "(special.h)"),
    ("lgamma", lambda x, i: sp.lgamma(x, i), sps.gammaln, 0.1, 30, False,
     "(special.h)"),
]


def _table(n, dtype, lazy=False):
    rng = np.random.default_rng(0)
    tag = " (lazy backend)" if lazy else ""
    print(f"\n### {np.dtype(dtype).name}{tag}\n")
    print("| function | domain | poly avg/max ulp | native avg/max ulp | "
          "reference avg/max (f32) |")
    print("|---|---|---|---|---|")
    if dtype == np.float64:
        import mpmath as mp

        mp.mp.dps = 40
        refs64 = {"sin": mp.sin, "cos": mp.cos, "tan": mp.tan,
                  "asin": mp.asin, "acos": mp.acos, "atan": mp.atan,
                  "exp": mp.exp, "log": mp.log, "sinh": mp.sinh,
                  "cosh": mp.cosh, "tanh": mp.tanh, "erf": mp.erf,
                  "erfinv": lambda v: mp.erfinv(v),
                  "lgamma": lambda v: mp.loggamma(v)}
    for name, fn, ref_fn, lo, hi, log_space, claimed in CASES:
        if log_space:
            xs = np.exp(rng.uniform(np.log(lo), np.log(hi), n))
        else:
            xs = rng.uniform(lo, hi, n)
        xs = xs.astype(dtype)
        if dtype == np.float64:
            import mpmath as mp

            want = np.array([float(refs64[name](mp.mpf(float(v))))
                             for v in xs])
        else:
            want = ref_fn(xs.astype(np.float64))
        finite = np.isfinite(want) & (want != 0)
        cols = []
        for impl in ("poly", "native"):
            try:
                if lazy:
                    # the SAME call over LazyArray: records trace ops,
                    # evaluates in one fused program (the --lazy probe
                    # VERDICT r2 asked for: lazy rows must meet the same
                    # bounds as eager)
                    from enoki_tpu.trace import LazyArray

                    out = fn(LazyArray(xs), impl)
                    got = np.asarray(out.numpy(), np.float64)
                else:
                    got = np.asarray(fn(xs, impl), np.float64)
                err = ulp_error(got[finite], want[finite], dtype)
                cols.append(f"{err.mean():.4f} / {err.max():.0f}")
            except TypeError:
                cols.append("=")  # special fns have one implementation
        dom = f"[{lo:g}, {hi:g}]"
        print(f"| {name} | {dom} | {cols[0]} | {cols[1]} | {claimed} |")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    lazy = "--lazy" in sys.argv
    n = int(args[0]) if args else 200_000
    _table(n, np.float32, lazy=lazy)
    jax.config.update("jax_enable_x64", True)
    # f64 rows: mpmath references are slow -- subsample
    _table(min(n, 20_000), np.float64, lazy=lazy)


if __name__ == "__main__":
    main()
