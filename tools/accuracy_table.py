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
     python tools/accuracy_table.py --lazy        (LazyArray rows, CPU)
     python tools/accuracy_table.py --lazy-native (named trace opcodes on
         the AMBIENT platform -- run on the TPU box to measure the real
         chip's lowerings, which differ from CPU; f32 only, TPU has no f64)
     python tools/accuracy_table.py --f16         (bf16/f16 rows of the
         poly path through the _bf16_safe compute-in-f32 policy)
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os

AMBIENT = "--lazy-native" in sys.argv  # measure the real platform's lowerings

if not AMBIENT:
    os.environ.setdefault("ENOKI_TPU_TEST_PLATFORM", "cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not AMBIENT:
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


def ulp_error16(result, reference, mbits):
    """ULP distance for 16-bit formats (np.spacing has no bf16): spacing
    of a NORMAL value v is 2^(floor(log2|v|) - mbits); the sweep domains
    below stay clear of the subnormal range."""
    import jax.numpy as jnp

    dt = jnp.bfloat16 if mbits == 7 else jnp.float16
    want = np.asarray(jnp.asarray(reference).astype(dt), np.float64)
    got = np.asarray(result, np.float64)
    # where the correctly-rounded answer overflows the format, inf is the
    # right result -- exclude those lanes from the ulp statistic
    ok = np.isfinite(want) & (want != 0)
    want, got = want[ok], got[ok]
    spacing = 2.0 ** (np.floor(np.log2(np.abs(want))) - mbits)
    return np.abs(got - want) / spacing


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
                    # bounds as eager). Since round 4 the poly column is
                    # the REAL Cody-Waite kernel on the trace (the
                    # generic-ns instantiation), not a dropped kwarg.
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


def _table_lazy_native(n):
    """Named trace opcodes (SIN..LGAMMA) on the AMBIENT platform.

    The --lazy table above measures the trace on CPU; the opcodes lower
    to whatever XLA emits for the current backend, and TPU lowerings
    differ from CPU. Run this mode on the chip to publish honest
    per-backend rows (the reference is likewise per-backend-honest
    about approx GPU math, docs/reference.rst)."""
    import enoki_tpu.trace as tr

    rng = np.random.default_rng(0)
    plat = jax.default_backend()
    print(f"\n### f32, named trace opcodes on platform = {plat}\n")
    print("| opcode | domain | avg / max ulp |")
    print("|---|---|---|")
    OPS = [
        ("SIN", tr.sin, np.sin, -8192, 8192, False),
        ("COS", tr.cos, np.cos, -8192, 8192, False),
        ("TAN", tr.tan, np.tan, -8192, 8192, False),
        ("ASIN", tr.asin, np.arcsin, -1, 1, False),
        ("ACOS", tr.acos, np.arccos, -1, 1, False),
        ("ATAN", tr.atan, np.arctan, -1, 1, False),
        ("EXP", tr.exp, np.exp, -20, 30, False),
        ("EXP2", tr.exp2, np.exp2, -30, 30, False),
        ("LOG", tr.log, np.log, 1e-20, 2e30, True),
        ("LOG2", tr.log2, np.log2, 1e-20, 2e30, True),
        ("LOG1P", tr.log1p, np.log1p, -0.9, 10, False),
        ("EXPM1", tr.expm1, np.expm1, -10, 10, False),
        ("SINH", tr.sinh, np.sinh, -10, 10, False),
        ("COSH", tr.cosh, np.cosh, -10, 10, False),
        ("TANH", tr.tanh, np.tanh, -10, 10, False),
        ("ASINH", tr.asinh, np.arcsinh, -100, 100, False),
        ("ACOSH", tr.acosh, np.arccosh, 1.001, 100, False),
        ("ATANH", tr.atanh, np.arctanh, -0.999, 0.999, False),
        ("CBRT", tr.cbrt, np.cbrt, -1e10, 1e10, False),
        ("ERF", tr.erf, sps.erf, -4, 4, False),
        ("ERFC", tr.erfc, sps.erfc, -4, 4, False),
        ("LGAMMA", tr.lgamma, sps.gammaln, 0.1, 30, False),
        ("RSQRT", tr.rsqrt, lambda v: 1.0 / np.sqrt(v), 1e-10, 1e10, True),
        ("RCP", tr.rcp, lambda v: 1.0 / v, 1e-10, 1e10, True),
    ]
    for name, fn, ref_fn, lo, hi, log_space in OPS:
        if log_space:
            xs = np.exp(rng.uniform(np.log(lo), np.log(hi), n))
        else:
            xs = rng.uniform(lo, hi, n)
        xs = xs.astype(np.float32)
        want = ref_fn(xs.astype(np.float64))
        finite = np.isfinite(want) & (want != 0)
        got = np.asarray(fn(tr.LazyArray(xs)).numpy(), np.float64)
        err = ulp_error(got[finite], want[finite], np.float32)
        print(f"| {name} | [{lo:g}, {hi:g}] | "
              f"{err.mean():.4f} / {err.max():.0f} |")


def _table16(n):
    """bf16/f16 rows for the poly path: _bf16_safe computes in f32 and
    rounds back, so the expectation is <= 0.5 ulp-of-format plus the f32
    kernel's own error scaled down by the format's coarser spacing
    (i.e. ~correctly rounded). Measured, not assumed."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    SWEEP = [
        ("sin", m.sin, np.sin, -100, 100),
        ("cos", m.cos, np.cos, -100, 100),
        ("exp", m.exp, np.exp, -20, 20),
        ("log", m.log, np.log, 0.01, 1e4),
        ("tanh", m.tanh, np.tanh, -8, 8),
        ("atan", m.atan, np.arctan, -10, 10),
    ]
    for dt, mbits, label in ((jnp.bfloat16, 7, "bfloat16"),
                             (jnp.float16, 10, "float16")):
        print(f"\n### {label}, poly path (compute-in-f32 policy)\n")
        print("| function | domain | poly avg/max ulp({}) |".format(label))
        print("|---|---|---|")
        for name, fn, ref_fn, lo, hi in SWEEP:
            xs64 = rng.uniform(lo, hi, n)
            xs = jnp.asarray(xs64).astype(dt)
            want = ref_fn(np.asarray(xs, np.float64))
            finite = np.isfinite(want) & (want != 0)
            got = np.asarray(fn(xs, impl="poly"), np.float64)
            err = ulp_error16(got[finite], want[finite], mbits)
            print(f"| {name} | [{lo:g}, {hi:g}] | "
                  f"{err.mean():.4f} / {err.max():.1f} |")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    lazy = "--lazy" in sys.argv
    n = int(args[0]) if args else 200_000
    if AMBIENT:
        _table_lazy_native(n)
        return
    if "--f16" in sys.argv:
        _table16(min(n, 100_000))
        return
    _table(n, np.float32, lazy=lazy)
    jax.config.update("jax_enable_x64", True)
    # f64 rows: mpmath references are slow -- subsample
    _table(min(n, 20_000), np.float64, lazy=lazy)


if __name__ == "__main__":
    main()
