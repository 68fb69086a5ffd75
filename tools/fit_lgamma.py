"""Fit the central-interval lgamma polynomial used by ops/special.py.

Near the zeros of lgamma (x = 1 and x = 2) any direct evaluation has
unbounded ULP error in f32: the result crosses 0 while intermediate terms
are O(1). Standard fix (same idea as glibc's lgamma): factor the zeros
out analytically -- on [0.5, 2.75]

    lgamma(x) = (x - 1) (x - 2) * Q(x)

where Q is smooth and O(1), and fit Q by least squares in the *relative
error of lgamma itself*. The f32 evaluation then computes (x-1) and (x-2)
exactly (inputs are f32), so the relative error near the zeros is just
Q's relative error.
"""

import numpy as np
from scipy.special import gammaln
from scipy.optimize import least_squares

def fit(lo, hi, zero, deg, npts=20000):
    """Fit lgamma(x) = u * poly(u), u = x - zero: one factored zero per
    interval, centered variable so f32 Horner stays well conditioned."""
    x = np.linspace(lo, hi, npts)
    x = x[np.abs(x - zero) > 1e-9]
    y = gammaln(x)
    u = x - zero
    q = y / u

    def resid(c):
        approx = u * np.polynomial.polynomial.polyval(u, c)
        return (approx - y) / np.maximum(np.abs(y), 1e-30)

    c0 = np.polynomial.polynomial.polyfit(u, q, deg)
    sol = least_squares(resid, c0, method="lm", max_nfev=50000)

    # simulate f32 Horner (what ops/special.py actually executes)
    uf = u.astype(np.float32)
    acc = np.float32(sol.x[-1]) * np.ones_like(uf)
    for c in sol.x[-2::-1]:
        acc = (acc * uf + np.float32(c)).astype(np.float32)
    approx32 = (uf * acc).astype(np.float32).astype(np.float64)
    rel32 = np.abs((approx32 - y) / np.maximum(np.abs(y), 1e-30)).max()
    return sol.x, np.abs(resid(sol.x)).max(), rel32


for lo, hi, zero, deg, name in [(0.5, 1.5, 1.0, 12, "_LGAMMA_A"),
                                (1.5, 2.75, 2.0, 12, "_LGAMMA_B")]:
    c, e64, e32 = fit(lo, hi, zero, deg)
    print(f"[{lo},{hi}] zero={zero}: f64 rel {e64:.2e}, "
          f"f32-horner rel {e32:.2e}")
    print(f"{name} = (", ",\n    ".join(repr(float(v)) for v in c), ")")
