"""Fit the double-precision erf/erfc kernels for ops/special.py.

Own fits (mpmath at 60 digits), same provenance as tools/fit_math_f64.py.
Small branch: erf(x)/x in z = x^2 on [0, 1] (monomial, low degree, well
conditioned). Tail: K(q) = erfc(x) * x * exp(x^2) in q = 1/x^2, split at
x = 2. The tail needs degree ~25, where monomial coefficients explode to
1e13 and cancel catastrophically in f64 -- so the tail is emitted as
CHEBYSHEV-BASIS coefficients on the affine-mapped interval, evaluated
with Clenshaw (ops/special._chebeval). q >= 1/27.3^2 because f64 erfc
underflows beyond x ~ 27.3.

Run: python tools/fit_special_f64.py
"""

import mpmath as mp

mp.mp.dps = 60


def emit_monomial(name, f, lo, hi, deg):
    coeffs, err = mp.chebyfit(f, [lo, hi], deg, error=True)
    lows = [float(c) for c in reversed(coeffs)]
    print(f"# {name}: deg {deg - 1}, max abs err {mp.nstr(err, 3)} "
          f"(monomial, low -> high)")
    print(f"_{name} = (")
    for i in range(0, len(lows), 3):
        print("    " + ", ".join(repr(v) for v in lows[i:i + 3]) + ",")
    print(")")


def emit_chebyshev(name, f, lo, hi, n):
    """Chebyshev interpolation coefficients a_0..a_{n-1} on [lo, hi]
    (a_0 pre-halved): f(q) ~= sum a_k T_k(t), t = (2q - hi - lo)/(hi - lo).
    """
    lo, hi = mp.mpf(lo), mp.mpf(hi)
    nodes = [mp.cos(mp.pi * (i + mp.mpf("0.5")) / n) for i in range(n)]
    vals = [f((t + 1) / 2 * (hi - lo) + lo) for t in nodes]
    coeffs = []
    for j in range(n):
        c = 2 * mp.fsum(vals[i] * mp.cos(mp.pi * j * (i + mp.mpf("0.5")) / n)
                        for i in range(n)) / n
        coeffs.append(c / 2 if j == 0 else c)
    # interpolation error probe on a dense grid
    def approx(q):
        t = (2 * q - hi - lo) / (hi - lo)
        return coeffs[0] + mp.fsum(coeffs[k] * mp.chebyt(k, t)
                                   for k in range(1, n))
    err = max(abs(approx(lo + (hi - lo) * mp.mpf(i) / 300) -
                  f(lo + (hi - lo) * mp.mpf(i) / 300)) for i in range(301))
    print(f"# {name}: {n} Chebyshev terms on [{float(lo)!r}, {float(hi)!r}],"
          f" max abs err {mp.nstr(err, 3)} (a0 pre-halved)")
    print(f"_{name} = (")
    fl = [float(c) for c in coeffs]
    for i in range(0, len(fl), 3):
        print("    " + ", ".join(repr(v) for v in fl[i:i + 3]) + ",")
    print(")")


emit_monomial("ERF64_SMALL", lambda z: mp.erf(mp.sqrt(z)) / mp.sqrt(z),
              mp.mpf("1e-24"), mp.mpf(1), 16)


def K(q):
    x = 1 / mp.sqrt(q)
    return mp.erfc(x) * x * mp.exp(x * x)


Q_MIN = float(1 / mp.mpf("27.3") ** 2)
emit_chebyshev("ERFC64_BIG", K, Q_MIN, 0.25, 28)   # x in [2, 27.3]
emit_chebyshev("ERFC64_MID", K, 0.25, 1.0, 28)     # x in [1, 2]
print(f"_ERFC64_Q_MIN = {Q_MIN!r}")


# ---- dawson / i0e double-precision kernels (r2 additions) ---------------

def _dawson(x):
    return mp.sqrt(mp.pi) / 2 * mp.exp(-x * x) * mp.erfi(x)


emit_chebyshev("DAWSON64_SMALL",
               lambda z: _dawson(mp.sqrt(z)) / mp.sqrt(z),
               1e-24, 36.0, 52)          # F(x)/x in z = x^2, |x| <= 6
emit_chebyshev("DAWSON64_TAIL",
               lambda q: 2 / mp.sqrt(q) * _dawson(1 / mp.sqrt(q)),
               1e-24, float(1 / mp.mpf(36)), 20)  # 2xF in q = 1/x^2, x > 6
emit_chebyshev("I0E64_A",
               lambda x: mp.besseli(0, x) * mp.exp(-x),
               1e-24, 8.0, 34)           # i0e on [0, 8]
emit_chebyshev("I0E64_B",
               lambda q: mp.besseli(0, 1 / q) * mp.exp(-1 / q)
               * mp.sqrt(1 / q),
               1e-24, 0.125, 26)         # i0e(x) sqrt(x) in q = 1/x, x > 8


# ---- lgamma double-precision kernels (r2) --------------------------------
# Factored-zero structure like the f32 path (tools/fit_lgamma.py): the
# zeros at x=1 and x=2 are divided out so accuracy near them is RELATIVE
# (XLA's own f64 gammaln loses ~12k ulp there). Branches:
#   [0.5, 1.5): u*(A(u)), u = x-1      [1.5, 2.75): v*(B(v)), v = x-2
#   [2.75, 8): direct Chebyshev        [8, inf): Stirling + S(1/x^2)/x
# (0, 0.5): recurrence lgamma(x) = lgamma(x+1) - log x; x < 0: reflection.

def _lgA(u):
    return mp.loggamma(1 + u) / u


def _lgB(v):
    if v == 0:
        return mp.digamma(2)
    return mp.loggamma(2 + v) / v


def _lgS(w):
    x = 1 / mp.sqrt(w)
    return x * (mp.loggamma(x) - (x - mp.mpf("0.5")) * mp.log(x) + x
                - mp.log(2 * mp.pi) / 2)


emit_chebyshev("LG64_A", _lgA, -0.4999999999, 0.5, 36)
emit_chebyshev("LG64_B", _lgB, -0.5, 0.75, 32)
emit_chebyshev("LG64_MID", lambda x: mp.loggamma(x), 2.75, 8.0, 34)
emit_chebyshev("LG64_STIR", _lgS, 1e-18, float(1 / mp.mpf(64)), 12)
