"""Fit the double-precision kernel polynomials for ops/math.py.

Own minimax-class fits (mpmath.chebyfit at 60-digit working precision)
for every f64 transcendental kernel, plus the exactly-split reduction
constants. Run: python tools/fit_math_f64.py

Kernels are all in z = x^2 (odd functions factored as x + x*z*K(z)),
so one fit serves both branches of asin/acos via the half-angle
identity asin(x) = pi/2 - 2 asin(sqrt((1-x)/2)).

Also emits the 4-chunk float32 pi/4 split for the sin/cos range
reduction: with |x| < 8192 the quotient j <= 10430 (14 bits), so
10-significant-bit chunks keep every j*chunk product EXACT in f32
(10 + 14 <= 24 mantissa bits), which removes the large-|x| ulp tail
the 3-constant Cody-Waite split suffers from.
"""

import mpmath as mp

mp.mp.dps = 60


def fit(name, f, lo, hi, deg):
    coeffs, err = mp.chebyfit(f, [lo, hi], deg, error=True)
    # chebyfit returns highest-degree first; print low->high for Horner
    lows = [float(c) for c in reversed(coeffs)]
    print(f"# {name}: deg {deg - 1}, max abs err {mp.nstr(err, 3)}")
    print(f"_{name} = (")
    for i in range(0, len(lows), 3):
        print("    " + ", ".join(repr(v) for v in lows[i:i + 3]) + ",")
    print(")")
    return err


def z_kernel(g):
    """K(z) = (g(x)/x - 1)/z with x = sqrt(z)."""
    def f(z):
        x = mp.sqrt(z)
        return (g(x) / x - 1) / z
    return f


EPS = mp.mpf("1e-24")

fit("ASIN64", z_kernel(mp.asin), EPS, mp.mpf("0.25"), 16)
fit("ATAN64", z_kernel(mp.atan), EPS, mp.tan(mp.pi / 8) ** 2, 13)
fit("TAN64", z_kernel(mp.tan), EPS, (mp.pi / 4) ** 2, 17)
fit("SINH64", z_kernel(mp.sinh), EPS, mp.mpf(1), 10)
fit("TANH64", z_kernel(mp.tanh), EPS, mp.mpf("0.390625"), 16)
fit("ASINH64", z_kernel(mp.asinh), EPS, mp.mpf("0.25"), 18)
fit("ATANH64", z_kernel(mp.atanh), EPS, mp.mpf("0.25"), 18)
# acosh(1+z) = sqrt(2z) * C(z) on z in [0, 0.5]
fit("ACOSH64", lambda z: mp.acosh(1 + z) / mp.sqrt(2 * z), EPS,
    mp.mpf("0.5"), 14)

# two-part constants (hi = nearest f64, lo = exact remainder in f64)
for name, v in [("PIO2", mp.pi / 2), ("PIO4", mp.pi / 4)]:
    hi = mp.mpf(float(v))
    lo = float(v - hi)
    print(f"_{name}_HI_64, _{name}_LO_64 = {float(hi)!r}, {lo!r}")

# 4-chunk f32 pi/4 split: 10-bit truncated chunks + full-precision tail
v = mp.pi / 4
chunks = []
for _ in range(3):
    e = mp.floor(mp.log(v, 2))
    scale = mp.power(2, e - 9)
    c = mp.floor(v / scale) * scale
    chunks.append(float(c))
    v -= c
chunks.append(float(v))
print("_DP4_F32 = (" + ", ".join(repr(c) for c in chunks) + ")")
print("# chunk sum residual:", mp.nstr(mp.pi / 4 - sum(mp.mpf(c) for c in chunks), 3))
