"""Real spherical harmonics evaluation, orders 0..9.

Parity with reference include/enoki/sh.h (843 lines of generated code based
on P.-P. Sloan, "Efficient Spherical Harmonic Evaluation", JCGT 2013).
Instead of generated straight-line code we implement Sloan's recurrences
directly -- the trace unrolls to the same straight-line arithmetic under
jit, so the codegen step is unnecessary.

Convention (matches the reference/Sloan):
  * input is a *unit* direction d = (x, y, z);
  * output is a flat array of (order+1)^2 coefficients indexed
    l*(l+1) + m, l in [0, order], m in [-l, l];
  * real SH basis with the graphics-standard Condon-Shortley-free
    normalization: y_l^m = K_l^m P_l^m(z) * {sqrt(2) cos(m phi) (m>0),
    1 (m=0), sqrt(2) sin(|m| phi) (m<0)}, with the Sloan sign convention
    (sin/cos terms built from incremental rotation of (x, y)).

Verified against scipy.special in tests/test_sh.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _K(l: int, m: int) -> float:
    """SH normalization constant K_l^m (host-side python float)."""
    m = abs(m)
    num = (2 * l + 1) * math.factorial(l - m)
    den = 4 * math.pi * math.factorial(l + m)
    return math.sqrt(num / den)


def sh_eval(x, y, z, order: int):
    """Evaluate all real SH bands 0..order at unit directions (x, y, z).

    Returns a list of (order+1)^2 arrays (SoA -- one per coefficient), index
    l*(l+1)+m, matching sh_eval's output array (sh.h:25-38).
    """
    if order > 9:
        raise ValueError("sh_eval(): order too high (max 9, sh.h:37)")
    from ..ops import backend as B

    if B.is_lazy(x) or B.is_lazy(y) or B.is_lazy(z):
        # lift eager/scalar members so every coefficient (incl. the pure-
        # z m=0 band) comes back lazy
        ref = x if B.is_lazy(x) else y if B.is_lazy(y) else z
        lift = lambda v: v if B.is_lazy(v) else ref * 0.0 + v
        x, y, z = lift(x), lift(y), lift(z)
    else:
        # one promotion decision for ALL THREE components (casting only
        # z to x's dtype would mix precisions across bands: m=0 bands
        # see the downcast z, m!=0 bands promote through y)
        x = jnp.asarray(x)
        dt = jnp.result_type(x, y, z)
        x, y, z = x.astype(dt), jnp.asarray(y, dt), jnp.asarray(z, dt)

    n = (order + 1) ** 2
    out = [None] * n

    # P_l^m(z) via stable recurrences, with sin^m(theta) factored out:
    # define Pb_m^m = (sin theta)^-m * P_m^m  (a constant times product of
    # odd numbers), and recurse in l at fixed m. The sin^m factor is folded
    # into the incremental (cos m phi, sin m phi) pair:
    #   c_m + i s_m = (x + i y)^m  == sin^m(theta) (cos m phi + i sin m phi)
    # exactly Sloan's trick, which avoids trig entirely.
    one = z * 0.0 + 1.0

    # incremental (x + iy)^m
    cm = one  # (x+iy)^0 real
    sm = z * 0.0  # imag

    # pmm = Pb_m^m (scalar recurrence factor), tracked as python float
    pmm_scale = 1.0
    for m in range(0, order + 1):
        if m > 0:
            # (x+iy)^m incremental update
            cm, sm = x * cm - y * sm, x * sm + y * cm
            pmm_scale *= -(2 * m - 1)

        # l = m band
        pb_prev = one * pmm_scale  # Pb_m^m
        _store(out, m, m, pb_prev, cm, sm)

        if m == order:
            break

        # l = m + 1: Pb_{m+1}^m = z (2m + 1) Pb_m^m
        pb = z * (2 * m + 1) * pmm_scale
        _store(out, m + 1, m, pb, cm, sm)

        # upward recurrence in l
        pb_prev2 = pb_prev
        for l in range(m + 2, order + 1):
            pb_new = ((2 * l - 1) * z * pb - (l + m - 1) * pb_prev2) / (l - m)
            pb_prev2 = pb
            pb = pb_new
            _store(out, l, m, pb, cm, sm)

    return out


def _store(out, l: int, m: int, pb, cm, sm):
    """Write the +/-m pair (or the m=0 entry) for band l."""
    k = _K(l, m)
    if m == 0:
        out[l * (l + 1)] = k * pb
    else:
        sqrt2 = math.sqrt(2.0)
        out[l * (l + 1) + m] = sqrt2 * k * pb * cm
        out[l * (l + 1) - m] = sqrt2 * k * pb * sm


def sh_eval_stacked(x, y, z, order: int):
    """Same as sh_eval but stacked into one (..., (order+1)^2) array."""
    return jnp.stack(sh_eval(x, y, z, order), axis=-1)
