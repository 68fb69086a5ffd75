"""Complex numbers as a registered pytree (SoA re/im arrays).

Parity with reference include/enoki/complex.h: ``Complex<T>`` is a 2-array
with full complex algebra incl. exp/log/sqrt/trig (complex.h:27,136-230).

TPU-native design: instead of jnp's complex64 dtype (limited TPU support,
no bf16), we store separate re/im arrays -- every op is plain VPU
elementwise code, works in f32/bf16, differentiates, vmaps, shards.

Backend-generic (the reference's Complex<T> instantiates for FloatP AND
FloatC from one source): elements may be eager jnp arrays or lazy
``trace.LazyArray``s -- ops dispatch through ops.backend.math_ns, so a
Complex over LazyArrays records into the trace and fuses at eval.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import backend as B
from ..ops import math as M


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Complex:
    re: jnp.ndarray
    im: jnp.ndarray

    # -- construction -------------------------------------------------------

    @staticmethod
    def of(re, im=0.0) -> "Complex":
        if B.is_lazy(re) or B.is_lazy(im):
            if not B.is_lazy(im):
                im = re * 0.0 + im
            if not B.is_lazy(re):
                re = im * 0.0 + re
            return Complex(re, im)
        re = jnp.asarray(re, jnp.result_type(re, 1.0))
        im = jnp.broadcast_to(jnp.asarray(im, re.dtype), jnp.shape(re)) \
            if jnp.ndim(im) == 0 else jnp.asarray(im, re.dtype)
        return Complex(re, im)

    # -- arithmetic ----------------------------------------------------------

    def __add__(self, o):
        o = _c(o)
        return Complex(self.re + o.re, self.im + o.im)

    __radd__ = __add__

    def __sub__(self, o):
        o = _c(o)
        return Complex(self.re - o.re, self.im - o.im)

    def __rsub__(self, o):
        return _c(o) - self

    def __mul__(self, o):
        if not isinstance(o, Complex):
            return Complex(self.re * o, self.im * o)
        return Complex(self.re * o.re - self.im * o.im,
                       self.re * o.im + self.im * o.re)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if not isinstance(o, Complex):
            return Complex(self.re / o, self.im / o)
        return self * rcp(o)

    def __rtruediv__(self, o):
        return _c(o) * rcp(self)

    def __neg__(self):
        return Complex(-self.re, -self.im)

    def __eq__(self, o):
        o = _c(o)
        return (self.re == o.re) & (self.im == o.im)

    def __ne__(self, o):
        o = _c(o)
        return (self.re != o.re) | (self.im != o.im)


def _c(x, like=None) -> Complex:
    if isinstance(x, Complex):
        return x
    if B.is_lazy(x):
        return Complex(x, x * 0.0)
    if like is not None and B.is_lazy(like.re):
        return Complex(like.re * 0.0 + x, like.re * 0.0)
    x = jnp.asarray(x)
    return Complex(x, jnp.zeros_like(x))


def real(z: Complex):
    return z.re


def imag(z: Complex):
    return z.im


def conj(z: Complex) -> Complex:
    return Complex(z.re, -z.im)


def squared_norm(z: Complex):
    return z.re * z.re + z.im * z.im


def abs_(z: Complex):
    return B.math_ns(z.re).hypot(z.re, z.im)


def arg(z: Complex):
    return B.math_ns(z.re).atan2(z.im, z.re)


def rcp(z: Complex) -> Complex:
    """1/z = conj(z)/|z|^2 (complex.h rcp)."""
    inv = 1.0 / squared_norm(z)
    return Complex(z.re * inv, -z.im * inv)


def sqrt(z: Complex) -> Complex:
    """Principal square root (complex.h sqrt).

    Uses safe_sqrt (custom-JVP, zero slope at 0): on the real axis one
    of the two branches is sqrt(exactly 0), whose native derivative is
    inf -- the zero cotangent flowing into it would turn the OTHER
    branch's perfectly finite gradient into NaN via 0 * inf."""
    from ..ops.router import safe_sqrt as _ss

    r = abs_(z)
    g = B.math_ns(z.re)
    re = _ss(0.5 * (r + z.re))
    im_mag = _ss(0.5 * (r - z.re))
    im = g.select(z.im < 0, -im_mag, im_mag)
    return Complex(re, im)


def exp(z: Complex, impl="native") -> Complex:
    g = B.math_ns(z.re, impl)
    e = g.exp(z.re)
    s, c = g.sincos(z.im)
    return Complex(e * c, e * s)


def log(z: Complex, impl="native") -> Complex:
    g = B.math_ns(z.re, impl)
    return Complex(0.5 * g.log(squared_norm(z)), arg(z))


def pow(z: Complex, w, impl="native") -> Complex:
    w = _c(w, like=z)
    return exp(w * log(z, impl), impl)


def sin(z: Complex, impl="native") -> Complex:
    g = B.math_ns(z.re, impl)
    s, c = g.sincos(z.re)
    sh, ch = g.sincosh(z.im)
    return Complex(s * ch, c * sh)


def cos(z: Complex, impl="native") -> Complex:
    g = B.math_ns(z.re, impl)
    s, c = g.sincos(z.re)
    sh, ch = g.sincosh(z.im)
    return Complex(c * ch, -s * sh)


def sincos(z: Complex, impl="native"):
    g = B.math_ns(z.re, impl)
    s, c = g.sincos(z.re)
    sh, ch = g.sincosh(z.im)
    return Complex(s * ch, c * sh), Complex(c * ch, -s * sh)


def tan(z: Complex, impl="native") -> Complex:
    s, c = sincos(z, impl)
    return s / c


def sinh(z: Complex, impl="native") -> Complex:
    g = B.math_ns(z.re, impl)
    sh, ch = g.sincosh(z.re)
    s, c = g.sincos(z.im)
    return Complex(sh * c, ch * s)


def cosh(z: Complex, impl="native") -> Complex:
    g = B.math_ns(z.re, impl)
    sh, ch = g.sincosh(z.re)
    s, c = g.sincos(z.im)
    return Complex(ch * c, sh * s)


def tanh(z: Complex, impl="native") -> Complex:
    return sinh(z, impl) / cosh(z, impl)


def asin(z: Complex, impl="native") -> Complex:
    """asin z = -i log(i z + sqrt(1 - z^2)) (complex.h)."""
    i_z = Complex(-z.im, z.re)
    s = sqrt(_c(1.0, like=z) - z * z)
    l = log(i_z + s, impl)
    return Complex(l.im, -l.re)


def acos(z: Complex, impl="native") -> Complex:
    a = asin(z, impl)
    return Complex(jnp.pi / 2 - a.re, -a.im)


def atan(z: Complex, impl="native") -> Complex:
    """atan z = i/2 (log(1 - iz) - log(1 + iz))."""
    i_z = Complex(-z.im, z.re)
    one = _c(1.0, like=z)
    l = log((one - i_z) / (one + i_z), impl)
    return Complex(-0.5 * l.im, 0.5 * l.re)


def from_jnp_complex(x) -> Complex:
    return Complex(jnp.real(x), jnp.imag(x))


def to_jnp_complex(z: Complex):
    return jax.lax.complex(z.re.astype(jnp.float32), z.im.astype(jnp.float32))
