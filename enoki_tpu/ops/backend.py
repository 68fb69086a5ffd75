"""Backend-generic op dispatch for composite types.

The reference's composite types are generic over the execution backend
-- ``Complex<FloatP>``, ``Complex<FloatC>``, ``Quaternion<FloatD>`` all
instantiate from the same source because every op routes through L2 free
functions that dispatch on the element type (the 5-way dispatch macro,
array_math.h:121-150; SURVEY §1 "the same user source compiles against
all backends").

``ns_of(*elements)`` is that dispatch point here: it returns the op
namespace matching the element type -- jnp/XLA for eager arrays,
``enoki_tpu.trace`` for LazyArray -- so ``types/complex.py``,
``types/quaternion.py`` and ``render/vec.py`` are written once and run
eagerly, lazily (the Complex<FloatC> analog, fused by one eval), and
differentiably on either path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_lazy(x) -> bool:
    """LazyArray detection without importing the trace runtime (which
    builds the native library) for plain-jnp users."""
    return type(x).__module__.startswith("enoki_tpu.trace")


class _JnpNS:
    """Eager namespace (XLA's native lowerings)."""

    sqrt = staticmethod(jnp.sqrt)
    rsqrt = staticmethod(jax.lax.rsqrt)
    exp = staticmethod(jnp.exp)
    log = staticmethod(jnp.log)
    sin = staticmethod(jnp.sin)
    cos = staticmethod(jnp.cos)
    tan = staticmethod(jnp.tan)
    asin = staticmethod(jnp.arcsin)
    acos = staticmethod(jnp.arccos)
    atan = staticmethod(jnp.arctan)
    atan2 = staticmethod(jnp.arctan2)
    sinh = staticmethod(jnp.sinh)
    cosh = staticmethod(jnp.cosh)
    tanh = staticmethod(jnp.tanh)
    abs = staticmethod(jnp.abs)
    maximum = staticmethod(jnp.maximum)
    minimum = staticmethod(jnp.minimum)
    floor = staticmethod(jnp.floor)

    @staticmethod
    def sign(x):
        # the REFERENCE semantics (sign(0)=1, sign(-0.0)=-1), not
        # jnp.sign's sign(0)=0: both namespaces must agree at zero or
        # ns_of()-generic code silently diverges per backend
        from .router import sign as _s

        return _s(x)

    @staticmethod
    def select(m, a, b):
        return jnp.where(m, a, b)

    @staticmethod
    def sincos(x):
        return jnp.sin(x), jnp.cos(x)


class _LazyNS:
    """Lazy namespace: forwards to enoki_tpu.trace's functional API
    (records opcodes; one downstream eval fuses everything)."""

    def __getattr__(self, name):
        import enoki_tpu.trace as tr

        fn = getattr(tr, name)
        setattr(self, name, fn)  # cache for next lookup
        return fn


_JNP = _JnpNS()
_LAZY = _LazyNS()


def ns_of(*xs):
    """The op namespace for the given element arrays (the array_router
    dispatch point): lazy if ANY element is a LazyArray."""
    for x in xs:
        if is_lazy(x):
            return _LAZY
    return _JNP


class _EagerMath:
    """Eager math with the ops.math impl selector (native | poly), plus
    the structural op surface generic (backend-agnostic) code needs.

    ``*_native`` / ``*_ref`` names always resolve to XLA's own lowering /
    the most accurate available implementation regardless of the impl
    selector -- generic code uses them where the reference's poly paths
    intentionally call a native op (e.g. the f64 kernels of
    ops/special.py use XLA exp/log)."""

    def __init__(self, impl: str):
        self._impl = impl

    def __getattr__(self, name):
        from . import math as M

        fn = getattr(M, name)
        impl = self._impl

        def wrapped(*args):
            return fn(*args, impl)

        return wrapped

    # functions without an impl selector
    @staticmethod
    def sqrt(x):
        return jnp.sqrt(x)

    @staticmethod
    def maximum(a, b):
        return jnp.maximum(a, b)

    @staticmethod
    def minimum(a, b):
        return jnp.minimum(a, b)

    @staticmethod
    def select(m, a, b):
        return jnp.where(m, a, b)

    @staticmethod
    def hypot(a, b):
        from . import math as M

        return M.hypot(a, b)

    @staticmethod
    def rsqrt(x):
        return jax.lax.rsqrt(x)

    abs = staticmethod(jnp.abs)
    round = staticmethod(jnp.round)
    floor = staticmethod(jnp.floor)
    copysign = staticmethod(jnp.copysign)
    isinf = staticmethod(jnp.isinf)
    isnan = staticmethod(jnp.isnan)
    exp_native = staticmethod(jnp.exp)
    log_native = staticmethod(jnp.log)
    sin_native = staticmethod(jnp.sin)
    cos_native = staticmethod(jnp.cos)

    @staticmethod
    def clamp(x, lo, hi):
        return jnp.clip(x, lo, hi)

    @staticmethod
    def mulsign(a, b):
        from .router import mulsign as _m

        return _m(a, b)

    @staticmethod
    def full_like(x, value, dtype=None):
        return jnp.full(jnp.shape(x), value, dtype or x.dtype)

    @staticmethod
    def broadcast(*xs):
        return jnp.broadcast_arrays(*xs)

    @staticmethod
    def erf_ref(x):
        from jax.scipy import special as jsp

        return jsp.erf(x)

    @staticmethod
    def erfc_ref(x):
        from jax.scipy import special as jsp

        return jsp.erfc(x)

    @staticmethod
    def lgamma_ref(x):
        from jax.scipy import special as jsp

        return jsp.gammaln(x)


class _TraceMath:
    """Lazy math: trace opcodes (impl selector does not apply -- the
    fused program uses XLA's lowerings, the trace analog of 'native',
    exactly as the reference's lazy GPU backend takes the HW-approx
    route for transcendentals, cuda.h:433-453)."""

    def __getattr__(self, name):
        import enoki_tpu.trace as tr

        fn = getattr(tr, name)
        setattr(self, name, fn)
        return fn

    @staticmethod
    def sincosh(x):
        import enoki_tpu.trace as tr

        return tr.sinh(x), tr.cosh(x)

    # *_native / *_ref aliases so generic code addressing "XLA's own
    # lowering" resolves on the lazy backend too (same opcodes)
    @staticmethod
    def exp_native(x):
        import enoki_tpu.trace as tr

        return tr.exp(x)

    @staticmethod
    def log_native(x):
        import enoki_tpu.trace as tr

        return tr.log(x)

    @staticmethod
    def sin_native(x):
        import enoki_tpu.trace as tr

        return tr.sin(x)

    @staticmethod
    def cos_native(x):
        import enoki_tpu.trace as tr

        return tr.cos(x)

    @staticmethod
    def erf_ref(x):
        import enoki_tpu.trace as tr

        return tr.erf(x)

    @staticmethod
    def erfc_ref(x):
        import enoki_tpu.trace as tr

        return tr.erfc(x)

    @staticmethod
    def lgamma_ref(x):
        import enoki_tpu.trace as tr

        return tr.lgamma(x)

    @staticmethod
    def mulsign(a, b):
        import enoki_tpu.trace as tr

        if not jnp.issubdtype(b.dtype, jnp.floating):
            # ints have no sign bit to respect: a * sign(b) with the
            # reference's sign(0)=1, int dtype preserved (matches the
            # eager router's int branch)
            return tr.select(b < 0, -a, a)
        # a * copysign(1, b): respects the sign BIT (mulsign(-0.0) flips)
        return a * tr.copysign(_TraceMath.full_like(b, 1.0), b)

    @staticmethod
    def full_like(x, value, dtype=None):
        from enoki_tpu.trace import LazyArray

        return LazyArray.literal(value, len(x), dtype or x.dtype)

    @staticmethod
    def broadcast(*xs):
        # the trace broadcasts size-1 operands implicitly (the 1-or-equal
        # rule, jit.cu:776-782); nothing to materialize
        return xs

    @staticmethod
    def hypot(a, b):
        import enoki_tpu.trace as tr

        # scaled form, exact zero guard (same structure as
        # ops.math.hypot -- a fixed 1e-38 clamp would be wrong for f64
        # subnormal-range inputs)
        aa, bb = abs(a), abs(b)
        mx = tr.maximum(aa, bb)
        mn = tr.minimum(aa, bb)
        zero = mx == 0.0
        t = mn / tr.select(zero, mx * 0.0 + 1.0, mx)
        r = tr.select(zero, mx * 0.0, mx * tr.sqrt(t * t + 1.0))
        # IEEE: +inf whenever either argument is infinite (inf/inf = NaN
        # in the scaled form) -- matches the eager twin
        return tr.select(tr.isinf(mx), mx, r)


_TRACE_MATH = _TraceMath()
_EAGER_NATIVE = _EagerMath("native")


def math_ns(x, impl: str = "native"):
    """Math-function namespace for element ``x``: trace ops for
    LazyArray, ops.math(impl=...) for eager arrays. The dispatch point
    that makes types/complex.py and types/quaternion.py backend-generic
    (Complex<FloatC> instantiates from the same source as
    Complex<FloatP> in the reference)."""
    if is_lazy(x):
        return _TRACE_MATH
    return _EAGER_NATIVE if impl == "native" else _EagerMath(impl)
