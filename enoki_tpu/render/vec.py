"""SoA 2/3-vectors for the render pipeline.

The reference's ``Vector3fX = Array<FloatX, 3>`` is a nested SoA vector:
three wide arrays (tests/sphere.cpp:36-39). The TPU-native equivalent is a
pytree struct of per-component arrays -- each component is a full VPU-wide
array, every vector op is straight-line elementwise code, and nothing
fights the (8,128) tile layout the way a trailing axis of 3 would.

Backend-generic: components may be eager jnp arrays or lazy
``trace.LazyArray``s (the ``Vector3fC = Array<FloatC, 3>`` analog,
docs/gpu.rst:74) -- arithmetic is operator-based and norm/normalize
dispatch through ops.backend.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import backend as B


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Vec2:
    x: jnp.ndarray
    y: jnp.ndarray

    def __add__(self, o):
        return Vec2(self.x + o.x, self.y + o.y)

    def __sub__(self, o):
        return Vec2(self.x - o.x, self.y - o.y)

    def __mul__(self, s):
        return Vec2(self.x * s, self.y * s)

    __rmul__ = __mul__


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Vec3:
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @staticmethod
    def of(x, y, z) -> "Vec3":
        if B.is_lazy(x) or B.is_lazy(y) or B.is_lazy(z):
            ref = x if B.is_lazy(x) else y if B.is_lazy(y) else z
            lift = lambda v: v if B.is_lazy(v) else ref * 0.0 + v
            return Vec3(lift(x), lift(y), lift(z))
        x = jnp.asarray(x, jnp.result_type(x, 1.0))
        return Vec3(x, jnp.asarray(y, x.dtype), jnp.asarray(z, x.dtype))

    @staticmethod
    def splat(x, y, z, like=None) -> "Vec3":
        """Constant vector broadcast against ``like``'s lanes."""
        dt = like.x.dtype if like is not None else jnp.float32
        return Vec3(jnp.asarray(x, dt), jnp.asarray(y, dt), jnp.asarray(z, dt))

    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, s):
        if isinstance(s, Vec3):
            return Vec3(self.x * s.x, self.y * s.y, self.z * s.z)
        return Vec3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)


def dot3(a: Vec3, b: Vec3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross3(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(a.y * b.z - a.z * b.y,
                a.z * b.x - a.x * b.z,
                a.x * b.y - a.y * b.x)


def norm3(a: Vec3):
    return B.math_ns(a.x).sqrt(dot3(a, a))


def normalize3(a: Vec3) -> Vec3:
    return a * B.math_ns(a.x).rsqrt(dot3(a, a))


def unit_angle(a: Vec3, b: Vec3):
    """Numerically well-behaved angle between two UNIT vectors
    (array_math.h:1415, Don Hatch's formulation): accurate for nearly
    parallel and nearly antiparallel inputs where acos(dot) loses all
    precision. Backend-generic (ns dispatch)."""
    ns = B.math_ns(a.x)
    d = dot3(a, b)
    s = ns.mulsign(a.x, d), ns.mulsign(a.y, d), ns.mulsign(a.z, d)
    diff = Vec3(b.x - s[0], b.y - s[1], b.z - s[2])
    temp = 2.0 * ns.asin(0.5 * norm3(diff))
    pi = 3.14159265358979323846
    return ns.select(d >= 0.0, temp, pi - temp)


def unit_angle_z(v: Vec3):
    """Angle between a unit vector and the z-axis (array_math.h:1431) --
    use wherever acos(v.z) is tempting."""
    ns = B.math_ns(v.x)
    zc = v.z - ns.copysign(v.z * 0.0 + 1.0, v.z)
    temp = 2.0 * ns.asin(0.5 * ns.sqrt(v.x * v.x + v.y * v.y + zc * zc))
    pi = 3.14159265358979323846
    return ns.select(v.z >= 0.0, temp, pi - temp)
