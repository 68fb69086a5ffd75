"""SDF primitive and combinator library.

The reference ships one hard-coded sphere (tests/sphere.cpp); a complete
differentiable-rendering toolkit needs the standard signed-distance
vocabulary. All functions are pure jnp on Vec3 -- they trace into the
Pallas megakernel (render/generic.py), the lax.scan marcher, and
jax.grad alike. Formulas are the classic Hart/Quilez distance functions.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3, dot3

_EPS = 1e-12


def sd_sphere(p: Vec3, center: Vec3, radius):
    d = p - center
    return jnp.sqrt(dot3(d, d) + _EPS) - radius


def sd_plane(p: Vec3, normal: Vec3, offset):
    """Half-space below the (unit) normal at signed offset."""
    return dot3(p, normal) + offset


def sd_box(p: Vec3, center: Vec3, half_extent: Vec3):
    q = Vec3(jnp.abs(p.x - center.x) - half_extent.x,
             jnp.abs(p.y - center.y) - half_extent.y,
             jnp.abs(p.z - center.z) - half_extent.z)
    outside = Vec3(jnp.maximum(q.x, 0.0), jnp.maximum(q.y, 0.0),
                   jnp.maximum(q.z, 0.0))
    inside = jnp.minimum(jnp.maximum(q.x, jnp.maximum(q.y, q.z)), 0.0)
    return jnp.sqrt(dot3(outside, outside) + _EPS) + inside


def sd_torus(p: Vec3, center: Vec3, major, minor):
    """Torus in the xy-plane around ``center``."""
    dx, dy, dz = p.x - center.x, p.y - center.y, p.z - center.z
    ring = jnp.sqrt(dx * dx + dy * dy + _EPS) - major
    return jnp.sqrt(ring * ring + dz * dz + _EPS) - minor


def sd_capsule(p: Vec3, a: Vec3, b: Vec3, radius):
    pa = p - a
    ba = b - a
    h = jnp.clip(dot3(pa, ba) / (dot3(ba, ba) + _EPS), 0.0, 1.0)
    d = pa - ba * h
    return jnp.sqrt(dot3(d, d) + _EPS) - radius


# -- combinators -------------------------------------------------------------


def op_union(*ds):
    out = ds[0]
    for d in ds[1:]:
        out = jnp.minimum(out, d)
    return out


def op_intersect(*ds):
    out = ds[0]
    for d in ds[1:]:
        out = jnp.maximum(out, d)
    return out


def op_subtract(d_base, d_cut):
    return jnp.maximum(d_base, -d_cut)


def op_smooth_union(d1, d2, k):
    """Polynomial smooth-min blend (differentiable union -- the staple of
    SDF morphing; gradients flow into both operands AND the blend k)."""
    h = jnp.clip(0.5 + 0.5 * (d2 - d1) / (k + _EPS), 0.0, 1.0)
    return d2 + (d1 - d2) * h - k * h * (1.0 - h)


def op_round(d, r):
    return d - r


def op_shell(d, thickness):
    return jnp.abs(d) - thickness
