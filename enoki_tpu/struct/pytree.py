"""Structured-vectorization support: custom SoA struct registration.

Parity with the reference's ENOKI_STRUCT machinery (array_macro.h:216,272):
a user type declared once works as a scalar struct, a wide struct, a
gathered/scattered struct, a masked struct, and a differentiable struct.

In JAX all of that is the pytree protocol. ``@enoki_struct`` is
``jax.tree_util.register_dataclass`` plus the struct_support surface the
reference generates (array_struct.h: slices/packets/gather/scatter/
masked/zero/detach):

    @enoki_struct
    class Ray:
        o: Vec3
        d: Vec3

    r = Ray(o, d)              # wide struct of arrays
    width(r)                   # slices() (dynamic.h slices)
    zeros_like(r)              # zero<Ray>()
    gather_struct(r, idx)      # gather<Ray>(r, idx)   (array_struct.h:9)
    scatter_struct(dst, r, i)  # scatter(dst, r, idx)  (array_struct.h:35)
    select_struct(m, a, b)     # select(mask, a, b) memberwise
    slice_struct(r, i)         # r[i] -- one lane as a struct of scalars
    detach(r)                  # stop_gradient leafwise (array_router.h:689)
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax
import jax.numpy as jnp

T = TypeVar("T")


def enoki_struct(cls: type) -> type:
    """Class decorator: frozen dataclass registered as a JAX pytree."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    return jax.tree_util.register_dataclass(cls)


def width(x) -> int:
    """Number of lanes = leading-axis size of the first leaf
    (``slices()``, dynamic.h)."""
    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        return 0
    shape = jnp.shape(leaves[0])
    return shape[0] if shape else 1


def zeros_like(x: T) -> T:
    return jax.tree_util.tree_map(jnp.zeros_like, x)


def full_like(x: T, value) -> T:
    return jax.tree_util.tree_map(lambda l: jnp.full_like(l, value), x)


def select_struct(mask, a: T, b: T) -> T:
    """Memberwise select (the masked-assignment idiom for structs)."""
    return jax.tree_util.tree_map(lambda u, v: jnp.where(mask, u, v), a, b)


def gather_struct(src: T, index, mask=None) -> T:
    """Memberwise gather along the lane axis (array_struct.h:9-32)."""
    from ..ops.router import gather

    return jax.tree_util.tree_map(lambda l: gather(l, index, mask=mask), src)


def scatter_struct(dst: T, value: T, index, mask=None) -> T:
    """Memberwise scatter along the lane axis (array_struct.h:35-60)."""
    from ..ops.router import scatter

    return jax.tree_util.tree_map(
        lambda d, v: scatter(d, v, index, mask=mask), dst, value)


def slice_struct(x: T, i) -> T:
    """Extract lane i as a struct of scalars (``slice()``, dynamic.h)."""
    return jax.tree_util.tree_map(lambda l: l[i], x)


def set_slice_struct(x: T, i, value: T) -> T:
    return jax.tree_util.tree_map(lambda l, v: l.at[i].set(v), x, value)


def concat_structs(*xs: T) -> T:
    return jax.tree_util.tree_map(
        lambda *ls: jnp.concatenate(ls, axis=0), *xs)


def detach(x: T) -> T:
    """stop_gradient leafwise (array_router.h:689 detach)."""
    return jax.lax.stop_gradient(x)
