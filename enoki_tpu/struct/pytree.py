"""Structured-vectorization support: custom SoA struct registration.

Parity with the reference's ENOKI_STRUCT machinery (array_macro.h:216,272):
a user type declared once works as a scalar struct, a wide struct, a
gathered/scattered struct, a masked struct, and a differentiable struct --
on EVERY backend. ENOKI_STRUCT instantiates across all template variants
(array_macro.h:216-359), so ``Ray3fC`` (a struct of lazy GPU arrays) is as
valid as ``Ray3fX``; array_struct.h:9-60 routes struct gather/scatter
through the lazy backend. Here the helpers dispatch PER LEAF through the
routed ops surface, so a struct of LazyArrays works identically to a
struct of jnp arrays.

In JAX all of that is the pytree protocol. ``@enoki_struct`` is
``jax.tree_util.register_dataclass`` plus the struct_support surface the
reference generates (array_struct.h: slices/packets/gather/scatter/
masked/zero/detach):

    @enoki_struct
    class Ray:
        o: Vec3
        d: Vec3

    r = Ray(o, d)              # wide struct of arrays (eager OR lazy)
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


def _is_lazy(leaf) -> bool:
    from ..ops.backend import is_lazy

    return is_lazy(leaf)


def width(x) -> int:
    """Number of lanes = leading-axis size of the first leaf
    (``slices()``, dynamic.h). Works for lazy leaves (LazyArray carries
    its size on the handle)."""
    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        return 0
    leaf = leaves[0]
    shape = leaf.shape if _is_lazy(leaf) else jnp.shape(leaf)
    return shape[0] if shape else 1


def zeros_like(x: T) -> T:
    def z(leaf):
        if _is_lazy(leaf):
            from ..trace import LazyArray

            return LazyArray.literal(0, len(leaf), leaf.dtype)
        return jnp.zeros_like(leaf)

    return jax.tree_util.tree_map(z, x)


def full_like(x: T, value) -> T:
    def f(leaf):
        if _is_lazy(leaf):
            from ..trace import LazyArray

            return LazyArray.literal(value, len(leaf), leaf.dtype)
        return jnp.full_like(leaf, value)

    return jax.tree_util.tree_map(f, x)


def select_struct(mask, a: T, b: T) -> T:
    """Memberwise select (the masked-assignment idiom for structs).
    Dispatches per leaf: lazy leaves record Op.SELECT."""
    from ..ops.router import select

    return jax.tree_util.tree_map(lambda u, v: select(mask, u, v), a, b)


def gather_struct(src: T, index, mask=None) -> T:
    """Memberwise gather along the lane axis (array_struct.h:9-32).
    A struct of LazyArrays records lazy gathers (the reference routes
    struct gather through the CUDA type the same way)."""
    from ..ops.router import gather

    return jax.tree_util.tree_map(lambda l: gather(l, index, mask=mask), src)


def scatter_struct(dst: T, value: T, index, mask=None) -> T:
    """Memberwise scatter along the lane axis (array_struct.h:35-60)."""
    from ..ops.router import scatter

    return jax.tree_util.tree_map(
        lambda d, v: scatter(d, v, index, mask=mask), dst, value)


def slice_struct(x: T, i) -> T:
    """Extract lane i as a struct of scalars (``slice()``, dynamic.h).
    Lazy leaves force evaluation (cuda_fetch_element semantics)."""
    return jax.tree_util.tree_map(lambda l: l[i], x)


def set_slice_struct(x: T, i, value: T) -> T:
    def s(l, v):
        if _is_lazy(l):
            from ..trace import LazyArray

            idx = LazyArray.literal(int(i), 1, jnp.int32)
            if not _is_lazy(v):
                # pass the scalar through UNcoerced: literal() carries
                # ints bit-exactly; a float(v) detour would round
                # int64/uint64 values past 2^53 (the double-carrier
                # truncation trace._literal_bits exists to avoid)
                v = LazyArray.literal(
                    v if isinstance(v, (int, bool)) else float(v),
                    1, l.dtype)
            return l.scatter(idx, v)
        return l.at[i].set(v)

    return jax.tree_util.tree_map(s, x, value)


def concat_structs(*xs: T) -> T:
    def c(*ls):
        if any(_is_lazy(l) for l in ls):
            # lazy concat: scatter each piece into a fresh output at its
            # offset (stays on the trace; no CONCAT opcode needed). The
            # output dtype PROMOTES across the pieces exactly like the
            # eager jnp.concatenate -- taking the first piece's dtype
            # would silently truncate later float pieces into an int
            # output.
            from ..trace import LazyArray

            n = sum(len(l) for l in ls)
            dt = jnp.result_type(*(l.dtype for l in ls))
            out = LazyArray.zeros(n, dt)
            off = 0
            for l in ls:
                l = l if _is_lazy(l) else LazyArray(jnp.asarray(l))
                if l.dtype != dt:
                    l = l.cast(dt)
                out.scatter(LazyArray.arange(len(l)) + off, l)
                off += len(l)
            return out
        return jnp.concatenate(ls, axis=0)

    return jax.tree_util.tree_map(c, *xs)


def detach(x: T) -> T:
    """stop_gradient leafwise (array_router.h:689 detach). A lazy leaf
    becomes a fresh data leaf holding the same values -- it forces
    evaluation and is no longer connected to the AD tape (the reference's
    detach reads .value off the DiffArray the same way)."""
    def d(leaf):
        if _is_lazy(leaf):
            from ..trace import LazyArray

            return LazyArray(leaf.jax())
        return jax.lax.stop_gradient(leaf)

    return jax.tree_util.tree_map(d, x)
