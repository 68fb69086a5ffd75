"""vectorize / vectorize_wrapper -- the dynamic-array packet-loop drivers.

The reference's ``vectorize(f, args...)`` (dynamic.h:1026) slices dynamic
arrays into SIMD packets and runs ``f`` over each packet; under XLA the
same program is a single fused kernel over the whole array, so
``vectorize`` here is simply jit (+ broadcast-size validation matching
dynamic.h:1036-1059: sizes must be equal or 1).

``vectorize_wrapper`` (dynamic.h:1105) -- which adapts a function written
against *packets* to dynamic arrays -- maps to ``jax.vmap``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp



def _check_sizes(args):
    sizes = set()
    for a in jax.tree_util.tree_leaves(args):
        shape = jnp.shape(a)
        if shape:
            sizes.add(shape[0])
    big = {s for s in sizes if s != 1}
    if len(big) > 1:
        # mirror of the reference's incompatible-size error (dynamic.h:1042)
        raise ValueError(f"vectorize(): incompatible input sizes {sorted(big)}")


# per-function jit wrappers, LRU-bounded. NOT a WeakKeyDictionary: the
# stored jax.jit wrapper strongly references its function, so weak keys
# would never die and every per-loop lambda (plus its closure and trace
# cache) would be pinned forever. A small LRU keeps hot functions
# compiled-once while letting churned lambdas age out and be collected.
_JIT_CACHE: dict = {}
_JIT_CACHE_MAX = 128


def vectorize(f: Callable, *args, jit: bool = True):
    """Run ``f`` over wide inputs as one fused kernel.

    Matches the reference's contract: sizes must be equal or 1
    (broadcast); returns f's outputs. With jit=True (default) the call
    is compiled+cached -- the jit wrapper is cached PER FUNCTION OBJECT
    (a lambda recreated inside a loop is a new function object each
    iteration and re-traces -- hoist it)."""
    _check_sizes(args)
    if not jit:
        return f(*args)
    try:
        fn = _JIT_CACHE.pop(f, None)  # re-insert on hit = LRU recency
        if fn is None:
            fn = jax.jit(f)
        _JIT_CACHE[f] = fn
        while len(_JIT_CACHE) > _JIT_CACHE_MAX:
            _JIT_CACHE.pop(next(iter(_JIT_CACHE)))
    except TypeError:  # unhashable callable
        fn = jax.jit(f)
    return fn(*args)


def vectorize_safe(f: Callable, *args, jit: bool = True):
    """Name-parity alias of ``vectorize`` (dynamic.h:1077): the
    reference's _safe variant keeps the size checks in release builds;
    here the checks always run, so the two entry points coincide."""
    return vectorize(f, *args, jit=jit)


def vectorize_wrapper(f: Callable) -> Callable:
    """Adapt a per-lane (packet) function to wide arrays: jax.vmap,
    with the reference wrapper's mixed wide/scalar contract
    (dynamic.h:1105): scalar and size-1 arguments broadcast instead of
    being mapped (bare vmap would reject them with an axis error)."""

    def _axis(a):
        sizes = [jnp.shape(l)[0]
                 for l in jax.tree_util.tree_leaves(a) if jnp.shape(l)]
        return 0 if any(s != 1 for s in sizes) else None

    def _squeeze1(a):  # drop a broadcast arg's leading size-1 axis
        return jax.tree_util.tree_map(
            lambda l: jnp.reshape(l, jnp.shape(l)[1:])
            if jnp.shape(l) else l, a)

    def wide(*args):
        _check_sizes(args)
        axes = tuple(_axis(a) for a in args)
        if not any(ax == 0 for ax in axes):
            return f(*args)  # all scalars: nothing to map
        squeezed = tuple(a if ax == 0 else _squeeze1(a)
                         for a, ax in zip(args, axes))
        return jax.vmap(f, in_axes=axes)(*squeezed)

    return wide
