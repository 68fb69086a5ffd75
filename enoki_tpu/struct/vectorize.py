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

from .pytree import width


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


def vectorize(f: Callable, *args, jit: bool = True):
    """Run ``f`` over wide inputs as one fused kernel.

    Matches the reference's contract: sizes must be equal or 1
    (broadcast); returns f's outputs. With jit=True (default) the call is
    compiled+cached -- the analog of enoki's packet loop being compiled
    once per type.
    """
    _check_sizes(args)
    fn = jax.jit(f) if jit else f
    return fn(*args)


def vectorize_safe(f: Callable, *args, jit: bool = True):
    """Name-parity alias of ``vectorize`` (dynamic.h:1077): the
    reference's _safe variant keeps the size checks in release builds;
    here the checks always run, so the two entry points coincide."""
    return vectorize(f, *args, jit=jit)


def vectorize_wrapper(f: Callable) -> Callable:
    """Adapt a per-lane (packet) function to wide arrays: jax.vmap."""
    return jax.vmap(f)
