"""Estrin-scheme polynomial evaluators.

The reference evaluates all transcendental-function polynomials with the
Estrin scheme (array_math.h:26-105, ``poly2``..``poly10``) because it shortens
the dependency chain vs Horner -- the same argument holds on the TPU VPU,
and inside Pallas kernels these compile to exactly the fused multiply-add
trees we want.

``polyN(x, c0, .., cN)`` evaluates c0 + c1*x + ... + cN*x^N.
Coefficients are Python floats; they are materialized in ``x.dtype`` so the
same code serves f32/bf16/f64 paths.
"""

from __future__ import annotations

import jax.numpy as jnp


def _c(x, v):
    if type(x).__module__.startswith("enoki_tpu.trace"):
        return v  # LazyArray operators coerce python-float coefficients
    return jnp.asarray(v, dtype=jnp.result_type(x))


def poly2(x, c0, c1, c2):
    x2 = x * x
    return x2 * _c(x, c2) + (x * _c(x, c1) + _c(x, c0))


def poly3(x, c0, c1, c2, c3):
    x2 = x * x
    return (x * _c(x, c3) + _c(x, c2)) * x2 + (x * _c(x, c1) + _c(x, c0))


def poly4(x, c0, c1, c2, c3, c4):
    x2 = x * x
    x4 = x2 * x2
    return (x * _c(x, c3) + _c(x, c2)) * x2 + (x4 * _c(x, c4) + (x * _c(x, c1) + _c(x, c0)))


def poly5(x, c0, c1, c2, c3, c4, c5):
    x2 = x * x
    x4 = x2 * x2
    return (x * _c(x, c5) + _c(x, c4)) * x4 + ((x * _c(x, c3) + _c(x, c2)) * x2 + (x * _c(x, c1) + _c(x, c0)))


def poly6(x, c0, c1, c2, c3, c4, c5, c6):
    x2 = x * x
    x4 = x2 * x2
    return (x2 * _c(x, c6) + (x * _c(x, c5) + _c(x, c4))) * x4 + (
        (x * _c(x, c3) + _c(x, c2)) * x2 + (x * _c(x, c1) + _c(x, c0))
    )


def poly7(x, c0, c1, c2, c3, c4, c5, c6, c7):
    x2 = x * x
    x4 = x2 * x2
    return ((x * _c(x, c7) + _c(x, c6)) * x2 + (x * _c(x, c5) + _c(x, c4))) * x4 + (
        (x * _c(x, c3) + _c(x, c2)) * x2 + (x * _c(x, c1) + _c(x, c0))
    )


def poly8(x, c0, c1, c2, c3, c4, c5, c6, c7, c8):
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    return x8 * _c(x, c8) + (
        ((x * _c(x, c7) + _c(x, c6)) * x2 + (x * _c(x, c5) + _c(x, c4))) * x4
        + ((x * _c(x, c3) + _c(x, c2)) * x2 + (x * _c(x, c1) + _c(x, c0)))
    )


def poly9(x, c0, c1, c2, c3, c4, c5, c6, c7, c8, c9):
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    return (x * _c(x, c9) + _c(x, c8)) * x8 + (
        ((x * _c(x, c7) + _c(x, c6)) * x2 + (x * _c(x, c5) + _c(x, c4))) * x4
        + ((x * _c(x, c3) + _c(x, c2)) * x2 + (x * _c(x, c1) + _c(x, c0)))
    )


def poly10(x, c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10):
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    return (x2 * _c(x, c10) + (x * _c(x, c9) + _c(x, c8))) * x8 + (
        ((x * _c(x, c7) + _c(x, c6)) * x2 + (x * _c(x, c5) + _c(x, c4))) * x4
        + ((x * _c(x, c3) + _c(x, c2)) * x2 + (x * _c(x, c1) + _c(x, c0)))
    )


def horner(x, coeffs):
    """Horner fallback for arbitrary-degree polynomials (coeffs low->high)."""
    acc = _c(x, coeffs[-1])
    for c in reversed(coeffs[:-1]):
        acc = acc * x + _c(x, c)
    return acc
