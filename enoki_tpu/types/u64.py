"""Emulated 64-bit unsigned integers as (hi, lo) uint32 pairs.

TPUs have no native 64-bit integer lanes, and enabling jax_enable_x64
globally is invasive. The reference needs 64-bit arithmetic in exactly one
place users notice: the PCG32 RNG state (random.h:329-330). This module
provides the handful of u64 ops PCG32 needs -- add, mul (low 64 of 64x64),
xor, shifts -- built from 32-bit lanes so they run natively on the VPU.

All functions take/return ``U64 = (hi: uint32, lo: uint32)`` tuples of equal
shape. Ops are branch-free and jit/vmap/Pallas-safe.

Backend-generic: components may also be lazy ``trace.LazyArray``s (the
UInt64C analog -- the reference's PCG32 state rides CUDAArray<uint64_t>,
random.h:329); the arithmetic is operator-based and the few jnp helpers
dispatch through ops.backend.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..ops import backend as B


class U64(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray


def u64(hi, lo) -> U64:
    if B.is_lazy(hi):
        return U64(hi, lo)
    return U64(jnp.asarray(hi, jnp.uint32), jnp.asarray(lo, jnp.uint32))


def from_py(value: int, shape=(), like=None) -> U64:
    """64-bit constant; pass a lazy ``like`` component to build lazy
    literal halves instead of jnp arrays."""
    value &= (1 << 64) - 1
    if like is not None and B.is_lazy(like):
        from ..trace import LazyArray

        n = len(like)
        return U64(LazyArray.literal((value >> 32) & 0xFFFFFFFF, n,
                                     jnp.uint32),
                   LazyArray.literal(value & 0xFFFFFFFF, n, jnp.uint32))
    hi = jnp.full(shape, (value >> 32) & 0xFFFFFFFF, jnp.uint32)
    lo = jnp.full(shape, value & 0xFFFFFFFF, jnp.uint32)
    return U64(hi, lo)


def from_u32(x) -> U64:
    if B.is_lazy(x):
        return U64(x * 0, x)
    x = jnp.asarray(x, jnp.uint32)
    return U64(jnp.zeros_like(x), x)


def to_py(x: U64):
    """Host-side conversion to python ints (for tests)."""
    import numpy as np

    hi = np.asarray(x.hi, np.uint64)
    lo = np.asarray(x.lo, np.uint64)
    return (hi << np.uint64(32)) | lo


def add(a: U64, b: U64) -> U64:
    lo = a.lo + b.lo
    carry = (lo < a.lo).astype(jnp.uint32)
    return U64(a.hi + b.hi + carry, lo)


def add_u32(a: U64, b) -> U64:
    if not B.is_lazy(b) and not B.is_lazy(a.lo):
        b = jnp.asarray(b, jnp.uint32)
    lo = a.lo + b
    carry = (lo < a.lo).astype(jnp.uint32)
    return U64(a.hi + carry, lo)


def sub(a: U64, b: U64) -> U64:
    lo = a.lo - b.lo
    borrow = (a.lo < b.lo).astype(jnp.uint32)
    return U64(a.hi - b.hi - borrow, lo)


def _mul32_full(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full 32x32 -> 64 product as (hi, lo) via 16-bit partial products."""
    a_lo, a_hi = a & 0xFFFF, a >> 16
    b_lo, b_hi = b & 0xFFFF, b >> 16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    lo = (ll & 0xFFFF) | (mid << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def mul(a: U64, b: U64) -> U64:
    """Low 64 bits of the 64x64 product (what PCG32's LCG step needs)."""
    hi, lo = _mul32_full(a.lo, b.lo)
    hi = hi + a.lo * b.hi + a.hi * b.lo
    return U64(hi, lo)


def mul_u64_u32(a: U64, b) -> U64:
    if not B.is_lazy(b) and not B.is_lazy(a.lo):
        b = jnp.asarray(b, jnp.uint32)
    hi, lo = _mul32_full(a.lo, b)
    return U64(hi + a.hi * b, lo)


def xor(a: U64, b: U64) -> U64:
    return U64(a.hi ^ b.hi, a.lo ^ b.lo)


def or_(a: U64, b: U64) -> U64:
    return U64(a.hi | b.hi, a.lo | b.lo)


def and_(a: U64, b: U64) -> U64:
    return U64(a.hi & b.hi, a.lo & b.lo)


def shr(a: U64, k: int) -> U64:
    """Logical right shift by a static amount."""
    if k == 0:
        return a
    if k >= 64:
        z = a.lo * 0
        return U64(z, z)
    if k >= 32:
        return U64(a.hi * 0, a.hi >> (k - 32))
    return U64(a.hi >> k, (a.lo >> k) | (a.hi << (32 - k)))


def shl(a: U64, k: int) -> U64:
    if k == 0:
        return a
    if k >= 64:
        z = a.lo * 0
        return U64(z, z)
    if k >= 32:
        return U64(a.lo << (k - 32), a.lo * 0)
    return U64((a.hi << k) | (a.lo >> (32 - k)), a.lo << k)


def shr_dyn(a: U64, k) -> U64:
    """Right shift by a per-lane dynamic amount in [0, 63]."""
    sel = B.ns_of(a.lo, k).select
    if not B.is_lazy(k) and not B.is_lazy(a.lo):
        k = jnp.asarray(k, jnp.uint32)
    big = k >= 32
    ks = sel(big, k - 32, k)
    # shift within word; (32 - ks) can be 32 -> mask to avoid UB-ish shifts
    lo_small = (a.lo >> ks) | sel(ks == 0, ks * 0, a.hi << ((32 - ks) & 31))
    hi_small = a.hi >> ks
    lo_big = a.hi >> ks
    hi_big = a.hi * 0
    return U64(sel(big, hi_big, hi_small), sel(big, lo_big, lo_small))


def where(mask, a: U64, b: U64) -> U64:
    sel = B.ns_of(a.hi, b.hi).select
    return U64(sel(mask, a.hi, b.hi), sel(mask, a.lo, b.lo))


def eq(a: U64, b: U64):
    return (a.hi == b.hi) & (a.lo == b.lo)


def ne(a: U64, b: U64):
    return (a.hi != b.hi) | (a.lo != b.lo)


def is_zero(a: U64):
    return (a.hi == 0) & (a.lo == 0)


def zeros(shape=()) -> U64:
    z = jnp.zeros(shape, jnp.uint32)
    return U64(z, z)


def ones_bit(a: U64) -> jnp.ndarray:
    """Lowest bit as uint32 (delta & 1 in PCG32 advance)."""
    return a.lo & 1
