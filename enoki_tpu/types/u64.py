"""Emulated 64-bit unsigned integers as (hi, lo) uint32 pairs.

TPUs have no native 64-bit integer lanes, and enabling jax_enable_x64
globally is invasive. The reference needs 64-bit arithmetic in exactly one
place users notice: the PCG32 RNG state (random.h:329-330). This module
provides the handful of u64 ops PCG32 needs -- add, mul (low 64 of 64x64),
xor, shifts -- built from 32-bit lanes so they run natively on the VPU.

All functions take/return ``U64 = (hi: uint32, lo: uint32)`` tuples of equal
shape. Ops are branch-free and jit/vmap/Pallas-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class U64(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray


def u64(hi, lo) -> U64:
    return U64(jnp.asarray(hi, jnp.uint32), jnp.asarray(lo, jnp.uint32))


def from_py(value: int, shape=()) -> U64:
    value &= (1 << 64) - 1
    hi = jnp.full(shape, (value >> 32) & 0xFFFFFFFF, jnp.uint32)
    lo = jnp.full(shape, value & 0xFFFFFFFF, jnp.uint32)
    return U64(hi, lo)


def from_u32(x) -> U64:
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
        z = jnp.zeros_like(a.lo)
        return U64(z, z)
    if k >= 32:
        return U64(jnp.zeros_like(a.hi), a.hi >> (k - 32))
    return U64(a.hi >> k, (a.lo >> k) | (a.hi << (32 - k)))


def shl(a: U64, k: int) -> U64:
    if k == 0:
        return a
    if k >= 64:
        z = jnp.zeros_like(a.lo)
        return U64(z, z)
    if k >= 32:
        return U64(a.lo << (k - 32), jnp.zeros_like(a.lo))
    return U64((a.hi << k) | (a.lo >> (32 - k)), a.lo << k)


def shr_dyn(a: U64, k) -> U64:
    """Right shift by a per-lane dynamic amount in [0, 63]."""
    k = jnp.asarray(k, jnp.uint32)
    big = k >= 32
    ks = jnp.where(big, k - 32, k)
    # shift within word; (32 - ks) can be 32 -> mask to avoid UB-ish shifts
    lo_small = (a.lo >> ks) | jnp.where(ks == 0, 0, a.hi << ((32 - ks) & 31))
    hi_small = a.hi >> ks
    lo_big = a.hi >> ks
    hi_big = jnp.zeros_like(a.hi)
    return U64(jnp.where(big, hi_big, hi_small), jnp.where(big, lo_big, lo_small))


def where(mask, a: U64, b: U64) -> U64:
    return U64(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


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
