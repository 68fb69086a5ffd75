"""Integer division by runtime-constant divisors via magic multipliers.

Parity with reference include/enoki/array_idiv.h: precomputed
magic-multiplier division, unsigned (:152) and signed (:191). The divisor
is known on the host (a python int) -- exactly the reference's model, where
``divisor<T>(x)`` precomputes on the CPU and the vector lanes only do
mulhi/shift/add. Magic constants follow Granlund & Montgomery, "Division by
Invariant Integers using Multiplication" (PLDI '94) as popularized by
Hacker's Delight ch. 10.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.router import mulhi


class DivisorU32:
    """Unsigned 32-bit division by a fixed divisor."""

    def __init__(self, d: int):
        if not 0 < d < 2 ** 32:
            raise ValueError("divisor out of range")
        self.d = d
        if d == 1:
            self.magic, self.shift, self.add = 1, 0, False
            return
        # find smallest p >= 32 with 2^p > nc * (d - 1 - (2^p - 1) % d)
        nc = (2 ** 32 // d) * d - 1
        for p in range(32, 65):
            if 2 ** p > nc * (d - 1 - (2 ** p - 1) % d):
                break
        m = (2 ** p + d - 1 - (2 ** p - 1) % d) // d
        if m < 2 ** 32:
            self.magic, self.shift, self.add = m, p - 32, False
        else:
            self.magic, self.shift, self.add = m - 2 ** 32, p - 32, True

    def div(self, n):
        n = jnp.asarray(n, jnp.uint32)
        if self.d == 1:
            return n
        t = mulhi(n, jnp.uint32(self.magic))
        if self.add:
            # q = (((n - t) >> 1) + t) >> (shift - 1)
            return (((n - t) >> 1) + t) >> (self.shift - 1)
        return t >> self.shift

    def mod(self, n):
        n = jnp.asarray(n, jnp.uint32)
        return n - self.div(n) * jnp.uint32(self.d)

    __call__ = div


class DivisorI32:
    """Signed 32-bit division by a fixed nonzero divisor (C truncation)."""

    def __init__(self, d: int):
        if d == 0 or not -(2 ** 31) <= d < 2 ** 31:
            raise ValueError("divisor out of range")
        self.d = d
        ad = abs(d)
        if ad == 1:
            self.magic, self.shift = 0, 0
            return
        two31 = 2 ** 31
        t = two31 + (1 if d < 0 else 0)
        anc = t - 1 - t % ad
        p = 31
        q1, r1 = two31 // anc, two31 % anc
        q2, r2 = two31 // ad, two31 % ad
        while True:
            p += 1
            q1, r1 = q1 * 2, r1 * 2
            if r1 >= anc:
                q1 += 1
                r1 -= anc
            q2, r2 = q2 * 2, r2 * 2
            if r2 >= ad:
                q2 += 1
                r2 -= ad
            delta = ad - r2
            if not (q1 < delta or (q1 == delta and r1 == 0)):
                break
        m = q2 + 1
        if d < 0:
            m = -m
        # store as signed 32-bit value
        if m >= 2 ** 31:
            m -= 2 ** 32
        if m < -(2 ** 31):
            m += 2 ** 32
        self.magic, self.shift = m, p - 32

    def div(self, n):
        n = jnp.asarray(n, jnp.int32)
        d = self.d
        if abs(d) == 1:
            return n if d == 1 else -n
        q = mulhi(n, jnp.int32(self.magic))
        if d > 0 and self.magic < 0:
            q = q + n
        elif d < 0 and self.magic > 0:
            q = q - n
        q = q >> self.shift  # arithmetic shift
        # add 1 if q negative (round toward zero)
        q = q + (q < 0).astype(jnp.int32)
        return q

    def mod(self, n):
        n = jnp.asarray(n, jnp.int32)
        return n - self.div(n) * jnp.int32(self.d)

    __call__ = div


def divisor(d: int, signed: bool = False):
    """array_idiv.h entry point."""
    return DivisorI32(d) if signed else DivisorU32(d)
