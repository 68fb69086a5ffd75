"""Masked-value idioms.

The reference lets users write ``masked(x, m) += v`` / ``x[m] = v``
(array_masked.h) by returning a proxy that compiles to masked ops. JAX
arrays are immutable, so the proxy becomes a tiny builder object whose
methods *return* the updated array -- the mask discipline (inactive lanes
unchanged) is identical.

    x = masked(x, m).assign(v)      # x[m] = v
    x = masked(x, m).add(v)         # masked(x, m) += v
    x = masked(x, m).mul(v)
"""

from __future__ import annotations

import jax.numpy as jnp


class Masked:
    __slots__ = ("value", "mask")

    def __init__(self, value, mask):
        self.value = value
        self.mask = mask

    def assign(self, v):
        return jnp.where(self.mask, v, self.value)

    def add(self, v):
        return jnp.where(self.mask, self.value + v, self.value)

    def sub(self, v):
        return jnp.where(self.mask, self.value - v, self.value)

    def mul(self, v):
        return jnp.where(self.mask, self.value * v, self.value)

    def div(self, v):
        return jnp.where(self.mask, self.value / v, self.value)

    def min(self, v):
        return jnp.where(self.mask, jnp.minimum(self.value, v), self.value)

    def max(self, v):
        return jnp.where(self.mask, jnp.maximum(self.value, v), self.value)


def masked(value, mask) -> Masked:
    return Masked(value, mask)
