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
    """Backend-generic: routes through ops.select/minimum/maximum, so a
    LazyArray value records masked trace ops (the reference's masked
    proxy instantiates for CUDAArray too, array_masked.h)."""

    __slots__ = ("value", "mask")

    def __init__(self, value, mask):
        self.value = value
        self.mask = mask

    def _sel(self, taken):
        from ..ops.router import select

        return select(self.mask, taken, self.value)

    def assign(self, v):
        return self._sel(v)

    def add(self, v):
        return self._sel(self.value + v)

    def sub(self, v):
        return self._sel(self.value - v)

    def mul(self, v):
        return self._sel(self.value * v)

    def div(self, v):
        return self._sel(self.value / v)

    def min(self, v):
        from ..ops.backend import is_lazy

        if is_lazy(self.value) or is_lazy(v):
            import enoki_tpu.trace as t

            # the lazy operand leads (trace binaries coerce the OTHER
            # side, which may be an eager array or scalar)
            a, b = ((self.value, v) if is_lazy(self.value)
                    else (v, self.value))
            return self._sel(t.minimum(a, b))
        return self._sel(jnp.minimum(self.value, v))

    def max(self, v):
        from ..ops.backend import is_lazy

        if is_lazy(self.value) or is_lazy(v):
            import enoki_tpu.trace as t

            a, b = ((self.value, v) if is_lazy(self.value)
                    else (v, self.value))
            return self._sel(t.maximum(a, b))
        return self._sel(jnp.maximum(self.value, v))


def masked(value, mask) -> Masked:
    return Masked(value, mask)
