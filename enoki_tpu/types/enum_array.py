"""Arrays of enum values.

Parity with reference include/enoki/array_enum.h:16-82: enums are stored
as their underlying integer type; comparisons/selects work lanewise and
values convert losslessly back to the Python enum.
"""

from __future__ import annotations

import enum
from typing import Type

import jax.numpy as jnp


def _storage_dtype(vals):
    """Smallest lane dtype that holds every value losslessly (the
    array_enum.h 'underlying integer type' contract; int32 alone would
    overflow e.g. a 1 << 31 flag)."""
    lo = min(vals, default=0)
    hi = max(vals, default=0)
    if -(1 << 31) <= lo and hi < (1 << 31):
        return jnp.int32
    if 0 <= lo and hi < (1 << 32):
        return jnp.uint32
    import jax

    if not jax.config.jax_enable_x64:
        raise OverflowError(
            f"enum values span [{lo}, {hi}], which needs a 64-bit lane "
            "dtype -- enable jax_enable_x64")
    return jnp.int64 if lo < 0 else jnp.uint64


def enum_array(values, enum_cls: Type[enum.IntEnum]) -> jnp.ndarray:
    """Build a lane array from enum members / ints (lossless storage)."""
    vals = [int(v) for v in values]
    return jnp.asarray(vals, _storage_dtype(vals))


def enum_full(value: enum.IntEnum, shape) -> jnp.ndarray:
    v = int(value)
    return jnp.full(shape, v, _storage_dtype([v]))


def enum_eq(arr, value: enum.IntEnum):
    return arr == int(value)


def to_enum_list(arr, enum_cls: Type[enum.IntEnum]):
    """Host-side conversion back to enum members."""
    import numpy as np

    return [enum_cls(int(v)) for v in np.asarray(arr)]
