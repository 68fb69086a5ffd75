"""Arrays of enum values.

Parity with reference include/enoki/array_enum.h:16-82: enums are stored
as their underlying integer type; comparisons/selects work lanewise and
values convert losslessly back to the Python enum.
"""

from __future__ import annotations

import enum
from typing import Type

import jax.numpy as jnp


def enum_array(values, enum_cls: Type[enum.IntEnum]) -> jnp.ndarray:
    """Build an int32 lane array from enum members / ints."""
    return jnp.asarray([int(v) for v in values], jnp.int32)


def enum_full(value: enum.IntEnum, shape) -> jnp.ndarray:
    return jnp.full(shape, int(value), jnp.int32)


def enum_eq(arr, value: enum.IntEnum):
    return arr == int(value)


def to_enum_list(arr, enum_cls: Type[enum.IntEnum]):
    """Host-side conversion back to enum members."""
    import numpy as np

    return [enum_cls(int(v)) for v in np.asarray(arr)]
