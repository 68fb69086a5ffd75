"""Half-precision storage helpers.

Parity with reference include/enoki/half.h: a storage-only 16-bit float with
conversion to/from f32 (:29,:112,:136). On TPU the natural 16-bit storage
type is bfloat16 (native compute), while IEEE float16 is supported as a
storage/conversion format by XLA -- both are exposed here. The bit-level
conversion helpers mirror the reference's software path and are used by
tests to validate XLA's conversions.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def float_to_half(x):
    """f32 -> f16 (round-to-nearest-even), XLA-native."""
    return jnp.asarray(x, jnp.float32).astype(jnp.float16)


def half_to_float(x):
    return jnp.asarray(x, jnp.float16).astype(jnp.float32)


def float_to_bf16(x):
    return jnp.asarray(x, jnp.float32).astype(jnp.bfloat16)


def bf16_to_float(x):
    return jnp.asarray(x, jnp.bfloat16).astype(jnp.float32)


def half_bits(x):
    """Raw uint16 bit pattern of an f16 array (half.h storage view)."""
    return lax.bitcast_convert_type(jnp.asarray(x, jnp.float16), jnp.uint16)


def half_from_bits(bits):
    return lax.bitcast_convert_type(jnp.asarray(bits, jnp.uint16), jnp.float16)
