"""Rounding utilities.

The reference provides arrays with non-default FP rounding modes
(array_round.h) -- an x86 MXCSR feature with no TPU equivalent (TPU
compute is round-to-nearest-even). What production TPU code actually
needs instead is *stochastic rounding* for low-precision training and
explicit directed-rounding helpers, provided here:

  round/floor/ceil/trunc      lanewise (round = banker's, matching RN-even)
  round_half_away             C-style round()
  stochastic_round(x, key, dtype)   unbiased rounding to bf16/f16 using
                                    jax PRNG bits (the Pallas-kernel analog
                                    is pltpu.stochastic_round)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def round_(x):
    """Round half to even (the TPU hardware mode)."""
    return jnp.round(x)


def round_half_away(x):
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


floor = jnp.floor
ceil = jnp.ceil
trunc = jnp.trunc


def stochastic_round(x, key, dtype=jnp.bfloat16):
    """Unbiased stochastic rounding f32 -> 16-bit float.

    Adds uniform dither below the target mantissa and truncates: the
    expected value of the result equals x.
    """
    x = jnp.asarray(x, jnp.float32)
    bits = lax.bitcast_convert_type(x, jnp.uint32)
    if dtype == jnp.bfloat16:
        drop = 16
    elif dtype == jnp.float16:
        # f16 has 10 mantissa bits vs f32's 23 -> 13 dropped, but exponent
        # ranges differ; go through the dither-truncate only for bf16 and
        # use round-twice-avoidance for f16:
        drop = None
    else:
        raise ValueError("stochastic_round targets bfloat16 or float16")
    if drop is not None:
        dither = jax.random.bits(key, bits.shape, jnp.uint32) & ((1 << drop) - 1)
        out = (bits + dither) & ~jnp.uint32((1 << drop) - 1)
        return lax.bitcast_convert_type(out, jnp.float32).astype(dtype)
    # f16 path: probabilistic pick between the two neighbours
    lo = x.astype(jnp.float16).astype(jnp.float32)
    hi = jnp.where(x >= lo, jnp.nextafter(lo.astype(jnp.float16),
                                          jnp.float16(jnp.inf)).astype(jnp.float32),
                   jnp.nextafter(lo.astype(jnp.float16),
                                 jnp.float16(-jnp.inf)).astype(jnp.float32))
    span = hi - lo
    p = jnp.where(span != 0, (x - lo) / jnp.where(span == 0, 1.0, span), 0.0)
    u = jax.random.uniform(key, x.shape)
    return jnp.where(u < p, hi, lo).astype(jnp.float16)
