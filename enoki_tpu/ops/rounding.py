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


def _is_lazy(x):
    from .backend import is_lazy

    return is_lazy(x)


def round_(x):
    """Round half to even (the TPU hardware mode). LazyArray operands
    record the ROUND opcode (one source, every backend)."""
    if _is_lazy(x):
        import enoki_tpu.trace as t

        return t.round(x)
    return jnp.round(x)


def round_half_away(x):
    # NOT trunc(x + 0.5): adding 0.5 first double-rounds (e.g. the largest
    # f32 below 0.5 would round to 1). Compare the exact fractional part.
    if _is_lazy(x):
        import enoki_tpu.trace as t

        tt = t.trunc(x)
        frac = x - tt
        bump = t.select(abs(frac) >= 0.5, x * 0.0 + 1.0, x * 0.0)
        return tt + t.select(x >= 0.0, bump, -bump)
    t = jnp.trunc(x)
    frac = x - t  # exact: x and t share the exponent range
    bump = (jnp.abs(frac) >= 0.5).astype(x.dtype)
    return t + jnp.where(x >= 0, bump, -bump)


def floor(x):
    if _is_lazy(x):
        import enoki_tpu.trace as t

        return t.floor(x)
    return jnp.floor(x)


def ceil(x):
    if _is_lazy(x):
        import enoki_tpu.trace as t

        return t.ceil(x)
    return jnp.ceil(x)


def trunc(x):
    if _is_lazy(x):
        import enoki_tpu.trace as t

        return t.trunc(x)
    return jnp.trunc(x)


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
        r = lax.bitcast_convert_type(out, jnp.float32).astype(dtype)
        # dither on a payload NaN can carry into the exponent and produce
        # inf; NaN/inf inputs pass through the normal cast instead
        return jnp.where(jnp.isfinite(x), r, x.astype(dtype))
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


# ---------------------------------------------------------------------------
# Directed-rounding arithmetic (array_round.h parity).
#
# The reference flips the x86 MXCSR rounding mode around an operation
# (array_round.h:22-40, RoundingMode::Up/Down/Zero -- used for interval
# arithmetic). TPUs compute round-to-nearest-even only. Directed results
# are recovered in two tiers:
#   add/sub: CORRECTLY ROUNDED via the FMA-free Knuth two-sum error term
#            (exact under XLA, which never reassociates floats).
#   mul/div/sqrt: jax exposes no fma primitive, so the rounding error of
#            RN is not recoverable exactly; the nearest result is widened
#            by one ulp in the requested direction unless it is provably
#            exact (zero operands). Overflow to +/-inf on finite inputs
#            clamps to +/-f32max in the direction that keeps the bound
#            sound. Bounds remain VALID for interval arithmetic, at most
#            one ulp wider than optimal.
# ---------------------------------------------------------------------------


_F32_MAX = jnp.float32(3.4028235e38)


def _bump_up(s, err_pos):
    return jnp.where(err_pos, jnp.nextafter(s, jnp.inf), s)


def _bump_down(s, err_neg):
    return jnp.where(err_neg, jnp.nextafter(s, -jnp.inf), s)


def _clamp_overflow_up(s, inputs_finite):
    """Round-toward-+inf of a value that overflowed to -inf on finite
    inputs is -f32max (the exact result is < -f32max but finite-bounded
    above by it from the direction's view: the LARGEST value <= exact is
    -inf, but the directed UPPER bound must be >= exact, and -f32max is
    the smallest valid finite choice -- keeping the interval sound)."""
    return jnp.where(jnp.isneginf(s) & inputs_finite, -_F32_MAX, s)


def _clamp_overflow_down(s, inputs_finite):
    """Round-toward--inf after overflow to +inf on finite inputs: the
    true value exceeds f32max, so f32max is the largest valid finite
    lower bound (returning +inf would make an unsound interval)."""
    return jnp.where(jnp.isposinf(s) & inputs_finite, _F32_MAX, s)


def _two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly (s = RN(a + b))."""
    s = a + b
    bp = s - a
    err = (a - (s - bp)) + (b - bp)
    return s, err


def add_up(a, b):
    """a + b rounded toward +inf (correctly rounded)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    s, err = _two_sum(a, b)
    fin = jnp.isfinite(a) & jnp.isfinite(b)
    return _clamp_overflow_up(_bump_up(s, err > 0), fin)


def add_down(a, b):
    """a + b rounded toward -inf (correctly rounded)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    s, err = _two_sum(a, b)
    fin = jnp.isfinite(a) & jnp.isfinite(b)
    return _clamp_overflow_down(_bump_down(s, err < 0), fin)


def sub_up(a, b):
    return add_up(a, -jnp.asarray(b, jnp.float32))


def sub_down(a, b):
    return add_down(a, -jnp.asarray(b, jnp.float32))


def mul_up(a, b):
    """a * b rounded toward +inf. One-ulp-conservative: always widened by
    one ulp except for exact zero products; overflow clamps so bounds
    stay interval-sound."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    p = a * b
    fin = jnp.isfinite(a) & jnp.isfinite(b)
    exact_zero = (a == 0) | (b == 0)
    return _clamp_overflow_up(_bump_up(p, jnp.isfinite(p) & ~exact_zero),
                              fin)


def mul_down(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    p = a * b
    fin = jnp.isfinite(a) & jnp.isfinite(b)
    exact_zero = (a == 0) | (b == 0)
    return _clamp_overflow_down(
        _bump_down(p, jnp.isfinite(p) & ~exact_zero), fin)


def div_up(a, b):
    """a / b rounded toward +inf (one-ulp-conservative except exact-zero
    numerators; overflow clamps)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    q = a / b
    fin = jnp.isfinite(a) & jnp.isfinite(b) & (b != 0)
    exact_zero = a == 0
    return _clamp_overflow_up(_bump_up(q, jnp.isfinite(q) & ~exact_zero),
                              fin)


def div_down(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    q = a / b
    fin = jnp.isfinite(a) & jnp.isfinite(b) & (b != 0)
    exact_zero = a == 0
    return _clamp_overflow_down(
        _bump_down(q, jnp.isfinite(q) & ~exact_zero), fin)


def sqrt_up(a):
    """sqrt(a) rounded toward +inf (one-ulp-conservative except exact 0;
    sqrt cannot overflow)."""
    a = jnp.asarray(a, jnp.float32)
    s = jnp.sqrt(a)
    return _bump_up(s, jnp.isfinite(s) & (a != 0))


def sqrt_down(a):
    a = jnp.asarray(a, jnp.float32)
    s = jnp.sqrt(a)
    return _bump_down(s, jnp.isfinite(s) & (s > 0))


def stochastic_round_pallas(x, seed: int, dtype=jnp.bfloat16,
                            interpret: bool = False):
    """Hardware stochastic rounding: a Pallas kernel on the TPU's native
    PRNG + stochastic-round units (pltpu.prng_random_bits /
    pltpu.stochastic_round), the production path next to the portable
    jnp formulation above. 1-D f32 input, bf16 out.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(x, jnp.float32)
    (n,) = x.shape
    # the TPU PRNG generates rank>=2 tiles; round up to full (8, 128) rows
    pad = (-n) % 1024
    x2 = jnp.pad(x, (0, pad)).reshape(-1, 128)

    def kernel(seed_ref, x_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape),
                             jnp.uint32)
        o_ref[:, :] = pltpu.stochastic_round(x_ref[:, :], bits,
                                             target_dtype=dtype)

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, dtype),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), x2)
    return out.reshape(-1)[:n]
