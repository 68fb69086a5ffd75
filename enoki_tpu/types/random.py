"""Vectorized PCG32 random number generator.

Bit-exact reimplementation of the reference's vectorized PCG32
(include/enoki/random.h:40-331; the PCG scheme is by Melissa O'Neill,
pcg-random.org). State is a pytree of two emulated-u64 arrays, so a
generator with N lanes produces N independent streams -- seeded exactly like
the reference: ``initseq = arange(N) + PCG32_DEFAULT_STREAM``
(random.h:52).

TPU-native twist: there are no 64-bit integer lanes, so state lives as
(hi, lo) uint32 pairs (see types/u64.py); every op lowers to native 32-bit
VPU code and works inside jit/vmap/Pallas. Because JAX is functional, the
mutating API of the reference becomes ``value, gen = gen.next_uint32()``.

Parity checked in tests/test_random.py against a numpy uint64
implementation of the reference algorithm (state update random.h:73,
output permutation random.h:74-76, float bit-tricks random.h:118,136,
advance random.h:265-285, bounded sampling random.h:165-216).

Backend-generic core: the generator also instantiates over lazy
``trace.LazyArray`` lanes (the reference's PCG32<UInt64C> over
CUDAArray, random.h over cuda.h) -- ``PCG32.create_lazy(n)`` /
next_uint32/next_uint64/next_float32 record into the trace and fuse
with their consumers, and ``advance`` (a static squaring chain over a
host-known delta, random.h:265) records as plain trace ops. The
while_loop-based methods (bounded sampling, shuffle) are eager-only:
they need host-visible convergence.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import u64 as U
from ..ops import backend as B

PCG32_DEFAULT_STATE = 0x853C49E6748FEA9B
PCG32_DEFAULT_STREAM = 0xDA3E39CB94B95BDB
PCG32_MULT = 0x5851F42D4C957F2D



class PCG32(NamedTuple):
    """Functional PCG32: all methods return (result, new_generator)."""

    state: U.U64
    inc: U.U64

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(size: Optional[int] = None, initstate: int = PCG32_DEFAULT_STATE,
               initseq=None) -> "PCG32":
        """Matches PCG32(initstate, initseq) (random.h:51-54): per-lane
        streams via initseq = arange(size) + DEFAULT_STREAM."""
        shape = () if size is None else (size,)
        if initseq is None:
            if size is None:
                seq = U.from_py(PCG32_DEFAULT_STREAM)
            else:
                lane = jnp.arange(size, dtype=jnp.uint32)
                base = U.from_py(PCG32_DEFAULT_STREAM, (size,))
                seq = U.add(base, U.U64(jnp.zeros_like(lane), lane))
        elif isinstance(initseq, int):
            seq = U.from_py(initseq, shape)
        else:
            seq = initseq
        if isinstance(initstate, int):
            st = U.from_py(initstate, shape)
        else:
            st = initstate
        return PCG32._seed(st, seq)

    @staticmethod
    def create_lazy(n: int, initstate: int = PCG32_DEFAULT_STATE,
                    initseq: Optional[int] = None) -> "PCG32":
        """PCG32 over lazy-trace lanes (the PCG32<UInt64C> analog): the
        whole seed/generate pipeline records into the trace and fuses
        with its consumers; sequences are bit-exact with the eager
        generator (same reference seeding, random.h:51-68)."""
        from ..trace import LazyArray

        lane = LazyArray.arange(n, jnp.uint32)
        if initseq is None:
            base = U.from_py(PCG32_DEFAULT_STREAM, like=lane)
            seq = U.add(base, U.U64(lane * 0, lane))
        else:
            seq = U.add(U.from_py(initseq, like=lane),
                        U.U64(lane * 0, lane * 0))
        st = U.add(U.from_py(initstate, like=lane), U.U64(lane * 0,
                                                          lane * 0))
        return PCG32._seed(st, seq)

    @staticmethod
    def _seed(initstate: U.U64, initseq: U.U64) -> "PCG32":
        """seed() (random.h:62-68): state=0; inc=(initseq<<1)|1; round;
        state+=initstate; round."""
        one = U.from_py(1, like=initseq.lo) if B.is_lazy(initseq.lo) \
            else U.from_py(1, initseq.lo.shape)
        inc = U.or_(U.shl(initseq, 1), one)
        zero = U.U64(initseq.lo * 0, initseq.lo * 0) \
            if B.is_lazy(initseq.lo) else U.zeros(initseq.lo.shape)
        gen = PCG32(zero, inc)
        _, gen = gen.next_uint32()
        gen = PCG32(U.add(gen.state, initstate), gen.inc)
        _, gen = gen.next_uint32()
        return gen

    @property
    def shape(self):
        return self.state.lo.shape

    # -- core output function ---------------------------------------------

    def _step(self) -> Tuple[jnp.ndarray, U.U64]:
        """One LCG step + XSH-RR output permutation (random.h:71-77)."""
        oldstate = self.state
        mult = U.from_py(PCG32_MULT, self.shape, like=oldstate.lo)
        new_state = U.add(U.mul(oldstate, mult), self.inc)
        # xorshifted = uint32(((oldstate >> 18) ^ oldstate) >> 27)
        xs = U.shr(U.xor(U.shr(oldstate, 18), oldstate), 27).lo
        rot = U.shr(oldstate, 59).lo
        out = (xs >> rot) | (xs << ((32 - rot) & 31))
        out = B.ns_of(xs).select(rot == 0, xs, out)
        return out, new_state

    def next_uint32(self, mask=None) -> Tuple[jnp.ndarray, "PCG32"]:
        """random.h:71 (masked variant :80: inactive lanes do not advance)."""
        out, new_state = self._step()
        if mask is not None:
            new_state = U.where(mask, new_state, self.state)
        return out, PCG32(new_state, self.inc)

    def next_uint64(self, mask=None) -> Tuple[U.U64, "PCG32"]:
        """random.h:89: low word drawn first."""
        lo, gen = self.next_uint32(mask)
        hi, gen = gen.next_uint32(mask)
        return U.U64(hi, lo), gen

    def next_float32(self, mask=None) -> Tuple[jnp.ndarray, "PCG32"]:
        """[0,1) via the (x >> 9) | 0x3f800000 bit trick (random.h:118)."""
        bits, gen = self.next_uint32(mask)
        pattern = (bits >> 9) | 0x3F800000
        if B.is_lazy(bits):
            return pattern.bitcast(jnp.float32) - 1.0, gen
        f = lax.bitcast_convert_type(pattern.astype(jnp.uint32),
                                     jnp.float32)
        return f - 1.0, gen

    def next_float64(self, mask=None):
        """[0,1) with 32 mantissa bits (random.h:133-138). Only meaningful
        under jax_enable_x64; provided for parity. Eager-only (the lazy
        trace would need x64 lanes for the u64 bit assembly)."""
        bits, gen = self.next_uint32(mask)
        if B.is_lazy(bits):
            raise NotImplementedError(
                "next_float64 is eager-only (needs 64-bit lanes); use "
                "next_float32 or next_uint64 on lazy generators")
        hi = (bits.astype(jnp.uint64) << 20) | jnp.uint64(0x3FF0000000000000)
        f = lax.bitcast_convert_type(hi, jnp.float64)
        return f - 1.0, gen

    def next_uint32_bounded(self, bound: int, mask=None):
        """Unbiased bounded sampling (random.h:165-216).

        The reference loops until all lanes clear the rejection threshold;
        we run a lax.while_loop with per-lane masks -- the same algorithm,
        trace-safe. ``bound`` must be a static python int.
        """
        threshold = ((~bound + 1) & 0xFFFFFFFF) % bound

        def cond(carry):
            _, _, active = carry
            return jnp.any(active)

        def body(carry):
            result, gen, active = carry
            draw, gen2 = gen.next_uint32(mask=active if mask is None
                                         else active & mask)
            result = jnp.where(active, draw, result)
            active = active & (draw < threshold)
            return result, gen2, active

        active0 = jnp.ones(self.shape, bool) if mask is None else jnp.asarray(mask)
        result0 = jnp.zeros(self.shape, jnp.uint32)
        result, gen, _ = lax.while_loop(cond, body, (result0, self, active0))
        return result % jnp.uint32(bound), gen

    def advance(self, delta: int) -> "PCG32":
        """Jump-ahead/back, Brown's fast-exponentiation method
        (random.h:265-285). ``delta`` may be negative (goes the long
        way). Backend-generic: ``delta`` is a host-known python int, so
        the squaring chain is a STATIC unroll -- on lazy lanes it
        records plain trace ops (popcount(delta)+1 u64 mul/add pairs)
        and fuses with its consumers; no control flow reaches the
        device."""
        delta &= (1 << 64) - 1
        lk = self.state.lo  # eager: ignored; lazy: literal carrier
        cur_mult = U.from_py(PCG32_MULT, self.shape, like=lk)
        cur_plus = self.inc
        acc_mult = U.from_py(1, self.shape, like=lk)
        acc_plus = U.from_py(0, self.shape, like=lk)
        one = U.from_py(1, self.shape, like=lk)
        # static 64-iteration unroll driven by the python int's bits
        state = self.state
        for bit in range(64):
            if delta == 0:
                break
            if delta & 1:
                acc_mult = U.mul(acc_mult, cur_mult)
                acc_plus = U.add(U.mul(acc_plus, cur_mult), cur_plus)
            cur_plus = U.mul(U.add(cur_mult, one), cur_plus)
            cur_mult = U.mul(cur_mult, cur_mult)
            delta >>= 1
        return PCG32(U.add(U.mul(acc_mult, state), acc_plus), self.inc)

    def distance(self, other: "PCG32") -> jnp.ndarray:
        """Number of steps between two generators on the same stream
        (``operator-``, random.h:288-308). Returns the low 32 bits of the
        distance per lane (full 64-bit distance as u64 via
        ``distance_u64``)."""
        return self.distance_u64(other).lo.astype(jnp.int32)

    def distance_u64(self, other: "PCG32") -> U.U64:
        """Brown's bit-by-bit distance algorithm, 64-iteration unroll."""
        cur_mult = U.from_py(PCG32_MULT, self.shape)
        cur_plus = self.inc
        cur_state = other.state
        distance = U.from_py(0, self.shape)
        one = U.from_py(1, self.shape)
        for bit in range(64):
            the_bit = U.from_py(1 << bit, self.shape)
            mask = U.is_zero(U.xor(U.and_(self.state, the_bit),
                                   U.and_(cur_state, the_bit)))
            step = U.add(U.mul(cur_state, cur_mult), cur_plus)
            cur_state = U.where(~mask, step, cur_state)
            distance = U.where(~mask, U.or_(distance, the_bit), distance)
            cur_plus = U.mul(U.add(cur_mult, one), cur_plus)
            cur_mult = U.mul(cur_mult, cur_mult)
        return distance

    def next_uint64_bounded(self, bound: int, mask=None):
        """Unbiased bounded 64-bit sampling (random.h:219-246). ``bound``
        must be a static python int < 2**63 for the threshold math."""
        threshold_int = ((~bound + 1) & ((1 << 64) - 1)) % bound

        def cond(carry):
            _, _, active = carry
            return jnp.any(active)

        def body(carry):
            result, gen, active = carry
            draw, gen2 = gen.next_uint64(mask=active)
            result = U.where(active, draw, result)
            # active &= draw < threshold
            thr_hi = jnp.uint32((threshold_int >> 32) & 0xFFFFFFFF)
            thr_lo = jnp.uint32(threshold_int & 0xFFFFFFFF)
            lt = (draw.hi < thr_hi) | ((draw.hi == thr_hi) & (draw.lo < thr_lo))
            active = active & lt
            return result, gen2, active

        active0 = jnp.ones(self.shape, bool) if mask is None else jnp.asarray(mask)
        result0 = U.zeros(self.shape)
        result, gen, _ = lax.while_loop(cond, body, (result0, self, active0))
        return _u64_mod_const(result, bound), gen

    def shuffle(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, "PCG32"]:
        """Fisher-Yates shuffle (random.h:318, Knuth TAoCP 3.4.2).

        The reference shuffles a host container with a *scalar* generator;
        here we shuffle a device array using lane 0's stream. Static-length
        unroll (n-1 bounded draws).
        """
        n = x.shape[0]
        gen = self
        for i in range(n - 1, 0, -1):
            j, gen = gen.next_uint32_bounded(i + 1)
            j0 = jnp.reshape(j, (-1,))[0].astype(jnp.int32)
            xi, xj = x[i], x[j0]
            x = x.at[i].set(xj).at[j0].set(xi)
        return x, gen


def _u64_mod_const(value: U.U64, bound: int) -> U.U64:
    """value mod bound (static python bound) by shift-subtract long
    division. Remainder < bound stays well inside u64; 64 unrolled steps
    of cheap 32-bit ops -- acceptable for this rarely-hot op."""
    rem = U.zeros(value.lo.shape)
    b_hi = jnp.uint32((bound >> 32) & 0xFFFFFFFF)
    b_lo = jnp.uint32(bound & 0xFFFFFFFF)
    for bit in range(63, -1, -1):
        rem = U.shl(rem, 1)
        src = value.hi if bit >= 32 else value.lo
        rem = U.U64(rem.hi, rem.lo | ((src >> (bit % 32)) & 1))
        # if rem >= bound: rem -= bound
        ge = (rem.hi > b_hi) | ((rem.hi == b_hi) & (rem.lo >= b_lo))
        sub = U.sub(rem, U.U64(jnp.broadcast_to(b_hi, rem.hi.shape),
                               jnp.broadcast_to(b_lo, rem.lo.shape)))
        rem = U.where(ge, sub, rem)
    return rem


def uniform(gen: PCG32, shape=None, dtype=jnp.float32):
    """Convenience: draw a [0,1) array -- ONE draw per generator lane
    (the PCG32 lane model; unlike jax.random.uniform, the output shape
    IS the generator's shape). A mismatched ``shape`` raises instead of
    silently returning the lane count; 2-byte float dtypes are drawn at
    f32 precision and cast."""
    if shape is not None:
        want = (tuple(shape) if isinstance(shape, (tuple, list))
                else (int(shape),))
        have = (gen.shape if isinstance(gen.shape, tuple)
                else (gen.shape,))
        if want != have:
            raise ValueError(
                f"uniform: shape {want} != generator lanes {have}; "
                "PCG32 draws one sample per lane -- size the generator "
                "(PCG32(size=...)) instead of the draw")
    if dtype == jnp.float64:
        return gen.next_float64()
    val, gen2 = gen.next_float32()
    if dtype not in (jnp.float32, None):
        val = (val.cast(dtype) if hasattr(val, "cast")
               else val.astype(dtype))
    return val, gen2
