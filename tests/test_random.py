"""PCG32 bit-exactness tests vs a numpy-uint64 implementation of the
reference algorithm (random.h:40-331)."""

import numpy as np
import jax
import jax.numpy as jnp

from enoki_tpu.types import PCG32, u64
from enoki_tpu.types.random import PCG32_DEFAULT_STATE, PCG32_DEFAULT_STREAM, PCG32_MULT

M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


class NumpyPCG32:
    """Reference implementation in numpy uint64 (random.h semantics)."""

    def __init__(self, size=None, initstate=PCG32_DEFAULT_STATE, initseq=None):
        if initseq is None:
            if size is None:
                initseq = np.uint64(PCG32_DEFAULT_STREAM)
            else:
                initseq = (np.arange(size, dtype=np.uint64)
                           + np.uint64(PCG32_DEFAULT_STREAM))
        shape = () if size is None else (size,)
        initstate = np.full(shape, initstate, np.uint64)
        initseq = np.asarray(initseq, np.uint64)
        with np.errstate(over="ignore"):
            self.state = np.zeros(shape, np.uint64)
            self.inc = (initseq << np.uint64(1)) | np.uint64(1)
            self.next_uint32()
            self.state += initstate
            self.next_uint32()

    def next_uint32(self):
        with np.errstate(over="ignore"):
            old = self.state
            self.state = old * np.uint64(PCG32_MULT) + self.inc
            xorshifted = (((old >> np.uint64(18)) ^ old) >> np.uint64(27)).astype(np.uint32)
            rot = (old >> np.uint64(59)).astype(np.uint32)
            return (xorshifted >> rot) | (xorshifted << ((np.uint32(32) - rot) & np.uint32(31)))

    def next_float32(self):
        bits = (self.next_uint32() >> np.uint32(9)) | np.uint32(0x3F800000)
        return bits.view(np.float32) - np.float32(1.0)

    def advance(self, delta):
        with np.errstate(over="ignore"):
            cur_mult = np.full_like(self.state, PCG32_MULT)
            cur_plus = self.inc.copy() * np.ones_like(self.state)
            acc_mult = np.ones_like(self.state)
            acc_plus = np.zeros_like(self.state)
            delta = np.uint64(delta & ((1 << 64) - 1))
            while delta != 0:
                if delta & np.uint64(1):
                    acc_mult = acc_mult * cur_mult
                    acc_plus = acc_plus * cur_mult + cur_plus
                cur_plus = (cur_mult + np.uint64(1)) * cur_plus
                cur_mult = cur_mult * cur_mult
                delta >>= np.uint64(1)
            self.state = acc_mult * self.state + acc_plus


def test_next_uint32_bit_exact():
    n = 64
    ref = NumpyPCG32(n)
    gen = PCG32.create(n)
    assert np.array_equal(u64.to_py(gen.state), ref.state)
    assert np.array_equal(u64.to_py(gen.inc), ref.inc)
    for _ in range(50):
        got, gen = gen.next_uint32()
        want = ref.next_uint32()
        assert np.array_equal(np.asarray(got), want)


def test_next_float32_bit_exact():
    n = 16
    ref = NumpyPCG32(n)
    gen = PCG32.create(n)
    for _ in range(20):
        got, gen = gen.next_float32()
        want = ref.next_float32()
        assert np.array_equal(np.asarray(got), want)
        assert np.all((np.asarray(got) >= 0) & (np.asarray(got) < 1))


def test_masked_lanes_do_not_advance():
    n = 8
    gen = PCG32.create(n)
    mask = jnp.array([True, False] * 4)
    _, gen2 = gen.next_uint32(mask)
    st0, st2 = u64.to_py(gen.state), u64.to_py(gen2.state)
    assert np.array_equal(st0[1::2], st2[1::2])  # masked-off unchanged
    assert not np.any(st0[0::2] == st2[0::2])


def test_advance_matches_sequential():
    n = 4
    gen = PCG32.create(n)
    fast = gen.advance(100)
    slow = gen
    for _ in range(100):
        _, slow = slow.next_uint32()
    assert np.array_equal(u64.to_py(fast.state), u64.to_py(slow.state))
    # negative delta goes backwards (random.h:271-273)
    back = fast.advance(-100)
    assert np.array_equal(u64.to_py(back.state), u64.to_py(gen.state))


def test_advance_vs_numpy():
    n = 4
    ref = NumpyPCG32(n)
    ref.advance(12345678901234)
    gen = PCG32.create(n).advance(12345678901234)
    assert np.array_equal(u64.to_py(gen.state), ref.state)


def test_bounded_unbiased_range():
    gen = PCG32.create(1024)
    draws, gen = gen.next_uint32_bounded(10)
    d = np.asarray(draws)
    assert d.min() >= 0 and d.max() < 10
    # roughly uniform
    counts = np.bincount(d, minlength=10)
    assert counts.min() > 50


def test_jit_and_vmap_safe():
    @jax.jit
    def draw(gen):
        v, gen = gen.next_float32()
        return v, gen

    gen = PCG32.create(8)
    v, gen2 = draw(gen)
    ref = NumpyPCG32(8)
    assert np.array_equal(np.asarray(v), ref.next_float32())


def test_u64_primitives():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 64, 100, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, 100, dtype=np.uint64)
    A = u64.u64((a >> np.uint64(32)).astype(np.uint32), a.astype(np.uint32))
    B = u64.u64((b >> np.uint64(32)).astype(np.uint32), b.astype(np.uint32))
    with np.errstate(over="ignore"):
        assert np.array_equal(u64.to_py(u64.add(A, B)), a + b)
        assert np.array_equal(u64.to_py(u64.sub(A, B)), a - b)
        assert np.array_equal(u64.to_py(u64.mul(A, B)), a * b)
        assert np.array_equal(u64.to_py(u64.xor(A, B)), a ^ b)
        assert np.array_equal(u64.to_py(u64.shr(A, 27)), a >> np.uint64(27))
        assert np.array_equal(u64.to_py(u64.shl(A, 20)), a << np.uint64(20))
        assert np.array_equal(u64.to_py(u64.shr(A, 59)), a >> np.uint64(59))


def test_uniform_shape_contract():
    # r4 audit: uniform() silently discarded the shape argument
    import pytest
    from enoki_tpu.types.random import PCG32, uniform

    gen = PCG32.create(size=64)
    u, _ = uniform(gen)
    assert np.asarray(u).shape == (64,)
    with pytest.raises(ValueError):
        uniform(PCG32.create(size=64), (128,))
    ub, _ = uniform(PCG32.create(size=64), dtype=jnp.bfloat16)
    assert np.asarray(ub).dtype == jnp.bfloat16
