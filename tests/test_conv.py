"""Type-conversion matrix -- mirrors reference tests/conv.cpp.

The reference converts each array type to every other type and back,
asserting exact roundtrips on values representable in both (conv.cpp:
25), plus mask conversions (conv.cpp:50-56) and bool conversions
(conv.cpp:58). Here the matrix runs over jnp dtypes (eager .astype) AND
the lazy trace's CAST opcode, asserting eager/lazy agreement.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

import enoki_tpu.trace as tr
from enoki_tpu.trace import LazyArray

# 32-bit-lane dtypes (64-bit dtypes need jax_enable_x64; covered in the
# trace literal tests). float16 = the lazy half.h:29 parity case
# (CUDAArray<half> via the cuda.h type tables).
DTYPES = [jnp.float32, jnp.int32, jnp.uint32, jnp.bfloat16, jnp.float16]

# values exactly representable in EVERY dtype above (bf16 has 8 mantissa
# bits; uint32 excludes negatives)
SMALL = np.array([0, 1, 2, 3, 100, 255], np.float64)


@pytest.fixture(autouse=True)
def _fresh():
    tr.reset()
    yield
    tr.reset()


@pytest.mark.parametrize("d1,d2", list(itertools.product(DTYPES, DTYPES)))
def test_conv_roundtrip(d1, d2):
    x = jnp.asarray(SMALL, d1)
    rt = x.astype(d2).astype(d1)
    np.testing.assert_array_equal(np.asarray(rt, np.float64), SMALL)

    # lazy CAST agrees with eager astype
    lx = LazyArray(x)
    lrt = lx.cast(d2).cast(d1)
    np.testing.assert_array_equal(np.asarray(lrt.numpy(), np.float64),
                                  SMALL)


@pytest.mark.parametrize("d", DTYPES)
def test_mask_select_per_dtype(d):
    # masktest analog (conv.cpp:30-38): a one-hot mask selects 1-of-n
    x = jnp.asarray(SMALL, d)
    for i in range(len(SMALL)):
        m = jnp.arange(len(SMALL)) == i
        out = jnp.where(m, jnp.ones_like(x), jnp.zeros_like(x))
        want = (np.arange(len(SMALL)) == i).astype(np.float64)
        np.testing.assert_array_equal(np.asarray(out, np.float64), want)


def test_bool_conv():
    # bool -> numeric -> bool (conv.cpp:58-66), eager and lazy
    m = np.array([True, False, True, True])
    x = jnp.asarray(m)
    np.testing.assert_array_equal(np.asarray(x.astype(jnp.int32)),
                                  m.astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(x.astype(jnp.float32).astype(jnp.bool_)), m)
    lm = LazyArray(m)
    li = lm.cast(jnp.int32)
    np.testing.assert_array_equal(li.numpy(), m.astype(np.int32))
    np.testing.assert_array_equal(li.cast(jnp.bool_).numpy(), m)


def test_float_to_int_truncates():
    # C++ conversion semantics: float -> int truncates toward zero
    x = jnp.asarray([1.9, -1.9, 0.5, -0.5], jnp.float32)
    np.testing.assert_array_equal(np.asarray(x.astype(jnp.int32)),
                                  [1, -1, 0, 0])
    lx = LazyArray(np.array([1.9, -1.9, 0.5, -0.5], np.float32))
    np.testing.assert_array_equal(lx.cast(jnp.int32).numpy(), [1, -1, 0, 0])


def test_reinterpret_roundtrip():
    # memcpy_cast analog: f32 <-> u32 bit roundtrip, eager and lazy
    from enoki_tpu.ops.router import reinterpret

    v = np.array([1.0, -2.5, 0.0, np.inf], np.float32)
    bits = reinterpret(jnp.asarray(v), jnp.uint32)
    back = reinterpret(bits, jnp.float32)
    np.testing.assert_array_equal(np.asarray(back), v)

    lv = LazyArray(v)
    lbits = lv.bitcast(jnp.uint32)
    np.testing.assert_array_equal(lbits.numpy(),
                                  v.view(np.uint32))
    np.testing.assert_array_equal(lbits.bitcast(jnp.float32).numpy(), v)
    with pytest.raises(TypeError):
        lv.bitcast(jnp.bfloat16)  # narrowing bitcast rejected


def test_f16_lazy_roundtrip_and_bitcast():
    """float16 on the trace (half.h:29 over the lazy backend): literal,
    cast, math, and same-itemsize bitcast f16 <-> bf16."""
    v = np.array([0.5, 1.0, -2.0, 100.0], np.float16)
    lx = LazyArray(v)
    assert lx.dtype == jnp.float16
    # arithmetic + literal coercion stays f16
    y = lx * 2.0 + 1.0
    assert y.dtype == jnp.float16
    np.testing.assert_array_equal(y.numpy(), v * np.float16(2) + np.float16(1))
    # literal constructor is bit-exact (including -0.0)
    lz = LazyArray.literal(-0.0, 3, jnp.float16)
    assert lz.numpy().view(np.uint16).tolist() == [0x8000] * 3
    # f16 <-> bf16 bitcast: same itemsize, allowed
    lb = lx.bitcast(jnp.bfloat16)
    assert lb.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(lb.bitcast(jnp.float16).numpy()), v)
    # float-promoting math keeps f16 (a float code)
    s = tr.sqrt(LazyArray(np.array([4.0, 9.0], np.float16)))
    assert s.dtype == jnp.float16
    np.testing.assert_array_equal(s.numpy(),
                                  np.sqrt(np.array([4, 9], np.float16)))
