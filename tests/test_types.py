"""Tests for morton, idiv, color, half -- mirrors reference tests/{morton,
idiv,color}.cpp coverage."""

import numpy as np
import jax.numpy as jnp

from enoki_tpu.types import morton_encode, morton_decode, DivisorU32, DivisorI32
from enoki_tpu.types import color, half


def _np_morton2(x, y):
    out = np.zeros_like(x, np.uint32)
    for b in range(16):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def _np_morton3(x, y, z):
    out = np.zeros_like(x, np.uint32)
    for b in range(10):
        out |= ((x >> b) & 1) << (3 * b)
        out |= ((y >> b) & 1) << (3 * b + 1)
        out |= ((z >> b) & 1) << (3 * b + 2)
    return out


def test_morton_2d_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 16, 1000).astype(np.uint32)
    y = rng.integers(0, 1 << 16, 1000).astype(np.uint32)
    code = morton_encode([jnp.asarray(x), jnp.asarray(y)])
    assert np.array_equal(np.asarray(code), _np_morton2(x, y))
    dx, dy = morton_decode(code, 2)
    assert np.array_equal(np.asarray(dx), x)
    assert np.array_equal(np.asarray(dy), y)


def test_morton_3d_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 10, 1000).astype(np.uint32)
    y = rng.integers(0, 1 << 10, 1000).astype(np.uint32)
    z = rng.integers(0, 1 << 10, 1000).astype(np.uint32)
    code = morton_encode([jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)])
    assert np.array_equal(np.asarray(code), _np_morton3(x, y, z))
    dx, dy, dz = morton_decode(code, 3)
    assert np.array_equal(np.asarray(dx), x)
    assert np.array_equal(np.asarray(dy), y)
    assert np.array_equal(np.asarray(dz), z)


def test_divisor_u32():
    # mirrors tests/idiv.cpp: sweep divisors incl. awkward ones
    rng = np.random.default_rng(2)
    n = rng.integers(0, 1 << 32, 5000, dtype=np.uint32)
    for d in [1, 2, 3, 5, 7, 10, 641, 6700417, 2**31, 2**31 + 1,
              2**32 - 1, 48271]:
        div = DivisorU32(d)
        got = np.asarray(div(jnp.asarray(n)))
        want = (n // np.uint32(d)).astype(np.uint32) if d < 2**32 else None
        want = (n.astype(np.uint64) // d).astype(np.uint32)
        assert np.array_equal(got, want), f"d={d}"
        assert np.array_equal(np.asarray(div.mod(jnp.asarray(n))),
                              (n.astype(np.uint64) % d).astype(np.uint32))


def test_divisor_i32():
    rng = np.random.default_rng(3)
    n = rng.integers(-2**31, 2**31, 5000, dtype=np.int64).astype(np.int32)
    for d in [1, -1, 2, -2, 3, -3, 7, -7, 10, 641, -641, 2**30,
              -(2**30), 48271]:
        div = DivisorI32(d)
        got = np.asarray(div(jnp.asarray(n)))
        want = np.trunc(n.astype(np.float64) / d).astype(np.int32)
        assert np.array_equal(got, want), f"d={d}"


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 1001)
    y = color.linear_to_srgb(x)
    back = color.srgb_to_linear(y)
    assert np.allclose(back, x, atol=1e-5)
    # standard reference points
    assert np.isclose(float(color.linear_to_srgb(jnp.float32(1.0))), 1.0, atol=1e-5)
    assert np.isclose(float(color.srgb_to_linear(jnp.float32(1.0))), 1.0, atol=1e-5)
    assert np.isclose(float(color.linear_to_srgb(jnp.float32(0.5))),
                      0.7353569830524495, atol=1e-4)


def test_half():
    x = jnp.array([1.0, -2.5, 65504.0, 1e-8], jnp.float32)
    h = half.float_to_half(x)
    back = half.half_to_float(h)
    assert np.allclose(np.asarray(back)[:3], np.asarray(x)[:3], rtol=1e-3)
    bits = half.half_bits(jnp.float16(1.0))
    assert int(bits) == 0x3C00
    assert float(half.half_from_bits(jnp.uint16(0xC000))) == -2.0
