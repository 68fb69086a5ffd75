"""Tests for the smaller parity pieces: enum arrays, rounding, PCG32
distance / bounded-64, PPM io."""

import enum
import os
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from enoki_tpu.types import PCG32, u64
from enoki_tpu.types.enum_array import (enum_array, enum_full, enum_eq,
                                        to_enum_list)
from enoki_tpu.ops.rounding import (round_, round_half_away, stochastic_round)
from enoki_tpu.render.io import write_ppm, read_ppm


class Kind(enum.IntEnum):
    DIFFUSE = 0
    MIRROR = 1
    GLASS = 2


def test_enum_arrays():
    arr = enum_array([Kind.MIRROR, Kind.DIFFUSE, Kind.GLASS], Kind)
    assert np.array_equal(arr, [1, 0, 2])
    assert np.array_equal(enum_eq(arr, Kind.DIFFUSE), [False, True, False])
    assert to_enum_list(arr, Kind) == [Kind.MIRROR, Kind.DIFFUSE, Kind.GLASS]
    assert np.array_equal(enum_full(Kind.GLASS, 3), [2, 2, 2])


def test_rounding():
    x = jnp.array([0.5, 1.5, 2.5, -0.5, -1.5])
    assert np.array_equal(round_(x), [0, 2, 2, -0, -2])  # half-to-even
    assert np.array_equal(round_half_away(x), [1, 2, 3, -1, -2])


def test_stochastic_round_unbiased():
    key = jax.random.key(0)
    x = jnp.full(200_000, 1.0 + 1 / 512, jnp.float32)  # between bf16 steps
    r = stochastic_round(x, key, jnp.bfloat16).astype(jnp.float32)
    vals = np.unique(np.asarray(r))
    assert len(vals) == 2  # the two bf16 neighbours
    mean = float(r.mean())
    assert abs(mean - (1.0 + 1 / 512)) < 1e-4  # unbiased


def test_pcg32_distance():
    gen = PCG32.create(4)
    ahead = gen.advance(12345)
    d = ahead.distance_u64(gen)
    assert np.all(u64.to_py(d) == 12345)
    # distance is measured from other -> self
    assert np.array_equal(np.asarray(ahead.distance(gen)), [12345] * 4)


def test_pcg32_uint64_bounded():
    gen = PCG32.create(256)
    bound = 1_000_000_007
    draws, gen = gen.next_uint64_bounded(bound)
    vals = u64.to_py(draws)
    assert vals.max() < bound
    # large bound beyond 2**32
    big = (1 << 40) + 7
    draws, gen = gen.next_uint64_bounded(big)
    vals = u64.to_py(draws)
    assert vals.max() < big and vals.max() > (1 << 32)  # uses upper range


def test_ppm_roundtrip():
    img = (np.arange(64, dtype=np.float32).reshape(8, 8) * 3.9)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.ppm")
        write_ppm(path, img)
        back = read_ppm(path)
    assert np.array_equal(back, np.clip(img, 0, 255).astype(np.int32))


def test_directed_rounding():
    # array_round.h parity: exact directed rounding via error-free
    # transformations; validated against float64 ground truth
    from enoki_tpu.ops import rounding as R
    rng = np.random.default_rng(0)
    a = rng.normal(scale=10, size=5000).astype(np.float32)
    b = rng.normal(scale=1e-5, size=5000).astype(np.float32)
    for name, up_fn, dn_fn, exact in [
        ("add", R.add_up, R.add_down,
         lambda x, y: x.astype(np.float64) + y.astype(np.float64)),
        ("mul", R.mul_up, R.mul_down,
         lambda x, y: x.astype(np.float64) * y.astype(np.float64)),
        ("div", R.div_up, R.div_down,
         lambda x, y: x.astype(np.float64) / y.astype(np.float64)),
    ]:
        true = exact(a, b)
        up = np.asarray(up_fn(a, b), np.float64)
        dn = np.asarray(dn_fn(a, b), np.float64)
        assert (up >= true).all(), name
        assert (dn <= true).all(), name
        # add/sub correctly rounded (two-sum); mul/div one-ulp
        # conservative (no fma primitive in this jax)
        width = 1 if name == "add" else 2
        sp = np.spacing(np.abs(true).astype(np.float32)).astype(np.float64)
        assert (up - true <= width * sp).all(), name
        assert (true - dn <= width * sp).all(), name
    x = np.abs(a) + 0.1
    true = np.sqrt(x.astype(np.float64))
    up = np.asarray(R.sqrt_up(x), np.float64)
    dn = np.asarray(R.sqrt_down(x), np.float64)
    assert (up >= true).all() and (dn <= true).all()


@pytest.mark.skipif(jax.devices()[0].platform not in ("tpu", "axon"),
                    reason="hardware PRNG/stochastic-round units only")
def test_stochastic_round_pallas_hardware():
    # exercised on the real chip by tools/drive_tpu-style runs; the CPU
    # suite skips (interpret mode has no TPU PRNG). Unbiasedness check.
    from enoki_tpu.ops.rounding import stochastic_round_pallas
    x = jnp.full((1 << 14,), 1.0 + 1.0 / 512.0, jnp.float32)
    out = np.asarray(stochastic_round_pallas(x, seed=7), np.float32)
    ups = (out > 1.0 + 1.0 / 256).mean()
    assert 0.2 < ups < 0.3
    assert abs(out.mean() - float(x[0])) < 2e-4


def test_kernel_printf_inside_pallas():
    # cuda_printf analog inside the fused kernel (array_router.h:972):
    # must be legal in a pallas_call body (interpret mode on CPU)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from enoki_tpu import runtime

    def kernel(x_ref, o_ref):
        runtime.kernel_printf("tile max {}", jnp.max(x_ref[:, :]))
        o_ref[:, :] = x_ref[:, :] * 2.0

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=True)(x)
    assert float(out[0, 0]) == 2.0
