"""Struct layer tests -- mirrors reference tests/custom.cpp (ENOKI_STRUCT),
tests/call.cpp (vectorized vcalls), masked idioms."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from enoki_tpu.struct import (
    enoki_struct, width, zeros_like, select_struct, gather_struct,
    scatter_struct, slice_struct, concat_structs, detach, masked,
    dispatch_masked, dispatch_partition, dispatch_switch, InstanceRegistry,
    vectorize, vectorize_wrapper,
)


@enoki_struct
class Pt:
    x: jnp.ndarray
    y: jnp.ndarray


def test_struct_basics():
    p = Pt(jnp.arange(4.0), jnp.arange(4.0) * 10)
    assert width(p) == 4
    z = zeros_like(p)
    assert np.all(np.asarray(z.x) == 0)
    s = slice_struct(p, 2)
    assert float(s.x) == 2 and float(s.y) == 20
    # pytree: jit/vmap work
    moved = jax.jit(lambda q: Pt(q.x + 1, q.y + 1))(p)
    assert np.array_equal(moved.x, [1, 2, 3, 4])


def test_struct_gather_scatter():
    p = Pt(jnp.arange(4.0), jnp.arange(4.0) * 10)
    g = gather_struct(p, jnp.array([2, 0]))
    assert np.array_equal(g.x, [2, 0]) and np.array_equal(g.y, [20, 0])
    dst = zeros_like(p)
    out = scatter_struct(dst, g, jnp.array([1, 3]))
    assert np.array_equal(out.x, [0, 2, 0, 0])
    m = jnp.array([True, False])
    out = scatter_struct(dst, g, jnp.array([1, 3]), mask=m)
    assert np.array_equal(out.x, [0, 2, 0, 0])
    assert np.array_equal(out.y, [0, 20, 0, 0])


def test_select_and_concat():
    a = Pt(jnp.zeros(3), jnp.zeros(3))
    b = Pt(jnp.ones(3), jnp.ones(3))
    m = jnp.array([True, False, True])
    s = select_struct(m, b, a)
    assert np.array_equal(s.x, [1, 0, 1])
    c = concat_structs(a, b)
    assert width(c) == 6


def test_masked_idioms():
    x = jnp.array([1.0, 2.0, 3.0])
    m = jnp.array([True, False, True])
    assert np.array_equal(masked(x, m).assign(9.0), [9, 2, 9])
    assert np.array_equal(masked(x, m).add(1.0), [2, 2, 4])
    assert np.array_equal(masked(x, m).mul(2.0), [2, 2, 6])


def test_detach_stops_gradient():
    def f(x):
        return jnp.sum(detach(x * 2.0) * x)

    g = jax.grad(f)(jnp.ones(3))
    assert np.array_equal(g, [2, 2, 2])  # only the second factor contributes


def test_vectorize():
    def f(a, b):
        return a * b + 1.0

    out = vectorize(f, jnp.arange(4.0), jnp.arange(4.0))
    assert np.array_equal(out, [1, 2, 5, 10])
    # incompatible sizes raise (dynamic.h:1042 semantics)
    import pytest
    with pytest.raises(ValueError):
        vectorize(f, jnp.arange(4.0), jnp.arange(5.0))
    # size-1 broadcast allowed
    out = vectorize(f, jnp.arange(4.0), jnp.ones(1))
    assert np.array_equal(out, [1, 2, 3, 4])


def test_vectorize_wrapper():
    def per_lane(a, b):
        return a + b

    wide = vectorize_wrapper(per_lane)
    assert np.array_equal(wide(jnp.arange(3.0), jnp.arange(3.0)), [0, 2, 4])


# --- vectorized method calls (tests/call.cpp analog) ---


def _f_double(mask, x):
    return x * 2.0


def _f_square(mask, x):
    return x * x


def _f_neg(mask, x):
    return -x


def test_dispatch_masked():
    ids = jnp.array([0, 1, 2, 0, 1], jnp.int32)
    x = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    out = dispatch_masked([_f_double, _f_square, _f_neg], ids, x)
    assert np.array_equal(out, [2, 4, -3, 8, 25])


def test_dispatch_partition_matches_masked():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 3, 257), jnp.int32)
    x = jnp.asarray(rng.normal(size=257).astype(np.float32))
    a = dispatch_masked([_f_double, _f_square, _f_neg], ids, x)
    b = dispatch_partition([_f_double, _f_square, _f_neg], ids, x)
    assert np.allclose(a, b)


def test_dispatch_switch():
    # same f(mask, *args) contract as every other dispatcher (r4 review:
    # switch used to call f(*args), so a registry method crashed on it)
    x = jnp.array([1.0, 2.0])
    out = dispatch_switch([lambda m, v: v * 2, lambda m, v: v * v],
                          jnp.int32(1), x)
    assert np.array_equal(out, [1, 4])
    # the mask is all-true and lane-sized
    got = dispatch_switch([lambda m, v: jnp.where(m, v, -1.0)],
                          jnp.int32(0), x)
    assert np.array_equal(got, x)


def test_instance_registry():
    class Shape:
        def __init__(self, scale):
            self.scale = scale

        def eval(self, mask, x):
            return x * self.scale

    reg = InstanceRegistry()
    reg.register(Shape(2.0))
    reg.register(Shape(-1.0))
    ids = jnp.array([0, 1, 0], jnp.int32)
    x = jnp.array([1.0, 2.0, 3.0])
    out = reg.dispatch("eval", ids, x)
    assert np.array_equal(out, [2, -2, 6])
    out = reg.dispatch("eval", ids, x, strategy="partition")
    assert np.array_equal(out, [2, -2, 6])
    # gather-based getter (ENOKI_CALL_SUPPORT_GETTER)
    scales = reg.getter("scale", ids)
    assert np.array_equal(scales, [2, -1, 2])


def test_dispatch_inside_jit_and_grad():
    funcs = [_f_double, _f_square]
    ids = jnp.array([0, 1, 1, 0], jnp.int32)

    @jax.jit
    def run(x):
        return jnp.sum(dispatch_masked(funcs, ids, x))

    x = jnp.array([1.0, 2.0, 3.0, 4.0])
    assert float(run(x)) == 2 + 4 + 9 + 8
    g = jax.grad(run)(x)
    assert np.array_equal(g, [2, 4, 6, 2])


def test_dispatch_partition_default_not_scrambled():
    # regression (code review): a per-lane default must travel through
    # the sort permutation like the args, or unmatched lanes read
    # default[inv[j]] after the scatter-back
    from enoki_tpu.struct import dispatch_masked, dispatch_partition
    funcs = [lambda m, x: x + 10.0, lambda m, x: x + 20.0]
    ids = jnp.asarray([2, -1, 0], jnp.int32)  # 2 and -1 match no func
    x = jnp.asarray([1.0, 2.0, 3.0])
    default = jnp.asarray([100.0, 200.0, 300.0])
    a = np.asarray(dispatch_masked(funcs, ids, x, default=default))
    b = np.asarray(dispatch_partition(funcs, ids, x, default=default))
    np.testing.assert_allclose(a, [100.0, 200.0, 13.0])
    np.testing.assert_allclose(b, a)


def test_registry_getter_null_ids():
    from enoki_tpu.struct import InstanceRegistry

    class Mat:
        def __init__(self, s):
            self.scale = jnp.float32(s)

    reg = InstanceRegistry()
    reg.register(Mat(5.0))
    reg.register(Mat(7.0))
    got = np.asarray(reg.getter("scale", jnp.asarray([1, -1, 0])))
    np.testing.assert_allclose(got, [7.0, 0.0, 5.0])


def test_dispatch_auto_picks_by_instance_count(monkeypatch):
    """strategy="auto" (round 4): masked below the measured crossover,
    partition at/above; identical results either way."""
    from enoki_tpu.struct import call as C

    picked = []
    orig_m, orig_p = C.dispatch_masked, C.dispatch_partition
    monkeypatch.setattr(C, "dispatch_masked",
                        lambda *a, **k: picked.append("masked") or orig_m(*a, **k))
    monkeypatch.setattr(C, "dispatch_partition",
                        lambda *a, **k: picked.append("partition") or orig_p(*a, **k))

    class Inst:
        def __init__(self, c):
            self.c = float(c)

        def eval(self, m, x):
            return x * self.c

    x = jnp.arange(12, dtype=jnp.float32)

    small = C.InstanceRegistry()
    for i in range(3):
        small.register(Inst(i + 1))
    ids = jnp.asarray(np.arange(12) % 3, jnp.int32)
    out = small.dispatch("eval", ids, x)  # default strategy = auto
    np.testing.assert_allclose(np.asarray(out),
                               np.arange(12) * (np.arange(12) % 3 + 1))
    assert picked[-1] == "masked"

    big = C.InstanceRegistry()
    k = C._AUTO_PARTITION_MIN_K
    for i in range(k):
        big.register(Inst(i + 1))
    ids = jnp.asarray(np.arange(12) % k, jnp.int32)
    out = big.dispatch("eval", ids, x)
    np.testing.assert_allclose(np.asarray(out),
                               np.arange(12) * (np.arange(12) % k + 1))
    assert picked[-1] == "partition"

    # explicit strategy still respected
    small.dispatch("eval", jnp.zeros(4, jnp.int32), x[:4],
                   strategy="partition")
    assert picked[-1] == "partition"


def test_vectorize_wrapper_mixed_scalar_args():
    # r4 audit: bare vmap rejected the reference wrapper's mixed
    # wide/scalar contract (dynamic.h:1105)
    from enoki_tpu.struct import vectorize_wrapper

    wide = vectorize_wrapper(lambda a, b: a + b)
    out = wide(jnp.arange(3.0), 2.0)
    np.testing.assert_allclose(np.asarray(out), [2.0, 3.0, 4.0])
    # size-1 broadcasts as a scalar (not a (1,)-shaped packet)
    out = wide(jnp.arange(3.0), jnp.ones(1))
    np.testing.assert_allclose(np.asarray(out), [1.0, 2.0, 3.0])
    # all-scalar call degrades to a plain invocation
    assert float(wide(1.0, 2.0)) == 3.0


def test_enum_array_wide_values():
    # r4 audit: int32 hardcode overflowed on 1 << 31 flags
    import enum
    from enoki_tpu.types.enum_array import enum_array, to_enum_list

    class Flags(enum.IntEnum):
        LOW = 1
        HIGH = 1 << 31

    arr = enum_array([Flags.HIGH, Flags.LOW], Flags)
    assert arr.dtype == jnp.uint32
    assert to_enum_list(arr, Flags) == [Flags.HIGH, Flags.LOW]
