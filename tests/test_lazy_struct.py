"""ENOKI_STRUCT over the lazy backend: structs of LazyArrays.

The reference instantiates ENOKI_STRUCT types across ALL backends
(array_macro.h:216-359), so ``Ray3fC`` -- a struct of lazy GPU arrays --
works with gather/scatter/select/zero (array_struct.h:9-60) and can be
passed through vectorized method calls (array_call.h:107-114 gathers
arbitrary struct args through the vcall permutation). This suite is that
contract on LazyArray leaves: the struct helpers dispatch per leaf, a
Ray-struct sphere program runs as ONE fused program, and a call.cpp-style
dispatch with struct args + struct results stays lazy.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import enoki_tpu.trace as tr
import enoki_tpu.trace.call as tc
from enoki_tpu.trace import LazyArray
from enoki_tpu.struct import (enoki_struct, width, zeros_like, full_like,
                              select_struct, gather_struct, scatter_struct,
                              slice_struct, detach)
from enoki_tpu.render.vec import Vec3, dot3


@pytest.fixture(autouse=True)
def _fresh():
    tr.reset()
    yield
    tr.reset()


@enoki_struct
class Ray:
    o: object  # Vec3 of per-backend arrays
    d: object


def _lazy_ray(n=4):
    f = np.float32
    o = Vec3(LazyArray(np.arange(n, dtype=f)),
             LazyArray(np.arange(n, dtype=f) * 10),
             LazyArray(np.full(n, -1.0, f)))
    d = Vec3(LazyArray(np.zeros(n, f)), LazyArray(np.zeros(n, f)),
             LazyArray(np.ones(n, f)))
    return Ray(o, d)


def test_struct_helpers_on_lazy_leaves():
    r = _lazy_ray(4)
    assert width(r) == 4

    z = zeros_like(r)
    assert isinstance(z.o.x, LazyArray)
    np.testing.assert_allclose(z.o.x.numpy(), np.zeros(4))

    f = full_like(r, 2.5)
    np.testing.assert_allclose(f.d.z.numpy(), np.full(4, 2.5))

    idx = LazyArray(np.array([3, 1], np.int32))
    g = gather_struct(r, idx)
    assert isinstance(g.o.y, LazyArray)
    np.testing.assert_allclose(g.o.y.numpy(), [30, 10])

    m = LazyArray(np.array([True, False, True, False]))
    s = select_struct(m, r, zeros_like(r))
    np.testing.assert_allclose(s.o.x.numpy(), [0, 0, 2, 0])

    dst = zeros_like(r)
    scatter_struct(dst, gather_struct(r, idx),
                   LazyArray(np.array([0, 2], np.int32)))
    np.testing.assert_allclose(dst.o.x.numpy(), [3, 0, 1, 0])

    s0 = slice_struct(r, 2)  # forces eval; one lane as scalars
    assert float(s0.o.y) == 20.0

    d = detach(r)
    assert isinstance(d.o.x, LazyArray)
    np.testing.assert_allclose(d.o.x.numpy(), [0, 1, 2, 3])


def test_ray_struct_sphere_is_one_fused_program():
    """The Ray3fC workflow (docs/gpu.rst): a Ray STRUCT of lazy arrays
    through intersect + shade, fused into one program at eval."""
    n = 64
    idx = LazyArray.arange(n * n)
    col = (idx % n).cast(np.float32)
    row = (idx / n).cast(np.int32).cast(np.float32)
    step = 2.0 * 1.2 / (n - 1)
    ray = Ray(o=Vec3(col * step - 1.2, row * step - 1.2,
                     LazyArray.full(-1.0, 1)),
              d=Vec3(LazyArray.full(0.0, 1), LazyArray.full(0.0, 1),
                     LazyArray.full(1.0, 1)))

    # quadratic intersect in struct form (tests/sphere.cpp:67-78)
    b = 2.0 * dot3(ray.o, ray.d)
    c = dot3(ray.o, ray.o) - 1.0
    disc = b * b - 4.0 * c
    valid = disc >= 0.0
    t = (-b + tr.sqrt(tr.maximum(disc, 0.0))) * 0.5
    hit = ray.o + ray.d * t
    nrm = select_struct(valid, hit, Vec3(LazyArray.full(0.0, 1),
                                         LazyArray.full(0.0, 1),
                                         LazyArray.full(0.0, 1)))
    lam = tr.maximum(nrm.x * -1.0 + nrm.y * -1.0 + nrm.z * 2.0, 0.0)
    img = lam * 90.0 + 0.2

    n0 = tr.stats()["n_evals"]
    out = img.numpy()
    assert tr.stats()["n_evals"] == n0 + 1  # ONE fused program
    assert out.shape == (n * n,)
    assert out.min() >= 0.2 and out.max() > 10.0

    # parity vs the hand-scalar version in examples/lazy_sphere.py
    from examples.lazy_sphere import render_lazy

    ref = render_lazy(n).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def _ids(vals):
    return LazyArray(np.asarray(vals, np.int32))


def test_dispatch_struct_args_and_struct_results():
    """call.cpp-style vcall with a struct argument and a struct result:
    every leaf is gathered through the permutation and scattered back
    (array_call.h:107-114)."""
    @enoki_struct
    class PointLoad:
        p: object   # Vec3
        w: object   # LazyArray weight

    def scale2(mask, pl):
        return PointLoad(Vec3(pl.p.x * 2.0, pl.p.y * 2.0, pl.p.z * 2.0),
                         pl.w * 10.0)

    def negate(mask, pl):
        return PointLoad(Vec3(-pl.p.x, -pl.p.y, -pl.p.z), pl.w - 1.0)

    n = 6
    f = np.float32
    arg = PointLoad(Vec3(LazyArray(np.arange(n, dtype=f)),
                         LazyArray(np.arange(n, dtype=f) + 10),
                         LazyArray(np.arange(n, dtype=f) + 100)),
                    LazyArray(np.ones(n, f)))
    ids = _ids([0, 1, 0, 1, 0, 1])
    out = tc.dispatch([scale2, negate], ids, arg)

    assert isinstance(out, PointLoad)
    assert isinstance(out.p.x, LazyArray)
    want_x = np.where(np.arange(n) % 2 == 0, np.arange(n) * 2.0,
                      -np.arange(n, dtype=f))
    np.testing.assert_allclose(out.p.x.numpy(), want_x)
    want_w = np.where(np.arange(n) % 2 == 0, 10.0, 0.0)
    np.testing.assert_allclose(out.w.numpy(), want_w)


def test_dispatch_struct_fuses_and_differentiates():
    # gradient flows through struct-arg dispatch (gather/scatter adjoints)
    x = tr.requires_grad(LazyArray(np.array([1.0, 2.0, 3.0, 4.0],
                                            np.float32)))
    v = Vec3(x * 1.0, x * 2.0, x * 3.0)

    def f0(mask, vv):
        return vv.x + vv.y          # d/dx = 3

    def f1(mask, vv):
        return vv.z * vv.z          # d/dx = 18x

    ids = _ids([0, 0, 1, 1])
    out = tc.dispatch([f0, f1], ids, v)
    loss = out.hsum()
    tr.backward(loss)
    g = tr.gradient(x).numpy()
    np.testing.assert_allclose(g, [3.0, 3.0, 18.0 * 3.0, 18.0 * 4.0],
                               rtol=1e-5)


def test_dispatch_struct_structure_mismatch_raises():
    def f_struct(mask, v):
        return Vec3(v.x, v.y, v.z)

    def f_flat(mask, v):
        return v.x

    v = Vec3(LazyArray(np.ones(2, np.float32)),
             LazyArray(np.ones(2, np.float32)),
             LazyArray(np.ones(2, np.float32)))
    with pytest.raises(ValueError, match="structure"):
        tc.dispatch([f_struct, f_flat], _ids([0, 1]), v)


def test_masked_proxy_on_lazy():
    # masked(x, m) op= v over LazyArray (array_masked.h on CUDAArray)
    from enoki_tpu.struct import masked

    x = LazyArray(np.array([1., 2., 3., 4.], np.float32))
    m = x > 2.0
    out = masked(x, m).add(10.0)
    assert isinstance(out, LazyArray)
    np.testing.assert_allclose(out.numpy(), [1, 2, 13, 14])
    np.testing.assert_allclose(masked(x, m).assign(0.0).numpy(),
                               [1, 2, 0, 0])
    np.testing.assert_allclose(masked(x, m).min(3.5).numpy(),
                               [1, 2, 3, 3.5])


def test_concat_and_set_slice_struct_lazy():
    # r4 audit: concat_structs crashed on LazyArray leaves;
    # set_slice_struct corrupted wide ints through a float() detour
    from enoki_tpu.struct.pytree import concat_structs, set_slice_struct

    a = {"v": LazyArray(np.array([1.0, 2.0], np.float32))}
    b = {"v": LazyArray(np.array([3.0, 4.0, 5.0], np.float32))}
    c = concat_structs(a, b)
    assert isinstance(c["v"], LazyArray)
    np.testing.assert_array_equal(c["v"].numpy(), [1, 2, 3, 4, 5])

    import jax
    if jax.config.jax_enable_x64:  # 64-bit leaves need x64
        big = (1 << 60) + 1
        s = {"k": LazyArray(np.zeros(2, np.uint64))}
        s["k"].numpy()
        s2 = set_slice_struct(s, 0, {"k": big})
        assert int(s2["k"].numpy()[0]) == big  # float() rounds off the +1
    # int path must not take a float detour even at 32 bits: ints pass
    # through literal() unconverted
    s = {"k": LazyArray(np.zeros(2, np.int32))}
    s["k"].numpy()
    s2 = set_slice_struct(s, 0, {"k": 7})
    assert int(s2["k"].numpy()[0]) == 7 and s2["k"].dtype == jnp.int32


def test_concat_structs_lazy_promotes_dtype():
    # r4 second-pass review: the lazy concat coerced to the FIRST
    # piece's dtype, truncating later float pieces into an int output
    from enoki_tpu.struct.pytree import concat_structs

    a = {"v": LazyArray(np.array([1, 2, 3], np.int32))}
    b = {"v": jnp.array([0.5, 1.5], jnp.float32)}
    c = concat_structs(a, b)
    assert c["v"].dtype == jnp.float32
    np.testing.assert_allclose(c["v"].numpy(), [1, 2, 3, 0.5, 1.5])
