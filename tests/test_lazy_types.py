"""Backend-generic composite types over the lazy trace.

The reference's type zoo instantiates the same composite types over
every backend -- Complex<FloatP> AND Complex<FloatC>, Vector3fC =
Array<FloatC, 3> (docs/gpu.rst:74, SURVEY type table). These tests pin
the TPU analog: enoki_tpu.types.Complex / Quaternion and render.Vec3
over trace.LazyArray elements record into the trace (nothing executes),
fuse into one program at eval, match the eager jnp instantiation, and
differentiate through the tape.
"""

import numpy as np
import pytest

import enoki_tpu.trace as tr
from enoki_tpu.render.vec import Vec3, cross3, dot3, norm3, normalize3
from enoki_tpu.trace import LazyArray
from enoki_tpu.types import complex as C
from enoki_tpu.types import quaternion as Q


@pytest.fixture(autouse=True)
def _fresh():
    tr.reset()
    yield
    tr.reset()


def _lz(a):
    return LazyArray(np.asarray(a, np.float32))


def test_complex_lazy_matches_eager():
    re = np.linspace(-2.0, 2.0, 64).astype(np.float32)
    im = np.linspace(1.0, 3.0, 64).astype(np.float32)
    zl = C.Complex(_lz(re), _lz(im))
    ze = C.Complex.of(re, im)

    wl = C.exp(C.log(zl * zl + 1.0) * 0.5)
    we = C.exp(C.log(ze * ze + 1.0) * 0.5)
    assert not wl.re.materialized  # still lazy: the whole chain recorded
    evals_before = tr.stats()["n_evals"]
    tr.eval()  # bare eval: ALL live vars in one program (jit.cu:1418)
    assert tr.stats()["n_evals"] == evals_before + 1
    assert wl.re.materialized and wl.im.materialized
    got_re, got_im = wl.re.numpy(), wl.im.numpy()
    np.testing.assert_allclose(got_re, np.asarray(we.re), rtol=2e-6,
                               atol=1e-6)
    np.testing.assert_allclose(got_im, np.asarray(we.im), rtol=2e-6,
                               atol=1e-6)


def test_complex_lazy_full_surface():
    re = np.linspace(0.3, 1.4, 32).astype(np.float32)
    im = np.linspace(-0.8, 0.9, 32).astype(np.float32)
    zl = C.Complex(_lz(re), _lz(im))
    ze = C.Complex.of(re, im)
    for fn in (C.sqrt, C.sin, C.cos, C.sinh, C.cosh, C.asin, C.atan,
               C.rcp, C.conj):
        wl, we = fn(zl), fn(ze)
        np.testing.assert_allclose(wl.re.numpy(), np.asarray(we.re),
                                   rtol=3e-5, atol=3e-6,
                                   err_msg=fn.__name__)
        np.testing.assert_allclose(wl.im.numpy(), np.asarray(we.im),
                                   rtol=3e-5, atol=3e-6,
                                   err_msg=fn.__name__)
    np.testing.assert_allclose(C.abs_(zl).numpy(),
                               np.asarray(C.abs_(ze)), rtol=1e-5)
    np.testing.assert_allclose(C.arg(zl).numpy(),
                               np.asarray(C.arg(ze)), rtol=1e-5)


def test_complex_lazy_gradient():
    # d/d re of |exp(z)|^2 through the tape
    re = np.array([0.25, 0.5], np.float32)
    im = np.array([0.1, 0.2], np.float32)
    re_l = tr.requires_grad(_lz(re))
    z = C.Complex(re_l, _lz(im))
    w = C.exp(z)
    loss = (w.re * w.re + w.im * w.im).hsum()  # = exp(2 re)
    tr.backward(loss)
    np.testing.assert_allclose(tr.gradient(re_l).numpy(),
                               2.0 * np.exp(2.0 * re), rtol=1e-5)


def test_quaternion_lazy_matches_eager():
    rng = np.random.default_rng(3)
    comps = rng.normal(size=(4, 16)).astype(np.float32)
    ql = Q.Quaternion(*[_lz(c) for c in comps])
    qe = Q.Quaternion(*comps)
    for fn in (Q.normalize, Q.exp, Q.sqrt, Q.rcp, Q.conj):
        wl, we = fn(ql), fn(qe)
        for comp in "xyzw":
            np.testing.assert_allclose(
                getattr(wl, comp).numpy(), np.asarray(getattr(we, comp)),
                rtol=3e-5, atol=3e-6, err_msg=f"{fn.__name__}.{comp}")
    np.testing.assert_allclose(Q.abs_(ql).numpy(), np.asarray(Q.abs_(qe)),
                               rtol=1e-5)
    # log on normalized quaternions (acos domain)
    wl, we = Q.log(Q.normalize(ql)), Q.log(Q.normalize(qe))
    for comp in "xyzw":
        np.testing.assert_allclose(
            getattr(wl, comp).numpy(), np.asarray(getattr(we, comp)),
            rtol=1e-4, atol=1e-5, err_msg=f"log.{comp}")


def test_vec3_lazy_is_vector3fc():
    a = Vec3.of(_lz([1.0, 2.0]), _lz([0.0, 1.0]), _lz([2.0, -1.0]))
    b = Vec3.of(_lz([0.5, 0.5]), _lz([1.0, 0.0]), _lz([0.0, 3.0]))
    c = cross3(a, b)
    n = normalize3(a + b * 2.0)
    d = dot3(a, b)
    # all still lazy; one read fuses
    assert not d.materialized
    np.testing.assert_allclose(d.numpy(), [0.5 + 0 + 0, 1.0 + 0 - 3.0])
    np.testing.assert_allclose(
        c.x.numpy(), np.cross([[1, 0, 2], [2, 1, -1]],
                              [[0.5, 1, 0], [0.5, 0, 3]])[:, 0])
    nn = np.asarray([n.x.numpy(), n.y.numpy(), n.z.numpy()])
    np.testing.assert_allclose((nn ** 2).sum(0), [1.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(norm3(a).numpy(), [np.sqrt(5.0),
                                                  np.sqrt(6.0)], rtol=1e-6)
    # Vec3.of lifts python scalars against lazy components
    s = Vec3.of(_lz([1.0, 1.0]), 2.0, 3.0)
    np.testing.assert_allclose(s.z.numpy(), [3.0, 3.0])


def test_pcg32_lazy_bit_exact():
    # PCG32 over lazy lanes (the PCG32<UInt64C> analog, random.h over
    # cuda.h): same sequences as the eager generator, fully fused
    from enoki_tpu.types.random import PCG32

    gl = PCG32.create_lazy(8)
    ge = PCG32.create(8)
    ul, gl = gl.next_uint32()
    ue, ge = ge.next_uint32()
    fl, gl = gl.next_float32()
    fe, ge = ge.next_float32()
    u64l, gl = gl.next_uint64()
    u64e, ge = ge.next_uint64()
    assert not ul.materialized  # everything above is ONE lazy program
    np.testing.assert_array_equal(ul.numpy(), np.asarray(ue))
    np.testing.assert_array_equal(fl.numpy(), np.asarray(fe))
    np.testing.assert_array_equal(u64l.hi.numpy(), np.asarray(u64e.hi))
    np.testing.assert_array_equal(u64l.lo.numpy(), np.asarray(u64e.lo))
    # state carried lazily: another draw still matches
    ul2, _ = gl.next_uint32()
    ue2, _ = ge.next_uint32()
    np.testing.assert_array_equal(ul2.numpy(), np.asarray(ue2))


def test_pcg32_lazy_advance_bit_exact():
    # advance on lazy lanes (round 5): the host-known delta drives a
    # STATIC squaring chain of trace ops (random.h:265 parity) -- same
    # states as the eager generator, still one fused program
    from enoki_tpu.types.random import PCG32

    for delta in (100, -100, 12345678901234, 1 << 63):
        gl = PCG32.create_lazy(8).advance(delta)
        ge = PCG32.create(8).advance(delta)
        assert not gl.state.lo.materialized
        np.testing.assert_array_equal(gl.state.hi.numpy(),
                                      np.asarray(ge.state.hi))
        np.testing.assert_array_equal(gl.state.lo.numpy(),
                                      np.asarray(ge.state.lo))
        # the advanced generator keeps drawing identically
        ul, _ = gl.next_uint32()
        ue, _ = ge.next_uint32()
        np.testing.assert_array_equal(ul.numpy(), np.asarray(ue))


def test_pcg32_lazy_feeds_pipeline():
    # the reference idiom: RNG -> transform -> histogram, all lazy
    from enoki_tpu.types.random import PCG32

    g = PCG32.create_lazy(64)
    f, g = g.next_float32()
    y = tr.sqrt(f * 2.0 + 0.5)
    evals = tr.stats()["n_evals"]
    v = y.numpy()
    assert tr.stats()["n_evals"] == evals + 1  # seed+draw+math: one program
    assert (v >= np.sqrt(0.5)).all() and (v < np.sqrt(2.5)).all()


def test_morton_color_lazy():
    from enoki_tpu.types.morton import morton_encode, morton_decode
    from enoki_tpu.types.color import linear_to_srgb, srgb_to_linear

    xs = np.array([3, 5, 1000], np.uint32)
    ys = np.array([7, 2, 999], np.uint32)
    ml = morton_encode([LazyArray(xs), LazyArray(ys)])
    me = morton_encode([xs, ys])
    np.testing.assert_array_equal(ml.numpy(), np.asarray(me))
    dx, dy = morton_decode(ml, 2)
    np.testing.assert_array_equal(dx.numpy(), xs)
    np.testing.assert_array_equal(dy.numpy(), ys)

    v = np.linspace(0.0, 1.0, 32).astype(np.float32)
    sl = linear_to_srgb(LazyArray(v))
    se = linear_to_srgb(v)
    np.testing.assert_allclose(sl.numpy(), np.asarray(se), rtol=1e-6)
    rl = srgb_to_linear(sl)
    np.testing.assert_allclose(rl.numpy(), v, rtol=1e-5, atol=1e-7)


def test_matrix_soa_lazy_and_dense_agree():
    # the Matrix<FloatC> form: N^2 scalar lazy arrays (matrix.h:33)
    from enoki_tpu.types import matrix as MD
    from enoki_tpu.types import matrix_soa as MS

    rng = np.random.default_rng(9)
    for n in (1, 2, 3, 4):
        a = rng.normal(size=(5, n, n)).astype(np.float32)
        a += np.eye(n, dtype=np.float32) * 3.0  # well-conditioned
        lazy = tuple(tuple(LazyArray(a[:, i, j]) for j in range(n))
                     for i in range(n))
        inv_l = MS.inverse(lazy)
        det_l = MS.det(lazy)
        inv_d = np.asarray(MD.inverse(a))
        det_d = np.asarray(MD.det(a))
        np.testing.assert_allclose(det_l.numpy(), det_d, rtol=2e-5,
                                   atol=1e-6)
        for i in range(n):
            for j in range(n):
                np.testing.assert_allclose(inv_l[i][j].numpy(),
                                           inv_d[:, i, j], rtol=4e-4,
                                           atol=2e-5, err_msg=f"n={n}")
        # matmul(m, inverse(m)) == I, all lazy, one fused program
        prod = MS.matmul(lazy, inv_l)
        evals = tr.stats()["n_evals"]
        tr.eval()
        assert tr.stats()["n_evals"] == evals + 1
        for i in range(n):
            for j in range(n):
                np.testing.assert_allclose(
                    prod[i][j].numpy(), np.full(5, 1.0 if i == j else 0.0),
                    atol=2e-4)


def test_matrix_soa_dense_roundtrip_and_ops():
    from enoki_tpu.types import matrix_soa as MS

    a = np.arange(12, dtype=np.float32).reshape(3, 2, 2) + 1
    m = MS.from_dense(a)
    np.testing.assert_allclose(MS.to_dense(m), a)
    np.testing.assert_allclose(MS.to_dense(MS.transpose(m)),
                               np.swapaxes(a, -1, -2))
    np.testing.assert_allclose(np.asarray(MS.trace(m)),
                               np.trace(a, axis1=-2, axis2=-1))
    np.testing.assert_allclose(np.asarray(MS.frob(m)),
                               (a * a).sum((-2, -1)))
    v = (a[..., 0, 0], a[..., 1, 1])
    got = MS.matvec(m, v)
    want = np.einsum("bij,bj->bi", a, np.stack(v, -1))
    np.testing.assert_allclose(np.stack(got, -1), want, rtol=1e-6)


def test_morton_lazy_int32_coerced():
    # review r2: lazy int32 codes must be shifted logically (uint32), not
    # arithmetically; mixed eager/lazy coordinate lists are lifted
    from enoki_tpu.types.morton import morton_encode, morton_decode

    x = np.array([40000, 1], np.uint32)  # encode sets bit 31 of the code
    y = np.array([60000, 2], np.uint32)
    code = morton_encode([LazyArray(x.astype(np.int32)).cast(np.int32),
                          y])  # mixed: lazy int32 + eager numpy
    dx, dy = morton_decode(code.cast(np.int32), 2)  # decode from int32
    np.testing.assert_array_equal(dx.numpy(), x)
    np.testing.assert_array_equal(dy.numpy(), y)


def test_sh_lazy_matches_eager():
    from enoki_tpu.types.sh import sh_eval

    rng = np.random.default_rng(2)
    v = rng.normal(size=(3, 16)).astype(np.float32)
    v /= np.linalg.norm(v, axis=0)
    lazy = sh_eval(LazyArray(v[0]), LazyArray(v[1]), LazyArray(v[2]), 4)
    eager = sh_eval(v[0], v[1], v[2], 4)
    evals = tr.stats()["n_evals"]
    tr.eval()  # all 25 coefficients in ONE fused program
    assert tr.stats()["n_evals"] == evals + 1
    for a, b in zip(lazy, eager):
        np.testing.assert_allclose(a.numpy(), np.asarray(b), rtol=2e-5,
                                   atol=1e-6)


def test_erfinv_lazy_matches_eager():
    # the Giles fit composed from trace opcodes (probit sampling inside
    # one fused program, histogram.cpp:37-47)
    from enoki_tpu.ops.special import erfinv

    x = np.linspace(-0.995, 0.995, 256).astype(np.float32)
    lazy = erfinv(LazyArray(x))
    eager = np.asarray(erfinv(jnp_arr := __import__("jax.numpy",
                                                    fromlist=["asarray"])
                              .asarray(x), "poly"))
    np.testing.assert_allclose(lazy.numpy(), eager, rtol=2e-5, atol=2e-6)


def test_transform_soa_lazy():
    # homogeneous transforms over lazy scalar entries (Matrix4fC):
    # compose translate(rotate(scale)) and match the dense eager builders
    import jax.numpy as jnp

    from enoki_tpu.types import matrix_soa as MS
    from enoki_tpu.types import transform as T

    ang = np.float32(0.7)
    # lazy: per-lane angles (2 lanes)
    a = LazyArray(np.array([0.7, -0.3], np.float32))
    axn = 1.0 / np.sqrt(3.0)
    rot_l = MS.rotate(axn, axn, axn, a)
    m_l = MS.matmul(MS.translate(*(LazyArray(np.full(2, v, np.float32))
                                   for v in (1.0, 2.0, 3.0))), rot_l)
    px, py, pz = MS.transform_point(m_l, *(LazyArray(np.full(2, v,
                                                             np.float32))
                                           for v in (0.5, -0.5, 1.0)))
    # dense eager reference, lane 0
    m_e = np.asarray(T.translate(jnp.asarray([1.0, 2.0, 3.0])) @
                     T.rotate(jnp.asarray([axn, axn, axn]), ang))
    p_e = m_e @ np.array([0.5, -0.5, 1.0, 1.0])
    np.testing.assert_allclose(
        [px.numpy()[0], py.numpy()[0], pz.numpy()[0]],
        p_e[:3] / p_e[3], rtol=1e-5, atol=1e-6)
