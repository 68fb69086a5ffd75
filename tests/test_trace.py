"""Lazy trace runtime tests (the CUDAArray/cuda_eval analog).

Covers the reference's trace-JIT behaviors (SURVEY §2.2 "Tracing JIT
compiler", src/cuda/jit.cu): lazy op recording, fusion into one compiled
program, kernel-cache hits on structural retrace, broadcast validation,
refcount-driven graph collection, scatter dirty tracking and
read-after-scatter eval forcing, whos/labels, log levels.
"""

import numpy as np
import pytest

import enoki_tpu.trace as tr
from enoki_tpu.trace import LazyArray


@pytest.fixture(autouse=True)
def _fresh():
    tr.reset()
    yield
    tr.reset()


def test_lazy_until_eval():
    x = LazyArray(np.arange(8, dtype=np.float32))
    y = x * 2.0 + 1.0
    assert not y.materialized
    got = y.numpy()
    assert y.materialized
    np.testing.assert_allclose(got, np.arange(8) * 2.0 + 1.0)


def test_fusion_single_eval():
    # an arbitrarily long op chain evaluates in ONE program (the fusion
    # contrast of tests/sphere.cpp:139-147)
    x = LazyArray(np.linspace(0.1, 1.0, 64).astype(np.float32))
    y = x
    for _ in range(50):
        y = tr.sqrt(y * y + 0.01)
    before = tr.stats()["n_evals"]
    y.eval()
    assert tr.stats()["n_evals"] == before + 1
    ref = np.linspace(0.1, 1.0, 64).astype(np.float32)
    for _ in range(50):
        ref = np.sqrt(ref * ref + 0.01)
    np.testing.assert_allclose(y.numpy(), ref, rtol=1e-5)


def test_cache_hit_on_retrace():
    # same structure, different data -> executable cache hit (the analog
    # of the reference's kernel-cache hit, docs/gpu.rst:268-271)
    def prog(data):
        x = LazyArray(data)
        return (tr.sin(x) * 2.0 + tr.cos(x)).numpy()

    a = prog(np.arange(16, dtype=np.float32))
    h0, m0 = tr.cache_stats()
    b = prog(np.arange(16, dtype=np.float32) + 3)
    h1, m1 = tr.cache_stats()
    assert m1 == m0 and h1 == h0 + 1
    np.testing.assert_allclose(
        b, np.sin(np.arange(16.0) + 3) * 2 + np.cos(np.arange(16.0) + 3),
        rtol=1e-5, atol=1e-6)


def test_cache_miss_on_different_structure():
    x = LazyArray(np.arange(4, dtype=np.float32))
    (x + 1.0).eval()
    _, m0 = tr.cache_stats()
    (x * 3.0).eval()
    _, m1 = tr.cache_stats()
    assert m1 == m0 + 1


def test_broadcast_validation():
    # 1-or-equal size rule (cuda_trace_append, jit.cu:776-782)
    x = LazyArray(np.zeros(8, np.float32))
    s = LazyArray.literal(2.0)
    (x * s).eval()  # scalar broadcast OK
    y = LazyArray(np.zeros(7, np.float32))
    with pytest.raises(ValueError):
        _ = x + y


def test_refcount_collection():
    x = LazyArray(np.zeros(4, np.float32))
    n0 = tr.stats()["n_vars"]
    y = x + 1.0
    z = y * 2.0
    # two literal vars + y + z
    assert tr.stats()["n_vars"] == n0 + 4
    del y, z  # z's deletion drops y's internal ref too
    # the op vars are collected; the two scalar LITERAL vars are
    # intentionally retained by the shared-literal cache (immutable,
    # reused by every later coercion of the same constant; reset()
    # releases them)
    assert tr.stats()["n_vars"] == n0 + 2
    y2 = x + 1.0  # re-coercing the same constant creates NO new var
    assert tr.stats()["n_vars"] == n0 + 3


def test_horizontal_fused():
    x = LazyArray(np.arange(32, dtype=np.float32))
    assert float(x.hsum().numpy()[0]) == 496.0
    assert float(x.hmax().numpy()[0]) == 31.0
    assert float((x * 0 + 2).hprod().numpy()[0]) == 2.0 ** 32
    assert int((x > 15.0).count().numpy()[0]) == 16
    assert bool((x >= 0.0).all().numpy()[0])
    assert not bool((x > 100.0).any().numpy()[0])
    np.testing.assert_allclose(x.psum().numpy(), np.cumsum(np.arange(32.0)))
    np.testing.assert_allclose(x.reverse().numpy(), np.arange(32.0)[::-1])


def test_select_and_compare():
    x = LazyArray(np.arange(10, dtype=np.float32))
    z = tr.select(x > 4.0, x, -x)
    np.testing.assert_allclose(
        z.numpy(), np.where(np.arange(10) > 4, np.arange(10.0),
                            -np.arange(10.0)))


def test_gather():
    src = LazyArray(np.array([10., 20., 30., 40.], np.float32))
    idx = LazyArray(np.array([3, 0, 2], np.int32))
    np.testing.assert_allclose(src.gather(idx).numpy(), [40., 10., 30.])


def test_scatter_dirty_forces_eval():
    # read-after-scatter protocol (jit.cu:674,719-730): the scatter is
    # lazy; a read of the target evals it first and sees the update
    tgt = LazyArray(np.zeros(5, np.float32))
    tgt.scatter(LazyArray(np.array([1, 3], np.int32)),
                LazyArray(np.array([7.0, 9.0], np.float32)))
    y = tgt + 1.0  # appending a reader op forces the pending scatter
    np.testing.assert_allclose(y.numpy(), [1., 8., 1., 10., 1.])


def test_scatter_add_conflicts():
    # conflict-safe accumulation (atom.global.add analog, cuda.h:893,
    # tests/histogram.cpp:54)
    tgt = LazyArray(np.zeros(4, np.float32))
    idx = LazyArray(np.array([0, 1, 1, 1, 3], np.int32))
    tgt.scatter_add(idx, LazyArray(np.ones(5, np.float32)))
    np.testing.assert_allclose(tgt.numpy(), [1., 3., 0., 1.])


def test_arange_linspace_literal():
    np.testing.assert_array_equal(LazyArray.arange(6).numpy(),
                                  np.arange(6, dtype=np.int32))
    np.testing.assert_allclose(
        LazyArray.linspace(-1.0, 1.0, 5).numpy(),
        np.linspace(-1, 1, 5, dtype=np.float32), rtol=1e-6)
    np.testing.assert_allclose(LazyArray.full(2.5, 3).numpy(), [2.5] * 3)


def test_cast_and_int_ops():
    x = LazyArray(np.array([1, 2, 3], np.int32))
    f = x.cast(np.float32)
    assert f.dtype == np.float32
    np.testing.assert_allclose((f / 2.0).numpy(), [0.5, 1.0, 1.5])
    np.testing.assert_array_equal((x << 2).numpy(), [4, 8, 12])
    u = LazyArray(np.array([7], np.uint32))
    assert int(tr.popcnt(u).numpy()[0]) == 3


def test_whos_and_labels():
    x = LazyArray(np.zeros(16, np.float32)).label("weights")
    _ = x  # keep alive
    report = tr.whos()
    assert "weights" in report and "live variables" in report


def test_single_element_fetch_forces_eval():
    x = LazyArray(np.arange(4, dtype=np.float32))
    y = x * 10.0
    assert not y.materialized
    assert y[2] == 20.0  # cuda_fetch_element analog (jit.cu:1520)
    assert y.materialized


def test_log_level_roundtrip():
    tr.set_log_level(3)
    assert tr.stats() is not None
    tr.set_log_level(0)


def test_scalar_size1_output():
    # size-1 results broadcast against full arrays afterwards
    x = LazyArray(np.arange(8, dtype=np.float32))
    m = x.hsum()  # size 1
    y = x / m
    np.testing.assert_allclose(y.numpy(), np.arange(8.0) / 28.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# AD over the lazy trace (DiffArray analog; reference tests/autodiff.cpp)
# ---------------------------------------------------------------------------


def test_backward_simple():
    x = LazyArray(np.array([1.0, 2.0, 3.0], np.float32))
    tr.requires_grad(x)
    loss = (x * x).hsum()  # d/dx sum(x^2) = 2x
    val = tr.backward(loss)
    assert float(val[0]) == 14.0
    np.testing.assert_allclose(tr.gradient(x).numpy(), [2., 4., 6.])


def test_backward_transcendental_chain():
    x = LazyArray(np.linspace(0.1, 1.0, 8).astype(np.float32))
    tr.requires_grad(x)
    loss = (tr.sin(x) * tr.exp(x)).hsum()
    tr.backward(loss)
    xs = np.linspace(0.1, 1.0, 8)
    want = np.cos(xs) * np.exp(xs) + np.sin(xs) * np.exp(xs)
    np.testing.assert_allclose(tr.gradient(x).numpy(), want, rtol=1e-5)


def test_backward_two_params_and_accumulation():
    a = tr.requires_grad(LazyArray(np.array([2.0], np.float32)))
    b = tr.requires_grad(LazyArray(np.array([3.0], np.float32)))
    tr.backward((a * b).hsum())
    np.testing.assert_allclose(tr.gradient(a).numpy(), [3.0])
    np.testing.assert_allclose(tr.gradient(b).numpy(), [2.0])
    # second pass accumulates (enoki tape accumulates until cleared)
    tr.backward((a * b).hsum())
    np.testing.assert_allclose(tr.gradient(a).numpy(), [6.0])
    tr.clear_gradients()
    np.testing.assert_allclose(tr.gradient(a).numpy(), [0.0])


def test_backward_gather_adjoint():
    # gather adjoint is scatter_add (autodiff.cpp:384-397)
    src = tr.requires_grad(LazyArray(np.array([1., 2., 3., 4.], np.float32)))
    idx = LazyArray(np.array([1, 1, 3], np.int32))
    loss = src.gather(idx).hsum()
    tr.backward(loss)
    np.testing.assert_allclose(tr.gradient(src).numpy(), [0., 2., 0., 1.])


def test_backward_cache_hit_on_second_step():
    def step(data):
        x = tr.requires_grad(LazyArray(data))
        loss = (tr.tanh(x) * 2.0).hsum()
        tr.backward(loss)
        return tr.gradient(x).numpy()

    g1 = step(np.array([0.5, -0.5], np.float32))
    h0, m0 = tr.cache_stats()
    g2 = step(np.array([1.5, -1.5], np.float32))
    h1, m1 = tr.cache_stats()
    # step 2 reuses BOTH cached executables: the forward program and the
    # segment-VJP program (no recompilation in an optimization loop)
    assert m1 == m0 and h1 == h0 + 2
    np.testing.assert_allclose(g1, 2 / np.cosh([0.5, -0.5]) ** 2, rtol=1e-5)
    np.testing.assert_allclose(g2, 2 / np.cosh([1.5, -1.5]) ** 2, rtol=1e-5)


def test_backward_after_eval_works():
    # the tape OUTLIVES evaluation (autodiff.h:126: values and derivatives
    # are independent; the reference's tape survives cuda_eval)
    x = tr.requires_grad(LazyArray(np.array([1.0, 2.0], np.float32)))
    loss = (x * x).hsum()
    loss.eval()
    got = loss.numpy()  # reading the loss does not kill the tape either
    np.testing.assert_allclose(got, [5.0])
    tr.backward(loss)
    np.testing.assert_allclose(tr.gradient(x).numpy(), [2.0, 4.0])


def test_gradient_of_intermediate():
    # gradient() of a non-leaf: any externally-held array is materialized
    # at the eval boundary and receives a cotangent (reference: gradient()
    # of any DiffArray, autodiff.h:1410)
    x = tr.requires_grad(LazyArray(np.array([2.0, 3.0], np.float32)))
    y = x * x          # intermediate, handle held
    loss = (y * 5.0).hsum()
    tr.backward(loss)
    np.testing.assert_allclose(tr.gradient(y).numpy(), [5.0, 5.0])
    np.testing.assert_allclose(tr.gradient(x).numpy(), [20.0, 30.0])


def test_backward_scatter_add_adjoint():
    # d loss / d scattered-values must flow through a lazy scatter_add
    # (Special scatter edge, autodiff.cpp:532-597)
    x = tr.requires_grad(LazyArray(np.array([1.0, 2.0, 3.0], np.float32)))
    tgt = LazyArray(np.zeros(4, np.float32))
    idx = LazyArray(np.array([0, 2, 2], np.int32))
    tgt.scatter_add(idx, x * 2.0)
    w = LazyArray(np.array([1.0, 10.0, 100.0, 1000.0], np.float32))
    loss = (tgt * w).hsum()
    tr.backward(loss)
    # d loss/d x_i = 2 * w[idx_i] = 2 * [w[0], w[2], w[2]]
    np.testing.assert_allclose(tr.gradient(x).numpy(), [2.0, 200.0, 200.0])


def test_backward_scatter_overwrite_combine():
    # scatter (overwrite) adjoint: the target's incoming gradient is
    # zeroed at overwritten lanes, the value gets the lane gradient
    # (overwrite-combine with zeroed weights, autodiff.cpp:532-597)
    base = tr.requires_grad(LazyArray(np.array([1., 2., 3., 4.],
                                               np.float32)))
    v = tr.requires_grad(LazyArray(np.array([5.0], np.float32)))
    tgt = base * 1.0
    tgt.scatter(LazyArray(np.array([1], np.int32)), v)
    loss = (tgt * tgt).hsum()
    tr.backward(loss)
    np.testing.assert_allclose(tr.gradient(v).numpy(), [10.0])
    np.testing.assert_allclose(tr.gradient(base).numpy(), [2., 0., 6., 8.])


def test_backward_through_psum_and_compress():
    x = tr.requires_grad(LazyArray(np.array([1.0, 2.0, 3.0], np.float32)))
    loss = x.psum().hsum()  # sum of prefix sums: weights [3, 2, 1]
    tr.backward(loss)
    np.testing.assert_allclose(tr.gradient(x).numpy(), [3.0, 2.0, 1.0])

    tr.clear_gradients()
    y = tr.requires_grad(LazyArray(np.array([4.0, 5.0, 6.0], np.float32)))
    m = LazyArray(np.array([True, False, True]))
    packed, _ = (y * 2.0).compress(m)
    tr.backward(packed.hsum())
    np.testing.assert_allclose(tr.gradient(y).numpy(), [2.0, 0.0, 2.0])


def test_backward_twice_with_free_false():
    x = tr.requires_grad(LazyArray(np.array([3.0], np.float32)))
    loss = (x * x).hsum()
    tr.backward(loss, free=False)
    tr.backward(loss)
    # two passes accumulate (reference backward accumulates node grads)
    np.testing.assert_allclose(tr.gradient(x).numpy(), [12.0])


def test_forward_mode():
    x = tr.requires_grad(LazyArray(np.array([0.5], np.float32)))
    y = tr.sin(x) * 3.0
    val, tang = tr.forward_from(x, y)
    np.testing.assert_allclose(np.asarray(val), 3 * np.sin(0.5), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tang), 3 * np.cos(0.5), rtol=1e-6)
    np.testing.assert_allclose(tr.gradient(y).numpy(),
                               [3 * np.cos(0.5)], rtol=1e-6)


def test_backward_select_masked_lanes():
    # masked lanes must not poison gradients (safe_mul semantics,
    # autodiff.cpp:1191): 1/x behind a x>0 mask
    x = tr.requires_grad(LazyArray(np.array([2.0, 4.0], np.float32)))
    y = tr.select(x > 3.0, x * x, x * 0.5)
    tr.backward(y.hsum())
    np.testing.assert_allclose(tr.gradient(x).numpy(), [0.5, 8.0])


def test_literal_change_hits_cache():
    # literals are runtime scalar inputs: a changed constant reuses the
    # compiled executable (improvement over the reference, which embeds
    # literals in the PTX source, cuda.h:267-317)
    x = LazyArray(np.arange(8, dtype=np.float32))
    (x * 2.0 + 1.0).eval()
    h0, m0 = tr.cache_stats()
    y = (x * 3.5 + 7.25)
    y.eval()
    h1, m1 = tr.cache_stats()
    assert m1 == m0 and h1 == h0 + 1
    np.testing.assert_allclose(y.numpy(), np.arange(8.0) * 3.5 + 7.25)


def test_integer_literals_bit_exact():
    # int literals ride the uint32 path: large bit patterns survive
    x = LazyArray(np.array([0x9E3779B9, 1, 0xFFFFFFFF], np.uint32))
    y = x ^ 0x9E3779B9
    np.testing.assert_array_equal(
        y.numpy(), np.array([0, 0x9E3779B8, 0x61C88646], np.uint32))


def test_constant_only_program():
    # a program with no data leaves must not be constant-folded into the
    # executable (XLA would evaluate it on the host at compile time)
    i = LazyArray.arange(64).cast(np.float32)
    y = tr.sin(i * 0.1) + 2.0
    np.testing.assert_allclose(y.numpy(), np.sin(np.arange(64) * 0.1) + 2,
                               rtol=1e-5, atol=1e-6)


def test_extended_math_ops():
    x = LazyArray(np.linspace(0.1, 0.9, 16).astype(np.float32))
    cases = [
        (tr.cbrt, np.cbrt), (tr.log1p, np.log1p), (tr.expm1, np.expm1),
        (tr.asinh, np.arcsinh), (tr.atanh, np.arctanh),
        (tr.sign, np.sign), (tr.erfc, None), (tr.lgamma, None),
    ]
    import scipy.special as sps
    refs = {tr.erfc: sps.erfc, tr.lgamma: sps.gammaln}
    xs = np.linspace(0.1, 0.9, 16)
    for f, rf in cases:
        want = (rf or refs[f])(xs)
        np.testing.assert_allclose(f(x).numpy(), want, rtol=2e-5,
                                   atol=1e-6, err_msg=f.__name__)
    y = LazyArray(np.linspace(1.5, 3.0, 16).astype(np.float32))
    np.testing.assert_allclose(tr.acosh(y).numpy(),
                               np.arccosh(np.linspace(1.5, 3.0, 16)),
                               rtol=1e-5)
    np.testing.assert_allclose(
        tr.copysign(x, -y).numpy(), -xs.astype(np.float32), rtol=1e-6)


def test_predicates_and_composites():
    x = LazyArray(np.array([1.0, np.inf, np.nan, -2.0], np.float32))
    np.testing.assert_array_equal(tr.isnan(x).numpy(),
                                  [False, False, True, False])
    np.testing.assert_array_equal(tr.isinf(x).numpy(),
                                  [False, True, False, False])
    np.testing.assert_array_equal(tr.isfinite(x).numpy(),
                                  [True, False, False, True])
    z = LazyArray(np.array([-1.0, 0.5, 2.0], np.float32))
    np.testing.assert_allclose(tr.clamp(z, 0.0, 1.0).numpy(),
                               [0.0, 0.5, 1.0])
    a = LazyArray(np.zeros(3, np.float32))
    b = LazyArray(np.ones(3, np.float32) * 10)
    np.testing.assert_allclose(tr.lerp(a, b, 0.25).numpy(), [2.5] * 3)


def test_review_fixes():
    # lerp endpoint-exact even under catastrophic-cancellation inputs
    a = LazyArray(np.array([1e8], np.float32))
    b = LazyArray(np.array([1.0], np.float32))
    np.testing.assert_array_equal(tr.lerp(a, b, 1.0).numpy(), [1.0])
    np.testing.assert_array_equal(tr.lerp(a, b, 0.0).numpy(), [1e8])
    # lerp with numpy array operands stays lazy (no sequence-protocol eval)
    r = tr.lerp(a, np.ones(1, np.float32), 0.5)
    assert isinstance(r, LazyArray) and not r.materialized
    # reference sign semantics: sign(0) = 1, matching ops.sign
    z = LazyArray(np.array([-3.0, 0.0, 5.0], np.float32))
    np.testing.assert_array_equal(tr.sign(z).numpy(), [-1.0, 1.0, 1.0])
    # float-returning ops on int inputs declare (and produce) f32
    xi = LazyArray(np.array([0, 3], np.int32))
    y = tr.log1p(xi)
    assert y.dtype == np.float32
    z2 = y + 0.5  # literal must ride the float path
    np.testing.assert_allclose(z2.numpy(), np.log1p([0, 3]) + 0.5,
                               rtol=1e-6)


def test_compress_lazy():
    x = LazyArray(np.arange(10, dtype=np.float32))
    packed, count = x.compress(x > 6.0)
    assert not packed.materialized
    np.testing.assert_allclose(packed.numpy()[:3], [7., 8., 9.])
    assert int(count.numpy()[0]) == 3
    np.testing.assert_allclose(packed.numpy()[3:], 0.0)


def test_select_scalar_operands():
    # ADVICE r1: select(m, 5.0, x) must not coerce the scalar through the
    # mask's bool dtype (which silently yielded 1.0 on true lanes)
    x = LazyArray(np.array([10.0, 20.0, 30.0], np.float32))
    m = x > 15.0
    np.testing.assert_allclose(tr.select(m, 5.0, x).numpy(), [10, 5, 5])
    np.testing.assert_allclose(tr.select(m, x, -1.0).numpy(), [-1, 20, 30])
    # both operands Python scalars: dtype from the scalar types
    r = tr.select(m, 2.5, 7.0)
    assert r.dtype == np.float32
    np.testing.assert_allclose(r.numpy(), [7.0, 2.5, 2.5])
    ri = tr.select(m, 1, 0)
    assert ri.dtype == np.int32
    np.testing.assert_array_equal(ri.numpy(), [0, 1, 1])


def test_fmod_vs_mod_sign_semantics():
    # lazy fmod = C fmod (sign of dividend); % = python floored mod --
    # matching the eager ops layer (reference tests/float.cpp:285)
    a = LazyArray(np.array([-5.0, 5.0, -5.0], np.float32))
    b = LazyArray(np.array([3.0, -3.0, -3.0], np.float32))
    np.testing.assert_allclose(tr.fmod(a, b).numpy(),
                               np.fmod([-5, 5, -5], [3, -3, -3]))
    np.testing.assert_allclose((a % b).numpy(),
                               np.mod([-5.0, 5, -5], [3, -3, -3]))


def test_literals_64bit_bit_exact():
    # ADVICE r1: int64/uint64 literals >= 2^32 and f64 literals must not
    # be squeezed through 32-bit carriers
    import jax
    if not jax.config.jax_enable_x64:
        # u64 constant folded through a u32-dtype path would truncate;
        # check the 32-bit dtypes stay exact and skip the 64-bit dtypes
        x = LazyArray(np.array([1, 2, 3], np.uint32))
        y = x * 0x9E3779B9
        np.testing.assert_array_equal(
            y.numpy(), (np.arange(1, 4, dtype=np.uint64) * 0x9E3779B9)
            .astype(np.uint32))
        pytest.skip("64-bit dtypes need jax_enable_x64")
    big = 0x0123456789ABCDEF
    x = LazyArray(np.array([0, 1], np.uint64))
    y = x + big
    np.testing.assert_array_equal(y.numpy(),
                                  np.array([big, big + 1], np.uint64))
    f = LazyArray(np.array([0.0], np.float64))
    g = f + (1.0 + 2.0 ** -40)
    np.testing.assert_array_equal(g.numpy(),
                                  np.array([1.0 + 2.0 ** -40], np.float64))


def test_gradient_off_tape_raises():
    # the classic evaluate-before-mark mis-ordering: the program ran
    # before anything was marked, so nothing was recorded. A silent zero
    # here is indistinguishable from a genuine zero gradient; the
    # reference errors on off-tape gradient reads (autodiff.h:1410).
    x = LazyArray(np.array([1.0, 2.0], np.float32))
    loss = (x * x).hsum()
    loss.eval()  # evaluated with NO differentiable frontier
    tr.requires_grad(x)  # marked too late
    with pytest.raises(RuntimeError, match="never recorded"):
        tr.gradient(loss)
    # a marked leaf that simply received no cotangent still reads zeros
    np.testing.assert_allclose(tr.gradient(x).numpy(), [0.0, 0.0])


def test_tape_whos_and_graphviz():
    # segment-tape introspection (the reference's tape graphviz/whos,
    # autodiff.cpp:1076-1163, :1165): labels flow into both views and
    # '/'-prefixed labels cluster into subgraphs
    r = tr.requires_grad(
        LazyArray(np.array([1.0], np.float32)).label("scene/radius"))
    x = LazyArray(np.linspace(0, 1, 8).astype(np.float32)).label("px")
    img = tr.maximum(x * r - 0.5, 0.0).label("image")
    loss = (img * img).hsum()
    loss.eval()
    w = tr.tape_whos()
    assert "scene/radius" in w and "image" in w and "segments: 1" in w
    dot = tr.tape_graphviz()
    assert dot.startswith("digraph tape")
    assert "cluster_scene" in dot and "segment 0" in dot and "px" in dot
    tr.backward(loss)  # frees the tape
    assert "segments: 0" in tr.tape_whos()


def test_segmented_schedule_matches_fused():
    # config.max_fused_ops: chained sub-programs must be value-identical
    # to the single fused program (first-eval cliff mitigation; see
    # docs/benchmarks.md "First-eval cliff")
    from enoki_tpu.config import config

    def build(data):
        x = LazyArray(data)
        y = x
        for i in range(60):
            y = tr.sqrt(y * y + (1.0 + 1e-3 * (i % 5)))
        # mix in gather/scatter/reduction so chunk boundaries cross
        # non-elementwise ops too
        idx = LazyArray(np.arange(len(data) - 1, -1, -1, dtype=np.int32))
        g = y.gather(idx)
        t = LazyArray(np.zeros(len(data), np.float32))
        t.scatter_add(idx, g)
        return (t * y).hsum()

    data = np.linspace(0.5, 1.5, 64).astype(np.float32)
    whole = build(data).numpy()
    tr.reset()
    config.max_fused_ops = 32
    try:
        seg = build(data).numpy()
    finally:
        config.max_fused_ops = 0
    np.testing.assert_allclose(seg, whole, rtol=1e-6)


def test_c_operator_path_no_leaks():
    # 200k results built by the C fast path (pymod.cpp binop/unop):
    # native vars and Python refcounts must come back to baseline
    # (+ the retained shared literals)
    import gc
    import sys

    x = LazyArray(np.ones(8, np.float32))
    base = tr.stats()["n_vars"]
    z = w = None
    for _ in range(200000):
        z = x * x + 1.0
        w = tr.sqrt(z) > 0.5
    del z, w
    gc.collect()
    assert tr.stats()["n_vars"] <= base + 4  # shared literal handles only
    z = x * x
    assert sys.getrefcount(z) == 2  # no hidden reference kept by C code
    assert isinstance(z.index, int) and isinstance(z._size, int)


def test_trace_export_cache_roundtrip(tmp_path):
    # config.trace_export_dir: first miss exports the compiled program;
    # a later process (simulated by clearing the in-process caches)
    # loads the jax.export artifact instead of re-tracing
    from enoki_tpu.config import config

    def prog(data):
        x = LazyArray(data)
        y = x
        for i in range(20):
            y = tr.sqrt(y * y + (1.0 + 0.1 * (i % 3)))
        return y

    config.trace_export_dir = str(tmp_path)
    try:
        a = prog(np.linspace(0.5, 1.5, 32).astype(np.float32)).numpy()
        files = list(tmp_path.glob("*.jaxexp"))
        assert len(files) == 1  # exported on the first miss
        # "new process": drop the executable cache, keep the disk artifact
        tr.clear_cache()
        b = prog(np.linspace(0.5, 1.5, 32).astype(np.float32) + 1.0)
        got = b.numpy()
        ref = np.linspace(0.5, 1.5, 32).astype(np.float32) + 1.0
        for i in range(20):
            ref = np.sqrt(ref * ref + (1.0 + 0.1 * (i % 3)))
        np.testing.assert_allclose(got, ref, rtol=1e-5)
        np.testing.assert_allclose(
            a, np.asarray(prog(np.linspace(0.5, 1.5, 32)
                               .astype(np.float32)).numpy()), rtol=1e-6)
    finally:
        config.trace_export_dir = ""


def test_trace_export_cache_corrupt_artifact_recovers(tmp_path):
    # regression (r3 review): a corrupt artifact is deleted and
    # re-exported instead of permanently disabling the cache entry
    from enoki_tpu.config import config

    def prog(data):
        x = LazyArray(data)
        return (tr.sqrt(x * x + 1.0) * 2.0)

    config.trace_export_dir = str(tmp_path)
    try:
        prog(np.ones(8, np.float32)).numpy()
        files = list(tmp_path.glob("*.jaxexp"))
        assert len(files) == 1
        files[0].write_bytes(b"garbage")
        tr.clear_cache()
        out = prog(np.full(8, 2.0, np.float32)).numpy()
        np.testing.assert_allclose(out, np.sqrt(5.0) * 2.0, rtol=1e-6)
        # the bad artifact was removed; the next miss re-exports
        tr.clear_cache()
        prog(np.ones(8, np.float32)).numpy()
        assert len(list(tmp_path.glob("*.jaxexp"))) == 1
        data = list(tmp_path.glob("*.jaxexp"))[0].read_bytes()
        assert data != b"garbage"
    finally:
        config.trace_export_dir = ""


def test_trace_export_cache_respects_segmentation(tmp_path):
    # regression (r3 review): with max_fused_ops configured, the export
    # cache must not override segmentation with a monolithic program
    from enoki_tpu.config import config

    config.trace_export_dir = str(tmp_path)
    config.max_fused_ops = 8
    try:
        x = LazyArray(np.ones(16, np.float32))
        y = x
        for _ in range(20):
            y = tr.sqrt(y * y + 1.0)
        y.numpy()
        assert list(tmp_path.glob("*.jaxexp")) == []  # nothing exported
    finally:
        config.max_fused_ops = 0
        config.trace_export_dir = ""


def test_export_cache_covers_segment_vjp(tmp_path):
    # the AD-segment VJP executables export too: a "new process"
    # (cleared caches) replays backward from the artifacts and produces
    # identical gradients
    from enoki_tpu.config import config

    def step(data):
        x = tr.requires_grad(LazyArray(data))
        loss = (tr.tanh(x * 2.0) * x).hsum()
        tr.backward(loss)
        return tr.gradient(x).numpy()

    config.trace_export_dir = str(tmp_path)
    try:
        g1 = step(np.array([0.3, -0.7], np.float32))
        names = sorted(p.name for p in tmp_path.glob("*.jaxexp"))
        assert any("-bwd-" in n for n in names), names  # VJP exported
        tr.clear_cache()  # "new process"
        g2 = step(np.array([0.3, -0.7], np.float32))
        np.testing.assert_allclose(g2, g1, rtol=1e-6)
        # no NEW artifacts: the second run loaded everything
        assert sorted(p.name for p in tmp_path.glob("*.jaxexp")) == names
    finally:
        config.trace_export_dir = ""


# ---------------------------------------------------------------------------
# in-trace printf (round 4; cuda_printf analog, array_router.h:972)
# ---------------------------------------------------------------------------


def test_printf_fires_inside_fused_program(capfd):
    tr.reset()
    x = LazyArray(np.arange(4, dtype=np.float32))
    y = tr.printf("mid={}", x * 2.0) + 1.0
    before = tr.stats()["n_evals"]
    np.testing.assert_allclose(y.numpy(), [1, 3, 5, 7])
    assert tr.stats()["n_evals"] == before + 1  # print did not break fusion
    out = capfd.readouterr()
    assert "mid=" in out.out or "mid=" in out.err


def test_printf_unused_is_a_side_effect(capfd):
    tr.reset()
    x = LazyArray(np.ones(3, np.float32))
    tr.printf("side effect {}", x)  # handle dropped
    z = LazyArray(np.zeros(3, np.float32)) + 1.0
    z.eval()
    out = capfd.readouterr()
    assert "side effect" in out.out or "side effect" in out.err


def test_printf_format_is_part_of_the_cache_key(capfd):
    tr.reset()
    x = LazyArray(np.ones(3, np.float32))
    tr.printf("fmt-one {}", x + 1.0).eval()
    y = LazyArray(np.ones(3, np.float32))
    tr.printf("fmt-two {}", y + 1.0).eval()  # same structure, new fmt
    out = capfd.readouterr()
    text = out.out + out.err
    assert "fmt-one" in text and "fmt-two" in text


def test_printf_multi_operand_and_passthrough_grad(capfd):
    tr.reset()
    x = LazyArray(np.asarray([2.0, 3.0], np.float32))
    tr.requires_grad(x, True)
    y = tr.printf("x={} sq={}", x, x * x)
    loss = (y * y).hsum()
    tr.backward(loss)
    np.testing.assert_allclose(np.asarray(tr.gradient(x)), [4.0, 6.0])
    out = capfd.readouterr()
    assert "sq=" in out.out + out.err


def test_printf_entry_consumed_after_eval(capfd):
    # a fired print's format entry is dropped: later evals must go back
    # to the plain int cache key / no upfront schedule read (one debug
    # print must not tax the rest of the process)
    tr.reset()
    x = LazyArray(np.ones(3, np.float32))
    tr.printf("once {}", x + 1.0).eval()
    capfd.readouterr()
    assert not tr._PRINT_FMT, tr._PRINT_FMT
    z = (LazyArray(np.ones(3, np.float32)) * 3.0).numpy()
    np.testing.assert_allclose(z, 3.0)
    out = capfd.readouterr()
    assert "once" not in out.out + out.err  # fired print does not re-fire


def test_printf_validation():
    tr.reset()
    x = LazyArray(np.ones(2, np.float32))
    with pytest.raises(ValueError):
        tr.printf("no operands")
    with pytest.raises(TypeError):
        tr.printf("scalar {}", 3.0)
    with pytest.raises(TypeError):
        tr.printf(123, x)


def test_scalar_literal_cache_cap_reclaims_refs():
    # C fast path: past kLitCacheCap (2^14) distinct scalars of one
    # dtype, the cache resets and releases its refs -- the old overflow
    # path leaked one ownerless trace variable per distinct scalar
    tr.reset()
    x = LazyArray(np.ones(8, np.float32))
    base = tr.stats()["n_vars"]
    cap = 1 << 14
    n = cap + cap // 2  # forces exactly one reset
    for k in range(n):
        _ = x + float(k + 1)  # distinct scalar; result handle dropped
    live = tr.stats()["n_vars"] - base
    # cache may legitimately retain up to cap entries; the leak was ~n
    assert live <= cap, live
    tr.reset()


def test_scatter_into_lazy_target_survives_unrelated_eval():
    # r4 review: the eval output order is [explicit roots, side-effect
    # roots, extra ext-ref'd vars]; an unevaluated computed var that is
    # a scatter target had its rebound (post-scatter) buffer clobbered
    # by its own pre-scatter slot when eval was triggered WITHOUT
    # naming it. The rebind must win (program-order-final state).
    tr.reset()
    x = LazyArray(np.ones(4, np.float32))
    y = x * 2.0  # lazy computed target, no readers
    y.scatter(LazyArray(np.array([0], np.int32)),
              LazyArray(np.array([99.0], np.float32)))
    (x + 1.0).eval()  # eval that does not name y
    np.testing.assert_allclose(y.numpy(), [99.0, 2.0, 2.0, 2.0])


def test_deep_chain_free_is_iterative():
    # r4 review: dropping the head handle of a 10^5+-op unevaluated
    # chain recursed free_var/dec_ref_int one C frame per op -> segfault
    tr.reset()
    x = LazyArray(np.ones(8, np.float32))
    y = x
    for _ in range(300_000):
        y = y + 1.0
    n_before = tr.stats()["n_vars"]
    assert n_before > 300_000
    del y  # frees the whole chain; must not blow the C stack
    assert tr.stats()["n_vars"] < 16
    tr.reset()


def test_printf_in_chunked_program(capfd):
    # r4 review: the chunked (max_fused_ops) interpreter had no PRINT
    # branch -> KeyError when a debug print met a segmented program
    from enoki_tpu.config import config
    tr.reset()
    old = config.max_fused_ops
    config.max_fused_ops = 64
    try:
        x = LazyArray(np.ones(4, np.float32))
        for k in range(200):
            x = x + 1.0
        out = tr.printf("chunked x0={}", x)
        for k in range(200):
            out = out * 1.0
        np.testing.assert_allclose(out.numpy(), 201.0)
    finally:
        config.max_fused_ops = old
    cap = capfd.readouterr()
    assert "chunked x0=" in cap.out + cap.err


def test_clear_gradients_keeps_scatter_versions():
    # r4 review: clear_gradients pruned _ON_TAPE by native existence,
    # but an evaluated scatter's op var is always freed at eval end
    # while _VERSION still routes the target's gradient through it
    tr.reset()
    xs = tr.requires_grad(LazyArray(np.ones(4, np.float32)))
    tgt = LazyArray(np.zeros(4, np.float32))
    tgt.numpy()
    tgt.scatter_add(LazyArray(np.arange(4, dtype=np.int32)), xs * 2.0)
    loss = tgt.hsum()
    tr.backward(loss)
    np.testing.assert_allclose(tr.gradient(xs).numpy(), 2.0)
    tr.clear_gradients()
    # must still be recognized as on-tape: zeros, NOT the off-tape error
    np.testing.assert_allclose(tr.gradient(tgt).numpy(), 0.0)


def test_printf_flushes_dirty_operand(capfd):
    # r4 review: printf's raw append bypassed the read-after-scatter
    # protocol and could print pre-scatter values
    tr.reset()
    x = LazyArray(np.zeros(3, np.float32))
    x.numpy()
    x.scatter(LazyArray(np.array([1], np.int32)),
              LazyArray(np.array([7.0], np.float32)))
    tr.printf("dirty x={}", x).eval()
    cap = capfd.readouterr()
    assert "7" in cap.out + cap.err


def test_lazy_fmadd_promotes_mixed_dtypes():
    # r4 review: arity-3 ops declared x's dtype while the jnp impl
    # (a*b+c) promotes -- the handle lied about the buffer's dtype
    tr.reset()
    x = LazyArray(np.array([1, 2, 3], np.int32))
    y = LazyArray(np.array([0.5, 0.5, 0.5], np.float32))
    z = LazyArray(np.array([1.0, 1.0, 1.0], np.float32))
    import jax.numpy as jnp
    r = tr.fmadd(x, y, z)
    assert r.dtype == jnp.float32
    np.testing.assert_allclose(r.numpy(), [1.5, 2.0, 2.5])
