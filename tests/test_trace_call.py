"""Vectorized method calls on the lazy trace.

LazyArray port of the reference's vcall test (tests/call.cpp): dispatch
with per-instance methods, getters with null-pointer semantics, multi-
result methods, plus the lazy-specific contracts -- partition caching on
the array (cuda.h:815-842), one fused program per dispatch structure,
structural-hash cache hits on retrace, and gradients through the
recorded gather/scatter (which the reference needs Special tape edges
for, autodiff.cpp:355-608).
"""

import numpy as np
import pytest

import enoki_tpu.trace as tr
import enoki_tpu.trace.call as tc
from enoki_tpu.struct.call import InstanceRegistry
from enoki_tpu.trace import LazyArray


@pytest.fixture(autouse=True)
def _fresh():
    tr.reset()
    yield
    tr.reset()


class Thing:
    """tests/call.cpp Test class analog: func1 adds `value` lanewise."""

    def __init__(self, value):
        self.value = value

    def func1(self, mask, i):
        return i + float(self.value)

    def func4(self, mask):
        # multi-result method (std::pair, tests/call.cpp:53)
        n = len(mask)
        return (LazyArray.full(float(self.value), n),
                LazyArray.full(float(self.value + 1), n))


def _ids(lst):
    return LazyArray(np.array(lst, np.int32))


def test_partition_matches_cuda_partition():
    ids = _ids([2, 0, 2, 1, 0, 2])
    parts = tc.partition(ids)
    got = {inst: sorted(np.asarray(perm).tolist()) for inst, perm in parts}
    assert got == {0: [1, 4], 1: [3], 2: [0, 2, 5]}
    # the concatenation is the stable sort permutation (horiz.cu:35-123)
    concat = np.concatenate([np.asarray(p) for _, p in parts])
    np.testing.assert_array_equal(concat, np.argsort(
        np.array([2, 0, 2, 1, 0, 2]), kind="stable"))


def test_partition_cached_on_array():
    ids = _ids([0, 1, 0, 1])
    p1 = tc.partition(ids)
    p2 = tc.partition(ids)
    assert p1 is p2  # cached like cuda.h:815-842
    # a scatter dirties the array and invalidates the cache
    ids.scatter(LazyArray(np.array([0, 2], np.int32)),
                LazyArray(np.array([1, 1], np.int32)))
    p3 = tc.partition(ids)  # ids is now [1, 1, 1, 1]
    assert p3 is not p1
    assert {i for i, _ in p3} == {1}


def test_dispatch_basic_call_cpp_port():
    # tests/call.cpp test01: pointers->func1(arange) == arange + value
    a, b = Thing(10), Thing(20)
    ids = _ids([0, 0, 1, 0])
    idx = LazyArray.arange(4).cast(np.float32)
    out = tc.dispatch([a.func1, b.func1], ids, idx)
    np.testing.assert_allclose(out.numpy(), [0 + 10, 1 + 10, 2 + 20, 3 + 10])


def test_dispatch_is_one_fused_program():
    a, b, c = Thing(1), Thing(2), Thing(3)
    ids = _ids([0, 1, 2, 1, 0, 2, 2, 1])
    x = LazyArray(np.arange(8, dtype=np.float32))
    out = tc.dispatch([a.func1, b.func1, c.func1], ids, x)
    evals_before = tr.stats()["n_evals"]
    got = out.numpy()
    # one eval fuses gather + all three callees + scatters
    assert tr.stats()["n_evals"] == evals_before + 1
    want = np.arange(8.0) + np.array([1, 2, 3, 2, 1, 3, 3, 2])
    np.testing.assert_allclose(got, want)


def test_dispatch_retrace_hits_cache():
    a, b = Thing(5), Thing(7)

    def step(data):
        ids = _ids([0, 1, 1, 0])
        x = LazyArray(data)
        return tc.dispatch([a.func1, b.func1], ids, x).numpy()

    step(np.zeros(4, np.float32))
    h0, m0 = tr.cache_stats()
    got = step(np.ones(4, np.float32))
    h1, m1 = tr.cache_stats()
    # same dispatch structure, fresh data: structural-hash cache hit
    # (the reference re-traces PTX and hits its kernel cache the same way)
    assert m1 == m0 and h1 > h0
    np.testing.assert_allclose(got, [6, 8, 8, 6])


def test_dispatch_single_instance_fast_path():
    a = Thing(100)
    ids = _ids([0, 0, 0])
    x = LazyArray(np.array([1.0, 2.0, 3.0], np.float32))
    before = tr.stats()["n_appends"]
    out = tc.dispatch([a.func1], ids, x)
    # no gather/scatter recorded: the callee ran on the raw args
    # (array_call.h:150-151 skips the permutation for one instance)
    appended = tr.stats()["n_appends"] - before
    assert appended <= 3
    np.testing.assert_allclose(out.numpy(), [101, 102, 103])


def test_dispatch_null_ids_produce_zeros():
    a, b = Thing(10), Thing(20)
    ids = _ids([0, -1, 1, -1])
    x = LazyArray(np.ones(4, np.float32))
    out = tc.dispatch([a.func1, b.func1], ids, x)
    np.testing.assert_allclose(out.numpy(), [11, 0, 21, 0])


def test_dispatch_all_null_keeps_result_structure():
    # r3 review: the all-null case used to return a single f32 zeros
    # array "by convention", silently changing the result STRUCTURE
    # depending on runtime data. It must match funcs[0]'s structure
    # (derived by probing under an all-false mask -- the reference's
    # static return type decides this at compile time).
    a, b = Thing(10), Thing(20)
    ids = _ids([-1, -1, -1])
    first, second = tc.dispatch([a.func4, b.func4], ids)
    np.testing.assert_allclose(first.numpy(), [0, 0, 0])
    np.testing.assert_allclose(second.numpy(), [0, 0, 0])

    # struct-result callee: pytree structure also survives all-null
    def struct_callee(mask, x):
        return {"y": x * 2.0, "z": (x + 1.0, x.cast(np.int32))}

    x = LazyArray(np.array([1.0, 2.0, 3.0], np.float32))
    out = tc.dispatch([struct_callee], _ids([-1, -1, -1]), x)
    assert set(out.keys()) == {"y", "z"}
    np.testing.assert_allclose(out["y"].numpy(), [0, 0, 0])
    assert out["z"][1].dtype == np.int32
    np.testing.assert_allclose(out["z"][0].numpy(), [0, 0, 0])


def test_dispatch_multi_results():
    a, b = Thing(10), Thing(20)
    ids = _ids([1, 0, 1])
    first, second = tc.dispatch([a.func4, b.func4], ids)
    np.testing.assert_allclose(first.numpy(), [20, 10, 20])
    np.testing.assert_allclose(second.numpy(), [21, 11, 21])


def test_registry_dispatch_and_getter():
    reg = InstanceRegistry()
    reg.register(Thing(10))
    reg.register(Thing(20))
    ids = _ids([0, 1, -1, 0])
    x = LazyArray(np.zeros(4, np.float32))
    out = reg.dispatch("func1", ids, x)
    np.testing.assert_allclose(out.numpy(), [10, 20, 0, 10])
    vals = reg.getter("value", ids)
    np.testing.assert_allclose(vals.numpy(), [10, 20, 0, 10])


def test_gradient_through_dispatch():
    # d out / d x through partition -> gather -> callee -> scatter: the
    # reference needs Special gather/scatter tape edges for this
    # (autodiff.cpp:355-608); here the trace AD handles it end to end
    class Scaler:
        def __init__(self, k):
            self.k = k

        def apply(self, mask, x):
            return x * self.k

    x = tr.requires_grad(LazyArray(np.array([1., 2., 3., 4.], np.float32)))
    ids = _ids([0, 1, 1, 0])
    out = tc.dispatch([Scaler(2.0).apply, Scaler(5.0).apply], ids, x)
    loss = (out * out).hsum()
    tr.backward(loss)
    # d/dx (k x)^2 = 2 k^2 x
    want = 2 * np.array([4, 25, 25, 4]) * np.array([1, 2, 3, 4])
    np.testing.assert_allclose(tr.gradient(x).numpy(), want)


def test_scatter_chain_fuses():
    # consecutive scatters into one target stay a single program (the
    # chain protocol); values land correctly and in order
    tgt = LazyArray(np.zeros(6, np.float32))
    tgt.scatter(LazyArray(np.array([0, 1], np.int32)),
                LazyArray(np.array([1.0, 2.0], np.float32)))
    tgt.scatter(LazyArray(np.array([1, 2], np.int32)),
                LazyArray(np.array([30.0, 40.0], np.float32)))
    tgt.scatter_add(LazyArray(np.array([0], np.int32)),
                    LazyArray(np.array([0.5], np.float32)))
    evals_before = tr.stats()["n_evals"]
    got = tgt.numpy()
    assert tr.stats()["n_evals"] == evals_before + 1
    np.testing.assert_allclose(got, [1.5, 30, 40, 0, 0, 0])


def test_partition_invalidated_at_scatter_not_dirty_flag():
    # review r2: an eval between the scatter and the next partition()
    # clears the dirty flag; the cache must be invalidated AT the scatter
    ids = _ids([0, 0, 1, 1])
    p1 = tc.partition(ids)
    ids.scatter(LazyArray(np.array([0, 1, 2, 3], np.int32)),
                LazyArray(np.array([1, 1, 1, 1], np.int32)))
    tr.eval()  # flushes the scatter, CLEARS the dirty flag
    p2 = tc.partition(ids)
    assert p2 is not p1
    assert {i for i, _ in p2} == {1}


def test_held_scatter_handle_gradient_not_doubled():
    # review r2: a scatter op that is BOTH explicitly evaluated (held
    # handle, eval-all-live) and a pending side effect must appear as
    # ONE output slot, or its cotangent doubles
    x = tr.requires_grad(LazyArray(np.array([1.0, 2.0], np.float32)))
    tgt = LazyArray(np.zeros(2, np.float32))
    op = tgt._scatter_op(tr.Op.SCATTER_ADD,
                         LazyArray(np.array([0, 1], np.int32)), x * 3.0)
    tr.eval()  # op is live (held) AND a side effect
    loss = (tgt * tgt).hsum()
    tr.backward(loss)
    # d/dx sum((3x)^2) = 18 x -- doubling would give 36 x
    np.testing.assert_allclose(tr.gradient(x).numpy(), 18.0 * np.array([1.0, 2.0]))
    del op


def test_dispatch_dtype_disagreement_raises():
    def f_int(mask, x):
        return x.cast(np.int32)

    def f_float(mask, x):
        return x * 0.5

    ids = _ids([0, 1])
    x = LazyArray(np.array([1.0, 2.0], np.float32))
    with pytest.raises(ValueError, match="dtype"):
        tc.dispatch([f_int, f_float], ids, x)


def test_partition_cache_lru_keeps_hot_entry():
    # a hot array's partition must survive 256 cold one-shot partitions
    # (recency-ordered eviction; the reference caches on the array itself
    # and frees with it, cuda.h:815-842)
    hot = _ids([0, 1, 0, 1])
    p0 = tc.partition(hot)
    for k in range(256):
        cold = _ids([k % 3, 1])
        tc.partition(cold)
        tc.partition(hot)  # touch: refresh recency
    assert tc._PARTITION_CACHE.get(hot.index) is not None
    assert tc.partition(hot) is p0  # same cached object, never rebuilt


def test_dispatch_all_null_probe_has_no_side_effects(capfd):
    # r4 review: the all-null structure probe used to RUN funcs[0]'s
    # side effects -- a printf fired at the next eval and a scatter into
    # a captured array registered as pending. The probe must be
    # invisible (the reference decides structure statically).
    tr.reset()
    target = LazyArray(np.zeros(4, np.float32))
    target.numpy()  # materialize

    def noisy(mask, x):
        y = tr.printf("probe leaked {}", x)
        # materialize MID-probe: if the probe had appended a PRINT op,
        # this eval would fire it (with the '{}' fallback format)
        float(y.hsum().numpy())
        target.scatter(x.cast(np.int32) * 0, x)
        return x * 2.0

    x = LazyArray(np.array([1.0, 2.0, 3.0], np.float32))
    out = tc.dispatch([noisy], _ids([-1, -1, -1]), x)
    np.testing.assert_allclose(out.numpy(), [0, 0, 0])
    assert not tr._PRINT_FMT            # no pending print registered
    assert tr._lib.et_num_side_effects() == 0
    # forcing a later eval fires nothing and the target is untouched
    y = (LazyArray(np.ones(3, np.float32)) + 1.0).numpy()
    np.testing.assert_allclose(y, 2.0)
    np.testing.assert_allclose(target.numpy(), 0.0)
    cap = capfd.readouterr()
    assert "probe leaked" not in cap.out + cap.err
