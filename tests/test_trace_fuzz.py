"""Differential fuzzing of the lazy trace runtime.

Random op DAGs are built twice from one recipe -- once over LazyArray
(exercising the C operator dispatch, literal sharing, promotion,
scheduling, structural hashing) and once over plain numpy in f64 -- and
must agree. Each seed also re-traces its program with fresh data to
exercise the executable-cache hit path, and a scatter/gather round
mixes side effects in. This is the trace-runtime analog of the
reference harness's randomized validate sweeps.
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


# (name, arity, lazy fn, numpy reference) -- domain-safe op set
OPS = [
    ("add", 2, lambda a, b: a + b, lambda a, b: a + b),
    ("sub", 2, lambda a, b: a - b, lambda a, b: a - b),
    ("mul", 2, lambda a, b: a * b, lambda a, b: a * b),
    ("min", 2, tr.minimum, np.minimum),
    ("max", 2, tr.maximum, np.maximum),
    ("fma", 3, tr.fmadd, lambda a, b, c: a * b + c),
    ("neg", 1, lambda a: -a, lambda a: -a),
    ("abs", 1, abs, np.abs),
    ("sqrt|x|", 1, lambda a: tr.sqrt(abs(a) + 0.25),
     lambda a: np.sqrt(np.abs(a) + 0.25)),
    ("tanh", 1, tr.tanh, np.tanh),
    ("sin", 1, tr.sin, np.sin),
    ("exp/8", 1, lambda a: tr.exp(a * 0.125), lambda a: np.exp(a * 0.125)),
    ("sel", 2, lambda a, b: tr.select(a > b, a, b * 0.5),
     lambda a, b: np.where(a > b, a, b * 0.5)),
    ("scal", 1, lambda a: a * 1.5 + 0.25, lambda a: a * 1.5 + 0.25),
]


def _build(recipe, leaves_np, lazy):
    """Replay a recipe (list of (op_idx, operand_slots)) over a value
    pool seeded with the leaves."""
    pool = ([LazyArray(l.astype(np.float32)) for l in leaves_np]
            if lazy else [l.copy() for l in leaves_np])
    for op_idx, slots in recipe:
        name, arity, f_lazy, f_np = OPS[op_idx]
        args = [pool[s] for s in slots]
        pool.append(f_lazy(*args) if lazy else f_np(*args))
    return pool[-1]


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_random_dag(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 65))
    n_leaves = int(rng.integers(2, 5))
    leaves = [rng.uniform(-2, 2, n) for _ in range(n_leaves)]
    depth = int(rng.integers(5, 40))
    recipe = []
    pool_size = n_leaves
    for _ in range(depth):
        op_idx = int(rng.integers(len(OPS)))
        arity = OPS[op_idx][1]
        slots = tuple(int(rng.integers(pool_size)) for _ in range(arity))
        recipe.append((op_idx, slots))
        pool_size += 1

    lazy_out = _build(recipe, leaves, lazy=True)
    want = _build(recipe, leaves, lazy=False)
    got = lazy_out.numpy().astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

    # retrace with fresh data: structural cache hit, same agreement
    h0, m0 = tr.cache_stats()
    leaves2 = [rng.uniform(-2, 2, n) for _ in range(n_leaves)]
    lazy2 = _build(recipe, leaves2, lazy=True)
    got2 = lazy2.numpy().astype(np.float64)
    h1, m1 = tr.cache_stats()
    assert m1 == m0, "retrace of an identical structure recompiled"
    assert h1 == h0 + 1
    np.testing.assert_allclose(got2, _build(recipe, leaves2, lazy=False),
                               rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_scatter_gather_rounds(seed):
    # interleave computed values with gather/scatter_add side effects;
    # the dirty protocol must keep lazy == numpy
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(8, 33))
    base_np = rng.uniform(-1, 1, n).astype(np.float32)
    src_np = rng.uniform(-1, 1, n).astype(np.float32)

    base_l = LazyArray(base_np.copy())
    src_l = LazyArray(src_np.copy())
    ref = base_np.astype(np.float64).copy()
    src_ref = src_np.astype(np.float64)

    for _ in range(int(rng.integers(2, 6))):
        k = int(rng.integers(1, n))
        idx = rng.integers(0, n, k).astype(np.int32)
        idx_l = LazyArray(idx)
        choice = rng.integers(4)
        if choice == 0:
            vals = src_l.gather(idx_l) * 0.5
            base_l.scatter_add(idx_l, vals)
            np.add.at(ref, idx, src_ref[idx] * 0.5)
        elif choice == 1:
            # read-after-scatter: the op below forces the pending flush
            s = base_l.hsum()
            src_l = src_l + s
            src_ref = src_ref + ref.sum()
        elif choice == 2:
            uniq = np.unique(idx)  # scatter (overwrite): unique indices
            #                         so lazy/np winner ambiguity vanishes
            base_l.scatter(LazyArray(uniq.astype(np.int32)),
                           LazyArray(np.full(len(uniq), 0.25, np.float32)))
            ref[uniq] = 0.25
        else:
            # held-read-before-scatter: the write-after-pending-read
            # hazard guard must keep g at the PRE-scatter values
            g = base_l.gather(idx_l)
            base_l.scatter_add(idx_l,
                               LazyArray(np.full(k, 0.125, np.float32)))
            src_l = src_l + g.hsum()
            src_ref = src_ref + ref[idx].sum()
            np.add.at(ref, idx, 0.125)

    np.testing.assert_allclose(base_l.numpy().astype(np.float64), ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(src_l.numpy().astype(np.float64), src_ref,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_backward_matches_jax_grad(seed):
    # the same random recipes through the segment tape: backward() of
    # hsum(out) must match jax.grad of the eagerly-replayed recipe
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(500 + seed)
    n = int(rng.integers(4, 33))
    n_leaves = int(rng.integers(2, 4))
    leaves = [rng.uniform(-1.5, 1.5, n).astype(np.float32)
              for _ in range(n_leaves)]
    depth = int(rng.integers(4, 25))
    recipe = []
    pool_size = n_leaves
    for _ in range(depth):
        op_idx = int(rng.integers(len(OPS)))
        arity = OPS[op_idx][1]
        slots = tuple(int(rng.integers(pool_size)) for _ in range(arity))
        recipe.append((op_idx, slots))
        pool_size += 1

    # lazy: trace AD
    lazy_leaves = [tr.requires_grad(LazyArray(l)) for l in leaves]
    pool = list(lazy_leaves)
    for op_idx, slots in recipe:
        pool.append(OPS[op_idx][2](*[pool[s] for s in slots]))
    loss = pool[-1].hsum()
    tr.backward(loss)
    got = [tr.gradient(l).numpy().astype(np.float64)
           for l in lazy_leaves]

    # reference: jax.grad over the eager replay (jnp ops mirror the
    # trace opcodes' lowerings exactly)
    def f(ls):
        pool = list(ls)
        for op_idx, slots in recipe:
            name = OPS[op_idx][0]
            args = [pool[s] for s in slots]
            if name == "min":
                v = jnp.minimum(*args)
            elif name == "max":
                v = jnp.maximum(*args)
            elif name == "fma":
                v = args[0] * args[1] + args[2]
            elif name == "sqrt|x|":
                v = jnp.sqrt(jnp.abs(args[0]) + 0.25)
            elif name == "tanh":
                v = jnp.tanh(args[0])
            elif name == "sin":
                v = jnp.sin(args[0])
            elif name == "exp/8":
                v = jnp.exp(args[0] * 0.125)
            elif name == "sel":
                v = jnp.where(args[0] > args[1], args[0], args[1] * 0.5)
            elif name == "scal":
                v = args[0] * 1.5 + 0.25
            elif name == "neg":
                v = -args[0]
            elif name == "abs":
                v = jnp.abs(args[0])
            elif name == "add":
                v = args[0] + args[1]
            elif name == "sub":
                v = args[0] - args[1]
            elif name == "mul":
                v = args[0] * args[1]
            else:
                raise AssertionError(name)
            pool.append(v)
        return jnp.sum(pool[-1])

    want = jax.grad(f)([jnp.asarray(l) for l in leaves])
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w, np.float64),
                                   rtol=5e-4, atol=1e-5)


def test_promotion_matrix_matches_jnp():
    # the C promote table (pymod.cpp set_class wiring) must agree with
    # jnp.promote_types for every 32/16-bit dtype pair, and the computed
    # VALUES must match the eager op
    import jax.numpy as jnp

    dtypes = [np.float32, jnp.bfloat16, np.float16, np.int32, np.uint32,
              np.bool_]
    for da in dtypes:
        for db in dtypes:
            a_np = np.array([0, 1, 2, 3]).astype(da)
            b_np = np.array([1, 1, 2, 2]).astype(db)
            ea = jnp.asarray(a_np) + jnp.asarray(b_np)
            la = LazyArray(a_np) + LazyArray(b_np)
            assert la.dtype == ea.dtype, (da, db, la.dtype, ea.dtype)
            np.testing.assert_array_equal(
                np.asarray(la.numpy(), np.float64),
                np.asarray(ea, np.float64), err_msg=f"{da} {db}")


def test_fuzz_random_dag_f64():
    # a few DAG seeds in double precision (x64 promotion rows of the C
    # dispatch table + f64 lowerings)
    import jax

    with jax.enable_x64():
        for seed in (301, 302, 303):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(4, 33))
            leaves = [rng.uniform(-2, 2, n) for _ in range(3)]
            recipe = []
            pool_size = 3
            for _ in range(15):
                op_idx = int(rng.integers(len(OPS)))
                arity = OPS[op_idx][1]
                slots = tuple(int(rng.integers(pool_size))
                              for _ in range(arity))
                recipe.append((op_idx, slots))
                pool_size += 1
            pool = [LazyArray(l) for l in leaves]  # f64 leaves
            for op_idx, slots in recipe:
                pool.append(OPS[op_idx][2](*[pool[s] for s in slots]))
            assert pool[-1].dtype == np.float64
            got = pool[-1].numpy()
            ref = [l.copy() for l in leaves]
            for op_idx, slots in recipe:
                ref.append(OPS[op_idx][3](*[ref[s] for s in slots]))
            np.testing.assert_allclose(got, ref[-1], rtol=1e-12,
                                       atol=1e-14)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_vcall_dispatch(seed):
    # random vectorized method calls: k instances with random little
    # callees (built from the OPS set), random id lanes incl. nulls,
    # flat AND struct args -- the lazy dispatch must match a per-lane
    # eager simulation
    import enoki_tpu.trace.call as tc

    rng = np.random.default_rng(900 + seed)
    n = int(rng.integers(6, 40))
    k = int(rng.integers(1, 5))
    ids = rng.integers(-1, k, n).astype(np.int32)  # -1 = null lanes
    x_np = rng.uniform(-2, 2, n).astype(np.float32)
    y_np = rng.uniform(-2, 2, n).astype(np.float32)

    # per-instance callees: a short random chain over (x, y)
    chains = []
    for _ in range(k):
        chain = []
        for _ in range(int(rng.integers(1, 5))):
            op_idx = int(rng.integers(len(OPS)))
            arity = OPS[op_idx][1]
            slots = tuple(int(rng.integers(2)) for _ in range(arity))
            chain.append((op_idx, slots))
        chains.append(chain)

    def make_callee(chain):
        def f(mask, xx, yy):
            pool = [xx, yy]
            out = pool[0]
            for op_idx, slots in chain:
                out = OPS[op_idx][2](*[pool[s] for s in slots])
                pool[0] = out  # feed forward through slot 0
            return out
        return f

    def ref_callee(chain, xx, yy):
        pool = [xx, yy]
        out = pool[0]
        for op_idx, slots in chain:
            out = OPS[op_idx][3](*[pool[s] for s in slots])
            pool[0] = out
        return out

    funcs = [make_callee(c) for c in chains]
    out = tc.dispatch(funcs, LazyArray(ids), LazyArray(x_np),
                      LazyArray(y_np))
    got = (out.numpy().astype(np.float64) if isinstance(out, LazyArray)
           else np.asarray(out, np.float64))

    want = np.zeros(n)
    for i in range(k):
        m = ids == i
        if m.any():
            want[m] = ref_callee(chains[i], x_np.astype(np.float64),
                                 y_np.astype(np.float64))[m]
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_random_dag_edge_values(seed):
    """Edge-value rounds (r4): NaN / +-inf / +-0 injected into the
    leaves must flow through the lazy backend exactly as through the
    f64 numpy reference -- the corners where r4's audit found the
    backends diverging (NaN laundered by selects, signed-zero
    handling). equal_nan compares the NaN lanes."""
    rng = np.random.default_rng(10_000 + seed)
    n = int(rng.integers(8, 33))
    n_leaves = int(rng.integers(2, 5))
    edges = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0], np.float64)
    leaves = []
    for _ in range(n_leaves):
        l = rng.uniform(-2, 2, n)
        k = int(rng.integers(1, max(2, n // 4)))
        pos = rng.choice(n, size=k, replace=False)
        l[pos] = rng.choice(edges, size=k)
        leaves.append(l)
    depth = int(rng.integers(5, 30))
    recipe = []
    pool_size = n_leaves
    for _ in range(depth):
        op_idx = int(rng.integers(len(OPS)))
        arity = OPS[op_idx][1]
        slots = tuple(int(rng.integers(pool_size)) for _ in range(arity))
        recipe.append((op_idx, slots))
        pool_size += 1

    lazy_out = _build(recipe, leaves, lazy=True)
    # reference in f32 (same working precision -- an f64 reference would
    # disagree on overflow-to-inf boundaries, not on edge semantics)
    want = _build(recipe, [l.astype(np.float32) for l in leaves],
                  lazy=False)
    got = lazy_out.numpy().astype(np.float64)
    np.testing.assert_allclose(got, want.astype(np.float64), rtol=2e-5,
                               atol=1e-6, equal_nan=True)
