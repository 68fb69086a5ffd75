"""AD helpers + runtime introspection tests (reference autodiff tests +
whos/graphviz/log tooling, SURVEY §5)."""

import numpy as np
import jax
import jax.numpy as jnp

from enoki_tpu import ad, runtime
from enoki_tpu.interop import to_numpy, from_numpy, to_torch, from_torch, torch_wrap


def test_backward_forward():
    def f(a, b):
        return jnp.sum(a * a * b)

    a = jnp.arange(3.0)
    b = jnp.float32(2.0)
    val, (ga, gb) = ad.backward(f, a, b)
    assert float(val) == 2 * (0 + 1 + 4)
    assert np.array_equal(ga, 2 * 2 * np.arange(3.0))
    assert float(gb) == 5.0

    out, tangent = ad.forward(f, (a, b), (jnp.ones(3), jnp.float32(0.0)))
    assert float(tangent) == float(jnp.sum(2 * a * b))


def test_safe_mul_suppresses_inf():
    # 0 * inf = 0 (autodiff.cpp:1191 semantics)
    assert float(ad.safe_mul(jnp.float32(0.0), jnp.float32(np.inf))) == 0.0
    assert float(ad.safe_mul(jnp.float32(np.inf), jnp.float32(0.0))) == 0.0
    assert float(ad.safe_mul(jnp.float32(2.0), jnp.float32(3.0))) == 6.0
    assert float(ad.safe_fmadd(jnp.float32(0.0), jnp.float32(np.nan),
                               jnp.float32(1.0))) == 1.0
    # gradient flows where finite
    g = jax.grad(lambda x: ad.safe_mul(x, jnp.float32(3.0)))(jnp.float32(2.0))
    assert float(g) == 3.0


def test_detach_and_suspend():
    g = jax.grad(lambda x: jnp.sum(ad.detach(x) * x))(jnp.ones(3))
    assert np.array_equal(g, [1, 1, 1])
    tree = {"a": jnp.ones(2), "b": (jnp.zeros(1),)}
    s = ad.suspend_grad(tree)
    assert np.array_equal(s["a"], [1, 1])


def test_whos_and_graphviz():
    def f(x):
        return jnp.sin(x) * 2.0

    table = ad.whos(f, jnp.ones(8))
    assert "sin" in table and "mul" in table
    dot = ad.graphviz(f, jnp.ones(8))
    assert dot.startswith("digraph") and "sin" in dot and "->" in dot


def test_runtime_dumps_and_timings():
    def f(x):
        return jnp.tanh(x) + 1.0

    x = jnp.ones(16)
    jp = runtime.dump_jaxpr(f, x)
    assert "tanh" in jp
    hlo = runtime.dump_hlo(f, x)
    assert "tanh" in hlo.lower() or "hlo" in hlo.lower()
    t = runtime.compile_timings(f, x)
    assert t["n_eqns"] >= 2
    assert t["compile_s"] > 0
    # cache hit must be much cheaper than cold compile (gpu.rst:268-271
    # cache-hit contract)
    assert t["cache_hit_s"] < max(t["compile_s"], 1e-3) * 5


def test_whos_live_arrays():
    keep = jnp.ones((128, 128))
    out = runtime.whos(print_out=False)
    assert "Total:" in out and "(128, 128)" in out
    del keep


def test_memory_stats():
    stats = runtime.memory_stats()
    assert "bytes_in_use" in stats


def test_printf_and_label_compile():
    @jax.jit
    def f(x):
        with runtime.label("shade"):
            y = x * 2.0
        return y

    assert np.array_equal(f(jnp.ones(4)), [2, 2, 2, 2])


def test_interop_numpy():
    x = np.arange(5.0, dtype=np.float32)
    j = from_numpy(x)
    back = to_numpy(j * 2)
    assert np.array_equal(back, x * 2)


def test_interop_torch():
    import torch

    t = torch.arange(6, dtype=torch.float32)
    j = from_torch(t)
    assert np.array_equal(np.asarray(j), t.numpy())
    t2 = to_torch(j * 3)
    assert torch.equal(t2, t * 3)


def test_torch_autograd_bridge():
    # analog of tests/python/test_pytorch.py: grads flow through a JAX fn
    # wrapped as torch.autograd.Function (atan2 like the reference)
    import torch

    def f(y, x):
        return jnp.sum(jnp.arctan2(y, x))

    fn = torch_wrap(f)
    y = torch.tensor([1.0, 2.0], requires_grad=True)
    x = torch.tensor([2.0, 1.0], requires_grad=True)
    out = fn(y, x)
    out.backward()
    # d/dy atan2(y,x) = x/(x^2+y^2); d/dx = -y/(x^2+y^2)
    want_gy = (x / (x * x + y * y)).detach()
    want_gx = (-y / (x * x + y * y)).detach()
    assert torch.allclose(y.grad, want_gy, atol=1e-6)
    assert torch.allclose(x.grad, want_gx, atol=1e-6)


def test_vectorization_report():
    # ENOKI_TRACK_SCALAR analog (fwd.h:208-233): a fused on-device program
    # passes; a program with a host callback is caught
    from enoki_tpu.runtime import assert_vectorized, vectorization_report
    import jax

    def good(x):
        return jnp.sin(x) * 2.0 + jnp.sqrt(x * x + 1.0)

    x = jnp.linspace(0, 1, 128)
    rep = assert_vectorized(good, x)
    assert rep["host_transfers"] == 0

    def bad(x):
        jax.debug.callback(lambda v: None, x[0])
        return x * 2.0

    rep_bad = vectorization_report(bad, x)
    assert rep_bad["custom_calls"] > 0 or rep_bad["host_transfers"] > 0


def test_checkpoint_roundtrip(tmp_path):
    # checkpoint/resume subsystem (SURVEY §5: absent in the reference;
    # required for long-running distributed fitting)
    from enoki_tpu.runtime import checkpoint as ck
    from enoki_tpu.render import SphereScene
    from enoki_tpu.types import PCG32
    import optax

    scene = SphereScene.reference()
    opt = optax.adam(1e-2)
    state = {"scene": scene, "opt": opt.init(scene),
             "rng": PCG32.create(64)}

    root = str(tmp_path / "ckpts")
    ck.save_step(root, 3, state)
    ck.save_step(root, 7, state)
    assert ck.latest_step(root) == 7

    restored, step = ck.restore_latest(root, like=state)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_wrap_multi_output():
    # r4 audit: multi-output f crashed in forward (to_torch of a tuple)
    import torch

    fn = torch_wrap(lambda a, b: (a + b, a * b))
    ta = torch.tensor([1.0, 2.0], requires_grad=True)
    tb = torch.tensor([3.0, 4.0], requires_grad=True)
    s, p = fn(ta, tb)
    assert torch.allclose(s, torch.tensor([4.0, 6.0]))
    assert torch.allclose(p, torch.tensor([3.0, 8.0]))
    (s.sum() + p.sum()).backward()
    assert torch.allclose(ta.grad, torch.tensor([4.0, 5.0]))  # 1 + b
    assert torch.allclose(tb.grad, torch.tensor([2.0, 3.0]))  # 1 + a
