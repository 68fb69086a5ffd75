"""End-to-end drive on the real TPU: all 7 verify-skill flows.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/drive_tpu.py
(used by .claude/skills/verify; exercises the public package boundary
the way a user would, with hardware-calibrated tolerances)."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())

# 1) fused render chain
from enoki_tpu.render import SphereScene, render_fused, render_staged
img = np.asarray(render_fused(SphereScene.reference(), 512))
assert img.shape == (512 * 512,) or img.shape == (512, 512)
assert np.isfinite(img).all() and 0 < img.mean() < 250
print("1) fused render: ok, mean", round(float(img.mean()), 3))

# 2) poly transcendentals on chip
from enoki_tpu.ops import math as M
x = jnp.linspace(-6, 6, 100001)
s, c = M.sincos(x, "poly")
assert float(jnp.max(jnp.abs(s * s + c * c - 1))) < 1e-6
ref = np.sin(np.linspace(-6, 6, 100001, dtype=np.float64))
err = np.abs(np.asarray(s, np.float64) - ref).max()
assert err < 2.3e-6, err  # reference bound: 19 ulp max (docs/reference.rst)
print("2) poly sincos: ok")

# 3) PCG32 bit-exactness
from enoki_tpu.types import PCG32
gen = PCG32.create(8)
u, _ = gen.next_uint32()
# numpy uint64 reference (same class the test suite locks against)
import sys as _sys
_sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
from test_random import NumpyPCG32
want = NumpyPCG32(size=8).next_uint32()
assert (np.asarray(u) == want).all(), (np.asarray(u), want)
print("3) PCG32 bit-exact: ok")

# 4) histogram: erfinv + scatter_add
from enoki_tpu import ops
g2 = PCG32.create(1 << 20)
uu, _ = g2.next_float32()
z = ops.erfinv(2 * uu - 1) * np.sqrt(2)
bins = jnp.floor((z + 4) * 8).astype(jnp.int32)
mask = (bins >= 0) & (bins < 64)
hist = np.asarray(ops.scatter_add(jnp.zeros(64), jnp.ones_like(z), bins, mask=mask))
assert abs(hist.sum() - (1 << 20)) < 1000 and hist[32] > hist[8] > 0
print("4) histogram: ok")

# 5) gradients + safe_sqrt boundary
from enoki_tpu.render.sdf import SDFScene, render_sdf_grads_implicit
_, gr = render_sdf_grads_implicit(SDFScene.reference(), 256, 48)
leaves = [float(np.asarray(v)) for v in jax.tree_util.tree_leaves(gr)]
assert all(np.isfinite(leaves)) and any(abs(v) > 1e-3 for v in leaves)
g0 = jax.grad(lambda t: ops.safe_sqrt(t))(0.0)
assert float(g0) == 0.0
print("5) gradients: ok (safe_sqrt'(0) =", float(g0), ")")

# 6) Pallas kernels vs jnp on chip
from enoki_tpu.render.pallas_kernels import scene_to_vec, render_sdf_pallas
from enoki_tpu.render.sdf import render_sdf
v = scene_to_vec(SDFScene.reference())
# exact-path gate: coarse=0 disables the cone prepass so the kernel
# follows the reference trajectory (the tight tolerance is only valid
# there; the prepass legitimately moves grazing silhouette pixels)
ip = np.asarray(render_sdf_pallas(v, 512, 48, 1.2, 128, 128, 0))
ix = np.asarray(render_sdf(SDFScene.reference(), 512, 48)).reshape(512, 512)
d = np.abs(ip - ix)
assert d.mean() < 1e-5 and (d > 1e-2).mean() < 1e-4, (d.mean(), d.max())
# tuned-path gate: default work-elimination config (cone prepass +
# bands) under the calibrated silhouette methodology of
# tests/test_pallas.py::test_sdf_pallas_cone_prepass_parity --
# hit/miss flips (grazing rays, image-range-size deltas) are bounded
# by fraction, everything else by the gain*eps band
it = np.asarray(render_sdf_pallas(v, 512, 48, 1.2, 128, 128))
dt = np.abs(it - ix)
flips = dt > 1.0
assert flips.mean() < 1e-3, flips.mean()
assert dt[~flips].max() < 0.05 and dt[~flips].mean() < 5e-3, (
    dt[~flips].mean(), dt[~flips].max())
print("6) pallas parity: ok (exact mean diff", f"{d.mean():.2e},",
      "tuned flips", f"{flips.mean():.1e})")

# 7) lazy trace runtime on chip
import enoki_tpu.trace as tr
a = tr.requires_grad(tr.LazyArray(np.linspace(0.5, 2, 4096).astype(np.float32)))
loss = (tr.sin(a) * a).hsum()
val = tr.backward(loss)
ga = tr.gradient(a).numpy()
xs = np.linspace(0.5, 2, 4096)
assert np.allclose(ga, np.sin(xs) + xs * np.cos(xs), rtol=1e-4, atol=1e-5)
print("7) lazy trace + AD: ok")

# 8) one source, every backend: ops/special surface over LazyArray + a
# Ray-struct vcall, all fused on the chip
import scipy.special as _sp
xx = np.linspace(-2.5, 2.5, 4097).astype(np.float32)
lz = tr.LazyArray(xx)
out = ops.select(ops.erf(lz) > 0.0,
                 ops.special.dawson(lz) + ops.special.i0e(lz, "poly"),
                 ops.special.erfc(lz, "poly"))
got = out.numpy().astype(np.float64)
want = np.where(_sp.erf(xx) > 0, _sp.dawsn(xx) + _sp.i0e(xx), _sp.erfc(xx))
assert np.allclose(got, want, rtol=5e-5, atol=1e-5)
from enoki_tpu.render.vec import Vec3
import enoki_tpu.trace.call as _tc
v3 = Vec3(lz, lz * 2.0, lz * 3.0)
ids8 = tr.LazyArray(np.arange(4097, dtype=np.int32) % 2)
r8 = _tc.dispatch([lambda m, v: v.x + v.y, lambda m, v: v.z * v.z],
                  ids8, v3)
want8 = np.where(np.arange(4097) % 2 == 0, xx * 3.0, (3.0 * xx) ** 2)
assert np.allclose(r8.numpy(), want8, rtol=1e-4, atol=1e-4)
print("8) unified ops surface + struct vcall on the lazy backend: ok")

# 9) round-3 additions: histogram op (fused) + export cache roundtrip
h9 = np.asarray(ops.histogram(bins, 64))  # reuse flow 4's bin indices
assert abs(h9.sum() - np.asarray(mask).sum()) < 1
import tempfile, shutil, glob
from enoki_tpu.config import config as _cfg
_d = tempfile.mkdtemp(prefix="drive_exp_")
try:
    _cfg.trace_export_dir = _d
    lx9 = tr.LazyArray(np.linspace(0.5, 1.5, 2048).astype(np.float32))
    v9a = tr.sqrt(lx9 * lx9 + 1.0).numpy()
    assert glob.glob(_d + "/*.jaxexp"), "export artifact missing"
    tr.clear_cache()  # "new process": the identical structure must LOAD
    ly9 = tr.LazyArray(np.linspace(0.5, 1.5, 2048).astype(np.float32))
    v9b = tr.sqrt(ly9 * ly9 + 1.0).numpy()
    assert np.allclose(v9a, v9b, rtol=1e-6)
finally:
    _cfg.trace_export_dir = ""
    shutil.rmtree(_d, ignore_errors=True)
print("9) histogram op + export-cache roundtrip on chip: ok")

print("ALL 9 FLOWS PASS ON THE REAL CHIP")
