"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's multi-ISA test matrix idea (tests/CMakeLists.txt:
65-131 builds each test at 5-7 ISA levels): we run every test under CPU jax
with 8 virtual devices so all sharding paths execute without a TPU pod.
The real-chip path is exercised by bench.py / __graft_entry__.py.
"""

import os

# Must be set before jax is imported anywhere. Force CPU: the ambient
# environment points JAX_PLATFORMS at the real TPU, but the test suite runs
# on a virtual 8-device CPU mesh (override with ENOKI_TPU_TEST_PLATFORM).
os.environ["JAX_PLATFORMS"] = os.environ.get("ENOKI_TPU_TEST_PLATFORM", "cpu")

# Hermetic suite: the round-4 zero-config persistent caches (cache.py)
# default ON for users, but the suite must not read or write
# ~/.cache/enoki_tpu (stale artifacts could mask regressions; parallel
# CI runs would race). Tests that exercise the caches point them at
# tmp_path explicitly.
os.environ.setdefault("ENOKI_TPU_EXPORT_CACHE", "off")
os.environ.setdefault("ENOKI_TPU_COMPILE_CACHE", "off")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize (axon) force-registers the TPU platform and
# sets jax_platforms="axon,cpu" regardless of the env var; override it here
# before any backend is initialized.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


def ulp_error(result, reference, dtype=np.float32):
    """ULP distance between ``result`` (dtype) and a float64 ``reference``.

    Port of the reference's probe_accuracy methodology (tests/test.h:206-307):
    the reference value is first rounded to ``dtype`` (the correctly-rounded
    answer), then the distance is measured in units of the floating-point
    spacing at that value -- so a correctly-rounded result scores 0 and
    "mean 0.27 ulp" means 27% of samples are one step off (the semantics
    behind docs/reference.rst's accuracy tables).
    """
    result = np.asarray(result, np.float64)
    want = np.asarray(reference, np.float64).astype(dtype)
    spacing = np.spacing(np.abs(want)).astype(np.float64)
    return np.abs(result - want.astype(np.float64)) / spacing


def check_accuracy(fn, ref_fn, lo, hi, n=100_000, max_ulp=2.0, mean_ulp=0.5,
                   dtype=np.float32, log_space=False, seed=0):
    """Sweep [lo, hi], compare fn (dtype) against ref_fn (float64).

    Returns (mean_ulp_measured, max_ulp_measured) and asserts the bounds,
    mirroring probe_accuracy's assertions (tests/test.h:206-307).
    """
    rng = np.random.default_rng(seed)
    if log_space:
        xs = np.exp(rng.uniform(np.log(lo), np.log(hi), n))
    else:
        xs = rng.uniform(lo, hi, n)
    xs = xs.astype(dtype)
    got = np.asarray(fn(xs), np.float64)
    want = ref_fn(xs.astype(np.float64))
    finite = np.isfinite(want) & (want != 0)
    err = ulp_error(got[finite], want[finite], dtype)
    mean_err, max_err = float(err.mean()), float(err.max())
    assert max_err <= max_ulp, (
        f"max ulp {max_err} > bound {max_ulp} "
        f"(worst at x={xs[finite][err.argmax()]!r})")
    assert mean_err <= mean_ulp, f"mean ulp {mean_err} > bound {mean_ulp}"
    return mean_err, max_err
