"""x64 leg of the lazy-backend suites (verdict r4 item 6).

The reference instantiates its whole stack for double
(/root/reference/src/autodiff/autodiff.cpp:1223-1241,
src/cuda/horiz.cu:356+); the analog here is running the trace / lazy-op
/ lazy-AD suites under ``jax_enable_x64`` so every 64-bit dtype path
(f64 literals, u64 bit ops, f64 tape segments) executes rather than
skips. jax's x64 flag must be set before import, so the leg is a
subprocess -- one extra ~50 s CI entry instead of a whole duplicate
matrix.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FILES = ["tests/test_trace.py", "tests/test_lazy_ops.py",
         "tests/test_ad_runtime.py"]


def test_lazy_suites_under_x64():
    env = dict(os.environ, JAX_ENABLE_X64="1",
               PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         *FILES],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1200)
    tail = (p.stdout or "").strip().splitlines()[-3:]
    assert p.returncode == 0, \
        f"x64 leg failed:\n{p.stdout[-2000:]}\n{p.stderr[-1000:]}"
    # the leg must actually RUN the 64-bit paths: the x64-gated test in
    # test_trace.py skips off-x64, so zero skips proves the flag took
    assert any("passed" in ln for ln in tail), tail
    assert not any("skipped" in ln for ln in tail), \
        f"x64-gated tests still skipping under the x64 leg: {tail}"
