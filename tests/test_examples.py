"""Example smoke tests: every mini-app runs end to end at tiny sizes.

The reference treats its mini-apps as integration tests (sphere.cpp,
histogram.cpp, call.cpp are IN the test suite, tests/CMakeLists.txt:
133-155); these keep the examples/ directory from bitrotting the same
way. Each runs in-process on the CPU test platform with a small size
argument.
"""

import os
import runpy
import sys

import pytest

_EX = os.path.join(os.path.dirname(__file__), os.pardir, "examples")

# (script, argv size, needs-trace-reset)
CASES = [
    ("calls.py", "64", False),
    ("composed.py", "256", False),  # pallas tile: n % 128 == 0
    ("haversine.py", "10000", False),
    ("histogram.py", "65536", False),
    ("lazy_sphere.py", "64", True),
    ("sphere.py", "64", False),
    ("lazy_histogram.py", "4096", True),
    ("lazy_fit.py", "64", True),
]


@pytest.mark.parametrize("script,size,lazy", CASES,
                         ids=[c[0] for c in CASES])
def test_example_runs(script, size, lazy, capsys, tmp_path, monkeypatch):
    if lazy:
        import enoki_tpu.trace as tr

        tr.reset()
    monkeypatch.chdir(tmp_path)  # .ppm outputs land in tmp
    argv = [script, size]
    monkeypatch.setattr(sys, "argv", argv)
    runpy.run_path(os.path.join(_EX, script), run_name="__main__")
    captured = capsys.readouterr()
    assert (captured.out + captured.err).strip(), \
        f"{script} produced no output"
    if lazy:
        import enoki_tpu.trace as tr

        tr.reset()
