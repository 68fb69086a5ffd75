"""Doc-rot guard: every enoki-tpu symbol named in docs/migration.md
must actually exist.

The migration guide is the switching user's contract; a renamed or
removed function whose row survives in the table would strand exactly
the audience the document exists for. This test mechanically extracts
the dotted names from the right-hand columns and resolves each one.
"""

import re
import os

import pytest

import enoki_tpu
import enoki_tpu.trace  # noqa: F401  (resolved via getattr chains below)
import enoki_tpu.trace.call  # noqa: F401
import enoki_tpu.struct  # noqa: F401
import enoki_tpu.types  # noqa: F401
import enoki_tpu.render  # noqa: F401
import enoki_tpu.dist  # noqa: F401
import enoki_tpu.runtime  # noqa: F401
import enoki_tpu.interop  # noqa: F401
import enoki_tpu.ops.special  # noqa: F401
import enoki_tpu.ops.math  # noqa: F401
import enoki_tpu.ops.backend  # noqa: F401

_DOC = os.path.join(os.path.dirname(__file__), "..", "docs",
                    "migration.md")

# dotted names rooted at a known package/module alias used in the doc
_ROOTS = {
    "enoki_tpu": enoki_tpu,
    "ops": enoki_tpu.ops,
    "trace": enoki_tpu.trace,
    "struct": enoki_tpu.struct,
    "types": enoki_tpu.types,
    "render": enoki_tpu.render,
    "dist": enoki_tpu.dist,
    "runtime": enoki_tpu.runtime,
    "interop": enoki_tpu.interop,
    # the doc uses `config.` for both the typed instance (config.approx)
    # and the module (config.set_log_level); accept either
    "config": (enoki_tpu.config.config, enoki_tpu.config),
    "ad": getattr(enoki_tpu, "ad", None),
    "LazyArray": enoki_tpu.trace.LazyArray,
    "PCG32": enoki_tpu.types.PCG32,
}

_NAME = re.compile(r"`([A-Za-z_][\w.]*(?:\.[A-Za-z_]\w*)+)[`(]")


def _candidates():
    with open(_DOC) as f:
        text = f.read()
    seen = set()
    for line in text.splitlines():
        # only the enoki-tpu column of table rows (the last cell)
        if not line.strip().startswith("|"):
            continue
        cells = line.split("|")
        if len(cells) < 3:
            continue
        rhs = cells[-2]
        for m in _NAME.finditer(rhs):
            name = m.group(1).rstrip(".")
            root = name.split(".")[0]
            if root in _ROOTS and _ROOTS[root] is not None:
                seen.add(name)
    return sorted(seen)


def _resolve(obj, parts):
    for p in parts:
        if not hasattr(obj, p):
            return False
        obj = getattr(obj, p)
    return True


@pytest.mark.parametrize("name", _candidates())
def test_migration_symbol_exists(name):
    parts = name.split(".")
    roots = _ROOTS[parts[0]]
    if not isinstance(roots, tuple):
        roots = (roots,)
    assert any(_resolve(r, parts[1:]) for r in roots), (
        f"docs/migration.md names `{name}` but it does not resolve")
