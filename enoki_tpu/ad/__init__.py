"""Differentiation helpers -- the reference's AD-tape surface on jax.grad.

The reference wraps any array type in ``DiffArray`` and exposes
``backward(loss)`` / ``forward(x)`` / ``gradient(x)`` / ``detach(x)`` plus
tape utilities (graphviz, whos) (autodiff.h:126-1500, autodiff.cpp). Under
JAX the tape is the jaxpr, so:

  gradient / grad_of       jax.grad conveniences
  backward(f, *args)       reverse mode: returns grads of all args
  forward(f, *args, tangents)  forward mode: jax.jvp
  detach                   lax.stop_gradient (array_router.h:689)
  safe_mul / safe_fmadd    0-weight kills inf/nan partials
                           (autodiff.cpp:1191-1221 semantics)
  suspend_grad             a detach context for pytrees
  graphviz(f, *args)       DOT render of the jaxpr (autodiff.cpp:1076)
  whos(f, *args)           tape table: eqn list w/ shapes (autodiff.cpp:1165)
  CustomVJP                re-export of jax.custom_vjp (Special edges analog,
                           autodiff.cpp:44-145)
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax

detach = lax.stop_gradient
CustomVJP = jax.custom_vjp
CustomJVP = jax.custom_jvp


def gradient(f: Callable, argnums=0) -> Callable:
    """``gradient(x)`` reads the tape result in the reference; here the
    whole reverse pass is ``jax.grad``."""
    return jax.grad(f, argnums=argnums)


def backward(f: Callable, *args):
    """Reverse-mode: returns (value, grads w.r.t. every arg) -- the analog
    of ``backward(loss); gradient(x_i)`` (autodiff.h:1490)."""
    val, grads = jax.value_and_grad(
        f, argnums=tuple(range(len(args))))(*args)
    return val, grads


def forward(f: Callable, args: Sequence, tangents: Sequence):
    """Forward-mode: (value, directional derivative) -- ``forward(x)``
    (autodiff.cpp:912)."""
    return jax.jvp(f, tuple(args), tuple(tangents))


# ---------------------------------------------------------------------------
# safe_mul / safe_fmadd: multiplication where a zero weight suppresses
# inf/NaN from the other operand (autodiff.cpp:1191-1221 uses these for all
# tape edge products so masked-out lanes cannot poison gradients).
# ---------------------------------------------------------------------------


@jax.custom_jvp
def safe_mul(a, b):
    r = a * b
    zero = (a == 0) | (b == 0)
    return jnp.where(zero, jnp.zeros_like(r), r)


@safe_mul.defjvp
def _safe_mul_jvp(primals, tangents):
    # Tangent rule must be LINEAR in the tangents (reverse mode transposes
    # it), so the 0-kills-inf sanitization applies to the PRIMAL partials:
    # d/da = b with non-finite b suppressed where a == 0, and vice versa.
    a, b = primals
    da, db = tangents
    y = safe_mul(a, b)
    pa = jnp.where((a == 0) & ~jnp.isfinite(b), jnp.zeros_like(b), b)
    pb = jnp.where((b == 0) & ~jnp.isfinite(a), jnp.zeros_like(a), a)
    dy = da * pa + db * pb
    return y, dy.astype(y.dtype)


def safe_fmadd(a, b, c):
    """safe_mul(a, b) + c (autodiff.cpp:1210)."""
    return safe_mul(a, b) + c


def suspend_grad(tree):
    """Detach a whole pytree (drjit-style suspend_grad)."""
    return jax.tree_util.tree_map(lax.stop_gradient, tree)


# ---------------------------------------------------------------------------
# Tape introspection: the jaxpr IS the tape.
# ---------------------------------------------------------------------------


def whos(f: Callable, *args) -> str:
    """Tape table: one line per equation with output shapes/dtypes --
    the analog of ``tape.whos()`` (autodiff.cpp:1165)."""
    jaxpr = jax.make_jaxpr(f)(*args)
    lines = ["  ID        Size     Type        Op"]
    for i, eqn in enumerate(jaxpr.eqns):
        for ov in eqn.outvars:
            aval = ov.aval
            lines.append(f"  {i:<8} {aval.size:<8} {aval.dtype!s:<11} "
                         f"{eqn.primitive.name}")
    return "\n".join(lines)


def graphviz(f: Callable, *args) -> str:
    """DOT graph of the jaxpr -- analog of tape graphviz dumps
    (autodiff.cpp:1076-1163). Variables are ellipses, ops are boxes."""
    jaxpr = jax.make_jaxpr(f)(*args).jaxpr
    out = ["digraph {", "  rankdir=BT;",
           '  node [fontname="Helvetica"];']
    names = {}

    from jax.extend import core as _jex_core

    def vname(v):
        if isinstance(v, _jex_core.Literal):
            return None
        if v not in names:
            names[v] = f"v{len(names)}"
        return names[v]

    for v in jaxpr.invars:
        n = vname(v)
        out.append(f'  {n} [shape=ellipse, label="in {v.aval.str_short()}"'
                   ", fillcolor=wheat, style=filled];")
    for i, eqn in enumerate(jaxpr.eqns):
        op = f"e{i}"
        out.append(f'  {op} [shape=box, label="{eqn.primitive.name}"'
                   ", fillcolor=lightblue, style=filled];")
        for v in eqn.invars:
            n = vname(v)
            if n is not None:
                out.append(f"  {n} -> {op};")
        for v in eqn.outvars:
            n = vname(v)
            out.append(f'  {n} [shape=ellipse, '
                       f'label="{v.aval.str_short()}"];')
            out.append(f"  {op} -> {n};")
    for v in jaxpr.outvars:
        n = vname(v)
        if n is not None:
            out.append(f'  {n} [shape=ellipse, fillcolor=salmon, '
                       "style=filled];")
    out.append("}")
    return "\n".join(out)


def checkpoint(f: Callable, **kw) -> Callable:
    """Rematerialization -- the memory/compute trade the reference's tape
    lacks (jax.checkpoint; used by the march loop, render/sdf.py)."""
    return jax.checkpoint(f, **kw)
