"""Implicit-function-theorem backward for frozen ray-march roots.

The march returns t* with sdf(ray(t*), theta) = eps (a root, not a
differentiable trace). The cotangent of everything upstream of t* is
therefore analytic:

    dt*/dtheta^T . t_bar = -(t_bar / (d sdf/dt)) . (d sdf/dtheta)^T

This is the TPU-first replacement for differentiating through the whole
march loop (the reference's tape records every step and relies on graph
simplification to collapse the chain, autodiff.cpp:990 -- here the
collapse is analytic and O(1) in the step count).

ONE definition consumed by all three backward paths: the jnp custom_vjp
(render/sdf.py), the generic bring-your-own-SDF megakernel
(render/generic.py) and the tuned sphere megakernel
(render/pallas_kernels.py). Previously triplicated and kept in sync by
comments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def implicit_t_vjp(f, args, t, t_bar, hit, guard: float = 1e-6):
    """Backward of a frozen march root through the IFT.

    ``f(args, t) -> per-lane sdf residual`` evaluated at the root;
    ``args`` is any pytree (a parameter vector, a (ray, scene) pair).
    ``t_bar`` is the cotangent that reached t (from the shade vjp);
    miss lanes (``~hit``, where t is a frozen max, not a root) get zero.
    At grazing hits (|d sdf/dt| <= guard) the slope is clamped to 1
    instead of amplifying the cotangent through a near-zero divisor.
    Returns the cotangent pytree for ``args``.
    """
    df_dt = jax.grad(lambda tv: jnp.sum(f(args, tv)))(t)
    # the grazing clamp must PRESERVE THE SLOPE'S SIGN: at a front-facing
    # SDF hit d sdf/dt = n.d < 0, so replacing a tiny negative slope with
    # +1 would flip the cotangent's direction on every clamped lane and
    # push grazing-silhouette gradients the wrong way. Exact zeros take
    # the entering-hit convention (negative slope).
    sgn = jnp.where(df_dt == 0.0, -1.0, jnp.sign(df_dt))
    df_dt = jnp.where(jnp.abs(df_dt) > guard, df_dt, sgn)
    w = jnp.where(hit, -t_bar / df_dt, 0.0)
    _, vjp_fn = jax.vjp(lambda a: f(a, t), args)
    (d_args,) = vjp_fn(w)
    return d_args
