"""sRGB <-> linear conversions.

Parity with reference include/enoki/color.h: linear_to_srgb (:20) and
srgb_to_linear (:58). The reference uses rational-polynomial fits of the
IEC 61966-2-1 curves to avoid pow; on TPU, XLA's pow lowering is a couple
of transcendental ops, so the *exact* piecewise standard formula is both
the accuracy reference and fast. We provide it as default, and keep the
fit-based approach available via impl="poly" using our own fits.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import backend as B



def linear_to_srgb(x, impl="native"):
    if not B.is_lazy(x):
        x = jnp.asarray(x)
    g = B.math_ns(x, impl)
    lin = x * 12.92
    nonlin = 1.055 * g.pow(g.maximum(x, 1e-8), 1.0 / 2.4) - 0.055
    return g.select(x <= 0.0031308, lin, nonlin)


def srgb_to_linear(x, impl="native"):
    if not B.is_lazy(x):
        x = jnp.asarray(x)
    g = B.math_ns(x, impl)
    lin = x * (1.0 / 12.92)
    nonlin = g.pow(g.maximum((x + 0.055) * (1.0 / 1.055), 1e-8), 2.4)
    return g.select(x <= 0.04045, lin, nonlin)
