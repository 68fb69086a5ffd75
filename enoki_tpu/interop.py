"""Zero-copy interop with NumPy and PyTorch.

Parity with the reference's Python-binding exchange helpers
(src/python/common.h:241-244: enoki_to_torch / torch_to_enoki /
numpy_to_enoki + buffer-protocol numpy) and the torch.autograd.Function
bridge exercised by tests/python/test_pytorch.py.

JAX speaks dlpack natively, so torch<->jax transfer is zero-copy on
matching devices; numpy conversion is zero-copy on CPU.

``torch_wrap`` builds a torch.autograd.Function from any differentiable
JAX function -- the analog of the hand-written bridge in
tests/python/test_pytorch.py:6-71 (there the user writes forward/backward
manually; here the VJP comes from jax.vjp automatically).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def to_numpy(x) -> np.ndarray:
    return np.asarray(x)


def from_numpy(x) -> jnp.ndarray:
    return jnp.asarray(x)


def to_torch(x):
    """jax -> torch via dlpack (enoki_to_torch, common.h:241)."""
    import torch

    return torch.from_dlpack(x)


def from_torch(x) -> jnp.ndarray:
    """torch -> jax via dlpack (torch_to_enoki, common.h:243)."""
    return jnp.from_dlpack(x.detach().contiguous())


def torch_wrap(f: Callable):
    """Wrap a differentiable JAX function as a torch.autograd.Function.

    Forward runs f under jit; backward runs the JAX VJP. All tensors cross
    via dlpack. Returns a callable taking/returning torch tensors.
    """
    import torch

    # one compiled program computes the primal AND the VJP residuals;
    # jitting f alone would leave the vjp trace eager
    @jax.jit
    def _fwd(*jax_args):
        return jax.vjp(f, *jax_args)

    class _Fn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *tensors):
            jax_args = tuple(from_torch(t) for t in tensors)
            out, vjp = _fwd(*jax_args)
            ctx._vjp = vjp
            return to_torch(out)

        @staticmethod
        def backward(ctx, g):
            grads = ctx._vjp(from_torch(g))
            return tuple(to_torch(gr) for gr in grads)

    def apply(*tensors):
        return _Fn.apply(*tensors)

    return apply
