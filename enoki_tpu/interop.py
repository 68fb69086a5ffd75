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

    # the pullback is a Partial pytree, so it can cross a jit boundary
    # as an argument: the backward pass then runs as ONE fused program
    # instead of interpreting the transposed jaxpr primitive-by-primitive
    @jax.jit
    def _bwd(vjp, ct):
        return vjp(ct)

    class _Fn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *tensors):
            jax_args = tuple(from_torch(t) for t in tensors)
            out, vjp = _fwd(*jax_args)
            ctx._vjp = vjp
            # multi-output f: hand torch one tensor per output leaf (its
            # backward then supplies one cotangent per output)
            leaves, tree = jax.tree_util.tree_flatten(out)
            ctx._out_tree = tree
            if len(leaves) == 1:
                return to_torch(leaves[0])
            return tuple(to_torch(l) for l in leaves)

        @staticmethod
        def backward(ctx, *gs):
            ct = jax.tree_util.tree_unflatten(
                ctx._out_tree, [from_torch(g) for g in gs])
            grads = _bwd(ctx._vjp, ct)
            return tuple(to_torch(gr) for gr in grads)

    def apply(*tensors):
        return _Fn.apply(*tensors)

    return apply
