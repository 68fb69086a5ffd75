"""Morton / Z-order curve encoding for N-dimensional unsigned coordinates.

Parity with reference include/enoki/morton.h:28-150: the reference uses BMI2
pdep/pext on x86 and magic-mask shift cascades elsewhere; TPU has no pdep,
so we always use the shift cascade. The magic masks are computed on the host
at trace time (python ints -> constants in the HLO), reproducing the
``morton_magic`` constexpr (morton.h:28-46).

Coordinates are uint32; with D dimensions only the low floor(32/D) bits of
each coordinate are representable (same contract as the reference with
32-bit Value).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..ops import backend as B


def _morton_magic(dim: int, level: int, n_bits: int = 32) -> int:
    """Python port of the mask generator (morton.h:28-46)."""
    max_block_size = n_bits // dim
    block_size = min(1 << (level - 1), max_block_size)
    count = 0
    mask = 1 << (n_bits - 1)
    value = 0
    for i in range(n_bits):
        value >>= 1
        if count < max_block_size and (i // block_size) % dim == 0:
            count += 1
            value |= mask
    return value


def _scatter_bits(x, dim: int, n_bits: int = 32):
    """Spread the low bits of x so consecutive bits land ``dim`` apart
    (morton.h:49-68 shift cascade)."""
    if dim == 1:
        return x
    level = n_bits.bit_length() - 1  # clog2i(32) = 5
    for lv in range(level, 0, -1):
        magic = _morton_magic(dim, lv, n_bits)
        shift = (1 << (lv - 1)) * (dim - 1)
        if shift < n_bits:
            x = x | (x << shift)
        x = x & magic
    return x


def _gather_bits(x, dim: int, n_bits: int = 32):
    """Inverse of _scatter_bits (morton.h:71-93)."""
    if dim == 1:
        return x
    level = n_bits.bit_length() - 1
    for lv in range(level, 0, -1):
        ilevel = level - lv + 1
        magic = _morton_magic(dim, ilevel, n_bits)
        shift = (1 << (ilevel - 1)) * (dim - 1)
        x = x & magic
        if shift < n_bits:
            x = x | (x >> shift)
    return x


def morton_encode(coords: Sequence) -> jnp.ndarray:
    """Interleave N uint32 coordinate arrays into Morton codes
    (morton.h:135-143). ``coords[0]`` holds the least-significant bits."""
    if any(B.is_lazy(c) for c in coords):
        # lazy lanes must still be uint32: Op.SHR on int32 is an
        # arithmetic shift (sign smear); eager members of a mixed list
        # are lifted to lazy leaves
        from ..trace import LazyArray

        coords = [c.cast(jnp.uint32) if B.is_lazy(c)
                  else LazyArray(jnp.asarray(c, jnp.uint32))
                  for c in coords]
    else:
        coords = [jnp.asarray(c, jnp.uint32) for c in coords]
    dim = len(coords)
    out = _scatter_bits(coords[0], dim)
    for i in range(1, dim):
        out = out | (_scatter_bits(coords[i], dim) << i)
    return out


def morton_decode(value, dim: int) -> Tuple[jnp.ndarray, ...]:
    """De-interleave Morton codes into ``dim`` coordinate arrays
    (morton.h:146-150)."""
    if B.is_lazy(value):
        value = value.cast(jnp.uint32)  # arithmetic >> on int32 smears
    else:
        value = jnp.asarray(value, jnp.uint32)
    return tuple(_gather_bits(value >> i, dim) for i in range(dim))
