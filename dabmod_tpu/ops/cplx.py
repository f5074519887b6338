"""Complex arithmetic in pair representation: arrays of shape [..., 2]
holding (real, imag) as float32.

The axon TPU backend rejects complex64 outright, and on TPU hardware complex
is software-emulated anyway -- the MXU and VPU operate on real floats.  The
trailing-pair layout keeps I and Q adjacent (exactly the interleaved wire
format every output sink wants) and lets the FFT become plain real matmuls.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def from_complex(x) -> np.ndarray:
    """numpy complex -> [..., 2] float32 pairs (host-side helper)."""
    x = np.asarray(x)
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def to_complex(x) -> np.ndarray:
    """[..., 2] pairs -> numpy complex64 (host-side helper)."""
    x = np.asarray(x)
    return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)


def cmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise complex multiply of pair arrays."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def cmul_real(a: jnp.ndarray, s) -> jnp.ndarray:
    """Multiply pair array by a real scalar/array (broadcast over the pair)."""
    return a * s[..., None] if hasattr(s, "ndim") and s.ndim else a * s


def conj(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def abs2(a: jnp.ndarray) -> jnp.ndarray:
    """|a|^2 as a real array (pair axis reduced)."""
    return a[..., 0] * a[..., 0] + a[..., 1] * a[..., 1]
