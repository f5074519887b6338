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


# ---------------------------------------------------------------------------
# Plane (struct-of-arrays) representation: a complex array is a tuple
# (re, im) of equal-shape float32 arrays.  This keeps the sample axis minor
# in every tensor -- the layout the TPU tiles natively -- where the
# pair-minor [..., 2] form forces T(2,128)/transposed layouts and relayout
# copies around matmuls (measured as the dominant pipeline cost).
# ---------------------------------------------------------------------------


def planes_from_complex(x):
    """numpy complex -> (re, im) float32 planes (host-side helper)."""
    x = np.asarray(x)
    return (np.ascontiguousarray(x.real, np.float32),
            np.ascontiguousarray(x.imag, np.float32))


def planes_to_complex(x) -> np.ndarray:
    """(re, im) planes -> numpy complex64 (host-side helper)."""
    return (np.asarray(x[0]) + 1j * np.asarray(x[1])).astype(np.complex64)


def planes_to_pairs(x) -> jnp.ndarray:
    """(re, im) planes -> pair array [..., 2] (interleaved I/Q wire form)."""
    return jnp.stack([x[0], x[1]], axis=-1)


def pairs_to_planes(a: jnp.ndarray):
    return a[..., 0], a[..., 1]


def pmul(a, b):
    """Elementwise complex multiply of plane tuples."""
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def pconj(a):
    return a[0], -a[1]


def pabs2(a) -> jnp.ndarray:
    return a[0] * a[0] + a[1] * a[1]


def pmap(f, *xs):
    """Apply a real-array function to each plane of the given tuples."""
    return tuple(f(*planes) for planes in zip(*xs))
