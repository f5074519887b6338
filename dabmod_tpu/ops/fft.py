"""FFT as factorized real matmuls on the MXU (pair representation).

The reference uses FFTW (src/OfdmGenerator.cpp:109-117) / KISS for its
transforms; on TPU the idiomatic formulation is the four-step Cooley-Tukey
algorithm with the two stage-DFTs expressed as matrix multiplies, which maps
straight onto the 128x128 systolic array:

    N = A*B,  x viewed as [A, B] with n = a*B + b
    Y1[k1,b] = sum_a x[a,b] * W_A[a,k1]          (matmul over a)
    Y2[k1,b] = Y1[k1,b] * tw[k1,b]               (elementwise twiddle)
    Y3[k1,k2] = sum_b Y2[k1,b] * W_B[b,k2]       (matmul over b)
    X[k2*A + k1] = Y3[k1,k2]

Complex values are (re, im) float32 pairs; each complex matmul is four real
matmuls run at HIGHEST precision (full f32 on the MXU).  Transforms are
unnormalised, matching FFTW_FORWARD / FFTW_BACKWARD semantics.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# f32 matmul precision on the MXU: "high" (3-pass bf16) gives ~98 dB MER
# against a float64 reference -- beyond the reference modulator's own 90 dB
# display clamp (src/OfdmGenerator.cpp:269-271) -- at ~15% more throughput
# than "highest"; "default" (1-pass bf16) degrades MER to ~53 dB.
_PRECISION = jax.lax.Precision.HIGH


def set_precision(name: str) -> None:
    global _PRECISION
    _PRECISION = {"default": jax.lax.Precision.DEFAULT,
                  "high": jax.lax.Precision.HIGH,
                  "highest": jax.lax.Precision.HIGHEST}[name]


def _best_factors(n: int) -> tuple[int, int]:
    """Split n (power of two here, but works generally) as A*B with A <= B
    both as close to sqrt(n) as possible."""
    a = 1
    for c in range(1, int(np.sqrt(n)) + 1):
        if n % c == 0:
            a = c
    return a, n // a


@lru_cache(maxsize=None)
def _direct_plan(n: int, inverse: bool):
    sign = 2j if inverse else -2j
    w = np.exp(sign * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


@lru_cache(maxsize=None)
def _plan(n: int, inverse: bool):
    # NOTE: cached values must be NumPy, never jnp arrays -- this function is
    # reached inside jit traces, where jnp.asarray would cache a tracer.
    a, b = _best_factors(n)
    sign = 2j if inverse else -2j
    wa = np.exp(sign * np.pi * np.outer(np.arange(a), np.arange(a)) / a)
    wb = np.exp(sign * np.pi * np.outer(np.arange(b), np.arange(b)) / b)
    tw = np.exp(sign * np.pi * np.outer(np.arange(a), np.arange(b)) / n)
    f32 = np.float32
    return (a, b,
            wa.real.astype(f32), wa.imag.astype(f32),
            wb.real.astype(f32), wb.imag.astype(f32),
            tw.real.astype(f32), tw.imag.astype(f32))


def _dft_planes(xr: jnp.ndarray, xi: jnp.ndarray, inverse: bool):
    """Unnormalised DFT of separate (re, im) planes along the last axis.

    The plane (struct-of-arrays) form is the TPU-native representation:
    every tensor keeps the sample axis minor, so all stages tile onto
    (8,128) registers without the T(2,128)/transposed layouts XLA assigns
    to pair-minor [..., 2] arrays (measured as the dominant cost of the
    pair-domain pipeline).
    """
    n = xr.shape[-1]
    if n <= 256:
        # single full-depth matmul beats two thin 16-point stages: the MXU
        # contracts 256 deep at full utilisation and no twiddle/transpose
        # materialisations are needed (TM-III's 256-point IFFT)
        wr, wi = _direct_plan(n, inverse)
        mm = partial(jnp.einsum, precision=_PRECISION)
        yr = mm("...b,bc->...c", xr, wr) - mm("...b,bc->...c", xi, wi)
        yi = mm("...b,bc->...c", xr, wi) + mm("...b,bc->...c", xi, wr)
        return yr, yi
    a, b, war, wai, wbr, wbi, twr, twi = _plan(n, inverse)
    lead = xr.shape[:-1]
    # one-transpose four-step: transpose [.., a, b] -> [.., b, a] once,
    # then both stage matmuls contract the minor axis of their data
    # operand (the natural MXU form) and the final X[k2*A + k1] readout is
    # a plain row-major reshape -- no further relayout copies.
    xr = jnp.swapaxes(xr.reshape(*lead, a, b), -1, -2)
    xi = jnp.swapaxes(xi.reshape(*lead, a, b), -1, -2)

    mm = partial(jnp.einsum, precision=_PRECISION)
    # stage 1: DFT over a -> [.., b, k1]
    y1r = mm("...ba,ak->...bk", xr, war) - mm("...ba,ak->...bk", xi, wai)
    y1i = mm("...ba,ak->...bk", xr, wai) + mm("...ba,ak->...bk", xi, war)
    # twiddle tw[k1, b] applied in [.., b, k1] arrangement
    twr, twi = twr.T, twi.T
    y2r = y1r * twr - y1i * twi
    y2i = y1r * twi + y1i * twr
    # stage 2: DFT over b (the data operand's rows -- standard matmul RHS
    # form) -> [.., k2, k1]
    y3r = mm("...bk,bc->...ck", y2r, wbr) - mm("...bk,bc->...ck", y2i, wbi)
    y3i = mm("...bk,bc->...ck", y2r, wbi) + mm("...bk,bc->...ck", y2i, wbr)
    # X[k2*A + k1] = Y3[k2, k1]: row-major flatten
    return y3r.reshape(*lead, n), y3i.reshape(*lead, n)


def fft_planes(x):
    """Unnormalised forward DFT (FFTW_FORWARD) on (re, im) planes."""
    return _dft_planes(x[0], x[1], inverse=False)


def ifft_planes(x):
    """Unnormalised backward DFT (FFTW_BACKWARD) on (re, im) planes."""
    return _dft_planes(x[0], x[1], inverse=True)


def _fft_pairs(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Pair-array compatibility wrapper: [..., N, 2] along axis -2."""
    yr, yi = _dft_planes(x[..., 0], x[..., 1], inverse)
    return jnp.stack([yr, yi], axis=-1)


def fft_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalised forward DFT (FFTW_FORWARD) on [..., N, 2]."""
    return _fft_pairs(x, inverse=False)


def ifft_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalised backward DFT (FFTW_BACKWARD) on [..., N, 2]."""
    return _fft_pairs(x, inverse=True)
