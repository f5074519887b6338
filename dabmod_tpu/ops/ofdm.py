"""OFDM-side ops: QPSK mapping, frequency interleaving, pi/4-DQPSK,
IFFT + CFR, gain control, guard interval insertion.

Phase-domain design: every constellation point entering the differential
modulator is an eighth-turn phasor exp(i*pi/4*q).  The reference multiplies
complex floats symbol-by-symbol (src/DifferentialModulator.cpp:45-76); here
the product chain is an exact integer cumulative sum of phase indices mod 8,
which is both faster (int ops, no FP error accumulation) and bit-stable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables


def qpsk_phase_indices(tf_bits: jnp.ndarray, carriers: int) -> jnp.ndarray:
    """[B, n_bits] TF bit stream -> [B, L, carriers] phase indices (pi/4 units).

    Per symbol the first `carriers` bits are I, the next `carriers` are Q
    (ref: src/QpskSymbolMapper.cpp:39-213).
    """
    B, nbits = tf_bits.shape
    L = nbits // (2 * carriers)
    biq = tf_bits.reshape(B, L, 2, carriers)
    lut = jnp.asarray(tables.QPSK_PHASE)
    return lut[(biq[:, :, 0] << 1) | biq[:, :, 1]]


def freq_interleave(sym_q: jnp.ndarray, inv_perm: jnp.ndarray) -> jnp.ndarray:
    """Apply the frequency interleaver as a gather (out[k] = in[inv[k]])."""
    return sym_q[..., inv_perm]


def diff_modulate(sym_q: jnp.ndarray, ref_q: jnp.ndarray) -> jnp.ndarray:
    """pi/4-DQPSK as an integer phase cumsum.

    sym_q: [B, L, C] data-symbol phase indices; ref_q: [C] phase reference.
    Returns [B, L+1, C] (symbol 0 = phase reference).
    """
    B = sym_q.shape[0]
    ref = jnp.broadcast_to(ref_q.astype(jnp.int32), (B, 1, sym_q.shape[2]))
    phases = jnp.concatenate([ref, sym_q.astype(jnp.int32)], axis=1)
    return jnp.cumsum(phases, axis=1) & 7


def phases_to_carriers(phases: jnp.ndarray) -> jnp.ndarray:
    """Phase indices -> complex64 carrier values."""
    return jnp.asarray(tables.PHASE_LUT)[phases]


def to_bins(carriers_vals: jnp.ndarray, src_idx: jnp.ndarray,
            valid: jnp.ndarray) -> jnp.ndarray:
    """Map carrier vectors [..., C] onto IFFT bins [..., spacing]
    (ref: src/OfdmGenerator.cpp:77-103, inverse direction)."""
    return carriers_vals[..., src_idx] * valid


def ofdm_ifft(bins: jnp.ndarray) -> jnp.ndarray:
    """Unnormalised inverse FFT matching FFTW_BACKWARD
    (ref: src/OfdmGenerator.cpp:109-111, 228)."""
    n = bins.shape[-1]
    return jnp.fft.ifft(bins, axis=-1) * n


def ofdm_fft(x: jnp.ndarray) -> jnp.ndarray:
    """Forward unnormalised FFT (FFTW_FORWARD)."""
    return jnp.fft.fft(x, axis=-1)


def cfr_clip(symbols: jnp.ndarray, clip: float):
    """Clip samples to amplitude `clip`; returns (clipped, n_clipped)."""
    mag_sq = (symbols.real * symbols.real + symbols.imag * symbols.imag)
    over = mag_sq > (clip * clip)
    scale = jnp.where(over, jnp.sqrt((clip * clip) / jnp.where(
        mag_sq > 0, mag_sq, 1.0)), 1.0)
    return symbols * scale.astype(symbols.real.dtype), over.sum(axis=(-2, -1))


def cfr_one_iteration(symbols: jnp.ndarray, reference_bins: jnp.ndarray,
                      clip: float, error_clip: float):
    """One crest-factor-reduction iteration over [..., S, spacing] symbols
    (ref: src/OfdmGenerator.cpp:310-373).

    Clip in time domain, FFT, clip the frequency-domain error against the
    reference constellation, IFFT back.  Returns (out, clip_count,
    errclip_count).
    """
    n = symbols.shape[-1]
    clipped, n_clip = cfr_clip(symbols, clip)
    spectrum = ofdm_fft(clipped) / n
    error = reference_bins - spectrum
    err_sq = error.real * error.real + error.imag * error.imag
    over = err_sq > (error_clip * error_clip)
    scale = jnp.where(over, jnp.sqrt((error_clip * error_clip) / jnp.where(
        err_sq > 0, err_sq, 1.0)), 1.0)
    error = error * scale.astype(error.real.dtype)
    out = ofdm_ifft(spectrum + error)
    return out, n_clip, over.sum(axis=(-2, -1))


# ---------------------------------------------------------------------------
# Gain control (ref: src/GainControl.cpp, scalar paths :344-502)
# ---------------------------------------------------------------------------

GAIN_FIX, GAIN_MAX, GAIN_VAR = 0, 1, 2


def compute_gain(symbols: jnp.ndarray, mode: int, var_k: float) -> jnp.ndarray:
    """Per-symbol gain factor for [..., S, spacing] symbols -> [..., S].

    The NULL symbol (index 0) takes the gain computed from symbol 1 for
    consistent TII power (ref: src/GainControl.cpp:135-144).
    """
    factor = 32767.0
    if mode == GAIN_FIX:
        g = jnp.full(symbols.shape[:-1], 512.0, dtype=jnp.float32)
    elif mode == GAIN_MAX:
        mx = jnp.maximum(jnp.max(jnp.abs(symbols.real), axis=-1),
                         jnp.max(jnp.abs(symbols.imag), axis=-1))
        g = jnp.where(jnp.floor(mx) == 0, 1.0, factor / mx)
    elif mode == GAIN_VAR:
        mean = jnp.mean(symbols, axis=-1, keepdims=True)
        d = symbols - mean
        # component-wise variance, split across even/odd samples exactly as
        # the reference's SSE-emulating scalar code does
        dsq_re = d.real * d.real
        dsq_im = d.imag * d.imag
        var_re = (jnp.mean(dsq_re[..., 0::2], axis=-1)
                  + jnp.mean(dsq_re[..., 1::2], axis=-1)) * 0.5
        var_im = (jnp.mean(dsq_im[..., 0::2], axis=-1)
                  + jnp.mean(dsq_im[..., 1::2], axis=-1)) * 0.5
        sig = jnp.maximum(jnp.sqrt(var_re), jnp.sqrt(var_im)) * var_k
        g = jnp.where(jnp.floor(sig) == 0, 1.0, factor / sig)
    else:
        raise ValueError(f"invalid gain mode {mode}")
    # NULL symbol borrows the next symbol's gain
    return jnp.concatenate([g[..., 1:2], g[..., 1:]], axis=-1)


def apply_gain(symbols: jnp.ndarray, gains: jnp.ndarray,
               constant_gain: float) -> jnp.ndarray:
    return symbols * (gains * constant_gain)[..., None].astype(jnp.complex64)


# ---------------------------------------------------------------------------
# Guard interval insertion (+ optional raised-cosine windowing)
# ---------------------------------------------------------------------------


def guard_interval(symbols: jnp.ndarray, gi_tables) -> jnp.ndarray:
    """[..., S, spacing] -> [..., tf_samples] via the static overlap-add
    tables from tables.guard_interval_tables."""
    idx_a, w_a, idx_b, w_b = gi_tables
    flat = symbols.reshape(*symbols.shape[:-2], -1)
    flat = jnp.concatenate(
        [flat, jnp.zeros((*flat.shape[:-1], 1), flat.dtype)], axis=-1)
    out = flat[..., idx_a] * w_a
    if np.any(np.asarray(w_b) != 0):
        out = out + flat[..., idx_b] * w_b
    return out
