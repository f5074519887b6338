"""OFDM-side ops: QPSK mapping, frequency interleaving, pi/4-DQPSK,
IFFT + CFR, gain control, guard interval insertion.

Two representation choices make this chain TPU-native:

* phase-index domain -- every constellation point entering the differential
  modulator is an eighth-turn phasor exp(i*pi/4*q); the reference's complex
  product chain (src/DifferentialModulator.cpp:45-76) becomes an exact
  integer cumulative sum mod 8.
* pair domain -- complex samples are [..., 2] float32 (see ops.cplx); the
  IFFT is factorized matmuls on the MXU (see ops.fft).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from . import cplx
from .fft import fft_pairs, ifft_pairs

# exp(i*pi/4*q) as (re, im) float32 rows, exact at the eighth-turn points
_s = np.float32(np.sqrt(0.5))
PHASE_TAB = np.array([
    [1, 0], [_s, _s], [0, 1], [-_s, _s],
    [-1, 0], [-_s, -_s], [0, -1], [_s, -_s]], dtype=np.float32)


def qpsk_phase_indices(tf_bits: jnp.ndarray, carriers: int) -> jnp.ndarray:
    """[B, n_bits] TF bit stream -> [B, L, carriers] phase indices (pi/4 units).

    Per symbol the first `carriers` bits are I, the next `carriers` are Q
    (ref: src/QpskSymbolMapper.cpp:39-213); q = [1,7,3,5][2*bI+bQ], computed
    arithmetically (q = 1 + 2i + 6q - 4iq) to avoid a dynamic gather.
    """
    B, nbits = tf_bits.shape
    L = nbits // (2 * carriers)
    biq = tf_bits.reshape(B, L, 2, carriers).astype(jnp.int32)
    bi, bq = biq[:, :, 0], biq[:, :, 1]
    return 1 + 2 * bi + 6 * bq - 4 * bi * bq


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
    """Phase indices -> [..., 2] float32 carrier pairs.

    Expressed as one-hot compares + FMAs (VPU vector code) rather than an
    8-entry dynamic gather, which is slow on TPU."""
    re = jnp.zeros(phases.shape, jnp.float32)
    im = jnp.zeros(phases.shape, jnp.float32)
    for d in range(8):
        hot = (phases == d)
        if PHASE_TAB[d, 0]:
            re = jnp.where(hot, jnp.float32(PHASE_TAB[d, 0]), re)
        if PHASE_TAB[d, 1]:
            im = jnp.where(hot, jnp.float32(PHASE_TAB[d, 1]), im)
    return jnp.stack([re, im], axis=-1)


def to_bins(carrier_vals: jnp.ndarray, src_idx: jnp.ndarray,
            valid: jnp.ndarray) -> jnp.ndarray:
    """Map carrier pair vectors [..., C, 2] onto IFFT bins [..., spacing, 2]
    (ref: src/OfdmGenerator.cpp:77-103, inverse direction)."""
    return carrier_vals[..., src_idx, :] * valid[..., None]


def to_bins_slices(carrier_vals: jnp.ndarray, carriers: int,
                   spacing: int) -> jnp.ndarray:
    """Gather-free bin mapping: the carrier->bin map is two contiguous block
    copies plus zero stripes, so express it as pad+concat."""
    pos_dst = 0 if (carriers & 1) else 1
    pos_size = (carriers + 1) // 2
    neg_size = carriers // 2
    lead = carrier_vals.shape[:-2]
    z = lambda n: jnp.zeros((*lead, n, 2), carrier_vals.dtype)
    mid = spacing - neg_size - pos_dst - pos_size
    return jnp.concatenate(
        [z(pos_dst), carrier_vals[..., :pos_size, :], z(mid),
         carrier_vals[..., pos_size:, :]], axis=-2)


def ofdm_ifft(bins: jnp.ndarray) -> jnp.ndarray:
    """Unnormalised backward transform matching FFTW_BACKWARD
    (ref: src/OfdmGenerator.cpp:109-111, 228)."""
    return ifft_pairs(bins)


def cfr_clip(symbols: jnp.ndarray, clip: float):
    """Clip pair samples to amplitude `clip`; returns (clipped, n_clipped)."""
    mag_sq = cplx.abs2(symbols)
    over = mag_sq > (clip * clip)
    scale = jnp.where(over, jnp.sqrt((clip * clip) / jnp.where(
        mag_sq > 0, mag_sq, 1.0)), 1.0)
    return symbols * scale[..., None], over.sum(axis=(-2, -1))


def cfr_one_iteration(symbols: jnp.ndarray, reference_bins: jnp.ndarray,
                      clip: float, error_clip: float):
    """One crest-factor-reduction iteration over [..., S, spacing, 2] symbols
    (ref: src/OfdmGenerator.cpp:310-373)."""
    n = symbols.shape[-2]
    clipped, n_clip = cfr_clip(symbols, clip)
    spectrum = fft_pairs(clipped) * (1.0 / n)
    error = reference_bins - spectrum
    err_sq = cplx.abs2(error)
    over = err_sq > (error_clip * error_clip)
    scale = jnp.where(over, jnp.sqrt((error_clip * error_clip) / jnp.where(
        err_sq > 0, err_sq, 1.0)), 1.0)
    error = error * scale[..., None]
    out = ifft_pairs(spectrum + error)
    return out, n_clip, over.sum(axis=(-2, -1))


# ---------------------------------------------------------------------------
# Gain control (ref: src/GainControl.cpp, scalar paths :344-502)
# ---------------------------------------------------------------------------

GAIN_FIX, GAIN_MAX, GAIN_VAR = 0, 1, 2


def compute_gain(symbols: jnp.ndarray, mode: int, var_k) -> jnp.ndarray:
    """Per-symbol gain for [..., S, spacing, 2] pairs -> [..., S].

    The NULL symbol (index 0) takes the gain computed from symbol 1 for
    consistent TII power (ref: src/GainControl.cpp:135-144)."""
    factor = 32767.0
    re, im = symbols[..., 0], symbols[..., 1]
    if mode == GAIN_FIX:
        g = jnp.full(symbols.shape[:-2], 512.0, dtype=jnp.float32)
    elif mode == GAIN_MAX:
        mx = jnp.maximum(jnp.max(jnp.abs(re), axis=-1),
                         jnp.max(jnp.abs(im), axis=-1))
        g = jnp.where(jnp.floor(mx) == 0, 1.0, factor / mx)
    elif mode == GAIN_VAR:
        mean = jnp.mean(symbols, axis=-2, keepdims=True)
        d = symbols - mean
        dr, di = d[..., 0], d[..., 1]
        # component-wise variance split across even/odd samples exactly as
        # the reference's SSE-emulating scalar code does
        var_re = (jnp.mean(dr[..., 0::2] ** 2, axis=-1)
                  + jnp.mean(dr[..., 1::2] ** 2, axis=-1)) * 0.5
        var_im = (jnp.mean(di[..., 0::2] ** 2, axis=-1)
                  + jnp.mean(di[..., 1::2] ** 2, axis=-1)) * 0.5
        sig = jnp.maximum(jnp.sqrt(var_re), jnp.sqrt(var_im)) * var_k
        g = jnp.where(jnp.floor(sig) == 0, 1.0, factor / sig)
    else:
        raise ValueError(f"invalid gain mode {mode}")
    # NULL symbol borrows the next symbol's gain
    return jnp.concatenate([g[..., 1:2], g[..., 1:]], axis=-1)


def apply_gain(symbols: jnp.ndarray, gains: jnp.ndarray,
               constant_gain) -> jnp.ndarray:
    return symbols * (gains * constant_gain)[..., None, None]


# ---------------------------------------------------------------------------
# Guard interval insertion (+ optional raised-cosine windowing)
# ---------------------------------------------------------------------------


def guard_interval_unwindowed(symbols: jnp.ndarray, null_size: int,
                              sym_size: int) -> jnp.ndarray:
    """Gather-free cyclic-prefix insertion for window_overlap == 0
    (ref: src/GuardIntervalInserter.cpp:301-318): each output symbol is
    [tail of symbol, full symbol], expressed as slices + concat."""
    spacing = symbols.shape[-2]
    lead = symbols.shape[:-3]
    null_pre = null_size - spacing
    sym_pre = sym_size - spacing
    null = jnp.concatenate(
        [symbols[..., 0, spacing - null_pre:, :], symbols[..., 0, :, :]],
        axis=-2)
    data = jnp.concatenate(
        [symbols[..., 1:, spacing - sym_pre:, :], symbols[..., 1:, :, :]],
        axis=-2)
    data = data.reshape(*lead, -1, 2)
    return jnp.concatenate([null, data], axis=-2)


def guard_interval_windowed(symbols: jnp.ndarray, null_size: int,
                            sym_size: int, ov: int) -> jnp.ndarray:
    """Gather-free raised-cosine windowed guard-interval insertion
    (ref: src/GuardIntervalInserter.cpp:96-299).

    Output decomposes into per-symbol blocks whose overlap regions are sums
    of two weighted slices shifted by one symbol -- all expressible as
    batched slices over the symbol axis.  symbols: [B, S, spacing, 2] with
    S = nb_symbols + 1 (NULL first).
    """
    B, S, sp, _ = symbols.shape
    pre = sym_size - sp
    npre = null_size - sp
    win = 0.5 * (1.0 - np.cos(np.pi * np.arange(2 * ov) / (2 * ov - 1)))
    win = win.astype(np.float32)
    rise1 = jnp.asarray(win[:ov])[:, None]          # 0 -> 0.5
    rise2 = jnp.asarray(win[ov:2 * ov])[:, None]    # 0.5 -> 1
    fall1 = jnp.asarray(win[2 * ov - 1:ov - 1:-1])[:, None]   # 1 -> 0.5
    fall2 = jnp.asarray(win[ov - 1::-1])[:, None]   # 0.5 -> 0

    data = symbols[:, 1:]                           # [B, S-1, sp, 2]
    # per-data-symbol pieces
    head_rise = data[:, :, 2 * sp - sym_size:2 * sp - sym_size + ov] * rise2
    # suffix of the previous symbol (NULL for s=1)
    prev = symbols[:, :-1]
    head_suffix = prev[:, :, :ov] * fall2
    head = head_rise + head_suffix                  # [B, S-1, ov, 2]

    mid_prefix = data[:, :, 2 * sp - sym_size + ov:sp]
    body = data[:, :, :sp - ov]

    # tail: own falling edge + next symbol's first rise half; the last
    # symbol keeps its unwindowed tail (no successor)
    tail_fall = data[:, :-1, sp - ov:] * fall1
    next_rise = data[:, 1:, 2 * sp - sym_size - ov:2 * sp - sym_size] * rise1
    tails = jnp.concatenate(
        [tail_fall + next_rise, data[:, -1:, sp - ov:]], axis=1)

    blocks = jnp.concatenate([head, mid_prefix, body, tails], axis=2)
    assert blocks.shape[2] == sym_size

    # NULL symbol block: plain prefix + body, own falling edge + first data
    # symbol's rise first half on the last ov samples
    null = symbols[:, 0]
    null_tail = null[:, sp - ov:] * fall1 \
        + data[:, 0, 2 * sp - sym_size - ov:2 * sp - sym_size] * rise1
    null_block = jnp.concatenate(
        [null[:, sp - npre:], null[:, :sp - ov], null_tail], axis=1)

    return jnp.concatenate(
        [null_block, blocks.reshape(B, -1, 2)], axis=1)


def guard_interval(symbols: jnp.ndarray, gi_tables) -> jnp.ndarray:
    """[..., S, spacing, 2] -> [..., tf_samples, 2] via the static
    overlap-add tables from tables.guard_interval_tables."""
    idx_a, w_a, idx_b, w_b = gi_tables
    flat = symbols.reshape(*symbols.shape[:-3], -1, 2)
    flat = jnp.concatenate(
        [flat, jnp.zeros((*flat.shape[:-2], 1, 2), flat.dtype)], axis=-2)
    out = flat[..., idx_a, :] * w_a[..., None]
    if np.any(np.asarray(w_b) != 0):
        out = out + flat[..., idx_b, :] * w_b[..., None]
    return out
