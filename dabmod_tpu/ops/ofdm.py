"""OFDM-side ops: QPSK mapping, frequency interleaving, pi/4-DQPSK,
IFFT + CFR, gain control, guard interval insertion.

Three representation choices make this chain TPU-native:

* phase-index domain -- every constellation point entering the differential
  modulator is an eighth-turn phasor exp(i*pi/4*q); the reference's complex
  product chain (src/DifferentialModulator.cpp:45-76) becomes an exact
  integer cumulative sum mod 8.
* plane (struct-of-arrays) domain -- complex samples are a tuple of
  (re, im) float32 arrays (see ops.cplx).  Keeping the sample axis minor in
  every tensor gives XLA clean (8,128) tilings; the earlier pair-minor
  [..., 2] form forced T(2,128)/transposed layouts whose relayout copies
  dominated the pipeline cost.
* the IFFT is factorized matmuls on the MXU (see ops.fft).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from . import cplx
from .fft import fft_planes, ifft_planes

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
    """Apply the frequency interleaver as a gather (out[k] = in[inv[k]]).

    Complex inputs are gathered as separate re/im planes: the TPU backend
    has no complex gather lowering (and the plane form is the layout the
    rest of the pipeline uses anyway)."""
    if jnp.iscomplexobj(sym_q):
        return (sym_q.real[..., inv_perm]
                + 1j * sym_q.imag[..., inv_perm])
    return sym_q[..., inv_perm]


def diff_modulate(sym_q: jnp.ndarray, ref_q: jnp.ndarray) -> jnp.ndarray:
    """pi/4-DQPSK as an integer phase cumsum.

    sym_q: [B, L, C] data-symbol phase indices; ref_q: [C] phase reference.
    Returns [B, L+1, C] (symbol 0 = phase reference).

    The cumsum over the (short) symbol axis runs as one MXU matmul with a
    lower-triangular ones operator instead of XLA's log-depth shifted-add
    lowering (~7 full HBM passes over the batch; measured 0.20 ms of a
    1.54 ms step).  Exact: phase indices are <= 7, partial sums <= 7*77 --
    both exact in bf16 inputs / f32 accumulation, so even DEFAULT matmul
    precision reproduces the integer cumsum bit-for-bit (asserted against
    the integer form in tests).
    """
    B = sym_q.shape[0]
    ref = jnp.broadcast_to(ref_q.astype(jnp.int32), (B, 1, sym_q.shape[2]))
    phases = jnp.concatenate([ref, sym_q.astype(jnp.int32)], axis=1)
    s = phases.shape[1]
    tri = np.tril(np.ones((s, s), np.float32)).T     # [s_in, s_out]
    csum = jnp.einsum("bsc,st->btc", phases.astype(jnp.float32),
                      jnp.asarray(tri),
                      precision=jax.lax.Precision.DEFAULT)
    return csum.astype(jnp.int32) & 7


def phases_to_carriers(phases: jnp.ndarray):
    """Phase indices -> (re, im) float32 carrier planes.

    Bit arithmetic on the eighth-turn index q (b2 b1 b0):

        odd q  (b0=1):  re = sqrt(1/2) * (1 - 2*(b1^b2))
                        im = sqrt(1/2) * (1 - 2*b2)
        even q (b0=0):  re = (1 - b1) * (1 - 2*b2)
                        im = b1       * (1 - 2*b2)

    ~6 integer VPU ops + 2 selects per element, vs the 8-compare /
    10-select one-hot chain this replaces (which was 7-8% of device time
    in the per-op profile)."""
    q = phases.astype(jnp.int32)
    b0 = q & 1
    b1 = (q >> 1) & 1
    b2 = (q >> 2) & 1
    sb2 = (1 - 2 * b2).astype(jnp.float32)
    odd = b0 == 1
    half = jnp.float32(np.sqrt(0.5))
    re = jnp.where(odd, half * (1 - 2 * (b1 ^ b2)).astype(jnp.float32),
                   (1 - b1).astype(jnp.float32) * sb2)
    im = jnp.where(odd, half * sb2, b1.astype(jnp.float32) * sb2)
    return re, im


def to_bins_slices(carriers_planes, carriers: int, spacing: int):
    """Gather-free bin mapping on (re, im) planes [..., C] -> [..., spacing]:
    the carrier->bin map is two contiguous block copies plus zero stripes,
    so express it as pad+concat (ref: src/OfdmGenerator.cpp:77-103)."""
    pos_dst = 0 if (carriers & 1) else 1
    pos_size = (carriers + 1) // 2
    neg_size = carriers // 2
    mid = spacing - neg_size - pos_dst - pos_size

    def one(x):
        lead = x.shape[:-1]
        z = lambda n: jnp.zeros((*lead, n), x.dtype)
        return jnp.concatenate(
            [z(pos_dst), x[..., :pos_size], z(mid), x[..., pos_size:]],
            axis=-1)
    return cplx.pmap(one, carriers_planes)


def ofdm_ifft(bins):
    """Unnormalised backward transform matching FFTW_BACKWARD
    (ref: src/OfdmGenerator.cpp:109-111, 228)."""
    return ifft_planes(bins)


def cfr_clip(symbols, clip: float):
    """Clip plane samples to amplitude `clip`; returns (clipped, n_clipped)."""
    mag_sq = cplx.pabs2(symbols)
    over = mag_sq > (clip * clip)
    scale = jnp.where(over, jnp.sqrt((clip * clip) / jnp.where(
        mag_sq > 0, mag_sq, 1.0)), 1.0)
    return cplx.pmap(lambda x: x * scale, symbols), over.sum(axis=(-2, -1))


def cfr_one_iteration(symbols, reference_bins, clip: float,
                      error_clip: float):
    """One crest-factor-reduction iteration over [..., S, spacing] planes
    (ref: src/OfdmGenerator.cpp:310-373)."""
    n = symbols[0].shape[-1]
    clipped, n_clip = cfr_clip(symbols, clip)
    sr, si = fft_planes(clipped)
    sr, si = sr * (1.0 / n), si * (1.0 / n)
    er = reference_bins[0] - sr
    ei = reference_bins[1] - si
    err_sq = er * er + ei * ei
    over = err_sq > (error_clip * error_clip)
    scale = jnp.where(over, jnp.sqrt((error_clip * error_clip) / jnp.where(
        err_sq > 0, err_sq, 1.0)), 1.0)
    out = ifft_planes((sr + er * scale, si + ei * scale))
    return out, n_clip, over.sum(axis=(-2, -1))


# ---------------------------------------------------------------------------
# Gain control (ref: src/GainControl.cpp, scalar paths :344-502)
# ---------------------------------------------------------------------------

GAIN_FIX, GAIN_MAX, GAIN_VAR = 0, 1, 2


def compute_gain(symbols, mode: int, var_k) -> jnp.ndarray:
    """Per-symbol gain for [..., S, spacing] planes -> [..., S].

    The NULL symbol (index 0) takes the gain computed from symbol 1 for
    consistent TII power (ref: src/GainControl.cpp:135-144)."""
    factor = 32767.0
    re, im = symbols
    if mode == GAIN_FIX:
        g = jnp.full(re.shape[:-1], 512.0, dtype=jnp.float32)
    elif mode == GAIN_MAX:
        mx = jnp.maximum(jnp.max(jnp.abs(re), axis=-1),
                         jnp.max(jnp.abs(im), axis=-1))
        g = jnp.where(jnp.floor(mx) == 0, 1.0, factor / mx)
    elif mode == GAIN_VAR:
        dr = re - jnp.mean(re, axis=-1, keepdims=True)
        di = im - jnp.mean(im, axis=-1, keepdims=True)
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


# ---------------------------------------------------------------------------
# Guard interval insertion (+ optional raised-cosine windowing)
# ---------------------------------------------------------------------------


def guard_interval_unwindowed(symbols, null_size: int, sym_size: int,
                              gains=None):
    """Gather-free cyclic-prefix insertion for window_overlap == 0
    (ref: src/GuardIntervalInserter.cpp:301-318): each output symbol is
    [tail of symbol, full symbol], expressed as slices + concat.
    symbols: (re, im) planes [B, S, spacing] -> [B, tf_samples].

    `gains` ([..., S], already including the constant gain) folds the
    GainControl multiply into each concat operand: the elementwise
    producer fuses into the assembly, deleting the separate
    read-modify-write pass over the full symbol array."""
    spacing = symbols[0].shape[-1]
    null_pre = null_size - spacing
    sym_pre = sym_size - spacing

    def one(x):
        lead = x.shape[:-2]
        if gains is not None:
            g0 = gains[..., 0, None]
            gd = gains[..., 1:, None]
            null = jnp.concatenate(
                [x[..., 0, spacing - null_pre:] * g0,
                 x[..., 0, :] * g0], axis=-1)
            data = jnp.concatenate(
                [x[..., 1:, spacing - sym_pre:] * gd,
                 x[..., 1:, :] * gd], axis=-1)
        else:
            null = jnp.concatenate(
                [x[..., 0, spacing - null_pre:], x[..., 0, :]], axis=-1)
            data = jnp.concatenate(
                [x[..., 1:, spacing - sym_pre:], x[..., 1:, :]], axis=-1)
        return jnp.concatenate(
            [null, data.reshape(*lead, -1)], axis=-1)
    return cplx.pmap(one, symbols)


def guard_interval_windowed(symbols, null_size: int, sym_size: int,
                            ov: int, gains=None):
    """Gather-free raised-cosine windowed guard-interval insertion
    (ref: src/GuardIntervalInserter.cpp:96-299).

    Output decomposes into per-symbol blocks whose overlap regions are sums
    of two weighted slices shifted by one symbol -- all expressible as
    batched slices over the symbol axis.  symbols: (re, im) planes
    [B, S, spacing] with S = nb_symbols + 1 (NULL first).

    `gains` ([B, S], already including the constant gain) folds the
    GainControl multiply into each slice operand so it fuses into the
    assembly; every overlap sample takes the gain of the symbol it came
    from, exactly like gain-before-GI in the reference chain."""
    B, S, sp = symbols[0].shape
    npre = null_size - sp
    win = 0.5 * (1.0 - np.cos(np.pi * np.arange(2 * ov) / (2 * ov - 1)))
    win = win.astype(np.float32)
    rise1 = jnp.asarray(win[:ov])                   # 0 -> 0.5
    rise2 = jnp.asarray(win[ov:2 * ov])             # 0.5 -> 1
    fall1 = jnp.asarray(win[2 * ov - 1:ov - 1:-1])  # 1 -> 0.5
    fall2 = jnp.asarray(win[ov - 1::-1])            # 0.5 -> 0

    if gains is None:
        g_all = g_null = g_data = None
    else:
        g_all = gains[..., None]                    # [B, S, 1]
        g_null = g_all[:, 0]                        # [B, 1]
        g_data = g_all[:, 1:]                       # [B, S-1, 1]

    def one(x):
        data = x[:, 1:]                             # [B, S-1, sp]
        # per-data-symbol pieces
        head_rise = data[:, :, 2 * sp - sym_size:2 * sp - sym_size + ov] \
            * (rise2 if gains is None else rise2 * g_data)
        # suffix of the previous symbol (NULL for s=1)
        head_suffix = x[:, :-1, :ov] \
            * (fall2 if gains is None else fall2 * g_all[:, :-1])
        head = head_rise + head_suffix              # [B, S-1, ov]

        mid_prefix = data[:, :, 2 * sp - sym_size + ov:sp]
        body = data[:, :, :sp - ov]
        if gains is not None:
            mid_prefix = mid_prefix * g_data
            body = body * g_data

        # tail: own falling edge + next symbol's first rise half; the last
        # symbol keeps its unwindowed tail (no successor)
        tail_fall = data[:, :-1, sp - ov:] \
            * (fall1 if gains is None else fall1 * g_data[:, :-1])
        next_rise = data[:, 1:, 2 * sp - sym_size - ov:2 * sp - sym_size] \
            * (rise1 if gains is None else rise1 * g_data[:, 1:])
        last_tail = data[:, -1:, sp - ov:]
        if gains is not None:
            last_tail = last_tail * g_data[:, -1:]
        tails = jnp.concatenate([tail_fall + next_rise, last_tail], axis=1)

        blocks = jnp.concatenate([head, mid_prefix, body, tails], axis=2)
        assert blocks.shape[2] == sym_size

        # NULL symbol block: plain prefix + body, own falling edge + first
        # data symbol's rise first half on the last ov samples
        null = x[:, 0]
        null_tail = null[:, sp - ov:] \
            * (fall1 if gains is None else fall1 * g_null) \
            + data[:, 0, 2 * sp - sym_size - ov:2 * sp - sym_size] \
            * (rise1 if gains is None else rise1 * g_data[:, 0])
        null_pre_body = jnp.concatenate(
            [null[:, sp - npre:], null[:, :sp - ov]], axis=1)
        if gains is not None:
            null_pre_body = null_pre_body * g_null
        null_block = jnp.concatenate([null_pre_body, null_tail], axis=1)

        return jnp.concatenate(
            [null_block, blocks.reshape(B, -1)], axis=1)
    return cplx.pmap(one, symbols)


def guard_interval(symbols: jnp.ndarray, gi_tables) -> jnp.ndarray:
    """[..., S, spacing, 2] pairs -> [..., tf_samples, 2] via the static
    overlap-add tables from tables.guard_interval_tables (reference form
    kept for validating the slice-based implementations)."""
    idx_a, w_a, idx_b, w_b = gi_tables
    flat = symbols.reshape(*symbols.shape[:-3], -1, 2)
    flat = jnp.concatenate(
        [flat, jnp.zeros((*flat.shape[:-2], 1, 2), flat.dtype)], axis=-2)
    out = flat[..., idx_a, :] * w_a[..., None]
    if np.any(np.asarray(w_b) != 0):
        out = out + flat[..., idx_b, :] * w_b[..., None]
    return out
