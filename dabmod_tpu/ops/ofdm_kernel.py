"""Fused OFDM IFFT + crest-factor-reduction Pallas TPU kernel.

The XLA CFR path (ops.ofdm.cfr_one_iteration) is HBM-bound: clip -> FFT ->
error-clip -> IFFT materialises every matmul stage of both transforms in
HBM (~40 tensor passes per batch measured; the CFR config ran at ~0.52x the
base config's throughput).  This kernel keeps the whole round trip
(IFFT(bins) -> clip -> FFT -> error-clip -> IFFT + clip/PAPR/MER statistics)
resident in VMEM: per batch it reads the bins once and writes the corrected
time-domain symbols once.

TPU-native transform layout.  Every DAB spacing is N = R * 128 with
R in {2, 4, 8, 16} (TM III/II/IV/I), so the DFT factorises as

    X[k1 + R*k2] = sum_n2 [ (sum_n1 x[n1*128 + n2] W_R^{n1 k1}) w_N^{n2 k1} ]
                   W_128^{n2 k2}

i.e. a 128-point stage that is a full-depth [*,128]x[128,128] MXU matmul
(100% systolic-array utilisation -- unlike the thin 32x64 stages of the
XLA four-step, which run at ~1/16 utilisation) and an R-point stage done as
radix-2 butterflies over the sublane axis of a [T, R, 128] tile: pure
full-lane VPU arithmetic with contiguous-slice pairing, no transposes.

Order bookkeeping: the frequency domain lives in "digit order" rows
(row p holds k1 = bitrev(p), lanes hold k2).  The forward row stage is
decimation-in-frequency (natural time in, bit-reversed k1 out) and the
inverse row stage is decimation-in-time (bit-reversed k1 in, natural time
out), so the only data reordering anywhere is a single XLA-side permuted
transpose of the *bins* before the kernel -- the three transforms
themselves never reorder data.

Reference behaviour implemented: src/OfdmGenerator.cpp:207-283 (IFFT bin
mapping + transform), :310-373 (cfr_one_iteration), :234-273 (PAPR + MER
statistics).  Statistics come back per symbol (clip counts, power sums,
peaks, MER numerator/denominator) so the batch reductions and the rotating
MER symbol selection happen on tiny [B, S] arrays outside.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128

# stats lane indices (kernel output [T, STATS] per symbol)
ST_NCLIP, ST_NERRCLIP, ST_POW_BEFORE, ST_PEAK_BEFORE, \
    ST_POW_AFTER, ST_PEAK_AFTER, ST_MER_DEN, ST_PAD = range(8)
STATS = 8


def _bitrev(r: int) -> np.ndarray:
    bits = r.bit_length() - 1
    out = np.zeros(r, np.int64)
    for i in range(r):
        v, x = 0, i
        for _ in range(bits):
            v = (v << 1) | (x & 1)
            x >>= 1
        out[i] = v
    return out


@lru_cache(maxsize=None)
def _consts(n: int):
    """Transform constants for N = R*128 (numpy, cached)."""
    assert n % LANES == 0, n
    r = n // LANES
    assert r & (r - 1) == 0 and r >= 2, f"spacing {n} needs power-of-two R"
    sigma = _bitrev(r)
    n2 = np.arange(LANES)
    k2 = np.arange(LANES)
    w = np.exp(-2j * np.pi * np.outer(n2, k2) / LANES)
    k1 = sigma[:, None]                     # row p holds k1 = bitrev(p)
    twf = np.exp(-2j * np.pi * k1 * n2[None, :] / n)
    f32 = np.float32
    return (r, sigma,
            w.real.astype(f32), w.imag.astype(f32),
            twf.real.astype(f32), twf.imag.astype(f32))


def _stage_w(j: int, m: int, sign: float):
    """exp(sign*2i*pi*j/m) as exact-snapped Python float scalars."""
    ang = sign * 2.0 * np.pi * j / m
    c, s = float(np.cos(ang)), float(np.sin(ang))
    for v in (-1.0, 0.0, 1.0):
        if abs(c - v) < 1e-12:
            c = v
        if abs(s - v) < 1e-12:
            s = v
    return c, s


def _scalar_cmul(br, bi, c: float, s: float):
    """(br + i bi) * (c + i s) with Python-scalar weights; the quarter-turn
    weights (the bulk of radix-2 butterflies) cost no multiplies at all.
    Scalars keep the kernel free of captured array constants, which
    pallas_call rejects."""
    if (c, s) == (1.0, 0.0):
        return br, bi
    if (c, s) == (-1.0, 0.0):
        return -br, -bi
    if (c, s) == (0.0, 1.0):
        return -bi, br
    if (c, s) == (0.0, -1.0):
        return bi, -br
    return br * c - bi * s, br * s + bi * c


def _rows_dif(xr, xi, r: int, sign: float):
    """Radix-2 decimation-in-frequency over the R axis of [T, R, 128]:
    natural order in, bit-reversed order out.  Contiguous-slice butterflies
    only -- full-lane VPU arithmetic, no gathers."""
    t = xr.shape[0]
    m = r
    while m >= 2:
        g = r // m
        xr = xr.reshape(t, g, m, LANES)
        xi = xi.reshape(t, g, m, LANES)
        h = m // 2
        outs_r = [None] * m
        outs_i = [None] * m
        for j in range(h):
            ar, ai = xr[:, :, j:j + 1], xi[:, :, j:j + 1]
            br, bi = xr[:, :, j + h:j + h + 1], xi[:, :, j + h:j + h + 1]
            outs_r[j] = ar + br
            outs_i[j] = ai + bi
            c, s = _stage_w(j, m, sign)
            outs_r[j + h], outs_i[j + h] = _scalar_cmul(
                ar - br, ai - bi, c, s)
        xr = jnp.concatenate(outs_r, axis=2).reshape(t, r, LANES)
        xi = jnp.concatenate(outs_i, axis=2).reshape(t, r, LANES)
        m //= 2
    return xr, xi


def _rows_dit(xr, xi, r: int, sign: float):
    """Radix-2 decimation-in-time over the R axis of [T, R, 128]:
    bit-reversed order in, natural order out."""
    t = xr.shape[0]
    m = 2
    while m <= r:
        g = r // m
        xr = xr.reshape(t, g, m, LANES)
        xi = xi.reshape(t, g, m, LANES)
        h = m // 2
        outs_r = [None] * m
        outs_i = [None] * m
        for j in range(h):
            ar, ai = xr[:, :, j:j + 1], xi[:, :, j:j + 1]
            br, bi = xr[:, :, j + h:j + h + 1], xi[:, :, j + h:j + h + 1]
            c, s = _stage_w(j, m, sign)
            tr, ti = _scalar_cmul(br, bi, c, s)
            outs_r[j] = ar + tr
            outs_i[j] = ai + ti
            outs_r[j + h] = ar - tr
            outs_i[j + h] = ai - ti
        xr = jnp.concatenate(outs_r, axis=2).reshape(t, r, LANES)
        xi = jnp.concatenate(outs_i, axis=2).reshape(t, r, LANES)
        m *= 2
    return xr, xi


def _cmm(xr, xi, wr, wi, precision):
    """Complex [M,128] @ [128,128] as real MXU matmuls.

    Mosaic only lowers DEFAULT/HIGHEST dot precision; HIGH (3-pass bf16,
    the pipeline's configured FFT precision, ops/fft.py:26-30) is emulated
    by splitting each f32 operand into high/low bfloat16 parts and summing
    the three significant cross products -- same arithmetic XLA emits for
    Precision.HIGH, ~2x cheaper than HIGHEST's six passes."""
    if precision == jax.lax.Precision.HIGH:
        def dot(x, w):
            x_hi = x.astype(jnp.bfloat16)
            x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            w_hi = w.astype(jnp.bfloat16)
            w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            d = partial(jax.lax.dot, preferred_element_type=jnp.float32)
            return d(x_hi, w_hi) + (d(x_lo, w_hi) + d(x_hi, w_lo))
    else:
        dot = partial(jax.lax.dot, precision=precision,
                      preferred_element_type=jnp.float32)
    return dot(xr, wr) - dot(xi, wi), dot(xr, wi) + dot(xi, wr)


def _ctwiddle(xr, xi, twr, twi):
    """(xr + i xi) * (twr + i twi) elementwise, tw broadcast [R,128]."""
    return xr * twr - xi * twi, xr * twi + xi * twr


def _ifft_digit(xr, xi, r, wr, wi, twf_r, twf_i, precision):
    """Unnormalised backward transform (FFTW_BACKWARD): digit-order
    frequency rows [T, R, 128] -> natural time [T, R, 128].
    Inverse constants are the conjugates of the forward ones."""
    t = xr.shape[0]
    yr, yi = _cmm(xr.reshape(t * r, LANES), xi.reshape(t * r, LANES),
                  wr, -wi, precision)
    yr = yr.reshape(t, r, LANES)
    yi = yi.reshape(t, r, LANES)
    yr, yi = _ctwiddle(yr, yi, twf_r, -twf_i)
    return _rows_dit(yr, yi, r, sign=+1.0)


def _fft_natural(xr, xi, r, wr, wi, twf_r, twf_i, precision):
    """Unnormalised forward transform (FFTW_FORWARD): natural time
    [T, R, 128] -> digit-order frequency rows [T, R, 128]."""
    t = xr.shape[0]
    yr, yi = _rows_dif(xr, xi, r, sign=-1.0)
    yr, yi = _ctwiddle(yr, yi, twf_r, twf_i)
    zr, zi = _cmm(yr.reshape(t * r, LANES), yi.reshape(t * r, LANES),
                  wr, wi, precision)
    return zr.reshape(t, r, LANES), zi.reshape(t, r, LANES)


def _amp_clip(xr, xi, limit: float):
    """Clip complex samples to amplitude `limit`; returns (clipped planes,
    over mask).  Matches ops.ofdm.cfr_clip exactly."""
    mag2 = xr * xr + xi * xi
    over = mag2 > (limit * limit)
    scale = jnp.where(
        over,
        jnp.sqrt((limit * limit) / jnp.where(mag2 > 0, mag2, 1.0)),
        1.0)
    return xr * scale, xi * scale, over


def _pick_chunk(bs: int, r: int, target_rows: int = 512) -> int:
    """Symbols per grid step: the largest divisor T of bs with
    T*R <= target_rows (keeps the working set a few MB of VMEM while the
    MXU matmuls stay several hundred rows deep)."""
    t_max = max(1, target_rows // r)
    best = 1
    for t in range(1, t_max + 1):
        if bs % t == 0:
            best = t
    return best


def build_ofdm_backend(spacing: int, enable_cfr: bool, cfr_clip: float,
                       cfr_error_clip: float, precision=None,
                       interpret: bool = False, carrier_map=None):
    """Build the fused backend: bins planes [B, S, N] (natural bin order) ->
    (td planes [B, S, N], stats [B, S, 8] or None).

    td matches ops.ofdm.ofdm_ifft (+ cfr_one_iteration when enable_cfr)
    within f32 rounding; stats lanes are the ST_* per-symbol reductions.

    carrier_map=(bin_src, bin_valid) switches the input contract to
    carrier-order symbol planes [B, S, C]: the carrier->bin placement
    (ops.ofdm.to_bins_slices) and the bin->digit-row reorder compose into
    ONE static gather, deleting two full HBM round-trips over the symbol
    array (the separate swapaxes+take digit pass measured ~2x the pallas
    transform itself at TM-I batch 24).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if precision is None:
        precision = jax.lax.Precision.HIGH
    n = spacing
    r, sigma, wr_np, wi_np, twf_r_np, twf_i_np = _consts(n)
    inv_n = np.float32(1.0 / n)

    def kernel(br_ref, bi_ref, wr_ref, wi_ref, twr_ref, twi_ref,
               tdr_ref, tdi_ref, *maybe_stats):
        br, bi = br_ref[:], bi_ref[:]                # [T, R, 128] digit
        wr, wi = wr_ref[:], wi_ref[:]
        twr, twi = twr_ref[:], twi_ref[:]
        xr, xi = _ifft_digit(br, bi, r, wr, wi, twr, twi, precision)
        if not enable_cfr:
            tdr_ref[:] = xr
            tdi_ref[:] = xi
            return
        stats_ref = maybe_stats[0]
        pow_before = xr * xr + xi * xi               # [T, R, 128]
        cr, ci, over = _amp_clip(xr, xi, cfr_clip)
        sr, si = _fft_natural(cr, ci, r, wr, wi, twr, twi, precision)
        sr = sr * inv_n
        si = si * inv_n
        er = br - sr
        ei = bi - si
        err2 = er * er + ei * ei
        over_e = err2 > (cfr_error_clip * cfr_error_clip)
        escale = jnp.where(
            over_e,
            jnp.sqrt((cfr_error_clip * cfr_error_clip)
                     / jnp.where(err2 > 0, err2, 1.0)),
            1.0)
        or_, oi = _ifft_digit(sr + er * escale, si + ei * escale,
                              r, wr, wi, twr, twi, precision)
        tdr_ref[:] = or_
        tdi_ref[:] = oi

        dr = or_ - xr
        di = oi - xi
        pow_after = or_ * or_ + oi * oi

        # per-symbol reductions, kept >=2D throughout (Mosaic's vector
        # layouts do not support rank-1 intermediates)
        def colsum(x):                              # [T,R,128] -> [T,1]
            return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

        def colmax(x):
            return jnp.max(jnp.max(x, axis=2), axis=1, keepdims=True)

        cols = [
            colsum(over.astype(jnp.float32)),                    # NCLIP
            colsum(over_e.astype(jnp.float32)),                  # NERRCLIP
            colsum(pow_before),                                  # POW_BEFORE
            colmax(pow_before),                                  # PEAK_BEFORE
            colsum(pow_after),                                   # POW_AFTER
            colmax(pow_after),                                   # PEAK_AFTER
            colsum(dr * dr + di * di),                           # MER_DEN
            jnp.zeros((br.shape[0], 1), jnp.float32),            # PAD
        ]
        # stats block is [1, T, STATS]: with T and STATS equal to the full
        # trailing array dims the block is always Mosaic-legal, for any
        # chunk size (2D [T, STATS] blocks would need T % 8 == 0)
        stats_ref[:] = jnp.concatenate(cols, axis=1)[None]

    # NOTE: keep these as host NumPy.  A pre-created device array closed
    # over by a jitted caller is fetched back to the host at lowering time
    # (mlir ir_constant -> Array._value); NumPy constants embed directly.
    wr_j = np.asarray(wr_np)
    wi_j = np.asarray(wi_np)
    twr_j = np.asarray(twf_r_np)
    twi_j = np.asarray(twf_i_np)
    perm = np.asarray(sigma)

    digit_idx = None
    if carrier_map is not None:
        bin_src, bin_valid = (np.asarray(a) for a in carrier_map)
        n_carriers = int(np.count_nonzero(bin_valid))
        # digit row p lane k reads natural bin k*R + sigma(p); compose
        # with the carrier->bin map, sending empty bins to the appended
        # zero column (index C)
        bidx = np.arange(LANES)[None, :] * r + perm[:, None]     # [R, 128]
        digit_valid = (bin_valid[bidx] > 0)
        # clamped source + multiplicative mask: the mask fuses into the
        # gather output (a zero-column concat would copy the whole array)
        digit_idx = np.where(digit_valid, bin_src[bidx],
                             0).astype(np.int32).reshape(-1)
        digit_mask = digit_valid.astype(np.float32)              # [R, 128]

    def apply(bins):
        binr, bini = bins
        b, s, width = binr.shape
        bs = b * s
        t = _pick_chunk(bs, r)
        grid = bs // t

        if digit_idx is not None:
            assert width == n_carriers, (width, n_carriers)

            def to_digit(x):
                v = x.reshape(bs, width)[:, digit_idx]
                return v.reshape(bs, r, LANES) * digit_mask
        else:
            assert width == n, (width, n)

            def to_digit(x):
                # natural bins -> digit rows: row p = bins[sigma(p) + R*k2]
                v = x.reshape(bs, LANES, r)
                return jnp.take(jnp.swapaxes(v, 1, 2), perm, axis=1)

        bd_r, bd_i = to_digit(binr), to_digit(bini)

        data_spec = pl.BlockSpec((t, r, LANES), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        mat_spec = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        tw_spec = pl.BlockSpec((r, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        out_shapes = [jax.ShapeDtypeStruct((bs, r, LANES), jnp.float32),
                      jax.ShapeDtypeStruct((bs, r, LANES), jnp.float32)]
        out_specs = [data_spec, data_spec]
        if enable_cfr:
            out_shapes.append(
                jax.ShapeDtypeStruct((grid, t, STATS), jnp.float32))
            out_specs.append(
                pl.BlockSpec((1, t, STATS), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM))

        res = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[data_spec, data_spec, mat_spec, mat_spec,
                      tw_spec, tw_spec],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(bd_r, bd_i, wr_j, wi_j, twr_j, twi_j)

        td = (res[0].reshape(b, s, n), res[1].reshape(b, s, n))
        # [grid, T, STATS] row-major == [bs, STATS] == [B, S, STATS]
        stats = res[2].reshape(b, s, STATS) if enable_cfr else None
        return td, stats

    return apply
