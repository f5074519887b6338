"""Post-OFDM filter stages: spectrum-mask FIR, fractional resampler,
memoryless-polynomial DPD, CIC equalizer, format conversion, PAPR stats.

All stages operate on pair-domain samples ([..., N, 2] float32, see
ops.cplx) with a leading batch axis of transmission frames.  The FIR keeps
the reference's deliberate truncation at the TF boundary
(src/FIRFilter.cpp:218-226), which makes TF batches embarrassingly parallel.
The resampler is reformulated from a sequential overlap-add loop
(src/Resampler.cpp:131-195) into a batched STFT: all blocks transform in
parallel and the half-window overlap-add becomes a shifted sum.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from .fft import fft_pairs, ifft_pairs

# 3-pass bf16 (HIGH) carries ~1e-7 relative matmul error -- far below the
# 120 dB filter designs here -- at half the MXU passes of HIGHEST
_PRECISION = jax.lax.Precision.HIGH


# ---------------------------------------------------------------------------
# FIR (ref: src/FIRFilter.cpp:144-228)
# out[n] = sum_j in[n+j] * taps[j], truncated at the end of each TF
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _fir_operator(taps_bytes: bytes, ntaps: int, block: int) -> np.ndarray:
    taps = np.frombuffer(taps_bytes, np.float32)
    F = block + ntaps
    T = np.zeros((F, block), np.float32)
    for i in range(block):
        T[i:i + ntaps, i] = taps
    return T


def _fir_operator_traced(taps: jnp.ndarray, block: int) -> jnp.ndarray:
    """In-graph banded operator from a *runtime-argument* taps vector:
    T[f, o] = taps[f - o] (0 where out of band).  Keeping taps a traced
    argument means an RC `tapsfile` reload is a plain array swap -- no
    retrace, no XLA recompile (the reference swaps taps under a mutex,
    src/FIRFilter.cpp:137-140; this is the jit-world equivalent).  The
    [block+ntaps, block] gather is negligible next to the matmuls."""
    ntaps = taps.shape[0]
    f = np.arange(block + ntaps)[:, None]
    o = np.arange(block)[None, :]
    idx = f - o
    mask = jnp.asarray((idx >= 0) & (idx < ntaps))
    return jnp.where(mask, taps[np.clip(idx, 0, ntaps - 1)], 0.0)


def _banded_apply(x: jnp.ndarray, T: jnp.ndarray, block: int,
                  halo: int) -> jnp.ndarray:
    """Apply a banded operator T [block+halo, out] to a real sample plane
    [..., N] framed into `block` rows with a right halo.  All reshapes are
    row-major bitcasts -- the plane form never leaves (8,128) tiling."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    nb = -(-n // block)
    pad = (nb + 1) * block - n            # round up + halo source block
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    base = xp[..., :nb * block].reshape(*lead, nb, block)
    ext = xp[..., block:(nb + 1) * block].reshape(*lead, nb, block)
    frames = jnp.concatenate([base, ext[..., :halo]], axis=-1)
    return jnp.einsum("...f,fo->...o", frames, T, precision=_PRECISION)


def fir_filter(x, taps, block: int = 128):
    """x: (re, im) planes [..., N]; taps: [ntaps] float32 -> planes.

    Banded-matmul formulation with lane-aligned framing: with block = 128
    the [*, N] -> [*, nb, 128] reshape is a free bitcast (the minor dim is
    exactly the TPU lane width), and the operator splits into two
    full-depth K=128 matmuls

        y[i] = x2d[i] @ A + x2d[i+1] @ B

    where A = T[:128] and only B's first ntaps rows are non-zero (same
    restructuring as ops/resampler_kernel.py, minus the Pallas kernel --
    FIR output stays in the plane domain so XLA's matmuls suffice).  The
    zero row appended per plane reproduces the reference's truncation at
    the TF boundary (src/FIRFilter.cpp:218-226).
    """
    traced = not isinstance(taps, (np.ndarray, list, tuple))
    if not traced:
        taps = np.asarray(taps, np.float32)
    ntaps = taps.shape[0] if traced else taps.size
    n = x[0].shape[-1]
    lead = x[0].shape[:-1]
    if n % block or ntaps > block:
        # irregular sizes: generic concat-framed einsum
        T = (_fir_operator_traced(taps, block) if traced
             else jnp.asarray(_fir_operator(taps.tobytes(), ntaps, block)))

        def one(p):
            y = _banded_apply(p, T, block, ntaps)
            return y.reshape(*lead, -1)[..., :n]
        return cplx.pmap(one, x)

    if traced:
        T = _fir_operator_traced(taps, block)
        A = T[:block]
        B = jnp.pad(T[block:], ((0, block - ntaps), (0, 0)))
    else:
        T = _fir_operator(taps.tobytes(), ntaps, block)
        A = jnp.asarray(np.ascontiguousarray(T[:block]))
        B_np = np.zeros((block, block), np.float32)
        B_np[:ntaps] = T[block:block + ntaps]
        B = jnp.asarray(B_np)
    nb = n // block

    def one(p):
        x2d = p.reshape(*lead, nb, block)              # bitcast
        zero = jnp.zeros((*lead, 1, block), p.dtype)
        nxt = jnp.concatenate([x2d[..., 1:, :], zero], axis=-2)
        y = (jnp.einsum("...f,fo->...o", x2d, A, precision=_PRECISION)
             + jnp.einsum("...f,fo->...o", nxt, B, precision=_PRECISION))
        return y.reshape(*lead, n)
    return cplx.pmap(one, x)


def fir_filter_shifts(x, taps: jnp.ndarray):
    """Shifted-add reference form of fir_filter (kept for validation)."""
    ntaps = taps.shape[0]
    n = x[0].shape[-1]

    def one(p):
        xp = jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(0, ntaps)])
        acc = xp[..., :n] * taps[0]
        for j in range(1, ntaps):
            acc = acc + xp[..., j:j + n] * taps[j]
        return acc
    return cplx.pmap(one, x)




# ---------------------------------------------------------------------------
# Fractional resampler (ref: src/Resampler.cpp)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ResamplerPlan:
    L: int
    M: int
    fft_in: int
    fft_out: int
    factor: float
    window: np.ndarray       # Hann window of length fft_in

    @classmethod
    def create(cls, input_rate: int, output_rate: int, resolution: int):
        g = np.gcd(input_rate, output_rate)
        L = output_rate // g
        M = input_rate // g
        factor = resolution * 2 // M
        if factor & 1:
            factor += 1
        fft_in = factor * M
        fft_out = factor * L
        if fft_in > fft_out:
            scale = 1.0 / fft_in * output_rate / input_rate
        else:
            scale = 1.0 / fft_out * output_rate / input_rate
        n = np.arange(fft_in)
        window = (0.5 * (1.0 - np.cos(2.0 * np.pi * n / (fft_in - 1)))
                  ).astype(np.float32)
        return cls(L, M, fft_in, fft_out, float(scale), window)


def resample(x: jnp.ndarray, plan: ResamplerPlan,
             in_tail: jnp.ndarray, out_tail: jnp.ndarray):
    """Frequency-domain L/M resampling of a flat pair stream.

    x: [N, 2] (N multiple of fft_in/2); in_tail: [fft_in/2, 2] carry of the
    previous call's last half-block; out_tail: [fft_out/2, 2] overlap-add
    carry.  Returns (y [N*L/M, 2], new_in_tail, new_out_tail).
    """
    hi, ho = plan.fft_in // 2, plan.fft_out // 2
    n_blocks = x.shape[0] // hi
    xp = jnp.concatenate([in_tail, x], axis=0)    # [(nb+1)*hi, 2]
    # 50%-overlapped frames as two shifted reshapes (no gather)
    frames = jnp.concatenate(
        [xp[:-hi].reshape(n_blocks, hi, 2), xp[hi:].reshape(n_blocks, hi, 2)],
        axis=1) * jnp.asarray(plan.window)[None, :, None]
    spec = fft_pairs(frames)
    if plan.fft_out > plan.fft_in:
        upper = spec[:, hi:]
        mid = jnp.zeros((n_blocks, plan.fft_out - plan.fft_in - 1, 2),
                        dtype=spec.dtype)
        # the bin at fft_in/2 is duplicated into both halves
        out_spec = jnp.concatenate([spec[:, :hi + 1], mid, upper], axis=1)
    elif plan.fft_out < plan.fft_in:
        lower = spec[:, :ho]
        upper = spec[:, plan.fft_in - ho:]
        centre = 0.5 * (spec[:, ho:ho + 1]
                        + spec[:, plan.fft_in - ho:plan.fft_in - ho + 1])
        out_spec = jnp.concatenate([lower, centre, upper[:, 1:]], axis=1)
    else:
        out_spec = spec
    out_spec = out_spec * plan.factor
    blocks = ifft_pairs(out_spec)
    first = blocks[:, :ho]
    second = blocks[:, ho:]
    # overlap-add: block b's second half adds onto block b+1's first half
    prev = jnp.concatenate([out_tail[None], second[:-1]], axis=0)
    y = (first + prev).reshape(-1, 2)
    return y, xp[-hi:], second[-1]


# ---------------------------------------------------------------------------
# Polyphase resampler (TPU-first formulation; same role as src/Resampler.cpp)
#
# The reference resamples in the frequency domain (Hann OLA blocks, FFT in /
# zero-pad / FFT out).  On TPU that formulation needs 4096/16384-point
# transforms expressed as thin matmuls -- the dominant cost of the resampler
# configs.  A windowed-sinc polyphase interpolator produces the same signal
# (within MER bound; the DAB spectrum occupies only 0.75 of the input
# Nyquist, leaving a wide transition band) at ~20x fewer FLOPs, and maps
# onto the MXU as one dense banded matmul:
#
#   frames [nb, block + 2*half] @ T [block + 2*half, block*L/M]
#
# where T[c, j] = h_up[j*M - (c - half)*L] is the precomputed banded
# interpolation operator.  The only sequential state is a 2*half-sample
# input carry; output lags input by exactly `half` input samples.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PolyphasePlan:
    L: int
    M: int
    half: int               # half-support in input samples
    block: int              # input samples per matmul row
    out_block: int          # block * L // M
    matrix: np.ndarray      # banded operator [block + 2*half, out_block]

    @classmethod
    def create(cls, input_rate: int, output_rate: int,
               atten_db: float = 120.0, block: int = 32):
        g = np.gcd(input_rate, output_rate)
        L = output_rate // g
        M = input_rate // g
        # make the block a multiple of M so out_block is integral
        if block % M:
            block = ((block + M - 1) // M) * M
        cut = min(1.0, L / M)          # passband gain edge, input-Nyquist units
        # Kaiser design: transition band is +/- cut/4 around the cutoff --
        # generous because the DAB spectrum stops at 0.75 of input Nyquist.
        d_omega = 0.5 * cut * np.pi / L   # transition width, upsampled domain
        n_total = int(np.ceil((atten_db - 7.95) / (2.285 * d_omega)))
        half = int(np.ceil(n_total / (2 * L)))
        beta = 0.1102 * (atten_db - 8.7)
        t = np.arange(-half * L, half * L + 1, dtype=np.float64)
        proto = cut * np.sinc(cut * t / L)
        proto *= np.i0(beta * np.sqrt(np.maximum(
            0.0, 1.0 - (t / (half * L)) ** 2))) / np.i0(beta)
        # passband gain: 1 for upsampling, L/M for downsampling (matches the
        # reference's spectrum scaling, src/Resampler.cpp:87-99)
        gain = 1.0 if L >= M else L / M
        # normalise per-phase DC response to remove periodic design ripple
        phase_sums = np.array([proto[(r + half * L) % L::L].sum()
                               for r in range(L)])
        proto = proto * (gain / phase_sums.mean())

        out_block = block * L // M
        F = block + 2 * half
        T = np.zeros((F, out_block), dtype=np.float64)
        for j in range(out_block):
            for c in range(F):
                tt = j * M - (c - half) * L
                if -half * L <= tt <= half * L:
                    T[c, j] = proto[tt + half * L]
        return cls(L, M, half, block, out_block, T.astype(np.float32))


def resample_poly(x, plan: PolyphasePlan, carry):
    """Polyphase L/M resampling of flat (re, im) sample planes.

    x: planes [N] with N a multiple of plan.block; carry: planes [2*half]
    of input history.  Returns (y planes [N*L/M], new_carry).  The output
    stream equals the resampled input stream delayed by `half` input
    samples.
    """
    h2 = 2 * plan.half
    T = jnp.asarray(plan.matrix)

    def one(p, c):
        xp = jnp.concatenate([c, p], axis=0)          # [N + 2h]
        nb = p.shape[0] // plan.block
        base = xp[:nb * plan.block].reshape(nb, plan.block)
        # halo: the 2h samples following each block (next block's head;
        # the final block's halo is the stream tail) -- slices, no gather
        ext = xp[plan.block:]
        pad = nb * plan.block - ext.shape[0]
        ext = jnp.pad(ext, ((0, pad),)).reshape(nb, plan.block)
        frames = jnp.concatenate([base, ext[:, :h2]], axis=1)  # [nb, F]
        y = jnp.einsum("nf,fo->no", frames, T, precision=_PRECISION)
        return y.reshape(-1), xp[-h2:]

    yr, cr = one(x[0], carry[0])
    yi, ci = one(x[1], carry[1])
    return (yr, yi), (cr, ci)


# ---------------------------------------------------------------------------
# Memoryless polynomial DPD (ref: src/MemlessPoly.cpp:237-276)
# ---------------------------------------------------------------------------


def memless_poly(x, coefs_am: jnp.ndarray, coefs_pm: jnp.ndarray):
    """Odd-order AM/AM + AM/PM predistortion with the reference's sin/cos
    series approximations (kept for output parity).  x: (re, im) planes."""
    m = cplx.pabs2(x)
    am = coefs_am[0] + m * (coefs_am[1] + m * (coefs_am[2] + m * (
        coefs_am[3] + m * coefs_am[4])))
    pm = -(coefs_pm[0] + m * (coefs_pm[1] + m * (coefs_pm[2] + m * (
        coefs_pm[3] + m * coefs_pm[4]))))
    p2 = pm * pm
    # reference's cos/sin polynomial approximations (coefficients as-is)
    rot_r = 1.0 - p2 * (-0.5 + p2 * (0.486666 + p2 * (-0.00138888)))
    rot_i = pm * (1.0 + p2 * (0.166666 + p2 * 0.00833333))
    return cplx.pmul((x[0] * am, x[1] * am), (rot_r, rot_i))


def memless_lut(x, lut: jnp.ndarray, scalefactor: float):
    """32-entry magnitude-binned LUT predistorter
    (ref: src/MemlessPoly.cpp:278-309).  lut: [32, 2] pairs."""
    mag = jnp.sqrt(cplx.pabs2(x))
    scaled = jnp.clip(jnp.round(mag * scalefactor), 0, 2.0**32 - 1)
    # top-5-bits bin index == scaled / 2^27, computed in float to avoid
    # unsupported 8/16-bit shifts on the device
    ix = jnp.clip((scaled / float(1 << 27)).astype(jnp.int32), 0, 31)
    return cplx.pmul(x, (lut[ix, 0], lut[ix, 1]))


# ---------------------------------------------------------------------------
# CIC equalizer (ref: src/CicEqualizer.cpp:29-92)
# ---------------------------------------------------------------------------


def cic_equalizer_taps(carriers: int, fft_size_over: float,
                       ratio: int) -> np.ndarray:
    """Per-carrier droop compensation, replicating the reference loop."""
    out = np.zeros(carriers, dtype=np.float32)
    R = float(ratio)
    M = 1.0
    for i in range(carriers):
        if i == carriers // 2:
            out[i] = 1.0
            continue
        theta = np.pi * (i - carriers / 2.0) / fft_size_over
        num = np.sin(theta / R) * R * M
        den = np.sin(theta * M)
        h = (num / den) ** 4 if den != 0 else 1.0
        out[i] = h
    return out


# ---------------------------------------------------------------------------
# Format conversion (ref: src/FormatConverter.cpp:62-206)
# ---------------------------------------------------------------------------


def format_convert(x: jnp.ndarray, fmt: str):
    """Device-side wire-format conversion with saturation + clip counting
    (ref: src/FormatConverter.cpp:62-206).  Keeps the [..., N, 2] pair shape
    (already interleaved I/Q when flattened).  The float->int conversion
    truncates toward zero like the reference's C casts, so the device path
    is bit-exact with the host converter.  Returns (converted, n_clipped)."""
    if fmt in ("complexf", "complexf_normalised", "f32", ""):
        return x, jnp.zeros((), jnp.int32)
    if fmt == "s16":
        clipped = jnp.clip(x, -32768.0, 32767.0)
        n = (x != clipped).sum(dtype=jnp.int32)
        return jnp.trunc(clipped).astype(jnp.int16), n
    if fmt == "u8":
        samp = x + 128.0
        clipped = jnp.clip(samp, 0.0, 255.0)
        n = (samp != clipped).sum(dtype=jnp.int32)
        return jnp.trunc(clipped).astype(jnp.uint8), n
    if fmt == "s8":
        clipped = jnp.clip(x, -128.0, 127.0)
        n = (x != clipped).sum(dtype=jnp.int32)
        return jnp.trunc(clipped).astype(jnp.int8), n
    raise ValueError(f"invalid output format {fmt}")


def pack_s16_planes(re: jnp.ndarray, im: jnp.ndarray):
    """s16 wire conversion of (re, im) planes straight into packed i32
    words -- (im << 16) | (re & 0xffff) is byte-identical (little endian)
    to interleaving int16 pairs, so the planes->pairs layout pass
    disappears into integer arithmetic.  Same saturation/truncation
    semantics as format_convert's s16 branch (C-cast truncation,
    src/FormatConverter.cpp:62-206).  Returns (words i32, n_clipped)."""
    def cvt(x):
        clipped = jnp.clip(x, -32768.0, 32767.0)
        n = (x != clipped).sum(dtype=jnp.int32)
        return jnp.trunc(clipped).astype(jnp.int32), n

    re_i, n_re = cvt(re)
    im_i, n_im = cvt(im)
    words = (im_i << 16) | (re_i & 0xFFFF)
    return words, n_re + n_im


# ---------------------------------------------------------------------------
# PAPR statistics (ref: src/PAPRStats.cpp:36-107)
# ---------------------------------------------------------------------------


def papr_db(x, axis=-1) -> jnp.ndarray:
    """Peak-to-average power ratio in dB; x is (re, im) planes, reduced
    over the sample axis."""
    p = cplx.pabs2(x)
    peak = jnp.max(p, axis=axis)
    mean = jnp.mean(p, axis=axis)
    return 10.0 * jnp.log10(peak / mean)
