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

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from .fft import fft_pairs, ifft_pairs

_PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# FIR (ref: src/FIRFilter.cpp:144-228)
# out[n] = sum_j in[n+j] * taps[j], truncated at the end of each TF
# ---------------------------------------------------------------------------


def fir_filter(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """x: [..., N, 2]; taps: [ntaps] float32 -> [..., N, 2]."""
    ntaps = taps.shape[0]
    n = x.shape[-2]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, ntaps), (0, 0)])
    acc = xp[..., :n, :] * taps[0]
    for j in range(1, ntaps):
        acc = acc + xp[..., j:j + n, :] * taps[j]
    return acc


def fir_filter_matmul(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """FIR via lax.conv (cross-correlation, which matches the reference's
    forward-looking out[n] = sum_j in[n+j]*taps[j]); the I/Q pair axis is a
    depthwise feature group.  x: [B, N, 2]."""
    ntaps = taps.shape[0]
    n = x.shape[-2]
    lhs = jnp.moveaxis(x, -1, -2)                 # [B, 2, N]
    kernel = jnp.broadcast_to(taps, (2, 1, ntaps))
    out = jax.lax.conv_general_dilated(
        lhs, kernel, window_strides=(1,),
        padding=[(0, ntaps - 1)],                 # truncate at the TF end
        feature_group_count=2,
        precision=_PRECISION)
    return jnp.moveaxis(out[..., :n], -2, -1)


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
# Memoryless polynomial DPD (ref: src/MemlessPoly.cpp:237-276)
# ---------------------------------------------------------------------------


def memless_poly(x: jnp.ndarray, coefs_am: jnp.ndarray,
                 coefs_pm: jnp.ndarray) -> jnp.ndarray:
    """Odd-order AM/AM + AM/PM predistortion with the reference's sin/cos
    series approximations (kept for output parity).  x: [..., 2]."""
    m = cplx.abs2(x)
    am = coefs_am[0] + m * (coefs_am[1] + m * (coefs_am[2] + m * (
        coefs_am[3] + m * coefs_am[4])))
    pm = -(coefs_pm[0] + m * (coefs_pm[1] + m * (coefs_pm[2] + m * (
        coefs_pm[3] + m * coefs_pm[4]))))
    p2 = pm * pm
    # reference's cos/sin polynomial approximations (coefficients as-is)
    re = 1.0 - p2 * (-0.5 + p2 * (0.486666 + p2 * (-0.00138888)))
    im = pm * (1.0 + p2 * (0.166666 + p2 * 0.00833333))
    rot = jnp.stack([re, im], axis=-1)
    return cplx.cmul(x * am[..., None], rot)


def memless_lut(x: jnp.ndarray, lut: jnp.ndarray,
                scalefactor: float) -> jnp.ndarray:
    """32-entry magnitude-binned LUT predistorter
    (ref: src/MemlessPoly.cpp:278-309).  lut: [32, 2] pairs."""
    mag = jnp.sqrt(cplx.abs2(x))
    scaled = jnp.clip(jnp.round(mag * scalefactor), 0, 2.0**32 - 1)
    # top-5-bits bin index == scaled / 2^27, computed in float to avoid
    # unsupported 8/16-bit shifts on the device
    ix = jnp.clip((scaled / float(1 << 27)).astype(jnp.int32), 0, 31)
    return cplx.cmul(x, lut[ix])


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
    """Flatten pair samples to the interleaved I/Q stream and convert with
    saturation.  Returns (converted, n_clipped)."""
    iq = x.reshape(*x.shape[:-2], -1)
    if fmt in ("complexf", "f32", ""):
        return iq, jnp.zeros((), jnp.int32)
    if fmt == "s16":
        clipped = jnp.clip(iq, -32768.0, 32767.0)
        n = (iq != clipped).sum()
        return clipped.astype(jnp.int32), n   # int16 unsupported on device
    if fmt == "u8":
        samp = iq + 128.0
        clipped = jnp.clip(samp, 0.0, 255.0)
        n = (samp != clipped).sum()
        return clipped.astype(jnp.int32), n
    if fmt == "s8":
        clipped = jnp.clip(iq, -128.0, 127.0)
        n = (iq != clipped).sum()
        return clipped.astype(jnp.int32), n
    raise ValueError(f"invalid output format {fmt}")


# ---------------------------------------------------------------------------
# PAPR statistics (ref: src/PAPRStats.cpp:36-107)
# ---------------------------------------------------------------------------


def papr_db(x: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """Peak-to-average power ratio in dB; x is pair-domain, reduced over
    the sample axis (axis counts in the pair-reduced view)."""
    p = cplx.abs2(x)
    peak = jnp.max(p, axis=axis)
    mean = jnp.mean(p, axis=axis)
    return 10.0 * jnp.log10(peak / mean)
