"""Bit-exact emulation of the KISS fixed-point (int16) inverse FFT.

The reference's fft_engine=kiss configuration runs the vendored KISS FFT
compiled with FIXED_POINT=16 (Makefile.am:38): every butterfly stage
scales its inputs by 1/radix and rounds every multiply back to int16
(kiss/_kiss_fft_guts.h sround/C_MUL/C_FIXDIV), so the s16 wire samples
carry the *per-stage* quantisation pattern, not a single end-of-chain
rounding.  This module reproduces that arithmetic exactly -- same mixed-
radix factorisation (kiss/kiss_fft.c kf_factor), same recursion order
(kf_work), same butterflies (kf_bfly2/kf_bfly4 with the inverse branch),
same twiddle quantisation (floor(.5 + 32767*cos)), same int16 wraparound
on every store -- as vectorised int32 ops over a batch of symbols, so the
TPU build's kiss output is bit-identical to the reference's
(src/OfdmGenerator.cpp:467-579 feeds kiss_fft per symbol).

Integers ride in int32 lanes holding int16 values; TPU int32 multiplies
and arithmetic shifts map directly onto the VPU.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def kf_factor(n: int) -> list[tuple[int, int]]:
    """KISS mixed-radix factorisation (kiss/kiss_fft.c:307-330):
    powers of 4 first, then 2, 3, higher primes; returns (p, m) pairs."""
    out = []
    p = 4
    floor_sqrt = int(np.floor(np.sqrt(n)))
    while True:
        while n % p:
            p = {4: 2, 2: 3}.get(p, p + 2)
            if p > floor_sqrt:
                p = n
        n //= p
        out.append((p, n))
        if n <= 1:
            return out


def _build_perm(n: int, factors: list[tuple[int, int]]) -> np.ndarray:
    """Input-gather permutation implied by kf_work's recursion
    (kiss/kiss_fft.c:236-301): out[j] = in[perm[j]] at the leaves."""
    perm = np.zeros(n, np.int64)

    def rec(out_off: int, in_off: int, fstride: int, fi: int):
        p, m = factors[fi]
        if m == 1:
            for q in range(p):
                perm[out_off + q] = in_off + q * fstride
        else:
            for k in range(p):
                rec(out_off + k * m, in_off + fstride * k,
                    fstride * p, fi + 1)

    rec(0, 0, 1, 0)
    return perm


@lru_cache(maxsize=None)
def _plan(n: int, inverse: bool):
    factors = kf_factor(n)
    for p, _ in factors:
        if p not in (2, 4):
            raise NotImplementedError(
                f"kiss emulation implements radix 2/4 only (n={n})")
    perm = _build_perm(n, factors)
    i = np.arange(n, dtype=np.float64)
    phase = -2.0 * np.pi * i / n
    if inverse:
        phase = -phase
    tw_r = np.floor(0.5 + 32767.0 * np.cos(phase)).astype(np.int32)
    tw_i = np.floor(0.5 + 32767.0 * np.sin(phase)).astype(np.int32)
    # stage schedule, deepest first (the recursion is post-order); at
    # depth d there are fstride_d = prod(p_0..p_{d-1}) blocks of p*m
    stages = []
    fstride = 1
    for p, m in factors:
        stages.append((p, m, fstride))
        fstride *= p
    return perm, tw_r, tw_i, stages


def _wrap16(x):
    """int16 store semantics (kiss_fft_cpx fields are int16_t)."""
    return ((x + 32768) & 65535) - 32768


def _sround(x):
    """sround: (x + 2^14) >> 15, arithmetic (kiss/_kiss_fft_guts.h:66)."""
    return (x + (1 << 14)) >> 15


def _fixdiv(r, i, div: int):
    """C_FIXDIV: multiply by SAMP_MAX/div and round (DIVSCALAR)."""
    k = 32767 // div
    return _wrap16(_sround(r * k)), _wrap16(_sround(i * k))


def _cmul(ar, ai, br, bi):
    """C_MUL: rounds the *summed* 32-bit products once per component."""
    return (_wrap16(_sround(ar * br - ai * bi)),
            _wrap16(_sround(ar * bi + ai * br)))


def kiss_fft_fixed(re, im, inverse: bool = True):
    """KISS FIXED_POINT=16 transform of int32 planes [..., n] holding
    int16 values; returns int32 planes holding the exact int16 results."""
    n = re.shape[-1]
    perm, tw_r_np, tw_i_np, stages = _plan(n, inverse)
    xr = jnp.asarray(re, jnp.int32)[..., np.asarray(perm)]
    xi = jnp.asarray(im, jnp.int32)[..., np.asarray(perm)]
    lead = xr.shape[:-1]
    for p, m, fstride in reversed(stages):
        nb = n // (p * m)
        xr = xr.reshape(*lead, nb, p, m)
        xi = xi.reshape(*lead, nb, p, m)
        k = np.arange(m)
        if p == 2:
            t1r = jnp.asarray(tw_r_np[k * fstride])
            t1i = jnp.asarray(tw_i_np[k * fstride])
            f0r, f0i = _fixdiv(xr[..., 0, :], xi[..., 0, :], 2)
            f1r, f1i = _fixdiv(xr[..., 1, :], xi[..., 1, :], 2)
            tr, ti = _cmul(f1r, f1i, t1r, t1i)
            o0r = _wrap16(f0r + tr)
            o0i = _wrap16(f0i + ti)
            o1r = _wrap16(f0r - tr)
            o1i = _wrap16(f0i - ti)
            xr = jnp.stack([o0r, o1r], axis=-2)
            xi = jnp.stack([o0i, o1i], axis=-2)
        else:                                   # p == 4, kf_bfly4
            t1r = jnp.asarray(tw_r_np[k * fstride])
            t1i = jnp.asarray(tw_i_np[k * fstride])
            t2r = jnp.asarray(tw_r_np[2 * k * fstride])
            t2i = jnp.asarray(tw_i_np[2 * k * fstride])
            t3r = jnp.asarray(tw_r_np[3 * k * fstride])
            t3i = jnp.asarray(tw_i_np[3 * k * fstride])
            f0r, f0i = _fixdiv(xr[..., 0, :], xi[..., 0, :], 4)
            f1r, f1i = _fixdiv(xr[..., 1, :], xi[..., 1, :], 4)
            f2r, f2i = _fixdiv(xr[..., 2, :], xi[..., 2, :], 4)
            f3r, f3i = _fixdiv(xr[..., 3, :], xi[..., 3, :], 4)
            s0r, s0i = _cmul(f1r, f1i, t1r, t1i)
            s1r, s1i = _cmul(f2r, f2i, t2r, t2i)
            s2r, s2i = _cmul(f3r, f3i, t3r, t3i)
            s5r = _wrap16(f0r - s1r)
            s5i = _wrap16(f0i - s1i)
            f0r = _wrap16(f0r + s1r)
            f0i = _wrap16(f0i + s1i)
            s3r = _wrap16(s0r + s2r)
            s3i = _wrap16(s0i + s2i)
            s4r = _wrap16(s0r - s2r)
            s4i = _wrap16(s0i - s2i)
            o2r = _wrap16(f0r - s3r)
            o2i = _wrap16(f0i - s3i)
            o0r = _wrap16(f0r + s3r)
            o0i = _wrap16(f0i + s3i)
            if inverse:
                o1r = _wrap16(s5r - s4i)
                o1i = _wrap16(s5i + s4r)
                o3r = _wrap16(s5r + s4i)
                o3i = _wrap16(s5i - s4r)
            else:
                o1r = _wrap16(s5r + s4i)
                o1i = _wrap16(s5i - s4r)
                o3r = _wrap16(s5r - s4i)
                o3i = _wrap16(s5i + s4r)
            xr = jnp.stack([o0r, o1r, o2r, o3r], axis=-2)
            xi = jnp.stack([o0i, o1i, o2i, o3i], axis=-2)
        xr = xr.reshape(*lead, n)
        xi = xi.reshape(*lead, n)
    return xr, xi


# ---------------------------------------------------------------------------
# fpm Q1.14 arithmetic (fpm/fixed.hpp, EnableRounding=true), used by the
# reference's fixed-point windowed guard-interval inserter
# (src/GuardIntervalInserter.cpp:96-299 complexfix branches)
# ---------------------------------------------------------------------------


def window_q14(values: np.ndarray) -> np.ndarray:
    """fpm fixed(double) construction: round half away from zero
    (fpm/fixed.hpp:48-52); window values are in [0, 1]."""
    return np.floor(values * 16384.0 + 0.5).astype(np.int32)


def fpm_mul_q14(x, w):
    """fpm fixed*fixed with EnableRounding: v = (x*w)/(2^13) with C
    truncating division, result v/2 + v%2 (fpm/fixed.hpp:156-167).
    `w` must be non-negative (window coefficients are)."""
    prod = x * w
    sign = jnp.where(prod < 0, -1, 1)
    v_abs = jnp.abs(prod) >> 13
    return _wrap16(sign * ((v_abs >> 1) + (v_abs & 1)))


def guard_interval_windowed_fixed(symbols, null_size: int, sym_size: int,
                                  ov: int):
    """Raised-cosine windowed GI in exact Q1.14 arithmetic, mirroring
    ops.ofdm.guard_interval_windowed's decomposition but with fpm multiply
    semantics and int16-wrapping adds, for bit-exact parity with the
    reference's complexfix path.  symbols: (re, im) int32 planes
    [B, S, spacing] -> int32 planes [B, tf_samples]."""
    B, S, sp = symbols[0].shape
    npre = null_size - sp
    win = 0.5 * (1.0 - np.cos(np.pi * np.arange(2 * ov) / (2 * ov - 1)))
    wq = window_q14(win)
    rise1 = jnp.asarray(wq[:ov])
    rise2 = jnp.asarray(wq[ov:2 * ov])
    fall1 = jnp.asarray(wq[2 * ov - 1:ov - 1:-1])
    fall2 = jnp.asarray(wq[ov - 1::-1])

    def one(x):
        data = x[:, 1:]
        head = _wrap16(
            fpm_mul_q14(data[:, :, 2 * sp - sym_size:2 * sp - sym_size + ov],
                        rise2)
            + fpm_mul_q14(x[:, :-1, :ov], fall2))
        mid_prefix = data[:, :, 2 * sp - sym_size + ov:sp]
        body = data[:, :, :sp - ov]
        tails = jnp.concatenate(
            [_wrap16(fpm_mul_q14(data[:, :-1, sp - ov:], fall1)
                     + fpm_mul_q14(
                         data[:, 1:, 2 * sp - sym_size - ov:
                              2 * sp - sym_size], rise1)),
             data[:, -1:, sp - ov:]], axis=1)
        blocks = jnp.concatenate([head, mid_prefix, body, tails], axis=2)
        null = x[:, 0]
        null_tail = _wrap16(
            fpm_mul_q14(null[:, sp - ov:], fall1)
            + fpm_mul_q14(data[:, 0, 2 * sp - sym_size - ov:
                               2 * sp - sym_size], rise1))
        null_block = jnp.concatenate(
            [null[:, sp - npre:], null[:, :sp - ov], null_tail], axis=1)
        return jnp.concatenate([null_block, blocks.reshape(B, -1)], axis=1)
    return one(symbols[0]), one(symbols[1])
