"""Fused OFDM backend as a Pallas TPU kernel.

One program per (transmission frame, symbol chunk): carrier symbols are
read into VMEM once, mapped onto IFFT bins, transformed by a two-stage
matmul DFT and gain-normalised (fix/max/var, NULL symbol borrowing
symbol 1's gain) in a single pass -- the bins/stage-1/stage-2/gain
intermediates of the XLA path never touch HBM.  Guard-interval insertion
stays outside (pure slice/concat data movement that XLA fuses into the
output copy).

Status: lowers and validates on real TPU hardware (all gain modes,
~2e-7 vs interpret mode), but the layout-legal formulation costs 1.8x
the minimal FLOPs in thin matmuls and measures ~34x slower than the XLA
path for this stage (2.84 ms vs 0.082 ms per 24-TF batch on v5e) -- and
the XLA OFDM backend is only ~4% of total pipeline time, so the XLA path
remains the default.  Kept as the validated non-default backend and as
the base for future in-kernel CFR fusion, where VMEM residency would
matter (CFR re-runs fft+ifft per iteration).

Mosaic's vector layouts only support reshapes whose minor dimension is a
full 128-lane tile, so the IFFT uses the fixed factorisation N = A x 128
with the frequency index f = a*128 + b and the time index t = t1*128 + t2:

    x[t1*128+t2] = sum_b W[b,t1] T[b,t2] (sum_a X[a*128+b] V[a,t2])

with V[a,t2] = e^{2i pi a t2 / A}, T[b,t2] = e^{2i pi b t2 / N},
W[b,t1] = e^{2i pi b t1 / A} (A = N/128).  Both contractions are MXU
dot_generals over 128-aligned operands; the only data movements are a
(S, N)->(S, A, 128) split, a leading-axis transpose, and an
(S, A, 128)->(S, N) merge -- all supported lowerings (the t2-redundant
stage-1 kernel costs ~1.8x the minimal FLOPs but buys the legal layout).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from .ofdm import GAIN_FIX, GAIN_MAX, GAIN_VAR

LANES = 128


@lru_cache(maxsize=None)
def _dft_consts(n: int):
    if n % LANES:
        raise ValueError(f"IFFT size {n} is not a multiple of {LANES}")
    a = n // LANES
    av = np.arange(a)
    bv = np.arange(LANES)
    va = np.exp(2j * np.pi * np.outer(av, bv) / a)        # [A, t2]
    tw = np.exp(2j * np.pi * np.outer(bv, bv) / n)        # [b, t2]
    wb = np.exp(2j * np.pi * np.outer(av, bv) / a)        # [t1, b]
    f32 = np.float32
    return (a, va.real.astype(f32), va.imag.astype(f32),
            tw.real.astype(f32), tw.imag.astype(f32),
            wb.real.astype(f32), wb.imag.astype(f32))


def make_backend(mode_params, gain_mode: int, interpret: bool = False):
    """Build the fused backend callable:
    (syms [B, S, C, 2], constant_gain, var_k) -> iq [B, tf_samples, 2].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = mode_params
    S = p.nb_symbols + 1
    C = p.nb_carriers
    N = p.spacing
    # symbol-axis chunking keeps the [Sc, 128, 128] stage intermediates
    # within VMEM (one full TF of them is ~165 MB > the 128 MB budget)
    SC = 7 if S % 7 == 0 else (11 if S % 11 == 0 else 1)
    n_chunks = S // SC
    A, var, vai, twr, twi, wbr, wbi = _dft_consts(N)
    pos = (C + 1) // 2
    pos_dst = 0 if (C & 1) else 1
    mid = N - C - pos_dst
    null_pre = p.null_size - N
    sym_pre = p.sym_size - N
    HI = jax.lax.Precision.HIGHEST

    def kernel(cg_ref, vk_ref, sr_ref, si_ref, var_ref, vai_ref, twr_ref,
               twi_ref, wbr_ref, wbi_ref, outr_ref, outi_ref):
        car_r = sr_ref[0, 0]                               # [SC, C]
        car_i = si_ref[0, 0]
        z1 = jnp.zeros((SC, pos_dst), jnp.float32)
        zm = jnp.zeros((SC, mid), jnp.float32)
        br = jnp.concatenate([z1, car_r[:, :pos], zm, car_r[:, pos:]],
                             axis=1)
        bi = jnp.concatenate([z1, car_i[:, :pos], zm, car_i[:, pos:]],
                             axis=1)
        xr = br.reshape(SC, A, LANES)
        xi = bi.reshape(SC, A, LANES)

        def dg1(x, w):      # contract a: [S, A, 128] x [A, 128] -> [S,128,128]
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), precision=HI,
                preferred_element_type=jnp.float32)

        va_r, va_i = var_ref[...], vai_ref[...]
        y1r = dg1(xr, va_r) - dg1(xi, va_i)                # [S, b, t2]
        y1i = dg1(xr, va_i) + dg1(xi, va_r)
        tw_r, tw_i = twr_ref[...], twi_ref[...]            # [b, t2]
        y2r = y1r * tw_r - y1i * tw_i
        y2i = y1r * tw_i + y1i * tw_r

        def dg2(w, y):      # contract b: [A, 128] x [S, 128, 128] -> [A,S,128]
            return jax.lax.dot_general(
                w, y, (((1,), (1,)), ((), ())), precision=HI,
                preferred_element_type=jnp.float32)

        wb_r, wb_i = wbr_ref[...], wbi_ref[...]            # [t1, b]
        zr = dg2(wb_r, y2r) - dg2(wb_i, y2i)               # [t1, SC, t2]
        zi = dg2(wb_i, y2r) + dg2(wb_r, y2i)
        tdr = jnp.transpose(zr, (1, 0, 2)).reshape(SC, N)  # t = t1*128 + t2
        tdi = jnp.transpose(zi, (1, 0, 2)).reshape(SC, N)

        # ---- per-symbol gain (ref: src/GainControl.cpp scalar paths);
        # everything stays 2D [SC, 1] -- 1D vectors and offset slices
        # trip Mosaic layout assertions ----
        if gain_mode == GAIN_FIX:
            g = jnp.full((SC, 1), 512.0, jnp.float32)
        elif gain_mode == GAIN_MAX:
            mx = jnp.maximum(jnp.max(jnp.abs(tdr), axis=1, keepdims=True),
                             jnp.max(jnp.abs(tdi), axis=1, keepdims=True))
            g = jnp.where(jnp.floor(mx) == 0, 1.0, 32767.0 / mx)
        else:
            mr = jnp.mean(tdr, axis=1, keepdims=True)
            mi = jnp.mean(tdi, axis=1, keepdims=True)
            dr = tdr - mr
            di = tdi - mi
            # the reference accumulates even/odd samples separately and
            # averages the two variances; lane-parity masks express that
            # without the (S, N//2, 2) reshape Mosaic cannot lower
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
            meven = (lane % 2 == 0).astype(jnp.float32)
            modd = 1.0 - meven
            hn = float(N // 2)
            var_re = (jnp.sum(dr * dr * meven, axis=1, keepdims=True)
                      + jnp.sum(dr * dr * modd, axis=1,
                                keepdims=True)) / hn * 0.5
            var_im = (jnp.sum(di * di * meven, axis=1, keepdims=True)
                      + jnp.sum(di * di * modd, axis=1,
                                keepdims=True)) / hn * 0.5
            sig = jnp.maximum(jnp.sqrt(var_re),
                              jnp.sqrt(var_im)) * vk_ref[0]
            g = jnp.where(jnp.floor(sig) == 0, 1.0, 32767.0 / sig)
        # NULL symbol (first symbol of chunk 0) borrows symbol 1's gain;
        # expressed with iota masks instead of slicing
        if gain_mode != GAIN_FIX:
            first = pl.program_id(1) == 0
            sidx = jax.lax.broadcasted_iota(jnp.int32, (SC, 1), 0)
            g1 = jnp.sum(g * (sidx == 1).astype(jnp.float32), axis=0,
                         keepdims=True)
            g = jnp.where(jnp.logical_and(first, sidx == 0), g1, g)
        g = g * cg_ref[0]
        outr_ref[0, 0] = tdr * g
        outi_ref[0, 0] = tdi * g

    consts = (jnp.asarray(var), jnp.asarray(vai), jnp.asarray(twr),
              jnp.asarray(twi), jnp.asarray(wbr), jnp.asarray(wbi))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def fn(syms, constant_gain, var_k):
        B = syms.shape[0]
        # separate re/im planes with the carrier axis on the lanes: the
        # pair layout's minor dim of 2 would tile (8, 128) at 64x waste,
        # and offset indexing into a combined plane dim trips Mosaic
        sr = syms[..., 0].reshape(B, n_chunks, SC, C)
        si = syms[..., 1].reshape(B, n_chunks, SC, C)
        plane_shape = jax.ShapeDtypeStruct((B, n_chunks, SC, N),
                                           jnp.float32)
        io_spec = pl.BlockSpec((1, 1, SC, C),
                               lambda b, s, *_: (b, s, 0, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, 1, SC, N),
                                lambda b, s, *_: (b, s, 0, 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_chunks),
            in_specs=[io_spec, io_spec,
                      vspec, vspec, vspec, vspec, vspec, vspec],
            out_specs=(out_spec, out_spec),
        )
        pr, pi = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(plane_shape, plane_shape),
            interpret=interpret,
        )(jnp.atleast_1d(constant_gain).astype(jnp.float32),
          jnp.atleast_1d(var_k).astype(jnp.float32),
          sr, si, *consts)

        # ---- guard interval (unwindowed), in XLA: slices + concat that
        # fuse into the HBM write (ref: src/GuardIntervalInserter.cpp) ----
        td = jnp.stack([pr.reshape(B, S, N), pi.reshape(B, S, N)],
                       axis=-1)                                # [B, S, N, 2]
        null_blk = jnp.concatenate([td[:, 0, N - null_pre:], td[:, 0]],
                                   axis=1)                     # [B, null, 2]
        data = jnp.concatenate([td[:, 1:, N - sym_pre:], td[:, 1:]],
                               axis=2).reshape(B, -1, 2)
        return jnp.concatenate([null_blk, data], axis=1)

    return fn
