"""Fused OFDM backend as a Pallas TPU kernel.

One program per transmission frame: the 77 carrier symbols are read into
VMEM once, mapped onto IFFT bins, transformed by the two-stage matmul DFT,
gain-normalised (fix/max/var, NULL symbol borrowing symbol 1's gain) and
written out guard-interval-expanded -- a single HBM read of the symbols and
a single HBM write of the transmission frame, eliminating the intermediate
bins/time/gained materialisations of the XLA path.

The per-program stage-1/stage-2 DFT dots have shapes [S*B2, A]x[A, A] and
[S*A, B2]x[B2, B2] (A*B2 = spacing), which keep the MXU fed.  Windowed GI
falls back to the XLA path.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from .fft import _best_factors
from .ofdm import GAIN_FIX, GAIN_MAX, GAIN_VAR


@lru_cache(maxsize=None)
def _dft_consts(n: int):
    a, b = _best_factors(n)
    wa = np.exp(2j * np.pi * np.outer(np.arange(a), np.arange(a)) / a)
    wb = np.exp(2j * np.pi * np.outer(np.arange(b), np.arange(b)) / b)
    tw = np.exp(2j * np.pi * np.outer(np.arange(a), np.arange(b)) / n)
    f32 = np.float32
    # twiddle transposed to [b, k1] to match the kernel's [s, b, k1] layout
    return (a, b, wa.real.astype(f32), wa.imag.astype(f32),
            wb.real.astype(f32), wb.imag.astype(f32),
            tw.T.real.astype(f32).copy(), tw.T.imag.astype(f32).copy())


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
    A, B2, war, wai, wbr, wbi, twr, twi = _dft_consts(N)
    pos = (C + 1) // 2
    pos_dst = 0 if (C & 1) else 1
    mid = N - C - pos_dst
    null_pre = p.null_size - N
    sym_pre = p.sym_size - N
    HI = jax.lax.Precision.HIGHEST

    def kernel(cg_ref, vk_ref, syms_ref, war_ref, wai_ref, wbr_ref, wbi_ref,
               twr_ref, twi_ref, out_ref):
        car = syms_ref[0]                                  # [S, C, 2]
        z1 = jnp.zeros((S, pos_dst), jnp.float32)
        zm = jnp.zeros((S, mid), jnp.float32)
        br = jnp.concatenate([z1, car[:, :pos, 0], zm, car[:, pos:, 0]],
                             axis=1)
        bi = jnp.concatenate([z1, car[:, :pos, 1], zm, car[:, pos:, 1]],
                             axis=1)
        xr = br.reshape(S, A, B2)
        xi = bi.reshape(S, A, B2)

        def dga(x, w):      # contract the A axis: [S, A, B2] x [A, K1]
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), precision=HI,
                preferred_element_type=jnp.float32)        # [S, B2, K1]

        wa_r, wa_i = war_ref[...], wai_ref[...]
        y1r = dga(xr, wa_r) - dga(xi, wa_i)
        y1i = dga(xr, wa_i) + dga(xi, wa_r)
        tw_r, tw_i = twr_ref[...], twi_ref[...]            # [B2, K1]
        y2r = y1r * tw_r - y1i * tw_i
        y2i = y1r * tw_i + y1i * tw_r

        def dgb(y, w):      # contract the B2 axis: [S, B2, K1] x [B2, K2]
            return jax.lax.dot_general(
                y, w, (((1,), (0,)), ((), ())), precision=HI,
                preferred_element_type=jnp.float32)        # [S, K1, K2]

        wb_r, wb_i = wbr_ref[...], wbi_ref[...]
        y3r = dgb(y2r, wb_r) - dgb(y2i, wb_i)
        y3i = dgb(y2r, wb_i) + dgb(y2i, wb_r)
        # X[k2*A + k1] = Y3[k1, k2] -> [S, K2, K1] -> [S, N]
        tdr = jnp.swapaxes(y3r, 1, 2).reshape(S, N)
        tdi = jnp.swapaxes(y3i, 1, 2).reshape(S, N)

        # ---- per-symbol gain (ref: src/GainControl.cpp scalar paths) ----
        if gain_mode == GAIN_FIX:
            g = jnp.full((S,), 512.0, jnp.float32)
        elif gain_mode == GAIN_MAX:
            mx = jnp.maximum(jnp.max(jnp.abs(tdr), axis=1),
                             jnp.max(jnp.abs(tdi), axis=1))
            g = jnp.where(jnp.floor(mx) == 0, 1.0, 32767.0 / mx)
        else:
            mr = jnp.mean(tdr, axis=1, keepdims=True)
            mi = jnp.mean(tdi, axis=1, keepdims=True)
            dr = tdr - mr
            di = tdi - mi
            # even/odd split via reshape (strided slices don't lower in
            # Mosaic); mean over pairs == 0.5*(even_mean + odd_mean)
            dr2 = (dr * dr).reshape(S, N // 2, 2)
            di2 = (di * di).reshape(S, N // 2, 2)
            var_re = (jnp.mean(dr2[:, :, 0], axis=1)
                      + jnp.mean(dr2[:, :, 1], axis=1)) * 0.5
            var_im = (jnp.mean(di2[:, :, 0], axis=1)
                      + jnp.mean(di2[:, :, 1], axis=1)) * 0.5
            sig = jnp.maximum(jnp.sqrt(var_re),
                              jnp.sqrt(var_im)) * vk_ref[0]
            g = jnp.where(jnp.floor(sig) == 0, 1.0, 32767.0 / sig)
        # NULL symbol borrows symbol 1's gain
        g = jnp.concatenate([g[1:2], g[1:]]) * cg_ref[0]
        tdr = tdr * g[:, None]
        tdi = tdi * g[:, None]

        # ---- guard interval (unwindowed) ----
        null_blk_r = jnp.concatenate([tdr[0, N - null_pre:], tdr[0]])
        null_blk_i = jnp.concatenate([tdi[0, N - null_pre:], tdi[0]])
        data_r = jnp.concatenate([tdr[1:, N - sym_pre:], tdr[1:]],
                                 axis=1).reshape(-1)
        data_i = jnp.concatenate([tdi[1:, N - sym_pre:], tdi[1:]],
                                 axis=1).reshape(-1)
        out_r = jnp.concatenate([null_blk_r, data_r])
        out_i = jnp.concatenate([null_blk_i, data_i])
        out_ref[0] = jnp.stack([out_r, out_i], axis=-1)

    consts = (jnp.asarray(war), jnp.asarray(wai), jnp.asarray(wbr),
              jnp.asarray(wbi), jnp.asarray(twr), jnp.asarray(twi))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def fn(syms, constant_gain, var_k):
        B = syms.shape[0]
        out_shape = jax.ShapeDtypeStruct((B, p.tf_samples, 2), jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, S, C, 2), lambda b, *_: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                vspec, vspec, vspec, vspec, vspec, vspec,
            ],
            out_specs=pl.BlockSpec((1, p.tf_samples, 2),
                                   lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(jnp.atleast_1d(constant_gain).astype(jnp.float32),
          jnp.atleast_1d(var_k).astype(jnp.float32),
          syms, *consts)

    return fn
