#!/usr/bin/env python
"""Validate the Pallas fused OFDM backend against interpret mode on real
TPU hardware, for every gain mode, and microbenchmark it vs the XLA path."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from dabmod_tpu import tables  # noqa: E402
from dabmod_tpu.ops import ofdm, pallas_backend
from dabmod_tpu.ops.ofdm import GAIN_FIX, GAIN_MAX, GAIN_VAR


def main():
    p = tables.mode_params(1)
    rng = np.random.default_rng(0)
    syms = jnp.asarray(rng.standard_normal(
        (24, p.nb_symbols + 1, p.nb_carriers, 2)).astype(np.float32))

    # NOTE: benchmark BEFORE any interpret-mode execution -- interpret
    # pallas_call in the same process degrades subsequent device dispatch
    # to a ~2.6 ms/call floor (observed on the axon platform)
    def xla_path(symbols, cg, vk):
        bins = ofdm.to_bins_slices(symbols, p.nb_carriers, p.spacing)
        td = ofdm.ofdm_ifft(bins)
        gains = ofdm.compute_gain(td, GAIN_VAR, vk)
        td = ofdm.apply_gain(td, gains, cg)
        return ofdm.guard_interval_unwindowed(td, p.null_size, p.sym_size)

    for label, fn in [("xla", jax.jit(xla_path)),
                      ("pallas", jax.jit(pallas_backend.make_backend(
                          p, GAIN_VAR)))]:
        fn(syms, 1.0, 4.0).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(30):
            out = fn(syms, 1.0, 4.0)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 30
        print(f"{label}: {dt*1e3:.3f} ms/batch "
              f"{24*p.tf_samples/dt/1e9:.2f} GS/s")

    for gm, name in [(GAIN_FIX, "fix"), (GAIN_MAX, "max"), (GAIN_VAR, "var")]:
        a = np.asarray(jax.jit(pallas_backend.make_backend(p, gm))(
            syms, 1.0, 4.0))
        b = np.asarray(pallas_backend.make_backend(p, gm, interpret=True)(
            syms, 1.0, 4.0))
        print(name, "device vs interpret rel err:",
              np.abs(a - b).max() / np.abs(b).max())


if __name__ == "__main__":
    main()
