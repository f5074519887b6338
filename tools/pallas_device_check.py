#!/usr/bin/env python
"""Validate the fused Pallas OFDM/CFR kernel (ops/ofdm_kernel.py) on real
TPU hardware against the XLA transform path, for every transmission mode
and both variants (plain IFFT, IFFT+CFR), and microbenchmark it.

The CPU test suite covers the kernel in interpreter mode
(tests/test_ofdm_kernel.py); this tool is the device-path check the
round's CI target runs on the tunnelled chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/dabmod_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from dabmod_tpu.ops import ofdm, ofdm_kernel
    from dabmod_tpu.ops.fft import set_precision

    set_precision("high")
    precision = jax.lax.Precision.HIGH
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    rng = np.random.default_rng(0)
    ok = True

    for spacing in (256, 512, 1024, 2048):
        b, s = 4, 19
        bins = tuple(jnp.asarray(rng.standard_normal(
            (b, s, spacing)).astype(np.float32)) for _ in range(2))
        ref = jax.jit(ofdm.ofdm_ifft)(bins)
        scale = float(jnp.abs(ref[0]).max())

        ap = jax.jit(ofdm_kernel.build_ofdm_backend(
            spacing, False, 0.0, 0.0, precision=precision))
        td, _ = ap(bins)
        err = max(float(jnp.abs(td[k] - ref[k]).max()) for k in range(2))
        line = f"N={spacing:5d} ifft rel err {err / scale:.2e}"
        ok &= err / scale < 1e-4

        clip = 1.2 * float(jnp.sqrt(ref[0] ** 2 + ref[1] ** 2).mean())
        eclip = 0.5
        refc, n_clip, _ = jax.jit(
            lambda bb: ofdm.cfr_one_iteration(
                ofdm.ofdm_ifft(bb), bb, clip, eclip))(bins)
        apc = jax.jit(ofdm_kernel.build_ofdm_backend(
            spacing, True, clip, eclip, precision=precision))
        tdc, st = apc(bins)
        errc = max(float(jnp.abs(tdc[k] - refc[k]).max()) for k in range(2))
        nc = np.asarray(st[..., ofdm_kernel.ST_NCLIP].sum(axis=1), np.int64)
        dn = int(np.abs(nc - np.asarray(n_clip)).max())
        line += f"  cfr rel err {errc / scale:.2e}  clip-count delta {dn}"
        ok &= errc / scale < 1e-4 and dn <= s * spacing // 1000
        print(line, flush=True)

    # microbenchmark at the bench batch size (TM-I)
    b, s, spacing = 16, 77, 2048
    bins = tuple(jnp.asarray(rng.standard_normal(
        (b, s, spacing)).astype(np.float32)) for _ in range(2))
    clip = 40.0
    cases = [
        ("xla ifft      ", jax.jit(ofdm.ofdm_ifft)),
        ("xla ifft+cfr  ", jax.jit(lambda bb: ofdm.cfr_one_iteration(
            ofdm.ofdm_ifft(bb), bb, clip, 3.0))),
        ("pallas ifft   ", jax.jit(ofdm_kernel.build_ofdm_backend(
            spacing, False, 0.0, 0.0, precision=precision))),
        ("pallas ifft+cfr", jax.jit(ofdm_kernel.build_ofdm_backend(
            spacing, True, clip, 3.0, precision=precision))),
    ]
    def probe(out):
        # host readback: the only barrier that truly waits on the axon
        # tunnel (block_until_ready returns at dispatch-ack)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(leaf).reshape(-1)[0])

    for label, fn in cases:
        probe(fn(bins))
        # marginal slope between two run lengths cancels the fixed
        # tunnel round-trip (see bench.py)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(bins)
        probe(out)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(40):
            out = fn(bins)
        probe(out)
        t2 = time.perf_counter() - t0
        print(f"{label}: {(t2 - t1) / 30 * 1e3:7.3f} ms "
              f"per [16,77,{spacing}] batch", flush=True)

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
