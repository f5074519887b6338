#!/usr/bin/env python
"""Benchmark: COFDM I/Q samples/s per chip (TM-I, 2.048 MS/s native).

Measures steady-state device throughput of the full modulation pipeline
(ETI payload bytes -> guard-interval-inserted baseband I/Q) on one chip.
`vs_baseline` is the multiple of the 2.048 MS/s real-time rate the reference
modulator must sustain (BASELINE.md: target >= 1000x real-time per chip).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dabmod_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from dabmod_tpu import tables
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
    from dabmod_tpu.models import Modulator, make_default_layout

    batch_tf = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    # a representative ensemble: 2 sub-channels (EEP-A3 64 kbit/s + UEP
    # 128 kbit/s level 3), TM-I, default var gain -- BASELINE configs[0]
    specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1))
    p = tables.mode_params(1)

    # pre-stage a few distinct input batches on device (host ETI parsing is
    # pipelined off the critical path in the streaming runtime)
    n_stage = 4
    staged = []
    for k in range(n_stage):
        raw = synth_eti_batch(batch_tf * p.cif_count, mode=1,
                              subch_specs=specs, seed=k)
        b = parse_eti_frames(raw)
        staged.append((jax.device_put(jnp.asarray(b.fic)),
                       tuple(jax.device_put(jnp.asarray(x))
                             for x in b.subchannels)))

    s = m.settings
    cg = jnp.float32(s.normalise * s.digital_gain)
    vk = jnp.float32(s.gain_mode_variance)
    step = jax.jit(m._modulate_impl, donate_argnums=(2,))

    state = m.init_state()
    # warmup / compile
    iq, state, _ = step(staged[0][0], staged[0][1], state, cg, vk)
    iq.block_until_ready()

    # calibrate iteration count to ~6 s (long window smooths tunnel jitter)
    t0 = time.perf_counter()
    for _ in range(4):
        iq, state, _ = step(staged[1][0], staged[1][1], state, cg, vk)
    iq.block_until_ready()
    per_step = (time.perf_counter() - t0) / 4
    iters = max(10, min(3000, int(6.0 / max(per_step, 1e-4))))

    t0 = time.perf_counter()
    for i in range(iters):
        fic, subs = staged[i % n_stage]
        iq, state, _ = step(fic, subs, state, cg, vk)
    iq.block_until_ready()
    dt = time.perf_counter() - t0

    tf_per_s = iters * batch_tf / dt
    samples_per_s = tf_per_s * p.tf_samples
    print(json.dumps({
        "metric": "COFDM I/Q samples/s per chip (TM-I, 2.048 MS/s native)",
        "value": round(samples_per_s),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / 2_048_000.0, 2),
    }))


if __name__ == "__main__":
    main()
