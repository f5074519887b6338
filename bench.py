#!/usr/bin/env python
"""Benchmark: COFDM I/Q samples/s per chip (TM-I, 2.048 MS/s native).

Measures steady-state device throughput of the full modulation pipeline
(ETI payload bytes -> guard-interval-inserted baseband I/Q) on one chip.
`vs_baseline` is the multiple of the 2.048 MS/s real-time rate the reference
modulator must sustain (BASELINE.md: target >= 1000x real-time per chip).

Measurement methodology (important on this environment's tunnelled chip):
`block_until_ready()` does NOT wait for execution over the axon transport
-- it returns when the dispatch is acknowledged, which measures host
dispatch rate, not device throughput.  The only trustworthy barrier is a
host readback.  Each step therefore also returns a tiny on-device scalar
folded from the I/Q output, the steps are serialized through the donated
modulator state, and a single scalar fetch at the end forces the whole
chain.  The fixed tunnel round-trip (~25-40 ms) is cancelled by timing two
run lengths and using the marginal slope.

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
    # production contract: f32 outputs are (re, im) planes; the runtime
    # writer interleaves host-side at the wire boundary (the same split as
    # the reference's CPU FormatConverter; see config.device_interleave)
    m = Modulator(layout, ModSettings(dab_mode=1, device_interleave=False))
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

    def impl(fic, subs, state, cg, vk):
        iq, st, stats = m._modulate_impl(fic, subs, state, cg, vk)
        # tiny readback probe; iq itself stays a real (materialised) output
        probe = jnp.sum(iq[0][:, 0]) + jnp.sum(iq[1][:, 0])
        return iq, probe, st

    step = jax.jit(impl, donate_argnums=(2,))

    state = m.init_state()
    # warmup / compile, with a real completion barrier (host readback)
    iq, probe, state = step(staged[0][0], staged[0][1], state, cg, vk)
    float(probe)

    def timed_run(n):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            fic, subs = staged[i % n_stage]
            iq, probe, state = step(fic, subs, state, cg, vk)
        float(probe)        # forces the serial chain: the only real barrier
        return time.perf_counter() - t0

    # calibrate so the long run covers several seconds of device time
    t_short = timed_run(8)
    per_step = max(t_short / 8, 1e-4)
    n1 = max(8, min(1000, int(1.0 / per_step)))
    n2 = max(n1 * 4, n1 + 32)
    # median of three slope estimates: the tunnel adds multi-hundred-ms
    # jitter that can make a single (t2-t1) difference go negative
    slopes = []
    for _ in range(3):
        t1 = timed_run(n1)
        t2 = timed_run(n2)
        slopes.append((t2 - t1) / (n2 - n1))
    slopes.sort()
    slope = slopes[1]
    if slope <= 0:      # pathological jitter: fall back to the long run
        slope = t2 / n2

    tf_per_s = batch_tf / slope
    samples_per_s = tf_per_s * p.tf_samples
    print(json.dumps({
        "metric": "COFDM I/Q samples/s per chip (TM-I, 2.048 MS/s native)",
        "value": round(samples_per_s),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / 2_048_000.0, 2),
        "note": ("marginal-slope over a readback-forced serial chain; "
                 "block_until_ready does not wait on this transport"),
    }))


if __name__ == "__main__":
    main()
