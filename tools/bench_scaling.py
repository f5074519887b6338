#!/usr/bin/env python
"""Scaling-efficiency benchmark over a virtual N-device CPU mesh.

Measures the sharded modulator at 1/2/4/8 devices and prints per-device
efficiency.  CPU-mesh timings demonstrate the sharding harness (real ICI
scaling requires a pod slice; the sharding path is identical).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax
import jax.numpy as jnp

from dabmod_tpu.config import ModSettings
from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
from dabmod_tpu.models import Modulator, make_default_layout
from dabmod_tpu.parallel.sharding import ShardedModulator, make_mesh


def measure(n_dev, batch_per_dev=2, iters=8):
    specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1))
    B = n_dev * batch_per_dev
    raw = synth_eti_batch(B * 4, mode=1, subch_specs=specs)
    b = parse_eti_frames(raw)
    sm = ShardedModulator(m, make_mesh(n_dev))
    state = sm.init_state()
    iq, state, _ = sm.modulate(b.fic, tuple(b.subchannels), state)
    iq.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        iq, state, _ = sm.modulate(b.fic, tuple(b.subchannels), state)
    iq.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return B * 196608 / dt


def main():
    print("NOTE: virtual CPU devices share the same physical cores; this "
          "validates the sharding harness, not ICI scaling (needs a pod "
          "slice).")
    base = None
    for n in (1, 2, 4, 8):
        sps = measure(n)
        if base is None:
            base = sps
        eff = sps / (base * n) * 100
        print(f"devices={n}: {sps/1e6:8.1f} MS/s   "
              f"scaling efficiency {eff:5.1f}%")


if __name__ == "__main__":
    main()
