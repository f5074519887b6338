#!/usr/bin/env python
"""Measure the time-interleaver state collectives on the 8-device mesh.

ARCHITECTURE.md section 6 used to *estimate* the cost of carrying the
16-CIF time-interleaver history as replicated state (~1.4 MB/s/chip
analytically).  This tool replaces the estimate with numbers:

1. compiles the sharded step and reports every collective in the
   optimized HLO (kind, element count, bytes) -- the halo exchanges and
   the new-history replication XLA inserts for the concat formulation;
2. wall-clocks the sharded step against a variant with the TI state
   severed (zero local history, outputs discarded), an upper bound on
   everything the state carry can cost per step.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
     python tools/measure_ti_collectives.py
"""
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax                                      # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp                         # noqa: E402
import numpy as np                              # noqa: E402

from dabmod_tpu.config import ModSettings       # noqa: E402
from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch  # noqa: E402
from dabmod_tpu.models import Modulator, make_default_layout  # noqa: E402
from dabmod_tpu.parallel.sharding import (      # noqa: E402
    ShardedModulator, make_mesh)

DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
               "bf16": 2, "f16": 2, "s16": 2, "u16": 2}


def collectives_in(compiled) -> list:
    txt = compiled.as_text()
    out = []
    for m in re.finditer(
            r"(all-gather|collective-permute|all-reduce|all-to-all|"
            r"reduce-scatter)[-a-z]*\(", txt):
        line_start = txt.rfind("\n", 0, m.start()) + 1
        line = txt[line_start:txt.find("\n", m.start())]
        # result shape: between "= " and the op name's "("
        rhs = line.split("=", 1)[1] if "=" in line else line
        rhs = rhs[:rhs.find("(")]
        shapes = re.findall(r"(f32|s32|u32|s8|u8|s16|u16|bf16|pred)"
                            r"\[([0-9,]*)\]", rhs)
        nbytes = 0
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES[dt]
        out.append({"kind": m.group(1), "bytes": nbytes,
                    "line": line.strip()[:140]})
    return out


def bench(fn, args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def measure_config(name, specs, settings_kw, B):
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1, **settings_kw))
    batch = parse_eti_frames(synth_eti_batch(B * 4, mode=1,
                                             subch_specs=specs))
    mesh = make_mesh(8)
    sm = ShardedModulator(m, mesh)

    state = sm.init_state()
    fic = sm._put(batch.fic)
    subs = tuple(sm._put(x) for x in batch.subchannels)
    cg = jnp.float32(m.settings.normalise * m.settings.digital_gain)
    vk = jnp.float32(m.settings.gain_mode_variance)

    lowered = sm._step.lower(fic, subs, state, cg, vk)
    compiled = lowered.compile()
    colls = collectives_in(compiled)
    total_bytes = sum(c["bytes"] for c in colls)
    print(f"[{name}] collectives in the sharded step ({len(colls)}):")
    for c in colls:
        print(f"  {c['kind']:20s} {c['bytes']:8d} B  {c['line']}")
    print(f"[{name}] total collective payload per step: {total_bytes} B "
          f"({total_bytes / (B * 0.096) / 1e6:.2f} MB/s at real-time, "
          f"batch {B} TF)")

    t_state = bench(lambda f, s: sm._step(f, s, sm.init_state(), cg, vk),
                    (fic, subs))

    def impl_nostate(fic_b, sub_b, cg, vk):
        st = m.init_state()
        iq, _st, stats = m._modulate_impl(fic_b, sub_b, st, cg, vk)
        return iq
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard_t = NamedSharding(mesh, P(mesh.axis_names))
    repl = NamedSharding(mesh, P())
    n_sub = len(layout.subchannels)
    step_nostate = jax.jit(
        impl_nostate,
        in_shardings=(shard_t, (shard_t,) * n_sub, repl, repl))
    t_nostate = bench(lambda f, s: step_nostate(f, s, cg, vk), (fic, subs))

    print(f"[{name}] step with replicated state: {t_state * 1e3:.2f} ms; "
          f"severed state: {t_nostate * 1e3:.2f} ms "
          f"({(t_state - t_nostate) / t_state * 100:+.1f}%)")
    return {
        "config": name,
        "n_subchannels": len(specs),
        "collectives": colls,
        "n_collectives": len(colls),
        "total_collective_bytes_per_step": total_bytes,
        "batch_tf": B,
        "mb_per_s_realtime": total_bytes / (B * 0.096) / 1e6,
        "t_state_ms": t_state * 1e3,
        "t_nostate_ms": t_nostate * 1e3,
    }


def main():
    import argparse
    import tempfile
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also measure the full stateful configuration "
                    "(FIR+winGI+CFR+TII+resampler+DPD) on the realistic "
                    "17-sub-channel ensemble")
    ap.add_argument("--json", dest="json_out",
                    default=os.path.join(REPO, "TI_COLLECTIVES.json"))
    args = ap.parse_args()

    toy = ((0, 24, 0x22), (48, 48, 0x02))
    results = [measure_config("base 2sub", toy, {}, 16)]

    if args.full:
        from dabmod_tpu.eti import REALISTIC_MUX_SPECS
        with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                         delete=False) as f:
            f.write("1\n5\n1.0\n0\n0\n0\n0\n0\n0\n0\n0\n0\n")
            poly = f.name
        full_kw = dict(filter_taps_file="default", ofdm_window_overlap=32,
                       enable_cfr=True, cfr_clip=12.0, cfr_error_clip=3.0,
                       tii_enable=True, output_rate=4_096_000,
                       poly_coef_file=poly,
                       ofdm_backend="pallas-interpret")
        results.append(measure_config(
            "realistic17 full", REALISTIC_MUX_SPECS, full_kw, 24))
        os.unlink(poly)

    with open(args.json_out, "w") as f:
        json.dump(results if len(results) > 1 else results[0], f, indent=1)


if __name__ == "__main__":
    main()
