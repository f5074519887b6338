#!/usr/bin/env python
"""Multi-host scaling benchmark: N separate processes, each a "host" with
2 virtual CPU chips, joined with jax.distributed over localhost and meshed
as Mesh(('host', 'chip')).

Weak-scaling measurement: the per-chip batch is fixed, so ideal scaling is
throughput proportional to total chips; efficiency = T_N / (N * T_1).

CPU-mesh timings validate the multi-process mesh/collective path and
measure its orchestration overhead (real ICI/DCN scaling needs a pod
slice; the sharding code is identical).  The reference is single-process
only (SURVEY.md section 2.7) -- this axis is the TPU framework's own.

Usage: python tools/bench_scaling.py [--hosts 1,2,4]  (parent)
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHIPS_PER_HOST = 2
BATCH_PER_CHIP = 8
ITERS = 4


def _specs():
    """Ensemble under test: the 2-sub-channel toy, or the production-shaped
    17-sub-channel mux when DABMOD_SCALING_REALISTIC=1 (--realistic)."""
    if os.environ.get("DABMOD_SCALING_REALISTIC"):
        from dabmod_tpu.eti import REALISTIC_MUX_SPECS
        return REALISTIC_MUX_SPECS
    return ((0, 24, 0x22), (48, 48, 0x02))


def worker(n_hosts: int, rank: int, port: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
    from dabmod_tpu.models import Modulator, make_default_layout
    from dabmod_tpu.parallel.sharding import (ShardedModulator,
                                              init_distributed,
                                              make_host_chip_mesh)

    if n_hosts > 1:
        init_distributed(f"localhost:{port}", n_hosts, rank)
    assert len(jax.devices()) == n_hosts * CHIPS_PER_HOST, (
        len(jax.devices()), n_hosts)

    specs = _specs()
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1))
    B = n_hosts * CHIPS_PER_HOST * BATCH_PER_CHIP
    raw = synth_eti_batch(B * 4, mode=1, subch_specs=specs)
    b = parse_eti_frames(raw)

    mesh = make_host_chip_mesh(n_hosts, CHIPS_PER_HOST)
    sm = ShardedModulator(m, mesh)
    state = sm.init_state()
    iq, state, _ = sm.modulate(b.fic, tuple(b.subchannels), state)
    iq.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        iq, state, _ = sm.modulate(b.fic, tuple(b.subchannels), state)
    iq.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS

    # cross-host correctness, elementwise: every rank replays the same
    # deterministic input single-process (unsharded) and compares its own
    # addressable shards of the final sharded batch against the matching
    # global slices; rank 0 aggregates the per-rank max-abs-diff through
    # a scratch directory.  Bound: one s16 wire LSB (1.0 at the 32767-scale
    # output) -- per-shape matmul blocking may differ in f32 rounding;
    # measured 0.0 on this harness.
    import tempfile
    import numpy as np
    ref_state = m.init_state()
    for _ in range(ITERS + 1):
        ref, ref_state, _ = m.modulate_eti(b, ref_state)
    ref_np = np.asarray(ref)
    local_max = 0.0
    for shard in iq.addressable_shards:
        d = np.abs(np.asarray(shard.data) - ref_np[shard.index])
        local_max = max(local_max, float(d.max()))
    scratch = os.path.join(tempfile.gettempdir(),
                           f"dabmod_scaling_{port}")
    os.makedirs(scratch, exist_ok=True)
    with open(os.path.join(scratch, f"rank{rank}.json"), "w") as f:
        json.dump({"max_abs_diff": local_max}, f)
    if rank == 0:
        diffs = {}
        deadline = time.time() + 120
        while len(diffs) < n_hosts and time.time() < deadline:
            for r in range(n_hosts):
                p = os.path.join(scratch, f"rank{r}.json")
                if r not in diffs and os.path.exists(p):
                    try:
                        diffs[r] = json.load(open(p))["max_abs_diff"]
                    except (ValueError, OSError):
                        pass
            time.sleep(0.05)
        max_diff = max(diffs.values()) if diffs else float("nan")
        print(json.dumps({"hosts": n_hosts,
                          "chips": n_hosts * CHIPS_PER_HOST,
                          "samples_per_s": B * 196608 / dt,
                          "max_abs_diff": max_diff,
                          "ranks_compared": len(diffs),
                          "elementwise_ok": len(diffs) == n_hosts
                          and max_diff < 0.05}), flush=True)


def single_process(chip_counts) -> list:
    """Chip-axis scaling inside one process (8 virtual CPU devices):
    in-process collectives model the ICI path; the multi-process mode
    above models the DCN/host axis."""
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
    from dabmod_tpu.models import Modulator, make_default_layout
    from dabmod_tpu.parallel.sharding import ShardedModulator, make_mesh

    specs = _specs()
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1))
    rows = []
    base = None
    for n in chip_counts:
        B = n * BATCH_PER_CHIP
        raw = synth_eti_batch(B * 4, mode=1, subch_specs=specs)
        b = parse_eti_frames(raw)
        sm = ShardedModulator(m, make_mesh(n))
        state = sm.init_state()
        iq, state, _ = sm.modulate(b.fic, tuple(b.subchannels), state)
        iq.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            iq, state, _ = sm.modulate(b.fic, tuple(b.subchannels), state)
        iq.block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
        r = {"chips": n, "samples_per_s": B * 196608 / dt}
        if base is None:
            base = r["samples_per_s"]
        r["efficiency"] = r["samples_per_s"] / (n * base)
        rows.append(r)
        print(f"chips={n} {r['samples_per_s'] / 1e6:8.1f} MS/s  "
              f"efficiency={r['efficiency']:.2f}", flush=True)
    return rows


def run_config(n_hosts: int, port: int) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # do not claim the tunnelled TPU
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={CHIPS_PER_HOST}"])
    procs = []
    for rank in range(n_hosts):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--n-hosts", str(n_hosts), "--rank", str(rank),
             "--port", str(port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE if rank == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, text=True))
    out, _ = procs[0].communicate(timeout=600)
    for p in procs[1:]:
        p.wait(timeout=60)
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--n-hosts", type=int, default=1)
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--port", type=int, default=37371)
    ap.add_argument("--hosts", default="1,2,4")
    ap.add_argument("--chips", default=None,
                    help="run single-process chip-axis scaling instead, "
                    "e.g. --chips 1,2,4,8")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--realistic", action="store_true",
                    help="use the 17-sub-channel realistic ensemble")
    args = ap.parse_args()
    if args.realistic:
        os.environ["DABMOD_SCALING_REALISTIC"] = "1"

    if args.worker:
        worker(args.n_hosts, args.rank, args.port)
        return

    if args.chips:
        if os.environ.get("PALLAS_AXON_POOL_IPS"):
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            flags = [f for f in env.get("XLA_FLAGS", "").split()
                     if "host_platform_device_count" not in f]
            nmax = max(int(x) for x in args.chips.split(","))
            env["XLA_FLAGS"] = " ".join(
                flags + [f"--xla_force_host_platform_device_count={nmax}"])
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        rows = single_process([int(x) for x in args.chips.split(",")])
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(rows, f, indent=1)
        return

    rows = []
    base = None
    for i, n in enumerate(int(x) for x in args.hosts.split(",")):
        r = run_config(n, args.port + i)
        if base is None and r["hosts"] == 1:
            base = r["samples_per_s"]
        r["efficiency"] = (r["samples_per_s"] / (r["hosts"] * base)
                           if base else None)
        rows.append(r)
        eff = f"{r['efficiency']:.2f}" if r["efficiency"] else "n/a"
        ok = "ok" if r.get("elementwise_ok") else "MISMATCH"
        print(f"hosts={r['hosts']} chips={r['chips']} "
              f"{r['samples_per_s'] / 1e6:8.1f} MS/s  efficiency={eff}  "
              f"output={ok} (max_abs_diff={r.get('max_abs_diff')})",
              flush=True)
    note = ("localhost CPU harness: all virtual hosts share one machine's "
            "physical cores, so weak-scaling 'efficiency' is bounded by "
            "~1/N by construction -- the meaningful results here are "
            "elementwise_ok (every rank compares its addressable shards "
            "elementwise against a single-process replay; the bound is "
            "one s16 wire LSB -- measured 0.0 here) and the "
            "collective-path overhead; real scaling efficiency requires "
            "a pod slice (the sharding code is identical)")
    print(note, flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"note": note, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
