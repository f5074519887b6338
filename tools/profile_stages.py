#!/usr/bin/env python
"""Per-stage device-time profile of the modulator pipeline.

The reference prints a per-flowgraph-node process-time percentage table at
teardown (src/Flowgraph.cpp:248-267).  The fused TPU pipeline's equivalent
is a jax.profiler device trace aggregated by the jax.named_scope stage
annotations in models/modulator.py.

Usage: python tools/profile_stages.py [config_name] [batch_tf]
  config_name: substring of a tools/bench_configs.py config (default "full")
"""
import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ["fec", "qpsk_map", "diff_mod", "carriers", "tii_null", "ofdm_ifft",
          "kiss_ifft", "cfr", "gain", "guard_interval", "fir", "resampler",
          "dpd", "interleave_out", "format_convert"]


def hlo_scope_map(compiled) -> dict:
    """Map HLO instruction names to their jax.named_scope stage.

    Fused ops lose the scope from their display names, but the optimized
    HLO's per-instruction metadata keeps the op_name path (e.g.
    jit(impl)/resampler/dot_general); parse it once so profile events can
    be attributed exactly."""
    import re
    out = {}
    for m in re.finditer(
            r"%?([\w.\-]+)\s*=\s[^\n]*metadata=\{[^}]*op_name=\"([^\"]*)\"",
            compiled.as_text()):
        name, path = m.group(1), m.group(2)
        for s in STAGES:
            if "/" + s + "/" in path or path.endswith("/" + s) \
                    or path.startswith(s + "/") or "/" + s + " " in path:
                out[name] = s
                break
    return out


def collect_device_times(logdir, scope_map=None):
    """Aggregate XLA-op device time by named_scope prefix from an xplane."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    totals = collections.Counter()
    total_ns = 0
    for path in glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                          recursive=True):
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            meta = plane.event_metadata
            stats_meta = plane.stat_metadata
            for line in plane.lines:
                if line.name not in ("XLA Ops", "XLA TraceMe"):
                    continue
                for ev in line.events:
                    md = meta.get(ev.metadata_id)
                    if md is None:
                        continue
                    name = md.name
                    # scope shows up in the hlo long name / tf_op stat
                    long_name = md.display_name or name
                    for st in ev.stats:
                        sm = stats_meta.get(st.metadata_id)
                        if sm is not None and sm.name in (
                                "tf_op", "hlo_op", "name"):
                            if st.str_value:
                                long_name = st.str_value
                    stage = None
                    if scope_map is not None:
                        # md.name carries the full HLO line on TPU planes;
                        # the bare instruction name is the display_name
                        short = (md.display_name or name).lstrip("%")
                        stage = scope_map.get(short.split(" ")[0])
                    if stage is None:
                        for s in STAGES:
                            if s + "/" in long_name \
                                    or long_name.startswith(s) \
                                    or "/" + s in long_name:
                                stage = s
                                break
                    totals[stage or "(other)"] += ev.duration_ps
                    total_ns += ev.duration_ps
    return totals, total_ns


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/dabmod_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_configs import CONFIGS
    from dabmod_tpu import tables
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
    from dabmod_tpu.models import Modulator, make_default_layout

    sel = sys.argv[1] if len(sys.argv) > 1 else "full"
    batch_tf = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    name, mode, kw = next((c for c in CONFIGS if sel in c[0]))
    kw = dict(kw)
    if kw.get("poly_coef_file") == "__builtin_poly__":
        with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                         delete=False) as f:
            f.write("1\n5\n1.0\n0\n0\n0\n0\n0\n0\n0\n0\n0\n")
            kw["poly_coef_file"] = f.name

    if kw.pop("__realistic__", False):
        from dabmod_tpu.eti import REALISTIC_MUX_SPECS
        specs = REALISTIC_MUX_SPECS
    else:
        specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(mode, subch_specs=specs)
    # production contract (same as tools/bench_configs.py): f32 planes,
    # host-side interleave
    m = Modulator(layout, ModSettings(dab_mode=mode,
                                      device_interleave=False, **kw))
    p = tables.mode_params(mode)
    raw = synth_eti_batch(batch_tf * p.cif_count, mode=mode,
                          subch_specs=specs, seed=0)
    b = parse_eti_frames(raw)
    fic = jax.device_put(jnp.asarray(b.fic))
    subs = tuple(jax.device_put(jnp.asarray(x)) for x in b.subchannels)
    s = m.settings
    cg = jnp.float32(s.normalise * s.digital_gain)
    vk = jnp.float32(s.gain_mode_variance)
    # scalar probe + final readback: block_until_ready does not wait for
    # execution on the axon tunnel, so the readback is the only real
    # barrier (see bench.py)
    def impl(fic, subs, state, cg, vk):
        iq, st, stats = m._modulate_impl(fic, subs, state, cg, vk)
        if isinstance(iq, tuple):        # f32 planes contract
            probe = jnp.sum(iq[0][:, 0]) + jnp.sum(iq[1][:, 0])
        else:
            probe = jnp.sum(iq[..., 0, 0])
        return iq, probe, st

    step = jax.jit(impl, donate_argnums=(2,))

    state = m.init_state()
    scope_map = hlo_scope_map(
        step.lower(fic, subs, state, cg, vk).compile())
    iq, probe, state = step(fic, subs, state, cg, vk)
    float(probe)

    logdir = tempfile.mkdtemp(prefix="dabmod_prof_")
    n_iter = 100   # amortise the fixed tunnel round-trip of the final fetch
    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            iq, probe, state = step(fic, subs, state, cg, vk)
        float(probe)
        dt = time.perf_counter() - t0

    totals, total_ps = collect_device_times(logdir, scope_map)
    tf_duration = p.tf_samples / 2_048_000.0
    rt = n_iter * batch_tf * tf_duration / dt
    print(f"\nconfig '{name}' batch_tf={batch_tf}: "
          f"{dt / n_iter * 1e3:.3f} ms/step, {rt:.0f}x real-time")
    print(f"{'stage':16s} {'device ms/step':>14s} {'%':>6s}")
    for stage, ps in sorted(totals.items(), key=lambda kv: -kv[1]):
        ms = ps / 1e9 / n_iter
        print(f"{stage:16s} {ms:14.4f} {100.0 * ps / max(total_ps, 1):5.1f}%")
    dev_ms = total_ps / 1e9 / n_iter
    print(f"{'total device':16s} {dev_ms:14.4f}  (wall {dt/n_iter*1e3:.3f})")


if __name__ == "__main__":
    main()
