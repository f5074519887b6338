"""RC reconfiguration without recompile stalls: taps/coef hot-swap as
runtime arguments (no retrace) and the compiled-modulator cache reused on
settings flips (ref behaviour: src/FIRFilter.cpp:137-140 mutex swap,
src/MemlessPoly.cpp:192-231; SURVEY section 7 executable cache)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from dabmod_tpu.config import ModSettings
from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
from dabmod_tpu.models import (Modulator, clear_modulator_cache,
                               get_modulator, make_default_layout)

SPECS = ((0, 24, 0x22), (48, 48, 0x02))


def _batch(n=4):
    return parse_eti_frames(synth_eti_batch(n, mode=1, subch_specs=SPECS))


def _write_taps(path, taps):
    path.write_text(f"{len(taps)}\n" + "\n".join(f"{t}" for t in taps))
    return str(path)


def test_taps_reload_no_retrace(tmp_path):
    taps1 = [0.1, 0.5, 0.8, 0.5, 0.1]
    taps2 = [0.2, 0.4, 0.9, 0.4, 0.2]
    f = tmp_path / "taps.txt"
    _write_taps(f, taps1)
    layout = make_default_layout(1, subch_specs=SPECS)
    m = Modulator(layout, ModSettings(dab_mode=1,
                                      filter_taps_file=str(f)))
    b = _batch()
    iq1, _, _ = m.modulate_eti(b, m.init_state())
    iq1 = np.asarray(iq1)
    assert m._modulate._cache_size() == 1

    assert m.update_fir_taps(np.asarray(taps2, np.float32))
    iq2, _, _ = m.modulate_eti(b, m.init_state())
    iq2 = np.asarray(iq2)
    # no retrace happened...
    assert m._modulate._cache_size() == 1
    # ...and the new taps are in effect
    assert not np.array_equal(iq1, iq2)

    # different tap count => shape change => hot swap refused
    assert not m.update_fir_taps(np.ones(7, np.float32))


def test_taps_runtime_arg_matches_constant_path(tmp_path):
    """The traced-taps banded operator must produce exactly what the
    constant-folded numpy operator produces."""
    from dabmod_tpu.ops import filters
    rng = np.random.default_rng(7)
    taps = rng.normal(size=45).astype(np.float32)
    x = (jnp.asarray(rng.normal(size=(2, 2048)).astype(np.float32)),
         jnp.asarray(rng.normal(size=(2, 2048)).astype(np.float32)))
    y_const = filters.fir_filter(x, taps)
    y_traced = filters.fir_filter(x, jnp.asarray(taps))
    for a, b in zip(y_const, y_traced):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-5)
    # irregular length path
    x2 = (x[0][:, :2000], x[1][:, :2000])
    y_const2 = filters.fir_filter(x2, taps)
    y_traced2 = filters.fir_filter(x2, jnp.asarray(taps))
    for a, b in zip(y_const2, y_traced2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-5)


def test_dpd_coef_hot_swap(tmp_path):
    coef = tmp_path / "poly.coef"
    coef.write_text("1\n5\n1\n0\n0\n0\n0\n0\n0\n0\n0\n0\n")
    layout = make_default_layout(1, subch_specs=SPECS)
    m = Modulator(layout, ModSettings(dab_mode=1,
                                      poly_coef_file=str(coef)))
    b = _batch()
    iq1, _, _ = m.modulate_eti(b, m.init_state())
    iq1 = np.asarray(iq1)
    assert m._modulate._cache_size() == 1

    am = np.array([0.9, 0.01, 0, 0, 0], np.float32)
    pm = np.array([0.05, 0, 0, 0, 0], np.float32)
    assert m.update_dpd("poly", (am, pm))
    iq2, _, _ = m.modulate_eti(b, m.init_state())
    assert m._modulate._cache_size() == 1
    assert not np.array_equal(iq1, np.asarray(iq2))

    # a LUT file cannot hot-swap into a poly pipeline
    assert not m.update_dpd("lut", (1.0, np.zeros((32, 2), np.float32)))


def test_modulator_cache_flip_returns_same_instance():
    clear_modulator_cache()
    layout = make_default_layout(1, subch_specs=SPECS)
    s = ModSettings(dab_mode=1)
    m_off = get_modulator(layout, s)
    assert not m_off.cache_hit

    s.tii_enable = True
    m_on = get_modulator(layout, s)
    assert m_on is not m_off and not m_on.cache_hit

    s.tii_enable = False
    assert get_modulator(layout, s) is m_off          # instant: no rebuild
    s.tii_enable = True
    m_on2 = get_modulator(layout, s)
    assert m_on2 is m_on and m_on2.cache_hit

    # runtime-only fields must not fragment the cache
    s.digital_gain = 0.5
    s.gain_mode_variance = 2.0
    assert get_modulator(layout, s) is m_on
    clear_modulator_cache()


def test_cached_modulator_refreshes_file_contents(tmp_path):
    clear_modulator_cache()
    f = tmp_path / "taps.txt"
    _write_taps(f, [0.1, 0.5, 0.8, 0.5, 0.1])
    layout = make_default_layout(1, subch_specs=SPECS)
    s = ModSettings(dab_mode=1, filter_taps_file=str(f))
    m1 = get_modulator(layout, s)
    b = _batch()
    iq1 = np.asarray(m1.modulate_eti(b, m1.init_state())[0])

    # park it (flip away), change the taps file, flip back
    s2 = dataclasses.replace(s, filter_taps_file="")
    get_modulator(layout, s2)
    _write_taps(f, [0.3, 0.3, 0.3, 0.3, 0.3])
    m2 = get_modulator(layout, s)
    assert m2 is m1 and m2.cache_hit
    iq2 = np.asarray(m2.modulate_eti(b, m2.init_state())[0])
    assert m2._modulate._cache_size() == 1
    assert not np.array_equal(iq1, iq2)
    clear_modulator_cache()


def test_runtime_rc_tapsfile_hot_swap(tmp_path):
    """Full runtime: an RC tapsfile write with the same tap count swaps
    coefficients live without marking the pipeline for rebuild."""
    from dabmod_tpu.rc import rcs
    from dabmod_tpu.runtime import ModRuntime

    f = tmp_path / "taps.txt"
    _write_taps(f, [0.25, 0.5, 1.0, 0.5, 0.25])
    frames = synth_eti_batch(8, mode=1, subch_specs=SPECS)
    inp = tmp_path / "in.eti"
    inp.write_bytes(frames.tobytes())
    out = str(tmp_path / "out.iq")
    s = ModSettings(input_name=str(inp), output="file", output_name=out,
                    file_output_format="complexf", batch_tf=1,
                    filter_taps_file=str(f))
    s.normalise_for_output()
    rt = ModRuntime(s)
    try:
        rt.run_batches(max_batches=1)
        assert rt.modulator is not None
        ntraces = rt.modulator._modulate._cache_size()

        f2 = tmp_path / "taps2.txt"
        _write_taps(f2, [0.2, 0.4, 0.8, 0.4, 0.2])
        rcs.set_param("firfilter", "tapsfile", str(f2))
        assert not rt._rebuild                      # hot swap, no rebuild
        rt.run_batches(max_batches=1)
        assert rt.modulator._modulate._cache_size() == ntraces

        # changing the tap count falls back to the rebuild path
        f3 = tmp_path / "taps3.txt"
        _write_taps(f3, [0.1, 0.2, 0.4, 0.8, 0.4, 0.2, 0.1])
        rcs.set_param("firfilter", "tapsfile", str(f3))
        assert rt._rebuild
    finally:
        rt.close()
