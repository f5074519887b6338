"""End-to-end pipeline validation against the reference front-end golden run
plus full-chain invariants (gain, GI, output shapes, streaming continuity)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dabmod_tpu import tables
from dabmod_tpu.config import ModSettings
from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
from dabmod_tpu.models import Modulator, make_default_layout
from dabmod_tpu.ops import cplx, ofdm
from golden import load


def test_frontend_matches_reference_chain():
    """8 ETI frames, 2 sub-channels (EEP-A3 64k + UEP 128/3) -> the exact
    differential-modulated symbol stream the reference produces."""
    layout = make_default_layout(1, subch_specs=((0, 24, 0x22), (48, 48, 0x02)))
    m = Modulator(layout, ModSettings(dab_mode=1))

    fic = load("e2e_fic_in").reshape(8, 96)
    sub0 = load("e2e_sub0_in").reshape(8, -1)
    sub1 = load("e2e_sub1_in").reshape(8, -1)
    expect = load("e2e_symbols").reshape(2, 76, 1536)

    hist = tuple(jnp.zeros((15, int(mm.shape[1])), jnp.int32)
                 for mm in m._subch_masks)
    syms, _ = m.frontend(fic, (sub0, sub1), hist)
    got = cplx.planes_to_complex(syms)
    assert got.shape == (2, 76, 1536)
    # the reference accumulates float32 rounding through its product chain;
    # our phase-domain result is exact, so compare with float32 eps
    np.testing.assert_allclose(got, expect, atol=4e-6)
    # phases must agree exactly
    np.testing.assert_array_equal(np.angle(got).round(3),
                                  np.angle(expect).round(3))


def test_frontend_matches_reference_realistic_mux():
    """16 ETI frames through a production-shaped 17-sub-channel / 855-CU
    ensemble (mixed UEP + EEP-A/B) -> the exact reference symbol stream.
    Proves parity beyond the 2-sub-channel toy layout."""
    from dabmod_tpu.eti import REALISTIC_MUX_SPECS

    layout = make_default_layout(1, subch_specs=REALISTIC_MUX_SPECS)
    m = Modulator(layout, ModSettings(dab_mode=1))

    fic = load("e2e_real_fic_in").reshape(16, 96)
    blob = load("e2e_real_sub_in")
    sizes = [stl * 8 for _, stl, _ in REALISTIC_MUX_SPECS]
    per_frame = sum(sizes)
    frames = blob.reshape(16, per_frame)
    subs, off = [], 0
    for n in sizes:
        subs.append(frames[:, off:off + n])
        off += n
    expect = load("e2e_real_symbols").reshape(4, 76, 1536)

    hist = tuple(jnp.zeros((15, int(mm.shape[1])), jnp.int32)
                 for mm in m._subch_masks)
    syms, _ = m.frontend(fic, tuple(subs), hist)
    got = cplx.planes_to_complex(syms)
    assert got.shape == (4, 76, 1536)
    np.testing.assert_allclose(got, expect, atol=4e-6)
    np.testing.assert_array_equal(np.angle(got).round(3),
                                  np.angle(expect).round(3))


def test_full_pipeline_shapes_and_stats():
    layout = make_default_layout(1)
    m = Modulator(layout, ModSettings(dab_mode=1))
    raw = synth_eti_batch(8, mode=1)
    batch = parse_eti_frames(raw)
    state = m.init_state()
    iq, state, stats = m.modulate_eti(batch, state)
    assert iq.shape == (2, tables.mode_params(1).tf_samples, 2)
    assert iq.dtype == jnp.float32
    assert int(state["tf_index"]) == 2
    # power must be normalised to the var-mode target (default settings)
    rms = float(jnp.sqrt(jnp.mean(jnp.sum(iq[:, 2656:] ** 2, axis=-1))))
    assert 5000 < rms < 20000   # sigma * 4 scaled to 32767


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_all_modes_run(mode):
    specs = ((0, 24, 0x22),)
    layout = make_default_layout(mode, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=mode))
    p = tables.mode_params(mode)
    raw = synth_eti_batch(2 * p.cif_count, mode=mode)
    batch = parse_eti_frames(raw)
    iq, state, _ = m.modulate_eti(batch, m.init_state())
    assert iq.shape == (2, p.tf_samples, 2)
    assert bool(jnp.all(jnp.isfinite(iq)))


def test_streaming_continuity():
    """Modulating 4 TFs in one batch == two batches of 2 TFs."""
    layout = make_default_layout(1)
    m = Modulator(layout, ModSettings(dab_mode=1))
    raw = synth_eti_batch(16, mode=1)
    batch = parse_eti_frames(raw)

    iq_full, _, _ = m.modulate_eti(batch, m.init_state())

    state = m.init_state()
    b1 = parse_eti_frames(raw[:8])
    b2 = parse_eti_frames(raw[8:])
    iq1, state, _ = m.modulate_eti(b1, state)
    iq2, state, _ = m.modulate_eti(b2, state)
    got = np.concatenate([np.asarray(iq1), np.asarray(iq2)], axis=0)
    # different batch shapes compile to different reduction orders in the
    # gain stage, so require agreement only to float32 round-off
    np.testing.assert_allclose(got, np.asarray(iq_full), rtol=2e-5,
                               atol=2e-2)


def test_gain_modes():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((1, 3, 256)) + 1j * rng.standard_normal((1, 3, 256))
         ).astype(np.complex64)
    x_planes = (jnp.asarray(x.real.astype(np.float32)),
                jnp.asarray(x.imag.astype(np.float32)))
    # independent NumPy implementation of the reference's scalar formulas
    # (src/GainControl.cpp:344-502)
    def ref_gain(sym, mode, k=4.0):
        if mode == ofdm.GAIN_FIX:
            return 512.0
        if mode == ofdm.GAIN_MAX:
            mx = max(np.abs(sym.real).max(), np.abs(sym.imag).max())
            return 1.0 if int(mx) == 0 else 32767.0 / mx
        mean = sym.mean()
        d = sym - mean
        v_re = 0.5 * ((d.real[0::2] ** 2).mean() + (d.real[1::2] ** 2).mean())
        v_im = 0.5 * ((d.imag[0::2] ** 2).mean() + (d.imag[1::2] ** 2).mean())
        sig = max(np.sqrt(v_re), np.sqrt(v_im)) * k
        return 1.0 if int(sig) == 0 else 32767.0 / sig

    for mode in (ofdm.GAIN_FIX, ofdm.GAIN_MAX, ofdm.GAIN_VAR):
        gains = np.asarray(ofdm.compute_gain(x_planes, mode, 4.0))[0]
        expect = [ref_gain(x[0, s], mode) for s in range(3)]
        # NULL symbol (index 0) borrows symbol 1's gain
        np.testing.assert_allclose(gains, [expect[1], expect[1], expect[2]],
                                   rtol=2e-5)


def test_cfr_reduces_papr():
    layout = make_default_layout(1)
    s = ModSettings(dab_mode=1, enable_cfr=True, cfr_clip=3.0,
                    cfr_error_clip=0.1)
    m = Modulator(layout, s)
    raw = synth_eti_batch(4, mode=1)
    batch = parse_eti_frames(raw)
    iq, _, stats = m.modulate_eti(batch, m.init_state())
    assert "cfr_clip" in stats and int(stats["cfr_clip"][0]) > 0

    m2 = Modulator(layout, ModSettings(dab_mode=1))
    iq2, _, _ = m2.modulate_eti(parse_eti_frames(raw), m2.init_state())
    from dabmod_tpu.ops.filters import papr_db
    def papr_pairs(a):
        flat = np.asarray(a).reshape(-1, 2)
        return float(papr_db((jnp.asarray(flat[:, 0]),
                              jnp.asarray(flat[:, 1])), axis=0))
    p_with = papr_pairs(iq[:, 2656:])
    p_without = papr_pairs(iq2[:, 2656:])
    assert p_with < p_without


@pytest.mark.parametrize("mode", [2, 3, 4])
def test_frontend_matches_reference_other_modes(mode):
    """Modes 2/3/4 front end (mode-3 128-byte FIC / 153 symbols, mode-4
    2-CIF transmission frames) against the reference chain."""
    layout = make_default_layout(mode, subch_specs=((0, 24, 0x22),))
    m = Modulator(layout, ModSettings(dab_mode=mode))
    p = tables.mode_params(mode)

    nframes = 2 * p.cif_count          # ETI frames for 2 TFs
    fic = load(f"e2e_m{mode}_fic_in").reshape(nframes, p.fic_size_in)
    sub = load(f"e2e_m{mode}_sub_in").reshape(nframes, -1)
    expect = load(f"e2e_m{mode}_symbols").reshape(2, p.nb_symbols,
                                                  p.nb_carriers)

    hist = tuple(jnp.zeros((15, int(mm.shape[1])), jnp.int32)
                 for mm in m._subch_masks)
    syms, _ = m.frontend(fic, (sub,), hist)
    got = cplx.planes_to_complex(syms)
    np.testing.assert_allclose(got, expect, atol=4e-6)
