"""Validate OFDM-side stages against reference-generated golden vectors."""
import numpy as np
import jax.numpy as jnp
import pytest

from dabmod_tpu import tables
from dabmod_tpu.ops import cplx, fec, ofdm
from golden import load


# ---------------------------------------------------------------------------
# Phase reference
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_phase_reference(mode):
    expect = load(f"phaseref_m{mode}")
    got = tables.phase_ref_complex(mode)
    np.testing.assert_array_equal(got, expect)


# ---------------------------------------------------------------------------
# QPSK mapping (via phase-index domain)
# ---------------------------------------------------------------------------

def test_qpsk_mapping():
    data = load("qpsk_in")
    expect = load("qpsk_out")
    bits = jnp.asarray(np.unpackbits(data))[None]
    q = ofdm.qpsk_phase_indices(bits, 1536)
    got = cplx.planes_to_complex(ofdm.phases_to_carriers(q)).reshape(-1)
    np.testing.assert_array_equal(got, expect)


# ---------------------------------------------------------------------------
# Frequency interleaver
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_freq_interleaver(mode):
    cin = load(f"freqint_m{mode}_in")
    expect = load(f"freqint_m{mode}_out")
    carriers = tables.mode_params(mode).nb_carriers
    # gather the (re, im) planes separately: the axon TPU backend has no
    # complex64 transfer path, and planes are the production layout anyway
    xr, xi = cplx.planes_from_complex(cin.reshape(-1, carriers))
    inv = jnp.asarray(tables.freq_interleave_inverse(mode))
    got = (np.asarray(ofdm.freq_interleave(jnp.asarray(xr), inv))
           + 1j * np.asarray(ofdm.freq_interleave(jnp.asarray(xi), inv)))
    np.testing.assert_array_equal(got.astype(np.complex64).reshape(-1),
                                  expect)


# ---------------------------------------------------------------------------
# Differential modulator: phase-domain cumsum == reference complex products
# ---------------------------------------------------------------------------

def test_diff_modulator():
    cin = load("diffmod_in").reshape(75, 1536)
    expect = load("diffmod_out").reshape(76, 1536)
    # golden input is arbitrary complex; our pipeline only ever feeds exact
    # QPSK phasors, so instead quantize the golden input's phase to the
    # nearest eighth turn and compare against a reference recomputation
    q_in = np.round(np.angle(cin) / (np.pi / 4)).astype(np.int64) % 8
    # the reference multiplies raw complex values; to compare bit-for-bit we
    # recompute its chain with the quantized values in float32
    vals = tables.PHASE_LUT[q_in]
    ref_c = tables.phase_ref_complex(1)
    chain = np.empty((76, 1536), np.complex64)
    chain[0] = ref_c
    for s in range(75):
        chain[s + 1] = (chain[s] * vals[s]).astype(np.complex64)
    got = cplx.planes_to_complex(ofdm.phases_to_carriers(ofdm.diff_modulate(
        jnp.asarray(q_in)[None],
        jnp.asarray(tables.phase_ref_eighths(1)))))[0]
    # phase-domain result must match the float32 product chain to float eps
    np.testing.assert_allclose(got, chain, atol=2e-6)
    # and the reference's own output on its (unquantized) input validates the
    # recurrence shape: out[0] == phase ref, out[s+1] == out[s]*in[s]
    np.testing.assert_array_equal(expect[0], ref_c)
    np.testing.assert_allclose(
        expect[1], (expect[0] * cin[0]).astype(np.complex64), rtol=1e-6)


# ---------------------------------------------------------------------------
# Guard interval insertion (plain + windowed)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ov", [0, 90])
def test_guard_interval(ov):
    cin = load(f"guard_ov{ov}_in").reshape(77, 2048)
    expect = load(f"guard_ov{ov}_out")
    gi = tuple(jnp.asarray(a) for a in tables.guard_interval_tables(1, ov))
    got = cplx.to_complex(ofdm.guard_interval(
        jnp.asarray(cplx.from_complex(cin))[None], gi))[0]
    assert got.size == expect.size
    if ov == 0:
        np.testing.assert_array_equal(got, expect)
    else:
        np.testing.assert_allclose(got, expect, atol=4e-6)


# ---------------------------------------------------------------------------
# TII
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", [1, 2])
@pytest.mark.parametrize("variant", ["new", "old"])
def test_tii(mode, variant):
    expect = load(f"tii_m{mode}_{variant}")
    got = tables.tii_symbol(mode, comb=5, pattern=31,
                            old_variant=(variant == "old"))
    np.testing.assert_array_equal(got, expect)


# ---------------------------------------------------------------------------
# OFDM IFFT vs an independent NumPy float64 DFT (no FFTW available here;
# jnp.fft.ifft*N must match the mathematical definition of FFTW_BACKWARD)
# ---------------------------------------------------------------------------

def test_ofdm_ifft_definition():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((3, 128)) + 1j * rng.standard_normal((3, 128))
         ).astype(np.complex64)
    got = cplx.planes_to_complex(ofdm.ofdm_ifft(
        tuple(jnp.asarray(p) for p in cplx.planes_from_complex(x))))
    n = 128
    k = np.arange(n)
    w = np.exp(2j * np.pi * np.outer(k, k) / n)   # FFTW backward kernel
    expect = x.astype(np.complex128) @ w.T
    np.testing.assert_allclose(got, expect, atol=1e-3)


def test_bin_map_tm1():
    # TM-I: fft_in[1..768] = carriers[0..767], fft_in[1280..2047] =
    # carriers[768..1535], DC and 769..1279 zero
    src, valid = tables.bin_map(1)
    assert valid[0] == False  # noqa: E712
    assert np.all(valid[1:769]) and np.all(src[1:769] == np.arange(768))
    assert not np.any(valid[769:1280])
    assert np.all(valid[1280:]) and np.all(src[1280:] == np.arange(768, 1536))


def test_guard_interval_windowed_slices():
    """The gather-free windowed GI must equal the golden-validated
    table-based implementation."""
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 77, 2048, 2)).astype(np.float32)
    gi = tuple(jnp.asarray(a) for a in tables.guard_interval_tables(1, 90))
    ref = np.asarray(ofdm.guard_interval(jnp.asarray(x), gi))
    planes = (jnp.asarray(x[..., 0]), jnp.asarray(x[..., 1]))
    gr, gi_ = ofdm.guard_interval_windowed(planes, 2656, 2552, 90)
    got = np.stack([np.asarray(gr), np.asarray(gi_)], axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Full-frame I/Q vs the reference's fft_engine=kiss configuration
# ---------------------------------------------------------------------------

def _fixed_chain_outputs():
    """Run the TPU chain on the golden fixed-point inputs: front end ->
    null symbol -> unnormalised IFFT scaled 1/2048 (the KISS fixed-point
    FFT's total per-stage scaling, kiss/kiss_fft.c C_FIXDIV) -> GI."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.models import Modulator, make_default_layout

    specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1))
    fic = load("e2e_fixed_fic_in").reshape(8, 96)
    sub0 = load("e2e_fixed_sub0_in").reshape(8, -1)
    sub1 = load("e2e_fixed_sub1_in").reshape(8, -1)
    hist = tuple(jnp.zeros((15, int(mm.shape[1])), jnp.int32)
                 for mm in m._subch_masks)
    syms, _ = m.frontend(fic, (sub0, sub1), hist)
    null = jnp.zeros((2, 1536), jnp.float32)
    symbols = tuple(jnp.concatenate([null[:, None], s], axis=1)
                    for s in syms)
    bins = ofdm.to_bins_slices(symbols, 1536, 2048)
    td = ofdm.ofdm_ifft(bins)
    return cplx.pmap(lambda x: x / 2048.0, td)


def _mer_db(ref: np.ndarray, mine: np.ndarray) -> float:
    err = mine - ref
    return float(10 * np.log10((ref ** 2).sum() / (err ** 2).sum()))


def _kiss_floor_db() -> float:
    """MER of the reference's own int16 KISS IFFT against an ideal float
    IFFT of the reference's own Q1.14 symbols: the quantisation noise floor
    that bounds any comparison against the fixed-point oracle
    (measured ~47.4 dB; ref: src/OfdmGenerator.cpp:467-579)."""
    ref_syms = load("e2e_fixed_symbols").astype(np.float32) \
        .reshape(2, 76, 1536, 2) / 16384.0
    c = ref_syms[..., 0] + 1j * ref_syms[..., 1]
    syms = np.concatenate([np.zeros((2, 1, 1536), np.complex64), c], axis=1)
    # reference bin mapping, inverse=true (src/OfdmGenerator.cpp:485-499)
    bins = np.zeros((2, 77, 2048), np.complex64)
    bins[:, :, 1:769] = syms[:, :, :768]
    bins[:, :, 1280:2048] = syms[:, :, 768:]
    ideal = np.fft.ifft(bins, axis=-1)
    rows = [ideal[:, :1, -608:], ideal[:, :1]]
    for s in range(1, 77):
        rows += [ideal[:, s:s + 1, -504:], ideal[:, s:s + 1]]
    ideal_iq = np.concatenate(rows, axis=-1).reshape(-1)
    ref = load("e2e_iq_fixed").astype(np.float32) / 16384.0
    ref_c = ref[0::2] + 1j * ref[1::2]
    err = ideal_iq - ref_c
    return float(10 * np.log10((np.abs(ref_c) ** 2).sum()
                               / (np.abs(err) ** 2).sum()))


@pytest.mark.parametrize("name,ov", [("e2e_iq_fixed", 0),
                                     ("e2e_iq_fixed_ov90", 90)])
def test_full_frame_iq_vs_reference(name, ov):
    """Complete TM-I transmission frames (2 TFs, 2 sub-channels) against
    reference-generated I/Q from the fft_engine=kiss configuration
    (FEC -> QPSK -> freq-interleave -> diff-mod -> IFFT -> GI, plain and
    windowed).  The float chain must sit AT the oracle's own int16
    quantisation floor: any real chain defect (wrong permutation, bin
    mapping, GI window...) collapses the MER by tens of dB."""
    td = _fixed_chain_outputs()
    if ov == 0:
        iq = ofdm.guard_interval_unwindowed(td, 2656, 2552)
    else:
        iq = ofdm.guard_interval_windowed(td, 2656, 2552, ov)
    mine = np.asarray(cplx.planes_to_pairs(iq)).reshape(-1)
    ref = load(name).astype(np.float32) / 16384.0
    assert mine.size == ref.size
    mer = _mer_db(ref, mine)
    assert mer >= 46.0, f"full-chain MER {mer:.2f} dB below bound"
    if ov == 0:
        # the float chain's own error must be negligible against the
        # oracle's quantisation noise: within 0.05 dB of the kiss floor
        floor = _kiss_floor_db()
        assert mer >= floor - 0.05, (mer, floor)


@pytest.mark.parametrize("name,ov", [("e2e_iq_fixed", 0),
                                     ("e2e_iq_fixed_ov90", 90)])
def test_kiss_configuration_bit_exact(name, ov):
    """The production fft_engine=kiss path must produce the reference's
    s16 wire samples *bit-exactly* -- per-stage KISS rounding, fpm Q1.14
    window arithmetic and all (ops/kiss_fixed.py emulates
    kiss/kiss_fft.c + fpm/fixed.hpp; ref chain src/OfdmGenerator.cpp:
    467-579, src/GuardIntervalInserter.cpp complexfix branches)."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.models import Modulator, make_default_layout

    specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1, fft_engine="kiss",
                                      ofdm_window_overlap=ov))
    fic = load("e2e_fixed_fic_in").reshape(8, 96)
    sub0 = load("e2e_fixed_sub0_in").reshape(8, -1)
    sub1 = load("e2e_fixed_sub1_in").reshape(8, -1)
    out, _, stats = m.modulate(fic, (sub0, sub1), m.init_state())
    wire = np.asarray(out).view(np.int16)      # packed i32 -> s16 pairs
    ref = load(name).astype(np.int16)
    np.testing.assert_array_equal(wire.reshape(-1), ref)


@pytest.mark.parametrize("ov", [0, 90])
def test_kiss_engine_matches_reference_fixed_output(ov):
    """fft_engine=kiss capability parity: the modulator's Q1.14 s16 output
    on the golden ETI payloads must match the reference's fixed-point
    configuration (src/DabModulator.cpp:144-241) at the int16 quantisation
    floor."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.models import Modulator, make_default_layout

    specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1, fft_engine="kiss",
                                      ofdm_window_overlap=ov))
    fic = load("e2e_fixed_fic_in").reshape(8, 96)
    sub0 = load("e2e_fixed_sub0_in").reshape(8, -1)
    sub1 = load("e2e_fixed_sub1_in").reshape(8, -1)
    iq, _, stats = m.modulate(fic, (sub0, sub1), m.init_state())
    raw = np.asarray(iq)
    assert raw.dtype == np.int32          # i32-packed s16 wire words
    mine = np.frombuffer(raw.tobytes(), np.int16).astype(np.float32)
    name = "e2e_iq_fixed" if ov == 0 else "e2e_iq_fixed_ov90"
    ref = load(name).astype(np.float32)
    assert mine.size == ref.size
    err = mine - ref
    mer = 10 * np.log10((ref ** 2).sum() / (err ** 2).sum())
    assert mer >= 46.0, f"kiss-engine MER {mer:.2f} dB below bound"
    assert int(np.asarray(stats["num_clipped"])) == 0


def test_kiss_engine_rejects_float_only_stages():
    """ref: src/DabModulator.cpp:246-263."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.models import Modulator, make_default_layout
    layout = make_default_layout(1)
    for kw in ({"filter_taps_file": "default"},
               {"output_rate": 4_096_000},
               {"enable_cfr": True, "cfr_clip": 10.0}):
        with pytest.raises(ValueError, match="fixed point"):
            Modulator(layout, ModSettings(dab_mode=1, fft_engine="kiss",
                                          **kw))


@pytest.mark.parametrize("mode", [2, 3, 4])
def test_kiss_configuration_other_modes(mode):
    """fft_engine=kiss for TM-II/III/IV: the integer chain must sit at the
    KISS quantisation floor against the float chain (the TM-I golden pins
    bit-exactness; this pins the other spacings' mixed-radix plans)."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
    from dabmod_tpu.models import Modulator, make_default_layout

    layout = make_default_layout(mode)
    mk = Modulator(layout, ModSettings(dab_mode=mode, fft_engine="kiss"))
    p = mk.p
    batch = parse_eti_frames(synth_eti_batch(2 * p.cif_count, mode=mode))
    out, _, _ = mk.modulate(batch.fic, tuple(batch.subchannels),
                            mk.init_state())
    wire = np.asarray(out).view(np.int16).astype(np.float32) / 16384.0

    mf = Modulator(layout, ModSettings(dab_mode=mode))
    iq, _, _ = mf.modulate(batch.fic, tuple(batch.subchannels),
                           mf.init_state())
    # float chain equivalent of the kiss scaling: unnormalised IFFT/N
    # (the float path applied var gain; rebuild without it)
    s = ModSettings(dab_mode=mode, gain_mode=0, digital_gain=1.0)
    from dabmod_tpu.ops.ofdm import GAIN_FIX
    s.gain_mode = GAIN_FIX
    s.normalise = 16384.0 / (512.0 * p.spacing)
    mg = Modulator(layout, s)
    iqf, _, _ = mg.modulate(batch.fic, tuple(batch.subchannels),
                            mg.init_state())
    ref = np.asarray(iqf).reshape(-1) / 16384.0
    mine = wire.reshape(-1)
    err = mine - ref
    mer = 10 * np.log10((ref ** 2).sum() / (err ** 2).sum())
    assert mer >= 45.0, f"TM-{mode} kiss MER {mer:.1f} dB"
