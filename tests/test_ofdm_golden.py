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
    x = jnp.asarray(cin.reshape(-1, carriers))
    got = np.asarray(ofdm.freq_interleave(
        x, jnp.asarray(tables.freq_interleave_inverse(mode))))
    np.testing.assert_array_equal(got.reshape(-1), expect)


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
