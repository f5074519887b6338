"""DPD engine modules: alignment, MER, shoulders, AGC, LUT model.

Covers the counterparts of python/dpd/{Symbol_align, subsample_align,
phase_align, Dab_Util, MER, Measure_Shoulders, RX_Agc, TX_Agc, Heuristics,
Model_Lut}.py on synthetic DAB-like signals.
"""
import numpy as np
import pytest

from dabmod_tpu.dpd import (DpdConfig, Lut, Mer, MeasureShoulders, RxAgc,
                            SymbolAlign, TxAgc, align_tx_rx, coarse_align,
                            get_learning_rate, get_n_meas, phase_align,
                            subsample_align)
from dabmod_tpu.dpd.align import lag

C = DpdConfig(sample_rate=2_048_000)
RNG = np.random.default_rng(7)


def _qpsk_carriers(n):
    return ((RNG.integers(0, 2, n) * 2 - 1)
            + 1j * (RNG.integers(0, 2, n) * 2 - 1)).astype(
                np.complex128) / np.sqrt(2)


def _symbol_from_spectrum(carriers):
    """Build one T_U time-domain symbol whose fftshifted spectrum crop
    (Mer._spectrum convention) equals `carriers`."""
    full = np.zeros(C.T_U, np.complex128)
    band = full[C.FFT_start:C.FFT_end]
    band[:C.FFT_delete] = carriers[:C.FFT_delete]
    band[C.FFT_delete + 1:] = carriers[C.FFT_delete:]
    return np.fft.ifft(np.fft.ifftshift(full))


def _dab_burst(n_syms=8):
    """Synthetic TM-I-like burst: OFDM symbols with cyclic prefixes."""
    syms = []
    for _ in range(n_syms):
        body = _symbol_from_spectrum(_qpsk_carriers(C.FFT_delta))
        syms.append(np.concatenate([body[-C.T_C:], body]))
    return np.concatenate(syms)


# ---------------------------------------------------------------------------
# alignment
# ---------------------------------------------------------------------------


def test_lag_and_coarse_align():
    sig = RNG.standard_normal(4096) + 1j * RNG.standard_normal(4096)
    delay = 37
    rec = np.concatenate([np.zeros(delay), sig])[:4096]
    assert lag(sig, rec) == delay
    tx, rx = coarse_align(sig, rec)
    assert tx.shape == rx.shape
    corr = np.abs(np.vdot(tx, rx)) / (np.linalg.norm(tx)
                                      * np.linalg.norm(rx))
    assert corr > 0.99


def test_subsample_align_recovers_fractional_delay():
    n = 2048
    spec = np.zeros(n, np.complex128)
    spec[1:200] = RNG.standard_normal(199) + 1j * RNG.standard_normal(199)
    ref = np.fft.ifft(spec)
    tau = 0.37
    omega = np.fft.fftfreq(n, d=1.0 / (2 * np.pi))
    delayed = np.fft.ifft(np.exp(-1j * tau * omega) * spec)
    fixed = subsample_align(delayed, ref)
    assert fixed.size == n
    err_before = np.linalg.norm(delayed - ref)
    err_after = np.linalg.norm(fixed - ref)
    assert err_after < 0.05 * err_before


def test_phase_align_removes_rotation():
    sig = RNG.standard_normal(1000) + 1j * RNG.standard_normal(1000)
    rotated = sig * np.exp(1j * 0.8)
    fixed = phase_align(rotated, sig)
    assert np.linalg.norm(fixed - sig) < 1e-6 * np.linalg.norm(sig)


def test_align_tx_rx_pipeline():
    tx = _dab_burst(4)
    rx = np.concatenate([np.zeros(123), tx * np.exp(1j * 0.5)])
    tx_a, rx_a = align_tx_rx(tx, rx)
    err = np.linalg.norm(rx_a - tx_a) / np.linalg.norm(tx_a)
    assert err < 1e-3


def test_symbol_align_finds_offset():
    burst = _dab_burst(10)
    offset = 1700
    sa = SymbolAlign(C)
    got = sa.calc_offset(burst[offset:])
    # the offset points at a symbol body (prefix start + T_C), mod T_S
    assert got % C.T_S == (C.T_S - offset + C.T_C) % C.T_S
    sym = sa.crop_symbol_without_cyclic_prefix(burst[offset:])
    assert sym.shape[0] == C.T_U


# ---------------------------------------------------------------------------
# MER / shoulders
# ---------------------------------------------------------------------------


def test_mer_clean_vs_noisy():
    carriers = _qpsk_carriers(C.FFT_delta)
    clean = _symbol_from_spectrum(carriers)
    mer = Mer(C)
    m_clean = mer.calc_mer(clean)
    assert m_clean < -60          # error far below signal
    noisy = clean + 0.001 * (RNG.standard_normal(C.T_U)
                             + 1j * RNG.standard_normal(C.T_U))
    m_noisy = mer.calc_mer(noisy)
    assert m_noisy > m_clean + 10
    assert m_noisy < -10


def test_shoulders_in_band_vs_adjacent():
    burst = _dab_burst(24)
    ms = MeasureShoulders(C)
    diff, shoulder, peak = ms.average_shoulders(burst, n_avg=8)
    assert peak > shoulder
    assert diff > 40              # clean signal: huge shoulder distance
    # a nonlinearity must reduce the shoulder distance (spectral regrowth)
    pa = burst * (1 - 0.3 * np.abs(burst * 40) ** 2)
    diff_pa, _, _ = ms.average_shoulders(pa, n_avg=8)
    assert diff_pa < diff


# ---------------------------------------------------------------------------
# AGC loops
# ---------------------------------------------------------------------------


class _FakeAdapt:
    def __init__(self, txgain=70.0, rxgain=25.0, digital=1.0):
        self.txgain, self.rxgain, self.digital = txgain, rxgain, digital
        self.calls = []

    def set_txgain(self, g):
        self.calls.append(("tx", g))
        self.txgain = g

    def get_txgain(self):
        return self.txgain

    def set_rxgain(self, g):
        self.calls.append(("rx", g))
        self.rxgain = g

    def get_rxgain(self):
        return self.rxgain

    def set_digital_gain(self, g):
        self.calls.append(("dig", g))
        self.digital = g

    def get_digital_gain(self):
        return self.digital


class _FakeMeasure:
    """RX median scales with the current rxgain, anchored at 25 dB."""

    def __init__(self, adapt, base_median=0.005):
        self.adapt = adapt
        self.base = base_median

    def get_samples(self):
        scale = 10 ** ((self.adapt.rxgain - 25.0) / 20.0)
        rx = (RNG.standard_normal(4096)
              + 1j * RNG.standard_normal(4096)) * self.base * scale
        # median |CN(0, s)| = s * 1.1774/sqrt... normalise empirically
        rx *= self.base * scale / np.median(np.abs(rx))
        return rx.copy(), 0.0, rx, 0.0


def test_rx_agc_converges_to_target_median():
    adapt = _FakeAdapt()
    meas = _FakeMeasure(adapt, base_median=0.005)
    agc = RxAgc(meas, adapt, C)
    ok, report = agc.run()
    assert ok, report
    # correction: 20*log10(1/(20*0.005)) = +20 dB above the 25 dB anchor
    assert adapt.rxgain == pytest.approx(45.0, abs=0.5)
    _, _, rx, _ = meas.get_samples()
    assert np.median(np.abs(rx)) == pytest.approx(
        C.RAGC_rx_median_target, rel=0.05)


def test_rx_agc_flags_excessive_power():
    adapt = _FakeAdapt()
    meas = _FakeMeasure(adapt, base_median=0.5)   # way too hot
    ok, report = RxAgc(meas, adapt, C).run()
    assert not ok
    assert "too high" in report


def test_tx_agc_trades_tx_for_digital_gain():
    adapt = _FakeAdapt(txgain=70.0, digital=1.0)
    agc = TxAgc(adapt, C)
    tx = np.full(1000, 0.3 + 0j)      # median 0.3 > tolerated max
    assert agc.adapt_if_necessary(tx)
    delta_db = 20 * np.log10(C.TAGC_tx_median_target / 0.3)
    assert adapt.txgain == pytest.approx(70.0 - delta_db, abs=1e-6)
    assert adapt.digital == pytest.approx(10 ** (delta_db / 20), abs=1e-9)
    # digital reduced before analog raised (no transient overshoot)
    assert adapt.calls[0][0] == "dig"
    # in-band median: no change
    adapt2 = _FakeAdapt()
    assert not TxAgc(adapt2, C).adapt_if_necessary(
        np.full(1000, C.TAGC_tx_median_target + 0j))
    assert adapt2.calls == []


# ---------------------------------------------------------------------------
# heuristics / LUT model
# ---------------------------------------------------------------------------


def test_heuristics_schedules():
    assert get_learning_rate(0) == pytest.approx(0.4)
    assert get_learning_rate(10) == pytest.approx(0.05)
    assert get_learning_rate(100) == pytest.approx(0.05)
    assert get_n_meas(0) == 10
    assert get_n_meas(10) == 20


def _pa(x):
    m2 = np.abs(x) ** 2
    return x * (1 - 0.2 * m2) * np.exp(1j * 0.15 * m2)


def test_lut_model_learns_inverse():
    tx = (RNG.standard_normal(40000)
          + 1j * RNG.standard_normal(40000)) * 0.25
    peak = np.abs(tx).max()
    tx = tx / peak * 0.9
    rx = _pa(tx)
    lut = Lut()
    lut.train(tx, rx)
    # predistorted signal through the PA must be closer to the original
    err_plain = np.linalg.norm(_pa(tx) - tx)
    err_dpd = np.linalg.norm(_pa(lut.apply(tx)) - tx)
    assert err_dpd < 0.25 * err_plain


def test_lut_file_roundtrip_and_device_path(tmp_path):
    from dabmod_tpu.dpd.adapt import write_lut_file
    from dabmod_tpu.models.modulator import load_dpd_file

    lut = Lut()
    tx = (RNG.standard_normal(5000) + 1j * RNG.standard_normal(5000)) * 0.3
    lut.train(tx, _pa(tx))
    path = str(tmp_path / "lut.coef")
    write_lut_file(path, lut.scalefactor, lut.lut)
    kind, (scale, pairs) = load_dpd_file(path)
    assert kind == "lut"
    assert scale == pytest.approx(lut.scalefactor)
    np.testing.assert_allclose(pairs[:, 0], lut.lut.real, rtol=1e-6)
    np.testing.assert_allclose(pairs[:, 1], lut.lut.imag, rtol=1e-6)

    # device kernel == host apply
    import jax.numpy as jnp
    from dabmod_tpu.ops.filters import memless_lut

    planes = (jnp.asarray(tx.real.astype(np.float32)),
              jnp.asarray(tx.imag.astype(np.float32)))
    dr, di = memless_lut(planes, jnp.asarray(pairs), scale)
    host = lut.apply(tx.astype(np.complex64))
    np.testing.assert_allclose(np.asarray(dr) + 1j * np.asarray(di), host,
                               rtol=2e-4, atol=2e-6)
