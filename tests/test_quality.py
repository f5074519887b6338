"""Signal-quality and integration tests: spectrum occupancy, ZMQ output,
full DPD engine loop against a synthetic PA."""
import threading
import time

import numpy as np
import pytest

from dabmod_tpu import tables
from dabmod_tpu.config import ModSettings
from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
from dabmod_tpu.models import Modulator, make_default_layout
from dabmod_tpu.ops import cplx


def test_output_spectrum_occupancy():
    """The COFDM signal must concentrate its power in +/-768 kHz and leave
    the rest of the 2.048 MHz band essentially empty (pre-filter)."""
    layout = make_default_layout(1)
    m = Modulator(layout, ModSettings(dab_mode=1))
    raw = synth_eti_batch(4, mode=1)
    iq, _, _ = m.modulate_eti(parse_eti_frames(raw), m.init_state())
    x = cplx.to_complex(np.asarray(iq))[0]
    # skip NULL symbol, analyse the data portion
    x = x[2656:]
    spec = np.abs(np.fft.fft(x[:65536])) ** 2
    freqs = np.fft.fftfreq(65536, d=1 / 2.048e6)
    inband = np.abs(freqs) <= 0.77e6
    guard = np.abs(freqs) >= 0.9e6
    # unwindowed OFDM has ~-31 dB sinc sidelobes out of band
    ratio = spec[guard].mean() / spec[inband].mean()
    assert ratio < 2e-3, f"out-of-band leakage {ratio}"


def test_fir_improves_stopband():
    layout = make_default_layout(1)
    m0 = Modulator(layout, ModSettings(dab_mode=1))
    m1 = Modulator(layout, ModSettings(dab_mode=1,
                                       filter_taps_file="default"))
    raw = synth_eti_batch(4, mode=1)
    b = parse_eti_frames(raw)
    iq0, _, _ = m0.modulate_eti(b, m0.init_state())
    iq1, _, _ = m1.modulate_eti(parse_eti_frames(raw), m1.init_state())

    def stopband(iq):
        x = cplx.to_complex(np.asarray(iq))[0][2656:2656 + 65536]
        spec = np.abs(np.fft.fft(x)) ** 2
        freqs = np.fft.fftfreq(65536, d=1 / 2.048e6)
        return spec[np.abs(freqs) >= 0.95e6].mean() / \
            spec[np.abs(freqs) <= 0.7e6].mean()

    assert stopband(iq1) < stopband(iq0)


def test_resampler_preserves_spectrum():
    """After 2x resampling the occupied band stays +/-768 kHz at 4.096 MS/s."""
    layout = make_default_layout(1)
    m = Modulator(layout, ModSettings(dab_mode=1, output_rate=4_096_000))
    raw = synth_eti_batch(8, mode=1)
    iq, _, _ = m.modulate_eti(parse_eti_frames(raw), m.init_state())
    assert iq.shape[1] == 2 * tables.mode_params(1).tf_samples
    x = cplx.to_complex(np.asarray(iq))[1]
    spec = np.abs(np.fft.fft(x[:131072])) ** 2
    freqs = np.fft.fftfreq(131072, d=1 / 4.096e6)
    inband = np.abs(freqs) <= 0.77e6
    outband = np.abs(freqs) >= 1.1e6
    assert spec[outband].mean() / spec[inband].mean() < 2e-3


def test_zmq_output_pub():
    zmq = pytest.importorskip("zmq")
    from dabmod_tpu.io.outputs import ZmqOutput
    ep = "tcp://127.0.0.1:39827"
    out = ZmqOutput(ep, "pub", fmt="s16")
    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    sub.setsockopt(zmq.RCVTIMEO, 5000)
    sub.connect(ep)
    time.sleep(0.3)
    frame = np.ones((100, 2), np.float32) * 1000
    out.write(frame)
    data = sub.recv()
    got = np.frombuffer(data, np.int16)
    assert got.size == 200 and np.all(got == 1000)
    sub.close()
    out.close()


def test_dpdce_engine_loop():
    """Full engine: feedback server + loopback PA + iterative poly fit via
    the real RC path."""
    zmq = pytest.importorskip("zmq")
    from dabmod_tpu.io.sdr import DpdFeedbackServer, LoopbackSdrDevice
    from dabmod_tpu.timestamps import FrameTimestamp
    from dabmod_tpu.dpd.dpdce import run_engine
    from dabmod_tpu.rc import RemoteControllable, rcs

    def pa(x):
        m2 = np.abs(x) ** 2
        return (x * (1.0 - 0.25 * m2) * np.exp(1j * 0.1 * m2)).astype(
            np.complex64)

    dev = LoopbackSdrDevice(pa_model=pa)
    server = DpdFeedbackServer(dev, port=0, sample_rate=2_048_000)

    # a poly controllable accepting the coef file reload
    state = {"coeffile": ""}
    poly_rc = RemoteControllable("poly")
    poly_rc.add_parameter("coeffile", "coef file", lambda: state["coeffile"],
                          lambda v: state.__setitem__("coeffile", v))
    rcs.enrol(poly_rc)
    ep = "tcp://127.0.0.1:39828"
    rcs.add_zmq(ep)

    stop = threading.Event()

    def feeder():
        rng = np.random.default_rng(0)
        ts = FrameTimestamp(valid=True, seconds=500, pps=0)
        iq = (rng.standard_normal((60000, 2)) * 0.2).astype(np.float32)
        dev.transmit_frame(iq, ts)
        while not stop.is_set():
            server.set_tx_frame(iq, ts)
            time.sleep(0.02)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        model = run_engine(ep, "127.0.0.1", server.port, iterations=3,
                           samples_per_burst=40000, sleep_s=0.0,
                           learning_rate=1.0)
        # PA compresses; predistorter must expand at high amplitude
        gain_hi = model.am_am(np.array([0.8]))[0] / 0.8
        gain_lo = model.am_am(np.array([0.1]))[0] / 0.1
        assert gain_hi > gain_lo
        assert state["coeffile"]          # Adapt pushed the file via RC
        import os
        assert os.path.exists(state["coeffile"])
    finally:
        stop.set()
        server.stop()
        rcs.shutdown()


def test_cfr_stats_mer_and_papr():
    """CFR batch stats: PAPR before > after, and the rotating-symbol MER
    (ref: src/OfdmGenerator.cpp:234-273) sits between the error-clip floor
    and the 90 dB clamp; mer_index advances by B per batch."""
    layout = make_default_layout(1)
    # clip/error_clip in the unnormalised-IFFT domain like the reference
    # (doc/example.ini: clip=50, error_clip=0.1; IFFT RMS ~ sqrt(1536))
    m = Modulator(layout, ModSettings(dab_mode=1, enable_cfr=True,
                                      cfr_clip=30.0, cfr_error_clip=0.1))
    raw = synth_eti_batch(16, mode=1)       # 4 TFs
    state = m.init_state()
    iq, state, stats = m.modulate_eti(parse_eti_frames(raw), state)
    assert (float(np.asarray(stats["papr_before_cfr"]).mean())
            > float(np.asarray(stats["papr_after_cfr"]).mean()))
    mer = np.asarray(stats["mer_db"])
    valid = np.asarray(stats["mer_valid"])
    assert mer.shape == (4,) and valid.all()   # indices 1..4, none hit NULL
    assert np.all(mer > 3.0) and np.all(mer <= 90.0)
    assert int(state["mer_index"]) == 4
    # run a second batch: the rotation continues from index 4
    iq, state, stats = m.modulate_eti(parse_eti_frames(raw), state)
    assert int(state["mer_index"]) == 8
