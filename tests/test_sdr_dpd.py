"""SDR output framework + DPD closed loop tests."""
import time

import numpy as np
import pytest

from dabmod_tpu.io.sdr import (DpdFeedbackServer, FileSdrDevice,
                               LoopbackSdrDevice, SdrOutput)
from dabmod_tpu.timestamps import FrameTimestamp
from dabmod_tpu.dpd import ExtractStatistic, Measure, Poly
from dabmod_tpu.dpd.measure import normalise_rx, phase_align


def _wait(cond, timeout=5.0):
    t0 = time.time()
    while not cond() and time.time() - t0 < timeout:
        time.sleep(0.02)
    assert cond()


def test_sdr_output_unsync(tmp_path):
    dev = FileSdrDevice(str(tmp_path / "out.iq"))
    out = SdrOutput(dev, sync=False)
    frame = np.ones((1000, 2), np.float32)
    for _ in range(5):
        out.write(frame)
    _wait(lambda: out.frames == 5)
    out.close()
    data = np.fromfile(tmp_path / "out.iq", np.float32)
    assert data.size == 5 * 2000
    assert out.get_run_statistics()["underruns"] == 0


def test_sdr_sync_drops_late_frames():
    dev = LoopbackSdrDevice()
    out = SdrOutput(dev, sync=True)
    frame = np.ones((100, 2), np.float32)
    past = FrameTimestamp(valid=True, seconds=int(time.time()) - 10, pps=0)
    future = FrameTimestamp(valid=True, seconds=int(time.time()) + 2, pps=0)
    out.write(frame, past)
    out.write(frame, future)
    _wait(lambda: out.dropped == 1)
    _wait(lambda: out.frames == 1)
    out.close()


def test_sdr_batch_write_per_tf_timestamps():
    """A batched [B, N, 2] write with per-TF metadata must become B queue
    entries, each gated on its own timestamp (ref: src/output/SDR.cpp:
    135-201): here TF#1 is in the past (dropped) while the others go out."""
    dev = LoopbackSdrDevice(history_frames=16)
    out = SdrOutput(dev, sync=True)
    B, N = 4, 100
    batch = np.arange(B * N * 2, dtype=np.float32).reshape(B, N, 2)
    now = int(time.time())
    meta = [(i, FrameTimestamp(valid=True,
                               seconds=now - 10 if i == 1 else now + 2,
                               pps=i)) for i in range(B)]
    out.write(batch, meta)
    _wait(lambda: out.frames == B - 1 and out.dropped == 1)
    out.close()
    sent = [ts.pps for _, ts in dev._history]
    assert sent == [0, 2, 3]
    # each transmitted frame is a single TF, not the whole batch
    assert all(s.shape == (N, 2) for s, _ in dev._history)


def test_timestamp_decoder_batch_per_tf():
    """update_eti_batch returns one timestamp per TF == its first ETI
    frame's decode state."""
    from dabmod_tpu.timestamps import TimestampDecoder
    dec = TimestampDecoder()
    C = 4                      # TM-I: 4 CIFs per transmission frame
    n = 16
    frame_pps = int(0.024 * 16_384_000)
    fps = [i % 8 for i in range(n)]
    ppss = [(i * frame_pps) % 16_384_000 for i in range(n)]
    mnscs = [0] * n
    fcts = list(range(n))
    ts_list = dec.update_eti_batch(fps, mnscs, ppss, fcts, C)
    assert len(ts_list) == n // C
    assert [t.fct for t in ts_list] == [0, 4, 8, 12]
    assert [t.pps for t in ts_list] == [ppss[0], ppss[4], ppss[8], ppss[12]]


def test_sdr_queue_overflow():
    class SlowDevice(LoopbackSdrDevice):
        def transmit_frame(self, samples, ts):
            time.sleep(0.2)
            super().transmit_frame(samples, ts)
    out = SdrOutput(SlowDevice(), sync=False)   # queue bound = 8
    frame = np.ones((10, 2), np.float32)
    for _ in range(30):
        out.write(frame)
    assert out.queue_overflows > 0
    out._running = False
    out._thread.join(timeout=2)


def _pa_model(x):
    """Synthetic PA: compression + phase rotation growing with power."""
    m2 = np.abs(x) ** 2
    gain = 1.0 - 0.2 * m2
    phase = 0.15 * m2
    return (x * gain * np.exp(1j * phase)).astype(np.complex64)


def test_dpd_closed_loop():
    """Feedback server + Measure + ExtractStatistic + Poly on a synthetic PA:
    the fitted model must recover the PA's AM/AM compression."""
    dev = LoopbackSdrDevice(pa_model=_pa_model)
    server = DpdFeedbackServer(dev, port=0, sample_rate=2_048_000)
    try:
        rng = np.random.default_rng(5)
        n = 20000
        iq = (rng.standard_normal((n, 2)) * 0.25).astype(np.float32)
        ts = FrameTimestamp(valid=True, seconds=1000, pps=0)
        dev.transmit_frame(iq, ts)

        meas = Measure("127.0.0.1", server.port, n)

        import threading
        result = {}

        def fetch():
            result["data"] = meas.get_samples()

        t = threading.Thread(target=fetch)
        t.start()
        # the server waits for the next TX frame snapshot
        for _ in range(50):
            server.set_tx_frame(iq, ts)
            time.sleep(0.05)
            if not t.is_alive():
                break
        t.join(timeout=5)
        assert "data" in result
        tx, tx_ts, rx, rx_ts = result["data"]
        assert tx.size == n and rx.size == n
        assert tx_ts == 1000.0

        # closed-loop fit
        rx = phase_align(tx, normalise_rx(tx, rx))
        es = ExtractStatistic(n_bins=40, n_per_bin=200, peak_amplitude=1.0)
        tx_avg, rx_avg, ph = es.extract(tx, rx)
        assert tx_avg.size > 10

        model = Poly()
        model.train(tx_avg, rx_avg, ph)
        # the AM/AM curve must show compression: predistorter gain above 1
        # at high amplitude (tx_est > rx for large rx)
        hi = model.am_am(np.array([0.6]))[0]
        lo = model.am_am(np.array([0.1]))[0]
        assert hi / 0.6 > lo / 0.1 * 1.01
        # phase model must capture the positive phase rotation
        assert model.am_pm(np.array([0.7]))[0] > 0.01
    finally:
        server.stop()


def test_adapt_writes_and_reloads_coefs(tmp_path):
    """Adapt -> RC -> runtime poly reload, end to end over ZMQ."""
    zmq = pytest.importorskip("zmq")
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.dpd.adapt import Adapt, write_coef_file
    from dabmod_tpu.eti import synth_eti_batch
    from dabmod_tpu.rc import rcs
    from dabmod_tpu.runtime import ModRuntime

    coef_path = str(tmp_path / "poly.coef")
    write_coef_file(coef_path, [1, 0, 0, 0, 0], [0, 0, 0, 0, 0])

    frames = synth_eti_batch(8, mode=1)
    inp = tmp_path / "in.eti"
    inp.write_bytes(frames.tobytes())
    s = ModSettings(input_name=str(inp), output="file",
                    output_name=str(tmp_path / "out.iq"),
                    file_output_format="complexf", batch_tf=1,
                    poly_coef_file=coef_path,
                    rc_zmq_endpoint="tcp://127.0.0.1:39821")
    s.normalise_for_output()
    rt = ModRuntime(s)
    try:
        rt.run_batches(max_batches=1)

        adapt = Adapt("tcp://127.0.0.1:39821", coef_path)
        new_am = np.array([1.05, 0.2, 0, 0, 0], np.float32)
        new_pm = np.array([0.01, 0, 0, 0, 0], np.float32)
        adapt.set_predistorter(("poly", new_am, new_pm))

        rt.run_batches(max_batches=1)    # triggers the rebuild
        np.testing.assert_allclose(
            np.asarray(rt.modulator._poly_am), new_am, rtol=1e-6)
        assert adapt.get_digital_gain() == 1.0
        adapt.set_digital_gain(0.9)
        assert rt.settings.digital_gain == 0.9
        adapt.rc.close()
    finally:
        rcs.shutdown()


def test_loopback_sdr_output_via_runtime(tmp_path):
    """output=loopback builds an SdrOutput with the full sdr RC surface
    (txgain/rxgain/freq/muting/counters) and transmits frames."""
    zmq = pytest.importorskip("zmq")
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.dpd.adapt import Adapt
    from dabmod_tpu.eti import synth_eti_batch
    from dabmod_tpu.io.sdr import SdrOutput
    from dabmod_tpu.rc import rcs
    from dabmod_tpu.runtime import ModRuntime

    frames = synth_eti_batch(8, mode=1)
    inp = tmp_path / "in.eti"
    inp.write_bytes(frames.tobytes())
    s = ModSettings(input_name=str(inp), output="loopback", batch_tf=1,
                    sdr_txgain=50.0, sdr_rxgain=30.0,
                    sdr_frequency=227_360_000.0, sdr_dpd_port=0,
                    rc_zmq_endpoint="tcp://127.0.0.1:39823")
    s.normalise_for_output()
    rt = ModRuntime(s)
    try:
        assert isinstance(rt.output, SdrOutput)
        assert rt.output.device.frequency == 227_360_000.0
        rt.run_batches(max_batches=2)
        _wait(lambda: rt.output.frames == 2)

        # the DPD Adapt analog-gain path drives the same device
        adapt = Adapt("tcp://127.0.0.1:39823", str(tmp_path / "c.coef"))
        assert adapt.get_txgain() == 50.0
        adapt.set_rxgain(42.5)
        assert rt.output.device.rxgain == 42.5
        assert adapt.get_rxgain() == 42.5
        adapt.rc.close()
    finally:
        rt.output.close()
        rcs.shutdown()


def test_lut_engine_closed_loop():
    """run_engine with the LUT model linearises the loopback PA."""
    zmq = pytest.importorskip("zmq")
    import threading

    from dabmod_tpu.dpd.dpdce import run_engine
    from dabmod_tpu.rc import RemoteControllable, rcs

    dev = LoopbackSdrDevice(pa_model=_pa_model)
    server = DpdFeedbackServer(dev, port=0, sample_rate=2_048_000)
    state = {"coeffile": ""}
    poly_rc = RemoteControllable("poly")
    poly_rc.add_parameter("coeffile", "coef file", lambda: state["coeffile"],
                          lambda v: state.__setitem__("coeffile", v))
    rcs.enrol(poly_rc)
    ep = "tcp://127.0.0.1:39827"
    rcs.add_zmq(ep)
    stop = threading.Event()

    def feeder():
        rng = np.random.default_rng(3)
        ts = FrameTimestamp(valid=True, seconds=700, pps=0)
        iq = (rng.standard_normal((50000, 2)) * 0.2).astype(np.float32)
        dev.transmit_frame(iq, ts)
        while not stop.is_set():
            server.set_tx_frame(iq, ts)
            time.sleep(0.02)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        model = run_engine(ep, "127.0.0.1", server.port, iterations=2,
                           samples_per_burst=40000, sleep_s=0.0,
                           learning_rate=1.0, model_kind="lut")
        # compression -> correction magnitude grows with amplitude
        mags = np.abs(model.lut)
        filled = mags != 1.0
        assert filled.sum() > 4
        idx = np.flatnonzero(filled)
        assert mags[idx[-1]] > mags[idx[0]]
        assert state["coeffile"]
        from dabmod_tpu.models.modulator import load_dpd_file
        kind, (scale, pairs) = load_dpd_file(state["coeffile"])
        assert kind == "lut" and pairs.shape == (32, 2)
    finally:
        stop.set()
        server.stop()
        rcs.shutdown()


def test_loopback_receive_unpacks_wire_words():
    """kiss/device-converted frames reach the loopback device as i32
    packed-s16 wire words; receive_frame must unpack and renormalise them
    before the PA model, not reinterpret raw words as float amplitudes."""
    from dabmod_tpu.io.sdr import LoopbackSdrDevice
    from dabmod_tpu.timestamps import FrameTimestamp

    dev = LoopbackSdrDevice()
    dev.txgain = dev.rxgain = 0.0
    ts = FrameTimestamp(valid=True, seconds=7, pps=0)
    pairs = (np.arange(64, dtype=np.int16).reshape(32, 2) * 100)
    words = (pairs[:, 1].astype(np.int32) << 16) \
        | (pairs[:, 0].astype(np.int32) & 0xFFFF)
    dev.transmit_frame(words, ts)
    rx, _ = dev.receive_frame(32, ts)
    expect = pairs.astype(np.float32) / 32768.0
    np.testing.assert_allclose(rx, expect, atol=1e-6)
