"""Web GUI + event publisher tests."""
import json
import threading
import time
import urllib.request

import pytest


def test_gui_rc_roundtrip():
    from dabmod_tpu.rc import RemoteControllable, RemoteControllers
    from dabmod_tpu.gui import make_handler
    from http.server import ThreadingHTTPServer

    reg = RemoteControllers()
    c = RemoteControllable("gain")
    state = {"digital": 1.0}
    c.add_parameter("digital", "Digital Gain", lambda: state["digital"],
                    lambda v: state.__setitem__("digital", float(v)))
    reg.enrol(c)

    # adapter matching the ModRemoteControl client interface
    class LocalRc:
        def get_modules(self):
            return reg.list_modules()

        def show(self, module):
            return dict(reg.show(module))

        def set_param_value(self, module, param, value):
            reg.set_param(module, param, value)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(LocalRc()))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=5).read()
        assert b"dabmod-tpu" in page
        data = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/rc", timeout=5).read())
        assert data == {"gain": {"digital": "1.0"}}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/rc/set?controllable=gain"
            f"&param=digital&value=2.5", method="POST")
        urllib.request.urlopen(req, timeout=5)
        assert state["digital"] == 2.5
    finally:
        httpd.shutdown()


def test_event_sender_pubsub():
    zmq = pytest.importorskip("zmq")
    from dabmod_tpu.events import EventSender
    import time

    sender = EventSender()
    sender.bind("tcp://127.0.0.1:39824")
    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    sub.setsockopt(zmq.RCVTIMEO, 5000)
    sub.connect("tcp://127.0.0.1:39824")
    time.sleep(0.3)   # late-joiner grace
    sender.send("underrun", {"count": 3})
    name, payload = sub.recv_multipart()
    assert name == b"underrun"
    assert json.loads(payload) == {"count": 3}
    sub.close()
    sender.close()


def _local_rc(reg):
    class LocalRc:
        def get_modules(self):
            return reg.list_modules()

        def show(self, module):
            return dict(reg.show(module))

        def set_param_value(self, module, param, value):
            reg.set_param(module, param, value)
    return LocalRc()


def test_gui_stats_signal_and_dpd_panel():
    """Stats filter, spectrum/constellation endpoint against a live
    feedback server, and the DPD control panel start/status cycle."""

    import numpy as np

    from dabmod_tpu.gui import DpdPanel, make_handler
    from dabmod_tpu.io.sdr import DpdFeedbackServer, LoopbackSdrDevice
    from dabmod_tpu.rc import RemoteControllable, RemoteControllers, rcs
    from dabmod_tpu.timestamps import FrameTimestamp
    from http.server import ThreadingHTTPServer

    reg = RemoteControllers()
    c = RemoteControllable("sdr")
    state = {"underruns": 3, "txgain": 10.0}
    c.add_parameter("underruns", "underrun count",
                    lambda: state["underruns"], None)
    c.add_parameter("txgain", "TX gain", lambda: state["txgain"],
                    lambda v: state.__setitem__("txgain", float(v)))
    reg.enrol(c)

    # feedback server fed with a GI-less pi/4-DQPSK OFDM TX burst (16
    # symbols of 2048 bins, 512 active carriers)
    dev = LoopbackSdrDevice()
    server = DpdFeedbackServer(dev, port=0, sample_rate=2_048_000)
    rng = np.random.default_rng(0)
    n_sym, n_car = 16, 512
    q = rng.integers(0, 4, (n_sym, n_car)) * 2 + 1
    spec = np.zeros((n_sym, 2048), np.complex64)
    spec[:, 1:n_car + 1] = np.exp(1j * np.pi / 4 * np.cumsum(q, axis=0))
    tx = np.fft.ifft(spec, axis=1).ravel().astype(np.complex64)
    iq = np.stack([tx.real, tx.imag], axis=-1).astype(np.float32)
    ts = FrameTimestamp(valid=True, seconds=500, pps=0)
    dev.transmit_frame(iq, ts)
    stop_feed = threading.Event()

    def feeder():
        while not stop_feed.is_set():
            server.set_tx_frame(iq, ts)
            time.sleep(0.02)

    feeder_t = threading.Thread(target=feeder, daemon=True)
    feeder_t.start()

    # zmq RC so the DPD panel's Adapt can connect (poly controllable)
    zmq = pytest.importorskip("zmq")
    pstate = {"coeffile": ""}
    poly_rc = RemoteControllable("poly")
    poly_rc.add_parameter("coeffile", "coef file",
                          lambda: pstate["coeffile"],
                          lambda v: pstate.__setitem__("coeffile", v))
    rcs.enrol(poly_rc)
    ep = "tcp://127.0.0.1:39829"
    rcs.add_zmq(ep)

    panel = DpdPanel(ep, "127.0.0.1", server.port)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(_local_rc(reg), panel, ("127.0.0.1", server.port)))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/stats", timeout=5).read())
        assert stats == {"sdr": {"underruns": "3"}}

        sig = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/signal", timeout=10).read())
        assert len(sig["spectrum_db"]) >= 256
        assert len(sig["const_i"]) > 100
        # differential constellation should cluster on the 4 odd-eighth
        # turns: no point near angle 0
        ang = np.angle(np.asarray(sig["const_i"])
                       + 1j * np.asarray(sig["const_q"]))
        dist = np.abs(ang % (np.pi / 2) - np.pi / 4)
        assert float(np.median(dist)) < 0.2

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/dpd/start?iterations=2&kind=poly",
            method="POST")
        assert json.loads(urllib.request.urlopen(req, timeout=5).read())["ok"]
        deadline = time.time() + 20
        while time.time() < deadline:
            st = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/dpd/status", timeout=5).read())
            if not st["running"] and st["history"]:
                break
            time.sleep(0.2)
        assert st["history"], "DPD engine reported no iterations"
    finally:
        stop_feed.set()
        httpd.shutdown()
        server.stop()
