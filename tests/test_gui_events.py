"""Web GUI + event publisher tests."""
import json
import threading
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
