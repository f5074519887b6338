"""Remote-control plane tests: registry, telnet grammar, ZMQ protocol,
runtime parameter mutation with live rebuild."""
import socket
import time

import numpy as np
import pytest

from dabmod_tpu.rc import (ParameterError, RemoteControllable,
                           RemoteControllers, dispatch_line)


def _registry():
    reg = RemoteControllers()
    c = RemoteControllable("gain")
    state = {"digital": 1.0}
    c.add_parameter("digital", "Digital Gain",
                    lambda: state["digital"],
                    lambda v: state.__setitem__("digital", float(v)))
    c.add_parameter("ro", "read only", lambda: 42)
    reg.enrol(c)
    return reg, state


def test_registry_get_set():
    reg, state = _registry()
    assert reg.get_param("gain", "digital") == "1.0"
    reg.set_param("gain", "digital", "2.5")
    assert state["digital"] == 2.5
    with pytest.raises(ParameterError):
        reg.set_param("gain", "ro", "1")
    with pytest.raises(ParameterError):
        reg.get_param("gain", "nope")
    with pytest.raises(ParameterError):
        reg.get_param("nomodule", "x")


def test_telnet_dispatch_grammar():
    reg, state = _registry()
    out, keep = dispatch_line(reg, "help")
    assert "list" in out and keep
    out, _ = dispatch_line(reg, "list")
    assert "gain" in out and "digital : Digital Gain" in out
    out, _ = dispatch_line(reg, "show gain")
    assert "digital: 1.0" in out
    out, _ = dispatch_line(reg, "get gain digital")
    assert out == "1.0"
    out, _ = dispatch_line(reg, "set gain digital 3.0")
    assert out == "ok" and state["digital"] == 3.0
    out, keep = dispatch_line(reg, "quit")
    assert out == "Goodbye" and not keep
    out, _ = dispatch_line(reg, "bogus")
    assert out == "Message not understood"


def test_telnet_server_roundtrip():
    reg, state = _registry()
    srv = reg.add_telnet(0)
    try:
        with socket.create_connection(("127.0.0.1", srv.port), timeout=5) as c:
            f = c.makefile("rwb")
            assert b"help" in f.readline()
            f.write(b"set gain digital 7\n")
            f.flush()
            assert f.readline().strip() == b"ok"
            f.write(b"get gain digital\n")
            f.flush()
            assert f.readline().strip() == b"7.0"
            f.write(b"quit\n")
            f.flush()
            assert f.readline().strip() == b"Goodbye"
        assert state["digital"] == 7.0
    finally:
        reg.shutdown()


def test_zmq_rc_protocol():
    zmq = pytest.importorskip("zmq")
    reg, state = _registry()
    ep = "tcp://127.0.0.1:39817"
    reg.add_zmq(ep)
    try:
        ctx = zmq.Context.instance()
        s = ctx.socket(zmq.REQ)
        s.setsockopt(zmq.LINGER, 0)
        s.setsockopt(zmq.RCVTIMEO, 5000)
        s.connect(ep)
        s.send_multipart([b"ping"])
        assert s.recv_multipart() == [b"ok"]
        s.send_multipart([b"list"])
        assert s.recv_multipart() == [b"ok", b"gain"]
        s.send_multipart([b"get", b"gain", b"digital"])
        assert s.recv_multipart() == [b"1.0"]
        s.send_multipart([b"set", b"gain", b"digital", b"9"])
        assert s.recv_multipart() == [b"ok"]
        assert state["digital"] == 9.0
        s.send_multipart([b"showjson", b"gain"])
        ok, payload = s.recv_multipart()
        assert ok == b"ok" and b'"digital": 9.0' in payload
        s.send_multipart([b"get", b"gain", b"bogus"])
        rep = s.recv_multipart()
        assert rep[0] == b"fail"
        s.close()
    finally:
        reg.shutdown()


def test_runtime_rc_rebuild(tmp_path):
    """Changing a structural parameter over RC must rebuild the pipeline but
    keep the time-interleaver history."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import synth_eti_batch
    from dabmod_tpu.rc import rcs
    from dabmod_tpu.runtime import ModRuntime

    frames = synth_eti_batch(16, mode=1)
    p = tmp_path / "in.eti"
    p.write_bytes(frames.tobytes())
    out = str(tmp_path / "out.iq")
    s = ModSettings(input_name=str(p), output="file", output_name=out,
                    file_output_format="complexf", batch_tf=1)
    s.normalise_for_output()
    rt = ModRuntime(s)
    rt.run_batches(max_batches=1)
    hist_before = np.asarray(rt.state["ti_history"][0]).copy()
    mod_before = rt.modulator
    rcs.set_param("gain", "mode", "max")
    rt.run_batches(max_batches=1)
    assert rt.modulator is not mod_before       # rebuilt
    assert rt.modulator.settings.gain_mode == 1
    # TI history was carried over, not reset
    assert np.asarray(rt.state["ti_history"][0]).shape == hist_before.shape
    assert int(rt.state["tf_index"]) == 2
    # non-structural change: no rebuild
    mod2 = rt.modulator
    rcs.set_param("gain", "digital", "0.5")
    rt.run_batches(max_batches=1)
    assert rt.modulator is mod2
    assert rcs.get_param("modulator", "rate") == "2048000"
