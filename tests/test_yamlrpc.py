"""yamlrpc transport + DPDCE control-service tests.

Wire format per the reference's python/lib/yamlrpc.py; service command
surface per python/dpdce.py:411-440.
"""
import time

import numpy as np
import pytest
import yaml

from dabmod_tpu.dpd.server import DpdceServer
from dabmod_tpu.rc import yamlrpc


# ------------------------------------------------------------ wire format
def test_request_wire_format():
    data = yamlrpc.request(7, "get_results", {"a": 1})
    y = yaml.safe_load(data.decode())
    assert y == {"yamlrpc": "2.0", "method": "get_results",
                 "params": {"a": 1}, "id": 7}


def test_response_wire_formats():
    ok = yaml.safe_load(yamlrpc.response_success(3, [1, 2]).decode())
    assert ok == {"yamlrpc": "2.0", "result": [1, 2], "id": 3}
    err = yaml.safe_load(yamlrpc.response_error(4, "nope").decode())
    assert err == {"yamlrpc": "2.0", "error": "nope", "id": 4}
    note = yaml.safe_load(yamlrpc.notification("ping", None).decode())
    assert note == {"yamlrpc": "2.0", "method": "ping", "params": None}


def test_socket_roundtrip_and_errors():
    srv = yamlrpc.Socket(bind_port=0, timeout=0.5)
    cli = yamlrpc.Socket(bind_port=0, timeout=2.0)
    try:
        msg_id = cli.send_request(srv.port, "echo", {"x": 1})
        addr, rid, method, params = srv.receive_request()
        assert (rid, method, params) == (msg_id, "echo", {"x": 1})
        srv.send_success_response(addr, rid, {"x": 1})
        assert cli.receive_response(msg_id) == {"x": 1}

        # error responses raise ResponseError on the client
        msg_id = cli.send_request(srv.port, "bad", None)
        addr, rid, _, _ = srv.receive_request()
        srv.send_error_response(addr, rid, "request not understood")
        with pytest.raises(yamlrpc.ResponseError, match="not understood"):
            cli.receive_response(msg_id)

        # mismatched response id is rejected
        msg_id = cli.send_request(srv.port, "echo", None)
        addr, rid, _, _ = srv.receive_request()
        srv.send_success_response(addr, rid + 1000, None)
        with pytest.raises(ValueError, match="id does not match"):
            cli.receive_response(msg_id)
    finally:
        srv.close()
        cli.close()


def test_socket_timeout():
    cli = yamlrpc.Socket(bind_port=0, timeout=0.2)
    try:
        with pytest.raises(TimeoutError):
            cli.receive_response(1)
    finally:
        cli.close()


# ----------------------------------------------------------- DPDCE service
class FakeMeasure:
    """Synthetic feedback: a weakly compressive PA over a noise burst."""

    def __init__(self, n=8192, seed=0):
        self.n = n
        self.rng = np.random.default_rng(seed)

    def get_samples(self):
        tx = (self.rng.standard_normal(self.n)
              + 1j * self.rng.standard_normal(self.n)).astype(np.complex64)
        tx *= 0.25 / np.abs(tx).max()
        a = np.abs(tx)
        rx = tx * (1.0 - 0.3 * a ** 2)        # AM/AM compression
        return tx, None, rx.astype(np.complex64), None


class FakeAdapt:
    def __init__(self):
        self.pushed = []

    def set_predistorter(self, data):
        self.pushed.append(data)


def _wait(cli, port, pred, timeout=8.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        res = cli.call_rpc_method(port, "get_results", {})
        if pred(res):
            return res
        time.sleep(0.05)
    raise AssertionError(f"timed out; last results: {res}")


@pytest.fixture
def service(tmp_path):
    adapt = FakeAdapt()
    srv = DpdceServer(0, measure=FakeMeasure(), adapt=adapt,
                      dump_dir=str(tmp_path))
    cli = yamlrpc.Socket(bind_port=0, timeout=2.0)
    yield srv, cli, adapt
    cli.close()
    srv.stop()


def test_service_trigger_run_and_results(service):
    srv, cli, adapt = service
    res = cli.call_rpc_method(srv.port, "get_results", {})
    assert res["state"] == "Idle"
    assert cli.call_rpc_method(srv.port, "trigger_run", {}) is None
    res = _wait(cli, srv.port,
                lambda r: r.get("iteration") == 0 and r["state"] == "Idle")
    assert res["residual"] is not None and res["bins"] >= 8
    assert len(adapt.pushed) == 1
    # the fitted AM/AM polynomial must react to the synthetic compression
    assert res["coefs_am"][0] != 1.0 or any(c != 0 for c in
                                            res["coefs_am"][1:])


def test_service_reset_and_adapt(service):
    srv, cli, adapt = service
    cli.call_rpc_method(srv.port, "trigger_run", {})
    _wait(cli, srv.port, lambda r: r.get("iteration") == 0)
    cli.call_rpc_method(srv.port, "reset", {})
    res = _wait(cli, srv.port,
                lambda r: "Reset to identity model" in r["summary"])
    assert res["iteration"] == 0
    # reset pushes the identity predistorter (run + reset = 2 pushes)
    assert len(adapt.pushed) == 2
    cli.call_rpc_method(srv.port, "adapt", {})
    _wait(cli, srv.port,
          lambda r: "Pushed current model" in r["summary"])
    assert len(adapt.pushed) == 3


def test_service_restore_dump(service):
    srv, cli, adapt = service
    cli.call_rpc_method(srv.port, "trigger_run", {})
    res = _wait(cli, srv.port, lambda r: r.get("iteration") == 0)
    dump_id = res["last_dump_id"]
    cli.call_rpc_method(srv.port, "restore_dump", {"dump_id": dump_id})
    res = _wait(cli, srv.port,
                lambda r: r.get("restored_dump") == str(dump_id))
    assert any("restored dump" in s for s in res["summary"])


def test_service_calibrate(service):
    srv, cli, adapt = service
    cli.call_rpc_method(srv.port, "calibrate", {})
    res = _wait(cli, srv.port, lambda r: "calibration" in r)
    assert res["calibration"]["rx_tx_gain"] == pytest.approx(1.0, abs=0.2)
    assert abs(res["calibration"]["phase_deg"]) < 5.0


def test_service_unknown_method(service):
    srv, cli, adapt = service
    with pytest.raises(yamlrpc.ResponseError, match="not understood"):
        cli.call_rpc_method(srv.port, "frobnicate", {})


def test_gui_remote_dpd_panel(service):
    """The GUI's RemoteDpdPanel drives the service like the reference GUI
    drives dpdce (python/gui/api.py:96-163)."""
    from dabmod_tpu.gui import RemoteDpdPanel
    srv, cli, adapt = service
    panel = RemoteDpdPanel(srv.port)
    assert panel.start(iterations=2, kind="poly")
    deadline = time.time() + 15
    while time.time() < deadline and len(panel.history) < 2:
        time.sleep(0.1)
    panel.stop()
    assert len(panel.history) >= 2
    assert [h["iteration"] for h in list(panel.history)[:2]] == [0, 1]
    assert all(h["state"] == "Idle" for h in panel.history)
    assert len(adapt.pushed) >= 2


def test_service_dump_pruning(tmp_path):
    adapt = FakeAdapt()
    srv = DpdceServer(0, measure=FakeMeasure(), adapt=adapt,
                      dump_dir=str(tmp_path))
    srv.DUMPS_KEPT = 3
    cli = yamlrpc.Socket(bind_port=0, timeout=2.0)
    try:
        for i in range(5):
            cli.call_rpc_method(srv.port, "trigger_run", {})
            _wait(cli, srv.port, lambda r, i=i: r.get("iteration") == i)
        import os
        dumps = [f for f in os.listdir(tmp_path) if f.startswith("dpdce_")]
        assert len(dumps) == 3
    finally:
        cli.close()
        srv.stop()
