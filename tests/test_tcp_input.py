"""TCP input resilience: the modulator must survive multiplexer restarts
and stream gaps like the reference's auto-reconnecting TCPClient
(src/InputTcpReader.cpp:44-93, lib/Socket.cpp:954-999)."""
import socket
import threading
import time

import numpy as np
import pytest

from dabmod_tpu import tables
from dabmod_tpu.config import ModSettings
from dabmod_tpu.eti import synth_eti_batch
from dabmod_tpu.io.readers import EtiTcpReader
from dabmod_tpu.runtime import ModRuntime


def _listener():
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    return srv, srv.getsockname()[1]


def _runtime(tmp_path, port, n_expected, timeout=0.3):
    # shrunk reader timing so the test runs in seconds (production
    # defaults mirror the reference: 8 s timeout / 1 s backoff)
    s = ModSettings(input_transport="tcp",
                    input_name=f"tcp://127.0.0.1:{port}",
                    output="file", output_name=str(tmp_path / "out.iq"),
                    file_output_format="s16", batch_tf=2,
                    tcp_timeout=timeout, tcp_reconnect_delay=0.05)
    s.normalise_for_output()
    return ModRuntime(s)


def _drive(rt, want_frames, deadline_s=60.0):
    """Run the supervisor in a thread until `want_frames` are modulated."""
    rc = []
    t = threading.Thread(target=lambda: rc.append(rt.run()), daemon=True)
    t.start()
    t0 = time.monotonic()
    while rt.framecount < want_frames:
        if time.monotonic() - t0 > deadline_s:
            break
        time.sleep(0.05)
    rt.stop()
    t.join(timeout=20)
    assert not t.is_alive(), "runtime failed to stop"
    return rc[0] if rc else None


def test_tcp_reader_reconnects_after_server_restart(tmp_path):
    """Kill and restart the ETI TCP server mid-run: the modulator must
    reconnect and resume instead of treating the close as EOF."""
    frames = synth_eti_batch(32, mode=1)
    srv, port = _listener()
    rt = _runtime(tmp_path, port, 32)

    def server():
        conn, _ = srv.accept()
        conn.sendall(frames[:16].tobytes())
        conn.close()
        srv.close()                       # full server death
        time.sleep(0.5)
        # rebind the same port
        s2 = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s2.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s2.bind(("127.0.0.1", port))
        s2.listen(1)
        conn2, _ = s2.accept()
        conn2.sendall(frames[16:].tobytes())
        time.sleep(1.0)
        conn2.close()
        s2.close()

    th = threading.Thread(target=server, daemon=True)
    th.start()
    rc = _drive(rt, 32)
    th.join(timeout=10)
    assert rt.framecount >= 32
    assert rt.reader.reconnects >= 1
    assert rc == 0
    rt.close()
    data = np.fromfile(tmp_path / "out.iq", np.int16)
    assert data.size == 8 * tables.mode_params(1).tf_samples * 2


def test_tcp_reader_survives_stream_gap(tmp_path):
    """A >=3 s stall on a healthy connection must not end the run: the
    reader times out with empty batches, reconnects past the half-closed
    threshold, and resumes when frames flow again."""
    frames = synth_eti_batch(32, mode=1)
    srv, port = _listener()
    rt = _runtime(tmp_path, port, 32, timeout=0.3)

    def server():
        conn, _ = srv.accept()
        conn.sendall(frames[:8].tobytes())
        time.sleep(3.0)                   # stall > 5x timeout
        try:
            conn.sendall(frames[8:16].tobytes())
        except OSError:
            pass                          # reader reconnected instead
        conn2, _ = srv.accept()           # serve the reconnect
        conn2.sendall(frames[8:].tobytes())
        time.sleep(1.0)
        conn2.close()
        srv.close()

    th = threading.Thread(target=server, daemon=True)
    th.start()
    rc = _drive(rt, 32)
    th.join(timeout=10)
    assert rt.framecount >= 32
    assert rc == 0
    rt.close()


def test_tcp_reader_short_gap_no_reconnect():
    """A gap below the half-closed threshold is just timeouts: no
    reconnect, stream continues on the same connection."""
    frames = synth_eti_batch(8, mode=1)
    srv, port = _listener()
    got = []

    done = threading.Event()

    def server():
        conn, _ = srv.accept()
        conn.sendall(frames[:4].tobytes())
        time.sleep(0.8)                   # < 5 * 0.3 s
        conn.sendall(frames[4:].tobytes())
        done.wait(10)                     # hold the connection open
        conn.close()
        srv.close()

    th = threading.Thread(target=server, daemon=True)
    th.start()
    reader = EtiTcpReader(f"tcp://127.0.0.1:{port}", timeout=0.3,
                          reconnect_delay=0.05)
    deadline = time.monotonic() + 20
    while sum(len(b) for b in got) < 8 and time.monotonic() < deadline:
        b = reader.read_batch(8)
        if len(b):
            got.append(b)
    assert sum(len(b) for b in got) == 8
    assert reader.reconnects == 0
    done.set()
    th.join(timeout=10)
    np.testing.assert_array_equal(np.concatenate(got), frames)
    reader.close()


def test_tcp_reader_waits_for_server():
    """Connecting before the server exists must not crash; the reader
    retries until the server appears."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.close()                           # port known, nobody listening

    reader = EtiTcpReader(f"tcp://127.0.0.1:{port}", timeout=0.2,
                          reconnect_delay=0.05)
    assert len(reader.read_batch(2)) == 0   # no server: empty, not EOF

    frames = synth_eti_batch(4, mode=1)
    srv2 = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv2.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv2.bind(("127.0.0.1", port))
    srv2.listen(1)

    def server():
        conn, _ = srv2.accept()
        conn.sendall(frames.tobytes())
        time.sleep(0.5)
        conn.close()
        srv2.close()

    th = threading.Thread(target=server, daemon=True)
    th.start()
    got = []
    deadline = time.monotonic() + 20
    while sum(len(b) for b in got) < 4 and time.monotonic() < deadline:
        b = reader.read_batch(4)
        if len(b):
            got.append(b)
    th.join(timeout=10)
    assert sum(len(b) for b in got) == 4
    reader.close()


def test_tcp_mux_restart_with_fct_reset(tmp_path):
    """A restarted multiplexer begins again at FCT 0: the runtime must
    take the discontinuity restart (AGAIN) and keep transmitting, exactly
    like the reference's supervisor (src/DabMod.cpp:694-707)."""
    first = synth_eti_batch(16, mode=1)
    second = synth_eti_batch(16, mode=1, seed=2)   # fresh stream, FCT 0
    srv, port = _listener()
    rt = _runtime(tmp_path, port, 32)

    def server():
        conn, _ = srv.accept()
        conn.sendall(first.tobytes())
        conn.close()
        srv.close()
        time.sleep(0.5)
        s2 = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s2.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s2.bind(("127.0.0.1", port))
        s2.listen(1)
        conn2, _ = s2.accept()
        conn2.sendall(second.tobytes())
        time.sleep(1.0)
        conn2.close()
        s2.close()

    th = threading.Thread(target=server, daemon=True)
    th.start()
    rc = _drive(rt, 32)
    th.join(timeout=10)
    assert rt.framecount >= 32
    assert rt.num_restarts >= 1         # FCT discontinuity restart taken
    assert rc == 0
    rt.close()


def test_tcp_silent_server_reconnects_from_connect():
    """A peer that accepts the connection but never sends a byte must be
    treated as half-closed after 5x timeout counted FROM CONNECT (the
    reference counts from connect, lib/Socket.cpp:978-985) -- not retried
    as bare timeouts forever."""
    srv, port = _listener()
    accepted = []

    def server():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            accepted.append(conn)        # accept, never send

    t = threading.Thread(target=server, daemon=True)
    t.start()
    r = EtiTcpReader(f"tcp://127.0.0.1:{port}", timeout=0.3,
                     reconnect_delay=0.05)
    try:
        t0 = time.monotonic()
        deadline = t0 + 10.0
        while r.reconnects == 0 and time.monotonic() < deadline:
            assert r.read_batch(1).size == 0
        # must reconnect after ~5 x 0.3 s = 1.5 s of accepted silence
        assert r.reconnects >= 1, "silent server never triggered reconnect"
        assert time.monotonic() - t0 < 8.0
        while len(accepted) < 2 and time.monotonic() < deadline:
            time.sleep(0.05)             # server thread accept is async
        assert len(accepted) >= 2        # it actually re-dialled
    finally:
        r.close()
        srv.close()
        for c in accepted:
            c.close()


def test_tcp_stop_latency_mid_recv(tmp_path):
    """stop() during a stalled stream must end the run loop within ~1 s,
    not after the full receive timeout."""
    frames = synth_eti_batch(8, mode=1)
    srv, port = _listener()
    conns = []

    def server():
        conn, _ = srv.accept()
        conns.append(conn)
        conn.sendall(frames.tobytes())   # then stall forever

    threading.Thread(target=server, daemon=True).start()
    # long timeout: a blocking recv would previously pin stop() for 8 s
    s = ModSettings(input_transport="tcp",
                    input_name=f"tcp://127.0.0.1:{port}",
                    output="file", output_name=str(tmp_path / "out.iq"),
                    file_output_format="s16", batch_tf=2,
                    tcp_timeout=8.0, tcp_reconnect_delay=0.5)
    s.normalise_for_output()
    rt = ModRuntime(s)
    rc = []
    t = threading.Thread(target=lambda: rc.append(rt.run()), daemon=True)
    t.start()
    t0 = time.monotonic()
    while rt.framecount < 8 and time.monotonic() - t0 < 60:
        time.sleep(0.05)
    assert rt.framecount >= 8
    # the stream is now stalled: the reader is inside its recv loop
    time.sleep(1.0)
    t1 = time.monotonic()
    rt.stop()
    t.join(timeout=5)
    stop_latency = time.monotonic() - t1
    assert not t.is_alive(), "runtime failed to stop"
    assert stop_latency < 2.0, f"stop took {stop_latency:.1f}s"
    rt.close()
    srv.close()
    for c in conns:
        c.close()
