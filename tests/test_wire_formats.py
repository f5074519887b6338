"""Device-side wire-format conversion for ZMQ and sc16 SDR sinks.

The reference converts formats on the host CPU (src/FormatConverter.cpp);
this build converts on-device (models/modulator.py) so the D2H transfer
ships 2-4x fewer bytes.  These tests pin the packed-i32 wire path for the
sinks beyond file output: ZMQ integer formats and the sc16-native SDR
devices (BladeRF/Dexter, ref: src/DabMod.cpp:450-466)."""
import threading

import numpy as np
import pytest

from dabmod_tpu import tables
from dabmod_tpu.config import ModSettings
from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
from dabmod_tpu.io.sdr import (LoopbackSdrDevice, SdrOutput,
                               n_complex_samples, sc16_pairs)
from dabmod_tpu.models import Modulator, make_default_layout


def _modulate(settings, n_frames=8):
    layout = make_default_layout(1)
    m = Modulator(layout, settings)
    batch = parse_eti_frames(synth_eti_batch(n_frames, mode=1))
    iq, _, stats = m.modulate_eti(batch, m.init_state())
    return np.asarray(iq), stats


def test_sc16_pairs_roundtrip():
    pairs = np.array([[100, -100], [32767, -32768]], np.int16)
    packed = pairs.reshape(-1).view(np.int32)
    np.testing.assert_array_equal(sc16_pairs(packed), pairs)
    assert n_complex_samples(packed) == 2
    assert n_complex_samples(pairs.astype(np.float32)) == 2


def test_bladerf_output_converts_on_device():
    s = ModSettings(dab_mode=1, output="bladerf").normalise_for_output()
    iq, stats = _modulate(s)
    assert iq.dtype == np.int32          # packed s16 wire words
    ref = ModSettings(dab_mode=1, output="bladerf",
                      device_format_conversion=False).normalise_for_output()
    iq_f, _ = _modulate(ref)
    want = np.trunc(np.clip(iq_f, -32768, 32767)).astype(np.int16)
    np.testing.assert_array_equal(sc16_pairs(iq), want)
    # bladerf normalisation keeps samples inside SC16-Q11
    assert np.abs(want).max() <= 2047


def test_dexter_output_converts_on_device():
    s = ModSettings(dab_mode=1, output="dexter").normalise_for_output()
    iq, _ = _modulate(s)
    assert iq.dtype == np.int32


def test_bladerf_driver_accepts_packed_i32():
    from test_vendor_drivers import make_bladerf
    dev, brf = make_bladerf()
    pairs = np.array([[100, -100], [2047, -2048]], np.int16)
    packed = pairs.reshape(-1).view(np.int32)
    dev.transmit_frame(packed, None)
    np.testing.assert_array_equal(brf.tx[0], pairs.reshape(-1))


def test_sdr_output_splits_packed_batches_and_feedback_unpacks():
    dev = LoopbackSdrDevice()
    out = SdrOutput(dev, sync=False, sample_rate=2_048_000)
    B, N = 3, 64
    pairs = np.arange(B * N * 2, dtype=np.int16).reshape(B, N, 2)
    packed = np.ascontiguousarray(pairs).reshape(B, -1).view(np.int32)
    assert packed.shape == (B, N)
    meta = [(i, None) for i in range(B)]
    out.write(packed, meta)
    deadline = __import__("time").monotonic() + 5
    while len(dev._history) < B and __import__("time").monotonic() < deadline:
        __import__("time").sleep(0.01)
    assert len(dev._history) == B        # one queue entry per TF
    got, _ = dev._history[0]
    np.testing.assert_array_equal(sc16_pairs(got), pairs[0])
    out.close()


def test_zmq_s16_integer_wire(tmp_path):
    """ZMQ REP sink with format=s16: the wire carries integer samples at
    half the f32 size, identical to the file sink's s16 bytes."""
    zmq = pytest.importorskip("zmq")
    from dabmod_tpu.runtime import ModRuntime

    frames = synth_eti_batch(8, mode=1)
    inp = tmp_path / "in.eti"
    inp.write_bytes(frames.tobytes())

    # reference bytes: file sink, same input, same format
    sf = ModSettings(input_name=str(inp), output="file",
                     output_name=str(tmp_path / "ref.iq"),
                     file_output_format="s16",
                     batch_tf=2).normalise_for_output()
    rt = ModRuntime(sf)
    assert rt.run() == 0
    rt.close()
    ref_bytes = (tmp_path / "ref.iq").read_bytes()

    import socket as _socket
    with _socket.socket() as _s:
        _s.bind(("127.0.0.1", 0))
        port = _s.getsockname()[1]
    sz = ModSettings(input_name=str(inp), output="zmq",
                     output_name=f"tcp://127.0.0.1:{port}",
                     zmq_output_socket_type="rep", zmq_output_format="s16",
                     batch_tf=2).normalise_for_output()
    rtz = ModRuntime(sz)
    assert rtz.modulator is None
    received = []

    def consumer():
        ctx = zmq.Context.instance()
        sock = ctx.socket(zmq.REQ)
        sock.connect(f"tcp://127.0.0.1:{port}")
        sock.setsockopt(zmq.RCVTIMEO, 20000)
        for _ in range(2):               # two batches of 2 TFs
            sock.send(b"")
            received.append(sock.recv())
        sock.close()

    t = threading.Thread(target=consumer, daemon=True)
    t.start()
    assert rtz.run() == 0
    t.join(timeout=20)
    rtz.close()

    data = b"".join(received)
    n_samples = 2 * tables.mode_params(1).tf_samples
    assert len(data) == n_samples * 2 * 2        # s16 pairs: half of f32
    assert data == ref_bytes


def test_f32_file_output_host_interleave(tmp_path):
    """The f32 planes contract (device_interleave=False, chosen
    automatically by the runtime for f32 sinks) must write byte-identical
    wire data to the device-interleaved pairs path."""
    from dabmod_tpu.runtime import ModRuntime

    frames = synth_eti_batch(8, mode=1)
    inp = tmp_path / "in.eti"
    inp.write_bytes(frames.tobytes())
    s = ModSettings(input_name=str(inp), output="file",
                    output_name=str(tmp_path / "f32.iq"),
                    file_output_format="complexf",
                    batch_tf=2).normalise_for_output()
    rt = ModRuntime(s)
    assert s.device_interleave is False      # auto-selected for f32
    assert rt.run() == 0
    rt.close()
    got = np.fromfile(tmp_path / "f32.iq", np.float32)

    m = Modulator(make_default_layout(1),
                  ModSettings(dab_mode=1, device_interleave=True))
    batch = parse_eti_frames(frames)
    state = m.init_state()
    parts = []
    for i in (0, 1):
        iq, state, _ = m.modulate_eti(
            type(batch)(batch.raw[i * 4:(i + 1) * 4]) if False else
            parse_eti_frames(frames[i * 4:(i + 1) * 4]), state)
        parts.append(np.asarray(iq).reshape(-1))
    want = np.concatenate(parts)
    # two different executables (planes vs pairs output) may differ by
    # f32 rounding from different fusion choices; bound: sub-wire-LSB
    d = np.abs(got - want)
    assert float(d.max()) < 0.05, float(d.max())
