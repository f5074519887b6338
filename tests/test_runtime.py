"""Streaming runtime + CLI end-to-end tests (ETI file -> I/Q file)."""
import numpy as np
import pytest

from dabmod_tpu import tables
from dabmod_tpu.eti import build_eti_frame, parse_eti_frames, synth_eti_batch
from dabmod_tpu.io.readers import EtiFileReader
from dabmod_tpu.models import make_default_layout


def _write_raw(tmp_path, frames, name="in.eti"):
    path = tmp_path / name
    path.write_bytes(frames.tobytes())
    return str(path)


def test_file_reader_framing(tmp_path):
    frames = synth_eti_batch(6, mode=1)
    # raw
    r = EtiFileReader(_write_raw(tmp_path, frames))
    assert r.streamtype == "raw"
    np.testing.assert_array_equal(r.frames(), frames)
    # streamed: u16 size prefix per frame
    blob = b"".join(int(6144).to_bytes(2, "little") + f.tobytes()
                    for f in frames)
    p = tmp_path / "streamed.eti"
    p.write_bytes(blob)
    r = EtiFileReader(str(p))
    assert r.streamtype == "streamed"
    np.testing.assert_array_equal(r.frames(), frames)
    # framed: u32 count then sized frames
    p = tmp_path / "framed.eti"
    p.write_bytes(int(6).to_bytes(4, "little") + blob)
    r = EtiFileReader(str(p))
    assert r.streamtype == "framed"
    np.testing.assert_array_equal(r.frames(), frames)


def test_file_reader_streaming_pipe():
    """Frames fed incrementally through an os.pipe must come out batch by
    batch *before* the writer closes -- the reference's frame-at-a-time
    GetNextFrame semantics (src/InputFileReader.cpp:219-288)."""
    import os
    import threading

    frames = synth_eti_batch(6, mode=1)
    rfd, wfd = os.pipe()
    first_two_read = threading.Event()

    def writer():
        with os.fdopen(wfd, "wb") as w:
            w.write(frames[:2].tobytes())
            w.flush()
            # hold the pipe open until the reader proves it got the first
            # two frames without EOF
            assert first_two_read.wait(timeout=10)
            for f in frames[2:]:
                w.write(f.tobytes())
                w.flush()

    t = threading.Thread(target=writer)
    t.start()
    r = EtiFileReader("pipe", fileobj=os.fdopen(rfd, "rb"))
    batch = r.read_batch(2)
    np.testing.assert_array_equal(batch, frames[:2])
    first_two_read.set()
    rest = r.read_batch(4)
    np.testing.assert_array_equal(rest, frames[2:])
    t.join()
    assert r.read_batch(1).size == 0   # EOF after writer closed
    r.close()


def test_file_reader_loop_wraps(tmp_path):
    frames = synth_eti_batch(3, mode=1)
    r = EtiFileReader(_write_raw(tmp_path, frames), loop=True)
    got = r.read_batch(7)
    assert got.shape[0] == 7
    np.testing.assert_array_equal(got[3:6], frames)
    np.testing.assert_array_equal(got[6], frames[0])
    r.close()


def test_file_reader_raw_offset(tmp_path):
    """Sync-word search skips leading garbage like IdentifyType's byte scan
    (src/InputFileReader.cpp:97-127)."""
    frames = synth_eti_batch(3, mode=1)
    p = tmp_path / "offset.eti"
    p.write_bytes(b"\x00\x01\x02" + frames.tobytes())
    r = EtiFileReader(str(p))
    assert r.streamtype == "raw"
    np.testing.assert_array_equal(r.frames(), frames)


def test_cli_fifo_end_to_end(tmp_path):
    """The CLI must consume an unbounded FIFO (the /dev/stdin case) while
    the producer is still writing."""
    import os
    import threading
    from dabmod_tpu.cli import main

    frames = synth_eti_batch(8, mode=1)
    fifo = str(tmp_path / "in.fifo")
    os.mkfifo(fifo)

    def writer():
        with open(fifo, "wb") as w:
            for f in frames:
                w.write(f.tobytes())
                w.flush()

    t = threading.Thread(target=writer)
    t.start()
    out = str(tmp_path / "fifo_out.iq")
    rc = main([fifo, "-f", out, "-F", "s16", "-b", "2"])
    t.join()
    assert rc == 0
    data = np.fromfile(out, np.int16)
    assert data.size == 2 * tables.mode_params(1).tf_samples * 2


def test_cli_end_to_end(tmp_path):
    from dabmod_tpu.cli import main
    frames = synth_eti_batch(16, mode=1)
    inp = _write_raw(tmp_path, frames)
    out = str(tmp_path / "out.iq")
    rc = main([inp, "-f", out, "-F", "s16", "-b", "2"])
    assert rc == 0
    data = np.fromfile(out, np.int16)
    assert data.size == 4 * tables.mode_params(1).tf_samples * 2
    # the signal must use a healthy fraction of the s16 range
    assert 8000 < np.abs(data).max() <= 32767


def test_device_format_conversion_end_to_end(tmp_path):
    """s16 output through the device-side FormatConverter must equal the
    host-converted path byte for byte."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.runtime import ModRuntime
    frames = synth_eti_batch(8, mode=1)
    inp = _write_raw(tmp_path, frames)
    outs = {}
    for dev_conv in (True, False):
        out = str(tmp_path / f"out_{dev_conv}.iq")
        s = ModSettings(input_name=inp, output="file", output_name=out,
                        file_output_format="s16", batch_tf=2,
                        device_format_conversion=dev_conv)
        s.normalise_for_output()
        rt = ModRuntime(s)
        assert rt.run() == 0
        rt.close()
        outs[dev_conv] = open(out, "rb").read()
    assert len(outs[True]) == 2 * tables.mode_params(1).tf_samples * 2 * 2
    assert outs[True] == outs[False]


def test_runtime_fct_discontinuity_restart(tmp_path):
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.runtime import ModRuntime
    frames = synth_eti_batch(16, mode=1)
    # corrupt continuity: drop 2 frames in the middle
    broken = np.concatenate([frames[:8], frames[10:]])
    inp = _write_raw(tmp_path, broken)
    out = str(tmp_path / "out.iq")
    s = ModSettings(input_name=inp, output="file", output_name=out,
                    file_output_format="complexf", batch_tf=1)
    s.normalise_for_output()
    rt = ModRuntime(s)
    assert rt.run() == 0
    assert rt.num_restarts >= 1
    # all aligned TFs still modulated (2 before break, up to 1 after
    # realignment to FP 0)
    data = np.fromfile(out, np.float32)
    assert data.size % (tables.mode_params(1).tf_samples * 2) == 0
    assert data.size > 0


def test_runtime_fp_alignment(tmp_path):
    """Frames before the first FP-0 frame must be dropped
    (ref: src/DabMod.cpp:683-692)."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.runtime import ModRuntime
    layout = make_default_layout(1)
    rng = np.random.default_rng(1)
    frames = []
    for t in range(14):
        fic = rng.integers(0, 256, 96, dtype=np.uint8)
        sub = [rng.integers(0, 256, p.framesize, dtype=np.uint8)
               for p in layout.subchannels]
        # fp cycles but starts at 6 -> first 2 frames unaligned
        frames.append(build_eti_frame(layout, fct=t, fic=fic, subch_data=sub,
                                      fp=(6 + t) % 8))
    inp = _write_raw(tmp_path, np.stack(frames))
    out = str(tmp_path / "out.iq")
    s = ModSettings(input_name=inp, output="file", output_name=out,
                    file_output_format="complexf", batch_tf=1)
    s.normalise_for_output()
    rt = ModRuntime(s)
    assert rt.run() == 0
    data = np.fromfile(out, np.float32)
    # 12 aligned frames -> 3 TFs
    assert data.size == 3 * tables.mode_params(1).tf_samples * 2


def test_timestamp_decoder_mnsc():
    from dabmod_tpu.timestamps import TimestampDecoder
    td = TimestampDecoder()
    # encode 2026-08-17 12:34:56 over the 4 frame phases
    def bcd(v):
        return ((v // 10) << 4) | (v % 10)
    mnsc0 = 0x0000                       # type 0, ident 0
    mnsc1 = bcd(56) | (1 << 7 - 4)       # unused bits
    mnsc1 = (bcd(56) & 0x7F) | ((bcd(34) | 0x80) << 8)  # sec + min, sync=1
    mnsc2 = bcd(12) | (bcd(17) << 8)     # hour + day
    mnsc3 = bcd(8) | (bcd(26) << 8)      # month + year-2000
    for i, mn in enumerate([mnsc0, mnsc1, mnsc2, mnsc3]):
        td.update_eti(i, mn, pps=1_000_000, fct=i)
    ts = td.timestamp()
    assert ts.valid
    import calendar
    assert ts.seconds == calendar.timegm((2026, 8, 17, 12, 34, 56, 0, 0, 0))
    assert ts.pps == 1_000_000


def test_timestamp_pps_wraparound():
    from dabmod_tpu.timestamps import TimestampDecoder
    td = TimestampDecoder()
    td.update_eti(0, 0, pps=16_000_000, fct=0)
    secs0 = td.time_secs
    td.update_eti(1, 0x8000, pps=100_000, fct=1)   # wrapped
    assert td.time_secs == secs0 + 1
    assert td.inhibit_second_update == 2


def test_edi_udp_end_to_end(tmp_path):
    """EDI over UDP into the runtime: encode frames, send as datagrams,
    modulate, compare against the same payload over the ETI file path."""
    import socket as socklib
    import threading
    import time as timelib
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.io.edi import build_af_packet, encode_edi_frame
    from dabmod_tpu.runtime import ModRuntime

    rng = np.random.default_rng(21)
    n_frames = 8
    payloads = []
    for t in range(n_frames):
        fic = rng.integers(0, 256, 96, dtype=np.uint8).tobytes()
        subs = [(0, 0, 0x22,
                 rng.integers(0, 256, 192, dtype=np.uint8).tobytes())]
        payloads.append((fic, subs, t))

    port = 39831
    s = ModSettings(input_name=f"udp://127.0.0.1:{port}",
                    input_transport="edi",
                    output="file", output_name=str(tmp_path / "edi.iq"),
                    file_output_format="complexf", batch_tf=1)
    s.normalise_for_output()
    rt = ModRuntime(s)

    def sender():
        timelib.sleep(0.3)
        sock = socklib.socket(socklib.AF_INET, socklib.SOCK_DGRAM)
        for seq, (fic, subs, dlfc) in enumerate(payloads):
            af = build_af_packet(
                encode_edi_frame(fic, subs, dlfc,
                                 timestamp=(0, 800_000_000 + dlfc, 5000)),
                seq)
            sock.sendto(af, ("127.0.0.1", port))
            timelib.sleep(0.01)
        sock.close()

    t = threading.Thread(target=sender)
    t.start()
    rt.run_batches(max_batches=2)
    t.join()
    data = np.fromfile(tmp_path / "edi.iq", np.float32)
    assert data.size == 2 * 196608 * 2
    # EDI timestamps reached the decoder (epoch conversion applied)
    assert rt.ts_decoder.full_timestamp_received
    assert rt.ts_decoder.time_secs > 1_700_000_000

    # same payload through the ETI file path must give identical output
    from dabmod_tpu.eti import build_eti_frame
    from dabmod_tpu.models import make_default_layout
    layout = make_default_layout(1, subch_specs=((0, 24, 0x22),))
    frames = np.stack([
        build_eti_frame(layout, fct=t, fic=np.frombuffer(fic, np.uint8),
                        subch_data=[np.frombuffer(subs[0][3], np.uint8)],
                        fp=t % 8, tist=5000)
        for (fic, subs, t) in payloads])
    p2 = tmp_path / "ref.eti"
    p2.write_bytes(frames.tobytes())
    s2 = ModSettings(input_name=str(p2), output="file",
                     output_name=str(tmp_path / "ref.iq"),
                     file_output_format="complexf", batch_tf=1)
    s2.normalise_for_output()
    rt2 = ModRuntime(s2)
    rt2.run()
    ref = np.fromfile(tmp_path / "ref.iq", np.float32)
    np.testing.assert_array_equal(data, ref[:data.size])


def test_dynamic_offset_file_reread(tmp_path):
    """delaymanagement management=dynamic: a change to the offset file
    takes effect mid-run, without a restart."""
    import os
    import time
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.runtime import ModRuntime

    frames = synth_eti_batch(16, mode=1)
    inp = _write_raw(tmp_path, frames)
    off = tmp_path / "offset.txt"
    off.write_text("0.5\n")
    s = ModSettings(input_name=inp, output="file",
                    output_name=str(tmp_path / "dyn.iq"),
                    file_output_format="s16", batch_tf=2,
                    tist_enabled=True, tist_delay_management="dynamic",
                    tist_dynamic_offset_file=str(off))
    s.normalise_for_output()
    rt = ModRuntime(s)
    rt.run_batches(max_batches=1)
    assert rt.ts_decoder.offset_s == 0.5
    off.write_text("0.8\n")
    # force a visible mtime change even on coarse filesystem clocks
    st = os.stat(off)
    os.utime(off, (st.st_atime, st.st_mtime + 2))
    rt.run_batches(max_batches=1)
    assert rt.ts_decoder.offset_s == 0.8
    rt.close()


def test_file_reader_loop_warns_on_pipe(caplog):
    """loop=1 on a non-seekable input degrades to a single pass; the
    operator must be told (ref fseek failure, InputFileReader.cpp:219-236)."""
    import io as io_mod
    import logging
    frames = synth_eti_batch(2, mode=1)

    class Unseekable(io_mod.BytesIO):
        def seekable(self):
            return False

    with caplog.at_level(logging.WARNING, logger="dabmod_tpu"):
        r = EtiFileReader("pipe", loop=True,
                          fileobj=Unseekable(frames.tobytes()))
        assert not r.loop
    assert any("not seekable" in m for m in caplog.messages)
    assert len(r.frames()) == 2     # single pass, no wrap


def test_file_reader_pipe_dribble():
    """A pipe delivering one byte at a time must still frame correctly
    (bounded buffering, no corruption)."""
    import os
    import threading
    frames = synth_eti_batch(2, mode=1)
    rfd, wfd = os.pipe()

    def writer():
        data = frames.tobytes()
        with os.fdopen(wfd, "wb") as w:
            head, rest = data[:64], data[64:]
            for b in head:          # dribble the sync-search region
                w.write(bytes([b]))
                w.flush()
            w.write(rest)

    t = threading.Thread(target=writer)
    t.start()
    r = EtiFileReader("pipe", fileobj=os.fdopen(rfd, "rb"))
    got = r.frames()
    t.join()
    np.testing.assert_array_equal(got, frames)


def test_trace_dir_stage_dumps(tmp_path):
    """[log] trace_dir: per-stage raw .dat dumps, the analogue of the
    reference's --enable-trace node files (src/Flowgraph.cpp:62-70,
    177-194).  The traced run's final output must equal the compiled
    run's, and the dumped stage files must carry the right sizes."""
    import os

    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import parse_eti_frames
    from dabmod_tpu.models import Modulator, make_default_layout
    from dabmod_tpu import tables

    layout = make_default_layout(1)
    p = tables.mode_params(1)
    raw = synth_eti_batch(8, mode=1, seed=9)
    batch = parse_eti_frames(raw)
    s = ModSettings(dab_mode=1, output="file", file_output_format="s16")
    s.normalise_for_output()
    m = Modulator(layout, s)
    trace = tmp_path / "trace"

    out_t, st_t, _ = m.modulate_traced(batch.fic, tuple(batch.subchannels),
                                       m.init_state(), str(trace))
    out_c, st_c, _ = m.modulate(batch.fic, tuple(batch.subchannels),
                                m.init_state())
    # eager (traced) vs compiled runs may differ by one s16 LSB where XLA
    # fusion changes f32 rounding at a quantisation boundary
    wire_t = np.asarray(out_t).view(np.int16).astype(np.int32)
    wire_c = np.asarray(out_c).view(np.int16).astype(np.int32)
    assert np.abs(wire_t - wire_c).max() <= 1

    names = sorted(os.listdir(trace))
    stages = [n.split("-", 1)[1] for n in names]
    for want in ("fec.dat", "qpsk_map.dat", "diff_mod.dat", "carriers.dat",
                 "tii_null.dat", "ofdm_ifft.dat", "gain.dat",
                 "guard_interval.dat"):
        assert want in stages, (want, stages)
    B = 2
    # carriers tap: (re, im) pairs of [B, 76, C] f32
    car = np.fromfile(trace / names[stages.index("carriers.dat")],
                      np.float32)
    assert car.size == B * 76 * p.nb_carriers * 2
    # guard interval output: full TF sample stream as f32 pairs
    gi = np.fromfile(trace / names[stages.index("guard_interval.dat")],
                     np.float32)
    assert gi.size == B * p.tf_samples * 2

    # deferred-FI taps are restored to CARRIER order at dump time: the
    # carriers dump must equal the public frontend() output exactly
    syms, _ = m.frontend(batch.fic, tuple(batch.subchannels),
                         m.init_state()["ti_history"])
    pairs = np.stack([np.asarray(syms[0]), np.asarray(syms[1])], axis=-1)
    np.testing.assert_array_equal(
        car.reshape(pairs.shape), pairs)

    # appending behaviour: a second traced batch doubles the files
    m.modulate_traced(batch.fic, tuple(batch.subchannels), st_t,
                      str(trace))
    gi2 = np.fromfile(trace / names[stages.index("guard_interval.dat")],
                      np.float32)
    assert gi2.size == 2 * gi.size

    # fresh Modulator => files truncated, not appended across runs
    m2 = Modulator(layout, s)
    m2.modulate_traced(batch.fic, tuple(batch.subchannels),
                       m2.init_state(), str(trace))
    gi3 = np.fromfile(trace / names[stages.index("guard_interval.dat")],
                      np.float32)
    assert gi3.size == gi.size


def test_edi_timestamps_stay_aligned_after_drops(tmp_path):
    """EDI per-frame timestamps must stay paired with their frames when
    the runtime drops frames (FP-0 alignment, FCT-discontinuity requeue);
    a bare side-list desyncs and shifts every SFN timestamp by the number
    of dropped frames (ref: src/EtiReader.cpp:476-529 keeps them paired)."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.runtime import ModRuntime

    # 16 frames starting at FP=2: the first 2 frames (FP 2,3... wait: FP
    # cycles 0..7 per 8 frames at mode 1 -> synth starts at FP 0; slice 2
    frames = synth_eti_batch(18, mode=1)
    frames = frames.reshape(18, 6144)[2:]          # starts at FP=2
    inp = _write_raw(tmp_path, frames.reshape(-1))
    out = str(tmp_path / "out.iq")
    s = ModSettings(input_name=inp, output="file", output_name=out,
                    file_output_format="s16", batch_tf=2)
    s.normalise_for_output()
    rt = ModRuntime(s)

    # wrap the real reader with an EDI-like timestamps side channel: frame
    # k (0-based in the sliced stream) carries seconds=1000+k
    class EdiLikeReader:
        never_eof = False

        def __init__(self, inner):
            self.inner = inner
            self.timestamps = []
            self._k = 0

        def read_batch(self, n):
            raw = self.inner.read_batch(n)
            for _ in range(len(raw)):
                self.timestamps.append((1000 + self._k, 32, 0))
                self._k += 1
            return raw

        def close(self):
            self.inner.close()
    rt.reader = EdiLikeReader(rt.reader)

    seen = []
    orig = rt.ts_decoder.update_edi
    rt.ts_decoder.update_edi = (
        lambda posix, pps, fct, fp: (seen.append((posix, int(fct))),
                                     orig(posix, pps, fct, fp))[1])
    assert rt.run() == 0
    rt.close()
    # FP-0 alignment drops the first 6 frames (FP 2..7), whose timestamps
    # 1000..1005 must be discarded with them: the first *processed* frame
    # is stream index 6 (seconds 1006), and pairing stays 1:1 after
    assert seen, "no EDI timestamps reached the decoder"
    base_posix = 1006 + 946_684_800 + 32 - 32
    for j, (posix, fct) in enumerate(seen):
        assert posix == base_posix + j, (j, posix, seen[:4])
