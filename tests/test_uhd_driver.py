"""UHD driver + GPSDO clock-discipline tests against a mock uhd module.

The mock mirrors the uhd Python API surface the driver uses
(uhd.usrp.MultiUSRP, StreamArgs, types.TimeSpec/TXMetadata/...), so the
full driver -- timed sends with EOB handling, the USRPTime state machine
(ref: src/output/USRPTime.cpp:67-303), refclk lock-loss behaviour
(ref: src/output/UHD.cpp:439-462) -- runs without hardware.
"""
import time
import types

import numpy as np
import pytest

from dabmod_tpu.io.uhd_driver import (GPS_FIX_CHECK_INTERVAL, GpsFixLost,
                                      RefclkLockLost, UhdConfig, UhdDevice,
                                      UsrpTime)
from dabmod_tpu.timestamps import FrameTimestamp


# ---------------------------------------------------------------------------
# mock uhd module
# ---------------------------------------------------------------------------

class FakeClock:
    def __init__(self, t0=1000.0):
        self.t = t0

    def time(self):
        return self.t

    def sleep(self, dt):
        self.t += dt


class FakeSensor:
    def __init__(self, value):
        self.value = value

    def to_bool(self):
        return bool(self.value)


class FakeTimeSpec:
    def __init__(self, t=0.0):
        self._t = float(t)

    def get_real_secs(self):
        return self._t


class FakeTxMetadata:
    def __init__(self):
        self.has_time_spec = False
        self.time_spec = FakeTimeSpec()
        self.start_of_burst = False
        self.end_of_burst = False


class FakeTxStream:
    def __init__(self, max_samps=1000):
        self.max_samps = max_samps
        self.sends = []          # (nsamps, has_time_spec, t, eob)

    def get_max_num_samps(self):
        return self.max_samps

    def send(self, buf, md, timeout):
        self.sends.append((len(buf), md.has_time_spec,
                           md.time_spec.get_real_secs() if md.has_time_spec
                           else None, md.end_of_burst))
        return len(buf)

    def recv_async_msg(self, md, timeout):
        return False


class FakeRxStream:
    def __init__(self):
        self.cmds = []

    def issue_stream_cmd(self, cmd):
        self.cmds.append(cmd)

    def recv(self, buf, md, timeout):
        buf[:] = 0.5 + 0.25j
        md.time_spec = FakeTimeSpec(self.cmds[-1].time_spec.get_real_secs())
        return len(buf)


class FakeUsrp:
    def __init__(self, clock: FakeClock):
        self.clock = clock
        self.sensors = {"ref_locked": FakeSensor(True),
                        "gps_locked": FakeSensor(True)}
        self.clock_source = None
        self.time_source = None
        self.tx_rate = 0.0
        self.tx_gain = 0.0
        self.rx_gain = 0.0
        self.tx_freq = 0.0
        self.device_time = 0.0   # offset vs clock
        self.tx_stream = FakeTxStream()
        self.rx_stream = FakeRxStream()
        self.time_sets = []

    def get_master_clock_rate(self):
        return 32_768_000.0

    def set_clock_source(self, s):
        self.clock_source = s

    def set_time_source(self, s):
        self.time_source = s

    def set_tx_subdev_spec(self, s):
        self.subdev = s

    def set_time_now(self, ts):
        self.device_time = ts.get_real_secs() - self.clock.time()
        self.time_sets.append(("now", ts.get_real_secs()))

    def set_time_unknown_pps(self, ts):
        self.device_time = ts.get_real_secs() - self.clock.time() - 1.0
        self.time_sets.append(("pps", ts.get_real_secs()))

    def get_time_now(self):
        return FakeTimeSpec(self.clock.time() + self.device_time)

    def get_mboard_sensor(self, name, mboard=0):
        if name not in self.sensors:
            raise KeyError(name)
        return self.sensors[name]

    def set_tx_rate(self, r):
        self.tx_rate = float(r)

    def get_tx_rate(self):
        return self.tx_rate

    def set_rx_rate(self, r):
        self.rx_rate = float(r)

    def set_tx_bandwidth(self, b):
        pass

    def set_rx_bandwidth(self, b):
        pass

    def set_tx_freq(self, tr):
        self.tx_freq = tr.target_freq

    def set_rx_freq(self, tr):
        self.rx_freq = tr.target_freq

    def get_tx_freq(self):
        return self.tx_freq

    def set_tx_gain(self, g):
        self.tx_gain = float(g)

    def get_tx_gain(self):
        return self.tx_gain

    def set_rx_gain(self, g):
        self.rx_gain = float(g)

    def get_rx_gain(self):
        return self.rx_gain

    def set_rx_antenna(self, a):
        pass

    def get_tx_stream(self, args):
        return self.tx_stream

    def get_rx_stream(self, args):
        return self.rx_stream


class FakeTuneRequest:
    def __init__(self, freq, lo_offset=0.0):
        self.target_freq = freq
        self.lo_offset = lo_offset


class FakeStreamCmd:
    def __init__(self, mode):
        self.mode = mode
        self.num_samps = 0
        self.stream_now = True
        self.time_spec = FakeTimeSpec()


def make_fake_uhd(clock: FakeClock):
    usrp_holder = {}

    def multi_usrp(args):
        u = FakeUsrp(clock)
        usrp_holder["usrp"] = u
        u.args = args
        return u

    mod = types.SimpleNamespace(
        usrp=types.SimpleNamespace(
            MultiUSRP=multi_usrp,
            StreamArgs=lambda a, b: (a, b),
        ),
        types=types.SimpleNamespace(
            TimeSpec=FakeTimeSpec,
            TXMetadata=FakeTxMetadata,
            RXMetadata=FakeTxMetadata,
            TXAsyncMetadata=FakeTxMetadata,
            TXMetadataEventCode=types.SimpleNamespace(
                underflow=1, time_error=2),
            TuneRequest=FakeTuneRequest,
            StreamCMD=FakeStreamCmd,
            StreamMode=types.SimpleNamespace(num_done="num_done"),
        ),
    )
    return mod, usrp_holder


def make_device(**conf_kw):
    clock = FakeClock()
    fake_uhd, holder = make_fake_uhd(clock)
    conf = UhdConfig(sample_rate=2_048_000, frequency=222_064_000,
                     **conf_kw)
    dev = UhdDevice(conf, uhd_module=fake_uhd,
                    time_fn=clock.time, sleep_fn=clock.sleep)
    return dev, holder["usrp"], clock


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_uhd_device_setup():
    dev, usrp, _ = make_device(refclk_src="external", pps_src="external",
                               txgain=30.0)
    assert usrp.clock_source == "external"
    assert usrp.time_source == "external"
    assert usrp.tx_rate == 2_048_000
    assert dev.frequency == 222_064_000
    assert dev.get_txgain() == 30.0
    # external PPS: USRP time was set at a PPS edge
    assert usrp.time_sets and usrp.time_sets[0][0] == "pps"
    dev.close()


def test_uhd_timed_send_chunks_and_advancing_timespec():
    dev, usrp, _ = make_device(enable_sync=True)
    n = 2500                      # 3 chunks at max_samps=1000
    samples = np.ones((n, 2), np.float32)
    ts = FrameTimestamp(valid=True, seconds=5000, pps=8_192_000)  # +0.5 s
    dev.transmit_frame(samples, ts)
    sends = usrp.tx_stream.sends
    assert [s[0] for s in sends] == [1000, 1000, 500]
    assert all(s[1] for s in sends)               # has_time_spec on all
    t0 = 5000.5
    dt = 1000 / 2_048_000
    np.testing.assert_allclose([s[2] for s in sends],
                               [t0, t0 + dt, t0 + 2 * dt], rtol=0, atol=1e-9)
    assert not any(s[3] for s in sends)           # no EOB without refresh
    dev.close()


def test_uhd_eob_after_timestamp_refresh():
    dev, usrp, _ = make_device(enable_sync=True)
    ts = FrameTimestamp(valid=True, seconds=5000, pps=0)
    dev.require_timestamp_refresh()
    dev.transmit_frame(np.ones((800, 2), np.float32), ts)  # single packet
    assert usrp.tx_stream.sends[-1][3] is True             # EOB set
    dev.transmit_frame(np.ones((800, 2), np.float32), ts)
    assert usrp.tx_stream.sends[-1][3] is False
    dev.close()


def test_uhd_unsync_send_has_no_timespec():
    dev, usrp, _ = make_device(enable_sync=False)
    dev.transmit_frame(np.ones((100, 2), np.float32), None)
    assert usrp.tx_stream.sends == [(100, False, None, False)]
    dev.close()


def test_uhd_receive_frame_timed():
    dev, usrp, _ = make_device()
    ts = FrameTimestamp(valid=True, seconds=123, pps=0)
    rx, rx_ts = dev.receive_frame(64, ts)
    assert rx.shape == (64, 2)
    cmd = usrp.rx_stream.cmds[-1]
    assert cmd.num_samps == 64 and cmd.stream_now is False
    assert cmd.time_spec.get_real_secs() == 123.0
    assert rx_ts.seconds == 123
    dev.close()


def test_refclk_lock_lost_crash_behaviour():
    dev, usrp, _ = make_device(refclk_src="external", pps_src="none",
                               refclk_lock_loss_behaviour="crash")
    assert dev.is_clk_source_ok()
    usrp.sensors["ref_locked"] = FakeSensor(False)
    with pytest.raises(RefclkLockLost):
        dev.is_clk_source_ok()
    dev.close()


def test_refclk_lock_lost_ignore_behaviour():
    dev, usrp, _ = make_device(refclk_src="external", pps_src="none",
                               refclk_lock_loss_behaviour="ignore")
    usrp.sensors["ref_locked"] = FakeSensor(False)
    assert dev.is_clk_source_ok() is False
    dev.close()


def test_gpsdo_bootup_gates_until_fix():
    """Without a GPS fix the clock source is not ok (TX muted); once the
    fix arrives the device time is set and TX unblocks."""
    clock = FakeClock()
    fake_uhd, holder = make_fake_uhd(clock)
    conf = UhdConfig(refclk_src="gpsdo-ettus", pps_src="gpsdo",
                     max_gps_holdover_time=30.0)
    # not locked at startup
    pre = FakeUsrp(clock)
    holder["usrp"] = pre

    def multi(args):
        pre.sensors["gps_locked"] = FakeSensor(False)
        return pre
    fake_uhd.usrp.MultiUSRP = multi
    dev = UhdDevice(conf, uhd_module=fake_uhd,
                    time_fn=clock.time, sleep_fn=clock.sleep)
    ut = dev.device_time
    assert ut.gps_state == UsrpTime.BOOTUP
    assert dev.is_clk_source_ok() is False
    assert ut.get_gnss_stats()["holdover"] is True
    # fix arrives
    pre.sensors["gps_locked"] = FakeSensor(True)
    clock.sleep(GPS_FIX_CHECK_INTERVAL)
    assert dev.is_clk_source_ok() is True
    assert ut.gps_state == UsrpTime.MONITOR
    assert any(kind == "pps" for kind, _ in pre.time_sets)
    assert ut.get_gnss_stats()["holdover"] is False
    dev.close()


def test_gpsdo_holdover_then_fix_lost():
    """In MONITOR, losing the fix keeps TX running through the holdover
    window, then raises GpsFixLost (ref: USRPTime.cpp:121-127)."""
    dev, usrp, clock = make_device(
        refclk_src="gpsdo-ettus", pps_src="gpsdo",
        max_gps_holdover_time=25.0)
    ut = dev.device_time
    assert ut.gps_state == UsrpTime.MONITOR      # locked at startup
    assert dev.is_clk_source_ok()
    usrp.sensors["gps_locked"] = FakeSensor(False)
    # each check is GPS_FIX_CHECK_INTERVAL apart; holdover 25 s = 2 checks ok
    for _ in range(2):
        clock.sleep(GPS_FIX_CHECK_INTERVAL)
        assert dev.is_clk_source_ok() is True    # holdover: still ok
    clock.sleep(GPS_FIX_CHECK_INTERVAL)
    with pytest.raises(GpsFixLost):
        dev.is_clk_source_ok()
    dev.close()


def test_gpsdo_fix_recovers_in_holdover():
    dev, usrp, clock = make_device(
        refclk_src="gpsdo-ettus", pps_src="gpsdo",
        max_gps_holdover_time=100.0)
    usrp.sensors["gps_locked"] = FakeSensor(False)
    clock.sleep(GPS_FIX_CHECK_INTERVAL)
    assert dev.is_clk_source_ok()                # holdover
    assert dev.device_time.num_checks_without_fix == 1
    usrp.sensors["gps_locked"] = FakeSensor(True)
    clock.sleep(GPS_FIX_CHECK_INTERVAL)
    assert dev.is_clk_source_ok()
    assert dev.device_time.num_checks_without_fix == 0
    dev.close()


def test_sdr_output_mute_no_timestamps():
    """sync + mute_no_timestamps: frames without a valid timestamp are
    muted, frames with one go out (ref: src/output/SDR.cpp:264-268)."""
    from dabmod_tpu.io.sdr import LoopbackSdrDevice, SdrOutput
    out = SdrOutput(LoopbackSdrDevice(), sync=True, mute_no_timestamps=True)
    frame = np.ones((100, 2), np.float32)
    out.write(frame, FrameTimestamp(valid=False))
    good = FrameTimestamp(valid=True, seconds=int(time.time()) + 2, pps=0)
    out.write(frame, good)
    t0 = time.time()
    while (out.muted, out.frames) != (1, 1) and time.time() - t0 < 5:
        time.sleep(0.02)
    assert (out.muted, out.frames) == (1, 1)
    out.close()


def test_sdr_output_clk_gating_and_fault():
    """A device whose clock source is not ok gets its frames muted; a
    GpsFixLost escalates to a device-thread fault."""
    from dabmod_tpu.io.sdr import LoopbackSdrDevice, SdrOutput

    class GatedDevice(LoopbackSdrDevice):
        ok = False
        crash = False

        def is_clk_source_ok(self):
            if self.crash:
                raise GpsFixLost("lost GPS fix for 40 seconds")
            return self.ok

    dev = GatedDevice()
    out = SdrOutput(dev, sync=False)
    frame = np.ones((10, 2), np.float32)
    out.write(frame)
    t0 = time.time()
    while out.muted != 1 and time.time() - t0 < 5:
        time.sleep(0.02)
    assert out.muted == 1 and out.frames == 0
    dev.ok = True
    out.write(frame)
    t0 = time.time()
    while out.frames != 1 and time.time() - t0 < 5:
        time.sleep(0.02)
    assert out.frames == 1
    dev.crash = True
    out.write(frame)
    t0 = time.time()
    while out.fault is None and time.time() - t0 < 5:
        time.sleep(0.02)
    assert isinstance(out.fault, GpsFixLost)
    out._thread.join(timeout=2)


def test_gpsdo_stats_flow_to_rc(tmp_path, monkeypatch):
    """GPSDO SVs/holdover/state and the hardware clock must be enrolled as
    RC parameters on the sdr module (ref: src/output/UHD.cpp:377-393 and the
    munin graphs in doc/stats_dabmod_munin.py:16-40)."""
    from dabmod_tpu import runtime as rt_mod
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import synth_eti_batch
    from dabmod_tpu.io.sdr import SdrOutput
    from dabmod_tpu.rc import rcs

    dev, usrp, clock = make_device(refclk_src="gpsdo", pps_src="gpsdo",
                                   max_gps_holdover_time=30.0)
    # LEA-M8F style sensors: TIME LOCKED + a GNGGA sentence with 7 SVs
    usrp.sensors["gps_timelock"] = FakeSensor("TIME LOCKED")
    usrp.sensors["gps_gngga"] = FakeSensor(
        "$GNGGA,120000.00,4717.11,N,00833.91,E,1,07,1.0,430.0,M,48.0,M,,")
    assert dev.is_clk_source_ok()

    out = SdrOutput(dev, sync=False, sample_rate=2_048_000)
    monkeypatch.setattr(rt_mod, "open_output", lambda s: out)
    inp = tmp_path / "in.eti"
    inp.write_bytes(synth_eti_batch(4, mode=1).tobytes())
    s = ModSettings(input_name=str(inp), output="uhd", output_name="",
                    batch_tf=1)
    rt = rt_mod.ModRuntime(s)
    try:
        assert rcs.get_param("sdr", "gpsdo_num_sv") == "7"
        assert rcs.get_param("sdr", "gpsdo_holdover") == "0"
        assert rcs.get_param("sdr", "gps_state") == "monitor_fix"
        assert float(rcs.get_param("sdr", "device_time")) > 0
        # holdover flips when the fix is lost
        usrp.sensors["gps_timelock"] = FakeSensor("TIME UNLOCKED")
        clock.sleep(GPS_FIX_CHECK_INTERVAL)
        dev.is_clk_source_ok()
        assert rcs.get_param("sdr", "gpsdo_holdover") == "1"
    finally:
        out._running = False
        out._thread.join(timeout=2)
        rt._out_queue.put(None)
