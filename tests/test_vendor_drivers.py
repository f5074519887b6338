"""Mock-injected tests for the Lime, BladeRF and Dexter SDR drivers.

Each driver is exercised against a scripted fake of its vendor API, the
same approach as tests/test_uhd_driver.py and tests/test_soapy_driver.py.
Reference behaviours under test:
  - Lime:    src/output/Lime.cpp:92-451
  - BladeRF: src/output/BladeRF.cpp:49-314
  - Dexter:  src/output/Dexter.cpp:69-699
"""
import numpy as np
import pytest

from dabmod_tpu.io.bladerf_driver import BladeRFConfig, BladeRFDevice
from dabmod_tpu.io.dexter_driver import (DSP_CLOCK, IIO_BUFFERS,
                                         STATE_HOLDOVER, STATE_NORMAL,
                                         STATE_STARTUP,
                                         TRANSMISSION_FRAME_LEN_SAMPS,
                                         DexterConfig, DexterDevice)
from dabmod_tpu.io.lime_driver import (GFIR3_COEFF_INTERP1, LimeConfig,
                                       LimeDevice)
from dabmod_tpu.timestamps import FrameTimestamp


# --------------------------------------------------------------------- Lime
class MockLms:
    LMS_CH_TX = 1
    LMS_CLOCK_CGEN = 3
    LMS_PATH_TX2 = 2
    LMS_GFIR3 = 2

    def __init__(self):
        self.calls = []
        self.gain = 0.0
        self.freq = 0.0
        self.clock_freq = 0.0
        self.sample_rate = 0.0
        self.lpfbw = 0.0
        self.sent = []
        self.stream_status = {"underrun": 0, "overrun": 0,
                              "dropped_packets": 0, "fifo_filled_count": 0,
                              "fifo_size": 1}
        self.streaming = False

    def _rec(self, name, *a):
        self.calls.append((name,) + a)

    def open(self, args):
        self._rec("open", args)

    def reset(self):
        self._rec("reset")

    def init(self):
        self._rec("init")

    def enable_channel(self, d, ch, en):
        self._rec("enable_channel", d, ch, en)

    def set_clock_freq(self, which, rate):
        self.clock_freq = rate

    def get_clock_freq(self, which):
        return self.clock_freq

    def set_sample_rate(self, rate, oversample):
        self.sample_rate = rate

    def get_sample_rate(self, d, ch):
        return self.sample_rate

    def set_lo_frequency(self, d, ch, f):
        self.freq = f

    def get_lo_frequency(self, d, ch):
        return self.freq

    def set_normalized_gain(self, d, ch, g):
        self.gain = g

    def get_normalized_gain(self, d, ch):
        return self.gain

    def set_antenna(self, d, ch, path):
        self._rec("set_antenna", path)

    def calibrate(self, d, ch, bw, flags):
        self._rec("calibrate", bw)

    def set_gfir_coeff(self, d, ch, gfir, coeff):
        self._rec("set_gfir_coeff", gfir, np.asarray(coeff).shape[0])

    def enable_gfir(self, d, ch, gfir, en):
        self._rec("enable_gfir", gfir, en)

    def setup_stream(self, **kw):
        self._rec("setup_stream", kw["fifo_size"], kw["data_fmt"])
        return "stream0"

    def start_stream(self, s):
        self.streaming = True

    def stop_stream(self, s):
        self.streaming = False

    def destroy_stream(self, s):
        self._rec("destroy_stream")

    def send_stream(self, s, buf, n, timeout_ms):
        self.sent.append(np.array(buf))
        return n

    def get_stream_status(self, s):
        return dict(self.stream_status)

    def set_lpfbw(self, d, ch, bw):
        self.lpfbw = bw

    def get_lpfbw(self, d, ch):
        return self.lpfbw

    def get_chip_temperature(self, idx):
        return 41.5

    def close(self):
        self._rec("close")


def make_lime(**kw):
    lms = MockLms()
    conf = LimeConfig(sample_rate=2_048_000, frequency=222_064_000,
                      txgain=70.0, **kw)
    return LimeDevice(conf, lms=lms), lms


def test_lime_construction_sequence():
    dev, lms = make_lime(master_clock_rate=122.88e6)
    names = [c[0] for c in lms.calls]
    assert names[:3] == ["open", "reset", "init"]
    assert ("enable_channel", lms.LMS_CH_TX, 0, True) in lms.calls
    # 61-tap GFIR3 upload + enable (ref: src/output/Lime.cpp:206-244)
    assert ("set_gfir_coeff", lms.LMS_GFIR3, 61) in lms.calls
    assert ("enable_gfir", lms.LMS_GFIR3, True) in lms.calls
    assert GFIR3_COEFF_INTERP1.shape == (61,)
    # 10-TF FIFO in I16 (ref: src/output/Lime.cpp:229-243)
    assert ("setup_stream", 196_608 * 10, "i16") in lms.calls
    assert lms.streaming
    assert lms.clock_freq == 122.88e6
    # normalised gain (ref: src/output/Lime.cpp:181-186)
    assert lms.gain == pytest.approx(0.70)
    assert dev.frequency == 222_064_000


def test_lime_txgain_normalised_roundtrip():
    dev, lms = make_lime()
    dev.set_txgain(55.0)
    assert lms.gain == pytest.approx(0.55)
    assert dev.get_txgain() == pytest.approx(55.0)


def test_lime_float_to_s16_conversion_and_send():
    dev, lms = make_lime()
    samples = np.array([[0.5, -0.5], [2.0, -2.0], [0.25, 1.0]], np.float32)
    dev.transmit_frame(samples, None)
    sent = lms.sent[0]
    # clamp +-1 then scale 32767 with round-half-away-from-zero
    # (ref: src/output/Lime.cpp:57-90)
    np.testing.assert_array_equal(
        sent, np.array([16384, -16384, 32767, -32767, 8192, 32767],
                       np.int16))
    assert dev.num_frames_modulated == 1


def test_lime_stream_status_accumulates():
    dev, lms = make_lime()
    lms.stream_status.update(underrun=2, overrun=1, dropped_packets=3,
                             fifo_filled_count=50, fifo_size=200)
    dev.transmit_frame(np.zeros((16, 2), np.float32), None)
    lms.stream_status.update(underrun=1)
    dev.transmit_frame(np.zeros((16, 2), np.float32), None)
    stats = dev.get_run_statistics()
    assert stats["underruns"] == 3
    assert stats["overruns"] == 2
    assert stats["dropped_packets"] == 6
    assert stats["frames"] == 2
    assert stats["fifo_fill"] == pytest.approx(25.0)


def test_lime_close_teardown_order():
    dev, lms = make_lime()
    lms.calls.clear()
    dev.close()
    assert not lms.streaming
    assert lms.calls[-2:] == [
        ("enable_channel", lms.LMS_CH_TX, 0, False), ("close",)]


# ------------------------------------------------------------------ BladeRF
class MockBladeRFChannel:
    """Property-based channel object, like bladerf._bladerf.Channel."""

    def __init__(self):
        self.sample_rate = 0
        self.frequency = 0
        self.gain = 0
        self.bandwidth = 0
        self.enable = False


class MockBladeRFDev:
    def __init__(self):
        self.calls = []
        self.channels = {}
        self.tamer_mode = None
        self.tx = []

    def Channel(self, layout):     # noqa: N802  (mirrors the bladerf API)
        return self.channels.setdefault(layout, MockBladeRFChannel())

    def set_vctcxo_tamer_mode(self, mode):
        self.tamer_mode = mode

    def sync_config(self, layout, fmt, num_buffers, buffer_size,
                    num_transfers, stream_timeout):
        self.calls.append(("sync_config", layout, fmt, num_buffers,
                           buffer_size, num_transfers, stream_timeout))

    def sync_tx(self, buf, n):
        self.tx.append(np.array(buf))

    def get_rfic_temperature(self):
        return 55.0

    def close(self):
        self.calls.append(("close",))


class MockBladeRFModule:
    class ChannelLayout:
        TX_X1 = "tx_x1"

    class Format:
        SC16_Q11 = "sc16_q11"

    def __init__(self):
        self.dev = MockBladeRFDev()

    @staticmethod
    def CHANNEL_TX(ch):    # noqa: N802  (mirrors the bladerf API)
        return ("tx", ch)

    def BladeRF(self, *args):      # noqa: N802
        return self.dev


def make_bladerf(**kw):
    mod = MockBladeRFModule()
    conf = BladeRFConfig(sample_rate=2_048_000, frequency=222_064_000,
                         txgain=30.0, bandwidth=1_750_000, **kw)
    return BladeRFDevice(conf, bladerf_module=mod), mod.dev


def test_bladerf_construction():
    dev, brf = make_bladerf(refclk_src="pps")
    ch = brf.channels[("tx", 0)]
    assert brf.tamer_mode == "1pps"     # ref: src/output/BladeRF.cpp:66-74
    assert ch.sample_rate == 2_048_000
    assert ch.gain == 30
    assert ch.bandwidth == 1_750_000
    assert ch.enable is True
    # SC16 Q11 sync interface (ref: src/output/BladeRF.cpp:128-141)
    assert ("sync_config", "tx_x1", "sc16_q11", 16, 8192, 8, 3500) \
        in brf.calls


def test_bladerf_refclk_10mhz():
    dev, brf = make_bladerf(refclk_src="10mhz")
    assert brf.tamer_mode == "10mhz"


def test_bladerf_lo_offset_forced_to_zero():
    dev, brf = make_bladerf(lo_offset=10_000.0)
    # ref: src/output/BladeRF.cpp:162-180
    assert dev.lo_offset == 0.0
    assert dev.conf.lo_offset == 0.0
    assert brf.channels[("tx", 0)].frequency == 222_064_000


def test_bladerf_transmit_sc16_q11():
    dev, brf = make_bladerf()
    samples = np.array([[100.4, -100.4], [5000.0, -5000.0]], np.float32)
    dev.transmit_frame(samples, None)
    np.testing.assert_array_equal(
        brf.tx[0], np.array([100, -100, 2047, -2048], np.int16))
    assert dev.get_run_statistics() == {"frames": 1}


def test_bladerf_gain_and_temperature():
    dev, brf = make_bladerf()
    dev.set_txgain(12.0)
    assert dev.get_txgain() == 12.0
    assert dev.get_temperature() == 55.0


# ------------------------------------------------------------------- Dexter
class FakeClock:
    def __init__(self, t0=1000.0):
        self.t = t0

    def time(self):
        return self.t

    def sleep(self, dt):
        self.t += dt


class MockIioAttr:
    def __init__(self, value="0", read_fn=None):
        self._value = str(value)
        self._read_fn = read_fn
        self.writes = []

    @property
    def value(self):
        if self._read_fn is not None:
            return str(self._read_fn())
        return self._value

    @value.setter
    def value(self, v):
        self._value = str(v)
        self.writes.append(str(v))


class MockIioChannel:
    def __init__(self):
        self.enabled = False


class MockIioDevice:
    def __init__(self, attrs, n_channels=0):
        self.attrs = attrs
        self.channels = [MockIioChannel() for _ in range(n_channels)]


class MockIioBuffer:
    def __init__(self, device, n):
        self.n = n
        self.pushed = []
        self._pending = None
        self.fail_push = False

    def write(self, data):
        self._pending = bytes(data)

    def push(self):
        if self.fail_push:
            raise OSError("iio push failed")
        self.pushed.append(self._pending)


class MockIioModule:
    def __init__(self, clock):
        self.clock = clock
        dsp_attrs = {
            "dc0": MockIioAttr(), "dc1": MockIioAttr(),
            "gain0": MockIioAttr(),
            "frequency0": MockIioAttr(),
            "stream0_flush_fifo_trigger": MockIioAttr(),
            "stream0_start_clks": MockIioAttr(),
            "gpsdo_locked": MockIioAttr("0"),
            "pps_loss_of_signal": MockIioAttr("0"),
            "buffer_underflows0": MockIioAttr("0"),
            # the PPS counter latches a whole DSP_CLOCK per UTC second
            "pps_clks": MockIioAttr(
                read_fn=lambda: int(clock.time()) * DSP_CLOCK),
            "clks": MockIioAttr(
                read_fn=lambda: int(clock.time() * DSP_CLOCK)),
        }
        self.dsp = MockIioDevice(dsp_attrs)
        self.ad9957 = MockIioDevice({"center_frequency": MockIioAttr()})
        self.ad9957_tx0 = MockIioDevice({}, n_channels=1)
        self.buffers = []
        mod = self

        class Context:
            def find_device(self, name):
                return {"dexter_dsp_tx": mod.dsp, "ad9957": mod.ad9957,
                        "ad9957_tx0": mod.ad9957_tx0}.get(name)

        class Buffer(MockIioBuffer):
            def __init__(self, device, n):
                super().__init__(device, n)
                mod.buffers.append(self)

        self.Context = Context
        self.Buffer = Buffer


def make_dexter(**kw):
    clock = FakeClock()
    mod = MockIioModule(clock)
    conf = DexterConfig(frequency=222_064_000, lo_offset=64_000,
                        txgain=60.0, **kw)
    dev = DexterDevice(conf, iio_module=mod, time_fn=clock.time,
                       sleep_fn=clock.sleep, underflow_poll=False)
    return dev, mod, clock


def test_dexter_rejects_non_native_rate():
    clock = FakeClock()
    mod = MockIioModule(clock)
    with pytest.raises(RuntimeError, match="2048000"):
        DexterDevice(DexterConfig(sample_rate=4_096_000), iio_module=mod,
                     time_fn=clock.time, sleep_fn=clock.sleep,
                     underflow_poll=False)


def test_dexter_construction():
    dev, mod, clock = make_dexter()
    a = mod.dsp.attrs
    assert a["dc0"].value == "0" and a["dc1"].value == "0"
    assert a["stream0_flush_fifo_trigger"].writes == ["1"]
    assert a["stream0_start_clks"].writes[0] == "0"
    # LO split: carrier - lo_offset to the ad9957, lo_offset to the DSP NCO
    # (ref: src/output/Dexter.cpp:358-376)
    assert mod.ad9957.attrs["center_frequency"].value == "222000000"
    assert a["frequency0"].value == "64000"
    assert dev.get_tx_freq() == 222_064_000
    # TX channel enabled before the buffer exists (Dexter.cpp:145-151)
    assert mod.ad9957_tx0.channels[0].enabled
    # one zero flush buffer pushed, then gain raised (Dexter.cpp:158-174)
    assert len(mod.buffers[0].pushed) == 1
    assert set(mod.buffers[0].pushed[0]) == {0}
    assert a["gain0"].writes[-1] == "60"


def test_dexter_clock_state_machine():
    dev, mod, clock = make_dexter(enable_sync=True,
                                  max_gps_holdover_time=30.0)
    # no GPSDO lock: stays in startup, gates transmission
    assert dev.is_clk_source_ok() is False
    assert dev.clock_state == STATE_STARTUP
    # lock acquired: PPS alignment sequence runs and validates DSP_CLOCK
    # increment per second (ref: src/output/Dexter.cpp:258-314)
    mod.dsp.attrs["gpsdo_locked"].value = "1"
    assert dev.is_clk_source_ok() is True
    assert dev.clock_state == STATE_NORMAL
    assert dev._clock_count_at_startup == \
        int(clock.time()) * DSP_CLOCK
    # get_real_secs reconstructs UTC from the free-running counter
    assert dev.get_real_secs() == pytest.approx(clock.time(), abs=1e-3)
    # PPS loss: holdover
    mod.dsp.attrs["pps_loss_of_signal"].value = "1"
    assert dev.is_clk_source_ok() is True
    assert dev.clock_state == STATE_HOLDOVER
    stats = dev.get_run_statistics()
    assert stats["clock_state"] == "holdover"
    assert stats["remaining_holdover_s"] == 30
    # holdover expires: back to startup (ref: src/output/Dexter.cpp:333-354)
    clock.sleep(31.0)
    assert dev.is_clk_source_ok() is False
    assert dev.clock_state == STATE_STARTUP


def _locked_dexter(**kw):
    dev, mod, clock = make_dexter(enable_sync=True,
                                  max_gps_holdover_time=30.0, **kw)
    mod.dsp.attrs["gpsdo_locked"].value = "1"
    assert dev.is_clk_source_ok()
    return dev, mod, clock


def frame_samples():
    n = TRANSMISSION_FRAME_LEN_SAMPS // 2
    return np.full((n, 2), 100.0, np.float32)


def test_dexter_timed_transmit_start_clks():
    dev, mod, clock = _locked_dexter()
    t0 = int(clock.time())
    ts = FrameTimestamp(valid=True, seconds=t0 + 2, pps=16_384, fct=0)
    dev.transmit_frame(frame_samples(), ts)
    # start_clks = (sec - utc0)*DSP_CLOCK + count0 + pps*10
    # (ref: src/output/Dexter.cpp:552-558)
    expected = ((ts.seconds - dev._utc_seconds_at_startup) * DSP_CLOCK
                + dev._clock_count_at_startup + 16_384 * 10)
    assert mod.dsp.attrs["stream0_start_clks"].writes[-1] == str(expected)
    # frame went out via the two IIO buffers (ref: Dexter.cpp:606-622)
    data_buf = mod.buffers[0]
    assert len(data_buf.pushed) == 1 + IIO_BUFFERS
    assert dev.num_frames_modulated == 1
    assert dev._channel_is_up


def test_dexter_short_margin_skips_frame():
    dev, mod, clock = _locked_dexter()
    ts = FrameTimestamp(valid=True, seconds=int(clock.time()), pps=0, fct=0)
    dev.transmit_frame(frame_samples(), ts)       # margin < 0.2 s
    assert dev.num_late == 1
    assert dev.num_frames_modulated == 0
    assert not dev._channel_is_up


def test_dexter_invalid_frame_length_raises():
    dev, mod, clock = make_dexter()
    with pytest.raises(RuntimeError, match="invalid buffer size"):
        dev.transmit_frame(np.zeros((100, 2), np.float32), None)


def test_dexter_timestamp_refresh_downs_channel():
    dev, mod, clock = _locked_dexter()
    t0 = int(clock.time())
    ts = FrameTimestamp(valid=True, seconds=t0 + 2, pps=0, fct=0)
    dev.transmit_frame(frame_samples(), ts)
    assert dev._channel_is_up
    # underflow counter increments once the FIFO drains after channel_down
    base = [0]

    def underflows():
        return base[0]
    mod.dsp.attrs["buffer_underflows0"]._read_fn = underflows

    dev.require_timestamp_refresh()
    base[0] = 1     # scripted drain
    ts2 = FrameTimestamp(valid=True, seconds=t0 + 4, pps=0, fct=1)
    dev.transmit_frame(frame_samples(), ts2)
    # the refresh frame itself downs the channel (gain0 -> 0,
    # start_clks -> 0) and is dropped, exactly like the reference
    # (ref: src/output/Dexter.cpp:596-600)
    assert "0" in mod.dsp.attrs["gain0"].writes[-3:]
    assert not dev._channel_is_up
    assert dev.num_frames_modulated == 1
    # the next frame re-arms start_clks and transmits again
    ts3 = FrameTimestamp(valid=True, seconds=t0 + 6, pps=0, fct=2)
    dev.transmit_frame(frame_samples(), ts3)
    assert dev._channel_is_up
    assert dev.num_frames_modulated == 2
    expected = ((ts3.seconds - dev._utc_seconds_at_startup) * DSP_CLOCK
                + dev._clock_count_at_startup)
    assert mod.dsp.attrs["stream0_start_clks"].writes[-1] == str(expected)


def test_dexter_underflow_poll():
    dev, mod, clock = make_dexter()
    mod.dsp.attrs["buffer_underflows0"].value = "7"
    dev.poll_underflows_once()
    assert dev.get_run_statistics()["underruns"] == 7
