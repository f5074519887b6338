"""SoapySDR driver tests against a mock SoapySDR module.

The mock mirrors the SoapySDR Python API surface the driver uses
(Device, setupStream/activateStream/writeStream/readStream/deactivateStream,
StreamResult), so the full driver -- MTU-chunked timed bursts with timeNs
advance, EOB-deactivate semantics, underflow/overflow/timeout counters and
the timed RX feedback path (ref: src/output/Soapy.cpp:276-368) -- runs
without hardware.
"""
import types

import numpy as np
import pytest

from dabmod_tpu.io.soapy_driver import (SOAPY_SDR_OVERFLOW,
                                        SOAPY_SDR_TIMEOUT,
                                        SOAPY_SDR_UNDERFLOW, SoapyConfig,
                                        SoapyDevice)
from dabmod_tpu.timestamps import FrameTimestamp


class StreamResult:
    def __init__(self, ret, time_ns=0):
        self.ret = ret
        self.flags = 0
        self.timeNs = time_ns


class FakeSoapyDevice:
    def __init__(self, args):
        self.args = args
        self.rates = {}
        self.gains = {}
        self.freqs = {}
        self.antennas = {}
        self.bandwidths = {}
        self.master_clock_rate = 0.0
        self.hardware_time_ns = 5_000_000_000
        self.mtu = 1000
        self.writes = []                 # (n, flags, timeNs)
        self.activations = []            # (stream, flags, timeNs, numElems)
        self.deactivations = []
        self.write_script = []           # forced returns before success
        self.rx_data = None
        self.rx_time_ns = 0

    # -- identity / config ------------------------------------------------
    def getDriverKey(self):
        return "fake"

    def getHardwareKey(self):
        return "fakehw"

    def setMasterClockRate(self, r):
        self.master_clock_rate = r

    def getMasterClockRate(self):
        return self.master_clock_rate

    def setSampleRate(self, d, ch, r):
        self.rates[d] = r

    def getSampleRate(self, d, ch):
        return self.rates.get(d, 0)

    def setFrequency(self, d, ch, f, args=None):
        self.freqs[d] = (f, dict(args or {}))

    def getFrequency(self, d, ch):
        return self.freqs.get(d, (0.0, {}))[0]

    def setBandwidth(self, d, ch, b):
        self.bandwidths[d] = b

    def setGain(self, d, ch, g):
        self.gains[d] = g

    def getGain(self, d, ch):
        return self.gains.get(d, 0.0)

    def setAntenna(self, d, ch, a):
        self.antennas[d] = a

    def hasHardwareTime(self):
        return True

    def setHardwareTime(self, ns):
        self.hardware_time_ns = ns

    def getHardwareTime(self):
        return self.hardware_time_ns

    # -- streams ------------------------------------------------------------
    def setupStream(self, d, fmt, channels):
        return ("stream", d)

    def getStreamMTU(self, stream):
        return self.mtu

    def activateStream(self, stream, flags=0, timeNs=0, numElems=0):
        self.activations.append((stream, flags, timeNs, numElems))
        if stream == ("stream", 1):      # timed RX burst starts here
            self.rx_time_ns = timeNs
        return 0

    def deactivateStream(self, stream):
        self.deactivations.append(stream)
        return 0

    def closeStream(self, stream):
        pass

    def writeStream(self, stream, buffs, numElems, flags, timeNs):
        if self.write_script:
            forced = self.write_script.pop(0)
            return StreamResult(forced, timeNs)
        self.writes.append((numElems, flags, timeNs))
        return StreamResult(numElems, timeNs)

    def readStream(self, stream, buffs, numElems, flags=0,
                   timeoutUs=100_000):
        # real pylibsoapysdr surface: timeNs is an OUT field on the
        # result, not an input (the driver must NOT pass it here)
        data = self.rx_data if self.rx_data is not None \
            else np.arange(numElems, dtype=np.complex64)
        buffs[0][:len(data)] = data[:numElems]
        return StreamResult(min(len(data), numElems),
                            self.rx_time_ns + 777)


def make_mock():
    mod = types.ModuleType("SoapySDR")
    mod.SOAPY_SDR_TX = 0
    mod.SOAPY_SDR_RX = 1
    mod.SOAPY_SDR_CF32 = "CF32"
    mod.Device = FakeSoapyDevice
    return mod


def make_device(**conf_kw):
    conf = SoapyConfig(device_args="driver=fake", sample_rate=2_048_000,
                       frequency=222_064_000.0, txgain=30.0, rxgain=10.0,
                       **conf_kw)
    mock = make_mock()
    dev = SoapyDevice(conf, soapy_module=mock, time_fn=lambda: 123.0)
    return dev, dev.dev


def test_constructor_configures_device():
    dev, fake = make_device(master_clock_rate=32_768_000.0,
                            bandwidth=1_750_000.0, tx_antenna="BAND2",
                            rx_antenna="LNAL")
    assert fake.master_clock_rate == 32_768_000.0
    assert fake.rates == {0: 2_048_000, 1: 2_048_000}
    assert fake.gains == {0: 30.0, 1: 10.0}
    assert fake.antennas == {0: "BAND2", 1: "LNAL"}
    assert fake.bandwidths == {0: 1_750_000.0, 1: 1_750_000.0}
    assert dev.frequency == 222_064_000.0
    # hardware clock seeded from system time (Soapy.cpp:112-117)
    assert fake.hardware_time_ns == int(123.0 * 1e9)
    assert dev.get_real_secs() == 123.0


def test_tune_passes_lo_offset_arg():
    dev, fake = make_device()
    dev.tune(10_000.0, 220_352_000.0)
    f, args = fake.freqs[0]
    assert f == 220_352_000.0
    assert args == {"OFFSET": "10000.0"}


def test_transmit_unsynchronised_chunks_at_mtu():
    dev, fake = make_device()
    samples = np.zeros((2500, 2), np.float32)
    dev.transmit_frame(samples, None)
    # activated once without HAS_TIME, then 1000+1000+500
    assert fake.activations == [(("stream", 0), 0, 0, 0)]
    assert [w[0] for w in fake.writes] == [1000, 1000, 500]
    assert dev.num_frames_modulated == 1
    # stream stays active across frames (no EOB)
    dev.transmit_frame(samples, None)
    assert len(fake.activations) == 1


def test_transmit_timed_burst_advances_time_ns():
    dev, fake = make_device(enable_sync=True)
    ts = FrameTimestamp(valid=True, seconds=100, pps=8_192_000)  # +0.5 s
    dev.transmit_frame(np.zeros((2048, 2), np.float32), ts)
    from dabmod_tpu.io.soapy_driver import SOAPY_SDR_HAS_TIME
    (stream, flags, t0, _), = fake.activations
    assert flags == SOAPY_SDR_HAS_TIME
    assert t0 == int(100.5 * 1e9)
    # second chunk timeNs advanced by 1000 samples @ 2.048 MS/s
    assert fake.writes[0][2] == t0
    assert fake.writes[1][2] == t0 + int(1e9 * 1000 / 2_048_000)


def test_timestamp_refresh_deactivates_stream():
    dev, fake = make_device(enable_sync=True)
    ts = FrameTimestamp(valid=True, seconds=100, pps=0)
    dev.transmit_frame(np.zeros((500, 2), np.float32), ts)
    assert not fake.deactivations
    dev.require_timestamp_refresh()
    dev.transmit_frame(np.zeros((500, 2), np.float32), ts)
    # EOB -> deactivate, next frame re-activates with fresh time
    assert len(fake.deactivations) == 1
    dev.transmit_frame(np.zeros((500, 2), np.float32), ts)
    assert len(fake.activations) == 2


def test_muting_sends_eob_and_stops():
    dev, fake = make_device()
    dev.muting = True
    dev.transmit_frame(np.zeros((2500, 2), np.float32), None)
    # only the first MTU chunk goes out, then EOB-deactivate + break
    assert [w[0] for w in fake.writes] == [1000]
    assert len(fake.deactivations) == 1


def test_flow_error_counters():
    dev, fake = make_device()
    fake.write_script = [SOAPY_SDR_TIMEOUT, SOAPY_SDR_OVERFLOW,
                         SOAPY_SDR_UNDERFLOW]
    dev.transmit_frame(np.zeros((800, 2), np.float32), None)
    assert (dev.timeouts, dev.overflows, dev.underflows) == (1, 1, 1)
    assert [w[0] for w in fake.writes] == [800]   # retried until success
    stats = dev.get_run_statistics()
    assert stats["timeouts"] == 1 and stats["underruns"] == 1


def test_stream_error_raises():
    dev, fake = make_device()
    fake.write_script = [-2]          # SOAPY_SDR_STREAM_ERROR
    with pytest.raises(RuntimeError, match="stream error"):
        dev.transmit_frame(np.zeros((100, 2), np.float32), None)


def test_receive_frame_timed_burst():
    dev, fake = make_device()
    ts = FrameTimestamp(valid=True, seconds=50, pps=0)
    rx, rx_ts = dev.receive_frame(256, ts)
    # RX stream activated with the burst length and timed start
    (stream, flags, t_ns, n), = [a for a in fake.activations
                                 if a[0] == ("stream", 1)]
    assert n == 256 and t_ns == int(50 * 1e9)
    assert rx.shape == (256, 2)
    assert ("stream", 1) in fake.deactivations
    assert rx_ts.valid and rx_ts.seconds == 50


def test_open_sdr_output_constructs_soapy(monkeypatch):
    """open_sdr_output('soapy') builds the driver from settings."""
    import sys
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.io import sdr as sdr_mod
    from dabmod_tpu.io.outputs import open_sdr_output
    monkeypatch.setitem(sys.modules, "SoapySDR", make_mock())
    monkeypatch.setattr(sdr_mod, "SoapyDevice", SoapyDevice)
    s = ModSettings(output="soapy", sdr_frequency=222_064_000.0,
                    sdr_txgain=25.0, output_rate=2_048_000)
    out = open_sdr_output(s)
    try:
        assert isinstance(out.device, SoapyDevice)
        assert out.device.txgain == 25.0
    finally:
        out.close()
