"""Real-time SDR output soak: SdrOutput against a 1x-rate device clock.

Models the reference's steady state (src/output/SDR.cpp:254-361): the device
clock advances exactly one sample period per transmitted sample (a timed
hardware send blocks until the burst's air time), the producer paces 96 ms
TM-I transmission frames with SFN timestamps, and after ~30 s of signal no
frame may have been dropped (timestamp in past), overflowed the queue, muted
or broken timestamp continuity.
"""
import threading
import time

import numpy as np
import pytest

from dabmod_tpu.io.sdr import SdrDevice, SdrOutput
from dabmod_tpu.timestamps import FrameTimestamp

SAMPLE_RATE = 2_048_000
TF_SAMPLES = 196_608                       # TM-I: 96 ms at 2.048 MS/s
TF_TICKS = TF_SAMPLES * 16_384_000 // SAMPLE_RATE


class SimClock:
    def __init__(self, t0: float = 1000.0):
        self.t = t0
        self.lock = threading.Lock()

    def now(self) -> float:
        with self.lock:
            return self.t

    def advance(self, dt: float):
        with self.lock:
            self.t += dt


class RealtimeSimDevice(SdrDevice):
    """Device whose clock advances with the samples it transmits -- the
    defining property of real SDR hardware doing timed sends."""

    def __init__(self, clock: SimClock):
        self.clock = clock
        self.tx_log = []                   # (n_samples, ts)

    def tune(self, lo_offset, frequency):
        pass

    def get_real_secs(self) -> float:
        return self.clock.now()

    def transmit_frame(self, samples, ts):
        n = int(np.asarray(samples).size // 2)
        self.tx_log.append((n, ts))
        # a timed send returns when the burst has been consumed at 1x
        self.clock.advance(n / SAMPLE_RATE)


def test_sdr_realtime_soak():
    clock = SimClock()
    dev = RealtimeSimDevice(clock)
    out = SdrOutput(dev, sync=True, sample_rate=SAMPLE_RATE)

    clock_start = clock.now()
    n_frames = 320                          # ~30.7 s of signal
    frame = np.zeros((TF_SAMPLES, 2), np.float32)   # shared payload
    t0 = clock.now() + 0.5                  # SFN margin ahead of the clock
    sec0, ticks0 = int(t0), int(round((t0 - int(t0)) * 16_384_000))

    deadline = time.monotonic() + 60
    for i in range(n_frames):
        ticks = ticks0 + i * TF_TICKS
        ts = FrameTimestamp(valid=True, seconds=sec0 + ticks // 16_384_000,
                            pps=ticks % 16_384_000, fct=(i * 4) % 250)
        # pace the producer so it keeps a bounded lookahead over the device
        # clock, like an ETI stream arriving at 24 ms cadence feeding the
        # 250-frame (~6 s buffer) sync queue
        while ts.as_seconds() - clock.now() > 5.0:
            assert time.monotonic() < deadline, "device clock stalled"
            time.sleep(0.001)
        out.write(frame, ts)

    # drain: wait until the device consumed everything
    while len(dev.tx_log) < n_frames:
        assert time.monotonic() < deadline, "device starved / frames stuck"
        time.sleep(0.005)
    out._running = False
    out._thread.join(timeout=5)

    assert out.fault is None
    assert len(dev.tx_log) == n_frames
    assert out.dropped == 0, "frames dropped with timestamp in the past"
    assert out.queue_overflows == 0
    assert out.muted == 0
    assert out.underruns == 0
    assert out.timestamp_discontinuities == 0
    assert out.frames == n_frames

    # per-TF timestamp monotony at exactly one TF per 96 ms
    times = [ts.as_seconds() for _, ts in dev.tx_log]
    deltas = np.diff(times)
    np.testing.assert_allclose(deltas, TF_SAMPLES / SAMPLE_RATE, atol=1e-9)
    # the device clock advanced by exactly the signal duration: 1x pacing
    assert abs((clock.now() - clock_start)
               - n_frames * TF_SAMPLES / SAMPLE_RATE) < 1e-6


def test_sdr_realtime_late_frame_dropped():
    """A frame whose timestamp is already in the past must be dropped, not
    transmitted (ref: src/output/SDR.cpp:332-340), and transmission resumes
    with the next frame."""
    clock = SimClock()
    dev = RealtimeSimDevice(clock)
    out = SdrOutput(dev, sync=True, sample_rate=SAMPLE_RATE)
    frame = np.zeros((TF_SAMPLES, 2), np.float32)

    late = FrameTimestamp(valid=True, seconds=int(clock.now()) - 10, pps=0)
    ok = FrameTimestamp(valid=True, seconds=int(clock.now()) + 1, pps=0)
    out.write(frame, late)
    out.write(frame, ok)
    deadline = time.monotonic() + 10
    while out.frames < 1:
        assert time.monotonic() < deadline
        time.sleep(0.005)
    out._running = False
    out._thread.join(timeout=5)
    assert out.dropped == 1
    assert out.frames == 1
    assert dev.tx_log[0][1].seconds == ok.seconds
