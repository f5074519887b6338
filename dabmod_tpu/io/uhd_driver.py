"""UHD (USRP) SDR driver with GPSDO clock discipline.

Port of the reference's Output::UHD (src/output/UHD.cpp:110-575) and
USRPTime (src/output/USRPTime.cpp:67-303) against the `uhd` Python API
(uhd.usrp.MultiUSRP).  The uhd module is injectable so the complete driver
-- timed sends with EOB handling, async underrun/late counters, the GPSDO
bootup/monitor/holdover state machine, and `behaviour_refclk_lock_lost` --
is testable without hardware (tests/test_uhd_driver.py provides a mock).
"""
from __future__ import annotations

import dataclasses
import logging
import threading
import time

import numpy as np

from ..timestamps import FrameTimestamp
from .sdr import SdrDevice

log = logging.getLogger("dabmod_tpu.uhd")

# GPSDO fix monitoring constants (ref: src/output/USRPTime.h)
GPS_FIX_CHECK_INTERVAL = 10.0      # seconds between GPS fix checks
INITIAL_GPS_FIX_WAIT = 180.0       # bootup window to obtain the first fix


@dataclasses.dataclass
class UhdConfig:
    """Subset of SDRDeviceConfig relevant to UHD
    (ref: src/output/SDRDevice.h:54-111)."""
    device_args: str = ""
    sample_rate: int = 2_048_000
    frequency: float = 0.0
    lo_offset: float = 0.0
    txgain: float = 0.0
    rxgain: float = 0.0
    bandwidth: float = 0.0
    master_clock_rate: float = 0.0
    refclk_src: str = "internal"       # internal|external|gpsdo|gpsdo-ettus
    pps_src: str = "none"              # none|pps|gpsdo|external
    subdevice: str = ""
    rx_antenna: str = ""
    enable_sync: bool = False
    refclk_lock_loss_behaviour: str = "ignore"   # ignore | crash
    max_gps_holdover_time: float = 0.0

    @classmethod
    def from_settings(cls, s):
        return cls(device_args=s.sdr_device_args,
                   sample_rate=s.output_rate,
                   frequency=s.sdr_frequency,
                   lo_offset=s.sdr_lo_offset,
                   txgain=s.sdr_txgain,
                   rxgain=s.sdr_rxgain,
                   bandwidth=s.sdr_bandwidth,
                   master_clock_rate=s.sdr_master_clock_rate,
                   refclk_src=s.sdr_refclk_src,
                   pps_src=s.sdr_pps_src,
                   subdevice=s.sdr_subdevice,
                   rx_antenna=s.sdr_rx_antenna,
                   enable_sync=s.tist_enabled,
                   refclk_lock_loss_behaviour=
                   s.sdr_behaviour_refclk_lock_lost,
                   max_gps_holdover_time=s.sdr_max_gps_holdover_time)


class RefclkLockLost(RuntimeError):
    """Raised when the external reference lock is lost and
    behaviour_refclk_lock_lost == crash (ref: src/output/UHD.cpp:439-462)."""


class GpsFixLost(RuntimeError):
    """Raised when the GPS fix is lost beyond the configured holdover
    window (ref: src/output/USRPTime.cpp:106-131)."""


class UsrpTime:
    """GPSDO/PPS time alignment state machine
    (ref: src/output/USRPTime.cpp:67-303).

    States: BOOTUP (waiting for a first GPS fix, TX gated off) and
    MONITOR (fix obtained, time set; losing the fix starts the holdover
    clock and crashes past max_gps_holdover_time)."""

    BOOTUP = "bootup"
    MONITOR = "monitor_fix"

    def __init__(self, usrp, conf: UhdConfig,
                 time_fn=time.time, sleep_fn=time.sleep, uhd_module=None):
        self.usrp = usrp
        self.conf = conf
        self._time = time_fn
        self._sleep = sleep_fn
        if uhd_module is None:
            import uhd as uhd_module  # noqa: PLC0415
        self._uhd = uhd_module
        self.gps_state = self.BOOTUP
        self.num_checks_without_fix = 0
        self.holdover = False
        self.num_sv = 0
        self._had_fix = False
        # backdate so the first verify_time() performs a real sensor check
        self._last_check = time_fn() - GPS_FIX_CHECK_INTERVAL

        # constructor-time alignment (ref: USRPTime.cpp:44-81)
        if conf.refclk_src == "internal" and conf.pps_src != "none":
            log.warning("UHD: unusual refclk and pps source settings; "
                        "setting time once, no monitoring")
            self.set_usrp_time_from_pps()
        elif conf.pps_src == "none":
            if conf.enable_sync:
                log.warning("UHD: synchronous transmission without PPS "
                            "input!")
            self.set_usrp_time_from_localtime()
        elif conf.pps_src == "pps":
            pass                       # verify_time handles time setup
        elif conf.pps_src == "gpsdo":
            if self._check_gps_fix():
                self.set_usrp_time_from_pps()
                self.gps_state = self.MONITOR
                self.num_checks_without_fix = 0
        elif conf.pps_src == "external":
            self.set_usrp_time_from_pps()
        else:
            raise ValueError(f"pps_source not implemented: {conf.pps_src}")

    # ------------------------------------------------------------- time set
    def set_usrp_time_from_localtime(self):
        t = self._time()
        self.usrp.set_time_now(self._timespec(t))
        log.info("UHD: set USRP time to %.3f", t)

    def set_usrp_time_from_pps(self):
        """Wait until just after a second boundary, then set the time to
        take effect at the *next* PPS edge (ref: USRPTime.cpp:216-247)."""
        secs = int(self._time())
        while int(self._time()) == secs:
            self._sleep(0.001)
        self._sleep(0.2)               # make sure the PPS edge comes later
        time_set = secs + 3
        log.info("UHD: setting USRP time at next PPS to %d", time_set)
        self.usrp.set_time_unknown_pps(self._timespec(float(time_set)))
        self._sleep(1.0)               # let the device update its registers
        now = self._get_real_secs()
        log.info("UHD: USRP time %.3f", now)
        if abs(now - time_set) > 10.0:
            raise RuntimeError("UHD: unable to set USRP time")

    def _timespec(self, t: float):
        return self._uhd.types.TimeSpec(t)

    def _get_real_secs(self) -> float:
        ts = self.usrp.get_time_now()
        return ts.get_real_secs() if hasattr(ts, "get_real_secs") else float(ts)

    # ---------------------------------------------------------------- gpsdo
    def _check_gps_fix(self) -> bool:
        """Poll the GPSDO lock sensor.  Ettus GPSDOs expose `gps_locked`;
        the LEA-M8F board exposes `gps_timelock` + `gps_gngga`
        (ref: USRPTime.cpp:249-303)."""
        try:
            if self.conf.refclk_src == "gpsdo-ettus":
                sensor = self.usrp.get_mboard_sensor("gps_locked", 0)
                locked = bool(sensor.to_bool())
            else:
                sensor = self.usrp.get_mboard_sensor("gps_timelock", 0)
                locked = "TIME LOCKED" in str(sensor.value)
                try:
                    gngga = str(self.usrp.get_mboard_sensor(
                        "gps_gngga", 0).value)
                    fields = gngga.split(",")
                    self.num_sv = int(fields[7]) if len(fields) > 7 else 0
                except (ValueError, IndexError, KeyError, RuntimeError):
                    pass
        except (KeyError, RuntimeError) as e:
            log.warning("UHD: no GPS lock sensor: %s", e)
            locked = False
        self.holdover = not locked
        if locked:
            self._had_fix = True
        return locked

    def _gpsfix_needs_check(self) -> bool:
        """ref: USRPTime.cpp:177-196."""
        if self.conf.refclk_src == "internal":
            return False
        gpsdo = self.conf.refclk_src in ("gpsdo", "gpsdo-ettus")
        if self.gps_state == self.MONITOR and gpsdo:
            return self.conf.max_gps_holdover_time != 0
        return self.gps_state == self.BOOTUP and gpsdo

    def verify_time(self) -> bool:
        """Gate for transmission: True when the clock source is usable.
        (ref: USRPTime.cpp:83-131).  Raises GpsFixLost past the limits."""
        if not self._gpsfix_needs_check():
            return True
        self._check()
        without_fix = GPS_FIX_CHECK_INTERVAL * self.num_checks_without_fix
        if self.gps_state == self.BOOTUP:
            if without_fix > INITIAL_GPS_FIX_WAIT:
                raise GpsFixLost(
                    f"GPS did not fix in {INITIAL_GPS_FIX_WAIT:.0f} seconds")
            if self._had_fix and self.num_checks_without_fix == 0:
                if self.conf.pps_src != "none":
                    self.set_usrp_time_from_pps()
                self.gps_state = self.MONITOR
                return True
            return False
        # MONITOR
        if without_fix > self.conf.max_gps_holdover_time:
            raise GpsFixLost(
                f"lost GPS fix for {without_fix:.0f} seconds")
        return True

    def _check(self):
        now = self._time()
        if now - self._last_check < GPS_FIX_CHECK_INTERVAL / 2.0:
            return
        self._last_check = now
        if self._check_gps_fix():
            if self.num_checks_without_fix:
                log.info("UHD: GPS time lock recovered")
            self._had_fix = True
            self.num_checks_without_fix = 0
        else:
            if self.num_checks_without_fix == 0:
                log.error("UHD: GPS time lock lost")
            self.num_checks_without_fix += 1

    def get_gnss_stats(self) -> dict:
        return {"holdover": self.holdover, "num_sv": self.num_sv}


class UhdDevice(SdrDevice):
    """USRP driver (ref: src/output/UHD.cpp:110-575).

    `uhd_module` is injectable for tests; by default `import uhd`."""

    def __init__(self, conf: UhdConfig | None = None, uhd_module=None,
                 time_fn=time.time, sleep_fn=time.sleep):
        self.conf = conf or UhdConfig()
        if uhd_module is None:
            import uhd as uhd_module  # noqa: PLC0415
        self._uhd = uhd_module
        c = self.conf

        args = c.device_args
        if c.master_clock_rate:
            sep = "," if args else ""
            args = f"{args}{sep}master_clock_rate={c.master_clock_rate:.0f}"
        log.info("UHD: creating USRP device with args %r", args)
        self.usrp = self._uhd.usrp.MultiUSRP(args)

        if c.master_clock_rate:
            mcr = self.usrp.get_master_clock_rate()
            if abs(mcr - c.master_clock_rate) > c.master_clock_rate * 1e-6:
                raise RuntimeError("cannot set USRP master_clock_rate")

        # clock discipline (ref: UHD.cpp:163-176)
        if c.refclk_src == "gpsdo-ettus":
            self.usrp.set_clock_source("gpsdo")
        else:
            self.usrp.set_clock_source(c.refclk_src)
        self.usrp.set_time_source(c.pps_src)
        if c.subdevice:
            self.usrp.set_tx_subdev_spec(c.subdevice)

        self.device_time = UsrpTime(self.usrp, c, time_fn, sleep_fn,
                                    uhd_module=self._uhd)

        self.usrp.set_tx_rate(c.sample_rate)
        actual = self.usrp.get_tx_rate()
        if abs(actual - c.sample_rate) > c.sample_rate * 1e-6:
            raise RuntimeError("cannot set USRP sample rate")
        if c.bandwidth > 0:
            self.usrp.set_tx_bandwidth(c.bandwidth)
            self.usrp.set_rx_bandwidth(c.bandwidth)

        self.tune(c.lo_offset, c.frequency)
        self.usrp.set_tx_gain(c.txgain)
        self.txgain = self.usrp.get_tx_gain()
        self.usrp.set_rx_rate(c.sample_rate)
        self.usrp.set_rx_gain(c.rxgain)
        self.rxgain = self.usrp.get_rx_gain()
        if c.rx_antenna:
            self.usrp.set_rx_antenna(c.rx_antenna)

        sa = self._uhd.usrp.StreamArgs("fc32", "sc16")
        self._tx_stream = self.usrp.get_tx_stream(sa)
        self._rx_stream = self.usrp.get_rx_stream(sa)
        self._max_samps = int(self._tx_stream.get_max_num_samps())

        self.num_underflows = 0
        self.num_late_packets = 0
        self.num_overflows = 0
        self.num_frames_modulated = 0
        self._suppress_refclk_check = False
        self._refclk_lock_lost = False
        self._require_timestamp_refresh = False
        self.muting = False

        # async event thread for underrun/late counters
        # (ref: UHD.cpp:496-575 print_async_thread)
        self._running = True
        self._async_thread = threading.Thread(
            target=self._async_events, daemon=True, name="uhd-async")
        self._async_thread.start()

    # ------------------------------------------------------------- control
    def tune(self, lo_offset: float, frequency: float):
        if frequency == 0:
            return
        if lo_offset:
            tr = self._uhd.types.TuneRequest(frequency, lo_offset)
        else:
            tr = self._uhd.types.TuneRequest(frequency)
        self.usrp.set_tx_freq(tr)
        self.usrp.set_rx_freq(self._uhd.types.TuneRequest(frequency))
        self.frequency = float(self.usrp.get_tx_freq())
        self.lo_offset = lo_offset

    def set_txgain(self, gain: float):
        self.usrp.set_tx_gain(gain)
        self.txgain = float(self.usrp.get_tx_gain())

    def get_txgain(self) -> float:
        return float(self.usrp.get_tx_gain())

    def set_rxgain(self, gain: float):
        self.usrp.set_rx_gain(gain)
        self.rxgain = float(self.usrp.get_rx_gain())

    def get_rxgain(self) -> float:
        return float(self.usrp.get_rx_gain())

    # -------------------------------------------------------------- timing
    def require_timestamp_refresh(self):
        """Called after dropped/muted frames so the next burst re-arms its
        time_spec with EOB (ref: src/output/SDR.cpp:292-331)."""
        self._require_timestamp_refresh = True

    def is_clk_source_ok(self) -> bool:
        """True if GPS and reference clock inputs are usable
        (ref: UHD.cpp:439-462 + USRPTime::verify_time)."""
        ok = True
        if self._refclk_loss_needs_check():
            try:
                if not self.usrp.get_mboard_sensor(
                        "ref_locked", 0).to_bool():
                    ok = False
                    self._refclk_lock_lost = True
                    log.error("UHD: external reference clock lock lost")
                    if self.conf.refclk_lock_loss_behaviour == "crash":
                        raise RefclkLockLost(
                            "external reference clock lock lost")
            except (KeyError, RuntimeError) as e:
                if isinstance(e, RefclkLockLost):
                    raise
                self._suppress_refclk_check = True
                log.warning("UHD: no ref_locked sensor, check disabled: %s",
                            e)
        ok = self.device_time.verify_time() and ok
        return ok

    def _refclk_loss_needs_check(self) -> bool:
        if self._suppress_refclk_check:
            return False
        return self.conf.refclk_src != "internal"

    def get_real_secs(self) -> float:
        ts = self.usrp.get_time_now()
        return ts.get_real_secs() if hasattr(ts, "get_real_secs") else float(ts)

    # ------------------------------------------------------------ transmit
    def transmit_frame(self, samples: np.ndarray,
                       ts: FrameTimestamp | None):
        """Timed send loop with per-packet time_spec advance and EOB on
        timestamp refresh / muting (ref: UHD.cpp:314-375)."""
        if np.issubdtype(samples.dtype, np.integer):
            # kiss / device-converted frames arrive as packed s16 wire
            # words.  The reference streams them natively as sc16 where
            # int16 full scale maps to DAC full scale (UHD.cpp:233-234);
            # this driver streams fc32 (full scale +-1.0), so divide by
            # 32768 to hit the same DAC amplitude.
            from .sdr import f32_pairs_from_wire
            samples = f32_pairs_from_wire(samples)
        flat = np.ascontiguousarray(samples, np.float32).reshape(-1, 2)
        cplx = flat.view(np.complex64).reshape(-1)
        n = cplx.shape[0]

        md = self._uhd.types.TXMetadata()
        if self.conf.enable_sync and ts is not None and ts.valid:
            t = ts.as_seconds()
            md.has_time_spec = True
            md.time_spec = self._uhd.types.TimeSpec(t)
        else:
            md.has_time_spec = False

        acc = 0
        tx_timeout = 20.0
        while self._running and acc < n:
            to_send = min(n - acc, self._max_samps)
            eob_because_muting = self.muting
            md.end_of_burst = bool(eob_because_muting or (
                ts is not None and ts.valid
                and self._require_timestamp_refresh
                and to_send <= self._max_samps))
            self._require_timestamp_refresh = False
            sent = self._tx_stream.send(cplx[acc:acc + to_send], md,
                                        tx_timeout)
            if sent == 0:
                log.warning("UHD: unable to write to device, skipping frame")
                break
            acc += sent
            if md.has_time_spec:
                md.time_spec = self._uhd.types.TimeSpec(
                    md.time_spec.get_real_secs()
                    + sent / float(self.conf.sample_rate))
            if eob_because_muting:
                break
        self.num_frames_modulated += 1

    def receive_frame(self, num_samples: int, ts: FrameTimestamp):
        """Timed RX burst for the DPD feedback path
        (ref: UHD.cpp:413-437)."""
        t = self._uhd.types
        cmd = t.StreamCMD(t.StreamMode.num_done)
        cmd.num_samps = num_samples
        cmd.stream_now = False
        cmd.time_spec = t.TimeSpec(ts.as_seconds())
        self._rx_stream.issue_stream_cmd(cmd)
        buf = np.zeros(num_samples, np.complex64)
        md = t.RXMetadata()
        got = self._rx_stream.recv(buf, md, 60.0)
        rx_sec = md.time_spec.get_real_secs()
        rx_ts = FrameTimestamp(valid=True, seconds=int(rx_sec),
                               pps=int((rx_sec - int(rx_sec)) * 16_384_000))
        pairs = np.stack([buf.real, buf.imag], -1).astype(np.float32)
        return pairs[:got], rx_ts

    # ------------------------------------------------------------ counters
    def _async_events(self):
        t = self._uhd.types
        md = t.TXAsyncMetadata()
        while self._running:
            try:
                if not self._tx_stream.recv_async_msg(md, 0.1):
                    continue
                code = md.event_code
                if code == t.TXMetadataEventCode.underflow:
                    self.num_underflows += 1
                elif code in (t.TXMetadataEventCode.time_error,):
                    self.num_late_packets += 1
            except (RuntimeError, AttributeError):
                time.sleep(0.1)

    def get_run_statistics(self) -> dict:
        gnss = self.device_time.get_gnss_stats()
        return {"underruns": self.num_underflows,
                "latepackets": self.num_late_packets,
                "frames": self.num_frames_modulated,
                "gpsdo_holdover": gnss["holdover"],
                "gpsdo_num_sv": gnss["num_sv"]}

    def close(self):
        self._running = False
        if self._async_thread.is_alive():
            self._async_thread.join(timeout=1)
