"""BladeRF output driver.

Port of the reference's Output::BladeRF (src/output/BladeRF.cpp:49-314)
against the official ``bladerf`` Python bindings (python3-bladerf ships with
libbladeRF).  The `bladerf_module` is injectable so the driver -- VCTCXO
tamer refclk discipline, SC16-Q11 sync-TX configuration, dB gain, bandwidth
-- is testable without hardware (tests/test_vendor_drivers.py).

The modulator feeds this device floats already normalised to the Q11 full
scale (settings.normalise = 2047/NORMALISE_FACTOR_SDR, mirroring the
reference where FormatConverter runs before the output); the driver rounds
and saturates to int16 pairs for bladerf_sync_tx.
"""
from __future__ import annotations

import dataclasses
import logging

import numpy as np

from ..timestamps import FrameTimestamp
from .sdr import SdrDevice

log = logging.getLogger("dabmod_tpu.bladerf")

# streaming configuration (ref: src/output/BladeRF.cpp:128-141)
NUM_BUFFERS = 16
BUFFER_SIZE = 8192
NUM_TRANSFERS = 8
TIMEOUT_MS = 3500


@dataclasses.dataclass
class BladeRFConfig:
    """Subset of SDRDeviceConfig used by the BladeRF driver
    (ref: src/output/SDRDevice.h:54-111)."""
    device_args: str = ""
    sample_rate: int = 2_048_000
    frequency: float = 0.0
    lo_offset: float = 0.0
    txgain: float = 0.0          # dB
    bandwidth: float = 0.0
    refclk_src: str = "internal"  # internal | pps | 10mhz

    @classmethod
    def from_settings(cls, s):
        return cls(device_args=s.sdr_device_args,
                   sample_rate=s.output_rate,
                   frequency=s.sdr_frequency,
                   lo_offset=s.sdr_lo_offset,
                   txgain=s.sdr_txgain,
                   bandwidth=s.sdr_bandwidth,
                   refclk_src=s.sdr_refclk_src)


class BladeRFDevice(SdrDevice):
    """BladeRF driver (ref: src/output/BladeRF.cpp:49-314).

    `bladerf_module` is injectable; by default `import bladerf`.  The module
    must expose `BladeRF()` (device handle), `CHANNEL_TX(ch)`,
    `ChannelLayout.TX_X1`, `Format.SC16_Q11`, and the device handle the
    methods used below (sample_rate/frequency/gain/bandwidth accessors,
    `set_vctcxo_tamer_mode`, `sync_config`, `enable_module`, `sync_tx`,
    `get_rfic_temperature`, `close`)."""

    def __init__(self, conf: BladeRFConfig | None = None,
                 bladerf_module=None):
        self.conf = c = conf or BladeRFConfig()
        if bladerf_module is None:
            import bladerf as bladerf_module  # noqa: PLC0415
        self._brf = bladerf_module

        log.info("BladeRF: creating the device with: %r", c.device_args)
        self.dev = bladerf_module.BladeRF()
        self._channel = bladerf_module.CHANNEL_TX(0)

        # VCTCXO tamer clock discipline (ref: src/output/BladeRF.cpp:66-83)
        if c.refclk_src == "pps":
            self.dev.set_vctcxo_tamer_mode("1pps")
        elif c.refclk_src == "10mhz":
            self.dev.set_vctcxo_tamer_mode("10mhz")

        self.dev.set_sample_rate(self._channel, int(c.sample_rate))
        log.info("BladeRF: sample rate set to %.1f kHz",
                 self.dev.get_sample_rate(self._channel) / 1e3)

        self.tune(c.lo_offset, c.frequency)
        log.info("BladeRF: actual frequency %.3f kHz",
                 self.get_tx_freq() / 1e3)

        # gain is plain dB (ref: src/output/BladeRF.cpp:113-118)
        self.dev.set_gain(self._channel, int(c.txgain))
        self.txgain = float(c.txgain)
        if c.bandwidth > 0:
            self.dev.set_bandwidth(self._channel, int(c.bandwidth))

        # SC16 Q11 sync TX without metadata
        # (ref: src/output/BladeRF.cpp:128-148)
        self.dev.sync_config(bladerf_module.ChannelLayout.TX_X1,
                             bladerf_module.Format.SC16_Q11,
                             NUM_BUFFERS, BUFFER_SIZE, NUM_TRANSFERS,
                             TIMEOUT_MS)
        self.dev.enable_module(self._channel, True)

        self.num_frames_modulated = 0

    # ------------------------------------------------------------- control
    def tune(self, lo_offset: float, frequency: float):
        # BladeRF cannot apply an LO offset (ref: src/output/BladeRF.cpp:
        # 162-180)
        if lo_offset != 0:
            log.info("lo_offset %.1f not supported with BladeRF output, "
                     "forced to 0", lo_offset)
        self.conf.lo_offset = self.lo_offset = 0.0
        if frequency == 0:
            return
        self.dev.set_frequency(self._channel, int(frequency))
        self.frequency = float(self.dev.get_frequency(self._channel))

    def get_tx_freq(self) -> float:
        return float(self.dev.get_frequency(self._channel))

    def set_txgain(self, gain: float):
        self.conf.txgain = gain
        self.dev.set_gain(self._channel, int(gain))
        self.txgain = float(gain)

    def get_txgain(self) -> float:
        return float(self.dev.get_gain(self._channel))

    def set_bandwidth(self, bandwidth: float):
        self.dev.set_bandwidth(self._channel, int(bandwidth))

    def get_bandwidth(self) -> float:
        return float(self.dev.get_bandwidth(self._channel))

    def get_temperature(self) -> float | None:
        try:
            return float(self.dev.get_rfic_temperature())
        except RuntimeError as e:
            log.error("Error getting BladeRF temperature: %s", e)
            return None

    def get_real_secs(self) -> float:
        # no hardware-time support (ref: src/output/BladeRF.cpp:249-253)
        return 0.0

    # ------------------------------------------------------------ transmit
    def transmit_frame(self, samples: np.ndarray,
                       ts: FrameTimestamp | None):
        """Blocking sync TX of SC16-Q11 pairs
        (ref: src/output/BladeRF.cpp:303-314)."""
        flat = np.ascontiguousarray(samples, np.float32).reshape(-1)
        buf = np.clip(np.rint(flat), -2048, 2047).astype(np.int16)
        num_samples = buf.shape[0] // 2
        self.dev.sync_tx(buf, num_samples)
        self.num_frames_modulated += 1

    # ------------------------------------------------------------ counters
    def get_run_statistics(self) -> dict:
        # the reference exports only the frame count for BladeRF
        # (ref: src/output/BladeRF.cpp:242-247)
        return {"frames": self.num_frames_modulated}

    def close(self):
        self.dev.enable_module(self._channel, False)
        self.dev.close()
