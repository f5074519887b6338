"""BladeRF output driver.

Port of the reference's Output::BladeRF (src/output/BladeRF.cpp:49-314)
against the official Nuand ``bladerf`` Python bindings, whose surface is
object-based: ``BladeRF()`` device handles expose ``Channel(CHANNEL_TX(0))``
objects with ``sample_rate``/``frequency``/``gain``/``bandwidth``
properties, ``sync_config(...)`` and ``sync_tx(...)``.  The binding module
is injectable so the driver -- VCTCXO tamer refclk discipline, SC16-Q11
sync-TX configuration, dB gain, bandwidth -- is testable without hardware
(tests/test_vendor_drivers.py).

The modulator feeds this device floats already normalised to the Q11 full
scale (settings.normalise = 2047/NORMALISE_FACTOR_SDR, mirroring the
reference where FormatConverter runs before the output); the driver rounds
and saturates to int16 pairs for sync_tx.
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

    `bladerf_module` is injectable; by default `import bladerf`.  Symbols
    are resolved from the module or its `_bladerf` extension (the package
    re-exports them, but older releases only define them on `_bladerf`)."""

    def __init__(self, conf: BladeRFConfig | None = None,
                 bladerf_module=None):
        self.conf = c = conf or BladeRFConfig()
        if bladerf_module is None:
            import bladerf as bladerf_module  # noqa: PLC0415
        # the names live in bladerf._bladerf; the package usually
        # re-exports them
        api = bladerf_module
        if not hasattr(api, "BladeRF") and hasattr(api, "_bladerf"):
            api = api._bladerf
        self._api = api

        log.info("BladeRF: creating the device with: %r", c.device_args)
        self.dev = (api.BladeRF(c.device_args) if c.device_args
                    else api.BladeRF())
        self.ch = self.dev.Channel(api.CHANNEL_TX(0))

        # VCTCXO tamer clock discipline (ref: src/output/BladeRF.cpp:66-83).
        # Exposed by libbladeRF; warn instead of crashing if this binding
        # build lacks the wrapper.
        if c.refclk_src in ("pps", "10mhz"):
            mode = "1pps" if c.refclk_src == "pps" else "10mhz"
            setter = getattr(self.dev, "set_vctcxo_tamer_mode", None)
            if setter is not None:
                setter(mode)
            else:
                log.error("BladeRF: refclk_source=%s requested but this "
                          "python binding exposes no VCTCXO tamer control",
                          c.refclk_src)

        self.ch.sample_rate = int(c.sample_rate)
        log.info("BladeRF: sample rate set to %.1f kHz",
                 self.ch.sample_rate / 1e3)

        self.tune(c.lo_offset, c.frequency)
        log.info("BladeRF: actual frequency %.3f kHz",
                 self.get_tx_freq() / 1e3)

        # gain is plain dB (ref: src/output/BladeRF.cpp:113-118)
        self.ch.gain = int(c.txgain)
        self.txgain = float(c.txgain)
        if c.bandwidth > 0:
            self.ch.bandwidth = int(c.bandwidth)

        # SC16 Q11 sync TX without metadata
        # (ref: src/output/BladeRF.cpp:128-148)
        self.dev.sync_config(layout=api.ChannelLayout.TX_X1,
                             fmt=api.Format.SC16_Q11,
                             num_buffers=NUM_BUFFERS,
                             buffer_size=BUFFER_SIZE,
                             num_transfers=NUM_TRANSFERS,
                             stream_timeout=TIMEOUT_MS)
        self.ch.enable = True

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
        self.ch.frequency = int(frequency)
        self.frequency = float(self.ch.frequency)

    def get_tx_freq(self) -> float:
        return float(self.ch.frequency)

    def set_txgain(self, gain: float):
        self.conf.txgain = gain
        self.ch.gain = int(gain)
        self.txgain = float(gain)

    def get_txgain(self) -> float:
        return float(self.ch.gain)

    def set_bandwidth(self, bandwidth: float):
        self.ch.bandwidth = int(bandwidth)

    def get_bandwidth(self) -> float:
        return float(self.ch.bandwidth)

    def get_temperature(self) -> float | None:
        try:
            getter = getattr(self.dev, "get_rfic_temperature", None)
            if getter is not None:
                return float(getter())
            return float(self.dev.rfic_temperature)
        except (RuntimeError, AttributeError) as e:
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
        if np.issubdtype(samples.dtype, np.integer):
            # device-side FormatConverter already produced s16 wire words;
            # just enforce the SC16-Q11 range
            from .sdr import sc16_pairs
            buf = np.clip(sc16_pairs(samples).reshape(-1), -2048, 2047)
        else:
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
        self.ch.enable = False
        self.dev.close()
