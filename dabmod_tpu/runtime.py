"""Streaming runtime: the supervisor loop around the compiled modulator.

Mirror of the reference's launch_modulator / run_modulator state machine
(src/DabMod.cpp:365-738): FP-0 alignment before starting, FCT continuity
check with restart-keeping-input, ensemble reconfiguration detection with
pipeline rebuild, and per-batch timestamp tracking.  The difference is
granularity: the reference runs one 24 ms ETI frame at a time; this runtime
accumulates `batch_tf` transmission frames and executes them as one device
step.

The steady-state loop is a three-stage pipeline:

  [main thread]  read + parse batch N+1  |  dispatch modulate N+1 (async)
  [device]       compute batch N         (JAX dispatch is asynchronous)
  [writer thread] D2H copy + format conversion + output write of batch N-1

so the blocking `np.asarray` device fetch and the output write never sit on
the dispatch path.  This is the TPU-shaped analogue of the reference's
PipelinedModCodec worker threads (src/ModPlugin.cpp:76-154) and its SDR
output thread (src/output/SDR.cpp:190-238).
"""
from __future__ import annotations

import enum
import logging
import queue as queue_mod
import threading
import time

import numpy as np

from .config import ModSettings
from .eti import EnsembleReconfigured, EtiError, parse_eti_frames
from .io.outputs import open_output
from .io.readers import open_input
from .models.modulator import Modulator
from .rc import ParameterError, RemoteControllable, rcs
from .timestamps import TimestampDecoder

log = logging.getLogger("dabmod_tpu")


class RunResult(enum.Enum):
    FAILURE = 0
    NORMAL_END = 1
    AGAIN = 2
    RECONFIGURE = 3


# RC controller fault poll cadence in ETI frames (ref: src/DabMod.cpp:721-723
# polls every 250 frames unconditionally)
RC_FAULT_POLL_FRAMES = 250


class ModRuntime:
    def __init__(self, settings: ModSettings):
        self.settings = settings
        # f32 sinks take the planes contract: the device skips the
        # expensive minor-axis interleave and this runtime's writer
        # assembles pairs at memcpy speed (config.device_interleave)
        f32_file = (settings.output == "file"
                    and settings.file_output_format in (
                        "complexf", "complexf_normalised", "f32", ""))
        f32_zmq = (settings.output == "zmq"
                   and settings.zmq_output_format not in ("s16", "u8",
                                                          "s8"))
        f32_sdr = settings.output in ("uhd", "soapy", "lime", "loopback")
        if f32_file or f32_zmq or f32_sdr:
            settings.device_interleave = False
        self.reader = open_input(settings)
        self.output = open_output(settings)
        self.ts_decoder = TimestampDecoder(settings.tist_offset)
        self._stop = threading.Event()
        # delaymanagement management=dynamic: the offset lives in a file
        # that operators rewrite at runtime; re-read on mtime change
        # (the reference's old-syntax offset management, warned about at
        # src/ConfigParser.cpp:456-459, which this build keeps functional)
        self._dyn_offset_mtime: float | None = None
        self.modulator: Modulator | None = None
        self.state = None
        self.num_restarts = 0
        self.framecount = 0
        self._pending = np.empty((0, 6144), np.uint8)
        # EDI timestamps ride in lockstep with _pending: one [seconds,
        # utco, tsta] row per pending frame, trimmed by exactly the same
        # slices (a bare side-list desyncs the moment FP-0 alignment or an
        # FCT-discontinuity requeue drops frames)
        self._pending_times: np.ndarray | None = None
        self._last_fct = -1
        self._aligned = False
        self._rebuild = False
        self._t0 = None
        self._frames_timed = 0
        self.last_stats = {}
        self._next_fault_poll = RC_FAULT_POLL_FRAMES
        self._frames_since_clip_poll = RC_FAULT_POLL_FRAMES
        self._frames_since_stats_poll = RC_FAULT_POLL_FRAMES
        # output pipeline, two stages so the blocking D2H fetch and the
        # sink write overlap instead of serialising in one thread (the
        # round-3 s16 path ran at 0.64 of the transport ceiling because
        # fetch(N) waited for write(N-1)): dispatch -> [fetch thread:
        # np.asarray] -> [writer thread: output.write].  Depth 4 keeps
        # enough batches in flight to ride out tunnel jitter.
        self._out_queue: queue_mod.Queue = queue_mod.Queue(maxsize=4)
        self._write_queue: queue_mod.Queue = queue_mod.Queue(maxsize=4)
        self._writer_fault: BaseException | None = None
        self._fetcher = threading.Thread(target=self._fetch_loop,
                                         daemon=True, name="output-fetch")
        self._fetcher.start()
        self._writer = threading.Thread(target=self._writer_loop,
                                        daemon=True, name="output-writer")
        self._writer.start()
        from collections import deque
        self._clip_ratios = deque(maxlen=256)
        self._errclip_ratios = deque(maxlen=256)
        self._mers = deque(maxlen=256)
        self._enrol_rc()
        if settings.rc_telnet_port:
            rcs.add_telnet(settings.rc_telnet_port)
        if settings.rc_zmq_endpoint:
            rcs.add_zmq(settings.rc_zmq_endpoint)
        if settings.events_endpoint:
            from .events import EventLogHandler, events
            events.bind(settings.events_endpoint)
            logging.getLogger("dabmod_tpu").addHandler(EventLogHandler())
        # LogTracer-style breadcrumb file (ref: lib/Log.h:103-117)
        self._trace = open(settings.log_trace_file, "a") \
            if settings.log_trace_file else None

    # ------------------------------------------------------------------
    # Remote control surface (ref: the RC_ADD_PARAMETER registrations in
    # GainControl/OfdmGenerator/GuardIntervalInserter/TII/FIRFilter/
    # MemlessPoly/DabModulator/TimestampDecoder)
    def _enrol_rc(self):
        s = self.settings

        def setter(attr, conv=float, rebuild=False):
            def f(value):
                setattr(s, attr, conv(value))
                if rebuild:
                    self._rebuild = True
            return f

        def boolconv(v):
            return v.strip() not in ("0", "false", "False", "")

        gain = RemoteControllable("gain")
        gain.add_parameter("digital", "Digital Gain",
                           lambda: s.digital_gain, setter("digital_gain"))
        from .config import GAIN_MODES

        def set_gainmode(v):
            if v.lower() not in GAIN_MODES:
                raise ParameterError(f"invalid gainmode {v}")
            s.gain_mode = GAIN_MODES[v.lower()]
            self._rebuild = True
        gain.add_parameter("mode", "Gainmode (fix|max|var)",
                           lambda: ("fix", "max", "var")[s.gain_mode],
                           set_gainmode)
        gain.add_parameter("var", "Variance setting for gainmode var "
                           "(default: 4)", lambda: s.gain_mode_variance,
                           setter("gain_mode_variance"))
        rcs.enrol(gain)

        ofdm_rc = RemoteControllable("ofdm")

        def cfr_setter(attr, conv=float):
            inner = setter(attr, conv, rebuild=True)

            def f(value):
                inner(value)
                # clear the PAPR/MER accumulators on CFR changes
                # (ref: src/OfdmGenerator.cpp:383-394 myPaprClearRequest)
                self._clip_ratios.clear()
                self._errclip_ratios.clear()
                self._mers.clear()
            return f

        ofdm_rc.add_parameter("cfr", "Enable crest factor reduction",
                              lambda: int(s.enable_cfr),
                              cfr_setter("enable_cfr", boolconv))
        ofdm_rc.add_parameter("clip", "CFR: Clip to amplitude",
                              lambda: s.cfr_clip,
                              cfr_setter("cfr_clip"))
        ofdm_rc.add_parameter("errorclip", "CFR: Limit error",
                              lambda: s.cfr_error_clip,
                              cfr_setter("cfr_error_clip"))
        ofdm_rc.add_parameter(
            "clip_stats", "CFR: statistics (clip ratio, errorclip ratio)",
            self._clip_stats)
        ofdm_rc.add_parameter("papr", "PAPR measurements (before CFR, "
                              "after CFR)", self._papr_stats)
        rcs.enrol(ofdm_rc)

        guard = RemoteControllable("guardinterval")
        guard.add_parameter("windowlen", "Window length for OFDM windowng "
                            "[0 to disable]", lambda: s.ofdm_window_overlap,
                            setter("ofdm_window_overlap", int, rebuild=True))
        rcs.enrol(guard)

        tii = RemoteControllable("tii")
        tii.add_parameter("enable", "enable TII [0-1]",
                          lambda: int(s.tii_enable),
                          setter("tii_enable", boolconv, rebuild=True))
        tii.add_parameter("comb", "TII comb number [0-23]",
                          lambda: s.tii_comb,
                          setter("tii_comb", int, rebuild=True))
        tii.add_parameter("pattern", "TII pattern number [0-69]",
                          lambda: s.tii_pattern,
                          setter("tii_pattern", int, rebuild=True))
        tii.add_parameter("old_variant", "select old TII variant for old "
                          "(buggy) receivers [0-1]",
                          lambda: int(s.tii_old_variant),
                          setter("tii_old_variant", boolconv, rebuild=True))
        rcs.enrol(tii)

        if s.filter_taps_file:
            fir = RemoteControllable("firfilter")
            fir.add_parameter(
                "ntaps", "(Read-only) number of filter taps.",
                lambda: (self.modulator._fir_taps.shape[0]
                         if self.modulator is not None
                         and self.modulator._fir_taps is not None else 0))
            def set_tapsfile(v):
                # hot path: same tap count -> swap the runtime-argument
                # array, no retrace (ref mutex swap, FIRFilter.cpp:316-324);
                # different count -> full rebuild like the reference's
                # PipelinedModCodec restart
                from .models.modulator import load_fir_taps
                s.filter_taps_file = str(v)
                taps = (None if v == "default" else load_fir_taps(str(v)))
                if taps is None:
                    from . import tables
                    taps = tables.DEFAULT_FIR_TAPS
                if not (self.modulator is not None
                        and self.modulator.update_fir_taps(taps)):
                    self._rebuild = True
                else:
                    log.info("FIR taps hot-swapped (%d taps, no recompile)",
                             len(taps))
            fir.add_parameter(
                "tapsfile", "Filename containing filter taps. When written "
                "to, the new file gets automatically loaded.",
                lambda: s.filter_taps_file, set_tapsfile)
            rcs.enrol(fir)

        if s.poly_coef_file:
            def set_coeffile(v):
                # same kind + shape -> hot-swap the runtime-argument coefs
                # (the reference's mutex swap, src/MemlessPoly.cpp:192-231)
                from .models.modulator import load_dpd_file
                s.poly_coef_file = str(v)
                kind, data = load_dpd_file(str(v))
                if not (self.modulator is not None
                        and self.modulator.update_dpd(kind, data)):
                    self._rebuild = True
                else:
                    log.info("DPD %s coefficients hot-swapped "
                             "(no recompile)", kind)
            poly = RemoteControllable("poly")
            poly.add_parameter("coeffile", "Filename containing poly "
                               "coefficients; reloaded when written to.",
                               lambda: s.poly_coef_file, set_coeffile)
            rcs.enrol(poly)

        from .io.sdr import SdrOutput
        if isinstance(self.output, SdrOutput):
            dev = self.output.device
            sdr_rc = RemoteControllable("sdr")
            sdr_rc.add_parameter("txgain", "TX gain",
                                 dev.get_txgain,
                                 lambda v: dev.set_txgain(float(v)))
            sdr_rc.add_parameter("rxgain", "RX gain for the DPD feedback",
                                 dev.get_rxgain,
                                 lambda v: dev.set_rxgain(float(v)))
            sdr_rc.add_parameter("freq", "Transmission frequency",
                                 lambda: dev.frequency,
                                 lambda v: dev.tune(dev.lo_offset, float(v)))
            sdr_rc.add_parameter("muting", "Mute the TX carrier",
                                 lambda: int(self.output.muting),
                                 lambda v: setattr(self.output, "muting",
                                                   bool(int(v))))
            for stat in ("underruns", "dropped", "queue_overflows",
                         "frames"):
                sdr_rc.add_parameter(
                    stat, f"(Read-only) {stat} counter",
                    lambda st=stat: getattr(self.output, st))
            # GPSDO / hardware clock depth (ref: src/output/UHD.cpp:377-393
            # run_statistics and the munin graphs that consume them)
            dtime = getattr(dev, "device_time", None)
            if dtime is not None:
                sdr_rc.add_parameter(
                    "gpsdo_num_sv", "(Read-only) GPS satellites used",
                    lambda: dtime.num_sv)
                sdr_rc.add_parameter(
                    "gpsdo_holdover", "(Read-only) GPSDO in holdover [0-1]",
                    lambda: int(dtime.holdover))
                sdr_rc.add_parameter(
                    "gps_state", "(Read-only) GPSDO state machine state",
                    lambda: dtime.gps_state)
            if hasattr(dev, "get_real_secs"):
                sdr_rc.add_parameter(
                    "device_time", "(Read-only) hardware clock seconds",
                    lambda: dev.get_real_secs())
            rcs.enrol(sdr_rc)

        mod = RemoteControllable("modulator")
        mod.add_parameter("rate", "(Read-only) IQ output samplerate",
                          lambda: s.output_rate)
        mod.add_parameter("num_clipped_samples", "(Read-only) Number of "
                          "samples clipped in last frame during format "
                          "conversion", lambda: getattr(
                              self.output, "num_clipped_samples", 0))
        mod.add_parameter("fct", "(Read-only) most recent ETI frame "
                          "characterisation count",
                          lambda: max(self._last_fct, 0))
        mod.add_parameter("frames", "(Read-only) ETI frames modulated",
                          lambda: self.framecount)
        mod.add_parameter("num_restarts", "(Read-only) modulator restart "
                          "counter", lambda: self.num_restarts)
        rcs.enrol(mod)

        from .io.fic_decoder import FICDecoder
        self.fic_decoder = FICDecoder()
        ens = RemoteControllable("ensemble")
        ens.add_parameter(
            "info", "(Read-only) decoded ensemble/services information",
            lambda: __import__("json").dumps(
                self.fic_decoder.ensemble.to_json()))
        rcs.enrol(ens)

        tist = RemoteControllable("tist")
        tist.add_parameter("offset", "TIST offset [s]",
                           lambda: self.ts_decoder.offset_s,
                           lambda v: setattr(self.ts_decoder, "offset_s",
                                             float(v)))
        tist.add_parameter("timestamp", "FCT and timestamp [s]",
                           lambda: str(self.ts_decoder.timestamp().fct)
                           + " " + str(self.ts_decoder.timestamp()
                                       .as_seconds()))
        rcs.enrol(tist)

    # ------------------------------------------------------------------
    # Output writer thread: D2H fetch + stats folding + sink write happen
    # here so they never block the dispatch of the next device batch.
    def _fetch_loop(self):
        """Stage 1: block on the device->host copy, hand host arrays on."""
        while True:
            item = self._out_queue.get()
            if item is None or isinstance(item, threading.Event):
                self._write_queue.put(item)          # forward sentinel
                if item is None:
                    return
                continue
            iq, stats, meta, T, n_cells = item
            if self._writer_fault is not None:
                continue                             # drain after a fault
            try:
                if stats:
                    # CFR/MER statistics are small device scalars whose
                    # fetch is a full tunnel round trip each; sample them
                    # at the RC poll cadence (like num_clipped below)
                    # instead of every batch.  last_stats keeps the device
                    # arrays so an RC query can still fetch on demand.
                    self.last_stats = stats
                    self._frames_since_stats_poll += T
                    if (self._frames_since_stats_poll
                            >= RC_FAULT_POLL_FRAMES):
                        self._frames_since_stats_poll = 0
                        self._note_stats(stats, n_cells)
                if isinstance(iq, tuple):
                    # planes contract: fetch both planes and interleave
                    # here, at the same host boundary where the
                    # reference's FormatConverter assembles wire bytes
                    re = np.asarray(iq[0]).reshape(len(meta), -1)
                    im = np.asarray(iq[1]).reshape(len(meta), -1)
                    arr = np.empty((*re.shape, 2), np.float32)
                    arr[..., 0] = re
                    arr[..., 1] = im
                else:
                    arr = np.asarray(iq)             # blocking D2H copy
                    hb = (self.modulator.host_backend
                          if self.modulator is not None else None)
                    if hb is not None:
                        # fft_engine=dexter: run the FFT-accelerator
                        # offload chain (transform + wide GI + s16) on the
                        # fetched Q1.14 symbols (io/dexter_fft.py)
                        arr = hb(arr)
                        self.output.num_clipped_samples = hb.num_clipped
                self._write_queue.put((arr, meta, T))
                if "num_clipped" in stats:
                    # device-side FormatConverter clip counter: a scalar
                    # fetch is a full tunnel round trip, so sample it at
                    # the RC poll cadence rather than every batch
                    self._frames_since_clip_poll += T
                    if self._frames_since_clip_poll >= RC_FAULT_POLL_FRAMES:
                        self._frames_since_clip_poll = 0
                        self.output.num_clipped_samples = int(
                            np.asarray(stats["num_clipped"]))
            except BaseException as e:               # noqa: BLE001
                log.error("output fetch failed: %s", e)
                self._writer_fault = e

    def _writer_loop(self):
        """Stage 2: push fetched host arrays into the sink."""
        while True:
            item = self._write_queue.get()
            if item is None:
                return
            if isinstance(item, threading.Event):   # flush barrier
                item.set()
                continue
            arr, meta, T = item
            if self._writer_fault is not None:
                continue
            try:
                try:
                    self.output.write(arr, meta)
                except TypeError:
                    self.output.write(arr)
                self._tracepoint("output,write %d" % T)
            except BaseException as e:               # noqa: BLE001
                log.error("output writer failed: %s", e)
                self._writer_fault = e

    def _flush_output(self):
        """Barrier: wait until every dispatched batch has been written."""
        ev = threading.Event()
        self._out_queue.put(ev)
        ev.wait()
        if self._writer_fault is not None:
            e, self._writer_fault = self._writer_fault, None
            raise e

    def close(self):
        self._flush_output()
        self._out_queue.put(None)
        self._fetcher.join(timeout=5)
        self._writer.join(timeout=5)
        if hasattr(self.output, "close"):
            self.output.close()

    def _note_stats(self, stats, n):
        """Fold one batch's device stats into the bounded RC accumulators
        (the reference's myClipRatios/myErrorClipRatios/myMERs deques,
        src/OfdmGenerator.cpp:277-300).  `n` is the batch's OFDM cell count
        (samples before GI insertion), the clip-ratio denominator."""
        self.last_stats = stats
        if "cfr_clip" in stats:
            self._clip_ratios.append(
                float(np.asarray(stats["cfr_clip"]).sum()) / n)
            self._errclip_ratios.append(
                float(np.asarray(stats["cfr_errclip"]).sum()) / n)
        if "mer_db" in stats:
            mer = np.asarray(stats["mer_db"])
            valid = np.asarray(stats["mer_valid"])
            self._mers.extend(mer[valid].tolist())

    def _clip_stats(self):
        if not self._clip_ratios or not self._mers:
            return "No stats available"
        clip = float(np.mean(self._clip_ratios))
        err = float(np.mean(self._errclip_ratios))
        mer = float(np.mean(self._mers))
        # format per src/OfdmGenerator.cpp:437-441
        return (f"Statistics : {clip * 100:.6f}% samples clipped, "
                f"{err * 100:.6f}% errors clipped. "
                f"MER after CFR: {mer:.6f} dB")

    def _papr_stats(self):
        st = self.last_stats
        before = (f"{float(np.asarray(st['papr_before_cfr']).mean()):.6f}"
                  if "papr_before_cfr" in st else "N/A")
        after = (f"{float(np.asarray(st['papr_after_cfr']).mean()):.6f}"
                 if "papr_after_cfr" in st else "N/A")
        return f"PAPR [dB]: {before}, {after}"

    # ------------------------------------------------------------------
    def _ensure_modulator(self, layout):
        from .models import get_modulator
        if self._rebuild and self.modulator is not None:
            old_state = self.state
            old_layout = self.modulator.layout
            try:
                self.modulator = get_modulator(layout, self.settings)
            except Exception as e:      # noqa: BLE001
                # a bad RC-supplied setting (e.g. malformed coef file) must
                # not take down the transmitter; keep the previous pipeline
                # (the reference invalidates the settings and carries on,
                # src/MemlessPoly.cpp:226-231)
                log.error("pipeline rebuild failed, keeping previous "
                          "configuration: %s", e)
                self._rebuild = False
                return
            log.info("RC parameter change; pipeline %s",
                     "reused from compiled cache"
                     if getattr(self.modulator, "cache_hit", False)
                     else "rebuilt")
            new_state = self.modulator.init_state()
            if old_layout == layout and old_state is not None:
                # keep the time-interleaver history across the rebuild
                new_state["ti_history"] = old_state["ti_history"]
                new_state["tf_index"] = old_state["tf_index"]
            self.state = new_state
            self._rebuild = False
            return
        if self.modulator is None or self.modulator.layout != layout:
            if self.modulator is not None:
                log.warning("ensemble layout changed; rebuilding pipeline")
            self.modulator = get_modulator(layout, self.settings)
            self.state = self.modulator.init_state()
            self._rebuild = False

    def stop(self):
        """Ask the run loop to end after the current batch (live-stream
        inputs never reach EOF, so an external stop is the only clean way
        to end them -- the reference's SIGINT handler plays this role,
        src/DabMod.cpp:87-97).  Stream readers are interrupted mid-recv so
        the latency is bounded by their sub-second socket tick."""
        self._stop.set()
        req = getattr(self.reader, "request_stop", None)
        if req is not None:
            req()

    def _poll_dynamic_offset(self):
        """Re-read the delaymanagement dynamic offset file when it changes
        (management=dynamic), without a restart."""
        path = self.settings.tist_dynamic_offset_file
        if not path:
            return
        try:
            mtime = __import__("os").stat(path).st_mtime
        except OSError:
            return
        if mtime == self._dyn_offset_mtime:
            return
        self._dyn_offset_mtime = mtime
        try:
            with open(path) as f:
                offset = float(f.read().split()[0])
        except (OSError, ValueError, IndexError) as e:
            log.warning("dynamic offset file %s unreadable: %s", path, e)
            return
        if offset != self.ts_decoder.offset_s:
            log.info("delaymanagement: dynamic offset now %f s", offset)
            self.ts_decoder.offset_s = offset

    def _take_reader_times(self, n: int):
        """Move n just-read per-frame timestamps from the reader into the
        _pending-aligned buffer (no-op for non-EDI readers)."""
        ts = getattr(self.reader, "timestamps", None)
        if ts is None or n == 0:
            return
        take, del_n = ts[:n], min(n, len(ts))
        del ts[:del_n]
        arr = np.asarray(take, np.float64).reshape(len(take), 3)
        if self._pending_times is None:
            self._pending_times = np.empty((0, 3), np.float64)
        self._pending_times = np.concatenate([self._pending_times, arr])

    def _drop_until_fp0(self):
        """Do not start the pipeline before frame phase 0, so all blocks are
        properly aligned (ref: src/DabMod.cpp:683-692).  Operates on raw
        pending frames via the FC header byte."""
        if self._aligned or self._pending.shape[0] == 0:
            return
        fp = (self._pending[:, 6] >> 5) & 0x7
        zeros = np.nonzero(fp == 0)[0]
        if zeros.size == 0:
            self._pending = self._pending[:0]
            if self._pending_times is not None:
                self._pending_times = self._pending_times[:0]
            return
        k = int(zeros[0])
        self._pending = self._pending[k:]
        if self._pending_times is not None:
            self._pending_times = self._pending_times[k:]
        self._aligned = True

    def _check_continuity(self, batch):
        """FCT continuity over the batch (ref: src/DabMod.cpp:694-707)."""
        fct = batch.fct.astype(np.int64)
        first = fct[0] if self._last_fct < 0 else (self._last_fct + 1) % 250
        expected = (first + np.arange(len(fct))) % 250
        ok = fct == expected
        if not np.all(ok):
            bad = int(np.nonzero(~ok)[0][0])
            raise FctDiscontinuity(
                f"ETI FCT discontinuity, expected {expected[bad]} "
                f"received {fct[bad]}", bad)
        self._last_fct = int(fct[-1])

    def run_batches(self, max_batches: int | None = None) -> RunResult:
        """Run up to max_batches through the pipelined loop, then drain the
        output writer so callers observe a fully-written sink."""
        result = self._run_batches_inner(max_batches)
        try:
            self._flush_output()
        except BaseException as e:       # noqa: BLE001
            log.error("output write failed: %s", e)
            return RunResult.FAILURE
        return result

    def _run_batches_inner(self, max_batches: int | None = None) -> RunResult:
        s = self.settings
        # a live stream source (TCP/EDI) signals timeouts with empty
        # batches; only file-like readers can reach end-of-stream
        # (ref: src/DabMod.cpp:613-627 ignores empty TCP frames and only
        # ends on InputFileReader EOF)
        stream = getattr(self.reader, "never_eof", False)
        batches_done = 0
        while max_batches is None or batches_done < max_batches:
            if self._stop.is_set():
                return RunResult.NORMAL_END
            self._poll_dynamic_offset()
            # peek at layout with one frame if we have none pending
            need_probe = self._pending.shape[0] == 0
            probe = self.reader.read_batch(4 if need_probe else 0)
            if probe.size:
                self._pending = np.concatenate([self._pending, probe])
                self._take_reader_times(len(probe))
            self._drop_until_fp0()
            if self._pending.shape[0] == 0:
                if probe.size == 0 and not stream:
                    return RunResult.NORMAL_END
                continue
            try:
                head = parse_eti_frames(self._pending[:1])
            except EtiError as e:
                log.error("ETI parse error: %s", e)
                return RunResult.FAILURE
            layout = head.layout
            self._ensure_modulator(layout)
            C = self.modulator.p.cif_count
            need = s.batch_tf * C

            while self._pending.shape[0] < need:
                more = self.reader.read_batch(need - self._pending.shape[0])
                if more.size == 0:
                    break
                self._pending = np.concatenate([self._pending, more])
                self._take_reader_times(len(more))

            T = (self._pending.shape[0] // C) * C
            if T == 0:
                if stream:
                    continue        # timeout: keep the transmitter alive
                return RunResult.NORMAL_END
            raw, self._pending = self._pending[:T], self._pending[T:]
            times_batch = None
            if self._pending_times is not None:
                times_batch = self._pending_times[:T]
                self._pending_times = self._pending_times[T:]

            def _requeue_times(from_idx):
                if times_batch is not None:
                    self._pending_times = np.concatenate(
                        [times_batch[from_idx:], self._pending_times])

            try:
                batch = parse_eti_frames(raw)
            except EnsembleReconfigured:
                # replay frame-by-frame on next run with a fresh pipeline
                self._pending = np.concatenate([raw, self._pending])
                _requeue_times(0)
                self.modulator = None
                return RunResult.RECONFIGURE

            try:
                self._check_continuity(batch)
            except FctDiscontinuity as e:
                log.warning("%s", e.args[0])
                # requeue the frames from the discontinuity on; the restart
                # realigns to FP 0 there (the reference restarts its whole
                # flowgraph at this point, src/DabMod.cpp:694-707)
                self._pending = np.concatenate(
                    [raw[e.args[1]:], self._pending])
                _requeue_times(e.args[1])
                self._aligned = False
                self._last_fct = -1
                return RunResult.AGAIN

            # timestamps: EDI gives UTC directly, ETI needs the MNSC decode.
            # One timestamp per *transmission frame* (its earliest ETI
            # frame's), so SFN gating can act per TF downstream
            # (ref: src/output/SDR.cpp:135-201).
            tf_ts = []
            if times_batch is not None and len(times_batch):
                for i in range(len(batch)):
                    if i < len(times_batch):
                        seconds, utco, _tsta = times_batch[i]
                        # EDI epoch is 2000-01-01 plus UTCO leap-second
                        # offset (ref: src/EtiReader.cpp:476-529)
                        posix = int(seconds) + 946_684_800 + 32 - int(utco)
                        self.ts_decoder.update_edi(
                            posix, batch.tist_pps[i], batch.fct[i],
                            batch.fp[i])
                    if i % C == 0:
                        tf_ts.append(self.ts_decoder.timestamp())
            else:
                tf_ts = self.ts_decoder.update_eti_batch(
                    batch.fp, batch.mnsc, batch.tist_pps, batch.fct, C)

            # feed the FIC decoder for ensemble info (RC `ensemble info`,
            # like the reference's showjson on the EDI path)
            self.fic_decoder.process(batch.fic[0].tobytes())

            # asynchronous dispatch: JAX returns device futures immediately,
            # so the next loop iteration parses batch N+1 while the chip
            # computes batch N and the writer thread drains batch N-1
            self._tracepoint("modulate,dispatch %d" % T)
            if self.settings.trace_dir:
                # per-stage .dat dumps (the reference's --enable-trace
                # node files): runs the modulator eagerly -- debug only
                iq, self.state, stats = self.modulator.modulate_traced(
                    batch.fic, tuple(batch.subchannels), self.state,
                    self.settings.trace_dir)
            else:
                iq, self.state, stats = self.modulator.modulate_eti(
                    batch, self.state)
            meta = [(int(batch.fct[i * C]), tf_ts[i])
                    for i in range(len(tf_ts))]
            p = self.modulator.p
            n_cells = (T // C) * p.spacing * (p.nb_symbols + 1)
            for part in (iq if isinstance(iq, tuple) else (iq,)):
                try:
                    # start the D2H transfer now so it overlaps the writer
                    # thread's file write of the previous batch
                    part.copy_to_host_async()
                except AttributeError:
                    pass
            self._out_queue.put((iq, stats, meta, T, n_cells))
            self.framecount += T
            if self._t0 is None:
                self._t0 = time.perf_counter()
            self._frames_timed += T
            batches_done += 1
            if self.framecount >= self._next_fault_poll:
                rcs.check_faults()
                self._next_fault_poll = self.framecount + RC_FAULT_POLL_FRAMES
            if self._writer_fault is not None:
                return RunResult.FAILURE
        return RunResult.NORMAL_END

    def _tracepoint(self, msg: str):
        if self._trace is not None:
            self._trace.write("%d,%s\n" % (time.monotonic_ns() // 1000, msg))

    def log_process_time(self):
        """Throughput summary, the fused-pipeline analogue of the per-node
        timing table (ref: src/Flowgraph.cpp:248-267)."""
        if self._t0 is None or self._frames_timed <= 0:
            return
        dt = time.perf_counter() - self._t0
        if dt <= 0:
            return
        frames_s = self._frames_timed / dt
        log.info("processed %d ETI frames in %.2f s: %.1f frames/s "
                 "(%.1fx real-time)", self._frames_timed, dt, frames_s,
                 frames_s * 0.024)

    # ------------------------------------------------------------------
    def run(self, max_batches: int | None = None) -> int:
        """Supervisor: restart on AGAIN/RECONFIGURE like the reference's
        while(run_again) loop (src/DabMod.cpp:517-587)."""
        stalled = 0
        last_framecount = -1
        while True:
            result = self.run_batches(max_batches)
            if result == RunResult.NORMAL_END:
                return 0
            if result == RunResult.FAILURE:
                return 1
            self.num_restarts += 1
            # a restart discards pipeline state, like the reference tearing
            # down and rebuilding its flowgraph (src/DabMod.cpp:520-536)
            if self.modulator is not None:
                self.state = self.modulator.init_state()
            stalled = stalled + 1 if self.framecount == last_framecount else 0
            last_framecount = self.framecount
            if stalled > 100:
                log.error("restart loop making no progress; giving up")
                return 1
            log.info("restarting modulator (%s, restart #%d)",
                     result.name, self.num_restarts)
            time.sleep(0)


class FctDiscontinuity(EtiError):
    """args = (message, index_of_first_bad_frame_in_batch)."""
