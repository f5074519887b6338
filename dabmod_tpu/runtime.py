"""Streaming runtime: the supervisor loop around the compiled modulator.

Mirror of the reference's launch_modulator / run_modulator state machine
(src/DabMod.cpp:365-738): FP-0 alignment before starting, FCT continuity
check with restart-keeping-input, ensemble reconfiguration detection with
pipeline rebuild, and per-batch timestamp tracking.  The difference is
granularity: the reference runs one 24 ms ETI frame at a time; this runtime
accumulates `batch_tf` transmission frames and executes them as one device
step, overlapping host parsing with device compute.
"""
from __future__ import annotations

import enum
import logging
import time

import numpy as np

from . import tables
from .config import ModSettings
from .eti import EnsembleReconfigured, EtiError, parse_eti_frames
from .io.outputs import open_output
from .io.readers import open_input
from .models.modulator import Modulator
from .timestamps import TimestampDecoder

log = logging.getLogger("dabmod_tpu")


class RunResult(enum.Enum):
    FAILURE = 0
    NORMAL_END = 1
    AGAIN = 2
    RECONFIGURE = 3


class ModRuntime:
    def __init__(self, settings: ModSettings):
        self.settings = settings
        self.reader = open_input(settings)
        self.output = open_output(settings)
        self.ts_decoder = TimestampDecoder(settings.tist_offset)
        self.modulator: Modulator | None = None
        self.state = None
        self.num_restarts = 0
        self.framecount = 0
        self._pending = np.empty((0, 6144), np.uint8)
        self._last_fct = -1
        self._aligned = False

    # ------------------------------------------------------------------
    def _ensure_modulator(self, layout):
        if self.modulator is None or self.modulator.layout != layout:
            if self.modulator is not None:
                log.warning("ensemble layout changed; rebuilding pipeline")
            self.modulator = Modulator(layout, self.settings)
            self.state = self.modulator.init_state()

    def _align(self, batch):
        """Drop frames until FP 0 and check FCT continuity
        (ref: src/DabMod.cpp:683-707)."""
        fct = batch.fct.astype(np.int64)
        fp = batch.fp.astype(np.int64) & 0x7
        start = 0
        if not self._aligned:
            zeros = np.nonzero(fp == 0)[0]
            if zeros.size == 0:
                return None
            start = int(zeros[0])
            self._aligned = True
            self._last_fct = int(fct[start]) - 1
        expected = (self._last_fct + 1 + np.arange(len(fct) - start)) % 250
        ok = fct[start:] == expected
        if not np.all(ok):
            bad = int(np.nonzero(~ok)[0][0]) + start
            raise FctDiscontinuity(
                f"ETI FCT discontinuity, expected {expected[bad - start]} "
                f"received {fct[bad]}")
        self._last_fct = int(fct[-1])
        return start

    def run_batches(self, max_batches: int | None = None) -> RunResult:
        s = self.settings
        batches_done = 0
        while max_batches is None or batches_done < max_batches:
            # peek at layout with one frame if we have none pending
            need_probe = self._pending.shape[0] == 0
            probe = self.reader.read_batch(4 if need_probe else 0)
            if probe.size:
                self._pending = np.concatenate([self._pending, probe])
            if self._pending.shape[0] == 0:
                return RunResult.NORMAL_END
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

            T = (self._pending.shape[0] // C) * C
            if T == 0:
                return RunResult.NORMAL_END
            raw, self._pending = self._pending[:T], self._pending[T:]

            try:
                batch = parse_eti_frames(raw)
            except EnsembleReconfigured:
                # replay frame-by-frame on next run with a fresh pipeline
                self._pending = np.concatenate([raw, self._pending])
                self.modulator = None
                return RunResult.RECONFIGURE

            try:
                start = self._align(batch)
            except FctDiscontinuity as e:
                log.warning("%s", e)
                self._aligned = False
                return RunResult.AGAIN
            if start is None:
                continue
            if start > 0:
                # drop pre-alignment frames; keep whole-TF granularity
                keep = raw[start:]
                self._pending = np.concatenate([keep, self._pending])
                continue

            # timestamps (sequential MNSC decode over the batch)
            for i in range(len(batch)):
                self.ts_decoder.update_eti(batch.fp[i], batch.mnsc[i],
                                           batch.tist_pps[i], batch.fct[i])

            iq, self.state, _stats = self.modulator.modulate_eti(
                batch, self.state)
            self.output.write(np.asarray(iq))
            self.framecount += T
            batches_done += 1
        return RunResult.NORMAL_END

    # ------------------------------------------------------------------
    def run(self, max_batches: int | None = None) -> int:
        """Supervisor: restart on AGAIN/RECONFIGURE like the reference's
        while(run_again) loop (src/DabMod.cpp:517-587)."""
        while True:
            result = self.run_batches(max_batches)
            if result == RunResult.NORMAL_END:
                return 0
            if result == RunResult.FAILURE:
                return 1
            self.num_restarts += 1
            log.info("restarting modulator (%s, restart #%d)",
                     result.name, self.num_restarts)
            time.sleep(0)


class FctDiscontinuity(EtiError):
    pass
