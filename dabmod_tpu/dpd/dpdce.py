"""DPD computation engine CLI (port of python/dpdce.py workflow,
python/README.md:25-60):

    measure aligned TX/RX burst -> extract binned statistics -> fit the
    memoryless polynomial -> push coefficients via remote control -> repeat.

Run against a modulator with an SDR output exposing the feedback port:

    python -m dabmod_tpu.dpd.dpdce --rc tcp://localhost:9400 \
        --feedback-port 50055 --iterations 10
"""
from __future__ import annotations

import argparse
import logging
import time

import numpy as np

from . import Adapt, ExtractStatistic, Measure, Poly
from .measure import normalise_rx, phase_align

log = logging.getLogger("dpdce")


def run_engine(rc_endpoint: str, feedback_host: str, feedback_port: int,
               iterations: int = 10, samples_per_burst: int = 40960,
               coef_path: str = "/tmp/dabmod_tpu_poly.coef",
               learning_rate: float = 0.5,
               sleep_s: float = 0.1) -> Poly:
    measure = Measure(feedback_host, feedback_port, samples_per_burst)
    adapt = Adapt(rc_endpoint, coef_path)
    model = Poly(learning_rate_am=learning_rate,
                 learning_rate_pm=learning_rate)

    for i in range(iterations):
        tx, tx_ts, rx, rx_ts = measure.get_samples()
        if tx.size == 0:
            log.warning("empty burst, retrying")
            time.sleep(sleep_s)
            continue
        peak = float(np.abs(tx).max()) or 1.0
        txn, rxn = tx / peak, rx / peak
        rxn = phase_align(txn, normalise_rx(txn, rxn))
        es = ExtractStatistic(peak_amplitude=1.0)
        tx_avg, rx_avg, ph = es.extract(txn, rxn)
        if tx_avg.size < 8:
            log.warning("iteration %d: not enough bins (%d)", i, tx_avg.size)
            time.sleep(sleep_s)
            continue
        model.train(tx_avg, rx_avg, ph)
        adapt.set_predistorter(model.get_dpd_data())
        resid = float(np.mean((model.am_am(rx_avg) - tx_avg) ** 2))
        log.info("iteration %d: %d bins, am residual %.3e, coefs %s",
                 i, tx_avg.size, resid,
                 np.round(model.coefs_am, 4).tolist())
        time.sleep(sleep_s)
    return model


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--rc", default="tcp://localhost:9400")
    ap.add_argument("--feedback-host", default="127.0.0.1")
    ap.add_argument("--feedback-port", type=int, default=50055)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--samples", type=int, default=40960)
    ap.add_argument("--lr", type=float, default=0.5)
    args = ap.parse_args(argv)
    run_engine(args.rc, args.feedback_host, args.feedback_port,
               args.iterations, args.samples, learning_rate=args.lr)


if __name__ == "__main__":
    main()
