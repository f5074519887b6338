#!/usr/bin/env python3
"""Munin plugin: present dabmod-tpu RC statistics to munin over the ZMQ RC
(port of doc/stats_dabmod_munin.py for the TPU-native modulator).

Copy to /etc/munin/plugins/dabmod and make executable.  Expects the ZMQ RC
at tcp://localhost:9400 (override with DABMOD_RC environment variable).
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

CONFIG = """
multigraph ofdm_clip_stats
graph_title OFDM CFR clip stats
graph_order clip_ratio errorclip_ratio
graph_vlabel ratio of samples/errors clipped
graph_category dabmod
clip_ratio.info Ratio of samples clipped
clip_ratio.label Ratio of samples clipped
errorclip_ratio.info Ratio of errors clipped
errorclip_ratio.label Ratio of errors clipped

multigraph ofdm_papr
graph_title PAPR after CFR
graph_category dabmod
papr.label PAPR dB

multigraph modulator_clips
graph_title Format conversion clips
graph_category dabmod
num_clipped_samples.label clipped samples

multigraph sdr_counters
graph_title SDR output counters
graph_order underruns dropped queue_overflows frames
graph_category dabmod
underruns.label underruns
dropped.label frames dropped (timestamp in past)
queue_overflows.label queue overflows
frames.label frames transmitted

multigraph sdr_gpsdo
graph_title GPSDO status (ref: doc/stats_dabmod_munin.py:16-40)
graph_order gpsdo_num_sv gpsdo_holdover
graph_category dabmod
gpsdo_num_sv.info Number of GPS satellites used
gpsdo_num_sv.label GPS SVs
gpsdo_holdover.info 1 when the GPSDO lost its fix and runs in holdover
gpsdo_holdover.label holdover
"""


def main():
    endpoint = os.environ.get("DABMOD_RC", "tcp://localhost:9400")
    if len(sys.argv) > 1 and sys.argv[1] == "config":
        print(CONFIG)
        return
    from dabmod_tpu.rc.client import ModRemoteControl
    rc = ModRemoteControl(endpoint)
    out = []
    try:
        clip_stats = rc.get_param_value("ofdm", "clip_stats")
        m = re.search(r"([0-9.]+)% samples clipped, ([0-9.]+)% errors",
                      clip_stats)
        out.append("multigraph ofdm_clip_stats")
        if m:
            out.append(f"clip_ratio.value {float(m.group(1)) / 100}")
            out.append(f"errorclip_ratio.value {float(m.group(2)) / 100}")
        papr = rc.get_param_value("ofdm", "papr")
        m = re.search(r"PAPR \[dB\]: .*?, ([0-9.]+)", papr)
        out.append("multigraph ofdm_papr")
        if m:
            out.append(f"papr.value {m.group(1)}")
        out.append("multigraph modulator_clips")
        out.append("num_clipped_samples.value "
                   + rc.get_param_value("modulator", "num_clipped_samples"))
        # SDR module is present only for SDR outputs
        out.append("multigraph sdr_counters")
        for key in ("underruns", "dropped", "queue_overflows", "frames"):
            try:
                out.append(f"{key}.value "
                           + rc.get_param_value("sdr", key))
            except Exception:       # noqa: BLE001
                break
        out.append("multigraph sdr_gpsdo")
        for key in ("gpsdo_num_sv", "gpsdo_holdover"):
            try:
                out.append(f"{key}.value "
                           + rc.get_param_value("sdr", key))
            except Exception:       # noqa: BLE001
                break
    finally:
        rc.close()
    print("\n".join(out))


if __name__ == "__main__":
    main()
