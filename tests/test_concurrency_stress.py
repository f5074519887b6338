"""Concurrency stress: the RC surface, writer pipeline and supervisor are
hand-synchronised (locks + queues + GIL); this is the closest analogue to
the reference's by-hand thread-safety discipline (SURVEY.md section 5
"race detection": mutexes around RC-mutable state, atomics for counters).
Hammer RC mutations from several threads while the runtime modulates and
assert clean completion, no deadlock, no writer fault."""
import threading
import time

import numpy as np

from dabmod_tpu import tables
from dabmod_tpu.config import ModSettings
from dabmod_tpu.eti import synth_eti_batch
from dabmod_tpu.rc import rcs
from dabmod_tpu.runtime import ModRuntime


def test_rc_mutation_storm_during_run(tmp_path):
    frames = synth_eti_batch(48, mode=1)
    inp = tmp_path / "in.eti"
    inp.write_bytes(frames.tobytes())
    s = ModSettings(input_name=str(inp), output="file",
                    output_name=str(tmp_path / "out.iq"),
                    file_output_format="s16", batch_tf=2)
    s.normalise_for_output()
    rt = ModRuntime(s)

    stop = threading.Event()
    errors = []

    def hammer(param_sets):
        while not stop.is_set():
            for mod, param, val in param_sets:
                try:
                    rcs.set_param(mod, param, val)
                    rcs.get_param(mod, param)
                    rcs.show(mod)
                except Exception as e:      # noqa: BLE001
                    errors.append(e)
                    return

    threads = [
        threading.Thread(target=hammer, args=([
            ("gain", "digital", "0.9"), ("gain", "digital", "1.0")],),
            daemon=True),
        threading.Thread(target=hammer, args=([
            ("tist", "offset", "0.1"), ("tist", "offset", "0.0")],),
            daemon=True),
        threading.Thread(target=hammer, args=([
            ("guardinterval", "windowlen", "16"),
            ("guardinterval", "windowlen", "0")],), daemon=True),
    ]
    for t in threads:
        t.start()
    rc = rt.run()           # digital-gain / windowlen changes rebuild live
    stop.set()
    for t in threads:
        t.join(timeout=10)
        assert not t.is_alive()
    rt.close()
    assert rc == 0
    assert not errors, errors
    # every input frame must have been modulated despite the rebuild storm
    assert rt.framecount == 48
    data = np.fromfile(tmp_path / "out.iq", np.int16)
    assert data.size == 12 * tables.mode_params(1).tf_samples * 2
