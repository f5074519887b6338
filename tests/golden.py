"""Loader for the reference-generated golden vectors in tests/golden/."""
import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

_DTYPES = {"u8": np.uint8, "c8": np.complex64, "f4": np.float32,
           "i16": np.int16}


def _manifest():
    out = {}
    with open(os.path.join(GOLDEN_DIR, "manifest.txt")) as f:
        for line in f:
            name, dtype, n = line.split()
            out[name] = (dtype, int(n))
    return out


_MANIFEST = None


def load(name: str) -> np.ndarray:
    global _MANIFEST
    if _MANIFEST is None:
        _MANIFEST = _manifest()
    dtype, n = _MANIFEST[name]
    data = np.fromfile(os.path.join(GOLDEN_DIR, name + ".bin"),
                       dtype=_DTYPES[dtype])
    assert data.size == n, (name, data.size, n)
    return data
