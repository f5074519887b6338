"""Native C++ component tests: equivalence with the pure-Python paths."""
import os

import numpy as np
import pytest

from dabmod_tpu import native
from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
from dabmod_tpu.io import rs
from dabmod_tpu.io.edi import crc16 as py_crc16


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def test_crc16_matches_python():
    rng = np.random.default_rng(0)
    for n in (1, 10, 1000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc16(data) == py_crc16(data)


def test_rs_native_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, rs.K, dtype=np.uint8)
    parity = native.rs_encode(data)
    # parity must match the python encoder
    np.testing.assert_array_equal(parity, rs.encode(data))
    block = np.concatenate([data, parity])
    b = block.copy()
    assert native.rs_decode(b) == 0
    pos = rng.choice(255, 20, replace=False)
    b[pos] ^= rng.integers(1, 256, 20).astype(np.uint8)
    assert native.rs_decode(b) == 20
    np.testing.assert_array_equal(b, block)
    # erasures
    b = block.copy()
    pos = rng.choice(255, 48, replace=False)
    b[pos] = 0
    assert native.rs_decode(b, pos.astype(np.int32)) >= 0
    np.testing.assert_array_equal(b, block)


def test_native_eti_parse_matches_python():
    raw = synth_eti_batch(8, mode=1,
                          subch_specs=((0, 24, 0x22), (48, 48, 0x02)))
    a = parse_eti_frames(raw)            # native path
    os.environ["DABMOD_NO_NATIVE"] = "1"
    try:
        # force the numpy path by bypassing the native branch
        import dabmod_tpu.native as nat
        saved = nat._lib, nat._load_attempted
        nat._lib, nat._load_attempted = None, True
        b = parse_eti_frames(raw)
        nat._lib, nat._load_attempted = saved
    finally:
        del os.environ["DABMOD_NO_NATIVE"]
    assert a.layout == b.layout
    np.testing.assert_array_equal(a.fct, b.fct)
    np.testing.assert_array_equal(a.fp, b.fp)
    np.testing.assert_array_equal(a.mnsc, b.mnsc)
    np.testing.assert_array_equal(a.tist_pps, b.tist_pps)
    np.testing.assert_array_equal(a.fic, b.fic)
    for x, y in zip(a.subchannels, b.subchannels):
        np.testing.assert_array_equal(x, y)


def test_native_convert_matches_numpy():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(10000) * 30000).astype(np.float32)
    out, n = native.convert(x, "s16")
    expect = np.clip(x, -32768.0, 32767.0)
    assert n == int((expect != x).sum())
    np.testing.assert_array_equal(out, expect.astype(np.int16))
    out, n = native.convert(x / 200, "s8")
    e = np.clip(x / 200, -128.0, 127.0)
    np.testing.assert_array_equal(out, e.astype(np.int8))
