"""ctypes bindings for the native C++ runtime components (native/).

Builds the shared library on first use with g++ (cached next to the
sources), and degrades gracefully to the pure-NumPy implementations when a
toolchain is unavailable or DABMOD_NO_NATIVE=1 is set.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("dabmod_tpu.native")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "dabmod_native.cpp")
_SO = os.path.join(_REPO, "native", "libdabmod_native.so")

_lib = None
_load_attempted = False


def _build() -> bool:
    try:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return True
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", _SO, _SRC], check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        log.warning("native build failed (%s); using NumPy fallbacks", e)
        return False


def get_lib():
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("DABMOD_NO_NATIVE") == "1" or not _build():
        return None
    lib = ctypes.CDLL(_SO)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")

    lib.dab_crc16.restype = ctypes.c_uint16
    lib.dab_crc16.argtypes = [u8p, ctypes.c_size_t]

    lib.dab_parse_eti_batch.restype = ctypes.c_int
    lib.dab_parse_eti_batch.argtypes = [
        u8p, ctypes.c_size_t, u8p, u8p, u16p, u32p,
        u8p, ctypes.c_size_t, u8p, ctypes.c_size_t,
        u16p, ctypes.POINTER(ctypes.c_int)]

    lib.dab_rs_decode.restype = ctypes.c_int
    lib.dab_rs_decode.argtypes = [u8p, i32p, ctypes.c_int]

    lib.dab_rs_encode.restype = None
    lib.dab_rs_encode.argtypes = [u8p, u8p]

    for name, outp in (("dab_convert_s16", i16p), ("dab_convert_u8", u8p),
                       ("dab_convert_s8", i8p)):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_size_t
        fn.argtypes = [f32p, outp, ctypes.c_size_t]

    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# High-level wrappers
# ---------------------------------------------------------------------------


def crc16(data: bytes | np.ndarray) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(bytes(data), np.uint8) if not isinstance(
        data, np.ndarray) else np.ascontiguousarray(data, np.uint8)
    return int(lib.dab_crc16(buf, buf.size))


def rs_decode(block: np.ndarray, erasures=None) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    eras = np.asarray(erasures if erasures is not None else [], np.int32)
    if not eras.flags.c_contiguous:
        eras = np.ascontiguousarray(eras)
    return int(lib.dab_rs_decode(block, eras, eras.size))


def rs_encode(data: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    parity = np.zeros(48, np.uint8)
    lib.dab_rs_encode(np.ascontiguousarray(data, np.uint8), parity)
    return parity


def parse_eti_batch(raw: np.ndarray):
    """Native batch ETI parse; returns None when unavailable, raises
    dabmod_tpu.eti exceptions on malformed input, else a tuple
    (stc [(scid,sad,stl,tpl)...], fct, fp, mnsc, tist_pps, fic, subch_list)."""
    lib = get_lib()
    if lib is None:
        return None
    from .eti import EnsembleReconfigured, EtiError
    raw = np.ascontiguousarray(raw, np.uint8)
    T = raw.shape[0]
    mid = int((raw[0, 6] >> 3) & 0x3)
    fic_len = 128 if mid == 3 else 96
    fct = np.zeros(T, np.uint8)
    fp = np.zeros(T, np.uint8)
    mnsc = np.zeros(T, np.uint16)
    tist = np.zeros(T, np.uint32)
    fic = np.zeros((T, fic_len), np.uint8)
    subch_stride = 6144  # upper bound of per-frame payload
    subch = np.zeros((T, subch_stride), np.uint8)
    stc = np.zeros(64 * 4, np.uint16)
    nst = ctypes.c_int(0)
    ret = lib.dab_parse_eti_batch(raw, T, fct, fp, mnsc, tist, fic, fic_len,
                                  subch, subch_stride, stc, ctypes.byref(nst))
    if ret == -1:
        raise EtiError("FIC must be present to modulate")
    if ret in (-2, -3):
        raise EnsembleReconfigured("sub-channel table changed inside batch")
    if ret != 0:
        raise EtiError(f"native ETI parse error {ret}")
    n = nst.value
    stc_list = [(int(stc[4 * i]), int(stc[4 * i + 1]), int(stc[4 * i + 2]),
                 int(stc[4 * i + 3])) for i in range(n)]
    subch_list = []
    off = 0
    for (_, _, stl, _) in stc_list:
        size = stl * 8
        subch_list.append(subch[:, off:off + size])
        off += size
    return mid, stc_list, fct, fp, mnsc, tist, fic, subch_list


def convert(interleaved: np.ndarray, fmt: str):
    """Saturating format conversion; returns (out_array, n_clipped) or None."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(interleaved, np.float32).reshape(-1)
    if fmt == "s16":
        out = np.empty(x.size, np.int16)
        n = lib.dab_convert_s16(x, out, x.size)
    elif fmt == "u8":
        out = np.empty(x.size, np.uint8)
        n = lib.dab_convert_u8(x, out, x.size)
    elif fmt == "s8":
        out = np.empty(x.size, np.int8)
        n = lib.dab_convert_s8(x, out, x.size)
    else:
        return None
    return out, int(n)
