"""ETI input readers: file (Raw / Framed / Streamed framing auto-detection)
and TCP, batch-oriented.

Framing detection mirrors the reference's InputFileReader::IdentifyType
(src/InputFileReader.cpp:66-187): Raw = bare 6144-byte frames found by the
0x49c5f8ff / 0xb63a07ff sync words, Streamed = u32 frame count absent with a
u16 size prefix per frame, Framed = u32 nb_frames then u16-size-prefixed
frames.  Short frames are padded with 0x55 like the reference's Pad state.
"""
from __future__ import annotations

import socket

import numpy as np

from ..eti import ETI_NI_FRAME

SYNCS = (0x49C5F8FF, 0xB63A07FF)


def _u32le(b: bytes, off: int = 0) -> int:
    return int.from_bytes(b[off:off + 4], "little")


def _u16le(b: bytes, off: int = 0) -> int:
    return int.from_bytes(b[off:off + 2], "little")


class EtiFileReader:
    """Reads a whole ETI file into [T, 6144] raw frame batches."""

    def __init__(self, path: str, loop: bool = False):
        self.path = path
        self.loop = loop
        with open(path, "rb") as f:
            self._data = f.read()
        self.streamtype = self._identify()
        self._pos = 0

    def _identify(self) -> str:
        d = self._data
        if len(d) < 12:
            raise ValueError("input file too short")
        if _u32le(d, 0) in SYNCS:
            self._start = 0
            return "raw"
        # streamed: u16 size prefix, sync at offset 2
        if _u32le(d, 2) in SYNCS:
            return "streamed"
        # framed: u32 nbframes + u16 size, sync at offset 6
        if _u32le(d, 6) in SYNCS:
            return "framed"
        # raw with offset: search byte-by-byte
        for i in range(1, min(len(d) - 4, ETI_NI_FRAME + 10)):
            if _u32le(d, i) in SYNCS:
                self._start = i
                return "raw"
        raise ValueError("bad ETI input file format")

    def frames(self) -> np.ndarray:
        """All frames as [T, 6144] uint8 (padded to full frames)."""
        d = self._data
        if self.streamtype == "raw":
            d = d[self._start:]
            T = len(d) // ETI_NI_FRAME
            return np.frombuffer(d[:T * ETI_NI_FRAME],
                                 np.uint8).reshape(T, ETI_NI_FRAME)
        out = []
        pos = 4 if self.streamtype == "framed" else 0
        while pos + 2 <= len(d):
            fs = _u16le(d, pos)
            pos += 2
            if fs == 0 or fs > ETI_NI_FRAME or pos + fs > len(d):
                break
            frame = np.full(ETI_NI_FRAME, 0x55, np.uint8)
            frame[:fs] = np.frombuffer(d[pos:pos + fs], np.uint8)
            out.append(frame)
            pos += fs
        return np.stack(out) if out else np.empty((0, ETI_NI_FRAME), np.uint8)

    def read_batch(self, n: int) -> np.ndarray:
        """Next [<=n, 6144] frames; empty array at EOF (or wraps if loop)."""
        all_frames = self.frames()
        if self._pos >= len(all_frames):
            if not self.loop:
                return all_frames[:0]
            self._pos = 0
        batch = all_frames[self._pos:self._pos + n]
        self._pos += len(batch)
        return batch


class EtiTcpReader:
    """ETI over TCP (ref: src/InputTcpReader.cpp): a stream of raw 6144-byte
    frames; empty batches signal timeouts like the reference's empty frame."""

    def __init__(self, uri: str, timeout: float = 2.0):
        if uri.startswith("tcp://"):
            uri = uri[len("tcp://"):]
        host, port = uri.rsplit(":", 1)
        self.sock = socket.create_connection((host, int(port)))
        self.sock.settimeout(timeout)
        self._buf = b""

    def read_batch(self, n: int) -> np.ndarray:
        want = n * ETI_NI_FRAME
        try:
            while len(self._buf) < want:
                chunk = self.sock.recv(65536)
                if not chunk:
                    break
                self._buf += chunk
        except socket.timeout:
            pass
        T = len(self._buf) // ETI_NI_FRAME
        T = min(T, n)
        if T == 0:
            return np.empty((0, ETI_NI_FRAME), np.uint8)
        out = np.frombuffer(self._buf[:T * ETI_NI_FRAME],
                            np.uint8).reshape(T, ETI_NI_FRAME).copy()
        self._buf = self._buf[T * ETI_NI_FRAME:]
        return out

    def close(self):
        self.sock.close()


def open_input(settings):
    name = settings.input_name
    if settings.input_transport == "edi" or name.startswith("udp://"):
        from .edi import EdiInput
        return EdiInput(name)
    if settings.input_transport == "tcp" or name.startswith("tcp://"):
        return EtiTcpReader(name)
    return EtiFileReader(name, loop=settings.loop)
