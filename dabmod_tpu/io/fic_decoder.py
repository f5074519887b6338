"""FIC decoder: extract ensemble/service information from the FIC channel
for the RC `showjson` surface (compact port of src/FigParser.{h,cpp}
FICDecoder and src/CharsetTools.cpp; EDI/monitoring path only -- the
modulator itself treats the FIC as opaque bits).

Handles FIB iteration with CRC16 check, FIG 0/0 (ensemble information),
FIG 0/2 (service organisation), FIG 1/0 (ensemble label) and FIG 1/1
(programme service labels) with EBU Latin -> UTF-8 conversion.
"""
from __future__ import annotations

import dataclasses

from .edi import crc16

# EBU Latin based repertoire (ETSI TS 101 756 Annex C), positions 0x00-0x7F
# that differ from ASCII plus the upper half; unmapped entries decode to
# their ASCII value or U+FFFD.
_EBU_HIGH = (
    "áàéèíìóòúùÑÇŞβ¡Ÿ"
    "âäêëîïôöûüñçşğıÿ"
    "ĶŅ©ĢĞěňőĦħŐłĀŪ§Ä"
    "ąēīōū±²³±ŗŖ¼½¾£$"
    "ĂĈĎĚĹĽŃÔŘŚŤŹŽŻÐŧ"
    "ăĉďěĺľńôřśťźžżđŀ"
    "ÁÀÉÈÍÌÓÒÚÙŘČŠŽÐĿ"
    "áàéèíìóòúùřčšžđŀ")


def ebu_latin_to_utf8(data: bytes) -> str:
    out = []
    for b in data:
        if b == 0:
            break
        if b < 0x80:
            out.append(chr(b))
        else:
            idx = b - 0x80
            out.append(_EBU_HIGH[idx] if idx < len(_EBU_HIGH) else "�")
    return "".join(out).strip()


@dataclasses.dataclass
class Service:
    sid: int
    label: str = ""
    components: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class EnsembleInfo:
    eid: int = 0
    label: str = ""
    short_label: str = ""
    al_flag: bool = False
    services: dict = dataclasses.field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "ensemble": {"id": f"0x{self.eid:04x}", "label": self.label,
                         "shortlabel": self.short_label},
            "services": [
                {"sid": f"0x{s.sid:04x}", "label": s.label,
                 "components": s.components}
                for s in sorted(self.services.values(), key=lambda s: s.sid)],
        }


class FICDecoder:
    FIB_LEN = 32      # 30 data + 2 CRC

    def __init__(self):
        self.ensemble = EnsembleInfo()

    def process(self, fic: bytes):
        for i in range(0, len(fic) - self.FIB_LEN + 1, self.FIB_LEN):
            self._process_fib(fic[i:i + self.FIB_LEN])

    def _process_fib(self, fib: bytes):
        if crc16(fib[:30]) != int.from_bytes(fib[30:32], "big"):
            return
        offset = 0
        while offset < 30:
            head = fib[offset]
            if head == 0xFF:   # end marker
                break
            fig_type = head >> 5
            fig_len = head & 0x1F
            if fig_len == 0 or offset + 1 + fig_len > 30:
                break
            body = fib[offset + 1:offset + 1 + fig_len]
            if fig_type == 0:
                self._fig0(body)
            elif fig_type == 1:
                self._fig1(body)
            offset += 1 + fig_len

    def _fig0(self, body: bytes):
        if not body:
            return
        header = body[0]
        oe = (header >> 6) & 1
        pd = (header >> 5) & 1
        ext = header & 0x1F
        if oe:
            return
        data = body[1:]
        if ext == 0 and len(data) >= 4:
            # FIG 0/0 ensemble information
            self.ensemble.eid = (data[0] << 8) | data[1]
            self.ensemble.al_flag = bool(data[2] & 0x20)
        elif ext == 2:
            # FIG 0/2 service organisation
            i = 0
            while i < len(data):
                if pd:
                    if i + 4 > len(data):
                        break
                    sid = int.from_bytes(data[i:i + 4], "big")
                    i += 4
                else:
                    if i + 2 > len(data):
                        break
                    sid = int.from_bytes(data[i:i + 2], "big")
                    i += 2
                if i >= len(data):
                    break
                ncomp = data[i] & 0x0F
                i += 1
                svc = self.ensemble.services.setdefault(sid, Service(sid))
                comps = []
                for _ in range(ncomp):
                    if i + 2 > len(data):
                        break
                    tmid = data[i] >> 6
                    if tmid == 0:       # MSC stream audio
                        comps.append({"type": "audio",
                                      "ascty": data[i] & 0x3F,
                                      "subchid": data[i + 1] >> 2,
                                      "primary": bool(data[i + 1] & 0x2)})
                    elif tmid == 1:     # MSC stream data
                        comps.append({"type": "data",
                                      "dscty": data[i] & 0x3F,
                                      "subchid": data[i + 1] >> 2})
                    i += 2
                if comps:
                    svc.components = comps

    def _fig1(self, body: bytes):
        if len(body) < 1:
            return
        charset = body[0] >> 4
        ext = body[0] & 0x7
        data = body[1:]
        if charset != 0:    # only EBU Latin handled, like the reference
            return
        if ext == 0 and len(data) >= 18:
            # ensemble label: EId + 16 chars + flag field
            self.ensemble.eid = (data[0] << 8) | data[1]
            label = ebu_latin_to_utf8(data[2:18])
            flags = int.from_bytes(data[18:20], "big") if len(data) >= 20 \
                else 0
            self.ensemble.label = label
            self.ensemble.short_label = _short_label(data[2:18], flags)
        elif ext == 1 and len(data) >= 18:
            # programme service label: SId(16) + 16 chars
            sid = (data[0] << 8) | data[1]
            svc = self.ensemble.services.setdefault(sid, Service(sid))
            svc.label = ebu_latin_to_utf8(data[2:18])


def _short_label(chars: bytes, flags: int) -> str:
    out = []
    for i in range(16):
        if flags & (0x8000 >> i) and chars[i]:
            out.append(chars[i:i + 1])
    return ebu_latin_to_utf8(b"".join(out))
