"""FIC (FIG) decoder tests: FIB CRC, FIG 0/0, 0/2, 1/0, 1/1 labels."""
from dabmod_tpu.io.fic_decoder import FICDecoder
from dabmod_tpu.io.edi import crc16

def fib(figs: bytes) -> bytes:
    body = figs + b"\xff" * (30 - len(figs))
    return body[:30] + crc16(body[:30]).to_bytes(2, "big")

# FIG 0/0: type0 len5: header(ext 0) + EID + flags + cif count
fig00 = bytes([0x00 | 5, 0x00, 0x8A, 0xBC, 0x00, 0x10])
# FIG 1/0: type1: charset 0 ext 0, EID, 16-char label, flag field
label = b"Test Ensemble   "
fig10 = bytes([0x20 | (1 + 2 + 16 + 2), 0x00, 0x8A, 0xBC]) + label + (0xF000).to_bytes(2, "big")
# FIG 1/1: programme service label
slabel = b"Radio One       "
fig11 = bytes([0x20 | (1 + 2 + 16 + 2), 0x01, 0x81, 0x11]) + slabel + (0xF800).to_bytes(2, "big")
# FIG 0/2: service org: sid(2) + flags/ncomp=1 + comp (tmid0 audio subch 5 primary)
fig02 = bytes([0x00 | 6, 0x02, 0x81, 0x11, 0x01, 0x00, (5 << 2) | 0x2])

def test_fic_decoder():
    d = FICDecoder()
    d.process(fib(fig00) + fib(fig10))
    d.process(fib(fig11 + fig02))
    info = d.ensemble.to_json()
    print(info)
    assert info["ensemble"]["id"] == "0x8abc"
    assert info["ensemble"]["label"] == "Test Ensemble"
    assert info["ensemble"]["shortlabel"] == "Test"
    svcs = info["services"]
    assert svcs[0]["sid"] == "0x8111" and svcs[0]["label"] == "Radio One"
    assert svcs[0]["components"][0]["subchid"] == 5
    print("FICDecoder OK")
