"""FIC (FIG) decoder tests over the reference FICDecoder's full FIG set
(src/FigParser.cpp:132-186): 0/0, 0/1, 0/2, 0/5, 0/8, 0/9, 0/10, 0/13,
0/17, 0/18, 0/19 and labels 1/0, 1/1, 1/4."""
from dabmod_tpu.io.fic_decoder import FICDecoder
from dabmod_tpu.io.edi import crc16


def fib(figs: bytes) -> bytes:
    body = figs + b"\xff" * (30 - len(figs))
    return body[:30] + crc16(body[:30]).to_bytes(2, "big")


def fig0(ext: int, data: bytes, pd: int = 0) -> bytes:
    return bytes([0x00 | (1 + len(data)), (pd << 5) | ext]) + data


# FIG 0/0: EID + flags + cif count
fig00 = fig0(0, bytes([0x8A, 0xBC, 0x00, 0x10]))
# FIG 1/0: charset 0 ext 0, EID, 16-char label, flag field
label = b"Test Ensemble   "
fig10 = bytes([0x20 | (1 + 2 + 16 + 2), 0x00, 0x8A, 0xBC]) + label \
    + (0xF000).to_bytes(2, "big")
# FIG 1/1: programme service label
slabel = b"Radio One       "
fig11 = bytes([0x20 | (1 + 2 + 16 + 2), 0x01, 0x81, 0x11]) + slabel \
    + (0xF800).to_bytes(2, "big")
# FIG 0/2: service org: sid + ncomp=1 + comp (tmid0 DAB+ subch 5 primary)
fig02 = fig0(2, bytes([0x81, 0x11, 0x01, 63, (5 << 2) | 0x2]))


def test_fic_decoder_basic():
    d = FICDecoder()
    d.process(fib(fig00) + fib(fig10))
    d.process(fib(fig11 + fig02))
    info = d.ensemble.to_json()
    assert info["ensemble"]["id"] == "0x8abc"
    assert info["ensemble"]["label"] == "Test Ensemble"
    assert info["ensemble"]["shortlabel"] == "Test"
    svcs = info["services"]
    assert svcs[0]["sid"] == "0x8111" and svcs[0]["label"] == "Radio One"
    comp = svcs[0]["components"][0]
    assert comp["subchannel_id"] == 5
    assert comp["type"] == "DAB+" and comp["primary"]


def test_fic_decoder_subchannel_org():
    d = FICDecoder()
    # FIG 0/1 long form: subchid 5, start 100, EEP option 0 (A) pl idx 2
    # (EEP 3-A), size 48 CUs -> bitrate 48/6*8 = 64 kbit/s
    long_form = bytes([(5 << 2) | (100 >> 8), 100 & 0xFF,
                       0x80 | (0 << 4) | (2 << 2) | (48 >> 8), 48 & 0xFF])
    # short form: subchid 6, start 200, UEP table index 19 (40 CUs,
    # PL 5, 80 kbit/s per EN 300 401 Table 6)
    short_form = bytes([(6 << 2) | (200 >> 8), 200 & 0xFF, 19])
    d.process(fib(fig0(1, long_form + short_form)))
    # FIG 0/5 short form: subchannel 5 language 0x08 (German)
    d.process(fib(fig0(5, bytes([5, 0x08]))))
    subs = d.ensemble.to_json()["subchannels"]
    assert subs["5"] == {"start": 100, "size": 48, "protection": "EEP 3-A",
                         "bitrate_kbps": 64, "language": "German"}
    assert subs["6"] == {"start": 200, "size": 40, "protection": "UEP 5",
                         "bitrate_kbps": 80}


def test_fic_decoder_component_definition_and_label():
    d = FICDecoder()
    # FIG 0/8 short form: sid 0x8111, scids 3 -> subchid 7
    d.process(fib(fig0(8, bytes([0x81, 0x11, 0x03, 0x07]))))
    # FIG 1/4: component label for sid 0x8111 scids 3
    clabel = b"Component Three "
    fig14 = bytes([0x20 | (1 + 3 + 16 + 2), 0x04, 0x03, 0x81, 0x11]) \
        + clabel + (0x0000).to_bytes(2, "big")
    d.process(fib(fig14))
    svc = d.ensemble.services[0x8111]
    assert svc.comp_defs == {3: 7}
    assert svc.comp_labels[3] == "Component Three"


def test_fic_decoder_ecc_time_pty_announcements():
    d = FICDecoder()
    # FIG 0/9: LTO +2 half-hours, ECC 0xE1, international table 0x01
    d.process(fib(fig0(9, bytes([0x02, 0xE1, 0x01]))))
    # FIG 0/10 long form: MJD for 2020-01-01 = 58849, 12:34:56.789
    mjd = 58849
    b0 = (mjd >> 10) & 0x7F
    b1 = (mjd >> 2) & 0xFF
    b2 = ((mjd & 0x3) << 6) | 0x08 | (12 >> 2)
    b3 = ((12 & 0x3) << 6) | 34
    b4 = (56 << 2) | (789 >> 8)
    b5 = 789 & 0xFF
    d.process(fib(fig0(10, bytes([b0, b1, b2, b3, b4, b5]))))
    # FIG 0/17: sid 0x8111 static PTY 10 (Pop Music in RDS table)
    d.process(fib(fig0(17, bytes([0x81, 0x11, 0x00, 10]))))
    # FIG 0/18: sid 0x8111 ASu flags 0x0001 (Alarm), 1 cluster 0x22
    d.process(fib(fig0(18, bytes([0x81, 0x11, 0x00, 0x01, 0x01, 0x22]))))
    # FIG 0/19: cluster 0x22 ASw flags 0x0001 subch 5
    d.process(fib(fig0(19, bytes([0x22, 0x00, 0x01, 0x05]))))
    info = d.ensemble.to_json()
    ens = info["ensemble"]
    assert ens["ecc"] == "0xe1" and ens["lto"] == "+01:00"
    assert ens["utc_time"] == "2020-01-01 12:34:56.789"
    svc = info["services"][0]
    assert svc["pty"] == "Pop Music"
    assert svc["announcements"] == {"flags": ["Alarm"], "clusters": [0x22]}
    assert info["announcement_switching"]["0x22"] == {
        "flags": 1, "subchannel_id": 5}


def test_fic_decoder_user_applications():
    d = FICDecoder()
    # FIG 0/13: sid 0x8111, scids 0, 1 UA: type 0x002 (Slideshow), 2 bytes
    ua = bytes([0x81, 0x11, 0x01, 0x00 | (0x002 >> 3),
                ((0x002 & 0x7) << 5) | 2, 0xAB, 0xCD])
    d.process(fib(fig0(13, ua)))
    svc = d.ensemble.to_json()["services"][0]
    assert svc["user_applications"] == [
        {"scids": 0, "type": "slideshow", "ua_data": [0xAB, 0xCD]}]
