"""INI configuration + CLI argument parsing + utils parity tests."""
import numpy as np
import pytest

from dabmod_tpu import utils
from dabmod_tpu.cli import build_settings
from dabmod_tpu.config import parse_ini
from dabmod_tpu.ops.ofdm import GAIN_FIX, GAIN_MAX, GAIN_VAR


EXAMPLE_INI = """
[remotecontrol]
telnet=1
telnetport=2121
zmqctrl=1
zmqctrlendpoint=tcp://127.0.0.1:9400

[log]
syslog=0
filelog=0
show_process_time=1

[input]
transport=file
source=test.eti
loop=1

[modulator]
gainmode=var
digital_gain=0.8
rate=4096000
mode=2
ofdmwindowing=90
normalise_variance=3.0

[cfr]
enable=1
clip=40.0
errorclip=3.0

[firfilter]
enabled=1
filtertapsfile=default

[tii]
enable=1
comb=3
pattern=42

[fileoutput]
filename=out.iq
format=s16
show_metadata=1

[delaymanagement]
synchronous=1
offset=2.5
"""


def test_parse_ini(tmp_path):
    p = tmp_path / "cfg.ini"
    p.write_text(EXAMPLE_INI)
    s = parse_ini(str(p))
    assert s.rc_telnet_port == 2121
    assert s.rc_zmq_endpoint == "tcp://127.0.0.1:9400"
    assert s.input_name == "test.eti" and s.loop
    assert s.gain_mode == GAIN_VAR and s.digital_gain == 0.8
    assert s.gain_mode_variance == 3.0
    assert s.output_rate == 4_096_000
    assert s.dab_mode == 2
    assert s.ofdm_window_overlap == 90
    assert s.enable_cfr and s.cfr_clip == 40.0 and s.cfr_error_clip == 3.0
    assert s.filter_taps_file == "default"
    assert s.tii_enable and s.tii_comb == 3 and s.tii_pattern == 42
    assert s.output == "file" and s.output_name == "out.iq"
    assert s.file_output_format == "s16"
    assert s.file_output_show_metadata
    assert s.tist_enabled and s.tist_offset == 2.5
    # s16 output fixes the normalisation (ref: src/DabMod.cpp:271-276)
    assert abs(s.normalise - 32767.0 / 50000.0) < 1e-9


def test_parse_ini_sdr_output(tmp_path):
    p = tmp_path / "sdr.ini"
    p.write_text("""
[input]
transport=file
source=test.eti

[uhdoutput]
device=type=b200
channel=12C
txgain=55.5
rxgain=30
lo_offset=1000
dpd_port=50055
""")
    s = parse_ini(str(p))
    assert s.output == "uhd"
    assert s.sdr_device_args == "type=b200"
    assert s.sdr_frequency == 227_360_000
    assert s.sdr_txgain == 55.5 and s.sdr_rxgain == 30
    assert s.sdr_lo_offset == 1000 and s.sdr_dpd_port == 50055
    # SDR outputs normalise by the reference's 1/50000
    assert abs(s.normalise - 1.0 / 50000.0) < 1e-9


def test_cli_flags():
    s = build_settings(["in.eti", "-f", "o.iq", "-F", "u8", "-m", "4",
                        "-g", "fix", "-a", "0.5", "-r", "2048000", "-l"])
    assert s.input_name == "in.eti" and s.loop
    assert s.output == "file" and s.file_output_format == "u8"
    assert s.dab_mode == 4 and s.gain_mode == GAIN_FIX
    assert s.digital_gain == 0.5
    assert abs(s.normalise - 127.0 / 50000.0) < 1e-9


def test_cli_single_config_arg(tmp_path):
    p = tmp_path / "cfg.ini"
    p.write_text(EXAMPLE_INI)
    s = build_settings([str(p)])
    assert s.input_name == "test.eti"
    assert s.output_name == "out.iq"


def test_channel_table():
    assert utils.parse_channel("5A") == 174_928_000
    assert utils.parse_channel("13F") == 239_200_000
    assert utils.convert_frequency_to_channel(227_360_000) == "12C"
    assert utils.convert_frequency_to_channel(1) is None
    with pytest.raises(ValueError):
        utils.parse_channel("99Z")
    assert utils.transmission_frame_duration_ms(1) == 96
    assert utils.transmission_frame_duration_ms(3) == 24


def test_startupcheck_gate(tmp_path):
    """general.startupcheck must gate startup (ref: src/DabMod.cpp:404-421)."""
    from dabmod_tpu.cli import main
    p = tmp_path / "cfg.ini"
    p.write_text("""
[general]
startupcheck=false

[input]
transport=file
source=/nonexistent.eti

[fileoutput]
filename=%s
format=complexf
""" % (tmp_path / "o.iq"))
    assert main([str(p)]) == 1          # gate fails -> refuse to start
    s = parse_ini(str(p))
    assert s.startup_check == "false"


def test_log_file_and_syslog_keys(tmp_path):
    p = tmp_path / "cfg.ini"
    p.write_text("""
[log]
syslog=1
filelog=1
filename=%s
""" % (tmp_path / "mod.log"))
    s = parse_ini(str(p))
    assert s.log_syslog and s.log_file.endswith("mod.log")


# ---------------------------------------------------------------------------
# delaymanagement parity (ref: src/ConfigParser.cpp:449-476)
# ---------------------------------------------------------------------------

def _delay_ini(tmp_path, body):
    p = tmp_path / "delay.ini"
    p.write_text("""
[input]
transport=file
source=test.eti

[modulator]
gainmode=var

[fileoutput]
filename=out.iq
format=complexf

[delaymanagement]
%s
""" % body)
    return str(p)


def test_delaymanagement_synchronous_offset(tmp_path):
    s = parse_ini(_delay_ini(tmp_path, "synchronous=1\noffset=2.5"))
    assert s.tist_enabled and s.tist_offset == 2.5


def test_delaymanagement_synchronous_requires_offset(tmp_path):
    # ref: src/ConfigParser.cpp:462-467 throws without an offset
    with pytest.raises(ValueError, match="no offset defined"):
        parse_ini(_delay_ini(tmp_path, "synchronous=1"))


def test_delaymanagement_mutenotimestamps(tmp_path):
    s = parse_ini(_delay_ini(tmp_path, "mutenotimestamps=1"))
    assert s.sdr_mute_no_timestamps
    s = parse_ini(_delay_ini(tmp_path, "mutenotimestamps=0"))
    assert not s.sdr_mute_no_timestamps


def test_delaymanagement_old_syntax_fixed(tmp_path):
    # the reference warns about the old syntax; this build warns AND
    # honours it
    with pytest.warns(UserWarning, match="old config syntax"):
        s = parse_ini(_delay_ini(
            tmp_path, "synchronous=1\nmanagement=fixed\nfixedoffset=1.25"))
    assert s.tist_delay_management == "fixed"
    assert s.tist_offset == 1.25


def test_delaymanagement_old_syntax_dynamic(tmp_path):
    off = tmp_path / "offset.txt"
    off.write_text("0.5\n")
    with pytest.warns(UserWarning, match="old config syntax"):
        s = parse_ini(_delay_ini(
            tmp_path,
            "synchronous=1\nmanagement=dynamic\ndynamicoffsetfile=%s" % off))
    assert s.tist_delay_management == "dynamic"
    assert s.tist_dynamic_offset_file == str(off)


def test_delaymanagement_invalid_management(tmp_path):
    with pytest.raises(ValueError, match="invalid management"):
        parse_ini(_delay_ini(tmp_path, "synchronous=1\nmanagement=bogus"))


def test_delaymanagement_fixed_needs_fixedoffset(tmp_path):
    with pytest.raises(ValueError, match="needs fixedoffset"):
        parse_ini(_delay_ini(tmp_path, "synchronous=1\nmanagement=fixed"))


def test_cli_reference_flags():
    """-c / -u / -G parity with the reference getopt
    (src/ConfigParser.cpp:503-580)."""
    s = build_settings(["in.eti", "-u", "type=b200", "-G", "55.5",
                       "-c", "400000000"])
    assert s.output == "uhd" and s.sdr_device_args == "type=b200"
    assert s.sdr_txgain == 55.5
    assert s.cic_eq_clock_rate == 400_000_000
    with pytest.raises(SystemExit, match="mutually exclusive"):
        build_settings(["in.eti", "-u", "x", "-f", "out.iq"])


def test_cli_version_flag(capsys):
    with pytest.raises(SystemExit) as e:
        build_settings(["-V"])
    assert e.value.code == 0
    assert "dabmod-tpu" in capsys.readouterr().out


def test_cli_no_arguments_shows_usage(capsys):
    with pytest.raises(SystemExit):
        build_settings([])
    assert "usage" in capsys.readouterr().err.lower()


def test_cli_config_and_flags_mutually_exclusive(tmp_path):
    p = tmp_path / "c.ini"
    p.write_text("[input]\nsource=in.eti\n[fileoutput]\nfilename=o.iq\n"
                 "format=complexf\n[output]\noutput=file\n")
    # -C alone is fine
    build_settings(["-C", str(p)])
    # -C plus any other option is rejected (src/ConfigParser.cpp:624-636)
    with pytest.raises(SystemExit):
        build_settings(["-C", str(p), "-m", "2"])
    with pytest.raises(SystemExit):
        build_settings(["-C", str(p), "in.eti"])
