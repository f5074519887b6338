"""Bit-exact validation of the FEC chain against reference-generated vectors."""
import numpy as np
import jax.numpy as jnp
import pytest

from dabmod_tpu import tables
from dabmod_tpu.ops import fec
from golden import load


def bits(x):
    return np.unpackbits(np.asarray(x, dtype=np.uint8))


def to_bytes(b):
    return np.packbits(np.asarray(b, dtype=np.uint8))


# ---------------------------------------------------------------------------
# PRBS
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [96, 288, 6912])
def test_prbs_sequence(n):
    np.testing.assert_array_equal(tables.prbs_bytes(n), load(f"prbs_{n}"))


def test_prbs_xor():
    data = load("prbs_xor_in")
    expect = load("prbs_xor_out")
    out = fec.scramble(jnp.asarray(bits(data).astype(np.int32)),
                       jnp.asarray(tables.prbs_bits(96).astype(np.int32)))
    np.testing.assert_array_equal(to_bytes(np.asarray(out)), expect)


# ---------------------------------------------------------------------------
# Convolutional encoder
# ---------------------------------------------------------------------------

def test_conv_encoder_numpy():
    u = bits(load("conv_in"))
    y = tables.conv_encode_bits(u)
    got = to_bytes(np.concatenate([y, np.zeros(0, np.uint8)]))
    # reference output is (4*96+3) bytes = 4*(96*8+6) bits... plus 0 pad
    expect = load("conv_out")
    np.testing.assert_array_equal(got[:expect.size], expect)


def test_conv_encoder_jax():
    u = bits(load("conv_in"))
    y = fec.conv_encode(jnp.asarray(u.astype(np.int32))[None], u.size)[0]
    expect = bits(load("conv_out"))[:4 * (u.size + 6)]
    np.testing.assert_array_equal(np.asarray(y), expect)


# ---------------------------------------------------------------------------
# Puncturing: FIC + EEP + UEP profiles (incl. UEP padding byte)
# ---------------------------------------------------------------------------

def _run_punct(in_name, out_name, rules, framesize, num_cu=None):
    u = bits(load(in_name))
    conv_bits = fec.conv_encode(jnp.asarray(u.astype(np.int32))[None], u.size)
    pidx, out_bytes = tables.puncture_gather(
        rules, framesize * 4 + 3,
        out_bytes_expected=None if num_cu is None else num_cu * 8)
    out = fec.puncture(conv_bits, jnp.asarray(pidx))[0]
    got = to_bytes(np.asarray(out))
    expect = load(out_name)
    assert got.size == expect.size
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("mid", [1, 3])
def test_fic_puncturing(mid):
    framesize = 128 if mid == 3 else 96
    _run_punct(f"fic_punct_mid{mid}_in", f"fic_punct_mid{mid}_out",
               tables.fic_rules(mid), framesize)


@pytest.mark.parametrize("name,stl,tpl", [
    ("eep_a3_64", 24, 0x22),
    ("eep_b4_96", 36, 0x27),
    ("uep_128_3", 48, 0x02),
    ("uep_32_1", 12, 0x00),     # exercises the UEP +1 padding byte
])
def test_subchannel_puncturing(name, stl, tpl):
    sub = tables.SubchannelParams(0, stl * 8, tpl)
    _run_punct(f"subch_{name}_in", f"subch_{name}_out",
               sub.rules(), sub.framesize, num_cu=sub.framesize_cu)


# ---------------------------------------------------------------------------
# Time interleaver
# ---------------------------------------------------------------------------

def test_time_interleaver():
    fs = 384
    T = 40
    data = load("time_interleaver_in").reshape(T, fs)
    expect = load("time_interleaver_out").reshape(T, fs)
    in_bits = np.unpackbits(data, axis=1).astype(np.int32)
    masks = tables.time_interleave_masks(fs * 8)
    out, hist = fec.time_interleave(
        jnp.asarray(in_bits), jnp.zeros((15, fs * 8), jnp.int32),
        jnp.asarray(masks))
    got = np.packbits(np.asarray(out).astype(np.uint8), axis=1)
    np.testing.assert_array_equal(got, expect)
    # history = last 15 input frames
    np.testing.assert_array_equal(np.asarray(hist), in_bits[-15:])


# ---------------------------------------------------------------------------
# Streaming continuity: splitting a batch must give identical results
# ---------------------------------------------------------------------------

def test_time_interleaver_split_equivalence():
    fs = 64
    T = 24
    rng = np.random.default_rng(42)
    data = rng.integers(0, 2, (T, fs * 8)).astype(np.int32)
    masks = jnp.asarray(tables.time_interleave_masks(fs * 8))
    h0 = jnp.zeros((15, fs * 8), jnp.int32)
    full, _ = fec.time_interleave(jnp.asarray(data), h0, masks)
    a, h = fec.time_interleave(jnp.asarray(data[:10]), h0, masks)
    b, _ = fec.time_interleave(jnp.asarray(data[10:]), h, masks)
    np.testing.assert_array_equal(np.asarray(full),
                                  np.concatenate([np.asarray(a), np.asarray(b)]))
