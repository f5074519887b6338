"""fft_engine=dexter: the DEXTER FFT-accelerator offload chain
(dabmod_tpu/io/dexter_fft.py; ref src/OfdmGenerator.cpp:581-789,
src/DabModulator.cpp:214-277, src/FormatConverter.cpp:70-109).

The accelerator itself is FPGA hardware -- like the vendor SDR drivers
this path is mock-verified: the libiio surface is exercised through the
declared software model, while the host-side arithmetic around it (bin
placement, Q16.16 windowed GI, wide->s16 conversion) is pinned exactly.
"""
import numpy as np
import pytest

from dabmod_tpu import tables
from dabmod_tpu.io import dexter_fft as dx


# ---------------------------------------------------------------- placement
def test_bin_placement_tm1_matches_reference_comment():
    # src/OfdmGenerator.cpp:588-592: "For TM I this is: ZeroDst=769
    # ZeroSize=511 / PosSrc=0 PosDst=1 PosSize=768 / NegSrc=768
    # NegDst=1280 NegSize=768"
    p = dx.bin_placement(1536, 2048)
    assert (p.zero_dst, p.zero_size) == (769, 511)
    assert (p.pos_src, p.pos_dst, p.pos_size) == (0, 1, 768)
    assert (p.neg_src, p.neg_dst, p.neg_size) == (768, 1280, 768)


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_bin_placement_covers_all_modes(mode):
    p = tables.mode_params(mode)
    pl = dx.bin_placement(p.nb_carriers, p.spacing)
    # every carrier lands exactly once, zero stripe fills the rest
    assert pl.pos_size + pl.neg_size == p.nb_carriers
    assert pl.zero_dst + pl.zero_size == pl.neg_dst
    assert pl.neg_dst + pl.neg_size == p.spacing


def test_bin_placement_odd_carrier_count():
    # odd nbCarriers: PosDst becomes 0 (src/OfdmGenerator.cpp:594)
    pl = dx.bin_placement(5, 8)
    assert (pl.pos_dst, pl.pos_size, pl.neg_dst, pl.neg_size) == (0, 3, 6, 2)


def test_bin_placement_rejects_carriers_over_spacing():
    with pytest.raises(ValueError, match="nbCarriers > spacing"):
        dx.bin_placement(9, 8)


# ------------------------------------------------------------- accelerator
def test_accelerator_transform_matches_placed_idft():
    """The facade's output must equal the declared model: inverse DFT of
    the placed spectrum with 64/N block scaling, rounded half away."""
    spacing, carriers, S = 64, 48, 5
    rng = np.random.default_rng(7)
    re = rng.integers(-16384, 16384, (S, carriers)).astype(np.int16)
    im = rng.integers(-16384, 16384, (S, carriers)).astype(np.int16)
    mock = dx.MockFftAcceleratorIio(spacing)
    acc = dx.DexterFftAccelerator(S, carriers, spacing, iio_module=mock)
    out_re, out_im = acc.process(re, im)
    assert mock.n_transforms == S

    pl = acc.place
    for s in range(S):
        bins = np.zeros(spacing, np.complex128)
        c = re[s].astype(np.float64) + 1j * im[s].astype(np.float64)
        bins[pl.pos_dst:pl.pos_dst + pl.pos_size] = c[:pl.pos_size]
        bins[pl.neg_dst:pl.neg_dst + pl.neg_size] = c[pl.pos_size:]
        td = np.fft.ifft(bins) * spacing * (64.0 / spacing)
        exp_re = (np.floor(np.abs(td.real) + 0.5)
                  * np.sign(td.real)).astype(np.int32)
        exp_im = (np.floor(np.abs(td.imag) + 0.5)
                  * np.sign(td.imag)).astype(np.int32)
        np.testing.assert_array_equal(out_re[s], exp_re)
        np.testing.assert_array_equal(out_im[s], exp_im)


def test_accelerator_pipelines_one_buffer_in_flight():
    """The reference keeps one transform in flight (src/OfdmGenerator.cpp
    :713-718); the facade must never exceed the IIO FIFO depth."""
    spacing = 16
    mock = dx.MockFftAcceleratorIio(spacing)
    depth = {"max": 0}
    orig = mock._push_input

    def tracked(payload):
        orig(payload)
        depth["max"] = max(depth["max"], len(mock._results))
    mock._push_input = tracked
    acc = dx.DexterFftAccelerator(6, 12, spacing, iio_module=mock)
    acc.process(np.ones((6, 12), np.int16), np.zeros((6, 12), np.int16))
    assert depth["max"] <= 2


def test_accelerator_rejects_bad_input_size():
    mock = dx.MockFftAcceleratorIio(16)
    acc = dx.DexterFftAccelerator(3, 12, 16, iio_module=mock)
    with pytest.raises(ValueError, match="input size not valid"):
        acc.process(np.zeros((3, 10), np.int16), np.zeros((3, 10), np.int16))


def test_accelerator_requires_both_iio_devices():
    class Empty:
        def Context(self):
            return self

        def find_device(self, name):
            return None
    with pytest.raises(RuntimeError, match="OfdmGeneratorDEXTER"):
        dx.DexterFftAccelerator(3, 12, 16, iio_module=Empty())


# ----------------------------------------------------- Q16.16 guard interval
def _naive_wide_gi(re, im, null_size, sym_size, ov):
    """Direct per-sample transcription of the reference's windowed
    do_process loop for complexfix_wide
    (src/GuardIntervalInserter.cpp:149-299)."""
    B, S, sp = re.shape
    win = 0.5 * (1.0 - np.cos(np.pi * np.arange(2 * ov) / (2 * ov - 1)))
    wq = dx.window_q16(win)
    n_out = null_size + (S - 1) * sym_size

    def mul(x, w):
        return int(dx.fpm_mul_q16(np.int64(x), np.int64(w)))

    def run(plane):
        outs = np.zeros((B, n_out), np.int64)
        for b in range(B):
            out = outs[b]
            inp = plane[b].astype(np.int64)
            npre = null_size - sp
            # NULL symbol: plain prefix + body, falling 1->0.5 tail,
            # 0.5->0 cyclic suffix written into the next block
            out[0:npre] = inp[0, sp - npre:sp]
            out[npre:npre + sp - ov] = inp[0, :sp - ov]
            for i in range(ov):
                out[npre + sp - ov + i] = mul(inp[0, sp - ov + i],
                                              wq[2 * ov - (i + 1)])
            for i in range(ov):
                out[null_size + i] = mul(inp[0, i], wq[ov - (i + 1)])
            base = null_size
            for sym in range(1, S):
                x = inp[sym]
                # rising edge: out[ox] += in[ix] * window[i], 2*ov samples
                # starting windowOverlap before the block boundary
                ix = 2 * sp - sym_size - ov
                for i in range(2 * ov):
                    out[base - ov + i] += mul(x[ix + i], wq[i])
                ox = base + ov
                rem = (sym_size - sp) - ov
                out[ox:ox + rem] = x[2 * sp - sym_size + ov:sp]
                ox += rem
                if sym == S - 1:
                    out[ox:ox + sp] = x[:sp]          # no end windowing
                else:
                    out[ox:ox + sp - ov] = x[:sp - ov]
                    ox += sp - ov
                    for i in range(ov):
                        out[ox + i] = mul(x[sp - ov + i],
                                          wq[2 * ov - (i + 1)])
                    ox += ov
                    for i in range(ov):          # cyclic suffix, 0.5->0
                        out[ox + i] = mul(x[i], wq[ov - (i + 1)])
                base += sym_size
        return dx._wrap32(outs).astype(np.int32)
    return run(re), run(im)


def test_wide_gi_matches_naive_reference_loop():
    rng = np.random.default_rng(3)
    B, S, sp, sym, nul, ov = 2, 4, 16, 20, 18, 3
    re = rng.integers(-(1 << 24), 1 << 24, (B, S, sp)).astype(np.int32)
    im = rng.integers(-(1 << 24), 1 << 24, (B, S, sp)).astype(np.int32)
    got_re, got_im = dx.guard_interval_windowed_wide((re, im), nul, sym, ov)
    exp_re, exp_im = _naive_wide_gi(re, im, nul, sym, ov)
    np.testing.assert_array_equal(got_re, exp_re)
    np.testing.assert_array_equal(got_im, exp_im)


def test_wide_gi_unwindowed_is_cyclic_prefix():
    rng = np.random.default_rng(4)
    B, S, sp, sym, nul = 1, 3, 8, 10, 9
    re = rng.integers(-1000, 1000, (B, S, sp)).astype(np.int32)
    im = rng.integers(-1000, 1000, (B, S, sp)).astype(np.int32)
    gr, gi = dx.guard_interval_unwindowed_wide((re, im), nul, sym)
    assert gr.shape == (B, nul + (S - 1) * sym)
    np.testing.assert_array_equal(gr[0, :nul],
                                  np.concatenate([re[0, 0, sp - 1:],
                                                  re[0, 0]]))
    np.testing.assert_array_equal(
        gr[0, nul:nul + sym],
        np.concatenate([re[0, 1, 2 * sp - sym:], re[0, 1]]))
    np.testing.assert_array_equal(gi[0, :nul],
                                  np.concatenate([im[0, 0, sp - 1:],
                                                  im[0, 0]]))


def test_fpm_mul_q16_reference_cases():
    # v = (x*w)/2^15 truncating, then v/2 + v%2 (fpm/fixed.hpp:156-167)
    one = 1 << 16
    assert dx.fpm_mul_q16(np.int64(one), np.int64(one)) == one
    assert dx.fpm_mul_q16(np.int64(-one), np.int64(one)) == -one
    # half * half = quarter, exact
    assert dx.fpm_mul_q16(np.int64(one // 2), np.int64(one // 2)) == one // 4
    # rounding: raw 3 * half -> 3/2 rounds away to 2
    assert dx.fpm_mul_q16(np.int64(3), np.int64(one // 2)) == 2
    assert dx.fpm_mul_q16(np.int64(-3), np.int64(one // 2)) == -2


# ---------------------------------------------------------- FormatConverter
def test_wide_to_s16_shift_and_saturation():
    re = np.array([[0, 64, -64, 63, (1 << 22), -(1 << 22)]], np.int32)
    im = np.array([[0, 127, -127, -63, 32767 * 64, -32768 * 64]], np.int32)
    s16, n_clipped = dx.format_convert_wide_s16(re, im)
    # >> 6 is an arithmetic shift: -64>>6 = -1, -127>>6 = -2, 63>>6 = 0
    np.testing.assert_array_equal(
        s16[0, :, 0], [0, 1, -1, 0, 32767, -32768])
    np.testing.assert_array_equal(
        s16[0, :, 1], [0, 1, -2, -1, 32767, -32768])
    # the two 1<<22 components clip; 32767*64 and -32768*64 are exact
    assert n_clipped == 2


# ------------------------------------------------------------- full engine
def test_dexter_engine_matches_kiss_amplitude():
    """End-to-end: fft_engine=dexter through the software accelerator model
    must land on the same s16 amplitude scale as the bit-exact kiss chain
    (the declared model scaling; MockFftAcceleratorIio docstring), with
    only fixed-point rounding between them."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
    from dabmod_tpu.models import Modulator, make_default_layout

    mode = 3                               # smallest spacing: fast model
    layout = make_default_layout(mode)
    p = tables.mode_params(mode)
    batch = parse_eti_frames(synth_eti_batch(2 * p.cif_count, mode=mode))

    md = Modulator(layout, ModSettings(dab_mode=mode, fft_engine="dexter",
                                       ofdm_window_overlap=12))
    assert md.host_backend is not None
    syms, _, _ = md.modulate(batch.fic, tuple(batch.subchannels),
                             md.init_state())
    wire_words = md.host_backend(np.asarray(syms))
    mine = wire_words.view(np.int16).astype(np.float32)

    mk = Modulator(layout, ModSettings(dab_mode=mode, fft_engine="kiss",
                                       ofdm_window_overlap=12))
    out, _, _ = mk.modulate(batch.fic, tuple(batch.subchannels),
                            mk.init_state())
    ref = np.asarray(out).view(np.int16).astype(np.float32)

    assert mine.shape == ref.shape
    err = mine - ref
    mer = 10 * np.log10((ref ** 2).sum() / (err ** 2).sum())
    # kiss carries per-stage C_FIXDIV rounding; the model rounds once --
    # they agree to the fixed-point noise floor
    assert mer >= 40.0, f"dexter-vs-kiss MER {mer:.2f} dB"


def test_dexter_engine_rejects_float_only_stages():
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.models import Modulator, make_default_layout
    layout = make_default_layout(1)
    for kw in ({"filter_taps_file": "default"},
               {"output_rate": 4_096_000},
               {"enable_cfr": True, "cfr_clip": 10.0}):
        with pytest.raises(ValueError, match="fixed point"):
            Modulator(layout, ModSettings(dab_mode=1, fft_engine="dexter",
                                          **kw))


def test_dexter_engine_streams_to_file(tmp_path):
    """Config-file wiring: fft_engine=dexter + file output runs through
    the runtime and writes the s16 wire (the runtime's fetch thread runs
    the host chain; runtime.py _fetch_loop)."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import synth_eti_batch
    from dabmod_tpu.runtime import ModRuntime

    mode = 3
    p = tables.mode_params(mode)
    eti_path = tmp_path / "in.eti"
    eti_path.write_bytes(synth_eti_batch(4 * p.cif_count, mode=mode))
    out_path = tmp_path / "out.iq"
    s = ModSettings(dab_mode=mode, fft_engine="dexter", batch_tf=2,
                    input_name=str(eti_path), output="file",
                    output_name=str(out_path),
                    file_output_format="s16")
    s.normalise_for_output()
    rt = ModRuntime(s)
    assert rt.run() == 0
    rt.close()
    data = np.fromfile(out_path, np.int16)
    assert data.size == 4 * p.tf_samples * 2
    assert np.abs(data.astype(np.int64)).max() > 0
    # the NULL symbol's unmodulated portion carries no power (TII off)
    tf0 = data[:2 * p.tf_samples].reshape(-1, 2)
    assert np.abs(tf0[:p.null_size - p.spacing]).max() == 0
