"""Fused Pallas OFDM/CFR kernel vs the XLA transform path.

Runs the kernel in interpreter mode (CPU); tools/pallas_device_check.py
exercises the compiled kernel on real TPU hardware.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dabmod_tpu.ops import ofdm, ofdm_kernel
from dabmod_tpu.ops.fft import set_precision

HIGHEST = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize("spacing", [256, 512, 1024, 2048])
def test_kernel_ifft_matches_xla(spacing):
    set_precision("highest")
    rng = np.random.default_rng(1)
    bins = tuple(jnp.asarray(
        rng.standard_normal((2, 7, spacing)).astype(np.float32))
        for _ in range(2))
    ref = ofdm.ofdm_ifft(bins)
    ap = ofdm_kernel.build_ofdm_backend(
        spacing, False, 0.0, 0.0, precision=HIGHEST, interpret=True)
    td, stats = ap(bins)
    assert stats is None
    scale = float(jnp.abs(ref[0]).max())
    for k in range(2):
        np.testing.assert_allclose(np.asarray(td[k]), np.asarray(ref[k]),
                                   atol=2e-5 * scale)


@pytest.mark.parametrize("spacing", [256, 2048])
def test_kernel_cfr_matches_xla(spacing):
    set_precision("highest")
    rng = np.random.default_rng(2)
    bins = tuple(jnp.asarray(
        rng.standard_normal((2, 7, spacing)).astype(np.float32))
        for _ in range(2))
    td0 = ofdm.ofdm_ifft(bins)
    clip = 1.2 * float(jnp.sqrt(td0[0] ** 2 + td0[1] ** 2).mean())
    eclip = 0.5
    ref, n_clip, n_err = ofdm.cfr_one_iteration(td0, bins, clip, eclip)
    ap = ofdm_kernel.build_ofdm_backend(
        spacing, True, clip, eclip, precision=HIGHEST, interpret=True)
    td, st = ap(bins)
    scale = float(jnp.abs(ref[0]).max())
    for k in range(2):
        np.testing.assert_allclose(np.asarray(td[k]), np.asarray(ref[k]),
                                   atol=2e-5 * scale)
    np.testing.assert_array_equal(
        np.asarray(st[..., ofdm_kernel.ST_NCLIP].sum(axis=1), np.int32),
        np.asarray(n_clip))
    np.testing.assert_array_equal(
        np.asarray(st[..., ofdm_kernel.ST_NERRCLIP].sum(axis=1), np.int32),
        np.asarray(n_err))
    # per-symbol power stats agree with direct reductions
    pow_before = np.asarray((td0[0] ** 2 + td0[1] ** 2).sum(axis=-1))
    np.testing.assert_allclose(
        np.asarray(st[..., ofdm_kernel.ST_POW_BEFORE]), pow_before,
        rtol=1e-4)


def test_modulator_kernel_backend_end_to_end():
    """Full pipeline: ofdm_backend='pallas-interpret' == 'xla' on CPU,
    including CFR statistics parity."""
    from dabmod_tpu.config import ModSettings
    from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
    from dabmod_tpu.models import Modulator, make_default_layout

    layout = make_default_layout(1)
    raw = synth_eti_batch(8, mode=1, seed=5)
    batch = parse_eti_frames(raw)
    outs = {}
    for backend in ("xla", "pallas-interpret"):
        s = ModSettings(dab_mode=1, enable_cfr=True, cfr_clip=12.0,
                        cfr_error_clip=3.0, fft_precision="highest",
                        ofdm_backend=backend)
        m = Modulator(layout, s)
        iq, _, stats = m.modulate(batch.fic, tuple(batch.subchannels),
                                  m.init_state())
        outs[backend] = (np.asarray(iq), {k: np.asarray(v)
                                          for k, v in stats.items()})
    iq_x, st_x = outs["xla"]
    iq_p, st_p = outs["pallas-interpret"]
    scale = np.abs(iq_x).max()
    np.testing.assert_allclose(iq_p, iq_x, atol=3e-5 * scale)
    assert set(st_p) == set(st_x)
    np.testing.assert_array_equal(st_p["cfr_clip"], st_x["cfr_clip"])
    np.testing.assert_allclose(st_p["papr_before_cfr"],
                               st_x["papr_before_cfr"], atol=1e-3)
    np.testing.assert_allclose(st_p["papr_after_cfr"],
                               st_x["papr_after_cfr"], atol=1e-3)
    np.testing.assert_allclose(st_p["mer_db"], st_x["mer_db"], atol=0.1)
