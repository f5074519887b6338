"""Fused Pallas OFDM backend vs the XLA path (interpret mode; device
compilation blocked by a Mosaic minor-dim reshape constraint, see
ops/pallas_backend.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dabmod_tpu import tables
from dabmod_tpu.ops import ofdm
from dabmod_tpu.ops.pallas_backend import make_backend


@pytest.mark.parametrize("gain_mode", [0, 1, 2])
def test_pallas_backend_matches_xla(gain_mode):
    p = tables.mode_params(1)
    rng = np.random.default_rng(0)
    syms = rng.standard_normal((2, 77, 1536, 2)).astype(np.float32)
    fn = make_backend(p, gain_mode, interpret=True)
    got = np.asarray(fn(jnp.asarray(syms), jnp.float32(0.5),
                        jnp.float32(4.0)))
    planes = (jnp.asarray(syms[..., 0]), jnp.asarray(syms[..., 1]))
    bins = ofdm.to_bins_slices(planes, 1536, 2048)
    td = ofdm.ofdm_ifft(bins)
    gains = ofdm.compute_gain(td, gain_mode, 4.0)
    td = ofdm.apply_gain(td, gains, 0.5)
    gr, gi = ofdm.guard_interval_unwindowed(td, 2656, 2552)
    ref = np.stack([np.asarray(gr), np.asarray(gi)], axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-4)


def test_pallas_backend_lowers_on_tpu():
    """Device lowering of the fused kernel (skips off-TPU).  The full
    device==interpret numeric check for all gain modes runs in
    tools/pallas_device_check.py against real hardware."""
    import jax
    import pytest
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a TPU backend")
    import numpy as np
    import jax.numpy as jnp
    from dabmod_tpu import tables
    from dabmod_tpu.ops.ofdm import GAIN_VAR
    from dabmod_tpu.ops.pallas_backend import make_backend

    p = tables.mode_params(1)
    syms = np.random.default_rng(0).standard_normal(
        (1, p.nb_symbols + 1, p.nb_carriers, 2)).astype(np.float32)
    out = jax.jit(make_backend(p, GAIN_VAR))(jnp.asarray(syms), 1.0, 4.0)
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape == (1, p.tf_samples, 2)
