"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dabmod_tpu.config import ModSettings
from dabmod_tpu.eti import parse_eti_frames, synth_eti_batch
from dabmod_tpu.models import Modulator, make_default_layout
from dabmod_tpu.parallel.sharding import ShardedModulator, make_mesh


@pytest.fixture(scope="module")
def setup():
    if jax.device_count() < 8:
        # DABMOD_TEST_ON_TPU=1 runs on the one real chip; the sharding
        # tests specifically need the virtual 8-device CPU mesh
        pytest.skip("tests need the 8-device CPU mesh")
    specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1))
    raw = synth_eti_batch(8 * 4, mode=1, subch_specs=specs)
    return m, parse_eti_frames(raw)


def test_sharded_matches_unsharded(setup):
    m, batch = setup
    iq_ref, state_ref, _ = m.modulate_eti(batch, m.init_state())

    sm = ShardedModulator(m, make_mesh(8))
    iq, state, _ = sm.modulate(batch.fic, tuple(batch.subchannels),
                               sm.init_state())
    # elementwise, with a justified bound: per-shard matmul shapes let
    # the backend pick different (all-valid) f32 accumulation blockings,
    # so outputs can differ by f32 rounding -- but never by as much as
    # one s16 wire LSB (1.0 at the 32767-scale output)
    d = np.abs(np.asarray(iq) - np.asarray(iq_ref))
    assert float(d.max()) < 0.05, float(d.max())
    for a, b in zip(state["ti_history"], state_ref["ti_history"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_streaming_state(setup):
    """Halo exchange across batches: sharded streaming must equal unsharded."""
    m, _ = setup
    specs = ((0, 24, 0x22), (48, 48, 0x02))
    raw = synth_eti_batch(16 * 4, mode=1, subch_specs=specs, seed=9)
    b1 = parse_eti_frames(raw[:32])
    b2 = parse_eti_frames(raw[32:])

    state = m.init_state()
    r1, state, _ = m.modulate_eti(b1, state)
    r2, state, _ = m.modulate_eti(b2, state)

    sm = ShardedModulator(m, make_mesh(8))
    st = sm.init_state()
    s1, st, _ = sm.modulate(b1.fic, tuple(b1.subchannels), st)
    s2, st, _ = sm.modulate(b2.fic, tuple(b2.subchannels), st)
    d = np.abs(np.asarray(s2) - np.asarray(r2))
    assert float(d.max()) < 0.05, float(d.max())   # sub-wire-LSB bound


def test_sharded_pallas_kernel_matches_unsharded(setup):
    """The fused Pallas OFDM kernel must run under the mesh via shard_map
    (not silently swap to the XLA path) and match the unsharded kernel."""
    _, batch = setup
    specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1,
                                      ofdm_backend="pallas-interpret"))
    assert m._ofdm_backend is not None
    iq_ref, _, _ = m.modulate_eti(batch, m.init_state())

    sm = ShardedModulator(m, make_mesh(8))
    assert sm.m._ofdm_backend is not None          # no XLA fallback
    assert sm.m._ofdm_backend is not m._ofdm_backend  # shard_map-wrapped
    iq, _, _ = sm.modulate(batch.fic, tuple(batch.subchannels),
                           sm.init_state())
    np.testing.assert_allclose(np.asarray(iq), np.asarray(iq_ref),
                               rtol=2e-5, atol=2e-2)


def test_sharded_pallas_cfr_stats_match(setup):
    """CFR + per-symbol statistics through the sharded kernel."""
    _, batch = setup
    specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(1, subch_specs=specs)
    s = ModSettings(dab_mode=1, ofdm_backend="pallas-interpret",
                    enable_cfr=True, cfr_clip=30.0, cfr_error_clip=0.1)
    m = Modulator(layout, s)
    iq_ref, _, st_ref = m.modulate_eti(batch, m.init_state())

    sm = ShardedModulator(m, make_mesh(8))
    iq, _, st = sm.modulate(batch.fic, tuple(batch.subchannels),
                            sm.init_state())
    np.testing.assert_allclose(np.asarray(iq), np.asarray(iq_ref),
                               rtol=2e-5, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(st["cfr_clip"]),
                                  np.asarray(st_ref["cfr_clip"]))
    np.testing.assert_allclose(np.asarray(st["mer_db"]),
                               np.asarray(st_ref["mer_db"]),
                               rtol=1e-4, atol=1e-3)


def test_dryrun_multichip_entrypoint():
    if jax.device_count() < 8:
        pytest.skip("dryrun needs the 8-device CPU mesh")
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    iq, state = jax.jit(fn)(*args)
    assert iq.shape[0] == 2


def test_sharded_time_interleave_minimal_halo(setup):
    """make_sharded_time_interleave must be bit-identical to the plain
    interleaver across hop regimes (local rows >= 15, < 15, and == 1) and
    across streamed batches."""
    from dabmod_tpu.ops.fec import time_interleave
    from dabmod_tpu.parallel.sharding import (make_mesh,
                                              make_sharded_time_interleave)
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax

    rng = np.random.default_rng(3)
    n = 1024
    for T in (8, 64, 128):      # Tl = 1, 8, 16 on the 8-device mesh
        mesh = make_mesh(8)
        sharded_ti = make_sharded_time_interleave(mesh)
        shard = NamedSharding(mesh, P("tf"))
        repl = NamedSharding(mesh, P())
        bits1 = rng.integers(0, 2, (T, n)).astype(np.int32)
        bits2 = rng.integers(0, 2, (T, n)).astype(np.int32)
        hist = rng.integers(0, 2, (15, n)).astype(np.int32)

        o1, h1 = time_interleave(jnp.asarray(bits1), jnp.asarray(hist))
        o2, h2 = time_interleave(jnp.asarray(bits2), h1)

        f = jax.jit(sharded_ti, in_shardings=(shard, repl),
                    out_shardings=(shard, repl))
        s1, g1 = f(jax.device_put(bits1, shard), jax.device_put(hist, repl))
        s2, g2 = f(jax.device_put(bits2, shard), g1)
        for a, b in ((o1, s1), (h1, g1), (o2, s2), (h2, g2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_fused_resampler_matches_unsharded(setup):
    """The fused Pallas resampler must run under the mesh via shard_map
    (per-shard carry, ppermute boundary history) and stream-match the
    unsharded kernel across batches."""
    _, batch = setup
    specs = ((0, 24, 0x22), (48, 48, 0x02))
    layout = make_default_layout(1, subch_specs=specs)
    m = Modulator(layout, ModSettings(dab_mode=1, output_rate=4_096_000,
                                      ofdm_backend="pallas-interpret"))
    assert m._res_backend is not None
    raw = synth_eti_batch(16 * 4, mode=1, subch_specs=specs, seed=5)
    b1 = parse_eti_frames(raw[:32])
    b2 = parse_eti_frames(raw[32:])
    st = m.init_state()
    r1, st, _ = m.modulate_eti(b1, st)
    r2, st, _ = m.modulate_eti(b2, st)

    sm = ShardedModulator(m, make_mesh(8))
    assert sm.m._res_backend is not None and sm.m._res_backend \
        is not m._res_backend
    s = sm.init_state()
    s1, s, _ = sm.modulate(b1.fic, tuple(b1.subchannels), s)
    s2, s, _ = sm.modulate(b2.fic, tuple(b2.subchannels), s)
    for a, b in ((r1, s1), (r2, s2)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert float(d.max()) < 0.05, float(d.max())   # sub-wire-LSB
