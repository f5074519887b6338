"""Multi-chip scaling: shard the transmission-frame (time) axis over a mesh.

The reference is a single-process pipeline (SURVEY.md section 2.7); the only
couplings along the time axis are the 16-CIF time-interleaver history and the
resampler overlap carries (SURVEY.md section 5 "long-context").  Sharding the
TF batch axis therefore needs only a 15-CIF halo at shard boundaries, which
XLA's SPMD partitioner materialises as a collective-permute from the
take_along_axis in ops.fec.time_interleave.  Mode tables are replicated
device constants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.modulator import Modulator


def make_mesh(n_devices: int | None = None, axis: str = "tf") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


class ShardedModulator:
    """Runs a Modulator data-parallel over the TF axis of a device mesh.

    ETI frames [T] are laid out as T = B * cif_count with B transmission
    frames sharded over the mesh; sequential state (TI history, resampler
    carries) is replicated, with the boundary halos exchanged by XLA.
    """

    def __init__(self, modulator: Modulator, mesh: Mesh):
        self.m = modulator
        self.mesh = mesh
        axis = mesh.axis_names[0]
        self._shard_t = NamedSharding(mesh, P(axis))       # [T, ...] arrays
        self._replicated = NamedSharding(mesh, P())

        def step(fic_bytes, subch_bytes, state, constant_gain, var_k):
            return self.m._modulate_impl(fic_bytes, subch_bytes, state,
                                         constant_gain, var_k)

        n_sub = len(modulator.layout.subchannels)
        state_sharding = jax.tree.map(lambda _: self._replicated,
                                      modulator.init_state())
        self._step = jax.jit(
            step,
            in_shardings=(self._shard_t, (self._shard_t,) * n_sub,
                          state_sharding, self._replicated, self._replicated),
            donate_argnums=(2,))

    def init_state(self):
        return jax.device_put(
            self.m.init_state(),
            jax.tree.map(lambda _: self._replicated, self.m.init_state()))

    def modulate(self, fic_bytes, subch_bytes, state):
        s = self.m.settings
        fic = jax.device_put(jnp.asarray(fic_bytes), self._shard_t)
        subs = tuple(jax.device_put(jnp.asarray(x), self._shard_t)
                     for x in subch_bytes)
        return self._step(fic, subs, state,
                          jnp.float32(s.normalise * s.digital_gain),
                          jnp.float32(s.gain_mode_variance))
