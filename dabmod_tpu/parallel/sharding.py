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


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Bring up the multi-host runtime (jax.distributed over DCN).

    Each host contributes its local chips; afterwards jax.devices() is the
    global device list and make_host_chip_mesh() spans all hosts.  The
    reference has no distribution axis at all (SURVEY.md section 5) -- this
    is the TPU framework's own scaling story.
    """
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_host_chip_mesh(n_hosts: int | None = None,
                        chips_per_host: int | None = None) -> Mesh:
    """Mesh(('host', 'chip')): TF batches scatter over hosts via DCN and
    over chips via ICI.  In a jax.distributed run the host axis follows
    process boundaries (jax.devices() is ordered by process)."""
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    devs = devs[:n_hosts * chips_per_host]
    grid = np.array(devs).reshape(n_hosts, chips_per_host)
    return Mesh(grid, ("host", "chip"))


class ShardedModulator:
    """Runs a Modulator data-parallel over the TF axis of a device mesh.

    ETI frames [T] are laid out as T = B * cif_count with B transmission
    frames sharded over the mesh; sequential state (TI history, resampler
    carries) is replicated, with the boundary halos exchanged by XLA.
    """

    def __init__(self, modulator: Modulator, mesh: Mesh):
        if modulator._ofdm_backend is not None:
            # the fused Pallas OFDM kernel has no SPMD partitioning rule;
            # under a mesh use the XLA transform path, which the GSPMD
            # partitioner shards along the TF axis like everything else
            import dataclasses
            modulator = Modulator(
                modulator.layout,
                dataclasses.replace(modulator.settings, ofdm_backend="xla"))
        self.m = modulator
        self.mesh = mesh
        # shard the leading (ETI frame / TF) axis over ALL mesh axes --
        # ('host', 'chip') meshes scatter frames over hosts first (DCN),
        # then chips (ICI)
        self._shard_t = NamedSharding(mesh, P(mesh.axis_names))
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
        def put(x):
            x = np.asarray(x)
            if jax.process_count() > 1:
                return jax.make_array_from_callback(
                    x.shape, self._replicated, lambda idx: x[idx])
            return jax.device_put(x, self._replicated)
        return jax.tree.map(put, self.m.init_state())

    def _put(self, x):
        """Place a [T, ...] host array with the TF sharding.  Under
        jax.distributed each process passes the same *global* array and
        contributes its addressable shards."""
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                x.shape, self._shard_t, lambda idx: x[idx])
        return jax.device_put(jnp.asarray(x), self._shard_t)

    def modulate(self, fic_bytes, subch_bytes, state):
        s = self.m.settings
        fic = self._put(fic_bytes)
        subs = tuple(self._put(x) for x in subch_bytes)
        return self._step(fic, subs, state,
                          jnp.float32(s.normalise * s.digital_gain),
                          jnp.float32(s.gain_mode_variance))
