"""Multi-chip scaling: shard the transmission-frame (time) axis over a mesh.

The reference is a single-process pipeline (SURVEY.md section 2.7); the only
couplings along the time axis are the 16-CIF time-interleaver history and the
resampler overlap carries (SURVEY.md section 5 "long-context").  Sharding the
TF batch axis therefore needs only a 15-CIF halo at shard boundaries,
exchanged explicitly by the minimal-halo shard_map formulations here
(make_sharded_time_interleave, shard_resampler_backend; measured in
ARCHITECTURE.md section 6).  Mode tables are replicated device constants.
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


def shard_ofdm_backend(backend, mesh: Mesh, has_stats: bool):
    """Wrap the fused Pallas OFDM/CFR backend in shard_map over the TF axis.

    pallas_call has no GSPMD partitioning rule, so under a mesh the kernel
    must be explicitly mapped: the OFDM transform (and CFR, and its
    per-symbol statistics) are embarrassingly parallel over transmission
    frames, so every input and output simply shards its leading axis over
    all mesh axes -- no collectives.  The kernel itself is shape-polymorphic
    (ops/ofdm_kernel._pick_chunk), so it retiles to the local block.
    """
    spec = P(mesh.axis_names)

    def local(br, bi):
        td, stats = backend((br, bi))
        return (td[0], td[1], stats) if has_stats else (td[0], td[1])

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, and every output here is plainly per-shard anyway
    f = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec),
                      out_specs=(spec, spec, spec) if has_stats
                      else (spec, spec),
                      check_vma=False)

    def wrapped(bins):
        res = f(bins[0], bins[1])
        return (res[0], res[1]), (res[2] if has_stats else None)

    return wrapped


def make_sharded_time_interleave(mesh: Mesh):
    """Drop-in replacement for ops.fec.time_interleave under a mesh.

    The auto-SPMD partition of the concat/shifted-slice formulation
    exchanges boundary rows once per delay lane (41 collectives,
    ~6.8 MB/step measured on the 8-device CPU mesh for a 16-TF batch);
    this explicit shard_map form moves the minimal halo instead: H
    collective-permutes of each shard's tail rows (H = hops covering the
    15-row delay line) plus one psum that replicates the new history --
    3 collectives, ~0.7 MB, bit-identical output (measured 6x faster on
    the CPU mesh; see tools/measure_ti_collectives.py and
    ARCHITECTURE.md section 6).

    The carried state keeps the exact same pytree shape as the unsharded
    path (replicated [15, n]), so checkpointed/streamed state moves
    freely between mesh shapes.
    """
    from ..ops.fec import TI_DELAYS

    axes = mesh.axis_names
    n_dev = int(np.prod(mesh.devices.shape))

    def sharded_ti(bits, history, delay_masks=None):
        from ..ops import fec
        T, n = bits.shape
        if n_dev == 1 or T % n_dev:
            return fec.time_interleave(bits, history, delay_masks)
        tl = T // n_dev
        hops = -(-15 // tl)                # predecessors covering 15 rows
        halo = min(tl, 15)                 # rows exchanged per hop

        def local(b, hist):
            # b [tl, n] local rows; hist [15, n] replicated global tail
            i = jax.lax.axis_index(axes)
            tails = []
            for h in range(hops, 0, -1):
                perm = [(s, s + h) for s in range(n_dev - h)]
                # only each shard's tail rows travel: hop h needs at most
                # the predecessor's last min(tl, 15) rows
                tails.append(jax.lax.ppermute(b[-halo:], axes, perm))
            ext = jnp.concatenate(tails, axis=0)[-15:]
            # ext row j holds global row i*tl - 15 + j (zeros where that
            # is negative); the gap is filled from the carried history at
            # hist[i*tl + j]
            j = jnp.arange(15)[:, None]
            pad = jnp.concatenate(
                [hist, jnp.zeros((15, n), hist.dtype)], axis=0)
            start = jnp.minimum(i * tl, 15)
            carry = jax.lax.dynamic_slice(pad, (start, 0), (15, n))
            hist_i = jnp.where(j >= jnp.maximum(0, 15 - i * tl),
                               ext, carry)
            full = jnp.concatenate([hist_i, b], axis=0)
            fr = full.reshape(15 + tl, n // 16, 16)
            lanes = [fr[15 - d:15 - d + tl, :, k]
                     for k, d in enumerate(TI_DELAYS)]
            out = jnp.stack(lanes, axis=-1).reshape(tl, n)
            # the last device owns the global tail; psum replicates it
            new_hist = jax.lax.psum(
                jnp.where(i == n_dev - 1, full[-15:], 0), axes)
            return out, new_hist

        spec = P(axes)
        return jax.shard_map(local, mesh=mesh, in_specs=(spec, P()),
                             out_specs=(spec, P()), check_vma=False)(
                                 bits, history)

    return sharded_ti


def shard_resampler_backend(backend, mesh: Mesh, half: int):
    """Run the fused Pallas resampler under the mesh via shard_map.

    Each shard resamples its contiguous slice of the flat sample stream;
    the only coupling is the 2*half-sample input history at each shard
    boundary: shard i takes shard i-1's tail (one ppermute), shard 0
    takes the carried state (the previous batch's global tail), and the
    new replicated carry is the last shard's tail (one psum).  Exactly
    the minimal-halo pattern of make_sharded_time_interleave."""
    axes = mesh.axis_names
    n_dev = int(np.prod(mesh.devices.shape))
    h2 = 2 * half

    def sharded(planes, carry):
        if n_dev == 1:
            return backend(planes, carry)
        perm = [(s, s + 1) for s in range(n_dev - 1)]

        def local(re, im, c_r, c_i):
            i = jax.lax.axis_index(axes)
            tail_r = jax.lax.ppermute(re[-h2:], axes, perm)
            tail_i = jax.lax.ppermute(im[-h2:], axes, perm)
            prev = (jnp.where(i == 0, c_r, tail_r),
                    jnp.where(i == 0, c_i, tail_i))
            (yr, yi), (nr, ni) = backend((re, im), prev)
            new_c_r = jax.lax.psum(jnp.where(i == n_dev - 1, nr, 0), axes)
            new_c_i = jax.lax.psum(jnp.where(i == n_dev - 1, ni, 0), axes)
            return yr, yi, new_c_r, new_c_i

        spec = P(axes)
        yr, yi, cr, ci = jax.shard_map(
            local, mesh=mesh, in_specs=(spec, spec, P(), P()),
            out_specs=(spec, spec, P(), P()), check_vma=False)(
                planes[0], planes[1], carry[0], carry[1])
        return (yr, yi), (cr, ci)

    return sharded


class ShardedModulator:
    """Runs a Modulator data-parallel over the TF axis of a device mesh.

    ETI frames [T] are laid out as T = B * cif_count with B transmission
    frames sharded over the mesh; sequential state (TI history, resampler
    carries) is replicated, with the boundary halos exchanged by XLA.
    """

    def __init__(self, modulator: Modulator, mesh: Mesh):
        if modulator._ofdm_backend is not None:
            # run the fused Pallas kernel under the mesh via shard_map
            # (a shallow copy so the single-chip modulator keeps its
            # unmapped backend)
            import copy
            wrapped = shard_ofdm_backend(
                modulator._ofdm_backend, mesh,
                has_stats=modulator.settings.enable_cfr)
            modulator = copy.copy(modulator)
            modulator._ofdm_backend = wrapped
        else:
            import copy
            modulator = copy.copy(modulator)
        # minimal-halo time interleaver (bit-identical, ~9x less
        # collective payload than the auto-SPMD partition of the concat
        # formulation -- see make_sharded_time_interleave)
        modulator._time_interleave = make_sharded_time_interleave(mesh)
        if modulator._res_backend is not None:
            modulator._res_backend = shard_resampler_backend(
                modulator._res_backend, mesh, modulator._poly_plan.half)
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
