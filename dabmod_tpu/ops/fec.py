"""Bit-domain FEC chain as batched JAX ops.

The reference implements these stages as per-frame byte loops
(src/PrbsGenerator.cpp, src/ConvEncoder.cpp, src/PuncturingEncoder.cpp,
src/TimeInterleaver.cpp, src/FrameMultiplexer.cpp, src/BlockPartitioner.cpp).
Here every stage is a static gather / XOR over {0,1} uint8 bit arrays with a
leading batch axis, compiled by XLA into fused vector code; all indices come
precomputed from :mod:`dabmod_tpu.tables`.

Convention: a "bit array" has dtype uint8 with values in {0,1}, MSB-first
relative to the reference's byte streams.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import tables


# byte -> 8 bits lookup (the axon TPU backend lacks sub-32-bit shifts, so
# unpacking is a single uint8 gather instead of shift/mask ops)
_UNPACK_LUT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1)      # [256, 8]
_PACK_WEIGHTS = (1 << np.arange(7, -1, -1)).astype(np.int32)


def unpack_bits(data: jnp.ndarray) -> jnp.ndarray:
    """[..., n_bytes] uint8 -> [..., n_bytes*8] bits (MSB first)."""
    bits = jnp.asarray(_UNPACK_LUT)[data.astype(jnp.int32)]
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., n_bits] bits -> [..., n_bits/8] int32 byte values (MSB first)."""
    n = bits.shape[-1] // 8
    b = bits.reshape(*bits.shape[:-1], n, 8).astype(jnp.int32)
    return (b * jnp.asarray(_PACK_WEIGHTS)).sum(axis=-1)


def scramble(bits: jnp.ndarray, prbs: jnp.ndarray) -> jnp.ndarray:
    """Energy dispersal: XOR with the precomputed PRBS bit sequence."""
    return bits ^ prbs


def conv_encode(bits: jnp.ndarray, src_idx: jnp.ndarray) -> jnp.ndarray:
    """K=7 rate-1/4 convolutional encoder as a gather-XOR.

    bits: [..., N]; src_idx from tables.conv_gather_tables(N) with shape
    [n_taps, 4*(N+6)]; out: [..., 4*(N+6)].
    """
    padded = jnp.concatenate(
        [bits, jnp.zeros((*bits.shape[:-1], 1), bits.dtype)], axis=-1)
    acc = padded[..., src_idx[0]]
    for t in range(1, src_idx.shape[0]):
        acc = acc ^ padded[..., src_idx[t]]
    return acc


def puncture(bits: jnp.ndarray, keep_idx: jnp.ndarray) -> jnp.ndarray:
    """Apply a precompiled puncturing gather (tables.puncture_gather)."""
    padded = jnp.concatenate(
        [bits, jnp.zeros((*bits.shape[:-1], 1), bits.dtype)], axis=-1)
    return padded[..., keep_idx]


def fec_path(bits: jnp.ndarray, prbs: jnp.ndarray, conv_idx: jnp.ndarray,
             punct_idx: jnp.ndarray) -> jnp.ndarray:
    """scramble -> convolutional encode -> puncture, fully fused."""
    return puncture(conv_encode(scramble(bits, prbs), conv_idx), punct_idx)


def time_interleave(bits: jnp.ndarray, history: jnp.ndarray,
                    delays: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DAB time interleaver over a batch of consecutive CIFs.

    bits:    [T, n] current frames in time order
    history: [15, n] the 15 previous frames (history[-1] = most recent)
    delays:  [n] per-bit CIF delay (tables.time_interleave_delays)

    Returns (out [T, n], new_history [15, n]).  Because the interleaver is a
    pure per-bit delay line (ref: src/TimeInterleaver.cpp:66-92), a batch of T
    frames is a single parallel gather over the time axis -- no sequential
    scan is needed.
    """
    T = bits.shape[0]
    full = jnp.concatenate([history, bits], axis=0)           # [15+T, n]
    t_idx = 15 + jnp.arange(T, dtype=jnp.int32)[:, None] - delays[None, :]
    out = jnp.take_along_axis(full, t_idx, axis=0)
    new_history = full[-15:]
    return out, new_history


def assemble_cif(subch_bits: list[jnp.ndarray], offsets_bits: list[int],
                 filler_bits: jnp.ndarray) -> jnp.ndarray:
    """Overlay sub-channel frames into the 864-CU CIF over the PRBS filler
    (ref: src/FrameMultiplexer.cpp:43-91).

    subch_bits: per-subchannel [T, framesize_cu*64] bit arrays
    offsets_bits: static start offsets (start_address * 64)
    filler_bits: [CIF_BITS] PRBS filler
    """
    T = subch_bits[0].shape[0] if subch_bits else None
    cif = jnp.broadcast_to(filler_bits, (T, filler_bits.shape[0])) \
        if T is not None else filler_bits[None]
    for sb, off in zip(subch_bits, offsets_bits):
        cif = jnp.concatenate(
            [cif[:, :off], sb, cif[:, off + sb.shape[1]:]], axis=1)
    return cif


def block_partition(fic_bits: jnp.ndarray, cif_bits: jnp.ndarray,
                    cif_count: int) -> jnp.ndarray:
    """Group cif_count CIFs into one transmission-frame bit stream:
    [cifCount x FIC][cifCount x CIF] (ref: src/BlockPartitioner.cpp:78-124).

    fic_bits: [T, fic_out_bits] per ETI frame; cif_bits: [T, CIF_BITS];
    T must be a multiple of cif_count.  Returns [T/cifCount, tf_bits].
    """
    B = fic_bits.shape[0] // cif_count
    f = fic_bits.reshape(B, cif_count * fic_bits.shape[1])
    c = cif_bits.reshape(B, cif_count * cif_bits.shape[1])
    return jnp.concatenate([f, c], axis=1)
