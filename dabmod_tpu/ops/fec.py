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


# Bits are int32 {0,1}: the TPU VPU has native 32-bit lanes, and the axon
# backend lacks sub-32-bit shifts, so unpacking uses mask-compare instead of
# shift ops and sub-32-bit arrays are avoided on the hot path.
BIT_DTYPE = jnp.int32

_BIT_MASKS = (1 << np.arange(7, -1, -1)).astype(np.int32)  # MSB first


def unpack_bits(data: jnp.ndarray) -> jnp.ndarray:
    """[..., n_bytes] uint8 -> [..., n_bytes*8] int32 bits (MSB first)."""
    b = data.astype(jnp.int32)
    bits = ((b[..., None] & jnp.asarray(_BIT_MASKS)) != 0).astype(BIT_DTYPE)
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., n_bits] bits -> [..., n_bits/8] int32 byte values (MSB first)."""
    n = bits.shape[-1] // 8
    b = bits.reshape(*bits.shape[:-1], n, 8).astype(jnp.int32)
    return (b * jnp.asarray(_BIT_MASKS)).sum(axis=-1)


def scramble(bits: jnp.ndarray, prbs: jnp.ndarray) -> jnp.ndarray:
    """Energy dispersal: XOR with the precomputed PRBS bit sequence."""
    return bits ^ prbs


def conv_encode(bits: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """K=7 rate-1/4 convolutional encoder, generators 133/171/145/133 octal
    (ref: src/ConvEncoder.cpp:59-150).

    Each generator stream is an XOR of *static slices* of the zero-padded
    input (delay taps), which XLA compiles to cheap shifted adds -- no
    gathers.  bits: [..., n_bits]; out: [..., 4*(n_bits+6)] interleaved
    [y0[i], y1[i], y2[i], y3[i]].
    """
    from ..tables import CONV_TAPS
    steps = n_bits + 6
    zeros6 = jnp.zeros((*bits.shape[:-1], 6), bits.dtype)
    padded = jnp.concatenate([zeros6, bits, zeros6], axis=-1)
    streams = []
    for taps in CONV_TAPS:
        acc = padded[..., 6 - taps[0]: 6 - taps[0] + steps]
        for d in taps[1:]:
            acc = acc ^ padded[..., 6 - d: 6 - d + steps]
        streams.append(acc)
    return jnp.stack(streams, axis=-1).reshape(*bits.shape[:-1], steps * 4)


def puncture(bits: jnp.ndarray, keep_idx: jnp.ndarray) -> jnp.ndarray:
    """Apply a precompiled puncturing gather (tables.puncture_gather)."""
    padded = jnp.concatenate(
        [bits, jnp.zeros((*bits.shape[:-1], 1), bits.dtype)], axis=-1)
    return padded[..., keep_idx]


def puncture_regions(bits: jnp.ndarray, plan) -> jnp.ndarray:
    """Gather-free puncturing from a tables.puncture_plan.

    Within each rule region the same 32-bit (24 for the tail) pattern
    repeats word-for-word, so compaction is a reshape to [n_words, width]
    plus static column slices -- pure slice/concat vector code, where the
    index-gather form hits the TPU's slow scalar gather path.
    """
    regions, pad_bits, _out_bytes = plan
    lead = bits.shape[:-1]
    parts = []
    for start, n_words, width, cols in regions:
        seg = bits[..., start:start + n_words * width]
        seg = seg.reshape(*lead, n_words, width)
        kept = jnp.concatenate([seg[..., c:c + 1] for c in cols], axis=-1)
        parts.append(kept.reshape(*lead, n_words * len(cols)))
    if pad_bits:
        parts.append(jnp.zeros((*lead, pad_bits), bits.dtype))
    return jnp.concatenate(parts, axis=-1)


def fec_path(bits: jnp.ndarray, prbs: jnp.ndarray, n_bits: int,
             punct) -> jnp.ndarray:
    """scramble -> convolutional encode -> puncture, fully fused.

    `punct` is either a tables.puncture_plan tuple (gather-free fast path)
    or a precompiled keep-index array (tables.puncture_gather)."""
    conv = conv_encode(scramble(bits, prbs), n_bits)
    if isinstance(punct, tuple):
        return puncture_regions(conv, punct)
    return puncture(conv, punct)


# The DAB interleaving rule delays bit b by DELAYS[b mod 16] CIFs -- the
# bit-reversed 0..15 sequence (ref: src/TimeInterleaver.cpp:66-92,
# EN 300 401 Table 21).
TI_DELAYS = (0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)


def time_interleave(bits: jnp.ndarray, history: jnp.ndarray,
                    delay_masks: jnp.ndarray | None = None
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DAB time interleaver over a batch of consecutive CIFs.

    bits:        [T, n] current frames in time order
    history:     [15, n] the 15 previous frames (history[-1] = most recent)
    delay_masks: unused (kept for call-site compatibility); the delay of
                 bit b is the static TI_DELAYS[b mod 16] rule

    Returns (out [T, n], new_history [15, n]).  The interleaver is a pure
    per-bit delay line (ref: src/TimeInterleaver.cpp:66-92).  Because the
    delay depends only on b mod 16, reshaping the bit axis to [n/16, 16]
    makes each of the 16 lanes a *static slice* along the CIF axis -- one
    HBM pass over the data, versus 16 passes for the masked-shift
    formulation (the frontend's former bandwidth hotspot).
    """
    T, n = bits.shape
    full = jnp.concatenate([history, bits], axis=0)           # [15+T, n]
    fr = full.reshape(15 + T, n // 16, 16)
    lanes = [fr[15 - d:15 - d + T, :, j]
             for j, d in enumerate(TI_DELAYS)]
    out = jnp.stack(lanes, axis=-1).reshape(T, n)
    return out, full[-15:]


def assemble_cif(subch_bits: list[jnp.ndarray], offsets_bits: list[int],
                 filler_bits: jnp.ndarray) -> jnp.ndarray:
    """Overlay sub-channel frames into the 864-CU CIF over the PRBS filler
    (ref: src/FrameMultiplexer.cpp:43-91).

    subch_bits: per-subchannel [T, framesize_cu*64] bit arrays
    offsets_bits: static start offsets (start_address * 64)
    filler_bits: [CIF_BITS] PRBS filler

    Non-overlapping sub-channels (every real mux) assemble as ONE concat
    of [filler gap, sub, filler gap, ...] pieces -- a single pass over the
    CIF, where patching one sub-channel at a time rewrites the full array
    S times (a 17-sub-channel ensemble would move ~17x the bits).
    """
    T = subch_bits[0].shape[0] if subch_bits else None
    n = filler_bits.shape[0]
    order = sorted(range(len(subch_bits)), key=lambda i: offsets_bits[i])
    disjoint = all(
        offsets_bits[order[k]] + subch_bits[order[k]].shape[1]
        <= offsets_bits[order[k + 1]]
        for k in range(len(order) - 1))
    if T is not None and subch_bits and disjoint \
            and offsets_bits[order[-1]] \
            + subch_bits[order[-1]].shape[1] <= n:
        pieces = []
        pos = 0
        fill = jnp.broadcast_to(filler_bits, (T, n))
        for i in order:
            off, sb = offsets_bits[i], subch_bits[i]
            if off > pos:
                pieces.append(fill[:, pos:off])
            pieces.append(sb)
            pos = off + sb.shape[1]
        if pos < n:
            pieces.append(fill[:, pos:])
        return jnp.concatenate(pieces, axis=1)
    # overlapping/degenerate layouts: sequential overlay like the reference
    cif = jnp.broadcast_to(filler_bits, (T, n)) \
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
