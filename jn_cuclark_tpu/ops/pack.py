"""Host-side bit packing of read batches for the device pipeline.

Reads are laid out in a fixed-stride [R, S] grid (S = stride, multiple of 64
chars); 2-bit codes pack into uint64 words [R, S/32 + 1] (one zero guard word
per row) and per-char validity bits into uint64 words [R, S/64 + 1].  The
device reconstructs every window value with shifts only — no gathers — so the
host->device transfer is 2.25 bits/char instead of 64 bits/window.

Replaces the reference's CONTAINER packing (CuCLARK_hh.hh:1610-1726); the
part-boundary semantics (k-mers never span an invalid char or a read
boundary) are carried entirely by the validity bitmask and row padding.
"""

from __future__ import annotations

import numpy as np

from ..io.fasta import ReadSet


def quantized_stride(max_len: int) -> int:
    """Smallest allowed stride >= max_len.  Strides are multiples of 64 up to
    1024 (fine-grained: short-read batches waste few pad slots) and powers of
    two above (bounds jit recompilation; each shape compiles once and is
    persisted in the jit cache)."""
    if max_len <= 1024:
        return max(64, (max_len + 63) // 64 * 64)
    s = 2048
    while s < max_len:
        s *= 2
    return s


def pack_batch(rs: ReadSet, r0: int, r1: int, stride: int):
    """Pack reads [r0, r1) into (words [R, S/32+1] u64, vwords [R, S/64+1] u64).

    Reads longer than stride must not be passed here.
    """
    R = r1 - r0
    S = stride
    codes2d = np.zeros((R, S), dtype=np.uint8)
    valid2d = np.zeros((R, S), dtype=bool)
    offs = rs.read_offsets
    lens = (offs[r0 + 1 : r1 + 1] - offs[r0:r1]).astype(np.int64)
    if (lens > S).any():
        raise ValueError("read longer than stride in pack_batch")
    # scatter all batch chars at once
    total = int(lens.sum())
    if total:
        src = rs.codes[offs[r0] : offs[r1]]
        rows = np.repeat(np.arange(R), lens)
        cols = np.arange(total) - np.repeat(offs[r0:r1] - offs[r0], lens)
        valid_src = src >= 0
        codes2d[rows, cols] = np.where(valid_src, src, 0).astype(np.uint8)
        valid2d[rows, cols] = valid_src

    return _pack_grids(codes2d, valid2d)


def pack_batch_idx(rs: ReadSet, idx: np.ndarray, stride: int):
    """pack_batch for an arbitrary read index set (length-bucketed batches
    gather reads of one stride tier from across a planning window)."""
    idx = np.asarray(idx, dtype=np.int64)
    R = len(idx)
    S = stride
    codes2d = np.zeros((R, S), dtype=np.uint8)
    valid2d = np.zeros((R, S), dtype=bool)
    offs = rs.read_offsets
    starts = offs[idx]
    lens = (offs[idx + 1] - starts).astype(np.int64)
    if (lens > S).any():
        raise ValueError("read longer than stride in pack_batch")
    total = int(lens.sum())
    if total:
        rows = np.repeat(np.arange(R), lens)
        cum = np.concatenate([[0], np.cumsum(lens[:-1])])
        cols = np.arange(total) - np.repeat(cum, lens)
        src = rs.codes[np.repeat(starts, lens) + cols]
        valid_src = src >= 0
        codes2d[rows, cols] = np.where(valid_src, src, 0).astype(np.uint8)
        valid2d[rows, cols] = valid_src
    return _pack_grids(codes2d, valid2d)


def _pack_grids(codes2d: np.ndarray, valid2d: np.ndarray):
    R, S = codes2d.shape
    w = S // 32
    shifts = (np.arange(32, dtype=np.uint64) * np.uint64(2))[None, None, :]
    words = (codes2d.reshape(R, w, 32).astype(np.uint64) << shifts).sum(
        axis=2, dtype=np.uint64
    )
    words = np.concatenate([words, np.zeros((R, 1), dtype=np.uint64)], axis=1)

    wv = S // 64
    vshifts = np.arange(64, dtype=np.uint64)[None, None, :]
    vwords = (valid2d.reshape(R, wv, 64).astype(np.uint64) << vshifts).sum(
        axis=2, dtype=np.uint64
    )
    vwords = np.concatenate([vwords, np.zeros((R, 1), dtype=np.uint64)], axis=1)
    return words, vwords
