"""Fixed-slot hash table for TPU k-mer lookup — the hot-path index.

Motivation (measured on TPU v5e): XLA gathers cost ~15 ns/element regardless
of table size, so the sorted-array binary search pays ~log2(N) gathers per
query (3.7 s / 4M queries on a 16M-key DB), while W-wide row gathers amortize
to ~1.5x the cost of a scalar gather.  This table answers a query with TWO
row gathers + ONE scalar label gather (~0.3 s / 4M queries):

  * T1: [n1, C] uint64 key slots, bucket = top bits of an odd-multiplier
    Fibonacci mix of the canonical value (build-time overflow ~0.3% at load
    C/2)
  * T2: much smaller spill table with an independent mixer for T1 overflow
  * labels: flat [ (n1+n2)*C ] int32, gathered at the matched slot index

Empty slots hold the sentinel 0xFF..FF (impossible for k <= 31 canonical
values) with label 0, so padded queries and misses resolve to label 0 ("NA"),
matching the engine's miss convention.

This replaces the reference's bucketed quotient/remainder probe
(CuClarkDB.cu:1189-1254) as the in-memory layout only; the on-disk format is
still the reference's .sz/.ky/.lb (io/dbformat.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)
_MIX1 = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / golden ratio, odd
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime, odd


def _mix_np(q: np.ndarray, mult: np.uint64, mbits: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((q * mult) >> np.uint64(64 - mbits)).astype(np.int64)


@dataclasses.dataclass
class RadixTable:
    """Host-side build result; arrays are ready for jax.device_put."""

    t1_keys: np.ndarray  # [n1, C] uint64
    t2_keys: np.ndarray  # [n2, C] uint64
    labels: np.ndarray  # [(n1+n2)*C] int32, label+1, 0 = empty
    m1: int  # log2(n1)
    m2: int  # log2(n2)
    slot_width: int

    @property
    def nbytes(self) -> int:
        return self.t1_keys.nbytes + self.t2_keys.nbytes + self.labels.nbytes


def _fill_table(keys, labels1, mult, mbits, c):
    """Place keys into an [2^mbits, c] table; returns (table, slot_labels,
    overflow_mask)."""
    n = 1 << mbits
    b = _mix_np(keys, mult, mbits)
    order = np.argsort(b, kind="stable")
    bs = b[order]
    # rank of each key within its bucket
    start_of_run = np.concatenate([[True], bs[1:] != bs[:-1]])
    run_id = np.cumsum(start_of_run) - 1
    run_first = np.nonzero(start_of_run)[0]
    rank = np.arange(len(bs)) - run_first[run_id]
    fits = rank < c
    tbl = np.full((n, c), EMPTY, dtype=np.uint64)
    lab = np.zeros((n, c), dtype=np.int32)
    tbl[bs[fits], rank[fits]] = keys[order][fits]
    lab[bs[fits], rank[fits]] = labels1[order][fits]
    overflow = np.zeros(len(keys), dtype=bool)
    overflow[order[~fits]] = True
    return tbl, lab, overflow


def build(keys: np.ndarray, labels1: np.ndarray, c: int = 8, load: float = 0.5) -> RadixTable:
    """Build the two-level table from unique uint64 keys and int32 labels(+1).
    """
    keys = np.asarray(keys, dtype=np.uint64)
    labels1 = np.asarray(labels1, dtype=np.int32)
    n = max(len(keys), 1)
    m1 = max(int(np.ceil(np.log2(n / (c * load)))), 1) if n > c else 1
    t1, l1, ovf = _fill_table(keys, labels1, _MIX1, m1, c)

    k2 = keys[ovf]
    v2 = labels1[ovf]
    m2 = max(m1 - 6, 1)
    while True:
        t2, l2, ovf2 = _fill_table(k2, v2, _MIX2, m2, c)
        if not ovf2.any():
            break
        m2 += 1
        if m2 > m1:
            raise RuntimeError("radix table build failed to place all keys")
    labels = np.concatenate([l1.ravel(), l2.ravel()])
    return RadixTable(
        t1_keys=t1, t2_keys=t2, labels=labels, m1=m1, m2=m2, slot_width=c
    )


def chunk_table(table: RadixTable, n_chunks: int):
    """Split a RadixTable row-wise into n_chunks contiguous chunks for
    out-of-core cycling (the reference's DB parts/cycles scheme,
    CuClarkDB.cu:526-565): every canonical key lives in exactly one chunk, so
    per-chunk hit counts add across cycles.

    Returns a list of dicts with t1/t2 row blocks, a per-chunk flat label
    array, and the global start rows (for masked local probing).
    """
    c = table.slot_width

    def pad_rows(a, fill, dtype):
        r = (-a.shape[0]) % n_chunks
        if r:
            a = np.concatenate([a, np.full((r,) + a.shape[1:], fill, dtype)])
        return a

    t1 = pad_rows(table.t1_keys, EMPTY, np.uint64)
    t2 = pad_rows(table.t2_keys, EMPTY, np.uint64)
    n1o, n2o = table.t1_keys.shape[0], table.t2_keys.shape[0]
    l1 = np.zeros((t1.shape[0], c), np.int32)
    l1[:n1o] = table.labels[: n1o * c].reshape(-1, c)
    l2 = np.zeros((t2.shape[0], c), np.int32)
    l2[:n2o] = table.labels[n1o * c :].reshape(-1, c)
    r1 = t1.shape[0] // n_chunks
    r2 = t2.shape[0] // n_chunks
    out = []
    for i in range(n_chunks):
        out.append(
            dict(
                t1=t1[i * r1 : (i + 1) * r1],
                t2=t2[i * r2 : (i + 1) * r2],
                labels=np.concatenate(
                    [l1[i * r1 : (i + 1) * r1].ravel(), l2[i * r2 : (i + 1) * r2].ravel()]
                ),
                start1=i * r1,
                start2=i * r2,
            )
        )
    return out


def probe_chunk(t1_blk, t2_blk, labels_flat, q, start1, start2, *, m1: int, m2: int, c: int):
    """Masked probe of one row-chunk: like `probe` but rows [start, start+R)
    of each level; out-of-range buckets miss.  start1/start2 are traced
    scalars so one compilation serves every chunk."""
    import jax.numpy as jnp

    rows1_per = t1_blk.shape[0]
    rows2_per = t2_blk.shape[0]

    def level(tbl, mult, mbits, rows_per, base, start):
        b = ((q * jnp.uint64(mult)) >> jnp.uint64(64 - mbits)).astype(jnp.int32)
        lrow = b - start
        inrange = (lrow >= 0) & (lrow < rows_per)
        lrow = jnp.clip(lrow, 0, rows_per - 1)
        rows = tbl[lrow]
        hit = (rows == q[:, None]) & inrange[:, None]
        s = jnp.argmax(hit, axis=1).astype(jnp.int32)
        return jnp.any(hit, axis=1), base + lrow * c + s

    any1, idx1 = level(t1_blk, _MIX1, m1, rows1_per, 0, start1)
    any2, idx2 = level(t2_blk, _MIX2, m2, rows2_per, rows1_per * c, start2)
    lab = jnp.where(any1, labels_flat[idx1], jnp.where(any2, labels_flat[idx2], 0))
    return jnp.where(any1 | any2, lab, 0)


def probe(t1_keys, t2_keys, labels, q, *, m1: int, m2: int, c: int):
    """Device-side lookup: label+1 per query, 0 on miss.  jax arrays in,
    jax array out; static m1/m2/c."""
    import jax.numpy as jnp

    n1 = 1 << m1
    qm = q
    b1 = ((qm * jnp.uint64(_MIX1)) >> jnp.uint64(64 - m1)).astype(jnp.int32)
    rows1 = t1_keys[b1]  # [Q, C]
    hit1 = rows1 == qm[:, None]
    s1 = jnp.argmax(hit1, axis=1).astype(jnp.int32)
    any1 = jnp.any(hit1, axis=1)

    b2 = ((qm * jnp.uint64(_MIX2)) >> jnp.uint64(64 - m2)).astype(jnp.int32)
    rows2 = t2_keys[b2]
    hit2 = rows2 == qm[:, None]
    s2 = jnp.argmax(hit2, axis=1).astype(jnp.int32)
    any2 = jnp.any(hit2, axis=1)

    idx = jnp.where(any1, b1 * c + s1, n1 * c + b2 * c + s2)
    lab = labels[idx]
    # sentinel-valued (padded) queries match EMPTY slots whose label is 0, so
    # they already return 0; the where() keeps true double-misses at 0 too.
    return jnp.where(any1 | any2, lab, 0)
