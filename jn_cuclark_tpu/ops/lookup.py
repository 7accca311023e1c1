"""Device-side k-mer lookup: sorted-array exact-match search.

TPU-native replacement for the reference's bucketed hash probe
(CuClarkDB.cu:1189-1254 queryElement).  Instead of the quotient/remainder
chained table, the device index is the flat array of canonical k-mer values
sorted ascending plus a parallel label array; a query is a vectorized binary
search (exact match or miss).  This is mathematically equivalent: both are
exact-match lookups of canonical values, and the disk format round-trips
through `io.dbformat` unchanged.

Misses and padding resolve to label sentinel 0; real labels are stored +1
(matching the reference's "NA at index 0" convention, CuClarkDB.cu:1390).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PAD_QUERY = np.uint64(0xFFFFFFFFFFFFFFFF)  # padding sentinel; never a k-mer (k<=31)


def prepare_index(canonical: np.ndarray, labels: np.ndarray):
    """Sort (canonical, label) by value; returns host arrays ready for the
    device.  Labels are stored +1 (0 = miss/NA)."""
    order = np.argsort(canonical, kind="stable")
    keys = canonical[order]
    lab = labels[order].astype(np.int32) + 1
    return keys, lab


def pad_index(keys: np.ndarray, labels1: np.ndarray, multiple: int):
    """Pad to a multiple (for even mesh sharding) with +inf keys / 0 labels."""
    n = len(keys)
    m = (-n) % multiple
    if m:
        keys = np.concatenate([keys, np.full(m, PAD_QUERY, dtype=np.uint64)])
        labels1 = np.concatenate([labels1, np.zeros(m, dtype=np.int32)])
    return keys, labels1


def lookup_labels(keys: jnp.ndarray, labels1: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """For each query value, the stored label+1, or 0 on miss.

    keys must be sorted ascending; q may contain PAD_QUERY sentinels (miss).
    """
    n = keys.shape[0]
    idx = jnp.searchsorted(keys, q)
    idxc = jnp.minimum(idx, n - 1)
    hit = keys[idxc] == q
    # sentinel keys map to label 0 already, but guard PAD anyway
    hit = hit & (q != jnp.uint64(PAD_QUERY))
    return jnp.where(hit, labels1[idxc], 0)
