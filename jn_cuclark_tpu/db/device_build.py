"""Device-side (TPU) DB aggregation.

The build-time hot loop — grouping ~10^8 canonical k-mer occurrences and
applying the multiplicity rules — is a sort + segmented reduction, which is
exactly what the accelerator is good at (`lax.sort`: 4M u64 in 37 ms on v5e
vs ~300 ms/M single-thread on the host).  This path sorts (canon, seqno) on
device, computes first-occurrence labels by forward-fill, and reduces
multiplicity/count/first-seq with segment sums; the host only compacts the
group-start mask.

Use via `builder.build_database(..., device=True)` or
`clark-tpu db build --device`.  Host paths (numpy + native C++) remain the
default: on hardware where the host<->device link is slow relative to the
host CPU, shipping the occurrence stream may dominate.  On real TPU hosts
(PCIe) this path wins for large builds.

Equivalence with the host aggregation is tested for every mode.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.partial(
    __import__("jax").jit, static_argnames=("lelement",)
)
def _aggregate_device(canon, label, pg_of_label, *, lelement: bool):
    import jax
    import jax.numpy as jnp

    n = canon.shape[0]
    seq = jnp.arange(n, dtype=jnp.int64)
    c, s, l = jax.lax.sort((canon, seq, label.astype(jnp.int32)), num_keys=2)

    grp_start = jnp.concatenate([jnp.ones(1, bool), c[1:] != c[:-1]])
    gid = jnp.cumsum(grp_start.astype(jnp.int64)) - 1
    # forward-fill the first label of each group
    start_pos = jnp.where(grp_start, jnp.arange(n, dtype=jnp.int64), -1)
    ff = jax.lax.associative_scan(jnp.maximum, start_pos)
    L0_of = l[ff]
    pg = pg_of_label
    d = (l != L0_of).astype(jnp.int32) + (pg[l] != pg[L0_of]).astype(jnp.int32)
    d = jnp.where(grp_start, 0, d)
    mult_g = 1 + jax.ops.segment_sum(d, gid, num_segments=n)
    mult_g = jnp.minimum(mult_g, 255)
    gsize = jax.ops.segment_sum(jnp.ones(n, jnp.int32), gid, num_segments=n)
    count_g = jnp.minimum(gsize, 254) if lelement else gsize
    first_g = jax.ops.segment_min(s, gid, num_segments=n)
    return c, grp_start, L0_of, mult_g, count_g, first_g, gid


def aggregate_device(canon, label, pg, lelement: bool):
    """Same contract as native.aggregate_occurrences (unit counts)."""
    import jax.numpy as jnp

    n = len(canon)
    if n == 0:
        return (
            np.zeros(0, np.uint64),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
        )
    c, grp_start, L0_of, mult_g, count_g, first_g, gid = _aggregate_device(
        jnp.asarray(np.ascontiguousarray(canon, np.uint64)),
        jnp.asarray(np.ascontiguousarray(label, np.int32)),
        jnp.asarray(np.ascontiguousarray(pg, np.int32)),
        lelement=lelement,
    )
    c = np.asarray(c)
    mask = np.asarray(grp_start)
    L0_of = np.asarray(L0_of)
    mult_g = np.asarray(mult_g)
    count_g = np.asarray(count_g)
    first_g = np.asarray(first_g)
    idx = np.nonzero(mask)[0]
    ng = len(idx)
    return (
        c[idx],
        L0_of[idx].astype(np.int32),
        mult_g[:ng].astype(np.int32),
        count_g[:ng].astype(np.int64),
        first_g[:ng].astype(np.int64),
    )


def link_calibration(sample_bytes: int = 1 << 25):
    """Measured (h2d_bytes_per_s, d2h_bytes_per_s) of the current
    host<->device link, from one round trip of `sample_bytes`.

    The device aggregate ships the occurrence stream down and the groups
    back up, so on a tunneled/remote runtime (relay H2D ~0.1-0.7 GB/s,
    D2H ~10 MB/s measured round 4) the transfer dwarfs the sort win,
    while on attached hosts (PCIe, 10+ GB/s) it vanishes.  One cheap
    measurement decides instead of a static assumption."""
    import time

    import jax

    x = np.zeros(sample_bytes // 8, np.int64)
    t0 = time.perf_counter()
    xd = jax.device_put(x)
    jax.block_until_ready(xd)
    h2d = sample_bytes / max(time.perf_counter() - t0, 1e-9)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(xd))
    d2h = sample_bytes / max(time.perf_counter() - t0, 1e-9)
    return h2d, d2h


#: measured host aggregate rate: 51.5 s / 46M occurrences on the 2-vCPU
#: reference container (docs/archive/STATUS_r4.md item 8b); scales with
#: host cores but is the conservative anchor for the decision below
HOST_S_PER_OCC = 1.1e-6


def estimate_speedup(n_occ: int, h2d: float, d2h: float):
    """(device_over_host_speedup, est_device_s, est_host_s) for an
    n_occ-occurrence aggregate at the measured link rates: 16 B/occ down
    (canon u64 + label u32 + padding), ~24 B/group up, plus the device
    sort at its measured per-element cost."""
    est_dev = n_occ * 16 / h2d + n_occ * 24 / d2h + n_occ * 0.02e-6
    est_host = n_occ * HOST_S_PER_OCC
    return est_host / max(est_dev, 1e-9), est_dev, est_host
