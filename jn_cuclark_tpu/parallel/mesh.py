"""Database sharding over a JAX device mesh.

TPU-native replacement for the reference's multi-GPU DB partitioning + P2P
result merging (CuClarkDB.cu:526-565, 842-928): the sorted canonical-key
index is split into equal contiguous shards over a one-axis mesh ("db");
every device searches the full query batch against its shard (a query hits in
at most one shard) and the per-query label is merged with a `psum` over the
ICI instead of peer-to-peer memcpy merge trees.  Scoring then proceeds
replicated on every device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import lookup, score

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def shard_radix_table(mesh: Mesh, table, n_targets: int, k: int):
    """Shard a RadixTable row-wise over the mesh and return
    ((t1, t2, labels) device arrays, batch_fn(words, vwords) -> results).

    Both levels are split into contiguous row chunks (rows padded to a
    multiple of the device count with EMPTY rows — queries can still hash
    into padded rows, which simply miss).  Each device probes its local rows
    and the per-query labels are merged with a psum: a key lives in exactly
    one table row, hence on exactly one device.
    """
    import numpy as np

    from ..ops import device_pipeline, radix_table, score

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    c = table.slot_width

    def pad_rows(a):
        r = (-a.shape[0]) % ndev
        if r:
            a = np.concatenate(
                [a, np.full((r,) + a.shape[1:], radix_table.EMPTY, a.dtype)]
            )
        return a

    t1 = pad_rows(table.t1_keys)
    t2 = pad_rows(table.t2_keys)
    n1, n2 = t1.shape[0], t2.shape[0]
    rows1_per, rows2_per = n1 // ndev, n2 // ndev
    # per-shard flat labels: [shard, rows1_per*c + rows2_per*c]
    n1_orig, n2_orig = table.t1_keys.shape[0], table.t2_keys.shape[0]
    l1 = np.zeros((n1, c), np.int32)
    l1[:n1_orig] = table.labels[: n1_orig * c].reshape(-1, c)
    l2 = np.zeros((n2, c), np.int32)
    l2[:n2_orig] = table.labels[n1_orig * c :].reshape(-1, c)
    lab_sharded = np.concatenate(
        [
            l1.reshape(ndev, rows1_per * c),
            l2.reshape(ndev, rows2_per * c),
        ],
        axis=1,
    )  # [ndev, rows1_per*c + rows2_per*c]

    shard = NamedSharding(mesh, P(axis))
    t1_d = jax.device_put(jnp.asarray(t1), shard)
    t2_d = jax.device_put(jnp.asarray(t2), shard)
    lab_d = jax.device_put(jnp.asarray(lab_sharded), shard)
    repl = NamedSharding(mesh, P())

    m1, m2 = table.m1, table.m2

    def local_fn(t1_blk, t2_blk, lab_blk, words, vwords):
        canon, valid = device_pipeline.window_canonicals(words, vwords, k)
        q = jnp.where(valid, canon, radix_table.EMPTY).ravel()
        d = jax.lax.axis_index(axis)
        lab_flat = lab_blk.reshape(-1)

        def probe_level(tbl, mult, mbits, rows_per, base, start_row):
            b = ((q * mult) >> jnp.uint64(64 - mbits)).astype(jnp.int32)
            lrow = b - start_row
            inrange = (lrow >= 0) & (lrow < rows_per)
            lrow = jnp.clip(lrow, 0, rows_per - 1)
            rows = tbl[lrow]
            hit = (rows == q[:, None]) & inrange[:, None]
            s = jnp.argmax(hit, axis=1).astype(jnp.int32)
            return jnp.any(hit, axis=1), base + lrow * c + s

        any1, idx1 = probe_level(
            t1_blk, jnp.uint64(radix_table._MIX1), m1, rows1_per, 0, d * rows1_per
        )
        any2, idx2 = probe_level(
            t2_blk,
            jnp.uint64(radix_table._MIX2),
            m2,
            rows2_per,
            rows1_per * c,
            d * rows2_per,
        )
        lab = jnp.where(
            any1, lab_flat[idx1], jnp.where(any2, lab_flat[idx2], 0)
        )
        lab = jax.lax.psum(lab, axis)
        lab = jnp.where(valid.ravel(), lab, 0)
        R, S = valid.shape
        rid = jnp.repeat(jnp.arange(R, dtype=jnp.int32), S)
        counts = score.counts_from_hits(lab, rid, R, n_targets)
        total, ib, b_, isb, sb = score.read_results(counts)
        return total, ib, b_, sb, counts

    fn = shard_map(
        local_fn,
        mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
    )
    jfn = jax.jit(fn)

    def batch_fn(words, vwords):
        words = jax.device_put(words, repl)
        vwords = jax.device_put(vwords, repl)
        return jfn(t1_d, t2_d, lab_d, words, vwords)

    return (t1_d, t2_d, lab_d), batch_fn


def make_mesh(n_devices: int | None = None, axis: str = "db") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def shard_index(mesh: Mesh, keys, labels1, n_targets: int, plan):
    """Place the index sharded over the mesh; returns (keys, labels1, query_fn)
    with query_fn(keys, labels1, q, qread) -> (total, ibest, best, sbest, counts).
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    keys, labels1 = lookup.pad_index(keys, labels1, ndev)
    kshard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    keys_d = jax.device_put(jnp.asarray(keys), kshard)
    labels_d = jax.device_put(jnp.asarray(labels1), kshard)

    max_reads = plan.max_reads

    def local_fn(keys_blk, labels_blk, q, qread):
        lab = lookup.lookup_labels(keys_blk, labels_blk, q)
        lab = jax.lax.psum(lab, axis)  # at most one shard hits per query
        counts = score.counts_from_hits(lab, qread, max_reads, n_targets)
        total, ib, b, isb, sb = score.read_results(counts)
        return total, ib, b, sb, counts

    fn = shard_map(
        local_fn,
        mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
    )
    jfn = jax.jit(fn)

    def query_fn(keys_a, labels_a, q, qread):
        q = jax.device_put(q, repl)
        qread = jax.device_put(qread, repl)
        return jfn(keys_a, labels_a, q, qread)

    return keys_d, labels_d, query_fn
