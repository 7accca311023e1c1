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
    ((slots, labels) device arrays, batch_fn(words, vwords) -> results).

    Rows are split into contiguous chunks (padded to a multiple of the
    device count with EMPTY rows — queries can still hash into padded rows,
    which simply miss).  Each device probes its local rows and the per-query
    labels are merged with a psum: a key lives in exactly one row, hence on
    exactly one device; the tiny stash is replicated but gated to device 0.
    """
    import numpy as np

    from ..ops import device_pipeline, radix_table, score

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    c = table.slot_width
    lb = table.lb
    m1 = table.m1

    slots = table.slots
    r = (-slots.shape[0]) % ndev
    labels = table.labels
    if r:
        slots = np.concatenate(
            [slots, np.full((r, c), radix_table.EMPTY, np.uint64)]
        )
        if labels.size:
            labels = np.concatenate([labels, np.zeros(r * c, np.uint32)])
    rows_per = slots.shape[0] // ndev

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    slots_d = jax.device_put(jnp.asarray(slots), shard)
    if labels.size:
        lab_d = jax.device_put(
            jnp.asarray(labels.reshape(ndev, rows_per * c)), shard
        )
    else:
        lab_d = jax.device_put(
            jnp.zeros((ndev, 1), jnp.uint32), shard
        )
    sk_d = jax.device_put(jnp.asarray(table.stash_keys), repl)
    sl_d = jax.device_put(jnp.asarray(table.stash_labels), repl)

    def local_fn(slots_blk, lab_blk, stash_keys, stash_labels, words, vwords):
        canon, valid = device_pipeline.window_canonicals(words, vwords, k)
        q = jnp.where(valid, canon, radix_table.EMPTY).ravel()
        d = jax.lax.axis_index(axis)
        lab = radix_table.probe_chunk(
            slots_blk,
            lab_blk.reshape(-1),
            stash_keys,
            stash_labels,
            q,
            d * rows_per,
            m1=m1,
            lb=lb,
            c=c,
            use_stash=(d == 0),
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
        in_specs=(P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
    )
    jfn = jax.jit(fn)

    def batch_fn(words, vwords):
        words = jax.device_put(words, repl)
        vwords = jax.device_put(vwords, repl)
        return jfn(slots_d, lab_d, sk_d, sl_d, words, vwords)

    return (slots_d, lab_d), batch_fn


def shard_reads(mesh: Mesh, table, n_targets: int, k: int):
    """Data-parallel mode: DB replicated, READ ROWS sharded over the mesh.

    This is the throughput-scaling mode (the row-gather probe costs ~15ns per
    QUERY regardless of table size, so splitting the queries divides device
    time by P, while splitting the DB does not).  Equivalent to the
    reference's multi-node sample parallelism (kent-mpi), but within one
    batch over ICI.  No collectives: every read's windows live on one device;
    outputs come back row-sharded.
    """
    from ..ops import device_pipeline, radix_table, score

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(axis))
    slots_d = jax.device_put(jnp.asarray(table.slots), repl)
    lab_d = jax.device_put(jnp.asarray(table.labels), repl)
    sk_d = jax.device_put(jnp.asarray(table.stash_keys), repl)
    sl_d = jax.device_put(jnp.asarray(table.stash_labels), repl)
    meta = table.meta

    def local_fn(slots, labels, sk, sl, words, vwords):
        return device_pipeline.classify_batch(
            slots, labels, sk, sl, words, vwords,
            k=k, n_targets=n_targets, **meta,
        )

    fn = shard_map(
        local_fn,
        mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
    )
    jfn = jax.jit(fn)

    def batch_fn(words, vwords):
        import numpy as np

        r = (-words.shape[0]) % ndev
        if r:
            words = jnp.concatenate(
                [words, jnp.zeros((r, words.shape[1]), jnp.uint64)]
            )
            vwords = jnp.concatenate(
                [vwords, jnp.zeros((r, vwords.shape[1]), jnp.uint64)]
            )
        words = jax.device_put(words, rows)
        vwords = jax.device_put(vwords, rows)
        return jfn(slots_d, lab_d, sk_d, sl_d, words, vwords)

    return (slots_d, lab_d), batch_fn


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
