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
