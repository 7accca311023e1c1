"""Automatic device-memory budgeting for DB residency.

The reference sizes DB parts x cycles from measured free device memory
minus a RESERVED headroom, and refuses to run below a 200 MB floor
(/root/reference/src/CuClarkDB.cu:526-565, 178-181;
 parameters.hh:45 RESERVED).  TPU-native equivalent: the probe's transient
HBM need is computed from the batch plan (the row gather materializes a
[queries, C] u64 block, plus the [R, S] window/validity grids), subtracted
together with a RESERVED headroom from the device's memory limit, and the
table's cycle count is derived so each resident chunk fits.  An oversized
DB then auto-cycles instead of dying with a raw XLA OOM.
"""

from __future__ import annotations

import os

RESERVED = 768 << 20  # headroom: extended-mode count matrices, scoring
# temporaries, runtime overhead (reference: 200 MB on Jetson-class devices)
HARD_FLOOR = 200 << 20  # reference parity: refuse to run below this


# device_kind substring -> HBM bytes (used only when memory_stats() is
# unavailable, e.g. the axon remote runtime)
_KIND_HBM = (
    ("v5 lite", 16 << 30),
    ("v5e", 16 << 30),
    ("v5p", 95 << 30),
    ("v6 lite", 32 << 30),
    ("v6e", 32 << 30),
    ("v4", 32 << 30),
    ("v3", 16 << 30),
    ("v2", 8 << 30),
)


def device_memory_limit(device=None) -> int | None:
    """Per-device accelerator memory in bytes, or None when unknowable
    (pure-CPU runs: host RAM is the OS's business, no auto-cycling).

    Resolution order: CLARK_TPU_DEVICE_MEM_BYTES env (also the test hook),
    live memory_stats(), device_kind table."""
    env = os.environ.get("CLARK_TPU_DEVICE_MEM_BYTES")
    if env:
        return int(env)
    import jax

    dev = device if device is not None else jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
        if stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    kind = (getattr(dev, "device_kind", "") or "").lower()
    for sub, size in _KIND_HBM:
        if sub in kind:
            return size
    if getattr(dev, "platform", "") == "cpu":
        return None
    return None


def probe_transient_bytes(window_budget: int, c: int) -> int:
    """Peak transient HBM of one batch step: the probe's [Q, C] u64 row
    gather (Q capped by the probe's lax.map chunking) plus the window
    extraction's [R, S]-shaped u64 intermediates (canon/valid/value grids,
    ~6 materialized at peak)."""
    from ..ops.radix_table import _PROBE_CHUNK

    q = min(window_budget, _PROBE_CHUNK)
    return q * c * 8 + window_budget * 8 * 6


def auto_db_cycles(
    table_bytes: int,
    window_budget: int,
    c: int,
    *,
    n_shards: int = 1,
    device=None,
) -> tuple[int, int | None]:
    """(db_cycles, per_device_budget_bytes) so each resident table chunk
    fits the device: cycles = ceil(per-shard table bytes / budget).

    Returns (1, None) when the device memory is unknowable (CPU).  Raises
    with actionable guidance when even maximal cycling cannot fit (budget
    below the reference's 200 MB floor)."""
    limit = device_memory_limit(device)
    if limit is None:
        return 1, None
    budget = limit - RESERVED - probe_transient_bytes(window_budget, c)
    if budget < HARD_FLOOR:
        raise RuntimeError(
            f"device memory budget for the database is "
            f"{max(budget, 0) >> 20} MB (< {HARD_FLOOR >> 20} MB floor): "
            f"device limit {limit >> 20} MB minus reserved "
            f"{RESERVED >> 20} MB minus batch transients "
            f"{probe_transient_bytes(window_budget, c) >> 20} MB. "
            "Shard the DB over more devices (--shard-db / -d), lower "
            "BatchPlan.window_budget (config.json: plan.window_budget), "
            "or set CLARK_TPU_DEVICE_MEM_BYTES if the device limit was "
            "misdetected."
        )
    per_shard = -(-table_bytes // max(n_shards, 1))
    cycles = max(-(-per_shard // budget), 1)
    if cycles > 1 and os.environ.get("CLARK_TPU_PREFETCH_CHUNKS", "1") != "0":
        # double-buffered chunk uploads (engine._cycle_passes /
        # ShardedRadixTable.begin_cycle) keep TWO chunks resident at the
        # overlap peak, so each chunk must fit half the budget
        cycles = max(-(-per_shard // (budget // 2)), 2)
    return cycles, budget
