"""Scratch experiments for probe/counts optimization (run on the live TPU).

Each experiment is a candidate implementation benchmarked against the
production one; winners get distilled into ops/ with tests.  Keep: this file
documents the measured design space (ARCHITECTURE.md summarizes it).
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def _timeit(fn, *args, reps=2, iters=20):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# ---------------------------------------------------------------- counts ---


def exp_counts(R=8192, S=512, T=500):
    """Candidates for per-read top-2 from [R, S] labels."""
    from jn_cuclark_tpu.ops import score

    rng = np.random.default_rng(0)
    lab = jnp.asarray(
        rng.integers(0, T + 1, size=(R, S)).astype(np.int32)
    )
    rid = jnp.repeat(jnp.arange(R, dtype=jnp.int32), S)

    # current: dense counts + read_results
    def current(lab):
        counts = score.counts_from_hits(lab.ravel(), rid, R, T)
        return score.read_results(counts)

    t_cur = _timeit(jax.jit(current), lab)

    # candidate: batched per-read sort + run-length top-2 (no scatter/gather)
    def sortruns(lab):
        s = jax.lax.sort(lab, dimension=1)  # [R, S] ascending
        S_ = s.shape[1]
        j = jnp.arange(S_, dtype=jnp.int32)[None, :]
        is_start = jnp.concatenate(
            [jnp.ones((s.shape[0], 1), bool), s[:, 1:] != s[:, :-1]], axis=1
        )
        # start position of the run covering j: cummax of (j where start)
        startpos = jax.lax.cummax(jnp.where(is_start, j, -1), axis=1)
        # end position: reverse cummin of (j where next is a start)
        is_end = jnp.concatenate(
            [s[:, 1:] != s[:, :-1], jnp.ones((s.shape[0], 1), bool)], axis=1
        )
        endpos = jax.lax.cummin(
            jnp.where(is_end, j, S_), axis=1, reverse=True
        )
        runlen = endpos - startpos + 1
        # only score each run once (at its start); exclude label 0 (miss)
        valid = is_start & (s > 0)
        runlen = jnp.where(valid, runlen, 0)
        total = jnp.sum((s > 0).astype(jnp.int32), axis=1)
        best = jnp.max(runlen, axis=1)
        # tie-break: among runs with len == best, the smallest label
        ib = jnp.min(
            jnp.where(runlen == best[:, None], s, jnp.int32(2**31 - 1)),
            axis=1,
        )
        ib = jnp.where(best > 0, ib, 0)
        masked = jnp.where(s == ib[:, None], 0, runlen)
        sbest = jnp.max(masked, axis=1)
        isb = jnp.min(
            jnp.where(
                (masked == sbest[:, None]) & (masked > 0),
                s,
                jnp.int32(2**31 - 1),
            ),
            axis=1,
        )
        isb = jnp.where(sbest > 0, isb, 0)
        return total, ib, best, isb, sbest

    t_sr = _timeit(jax.jit(sortruns), lab)

    # verify equivalence
    ref = jax.jit(current)(lab)
    got = jax.jit(sortruns)(lab)
    ok = all(
        bool(jnp.array_equal(a, b)) for a, b in zip(ref, got)
    )
    return dict(
        R=R, S=S, T=T,
        current_ms=round(t_cur * 1e3, 2),
        sortruns_ms=round(t_sr * 1e3, 2),
        equal=ok,
    )


# ----------------------------------------------------------------- probe ---


def _make_keys(n_keys, k, T, seed=1):
    rng = np.random.default_rng(seed)
    keys = np.unique(
        rng.integers(0, 1 << (2 * k), size=n_keys, dtype=np.uint64)
    )
    labels1 = rng.integers(1, T + 1, size=len(keys)).astype(np.int32)
    return keys, labels1


def _queries(keys, n_q, hit_rate=0.5, seed=2):
    rng = np.random.default_rng(seed)
    k_hits = rng.choice(keys, size=n_q)
    k_miss = rng.integers(
        0, np.uint64(1) << np.uint64(50), size=n_q, dtype=np.uint64
    )
    return np.where(rng.random(n_q) < hit_rate, k_hits, k_miss)



def _slots_u64(table):
    """Reconstruct the logical u64 slot array from the current u32
    contiguous-halves storage (radix_table layout comment) — used only by
    the HISTORICAL layout experiments below, which compare variants
    against the pre-round-5 u64 layout.  The production comparison is
    benchmarks/u32_probe_ab.py (docs/ROOFLINE.md 3.9)."""
    import numpy as np

    c = table.slot_width
    lo = table.slots[:, :c].astype(np.uint64)
    hi = table.slots[:, c:].astype(np.uint64)
    return lo | (hi << np.uint64(32))

def exp_probe_u32(n_keys=6_000_000, k=27, T=500, n_q=1 << 22):
    """u64 wide-row probe vs dual-u32-plane probe (same geometry)."""
    from jn_cuclark_tpu.ops import radix_table

    keys, labels1 = _make_keys(n_keys, k, T)
    table = radix_table.build(keys, labels1, k=k)
    q = _queries(keys, n_q)

    slots = jnp.asarray(table.slots)
    labels = jnp.asarray(table.labels)
    sk = jnp.asarray(table.stash_keys)
    sl = jnp.asarray(table.stash_labels)
    qd = jnp.asarray(q)

    p64 = jax.jit(
        functools.partial(
            radix_table.probe, m1=table.m1, lb=table.lb, c=table.slot_width
        )
    )
    t64 = _timeit(p64, slots, labels, sk, sl, qd)
    ref = p64(slots, labels, sk, sl, qd)

    # u32 planes: row = [hi0..hiC-1 | lo0..loC-1] as one [n, 2C] u32 array
    s64 = _slots_u64(table)
    hi = (s64 >> np.uint64(32)).astype(np.uint32)
    lo = (s64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    tbl32 = jnp.asarray(np.concatenate([hi, lo], axis=1))
    C = table.slot_width
    m1, lb = table.m1, table.lb
    MIX = np.uint64(0x9E3779B97F4A7C15)

    @jax.jit
    def p32(tbl32, sk, sl, q):
        mixed = q * jnp.uint64(MIX)
        b = (mixed >> jnp.uint64(64 - m1)).astype(jnp.int32)
        rows = tbl32[b]  # [Q, 2C] u32
        rhi, rlo = rows[:, :C], rows[:, C:]
        qs = (mixed & jnp.uint64((1 << (64 - m1)) - 1)) << jnp.uint64(lb)
        qhi = (qs >> jnp.uint64(32)).astype(jnp.uint32)
        qlo = (qs & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        labmask = jnp.uint32((1 << lb) - 1)
        hit = (rhi == qhi[:, None]) & ((rlo & ~labmask) == (qlo[:, None] & ~labmask))
        lab_mat = (rlo & labmask).astype(jnp.int32)
        anyh = jnp.any(hit, axis=1)
        lab = jnp.max(jnp.where(hit, lab_mat, 0), axis=1)
        lab = jnp.where(anyh, lab, 0)
        eq = q[:, None] == sk[None, :]
        slab = jnp.max(jnp.where(eq, sl[None, :], 0), axis=1)
        return jnp.maximum(lab, slab)

    t32 = _timeit(p32, tbl32, sk, sl, qd)
    got = p32(tbl32, sk, sl, qd)
    return dict(
        n_keys=len(keys), rows=table.slots.shape[0], C=C,
        u64_ms=round(t64 * 1e3, 2),
        u32_ms=round(t32 * 1e3, 2),
        u64_mps=round(n_q / t64 / 1e6, 1),
        u32_mps=round(n_q / t32 / 1e6, 1),
        equal=bool(jnp.array_equal(ref, got)),
    )


def exp_probe_bitcast(n_keys=6_000_000, k=27, T=500, n_q=1 << 22):
    """u64 wide-row gather kept, but compares/label-extraction done on a
    LOCAL bitcast to u32 pairs (v5e has no native 64-bit VPU lanes; u64
    compare/shift are emulated as u32 pairs anyway — doing it explicitly lets
    XLA skip the generic emulation)."""
    from jn_cuclark_tpu.ops import radix_table

    keys, labels1 = _make_keys(n_keys, k, T)
    table = radix_table.build(keys, labels1, k=k)
    q = _queries(keys, n_q)

    slots = jnp.asarray(table.slots)
    labels = jnp.asarray(table.labels)
    sk = jnp.asarray(table.stash_keys)
    sl = jnp.asarray(table.stash_labels)
    qd = jnp.asarray(q)

    p64 = jax.jit(
        functools.partial(
            radix_table.probe, m1=table.m1, lb=table.lb, c=table.slot_width
        )
    )
    t64 = _timeit(p64, slots, labels, sk, sl, qd)
    ref = p64(slots, labels, sk, sl, qd)

    # the variant arm gathers logical u64 rows (the pre-round-5 layout)
    slots64 = jnp.asarray(_slots_u64(table))

    C = table.slot_width
    m1, lb = table.m1, table.lb
    MIX = np.uint64(0x9E3779B97F4A7C15)
    labmask = np.uint32((1 << lb) - 1)

    @jax.jit
    def pbc(slots, sk, sl, q):
        mixed = q * jnp.uint64(MIX)
        b = (mixed >> jnp.uint64(64 - m1)).astype(jnp.int32)
        rows = slots[b]  # [Q, C] u64 — single gather, unchanged
        r32 = jax.lax.bitcast_convert_type(rows, jnp.uint32)  # [Q, C, 2] LE
        rlo, rhi = r32[..., 0], r32[..., 1]
        qs = (mixed & jnp.uint64((1 << (64 - m1)) - 1)) << jnp.uint64(lb)
        q32 = jax.lax.bitcast_convert_type(qs, jnp.uint32)  # [Q, 2]
        qlo, qhi = q32[:, 0:1], q32[:, 1:2]
        hit = (rhi == qhi) & ((rlo & ~labmask) == (qlo & ~labmask))
        lab_mat = (rlo & labmask).astype(jnp.int32)
        anyh = jnp.any(hit, axis=1)
        lab = jnp.max(jnp.where(hit, lab_mat, 0), axis=1)
        lab = jnp.where(anyh, lab, 0)
        eq = q[:, None] == sk[None, :]
        slab = jnp.max(jnp.where(eq, sl[None, :], 0), axis=1)
        return jnp.maximum(lab, slab)

    tbc = _timeit(pbc, slots64, sk, sl, qd)
    got = pbc(slots64, sk, sl, qd)
    return dict(
        n_keys=len(keys), rows=table.slots.shape[0], C=C,
        u64_ms=round(t64 * 1e3, 2),
        bitcast_ms=round(tbc * 1e3, 2),
        u64_mps=round(n_q / t64 / 1e6, 1),
        bitcast_mps=round(n_q / tbc / 1e6, 1),
        equal=bool(jnp.array_equal(ref, got)),
    )


def exp_probe_pallas(n_keys=6_000_000, k=27, T=500, n_q=1 << 22,
                     tile=512, bufs=8):
    """Pallas probe: per-query row DMA from HBM with a multi-buffered VMEM
    ring (the VERDICT-requested attempt).  Expected to be DMA-issue bound —
    measured either way so the design space is documented."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jn_cuclark_tpu.ops import radix_table

    keys, labels1 = _make_keys(n_keys, k, T)
    table = radix_table.build(keys, labels1, k=k)
    q = _queries(keys, n_q)
    qd = jnp.asarray(q)
    slots = jnp.asarray(table.slots)
    labels = jnp.asarray(table.labels)
    sk = jnp.asarray(table.stash_keys)
    sl = jnp.asarray(table.stash_labels)
    C = table.slot_width
    m1, lb = table.m1, table.lb
    MIX = np.uint64(0x9E3779B97F4A7C15)
    labmask = np.uint32((1 << lb) - 1)

    def kernel(b_ref, qlo_ref, qhi_ref, out_ref, tbl_hbm, scratch, sems):
        # queries of this tile are staged in SMEM; each query's [lo | hi] u32
        # row (Mosaic has no 64-bit vectors) is DMA'd through a ring of
        # `bufs` buffers
        def issue(i, slot):
            return pltpu.make_async_copy(
                tbl_hbm.at[pl.ds(b_ref[i, 0], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        for w in range(bufs):
            issue(w, w).start()

        def body(i, _):
            slot = jax.lax.rem(i, bufs)
            issue(i, slot).wait()
            row = scratch[pl.ds(slot, 1), :]  # [1, 2C]
            rlo = row[:, :C]
            rhi = row[:, C:]
            hit = (rhi == qhi_ref[i, 0]) & (
                (rlo & ~labmask) == (qlo_ref[i, 0] & ~labmask)
            )
            lab = jnp.max(jnp.where(hit, (rlo & labmask).astype(jnp.int32), 0))
            out_ref[i, 0] = lab.astype(jnp.int32)

            @pl.when(i + bufs < tile)
            def _():
                issue(i + bufs, slot).start()

            return 0

        jax.lax.fori_loop(0, tile, body, 0)

    # round-5 layout: table.slots is ALREADY [n, 2C] u32 contiguous
    # halves (lo half then hi half) — exactly the layout this kernel
    # was written for
    tbl32 = slots

    @jax.jit
    def ppal(tbl32, q):
        mixed = q * jnp.uint64(MIX)
        b = (mixed >> jnp.uint64(64 - m1)).astype(jnp.int32)
        qs = (mixed & jnp.uint64((1 << (64 - m1)) - 1)) << jnp.uint64(lb)
        q32 = jax.lax.bitcast_convert_type(qs, jnp.uint32)
        nq = q.shape[0]
        grid = nq // tile
        lab = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((nq, 1), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((bufs, 2 * C), jnp.uint32),
                pltpu.SemaphoreType.DMA((bufs,)),
            ],
        )(b[:, None], q32[:, 0:1], q32[:, 1:2], tbl32)
        return lab[:, 0]

    # reference for equality (ignores stash, as does the kernel): compare
    # against probe minus stash contribution
    p64 = jax.jit(
        functools.partial(
            radix_table.probe, m1=table.m1, lb=table.lb, c=table.slot_width
        )
    )
    t64 = _timeit(p64, slots, labels, sk, sl, qd)
    try:
        tp = _timeit(ppal, tbl32, qd, iters=2)
        got = np.asarray(ppal(tbl32, qd))
        sk0 = jnp.full_like(sk, radix_table.EMPTY)
        ref = np.asarray(p64(slots, labels, sk0, sl, qd))
        ok = bool(np.array_equal(got, ref))
        err = None
    except Exception as e:  # Mosaic lowering limits are a finding, not a crash
        import traceback

        tb = traceback.format_exc().splitlines()
        tp, ok = float("inf"), False
        err = (repr(e) + " @ " + " | ".join(tb[-4:]))[:500]
    return dict(
        n_keys=len(keys), rows=table.slots.shape[0], C=C, tile=tile, bufs=bufs,
        u64_ms=round(t64 * 1e3, 2),
        pallas_ms=round(tp * 1e3, 2) if np.isfinite(tp) else None,
        u64_mps=round(n_q / t64 / 1e6, 1),
        pallas_mps=round(n_q / tp / 1e6, 1) if np.isfinite(tp) else 0.0,
        equal=ok,
        error=err,
    )


def exp_probe_wide(n_keys=46_000_000, k=31, T=16, n_q=1 << 22):
    """Production probe at big-DB scale vs slot width: does widening rows
    (fewer rows -> cheaper per-row gather) beat C=128 at ~46M keys?"""
    from jn_cuclark_tpu.ops import radix_table

    keys, labels1 = _make_keys(n_keys, k, T)
    q = _queries(keys, n_q)
    qd = jnp.asarray(q)
    out = []
    import json as _json

    for c in (128, 256, 512):
        table = radix_table.build(keys, labels1, k=k, c=c)
        slots = jnp.asarray(table.slots)
        labels = jnp.asarray(table.labels)
        sk = jnp.asarray(table.stash_keys)
        sl = jnp.asarray(table.stash_labels)
        p = jax.jit(
            functools.partial(
                radix_table.probe, m1=table.m1, lb=table.lb,
                c=table.slot_width,
            )
        )
        t = _timeit(p, slots, labels, sk, sl, qd, iters=8)
        r = dict(
            c=c, m1=table.m1, table_gb=round(table.nbytes / 2**30, 2),
            mprobes_s=round(n_q / t / 1e6, 1),
        )
        print(_json.dumps(r), flush=True)
        out.append(r)
        del slots, labels, table
    return out


def exp_probe_load(n_keys=46_000_000, k=31, T=16, n_q=1 << 22):
    """Row-count reduction via load factor at big-DB scale: per-row gather
    cost dominates (ROOFLINE.md law 1), so packing the same keys into half
    the rows (m1=19 vs 20 at C=128) should speed the probe ~linearly in the
    row-count regime.  Also A/Bs a u32-truncated lane reduce (the xor result
    of a HIT lane is < 2^lb, so the select/max tree can run in native u32
    instead of emulated u64)."""
    import json as _json

    from jn_cuclark_tpu.ops import radix_table

    keys, labels1 = _make_keys(n_keys, k, T)
    q = _queries(keys, n_q)
    qd = jnp.asarray(q)
    MIX = np.uint64(0x9E3779B97F4A7C15)
    out = []

    for c, load in [(128, None), (128, 86.0), (256, 196.0)]:
        table = radix_table.build(keys, labels1, k=k, c=c, load=load)
        slots = jnp.asarray(table.slots)
        labels = jnp.asarray(table.labels)
        sk = jnp.asarray(table.stash_keys)
        sl = jnp.asarray(table.stash_labels)
        m1, lb = table.m1, table.lb
        p = jax.jit(
            functools.partial(radix_table.probe, m1=m1, lb=lb, c=c)
        )
        t = _timeit(p, slots, labels, sk, sl, qd, iters=8)
        ref = p(slots, labels, sk, sl, qd)

        @jax.jit
        def p32red(slots, sk, sl, qq):
            mixed = qq * jnp.uint64(MIX)
            b = (mixed >> jnp.uint64(64 - m1)).astype(jnp.int32)
            qlow = mixed & jnp.uint64((1 << (64 - m1)) - 1)
            rows = slots[b]
            x = rows ^ (qlow << jnp.uint64(lb))[:, None]
            hit = x < jnp.uint64(1 << lb)
            lab32 = jnp.where(hit, x.astype(jnp.uint32), jnp.uint32(0))
            lab = jnp.max(lab32, axis=1).astype(jnp.int32)
            eq = qq[:, None] == sk[None, :]
            slab = jnp.max(jnp.where(eq, sl[None, :], 0), axis=1)
            return jnp.maximum(lab, slab)

        t32 = _timeit(p32red, slots, sk, sl, qd, iters=8)
        got = p32red(slots, sk, sl, qd)
        r = dict(
            c=c, m1=m1, stash=int((table.stash_keys != radix_table.EMPTY).sum()),
            table_gb=round(table.nbytes / 2**30, 2),
            mprobes_s=round(n_q / t / 1e6, 1),
            u32red_mprobes_s=round(n_q / t32 / 1e6, 1),
            equal=bool(jnp.array_equal(ref, got)),
        )
        print(_json.dumps(r), flush=True)
        out.append(r)
        del slots, labels, table
    return out


def exp_gather_width(n_q=1 << 22):
    """Per-row gather cost vs row width at fixed big row count (2^20)."""
    rng = np.random.default_rng(0)
    out = []
    import json as _json

    for m1, c, dt in [
        (20, 32, np.uint32), (20, 128, np.uint32), (20, 256, np.uint32),
        (20, 512, np.uint32),
        (23, 128, np.uint32), (23, 256, np.uint32),
    ]:
        n = 1 << m1
        tbl = jnp.asarray(
            rng.integers(0, 2**31, size=(n, c)).astype(dt)
        )
        idx = jnp.asarray(rng.integers(0, n, size=n_q, dtype=np.int32))

        @jax.jit
        def g(tbl, idx):
            return jnp.max(tbl[idx], axis=1)

        t = _timeit(g, tbl, idx, iters=8)
        r = dict(
            rows=n, width_bytes=c * 4,
            mrows_s=round(n_q / t / 1e6, 1),
            gb_s=round(n_q / t * c * 4 / 2**30, 1),
        )
        print(_json.dumps(r), flush=True)
        out.append(r)
        del tbl, idx
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "exp",
        choices=["counts", "probe32", "bitcast", "pallas", "gatherw",
                 "widerow", "load", "all"],
    )
    args = ap.parse_args()
    import json

    if args.exp in ("counts", "all"):
        print("counts R=8192 S=512 T=500:",
              json.dumps(exp_counts()))
        print("counts R=8192 S=512 T=3:  ",
              json.dumps(exp_counts(T=3)))
    if args.exp in ("probe32", "all"):
        print("probe u64 vs u32:", json.dumps(exp_probe_u32()))
    if args.exp in ("bitcast", "all"):
        print("probe u64 vs bitcast-compare:", json.dumps(exp_probe_bitcast()))
    if args.exp in ("pallas", "all"):
        print("probe u64 vs pallas DMA:", json.dumps(exp_probe_pallas()))
    if args.exp in ("gatherw", "all"):
        print("gather width:", json.dumps(exp_gather_width(), indent=1))
    if args.exp == "widerow":
        print("probe wide rows @46M keys:")
        exp_probe_wide()
    if args.exp == "load":
        print("probe load/row-count @46M keys:")
        exp_probe_load()


if __name__ == "__main__":
    main()
