"""Measure the axon tunnel's dispatch/latency structure for the batch call.

Questions:
  1. Does an async jit dispatch BLOCK the host (per-call serialize/RPC cost)?
  2. What depth of in-flight batches saturates the pipe?
  3. Do concurrent dispatch threads raise throughput past single-stream?

Run: python benchmarks/dispatch_lat.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from jn_cuclark_tpu import params
from jn_cuclark_tpu.ops import device_pipeline, radix_table

R, S = 43690, 192  # production stride-192 tier at 2^23 window budget
K = 31
T = 500


def make():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 62, size=6_000_000, dtype=np.uint64)
    labels = rng.integers(1, T + 1, size=keys.size).astype(np.int32)
    tbl = radix_table.build(keys, labels, k=K)
    slots = jax.device_put(tbl.slots)
    lab = jax.device_put(tbl.labels)
    sk = jax.device_put(tbl.stash_keys)
    sl = jax.device_put(tbl.stash_labels)
    meta = tbl.meta

    def batch_fn(words, vwords):
        return device_pipeline.classify_batch(
            slots, lab, sk, sl, words, vwords, k=K, n_targets=T,
            extended=False, **meta,
        )

    words = rng.integers(0, 1 << 62, size=(R, S // 32 + 1), dtype=np.uint64)
    words[:, -1] = 0
    vwords = np.full((R, S // 64 + 1), ~np.uint64(0), dtype=np.uint64)
    vwords[:, -1] = 0
    return batch_fn, words, vwords


def main():
    batch_fn, words, vwords = make()
    dw, dv = jnp.asarray(words), jnp.asarray(vwords)
    # warm/compile
    out = batch_fn(dw, dv)
    jax.block_until_ready(out)

    # 1. device-only rate: dispatch N, block once
    for n in (8, 16):
        t0 = time.time()
        outs = [batch_fn(dw, dv) for _ in range(n)]
        jax.block_until_ready(outs)
        dt = time.time() - t0
        print(f"device-only x{n}: {dt*1e3/n:.1f} ms/batch "
              f"({R*n/dt/1e3:.0f}k reads/s-equiv)")

    # 2. dispatch-blocking cost: time the dispatch statements alone
    t0 = time.time()
    outs = [batch_fn(dw, dv) for _ in range(16)]
    t_disp = time.time() - t0
    jax.block_until_ready(outs)
    print(f"dispatch-only x16: {t_disp*1e3/16:.2f} ms/call host-blocked")

    # 2b. including host->device array upload each time (the real loop does)
    t0 = time.time()
    outs = []
    for _ in range(16):
        outs.append(batch_fn(jnp.asarray(words), jnp.asarray(vwords)))
    t_disp = time.time() - t0
    jax.block_until_ready(outs)
    print(f"dispatch+upload x16: {t_disp*1e3/16:.2f} ms/call host-blocked")

    # 3. steady-state with bounded depth + per-batch fetch (like the engine)
    for depth in (2, 4, 6, 8, 12, 16):
        n = 24
        t0 = time.time()
        inflight = []
        for i in range(n):
            inflight.append(batch_fn(jnp.asarray(words), jnp.asarray(vwords)))
            if len(inflight) > depth:
                e = inflight.pop(0)
                _ = [np.asarray(x) for x in e[:4]]
        for e in inflight:
            _ = [np.asarray(x) for x in e[:4]]
        dt = time.time() - t0
        print(f"depth {depth:2d}: {dt*1e3/n:.1f} ms/batch "
              f"({R*n/dt/1e3:.0f}k reads/s-equiv)")

    # 4. two dispatch threads, shared depth budget
    import threading

    def worker(nb, depth, res, idx):
        inflight = []
        t0 = time.time()
        for i in range(nb):
            inflight.append(batch_fn(jnp.asarray(words), jnp.asarray(vwords)))
            if len(inflight) > depth:
                e = inflight.pop(0)
                _ = [np.asarray(x) for x in e[:4]]
        for e in inflight:
            _ = [np.asarray(x) for x in e[:4]]
        res[idx] = time.time() - t0

    for nthreads in (2, 4):
        res = [0.0] * nthreads
        nb = 24 // nthreads
        ts = [threading.Thread(target=worker, args=(nb, 6, res, i))
              for i in range(nthreads)]
        t0 = time.time()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.time() - t0
        print(f"{nthreads} threads x depth6: {dt*1e3/24:.1f} ms/batch "
              f"({R*24/dt/1e3:.0f}k reads/s-equiv)")


if __name__ == "__main__":
    main()
