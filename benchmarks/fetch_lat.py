"""Compare device->host fetch strategies over the axon tunnel.

The engine currently fetches 4 small arrays per batch (total, ib, b, sb)
with separate np.asarray calls; each may cost a full tunnel round trip.
Candidates:
  A. 4x np.asarray (current)
  B. jax.device_get of the whole tuple at once
  C. single fused [R,4] int32 array computed on device, one fetch
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from jn_cuclark_tpu.ops import device_pipeline, radix_table

R, S = 43690, 192
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

    @jax.jit
    def batch_fused(words, vwords):
        total, ib, b, sb, _ = batch_fn(words, vwords)
        return jnp.stack(
            [total.astype(jnp.int32), ib.astype(jnp.int32),
             b.astype(jnp.int32), sb.astype(jnp.int32)], axis=1)

    words = rng.integers(0, 1 << 62, size=(R, S // 32 + 1), dtype=np.uint64)
    words[:, -1] = 0
    vwords = np.full((R, S // 64 + 1), ~np.uint64(0), dtype=np.uint64)
    vwords[:, -1] = 0
    return batch_fn, batch_fused, words, vwords


def run(label, dispatch, fetch, words, vwords, n=24, depth=4):
    t0 = time.time()
    inflight = []
    for i in range(n):
        inflight.append(dispatch(jnp.asarray(words), jnp.asarray(vwords)))
        if len(inflight) > depth:
            fetch(inflight.pop(0))
    for e in inflight:
        fetch(e)
    dt = time.time() - t0
    print(f"{label}: {dt*1e3/n:.1f} ms/batch ({R*n/dt/1e3:.0f}k reads/s-equiv)")


def main():
    batch_fn, batch_fused, words, vwords = make()
    # warm both
    jax.block_until_ready(batch_fn(jnp.asarray(words), jnp.asarray(vwords)))
    np.asarray(batch_fused(jnp.asarray(words), jnp.asarray(vwords)))

    for rep in range(2):
        run("A 4x np.asarray   ", batch_fn,
            lambda e: [np.asarray(x) for x in e[:4]], words, vwords)
        run("B device_get tuple ", batch_fn,
            lambda e: jax.device_get(e[:4]), words, vwords)
        run("C fused one array  ", batch_fused,
            lambda e: np.asarray(e), words, vwords)


if __name__ == "__main__":
    main()


def main2():
    """Fused upload (one [R, 11] u64 array) + fused output; depth sweep."""
    batch_fn, batch_fused, words, vwords = make()
    wcols = words.shape[1]

    @jax.jit
    def batch_fused2(packed):
        w, v = packed[:, :wcols], packed[:, wcols:]
        total, ib, b, sb, _ = batch_fn(w, v)
        return jnp.stack(
            [total.astype(jnp.int32), ib.astype(jnp.int32),
             b.astype(jnp.int32), sb.astype(jnp.int32)], axis=1)

    packed = np.concatenate([words, vwords], axis=1)
    np.asarray(batch_fused2(jnp.asarray(packed)))

    def disp(w, v):
        return batch_fused2(jnp.asarray(np.concatenate([w, v], axis=1)))

    for depth in (3, 4, 6, 8):
        run(f"D fused io depth{depth}", lambda w, v: batch_fused2(jnp.asarray(packed)),
            lambda e: np.asarray(e), words, vwords, depth=depth)

    import threading

    def worker(nb, depth, res, idx):
        inflight = []
        for i in range(nb):
            inflight.append(batch_fused2(jnp.asarray(packed)))
            if len(inflight) > depth:
                np.asarray(inflight.pop(0))
        for e in inflight:
            np.asarray(e)

    for nthreads in (2, 3, 4):
        nb = 24 // nthreads
        ts = [threading.Thread(target=worker, args=(nb, 4, [0]*nthreads, i))
              for i in range(nthreads)]
        t0 = time.time()
        for t in ts: t.start()
        for t in ts: t.join()
        dt = time.time() - t0
        print(f"E {nthreads} threads fused d4: {dt*1e3/24:.1f} ms/batch "
              f"({R*24/dt/1e3:.0f}k reads/s-equiv)")


main2()
