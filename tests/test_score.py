"""score.top2_from_labels (sort-runs fast path) vs the dense-counts
reference path (counts_from_hits + read_results): bit-identical, including
tie-breaks (count desc, index asc; resultKernel CuClarkDB.cu:1361-1411)."""

import jax.numpy as jnp
import numpy as np
import pytest

from jn_cuclark_tpu.ops import score


def _dense_path(lab2d, n_targets):
    R, S = lab2d.shape
    rid = jnp.repeat(jnp.arange(R, dtype=jnp.int32), S)
    counts = score.counts_from_hits(lab2d.ravel(), rid, R, n_targets)
    return score.read_results(counts)


@pytest.mark.parametrize("seed,R,S,T", [
    (0, 64, 96, 5),
    (1, 16, 33, 500),
    (2, 128, 8, 2),
    (3, 8, 512, 65),
])
def test_top2_matches_dense(seed, R, S, T):
    rng = np.random.default_rng(seed)
    lab = rng.integers(0, T + 1, size=(R, S)).astype(np.int32)
    # force interesting edge rows: all-miss, all-one-target, exact two-way tie
    lab[0] = 0
    lab[1] = 7 % (T + 1)
    if S >= 4 and T >= 2:
        lab[2] = 0
        lab[2, :2] = 2
        lab[2, 2:4] = 1  # tie on count -> lowest index wins
    ref = _dense_path(jnp.asarray(lab), T)
    got = score.top2_from_labels(jnp.asarray(lab))
    names = ["total", "index_best", "best", "index_sbest", "s_best"]
    for n, a, b in zip(names, ref, got):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=n
        )


def test_classify_batch_fast_path_matches_extended():
    from jn_cuclark_tpu.ops import device_pipeline, radix_table

    rng = np.random.default_rng(4)
    k, T = 27, 9
    keys = np.unique(
        rng.integers(0, 1 << (2 * k), size=5000, dtype=np.uint64)
    )
    labels1 = rng.integers(1, T + 1, size=len(keys)).astype(np.int32)
    table = radix_table.build(keys, labels1, k=k)
    R, S = 32, 128
    words = rng.integers(0, 2**63, size=(R, S // 32 + 1), dtype=np.uint64)
    vwords = np.full((R, S // 64 + 1), ~np.uint64(0), dtype=np.uint64)
    args = (
        jnp.asarray(table.slots), jnp.asarray(table.labels),
        jnp.asarray(table.stash_keys), jnp.asarray(table.stash_labels),
        jnp.asarray(words), jnp.asarray(vwords),
    )
    kw = dict(k=k, n_targets=T, **table.meta)
    ext = device_pipeline.classify_batch(*args, extended=True, **kw)
    fast = device_pipeline.classify_batch(*args, extended=False, **kw)
    for n, a, b in zip(["total", "ib", "best", "sbest"], ext[:4], fast[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=n)
    assert fast[4].shape == (R, 0)
