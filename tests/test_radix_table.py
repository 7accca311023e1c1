"""Radix hash table: build invariants and probe correctness."""

import numpy as np
import pytest

import jax.numpy as jnp

from jn_cuclark_tpu.ops import radix_table


@pytest.mark.parametrize("n", [0, 5, 1000, 200_000])
def test_build_and_probe(n):
    rng = np.random.default_rng(n or 1)
    keys = np.unique(rng.integers(0, 1 << 54, size=max(2 * n, 1), dtype=np.uint64))[:n]
    labels1 = rng.integers(1, 100, size=n).astype(np.int32)
    t = radix_table.build(keys, labels1)

    # every key retrievable
    if n:
        got = radix_table.probe(
            jnp.asarray(t.t1_keys),
            jnp.asarray(t.t2_keys),
            jnp.asarray(t.labels),
            jnp.asarray(keys),
            m1=t.m1,
            m2=t.m2,
            c=t.slot_width,
        )
        assert np.array_equal(np.asarray(got), labels1)

    # misses return 0
    miss = np.unique(rng.integers(0, 1 << 54, size=1000, dtype=np.uint64))
    miss = miss[~np.isin(miss, keys)]
    got = radix_table.probe(
        jnp.asarray(t.t1_keys),
        jnp.asarray(t.t2_keys),
        jnp.asarray(t.labels),
        jnp.asarray(miss),
        m1=t.m1,
        m2=t.m2,
        c=t.slot_width,
    )
    assert not np.asarray(got).any()

    # padding sentinel queries miss
    got = radix_table.probe(
        jnp.asarray(t.t1_keys),
        jnp.asarray(t.t2_keys),
        jnp.asarray(t.labels),
        jnp.asarray(np.full(16, radix_table.EMPTY, dtype=np.uint64)),
        m1=t.m1,
        m2=t.m2,
        c=t.slot_width,
    )
    assert not np.asarray(got).any()


def test_all_keys_stored_once():
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 54, size=50_000, dtype=np.uint64))
    labels1 = rng.integers(1, 100, size=len(keys)).astype(np.int32)
    t = radix_table.build(keys, labels1)
    stored = np.concatenate([t.t1_keys.ravel(), t.t2_keys.ravel()])
    stored = stored[stored != radix_table.EMPTY]
    assert len(stored) == len(keys)
    assert np.array_equal(np.sort(stored), keys)
