"""Radix hash table: build invariants and probe correctness."""

import numpy as np
import pytest

import jax.numpy as jnp

from jn_cuclark_tpu.ops import radix_table


def _probe(t, q):
    return np.asarray(
        radix_table.probe(
            jnp.asarray(t.slots),
            jnp.asarray(t.labels),
            jnp.asarray(t.stash_keys),
            jnp.asarray(t.stash_labels),
            jnp.asarray(q),
            **t.meta,
        )
    )


@pytest.mark.parametrize("n", [0, 5, 1000, 200_000])
@pytest.mark.parametrize("k", [27, None])  # k is accepted but irrelevant
def test_build_and_probe(n, k):
    rng = np.random.default_rng((n or 1) + (k or 0))
    keys = np.unique(rng.integers(0, 1 << 54, size=max(2 * n, 1), dtype=np.uint64))[:n]
    labels1 = rng.integers(1, 100, size=n).astype(np.int32)
    t = radix_table.build(keys, labels1, k=k)
    # quotient storage always packs the label into the slot
    assert t.lb > 0 and t.lb < t.m1 and t.labels.size == 0

    if n:
        assert np.array_equal(_probe(t, keys), labels1)
    miss = np.unique(rng.integers(0, 1 << 54, size=1000, dtype=np.uint64))
    miss = miss[~np.isin(miss, keys)]
    assert not _probe(t, miss).any()
    assert not _probe(t, np.full(16, radix_table.EMPTY, dtype=np.uint64)).any()


def test_stash_used_and_exact():
    """Force heavy bucket overflow into the stash by tiny table + low c."""
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 54, size=3000, dtype=np.uint64))
    labels1 = rng.integers(1, 50, size=len(keys)).astype(np.int32)
    t = radix_table.build(keys, labels1, k=27, c=4, load=16.0)
    # either stash has entries or the build bumped m1; both must stay exact
    assert np.array_equal(_probe(t, keys), labels1)


def test_label_packing_many_targets_full_width():
    """k=31 (62-bit keys) with thousands of labels still packs the label:
    quotient storage frees m1 bits regardless of key width (the old layout
    needed 2k + label bits <= 64 and fell back to a second gather here)."""
    rng = np.random.default_rng(4)
    keys = np.unique(rng.integers(0, 1 << 62, size=5000, dtype=np.uint64))
    labels1 = rng.integers(1, 5000, size=len(keys)).astype(np.int32)
    t = radix_table.build(keys, labels1, k=31)
    assert t.lb >= 13 and t.labels.size == 0
    assert np.array_equal(_probe(t, keys), labels1)


def test_max_targets_cap():
    """The reference's MTRGTS cap (65535 targets, dataType.hh:46) packs."""
    rng = np.random.default_rng(6)
    keys = np.unique(rng.integers(0, (1 << 64) - 2, size=300_000, dtype=np.uint64))
    labels1 = rng.integers(1, 65536, size=len(keys)).astype(np.int32)
    t = radix_table.build(keys, labels1)
    assert t.lb == 17 and t.lb < t.m1
    assert np.array_equal(_probe(t, keys), labels1)


def test_chunked_probe_covers_all():
    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(0, 1 << 54, size=20_000, dtype=np.uint64))
    labels1 = rng.integers(1, 100, size=len(keys)).astype(np.int32)
    t = radix_table.build(keys, labels1, k=27)
    chunks = radix_table.chunk_table(t, 3)
    got = np.zeros(len(keys), np.int32)
    for ch in chunks:
        lab = np.asarray(
            radix_table.probe_chunk(
                jnp.asarray(ch["slots"]),
                jnp.asarray(ch["labels"]),
                jnp.asarray(t.stash_keys),
                jnp.asarray(t.stash_labels),
                jnp.asarray(keys),
                jnp.int32(ch["start_row"]),
                m1=t.m1,
                lb=t.lb,
                c=t.slot_width,
                use_stash=jnp.bool_(ch["use_stash"]),
            )
        )
        got = np.maximum(got, lab)
    assert np.array_equal(got, labels1)


def test_cache_signature_invalidation(tmp_path):
    """The device-index cache is keyed on DB content, not mtime."""
    import os

    from jn_cuclark_tpu.ops import radix_table

    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(1, 1 << 40, size=500, dtype=np.uint64))
    labels1 = rng.integers(1, 5, size=len(keys)).astype(np.int32)
    t = radix_table.build(keys, labels1, k=27)

    stem = str(tmp_path / "db")
    with open(stem + ".ky", "wb") as f:
        f.write(keys.tobytes())
    with open(stem + ".sz", "wb") as f:
        f.write(b"\x01" * 64)
    sig = radix_table.db_signature(stem)
    cache = stem + ".idx.npz"
    radix_table.save_cache(cache, t, signature=sig)
    assert radix_table.load_cache(cache, signature=sig) is not None

    # rewrite .ky with different content but same size + preserved mtime
    st = os.stat(stem + ".ky")
    alt = keys.copy()
    alt[0] ^= np.uint64(1)
    with open(stem + ".ky", "wb") as f:
        f.write(alt.tobytes())
    os.utime(stem + ".ky", ns=(st.st_atime_ns, st.st_mtime_ns))
    sig2 = radix_table.db_signature(stem)
    assert radix_table.load_cache(cache, signature=sig2) is None


def test_chunked_probe_boundaries(monkeypatch):
    """Multi-chunk probe (lax.map path) with a non-divisible tail must equal
    the monolithic result; padding probes are EMPTY (miss-safe)."""
    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 1 << 54, size=5000, dtype=np.uint64))
    labels1 = rng.integers(1, 50, size=len(keys)).astype(np.int32)
    t = radix_table.build(keys, labels1)
    n_q = 2500
    q = np.where(
        rng.random(n_q) < 0.5,
        rng.choice(keys, size=n_q),
        rng.integers(0, 1 << 54, size=n_q, dtype=np.uint64),
    )
    want = _probe(t, q)  # monolithic (n_q < default chunk)
    monkeypatch.setattr(radix_table, "_PROBE_CHUNK", 1024)  # 3 chunks + pad
    got = _probe(t, q)
    assert np.array_equal(got, want)
    # exact multiple of the chunk size (no padding)
    assert np.array_equal(_probe(t, q[:2048]), want[:2048])
