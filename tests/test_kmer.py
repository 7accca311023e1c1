"""K-mer codec golden tests: vectorized codec vs. independent scalar oracle
and hand-computed values from the reference's formulas."""

import numpy as np
import pytest

from jn_cuclark_tpu import kmer

from . import oracle


def test_encode_seq():
    codes = kmer.encode_seq(b"ACGTUacgtuNX\n>")
    assert list(codes[:10]) == [0, 1, 2, 3, 3, 0, 1, 2, 3, 3]
    assert all(c == -1 for c in codes[10:])


def test_enc_le_hand():
    # A=0 C=1 G=2 T=3, first base lowest bits: "CAT" = 1 + 0*4 + 3*16 = 49
    assert kmer.enc_le(kmer.encode_seq("CAT")) == 49
    assert kmer.enc_le(kmer.encode_seq("AAAA")) == 0
    assert kmer.enc_le(kmer.encode_seq("TTT")) == 63


@pytest.mark.parametrize("k", [3, 9, 15, 21, 27, 31, 32])
def test_revcomp_jellyfish(k):
    rng = np.random.default_rng(k)
    for _ in range(50):
        s = "".join(rng.choice(list("ACGT"), size=k))
        v = np.uint64(oracle.enc_le(s))
        rc = oracle.enc_le(oracle.revcomp(s))
        assert int(kmer.revcomp_u64(v, k)) == rc
        # involution
        assert int(kmer.revcomp_u64(kmer.revcomp_u64(v, k), k)) == int(v)


@pytest.mark.parametrize("k", [5, 27, 31])
def test_canonical_matches_oracle(k):
    rng = np.random.default_rng(k + 100)
    for _ in range(50):
        s = "".join(rng.choice(list("ACGT"), size=k))
        assert kmer.kmer_string_to_canonical(s) == oracle.canonical(s)
        assert kmer.kmer_string_to_canonical(oracle.revcomp(s)) == oracle.canonical(s)


def test_window_values():
    seq = "ACGTACGTTGCA"
    k = 5
    codes = kmer.encode_seq(seq)
    starts = np.arange(len(seq) - k + 1)
    vals = kmer.window_values_le(codes, k, starts)
    for i, v in zip(starts, vals):
        assert int(v) == oracle.enc_le(seq[i : i + k])


def test_window_values_cross_word_boundary():
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), size=200))
    for k in (9, 27, 31, 32):
        codes = kmer.encode_seq(seq)
        starts = np.arange(len(seq) - k + 1)
        vals = kmer.window_values_le(codes, k, starts)
        for i in list(range(25, 40)) + [0, len(starts) - 1]:
            assert int(vals[i]) == oracle.enc_le(seq[i : i + k]), (k, i)


def test_canonical_kmers_of_seq_skips_invalid():
    seq = "ACGTNNACGTACG"
    k = 4
    got = list(kmer.canonical_kmers_of_seq(seq, k))
    want = oracle.seq_kmers(seq, k)
    assert got == want
    assert len(got) == 1 + 4  # 1 window before the Ns, 4 after


def test_decode_roundtrip():
    s = "ACGTTGCAA"
    v = kmer.enc_le(kmer.encode_seq(s))
    assert kmer.decode_value_le(v, len(s)) == s
