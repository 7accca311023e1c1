"""Canonical k-mer codec (vectorized, host side).

The reference uses two complementary 2-bit encodings of DNA that must be
reproduced exactly for byte-identical databases and results:

  * "standard" code: A=0 C=1 G=2 T=3          (CuCLARK_hh.hh:286-289, m_table)
  * "reverse"  code: A=3 C=2 G=1 T=0          (kmersConversion.cc:49-68 getKmers,
                                               CuCLARK_hh.hh:294-297 m_rTable)

Both encodings meet in one integer family.  Define

    enc(S) = sum_i code(s_i) * 4**i        (standard code, FIRST base in the
                                            LOWEST bits — "little-endian")

Then the reference's running values are (derivable from CuCLARK_hh.hh:934-949
and CuClarkDB.cu:1063-1083):

  * the build loop's `_km_f` (rolling forward k-mer)       == enc(S)
  * the build loop's `_km_r` and the query kernel's packed
    big-endian reverse-code k-mer                          == enc(revcomp(S))
  * the Jellyfish bit-twiddle (kmersConversion.cc:39-47)   maps enc(S) <->
    enc(revcomp(S))

and the canonical value used everywhere (HashTableStorage_hh.hh:422-435,
CuClarkDB.cu:1195-1206) is

    canonical(S) = min(enc(S), enc(revcomp(S)))

The on-disk hash split (hashTable_hh.hh:219-236) is then
    remainder = canonical % HTSIZE   (bucket index)
    quotient  = canonical // HTSIZE  (stored key)
"""

from __future__ import annotations

import numpy as np

# 256-entry lookup: ASCII byte -> standard 2-bit code, -1 invalid.
# DNA + RNA(U) upper/lower, as in CuCLARK_hh.hh:286-289.
CODE_LUT = np.full(256, -1, dtype=np.int8)
for _ch, _v in (("Aa", 0), ("Cc", 1), ("Gg", 2), ("TtUu", 3)):
    for _c in _ch:
        CODE_LUT[ord(_c)] = _v

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def encode_seq(seq: bytes | str) -> np.ndarray:
    """ASCII sequence -> int8 codes (-1 for non-ACGTU)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return CODE_LUT[np.frombuffer(seq, dtype=np.uint8)]


def enc_le(codes: np.ndarray) -> int:
    """enc(S) for a single window of standard codes (python int, exact)."""
    v = 0
    for i, c in enumerate(codes):
        v += int(c) << (2 * i)
    return v


def revcomp_u64(v: np.ndarray | int, k: int):
    """Jellyfish bit-twiddle: enc(S) -> enc(revcomp(S)).

    Exact reproduction of kmersConversion.cc:39-47 on uint64 values.
    """
    x = np.asarray(v, dtype=np.uint64)
    x = ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)) | (
        (x & np.uint64(0x3333333333333333)) << np.uint64(2)
    )
    x = ((x >> np.uint64(4)) & np.uint64(0x0F0F0F0F0F0F0F0F)) | (
        (x & np.uint64(0x0F0F0F0F0F0F0F0F)) << np.uint64(4)
    )
    x = ((x >> np.uint64(8)) & np.uint64(0x00FF00FF00FF00FF)) | (
        (x & np.uint64(0x00FF00FF00FF00FF)) << np.uint64(8)
    )
    x = ((x >> np.uint64(16)) & np.uint64(0x0000FFFF0000FFFF)) | (
        (x & np.uint64(0x0000FFFF0000FFFF)) << np.uint64(16)
    )
    x = (x >> np.uint64(32)) | (x << np.uint64(32))
    x = (np.uint64(0xFFFFFFFFFFFFFFFF) - x) >> np.uint64(64 - 2 * k)
    return x


def canonical_u64(v: np.ndarray | int, k: int):
    """min(enc(S), enc(revcomp(S)))."""
    x = np.asarray(v, dtype=np.uint64)
    return np.minimum(x, revcomp_u64(x, k))


def pack_codes_le(codes: np.ndarray) -> np.ndarray:
    """Pack standard 2-bit codes into uint64 words, first base in lowest bits.

    codes must be valid (0..3).  Returns words of 32 bases each; the tail word
    is zero-padded.
    """
    n = len(codes)
    nwords = (n + 31) // 32
    padded = np.zeros(nwords * 32, dtype=np.uint64)
    padded[:n] = codes.astype(np.uint64)
    shifts = (np.arange(32, dtype=np.uint64) * np.uint64(2))
    return (padded.reshape(nwords, 32) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )


def window_values_le(codes: np.ndarray, k: int, starts: np.ndarray) -> np.ndarray:
    """enc(S) for windows codes[s:s+k] at each start position (vectorized).

    Uses the packed-word representation: each window spans at most two 32-base
    words for k <= 32.
    """
    if len(starts) == 0:
        return np.zeros(0, dtype=np.uint64)
    words = pack_codes_le(codes)
    # Guard word so w1 gathers never go out of bounds.
    words = np.concatenate([words, np.zeros(1, dtype=np.uint64)])
    s = np.asarray(starts, dtype=np.int64)
    wi = s >> 5
    off = (s & 31).astype(np.uint64) * np.uint64(2)
    w0 = words[wi]
    w1 = words[wi + 1]
    lo = w0 >> off
    # (w1 << (64-off)) with off==0 handled: shift by 64 is UB in C but numpy
    # masks to 0..63; select explicitly.
    hi = np.where(off == 0, np.uint64(0), w1 << (np.uint64(64) - off))
    v = lo | hi
    if k < 32:
        v &= np.uint64((1 << (2 * k)) - 1)
    return v


def canonical_kmers_of_seq(seq: bytes | str, k: int) -> np.ndarray:
    """All overlapping canonical k-mers of a sequence, skipping windows that
    contain invalid characters (parts split at non-ACGTU, matching the
    reference's reset-on-invalid scan, CuCLARK_hh.hh:959-961)."""
    codes = encode_seq(seq)
    valid = codes >= 0
    n = len(codes)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    # window is valid iff all k codes valid
    cs = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
    ok = (cs[k:] - cs[:-k]) == k
    starts = np.nonzero(ok)[0]
    codes = np.where(valid, codes, 0).astype(np.int8)
    vals = window_values_le(codes, k, starts)
    return canonical_u64(vals, k)


def kmer_string_to_canonical(s: str) -> int:
    """Canonical value of one k-mer given as a string (for tests/goldens)."""
    codes = encode_seq(s)
    if (codes < 0).any():
        raise ValueError(f"invalid k-mer {s!r}")
    v = np.uint64(enc_le(codes))
    return int(canonical_u64(v, len(s)))


def decode_value_le(v: int, k: int) -> str:
    """Inverse of enc(S) — for debugging."""
    out = []
    for i in range(k):
        out.append("ACGT"[(v >> (2 * i)) & 3])
    return "".join(out)
