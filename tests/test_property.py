"""Randomized end-to-end equivalence sweep: build + classify across random
seeds, k sizes, and profiles must match the brute-force oracle exactly."""

import numpy as np
import pytest

from jn_cuclark_tpu import params
from jn_cuclark_tpu.db import builder
from jn_cuclark_tpu.engine import BatchPlan, Classifier
from jn_cuclark_tpu.io import dbformat
from jn_cuclark_tpu.io.targets import parse_targets

from . import oracle
from .test_builder import rand_seq, write_fasta


@pytest.mark.parametrize("seed,k,light", [
    (101, 7, False),
    (202, 13, False),
    (303, 11, True),
    (404, 21, False),
    (505, 15, True),
    (606, 9, False),
    (707, 17, True),
    (808, 23, False),
])
def test_random_equivalence(tmp_path, seed, k, light):
    rng = np.random.default_rng(seed)
    n_targets = int(rng.integers(2, 6))
    genomes = []
    for i in range(n_targets):
        g = rand_seq(rng, int(rng.integers(200, 900)))
        # random shared block with a previous genome
        if i and rng.random() < 0.7:
            j = int(rng.integers(0, i))
            pos = int(rng.integers(0, len(genomes[j]) - 50))
            g += genomes[j][pos : pos + 50]
        genomes.append(g)
    with open(tmp_path / "targets.txt", "w") as tf:
        for i, g in enumerate(genomes):
            p = tmp_path / f"g{i}.fa"
            write_fasta(p, [(f"g{i}", g)], width=int(rng.integers(30, 90)))
            tf.write(f"{p} {9000 + i}\n")
    prof = params.tiny(htsize=int(rng.choice([509, 2039, 65521])), light=light,
                       k=k, gap=int(rng.integers(4, 8)))
    targets = parse_targets(str(tmp_path / "targets.txt"))
    builder.build_database(targets, str(tmp_path), prof, k, gap=prof.default_gap)

    stem = str(tmp_path / prof.db_stem(k, n_targets, 0, prof.default_gap))
    c, l = dbformat.read_db(stem, prof, k)
    db = dict(zip(c.tolist(), l.tolist()))
    want_db = oracle.build_db(
        [(g, i) for i, g in enumerate(genomes)], k,
        light=light, gap=prof.default_gap, label_names=targets.labels,
    )
    assert db == want_db

    # random reads: substrings, revcomps, junk, N-injected, odd lengths
    reads = []
    for i in range(60):
        g = genomes[int(rng.integers(0, n_targets))]
        ln = int(rng.integers(max(k - 2, 3), 150))
        pos = int(rng.integers(0, max(len(g) - ln, 1)))
        s = g[pos : pos + ln]
        if rng.random() < 0.3:
            s = oracle.revcomp(s)
        if rng.random() < 0.2 and len(s) > 10:
            cut = int(rng.integers(1, len(s) - 1))
            s = s[:cut] + "N" + s[cut + 1 :]
        reads.append((f"r{i}", s))
    # length exactly k-1: denominator 0 -> the reference's "-nan" row
    # (fuzz-found oracle gap, round 4)
    reads.append(("edge_km1", rand_seq(rng, k - 1)))
    fa = "".join(f">{n}\n{s}\n" for n, s in reads).encode()

    clf = Classifier.load(
        str(tmp_path), targets, prof, k,
        plan=BatchPlan(window_budget=1 << 13),
    )
    got = oracle.rows(clf.classify_bytes(fa)[0])
    want = []
    for name, seq in reads:
        total, ib, b, sb, counts = oracle.classify_read(db, seq, k)
        denom = len(seq) - k + 1
        if denom == 0:
            want.append(f"{name},-nan,NA,0,0")
        else:
            want.append(
                oracle.format_row(name, total, ib, b, sb, len(seq), k,
                                  targets.target_names)
            )
    assert got == want
