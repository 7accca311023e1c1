"""DB recovery from per-target .ht files + spectrum analyser."""

import os

import numpy as np
import pytest

from jn_cuclark_tpu import params
from jn_cuclark_tpu.db import builder
from jn_cuclark_tpu.db.analyser import Analyser
from jn_cuclark_tpu.engine import Classifier
from jn_cuclark_tpu.io import dbformat
from jn_cuclark_tpu.io.targets import parse_targets

from . import oracle
from .test_builder import rand_seq, write_fasta

K = 9


def test_recover_from_ht(tmp_path):
    rng = np.random.default_rng(13)
    genomes = [rand_seq(rng, 500) for _ in range(2)]
    with open(tmp_path / "targets.txt", "w") as tf:
        for i, g in enumerate(genomes):
            p = tmp_path / f"g{i}.fa"
            write_fasta(p, [(f"g{i}", g)])
            tf.write(f"{p} {500 + i}\n")
    prof = params.tiny(htsize=2039, k=K)
    targets = parse_targets(str(tmp_path / "targets.txt"))
    # build WITH tsk so .ht files exist
    db = builder.build_database(targets, str(tmp_path), prof, K, tsk=True)
    stem = os.path.join(str(tmp_path), prof.db_stem(K, 2, 0, prof.default_gap))
    ref = dict(zip(db.canonical.tolist(), db.labels.tolist()))
    # delete the central DB, keep .ht
    for ext in (".sz", ".ky", ".lb"):
        os.remove(stem + ext)
    clf = Classifier.load(str(tmp_path), targets, prof, K)
    # recovered DB should classify identically (mult==1 kmers only; the tsk
    # Element counter differs from lElement only above 254 occurrences)
    c2, l2 = dbformat.read_db(stem, prof, K)
    assert dict(zip(c2.tolist(), l2.tolist())) == ref
    fa = b">x\n" + genomes[0][:80].encode() + b"\n"
    rows = oracle.rows(clf.classify_bytes(fa)[0])
    assert rows[0].split(",")[2] == "500"


def test_analyser_bump(tmp_path):
    # spectrum with error peak at count 1 and coverage bump near 20
    lines = []
    idx = 0
    freqs = {1: 500, 2: 120, 3: 30, 10: 5, 15: 20, 18: 60, 20: 100, 22: 60,
             25: 20, 30: 5, 40: 2, 45: 1, 50: 1}
    for count, n in freqs.items():
        for _ in range(n):
            lines.append(f"KMER{idx} {count}")
            idx += 1
    (tmp_path / "spec.txt").write_text("\n".join(lines) + "\n")
    a = Analyser(str(tmp_path / "spec.txt"))
    assert a.frequency[1] == 500 and a.frequency[20] == 100
    s, e, found = a.bump_interval(1)
    assert found
    assert s <= 20 <= e
