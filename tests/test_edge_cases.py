"""Edge-case behavior: odd inputs must match between python/native host
paths and the brute-force oracle."""

import numpy as np
import pytest

from jn_cuclark_tpu import params
from jn_cuclark_tpu.db import builder
from jn_cuclark_tpu.engine import BatchPlan, Classifier
from jn_cuclark_tpu.io.targets import parse_targets

from . import oracle
from .test_builder import rand_seq, write_fasta

K = 9


@pytest.fixture(scope="module")
def clf(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("edge")
    rng = np.random.default_rng(55)
    g = rand_seq(rng, 600)
    write_fasta(tmp_path / "g.fa", [("g", g)])
    with open(tmp_path / "targets.txt", "w") as f:
        f.write(f"{tmp_path}/g.fa 42\n")
    prof = params.tiny(htsize=2039, k=K)
    targets = parse_targets(str(tmp_path / "targets.txt"))
    builder.build_database(targets, str(tmp_path), prof, K)
    plan = BatchPlan(window_budget=1 << 13)
    py = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, use_native=False)
    nat = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, use_native=True)
    return py, nat, g


def both(clf, data, **kw):
    py, nat, g = clf
    a = b"".join(py.classify_bytes(data, **kw)[0])
    b = b"".join(nat.classify_bytes(data, **kw)[0])
    assert a == b, f"python vs native mismatch:\n{a!r}\n{b!r}"
    return a.decode().splitlines()


def test_lowercase_and_rna(clf):
    py, nat, g = clf
    sub = g[50:150]
    fa = f">low\n{sub.lower()}\n>rna\n{sub.replace('T', 'U')}\n>mix\n{sub[:50].lower()}{sub[50:]}\n".encode()
    rows = both(clf, fa)
    # all three encodings must classify identically to the plain read
    plain = both(clf, f">p\n{sub}\n".encode())[0].split(",", 1)[1]
    for r in rows:
        assert r.split(",", 1)[1] == plain


def test_empty_sequence_read(clf):
    fa = b">empty\n>next\n" + b"ACGTACGTACGT" + b"\n"
    rows = both(clf, fa)
    assert rows[0].startswith("empty,")
    # length 0 -> gamma = 0/(0-9+1) = -0
    assert rows[0] == "empty,-0,NA,0,0"


def test_length_k_minus_1_nan(clf):
    py, nat, g = clf
    fa = b">edge\n" + g[:K-1].encode() + b"\n"
    rows = both(clf, fa)
    assert rows[0] == "edge,-nan,NA,0,0"


def test_no_trailing_newline(clf):
    py, nat, g = clf
    fa = b">a\n" + g[:60].encode()  # EOF right after sequence
    rows = both(clf, fa)
    want = oracle.format_row("a", *oracle.classify_read(
        _db_of(py), g[:60], K)[:4], norm=60, k=K, names=py.target_names)
    assert rows[0] == want


def test_windows_crossing_lines(clf):
    py, nat, g = clf
    seq = g[100:200]
    fa = (">x\n" + "\n".join(seq[i:i+13] for i in range(0, len(seq), 13)) + "\n").encode()
    rows = both(clf, fa)
    want = oracle.format_row("x", *oracle.classify_read(
        _db_of(py), seq, K)[:4], norm=len(seq), k=K, names=py.target_names)
    assert rows[0] == want


def test_very_long_read(clf):
    py, nat, g = clf
    rng = np.random.default_rng(1)
    longseq = g * 3 + rand_seq(rng, 2000)
    fa = (">long\n" + longseq + "\n").encode()
    rows = both(clf, fa)
    want = oracle.format_row("long", *oracle.classify_read(
        _db_of(py), longseq, K)[:4], norm=len(longseq), k=K, names=py.target_names)
    assert rows[0] == want


def _db_of(clf):
    # rebuild oracle dict from the classifier's profile db on disk
    import os
    from jn_cuclark_tpu.io import dbformat

    # not needed generally; use the stored canonical via table? simplest:
    # reread from the folder recorded at load time
    return _DBCACHE[id(clf)]


_DBCACHE = {}


@pytest.fixture(autouse=True, scope="module")
def _fill_dbcache(clf, tmp_path_factory):
    py, nat, g = clf
    import glob
    import os

    from jn_cuclark_tpu.io import dbformat

    # find the db files the fixture built
    base = None
    for d in tmp_path_factory.getbasetemp().iterdir():
        if d.name.startswith("edge"):
            base = d
    prof = params.tiny(htsize=2039, k=K)
    stem = os.path.join(str(base), prof.db_stem(K, 1, 0, prof.default_gap))
    c, l = dbformat.read_db(stem, prof, K)
    db = dict(zip(c.tolist(), l.tolist()))
    _DBCACHE[id(py)] = db
    _DBCACHE[id(nat)] = db
    yield


def test_truncated_fastq_trailing_record(clf):
    """A trailing record with header+sequence but no +/quality lines is kept,
    identically by the numpy fallback and the native scanner."""
    py, nat, g = clf
    sub1, sub2 = g[50:150], g[200:300]
    full = f"@r1\n{sub1}\n+\nIIII\n".encode()
    trunc = full + f"@r2\n{sub2}\n".encode()
    rows = both(clf, trunc)
    assert len(rows) == 2
    assert rows[1].split(",")[0] == "r2"
    # a lone trailing header line (no sequence) is dropped by both paths
    rows = both(clf, full + b"@r3\n")
    assert len(rows) == 1
