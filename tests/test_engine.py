"""End-to-end classification vs. brute-force oracle, including CSV bytes."""

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
def setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("db")
    rng = np.random.default_rng(42)
    genomes = {
        "g1": rand_seq(rng, 800),
        "g2": rand_seq(rng, 700),
        "g3": rand_seq(rng, 600),
    }
    shared = rand_seq(rng, 80)
    genomes["g1"] += shared
    genomes["g2"] += shared
    for name, seq in genomes.items():
        write_fasta(tmp_path / f"{name}.fa", [(name, seq)], width=60)
    tpath = tmp_path / "targets.txt"
    with open(tpath, "w") as f:
        for i, name in enumerate(genomes):
            f.write(f"{tmp_path}/{name}.fa {1001 + i}\n")
    prof = params.tiny(htsize=4093, k=K)
    targets = parse_targets(str(tpath))
    builder.build_database(targets, str(tmp_path), prof, K)

    # simulate reads: substrings of the genomes + random junk + N-containing
    reads = []
    gl = list(genomes.values())
    for i in range(300):
        src = gl[i % 3]
        pos = rng.integers(0, len(src) - 100)
        seq = src[pos : pos + 100]
        if i % 7 == 0:
            seq = seq[:30] + "N" + seq[31:]  # inject an ambiguous base
        if i % 11 == 0:
            seq = oracle.revcomp(seq)
        reads.append((f"read_{i}", seq))
    for i in range(30):
        reads.append((f"junk_{i}", rand_seq(rng, 90)))
    reads.append(("short", "ACGT"))  # shorter than k
    return tmp_path, tpath, prof, targets, genomes, reads


def oracle_csv(reads, db, k, names, paired=False):
    rows = []
    for name, seq in reads:
        total, ib, b, sb, counts = oracle.classify_read(db, seq, k)
        norm = len(seq) - (params.NBN if paired else 0)
        rows.append(oracle.format_row(name, total, ib, b, sb, norm, k, names))
    return rows


def load_oracle_db(tmp_path, prof, targets):
    from jn_cuclark_tpu.io import dbformat
    import os

    stem = os.path.join(
        str(tmp_path), prof.db_stem(K, targets.n_targets, 0, prof.default_gap)
    )
    c, l = dbformat.read_db(stem, prof, K)
    return dict(zip(c.tolist(), l.tolist()))


def test_classify_fasta_matches_oracle(setup, tmp_path):
    dbdir, tpath, prof, targets, genomes, reads = setup
    clf = Classifier.load(
        str(dbdir), targets, prof, K, plan=BatchPlan(max_queries=4096, max_reads=64)
    )
    fa = "".join(f">{n}\n{s}\n" for n, s in reads).encode()
    gen, nreads = clf.classify_bytes(fa)
    got = oracle.rows(gen)
    db = load_oracle_db(dbdir, prof, targets)
    want = oracle_csv(reads, db, K, targets.target_names)
    assert nreads == len(reads)
    assert got == want
    # sanity: most genome-derived reads classified to the right target
    right = sum(1 for r in got[:300] if r.split(",")[2] != "NA")
    assert right > 250


def test_classify_fastq(setup):
    dbdir, tpath, prof, targets, genomes, reads = setup
    clf = Classifier.load(str(dbdir), targets, prof, K)
    fq = "".join(
        f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads if len(s) > 4
    ).encode()
    gen, nreads = clf.classify_bytes(fq)
    got = oracle.rows(gen)
    db = load_oracle_db(dbdir, prof, targets)
    want = oracle_csv([(n, s) for n, s in reads if len(s) > 4], db, K, targets.target_names)
    assert got == want


def test_extended_output(setup):
    dbdir, tpath, prof, targets, genomes, reads = setup
    clf = Classifier.load(str(dbdir), targets, prof, K)
    sub = reads[:50]
    fa = "".join(f">{n}\n{s}\n" for n, s in sub).encode()
    gen, _ = clf.classify_bytes(fa, extended=True)
    got = oracle.rows(gen)
    db = load_oracle_db(dbdir, prof, targets)
    want = []
    for name, seq in sub:
        total, ib, b, sb, counts = oracle.classify_read(db, seq, K)
        want.append(
            oracle.format_row(
                name, total, ib, b, sb, len(seq), K, targets.target_names,
                counts=counts, n_targets=targets.n_targets,
            )
        )
    assert got == want


def test_classify_file_and_header(setup, tmp_path):
    dbdir, tpath, prof, targets, genomes, reads = setup
    clf = Classifier.load(str(dbdir), targets, prof, K)
    obj = tmp_path / "reads.fa"
    with open(obj, "w") as f:
        for n, s in reads[:20]:
            f.write(f">{n}\n{s}\n")
    res = tmp_path / "out"
    stats = clf.classify_file(str(obj), str(res))
    assert stats["reads"] == 20
    lines = open(str(res) + ".csv").read().splitlines()
    assert lines[0] == "Object_ID,Gamma,Assignment,Score,Confidence"
    assert len(lines) == 21


def test_name_truncation_and_token(setup):
    dbdir, tpath, prof, targets, genomes, reads = setup
    clf = Classifier.load(str(dbdir), targets, prof, K)
    longname = "x" * 60
    fa = f">{longname} extra stuff\nACGTACGTACGTACGT\n>a b\nACGTACGTACGTACGT\n".encode()
    gen, _ = clf.classify_bytes(fa)
    rows = oracle.rows(gen)
    assert rows[0].startswith("x" * 39 + ",")
    assert rows[1].startswith("a,")


def test_paired_merge(setup):
    dbdir, tpath, prof, targets, genomes, reads = setup
    from jn_cuclark_tpu.io.fasta import merge_paired

    g1 = genomes["g1"]
    r1 = [("p1", g1[0:80]), ("p2", g1[100:180])]
    r2 = [("p1", oracle.revcomp(g1[200:280])), ("p2", oracle.revcomp(g1[300:380]))]
    fq1 = "".join(f"@{n}/1\n{s}\n+\n{'I'*len(s)}\n" for n, s in r1).encode()
    fq2 = "".join(f"@{n}/2\n{s}\n+\n{'I'*len(s)}\n" for n, s in r2).encode()
    merged = merge_paired(fq1, fq2)
    assert merged.split(b"\n")[0] == b">p1"
    clf = Classifier.load(str(dbdir), targets, prof, K)
    gen, _ = clf.classify_bytes(merged, paired=True)
    got = oracle.rows(gen)
    db = load_oracle_db(dbdir, prof, targets)
    pairs = [(n, a + "N" + b) for (n, a), (_, b) in zip(r1, r2)]
    want = oracle_csv(pairs, db, K, targets.target_names, paired=True)
    assert got == want


def test_classify_file_verbose(setup, tmp_path, capsys):
    """verbose=True printed an undefined variable in round 1 (NameError)."""
    dbdir, tpath, prof, targets, genomes, reads = setup
    clf = Classifier.load(str(dbdir), targets, prof, K)
    obj = tmp_path / "verbose_reads.fa"
    with open(obj, "w") as f:
        for n, s in reads[:5]:
            f.write(f">{n}\n{s}\n")
    res = tmp_path / "verbose_out"
    stats = clf.classify_file(str(obj), str(res), verbose=True)
    assert stats["reads"] == 5
    out = capsys.readouterr().out
    assert "5 reads)" in out and "Done in" in out


def test_hit_stats_report(setup, tmp_path, capsys):
    """MIN/MAX/AVG distinct-targets-hit stderr report
    (CuCLARK_hh.hh:1979-1980, 2053-2067): accumulated values must match a
    CSV-derived oracle and the reference's exact line format, on both the
    streamed and the out-of-core engines."""
    from jn_cuclark_tpu.engine import HitStats

    dbdir, tpath, prof, targets, genomes, reads = setup
    fa = "".join(f">{n}\n{s}\n" for n, s in reads).encode()
    obj = tmp_path / "hs_reads.fa"
    obj.write_bytes(fa)

    def expect(csv_path):
        distinct = []
        with open(csv_path) as f:
            next(f)
            for ln in f:
                cells = ln.strip().split(",")[1 : 1 + targets.n_targets]
                distinct.append(sum(int(c) > 0 for c in cells))
        mn = min([targets.n_targets] + distinct) if distinct else 0
        mx = max(distinct, default=0)
        avg = np.float32(sum(distinct)) / np.float32(len(distinct))
        return (
            f"MIN targets: {min(targets.n_targets, mn)}, "
            f"MAX targets: {mx}, AVG targets: {'%g' % avg}"
        )

    for cycles in (1, 3):
        clf = Classifier.load(
            str(dbdir), targets, prof, K, db_cycles=cycles
        )
        stats = clf.classify_file(
            str(obj), str(tmp_path / f"hs_res{cycles}"), extended=True,
            verbose=True,
        )
        hs = stats["hit_stats"]
        assert isinstance(hs, HitStats)
        want = expect(tmp_path / f"hs_res{cycles}.csv")
        assert hs.report() == want, cycles
        assert f"MIN targets: {hs.min}, MAX targets: {hs.max}" in want
        captured = capsys.readouterr()
        assert want in captured.err
