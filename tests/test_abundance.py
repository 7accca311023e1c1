"""Abundance/merge/report vs. goldens generated from the REFERENCE binaries
(see tests/tools/make_abundance_goldens.py) — byte-identical comparisons."""

import os

import pytest

from jn_cuclark_tpu import abundance

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden")
FIX = os.path.join(GOLD, "fixtures")
DB = os.path.join(FIX, "db")


def golden(name):
    with open(os.path.join(GOLD, name)) as f:
        return f.read()


def test_estimate_default():
    res = abundance.estimate([os.path.join(FIX, "res1.csv")], db_dir=DB)
    assert res.text() == golden("abundance_default.csv")


def test_estimate_two_files():
    res = abundance.estimate(
        [os.path.join(FIX, "res1.csv"), os.path.join(FIX, "res2.csv")], db_dir=DB
    )
    assert res.text() == golden("abundance_two_files.csv")


def test_estimate_highconfidence():
    res = abundance.estimate(
        [os.path.join(FIX, "res1.csv")], db_dir=DB, high_confidence=True
    )
    assert res.text() == golden("abundance_hc.csv")


def test_estimate_no_taxonomy():
    res = abundance.estimate([os.path.join(FIX, "res1.csv")])
    assert res.text() == golden("abundance_notax.csv")


def test_estimate_min_abundance():
    res = abundance.estimate(
        [os.path.join(FIX, "res1.csv")], db_dir=DB, min_abundance=20.0
    )
    assert res.text() == golden("abundance_minab.csv")


def test_krona_mpa(tmp_path):
    abundance.estimate(
        [os.path.join(FIX, "res1.csv"), os.path.join(FIX, "res2.csv")],
        db_dir=DB,
        krona_path=str(tmp_path / "out.krn"),
        mpa_path=str(tmp_path / "out.mpa"),
    )
    assert (tmp_path / "out.krn").read_text() == golden("golden.krn")
    assert (tmp_path / "out.mpa").read_text() == golden("golden.mpa")


def test_merge(tmp_path):
    out = tmp_path / "merged.csv"
    abundance.merge(
        [
            os.path.join(GOLD, "abundance_default.csv"),
            os.path.join(GOLD, "abundance_two_files.csv"),
        ],
        str(out),
    )
    assert out.read_text() == golden("merged.csv")


def test_report(tmp_path):
    out = tmp_path / "report.txt"
    abundance.report(os.path.join(GOLD, "merged.csv"), str(out))
    assert out.read_text() == golden("report.txt")


def test_native_scan_matches_python(tmp_path, monkeypatch):
    """The native abundance_scan fast path is line-for-line equal to the
    pure-Python estimate loop on adversarial CSVs (weird floats, missing
    fields, empty fields, CRLF, truncated lines, long labels -> fallback)."""
    import numpy as np

    from jn_cuclark_tpu.utils import native

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    labels = ["1280", "562", "NA", "0", "99999999", "x" * 12, "-7"]
    gammas = ["0.5", "-nan", "nan", "0", "1e-3", "", "bad", "0.75", " 0.2",
              "0.7_5", "0" * 70 + ".5"]  # '_'/long numerals force fallback
    confs = ["0.75", "0.5", "1", "0.2", "-inf", "", "zz", "0.9"]

    def rand_csv(ncols_header, n):
        hdr = ",".join(f"c{i}" for i in range(ncols_header))
        lines = [hdr]
        for i in range(n):
            kind = rng.integers(0, 10)
            if kind == 0:
                lines.append("")  # blank line
            elif kind == 1:
                lines.append(f"r{i}")  # truncated: only the id
            elif kind == 2:
                lines.append(f"r{i},{rng.choice(gammas)}")  # missing label
            else:
                g = rng.choice(gammas)
                lbl = rng.choice(labels)
                c = rng.choice(confs)
                sep = "\t" if kind == 3 else ","
                extra = ",,," if kind == 4 else ""
                lines.append(f"r{i}{sep}{g}{sep}{lbl}{sep}7{sep}{c}{extra}")
        eol = "\r\n" if rng.integers(0, 2) else "\n"
        return (eol.join(lines) + (eol if rng.integers(0, 2) else "")).encode()

    for trial in range(30):
        data = rand_csv(int(rng.integers(3, 8)), int(rng.integers(1, 60)))
        p = tmp_path / f"t{trial}.csv"
        p.write_bytes(data)
        got = abundance.estimate([str(p)], min_confidence=0.5, min_gamma=0.01)
        with monkeypatch.context() as m:
            m.setattr(native, "available", lambda: False)
            want = abundance.estimate(
                [str(p)], min_confidence=0.5, min_gamma=0.01
            )
        assert got.rows == want.rows, data[:400]
        assert got.header == want.header
