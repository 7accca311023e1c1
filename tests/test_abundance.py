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
