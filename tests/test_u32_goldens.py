"""Byte-parity at the REAL key width: both real profiles store 4-byte (u32)
quotients for their default k (main.cc:251-286); these goldens were produced
by the reference's own engine compiled at HTSIZE=16,777,259 (t_b=12, k=27 ->
u32, exactly the light profile's width math) by tests/tools/make_u32_goldens.py.
Round-1 goldens at HTSIZE=65521 only exercised u16/u64 keys."""

import gzip
import os

import pytest

from jn_cuclark_tpu.db import builder
from jn_cuclark_tpu.engine import Classifier
from jn_cuclark_tpu.io.targets import parse_targets
from jn_cuclark_tpu.params import Profile

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden", "u32")
INPUTS = os.path.join(GOLD, "inputs")

HTSIZE = 16777259
K = 27

FULL = Profile(name="u32f", htsize=HTSIZE, light=False, default_k=K)
LIGHT = Profile(
    name="u32l", htsize=HTSIZE, light=True, default_k=K, default_gap=4
)


def _targets(tmp_path):
    out = tmp_path / "targets.txt"
    with open(os.path.join(INPUTS, "targets.txt")) as f, open(out, "w") as g:
        for line in f:
            path, lbl = line.split()
            g.write(f"{os.path.join(INPUTS, os.path.basename(path))} {lbl}\n")
    return parse_targets(str(out))


@pytest.mark.parametrize(
    "case,profile,stem",
    [
        ("full_k27", FULL, "db_central_k27_t3_s16777259_m0.tsk"),
        ("light_k27", LIGHT, "db_central_k27_t3_s16777259_m0_light_4.tsk"),
    ],
)
def test_u32_db_and_csv_match_reference(tmp_path, case, profile, stem):
    targets = _targets(tmp_path)
    out = tmp_path / "db"
    out.mkdir()
    builder.build_database(targets, str(out), profile, K)
    # key dtype really is u32 at this HTSIZE/k (the point of the fixture)
    import numpy as np

    assert profile.key_dtype(K) == np.uint32
    for ext in (".sz", ".ky", ".lb"):
        with gzip.open(
            os.path.join(GOLD, case, stem + ext + ".gz"), "rb"
        ) as a, open(out / (stem + ext), "rb") as b:
            assert a.read() == b.read(), f"{case}{ext} differs"

    clf = Classifier.load(str(out), targets, profile, K)
    res = tmp_path / "res"
    clf.classify_file(os.path.join(INPUTS, "reads.fa"), str(res))
    got = (tmp_path / "res.csv").read_bytes()
    want = open(os.path.join(GOLD, case + ".csv"), "rb").read()
    assert got == want, f"{case} CSV differs"
