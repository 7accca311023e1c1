"""DB build byte-parity vs goldens produced by the REFERENCE's own compiled
DB-build path (tests/tools/make_db_goldens.py): full, light, --tsk and -t
modes must serialize byte-identical .sz/.ky/.lb (and .ht text files)."""

import os
import shutil

import pytest

from jn_cuclark_tpu.db import builder
from jn_cuclark_tpu.io.targets import parse_targets
from jn_cuclark_tpu.params import Profile

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden", "db")
INPUTS = os.path.join(GOLD, "inputs")

FULL = Profile(name="g65521", htsize=65521, light=False, default_k=9)
LIGHT = Profile(name="g65521l", htsize=65521, light=True, default_k=27, default_gap=4)


def _targets(tmp_path, name):
    """Rewrite the recorded targets file to point at the committed inputs."""
    out = tmp_path / name
    with open(os.path.join(INPUTS, name)) as f, open(out, "w") as g:
        for line in f:
            path, lbl = line.split()
            g.write(f"{os.path.join(INPUTS, os.path.basename(path))} {lbl}\n")
    return parse_targets(str(out))


def _compare(ours_dir, golden_case, files):
    for fn in files:
        with open(os.path.join(GOLD, golden_case, fn), "rb") as a, open(
            os.path.join(ours_dir, fn), "rb"
        ) as b:
            assert a.read() == b.read(), f"{golden_case}/{fn} differs"


@pytest.mark.parametrize(
    "case,profile,k,kwargs,stem",
    [
        ("full_k9", FULL, 9, {}, "db_central_k9_t3_s65521_m0.tsk"),
        ("light_k27", LIGHT, 27, {}, "db_central_k27_t3_s65521_m0_light_4.tsk"),
        ("tsk_k9", FULL, 9, {"tsk": True}, "db_central_k9_t3_s65521_m0.tsk"),
    ],
)
def test_build_matches_reference_builder(tmp_path, case, profile, k, kwargs, stem):
    targets = _targets(tmp_path, "targets.txt")
    out = tmp_path / "db"
    out.mkdir()
    builder.build_database(targets, str(out), profile, k, **kwargs)
    files = [stem + ext for ext in (".sz", ".ky", ".lb")]
    if kwargs.get("tsk"):
        files += [f"{lbl}_k9.ht" for lbl in ("1001", "1002", "1003")]
    _compare(str(out), case, files)


def test_min_count_matches_reference_builder(tmp_path):
    targets = _targets(tmp_path, "targets_rep.txt")
    out = tmp_path / "db"
    out.mkdir()
    builder.build_database(targets, str(out), FULL, 9, min_count_target=2)
    _compare(
        str(out),
        "mint2_k9",
        ["db_central_k9_t2_s65521_m2.tsk" + e for e in (".sz", ".ky", ".lb")],
    )
