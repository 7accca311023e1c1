"""Classification CSV byte-parity vs goldens from the REFERENCE's own engine
run on CPU (tests/tools/make_csv_goldens.py): FASTA, FASTQ, --extended and
paired modes must match byte-for-byte (headers, %g, -nan rows, NBN paired
normalization, name truncation, ordering)."""

import os

import pytest

from jn_cuclark_tpu.engine import Classifier
from jn_cuclark_tpu.io.targets import parse_targets
from jn_cuclark_tpu.params import Profile

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden", "csv")
GOLD_DB = os.path.join(HERE, "golden", "db")
INPUTS = os.path.join(GOLD_DB, "inputs")


@pytest.fixture(scope="module")
def clf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("csvgold")
    targets_file = tmp / "targets.txt"
    with open(os.path.join(INPUTS, "targets.txt")) as f, open(targets_file, "w") as g:
        for line in f:
            path, lbl = line.split()
            g.write(f"{os.path.join(INPUTS, os.path.basename(path))} {lbl}\n")
    prof = Profile(name="g65521", htsize=65521, light=False, default_k=9)
    targets = parse_targets(str(targets_file))
    # copy the golden DB to tmp so the index cache isn't written into goldens
    import shutil

    dbdir = tmp / "db"
    shutil.copytree(os.path.join(GOLD_DB, "full_k9"), dbdir)
    return Classifier.load(str(dbdir), targets, prof, 9)


@pytest.mark.parametrize("case,kwargs", [
    ("fa", dict(objects="reads.fa")),
    ("fq", dict(objects="reads.fq")),
    ("ext", dict(objects="reads.fa", extended=True)),
    ("paired", dict(objects="p1.fq", paired="p2.fq")),
])
def test_csv_matches_reference_engine(clf, tmp_path, case, kwargs):
    out = str(tmp_path / case)
    clf.classify_file(
        os.path.join(GOLD, kwargs["objects"]),
        out,
        paired_path=(
            os.path.join(GOLD, kwargs["paired"]) if "paired" in kwargs else None
        ),
        extended=kwargs.get("extended", False),
    )
    with open(os.path.join(GOLD, case + ".csv"), "rb") as a, open(
        out + ".csv", "rb"
    ) as b:
        assert a.read() == b.read()
