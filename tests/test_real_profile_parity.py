"""Live byte-parity at the REAL light profile (HTSIZE=57,777,779, k=27,
gap 4 — src/parameters_light_hh:39-49): compiles the reference's own engine
at its true constants (CPU kernel stub) and byte-compares DB files and
classification CSV against ours on a small genome set.

The 57 MB .sz makes committed goldens impractical, so this test generates
its fixture live; it is skipped where the reference tree or g++ is absent.
The compiled engine is cached in /tmp across runs."""

import os
import subprocess

import numpy as np
import pytest

from jn_cuclark_tpu.db import builder
from jn_cuclark_tpu.engine import Classifier
from jn_cuclark_tpu.io.targets import parse_targets
from jn_cuclark_tpu.params import LIGHT_HTSIZE, Profile

HERE = os.path.dirname(os.path.abspath(__file__))
TOOLS = os.path.join(HERE, "tools")

import sys  # noqa: E402

sys.path.insert(0, TOOLS)
import refbuild  # noqa: E402

pytestmark = pytest.mark.skipif(
    not refbuild.available(), reason="reference tree or g++ not available"
)

K = 27
PROF = Profile(
    name="light", htsize=LIGHT_HTSIZE, light=True, default_k=K, default_gap=4
)


def test_real_light_profile_parity(tmp_path):
    rng = np.random.default_rng(57)

    def rs(n):
        return "".join(rng.choice(list("ACGT"), n))

    genomes = [rs(4000), rs(3500)]
    shared = rs(300)
    genomes[0] += shared
    genomes[1] += shared
    with open(tmp_path / "targets.txt", "w") as tf:
        for i, g in enumerate(genomes):
            p = tmp_path / f"g{i}.fa"
            with open(p, "w") as f:
                f.write(f">g{i}\n")
                for j in range(0, len(g), 70):
                    f.write(g[j : j + 70] + "\n")
            tf.write(f"{p} {3001 + i}\n")
    with open(tmp_path / "reads.fa", "w") as f:
        for i in range(150):
            g = genomes[i % 2]
            ln = int(rng.integers(80, 200))
            pos = int(rng.integers(0, len(g) - ln))
            f.write(f">r{i}\n{g[pos:pos+ln]}\n")
        f.write(f">junk\n{rs(120)}\n")

    exe = refbuild.stage_engine(LIGHT_HTSIZE, True, "/tmp/ref_light_real")
    dbref = tmp_path / "dbref"
    dbref.mkdir()
    refbuild.run_engine(
        exe,
        str(tmp_path / "targets.txt"),
        str(dbref),
        str(tmp_path / "reads.fa"),
        str(tmp_path / "ref_out"),
        K,
    )

    targets = parse_targets(str(tmp_path / "targets.txt"))
    ours = tmp_path / "db"
    ours.mkdir()
    builder.build_database(targets, str(ours), PROF, K)
    stem = PROF.db_stem(K, targets.n_targets, 0, 4)
    assert PROF.key_dtype(K) == np.uint32  # the real light key width
    for ext in (".sz", ".ky", ".lb"):
        a = (dbref / (stem + ext)).read_bytes()
        b = (ours / (stem + ext)).read_bytes()
        assert a == b, f"{ext} differs at real light HTSIZE"

    clf = Classifier.load(str(ours), targets, PROF, K)
    clf.classify_file(str(tmp_path / "reads.fa"), str(tmp_path / "our_out"))
    assert (tmp_path / "our_out.csv").read_bytes() == (
        tmp_path / "ref_out.csv"
    ).read_bytes()
