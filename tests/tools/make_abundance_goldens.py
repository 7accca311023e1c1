"""Generate golden fixtures for abundance/merge/report tests by running the
REFERENCE binaries (compiled from /root/reference on the build machine).

Run once:  python tests/tools/make_abundance_goldens.py
Outputs land in tests/golden/.  Requires:
  g++ -O2 -o /tmp/getAbundance_ref /root/reference/src/getAbundance.cc \
      /root/reference/src/file.cc
  g++ -O2 -o /tmp/kent_ref /root/reference/app/kent.cpp

The committed goldens make the test suite self-contained (no reference tree
needed at test time).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "..", "golden")
FIX = os.path.join(GOLD, "fixtures")


def build_fixtures():
    os.makedirs(FIX, exist_ok=True)
    os.makedirs(os.path.join(FIX, "db", "taxonomy"), exist_ok=True)

    # toy taxonomy: root(1) <- bacteria(2,superkingdom) <- prot(1224,phylum)
    # <- gamma(1236,class) <- entero(91347,order) <- enterobact(543,family)
    # <- escherichia(561,genus) <- e.coli(562,species); salmonella branch;
    # a 'species group' rank to exercise the group exclusion; merged remap.
    nodes = [
        (1, 1, "no rank"),
        (2, 1, "superkingdom"),
        (1224, 2, "phylum"),
        (1236, 1224, "class"),
        (91347, 1236, "order"),
        (543, 91347, "family"),
        (561, 543, "genus"),
        (562, 561, "species"),
        (590, 543, "genus"),
        (28901, 590, "species"),
        (86661, 543, "species group"),  # must not count as species
        (99901, 86661, "species"),
    ]
    with open(os.path.join(FIX, "db", "taxonomy", "nodes.dmp"), "w") as f:
        for tid, parent, rank in nodes:
            f.write(f"{tid}\t|\t{parent}\t|\t{rank}\t|\tXX\t|\n")
    names = [
        (1, "root"),
        (2, "Bacteria"),
        (1224, "Proteobacteria"),
        (1236, "Gammaproteobacteria"),
        (91347, "Enterobacterales"),
        (543, "Enterobacteriaceae"),
        (561, "Escherichia"),
        (562, "Escherichia coli"),
        (590, "Salmonella"),
        (28901, "Salmonella enterica"),
        (99901, "Cereus group thing"),
    ]
    with open(os.path.join(FIX, "db", "taxonomy", "names.dmp"), "w") as f:
        for tid, nm in names:
            f.write(f"{tid}\t|\t{nm}\t|\t\t|\tscientific name\t|\n")

    # classification CSVs (normal mode: 5 columns)
    rows1 = [
        ("r1", "1", "562", "120", "1"),
        ("r2", "0.8", "562", "90", "0.9"),
        ("r3", "0.02", "28901", "50", "0.6"),
        ("r4", "0.5", "28901", "40", "0.4"),  # below conf 0.5? 0.4 < 0.5 -> NA
        ("r5", "0", "NA", "0", "0"),
        ("r6", "0.9", "99901", "70", "0.95"),
        ("r7", "0.9", "12345", "70", "0.95"),  # unknown taxid
    ]
    rows2 = [
        ("q1", "1", "562", "100", "1"),
        ("q2", "0.7", "28901", "80", "0.85"),
        ("q3", "0", "NA", "0", "0"),
    ]
    for name, rows in (("res1.csv", rows1), ("res2.csv", rows2)):
        with open(os.path.join(FIX, name), "w") as f:
            f.write("Object_ID,Gamma,Assignment,Score,Confidence\n")
            for r in rows:
                f.write(",".join(r) + "\n")


def run_reference():
    db = os.path.join(FIX, "db")
    cases = {
        "abundance_default.csv": ["-D", db, "-F", os.path.join(FIX, "res1.csv")],
        "abundance_two_files.csv": [
            "-D", db, "-F", os.path.join(FIX, "res1.csv"), os.path.join(FIX, "res2.csv"),
        ],
        "abundance_hc.csv": [
            "-D", db, "--highconfidence", "-F", os.path.join(FIX, "res1.csv"),
        ],
        "abundance_notax.csv": ["-F", os.path.join(FIX, "res1.csv")],
        "abundance_minab.csv": [
            "-D", db, "-a", "20", "-F", os.path.join(FIX, "res1.csv"),
        ],
    }
    for out, args in cases.items():
        r = subprocess.run(
            ["/tmp/getAbundance_ref"] + args,
            capture_output=True,
            cwd=GOLD,
        )
        with open(os.path.join(GOLD, out), "wb") as f:
            f.write(r.stdout)
        print(out, "->", len(r.stdout), "bytes")

    # krona + mpa (written to CWD as results.krn / results.mpa)
    subprocess.run(
        ["/tmp/getAbundance_ref", "-D", db, "--krona", "--mpa", "-F",
         os.path.join(FIX, "res1.csv"), os.path.join(FIX, "res2.csv")],
        capture_output=True,
        cwd=GOLD,
    )
    os.rename(os.path.join(GOLD, "results.krn"), os.path.join(GOLD, "golden.krn"))
    os.rename(os.path.join(GOLD, "results.mpa"), os.path.join(GOLD, "golden.mpa"))

    # kent -m merge of two abundance outputs
    r = subprocess.run(
        ["/tmp/kent_ref", "-m",
         os.path.join(GOLD, "abundance_default.csv"),
         os.path.join(GOLD, "abundance_two_files.csv"),
         "-o", os.path.join(GOLD, "merged.csv")],
        capture_output=True,
    )
    print("merge rc", r.returncode, r.stderr.decode()[:200])
    # kent -r report (writes results/report.txt under CWD)
    os.makedirs(os.path.join(GOLD, "results"), exist_ok=True)
    r = subprocess.run(
        ["/tmp/kent_ref", "-r", os.path.join(GOLD, "merged.csv")],
        capture_output=True,
        cwd=GOLD,
    )
    print("report rc", r.returncode, r.stderr.decode()[:200])
    os.rename(
        os.path.join(GOLD, "results", "report.txt"),
        os.path.join(GOLD, "report.txt"),
    )
    os.rmdir(os.path.join(GOLD, "results"))


if __name__ == "__main__":
    build_fixtures()
    run_reference()
