"""Golden fixtures at a u32-key HTSIZE — the real profiles' quotient width.

Both real profiles (HTSIZE 1,610,612,741 and 57,777,779) store 4-byte key
quotients for their default k (main.cc:251-286: u32 iff t_b+8 < k <= t_b+16
with t_b = log4(HTSIZE)); round 1's goldens at HTSIZE=65521 exercised only
u16 (k=9) and u64 (k=27) paths.  This tool compiles the reference at
HTSIZE=16,777,259 (prime, t_b=12, so k=27 -> u32 exactly like the real light
profile) and records:

  * full-mode  k=27 DB (.sz/.ky/.lb)       -> tests/golden/u32/full_k27/
  * light-mode k=27 gap-4 DB               -> tests/golden/u32/light_k27/
  * classification CSVs against both DBs   -> tests/golden/u32/*.csv

The 16 MB .sz/.ky/.lb files are committed gzipped (they are mostly zeros);
tests/test_u32_goldens.py decompresses before byte-comparing.

Run once:  python tests/tools/make_u32_goldens.py
"""

import gzip
import os
import shutil
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "..", "golden", "u32")
WORK = "/tmp/ref_u32_goldens"

sys.path.insert(0, HERE)
import refbuild  # noqa: E402

HTSIZE = 16777259  # prime; t_b=12 -> k=27 stores u32 quotients
K = 27


def write_inputs(d: str):
    rng = np.random.default_rng(20260817)

    def rs(n):
        return "".join(rng.choice(list("ACGT"), n))

    g1, g2, g3 = rs(3000), rs(2500), rs(2000)
    shared = rs(200)
    g1 += shared
    g2 += shared
    g1 = g1[:1000] + "N" + g1[1000:]
    g2 = g2[:300].lower() + g2[300:]
    with open(os.path.join(d, "t1.fa"), "w") as f:
        f.write(">t1 rec1\n")
        for i in range(0, len(g1), 61):
            f.write(g1[i : i + 61] + "\n")
        f.write(">t1 rec2\n" + rs(400) + "\n")
    with open(os.path.join(d, "t2.fa"), "w") as f:
        f.write(">t2\n")
        for i in range(0, len(g2), 70):
            f.write(g2[i : i + 70] + "\n")
    with open(os.path.join(d, "t3.fq"), "w") as f:
        f.write("@t3r1\n" + g3[:1200] + "\n+\n" + "I" * 1200 + "\n")
        f.write("@t3r2\n" + g3[1200:] + "\n+\n" + "I" * 800 + "\n")
    with open(os.path.join(d, "targets.txt"), "w") as f:
        for name, lbl in (("t1.fa", 1001), ("t2.fa", 1002), ("t3.fq", 1003)):
            f.write(f"{os.path.join(d, name)} {lbl}\n")

    genomes = [g1.replace("N", ""), g2.upper(), g3]
    comp = str.maketrans("ACGT", "TGCA")
    rng2 = np.random.default_rng(99)
    with open(os.path.join(d, "reads.fa"), "w") as f:
        for i in range(300):
            g = genomes[i % 3]
            ln = int(rng2.integers(20, 180))
            pos = int(rng2.integers(0, max(len(g) - ln, 1)))
            s = g[pos : pos + ln]
            if i % 4 == 0:
                s = s.translate(comp)[::-1]
            if i % 9 == 0 and len(s) > 40:
                s = s[:20] + "N" + s[21:]
            f.write(f">read_{i} extra\n{s}\n")
        f.write(">tiny\nACGTAC\n")
        f.write(">junk\n" + rs(150) + "\n")


def gz(src, dst):
    with open(src, "rb") as a, gzip.open(dst, "wb", compresslevel=9) as b:
        shutil.copyfileobj(a, b)


def main():
    shutil.rmtree(WORK, ignore_errors=True)
    shutil.rmtree(GOLD, ignore_errors=True)
    os.makedirs(GOLD)
    d = os.path.join(WORK, "inputs")
    os.makedirs(d)
    write_inputs(d)
    shutil.copytree(d, os.path.join(GOLD, "inputs"))

    for case, light in (("full_k27", False), ("light_k27", True)):
        exe = refbuild.stage_engine(
            HTSIZE, light, os.path.join(WORK, "eng_" + case)
        )
        dbdir = os.path.join(WORK, "db_" + case)
        os.makedirs(dbdir)
        refbuild.run_engine(
            exe,
            os.path.join(d, "targets.txt"),
            dbdir,
            os.path.join(d, "reads.fa"),
            os.path.join(WORK, case),
            K,
        )
        gdir = os.path.join(GOLD, case)
        os.makedirs(gdir)
        for fn in sorted(os.listdir(dbdir)):
            gz(os.path.join(dbdir, fn), os.path.join(gdir, fn + ".gz"))
            print(case, fn, os.path.getsize(os.path.join(gdir, fn + ".gz")))
        shutil.copy(
            os.path.join(WORK, case + ".csv"),
            os.path.join(GOLD, case + ".csv"),
        )
        print(case + ".csv written")


if __name__ == "__main__":
    sys.exit(main())
