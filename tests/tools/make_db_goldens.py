"""Generate golden DATABASE fixtures by compiling and running the REFERENCE's
own DB-build path (makeSpecificTargetSets) on CPU.

The reference's CUDA manager is replaced by a stub whose `read()` exits right
after the build wrote the central DB, and HTSIZE is rebuilt at 65521 (it is a
compile-time constant in the reference; our profiles take it as a parameter,
and the serialization math is HTSIZE-generic), producing commit-sized
fixtures.  Run once:

    python tests/tools/make_db_goldens.py

Covers: full mode (k=9), light mode (k=27, gap 4), --tsk per-target .ht
files, and -t 2 minimum-frequency filtering; inputs include multi-record
FASTA, FASTQ targets, N bases, lowercase, and shared blocks between genomes.
Outputs land in tests/golden/db/.
"""

import os
import shutil
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "..", "golden", "db")
REF = "/root/reference/src"
WORK = "/tmp/refbuild_goldens"

STUB = '''\
#ifndef CUCLARKDB_CUH
#define CUCLARKDB_CUH
#include <cstdlib>
#include <vector>
#include "./dataType.hh"
template <typename HKMERr>
class CuClarkDB {
 public:
  CuClarkDB() {}
  CuClarkDB(const size_t, const uint8_t, const size_t, const size_t, bool = false) {}
  ~CuClarkDB() {}
  void freeBatchMemory() {}
  size_t malloc(size_t, size_t, size_t, std::vector<ITYPE>&, RESULTS*&, size_t,
                RESULTS*&, size_t, bool, std::vector<uint32_t*>&,
                std::vector<CONTAINER*>&) { return 0; }
  bool sync() { return true; }
  bool waitForBatch(size_t) { return true; }
  bool checkBatch(size_t) { return true; }
  bool read(const char*, size_t&, size_t&, const ITYPE& = 1) { std::exit(0); }
  bool swapDbParts() { return false; }
  bool readyBatch(const size_t, const size_t, const size_t) { return true; }
  bool queryBatch(const size_t, const bool, const bool = false) { return false; }
  bool getFinalResult(const size_t, RESULTS*) { return true; }
};
#endif
'''

SOURCES = [
    "main.cc", "CuCLARK_hh.hh", "hashTable_hh.hh", "HashTableStorage_hh.hh",
    "dataType.hh", "file.cc", "file.hh", "kmersConversion.cc",
    "kmersConversion.hh", "analyser.cc", "analyser.hh",
]


def stage(light: bool) -> str:
    d = os.path.join(WORK, "light" if light else "full")
    os.makedirs(d, exist_ok=True)
    for s in SOURCES:
        shutil.copy(os.path.join(REF, s), d)
    params = os.path.join(REF, "parameters_light_hh" if light else "parameters.hh")
    text = open(params).read()
    if light:
        # light mode is detected via HTSIZE == LHTSIZE (main.cc:214)
        text = text.replace("#define LHTSIZE \t57777779", "#define LHTSIZE \t65521")
        text = text.replace("#define HTSIZE  \t57777779", "#define HTSIZE  \t65521")
    else:
        text = text.replace("#define HTSIZE  \t1610612741", "#define HTSIZE  \t65521")
    with open(os.path.join(d, "parameters.hh"), "w") as f:
        f.write(text)
    with open(os.path.join(d, "CuClarkDB.cuh"), "w") as f:
        f.write(STUB)
    exe = os.path.join(d, "builder")
    subprocess.run(
        ["g++", "-O2", "-fopenmp", "-o", exe, "main.cc", "file.cc",
         "kmersConversion.cc", "analyser.cc"],
        cwd=d, check=True, capture_output=True,
    )
    return exe


def write_inputs(d: str):
    rng = np.random.default_rng(4242)

    def rs(n):
        return "".join(rng.choice(list("ACGT"), n))

    g1, g2, g3 = rs(700), rs(600), rs(500)
    shared = rs(80)
    g1 += shared
    g2 += shared
    g1 = g1[:300] + "N" + g1[300:]
    g2 = g2[:100].lower() + g2[100:]
    with open(os.path.join(d, "t1.fa"), "w") as f:
        f.write(">t1 rec1\n")
        for i in range(0, len(g1), 61):
            f.write(g1[i : i + 61] + "\n")
        f.write(">t1 rec2\n" + rs(120) + "\n")
    with open(os.path.join(d, "t2.fa"), "w") as f:
        f.write(">t2\n")
        for i in range(0, len(g2), 70):
            f.write(g2[i : i + 70] + "\n")
    with open(os.path.join(d, "t3.fq"), "w") as f:
        f.write("@t3r1\n" + g3[:400] + "\n+\n" + "I" * 400 + "\n")
        f.write("@t3r2\n" + g3[400:] + "\n+\n" + "I" * 100 + "\n")
    with open(os.path.join(d, "targets.txt"), "w") as f:
        for name in ("t1.fa", "t2.fa", "t3.fq"):
            lbl = {"t1.fa": 1001, "t2.fa": 1002, "t3.fq": 1003}[name]
            f.write(f"{os.path.join(d, name)} {lbl}\n")
    rng2 = np.random.default_rng(777)

    def rs2(n):
        return "".join(rng2.choice(list("ACGT"), n))

    block = rs2(60)
    g = rs2(100) + block + rs2(50) + block + rs2(40) + block + rs2(30)
    with open(os.path.join(d, "rep.fa"), "w") as f:
        f.write(">rep\n")
        for i in range(0, len(g), 70):
            f.write(g[i : i + 70] + "\n")
    with open(os.path.join(d, "targets_rep.txt"), "w") as f:
        f.write(f"{os.path.join(d, 'rep.fa')} 2001\n")
        f.write(f"{os.path.join(d, 't2.fa')} 2002\n")
    with open(os.path.join(d, "dummy.fa"), "w") as f:
        f.write(">d\nACGTACGTACGT\n")


def run_case(exe, d, outdir, extra):
    dbdir = os.path.join(WORK, outdir)
    shutil.rmtree(dbdir, ignore_errors=True)
    os.makedirs(dbdir)
    subprocess.run(
        [exe, "-T", extra.pop("targets", os.path.join(d, "targets.txt")),
         "-D", dbdir + "/", "-O", os.path.join(d, "dummy.fa"), "-R",
         os.path.join(WORK, "out")] + extra.get("args", []),
        check=False, capture_output=True,
    )
    dst = os.path.join(GOLD, outdir)
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(dbdir, dst)
    print(outdir, "->", sorted(os.listdir(dst)))


def main():
    os.makedirs(GOLD, exist_ok=True)
    shutil.rmtree(WORK, ignore_errors=True)
    full = stage(light=False)
    light = stage(light=True)
    d = os.path.join(WORK, "inputs")
    os.makedirs(d)
    write_inputs(d)
    # record the inputs so the test can rebuild with our builder
    dst_in = os.path.join(GOLD, "inputs")
    shutil.rmtree(dst_in, ignore_errors=True)
    shutil.copytree(d, dst_in)
    run_case(full, d, "full_k9", {"args": ["-k", "9"]})
    run_case(light, d, "light_k27", {})
    run_case(full, d, "tsk_k9", {"args": ["-k", "9", "--tsk"]})
    run_case(full, d, "mint2_k9", {
        "targets": os.path.join(d, "targets_rep.txt"),
        "args": ["-k", "9", "-t", "2"],
    })


if __name__ == "__main__":
    sys.exit(main())
