"""Generate golden CLASSIFICATION CSVs by running the REFERENCE's own engine
on CPU.

The reference's CUDA DB manager/kernels are replaced with a faithful CPU
implementation of queryKernel/queryElement/resultKernel semantics
(CuClarkDB.cu:999-1411); everything else — flag parsing, read scanning,
container packing, batch scheduling, Gamma/Confidence math and fprintf CSV
output — is the reference's own code (compiled at HTSIZE=65521 so fixtures
stay small; the math is HTSIZE-generic).

Run once after make_db_goldens.py:

    python tests/tools/make_csv_goldens.py

Covers FASTA, FASTQ, --extended, and paired (-P) runs against the full_k9
golden DB; reads include revcomps, injected Ns, lengths below/at/above k.
Outputs land in tests/golden/csv/.
"""

import os
import shutil
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD_DB = os.path.join(HERE, "..", "golden", "db")
GOLD = os.path.join(HERE, "..", "golden", "csv")
REF = "/root/reference/src"
WORK = "/tmp/refquery_goldens"

SOURCES = [
    "main.cc", "CuCLARK_hh.hh", "hashTable_hh.hh", "HashTableStorage_hh.hh",
    "dataType.hh", "file.cc", "file.hh", "kmersConversion.cc",
    "kmersConversion.hh", "analyser.cc", "analyser.hh",
]

STUB = r'''
#ifndef CUCLARKDB_CUH
#define CUCLARKDB_CUH
#include <cstdlib>
#include <cstdio>
#include <cstring>
#include <vector>
#include <fstream>
#include "./dataType.hh"
#include "./parameters.hh"

template <typename HKMERr>
class CuClarkDB
{
  size_t m_k, m_numBatches, m_numTargets;
  std::vector<uint32_t> m_bucketPtr;
  std::vector<HKMERr>   m_keys;
  std::vector<ILBL>     m_labels;
  int m_cyclesToDo = 1;
  std::vector<uint32_t*>  m_readsPointer;
  std::vector<CONTAINER*> m_readsInContainers;
  std::vector<size_t>     m_numReads;
  std::vector<ITYPE>      m_indexBatches;
  RESULTS* m_fullResults = nullptr;
  RESULTS* m_finalResults = nullptr;
  size_t m_resultRowSize = 0, m_finalRowSize = 0;

 public:
  CuClarkDB() {}
  CuClarkDB(const size_t, const uint8_t k, const size_t numBatches,
            const size_t numTargets, bool = false)
      : m_k(k), m_numBatches(numBatches), m_numTargets(numTargets) {}
  ~CuClarkDB() {}
  void freeBatchMemory() {
    for (auto p : m_readsPointer) free(p);
    for (auto p : m_readsInContainers) free(p);
    m_readsPointer.clear();
    m_readsInContainers.clear();
  }
  bool read(const char* fname, size_t& fileSize, size_t& dbParts,
            const ITYPE& = 1) {
    std::string stem(fname);
    std::ifstream fs(stem + ".sz", std::ios::binary);
    std::ifstream fk(stem + ".ky", std::ios::binary);
    std::ifstream fl(stem + ".lb", std::ios::binary);
    if (!fs.is_open() || !fk.is_open() || !fl.is_open()) return false;
    std::vector<uint8_t> sizes(HTSIZE);
    fs.read((char*)sizes.data(), HTSIZE);
    m_bucketPtr.resize(HTSIZE + 1);
    m_bucketPtr[0] = 0;
    uint64_t total = 0;
    for (size_t i = 0; i < HTSIZE; i++) { total += sizes[i]; m_bucketPtr[i+1] = total; }
    m_keys.resize(total);
    m_labels.resize(total);
    fk.read((char*)m_keys.data(), total * sizeof(HKMERr));
    fl.read((char*)m_labels.data(), total * sizeof(ILBL));
    fileSize = HTSIZE + total * (sizeof(HKMERr) + sizeof(ILBL));
    dbParts = 1;
    m_cyclesToDo = 1;
    return true;
  }
  size_t malloc(size_t numReads, size_t maxReads, size_t maxCont,
                std::vector<ITYPE>& indexBatches, RESULTS*& fullResults,
                size_t resultRowSize, RESULTS*& finalResults,
                size_t finalRowSize, bool, std::vector<uint32_t*>& readsPointer,
                std::vector<CONTAINER*>& readsInCon) {
    m_indexBatches = indexBatches;
    m_resultRowSize = resultRowSize;
    m_finalRowSize = finalRowSize;
    m_readsPointer.resize(m_numBatches);
    m_readsInContainers.resize(m_numBatches);
    m_numReads.assign(m_numBatches, 0);
    for (size_t i = 0; i < m_numBatches; i++) {
      m_readsPointer[i] = (uint32_t*)calloc(maxReads + 1, sizeof(uint32_t));
      m_readsInContainers[i] = (CONTAINER*)calloc(maxCont, sizeof(CONTAINER));
    }
    readsPointer = m_readsPointer;
    readsInCon = m_readsInContainers;
    fullResults = (RESULTS*)calloc(resultRowSize * numReads, sizeof(RESULTS));
    finalResults = (RESULTS*)calloc(finalRowSize * numReads, sizeof(RESULTS));
    m_fullResults = fullResults;
    m_finalResults = finalResults;
    return 0;
  }
  bool sync() { return true; }
  bool waitForBatch(size_t) { return true; }
  bool checkBatch(size_t) { return true; }
  bool swapDbParts() {
    if (m_cyclesToDo == 0) { m_cyclesToDo = 1; return false; }
    m_cyclesToDo--;
    return true;
  }
  bool readyBatch(const size_t b, const size_t numReads, const size_t) {
    m_numReads[b] = numReads;
    return true;
  }
  bool queryBatch(const size_t b, const bool, const bool = false) {
    const size_t nucsPerCon = sizeof(CONTAINER) * 4;
    const uint64_t mask = (uint64_t)-1 >> (64 - 2 * m_k);
    std::vector<uint32_t> hits(m_numTargets);
    for (size_t r = 0; r < m_numReads[b]; r++) {
      std::fill(hits.begin(), hits.end(), 0);
      uint32_t p = m_readsPointer[b][r];
      uint32_t end = m_readsPointer[b][r + 1];
      while (p < end) {
        CONTAINER partLen = m_readsInContainers[b][p];
        uint32_t first = ++p;
        p += (partLen - 1) / nucsPerCon + 1;
        for (int64_t i = 0; i + (int64_t)m_k <= (int64_t)partLen; i++) {
          uint64_t kmer = 0;
          for (size_t j = 0; j < m_k; j++) {
            size_t pos = i + j;
            CONTAINER c = m_readsInContainers[b][first + pos / nucsPerCon];
            int code = (c >> (2 * (nucsPerCon - 1 - pos % nucsPerCon))) & 3;
            kmer = (kmer << 2) | (uint64_t)code;
          }
          kmer &= mask;
          ILBL target;
          if (queryElement(kmer, target)) hits[target]++;
        }
      }
      RESULTS* row = m_fullResults +
                     (size_t)(m_indexBatches[b] + r) * m_resultRowSize;
      size_t cnt = 0;
      for (size_t t = 0; t < m_numTargets; t++) {
        if (hits[t]) {
          if (2 * cnt + 2 < m_resultRowSize) {
            row[2 * cnt + 1] = t;
            row[2 * cnt + 2] = (RESULTS)hits[t];
          } else {
            fprintf(stderr, "Too many targets hit\n");
          }
          cnt++;
        }
      }
      row[0] = cnt;
      RESULTS best = 0, sbest = 0, ib = 0, isb = 0, sum = 0;
      for (size_t i = 0; i < cnt; i++) {
        RESULTS sc = row[2 * i + 2];
        if (sc > best) { sbest = best; isb = ib; best = sc; ib = row[2*i+1] + 1; }
        else if (sc > sbest) { sbest = sc; isb = row[2*i+1] + 1; }
        sum += sc;
      }
      RESULTS* fin = m_finalResults +
                     (size_t)(m_indexBatches[b] + r) * m_finalRowSize;
      fin[0] = sum; fin[1] = ib; fin[2] = best; fin[3] = isb; fin[4] = sbest;
    }
    return m_cyclesToDo == 0;
  }
  bool queryElement(uint64_t kmer, ILBL& label) {
    uint64_t r = kmer;
    r = ((r >> 2) & 0x3333333333333333UL) | ((r & 0x3333333333333333UL) << 2);
    r = ((r >> 4) & 0x0F0F0F0F0F0F0F0FUL) | ((r & 0x0F0F0F0F0F0F0F0FUL) << 4);
    r = ((r >> 8) & 0x00FF00FF00FF00FFUL) | ((r & 0x00FF00FF00FF00FFUL) << 8);
    r = ((r >> 16) & 0x0000FFFF0000FFFFUL) | ((r & 0x0000FFFF0000FFFFUL) << 16);
    r = (r >> 32) | (r << 32);
    r = (((uint64_t)-1) - r) >> (64 - (m_k << 1));
    uint64_t c = kmer < r ? kmer : r;
    uint64_t q = c / HTSIZE;
    uint64_t rem = c - q * HTSIZE;
    for (uint32_t i = m_bucketPtr[rem]; i < m_bucketPtr[rem + 1]; i++) {
      if (m_keys[i] == (HKMERr)q) { label = m_labels[i]; return true; }
      if (m_keys[i] > (HKMERr)q) return false;
    }
    return false;
  }
  bool getFinalResult(const size_t, RESULTS*) { return true; }
};
#endif
'''


def main():
    os.makedirs(GOLD, exist_ok=True)
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    for s in SOURCES:
        shutil.copy(os.path.join(REF, s), WORK)
    text = open(os.path.join(REF, "parameters.hh")).read()
    text = text.replace("#define HTSIZE  \t1610612741", "#define HTSIZE  \t65521")
    with open(os.path.join(WORK, "parameters.hh"), "w") as f:
        f.write(text)
    with open(os.path.join(WORK, "CuClarkDB.cuh"), "w") as f:
        f.write(STUB)
    exe = os.path.join(WORK, "cuclark_cpu")
    subprocess.run(
        ["g++", "-O2", "-fopenmp", "-o", exe, "main.cc", "file.cc",
         "kmersConversion.cc", "analyser.cc"],
        cwd=WORK, check=True, capture_output=True,
    )

    inputs = os.path.join(GOLD_DB, "inputs")
    targets = os.path.join(WORK, "targets.txt")
    with open(os.path.join(inputs, "targets.txt")) as f, open(targets, "w") as g:
        for line in f:
            path, lbl = line.split()
            g.write(f"{os.path.join(inputs, os.path.basename(path))} {lbl}\n")
    dbdir = os.path.join(WORK, "db")
    os.makedirs(dbdir)
    for fn in os.listdir(os.path.join(GOLD_DB, "full_k9")):
        shutil.copy(os.path.join(GOLD_DB, "full_k9", fn), dbdir)

    write_reads(WORK, inputs)
    cases = [
        ("fa", ["-O", "reads.fa"]),
        ("fq", ["-O", "reads.fq"]),
        ("ext", ["-O", "reads.fa", "--extended"]),
        ("paired", ["-P", "p1.fq", "p2.fq"]),
    ]
    for name, args in cases:
        subprocess.run(
            [exe, "-k", "9", "-T", targets, "-D", dbdir + "/"] + args
            + ["-R", os.path.join(WORK, name)],
            cwd=WORK, check=True, capture_output=True,
        )
        shutil.copy(os.path.join(WORK, name + ".csv"),
                    os.path.join(GOLD, name + ".csv"))
        print(name + ".csv written")
    for fn in ("reads.fa", "reads.fq", "p1.fq", "p2.fq"):
        shutil.copy(os.path.join(WORK, fn), os.path.join(GOLD, fn))


def write_reads(d, inputs):
    rng = np.random.default_rng(99)

    def load_fa(p):
        seqs, cur = [], []
        for line in open(p):
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line.strip())
        if cur:
            seqs.append("".join(cur))
        return seqs

    g1 = load_fa(os.path.join(inputs, "t1.fa"))[0].replace("N", "")
    g2 = load_fa(os.path.join(inputs, "t2.fa"))[0].upper()
    lines = open(os.path.join(inputs, "t3.fq")).read().splitlines()
    g3 = lines[1] + lines[5]
    genomes = [g1, g2, g3]
    comp = str.maketrans("ACGT", "TGCA")
    reads = []
    for i in range(200):
        g = genomes[i % 3]
        ln = int(rng.integers(8, 140))
        pos = int(rng.integers(0, max(len(g) - ln, 1)))
        s = g[pos : pos + ln]
        if i % 4 == 0:
            s = s.translate(comp)[::-1]
        if i % 9 == 0 and len(s) > 20:
            s = s[:10] + "N" + s[11:]
        reads.append((f"read_{i} extra info", s))
    reads.append(("tiny", "ACGTAC"))
    reads.append(("exactk1", "ACGTACGT"))  # len k-1 -> the -nan row
    with open(os.path.join(d, "reads.fa"), "w") as f:
        for n, s in reads:
            f.write(f">{n}\n{s}\n")
    with open(os.path.join(d, "reads.fq"), "w") as f:
        for n, s in reads:
            f.write(f"@{n}\n{s}\n+\n{'I' * len(s)}\n")
    rng2 = np.random.default_rng(123)
    with open(os.path.join(d, "p1.fq"), "w") as f, open(
        os.path.join(d, "p2.fq"), "w"
    ) as f2:
        # 70 bp mates: the reference's container-size estimate aborts on
        # 90+90 bp merged pairs (its own CuCLARK_hh.hh:1722 bug)
        for i in range(50):
            g = genomes[i % 3]
            a = g[int(rng2.integers(0, len(g) - 70)) :][:70]
            b = g[int(rng2.integers(0, len(g) - 70)) :][:70].translate(comp)[::-1]
            f.write(f"@pr{i}/1\n{a}\n+\n{'I' * 70}\n")
            f2.write(f"@pr{i}/2\n{b}\n+\n{'I' * 70}\n")


if __name__ == "__main__":
    sys.exit(main())
