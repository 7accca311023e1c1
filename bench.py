"""Benchmark: end-to-end classification throughput (reads/sec/chip).

Workload = BASELINE.md config 1 scaled up: toy bacterial DB (3 synthetic
genomes), k=27 light-style profile, simulated 150 bp reads.  Measures the
steady-state wall-clock of the full pipeline (parse -> canonicalize ->
device lookup/score -> CSV rows) after a warmup pass, on whatever device JAX
provides (TPU under the driver; CPU locally with JAX_PLATFORMS=cpu).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is vs. the
first recorded value of this same bench (BENCH_BASELINE.json, committed once
measured); 1.0 until then.
"""

import json
import os
import sys
import time

import numpy as np


def make_workload(tmpdir, n_reads=20000, read_len=150, genome_len=None, seed=0):
    from jn_cuclark_tpu import params
    from jn_cuclark_tpu.db import builder
    from jn_cuclark_tpu.io import dbformat
    from jn_cuclark_tpu.io.targets import parse_targets

    rng = np.random.default_rng(seed)
    light = os.environ.get("BENCH_PROFILE", "full") == "light"
    prof = params.LIGHT if light else params.FULL
    if genome_len is None:
        genome_len = int(os.environ.get("BENCH_GENOME_LEN", "2000000"))
    k = prof.default_k
    genomes = []
    with open(os.path.join(tmpdir, "targets.txt"), "w") as tf:
        for i in range(3):
            seq = "".join(rng.choice(list("ACGT"), size=genome_len))
            genomes.append(seq)
            p = os.path.join(tmpdir, f"g{i}.fa")
            if not os.path.exists(p):
                with open(p, "w") as f:
                    f.write(f">g{i}\n")
                    for j in range(0, len(seq), 70):
                        f.write(seq[j : j + 70] + "\n")
            tf.write(f"{p} {1000 + i}\n")
    targets = parse_targets(os.path.join(tmpdir, "targets.txt"))
    stem = os.path.join(
        tmpdir, prof.db_stem(k, targets.n_targets, 0, prof.default_gap)
    )
    if not dbformat.db_exists(stem):
        builder.build_database(targets, tmpdir, prof, k)

    reads = []
    for i in range(n_reads):
        g = genomes[i % 3]
        pos = rng.integers(0, len(g) - read_len)
        reads.append((f"r{i}", g[pos : pos + read_len]))
    fa = "".join(f">{n}\n{s}\n" for n, s in reads).encode()
    return prof, k, targets, fa


def main():
    import jn_cuclark_tpu  # noqa: F401
    from jn_cuclark_tpu.engine import BatchPlan, Classifier

    n_reads = int(os.environ.get("BENCH_READS", "300000"))
    # persistent workload cache: the host-side DB build is slow on throttled
    # build machines and identical across runs (fixed seed)
    genome_len = int(os.environ.get("BENCH_GENOME_LEN", "2000000"))
    profname = os.environ.get("BENCH_PROFILE", "full")
    td = os.environ.get(
        "BENCH_CACHE_DIR",
        os.path.expanduser(
            f"~/.cache/jn_cuclark_tpu/bench_{profname}_{genome_len}_{n_reads}"
        ),
    )
    os.makedirs(td, exist_ok=True)
    prof, k, targets, fa = make_workload(td, n_reads=n_reads)
    clf = Classifier.load(
        td, targets, prof, k,
        plan=BatchPlan(
            max_queries=1 << 23, max_reads=1 << 16, window_budget=1 << 23
        ),
    )
    # warmup (compile)
    for _ in clf.classify_bytes(fa[: len(fa) // 4])[0]:
        pass
    best = 0.0
    for _ in range(3):  # best-of-3: the remote TPU runtime is noisy
        t0 = time.time()
        n = 0
        for chunk in clf.classify_bytes(fa)[0]:
            n += chunk.count(b"\n")
        dt = time.time() - t0
        best = max(best, n / dt)
    reads_per_sec = best

    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    vs = 1.0
    if os.path.exists(base_path):
        base = json.load(open(base_path))
        if base.get("value"):
            vs = reads_per_sec / base["value"]
    print(
        json.dumps(
            {
                "metric": "classification_reads_per_sec_per_chip",
                "value": round(reads_per_sec, 2),
                "unit": "reads/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
