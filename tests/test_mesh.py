"""Sharded-DB classification over a virtual 8-device mesh must produce
identical results to the single-device path."""

import numpy as np
import pytest

import jax

from jn_cuclark_tpu import params
from jn_cuclark_tpu.db import builder
from jn_cuclark_tpu.engine import BatchPlan, Classifier
from jn_cuclark_tpu.io.targets import parse_targets
from jn_cuclark_tpu.parallel.mesh import make_mesh

from . import oracle
from .test_builder import rand_seq, write_fasta

K = 9


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("meshdb")
    rng = np.random.default_rng(9)
    genomes = [rand_seq(rng, 600) for _ in range(4)]
    with open(tmp_path / "targets.txt", "w") as tf:
        for i, g in enumerate(genomes):
            p = tmp_path / f"g{i}.fa"
            write_fasta(p, [(f"g{i}", g)])
            tf.write(f"{p} {2000 + i}\n")
    prof = params.tiny(htsize=4093, k=K)
    targets = parse_targets(str(tmp_path / "targets.txt"))
    builder.build_database(targets, str(tmp_path), prof, K)
    reads = []
    for i in range(200):
        g = genomes[i % 4]
        pos = rng.integers(0, len(g) - 80)
        reads.append((f"r{i}", g[pos : pos + 80]))
    fa = "".join(f">{n}\n{s}\n" for n, s in reads).encode()
    return tmp_path, prof, targets, fa


def test_mesh_matches_single(db):
    tmp_path, prof, targets, fa = db
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    plan = BatchPlan(max_queries=1 << 14, max_reads=256)
    single = Classifier.load(str(tmp_path), targets, prof, K, plan=plan)
    rows1 = oracle.rows(single.classify_bytes(fa)[0])

    mesh = make_mesh()
    sharded = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, mesh=mesh)
    rows8 = oracle.rows(sharded.classify_bytes(fa)[0])
    assert rows1 == rows8


def test_mesh_subset_devices(db):
    tmp_path, prof, targets, fa = db
    plan = BatchPlan(max_queries=1 << 14, max_reads=256)
    single = Classifier.load(str(tmp_path), targets, prof, K, plan=plan)
    rows1 = oracle.rows(single.classify_bytes(fa)[0])
    mesh = make_mesh(n_devices=3)
    sharded = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, mesh=mesh)
    assert rows1 == oracle.rows(sharded.classify_bytes(fa)[0])


def test_dp_mode_matches_single(db):
    """Read-sharded (data-parallel) mesh mode must match single-device."""
    tmp_path, prof, targets, fa = db
    plan = BatchPlan(window_budget=1 << 14)
    single = Classifier.load(str(tmp_path), targets, prof, K, plan=plan)
    rows1 = oracle.rows(single.classify_bytes(fa)[0])
    for nd in (8, 3):
        mesh = make_mesh(nd)
        dp = Classifier.load(
            str(tmp_path), targets, prof, K, plan=plan, mesh=mesh, mesh_mode="dp"
        )
        assert rows1 == oracle.rows(dp.classify_bytes(fa)[0]), f"ndev={nd}"
    # extended mode through dp
    ext1 = oracle.rows(single.classify_bytes(fa, extended=True)[0])
    dp = Classifier.load(
        str(tmp_path), targets, prof, K, plan=plan, mesh=make_mesh(4), mesh_mode="dp"
    )
    assert ext1 == oracle.rows(dp.classify_bytes(fa, extended=True)[0])


def test_db_sharded_matches_single(db):
    """DB-sharded mesh mode (the multi-process-capable path): byte-equal CSV
    incl. extended counts, on 8 and 3 devices."""
    tmp_path, prof, targets, fa = db
    plan = BatchPlan(window_budget=1 << 14)
    single = Classifier.load(str(tmp_path), targets, prof, K, plan=plan)
    rows1 = oracle.rows(single.classify_bytes(fa)[0])
    ext1 = oracle.rows(single.classify_bytes(fa, extended=True)[0])
    for nd in (8, 3):
        sh = Classifier.load(
            str(tmp_path), targets, prof, K, plan=plan,
            mesh=make_mesh(nd), mesh_mode="db",
        )
        assert rows1 == oracle.rows(sh.classify_bytes(fa)[0]), f"ndev={nd}"
        assert ext1 == oracle.rows(sh.classify_bytes(fa, extended=True)[0])


def test_db_sharded_with_cycles(db):
    """Out-of-core cycling composed with the sharded mesh (HBM holds
    1/(P*cycles) of the table per step) must still be byte-identical."""
    tmp_path, prof, targets, fa = db
    plan = BatchPlan(window_budget=1 << 14)
    single = Classifier.load(str(tmp_path), targets, prof, K, plan=plan)
    rows1 = oracle.rows(single.classify_bytes(fa)[0])
    sh = Classifier.load(
        str(tmp_path), targets, prof, K, plan=plan,
        mesh=make_mesh(4), mesh_mode="db", db_cycles=3,
    )
    assert rows1 == oracle.rows(sh.classify_bytes(fa)[0])
    ext1 = oracle.rows(single.classify_bytes(fa, extended=True)[0])
    assert ext1 == oracle.rows(sh.classify_bytes(fa, extended=True)[0])
