"""Packed device pipeline must match the flat (binary-search) path exactly."""

import numpy as np
import pytest

from jn_cuclark_tpu import params
from jn_cuclark_tpu.db import builder
from jn_cuclark_tpu.engine import BatchPlan, Classifier
from jn_cuclark_tpu.io.targets import parse_targets

from . import oracle
from .test_builder import rand_seq, write_fasta

K = 9


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("pk")
    rng = np.random.default_rng(21)
    genomes = [rand_seq(rng, 700) for _ in range(3)]
    with open(tmp_path / "targets.txt", "w") as tf:
        for i, g in enumerate(genomes):
            p = tmp_path / f"g{i}.fa"
            write_fasta(p, [(f"g{i}", g)], width=60)
            tf.write(f"{p} {3000 + i}\n")
    prof = params.tiny(htsize=4093, k=K)
    targets = parse_targets(str(tmp_path / "targets.txt"))
    builder.build_database(targets, str(tmp_path), prof, K)
    # heterogeneous read lengths incl. N's, shorts, empties-ish
    reads = []
    for i in range(150):
        g = genomes[i % 3]
        ln = int(rng.integers(20, 300))
        pos = rng.integers(0, max(len(g) - ln, 1))
        s = g[pos : pos + ln]
        if i % 6 == 0 and len(s) > 40:
            s = s[:20] + "N" + s[21:]
        reads.append((f"r{i}", s))
    reads.append(("tiny", "ACG"))
    reads.append(("longish", rand_seq(rng, 1500)))
    fa = "".join(f">{n}\n{s}\n" for n, s in reads).encode()
    return tmp_path, prof, targets, fa


def test_packed_equals_flat(setup):
    tmp_path, prof, targets, fa = setup
    plan = BatchPlan(max_queries=1 << 15, max_reads=64, window_budget=1 << 14)
    flat = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, packed=False)
    packed = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, packed=True)
    rows_f = oracle.rows(flat.classify_bytes(fa)[0])
    rows_p = oracle.rows(packed.classify_bytes(fa)[0])
    assert rows_f == rows_p


def test_packed_extended_equals_flat(setup):
    tmp_path, prof, targets, fa = setup
    plan = BatchPlan(max_queries=1 << 15, max_reads=64, window_budget=1 << 14)
    flat = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, packed=False)
    packed = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, packed=True)
    rows_f = oracle.rows(flat.classify_bytes(fa, extended=True)[0])
    rows_p = oracle.rows(packed.classify_bytes(fa, extended=True)[0])
    assert rows_f == rows_p


def test_packed_mesh_equals_single(setup):
    tmp_path, prof, targets, fa = setup
    from jn_cuclark_tpu.parallel.mesh import make_mesh

    plan = BatchPlan(window_budget=1 << 14)
    single = Classifier.load(str(tmp_path), targets, prof, K, plan=plan)
    rows1 = oracle.rows(single.classify_bytes(fa)[0])
    for nd in (8, 3):
        for mode in ("dp", "db"):
            mesh = make_mesh(nd)
            sharded = Classifier.load(
                str(tmp_path), targets, prof, K, plan=plan, mesh=mesh,
                mesh_mode=mode,
            )
            assert rows1 == oracle.rows(sharded.classify_bytes(fa)[0]), (nd, mode)


def test_native_host_path_equals_python(setup):
    """C++ scan/pack/format must produce byte-identical CSV to the numpy path."""
    from jn_cuclark_tpu.utils import native

    if not native.available():
        pytest.skip("native library not built")
    tmp_path, prof, targets, fa = setup
    plan = BatchPlan(window_budget=1 << 14)
    py = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, use_native=False)
    nat = Classifier.load(str(tmp_path), targets, prof, K, plan=plan, use_native=True)
    assert b"".join(py.classify_bytes(fa)[0]) == b"".join(nat.classify_bytes(fa)[0])
    # extended mode too
    assert b"".join(py.classify_bytes(fa, extended=True)[0]) == b"".join(
        nat.classify_bytes(fa, extended=True)[0]
    )
    # fastq input
    import numpy as np
    rng = np.random.default_rng(0)
    fq = "".join(
        f"@q{i}\n{rand_seq(rng, 120)}\n+\n{'I'*120}\n" for i in range(50)
    ).encode()
    assert b"".join(py.classify_bytes(fq)[0]) == b"".join(nat.classify_bytes(fq)[0])


@pytest.mark.parametrize("use_native", [False, True])
def test_cycled_equals_single(setup, use_native):
    """Out-of-core DB cycling (table streamed in chunks) must match the
    resident-table path exactly."""
    if use_native:
        from jn_cuclark_tpu.utils import native
        if not native.available():
            pytest.skip("native library not built")
    tmp_path, prof, targets, fa = setup
    plan = BatchPlan(window_budget=1 << 14)
    single = Classifier.load(
        str(tmp_path), targets, prof, K, plan=plan, use_native=use_native
    )
    rows1 = oracle.rows(single.classify_bytes(fa)[0])
    for cycles in (2, 5):
        cyc = Classifier.load(
            str(tmp_path), targets, prof, K, plan=plan,
            use_native=use_native, db_cycles=cycles,
        )
        assert rows1 == oracle.rows(cyc.classify_bytes(fa)[0]), f"cycles={cycles}"
    # extended mode
    ext1 = oracle.rows(single.classify_bytes(fa, extended=True)[0])
    cyc = Classifier.load(
        str(tmp_path), targets, prof, K, plan=plan,
        use_native=use_native, db_cycles=3,
    )
    assert ext1 == oracle.rows(cyc.classify_bytes(fa, extended=True)[0])


@pytest.mark.parametrize("use_native", [False, True])
def test_cycled_labels_strategy_equals_counts(setup, use_native):
    """The O(windows) labels accumulation (out-of-core at RefSeq-scale
    target counts) is byte-identical to the dense-counts path and to the
    resident-table path, extended mode included."""
    if use_native:
        from jn_cuclark_tpu.utils import native
        if not native.available():
            pytest.skip("native library not built")
    tmp_path, prof, targets, fa = setup
    single = Classifier.load(
        str(tmp_path), targets, prof, K,
        plan=BatchPlan(window_budget=1 << 14), use_native=use_native,
    )
    rows1 = oracle.rows(single.classify_bytes(fa)[0])
    ext1 = oracle.rows(single.classify_bytes(fa, extended=True)[0])
    for strategy in ("labels", "counts"):
        cyc = Classifier.load(
            str(tmp_path), targets, prof, K,
            plan=BatchPlan(window_budget=1 << 14, cycle_strategy=strategy),
            use_native=use_native, db_cycles=3,
        )
        assert rows1 == oracle.rows(cyc.classify_bytes(fa)[0]), strategy
        assert ext1 == oracle.rows(
            cyc.classify_bytes(fa, extended=True)[0]
        ), strategy


@pytest.mark.parametrize("strategy", ["auto", "labels", "counts"])
def test_cycled_zero_read_input(setup, strategy):
    """Cycled classification of an input that scans to zero reads (lone
    FASTQ header) yields an empty body instead of crashing (review fix:
    the auto-strategy max() over an empty batch list)."""
    tmp_path, prof, targets, fa = setup
    cyc = Classifier.load(
        str(tmp_path), targets, prof, K,
        plan=BatchPlan(cycle_strategy=strategy), db_cycles=2,
    )
    gen, n = cyc.classify_bytes(b"@lone_header\n")
    assert b"".join(gen) == b"" and n == 0


@pytest.mark.parametrize("use_native", [False, True])
def test_cycled_multisample_equals_serial(setup, tmp_path, use_native):
    """Cycle-outer multi-sample scheduling (classify_files with db_cycles>1)
    must write each sample's CSV byte-equal to a serial per-file run."""
    from jn_cuclark_tpu.utils import native

    if use_native and not native.available():
        pytest.skip("native lib not built")
    tmp_path2, prof, targets, fa = setup
    import numpy as np

    rng = np.random.default_rng(9)
    from .test_builder import rand_seq

    items = []
    for s in range(3):
        p = tmp_path / f"s{s}.fa"
        with open(p, "w") as f:
            for i in range(40 + 10 * s):
                f.write(f">s{s}_r{i}\n{rand_seq(rng, int(rng.integers(20, 250)))}\n")
        items.append((str(p), None, str(tmp_path / f"res{s}")))
    plan = BatchPlan(max_reads=64, window_budget=1 << 13)
    clf = Classifier.load(
        str(tmp_path2), targets, prof, K, plan=plan,
        db_cycles=3, use_native=use_native,
    )
    stats = clf.classify_files(items, jobs=4)
    assert [s["reads"] for s in stats] == [40, 50, 60]
    serial = Classifier.load(
        str(tmp_path2), targets, prof, K, plan=plan,
        db_cycles=3, use_native=use_native,
    )
    for s, (o, _p, r) in enumerate(items):
        serial.classify_file(o, str(tmp_path / f"ref{s}"))
        assert (
            open(r + ".csv", "rb").read()
            == open(str(tmp_path / f"ref{s}") + ".csv", "rb").read()
        ), s


def test_cycle_outer_cap_fallback(setup, tmp_path, monkeypatch, capsys):
    """The CLARK_TPU_CYCLE_OUTER_MAX_BYTES cap: above it classify_files
    must fall back to serial slab streaming (same CSVs, message printed);
    below it the cycle-outer path runs and flags its stats as aggregate."""
    import numpy as np

    from .test_builder import rand_seq

    tmp_path2, prof, targets, fa = setup
    rng = np.random.default_rng(21)
    items = []
    for s in range(2):
        p = tmp_path / f"c{s}.fa"
        with open(p, "w") as f:
            for i in range(30):
                f.write(f">c{s}_r{i}\n{rand_seq(rng, 100)}\n")
        items.append((str(p), None, str(tmp_path / f"capres{s}")))
    plan = BatchPlan(max_reads=64, window_budget=1 << 13)
    clf = Classifier.load(
        str(tmp_path2), targets, prof, K, plan=plan, db_cycles=3
    )
    # under the cap: cycle-outer runs; stats are the shared batch wall
    monkeypatch.setenv("CLARK_TPU_CYCLE_OUTER_MAX_BYTES", str(1 << 30))
    st = clf.classify_files(items, jobs=4)
    assert all(s.get("aggregate") for s in st)
    assert len({s["seconds"] for s in st}) == 1  # shared wall, not prorated
    outs = [open(r + ".csv", "rb").read() for _, _, r in items]
    # over the cap: serial slab-streamed fallback, message, same bytes
    monkeypatch.setenv("CLARK_TPU_CYCLE_OUTER_MAX_BYTES", "10")
    items2 = [(o, p, r + "_f") for o, p, r in items]
    st2 = clf.classify_files(items2, jobs=4)
    assert not any(s.get("aggregate") for s in st2)
    assert "cycle-outer scheduling skipped" in capsys.readouterr().err
    for (o, _p, r), want in zip(items2, outs):
        assert open(r + ".csv", "rb").read() == want


def test_probe_cols_trim_engages(setup, tmp_path):
    """The engine must pass a trimmed probed-width for padded tiers (the
    1.42x device win of round 4) — byte-equality tests cannot catch a
    silent revert to full-width probing, so spy on batch_fn."""
    tmp_path2, prof, targets, fa = setup
    clf = Classifier.load(
        str(tmp_path2), targets, prof, K,
        plan=BatchPlan(max_reads=64, window_budget=1 << 13),
    )
    seen = []
    orig = clf.batch_fn

    def spy(words, vwords, extended=True, probe_cols=None):
        seen.append((words.shape[1], probe_cols))
        return orig(words, vwords, extended=extended, probe_cols=probe_cols)

    clf.batch_fn = spy
    # 100-char reads quantize to stride 128: full width 128-K+1, trimmed
    # width ladder(100-K+1) = 96 (K=9)
    reads = "".join(f">t{i}\n{'ACGT' * 25}\n" for i in range(20)).encode()
    list(clf.classify_bytes(reads)[0])
    assert seen, "batch_fn never called"
    for wshape, pc in seen:
        stride = (wshape - 1) * 32
        assert pc is not None and pc <= stride - K + 1
        assert pc == -(-(100 - K + 1) // 32) * 32  # ladder of true max len
