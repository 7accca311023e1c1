"""Shared harness: stage + compile the REFERENCE's own build/classify engine
on CPU at an arbitrary HTSIZE.

Reuses make_csv_goldens.py's CPU stub (the reference's parsing, packing,
scheduling, scoring and fprintf output verbatim; the CUDA kernels replaced by
a faithful CPU queryBatch, cross-checked by tests/oracle.py).  Used by
make_u32_goldens.py (committed u32-key goldens at HTSIZE=16,777,259) and
test_real_profile_parity.py (live smoke at the real light profile's
HTSIZE=57,777,779, src/parameters_light_hh:39-40).
"""

import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/src"

sys.path.insert(0, HERE)
import make_csv_goldens as _mcg  # noqa: E402
import make_db_goldens as _mdg  # noqa: E402


def available() -> bool:
    return os.path.isdir(REF) and shutil.which("g++") is not None


def stage_engine(htsize: int, light: bool, workdir: str) -> str:
    """Compile the reference engine (build + CPU classify) at `htsize`.

    Returns the executable path; reuses an existing binary in `workdir`.
    Light mode is runtime-detected by the reference via HTSIZE == LHTSIZE
    (main.cc:214-222), so the light flavor patches both defines.
    """
    exe = os.path.join(workdir, "cuclark_cpu")
    if os.path.exists(exe):
        return exe
    os.makedirs(workdir, exist_ok=True)
    for s in _mdg.SOURCES:
        shutil.copy(os.path.join(REF, s), workdir)
    if light:
        text = open(os.path.join(REF, "parameters_light_hh")).read()
        text = text.replace(
            "#define LHTSIZE \t57777779", f"#define LHTSIZE \t{htsize}"
        )
        text = text.replace(
            "#define HTSIZE  \t57777779", f"#define HTSIZE  \t{htsize}"
        )
    else:
        text = open(os.path.join(REF, "parameters.hh")).read()
        text = text.replace(
            "#define HTSIZE  \t1610612741", f"#define HTSIZE  \t{htsize}"
        )
    with open(os.path.join(workdir, "parameters.hh"), "w") as f:
        f.write(text)
    with open(os.path.join(workdir, "CuClarkDB.cuh"), "w") as f:
        f.write(_mcg.STUB)
    subprocess.run(
        ["g++", "-O2", "-fopenmp", "-o", exe, "main.cc", "file.cc",
         "kmersConversion.cc", "analyser.cc"],
        cwd=workdir, check=True, capture_output=True,
    )
    return exe


def run_engine(exe, targets, dbdir, objects, results, k, extra=()):
    """One reference invocation: builds the DB on first use, classifies
    `objects` to `<results>.csv`."""
    subprocess.run(
        [exe, "-k", str(k), "-T", targets, "-D", dbdir.rstrip("/") + "/",
         "-O", objects, "-R", results, *extra],
        check=True, capture_output=True, cwd=os.path.dirname(exe),
    )
