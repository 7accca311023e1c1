"""jn_cuclark_tpu — TPU-native metagenomic classifier (CLARK family).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ardaicoz/jn_cuclark (CuCLARK + kent/kent-mpi): discriminative canonical k-mer
database construction, FASTA/FASTQ read classification with gamma/confidence
scoring, taxonomy-aware abundance estimation, multi-sample merge/report, and
multi-host sharded-database classification over a JAX device mesh.

The classifier needs 64-bit integer k-mer keys on device, so x64 mode is
enabled at import.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent jit cache: TPU (re)compiles are expensive (~40s per batch shape
# through a remote-compile service); cache them across processes.
_cache_dir = _os.environ.get(
    "CLARK_TPU_JIT_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "jn_cuclark_tpu", "jit"),
)
if _cache_dir and _cache_dir != "0":
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from . import params  # noqa: E402,F401

__version__ = "0.1.0"
