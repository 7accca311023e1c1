"""jn_cuclark_tpu — TPU-native metagenomic classifier (CLARK family).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ardaicoz/jn_cuclark (CuCLARK + kent/kent-mpi): discriminative canonical k-mer
database construction, FASTA/FASTQ read classification with gamma/confidence
scoring, taxonomy-aware abundance estimation, multi-sample merge/report, and
multi-host sharded-database classification over a JAX device mesh.

The classifier needs 64-bit integer k-mer keys on device, so x64 mode is
enabled at import.
"""

import jax

jax.config.update("jax_enable_x64", True)

from . import params  # noqa: E402,F401

__version__ = "0.1.0"
