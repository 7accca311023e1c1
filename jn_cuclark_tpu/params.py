"""Database/classifier profiles.

The reference (CuCLARK) bakes these into two compile-time flavors selected by
swapping `parameters.hh` / `parameters_light_hh` (reference: src/parameters.hh:38-53,
src/parameters_light_hh:39-49, src/Makefile:30-34):

  * cuCLARK  (full):  HTSIZE=1610612741 (prime), k=31 default, no gap sampling
  * cuCLARK-l (light): HTSIZE=57777779, forced k=27, non-overlapping k-mer gap
    sampling (default gap 4), runtime-detected via HTSIZE == LHTSIZE
    (reference: src/main.cc:214-222)

Here the profile is a runtime value so the same framework covers both flavors
(plus arbitrary test-sized tables) without recompilation.
"""

from __future__ import annotations

import dataclasses

# Reference constants (src/parameters.hh / src/parameters_light_hh)
FULL_HTSIZE = 1610612741
LIGHT_HTSIZE = 57777779
NBN = 1  # nucleotides inserted between merged paired-end reads (parameters.hh:41)
SFACTORMAX = 30
MTRGTS = 65535  # labels are u16 (dataType.hh:46)
OBJECTNAMEMAX = 40  # max object-name length incl. NUL (parameters.hh:46)
MAXK = 32


@dataclasses.dataclass(frozen=True)
class Profile:
    """One CLARK database flavor.

    Attributes mirror the reference's compile-time parameter sets; `htsize`
    drives the quotient/remainder split used by the on-disk format, `light`
    selects non-overlapping gap-sampled k-mer extraction at DB build time.
    """

    name: str
    htsize: int
    light: bool
    default_k: int
    default_gap: int = 0  # light only; -g flag, default 4 (main.cc:217-218)
    maxhits: int = 15  # result-row capacity in the reference; informational here

    def key_dtype(self, k: int):
        """Key (quotient) width for the .ky file.

        Mirrors src/main.cc:251-286: with t_b = log4(HTSIZE), quotients fit in
        2 bytes for k <= t_b+8, 4 bytes for k <= t_b+16, else 8 bytes.
        """
        import numpy as np

        t_b = 0
        cap = 1
        while cap * 4 <= self.htsize:
            cap *= 4
            t_b += 1
        # log(HTSIZE)/log(4) truncated — matches C's size_t cast of the double.
        # (full: t_b=15, light: t_b=12)
        if k <= t_b + 8:
            return np.dtype(np.uint16)
        if k <= t_b + 16:
            return np.dtype(np.uint32)
        return np.dtype(np.uint64)

    def db_stem(self, k: int, n_targets: int, min_count_target: int, gap: int | None = None) -> str:
        """Central DB filename stem (reference: CuCLARK_hh.hh:580-592)."""
        if self.light:
            g = self.default_gap if gap is None else gap
            return (
                f"db_central_k{k}_t{n_targets}_s{self.htsize}"
                f"_m{min_count_target}_light_{g}.tsk"
            )
        return f"db_central_k{k}_t{n_targets}_s{self.htsize}_m{min_count_target}.tsk"


FULL = Profile(name="full", htsize=FULL_HTSIZE, light=False, default_k=31, maxhits=15)
LIGHT = Profile(
    name="light", htsize=LIGHT_HTSIZE, light=True, default_k=27, default_gap=4, maxhits=23
)


def tiny(htsize: int = 101, light: bool = False, k: int = 9, gap: int = 4) -> Profile:
    """Small profile for tests; identical math, toy table size."""
    return Profile(
        name=f"tiny{htsize}", htsize=htsize, light=light, default_k=k, default_gap=gap
    )
