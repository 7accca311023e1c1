"""Targets-definition parsing (the `-T targets.txt` input).

Reference: CuCLARK_hh.hh:1790-1901 (getTargetsData).  Each line:

    <sequence file> <label> [<centromere label>]

fields split on space/tab/comma.  Unique labels keep file order; the combined
label index space is labels (0..A-1) then centromere labels (A..A+C-1)
(HashTableStorage_hh.hh:211-226), and the printable target-name list prepends
"NA" at index 0 (CuCLARK_hh.hh:1874-1878).
"""

from __future__ import annotations

import dataclasses
import re

_SPLIT = re.compile(r"[ \t,\r\n]+")


@dataclasses.dataclass
class TargetsDef:
    files: list[str]  # per input line
    file_labels: list[str]  # label of each input line
    file_labels_c: list[str | None]  # optional 3rd column of each line
    labels: list[str]  # unique, order of appearance
    labels_c: list[str]  # unique, order of appearance

    @property
    def label_index(self) -> dict[str, int]:
        out = {lbl: i for i, lbl in enumerate(self.labels)}
        for j, lbl in enumerate(self.labels_c):
            out.setdefault(lbl, len(self.labels) + j)
        return out

    @property
    def target_names(self) -> list[str]:
        """Index -> printable name, with 'NA' at 0; stored labels are offset
        by +1 in results (CuClarkDB.cu:1390)."""
        return ["NA"] + self.labels + self.labels_c

    @property
    def n_targets(self) -> int:
        return len(self.labels) + len(self.labels_c)


def parse_targets(path: str) -> TargetsDef:
    files: list[str] = []
    file_labels: list[str] = []
    file_labels_c: list[str | None] = []
    labels: list[str] = []
    labels_c: list[str] = []
    seen: set[str] = set()
    seen_c: set[str] = set()
    with open(path) as f:
        for line in f:
            ele = [e for e in _SPLIT.split(line) if e][:3]
            if not ele:
                continue
            if len(ele) < 2:
                raise ValueError(f"missing label for {ele[0]}")
            files.append(ele[0])
            file_labels.append(ele[1])
            if ele[1] not in seen:
                seen.add(ele[1])
                labels.append(ele[1])
            if len(ele) > 2:
                file_labels_c.append(ele[2])
                if ele[2] not in seen_c:
                    seen_c.add(ele[2])
                    labels_c.append(ele[2])
            else:
                file_labels_c.append(None)
    return TargetsDef(
        files=files,
        file_labels=file_labels,
        file_labels_c=file_labels_c,
        labels=labels,
        labels_c=labels_c,
    )
