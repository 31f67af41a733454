"""Per-partition lineage records — the checkpoint/resume substrate.

Ray Data has no built-in job checkpointing, so resumability is designed in
(SURVEY.md §4.2): the unit of work is a **partition = a deterministic group
of input shard files**; each partition's output is written to its own
directory via temp-dir + atomic rename, and a lineage sidecar
(``_lineage/part-{pid}.json``) records input files, row count, extractor
version and an order-independent output checksum.  A rerun reads the
lineage dir, skips completed partitions, and reprocesses only the rest —
the generalization of the reference's skip-if-output-exists resume
(``auto_labelme.py:30-31``), with integrity recorded per the north star
("input block id, row counts, extractor version, checksum").

At 10^12 rows the corpus is millions of shard files; this layout needs no
coordinator and no global state — any worker (or a fresh driver after
preemption) can decide what is left from the filesystem alone.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass
from typing import Dict, List, Optional


@dataclass
class LineageRecord:
    pid: int
    input_files: List[str]
    n_rows: int
    checksum_xor: str  # xor of per-row sha256 (first 8 bytes), hex
    extractor_version: str
    completed: bool = True
    # pipeline preset the partition was extracted under ("" = default
    # registry).  Part of the resume identity: a resumed run with a
    # DIFFERENT preset must reprocess, or the out_dir silently mixes
    # outputs from two rule tables.
    preset: str = ""


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def partition_input_files(files: List[str], n_partitions: int) -> List[List[str]]:
    """Deterministically group sorted input files into contiguous
    partitions (the partitioning key of the whole job — SURVEY.md §7.3)."""
    files = sorted(files)
    n_partitions = max(1, min(n_partitions, len(files)))
    per = -(-len(files) // n_partitions)
    return [files[i: i + per] for i in range(0, len(files), per)]


def write_lineage(out_dir: str, rec: LineageRecord) -> str:
    d = lineage_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"part-{rec.pid:05d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(rec), f, sort_keys=True)
    os.replace(tmp, path)
    return path


def read_lineage(out_dir: str, pid: int) -> Optional[LineageRecord]:
    path = os.path.join(lineage_dir(out_dir), f"part-{pid:05d}.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return LineageRecord(**json.load(f))
    except Exception:
        return None  # torn/invalid record → partition is redone


def completed_partitions(out_dir: str, extractor_version: str,
                         preset: str = "") -> Dict[int, LineageRecord]:
    """Partitions safe to skip: lineage exists, matches the current
    extractor version AND preset, and the output directory is present."""
    done: Dict[int, LineageRecord] = {}
    d = lineage_dir(out_dir)
    if not os.path.isdir(d):
        return done
    for name in os.listdir(d):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            pid = int(name[5:-5])
        except ValueError:
            continue
        rec = read_lineage(out_dir, pid)
        if (
            rec
            and rec.completed
            and rec.extractor_version == extractor_version
            and rec.preset == preset
            and os.path.isdir(os.path.join(out_dir, f"part-{pid:05d}"))
        ):
            done[pid] = rec
    return done
