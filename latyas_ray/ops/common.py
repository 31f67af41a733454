"""Shared helpers for ops over the driver testdata tables."""

from __future__ import annotations

import os
from typing import List, Optional

import ray.data as rd


def read_table(sf_dir: str, name: str, columns: Optional[List[str]] = None) -> rd.Dataset:
    """Read one testdata table with column pruning at the read."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
