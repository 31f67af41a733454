"""Shared helpers for ops over the driver testdata tables."""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import pandas as pd

import ray.data as rd


def read_table(sf_dir: str, name: str, columns: Optional[List[str]] = None) -> rd.Dataset:
    """Read one testdata table with column pruning at the read."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def merge_partials(
    partials: rd.Dataset,
    keys: List[str],
    agg: Dict[str, str],
) -> pd.DataFrame:
    """Final merge for bounded-cardinality partial aggregates.

    ``partials`` holds one row per (key, batch); its size is
    O(n_batches × n_keys), tiny by construction.  Ray's sort-based
    ``groupby().aggregate()`` pays a fixed multi-second all-to-all even on
    thousands of rows, so for small key spaces the cheaper plan is
    coalesce-to-one-block (``repartition(1)`` — a move, not a shuffle) and
    one pandas merge task.  Use the real hash shuffle only when the KEY
    cardinality itself is unbounded (e.g. per-document keys).
    """
    merged = (
        partials.repartition(1)
        .map_batches(
            lambda df: df.groupby(keys, as_index=False).agg(agg),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    return merged.sort_values(keys).reset_index(drop=True)
