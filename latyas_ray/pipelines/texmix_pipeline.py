"""TexMix composite OCR as a Ray Data actor-pool stage.

The composite (:mod:`latyas_ray.models.texmix`) is stateful — two channel
models — so the stage is a callable CLASS: models are built once per
actor in ``__init__`` (where real TexTeller/Paddle weights would load),
batches of doc_ids are recognized in ``__call__``.  Scale shape:
map-only, no shuffle, O(1) driver state; autoscaling ``(1, N)`` pool so
small test clusters can't deadlock on a fixed pool (round-1 finding).
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from ..models.texmix import TexMixModel, synth_mixed_page
from ..ops.common import read_table


class TexMixStage:
    def __init__(self) -> None:
        self.model = TexMixModel()  # per-actor warm state

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].astype("int64")
        texts = [self.model.recognize(synth_mixed_page(int(d))) for d in ids]
        return pd.DataFrame({"doc_id": ids.to_numpy(), "mixed_text": texts})


def texmix_recognize(sf_dir: str, concurrency=None) -> rd.Dataset:
    """(doc_id, mixed_text) for one synthetic mixed text+equation page
    per document.  Pool scales with the cluster by default (map-only,
    per-document work — same sizing rationale as semantic reflow)."""
    from ..ops.common import cluster_pool_width

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    return ds.map_batches(
        TexMixStage,
        batch_format="pandas",
        batch_size=64,
        concurrency=concurrency or (1, cluster_pool_width()),
    )


def texmix_serial_rows(sf_dir: str):
    """Serial unit for the oracle snapshot: same per-doc computation, one
    process, sorted by doc_id."""
    import pyarrow.parquet as pq
    import os

    model = TexMixModel()
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    out = []
    for d in sorted(t.column("doc_id").to_pylist()):
        out.append((int(d), model.recognize(synth_mixed_page(int(d)))))
    return out


# ------------------------------------------------- markdown assembly variant


class TexMixMarkdownStage:
    """Same composite, assembled through the mix_inference markdown walk
    (``TexMixModel.recognize_markdown`` — tag re-attachment + inline
    bold-strip, ``functions/mix_assembly``)."""

    def __init__(self) -> None:
        self.model = TexMixModel()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].astype("int64")
        mds = [
            self.model.recognize_markdown(synth_mixed_page(int(d)))
            for d in ids
        ]
        return pd.DataFrame({"doc_id": ids.to_numpy(), "markdown": mds})


def texmix_markdown(sf_dir: str, concurrency=None) -> rd.Dataset:
    """(doc_id, markdown) — the mix_inference markdown rendering of each
    synthetic mixed page.  Same pool shape as ``texmix_recognize``."""
    from ..ops.common import cluster_pool_width

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    return ds.map_batches(
        TexMixMarkdownStage,
        batch_format="pandas",
        batch_size=64,
        concurrency=concurrency or (1, cluster_pool_width()),
    )


def texmix_markdown_serial_rows(sf_dir: str):
    """Serial unit for the markdown oracle snapshot."""
    import os

    import pyarrow.parquet as pq

    model = TexMixModel()
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    return [
        (int(d), model.recognize_markdown(synth_mixed_page(int(d))))
        for d in sorted(t.column("doc_id").to_pylist())
    ]
