"""Distributed TATR table-structure assembly as a Ray Data stage.

Per-document synthetic detection fixtures (weights can't load in this
sandbox — see :mod:`latyas_ray.functions.tsr_fixtures`) stand in for the
structure-model head; the assembly itself
(:mod:`latyas_ray.functions.tsr_assemble`, the re-expression of reference
``tsr/models/tatr/pipeline.py:299-536`` / ``postprocess.py``) is the real
kernel under test.  Scale shape: map-only — each batch of doc_ids
generates + assembles its own pages and emits cell rows; no shuffle, no
driver state, output size O(cells).
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from ..functions.tsr import cells_to_csv, cells_to_html
from ..functions.tsr_assemble import assemble_tables
from ..functions.tsr_fixtures import synth_detection_fixture
from ..ops.common import read_table


def cell_rows_for_doc(doc_id: int) -> list:
    """Serial per-doc unit: fixture → assembly → ordered cell rows.
    Shared by the distributed stage and the serial oracle so the driver's
    hash compare is exactly "distributed ≡ serial"."""
    objects, tokens, _ = synth_detection_fixture(int(doc_id))
    rows = []
    for t_idx, (cells, conf) in enumerate(assemble_tables(objects, tokens)):
        ordered = sorted(
            cells, key=lambda c: (min(c["row_nums"]), min(c["column_nums"]))
        )
        for c_idx, c in enumerate(ordered):
            rows.append({
                "doc_id": int(doc_id),
                "table_idx": t_idx,
                "cell_idx": c_idx,
                "row_start": min(c["row_nums"]),
                "col_start": min(c["column_nums"]),
                "row_span": len(c["row_nums"]),
                "col_span": len(c["column_nums"]),
                "is_header": bool(c["column header"]),
                "cell_text": c["cell text"],
                "confidence": round(float(conf), 6),
            })
    return rows


_CELL_DTYPES = {
    "doc_id": "int64", "table_idx": "int64", "cell_idx": "int64",
    "row_start": "int64", "col_start": "int64", "row_span": "int64",
    "col_span": "int64", "is_header": "bool", "cell_text": "object",
    "confidence": "float64",
}


def tsr_assemble_cells(sf_dir: str) -> rd.Dataset:
    """(doc_id, table_idx, cell_idx, row_start, col_start, row_span,
    col_span, is_header, cell_text, confidence) for every assembled cell
    of every document's synthetic page."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def assemble(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id in batch["doc_id"].astype("int64"):
            rows.extend(cell_rows_for_doc(doc_id))
        if not rows:
            return pd.DataFrame(
                {k: pd.Series(dtype=t) for k, t in _CELL_DTYPES.items()}
            )
        return pd.DataFrame(rows).astype(_CELL_DTYPES)

    return ds.map_batches(assemble, batch_format="pandas", batch_size=64)


def serialized_rows_for_doc(doc_id: int, fmt: str = "csv") -> list:
    """Serial per-doc unit for the serializer path: fixture → assembly →
    CSV/HTML render → (doc_id, table_idx, payload) rows.  Shared by the
    distributed stage and the serial oracle (same pattern as
    :func:`cell_rows_for_doc`)."""
    render = cells_to_csv if fmt == "csv" else cells_to_html
    objects, tokens, _ = synth_detection_fixture(int(doc_id))
    rows = []
    for t_idx, (cells, _conf) in enumerate(assemble_tables(objects, tokens)):
        payload = render(cells) if cells else None
        rows.append({
            "doc_id": int(doc_id),
            "table_idx": t_idx,
            "payload": "" if payload is None else payload,
        })
    return rows


def tsr_serialize(sf_dir: str, fmt: str = "csv") -> rd.Dataset:
    """Per-document serialized tables: (doc_id, table_idx, payload) where
    payload is the assembled cells rendered via the existing CSV/HTML
    serializers — the full objects → cells → serializer path."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id in batch["doc_id"].astype("int64"):
            rows.extend(serialized_rows_for_doc(int(doc_id), fmt))
        return pd.DataFrame(
            rows, columns=["doc_id", "table_idx", "payload"]
        ).astype({"doc_id": "int64", "table_idx": "int64", "payload": "object"})

    return ds.map_batches(run, batch_format="pandas", batch_size=64)
