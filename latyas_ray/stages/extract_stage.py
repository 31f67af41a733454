"""The extraction batch UDF / actor stage.

Two entry shapes over the same kernel:

- :func:`extract_batch` — a plain function → Ray schedules **stateless
  tasks** (cheap, elastic, retry-safe).  The HTML channel is pure
  string/DOM work, so tasks suffice.
- :class:`ExtractStage` — a callable class → Ray builds an **actor pool**
  (``map_batches(ExtractStage, concurrency=(a, b), batch_size=B)``).  This
  is the stage shape the reference's model pipelines require: weights load
  once per actor in ``__init__`` (the reference instead loads them at
  module import, ``pdf2txt.py:11-19``, or per ctor,
  ``ultralytics_layout_model.py:31-52``; and rebuilds an ONNX session per
  call at ``texteller_layout_model.py:70-71`` — an anti-pattern we do not
  copy).  The stub "detector" here is deterministic, so the actor's warm
  state is just precompiled machinery; real YOLO/RT-DETR weights would
  slot into ``__init__`` without touching the pipeline
  (``LayoutModel.detect`` contract, ``layout_model.py:23-29``).

Batches are zero-copy Arrow in / Arrow out.  The per-row Python loop is
inherent to document parsing (the atomic work unit is one document, as one
page is for the reference); batch-level overheads are kept out of the loop.
"""

from __future__ import annotations

from typing import Iterable, Optional

import pyarrow as pa
import pyarrow.compute as pc

from .. import EXTRACTOR_VERSION
from ..extract import extract_one
from ..pdf_extract import is_pdf_payload
from ..schema import EXTRACTED_SCHEMA


def _rows(batch: pa.Table) -> Iterable[tuple]:
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    texts = batch.column("text").to_pylist() if "text" in batch.column_names else [None] * len(urls)
    langs = batch.column("lang").to_pylist() if "lang" in batch.column_names else [None] * len(urls)
    return zip(urls, htmls, texts, langs)


def extract_batch(batch: pa.Table) -> pa.Table:
    """Extract every document of one Arrow batch → extracted-output batch."""
    out = {name: [] for name in EXTRACTED_SCHEMA.names}
    for url, html, text, lang in _rows(batch):
        res = extract_one(url, html or b"", text, lang)
        for name in EXTRACTED_SCHEMA.names:
            out[name].append(res[name])
    arrays = [
        pa.array(out[field.name], type=field.type) for field in EXTRACTED_SCHEMA
    ]
    return pa.Table.from_arrays(arrays, schema=EXTRACTED_SCHEMA)


class ExtractStage:
    """Actor-pool form of :func:`extract_batch`.

    ``__init__`` is the once-per-actor warm-up slot (model weights, ONNX
    sessions, compiled rule tables); ``__call__`` runs per batch.
    """

    def __init__(self, model_name: Optional[str] = None) -> None:
        # Warm state: importing the extraction modules compiles every regex
        # and rule table once per actor process.  A real detector would
        # load weights here, keyed by ``model_name`` (the analog of
        # ``from_pretrained(name)``, latyas_config.py:58-71).
        self.model_name = model_name or "stub-layout-detector/1"
        import latyas_ray.html_extract  # noqa: F401 — force compile in-actor
        import latyas_ray.pdf_extract  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch)


# ---------------------------------------------------- routed two-stage plan
#
# The default physical plan: a *stateless task* stage extracts the HTML
# majority at full cluster width (pure string/DOM work needs no warm state,
# and elastic tasks have none of an actor pool's ramp-up / sizing cost),
# while PDF rows pass through untouched with their payload carried in a
# sideband column; a downstream *actor pool* — the stage shape the
# reference's model pipelines require (weights once per actor,
# ``ultralytics_layout_model.py:31-52``) — extracts only those rows and
# forwards everything else zero-copy.  One read, no union, and the pool is
# sized to the model workload (a few % of rows), not the whole corpus.

PDF_CARRY_COLS = ["_pdf_payload", "_pdf_text"]
ROUTED_SCHEMA = EXTRACTED_SCHEMA.append(
    pa.field("_pdf_payload", pa.binary())
).append(pa.field("_pdf_text", pa.string()))


def _placeholder_row(url: str, lang, payload: bytes) -> dict:
    """EXTRACTED-schema stand-in for a PDF row awaiting the model stage."""
    return {
        "url": url,
        "lang": lang or "",
        "payload_kind": "pdf",
        "extracted_text": "",
        "final_text": "",
        "text_source": "",
        "n_bytes": len(payload),
        "n_regions": 0,
        "regions": [],
        "checksum": "",
        "error": "",
        "extractor_version": EXTRACTOR_VERSION,
    }


# Flush accumulated output once this much input payload has been consumed:
# a run of multi-MB documents then yields several bounded Arrow tables
# instead of one giant one (north rule: size-capped Arrow batches — output
# blocks stay spillable and downstream batches stay bounded even when the
# row-count batch cap admits many giant rows).
SIZE_CAP_BYTES = 64 << 20


def _emit_routed(out: dict, payloads: list, ptexts: list) -> pa.Table:
    arrays = [pa.array(out[f.name], type=f.type) for f in EXTRACTED_SCHEMA]
    arrays.append(pa.array(payloads, type=pa.binary()))
    arrays.append(pa.array(ptexts, type=pa.string()))
    return pa.Table.from_arrays(arrays, schema=ROUTED_SCHEMA)


def extract_route_batch(batch: pa.Table):
    """Stateless stage: extract HTML rows fully; carry PDF rows through.
    Generator UDF — yields size-capped output tables."""
    out = {name: [] for name in EXTRACTED_SCHEMA.names}
    payloads, ptexts = [], []
    acc = 0
    for url, html, text, lang in _rows(batch):
        h = html or b""
        if is_pdf_payload(h):
            res = _placeholder_row(url, lang, h)
            payloads.append(h)
            ptexts.append(text)
        else:
            res = extract_one(url, h, text, lang)
            payloads.append(None)
            ptexts.append(None)
        for name in EXTRACTED_SCHEMA.names:
            out[name].append(res[name])
        acc += len(h)
        if acc >= SIZE_CAP_BYTES:
            yield _emit_routed(out, payloads, ptexts)
            out = {name: [] for name in EXTRACTED_SCHEMA.names}
            payloads, ptexts = [], []
            acc = 0
    if payloads or out["url"]:
        yield _emit_routed(out, payloads, ptexts)


class PdfExtractStage:
    """Actor-pool model stage over routed batches: runs the (stub) layout
    detector on rows whose ``_pdf_payload`` is set; all other rows pass
    through zero-copy.  Real YOLO/RT-DETR weights belong in ``__init__``
    (never per call — the reference rebuilds an ONNX session per detect at
    ``texteller_layout_model.py:70-71``, an anti-pattern we do not copy)."""

    def __init__(self, model_name: Optional[str] = None,
                 ocr_backend: Optional[str] = None,
                 preset: Optional[str] = None) -> None:
        import latyas_ray.pdf_extract  # noqa: F401 — warm compile in-actor

        # Warm OCR state: registry + backends built ONCE per actor
        # (``add_ocr_model`` calls live in pipeline __init__ in the
        # reference too, paper_pipeline.py:35-61).  ``preset`` selects a
        # NAMED pipeline config (paper/report/book — detector spec +
        # rule table, pipelines/presets.py); otherwise ``ocr_backend``
        # picks the backend family for the default rule table:
        # None/"echo" → the byte-identical echo channel, "digest" →
        # DigestOCRModel.
        if preset is not None:
            from latyas_ray.pipelines.presets import get_preset

            p = get_preset(preset)
            self.model_name = model_name or p.layout_models[0][1]
            self.ocr = p.build_registry()
            return
        from latyas_ray.models.ocr_protocol import (
            DigestOCRModel,
            default_registry,
        )

        self.model_name = model_name or "stub-layout-detector/1"
        self.ocr = default_registry(
            DigestOCRModel() if ocr_backend == "digest" else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column("_pdf_payload")
        if payload.null_count == batch.num_rows:
            return batch.drop_columns(PDF_CARRY_COLS)
        mask = pc.is_valid(payload.combine_chunks())
        done = batch.filter(pc.invert(mask)).drop_columns(PDF_CARRY_COLS)
        todo = batch.filter(mask)
        out = {name: [] for name in EXTRACTED_SCHEMA.names}
        for url, pl, text, lang in zip(
            todo.column("url").to_pylist(),
            todo.column("_pdf_payload").to_pylist(),
            todo.column("_pdf_text").to_pylist(),
            todo.column("lang").to_pylist(),
        ):
            res = extract_one(url, pl, text, lang, ocr_registry=self.ocr)
            for name in EXTRACTED_SCHEMA.names:
                out[name].append(res[name])
        arrays = [pa.array(out[f.name], type=f.type) for f in EXTRACTED_SCHEMA]
        pdf_tbl = pa.Table.from_arrays(arrays, schema=EXTRACTED_SCHEMA)
        return pa.concat_tables([done, pdf_tbl])
