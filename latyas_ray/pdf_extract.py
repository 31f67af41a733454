"""Pseudo-PDF layout-analysis extraction channel.

The corpus carries PDF-shaped payloads as a deterministic page description
(magic prefix ``%PDF-SYN``) instead of real PDF bytes — the container has
no pdfium/poppler/model weights, so the *detector* is a stub, but every
operator downstream of detection is the real LATYAS chain (this module is
what the warm-weights actor pool runs per batch; see
``latyas_ray.stages.extract_stage.ExtractStage``):

1.  **Detect** (stubbed): parse the payload's per-page block list — the
    stand-in for render→YOLO inference (``base_pipeline.py:95-112``,
    ``ultralytics_layout_model.py:54-88``).  Detections arrive out of
    order, with overlaps, with confidences.
2.  **Confidence threshold** — keep conf > 0.3
    (``ultralytics_layout_model.py:81``).
3.  **Label classification** — label string → kind via
    :func:`~latyas_ray.blocks.kind_from_label` (``block.py:29-68``).
4.  **Overlap merge** — :func:`~latyas_ray.overlap.remove_overlapping`
    with the default ``merge`` strategy (``base_pipeline.py:112``,
    ``layout.py:86-132``).
5.  **Per-kind routing** — text channels per kind; the caption /
    cross-reference drop filter (``pdf2txt.py:86-89``) applied to textual
    kinds, exactly as the reference applies it post-OCR.
6.  **Reading order** — :func:`~latyas_ray.reflow.xy_cut_reflow` with the
    reference's default ``margin=10`` (``xy_cut_reflow.py:190``).
7.  **Assembly** — EmbedEq skipped, Equation wrapped ``\\n$$\\n…\\n$$\\n``
    (``tools/pdf2text.py:30-39``); block texts of a page joined with
    ``"\\n\\n\\n"`` and every page terminated with ``"\\n\\n\\n"`` — the
    exact writer bytes of ``tools/pdf2text.py:59-62``.
"""

from __future__ import annotations

import json
from typing import List, Tuple

from .blocks import BlockKind, KEEP_KINDS, kind_from_label, is_text_block
from .overlap import Region, remove_overlapping
from .reflow import xy_cut_reflow
from .textnorm import caption_crossref_drop

PDF_MAGIC = b"%PDF-SYN\n"
CONF_THRESHOLD = 0.3  # ultralytics_layout_model.py:81
PAGE_BLOCK_JOIN = "\n\n\n"  # tools/pdf2text.py:62
PAGE_SUFFIX = "\n\n\n"


def is_pdf_payload(payload: bytes) -> bool:
    """True for BOTH channels: real PDF bytes (``%PDF-1.x``) and the
    synthetic page-description stand-in (``%PDF-SYN``)."""
    return payload.startswith(b"%PDF")


def parse_pdfsyn(payload: bytes) -> List[dict]:
    """Parse the page-description payload → list of pages, each
    ``{"w": float, "h": float, "blocks": [{label, conf, bbox, text}]}``."""
    doc = json.loads(payload[len(PDF_MAGIC):].decode("utf-8"))
    return doc["pages"]


def detect_page(page: dict) -> List[Region]:
    """Stub detector: payload blocks → thresholded, classified regions.

    With real weights this is where the actor's warm YOLO model would run
    over the rendered page tensor; the contract (image/page in → typed
    boxes out) matches ``LayoutModel.detect`` (``layout_model.py:23-29``).
    """
    out: List[Region] = []
    for b in page["blocks"]:
        if b.get("conf", 1.0) <= CONF_THRESHOLD:
            continue
        kind = kind_from_label(b["label"])
        x1, y1, x2, y2 = (float(v) for v in b["bbox"])
        out.append(Region(rect=(x1, y1, x2, y2), kind=kind,
                          text=b.get("text") or None, conf=float(b.get("conf", 1.0))))
    return out


def extract_page(page: dict, page_idx: int,
                 ocr: "OCRRegistry | None" = None) -> Tuple[str, List[Region]]:
    """Full per-page chain for the pseudo-PDF channel: detect → shared
    merge/recognize/route/reflow/assemble chain (:func:`page_chain`)."""
    return page_chain(detect_page(page), page_idx, ocr=ocr)


def page_chain(regions: List[Region], page_idx: int,
               ocr: "OCRRegistry | None" = None) -> Tuple[str, List[Region]]:
    """Detector-output → page text: merge overlaps → recognize (routed
    per kind through the OCR registry) → route → reflow → assemble.
    Shared by the pseudo-PDF and real-PDF channels (the steps downstream
    of detection are channel-independent, exactly as the reference's
    ``analyze_pdf`` chain is model-independent).  Returns the page's text
    (with trailing page suffix) and its regions (meta: order / char
    offsets are page-local here; the caller rebases char offsets into the
    whole document)."""
    regions = remove_overlapping(regions, area_threshold=0.5, strategy="merge")

    # M4/A3-A8: per-kind OCR routing (base_pipeline.py:161-180 applies the
    # rule table per surviving block, post-merge).  The region's carried
    # text bytes stand in for the crop image; the default registry's echo
    # backend reproduces them exactly, a swapped backend (e.g.
    # DigestOCRModel) changes the output deterministically.
    if ocr is None:
        ocr = _default_ocr()
    for r in regions:
        if r.text is not None:
            m = ocr.model_for(r.kind)
            # Rule-less kinds contribute NO text — the reference only
            # sets a block's _text through an OCR rule, and the writer
            # skips _text-None blocks (``tools/pdf2text.py:31-33``).
            # Under the default registry this is a no-op (it rules every
            # KEEP_KIND); under a narrow preset (report/book) it is what
            # makes Table/Equation regions drop out of the text.
            r.text = m.recognize(r.text) if m is not None else None

    # J1: flag text regions containing embedded equations (margin 20,
    # base_pipeline.py:127-146) — with real models these route to the
    # mixed text+equation OCR backend instead of the plain one
    from .functions.spatial import find_embedded_equations

    text_idx = [i for i, r in enumerate(regions) if r.kind == BlockKind.Text]
    embed_idx = [i for i, r in enumerate(regions) if r.kind == BlockKind.EmbedEq]
    hits = find_embedded_equations(
        [regions[i].rect for i in text_idx], [regions[i].rect for i in embed_idx]
    )
    for ti in hits:
        regions[text_idx[ti]].meta["has_equation"] = True

    order = xy_cut_reflow([r.rect for r in regions], margin=10.0)

    parts: List[str] = []
    spans: List[Tuple[int, int, int]] = []
    pos = 0
    for r in regions:
        r.page = page_idx
        r.meta.update({"order": -1, "char_start": -1, "char_end": -1})
    for rank, i in enumerate(order):
        r = regions[i]
        r.meta["order"] = rank
        if r.kind == BlockKind.EmbedEq:  # tools/pdf2text.py:34-35
            continue
        if r.kind not in KEEP_KINDS or not r.text:
            continue
        if is_text_block(r.kind) and caption_crossref_drop(r.text):
            continue
        if r.kind == BlockKind.Equation:  # tools/pdf2text.py:36-37
            chunk = "\n$$\n" + r.text + "\n$$\n"
        else:
            chunk = r.text
        if parts:
            pos += len(PAGE_BLOCK_JOIN)
        parts.append(chunk)
        spans.append((i, pos, pos + len(chunk)))
        pos += len(chunk)

    page_text = PAGE_BLOCK_JOIN.join(parts) + PAGE_SUFFIX
    for i, start, end in spans:
        regions[i].meta["char_start"] = start
        regions[i].meta["char_end"] = end
    return page_text, regions


_OCR_SINGLETON = None


def _default_ocr():
    """Lazy per-process default registry (echo backends)."""
    global _OCR_SINGLETON
    if _OCR_SINGLETON is None:
        from .models.ocr_protocol import default_registry

        _OCR_SINGLETON = default_registry()
    return _OCR_SINGLETON


def extract_pdf(payload: bytes,
                ocr: "OCRRegistry | None" = None) -> Tuple[str, List[Region]]:
    """Whole-document extraction: pages concatenated exactly as the
    reference writer does (``tools/pdf2text.py:59-62``).  Routes by
    payload: ``%PDF-SYN`` page descriptions → the stub-detector channel;
    real ``%PDF-`` bytes → the pure-Python parser channel
    (:mod:`latyas_ray.pdf_real`); both share :func:`page_chain`."""
    if not payload.startswith(PDF_MAGIC):
        from .pdf_real import parse_pdf_pages, regions_from_runs

        pages_real = parse_pdf_pages(payload)
        doc_parts_r: List[str] = []
        all_regions_r: List[Region] = []
        base_r = 0
        for page_idx, page in enumerate(pages_real):
            page_text, regions = page_chain(
                regions_from_runs(page), page_idx, ocr=ocr
            )
            for r in regions:
                if r.meta["char_start"] >= 0:
                    r.meta["char_start"] += base_r
                    r.meta["char_end"] += base_r
            doc_parts_r.append(page_text)
            all_regions_r.extend(regions)
            base_r += len(page_text)
        return "".join(doc_parts_r), all_regions_r

    pages = parse_pdfsyn(payload)
    doc_parts: List[str] = []
    all_regions: List[Region] = []
    base = 0
    for page_idx, page in enumerate(pages):
        page_text, regions = extract_page(page, page_idx, ocr=ocr)
        for r in regions:
            if r.meta["char_start"] >= 0:
                r.meta["char_start"] += base
                r.meta["char_end"] += base
        doc_parts.append(page_text)
        all_regions.extend(regions)
        base += len(page_text)
    return "".join(doc_parts), all_regions
