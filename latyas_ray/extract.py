"""``extract_one`` — the serial per-document oracle.

One pure function implementing the full extraction semantics for a single
corpus row; the Ray pipeline is required (and pytest-verified) to produce
byte-identical output when running this same function inside
``map_batches`` over any partitioning — the north rule's per-url invariant.

The dual-channel reconciliation mirrors ``pdf2txt.py:72-85``: the row's
pre-extracted ``text`` column is the cheap channel (the analog of the
native PDF textpage), the extractor output is the expensive channel; the
cheap channel wins when the normalized edit distance is < 0.2.
The pure extraction (``extracted_text``) is the byte-exact contract;
``final_text``/``text_source`` record the reconciliation outcome.
"""

from __future__ import annotations

from typing import List, Optional

from . import EXTRACTOR_VERSION
from .html_extract import extract_html
from .overlap import Region
from .pdf_extract import extract_pdf, is_pdf_payload
from .textnorm import reconcile, sha256_hex


def region_to_dict(r: Region, region_id: int) -> dict:
    return {
        "region_id": region_id,
        "kind": r.kind.name,
        "order": int(r.meta.get("order", -1)),
        "x1": float(r.rect[0]),
        "y1": float(r.rect[1]),
        "x2": float(r.rect[2]),
        "y2": float(r.rect[3]),
        "dom_path": r.dom_path,
        "page": int(r.page),
        "char_start": int(r.meta.get("char_start", -1)),
        "char_end": int(r.meta.get("char_end", -1)),
    }


def extract_one(
    url: str,
    html: bytes,
    text: Optional[str] = None,
    lang: Optional[str] = None,
    ocr_registry=None,
) -> dict:
    """Extract one document.  ``html`` is the raw payload (HTML bytes or a
    ``%PDF-SYN`` page description); ``text`` is the cheap pre-extracted
    channel; ``lang`` passes through.  ``ocr_registry`` routes PDF region
    recognition (default: the echo registry — byte-identical channel)."""
    error = ""
    try:
        if is_pdf_payload(html):
            payload_kind = "pdf"
            extracted, regions = extract_pdf(html, ocr=ocr_registry)
        else:
            payload_kind = "html"
            extracted, regions = extract_html(html)
    except Exception as e:  # poison-pill guard: one corrupt payload must
        # not fail a whole batch task at corpus scale; the row is emitted
        # empty with the error recorded (rows with error != "" are the
        # pipeline's dead-letter channel)
        payload_kind = "pdf" if is_pdf_payload(html) else "html"
        extracted, regions = "", []
        error = f"{type(e).__name__}: {e}"[:500]

    final_text, source = reconcile(extracted, text or "")
    return {
        "url": url,
        "lang": lang or "",
        "payload_kind": payload_kind,
        "extracted_text": extracted,
        "final_text": final_text,
        "text_source": source,
        "n_bytes": len(html),
        "n_regions": len(regions),
        "regions": [region_to_dict(r, i) for i, r in enumerate(regions)],
        "checksum": sha256_hex(extracted.encode("utf-8")),
        "error": error,
        "extractor_version": EXTRACTOR_VERSION,
    }
