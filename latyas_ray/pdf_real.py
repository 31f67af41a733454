"""Real-PDF-byte channel: a pure-Python writer and parser for minimal
embedded-text PDFs (uncompressed content streams, Type1 base fonts).

The reference opens real PDFs with pdfium (``tools/pdf2text.py:24-27``)
and reads the native textpage rects (``pipelines/base_pipeline.py:17-42``,
bottom-up page coordinates, ``coord_latyas_to_pdf`` y-flip at
``base_pipeline.py:14-15``).  pdfium does not exist in this container, so
this module implements the same channel for the subset a synthetic corpus
needs: genuine ``%PDF-1.4`` files with xref tables, page objects,
``Tf``/``Tm``/``Tj`` text operators — written by :func:`write_pdf` and
re-parsed by :func:`parse_pdf_pages` (tokenizer over the content stream,
escape handling, y-flip into top-down layout coordinates).

Detection on real bytes has no model in the sandbox, so
:func:`regions_from_runs` stands in for it with deterministic layout
heuristics (font size → Title, page margins → Header/Footer, caption
prefixes → Caption), then everything downstream — overlap merge, OCR rule
routing, XY-cut reflow, caption filter, assembly — is the SAME shared
chain the stub channel uses (``pdf_extract.page_chain``).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .blocks import BlockKind, kind_from_label
from .overlap import Region

# ------------------------------------------------------------------ writer


def _esc(text: str) -> bytes:
    """PDF literal-string escaping (UTF-8 bytes inside parens)."""
    out = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    out = out.replace("\r", "\\r").replace("\n", "\\n")
    return out.encode("utf-8")


def write_pdf(pages: List[dict]) -> bytes:
    """Serialize pages into a minimal valid PDF.

    Each page is ``{"w": float, "h": float, "runs": [(x, y_top, size,
    text), ...]}`` with TOP-DOWN y (layout convention); the writer flips
    to PDF's bottom-up baseline coordinates, the parser flips back — the
    round trip exercises the coordinate flip the reference does at
    ``base_pipeline.py:14-15``.
    """
    objects: List[bytes] = []  # 1-indexed

    n_pages = len(pages)
    font_obj = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # obj 2
    for i, page in enumerate(pages):
        w, h = page["w"], page["h"]
        content_obj = 4 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w:g} {h:g}] "
                f"/Contents {content_obj} 0 R "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> >>"
            ).encode()
        )
        ops = [b"BT"]
        cur_size = None
        for x, y_top, size, text in page["runs"]:
            if size != cur_size:
                ops.append(f"/F1 {size:g} Tf".encode())
                cur_size = size
            y_base = h - y_top - size  # top-down → bottom-up baseline
            ops.append(f"1 0 0 1 {x:g} {y_base:g} Tm".encode())
            ops.append(b"(" + _esc(text) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        objects.append(
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)


# ------------------------------------------------------------------ parser

_OBJ_RE = re.compile(rb"(\d+) 0 obj\s*(.*?)\s*endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_PAGE_RE = re.compile(
    rb"/Type\s*/Page(?![s])", re.DOTALL
)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]")
_TOKEN_RE = re.compile(
    rb"/F\d+\s+([\d.]+)\s+Tf"  # 1: font size
    rb"|1 0 0 1\s+([\d.+-]+)\s+([\d.+-]+)\s+Tm"  # 2,3: position
    rb"|\(((?:[^()\\]|\\.)*)\)\s*Tj",  # 4: show text
    re.DOTALL,
)
_UNESC = {b"\\\\": b"\\", b"\\(": b"(", b"\\)": b")", b"\\r": b"\r", b"\\n": b"\n"}


def _unescape(raw: bytes) -> str:
    out = re.sub(
        rb"\\[\\()rn]", lambda m: _UNESC[m.group(0)], raw
    )
    return out.decode("utf-8", errors="replace")


def parse_pdf_pages(payload: bytes) -> List[dict]:
    """Parse minimal embedded-text PDF bytes → pages of text runs.

    Returns ``[{"w", "h", "runs": [(x, y_top, size, text), ...]}, ...]``
    with y flipped back to top-down (``y_top = h - y_baseline - size``) —
    the textpage-rect contract of ``base_pipeline.py:17-42``.
    Pages follow the /Kids order of the page tree; runs follow content
    stream order.
    """
    objs = {}
    for m in _OBJ_RE.finditer(payload):
        objs[int(m.group(1))] = m.group(2)

    page_ids: List[int] = []
    for num, body in sorted(objs.items()):
        km = _KIDS_RE.search(body)
        if km and b"/Type" in body and b"/Pages" in body:
            page_ids = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", km.group(1))]
            break
    if not page_ids:  # fallback: document order of /Type /Page objects
        page_ids = [
            num for num, body in sorted(objs.items()) if _PAGE_RE.search(body)
        ]

    pages = []
    for pid in page_ids:
        body = objs.get(pid, b"")
        mb = _MEDIABOX_RE.search(body)
        w = float(mb.group(3)) - float(mb.group(1)) if mb else 612.0
        h = float(mb.group(4)) - float(mb.group(2)) if mb else 792.0
        cm = _CONTENTS_RE.search(body)
        runs: List[Tuple[float, float, float, str]] = []
        if cm and int(cm.group(1)) in objs:
            sm = _STREAM_RE.search(objs[int(cm.group(1))])
            stream = sm.group(1) if sm else b""
            size, x, y = 12.0, 0.0, 0.0
            for tok in _TOKEN_RE.finditer(stream):
                if tok.group(1) is not None:
                    size = float(tok.group(1))
                elif tok.group(2) is not None:
                    x, y = float(tok.group(2)), float(tok.group(3))
                else:
                    text = _unescape(tok.group(4))
                    runs.append((x, h - y - size, size, text))
        pages.append({"w": w, "h": h, "runs": runs})
    return pages


# ------------------------------------------- run → block detection stand-in

CHAR_W = 0.5  # text width heuristic: size × CHAR_W per char
LINE_GAP = 1.6  # same-block line spacing ≤ size × LINE_GAP
TITLE_SIZE = 17.0
MARGIN_BAND = 50.0

_CAPTION_PREFIX = re.compile(r"^(Figure|Table|图|表)\s*\d+\s*[::]")


def _classify(y_top: float, size: float, text: str, page_h: float) -> BlockKind:
    """Deterministic layout heuristics standing in for the detector on
    real bytes (no model in the sandbox): font size → Title, page margin
    bands → Header/Footer, caption prefixes → *Caption."""
    if size >= TITLE_SIZE:
        return kind_from_label("Title")
    if y_top < MARGIN_BAND:
        return kind_from_label("Header")
    if y_top > page_h - MARGIN_BAND:
        return kind_from_label("Footer")
    m = _CAPTION_PREFIX.match(text)
    if m:
        head = m.group(1)
        if head in ("Figure", "图"):
            return BlockKind.FigureCaption
        return BlockKind.TableCaption
    return BlockKind.Text


def regions_from_runs(page: dict) -> List[Region]:
    """Group text runs into block regions.

    Lines merge into the open block while they share the block's left
    edge (±1pt), font size, and kind, and follow within ``LINE_GAP`` line
    spacing; each block's rect is the union of its line rects, its text
    the newline-join of its lines (the analog of textpage rect
    aggregation, ``base_pipeline.py:17-42``).
    """
    h = float(page["h"])
    out: List[Region] = []
    cur = None  # (x, y_top, x2, y2, size, kind, [lines])
    for x, y_top, size, text in page["runs"]:
        kind = _classify(y_top, size, text, h)
        x2 = x + CHAR_W * size * max(1, len(text))
        y2 = y_top + size
        if (
            cur is not None
            and kind == cur[5]
            and size == cur[4]
            and abs(x - cur[0]) <= 1.0
            and 0 <= y_top - cur[3] <= size * (LINE_GAP - 1.0)
        ):
            cur = (cur[0], cur[1], max(cur[2], x2), y2, size, kind,
                   cur[6] + [text])
            out[-1] = _to_region(cur)
        else:
            cur = (x, y_top, x2, y2, size, kind, [text])
            out.append(_to_region(cur))
    return out


def _to_region(cur) -> Region:
    x, y1, x2, y2, size, kind, lines = cur
    return Region(
        rect=(x, y1, x2, y2), kind=kind, text="\n".join(lines), conf=1.0
    )
