"""Spatial lookup / merge primitives (page-local, shuffle-free).

Re-expressions over ``(x1, y1, x2, y2)`` rects of:

- **J1** — embedded-equation containment scan: for each Text region, the
  EmbedEq regions inside it with an outward margin of 20
  (``base_pipeline.py:127-146``; ``shape.py:121-127`` ``is_inside``).
- **J2** — native-text overlap join: gather text snippets whose rects
  overlap a layout box by more than 0.5 of the smaller area — the
  PDF-textpage ↔ layout-box reconciliation join
  (``pdf2txt.py:29-49`` ``get_text_by_bbox``).
- **O4** — row-band total order: same-row when y-ranges nest or the
  relative top offset is below 0.4 of the taller box; rows top-to-bottom,
  left-to-right within a row (``det_model/Bbox.py:45-62``).
- **M11** — horizontal merge of same-row, x-overlapping boxes over a
  row-sorted sequence (``mix_inference.py:27-41`` ``bbox_merge``).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from ..geometry import Rect, is_inside, overlap_ratio_min

ROW_BAND_THRESHOLD = 0.4  # det_model/Bbox.py THREADHOLD
EMBED_MARGIN = 20.0  # base_pipeline.py:140 is_inside margin


def same_row(a: Rect, b: Rect, threshold: float = ROW_BAND_THRESHOLD) -> bool:
    """Row-banding predicate (``Bbox.same_row``, ``Bbox.py:45-53``)."""
    if (a[1] >= b[1] and a[3] <= b[3]) or (a[1] <= b[1] and a[3] >= b[3]):
        return True  # y-range nesting
    if a[3] <= b[1] or a[1] >= b[3]:
        return False  # y-disjoint
    ha, hb = a[3] - a[1], b[3] - b[1]
    return abs(a[1] - b[1]) / max(ha, hb) < threshold


def row_band_sort(rects: Sequence[Rect]) -> List[int]:
    """Total order: top-to-bottom by row band, left-to-right within a row
    (``Bbox.__lt__``, ``Bbox.py:55-62``).  Insertion sort preserves the
    reference's pairwise-comparison semantics on the non-transitive
    predicate."""
    order: List[int] = []
    for i in range(len(rects)):
        j = len(order)
        while j > 0:
            k = order[j - 1]
            a, b = rects[i], rects[k]
            lt = (a[0] < b[0]) if same_row(a, b) else (a[1] < b[1])
            if lt:
                j -= 1
            else:
                break
        order.insert(j, i)
    return order


def merge_row_bboxes(rects: Sequence[Rect]) -> List[Rect]:
    """Merge horizontally-adjacent same-row boxes of a row-sorted sequence
    (``bbox_merge``, ``mix_inference.py:27-41``): while the previous box's
    right edge reaches the next box's left edge and both share a row, the
    previous box absorbs the next (width extends, height keeps the
    first's)."""
    if not rects:
        return []
    out: List[Rect] = []
    prev = tuple(rects[0])
    for curr in list(rects[1:]):
        curr = tuple(curr)
        if prev[2] <= curr[0] or not same_row(prev, curr):
            out.append(prev)
            prev = curr
        else:
            prev = (prev[0], prev[1], max(prev[2], curr[2]), prev[3])
    out.append(prev)
    return out


def split_text_around_latex(
    text_rects: Sequence[Rect],
    latex_rects: Sequence[Rect],
) -> List[Tuple[Rect, str]]:
    """**M12** — text/equation conflict resolution within a page's rows:
    equation boxes win their x-span; text boxes overlapping them in the
    same row are trimmed, split around, or dropped when fully covered.

    Intended semantics of ``split_conflict``
    (``mix_inference.py:44-123``), re-expressed as a clean sweep (the
    reference version drags debug globals and loses tail elements on some
    inputs — unreachable in its working flow; we implement the intent):
    process boxes in row-band order; within a row, for each pair of
    x-overlapping boxes, text↔text merge their span, text↔latex resolve
    in favor of the latex span.  Returns (rect, kind) in reading order,
    kind ∈ {"text", "latex"}.
    """
    items: List[Tuple[Rect, str]] = [(tuple(r), "text") for r in text_rects]
    items += [(tuple(r), "latex") for r in latex_rects]
    if not items:
        return []
    order = row_band_sort([r for r, _ in items])
    ordered = [items[i] for i in order]

    # group into row bands (consecutive boxes chained by same_row)
    rows: List[List[Tuple[Rect, str]]] = []
    for rect, kind in ordered:
        if rows and same_row(rows[-1][-1][0], rect):
            rows[-1].append((rect, kind))
        else:
            rows.append([(rect, kind)])

    out: List[Tuple[Rect, str]] = []
    for row in rows:
        latex = [r for r, k in row if k == "latex"]
        texts = [r for r, k in row if k == "text"]
        # 1. merge x-overlapping text spans
        merged: List[Rect] = []
        for r in sorted(texts, key=lambda r: (r[0], r[2])):
            if merged and r[0] < merged[-1][2]:
                last = merged[-1]
                merged[-1] = (last[0], last[1], max(last[2], r[2]), last[3])
            else:
                merged.append(r)
        # 2. subtract every latex x-span from the text spans
        pieces: List[Rect] = []
        for t in merged:
            spans = [(t[0], t[2])]
            for lx in sorted(latex, key=lambda r: r[0]):
                next_spans = []
                for x1, x2 in spans:
                    if lx[2] <= x1 or lx[0] >= x2:
                        next_spans.append((x1, x2))
                        continue
                    if lx[0] > x1:
                        next_spans.append((x1, lx[0]))
                    if lx[2] < x2:
                        next_spans.append((lx[2], x2))
                spans = next_spans
            pieces.extend((x1, t[1], x2, t[3]) for x1, x2 in spans if x2 > x1)
        # 3. emit the row left-to-right
        row_out = [(r, "latex") for r in latex] + [(r, "text") for r in pieces]
        row_out.sort(key=lambda it: (it[0][0], it[0][2]))
        out.extend(row_out)
    return out


def find_embedded_equations(
    text_rects: Sequence[Rect],
    embed_rects: Sequence[Rect],
    margin: float = EMBED_MARGIN,
) -> Dict[int, List[int]]:
    """For each text region index, the embed-equation indices lying inside
    it grown by ``margin`` (J1).  Page-local nested loop — n is a page's
    block count."""
    out: Dict[int, List[int]] = {}
    for ti, tr in enumerate(text_rects):
        hits = [ei for ei, er in enumerate(embed_rects) if is_inside(er, tr, margin)]
        if hits:
            out[ti] = hits
    return out


def native_text_for_bbox(
    snippets: Sequence[Tuple[Rect, str]],
    bbox: Rect,
    min_overlap: float = 0.5,
) -> str:
    """Concatenate the text of snippets whose rect overlaps ``bbox`` by
    more than ``min_overlap`` of the smaller area, in snippet order, with
    newlines stripped (J2; ``pdf2txt.py:40-48``)."""
    parts: List[str] = []
    for rect, text in snippets:
        if overlap_ratio_min(rect, bbox) > min_overlap:
            parts.append(text.replace("\n", ""))
    return "".join(parts)
