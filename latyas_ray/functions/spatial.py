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
