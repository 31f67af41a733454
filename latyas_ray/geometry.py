"""Axis-aligned rectangle geometry.

Semantics follow the reference's ``Rectangle``
(``/root/reference/latyas/layout/shape.py:70-190``): float coordinates
``(x1, y1, x2, y2)`` with y growing downward, ``union`` = bounding box of
both, ``intersect`` = overlap box (empty → zero-area), ``is_inside`` with an
outward margin on the container.  We intentionally do NOT replicate the
degenerate clamp at ``shape.py:74-77`` (``x1>=x2 → x2:=x1``); instead an
empty intersection is represented by a zero-area rect directly, which is the
behavior the reference's clamp produces for the call sites that matter
(``layout.py:103-107`` area test, ``pdf2txt.py:40-42`` overlap ratio).

Rects are plain tuples ``(x1, y1, x2, y2)`` so they vectorize trivially and
cross the Arrow boundary as four float32 struct fields.
"""

from __future__ import annotations

from typing import Tuple

Rect = Tuple[float, float, float, float]


def area(r: Rect) -> float:
    """Area of the rect; degenerate (inverted) rects have zero area.

    Mirrors ``shape.py`` area after its constructor clamp.
    """
    w = r[2] - r[0]
    h = r[3] - r[1]
    if w <= 0.0 or h <= 0.0:
        return 0.0
    return w * h


def union(a: Rect, b: Rect) -> Rect:
    """Bounding box of both rects (``shape.py:129-138``)."""
    return (
        min(a[0], b[0]),
        min(a[1], b[1]),
        max(a[2], b[2]),
        max(a[3], b[3]),
    )


def intersect(a: Rect, b: Rect) -> Rect:
    """Overlap box; empty overlap yields a zero-area rect (``shape.py:140-149``)."""
    x1 = max(a[0], b[0])
    y1 = max(a[1], b[1])
    x2 = min(a[2], b[2])
    y2 = min(a[3], b[3])
    if x2 < x1:
        x2 = x1
    if y2 < y1:
        y2 = y1
    return (x1, y1, x2, y2)


def intersect_area(a: Rect, b: Rect) -> float:
    w = min(a[2], b[2]) - max(a[0], b[0])
    if w <= 0.0:
        return 0.0
    h = min(a[3], b[3]) - max(a[1], b[1])
    if h <= 0.0:
        return 0.0
    return w * h


def is_inside(inner: Rect, outer: Rect, margin: float = 0.0) -> bool:
    """True if ``inner`` lies within ``outer`` grown by ``margin`` on every
    side (``shape.py:121-127`` ``is_inside``)."""
    return (
        inner[0] >= outer[0] - margin
        and inner[1] >= outer[1] - margin
        and inner[2] <= outer[2] + margin
        and inner[3] <= outer[3] + margin
    )


def overlap_ratio_min(a: Rect, b: Rect) -> float:
    """Intersection area over the smaller rect's area.

    The reference uses this ratio (>0.5) to join native-PDF text rects to
    layout boxes (``pdf2txt.py:40-44``).  Zero-area inputs → 0.0 (the
    reference would divide by zero; unreachable in its working flows).
    """
    am = min(area(a), area(b))
    if am <= 0.0:
        return 0.0
    return intersect_area(a, b) / am
