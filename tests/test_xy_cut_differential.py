"""Differential property test: the O(n log n) searchsorted sweep in
``latyas_ray.reflow.xy_cut_reflow`` must produce the SAME permutation as a
straight port of the reference's O(n²) per-cut rescan loop
(``/root/reference/latyas/layout/reflow/position_based/xy_cut_reflow.py:14-202``),
over ≥3,000 randomized rect sets covering overlaps, duplicates, degenerate
zero-extent rects, containment, float coordinates, and depth-overflow into
the grid fallback.

The port below mirrors the reference loop 1:1 (adapted from Block objects
to rect tuples).  Cases where the reference itself raises
``ZeroDivisionError`` in ``simple_position_reflow`` (sub-3-pixel extents —
our implementation clamps, a documented deviation in reflow.py) are
skipped and counted; the test asserts the compared population stays large.
"""

import random

import pytest

from latyas_ray.reflow import xy_cut_reflow

EPS_MARGINS = [0.0, 2.5, 10.0]


# ---- straight port of the reference loop (xy_cut_reflow.py:14-202) ----


def _ref_simple_position_reflow(rects, bboxs):
    sorted_bbox = []
    min_x, min_y, max_x, max_y = rects[0]
    for bbox_i in bboxs:
        x, y, x2, y2 = rects[bbox_i]
        min_x = min(min_x, x)
        max_x = max(max_x, x2)
        min_y = min(min_y, y)
        max_y = max(max_y, y2)
    w = max_x - min_x
    h = max_y - min_y
    sf = (h // 16, w // 3)
    for bbox_i in bboxs:
        x, y, x2, y2 = rects[bbox_i]
        x, y, x2, y2 = int(x), int(y), int(x2), int(y2)
        sorted_bbox.append(((x // sf[1], y // sf[0], x2 // sf[1], y2 // sf[0]), bbox_i))
    sorted_bbox = sorted(sorted_bbox, key=lambda x: x[0])
    return [item[1] for item in sorted_bbox]


def _ref_overlap(rects, bboxs, split, lo, hi):
    first, second, overlap = [], [], []
    for bbox_j in bboxs:
        bbox = rects[bbox_j]
        s, e = bbox[lo], bbox[hi]
        if s <= split and e <= split:
            first.append(bbox_j)
        elif s >= split and e >= split:
            second.append(bbox_j)
        else:
            overlap.append(bbox_j)
    return first, second, overlap


def _ref_region(rects, bboxs, margin, depth, max_depth, horizontal):
    if len(bboxs) <= 1:
        return bboxs
    if depth > max_depth:
        return _ref_simple_position_reflow(rects, bboxs)
    lo, hi = (0, 2) if horizontal else (1, 3)
    possible = []
    for bbox_i in bboxs:
        bbox = rects[bbox_i]
        possible.extend([bbox[lo] - margin, bbox[hi] + margin])
    possible = sorted(possible)
    out = []
    rest = bboxs
    for split in possible:
        first, second, overlap = _ref_overlap(rects, rest, split, lo, hi)
        if len(overlap) == 0:
            if len(first) == 0:
                continue
            out.extend(
                _ref_region(
                    rects, first, margin - depth * (margin / max_depth),
                    depth + 1, max_depth, not horizontal,
                )
            )
            rest = second
    out.extend(
        _ref_region(
            rects, rest, margin - depth * (margin / max_depth),
            depth + 1, max_depth, not horizontal,
        )
    )
    return out


def _ref_xy_cut_reflow(rects, margin=10, horizontal_first=True, max_depth=8):
    bboxs = list(range(len(rects)))
    return _ref_region(rects, bboxs, margin, 0, max_depth, horizontal_first)


# ------------------------------------------------------------- generators


def _random_rects(rng: random.Random):
    kind = rng.randrange(5)
    n = rng.randrange(1, {0: 8, 1: 20, 2: 40, 3: 12, 4: 25}[kind])
    rects = []
    for _ in range(n):
        if kind == 3 and rng.random() < 0.3:  # degenerate zero-extent
            x = rng.randrange(0, 200)
            y = rng.randrange(0, 300)
            rects.append((x, y, x, y))
            continue
        if kind == 4:  # float coordinates
            x = round(rng.uniform(0, 180), 2)
            y = round(rng.uniform(0, 280), 2)
            w = round(rng.uniform(0.5, 90), 2)
            h = round(rng.uniform(0.5, 40), 2)
        else:
            x = rng.randrange(0, 180)
            y = rng.randrange(0, 280)
            w = rng.randrange(1, 90)
            h = rng.randrange(1, 40)
        rects.append((x, y, x + w, y + h))
    if kind == 2 and n >= 2:  # force duplicates + containment
        rects[1] = rects[0]
        x, y, x2, y2 = rects[0]
        rects.append((x, y, x + max(1, (x2 - x) // 2), y + max(1, (y2 - y) // 2)))
    return rects


@pytest.mark.parametrize("seed_base", [0, 1, 2])
def test_sweep_matches_reference_loop_fuzz(seed_base):
    """≥3,000 random cases total across the three shards."""
    rng = random.Random(0xC0FFEE + seed_base)
    compared = skipped = 0
    for case in range(1000):
        rects = _random_rects(rng)
        margin = rng.choice(EPS_MARGINS)
        hfirst = rng.random() < 0.5
        max_depth = rng.choice([2, 4, 8])
        try:
            expect = _ref_xy_cut_reflow(
                rects, margin=margin, horizontal_first=hfirst, max_depth=max_depth
            )
        except ZeroDivisionError:
            skipped += 1  # documented deviation: ref crashes, we clamp
            continue
        got = xy_cut_reflow(
            rects, margin=margin, horizontal_first=hfirst, max_depth=max_depth
        )
        assert got == expect, (
            f"case {case}: margin={margin} hfirst={hfirst} "
            f"max_depth={max_depth} rects={rects}"
        )
        compared += 1
    assert compared >= 900, f"only {compared} compared ({skipped} ref crashes)"


def test_sweep_matches_reference_loop_dense_page():
    """One large page (500 rects) — the shape where the O(n²) loop hurts."""
    rng = random.Random(42)
    rects = []
    for row in range(50):
        for col in range(10):
            x = col * 60 + rng.randrange(0, 5)
            y = row * 25 + rng.randrange(0, 4)
            rects.append((x, y, x + 50 + rng.randrange(0, 8), y + 18))
    rng.shuffle(rects)
    assert xy_cut_reflow(rects, margin=2.0) == _ref_xy_cut_reflow(rects, margin=2.0)
