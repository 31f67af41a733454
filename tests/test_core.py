"""Unit tests for the pure extraction core: geometry, kinds, reflow,
overlap-merge, text utilities.  Cases mirror the reference call sites cited
in each module's docstring."""

import random

import pytest

from latyas_ray.blocks import BlockKind, kind_from_label, is_text_block
from latyas_ray.geometry import area, intersect, intersect_area, is_inside, union, overlap_ratio_min
from latyas_ray.overlap import Region, remove_overlapping
from latyas_ray.reflow import position_reflow, simple_position_reflow, xy_cut_reflow
from latyas_ray.textnorm import (
    caption_crossref_drop,
    levenshtein_distance,
    normalized_distance,
    reconcile,
)


# ---------------------------------------------------------------- geometry
def test_rect_ops():
    a = (0, 0, 10, 10)
    b = (5, 5, 20, 20)
    assert area(a) == 100
    assert union(a, b) == (0, 0, 20, 20)
    assert intersect(a, b) == (5, 5, 10, 10)
    assert intersect_area(a, b) == 25
    # disjoint → zero-area intersection (shape.py degenerate clamp analog)
    c = (50, 50, 60, 60)
    assert area(intersect(a, c)) == 0.0
    assert intersect_area(a, c) == 0.0
    assert is_inside((2, 2, 8, 8), a)
    assert not is_inside((2, 2, 11, 8), a)
    assert is_inside((2, 2, 11, 8), a, margin=1)  # shape.py:121-127 margin
    assert overlap_ratio_min(a, b) == 25 / 100


# ------------------------------------------------------------------ kinds
def test_kind_from_label():
    assert kind_from_label("Text") == BlockKind.Text
    assert kind_from_label("plain text region") == BlockKind.Text
    # the reference bug (block.py:31) is fixed: most-specific first
    assert kind_from_label("TextWithEquation") == BlockKind.TextWithEquation
    assert kind_from_label("figure_caption") == BlockKind.FigureCaption
    assert kind_from_label("table-caption") == BlockKind.TableCaption
    assert kind_from_label("caption") == BlockKind.Caption
    assert kind_from_label("EmbedEq") == BlockKind.EmbedEq
    assert kind_from_label("equation") == BlockKind.Equation
    assert kind_from_label("mystery") == BlockKind.Unknown
    assert is_text_block(BlockKind.Header) and not is_text_block(BlockKind.Figure)


# ----------------------------------------------------------------- reflow
def test_xy_cut_two_column_aligned_rows_interleave():
    # When row gaps align across both columns, the alternating guillotine
    # finds the horizontal cuts first → row-major interleave.  This is the
    # reference's actual behavior (traced through xy_cut_reflow.py:136-186):
    # vertical_region splits the page into row bands before any column cut.
    rects = [
        (55, 20, 95, 30),  # right col, first row
        (55, 32, 95, 42),  # right col, second row
        (5, 20, 45, 30),   # left col, first row
        (5, 32, 45, 42),   # left col, second row
        (5, 0, 95, 10),    # header band
        (5, 50, 95, 60),   # footer band
    ]
    order = xy_cut_reflow(rects, margin=0.0)
    assert order == [4, 2, 0, 3, 1, 5]


def test_xy_cut_two_column_staggered_rows_column_major():
    # Staggered (y-overlapping) column rows leave no clean horizontal cut
    # inside the column zone, so the x-cut at the gutter wins → true
    # column-major reading order: header, left column, right column, footer.
    rects = [
        (55, 20, 95, 33),  # right col, row 1 (height 13: overlaps left gaps)
        (55, 35, 95, 48),  # right col, row 2
        (5, 20, 45, 30),   # left col, row 1 (height 10)
        (5, 32, 45, 42),   # left col, row 2
        (5, 0, 95, 10),    # header band
        (5, 55, 95, 65),   # footer band
    ]
    order = xy_cut_reflow(rects, margin=0.0)
    assert order == [4, 2, 3, 0, 1, 5]


def test_xy_cut_single_column_is_top_to_bottom():
    rects = [(0, 30, 100, 40), (0, 0, 100, 10), (0, 15, 100, 25)]
    assert xy_cut_reflow(rects, margin=0.0) == [1, 2, 0]


def test_xy_cut_overlapping_falls_back_to_grid():
    # heavily overlapping boxes: no clean cut exists at any depth → the
    # depth>max_depth grid fallback (xy_cut_reflow.py:74-75,148-149)
    rects = [(0, 5 * i, 100, 5 * i + 20) for i in range(6)]
    random.Random(7).shuffle(rects)
    order = xy_cut_reflow(rects, margin=0.0, max_depth=2)
    assert sorted(order) == list(range(6))
    ys = [rects[i][1] for i in order]
    assert ys == sorted(ys)


def test_simple_position_reflow_grid():
    # The reference grid key is the tuple (x//sf_x, y//sf_y, ...) — x
    # dominant (xy_cut_reflow.py:34-35): a bottom-LEFT block sorts before a
    # top-RIGHT one when their x buckets differ.  Faithfully replicated.
    rects = [(0, 100, 30, 110), (0, 0, 30, 10), (70, 0, 100, 10)]
    out = simple_position_reflow(rects, [0, 1, 2])
    assert out == [1, 0, 2]


def test_position_reflow():
    rects = [(0, 500, 300, 520), (0, 0, 300, 20), (700, 0, 1000, 20)]
    assert position_reflow(rects, page_h=1400, page_w=1000) == [1, 0, 2]


# ---------------------------------------------------------------- overlap
def _r(x1, y1, x2, y2, kind, text=None):
    return Region(rect=(x1, y1, x2, y2), kind=kind, text=text)


def test_overlap_merge_same_kind():
    regions = [
        _r(0, 0, 10, 10, BlockKind.Text, "a"),
        _r(1, 1, 9, 9, BlockKind.Text, "b"),   # fully inside → conflict
        _r(50, 50, 60, 60, BlockKind.Text, "c"),
    ]
    out = remove_overlapping(regions, strategy="merge")
    assert len(out) == 2
    # merge keeps the LATER block with the union bbox (layout.py:118-126)
    assert out[0].text == "b"
    assert out[0].rect == (0, 0, 10, 10)
    assert out[1].text == "c"


def test_overlap_merge_max_enum_kind_wins():
    # Text(1) vs Title(2) — both textual so they are candidates; merged kind
    # must be the max enum value: Title (layout.py:120-126)
    regions = [
        _r(0, 0, 10, 10, BlockKind.Title, "t"),
        _r(0, 0, 10, 10, BlockKind.Text, "x"),
    ]
    out = remove_overlapping(regions, strategy="merge")
    assert len(out) == 1
    assert out[0].kind == BlockKind.Title


def test_overlap_different_nontext_kinds_untouched():
    regions = [
        _r(0, 0, 10, 10, BlockKind.Text, "a"),
        _r(0, 0, 10, 10, BlockKind.Figure),
    ]
    out = remove_overlapping(regions, strategy="merge")
    assert len(out) == 2


def test_overlap_below_threshold_untouched():
    regions = [
        _r(0, 0, 10, 10, BlockKind.Text, "a"),
        _r(8, 8, 18, 18, BlockKind.Text, "b"),  # 4/100 overlap
    ]
    assert len(remove_overlapping(regions)) == 2


def test_overlap_keep_large_keep_small():
    regions = [
        _r(0, 0, 10, 10, BlockKind.Text, "big"),
        _r(2, 2, 8, 8, BlockKind.Text, "small"),
    ]
    assert [b.text for b in remove_overlapping(regions, strategy="keep_large")] == ["big"]
    assert [b.text for b in remove_overlapping(regions, strategy="keep_small")] == ["small"]


# --------------------------------------------------------------- textnorm
def _lev_ref(s1, s2):
    # the reference DP, verbatim semantics (text_utils.py:1-18)
    if len(s1) < len(s2):
        return _lev_ref(s2, s1)
    if len(s2) == 0:
        return len(s1)
    previous_row = range(len(s2) + 1)
    for i, c1 in enumerate(s1):
        current_row = [i + 1]
        for j, c2 in enumerate(s2):
            insertions = previous_row[j + 1] + 1
            deletions = current_row[j] + 1
            substitutions = previous_row[j] + (c1 != c2)
            current_row.append(min(insertions, deletions, substitutions))
        previous_row = current_row
    return previous_row[-1]


def test_levenshtein_matches_reference_dp():
    rng = random.Random(42)
    cases = [("", ""), ("a", ""), ("", "abc"), ("kitten", "sitting"),
             ("flaw", "lawn"), ("同样的文本", "同样文本啊")]
    for _ in range(40):
        n1, n2 = rng.randint(0, 30), rng.randint(0, 30)
        s1 = "".join(rng.choice("abc字表图 ") for _ in range(n1))
        s2 = "".join(rng.choice("abc字表图 ") for _ in range(n2))
        cases.append((s1, s2))
    for s1, s2 in cases:
        assert levenshtein_distance(s1, s2) == _lev_ref(s1, s2), (s1, s2)


def test_reconcile_rule():
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("quick", "qvick")  # tiny distance
    far = "zzz " * len(base.split())
    assert reconcile(base, base) == (base, "channel")
    assert reconcile(base, near) == (near, "channel")
    assert reconcile(base, far)[1] == "extractor"
    assert reconcile(base, "") == (base, "extractor")
    assert reconcile("", "") == ("", "channel")


def test_normalized_distance_long_docs_deterministic():
    a = "\n".join(f"line {i} content payload" for i in range(3000))
    b = "\n".join(
        f"line {i} content payload" if i % 50 else f"line {i} changed"
        for i in range(3000)
    )
    d1 = normalized_distance(a, b)
    d2 = normalized_distance(a, b)
    assert d1 == d2
    assert 0.0 < d1 < 0.2
    c = "\n".join(f"totally different {i}" for i in range(3000))
    assert normalized_distance(a, c) > 0.2


def test_caption_crossref_drop():
    assert caption_crossref_drop("图1 概览")
    assert caption_crossref_drop("表2 指标")
    assert caption_crossref_drop("详细结果见表3。")
    assert not caption_crossref_drop("x" * 300 + "见表3")
    assert not caption_crossref_drop("normal paragraph text")


def test_reconcile_decision_equals_normalized_distance():
    """The shortcut decision path (Hamming upper bound, early-exit lower
    bound) must be bit-identical to the exact tiered distance compare."""
    import random

    from latyas_ray.textnorm import (
        RECONCILE_THRESHOLD,
        _accept_candidate,
        normalized_distance,
    )

    rng = random.Random(7)

    def randstr(n, alpha="abcdef \n"):
        return "".join(rng.choice(alpha) for _ in range(n))

    for trial in range(600):
        kind = trial % 5
        if kind == 0:
            a, b = randstr(rng.randint(0, 200)), randstr(rng.randint(0, 200))
        elif kind == 1:
            a = randstr(rng.randint(1, 400))
            chars = list(a)
            for i in range(0, len(chars), rng.randint(5, 60)):
                chars[i] = "~"
            b = "".join(chars)
        elif kind == 2:
            a = randstr(rng.randint(1, 150))
            b = a + randstr(rng.randint(0, 40))
        elif kind == 3:
            a = randstr(rng.randint(8200, 8600))
            b = randstr(len(a))
        else:
            a, b = randstr(rng.randint(1, 50)), ""
        assert _accept_candidate(a, b) == (
            normalized_distance(a, b) < RECONCILE_THRESHOLD
        ), (kind, a[:50], b[:50])
