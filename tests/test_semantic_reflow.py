"""A9 semantic reflow: unit tests + randomized differential fuzz against a
verbatim port of the reference loop.

The port below is a straight transcription of
``latyas/layout/reflow/semantic_based/bert_reflow.py:11-53`` operating on
a minimal Layout shim, with exactly two published-code repairs (both
documented in ``functions/semantic_reflow.py``): the seed call resolves
to the ``position_reflow`` *function* (``position_reflow.py:5-19`` —  the
reference imports the package and calls the module), and the
``BertForNextSentencePrediction`` margin is supplied by the injected
scorer (no torch in this sandbox).  Everything else — the mutating pair
scan, the geometric gate, the None-text skip, the strict threshold —
is kept verbatim so the engine's re-expression is pinned to the
reference's observable behavior.
"""

import random

from latyas_ray.functions.semantic_reflow import (
    DigestNSPScorer,
    semantic_reflow,
)
from latyas_ray.pipelines.semantic_pipeline import reflow_rows_for_doc


class _Shape:
    def __init__(self, bbox):
        self.boundingbox = bbox


class _Block:
    def __init__(self, bbox, text):
        self.shape = _Shape(bbox)
        self.text = text


class _Layout:
    """Shim for latyas.layout.layout.Layout: indexable blocks + page img."""

    def __init__(self, blocks, page_h, page_w):
        self._blocks = blocks
        self._page_shape = (int(page_h), int(page_w), 3)

    def __len__(self):
        return len(self._blocks)

    def __getitem__(self, i):
        return self._blocks[i]


def _port_position_reflow(page_layout, h_chunk=256, w_chunk=3):
    # position_reflow.py:5-19 (page img shape via the shim; sf clamped to
    # >=1 — the strict reference raises ZeroDivisionError for pages
    # narrower than one chunk, unreachable in its working flows)
    page_shape = page_layout._page_shape
    sf = (max(1, page_shape[0] // h_chunk), max(1, page_shape[1] // w_chunk))
    sorted_bbox = []
    for bbox_i in range(len(page_layout)):
        x, y, x2, y2 = page_layout[bbox_i].shape.boundingbox
        x, y, x2, y2 = int(x), int(y), int(x2), int(y2)
        sorted_bbox.append(((x // sf[1], y // sf[0], x2 // sf[1], y2 // sf[0]), bbox_i))
    sorted_bbox = sorted(sorted_bbox, key=lambda x: x[0])
    return [item[1] for item in sorted_bbox]


def _port_bert_reflow(page_layout, scorer, threshold=3):
    # bert_reflow.py:11-53 verbatim (scorer in place of the BERT call)
    position_blocks = _port_position_reflow(page_layout)
    for bbox_i in range(len(position_blocks)):
        for bbox_j in range(bbox_i, len(position_blocks)):
            if bbox_i == bbox_j:
                continue
            lhs_bbox = page_layout[position_blocks[bbox_i]].shape.boundingbox
            rhs_bbox = page_layout[position_blocks[bbox_j]].shape.boundingbox

            if rhs_bbox[0] < lhs_bbox[2] and rhs_bbox[1] < lhs_bbox[3]:
                continue
            lhs_text = page_layout[position_blocks[bbox_i]].text
            rhs_text = page_layout[position_blocks[bbox_j]].text
            if lhs_text is None or rhs_text is None:
                continue
            logits = scorer.score_pair(lhs_text, rhs_text)
            if logits[0] - logits[1] > threshold:
                old_ele = position_blocks[bbox_j]
                del position_blocks[bbox_j]
                position_blocks.insert(bbox_i + 1, old_ele)
    return position_blocks


def _random_case(rng):
    n = rng.randint(0, 12)
    rects, texts = [], []
    page_h = rng.choice([256, 300, 512, 1024, 2048])
    page_w = rng.choice([3, 100, 640, 1000])
    for _ in range(n):
        x = rng.randint(0, max(1, page_w - 2))
        y = rng.randint(0, max(1, page_h - 2))
        w = rng.randint(1, page_w - x)
        h = rng.randint(1, page_h - y)
        rects.append((float(x), float(y), float(x + w), float(y + h)))
        texts.append(
            None if rng.random() < 0.15 else f"t{rng.randint(0, 30)} " * rng.randint(1, 4)
        )
    return rects, texts, page_h, page_w


def test_differential_vs_reference_port():
    scorer = DigestNSPScorer()
    rng = random.Random(0xA9)
    for case in range(800):
        rects, texts, page_h, page_w = _random_case(rng)
        layout = _Layout(
            [_Block(r, t) for r, t in zip(rects, texts)], page_h, page_w
        )
        expect = _port_bert_reflow(layout, scorer)
        got = semantic_reflow(
            rects, texts, scorer, page_h=float(page_h), page_w=float(page_w)
        )
        assert got == expect, f"case {case}: {got} vs {expect}"


def test_empty_and_single():
    s = DigestNSPScorer()
    assert semantic_reflow([], [], s) == []
    assert semantic_reflow([(0.0, 0.0, 10.0, 10.0)], ["x"], s) == [0]


class _FixedScorer:
    """margin table keyed by (lhs, rhs); default: far below threshold."""

    def __init__(self, table):
        self.table = table

    def score_pair(self, lhs, rhs):
        return self.table.get((lhs, rhs), -10.0), 0.0


def test_promotion_moves_block_adjacent():
    # three stacked full-width blocks a, b, c; scorer says c follows a
    rects = [
        (0.0, 0.0, 600.0, 100.0),
        (0.0, 120.0, 600.0, 200.0),
        (0.0, 220.0, 600.0, 300.0),
    ]
    texts = ["a", "b", "c"]
    order = semantic_reflow(
        rects, texts, _FixedScorer({("a", "c"): 10.0}),
        page_h=1024.0, page_w=600.0,
    )
    assert order == [0, 2, 1]


def test_geometric_gate_blocks_promotion():
    # rhs starts before lhs ends on BOTH axes -> pair skipped even with a
    # huge margin (bert_reflow.py:26)
    rects = [(0.0, 0.0, 600.0, 300.0), (10.0, 10.0, 200.0, 100.0)]
    texts = ["a", "b"]
    order = semantic_reflow(
        rects, texts, _FixedScorer({("a", "b"): 10.0, ("b", "a"): 10.0}),
        page_h=1024.0, page_w=600.0,
    )
    # seed is [0, 1] (a's grid key sorts first); the gate must block the
    # promotion of the contained block despite the huge margin
    assert order == [0, 1]


def test_none_text_skipped():
    rects = [
        (0.0, 0.0, 600.0, 100.0),
        (0.0, 120.0, 600.0, 200.0),
    ]
    order = semantic_reflow(
        rects, [None, "b"], _FixedScorer({}), page_h=1024.0, page_w=600.0
    )
    assert order == [0, 1]


def test_reflow_rows_for_doc_groups_pages():
    regions = [
        {"region_id": 0, "page": 0, "x1": 0.0, "y1": 0.0, "x2": 100.0,
         "y2": 20.0, "char_start": 0, "char_end": 5},
        {"region_id": 1, "page": 1, "x1": 0.0, "y1": 0.0, "x2": 100.0,
         "y2": 20.0, "char_start": 6, "char_end": 11},
        {"region_id": 2, "page": 0, "x1": 0.0, "y1": 30.0, "x2": 100.0,
         "y2": 50.0, "char_start": -1, "char_end": -1},
    ]
    rows = reflow_rows_for_doc("u", "hello world", regions, DigestNSPScorer())
    # one row per region; page-local sem_order starts at 0 on each page
    assert len(rows) == 3
    assert {r[1] for r in rows} == {0, 1}
    page0 = sorted(r[3] for r in rows if r[1] == 0)
    assert page0 == [0, 1]
    assert [r[3] for r in rows if r[1] == 1] == [0]


def test_region_cap_keeps_positional_order():
    """Pages beyond SEM_REFLOW_MAX_REGIONS keep the grid-seed order even
    under an always-promote scorer; below the cap the same scorer
    reorders — proving the cap (not scorer behavior) is what gates."""
    from latyas_ray.functions.semantic_reflow import (
        SEM_REFLOW_MAX_REGIONS,
        NSPScorer,
        semantic_reflow,
    )
    from latyas_ray.reflow import position_reflow

    class AlwaysPromote(NSPScorer):
        def score_pair(self, lhs, rhs):
            return 10.0, 0.0

    def column(n):
        # vertical stack: every (i, j>i) pair passes the geometric gate
        rects = [(0.0, float(20 * i), 10.0, float(20 * i + 10)) for i in range(n)]
        texts = [f"t{i}" for i in range(n)]
        return rects, texts

    n_big = SEM_REFLOW_MAX_REGIONS + 1
    rects, texts = column(n_big)
    seed = position_reflow(rects, float(20 * n_big), 10.0)
    assert semantic_reflow(rects, texts, AlwaysPromote()) == seed

    rects5, texts5 = column(5)
    seed5 = position_reflow(rects5, 100.0, 10.0)
    assert semantic_reflow(rects5, texts5, AlwaysPromote()) != seed5
