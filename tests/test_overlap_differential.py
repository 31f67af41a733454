"""Differential property test: ``overlap.remove_overlapping`` must match a
straight port of the reference's mutating loop
(``/root/reference/latyas/layout/layout.py:86-132`` with the Rectangle
semantics of ``shape.py:70-149``, including the constructor's degenerate
clamp) over randomized region sets for all three strategies — earning the
"semantics preserved exactly" claim (incl. the condemned-``block_i``
quirk) the same way the XY-cut sweep earns its own.

Inputs are generated non-inverted (x1 ≤ x2, y1 ≤ y2) — the documented
deviation in ``geometry.py`` (no ctor clamp on raw tuples) only diverges
for inverted inputs, which no channel produces.
"""

import random

from latyas_ray.blocks import BlockKind
from latyas_ray.overlap import Region, remove_overlapping

STRATEGIES = ["merge", "keep_large", "keep_small"]
KINDS = [
    BlockKind.Text, BlockKind.Title, BlockKind.Caption, BlockKind.Figure,
    BlockKind.Table, BlockKind.Header, BlockKind.Footer, BlockKind.Equation,
    BlockKind.Unknown,
]

_TEXTUAL = {
    BlockKind.Text, BlockKind.Caption, BlockKind.FigureCaption,
    BlockKind.TableCaption, BlockKind.Title, BlockKind.Reference,
    BlockKind.Header, BlockKind.Footer,
}


# ---- straight port of layout.py:86-132 / shape.py:70-149 ----


def _clamp(x1, y1, x2, y2):
    if x1 >= x2:
        x2 = x1
    if y1 >= y2:
        y2 = y1
    return (x1, y1, x2, y2)


def _area(r):
    return (r[2] - r[0]) * (r[3] - r[1])


def _intersect(a, b):
    return _clamp(max(a[0], b[0]), max(a[1], b[1]),
                  min(a[2], b[2]), min(a[3], b[3]))


def _union(a, b):
    return _clamp(min(a[0], b[0]), min(a[1], b[1]),
                  max(a[2], b[2]), max(a[3], b[3]))


def _ref_remove_overlapping(blocks, area_threshold=0.5, strategy="merge"):
    blocks = [dict(b) for b in blocks]
    to_remove = []
    for block_i in range(len(blocks)):
        if block_i in to_remove:
            continue
        for block_j in range(block_i + 1, len(blocks)):
            lhs = blocks[block_i]
            rhs = blocks[block_j]
            if lhs["kind"] != rhs["kind"]:
                if not (lhs["kind"] in _TEXTUAL and rhs["kind"] in _TEXTUAL):
                    continue
            inter = _intersect(lhs["rect"], rhs["rect"])
            if (
                _area(inter) > area_threshold * _area(lhs["rect"])
                or _area(inter) > area_threshold * _area(rhs["rect"])
            ):
                if strategy == "keep_large":
                    if _area(lhs["rect"]) > _area(rhs["rect"]):
                        to_remove.append(block_j)
                    else:
                        to_remove.append(block_i)
                elif strategy == "keep_small":
                    if _area(lhs["rect"]) < _area(rhs["rect"]):
                        to_remove.append(block_j)
                    else:
                        to_remove.append(block_i)
                else:  # merge
                    to_remove.append(block_i)
                    if lhs["kind"].value > rhs["kind"].value:
                        merge_kind = lhs["kind"]
                    else:
                        merge_kind = rhs["kind"]
                    blocks[block_j]["kind"] = merge_kind
                    blocks[block_j]["rect"] = _union(lhs["rect"], rhs["rect"])
    dead = sorted(set(to_remove))
    for block_i in reversed(dead):
        blocks.pop(block_i)
    return blocks


def _random_regions(rng: random.Random):
    n = rng.randrange(0, 18)
    out = []
    for i in range(n):
        x = rng.randrange(0, 120)
        y = rng.randrange(0, 160)
        # heavy overlap pressure: small page, sometimes zero-extent
        w = rng.choice([0, 1, 5, 20, 40, 80])
        h = rng.choice([0, 1, 5, 15, 30, 60])
        out.append(
            {"rect": (float(x), float(y), float(x + w), float(y + h)),
             "kind": rng.choice(KINDS), "text": f"t{i}"}
        )
    # force some exact duplicates and containments
    if n >= 3 and rng.random() < 0.5:
        out[1] = dict(out[0], text="t1")
        x1, y1, x2, y2 = out[0]["rect"]
        out[2] = {"rect": (x1, y1, (x1 + x2) / 2, (y1 + y2) / 2),
                  "kind": out[0]["kind"], "text": "t2"}
    return out


def test_remove_overlapping_matches_reference_port_fuzz():
    rng = random.Random(0x0EE7)
    for case in range(2000):
        blocks = _random_regions(rng)
        strategy = rng.choice(STRATEGIES)
        thresh = rng.choice([0.3, 0.5, 0.8])
        expect = _ref_remove_overlapping(blocks, thresh, strategy)
        regions = [
            Region(rect=b["rect"], kind=b["kind"], text=b["text"])
            for b in blocks
        ]
        got = remove_overlapping(regions, area_threshold=thresh,
                                 strategy=strategy)
        assert [(r.rect, r.kind, r.text) for r in got] == [
            (b["rect"], b["kind"], b["text"]) for b in expect
        ], f"case {case}: strategy={strategy} thresh={thresh} blocks={blocks}"
