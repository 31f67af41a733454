"""Overlapping-region resolution (page-local dedup/merge).

Pure-function re-expression of ``Layout.remove_overlapping``
(``/root/reference/latyas/layout/layout.py:86-132``).  Operates on one
page's region list — O(n²) over the handful of blocks of a single page,
inside a ``map_batches`` UDF; never a dataset-level operation
(SURVEY.md §2.7).

Semantics preserved exactly:

- Only pairs of the same kind, or pairs where both kinds are textual
  (``is_text_block``), are candidates (``layout.py:99-101``).
- A pair conflicts when the intersection area exceeds
  ``area_threshold`` × either rect's area (``layout.py:103-107``).
- ``merge``: the *earlier* block is removed; the later block takes the
  union bbox and the **max-enum-value** kind (``layout.py:118-126``).
- ``keep_large`` / ``keep_small`` drop the smaller/larger of the pair
  (``layout.py:108-117``).
- The scan order and the quirk that an already-condemned ``block_i`` keeps
  participating in later comparisons within its inner loop are replicated
  (the outer ``if block_i in to_remove: continue`` guard is only checked on
  entry, ``layout.py:88-90``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from .blocks import BlockKind, is_text_block
from .geometry import Rect, area, intersect_area, union


@dataclass
class Region:
    """One detected region of one page — the engine's analog of the
    reference's ``Block`` (``block.py:124-165``), immutable-by-convention
    inside batch UDFs."""

    rect: Rect
    kind: BlockKind
    text: Optional[str] = None
    conf: float = 1.0
    dom_path: Optional[str] = None
    page: int = -1
    meta: dict = field(default_factory=dict)


def remove_overlapping(
    regions: List[Region],
    area_threshold: float = 0.5,
    strategy: str = "merge",
) -> List[Region]:
    """Resolve overlapping regions; returns a new list (input not mutated)."""
    if strategy not in ("merge", "keep_large", "keep_small"):
        raise ValueError(f"Unsupported overlapping strategy: {strategy}")

    blocks = [
        Region(r.rect, r.kind, r.text, r.conf, r.dom_path, r.page, dict(r.meta))
        for r in regions
    ]
    to_remove: List[int] = []
    n = len(blocks)
    for i in range(n):
        if i in to_remove:
            continue
        for j in range(i + 1, n):
            lhs, rhs = blocks[i], blocks[j]
            if lhs.kind != rhs.kind:
                if not (is_text_block(lhs.kind) and is_text_block(rhs.kind)):
                    continue
            inter = intersect_area(lhs.rect, rhs.rect)
            if (
                inter > area_threshold * area(lhs.rect)
                or inter > area_threshold * area(rhs.rect)
            ):
                if strategy == "keep_large":
                    if area(lhs.rect) > area(rhs.rect):
                        to_remove.append(j)
                    else:
                        to_remove.append(i)
                elif strategy == "keep_small":
                    if area(lhs.rect) < area(rhs.rect):
                        to_remove.append(j)
                    else:
                        to_remove.append(i)
                else:  # merge — layout.py:118-126
                    to_remove.append(i)
                    merge_kind = lhs.kind if lhs.kind.value > rhs.kind.value else rhs.kind
                    rhs.kind = merge_kind
                    rhs.rect = union(lhs.rect, rhs.rect)

    dead = set(to_remove)
    return [b for k, b in enumerate(blocks) if k not in dead]
