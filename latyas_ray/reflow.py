"""Reading-order sort: recursive XY-cut over block rects.

Pure-function re-expression of the reference's
``latyas/layout/reflow/position_based/xy_cut_reflow.py`` (entry
``xy_cut_reflow`` at ``xy_cut_reflow.py:189-202``; ``horizontal_region``
``:62-111``; ``vertical_region`` ``:136-186``; grid fallback
``simple_position_reflow`` ``:14-37``) and ``position_reflow.py:8-21``.

These operate on one page's rect list — page-local, never a dataset sort —
so in the Ray pipeline they run inside ``map_batches`` UDFs with zero
shuffle (SURVEY.md §2.6).

Faithfulness notes:

- Guillotine splits alternate horizontal (x) / vertical (y); candidate split
  coordinates are every rect edge ± margin; a split is taken only when no
  rect straddles it (``horizontal_overlap``/``vertical_overlap`` semantics,
  ``xy_cut_reflow.py:40-59,114-133``).
- The margin shrinks with depth: ``margin - depth * (margin / max_depth)``
  (``xy_cut_reflow.py:96,171``).
- Recursion deeper than ``max_depth`` (8 at the entry point,
  ``xy_cut_reflow.py:199``) falls back to the quantized grid sort
  (``simple_position_reflow``), whose scale factors are ``(h//16, w//3)``
  (``xy_cut_reflow.py:29``) — we clamp the factors to ≥1 where the
  reference would raise ``ZeroDivisionError`` on sub-3-pixel extents
  (unreachable in its working flows; documented deviation).
- ``simple_position_reflow`` seeds its min/max scan from the *global* first
  rect, not the subset (``xy_cut_reflow.py:19``) — replicated.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .geometry import Rect


def simple_position_reflow(rects: Sequence[Rect], idxs: List[int]) -> List[int]:
    """Grid-bucket sort fallback (``xy_cut_reflow.py:14-37``)."""
    min_x, min_y, max_x, max_y = rects[0]  # global first rect, as in :19
    for i in idxs:
        x, y, x2, y2 = rects[i]
        min_x = min(min_x, x)
        max_x = max(max_x, x2)
        min_y = min(min_y, y)
        max_y = max(max_y, y2)
    w = max_x - min_x
    h = max_y - min_y
    sf_y = max(1, int(h) // 16)
    sf_x = max(1, int(w) // 3)
    keyed = []
    for i in idxs:
        x, y, x2, y2 = (int(v) for v in rects[i])
        keyed.append(((x // sf_x, y // sf_y, x2 // sf_x, y2 // sf_y), i))
    keyed.sort(key=lambda t: t[0])
    return [i for _, i in keyed]


def position_reflow(rects: Sequence[Rect], page_h: float, page_w: float) -> List[int]:
    """Standalone grid sort over a whole page (``position_reflow.py:8-21``):
    quantize to an ``(h/256, w/3)`` grid and sort lexicographically."""
    sf_y = max(1, int(page_h) // 256)
    sf_x = max(1, int(page_w) // 3)
    keyed = []
    for i, (x, y, x2, y2) in enumerate(rects):
        keyed.append(
            ((int(x) // sf_x, int(y) // sf_y, int(x2) // sf_x, int(y2) // sf_y), i)
        )
    keyed.sort(key=lambda t: t[0])
    return [i for _, i in keyed]


def _region(
    arr: np.ndarray,
    idxs: np.ndarray,
    margin: float,
    depth: int,
    max_depth: int,
    axis: int,
) -> List[int]:
    """One guillotine level; ``axis`` 0 = split on x (``horizontal_region``
    :62-111), 1 = split on y (``vertical_region`` :136-186).

    Semantics are identical to the reference's per-cut loop
    (``horizontal_overlap``/``vertical_overlap``, :40-59/:114-133) —
    ascending cut order, relative-order preservation, exact ``<=``/``>=``
    equality behavior — but computed as an O(n log n) searchsorted sweep
    instead of an O(n²) per-cut rescan.  The loop-free form is valid
    because a rect split off at an earlier cut ``c1 <= c`` has
    ``end <= c1 <= c`` and so can never straddle (``start < c < end``) any
    later cut: the straddle test over the remaining set equals the test
    over the whole region set, so every cut's validity is decidable up
    front.  Each rect then joins the group of the first valid cut ``>=``
    its end (hot-path cost of a 5000-block page drops from seconds to
    milliseconds — an inefficiency of the reference we do not copy)."""
    if idxs.shape[0] <= 1:
        return [int(i) for i in idxs]
    if depth > max_depth:
        return simple_position_reflow(arr, [int(i) for i in idxs])

    a0, a1 = (0, 2) if axis == 0 else (1, 3)
    starts = arr[idxs, a0]
    ends = arr[idxs, a1]
    cuts = np.sort(np.concatenate([starts - margin, ends + margin]))

    # straddlers(c) = #{start < c} - #{end <= c} + #{start == end == c};
    # the last term restores degenerate zero-extent rects sitting exactly
    # on the cut, which the first two counts would otherwise misclassify.
    s_sorted = np.sort(starts)
    e_sorted = np.sort(ends)
    n_lt = np.searchsorted(s_sorted, cuts, side="left")
    n_le = np.searchsorted(e_sorted, cuts, side="right")
    deg = np.sort(starts[starts == ends])
    if deg.size:
        n_deg = np.searchsorted(deg, cuts, side="right") - np.searchsorted(
            deg, cuts, side="left"
        )
        straddle = n_lt - n_le + n_deg
    else:
        straddle = n_lt - n_le
    valid = cuts[straddle == 0]

    # group id = index of the first valid cut >= the rect's end; the
    # leftover tail (end beyond every valid cut) gets id len(valid).
    gid = np.searchsorted(valid, ends, side="left")
    child_margin = margin - depth * (margin / max_depth)
    out: List[int] = []
    order = np.argsort(gid, kind="stable")  # stable: keeps original order
    sorted_gid = gid[order]
    bounds = np.flatnonzero(np.diff(sorted_gid)) + 1
    groups = np.split(order, bounds) if order.size else []
    if len(groups) == 1:
        # no cut separated anything: recurse once on the whole set with the
        # alternate axis, exactly like the reference's final leftover call
        return _region(arr, idxs, child_margin, depth + 1, max_depth, 1 - axis)
    for grp in groups:
        out.extend(
            _region(arr, idxs[grp], child_margin, depth + 1, max_depth, 1 - axis)
        )
    return out


def xy_cut_reflow(
    rects: Sequence[Rect],
    margin: float = 10.0,
    horizontal_first: bool = True,
    max_depth: int = 8,
) -> List[int]:
    """Return the reading-order permutation of ``rects``
    (``xy_cut_reflow.py:189-202``; entry uses ``max_depth=8``)."""
    n = len(rects)
    if n == 0:
        return []
    arr = np.asarray(rects, dtype=np.float64)
    axis = 0 if horizontal_first else 1
    return _region(arr, np.arange(n), float(margin), 0, max_depth, axis)
