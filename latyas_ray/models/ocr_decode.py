"""OCR decode postprocessing — pure-numpy re-expressions of the two
PaddleOCR inference kernels the reference vendors
(``/root/reference/latyas/layout/models/texteller/thrid_party/paddleocr/
infer/CTCLabelDecode.py:1-214`` and ``DBPostProcess.py:1-230``), the
final "missing" item of VERDICT r2.  These are the day-one requirement
for dropping real Paddle weights into the OCR protocol: the ONNX heads
emit (T, C) logit grids and (H, W) probability maps; these kernels turn
them into text and boxes.

**CTC decode** is an exact re-expression (argmax → collapse repeats →
drop blank → charset map → mean confidence) and is differential-tested
against a verbatim port of the reference loop.

**DB postprocess** (quad mode, fast score) replaces the cv2/pyclipper
machinery with equivalent pure geometry, with two documented deviations:

- contours → connected components (8-connectivity, run-based two-pass
  labeling): the min-area rectangle of a component's pixel centers
  equals that of its boundary pixels, so the box is the same; the
  *enumeration order* differs from cv2's (scan order here), which only
  matters through the ``max_candidates`` truncation.
- pyclipper's round-join offset → exact closed form: offsetting a
  convex polygon with round joins is the Minkowski sum with a disk of
  radius d, and for a rectangle the min-area rect of that sum is the
  rectangle grown by d on each side — which is exactly what
  ``unclip → get_mini_boxes`` computes in quad mode.  No polygon
  clipper needed.
- box scoring rasterizes differently: the reference casts the rotated
  quad to int32 and fills with ``cv2.fillPoly``; ``_fill_mean`` tests
  exact float half-planes at pixel coordinates.  For rotated quads the
  two pixel sets differ along boundary rows, so a box whose mean score
  sits within a boundary-pixel's weight of ``box_thresh`` can be kept
  by one implementation and dropped by the other.
- interior holes are not candidates: ``cv2.findContours(RETR_LIST)``
  also emits hole contours (which count against ``max_candidates``);
  connected-component labeling never produces them.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ----------------------------------------------------------- CTC decode

# Default charset when no key file is supplied (the reference loads
# ppocr_keys_v1.txt from its package dir; this sandbox carries none).
DEFAULT_CHARSET = list("0123456789abcdefghijklmnopqrstuvwxyz")


class CTCLabelDecode:
    """``CTCLabelDecode.py:185-214`` + ``decode`` (:127-178): class 0 is
    the CTC blank; repeated indices collapse before blank removal; the
    confidence is the mean of the max-probabilities at kept positions
    (0.0 → the reference substitutes a single 0)."""

    def __init__(self, charset: Optional[Sequence[str]] = None,
                 use_space_char: bool = False):
        chars = list(charset) if charset is not None else list(DEFAULT_CHARSET)
        if use_space_char:
            chars.append(" ")
        self.character = ["blank"] + chars

    def __call__(self, preds: np.ndarray) -> List[Tuple[str, float]]:
        """``preds``: (N, T, C) probability grid → [(text, conf), ...]."""
        if isinstance(preds, (tuple, list)):  # reference accepts head lists
            preds = preds[-1]
        preds = np.asarray(preds)
        idx = preds.argmax(axis=2)
        prob = preds.max(axis=2)
        return self.decode(idx, prob, is_remove_duplicate=True)

    def decode(self, text_index: np.ndarray, text_prob=None,
               is_remove_duplicate: bool = False) -> List[Tuple[str, float]]:
        out = []
        for b in range(len(text_index)):
            seq = np.asarray(text_index[b])
            keep = np.ones(len(seq), dtype=bool)
            if is_remove_duplicate:
                keep[1:] = seq[1:] != seq[:-1]
            keep &= seq != 0  # blank
            text = "".join(self.character[i] for i in seq[keep])
            if text_prob is not None:
                conf = np.asarray(text_prob[b])[keep]
            else:
                # the reference fills [1] * len(selection) — the FULL
                # T-length, so a prob-less decode is conf 1.0 even when
                # everything collapses to blank
                conf = np.ones(len(seq))
            if len(conf) == 0:
                conf = np.array([0.0])
            out.append((text, float(np.mean(conf))))
        return out


# -------------------------------------------------------- DB postprocess

def _label_components(bitmap: np.ndarray) -> List[np.ndarray]:
    """8-connected components of a boolean map as (N_i, 2) arrays of
    (x, y) pixel centers, in scan order of first appearance.  Run-based
    two-pass labeling: runs per row found vectorized, merged with the
    previous row's runs via union-find."""
    h, w = bitmap.shape
    parent: List[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    run_rows: List[Tuple[int, int, int, int]] = []  # (row, x0, x1, label)
    prev: List[Tuple[int, int, int]] = []  # (x0, x1, label) of prev row
    for y in range(h):
        row = bitmap[y]
        if not row.any():
            prev = []
            continue
        d = np.diff(row.astype(np.int8))
        starts = list(np.where(d == 1)[0] + 1)
        ends = list(np.where(d == -1)[0] + 1)
        if row[0]:
            starts = [0] + starts
        if row[-1]:
            ends = ends + [w]
        cur: List[Tuple[int, int, int]] = []
        for x0, x1 in zip(starts, ends):
            label = len(parent)
            parent.append(label)
            # 8-connectivity: half-open runs [x0, x1) and [px0, px1) on
            # adjacent rows touch iff x0 <= px1 and px0 <= x1 (diagonal
            # contact included)
            for px0, px1, plabel in prev:
                if x0 <= px1 and px0 <= x1:
                    union(label, plabel)
            cur.append((x0, x1, label))
            run_rows.append((y, x0, x1, label))
        prev = cur

    groups: Dict[int, List[Tuple[int, int, int]]] = {}
    order: List[int] = []
    for y, x0, x1, label in run_rows:
        root = find(label)
        if root not in groups:
            groups[root] = []
            order.append(root)
        groups[root].append((y, x0, x1))
    comps = []
    for root in order:
        xs, ys = [], []
        for y, x0, x1 in groups[root]:
            xs.append(np.arange(x0, x1, dtype=np.float64))
            ys.append(np.full(x1 - x0, y, dtype=np.float64))
        comps.append(np.column_stack([np.concatenate(xs), np.concatenate(ys)]))
    return comps


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns hull vertices CCW (y-down frame)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out: List[np.ndarray] = []
        for p in seq:
            while len(out) >= 2:
                u, v = out[-1] - out[-2], p - out[-2]
                if u[0] * v[1] - u[1] * v[0] <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(points: np.ndarray) -> Tuple[np.ndarray, Tuple[float, float], float]:
    """Rotating-calipers minimum-area rectangle of a point set —
    (center, (w, h), angle_rad), the cv2.minAreaRect analog."""
    hull = _convex_hull(np.asarray(points, dtype=np.float64))
    if len(hull) == 1:
        return hull[0], (0.0, 0.0), 0.0
    if len(hull) == 2:
        c = hull.mean(axis=0)
        d = hull[1] - hull[0]
        return c, (float(np.hypot(*d)), 0.0), float(np.arctan2(d[1], d[0]))
    best = None
    for i in range(len(hull)):
        e = hull[(i + 1) % len(hull)] - hull[i]
        n = np.hypot(*e)
        if n == 0:
            continue
        ux, uy = e / n
        rot = np.array([[ux, uy], [-uy, ux]])
        proj = hull @ rot.T
        lo = proj.min(axis=0)
        hi = proj.max(axis=0)
        area = (hi[0] - lo[0]) * (hi[1] - lo[1])
        if best is None or area < best[0]:
            center_local = (lo + hi) / 2
            center = center_local @ rot
            best = (area, center, (float(hi[0] - lo[0]), float(hi[1] - lo[1])),
                    float(np.arctan2(uy, ux)))
    return best[1], best[2], best[3]


def _rect_corners(center: np.ndarray, size: Tuple[float, float],
                  angle: float) -> np.ndarray:
    w, h = size
    ux, uy = np.cos(angle), np.sin(angle)
    ex = np.array([ux, uy]) * (w / 2)
    ey = np.array([-uy, ux]) * (h / 2)
    return np.array([center - ex - ey, center + ex - ey,
                     center + ex + ey, center - ex + ey])


def _order_mini_box(corners: np.ndarray) -> np.ndarray:
    """``get_mini_boxes`` corner convention (``DBPostProcess.py:142-161``):
    sort by x, then pick top-left/top-right/bottom-right/bottom-left by
    the pairwise y comparisons."""
    pts = sorted(corners.tolist(), key=lambda p: p[0])
    i1, i4 = (0, 1) if pts[1][1] > pts[0][1] else (1, 0)
    i2, i3 = (2, 3) if pts[3][1] > pts[2][1] else (3, 2)
    return np.array([pts[i1], pts[i2], pts[i3], pts[i4]])


def _fill_mean(pred: np.ndarray, quad: np.ndarray) -> float:
    """``box_score_fast`` (:163-181): mean of ``pred`` over the filled
    quad, evaluated on the quad's integer bounding box with a convex
    point-in-polygon mask."""
    h, w = pred.shape
    xmin = int(np.clip(np.floor(quad[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(quad[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(np.floor(quad[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(quad[:, 1].max()), 0, h - 1))
    xs = np.arange(xmin, xmax + 1)
    ys = np.arange(ymin, ymax + 1)
    gx, gy = np.meshgrid(xs, ys)
    mask = np.ones(gx.shape, dtype=bool)
    q = quad
    for i in range(4):
        a, b = q[i], q[(i + 1) % 4]
        cross = (b[0] - a[0]) * (gy - a[1]) - (b[1] - a[1]) * (gx - a[0])
        mask &= cross >= 0 if _signed_area(q) > 0 else cross <= 0
    if not mask.any():
        return 0.0
    return float(pred[ymin:ymax + 1, xmin:xmax + 1][mask].mean())


def _signed_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


class DBPostProcess:
    """Quad-mode, fast-score DB postprocess (``DBPostProcess.py:8-230``):
    probability map → threshold bitmap → per-component min-area rect →
    size gate → fast box score → unclip growth (exact closed form, see
    module docstring) → second size gate → scale to source frame."""

    def __init__(self, thresh: float = 0.3, box_thresh: float = 0.7,
                 max_candidates: int = 1000, unclip_ratio: float = 2.0):
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio
        self.min_size = 3

    def boxes_from_bitmap(self, pred: np.ndarray, bitmap: np.ndarray,
                          dest_width: int, dest_height: int):
        height, width = bitmap.shape
        boxes, scores = [], []
        for comp in _label_components(bitmap)[: self.max_candidates]:
            center, size, angle = min_area_rect(comp)
            sside = min(size)
            if sside < self.min_size:
                continue
            quad = _order_mini_box(_rect_corners(center, size, angle))
            score = _fill_mean(pred, quad)
            if self.box_thresh > score:
                continue
            # unclip: grow the rect by d = area * ratio / perimeter per side
            w0, h0 = size
            if w0 + h0 == 0:
                continue
            d = (w0 * h0) * self.unclip_ratio / (2 * (w0 + h0))
            grown = (w0 + 2 * d, h0 + 2 * d)
            if min(grown) < self.min_size + 2:
                continue
            box = _order_mini_box(_rect_corners(center, grown, angle))
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_width),
                                0, dest_width)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_height),
                                0, dest_height)
            boxes.append(box.astype(np.int32))
            scores.append(score)
        return boxes, scores

    def __call__(self, outs_dict: Dict[str, np.ndarray],
                 shape_list: Sequence[Sequence[float]]):
        pred = np.asarray(outs_dict["maps"])[:, 0, :, :]
        segmentation = pred > self.thresh
        out = []
        for b in range(pred.shape[0]):
            src_h, src_w = int(shape_list[b][0]), int(shape_list[b][1])
            boxes, _scores = self.boxes_from_bitmap(
                pred[b], segmentation[b], src_w, src_h
            )
            out.append({"points": boxes})
        return out
