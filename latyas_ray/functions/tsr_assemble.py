"""TATR table-structure assembly: detection objects + page tokens → cell
grid — the pure-numpy re-expression of the reference's largest working
subsystem (``/root/reference/latyas/tsr/models/tatr/pipeline.py:299-536``
``objects_to_structures`` / ``structure_to_cells`` and the shared helpers
in ``postprocess.py``: ``nms`` :443, ``nms_by_containment`` :183,
``slot_into_containers`` :208, ``align_supercells`` :538,
``nms_supercells`` :642, ``header_supercell_tree`` :666,
``remove_supercell_overlap`` :846, ``extract_text_from_spans`` :307).

Output cells are ``{"row_nums", "column_nums", "cell text",
"column header", "projected row header", "bbox"}`` — exactly the shape
:mod:`latyas_ray.functions.tsr`'s ``cells_to_csv`` / ``cells_to_html``
serializers consume, so ``objects → cells → csv/html`` now runs end to
end on detection fixtures.

Rect semantics note: the reference imports ``fitz`` but pins
``fitz==0.0.1.dev2`` (the PyPI stub, not PyMuPDF) — the module cannot run
as-pinned.  We pin PyMuPDF's documented Rect algebra, which the code was
written against: ``width/height = max(coord1 - coord0, 0)`` (invalid ⇒
area 0), ``intersect`` is a plain coordinate max/min (may produce an
invalid rect), and the empty rect is the identity of ``include_rect`` —
which is what makes ``Rect()`` a valid union accumulator.

Everything here is deterministic pure Python/numpy: no model, no I/O.
Differential-fuzzed against a verbatim port of the reference loops in
``tests/test_tatr_differential.py`` (the repo's standard mechanism).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

Box = Tuple[float, float, float, float]

# TATR structure-head class map and per-class score thresholds
# (pipeline.py:37-66).
STRUCTURE_CLASS_NAMES = [
    "table", "table column", "table row", "table column header",
    "table projected row header", "table spanning cell", "no object",
]
STRUCTURE_CLASS_THRESHOLDS = {
    "table": 0.5,
    "table column": 0.5,
    "table row": 0.5,
    "table column header": 0.5,
    "table projected row header": 0.5,
    "table spanning cell": 0.5,
    "no object": 10,
}


# ------------------------------------------------------- rect algebra
# PyMuPDF-pinned: see module docstring.

def rect_area(b: Sequence[float]) -> float:
    return max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])


def rect_intersect(a: Sequence[float], b: Sequence[float]) -> Box:
    return (max(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), min(a[3], b[3]))


def inter_area(a: Sequence[float], b: Sequence[float]) -> float:
    return rect_area(rect_intersect(a, b))


def union_boxes(boxes: Sequence[Sequence[float]]) -> Box:
    """Fold of PyMuPDF ``include_rect`` starting from the empty rect:
    empty operands (width or height ≤ 0) are identity; an all-empty input
    yields the empty rect (0, 0, 0, 0)."""
    acc: Optional[Box] = None
    for b in boxes:
        if b[2] - b[0] <= 0 or b[3] - b[1] <= 0:
            continue
        if acc is None:
            acc = (b[0], b[1], b[2], b[3])
        else:
            acc = (min(acc[0], b[0]), min(acc[1], b[1]),
                   max(acc[2], b[2]), max(acc[3], b[3]))
    return acc if acc is not None else (0.0, 0.0, 0.0, 0.0)


def iob(a: Sequence[float], b: Sequence[float]) -> float:
    """Intersection area over the area of ``a`` (postprocess.py:48)."""
    area = rect_area(a)
    return inter_area(a, b) / area if area > 0 else 0.0


def iou(a: Sequence[float], b: Sequence[float]) -> float:
    ia = inter_area(a, b)
    ua = rect_area(union_boxes([a, b]))
    return ia / ua if ua > 0 else 0.0


# ------------------------------------------------- detector postprocess

def outputs_to_objects(
    pred_logits: np.ndarray,
    pred_boxes: np.ndarray,
    img_size: Tuple[float, float],
    class_names: Sequence[str] = STRUCTURE_CLASS_NAMES,
) -> List[dict]:
    """DETR raw head → labeled objects (pipeline.py:331-346): per-query
    softmax → (argmax class, max prob); cxcywh boxes in [0, 1] → absolute
    xyxy; 'no object' queries dropped.  Accepts ``(Q, C)`` logits and
    ``(Q, 4)`` boxes (a leading batch dim of 1 is squeezed)."""
    logits = np.asarray(pred_logits, dtype=np.float64)
    boxes = np.asarray(pred_boxes, dtype=np.float64)
    if logits.ndim == 3:
        logits = logits[0]
    if boxes.ndim == 3:
        boxes = boxes[0]
    z = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(z)
    probs /= probs.sum(axis=-1, keepdims=True)
    labels = probs.argmax(axis=-1)
    scores = probs.max(axis=-1)

    w, h = float(img_size[0]), float(img_size[1])
    cx, cy, bw, bh = boxes.T
    xyxy = np.stack(
        [(cx - 0.5 * bw) * w, (cy - 0.5 * bh) * h,
         (cx + 0.5 * bw) * w, (cy + 0.5 * bh) * h], axis=1
    )
    out = []
    for i in range(len(labels)):
        name = class_names[int(labels[i])]
        if name == "no object":
            continue
        out.append({"label": name, "score": float(scores[i]),
                    "bbox": [float(v) for v in xyxy[i]]})
    return out


# ------------------------------------------------------ shared helpers

def _by_score_desc(objs: List[dict]) -> List[dict]:
    """Stable high-to-low score order (postprocess.py:251)."""
    return sorted(objs, key=lambda o: -o["score"])


def apply_threshold(objs: List[dict], threshold: float) -> List[dict]:
    return [o for o in objs if o["score"] >= threshold]


def slot_into_containers(
    containers: List[dict],
    packages: List[dict],
    overlap_threshold: float = 0.5,
    unique_assignment: bool = True,
    forced_assignment: bool = False,
) -> Tuple[List[List[int]], List[List[int]], List[float]]:
    """Assign each package to the container holding its largest fraction
    (postprocess.py:208-248), vectorized: one (packages × containers)
    overlap-fraction matrix; ties go to the earliest container (the
    reference's stable score sort picks the first maximum)."""
    container_assignments: List[List[int]] = [[] for _ in containers]
    package_assignments: List[List[int]] = [[] for _ in packages]
    best_scores: List[float] = []
    if not containers or not packages:
        return container_assignments, package_assignments, best_scores

    pb = np.array([p["bbox"] for p in packages], dtype=np.float64)
    cb = np.array([c["bbox"] for c in containers], dtype=np.float64)
    ix0 = np.maximum(pb[:, None, 0], cb[None, :, 0])
    iy0 = np.maximum(pb[:, None, 1], cb[None, :, 1])
    ix1 = np.minimum(pb[:, None, 2], cb[None, :, 2])
    iy1 = np.minimum(pb[:, None, 3], cb[None, :, 3])
    inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
    p_area = np.clip(pb[:, 2] - pb[:, 0], 0, None) * np.clip(
        pb[:, 3] - pb[:, 1], 0, None
    )
    # the reference divides by the raw package area (no zero guard);
    # fixtures never contain zero-area tokens, mirror with a safe divide
    # that yields 0 for a degenerate package
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(p_area[:, None] > 0, inter / p_area[:, None], 0.0)

    for pi in range(len(packages)):
        row = frac[pi]
        best_c = int(row.argmax())
        best = float(row[best_c])
        best_scores.append(best)
        if forced_assignment or best >= overlap_threshold:
            container_assignments[best_c].append(pi)
            package_assignments[pi].append(best_c)
        if not unique_assignment:
            order = np.argsort(-row, kind="stable")
            for ci in order:
                ci = int(ci)
                if ci == best_c:
                    continue
                if row[ci] >= overlap_threshold:
                    container_assignments[ci].append(pi)
                    package_assignments[pi].append(ci)
                else:
                    break
    return container_assignments, package_assignments, best_scores


def nms(
    objects: List[dict],
    match_criteria: str = "object2_overlap",
    match_threshold: float = 0.05,
    keep_higher: bool = True,
) -> List[dict]:
    """Customizable NMS (postprocess.py:443-485): walk objects from best
    to worst; drop an object whose overlap metric vs any kept better
    object reaches the threshold.  Division by a zero area suppresses
    nothing (the reference swallows the ZeroDivisionError)."""
    if not objects:
        return []
    objs = sorted(objects, key=lambda o: (-1 if keep_higher else 1) * o["score"])
    bbs = np.array([o["bbox"] for o in objs], dtype=np.float64)
    areas = np.clip(bbs[:, 2] - bbs[:, 0], 0, None) * np.clip(
        bbs[:, 3] - bbs[:, 1], 0, None
    )
    kept: List[int] = []
    for j in range(len(objs)):
        suppressed = False
        for i in kept:
            ia = inter_area(bbs[i], bbs[j])
            if match_criteria == "object1_overlap":
                denom = areas[i]
            elif match_criteria == "object2_overlap":
                denom = areas[j]
            else:  # iou
                denom = areas[i] + areas[j] - ia
            if denom == 0:
                continue
            if ia / denom >= match_threshold:
                suppressed = True
                break
        if not suppressed:
            kept.append(j)
    return [objs[i] for i in kept]


def nms_by_containment(
    containers: List[dict], packages: List[dict], overlap_threshold: float = 0.5
) -> List[dict]:
    """Suppress a container that shares any uniquely-assigned package with
    a better (kept) container, or holds none at all
    (postprocess.py:183-205)."""
    objs = _by_score_desc(containers)
    by_container, _, _ = slot_into_containers(
        objs, packages, overlap_threshold=overlap_threshold,
        unique_assignment=True, forced_assignment=False,
    )
    kept_sets: List[set] = []
    kept_idx: List[int] = []
    for j in range(len(objs)):
        pkg = set(by_container[j])
        if j > 0 and (not pkg or any(pkg & s for s in kept_sets)):
            continue
        kept_sets.append(pkg)
        kept_idx.append(j)
    return [objs[i] for i in kept_idx]


def extract_text_from_spans(
    spans: List[dict],
    join_with_space: bool = True,
    remove_integer_superscripts: bool = True,
) -> str:
    """Token spans → one string (postprocess.py:307-355): spans ordered by
    (block, line, span); every finished line (except the last) is
    stripped; integer superscript spans optionally dropped."""
    join_char = " " if join_with_space else ""
    kept = []
    for s in spans:
        if remove_integer_superscripts and s.get("flags", 0) & 1:
            try:
                int(s["text"])
                continue  # drop integer superscript
            except ValueError:
                pass
        kept.append(s)
    if not kept:
        return ""
    kept = sorted(
        kept, key=lambda s: (s["block_num"], s["line_num"], s["span_num"])
    )
    line_texts: List[str] = []
    cur: List[str] = []
    prev = None
    for s in kept:
        if prev is not None and (
            s["block_num"] != prev["block_num"]
            or s["line_num"] != prev["line_num"]
        ):
            line_text = join_char.join(cur).strip()
            if (line_text and line_text[-1] != " "
                    and not (len(line_text) > 1 and line_text[-1] == "-"
                             and line_text[-2] != " ")):
                if not join_with_space:
                    line_text += " "
            line_texts.append(line_text)
            cur = []
        cur.append(s["text"])
        prev = s
    line_texts.append(join_char.join(cur))  # last line is NOT stripped
    return join_char.join(line_texts).strip()


def _remove_without_content(tokens: List[dict], objs: List[dict]) -> List[dict]:
    """Drop rows/columns whose bbox holds no token text
    (postprocess.py:262-270; containment = ≥50% of the token's area)."""
    out = []
    for o in objs:
        inside = [t for t in tokens if iob(t["bbox"], o["bbox"]) >= 0.5]
        if extract_text_from_spans(inside, remove_integer_superscripts=True).strip():
            out.append(o)
    return out


# --------------------------------------------------- structure assembly

def refine_rows(rows: List[dict], tokens: List[dict]) -> List[dict]:
    if tokens:
        rows = nms_by_containment(rows, tokens, overlap_threshold=0.5)
        rows = _remove_without_content(tokens, rows)
    else:
        rows = nms(rows, match_criteria="object2_overlap",
                   match_threshold=0.5, keep_higher=True)
    if len(rows) > 1:
        rows = sorted(rows, key=lambda o: o["bbox"][1] + o["bbox"][3])
    return rows


def refine_columns(columns: List[dict], tokens: List[dict]) -> List[dict]:
    if tokens:
        columns = nms_by_containment(columns, tokens, overlap_threshold=0.5)
        columns = _remove_without_content(tokens, columns)
    else:
        columns = nms(columns, match_criteria="object2_overlap",
                      match_threshold=0.25, keep_higher=True)
    if len(columns) > 1:
        columns = sorted(columns, key=lambda o: o["bbox"][0] + o["bbox"][2])
    return columns


def align_headers(headers: List[dict], rows: List[dict]) -> List[dict]:
    """Header := convex hull of the unbroken top run of rows the detected
    headers overlap ≥50% of the height of (pipeline.py:94-135); a single
    header only."""
    for row in rows:
        row["column header"] = False
    header_row_nums: List[int] = []
    for header in headers:
        for rn, row in enumerate(rows):
            rh = row["bbox"][3] - row["bbox"][1]
            ov = min(row["bbox"][3], header["bbox"][3]) - max(
                row["bbox"][1], header["bbox"][1]
            )
            if rh > 0 and ov / rh >= 0.5:
                header_row_nums.append(rn)
    if not header_row_nums:
        return []
    if header_row_nums[0] > 0:
        header_row_nums = list(range(header_row_nums[0] + 1)) + header_row_nums
    rect: Optional[Box] = None
    last = -1
    for rn in header_row_nums:
        if rn == last + 1:
            rows[rn]["column header"] = True
            b = rows[rn]["bbox"]
            rect = b if rect is None else union_boxes([rect, b])
            last = rn
        else:
            break  # one header only: stop at the first gap
    return [{"bbox": list(rect if rect is not None else (0, 0, 0, 0))}]


def align_supercells(
    supercells: List[dict], rows: List[dict], columns: List[dict]
) -> List[dict]:
    """Snap each spanning cell to the rows/columns it overlaps ≥50% of
    (postprocess.py:538-639), resolving header-boundary conflicts and
    propagating header span cells upward."""
    aligned: List[dict] = []
    for sc in supercells:
        sc["header"] = False
        header_rows: set = set()
        data_rows: set = set()
        sc_h = sc["bbox"][3] - sc["bbox"][1]
        for rn, row in enumerate(rows):
            rh = row["bbox"][3] - row["bbox"][1]
            ov = min(row["bbox"][3], sc["bbox"][3]) - max(
                row["bbox"][1], sc["bbox"][1]
            )
            if "span" in sc:
                frac = max(ov / rh if rh > 0 else 0.0,
                           ov / sc_h if sc_h > 0 else 0.0)
            else:
                frac = ov / rh if rh > 0 else 0.0
            if frac >= 0.5:
                if row.get("column header"):
                    header_rows.add(rn)
                else:
                    data_rows.add(rn)
        # a supercell cannot straddle the header boundary: drop the
        # smaller group
        if data_rows and header_rows:
            if len(data_rows) > len(header_rows):
                header_rows = set()
            else:
                data_rows = set()
        if header_rows:
            sc["header"] = True
        elif "span" in sc:
            continue  # span supercells must live in the header
        rows_hit = sorted(data_rows | header_rows)
        if not rows_hit:
            continue
        row_rect = union_boxes([rows[rn]["bbox"] for rn in rows_hit])

        sc_w = sc["bbox"][2] - sc["bbox"][0]
        cols_hit: List[int] = []
        for cn, col in enumerate(columns):
            cw = col["bbox"][2] - col["bbox"][0]
            ov = min(col["bbox"][2], sc["bbox"][2]) - max(
                col["bbox"][0], sc["bbox"][0]
            )
            if "span" in sc:
                frac = max(ov / cw if cw > 0 else 0.0,
                           ov / sc_w if sc_w > 0 else 0.0)
                if sc["header"]:
                    frac *= 2  # effectively a 0.25 threshold
            else:
                frac = ov / cw if cw > 0 else 0.0
            if frac >= 0.5:
                cols_hit.append(cn)
        if not cols_hit:
            continue
        col_rect = union_boxes([columns[cn]["bbox"] for cn in cols_hit])

        sc["bbox"] = list(rect_intersect(row_rect, col_rect))
        if len(rows_hit) > 1 or len(cols_hit) > 1:
            sc["row_numbers"] = rows_hit
            sc["column_numbers"] = cols_hit
            aligned.append(sc)
            # a header span cell needs ancestors in every row above it
            if "span" in sc and sc["header"] and len(cols_hit) > 1:
                for rn in range(0, min(rows_hit)):
                    anc_cols = [columns[c]["bbox"] for c in cols_hit]
                    anc_rows = [rows[r]["bbox"] for r in rows_hit]
                    aligned.append({
                        "row_numbers": [rn], "column_numbers": list(cols_hit),
                        "score": sc["score"], "propagated": True,
                        "bbox": [min(b[0] for b in anc_cols),
                                 min(b[1] for b in anc_rows),
                                 max(b[2] for b in anc_cols),
                                 max(b[3] for b in anc_rows)],
                    })
    return aligned


def _shrink_overlap(better: dict, worse: dict) -> None:
    """Shrink ``worse`` one row/column at a time until it no longer shares
    grid cells with ``better`` (postprocess.py:846-893)."""
    common_rows = set(better["row_numbers"]) & set(worse["row_numbers"])
    common_cols = set(better["column_numbers"]) & set(worse["column_numbers"])
    while common_rows and common_cols:
        if len(worse["row_numbers"]) < len(worse["column_numbers"]):
            lo, hi = min(worse["column_numbers"]), max(worse["column_numbers"])
            if hi in common_cols:
                common_cols.remove(hi)
                worse["column_numbers"].remove(hi)
            elif lo in common_cols:
                common_cols.remove(lo)
                worse["column_numbers"].remove(lo)
            else:
                worse["column_numbers"] = []
                common_cols = set()
        else:
            lo, hi = min(worse["row_numbers"]), max(worse["row_numbers"])
            if hi in common_rows:
                common_rows.remove(hi)
                worse["row_numbers"].remove(hi)
            elif lo in common_rows:
                common_rows.remove(lo)
                worse["row_numbers"].remove(lo)
            else:
                worse["row_numbers"] = []
                common_rows = set()


def nms_supercells(supercells: List[dict]) -> List[dict]:
    """Shrink-first supercell NMS (postprocess.py:642-663): lower-scored
    supercells give up overlapping grid cells; a supercell shrunk below a
    genuine span is dropped."""
    objs = _by_score_desc(supercells)
    keep = [True] * len(objs)
    for j in range(1, len(objs)):
        for i in range(j):
            _shrink_overlap(objs[i], objs[j])
        rn, cn = objs[j]["row_numbers"], objs[j]["column_numbers"]
        if (len(rn) < 2 and len(cn) < 2) or not rn or not cn:
            keep[j] = False
    return [o for o, k in zip(objs, keep) if k]


def header_supercell_tree(supercells: List[dict]) -> None:
    """Enforce single-parent header nesting (postprocess.py:666-689):
    every header supercell must have exactly one ancestor supercell in
    each row above its top row; violators are removed in place."""
    headers = _by_score_desc(
        [sc for sc in supercells if sc.get("header")]
    )
    for sc in list(headers):
        ancestors: Dict[int, int] = {}
        min_row = min(sc["row_numbers"])
        for other in headers:
            if max(other["row_numbers"]) < min_row and set(
                sc["column_numbers"]
            ).issubset(set(other["column_numbers"])):
                for r in other["row_numbers"]:
                    ancestors[r] = ancestors.get(r, 0) + 1
        for r in range(0, min_row):
            if ancestors.get(r, 0) != 1:
                supercells.remove(sc)
                break


def objects_to_structures(
    objects: List[dict],
    tokens: List[dict],
    class_thresholds: Dict[str, float] = STRUCTURE_CLASS_THRESHOLDS,
) -> List[dict]:
    """Raw labeled objects → one consistent structure per detected table
    (pipeline.py:299-372): containment-filter the table's objects and
    tokens, refine rows/columns, snap everything to the shrunk table
    bbox, then refine headers + spanning cells."""
    tables = [o for o in objects if o["label"] == "table"]
    structures = []
    for table in tables:
        in_table = [o for o in objects if iob(o["bbox"], table["bbox"]) >= 0.5]
        tk = [t for t in tokens if iob(t["bbox"], table["bbox"]) >= 0.5]

        columns = [o for o in in_table if o["label"] == "table column"]
        rows = [o for o in in_table if o["label"] == "table row"]
        headers = [o for o in in_table if o["label"] == "table column header"]
        spanning = [o for o in in_table if o["label"] == "table spanning cell"]
        for o in spanning:
            o["projected row header"] = False
        projected = [o for o in in_table
                     if o["label"] == "table projected row header"]
        for o in projected:
            o["projected row header"] = True
        spanning = spanning + projected
        for row in rows:
            row["column header"] = any(
                iob(row["bbox"], h["bbox"]) >= 0.5 for h in headers
            )

        rows = refine_rows(rows, tk)
        columns = refine_columns(columns, tk)

        # shrink the table bbox to rows' height × columns' width
        row_rect = union_boxes([r["bbox"] for r in rows])
        col_rect = union_boxes([c["bbox"] for c in columns])
        table["row_column_bbox"] = [col_rect[0], row_rect[1],
                                    col_rect[2], row_rect[3]]
        table["bbox"] = table["row_column_bbox"]
        for col in columns:
            col["bbox"][1] = table["bbox"][1]
            col["bbox"][3] = table["bbox"][3]
        for row in rows:
            row["bbox"][0] = table["bbox"][0]
            row["bbox"][2] = table["bbox"][2]

        structure = {"rows": rows, "columns": columns,
                     "column headers": headers, "spanning cells": spanning}
        if rows and len(columns) > 1:
            # refine_table_structure (pipeline.py:148-179)
            hs = apply_threshold(
                headers, class_thresholds["table column header"]
            )
            hs = nms(hs)
            structure["column headers"] = align_headers(hs, rows)

            span = [s for s in spanning if not s["projected row header"]]
            proj = [s for s in spanning if s["projected row header"]]
            span = apply_threshold(
                span, class_thresholds["table spanning cell"]
            )
            proj = apply_threshold(
                proj, class_thresholds["table projected row header"]
            )
            sc = align_supercells(span + proj, rows, columns)
            sc = nms_supercells(sc)
            header_supercell_tree(sc)
            structure["spanning cells"] = sc
        structures.append(structure)
    return structures


def structure_to_cells(
    structure: dict, tokens: List[dict]
) -> Tuple[List[dict], float]:
    """Consistent structure → cell list + confidence
    (pipeline.py:374-536): grid cells from row × column intersections,
    spanning cells absorb the subcells they cover, token spans slot
    uniquely into cells, then rows/columns/cells snap to the extracted
    text extents."""
    columns = structure["columns"]
    rows = structure["rows"]
    spanning = structure["spanning cells"]
    cells: List[dict] = []
    subcells: List[dict] = []

    for cn, col in enumerate(columns):
        for rn, row in enumerate(rows):
            cell_rect = rect_intersect(row["bbox"], col["bbox"])
            cell = {"bbox": list(cell_rect), "column_nums": [cn],
                    "row_nums": [rn],
                    "column header": bool(row.get("column header"))}
            ca = rect_area(cell_rect)
            is_sub = any(
                ca > 0 and inter_area(sc["bbox"], cell_rect) / ca > 0.5
                for sc in spanning
            )
            if is_sub:
                subcells.append(cell)
            else:
                cell["projected row header"] = False
                cells.append(cell)

    for sc in spanning:
        cell_rows: set = set()
        cell_cols: set = set()
        covered: List[Box] = []
        header = True
        for sub in subcells:
            sa = rect_area(sub["bbox"])
            if sa > 0 and inter_area(sub["bbox"], sc["bbox"]) / sa > 0.5:
                covered.append(tuple(sub["bbox"]))
                cell_rows |= set(sub["row_nums"])
                cell_cols |= set(sub["column_nums"])
                # a supercell is a header cell only if every subcell is
                header = header and sub["column header"]
        if cell_rows and cell_cols:
            cells.append({
                "bbox": list(union_boxes(covered)),
                "column_nums": sorted(cell_cols),
                "row_nums": sorted(cell_rows),
                "column header": header,
                "projected row header": sc["projected row header"],
            })

    _, _, match_scores = slot_into_containers(cells, tokens)
    if match_scores:
        confidence = (sum(match_scores) / len(match_scores)
                      + min(match_scores)) / 2
    else:
        confidence = 0.0

    # snap each cell bbox to the union of its rows × columns
    for cell in cells:
        col_rect = union_boxes(
            [columns[c]["bbox"] for c in cell["column_nums"]]
        )
        row_rect = union_boxes([rows[r]["bbox"] for r in cell["row_nums"]])
        cell["bbox"] = list(rect_intersect(col_rect, row_rect))

    by_cell, _, _ = slot_into_containers(
        cells, tokens, overlap_threshold=0.001,
        unique_assignment=True, forced_assignment=False,
    )
    for cell, span_nums in zip(cells, by_cell):
        spans = [tokens[i] for i in span_nums]
        cell["cell text"] = extract_text_from_spans(
            spans, remove_integer_superscripts=False
        )
        cell["spans"] = spans

    # contract rows/columns/cells to the extents of the slotted text
    num_rows, num_cols = len(rows), len(columns)
    min_y_row: Dict[int, List[float]] = {}
    max_y_row: Dict[int, List[float]] = {}
    min_x_col: Dict[int, List[float]] = {}
    max_x_col: Dict[int, List[float]] = {}
    for cell in cells:
        rlo, rhi = min(cell["row_nums"]), max(cell["row_nums"])
        clo, chi = min(cell["column_nums"]), max(cell["column_nums"])
        for s in cell["spans"]:
            min_x_col.setdefault(clo, []).append(s["bbox"][0])
            min_y_row.setdefault(rlo, []).append(s["bbox"][1])
            max_x_col.setdefault(chi, []).append(s["bbox"][2])
            max_y_row.setdefault(rhi, []).append(s["bbox"][3])
    for rn, row in enumerate(rows):
        if min_x_col.get(0):
            row["bbox"][0] = min(min_x_col[0])
        if min_y_row.get(rn):
            row["bbox"][1] = min(min_y_row[rn])
        if max_x_col.get(num_cols - 1):
            row["bbox"][2] = max(max_x_col[num_cols - 1])
        if max_y_row.get(rn):
            row["bbox"][3] = max(max_y_row[rn])
    for cn, col in enumerate(columns):
        if min_x_col.get(cn):
            col["bbox"][0] = min(min_x_col[cn])
        if min_y_row.get(0):
            col["bbox"][1] = min(min_y_row[0])
        if max_x_col.get(cn):
            col["bbox"][2] = max(max_x_col[cn])
        if max_y_row.get(num_rows - 1):
            col["bbox"][3] = max(max_y_row[num_rows - 1])
    for cell in cells:
        row_rect = union_boxes([rows[r]["bbox"] for r in cell["row_nums"]])
        col_rect = union_boxes(
            [columns[c]["bbox"] for c in cell["column_nums"]]
        )
        snapped = rect_intersect(row_rect, col_rect)
        if rect_area(snapped) > 0:
            cell["bbox"] = list(snapped)

    return cells, confidence


def assemble_tables(
    objects: List[dict],
    tokens: List[dict],
    class_thresholds: Dict[str, float] = STRUCTURE_CLASS_THRESHOLDS,
) -> List[Tuple[List[dict], float]]:
    """End-to-end: detection objects + tokens → one (cells, confidence)
    per detected table — the ``recognize(out_cells=True)`` path of the
    reference pipeline, model inference excluded."""
    return [
        structure_to_cells(structure, tokens)
        for structure in objects_to_structures(objects, tokens, class_thresholds)
    ]
