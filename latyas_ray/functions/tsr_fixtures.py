"""Deterministic synthetic TATR detection fixtures.

The sandbox has no DETR weights, so the assembly kernel
(:mod:`.tsr_assemble`) is exercised on synthetic detection outputs shaped
exactly like ``outputs_to_objects`` results: jittered row/column/header/
spanning-cell objects plus page tokens, seeded per document id.  The
generator deliberately produces the messy cases the reference
postprocess exists to clean up: duplicate rows/columns (NMS), sub-threshold
noise objects (class thresholds), header bands (align_headers), spanning
cells (align_supercells/nms_supercells), and token-free tables (the
no-token NMS path).

Every call returns FRESH dicts — the assembly mutates bboxes in place, so
callers on both sides of a differential must generate independently.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def synth_detection_fixture(seed: int) -> Tuple[List[dict], List[dict], Tuple[int, int]]:
    """(objects, tokens, (width, height)) for one synthetic table page."""
    rng = np.random.default_rng(int(seed) + 0x7A31)
    W, H = 1000, 800
    n_rows = int(rng.integers(2, 7))
    n_cols = int(rng.integers(2, 6))

    x0, y0 = 60.0 + rng.uniform(0, 40), 50.0 + rng.uniform(0, 30)
    x1 = W - 60.0 - rng.uniform(0, 40)
    y1 = H - 50.0 - rng.uniform(0, 30)
    ys = np.sort(rng.uniform(y0 + 20, y1 - 20, n_rows - 1))
    row_edges = np.concatenate([[y0], ys, [y1]])
    # enforce a minimum band height so jitter can't flip adjacency
    for i in range(1, len(row_edges)):
        row_edges[i] = max(row_edges[i], row_edges[i - 1] + 18.0)
    xs = np.sort(rng.uniform(x0 + 30, x1 - 30, n_cols - 1))
    col_edges = np.concatenate([[x0], xs, [x1]])
    for i in range(1, len(col_edges)):
        col_edges[i] = max(col_edges[i], col_edges[i - 1] + 28.0)

    def jit(scale: float = 3.0) -> float:
        return float(rng.uniform(-scale, scale))

    objects: List[dict] = [{
        "label": "table",
        "score": float(rng.uniform(0.75, 0.99)),
        "bbox": [x0 + jit(), y0 + jit(), col_edges[-1] + jit(),
                 row_edges[-1] + jit()],
    }]
    for r in range(n_rows):
        objects.append({
            "label": "table row",
            "score": float(rng.uniform(0.55, 0.99)),
            "bbox": [x0 + jit(), row_edges[r] + jit(),
                     col_edges[-1] + jit(), row_edges[r + 1] + jit()],
        })
        if rng.random() < 0.25:  # near-duplicate row → NMS fodder
            objects.append({
                "label": "table row",
                "score": float(rng.uniform(0.5, 0.99)),
                "bbox": [x0 + jit(6), row_edges[r] + jit(6),
                         col_edges[-1] + jit(6), row_edges[r + 1] + jit(6)],
            })
    for c in range(n_cols):
        objects.append({
            "label": "table column",
            "score": float(rng.uniform(0.55, 0.99)),
            "bbox": [col_edges[c] + jit(), y0 + jit(),
                     col_edges[c + 1] + jit(), row_edges[-1] + jit()],
        })
        if rng.random() < 0.2:
            objects.append({
                "label": "table column",
                "score": float(rng.uniform(0.5, 0.99)),
                "bbox": [col_edges[c] + jit(6), y0 + jit(6),
                         col_edges[c + 1] + jit(6), row_edges[-1] + jit(6)],
            })

    header_rows = 0
    if rng.random() < 0.7:
        header_rows = 1 if n_rows < 4 or rng.random() < 0.6 else 2
        objects.append({
            "label": "table column header",
            "score": float(rng.uniform(0.55, 0.99)),
            "bbox": [x0 + jit(), y0 + jit(),
                     col_edges[-1] + jit(), row_edges[header_rows] + jit()],
        })
    if header_rows and n_cols >= 3 and rng.random() < 0.6:
        span_w = int(rng.integers(2, n_cols))
        objects.append({
            "label": "table spanning cell",
            "score": float(rng.uniform(0.55, 0.99)),
            "bbox": [col_edges[0] + jit(), row_edges[0] + jit(),
                     col_edges[span_w] + jit(), row_edges[1] + jit()],
        })
    if n_rows >= 4 and rng.random() < 0.4:
        pr = int(rng.integers(max(1, header_rows), n_rows - 1))
        objects.append({
            "label": "table projected row header",
            "score": float(rng.uniform(0.55, 0.99)),
            "bbox": [col_edges[0] + jit(), row_edges[pr] + jit(),
                     col_edges[-1] + jit(), row_edges[pr + 1] + jit()],
        })
    # sub-threshold noise of every class
    for label in ("table row", "table column", "table column header",
                  "table spanning cell"):
        if rng.random() < 0.5:
            nx = float(rng.uniform(x0, x1 - 80))
            ny = float(rng.uniform(y0, y1 - 40))
            objects.append({
                "label": label,
                "score": float(rng.uniform(0.05, 0.45)),
                "bbox": [nx, ny, nx + rng.uniform(40, 80),
                         ny + rng.uniform(20, 40)],
            })

    tokens: List[dict] = []
    if seed % 7 != 0:  # every 7th page is token-free (plain-NMS path)
        for r in range(n_rows):
            for c in range(n_cols):
                if rng.random() < 0.12:
                    continue  # sparse empty cells
                n_tok = int(rng.integers(1, 4))
                cx0, cx1 = col_edges[c], col_edges[c + 1]
                cy0, cy1 = row_edges[r], row_edges[r + 1]
                for k in range(n_tok):
                    tw = float(rng.uniform(14, max(15.0, (cx1 - cx0) / 4)))
                    tx = float(rng.uniform(cx0 + 2, max(cx0 + 3, cx1 - tw - 2)))
                    ty0 = cy0 + 4 + k * max(6.0, (cy1 - cy0 - 8) / n_tok)
                    ty1 = min(cy1 - 2, ty0 + 10)
                    if ty1 - ty0 < 3:  # degenerate token → skip
                        continue
                    tokens.append({
                        "text": f"r{r}c{c}w{k}",
                        "bbox": [tx, float(ty0), tx + tw, float(ty1)],
                        "block_num": r,
                        "line_num": c,
                        "span_num": k,
                        "flags": 0,
                    })
    return objects, tokens, (W, H)
