"""Region visualization sink (S8) — pure-numpy re-expression of
``Layout.visualize`` (``/root/reference/latyas/layout/layout.py:174-200``):
draw each region's rectangle outline onto the page canvas in its
kind-specific color (``BLOCK_TYPE_COLOR_MAP``, ``block.py:72-92``), and
serialize as a binary PPM (P6) — no cv2/PIL in this container, and a
debug sink needs no codec.

The reference also stamps ``{kind.name}-{index}`` with ``cv2.putText``;
without a font rasterizer the label goes into a sidecar JSON column
instead (same information, machine-readable).

Ray-side: :func:`visualize_batch` is a ``map_batches``-ready UDF over
extracted rows (reads the ``regions`` list column), emitting one PPM
bytes payload + label JSON per document — a debug SINK stage, normally
followed by ``write_parquet`` to a scratch dir.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from ..blocks import BlockKind

# block.py:72-92 (RGB tuples, reference comments name the colors)
KIND_COLOR: Dict[BlockKind, Tuple[int, int, int]] = {
    BlockKind.Text: (255, 0, 0),
    BlockKind.Title: (0, 0, 255),
    BlockKind.Caption: (0, 255, 0),
    BlockKind.Figure: (255, 165, 0),
    BlockKind.FigureCaption: (128, 0, 128),
    BlockKind.Table: (255, 255, 0),
    BlockKind.TableCaption: (0, 255, 255),
    BlockKind.Header: (255, 0, 255),
    BlockKind.Footer: (165, 42, 42),
    BlockKind.Reference: (255, 192, 203),
    BlockKind.Equation: (128, 128, 128),
    BlockKind.EmbedEq: (100, 100, 100),
    BlockKind.TOC: (0, 128, 128),
    BlockKind.List: (128, 128, 0),
    BlockKind.Icon: (0, 0, 0),
    BlockKind.QRCode: (0, 128, 0),
    BlockKind.BarCode: (128, 0, 0),
    BlockKind.TextWithEquation: (100, 100, 100),
    BlockKind.Unknown: (192, 192, 192),
}


def _draw_rect(canvas: np.ndarray, x1: int, y1: int, x2: int, y2: int,
               color: Tuple[int, int, int], thickness: int) -> None:
    h, w = canvas.shape[:2]
    x1, x2 = sorted((max(0, min(w - 1, x1)), max(0, min(w - 1, x2))))
    y1, y2 = sorted((max(0, min(h - 1, y1)), max(0, min(h - 1, y2))))
    c = np.array(color, dtype=np.uint8)
    t = thickness
    canvas[y1: y1 + t, x1: x2 + 1] = c
    canvas[max(0, y2 - t + 1): y2 + 1, x1: x2 + 1] = c
    canvas[y1: y2 + 1, x1: x1 + t] = c
    canvas[y1: y2 + 1, max(0, x2 - t + 1): x2 + 1] = c


def visualize_regions(
    regions: List[dict],
    page_w: int = 1000,
    page_h: int = 1400,
    thickness: int = 2,
) -> Tuple[bytes, str]:
    """Render one document's regions → (PPM bytes, labels JSON).

    ``regions`` rows carry ``kind``/``x1..y2`` as produced by
    ``extract.region_to_dict``.  White page, per-kind outline colors and
    ``{kind}-{index}`` labels anchored at the box's top-right corner —
    the putText anchor of ``layout.py:191-199``.
    """
    canvas = np.full((page_h, page_w, 3), 255, dtype=np.uint8)
    labels = []
    for i, reg in enumerate(regions):
        kind = BlockKind[reg["kind"]] if isinstance(reg["kind"], str) else BlockKind(reg["kind"])
        color = KIND_COLOR.get(kind, KIND_COLOR[BlockKind.Unknown])
        _draw_rect(canvas, int(reg["x1"]), int(reg["y1"]), int(reg["x2"]),
                   int(reg["y2"]), color, thickness)
        labels.append(
            {"label": f"{kind.name}-{i}", "x": int(reg["x2"]), "y": int(reg["y1"])}
        )
    header = f"P6\n{page_w} {page_h}\n255\n".encode()
    return header + canvas.tobytes(), json.dumps(labels, sort_keys=True)


def visualize_batch(batch: pa.Table, thickness: int = 2) -> pa.Table:
    """``map_batches`` UDF over extracted rows → (url, ppm, labels)."""
    urls = batch.column("url").to_pylist()
    regions_col = batch.column("regions").to_pylist()
    ppms, labels = [], []
    for regs in regions_col:
        ppm, lab = visualize_regions(regs or [], thickness=thickness)
        ppms.append(ppm)
        labels.append(lab)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "ppm": pa.array(ppms, pa.binary()),
            "labels": pa.array(labels, pa.string()),
        }
    )
