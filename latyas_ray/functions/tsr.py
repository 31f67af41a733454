"""Table-structure-recognition output assembly — pure-function
re-expression of the reference's TATR cell serializers
(``/root/reference/latyas/tsr/models/tatr/pipeline.py:240-297``):

- :func:`cells_to_csv` — span-expanded grid → CSV with the multi-row
  header flattened per column via order-preserving de-dup joined with
  ``" | "`` (``pipeline.py:240-266``).
- :func:`cells_to_html` — row/col-span attributes, ``<thead>`` per header
  row, ``<th>``/``<td>`` per cell (``pipeline.py:268-296``), including
  the reference's quirk that all cells sharing a starting row append to
  the row element most recently opened.

A ``cell`` is ``{"row_nums": [...], "column_nums": [...], "cell text":
str, "column header": bool}`` — the exact TATR postprocess output shape —
so real TATR outputs drop straight in.  Built with the csv module and
string assembly rather than pandas/ElementTree (same bytes, no frame
round-trip in a per-region kernel).
"""

from __future__ import annotations

import csv
import io
from typing import Dict, List, Optional


def _grid(cells: List[dict]):
    n_cols = max(max(c["column_nums"]) for c in cells) + 1
    n_rows = max(max(c["row_nums"]) for c in cells) + 1
    grid: List[List[Optional[str]]] = [[None] * n_cols for _ in range(n_rows)]
    for cell in cells:
        for r in cell["row_nums"]:
            for c in cell["column_nums"]:
                grid[r][c] = cell["cell text"]
    return grid, n_rows, n_cols


def cells_to_csv(cells: List[dict]) -> Optional[str]:
    """``pipeline.py:240-266`` semantics: spanning cells repeat their text
    into every covered grid slot; header rows (all rows ≤ the deepest
    ``column header`` cell) flatten per column by joining the
    order-preserved distinct texts with ``" | "``; the body follows as
    CSV rows.  Returns ``None`` for an empty cell list (as the reference
    does)."""
    if not cells:
        return None
    grid, n_rows, n_cols = _grid(cells)
    header_cells = [c for c in cells if c["column header"]]
    max_header_row = (
        max(max(c["row_nums"]) for c in header_cells) if header_cells else -1
    )
    flattened_header = []
    for col in range(n_cols):
        seen: Dict[Optional[str], None] = {}
        for row in range(max_header_row + 1):
            seen.setdefault(grid[row][col])
        flattened_header.append(
            " | ".join("" if k is None else k for k in seen)
        )
    buf = io.StringIO()
    writer = csv.writer(buf, lineterminator="\n")
    writer.writerow(flattened_header)
    for row in range(max_header_row + 1, n_rows):
        writer.writerow(["" if v is None else v for v in grid[row]])
    return buf.getvalue()


def _escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def cells_to_html(cells: List[dict]) -> str:
    """``pipeline.py:268-296`` semantics: cells sorted by (min row, min
    col); a new ``<thead>`` (header cells) or ``<tr>`` element opens
    whenever a cell's starting row advances; every cell carries
    ``colspan``/``rowspan`` when spanning; header cells are ``<th>``.
    The reference quirk that subsequent same-row cells append to the most
    recently opened row element — whatever its tag — is preserved."""
    cells = sorted(cells, key=lambda k: min(k["column_nums"]))
    cells = sorted(cells, key=lambda k: min(k["row_nums"]))

    rows: List[tuple] = []  # (row_tag, [cell_html, ...])
    current_row = -1
    cell_tag = "td"
    for cell in cells:
        this_row = min(cell["row_nums"])
        attrs = ""
        colspan = len(cell["column_nums"])
        if colspan > 1:
            attrs += f' colspan="{colspan}"'
        rowspan = len(cell["row_nums"])
        if rowspan > 1:
            attrs += f' rowspan="{rowspan}"'
        if this_row > current_row:
            current_row = this_row
            if cell["column header"]:
                cell_tag = "th"
                rows.append(("thead", []))
            else:
                cell_tag = "td"
                rows.append(("tr", []))
        rows[-1][1].append(
            f"<{cell_tag}{attrs}>{_escape(cell['cell text'])}</{cell_tag}>"
        )
    inner = "".join(
        f"<{tag}>{''.join(cells_html)}</{tag}>" for tag, cells_html in rows
    )
    return f"<table>{inner}</table>"
