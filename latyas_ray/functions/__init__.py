from .latex import strip_dollar_wrapped, to_katex
from .spatial import (
    find_embedded_equations,
    merge_row_bboxes,
    native_text_for_bbox,
    row_band_sort,
)

__all__ = [
    "to_katex",
    "strip_dollar_wrapped",
    "find_embedded_equations",
    "merge_row_bboxes",
    "native_text_for_bbox",
    "row_band_sort",
]
