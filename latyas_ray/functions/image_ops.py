"""Pure-numpy image operators for the OCR/detector actor path.

Deterministic re-expressions of the reference's pre/post-processing image
utilities (SURVEY.md §2.2 M9/M10/M13).  They run *inside* actor-pool UDFs
on transient per-row decodes — images never enter the Dataset (SURVEY.md
§1.3) — so everything here is plain ``np.ndarray`` in / out with no I/O:

- :func:`pad_to_min_size` — the small-crop OCR padding
  (``latyas/ocr/ocr_utils.py:31-56`` + ``add_margin`` ``ocr_utils.py:7-28``):
  crops smaller than a threshold are centered on a white canvas, 2×
  nearest-upscaled, and lightly box-blurred so tiny glyphs hit the
  recognizer at a usable scale.
- :func:`trim_white_border` — background-border trim
  (``tex_ocr/models/texteller/ocr_model/utils/transforms.py:41-66``):
  background color is voted from the 4 corners; the content bounding box
  of non-background pixels is cropped (with margin).
- :func:`mask_regions` / :func:`keep_regions` / :func:`crop_region` —
  region white-out / keep-only / crop
  (``mix_inference.py:20-24``, ``Layout.mask_image/keep_image/crop_image``
  ``layout/layout.py:134-156``).

All are exact-integer operations on uint8 arrays — no float kernels — so
results are bit-identical across platforms and partitionings.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

IntRect = Tuple[int, int, int, int]  # (x1, y1, x2, y2), exclusive right/bottom

MIN_SIZE = 400
CANVAS = 800
WHITE = 255


def pad_to_min_size(
    img: np.ndarray,
    min_size: int = MIN_SIZE,
    canvas: int = CANVAS,
    upscale: int = 2,
) -> np.ndarray:
    """If either side of ``img`` is below ``min_size``: nearest-neighbor
    upscale by ``upscale`` and center on a white ``canvas``×``canvas``
    background (grown if the scaled crop exceeds it), then 3×3 box-blur
    (integer mean) to soften the upscale artifacts."""
    h, w = img.shape[:2]
    if h >= min_size and w >= min_size:
        return img
    big = np.repeat(np.repeat(img, upscale, axis=0), upscale, axis=1)
    bh, bw = big.shape[:2]
    side = max(canvas, bh, bw)
    shape = (side, side) + img.shape[2:]
    out = np.full(shape, WHITE, dtype=img.dtype)
    y0 = (side - bh) // 2
    x0 = (side - bw) // 2
    out[y0: y0 + bh, x0: x0 + bw] = big
    return box_blur3(out)


def box_blur3(img: np.ndarray) -> np.ndarray:
    """3×3 integer-mean box blur with edge replication (pure numpy)."""
    p = np.pad(
        img.astype(np.uint32),
        [(1, 1), (1, 1)] + [(0, 0)] * (img.ndim - 2),
        mode="edge",
    )
    acc = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    )
    return (acc // 9).astype(img.dtype)


def corner_background_color(img: np.ndarray, patch: int = 3) -> int:
    """Vote the background gray level from the four ``patch``×``patch``
    corners (median of their means, rounded) — the corner-vote heuristic
    of ``transforms.py:48-51`` / ``mix_inference.py:152-154``."""
    h, w = img.shape[:2]
    p = min(patch, h, w)
    gray = img if img.ndim == 2 else img.mean(axis=2)
    corners = [
        gray[:p, :p].mean(),
        gray[:p, w - p:].mean(),
        gray[h - p:, :p].mean(),
        gray[h - p:, w - p:].mean(),
    ]
    return int(round(float(np.median(corners))))


def trim_white_border(
    img: np.ndarray, tolerance: int = 16, margin: int = 4
) -> np.ndarray:
    """Crop to the bounding box of pixels differing from the corner-voted
    background by more than ``tolerance``, keeping ``margin`` pixels.
    All-background images are returned unchanged."""
    bg = corner_background_color(img)
    gray = img if img.ndim == 2 else img.mean(axis=2)
    content = np.abs(gray.astype(np.int32) - bg) > tolerance
    ys, xs = np.nonzero(content)
    if ys.size == 0:
        return img
    h, w = img.shape[:2]
    y1 = max(0, int(ys.min()) - margin)
    y2 = min(h, int(ys.max()) + 1 + margin)
    x1 = max(0, int(xs.min()) - margin)
    x2 = min(w, int(xs.max()) + 1 + margin)
    return img[y1:y2, x1:x2]


def _clip(rect: IntRect, h: int, w: int) -> IntRect:
    x1, y1, x2, y2 = rect
    return (max(0, x1), max(0, y1), min(w, x2), min(h, y2))


def mask_regions(img: np.ndarray, rects: Sequence[IntRect]) -> np.ndarray:
    """White-out every rect (``mask_img`` ``mix_inference.py:20-24``)."""
    out = img.copy()
    h, w = img.shape[:2]
    for r in rects:
        x1, y1, x2, y2 = _clip(r, h, w)
        out[y1:y2, x1:x2] = WHITE
    return out


def keep_regions(img: np.ndarray, rects: Sequence[IntRect]) -> np.ndarray:
    """White-out everything OUTSIDE the rects (``Layout.keep_image``
    ``layout.py:150-156``)."""
    h, w = img.shape[:2]
    out = np.full_like(img, WHITE)
    for r in rects:
        x1, y1, x2, y2 = _clip(r, h, w)
        out[y1:y2, x1:x2] = img[y1:y2, x1:x2]
    return out


def crop_region(img: np.ndarray, rect: IntRect) -> np.ndarray:
    """Slice one rect (``Layout.crop_image`` ``layout.py:134-140``)."""
    h, w = img.shape[:2]
    x1, y1, x2, y2 = _clip(rect, h, w)
    return img[y1:y2, x1:x2]


def slice_regions(img: np.ndarray, rects: Sequence[IntRect]) -> List[np.ndarray]:
    """Crop every rect (``slice_from_image`` ``mix_inference.py:126-133``)."""
    return [crop_region(img, r) for r in rects]
