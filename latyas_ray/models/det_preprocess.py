"""Detector preprocessing compose — pure numpy re-expression of the
reference's 500-LoC cv2 pipeline
(``/root/reference/latyas/layout/models/texteller/det_model/preprocess.py``):

- :class:`Resize` (keep-ratio min/max-side scaling, ``preprocess.py:29-94``)
- :class:`NormalizeImage` (/255, mean/std, ``:96-131``)
- :class:`Permute` (HWC→CHW, ``:133-154``)
- :class:`PadStride` (FPN stride padding, ``:156-182``)
- :class:`LetterBoxResize` (ratio + centered pad, ``:185-239``)
- :class:`Pad` (fixed-size canvas, fill 114, ``:239-265``)
- :class:`Compose` (config-dict driven, ``:488-502`` — built from an
  explicit registry instead of the reference's ``eval`` on config strings,
  an anti-pattern we do not copy)

This is the part of the model path that IS pure array math — it runs
today, is unit-tested, and is the drop-in prerequisite for real weights:
an ONNX detector actor would call ``Compose(ops)(image)`` in
``__call__`` with the compose built once in ``__init__``.  Interpolation
is half-pixel-aligned bilinear (cv2 ``INTER_LINEAR`` convention);
exact-resample parity with cv2's SIMD path is not promised (documented
deviation — cv2 is absent from this container).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def bilinear_resize(im: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-aligned bilinear resample of an HWC (or HW) image."""
    h, w = im.shape[:2]
    if out_h == h and out_w == w:
        return im.astype(np.float32, copy=True)
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    if im.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    a = im[y0][:, x0].astype(np.float64)
    b = im[y0][:, x1].astype(np.float64)
    c = im[y1][:, x0].astype(np.float64)
    d = im[y1][:, x1].astype(np.float64)
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def make_im_info(im: np.ndarray) -> Dict[str, np.ndarray]:
    """The ``decode_image`` metadata contract (``preprocess.py:21-28``) —
    the actual byte decode is sandbox-stubbed (no codecs); callers pass a
    decoded HWC array."""
    return {
        "im_shape": np.array(im.shape[:2], dtype=np.float32),
        "scale_factor": np.array([1.0, 1.0], dtype=np.float32),
    }


class Resize:
    """Keep-ratio min/max-side scaling (``preprocess.py:29-94``)."""

    def __init__(self, target_size, keep_ratio: bool = True) -> None:
        if isinstance(target_size, int):
            target_size = [target_size, target_size]
        assert len(target_size) == 2
        assert target_size[0] > 0 and target_size[1] > 0
        self.target_size = target_size
        self.keep_ratio = keep_ratio

    def generate_scale(self, im: np.ndarray) -> Tuple[float, float]:
        origin_shape = im.shape[:2]
        if self.keep_ratio:
            im_size_min = float(np.min(origin_shape))
            im_size_max = float(np.max(origin_shape))
            target_min = float(np.min(self.target_size))
            target_max = float(np.max(self.target_size))
            im_scale = target_min / im_size_min
            if np.round(im_scale * im_size_max) > target_max:
                im_scale = target_max / im_size_max
            return im_scale, im_scale
        resize_h, resize_w = self.target_size
        return resize_h / float(origin_shape[0]), resize_w / float(origin_shape[1])

    def __call__(self, im: np.ndarray, im_info: dict) -> tuple:
        sy, sx = self.generate_scale(im)
        out_h = int(round(im.shape[0] * sy))
        out_w = int(round(im.shape[1] * sx))
        im = bilinear_resize(im, out_h, out_w)
        im_info["im_shape"] = np.array(im.shape[:2]).astype("float32")
        im_info["scale_factor"] = np.array([sy, sx]).astype("float32")
        return im, im_info


class NormalizeImage:
    """``im/255`` then mean/std (``preprocess.py:96-131``)."""

    def __init__(self, mean, std, is_scale: bool = True,
                 norm_type: str = "mean_std") -> None:
        self.mean = mean
        self.std = std
        self.is_scale = is_scale
        self.norm_type = norm_type

    def __call__(self, im: np.ndarray, im_info: dict) -> tuple:
        im = im.astype(np.float32, copy=False)
        if self.is_scale:
            im *= 1.0 / 255.0
        if self.norm_type == "mean_std":
            im -= np.array(self.mean, dtype=np.float32)[None, None, :]
            im /= np.array(self.std, dtype=np.float32)[None, None, :]
        return im, im_info


class Permute:
    """HWC → CHW (``preprocess.py:133-154``)."""

    def __call__(self, im: np.ndarray, im_info: dict) -> tuple:
        return im.transpose((2, 0, 1)).copy(), im_info


class PadStride:
    """Pad CHW to stride multiples with zeros (``preprocess.py:156-182``)."""

    def __init__(self, stride: int = 0) -> None:
        self.coarsest_stride = stride

    def __call__(self, im: np.ndarray, im_info: dict) -> tuple:
        s = self.coarsest_stride
        if s <= 0:
            return im, im_info
        c, h, w = im.shape
        pad_h = int(np.ceil(h / s) * s)
        pad_w = int(np.ceil(w / s) * s)
        out = np.zeros((c, pad_h, pad_w), dtype=np.float32)
        out[:, :h, :w] = im
        return out, im_info


class LetterBoxResize:
    """Ratio-preserving resize into a centered padded canvas
    (``preprocess.py:185-239``; fill 127.5, the ±0.1 rounding included)."""

    def __init__(self, target_size) -> None:
        if isinstance(target_size, int):
            target_size = [target_size, target_size]
        assert len(target_size) == 2
        assert target_size[0] > 0 and target_size[1] > 0
        self.target_size = target_size

    def __call__(self, im: np.ndarray, im_info: dict) -> tuple:
        height, width = self.target_size
        h, w = im.shape[:2]
        ratio = min(float(height) / h, float(width) / w)
        new_w, new_h = round(w * ratio), round(h * ratio)
        padw = (width - new_w) / 2
        padh = (height - new_h) / 2
        top, bottom = round(padh - 0.1), round(padh + 0.1)
        left, right = round(padw - 0.1), round(padw + 0.1)
        resized = bilinear_resize(im, new_h, new_w)
        canvas = np.full(
            (new_h + top + bottom, new_w + left + right) + im.shape[2:],
            127.5, dtype=np.float32,
        )
        canvas[top: top + new_h, left: left + new_w] = resized
        im_info["im_shape"] = np.array([round(h * ratio), round(w * ratio)],
                                       dtype=np.float32)
        im_info["scale_factor"] = np.array([ratio, ratio], dtype=np.float32)
        return canvas, im_info


class Pad:
    """Fixed-size canvas, top-left anchored, fill 114
    (``preprocess.py:239-265``)."""

    def __init__(self, size, fill_value=(114.0, 114.0, 114.0)) -> None:
        if isinstance(size, int):
            size = [size, size]
        self.size = size
        self.fill_value = fill_value

    def __call__(self, im: np.ndarray, im_info: dict) -> tuple:
        im_h, im_w = im.shape[:2]
        h, w = self.size
        if h == im_h and w == im_w:
            return im.astype(np.float32), im_info
        canvas = np.ones((h, w, 3), dtype=np.float32)
        canvas *= np.array(self.fill_value, dtype=np.float32)
        canvas[0:im_h, 0:im_w, :] = im.astype(np.float32)
        return canvas, im_info


_OP_REGISTRY = {
    "Resize": Resize,
    "NormalizeImage": NormalizeImage,
    "Permute": Permute,
    "PadStride": PadStride,
    "LetterBoxResize": LetterBoxResize,
    "Pad": Pad,
}


class Compose:
    """Config-dict-driven op chain (``preprocess.py:488-502``), dispatched
    through an explicit registry (never ``eval``).  Build once per actor
    in ``__init__``; call per image."""

    def __init__(self, transforms: List[dict]) -> None:
        self.transforms = []
        for op_info in transforms:
            op_info = dict(op_info)
            op_type = op_info.pop("type")
            self.transforms.append(_OP_REGISTRY[op_type](**op_info))

    def __call__(self, im: np.ndarray) -> Dict[str, np.ndarray]:
        im_info = make_im_info(im)
        for t in self.transforms:
            im, im_info = t(im, im_info)
        inputs = dict(im_info)
        inputs["image"] = im
        return inputs


# ------------------------------------------------------- det postprocess

DET_DRAW_THRESHOLD = 0.5  # PredictConfig default (inference.py:38)


def decode_detections(
    outputs: np.ndarray,
    label_list: List[str],
    draw_threshold: float = DET_DRAW_THRESHOLD,
) -> List[dict]:
    """RT-DETR ONNX head → labeled boxes — the other half of M14/A2
    (reference ``det_model/inference.py:179-195`` ``predict``): each
    output row is (cls_id, score, xmin, ymin, xmax, ymax); keep rows with
    score STRICTLY above the threshold; xmin/ymin clamp at 0 then
    int-truncate (xmax/ymax truncate unclamped); emitted as
    {label, score, x, y, w, h} with w = xmax − x, h = ymax − y — the
    exact field set of the reference ``Bbox`` (``Bbox.py:17-26``)."""
    outputs = np.asarray(outputs, dtype=np.float64)
    if outputs.ndim != 2 or outputs.shape[1] != 6:
        raise ValueError(f"expected (N, 6) detector output, got {outputs.shape}")
    res = []
    for row in outputs:
        score = float(row[1])
        if score <= draw_threshold:
            continue
        xmin = int(max(row[2], 0))
        ymin = int(max(row[3], 0))
        xmax = int(row[4])
        ymax = int(row[5])
        res.append({
            "label": label_list[int(row[0])],
            "score": score,
            "x": xmin, "y": ymin,
            "w": xmax - xmin, "h": ymax - ymin,
        })
    return res


def detections_to_regions(dets: List[dict]):
    """Decoded equation detections → overlap-resolved layout regions —
    the A2 consumption contract (``texteller_layout_model.py:74-88``):
    label "isolated" → Equation, anything else → EmbedEq; each block is
    ``insert(0, …)``-ed (so the region list is detection-reversed) and
    the page then runs overlap resolution with the merge strategy."""
    from ..blocks import BlockKind
    from ..overlap import Region, remove_overlapping

    regions = []
    for d in dets:
        kind = (BlockKind.Equation if d["label"] == "isolated"
                else BlockKind.EmbedEq)
        rect = (float(d["x"]), float(d["y"]),
                float(d["x"] + d["w"]), float(d["y"] + d["h"]))
        regions.insert(0, Region(rect, kind, conf=float(d["score"])))
    return remove_overlapping(regions, strategy="merge")
