"""External OCR backends: Tesseract (**A10**) and LLM (**A11**).

These complete the reference's OCR model-class roster on top of the
repo's :class:`~.ocr_protocol.OCRModel` protocol.  Both reference
classes are thin and, as published, partially or fully unrunnable:

- ``ocr/models/tesseract/tesseract_ocr_model.py:25-50`` wraps
  ``pytesseract``: ``__init__`` resolves the tesseract binary under the
  config dir and raises if the file is missing (``:30-33``), then points
  ``pytesseract.pytesseract.tesseract_cmd`` at it (``:34``); ``detect``
  is a single ``image_to_string`` call that IGNORES its ``threshold``
  parameter (``:48-50``).
- ``ocr/models/llm/llm_ocr_model.py:26-56`` is broken as published:
  ``detect`` calls ``self.model.readtext(...)`` (``:53``) but no code
  path ever assigns ``self.model`` — every call raises
  ``AttributeError``.  The body is also an easyocr-style ``readtext``
  invocation, not an LLM client.  What IS recoverable is the contract:
  pad small crops below 400 px (``:51-52`` via ``small_image_padding``),
  hand the image to a pluggable recognizer, join the returned lines with
  ``"\\n"`` (``:56``).

Re-expression strategy (same as the A3–A8 backends): the engine-side
class owns the *contract* — construction-time validation, the pre-call
padding step, the output joining — and delegates the pixel recognition
to an injectable callable.  The default callable uses the real library
when importable (``pytesseract`` here; absent in this sandbox) and
otherwise a deterministic digest recognizer, so the classes are
routable through :class:`~.ocr_protocol.OCRRegistry` and testable
without weights while keeping the drop-in slot for the real backend.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, List, Optional, Sequence, Union

import numpy as np

from ..functions.image_ops import pad_to_min_size
from .ocr_protocol import OCRModel, TextBoundingBox

Image = Union[bytes, str, np.ndarray]


def _payload_digest(image: Image, salt: str) -> str:
    if isinstance(image, np.ndarray):
        data = image.tobytes()
    elif isinstance(image, str):
        data = image.encode("utf-8")
    else:
        data = bytes(image)
    return hashlib.blake2b(salt.encode() + data, digest_size=8).hexdigest()


def _lines_to_boxes(text: str) -> List[TextBoundingBox]:
    """Shared line→box convention of the synthetic channel (one 16-px
    band per recognized line)."""
    return [
        TextBoundingBox(0.0, 16.0 * i, 8.0 * len(line), 16.0 * (i + 1), line)
        for i, line in enumerate(text.splitlines())
    ]


class TesseractOCRModel(OCRModel):
    """Tesseract backend (A10), re-expressing
    ``tesseract_ocr_model.py:25-50``.

    ``cmd_dir`` is the directory holding the tesseract binary (the
    reference's ``pretrained_model_name_or_path``); construction raises
    when the resolved binary is missing, exactly like the reference's
    ``:30-33`` — EXCEPT when a ``runner`` is injected, in which case no
    binary is needed (the sandbox/test path).  The reference's
    ``threshold`` argument is accepted and ignored, as in ``:48``.
    """

    name = "ocr_tesseract/1"

    def __init__(
        self,
        cmd_dir: Optional[str] = None,
        tesseract_cmd: str = "tesseract",
        runner: Optional[Callable[[Image], str]] = None,
    ) -> None:
        self._runner = runner
        self.tesseract_cmd: Optional[str] = None
        if runner is not None:
            return
        if cmd_dir is not None and os.path.exists(cmd_dir):
            self.tesseract_cmd = os.path.join(cmd_dir, tesseract_cmd)
        else:
            # reference :30-33 — missing binary dir is a constructor error
            raise FileNotFoundError("Cannot find the tesseract cmd file.")
        try:  # real library if present (not in this sandbox)
            import pytesseract  # type: ignore

            pytesseract.pytesseract.tesseract_cmd = self.tesseract_cmd
            self._runner = pytesseract.image_to_string
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "pytesseract is not installed; inject runner= to use "
                "TesseractOCRModel without it"
            ) from exc

    def recognize(self, image: Image, threshold: float = 0.3) -> str:
        # threshold accepted-and-ignored per reference :48-50
        return self._runner(image)

    def detect(self, image: Image) -> List[TextBoundingBox]:
        return _lines_to_boxes(self.recognize(image))


def _digest_llm_client(image: Image) -> Sequence[str]:
    """Deterministic stand-in for an LLM vision client: returns a
    'paragraph list' derived from the payload digest (stable across
    actors/runs, distinct from every other backend's output)."""
    return [f"[llm:{_payload_digest(image, 'llm')}]"]


class LLMOCRModel(OCRModel):
    """LLM-vision backend (A11), re-expressing the *intended* contract of
    ``llm_ocr_model.py:26-56`` (the published class is unrunnable —
    ``self.model`` is never assigned, so ``detect`` always raises
    ``AttributeError`` at ``:53``).

    Contract kept: ndarray crops with either side < 400 px are padded
    before recognition (``:51-52``; our M9 :func:`pad_to_min_size` is the
    re-expressed ``small_image_padding``), the client returns a sequence
    of paragraph strings, and the result is their ``"\\n"`` join
    (``:56``).  ``client`` is the pluggable vision-model call; the
    default is a deterministic digest client so the class is routable in
    the registry without network access (there is none in this sandbox).
    """

    name = "ocr_llm/1"

    def __init__(
        self,
        client: Callable[[Image], Sequence[str]] = _digest_llm_client,
        min_size: int = 400,
    ) -> None:
        self._client = client
        self._min_size = min_size

    def _prepare(self, image: Image) -> Image:
        if isinstance(image, np.ndarray) and image.ndim >= 2:
            h, w = image.shape[:2]
            if h < self._min_size or w < self._min_size:
                return pad_to_min_size(image, min_size=self._min_size)
        return image

    def recognize(self, image: Image) -> str:
        return "\n".join(self._client(self._prepare(image)))

    def detect(self, image: Image) -> List[TextBoundingBox]:
        return _lines_to_boxes(self.recognize(image))
