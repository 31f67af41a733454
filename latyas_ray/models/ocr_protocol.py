"""Executable OCR backend protocol.

Mirrors the reference's model contract and routing surfaces:

- :class:`OCRModel` — ``recognize`` / ``detect`` ABC
  (``/root/reference/latyas/ocr/models/ocr_model.py:24-34``).
- :class:`OCRRegistry` — named-model store + per-kind rule table
  (``add_ocr_model`` / ``add_ocr_rule``,
  ``/root/reference/latyas/pipelines/base_pipeline.py:83-92``; the rule
  set mirrors ``paper_pipeline.py:48-61``).
- TWO registered deterministic backends, so "real weights drop in" is
  demonstrated by swapping, not asserted:

  - :class:`EchoOCRModel` — decodes the region payload bytes as UTF-8.
    In the synthetic corpus the region "crop" IS its text bytes, so echo
    recognition reproduces the reference-semantics output byte-for-byte
    (the default registry; golden snapshots are built against it).
  - :class:`DigestOCRModel` — emits a deterministic token stream derived
    from a blake2b digest of the payload (the shape a real
    PaddleOCR/TexTeller backend would produce from pixels).  Routing the
    rule table at it changes the output deterministically —
    ``tests/test_models.py`` proves the swap.

In the Ray pipeline the registry is actor-pool warm state: construct it
in a stage's ``__init__`` (once per actor), never per batch
(``stages/extract_stage.py``).
"""

from __future__ import annotations

import hashlib
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Dict, List, Union

from ..blocks import BlockKind

Image = Union[bytes, "object"]  # payload bytes; a real backend takes ndarray


@dataclass
class TextBoundingBox:
    """One detected text line: rect + recognized text + confidence
    (the analog of ``ocr/text_bbox.py``)."""

    x1: float
    y1: float
    x2: float
    y2: float
    text: str
    conf: float = 1.0


class OCRModel(ABC):
    """``recognize``: full-region image → text.  ``detect``: image →
    per-line boxes.  (``ocr_model.py:24-34``.)"""

    name: str = "ocr-model"

    @abstractmethod
    def recognize(self, image: Image) -> str:
        ...

    @abstractmethod
    def detect(self, image: Image) -> List[TextBoundingBox]:
        ...

    def recognize_batch(self, images: List[Image]) -> List[str]:
        """Batched recognition — the GPU-intended inference shape: the
        reference stacks ALL crops into ONE generate call
        (``tex_ocr/models/texteller/ocr_model/utils/inference.py:13-49``,
        ``torch.stack`` at ``:32``, ``batch_decode`` at ``:48``), so a
        real TexTeller/GOT-OCR2 backend overrides this with its stacked
        call.  The default is the per-image loop — bit-identical
        results, callers need not know which shape the backend runs."""
        return [self.recognize(im) for im in images]


class EchoOCRModel(OCRModel):
    """Synthetic-channel backend: the crop bytes are the text."""

    name = "ocr_echo/1"

    def recognize(self, image: Image) -> str:
        if isinstance(image, str):
            return image
        return bytes(image).decode("utf-8", errors="replace")

    def detect(self, image: Image) -> List[TextBoundingBox]:
        text = self.recognize(image)
        out = []
        for i, line in enumerate(text.splitlines()):
            out.append(TextBoundingBox(0.0, 16.0 * i, 8.0 * len(line),
                                       16.0 * (i + 1), line))
        return out


class DigestOCRModel(OCRModel):
    """Deterministic stand-in for a real pixel model: output depends only
    on the payload bytes (stable across runs/actors), but differs from the
    echo channel — swapping it in visibly changes pipeline output."""

    name = "ocr_digest/1"

    def recognize(self, image: Image) -> str:
        data = image.encode("utf-8") if isinstance(image, str) else bytes(image)
        d = hashlib.blake2b(data, digest_size=8).hexdigest()
        return f"[ocr:{d}]"

    def detect(self, image: Image) -> List[TextBoundingBox]:
        return [TextBoundingBox(0.0, 0.0, 64.0, 16.0, self.recognize(image))]


class OCRRegistry:
    """Named models + per-kind routing rules (``base_pipeline.py:83-92``)."""

    def __init__(self) -> None:
        self._models: Dict[str, OCRModel] = {}
        self._rules: Dict[BlockKind, str] = {}

    def add_ocr_model(self, name: str, model: OCRModel) -> None:
        self._models[name] = model

    def add_ocr_rule(self, kind: BlockKind, model_name: str) -> None:
        if model_name not in self._models:
            raise KeyError(f"unknown OCR model: {model_name}")
        self._rules[kind] = model_name

    def model_for(self, kind: BlockKind) -> Union[OCRModel, None]:
        name = self._rules.get(kind)
        return self._models[name] if name else None

    def recognize(self, kind: BlockKind, image: Image) -> Union[str, None]:
        """Route one region crop through the rule table; ``None`` when no
        rule covers the kind (the region then contributes no text, exactly
        like rule-less blocks in ``tools/pdf2text.py:32-33``)."""
        m = self.model_for(kind)
        return m.recognize(image) if m is not None else None


def default_registry(backend: Union[OCRModel, None] = None) -> OCRRegistry:
    """The engine's default rule table — same kind→model shape as
    ``paper_pipeline.py:48-61`` (text kinds → the text backend, equation
    kinds → the same backend here since both are deterministic stubs,
    Table → the TSR slot).  ``backend`` swaps every slot at once."""
    text_model = backend or EchoOCRModel()
    eq_model = backend or EchoOCRModel()
    tsr_model = backend or EchoOCRModel()
    reg = OCRRegistry()
    reg.add_ocr_model(text_model.name + "#text", text_model)
    reg.add_ocr_model(eq_model.name + "#eq", eq_model)
    reg.add_ocr_model(tsr_model.name + "#tsr", tsr_model)
    for kind in (
        BlockKind.Title, BlockKind.Text, BlockKind.Caption,
        BlockKind.TableCaption, BlockKind.FigureCaption, BlockKind.Reference,
        BlockKind.Header, BlockKind.Footer, BlockKind.TOC, BlockKind.List,
    ):
        reg.add_ocr_rule(kind, text_model.name + "#text")
    for kind in (BlockKind.Equation, BlockKind.EmbedEq,
                 BlockKind.TextWithEquation):
        reg.add_ocr_rule(kind, eq_model.name + "#eq")
    reg.add_ocr_rule(BlockKind.Table, tsr_model.name + "#tsr")
    return reg
