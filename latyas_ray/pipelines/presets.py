"""Named pipeline presets — the reference's ``PaperPipeline`` /
``ReportPipeline`` / ``BookPipeline`` re-expressed as DATA (frozen
dataclasses bundling detector specs + OCR registry rules) instead of
subclasses wired by constructor side effects.

Reference parity, mirrored exactly:

- **paper** (``latyas/pipelines/paper_pipeline.py:18-61``): TWO layout
  models — ``layout_360general`` (``XiaHan19/360LayoutAnalysis-paper-8n``)
  and ``layout_texteller`` (the RT-DETR equation detector,
  ``XiaHan19/texteller_rtdetr_r50vd_6x_coco``) — four OCR model slots
  and TWELVE routing rules: eight text kinds → ``ocr_paddle``,
  Equation/EmbedEq → ``ocr_texteller``, TextWithEquation →
  ``ocr_texmix``, Table → ``tsr_gotocr2``.  QUIRK mirrored in the slot
  naming: the reference binds the NAME ``ocr_paddle`` to its GOT-OCR2
  model (``paper_pipeline.py:36,40`` — the PaddleOCRModel it constructs
  at ``:35`` is only consumed inside TexMix), so in a real deployment
  the "paddle" slots run the LLM OCR.
- **report** (``report_pipeline.py:13-25``) and **book**
  (``book_pipeline.py:12-24``): the reference's two classes are
  IDENTICAL configs — one layout model
  (``XiaHan19/360LayoutAnalysis-general6-8n``), one PaddleOCR model,
  three rules (Title/Text/Caption) — differing only in class name.
  Mirrored as two preset names sharing one config;
  ``tests/test_pipeline.py`` pins both the sharing and the consequence
  (regions outside Title/Text/Caption contribute no text under them).

In this weightless sandbox every slot resolves to a registered
deterministic backend (``echo`` — the byte-true synthetic channel — by
default; ``digest`` stands in for a real pixel model).  Real weights
drop into the same slots by swapping the backend family, proven by
``tests/test_models.py``; what a preset actually changes here — and in
the reference — is the RULE TABLE: which region kinds get recognized at
all (rule-less kinds contribute no text, ``tools/pdf2text.py:32-33``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Tuple

from ..blocks import BlockKind
from ..models.ocr_protocol import (
    DigestOCRModel,
    EchoOCRModel,
    OCRModel,
    OCRRegistry,
)

_BACKENDS: Dict[str, Callable[[], OCRModel]] = {
    "echo": EchoOCRModel,
    "digest": DigestOCRModel,
}

_PAPER_TEXT_KINDS = (
    # paper_pipeline.py:48-55 — the eight text-family rules
    BlockKind.Title, BlockKind.Text, BlockKind.Caption,
    BlockKind.TableCaption, BlockKind.FigureCaption, BlockKind.Reference,
    BlockKind.Header, BlockKind.Footer,
)


@dataclass(frozen=True)
class PipelinePreset:
    """One named pipeline configuration: detector spec names (what a
    real deployment passes to ``from_pretrained``) + OCR model slots +
    the kind→slot rule table."""

    name: str
    layout_models: Tuple[Tuple[str, str], ...]  # (slot, pretrained id)
    ocr_models: Tuple[Tuple[str, str], ...]  # (slot, backend family)
    rules: Tuple[Tuple[BlockKind, str], ...]  # (kind, slot)

    def build_registry(self) -> OCRRegistry:
        """Construct the registry ONCE (actor ``__init__`` territory —
        never per batch)."""
        reg = OCRRegistry()
        for slot, family in self.ocr_models:
            reg.add_ocr_model(slot, _BACKENDS[family]())
        for kind, slot in self.rules:
            reg.add_ocr_rule(kind, slot)
        return reg


PAPER = PipelinePreset(
    name="paper",
    layout_models=(
        ("layout_360general", "XiaHan19/360LayoutAnalysis-paper-8n"),
        ("layout_texteller", "XiaHan19/texteller_rtdetr_r50vd_6x_coco"),
    ),
    ocr_models=(
        ("ocr_paddle", "echo"),  # reference quirk: this slot holds GOT-OCR2
        ("ocr_texteller", "echo"),
        ("ocr_texmix", "echo"),
        ("tsr_gotocr2", "echo"),
    ),
    rules=(
        tuple((k, "ocr_paddle") for k in _PAPER_TEXT_KINDS)
        + ((BlockKind.Equation, "ocr_texteller"),
           (BlockKind.EmbedEq, "ocr_texteller"),
           (BlockKind.TextWithEquation, "ocr_texmix"),
           (BlockKind.Table, "tsr_gotocr2"))
    ),
)

_GENERAL6 = dict(
    layout_models=(
        ("layout_360general", "XiaHan19/360LayoutAnalysis-general6-8n"),
    ),
    ocr_models=(("ocr_paddle", "echo"),),
    rules=(
        (BlockKind.Title, "ocr_paddle"),
        (BlockKind.Text, "ocr_paddle"),
        (BlockKind.Caption, "ocr_paddle"),
    ),
)

REPORT = PipelinePreset(name="report", **_GENERAL6)
BOOK = PipelinePreset(name="book", **_GENERAL6)

PRESETS: Dict[str, PipelinePreset] = {p.name: p for p in (PAPER, REPORT, BOOK)}


def get_preset(name) -> PipelinePreset:
    """Resolve a preset NAME; a :class:`PipelinePreset` passes through
    unchanged, so config-file presets (``pipelines/config.py``) are
    accepted everywhere a name is."""
    if isinstance(name, PipelinePreset):
        return name
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(
            f"unknown pipeline preset {name!r}; available: {sorted(PRESETS)}"
        ) from None


def preset_resume_id(preset) -> str:
    """The STRING identity a partition's lineage records and a resumed
    run matches against (``completed_partitions``).  ``""`` = default
    registry; a registry name is itself; a :class:`PipelinePreset`
    object that IS the registry preset of its name resolves to that
    name (a config file that only names a base preset resumes
    interchangeably with ``--preset``); a CUSTOMIZED preset —
    overridden slots/rules, renamed or not — gets
    ``name+sha256(content)[:12]``.  The content digest is load-bearing:
    lineage that recorded only the NAME let a config file overriding
    slots under an unchanged name alias the base preset, so a resumed
    run could silently skip partitions extracted under a different
    rule table (or vice versa)."""
    import hashlib

    if preset is None:
        return ""
    if isinstance(preset, str):
        return preset
    if PRESETS.get(preset.name) == preset:
        return preset.name
    blob = repr(
        (preset.name, preset.layout_models, preset.ocr_models,
         tuple((k.name, s) for k, s in preset.rules))
    ).encode("utf-8")
    return f"{preset.name}+{hashlib.sha256(blob).hexdigest()[:12]}"
