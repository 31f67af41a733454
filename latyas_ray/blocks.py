"""Region (block) kinds and detector-label classification.

The 18-value kind enum mirrors the reference's ``BlockType``
(``/root/reference/latyas/layout/block.py:8-27``) — the integer values are
load-bearing: the overlap-merge strategy resolves conflicting kinds by
**max enum value** (``layout.py:120-126``), so the ordering must match.

``kind_from_label`` reimplements ``BlockType.from_str``
(``block.py:29-68``) with one deliberate fix: the reference tests
``"text" in s`` first, so the label ``"TextWithEquation"`` can never map to
``TextWithEquation`` (latent bug, ``block.py:31``).  We check the most
specific substrings first and document this as intended semantics
(SURVEY.md §7.4.5).
"""

from __future__ import annotations

from enum import IntEnum


class BlockKind(IntEnum):
    Unknown = 0
    Text = 1
    Title = 2
    Caption = 3
    Figure = 4
    FigureCaption = 5
    Table = 6
    TableCaption = 7
    Header = 8
    Footer = 9
    Reference = 10
    Equation = 11
    EmbedEq = 12
    TOC = 13
    List = 14
    Icon = 15
    QRCode = 16
    BarCode = 17
    TextWithEquation = 18


def kind_from_label(label: str) -> BlockKind:
    """Classify a detector class-name string into a :class:`BlockKind`.

    Substring match, most-specific first (fixes ``block.py:31`` ordering).
    """
    s = label.lower()
    if "textwithequation" in s:
        return BlockKind.TextWithEquation
    if "text" in s:
        return BlockKind.Text
    if "title" in s:
        return BlockKind.Title
    if "caption" in s and "figure" in s:
        return BlockKind.FigureCaption
    if "caption" in s and "table" in s:
        return BlockKind.TableCaption
    if "caption" in s:
        return BlockKind.Caption
    if "figure" in s:
        return BlockKind.Figure
    if "table" in s:
        return BlockKind.Table
    if "header" in s:
        return BlockKind.Header
    if "footer" in s:
        return BlockKind.Footer
    if "reference" in s:
        return BlockKind.Reference
    if "embedeq" in s:
        return BlockKind.EmbedEq
    if "equation" in s:
        return BlockKind.Equation
    if "toc" in s:
        return BlockKind.TOC
    if "list" in s:
        return BlockKind.List
    if "icon" in s:
        return BlockKind.Icon
    if "qrcode" in s:
        return BlockKind.QRCode
    if "barcode" in s:
        return BlockKind.BarCode
    return BlockKind.Unknown


# Category predicates (block.py:95-121).
_TEXTUAL = frozenset(
    {
        BlockKind.Text,
        BlockKind.Caption,
        BlockKind.FigureCaption,
        BlockKind.TableCaption,
        BlockKind.Title,
        BlockKind.Reference,
        BlockKind.Header,
        BlockKind.Footer,
    }
)
_IMAGE = frozenset(
    {BlockKind.Figure, BlockKind.Icon, BlockKind.QRCode, BlockKind.BarCode}
)
_EQUATION = frozenset({BlockKind.Equation, BlockKind.EmbedEq})


def is_text_block(kind: BlockKind) -> bool:
    return kind in _TEXTUAL


def is_image_block(kind: BlockKind) -> bool:
    return kind in _IMAGE


def is_equation_block(kind: BlockKind) -> bool:
    return kind in _EQUATION


# Routing table — the per-kind keep/drop rule set, the analog of the
# reference pipelines' OCR rule tables (``pipelines/base_pipeline.py:91-92``
# registration; ``paper_pipeline.py:18-59`` uses 12 rules).  Kinds in KEEP
# contribute text to the assembled document; everything else is detected,
# recorded as a region, but contributes no text — exactly how blocks
# without rules/text are skipped at assembly (``tools/pdf2text.py:32-33``).
KEEP_KINDS = frozenset(
    {
        BlockKind.Text,
        BlockKind.Title,
        BlockKind.Caption,
        BlockKind.FigureCaption,
        BlockKind.TableCaption,
        BlockKind.Table,
        BlockKind.Reference,
        BlockKind.TOC,
        BlockKind.List,
        BlockKind.Equation,
        BlockKind.TextWithEquation,
    }
)
# EmbedEq is explicitly skipped at assembly even when it has text
# (``tools/pdf2text.py:34-35``); Header/Footer are textual but boilerplate.
