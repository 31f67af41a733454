"""TexTeller mixed-page markdown assembly — the richer M7 variant.

Re-expression of the reference's markdown walk
(``latyas/layout/models/texteller/utils/mix_inference.py:218-264``):
sorted text/equation boxes are joined into one markdown string with two
extra string kernels the basic frozen-separator assembly lacks:

- **equation tag re-attachment** (``mix_inference.py:225-240``): a text
  box sitting on the same row as a preceding display formula is its
  equation number — its content (parens stripped) is folded back into
  the formula as ``\\tag{…}`` (appending to an existing ``\\tag`` when
  the formula already has one);
- **inline bold-strip** (``:245-263``): inline formulas lose
  ``\\bm/\\boldsymbol/\\textit/\\textbf/\\mathbf`` wrappers, ``split``
  environments become ``aligned``, and runs of spaces collapse.

Reference quirks mirrored VERBATIM (differential-tested against a
straight port in ``tests/test_mix_assembly.py``):

- ``prev`` is NOT advanced after a tag re-attach (``:240`` ``continue``),
  so several same-row text boxes each merge into the same tag;
- rows are separated by a SPACE, not a newline (``:242-243``);
- ``\\textbf`` appears twice in the strip list (``:248-249``) — a
  duplicate line in the reference, harmless, pinned;
- the same-row test is ``Bbox.THREADHOLD`` (sic) = 0.4 over the larger
  box height (``Bbox.py:18,45-53``);
- boxes ordering is ``Bbox.__lt__`` (``Bbox.py:55-63``): by top-y across
  rows, by x within a row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import cmp_to_key
from typing import List, Sequence

from .latex import _rewrite_macro

SAME_ROW_THRESHOLD = 0.4  # Bbox.THREADHOLD (sic), Bbox.py:18

_TAG_RE = re.compile(r"\\tag\{.*\}$")

# (macro, replacement) pairs of the inline cleanup, IN REFERENCE ORDER —
# \textbf twice, exactly as mix_inference.py:245-252 lists them.
_BOLD_STRIP = (
    "\\bm", "\\boldsymbol", "\\textit", "\\textbf", "\\textbf", "\\mathbf",
)


@dataclass
class MdBox:
    """Axis-aligned box in the mix_inference coordinate convention:
    integer upper-left + height/width (``Bbox.py:17-26``)."""

    x: int
    y: int
    h: int
    w: int
    label: str  # "text" | "embedding" | "isolated"
    content: str


def same_row(a: MdBox, b: MdBox) -> bool:
    """``Bbox.same_row`` (``Bbox.py:45-53``): vertical containment either
    way → same row; disjoint vertical extents → not; otherwise top-y
    distance under 0.4× the larger height."""
    if (a.y >= b.y and a.y + a.h <= b.y + b.h) or (
        a.y <= b.y and a.y + a.h >= b.y + b.h
    ):
        return True
    if a.y + a.h <= b.y or a.y >= b.y + b.h:
        return False
    return 1.0 * abs(a.y - b.y) / max(a.h, b.h) < SAME_ROW_THRESHOLD


def _box_cmp(a: MdBox, b: MdBox) -> int:
    # Bbox.__lt__ (Bbox.py:55-63): rows top-to-bottom, x within a row
    if not same_row(a, b):
        if a.y < b.y:
            return -1
        if b.y < a.y:
            return 1
        return 0
    if a.x < b.x:
        return -1
    if b.x < a.x:
        return 1
    return 0


def strip_inline_bold(content: str) -> str:
    """The embedding-formula cleanup (``mix_inference.py:245-263``).
    ``content`` must carry the ``' $…$ '`` wrapper the recognizer
    attached (``:213``); the wrapper is re-tightened after cleanup."""
    for macro in _BOLD_STRIP:
        content = _rewrite_macro(content, macro, " ", ("{", "}"), ("", " "))
    content = content.replace(r"\begin{split}", r"\begin{aligned}")
    content = content.replace(r"\end{split}", r"\end{aligned}")
    content = re.sub(r" +", " ", content)
    assert content.startswith(" $") and content.endswith("$ ")
    return " $" + content[2:-2].strip() + "$ "


def reattach_tag(md: str, number_text: str) -> str:
    """Fold an equation number into the display formula that ``md``
    currently ends with (``mix_inference.py:231-239``).  ``md`` ends
    with ``$$\\n\\n`` by construction (the isolated wrapper, ``:215``)."""
    number_text = number_text.strip()
    if number_text.startswith("(") and number_text.endswith(")"):
        number_text = number_text[1:-1]
    if _TAG_RE.search(md[:-4]) is not None:
        # in case of multiple tag
        return md[:-5] + f", {number_text}" + "}" + md[-4:]
    return md[:-4] + f"\\tag{{{number_text}}}" + md[-4:]


def assemble_markdown(boxes: Sequence[MdBox]) -> str:
    """The full walk (``mix_inference.py:218-264``) over pre-wrapped
    boxes: text content verbatim, embedding content ``' $…$ '``-wrapped,
    isolated content ``'\\n\\n$$…$$\\n\\n'``-wrapped (``:211-215``)."""
    bxs = sorted(boxes, key=cmp_to_key(_box_cmp))
    if not bxs:
        return ""
    md = ""
    prev = MdBox(bxs[0].x, bxs[0].y, -1, -1, label="guard", content="")
    for curr in bxs:
        if prev.label == "isolated" and curr.label == "text" and same_row(prev, curr):
            md = reattach_tag(md, curr.content)
            continue  # prev NOT advanced — the reference quirk
        if not same_row(prev, curr):
            md += " "
        content = curr.content
        if curr.label == "embedding":
            content = strip_inline_bold(content)
        md += content
        prev = MdBox(curr.x, curr.y, curr.h, curr.w, curr.label, content)
    return md.strip()


def wrap_boxes(
    texts: Sequence[tuple], equations: Sequence[tuple]
) -> List[MdBox]:
    """Build pre-wrapped boxes from raw tuples: texts are
    ``(x, y, h, w, content)``; equations are
    ``(x, y, h, w, content, label)`` with the detector's
    ``embedding``/``isolated`` class carried through (the reference's
    two latex classes, ``mix_inference.py:210-215``) — embedding →
    ``' $…$ '``, isolated → ``'\\n\\n$$…$$\\n\\n'``.  The isolated/
    embedding split MUST come from the detector: a text box on an
    isolated formula's row is its equation number (the tag re-attach
    trigger), so row geometry cannot recover the label."""
    out = [MdBox(x, y, h, w, "text", c) for (x, y, h, w, c) in texts]
    for x, y, h, w, c, label in equations:
        if label == "embedding":
            out.append(MdBox(x, y, h, w, "embedding", " $" + c + "$ "))
        elif label == "isolated":
            out.append(MdBox(x, y, h, w, "isolated", "\n\n$$" + c + "$$\n\n"))
        else:
            raise ValueError(f"unknown equation label: {label!r}")
    return out
