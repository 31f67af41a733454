"""TexMix composite mixed text+equation OCR stage (**A7**) — the
re-expression of reference ``tex_ocr/models/texmix/texmix_model.py:71-151``
(``recognize``): equation detect → per-equation recognize + mask →
text-line detect on the masked page → xy-cut reflow → split text boxes
around embedded equations (``:107-124``, ``shape.py:151`` ``split_x``) →
re-recognize text pieces from the unmasked page → shrink(0.5) + final
xy-cut reflow (``:139-146``; the shrink exists to open gaps between
boxes that touch at split boundaries so the margin-0 cut can separate
them) → space-join (``:148-151``).

The sandbox has no ONNX runtime, so the pixel "image" is a
:class:`MixedPage` — a token field with bboxes and an eq/text flag; crop
and mask operate on token geometry exactly like the reference's
``Layout.crop_image`` / ``mask_image`` operate on pixels.  The two
channel models implement the repo's :class:`~.ocr_protocol.OCRModel`
protocol, so a real TexTeller/Paddle backend drops into the same
composite unchanged.  ``small_image_padding`` (M9,
``texmix_model.py:79-80``) applies to pixel backends only — a token
field has no minimum-size constraint, so the synthetic channel skips it.

In the Ray pipeline the composite is actor-pool warm state
(:class:`TexMixStage`): models built once per actor in ``__init__``,
pages recognized per batch in ``__call__``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..reflow import xy_cut_reflow
from .ocr_protocol import OCRModel, TextBoundingBox

Rect = Tuple[float, float, float, float]


@dataclass(frozen=True)
class PageToken:
    bbox: Rect
    text: str
    is_eq: bool


@dataclass
class MixedPage:
    """A synthetic mixed text/equation page: the token field IS the
    image.  ``crop`` keeps tokens whose center falls inside the rect
    (reading order); ``mask`` removes them — the token-geometry analogs
    of the reference's pixel crop/mask."""

    tokens: List[PageToken] = field(default_factory=list)
    width: float = 800.0
    height: float = 600.0

    def copy(self) -> "MixedPage":
        return MixedPage(list(self.tokens), self.width, self.height)

    def _inside(self, tok: PageToken, rect: Rect) -> bool:
        cx = (tok.bbox[0] + tok.bbox[2]) / 2
        cy = (tok.bbox[1] + tok.bbox[3]) / 2
        return rect[0] <= cx <= rect[2] and rect[1] <= cy <= rect[3]

    def crop(self, rect: Rect) -> List[PageToken]:
        kept = [t for t in self.tokens if self._inside(t, rect)]
        return sorted(kept, key=lambda t: (t.bbox[1] + t.bbox[3], t.bbox[0]))

    def mask(self, rect: Rect) -> None:
        self.tokens = [t for t in self.tokens if not self._inside(t, rect)]


def _row_bands(tokens: Sequence[PageToken]) -> List[List[PageToken]]:
    rows: List[List[PageToken]] = []
    for t in sorted(tokens, key=lambda t: (t.bbox[1] + t.bbox[3], t.bbox[0])):
        if rows and abs(rows[-1][-1].bbox[1] - t.bbox[1]) < 1e-9:
            rows[-1].append(t)
        else:
            rows.append([t])
    return rows


class SynthTexModel(OCRModel):
    """Equation channel on a :class:`MixedPage`: detect = one box per eq
    token; recognize = the eq token text of the crop."""

    name = "texmix_eq/1"

    def detect(self, image: MixedPage) -> List[TextBoundingBox]:
        return [
            TextBoundingBox(*t.bbox, text=None, conf=1.0)
            for t in image.tokens if t.is_eq
        ]

    def recognize(self, image) -> str:
        toks = image if isinstance(image, list) else []
        return " ".join(t.text for t in toks if t.is_eq)


class SynthTextModel(OCRModel):
    """Text channel: detect = one line box per row band spanning the
    row's remaining tokens (a masked hole in the middle is spanned, like
    a real line detector — this is what makes the split step load-
    bearing); recognize = space-join of the crop's text tokens."""

    name = "texmix_text/1"

    def detect(self, image: MixedPage) -> List[TextBoundingBox]:
        out = []
        for row in _row_bands(image.tokens):
            x1 = min(t.bbox[0] for t in row)
            x2 = max(t.bbox[2] for t in row)
            y1 = min(t.bbox[1] for t in row)
            y2 = max(t.bbox[3] for t in row)
            out.append(TextBoundingBox(x1, y1, x2, y2, text=None, conf=1.0))
        return out

    def recognize(self, image) -> str:
        toks = image if isinstance(image, list) else []
        return " ".join(t.text for t in toks if not t.is_eq)


def _split_x(rect: Rect, x: float) -> Tuple[Optional[Rect], Optional[Rect]]:
    """``shape.py:151-159``: cut a rect at ``x``; a cut outside the rect
    leaves it whole on one side."""
    if x <= rect[0]:
        return None, rect
    if x >= rect[2]:
        return rect, None
    return ((rect[0], rect[1], x, rect[3]), (x, rect[1], rect[2], rect[3]))


def _shrink(rect: Rect, factor: float) -> Rect:
    """``shape.py:172-184``: scale around the center."""
    cx, cy = (rect[0] + rect[2]) / 2, (rect[1] + rect[3]) / 2
    hw = (rect[2] - rect[0]) * factor / 2
    hh = (rect[3] - rect[1]) * factor / 2
    return (cx - hw, cy - hh, cx + hw, cy + hh)


def _inter_over_eq(eq: Rect, box: Rect) -> float:
    ix = min(eq[2], box[2]) - max(eq[0], box[0])
    iy = min(eq[3], box[3]) - max(eq[1], box[1])
    area = (eq[2] - eq[0]) * (eq[3] - eq[1])
    if area <= 0:
        return 0.0
    return max(0.0, ix) * max(0.0, iy) / area


class TexMixModel:
    """The composite (``texmix_model.py:40-151``): holds one equation
    model and one text model; ``recognize`` runs the full mixed flow."""

    name = "texmix/1"

    def __init__(self, tex_model: OCRModel = None, text_model: OCRModel = None):
        self.tex_model = tex_model or SynthTexModel()
        self.text_model = text_model or SynthTextModel()

    def _eq_channel(self, page: MixedPage):
        """Shared channel prep for both assembly variants: detect the
        equations, recognize them from the ORIGINAL page in ONE batched
        call (the reference feeds all crops to a single stacked
        generate, inference.py:29-48), and mask each out of a working
        copy (:89-96).  Returns (eq_bboxes, eq_rects, eq_texts, masked);
        what each variant detects/recognizes the TEXT channel against
        (masked vs unmasked) stays explicit at the call sites."""
        eq_bboxes = self.tex_model.detect(page)
        masked = page.copy()
        eq_rects = [(eq.x1, eq.y1, eq.x2, eq.y2) for eq in eq_bboxes]
        eq_texts = self.tex_model.recognize_batch(
            [page.crop(rect) for rect in eq_rects]
        )
        for rect in eq_rects:
            masked.mask(rect)
        return eq_bboxes, eq_rects, eq_texts, masked

    def recognize(self, page: MixedPage) -> str:
        snippets: List[TextBoundingBox] = []

        eq_bboxes, eq_rects, eq_texts, masked = self._eq_channel(page)
        for eq, rect, text in zip(eq_bboxes, eq_rects, eq_texts):
            snippets.append(
                TextBoundingBox(*rect, text="$" + text + "$", conf=eq.conf)
            )
        eq_bboxes = sorted(eq_bboxes, key=lambda e: e.x1)  # :99-101

        # text channel on the masked page, reading-ordered (:103-108)
        text_bboxes = self.text_model.detect(masked)
        order = xy_cut_reflow(
            [(b.x1, b.y1, b.x2, b.y2) for b in text_bboxes],
            margin=0, horizontal_first=False,
        )
        text_bboxes = [text_bboxes[i] for i in order]

        # split every text line around the equations embedded ≥80% in it
        # (:110-124): membership is measured against the ORIGINAL line box
        # (texmix_model.py:113-116 collects need_split_eq_blocks before any
        # cutting), then the x-sorted cursor walk splits sequentially
        for bbox in text_bboxes:
            orig: Rect = (bbox.x1, bbox.y1, bbox.x2, bbox.y2)
            eqs_in = [
                eq for eq in eq_bboxes
                if _inter_over_eq((eq.x1, eq.y1, eq.x2, eq.y2), orig) > 0.8
            ]
            cur: Optional[Rect] = orig
            for eq in eqs_in:
                lhs, _ = _split_x(cur, eq.x1)
                _, cur = _split_x(cur, eq.x2)
                if lhs is not None:
                    snippets.append(TextBoundingBox(*lhs, text=None, conf=1.0))
                if cur is None:
                    break
            if cur is not None:
                snippets.append(TextBoundingBox(*cur, text=None, conf=1.0))

        # re-recognize text pieces from the UNMASKED page (:127-131) —
        # batched like the equation channel (one stacked call per page)
        pending = [s for s in snippets if s.text is None]
        texts = self.text_model.recognize_batch(
            [page.crop((s.x1, s.y1, s.x2, s.y2)) for s in pending]
        )
        for s, t in zip(pending, texts):
            s.text = t

        # final reflow over shrunk boxes — shrinking opens gaps between
        # boxes that touch at split boundaries (:139-146)
        order = xy_cut_reflow(
            [_shrink((s.x1, s.y1, s.x2, s.y2), 0.5) for s in snippets],
            margin=0, horizontal_first=False,
        )
        return " ".join(snippets[i].text for i in order)  # :148-151

    def recognize_markdown(self, page: MixedPage) -> str:
        """The mix_inference markdown assembly over this page — the
        richer M7 variant (``functions/mix_assembly``): isolated
        equations ``$$``-wrapped with tag re-attachment, inline
        equations ``$``-wrapped and bold-stripped, rows joined per
        ``mix_inference.py:218-264``.

        Label split: the reference reads ``embedding``/``isolated`` off
        its latex detector's two classes; the synthetic detector has no
        classes, so an equation ≥80% inside a detected text line — the
        SAME membership test the cursor walk uses
        (``texmix_model.py:113-116``) — is ``embedding``, the rest
        ``isolated``."""
        from ..functions.mix_assembly import assemble_markdown, wrap_boxes

        _, eq_rects, eq_texts, masked = self._eq_channel(page)
        text_bboxes = self.text_model.detect(masked)
        text_texts = self.text_model.recognize_batch(
            [masked.crop((b.x1, b.y1, b.x2, b.y2)) for b in text_bboxes]
        )
        texts = [
            (int(b.x1), int(b.y1), int(b.y2 - b.y1), int(b.x2 - b.x1), t)
            for b, t in zip(text_bboxes, text_texts)
        ]
        equations = []
        for rect, t in zip(eq_rects, eq_texts):
            embedded = any(
                _inter_over_eq(rect, (b.x1, b.y1, b.x2, b.y2)) > 0.8
                for b in text_bboxes
            )
            equations.append(
                (int(rect[0]), int(rect[1]), int(rect[3] - rect[1]),
                 int(rect[2] - rect[0]), t,
                 "embedding" if embedded else "isolated")
            )
        return assemble_markdown(wrap_boxes(texts, equations))


# ------------------------------------------------------------- fixtures

_WORDS = ("flux norm basis lemma field tensor graph prior scale joint "
          "model proof bound dense sparse local global metric").split()
_EQS = (r"\frac{a}{b}", r"\sum_{i=1}^n x_i", r"e^{i\pi}+1=0",
        r"\nabla\cdot F", r"\int_0^1 f", r"x^2+y^2=r^2")


def synth_mixed_page(seed: int) -> MixedPage:
    """Deterministic mixed page: rows of word tokens with inline
    equations dropped into random slots (including row-initial/final and
    adjacent-equation cases), plus occasional display-equation rows."""
    rng = np.random.default_rng(int(seed) + 0x3EB1)
    tokens: List[PageToken] = []
    n_rows = int(rng.integers(3, 7))
    y = 40.0
    for r in range(n_rows):
        if rng.random() < 0.15:  # display equation row
            eq = _EQS[int(rng.integers(0, len(_EQS)))]
            tokens.append(PageToken((300.0, y, 500.0, y + 16.0), eq, True))
            y += 28.0
            continue
        n_words = int(rng.integers(3, 9))
        slots = list(range(n_words + 1))
        eq_slots = sorted(
            int(s) for s in rng.choice(
                slots, size=min(len(slots), int(rng.integers(0, 3))),
                replace=False,
            )
        )
        x = 50.0
        wi = 0
        for slot in range(n_words + 1):
            if slot in eq_slots:
                eq = _EQS[int(rng.integers(0, len(_EQS)))]
                w = 40.0 + 4.0 * len(eq) % 60
                tokens.append(PageToken((x, y, x + w, y + 16.0), eq, True))
                x += w + float(rng.uniform(6, 14))
            if slot < n_words:
                word = _WORDS[int(rng.integers(0, len(_WORDS)))] + str(wi)
                w = 8.0 * len(word)
                tokens.append(PageToken((x, y, x + w, y + 16.0), word, False))
                x += w + float(rng.uniform(6, 14))
                wi += 1
        y += 28.0
    return MixedPage(tokens, width=800.0, height=max(200.0, y + 20.0))
