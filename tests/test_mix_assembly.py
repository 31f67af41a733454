"""Differential: functions/mix_assembly vs the verbatim reference port
(tests/_mix_port.py) — tag re-attachment, inline bold-strip, row
ordering and spacing quirks, over randomized synthetic pages."""

import random

from latyas_ray.functions.mix_assembly import (
    MdBox,
    assemble_markdown,
    reattach_tag,
    same_row,
    strip_inline_bold,
    wrap_boxes,
)

from _mix_port import Bbox, mix_markdown

_INLINE_BITS = (
    "x", "y_2", r"\alpha", r"\bm{ab}", r"\textbf{c}", r"\mathbf{x_{i}}",
    r"\boldsymbol{\bm{d}}", r"\textit{t}", "{n{est}ed}",
    r"\begin{split}a+b\end{split}", "  ", "+", "=", r"\frac{1}{2}",
)
_TEXT_BITS = (
    "(1)", "(12)", " (3) ", "Eq 4", "where", "so that", "(a.b)", "()",
    "see above.", "(x", "y)",
)
_ISO_BITS = (r"E=mc^2", r"\sum_i x_i \tag{9}", r"a\\b", r"\int f",
             r"x \tag{1} y")


def _rand_boxes(rng):
    """Random rows with jittered heights so the 0.4-threshold same-row
    predicate gets exercised on both sides of the boundary."""
    texts, eqs = [], []
    for row in range(rng.randint(1, 6)):
        y0 = row * 80
        for _ in range(rng.randint(0, 4)):
            x = rng.randrange(0, 900)
            y = y0 + rng.randrange(-25, 26)
            h = rng.randrange(18, 61)
            w = rng.randrange(10, 120)
            kind = rng.random()
            if kind < 0.45:
                texts.append((x, y, h, w, rng.choice(_TEXT_BITS)))
            elif kind < 0.8:
                c = " ".join(
                    rng.choice(_INLINE_BITS)
                    for _ in range(rng.randint(1, 4))
                )
                eqs.append((x, y, h, w, c, "embedding"))
            else:
                eqs.append((x, y, h, w, rng.choice(_ISO_BITS), "isolated"))
    return texts, eqs


def test_mix_markdown_matches_reference_port():
    for seed in range(500):
        rng = random.Random(f"mix-assembly/{seed}")
        texts, eqs = _rand_boxes(rng)
        got = assemble_markdown(wrap_boxes(texts, eqs))

        port_boxes = [
            Bbox(x, y, h, w, label="text", content=c)
            for (x, y, h, w, c) in texts
        ]
        for x, y, h, w, c, label in eqs:
            content = (
                " $" + c + "$ " if label == "embedding"
                else "\n\n$$" + c + "$$\n\n"
            )
            port_boxes.append(Bbox(x, y, h, w, label=label, content=content))
        want = mix_markdown(port_boxes)
        assert got == want, f"seed {seed}:\n got={got!r}\nwant={want!r}"


def test_tag_reattach_semantics():
    # number in parens is unwrapped into \tag
    md = "\n\n$$E=mc^2$$\n\n"
    assert reattach_tag(md, " (7) ") == "\n\n$$E=mc^2\\tag{7}$$\n\n"
    # a second number on the same row appends into the existing tag
    md2 = reattach_tag(md, "(7)")
    assert reattach_tag(md2, "(8)") == "\n\n$$E=mc^2\\tag{7, 8}$$\n\n"
    # non-paren text goes in verbatim (stripped)
    assert reattach_tag(md, " Eq 4 ") == "\n\n$$E=mc^2\\tag{Eq 4}$$\n\n"


def test_inline_bold_strip_quirks():
    # \bm removed, wrapper re-tightened, spaces collapsed
    assert strip_inline_bold(" $\\bm{x}+1$ ") == " $x +1$ "
    # nested bold macros all stripped (change_all re-applies)
    assert "\\bm" not in strip_inline_bold(" $\\boldsymbol{\\bm{d}}$ ")
    # split -> aligned
    out = strip_inline_bold(" $\\begin{split}a\\end{split}$ ")
    assert "aligned" in out and "split" not in out


def test_prev_not_advanced_after_tag_quirk():
    """Two text boxes on an isolated formula's row both fold into the
    tag (the reference's `continue` skips the prev update)."""
    boxes = wrap_boxes(
        texts=[(900, 100, 30, 40, "(1)"), (950, 100, 30, 40, "(2)")],
        equations=[(100, 100, 30, 600, "E=mc^2", "isolated")],
    )
    assert assemble_markdown(boxes) == "$$E=mc^2\\tag{1, 2}$$"


def test_same_row_threshold_boundary():
    a = MdBox(0, 0, 50, 10, "text", "")
    # |dy|/max(h) = 19/50 < 0.4 -> same row; 25/50 >= 0.4 -> not
    assert same_row(a, MdBox(0, 19, 50, 10, "text", ""))
    assert not same_row(a, MdBox(0, 25, 50, 10, "text", ""))
    # vertical containment is same-row regardless of threshold
    assert same_row(a, MdBox(0, 20, 5, 10, "text", ""))
