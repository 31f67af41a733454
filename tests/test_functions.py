"""Tests for the scalar/spatial function library (LaTeX normalizer, row
banding, spatial joins)."""

from latyas_ray.functions.latex import strip_dollar_wrapped, to_katex
from latyas_ray.functions.spatial import (
    find_embedded_equations,
    merge_row_bboxes,
    native_text_for_bbox,
    row_band_sort,
    same_row,
)


# ------------------------------------------------------------------- latex


def test_to_katex_mbox_unwrap():
    assert to_katex(r"a \mbox{b} c") == "a b c"
    assert to_katex(r"\mbox{x\mbox{y}}") == "x y"  # nested unwraps


def test_to_katex_hbox_with_dimension():
    assert to_katex(r"\hbox to 10.0pt{hi}") == "hi"
    assert to_katex(r"\hbox{hi}") == "hi"


def test_to_katex_size_macros_dollar_to_brace():
    assert to_katex(r"\large$x+y$") == r"\large{x+y}"
    assert to_katex(r"\small$a$ rest") == r"\small{a} rest"


def test_to_katex_boldmath_and_emph():
    assert to_katex(r"\boldmath{v}") == r"\bm{v}"
    assert to_katex(r"\emph{word}") == r"\textit{word}"


def test_to_katex_delimiter_braces_stripped():
    assert to_katex(r"\left{(}x\right{)}") == r"\left(x\right)"


def test_to_katex_display_block_newline():
    assert to_katex(r"\[x=1\] tail") == r"x=1\newline tail"
    assert to_katex(r"\[x=1\]") == "x=1"  # trailing newline removed


def test_to_katex_space_macros_and_vspace():
    assert to_katex(r"a\,\,b") == "a b"
    assert to_katex(r"a\;b\vspace{2pt}c") == "a bc"


def test_to_katex_merge_text_runs():
    assert to_katex(r"\text{ab}\text{cd}") == r"\text{abcd}"


def test_to_katex_bf_and_dollar_strip():
    assert to_katex(r"\bf x") == "x"
    assert to_katex(r"pre $x+y$ post") == "pre x+y post"


def test_strip_dollar_wrapped_keeps_macro_dollars():
    # $…$ directly after a macro name is preserved
    s = r"\foo$x$ and $y$"
    out = strip_dollar_wrapped(s)
    assert r"\foo$x$" in out
    assert "$y$" not in out


def test_to_katex_unbalanced_degrades():
    out = to_katex(r"\mbox{unclosed")
    assert "unclosed" in out  # no exception, content preserved


# ----------------------------------------------------------------- spatial


def test_same_row_banding():
    assert same_row((0, 0, 10, 10), (20, 1, 30, 11))     # small offset
    assert same_row((0, 0, 10, 20), (20, 5, 30, 15))     # y-nesting
    assert not same_row((0, 0, 10, 10), (0, 30, 10, 40))  # disjoint
    assert not same_row((0, 0, 10, 10), (0, 6, 10, 16))   # offset 0.6 > 0.4


def test_row_band_sort():
    rects = [
        (50, 2, 90, 12),   # row 1 right
        (0, 30, 40, 40),   # row 2 left
        (0, 0, 40, 10),    # row 1 left
    ]
    assert row_band_sort(rects) == [2, 0, 1]


def test_merge_row_bboxes():
    rects = [
        (0, 0, 12, 10),    # overlaps next in x, same row
        (10, 1, 30, 11),
        (50, 0, 70, 10),   # x-gap → separate
        (0, 30, 20, 40),   # new row
    ]
    out = merge_row_bboxes(rects)
    assert out == [(0, 0, 30, 10), (50, 0, 70, 10), (0, 30, 20, 40)]


def test_find_embedded_equations_margin():
    text_rects = [(0, 0, 100, 50), (0, 100, 100, 150)]
    embed_rects = [(10, 10, 30, 20), (-15, 5, 20, 30), (10, 200, 20, 210)]
    hits = find_embedded_equations(text_rects, embed_rects, margin=20)
    assert hits == {0: [0, 1]}  # second embed inside only via the margin


def test_native_text_for_bbox():
    snippets = [
        ((0, 0, 50, 10), "line one\n"),
        ((0, 12, 50, 22), "line two"),
        ((200, 0, 260, 10), "far away"),
    ]
    out = native_text_for_bbox(snippets, (0, 0, 60, 25))
    assert out == "line oneline two"


def test_pdf_has_equation_flag():
    import json

    from latyas_ray.pdf_extract import PDF_MAGIC, extract_pdf

    pages = [{
        "w": 1000, "h": 1400,
        "blocks": [
            {"label": "Text", "conf": 0.9, "bbox": [80, 100, 920, 300], "text": "body"},
            {"label": "EmbedEq", "conf": 0.9, "bbox": [100, 150, 200, 180], "text": "$x$"},
            {"label": "Text", "conf": 0.9, "bbox": [80, 500, 920, 600], "text": "plain"},
        ],
    }]
    _, regions = extract_pdf(PDF_MAGIC + json.dumps({"pages": pages}).encode())
    flags = {r.text: r.meta.get("has_equation", False) for r in regions if r.text}
    assert flags["body"] is True
    assert flags["plain"] is False


def test_split_text_around_latex():
    from latyas_ray.functions.spatial import split_text_around_latex

    # latex strictly inside a text box → text splits into left + right
    out = split_text_around_latex([(0, 0, 100, 10)], [(40, 0, 60, 10)])
    assert out == [((0, 0, 40, 10), "text"), ((40, 0, 60, 10), "latex"),
                   ((60, 0, 100, 10), "text")]

    # latex overlapping the right edge → text trimmed
    out = split_text_around_latex([(0, 0, 50, 10)], [(40, 0, 80, 10)])
    assert out == [((0, 0, 40, 10), "text"), ((40, 0, 80, 10), "latex")]

    # text fully covered → dropped
    out = split_text_around_latex([(20, 0, 40, 10)], [(0, 0, 60, 10)])
    assert out == [((0, 0, 60, 10), "latex")]

    # overlapping texts merge, then split around latex
    out = split_text_around_latex([(0, 0, 30, 10), (25, 0, 100, 10)],
                                  [(50, 0, 70, 10)])
    assert out == [((0, 0, 50, 10), "text"), ((50, 0, 70, 10), "latex"),
                   ((70, 0, 100, 10), "text")]

    # different rows don't interact
    out = split_text_around_latex([(0, 0, 100, 10)], [(0, 50, 100, 60)])
    assert out == [((0, 0, 100, 10), "text"), ((0, 50, 100, 60), "latex")]

    # empty inputs
    assert split_text_around_latex([], []) == []
    assert split_text_around_latex([(0, 0, 10, 10)], []) == [((0, 0, 10, 10), "text")]


# ------------------------------------------------------------- image ops


def test_pad_to_min_size_small_crop_centered_on_white():
    import numpy as np

    from latyas_ray.functions.image_ops import pad_to_min_size

    img = np.zeros((50, 80), dtype=np.uint8)  # black crop
    out = pad_to_min_size(img)
    assert out.shape == (800, 800)
    # corners stay (blurred) white, center holds the upscaled dark crop
    assert out[0, 0] == 255 and out[-1, -1] == 255
    assert out[400, 400] < 32
    big = np.zeros((500, 500), dtype=np.uint8)
    assert pad_to_min_size(big) is big  # large crops untouched


def test_trim_white_border_crops_to_content():
    import numpy as np

    from latyas_ray.functions.image_ops import trim_white_border

    img = np.full((100, 120), 255, dtype=np.uint8)
    img[40:60, 50:70] = 0
    out = trim_white_border(img, margin=2)
    assert out.shape == (24, 24)
    assert (out[2:-2, 2:-2] == 0).all()
    blank = np.full((10, 10), 255, dtype=np.uint8)
    assert trim_white_border(blank).shape == (10, 10)


def test_mask_keep_crop_regions():
    import numpy as np

    from latyas_ray.functions.image_ops import (
        crop_region,
        keep_regions,
        mask_regions,
        slice_regions,
    )

    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    masked = mask_regions(img, [(2, 2, 5, 5)])
    assert (masked[2:5, 2:5] == 255).all()
    assert masked[0, 0] == img[0, 0]
    kept = keep_regions(img, [(2, 2, 5, 5)])
    assert (kept[2:5, 2:5] == img[2:5, 2:5]).all()
    assert kept[0, 0] == 255
    assert crop_region(img, (2, 2, 5, 5)).shape == (3, 3)
    assert len(slice_regions(img, [(0, 0, 3, 3), (5, 5, 20, 20)])) == 2
    assert slice_regions(img, [(5, 5, 20, 20)])[0].shape == (5, 5)


def test_visualize_sink_ppm_and_labels():
    """S8 visualize sink: per-kind outline colors on a white canvas, PPM
    header, top-right label anchors (layout.py:174-200 semantics)."""
    import json

    import numpy as np

    from latyas_ray.functions.visualize import visualize_regions

    regions = [
        {"kind": "Text", "x1": 10, "y1": 20, "x2": 110, "y2": 60},
        {"kind": "Title", "x1": 10, "y1": 80, "x2": 200, "y2": 120},
    ]
    ppm, labels = visualize_regions(regions, page_w=300, page_h=200)
    assert ppm.startswith(b"P6\n300 200\n255\n")
    img = np.frombuffer(ppm[len(b"P6\n300 200\n255\n"):], dtype=np.uint8)
    img = img.reshape(200, 300, 3)
    assert tuple(img[20, 50]) == (255, 0, 0)      # Text outline: red
    assert tuple(img[80, 50]) == (0, 0, 255)      # Title outline: blue
    assert tuple(img[150, 250]) == (255, 255, 255)  # background white
    lab = json.loads(labels)
    assert lab[0] == {"label": "Text-0", "x": 110, "y": 20}
    assert lab[1]["label"] == "Title-1"
