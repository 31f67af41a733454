"""TexMix composite stage (A7): reading-order / equation-wrapping
properties over the fixture space, channel-swap behavior, and the
composite's intermediate flow (mask → split → dual recognize)."""

import pytest

from latyas_ray.models.ocr_protocol import DigestOCRModel
from latyas_ray.models.texmix import (
    MixedPage, PageToken, SynthTexModel, SynthTextModel, TexMixModel,
    _row_bands, synth_mixed_page,
)


def _expected_tokens(page):
    out = []
    for row in _row_bands(page.tokens):
        for t in sorted(row, key=lambda t: t.bbox[0]):
            out.append("$" + t.text + "$" if t.is_eq else t.text)
    return out


@pytest.mark.parametrize("chunk", range(4))
def test_reading_order_and_wrapping(chunk):
    m = TexMixModel()
    for seed in range(chunk * 100, (chunk + 1) * 100):
        page = synth_mixed_page(seed)
        out = m.recognize(page)
        assert out.split() == " ".join(_expected_tokens(page)).split(), seed


def test_deterministic():
    m = TexMixModel()
    page_a, page_b = synth_mixed_page(42), synth_mixed_page(42)
    assert m.recognize(page_a) == m.recognize(page_b)


def test_mid_row_equation_is_split_out():
    # one row: "alpha  [eq]  beta" — the text line detector spans the
    # masked hole, so the split step must carve lhs/rhs text pieces
    page = MixedPage([
        PageToken((50, 40, 90, 56), "alpha", False),
        PageToken((100, 40, 160, 56), r"\frac{a}{b}", True),
        PageToken((170, 40, 200, 56), "beta", False),
    ])
    out = TexMixModel().recognize(page)
    assert out.split() == ["alpha", r"$\frac{a}{b}$", "beta"]


def test_row_edge_equations():
    # equations at row start and end never produce phantom text pieces
    page = MixedPage([
        PageToken((50, 40, 110, 56), r"e^{i\pi}+1=0", True),
        PageToken((120, 40, 160, 56), "mid", False),
        PageToken((170, 40, 230, 56), r"x^2+y^2=r^2", True),
    ])
    out = TexMixModel().recognize(page)
    assert out.split() == [r"$e^{i\pi}+1=0$", "mid", r"$x^2+y^2=r^2$"]


def test_equation_only_page():
    page = MixedPage([PageToken((300, 40, 500, 56), r"\sum x_i", True)])
    assert TexMixModel().recognize(page) == r"$\sum x_i$"


def test_text_only_page_passthrough():
    page = MixedPage([
        PageToken((50, 40, 90, 56), "plain", False),
        PageToken((100, 40, 140, 56), "text", False),
    ])
    assert TexMixModel().recognize(page) == "plain text"


def test_channel_swap_changes_output():
    # dropping a different backend into the equation slot visibly and
    # deterministically changes the output (the "real weights drop in"
    # demonstration, same as the OCR registry swap test)
    class DigestEq(SynthTexModel):
        def recognize(self, toks):
            return DigestOCRModel().recognize(
                " ".join(t.text for t in toks if t.is_eq)
            )

    page = synth_mixed_page(7)
    base = TexMixModel().recognize(page)
    swapped = TexMixModel(tex_model=DigestEq()).recognize(page)
    if any(t.is_eq for t in page.tokens):
        assert base != swapped
        assert "[ocr:" in swapped
    assert swapped == TexMixModel(tex_model=DigestEq()).recognize(
        synth_mixed_page(7)
    )


def test_stage_runs_distributed(ray_session):
    from latyas_ray.pipelines.texmix_pipeline import (
        texmix_recognize, texmix_serial_rows,
    )

    sf = "/root/testdata/sf0.001"
    dist = texmix_recognize(sf).to_pandas().sort_values("doc_id")
    serial = texmix_serial_rows(sf)
    assert list(dist["doc_id"]) == [r[0] for r in serial]
    assert list(dist["mixed_text"]) == [r[1] for r in serial]


def test_overlapping_equation_detections_split_like_reference():
    # two eq detections overlapping in x within one line: membership is
    # judged against the ORIGINAL line box (reference :113-116), so BOTH
    # split even though the second's overlap with the post-cut remainder
    # would fall below 0.8
    page = MixedPage([
        PageToken((10, 40, 40, 56), "pre", False),
        PageToken((50, 40, 110, 56), r"\frac{a}{b}", True),
        PageToken((100, 40, 130, 56), r"\sum x_i", True),  # overlaps eq1
        PageToken((140, 40, 170, 56), "post", False),
    ])
    out = TexMixModel().recognize(page)
    toks = out.split()
    # both equations wrapped, pre/post text present exactly once
    assert toks.count(r"$\frac{a}{b}$") == 1
    assert toks.count(r"$\sum") == 1  # "$\sum x_i$" splits on the space
    assert toks.count("pre") == 1 and toks.count("post") == 1
    # no equation text leaks into a TEXT snippet (would appear unwrapped)
    assert r"\frac{a}{b}" not in [t for t in toks if not t.startswith("$")]


def test_batched_generate_contract():
    """A6 batched-inference shape: TexMix routes equation and text
    re-recognition through recognize_batch — ONE stacked call per page
    per channel (the reference stacks all crops into a single generate,
    inference.py:29-48) — and the default per-image fallback produces
    byte-identical output (hash-stable goldens unchanged)."""
    from latyas_ray.models.texmix import (
        SynthTexModel,
        TexMixModel,
        synth_mixed_page,
    )

    calls = {"batch": 0}

    class BatchCountingTex(SynthTexModel):
        def recognize_batch(self, images):
            calls["batch"] += 1
            # a real backend would stack crops into one generate call
            # here; results must match the per-image path exactly
            return [self.recognize(im) for im in images]

    page = synth_mixed_page(7)
    base = TexMixModel().recognize(page)
    got = TexMixModel(tex_model=BatchCountingTex()).recognize(
        synth_mixed_page(7)
    )
    assert got == base
    assert calls["batch"] == 1


def test_recognize_markdown_deterministic():
    """The mix_inference markdown variant over synthetic pages: stable
    across runs, $-wraps inline equations, and keeps all text tokens."""
    from latyas_ray.models.texmix import TexMixModel, synth_mixed_page

    m = TexMixModel()
    for seed in (1, 5, 11):
        page1, page2 = synth_mixed_page(seed), synth_mixed_page(seed)
        md1, md2 = m.recognize_markdown(page1), m.recognize_markdown(page2)
        assert md1 == md2
        assert "$" in md1  # pages always carry at least one equation
