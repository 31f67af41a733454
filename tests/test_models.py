"""Tests for the model-facing surfaces: OCR protocol routing (two
deterministic backends swapped through the M4 rule table), the numpy
detector-preprocess compose, and the TSR cell serializers (differential
vs a straight port of ``tsr/models/tatr/pipeline.py:240-296``)."""

import random
import xml.etree.ElementTree as ET
from collections import OrderedDict

import numpy as np
import pandas as pd
import pytest

from latyas_ray.blocks import BlockKind
from latyas_ray.models.ocr_protocol import (
    DigestOCRModel,
    EchoOCRModel,
    OCRRegistry,
    default_registry,
)

# ----------------------------------------------------------- OCR protocol


def test_echo_registry_is_identity_on_text_kinds():
    reg = default_registry()
    for kind in (BlockKind.Text, BlockKind.Title, BlockKind.Equation,
                 BlockKind.Table, BlockKind.Reference):
        assert reg.recognize(kind, "hello world") == "hello world"
    # kinds without a rule contribute no OCR text (pdf2text.py:32-33)
    assert reg.recognize(BlockKind.Figure, "x") is None
    assert reg.recognize(BlockKind.Unknown, "x") is None


def test_backend_swap_changes_output_deterministically():
    echo, digest = default_registry(), default_registry(DigestOCRModel())
    out_e = echo.recognize(BlockKind.Text, "sample text")
    out_d = digest.recognize(BlockKind.Text, "sample text")
    assert out_e == "sample text"
    assert out_d != out_e and out_d.startswith("[ocr:")
    # deterministic across independent instances (actor restarts)
    assert default_registry(DigestOCRModel()).recognize(
        BlockKind.Text, "sample text"
    ) == out_d


def test_registry_rejects_rules_for_unregistered_models():
    reg = OCRRegistry()
    reg.add_ocr_model("m", EchoOCRModel())
    reg.add_ocr_rule(BlockKind.Text, "m")
    with pytest.raises(KeyError):
        reg.add_ocr_rule(BlockKind.Title, "missing")


def test_pdf_channel_routes_through_registry():
    """Swapping the backend changes the extracted PDF text
    deterministically; the default echo registry is byte-identical to the
    un-routed channel."""
    import json

    from latyas_ray.pdf_extract import PDF_MAGIC, extract_pdf

    payload = PDF_MAGIC + json.dumps(
        {
            "pages": [
                {
                    "w": 600,
                    "h": 800,
                    "blocks": [
                        {"label": "Text", "conf": 0.9,
                         "bbox": [10, 10, 500, 100], "text": "first para"},
                        {"label": "Title", "conf": 0.8,
                         "bbox": [10, 120, 500, 200], "text": "heading"},
                    ],
                }
            ]
        }
    ).encode()
    text_echo, _ = extract_pdf(payload)
    text_default, _ = extract_pdf(payload, ocr=default_registry())
    text_digest, _ = extract_pdf(payload, ocr=default_registry(DigestOCRModel()))
    assert text_echo == text_default
    assert "first para" in text_echo
    assert "first para" not in text_digest and "[ocr:" in text_digest
    assert text_digest == extract_pdf(
        payload, ocr=default_registry(DigestOCRModel())
    )[0]


def test_detect_shapes():
    boxes = EchoOCRModel().detect(b"line one\nline two")
    assert [b.text for b in boxes] == ["line one", "line two"]
    assert boxes[1].y1 == 16.0


# ------------------------------------------------------ detector preprocess


def test_resize_keep_ratio_min_max_side():
    from latyas_ray.models.det_preprocess import Resize, make_im_info

    im = np.zeros((100, 200, 3), dtype=np.uint8)
    r = Resize([640, 640])
    out, info = r(im, make_im_info(im))
    # min-side scale 6.4 would push max side to 1280 > 640 → max-side wins
    assert out.shape == (320, 640, 3)
    assert np.allclose(info["scale_factor"], [3.2, 3.2])


def test_normalize_permute_padstride_chain():
    from latyas_ray.models.det_preprocess import Compose

    ops = [
        {"type": "Resize", "target_size": [320, 320], "keep_ratio": True},
        {"type": "NormalizeImage", "mean": [0.485, 0.456, 0.406],
         "std": [0.229, 0.224, 0.225], "is_scale": True},
        {"type": "Permute"},
        {"type": "PadStride", "stride": 32},
    ]
    compose = Compose(ops)
    im = np.full((75, 50, 3), 128, dtype=np.uint8)
    inputs = compose(im)
    c, h, w = inputs["image"].shape
    assert c == 3 and h % 32 == 0 and w % 32 == 0
    # normalized interior value: (128/255 - mean)/std
    expect = (128 / 255.0 - 0.485) / 0.229
    assert abs(float(inputs["image"][0, 0, 0]) - expect) < 1e-5
    assert inputs["scale_factor"].dtype == np.float32


def test_letterbox_centers_and_fills():
    from latyas_ray.models.det_preprocess import LetterBoxResize, make_im_info

    im = np.zeros((100, 50, 3), dtype=np.uint8)
    out, info = LetterBoxResize([128, 128])(im, make_im_info(im))
    assert out.shape == (128, 128, 3)
    assert float(out[0, 0, 0]) == 127.5  # pad fill
    assert float(out[64, 64, 0]) == 0.0  # image interior
    assert np.allclose(info["scale_factor"], [1.28, 1.28])


def test_pad_canvas():
    from latyas_ray.models.det_preprocess import Pad, make_im_info

    im = np.zeros((10, 20, 3), dtype=np.uint8)
    out, _ = Pad([32, 32])(im, make_im_info(im))
    assert out.shape == (32, 32, 3)
    assert float(out[31, 31, 0]) == 114.0


def test_bilinear_resize_interpolates():
    from latyas_ray.models.det_preprocess import bilinear_resize

    im = np.array([[0, 100], [100, 200]], dtype=np.uint8)
    out = bilinear_resize(im, 4, 4)
    assert out.shape == (4, 4)
    assert out[0, 0] == 0 and out[3, 3] == 200
    assert 0 < out[1, 1] < 200  # genuinely interpolated interior


# --------------------------------------------------------- TSR serializers
#
# Straight port of the reference serializers (pipeline.py:240-296) for the
# differential check — Block/torch-free, so it imports nothing from the
# reference tree.


def _ref_cells_to_csv(cells):
    if len(cells) > 0:
        num_columns = max([max(cell["column_nums"]) for cell in cells]) + 1
        num_rows = max([max(cell["row_nums"]) for cell in cells]) + 1
    else:
        return
    header_cells = [cell for cell in cells if cell["column header"]]
    if len(header_cells) > 0:
        max_header_row = max([max(cell["row_nums"]) for cell in header_cells])
    else:
        max_header_row = -1
    table_array = np.empty([num_rows, num_columns], dtype="object")
    for cell in cells:
        for row_num in cell["row_nums"]:
            for column_num in cell["column_nums"]:
                table_array[row_num, column_num] = cell["cell text"]
    header = table_array[: max_header_row + 1, :]
    flattened_header = []
    for col in header.transpose():
        flattened_header.append(" | ".join(OrderedDict.fromkeys(col)))
    df = pd.DataFrame(
        table_array[max_header_row + 1:, :], index=None, columns=flattened_header
    )
    return df.to_csv(index=None)


def _ref_cells_to_html(cells):
    cells = sorted(cells, key=lambda k: min(k["column_nums"]))
    cells = sorted(cells, key=lambda k: min(k["row_nums"]))
    table = ET.Element("table")
    current_row = -1
    for cell in cells:
        this_row = min(cell["row_nums"])
        attrib = {}
        colspan = len(cell["column_nums"])
        if colspan > 1:
            attrib["colspan"] = str(colspan)
        rowspan = len(cell["row_nums"])
        if rowspan > 1:
            attrib["rowspan"] = str(rowspan)
        if this_row > current_row:
            current_row = this_row
            if cell["column header"]:
                cell_tag = "th"
                row = ET.SubElement(table, "thead")
            else:
                cell_tag = "td"
                row = ET.SubElement(table, "tr")
        tcell = ET.SubElement(row, cell_tag, attrib=attrib)
        tcell.text = cell["cell text"]
    return str(ET.tostring(table, encoding="unicode", short_empty_elements=False))


def _random_span_cells(rng: random.Random):
    """Rectangular band tiling: random consecutive row/col bands → one
    cell per (row-band, col-band) — every grid slot covered, spans > 1
    common."""

    def bands(n):
        cuts = sorted(rng.sample(range(1, n), rng.randrange(0, n - 1)) if n > 1 else [])
        out, lo = [], 0
        for c in cuts + [n]:
            out.append(list(range(lo, c)))
            lo = c
        return out

    n_rows, n_cols = rng.randrange(1, 6), rng.randrange(1, 5)
    row_bands, col_bands = bands(n_rows), bands(n_cols)
    n_header_bands = rng.randrange(0, len(row_bands) + 1)
    cells = []
    for bi, rb in enumerate(row_bands):
        for ci, cb in enumerate(col_bands):
            text = rng.choice(
                [f"v{bi}_{ci}", "a,b", 'q"x"', "<tag> & more", "", "dup"]
            )
            cells.append(
                {
                    "row_nums": rb,
                    "column_nums": cb,
                    "cell text": text,
                    "column header": bi < n_header_bands,
                }
            )
    return cells


def test_tsr_serializers_match_reference_port_fuzz():
    from latyas_ray.functions.tsr import cells_to_csv, cells_to_html

    rng = random.Random(0x7AB1E)
    for case in range(300):
        cells = _random_span_cells(rng)
        assert cells_to_csv(cells) == _ref_cells_to_csv(cells), f"csv case {case}"
        assert cells_to_html(cells) == _ref_cells_to_html(cells), f"html case {case}"
    assert cells_to_csv([]) is None


def test_pdf_stage_backend_swap_at_actor_level():
    """PdfExtractStage holds the OCR registry as warm actor state;
    constructing the stage with ocr_backend="digest" changes PDF rows'
    extracted bytes deterministically while HTML rows pass through
    untouched."""
    import json

    import pyarrow as pa

    from latyas_ray.pdf_extract import PDF_MAGIC
    from latyas_ray.stages.extract_stage import (
        PdfExtractStage,
        ROUTED_SCHEMA,
        extract_route_batch,
    )

    payload = PDF_MAGIC + json.dumps(
        {"pages": [{"w": 600, "h": 800, "blocks": [
            {"label": "Text", "conf": 0.9, "bbox": [10, 10, 500, 100],
             "text": "pdf body text"}]}]}
    ).encode()
    html = (b"<html><body><main><p>html body</p></main></body></html>")
    batch = pa.table(
        {
            "url": ["u-pdf", "u-html"],
            "html": [payload, html],
            "text": [None, None],
            "lang": ["en", "en"],
        }
    )
    routed = pa.concat_tables(list(extract_route_batch(batch)))
    assert routed.schema.equals(ROUTED_SCHEMA)

    echo_out = PdfExtractStage()(routed).to_pylist()
    digest_out = PdfExtractStage(ocr_backend="digest")(routed).to_pylist()
    echo = {r["url"]: r for r in echo_out}
    digest = {r["url"]: r for r in digest_out}
    assert "pdf body text" in echo["u-pdf"]["extracted_text"]
    assert "[ocr:" in digest["u-pdf"]["extracted_text"]
    assert echo["u-html"]["extracted_text"] == digest["u-html"]["extracted_text"]
    # deterministic across fresh actors
    assert PdfExtractStage(ocr_backend="digest")(routed).to_pylist() == digest_out


# ------------------------- RT-DETR det postprocess (inference.py:179-195)


def _reference_predict_port(outputs, label_list, draw_threshold):
    """Verbatim port of the reference decode loop (det_model/
    inference.py:179-195) — differential control."""
    res = []
    for output in outputs:
        cls_name = label_list[int(output[0])]
        score = output[1]
        xmin = int(max(output[2], 0))
        ymin = int(max(output[3], 0))
        xmax = int(output[4])
        ymax = int(output[5])
        if score > draw_threshold:
            res.append((xmin, ymin, ymax - ymin, xmax - xmin, cls_name,
                        float(score)))
    return res


def test_decode_detections_matches_reference_port():
    import numpy as np

    from latyas_ray.models.det_preprocess import decode_detections

    rng = np.random.default_rng(1234)
    labels = ["isolated", "embedded"]
    for case in range(500):
        n = int(rng.integers(0, 12))
        outputs = np.column_stack([
            rng.integers(0, 2, n).astype(np.float64),
            rng.uniform(0, 1, n),
            rng.uniform(-20, 800, n),
            rng.uniform(-20, 600, n),
            rng.uniform(-20, 900, n),
            rng.uniform(-20, 700, n),
        ]) if n else np.empty((0, 6))
        got = decode_detections(outputs, labels)
        want = _reference_predict_port(outputs, labels, 0.5)
        assert len(got) == len(want), case
        for g, w in zip(got, want):
            assert (g["x"], g["y"], g["h"], g["w"], g["label"]) == w[:5], case
            assert abs(g["score"] - w[5]) < 1e-12


def test_detections_to_regions_contract():
    from latyas_ray.blocks import BlockKind
    from latyas_ray.models.det_preprocess import detections_to_regions

    dets = [
        {"label": "isolated", "score": 0.9, "x": 0, "y": 0, "w": 100, "h": 40},
        {"label": "embedded", "score": 0.6, "x": 300, "y": 0, "w": 50, "h": 20},
        # near-duplicate of the first → overlap-merge resolves to one
        {"label": "isolated", "score": 0.7, "x": 2, "y": 2, "w": 100, "h": 40},
    ]
    regions = detections_to_regions(dets)
    kinds = [r.kind for r in regions]
    assert len(regions) == 2
    assert BlockKind.EmbedEq in kinds and BlockKind.Equation in kinds
    eq = next(r for r in regions if r.kind == BlockKind.Equation)
    # merge keeps the union of the two overlapping isolated boxes
    assert eq.rect == (0.0, 0.0, 102.0, 42.0)


# ---------------------------------------------------------------- A10/A11


def test_tesseract_backend_contract():
    """A10: missing binary dir is a constructor error (reference
    tesseract_ocr_model.py:30-33); an injected runner needs no binary;
    threshold is accepted-and-ignored (:48-50)."""
    from latyas_ray.models.ocr_external import TesseractOCRModel

    with pytest.raises(FileNotFoundError):
        TesseractOCRModel(cmd_dir="/nonexistent/dir")
    with pytest.raises(FileNotFoundError):
        TesseractOCRModel()  # no dir, no runner

    calls = []

    def fake_runner(img):
        calls.append(img)
        return "line one\nline two"

    m = TesseractOCRModel(runner=fake_runner)
    assert m.recognize(b"crop", threshold=0.9) == "line one\nline two"
    boxes = m.detect(b"crop")
    assert [b.text for b in boxes] == ["line one", "line two"]
    assert boxes[1].y1 == 16.0  # shared line-band convention
    assert calls == [b"crop", b"crop"]


def test_llm_backend_pads_small_ndarray_and_joins_lines():
    """A11: crops under 400 px are padded before the client sees them
    (llm_ocr_model.py:51-52); output is the newline join (:56)."""
    import numpy as np

    from latyas_ray.models.ocr_external import LLMOCRModel

    seen = []

    def client(img):
        seen.append(np.asarray(img).shape if hasattr(img, "shape") else img)
        return ["para one", "para two"]

    m = LLMOCRModel(client=client)
    small = np.full((30, 60), 128, dtype=np.uint8)
    assert m.recognize(small) == "para one\npara two"
    assert seen[0][0] >= 400 and seen[0][1] >= 400  # padded
    big = np.full((420, 500), 128, dtype=np.uint8)
    m.recognize(big)
    assert seen[1] == (420, 500)  # untouched
    # bytes payloads (synthetic channel) skip padding entirely
    m.recognize(b"payload")
    assert seen[2] == b"payload"


def test_external_backends_route_through_registry():
    """Both new backends are registry-routable and deterministic across
    independent instances (actor restarts)."""
    from latyas_ray.models.ocr_external import LLMOCRModel, TesseractOCRModel
    from latyas_ray.models.ocr_protocol import default_registry

    reg = default_registry(LLMOCRModel())
    out = reg.recognize(BlockKind.Text, "sample text")
    assert out.startswith("[llm:")
    assert default_registry(LLMOCRModel()).recognize(
        BlockKind.Text, "sample text") == out
    assert out != default_registry(DigestOCRModel()).recognize(
        BlockKind.Text, "sample text")

    reg2 = default_registry(TesseractOCRModel(runner=lambda img: "T"))
    assert reg2.recognize(BlockKind.Text, "sample text") == "T"
