"""Real-PDF-byte channel tests: writer/parser roundtrip (escapes, multi
page, y-flip), run→block grouping, heuristic classification, and the
corpus ``pdf_real`` family flowing through ``extract_one``."""

import random

from latyas_ray.blocks import BlockKind
from latyas_ray.extract import extract_one
from latyas_ray.pdf_real import (
    parse_pdf_pages,
    regions_from_runs,
    write_pdf,
)


def test_roundtrip_preserves_runs_and_escapes():
    runs = [
        (72.0, 100.0, 12.0, "plain text"),
        (72.0, 120.0, 12.0, "parens (nested) and \\backslash\\"),
        (80.5, 140.25, 9.5, "ünïcode · 中文文本"),
    ]
    pdf = write_pdf([{"w": 612.0, "h": 792.0, "runs": runs}])
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    pages = parse_pdf_pages(pdf)
    assert len(pages) == 1
    assert pages[0]["w"] == 612.0 and pages[0]["h"] == 792.0
    got = pages[0]["runs"]
    assert [(round(x, 2), round(y, 2), s, t) for x, y, s, t in got] == [
        (round(x, 2), round(y, 2), s, t) for x, y, s, t in runs
    ]


def test_multi_page_order():
    pages_in = [
        {"w": 612.0, "h": 792.0, "runs": [(72.0, 100.0, 12.0, f"page {i}")]}
        for i in range(3)
    ]
    pages = parse_pdf_pages(write_pdf(pages_in))
    assert [p["runs"][0][3] for p in pages] == ["page 0", "page 1", "page 2"]


def test_region_grouping_and_classification():
    page = {
        "w": 612.0,
        "h": 792.0,
        "runs": [
            (72.0, 28.0, 8.0, "running header"),
            (72.0, 90.0, 20.0, "A Large Title"),
            (72.0, 140.0, 11.0, "line one of para"),
            (72.0, 154.85, 11.0, "line two of para"),   # leading 1.35 → merges
            (72.0, 200.0, 11.0, "a different paragraph"),  # big gap → new block
            (72.0, 240.0, 11.0, "Table 2: totals by region"),
            (72.0, 762.0, 8.0, "page 9"),
        ],
    }
    regions = regions_from_runs(page)
    kinds = [r.kind for r in regions]
    assert kinds == [
        BlockKind.Header, BlockKind.Title, BlockKind.Text, BlockKind.Text,
        BlockKind.TableCaption, BlockKind.Footer,
    ]
    assert regions[2].text == "line one of para\nline two of para"


def test_corpus_pdf_real_family_extracts():
    from latyas_ray.corpus import _FAMILY_CUM, _pick, _rng, make_row

    doc_id = 0
    found = 0
    while found < 3 and doc_id < 3000:
        fam = _pick(_FAMILY_CUM, _rng(doc_id, "family").random())
        if fam == "pdf_real":
            row = make_row(doc_id)
            assert row["html"].startswith(b"%PDF-1.4")
            res = extract_one(row["url"], row["html"], row["text"], row["lang"])
            assert res["error"] == ""
            assert res["payload_kind"] == "pdf"
            assert len(res["extracted_text"]) > 0
            assert res["n_regions"] >= 3  # header + title + body at least
            # determinism
            again = extract_one(row["url"], row["html"], row["text"], row["lang"])
            assert again["checksum"] == res["checksum"]
            found += 1
        doc_id += 1
    assert found == 3, "corpus must actually emit pdf_real docs"


def test_parser_tolerates_junk_after_eof_and_missing_contents():
    pdf = write_pdf([{"w": 300.0, "h": 400.0, "runs": [(10.0, 50.0, 10.0, "x")]}])
    pages = parse_pdf_pages(pdf + b"\ngarbage trailing bytes")
    assert pages[0]["runs"][0][3] == "x"


def test_fuzz_roundtrip_random_layouts():
    rng = random.Random(0x9DF)
    for _ in range(50):
        pages_in = []
        for _ in range(rng.randint(1, 3)):
            runs = []
            y = 30.0
            for _ in range(rng.randint(1, 12)):
                text = "".join(
                    rng.choice("abc ()\\xyz0123 中文") for _ in range(rng.randint(1, 40))
                )
                runs.append((float(rng.randint(10, 500)), y,
                             float(rng.choice([8, 11, 14, 20])), text))
                y += rng.randint(10, 40)
            pages_in.append({"w": 612.0, "h": 792.0, "runs": runs})
        pages = parse_pdf_pages(write_pdf(pages_in))
        assert [p["runs"] for p in pages] == [
            [(x, y, s, t) for x, y, s, t in p["runs"]] for p in pages_in
        ]


def test_corrupt_pdf_bytes_dead_letter_not_crash():
    """Garbage %PDF payloads must flow through the dead-letter path (or
    yield an empty doc), never crash a batch task."""
    cases = [
        b"%PDF-1.4 garbage with no objects at all",
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\ntrailer",
        b"%PDF-1.4\n" + b"\xff\xfe" * 100,
        b"%PDF-1.4\n1 0 obj\n<< /Type /Pages /Kids [9 0 R] >>\nendobj\n",
    ]
    for payload in cases:
        res = extract_one("u", payload, None, "en")
        assert res["payload_kind"] == "pdf"
        # either clean-empty or recorded error — both are valid outcomes;
        # what is NOT valid is an exception escaping extract_one
        assert isinstance(res["extracted_text"], str)
        assert res["checksum"]
