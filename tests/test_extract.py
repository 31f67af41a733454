"""Unit tests for the two extraction channels and the per-document oracle.

Handcrafted micro-fixtures per FIXTURES.md §4: segmentation, boilerplate
classification, nested dedup, reading order, routing/caption filters,
assembly separators, pseudo-PDF detect → merge → reflow → assemble, and
the reconciliation channel."""

import json

from latyas_ray.blocks import BlockKind
from latyas_ray.extract import extract_one
from latyas_ray.html_extract import extract_html
from latyas_ray.pdf_extract import PDF_MAGIC, extract_pdf


def _html(body: str) -> bytes:
    return f"<html><head><title>t</title></head><body>{body}</body></html>".encode()


def _pdf(pages) -> bytes:
    return PDF_MAGIC + json.dumps({"pages": pages}).encode()


def _block(label, bbox, text, conf=0.9):
    return {"label": label, "conf": conf, "bbox": bbox, "text": text}


# ------------------------------------------------------------- html channel


def test_html_basic_article():
    text, regions = extract_html(
        _html(
            "<header>site head</header><nav><a href='/'>Home</a></nav>"
            "<main><h1>The Title</h1><p>Para one.</p><p>Para two.</p></main>"
            "<footer>the footer</footer>"
        )
    )
    assert text == "The Title\n\nPara one.\n\nPara two."
    kinds = [r.kind for r in regions]
    assert kinds == [
        BlockKind.Header,
        BlockKind.Header,  # nav
        BlockKind.Title,
        BlockKind.Text,
        BlockKind.Text,
        BlockKind.Footer,
    ]
    # char spans reconstruct the contributing text exactly
    for r in regions:
        if r.meta["char_start"] >= 0:
            assert text[r.meta["char_start"]: r.meta["char_end"]] == r.text


def test_html_boilerplate_classes_and_link_density():
    text, regions = extract_html(
        _html(
            '<div class="cookie-banner">We use cookies. <a>Accept</a></div>'
            "<main><p>Real content paragraph here.</p></main>"
            '<div class="related"><a>rel one</a> <a>rel two</a></div>'
            # no boiler class, but link-dense and short → boilerplate
            "<div><a>l1</a> <a>l2</a> <a>l3</a></div>"
        )
    )
    assert text == "Real content paragraph here."
    # cookie div before content → Header; link-dense divs after → Footer
    assert regions[0].kind == BlockKind.Header
    assert regions[2].kind == BlockKind.Footer
    assert regions[3].kind == BlockKind.Footer


def test_html_nested_dup_removed():
    text, regions = extract_html(
        _html(
            "<main><div class='a'><div><p>Same para.</p></div></div>"
            "<div class='b'><div><p>Same para.</p></div></div></main>"
        )
    )
    assert text == "Same para."
    assert len([r for r in regions if r.kind == BlockKind.Text]) == 1


def test_html_equation_wrapping():
    text, _ = extract_html(_html("<main><p>Before.</p><p>$$E=mc^2$$</p></main>"))
    assert text == "Before.\n\n\n$$\nE=mc^2\n$$\n"


def test_html_table_list_figure():
    text, regions = extract_html(
        _html(
            "<main><table><caption>Table 1: caption</caption>"
            "<tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>"
            "<ul><li>first</li><li>second</li></ul>"
            "<figure><img src='x.png'><figcaption>Figure 1: fig</figcaption></figure>"
            "</main>"
        )
    )
    assert "Table 1: caption" in text
    assert "A\tB\n1\t2" in text
    assert "- first\n- second" in text
    assert "Figure 1: fig" in text
    kinds = {r.kind for r in regions}
    assert BlockKind.Figure in kinds and BlockKind.FigureCaption in kinds


def test_html_zh_caption_filter():
    # M6 (pdf2txt.py:86-89): zh captions starting 图/表 are dropped
    text, _ = extract_html(
        _html(
            "<main><p>正文段落内容在此处展开并且足够长。</p>"
            "<table><caption>表 1: 指标</caption><tr><td>x</td></tr></table>"
            "<figure><figcaption>图 1: 概览</figcaption></figure>"
            "<p>详见下文，见表3。</p></main>"
        )
    )
    assert "表 1" not in text
    assert "图 1" not in text
    assert "见表3" not in text
    assert "正文段落" in text
    assert "x" in text  # the table grid itself is kept


def test_html_malformed_recovers():
    text, _ = extract_html(
        _html("<main><p>first<p>second</div><p>bad &nosuch; entity</main>")
    )
    assert "first" in text and "second" in text and "bad" in text


def test_html_empty():
    text, regions = extract_html(_html(""))
    assert text == "" and regions == []
    text, regions = extract_html(b"")
    assert text == "" and regions == []


def test_html_two_column_reading_order():
    # right column first in DOM; extraction must read left column first
    text, _ = extract_html(
        _html(
            "<main><h1>Head</h1><div class='columns'>"
            "<div class='col right'><p>R1.</p><p>R2.</p></div>"
            "<div class='col left'><p>L1.</p><p>L2.</p></div>"
            "</div></main>"
        )
    )
    assert text == "Head\n\nL1.\n\nL2.\n\nR1.\n\nR2."


# -------------------------------------------------------------- pdf channel


def test_pdf_conf_threshold_and_order():
    pages = [
        {
            "w": 1000,
            "h": 1400,
            "blocks": [
                _block("Text", [80, 400, 920, 500], "second para"),
                _block("Text", [80, 100, 920, 200], "first para"),
                _block("Text", [80, 700, 920, 800], "dropped low conf", conf=0.2),
                _block("Header", [100, 10, 900, 40], "running head"),
            ],
        }
    ]
    text, regions = extract_pdf(_pdf(pages))
    # low-conf gone entirely; header detected but not assembled
    assert text == "first para\n\n\nsecond para\n\n\n"
    assert len(regions) == 3
    assert regions[0].meta["order"] >= 0


def test_pdf_overlap_merge_keeps_later_with_union_and_max_kind():
    pages = [
        {
            "w": 1000,
            "h": 1400,
            "blocks": [
                _block("Text", [80, 100, 920, 200], "original"),
                _block("Title", [90, 110, 910, 190], "dup title"),
            ],
        }
    ]
    text, regions = extract_pdf(_pdf(pages))
    assert len(regions) == 1
    assert regions[0].kind == BlockKind.Title  # max enum of Text(1)/Title(2)
    assert regions[0].rect == (80, 100, 920, 200)  # union bbox
    assert text == "dup title\n\n\n"


def test_pdf_equation_wrap_and_embedeq_skip():
    pages = [
        {
            "w": 1000,
            "h": 1400,
            "blocks": [
                _block("Equation", [80, 100, 920, 160], "E=mc^2"),
                _block("EmbedEq", [80, 300, 920, 340], "$x$"),
                _block("Text", [80, 500, 920, 600], "after"),
            ],
        }
    ]
    text, _ = extract_pdf(_pdf(pages))
    assert text == "\n$$\nE=mc^2\n$$\n\n\n\nafter\n\n\n"


def test_pdf_multi_page_join():
    page = {
        "w": 1000,
        "h": 1400,
        "blocks": [_block("Text", [80, 100, 920, 200], "pg")],
    }
    text, regions = extract_pdf(_pdf([page, page]))
    assert text == "pg\n\n\npg\n\n\n"
    assert [r.page for r in regions] == [0, 1]


def test_pdf_char_spans():
    pages = [
        {
            "w": 1000,
            "h": 1400,
            "blocks": [
                _block("Text", [80, 100, 920, 200], "alpha"),
                _block("Text", [80, 300, 920, 400], "beta"),
            ],
        }
    ]
    text, regions = extract_pdf(_pdf(pages))
    for r in regions:
        if r.meta["char_start"] >= 0:
            assert text[r.meta["char_start"]: r.meta["char_end"]] == r.text


# ------------------------------------------------------------------ oracle


def test_extract_one_dispatch_and_checksum():
    import hashlib

    res = extract_one("u1", _html("<main><p>Hello world.</p></main>"), "Hello world.", "en")
    assert res["payload_kind"] == "html"
    assert res["extracted_text"] == "Hello world."
    assert res["final_text"] == "Hello world."
    assert res["text_source"] == "channel"
    assert res["checksum"] == hashlib.sha256(b"Hello world.").hexdigest()

    pdf = _pdf([{"w": 1000, "h": 1400,
                 "blocks": [_block("Text", [80, 100, 920, 200], "pdf body")]}])
    res = extract_one("u2", pdf, "completely different channel text goes here", "en")
    assert res["payload_kind"] == "pdf"
    assert res["extracted_text"] == "pdf body\n\n\n"
    assert res["text_source"] == "extractor"


def test_corpus_row_determinism_and_schema():
    from latyas_ray.corpus import PAGES_SCHEMA, make_row, make_table

    rows = [make_row(d) for d in (0, 1, 2, 17, 42)]
    rows2 = [make_row(d) for d in (0, 1, 2, 17, 42)]
    assert rows == rows2
    t = make_table([0, 1, 2, 17, 42])
    assert t.schema.equals(PAGES_SCHEMA)
    assert t.num_rows == 5


def test_route_batch_size_cap_yields_bounded_tables(monkeypatch):
    """With a tiny byte cap, one input batch yields several routed tables
    whose concatenation equals the uncapped output."""
    import pyarrow as pa

    import latyas_ray.stages.extract_stage as es
    from latyas_ray.corpus import make_row
    from latyas_ray.schema import PAGES_SCHEMA

    rows = [make_row(i) for i in range(24)]
    batch = pa.Table.from_pylist(
        [{k: r[k] for k in PAGES_SCHEMA.names} for r in rows], schema=PAGES_SCHEMA
    )
    uncapped = pa.concat_tables(list(es.extract_route_batch(batch)))
    monkeypatch.setattr(es, "SIZE_CAP_BYTES", 4096)
    parts = list(es.extract_route_batch(batch))
    assert len(parts) > 1
    capped = pa.concat_tables(parts)
    assert capped.num_rows == batch.num_rows
    assert capped.equals(uncapped)


def test_fast_tokenizer_equals_stdlib_parser():
    """The guarded fast tokenizer must produce the identical DOM tree to
    html.parser whenever it engages (corpus sample + fuzz), and refuse
    inputs with features outside its regular subset."""
    import random

    from latyas_ray import html_extract as hx
    from latyas_ray.corpus import make_row

    def sig(node, out):
        out.append((node.tag, tuple(sorted(node.attrs.items())), node.text))
        for c in node.children:
            sig(c, out)
        out.append(("#end", (), ""))

    def stdlib_parse(text):
        b = hx._TreeBuilder()
        b.feed(text)
        b.close()
        return b.root

    engaged = 0
    for i in range(300):
        h = make_row(i)["html"]
        if h.startswith(b"%PDF-SYN"):
            continue
        text = h.decode("utf-8", errors="replace")
        fast = hx._fast_parse(text)
        if fast is None:
            continue
        engaged += 1
        a, b = [], []
        sig(fast, a)
        sig(stdlib_parse(text), b)
        assert a == b, f"tree mismatch on doc {i}"
    assert engaged > 100  # the fast path must actually cover the corpus

    rng = random.Random(11)
    frag = ["<div>", "</div>", "<p class='x y'>", "text ", "<br/>", "</p>",
            "<ul><li>a<li>b</ul>", "<a href=\"u\">l</a>", "<img src=x>",
            "<input type=checkbox checked>", "<div id=z >", "</b>", "<p >",
            "<b><i>x</b></i>", "<DIV CLASS='UP'>", "<hr>", "<li>item", "\n"]
    for _ in range(800):
        s = "".join(rng.choice(frag) for _ in range(rng.randint(1, 25)))
        fast = hx._fast_parse(s)
        if fast is None:
            continue
        a, b = [], []
        sig(fast, a)
        sig(stdlib_parse(s), b)
        assert a == b, s

    # guard refuses out-of-subset features (never mis-parses them)
    for bad in ["a &amp; b", "<!-- c -->", "<script>x</script>", "x < y",
                "<p", "<a href='a>b'>", "</p junk>"]:
        assert hx._fast_parse(bad) is None, bad


def test_poison_payload_dead_letter_channel():
    """A corrupt payload must not raise: the row is emitted empty with the
    error recorded (the pipeline's dead-letter channel), and neighbors in
    the same batch are unaffected."""
    import pyarrow as pa

    from latyas_ray.extract import extract_one
    from latyas_ray.schema import PAGES_SCHEMA
    from latyas_ray.stages.extract_stage import extract_batch

    bad = b"%PDF-SYN\nnot-json{{{"
    res = extract_one("http://x/bad", bad)
    assert res["error"].startswith("JSONDecodeError")
    assert res["extracted_text"] == "" and res["payload_kind"] == "pdf"

    import datetime

    ts = datetime.datetime(2026, 1, 1)
    batch = pa.Table.from_pylist(
        [
            {"url": "http://x/ok", "warc_ts": ts,
             "html": b"<html><body><p>fine</p></body></html>", "text": None, "lang": "en"},
            {"url": "http://x/bad", "warc_ts": ts, "html": bad, "text": None, "lang": "en"},
        ],
        schema=PAGES_SCHEMA,
    )
    out = extract_batch(batch)
    by_url = {u: e for u, e in zip(out.column("url").to_pylist(), out.column("error").to_pylist())}
    assert by_url["http://x/ok"] == ""
    assert by_url["http://x/bad"] != ""
    texts = dict(zip(out.column("url").to_pylist(), out.column("extracted_text").to_pylist()))
    assert texts["http://x/ok"] == "fine"
