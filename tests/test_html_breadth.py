"""HTML breadth coverage: <pre> whitespace preservation, rowspan/colspan
grid expansion (TATR cell-assembly semantics), <dl>, noscript/iframe
skipping, and entity-heavy pages through the stdlib fallback parser."""

from latyas_ray.html_extract import extract_html


def _text(html: str) -> str:
    return extract_html(html.encode("utf-8"))[0]


def test_pre_preserves_interior_whitespace():
    html = (
        "<html><body><main><h1>T</h1>"
        "<pre>\nline  one\n    indented\t(tab)\n\nline after blank\n</pre>"
        "</main></body></html>"
    )
    out = _text(html)
    assert "line  one\n    indented\t(tab)\n\nline after blank" in out
    # the single leading newline and trailing newlines are trimmed
    assert "\n\nline  one" not in out.split("T\n\n", 1)[-1][:12]


def test_rowspan_colspan_expand_like_tatr_cells():
    html = (
        "<html><body><main><table>"
        '<tr><th colspan="2">AB</th><th>C</th></tr>'
        '<tr><td rowspan="2">left</td><td>m1</td><td>r1</td></tr>'
        "<tr><td>m2</td><td>r2</td></tr>"
        "</table></main></body></html>"
    )
    out = _text(html)
    # header colspan repeats AB into both covered slots; rowspan repeats
    # left into the second body row (pipeline.py:254-258 semantics)
    assert "AB\tAB\tC" in out
    assert "left\tm1\tr1" in out
    assert "left\tm2\tr2" in out


def test_span_free_table_unchanged_shape():
    html = (
        "<html><body><main><table>"
        "<tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr>"
        "</table></main></body></html>"
    )
    assert "A\tB\n1\t2" in _text(html)


def test_dl_definition_list():
    html = (
        "<html><body><main><dl>"
        "<dt>Term one</dt><dd>its definition</dd>"
        "<dt>Term two</dt><dd>another def</dd>"
        "</dl></main></body></html>"
    )
    out = _text(html)
    assert "- Term one\n  its definition\n- Term two\n  another def" in out


def test_noscript_and_iframe_skipped():
    html = (
        "<html><body><main><p>real content here</p>"
        "<noscript>enable javascript banner</noscript>"
        "<iframe>embedded junk</iframe></main></body></html>"
    )
    out = _text(html)
    assert "real content" in out
    assert "javascript" not in out and "embedded junk" not in out


def test_entities_decode_via_fallback_parser():
    html = (
        "<html><body><main><p>Q&amp;A: &lt;tags&gt; &#8212; caf&eacute;"
        "&nbsp;fin</p></main></body></html>"
    )
    out = _text(html)
    assert "Q&A: <tags> — café" in out


def test_pre_and_dl_autoclose_open_p():
    html = (
        "<html><body><main><p>para before"
        "<pre>x = 1</pre><p>para two<dl><dt>t</dt><dd>d</dd></dl>"
        "</main></body></html>"
    )
    out = _text(html)
    assert "para before" in out and "x = 1" in out
    assert "para two" in out and "- t" in out


def test_span_bomb_is_capped():
    """A corrupt colspan/rowspan must not inflate the grid by the raw
    attribute value (browser-grade caps; pre-cap this OOMed the worker)."""
    import time

    html = (
        "<html><body><main><table>"
        '<tr><td colspan="2147483647" rowspan="2147483647">a</td></tr>'
        "</table></main></body></html>"
    )
    t0 = time.time()
    out = _text(html)
    assert time.time() - t0 < 5.0
    # one row, capped expansion, trailing empties trimmed away entirely
    assert out.count("a") <= 1000


def test_overlapping_span_keeps_earlier_cell():
    # Malformed table: row 0's cell rowspans into row 1, and row 1's
    # colspan cell sweeps across the slot the rowspan already claimed.
    # Browser/TATR occupancy: the earlier-placed (rowspan) cell wins —
    # fill() must not clobber it (ADVICE r2).
    html = (
        "<html><body><main><table>"
        '<tr><td>a</td><td rowspan="2">tall</td></tr>'
        '<tr><td colspan="2">wide</td></tr>'
        "</table></main></body></html>"
    )
    out = _text(html)
    assert "a\ttall" in out
    # colspan lands in col 0, its sweep over col 1 does not erase "tall"
    assert "wide\ttall" in out
