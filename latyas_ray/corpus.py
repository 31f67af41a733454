"""Deterministic synthetic web-page corpus (FIXTURES.md realized).

Generates the exact ``input_hint`` table — ``url:string,
warc_ts:timestamp[us], html:binary, text:string, lang:string`` — at any row
count, with the fixture families of FIXTURES.md §2.  Everything is a pure
function of ``doc_id`` (``random.Random`` seeded from a fixed string — the
Mersenne generator is platform-stable; no wall clock, no ``hash()``), so
two generations are byte-identical.

The ``text`` column is the cheap pre-extracted channel (the analog of the
native-PDF textpage channel reconciled at ``pdf2txt.py:72-85``): ~80% of
rows carry an accept-class near variant of the true extraction, ~15% a
reject-class corruption, ~5% empty.

Output is a directory of N parquet shard files plus a ``_SUCCESS`` marker
recording the generation parameters — shard files are the partition /
lineage unit for the resumable pipeline, and rewriting is skipped when the
marker matches (scale story: at 10^12 rows this layout is "many input
files", which is what the partitioner assumes).
"""

from __future__ import annotations

import json
import os
import random
import shutil
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_one
from .pdf_extract import PDF_MAGIC

CORPUS_VERSION = "latyas-corpus/8"  # /2: pdf_real family (genuine PDF
# bytes); /3: HTML breadth — rowspan/colspan tables, <dl>, <pre>,
# entity-heavy boilerplate pages; /4: deterministic PII (contact line
# with email / ipv4 / phone on every third site) so the webtext
# pii_scrub op has real material in the text channel; /5: Gopher-rule
# material — en sentences weave in function words (stop-word rule),
# latin sentences occasionally end '...' (ellipsis rules), <pre>
# comments sometimes use '#' (symbol rule) — so gopher_quality's pass
# flag discriminates instead of failing every document; /6: C4-rule
# material — rare 'Lorem ipsum…' filler paragraphs, 'Please enable
# JavaScript…' no-script boilerplate leaking into main content, and
# brace-heavy JS lines in <pre> blocks, the three page-level artifacts
# the c4_quality op flags on real Common Crawl; /7: US-separator (0x1F)
# material — sites 13/14 plain pages carry 10-token spans whose tokens
# CONTAIN a literal 0x1F, engineered so the two sites' DIFFERENT token
# sequences join to the SAME string under a chr(31) separator ("q\x1fr
# s" vs "q r\x1fs") — the collision the length-prefixed span_key
# identity must not merge (ops/webtext.py); /8: cross-site footer
# blogroll — site k's html pages carry k%4 absolute links to sites
# (7k+13+29j)%97, a varied-degree affine host graph, so outlink_stats'
# external-link column and host_pagerank's centrality are informative
# (inside <footer>, which the extractor drops by tag, so the links
# never reach the text channel)
EPOCH_2024_US = 1704067200 * 1_000_000  # 2024-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SF_ROWS = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 100_000,
           # sf0.4 exists for the scaling protocol's large point (the
           # fixed-startup share shrinks as the corpus grows); no
           # /root/testdata/sf0.4 tables exist, so only corpus-backed
           # pipelines (extraction) run at this label
           "sf0.4": 400_000}

_CATEGORIES = ["news", "blog", "docs", "shop", "forum"]
_LANGS = ["en", "zh", "de", "fr", "es"]
_LANG_CUM = [(0.50, "en"), (0.70, "zh"), (0.80, "de"), (0.90, "fr"), (1.00, "es")]

_WORDS = {
    "en": ("market report growth system energy water policy model value trade "
           "health city region science data plan industry network result "
           "change power people world level study record service time").split(),
    "de": ("Markt Bericht Wachstum System Energie Wasser Politik Modell Wert "
           "Handel Stadt Region Daten Plan Netz Ergebnis Leistung Studie "
           "Dienst Zeit Welt Ebene Menschen Industrie").split(),
    "fr": ("marché rapport croissance système énergie eau politique modèle "
           "valeur commerce santé ville région science données plan réseau "
           "résultat changement service temps monde niveau étude").split(),
    "es": ("mercado informe crecimiento sistema energía agua política modelo "
           "valor comercio salud ciudad región ciencia datos plan red "
           "resultado cambio servicio tiempo mundo nivel estudio").split(),
}
_ZH_CHARS = "经济市场增长系统能源水资源政策模型价值贸易健康城市区域科学数据计划行业网络结果变化动力人民世界水平研究记录服务时间发展报告分析"

_FAMILY_CUM = [
    (0.30, "plain"),
    (0.40, "twocol"),
    (0.55, "boiler"),
    (0.65, "nesteddup"),
    (0.75, "tableslists"),
    (0.80, "equations"),
    (0.85, "malformed"),
    (0.88, "giant"),
    (0.93, "tiny"),
    (0.965, "pdf"),
    (1.00, "pdf_real"),
]


def _pick(cum, u):
    for threshold, value in cum:
        if u < threshold:
            return value
    return cum[-1][1]


def _rng(doc_id: int, salt: str = "") -> random.Random:
    return random.Random(f"{CORPUS_VERSION}:{salt}:{doc_id}")


# English function words woven into en sentences (corpus /5) — the very
# tuple the gopher_quality stop-word rule counts (one home in ops/common
# so an edit to the rule set cannot silently stop discriminating here).
from .ops.common import GOPHER_STOPWORDS as _EN_FUNCTION_WORDS  # noqa: E402


def _sentence(rng: random.Random, lang: str, n_words: int) -> str:
    if lang == "zh":
        return "".join(rng.choice(_ZH_CHARS) for _ in range(n_words * 2)) + "。"
    words = _WORDS.get(lang, _WORDS["en"])
    toks = []
    for _ in range(n_words):
        if lang == "en" and rng.random() < 0.35:
            toks.append(rng.choice(_EN_FUNCTION_WORDS))
        toks.append(rng.choice(words))
    s = " ".join(toks)
    tail = "..." if rng.random() < 0.08 else "."
    return s[0].upper() + s[1:] + tail


def _paragraph(rng: random.Random, lang: str, n_sentences: int) -> str:
    return " ".join(_sentence(rng, lang, rng.randint(5, 14)) for _ in range(n_sentences))


# ------------------------------------------------------- html scaffolding


def _nav(rng: random.Random, site: int) -> str:
    links = "".join(
        f'<a href="/{c}">{c.title()}</a> ' for c in _CATEGORIES[: rng.randint(3, 5)]
    )
    return f"<nav>{links}</nav>"


def _header(site: int) -> str:
    return f"<header>Site {site} — all the latest</header>"


def _blogroll(site: int) -> str:
    """corpus /8: site k's pages link to sites (7k+13+29j)%97 for
    j < k%4 — absolute cross-host links with varied out-degree (k≡0
    mod 4 hosts stay dangling) and, because 7 is invertible mod 97,
    varied in-degree too.  Self-targets are left in: they exercise the
    target≠src rule in the outlink/pagerank edge builders."""
    return "".join(
        f'<a href="https://site{(site * 7 + 13 + 29 * j) % 97}.example/">'
        f"partner {j}</a> "
        for j in range(site % 4)
    )


def _footer(site: int) -> str:
    return (
        f"<footer>© 2024 site{site}.example · Terms · Privacy "
        f"{_blogroll(site)}</footer>"
    )


def _contact(site: int) -> str:
    """Deterministic PII paragraph on every third site — real material
    for the pii_scrub webtext op (email, ipv4, phone; all RE2-matchable
    ASCII).  Content-level <p>, so it survives into the extracted text
    and the candidate ``text`` channel."""
    if site % 3:
        return ""
    return (
        f"<p>Contact: info@site{site}.example or +1-555-{site:04d} "
        f"(mirror 192.0.2.{site}).</p>"
    )


def _wrap(site: int, title: str, body: str) -> str:
    return (
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
        f"<title>{title}</title></head><body>{body}{_contact(site)}</body></html>"
    )


def _html_plain(rng, site, lang):
    title = _sentence(rng, lang, 4)
    paras = "".join(
        f"<p>{_paragraph(rng, lang, rng.randint(2, 5))}</p>"
        for _ in range(rng.randint(3, 8))
    )
    if rng.random() < 0.06:  # C4 material: classic unfilled-template filler
        paras = (
            "<p>Lorem ipsum dolor sit amet, consectetur adipiscing elit, "
            "sed do eiusmod tempor incididunt.</p>" + paras
        )
    if rng.random() < 0.07:  # C4 material: no-script boilerplate in content
        paras += (
            "<p>Please enable JavaScript to view the comments powered by "
            f"site{site}.example.</p>"
        )
    if rng.random() < 0.25:  # <pre> block: interior whitespace is content
        lines = []
        for i in range(rng.randint(2, 6)):
            indent = "    " * rng.randint(0, 2)
            if rng.random() < 0.30:  # brace-heavy JS (C4 curly-brace rule)
                lines.append(
                    indent + f"function f{i}() {{ return {rng.randint(0, 99)}; }}"
                )
            else:
                lines.append(
                    indent
                    + f"let v{i} = {rng.randint(0, 99)};  "
                    + rng.choice(("// note", "# note"))
                )
        paras += "<pre>\n" + "\n".join(lines) + "\n</pre>"
    body = (
        _header(site) + _nav(rng, site)
        + f"<main><article><h1>{title}</h1>{paras}</article></main>"
        + _footer(site)
    )
    return _wrap(site, title, body)


def _html_twocol(rng, site, lang):
    title = _sentence(rng, lang, 4)
    left = "".join(
        f"<p>{_paragraph(rng, lang, rng.randint(2, 4))}</p>"
        for _ in range(rng.randint(2, 5))
    )
    right = "".join(
        f"<p>{_paragraph(rng, lang, rng.randint(2, 4))}</p>"
        for _ in range(rng.randint(2, 5))
    )
    cols = [f'<div class="col left">{left}</div>', f'<div class="col right">{right}</div>']
    if rng.random() < 0.5:  # right column first in DOM — reflow must fix it
        cols.reverse()
    body = (
        _header(site) + _nav(rng, site)
        + f"<main><h1>{title}</h1><div class=\"columns\">{''.join(cols)}</div></main>"
        + _footer(site)
    )
    return _wrap(site, title, body)


def _html_boiler(rng, site, lang):
    title = _sentence(rng, lang, 3)
    thin = "".join(
        f"<p>{_paragraph(rng, lang, 2)}</p>" for _ in range(rng.randint(1, 2))
    )
    cookie = '<div class="cookie-banner">We use cookies. <a href="/accept">Accept</a> <a href="/reject">Reject</a></div>'
    sidebar = (
        '<div class="sidebar">'
        + "".join(f'<a href="/t/{i}">topic {i}</a> ' for i in range(rng.randint(4, 9)))
        + "</div>"
    )
    related = (
        '<div class="related">'
        + "".join(f'<a href="/r/{i}">related story {i}</a> ' for i in range(rng.randint(3, 7)))
        + "</div>"
    )
    social = '<div class="social"><a href="/share/x">Share on X</a> <a href="/share/f">Share on F</a></div>'
    if rng.random() < 0.35:  # entity-heavy paragraph → stdlib parser path
        thin += (
            "<p>Q&amp;A: &lt;tags&gt; &amp; &quot;quotes&quot; "
            f"&#8212; {_paragraph(rng, lang, 1)} &eacute;&nbsp;fin</p>"
        )
    body = (
        cookie + _header(site) + _nav(rng, site)
        + f"<main><h1>{title}</h1>{thin}</main>"
        + sidebar + related + social + _footer(site)
    )
    return _wrap(site, title, body)


def _html_nesteddup(rng, site, lang):
    title = _sentence(rng, lang, 4)
    paras = [_paragraph(rng, lang, rng.randint(2, 4)) for _ in range(rng.randint(2, 4))]
    inner = "".join(f"<p>{p}</p>" for p in paras)
    body = (
        _header(site) + _nav(rng, site)
        + f"<main><h1>{title}</h1>"
        + f'<div class="wrapper"><div class="content">{inner}</div></div>'
        + f'<div class="mirror"><div class="content">{inner}</div></div>'
        + "</main>" + _footer(site)
    )
    return _wrap(site, title, body)


def _html_tableslists(rng, site, lang):
    title = _sentence(rng, lang, 4)
    cap_prefix = "表" if lang == "zh" else "Table"
    fig_prefix = "图" if lang == "zh" else "Figure"
    if rng.random() < 0.5:  # span-free grid
        rows = "".join(
            "<tr>" + "".join(f"<td>{_sentence(rng, lang, 2)}</td>" for _ in range(3)) + "</tr>"
            for _ in range(rng.randint(2, 5))
        )
        head = "<tr><th>A</th><th>B</th><th>C</th></tr>"
    else:  # rowspan/colspan grid — span expansion must repeat cell text
        rows = f'<tr><td rowspan="2">{_sentence(rng, lang, 2)}</td>' + "".join(
            f"<td>{_sentence(rng, lang, 2)}</td>" for _ in range(2)
        ) + "</tr><tr>" + "".join(
            f"<td>{_sentence(rng, lang, 2)}</td>" for _ in range(2)
        ) + "</tr>" + "".join(
            "<tr>" + "".join(f"<td>{_sentence(rng, lang, 2)}</td>" for _ in range(3)) + "</tr>"
            for _ in range(rng.randint(0, 2))
        )
        head = '<tr><th colspan="2">AB</th><th>C</th></tr>'
    table = (
        f"<table><caption>{cap_prefix} 1: {_sentence(rng, lang, 3)}</caption>"
        f"{head}{rows}</table>"
    )
    dl = ""
    if rng.random() < 0.4:  # <dl> definition list
        dl = "<dl>" + "".join(
            f"<dt>{_sentence(rng, lang, 2)}</dt><dd>{_sentence(rng, lang, 4)}</dd>"
            for _ in range(rng.randint(2, 4))
        ) + "</dl>"
    ul = "<ul>" + "".join(
        f"<li>{_sentence(rng, lang, rng.randint(3, 7))}</li>" for _ in range(rng.randint(3, 6))
    ) + "</ul>"
    ol = "<ol>" + "".join(
        f"<li>{_sentence(rng, lang, rng.randint(3, 7))}</li>" for _ in range(rng.randint(2, 5))
    ) + "</ol>"
    figure = (
        f'<figure><img src="/img/{rng.randint(1, 99)}.png">'
        f"<figcaption>{fig_prefix} 1: {_sentence(rng, lang, 3)}</figcaption></figure>"
    )
    body = (
        _header(site) + _nav(rng, site)
        + f"<main><h1>{title}</h1><p>{_paragraph(rng, lang, 2)}</p>"
        + table + ul + figure + ol + dl
        + f"<p>{_paragraph(rng, lang, 2)}</p></main>" + _footer(site)
    )
    return _wrap(site, title, body)


def _html_equations(rng, site, lang):
    title = _sentence(rng, lang, 4)
    eqs = [
        "E = mc^2",
        "\\int_0^1 x^2 dx = 1/3",
        "a^2 + b^2 = c^2",
        "\\sum_{i=1}^n i = n(n+1)/2",
    ]
    parts = []
    for _ in range(rng.randint(2, 4)):
        parts.append(f"<p>{_paragraph(rng, lang, 2)} where $x_{rng.randint(1,9)}$ holds.</p>")
        parts.append(f"<p>$${rng.choice(eqs)}$$</p>")
    body = (
        _header(site) + _nav(rng, site)
        + f"<main><h1>{title}</h1>{''.join(parts)}</main>" + _footer(site)
    )
    return _wrap(site, title, body)


def _html_malformed(rng, site, lang):
    title = _sentence(rng, lang, 3)
    paras = "".join(
        f"<p>{_paragraph(rng, lang, 2)}"  # unclosed <p> — auto-close rule
        for _ in range(rng.randint(2, 5))
    )
    body = (
        _header(site) + _nav(rng, site)
        + f"<main><h1>{title}</h1>{paras}</div>"  # stray </div>
        + f"<p>bad entity &nosuch; here</p><div>{_paragraph(rng, lang, 1)}"
        + "</main>" + _footer(site)  # main closed while div open
    )
    return _wrap(site, title, body)


def _html_giant(rng, site, lang):
    title = _sentence(rng, lang, 4)
    target = rng.randint(256_000, 1_000_000)
    sections = []
    size = 0
    i = 0
    while size < target:
        i += 1
        sec = (
            f"<section><h2>{_sentence(rng, lang, 3)}</h2>"
            + "".join(f"<p>{_paragraph(rng, lang, 3)}</p>" for _ in range(4))
            + "</section>"
        )
        sections.append(sec)
        size += len(sec)
    body = (
        _header(site) + _nav(rng, site)
        + f"<main><h1>{title}</h1>{''.join(sections)}</main>" + _footer(site)
    )
    return _wrap(site, title, body)


def _html_tiny(rng, site, lang):
    variant = rng.random()
    if variant < 0.34:
        return _wrap(site, "", "")
    if variant < 0.67:
        return _wrap(site, " ", "<main>   \n\t  </main>")
    return (
        "<!DOCTYPE html><html><head>"
        '<meta http-equiv="refresh" content="0; url=https://elsewhere.example/">'
        "</head><body></body></html>"
    )


# --------------------------------------------------------- pdf scaffolding

_PDF_LABELS_SINGLE = ["Title", "Text", "Text", "Text", "Figure", "FigureCaption",
                      "Table", "TableCaption", "Equation", "EmbedEq", "Header", "Footer"]


def _pdf_payload(rng, lang) -> bytes:
    """Pseudo-PDF page description: typed blocks with confidences, emitted
    out of order, with overlapping duplicates — everything the detect →
    threshold → merge → reflow chain must clean up."""
    pages = []
    for _ in range(rng.randint(1, 4)):
        w, h = 1000.0, 1400.0
        blocks = []
        y = 40.0
        blocks.append({"label": "Header", "conf": round(rng.uniform(0.5, 0.99), 4),
                       "bbox": [100.0, 10.0, 900.0, 34.0], "text": "CONFIDENTIAL DRAFT"})
        n = rng.randint(4, 10)
        for _ in range(n):
            label = rng.choice(_PDF_LABELS_SINGLE)
            bh = rng.choice([60.0, 90.0, 120.0])
            bbox = [80.0, y, 920.0, y + bh]
            conf = round(rng.uniform(0.15, 0.99), 4)  # some fall below 0.3
            if label in ("Figure",):
                text = ""
            elif label == "Equation":
                text = rng.choice(["E=mc^2", "\\frac{a}{b}=c", "x^n+y^n=z^n"])
            elif label == "EmbedEq":
                text = "$inline$"
            elif label in ("FigureCaption", "TableCaption"):
                prefix = ("图" if label == "FigureCaption" else "表") if lang == "zh" else label
                text = f"{prefix} {rng.randint(1, 9)}: {_sentence(rng, lang, 3)}"
            else:
                text = _paragraph(rng, lang, rng.randint(1, 3))
            blocks.append({"label": label, "conf": conf,
                           "bbox": bbox, "text": text})
            # overlapping duplicate detection of the same box (same kind →
            # merge path; layout.py:86-132)
            if rng.random() < 0.25:
                blocks.append({
                    "label": label,
                    "conf": round(rng.uniform(0.35, 0.99), 4),
                    "bbox": [bbox[0] + 8.0, bbox[1] + 6.0, bbox[2] - 8.0, bbox[3] - 6.0],
                    "text": text + " (dup)",
                })
            y += bh + rng.choice([18.0, 26.0, 34.0])
        blocks.append({"label": "Footer", "conf": round(rng.uniform(0.5, 0.99), 4),
                       "bbox": [100.0, 1360.0, 900.0, 1390.0], "text": f"page {rng.randint(1, 40)}"})
        rng.shuffle(blocks)  # out-of-order emission; reflow must restore order
        pages.append({"w": w, "h": h, "blocks": blocks})
    return PDF_MAGIC + json.dumps({"pages": pages}, sort_keys=True).encode("utf-8")


def _pdf_real_payload(rng, lang) -> bytes:
    """Genuine minimal PDF bytes (S1/S2 made real): text runs laid out
    with title / paragraph / caption / margin bands, serialized through
    :func:`latyas_ray.pdf_real.write_pdf` (xref, page tree, Tf/Tm/Tj) and
    re-parsed by the pure-Python parser inside the same extraction stage
    that pdfium feeds in the reference (``tools/pdf2text.py:24-27``)."""
    from .pdf_real import write_pdf

    pages = []
    for _ in range(rng.randint(1, 3)):
        w, h = 612.0, 792.0
        runs = []
        runs.append((72.0, 28.0, 8.0, f"journal · {_sentence(rng, lang, 2)}"))
        y = 80.0
        runs.append((72.0, y, 20.0, _sentence(rng, lang, 4)))
        y += 26.0
        while y < 620.0:
            y += 14.0  # inter-paragraph gap → new block in the grouper
            for _ in range(rng.randint(2, 6)):
                if y >= 700.0:
                    break
                runs.append((72.0, y, 11.0,
                             _sentence(rng, lang, rng.randint(6, 12))))
                y += 11.0 * 1.35  # in-block line leading (≤ LINE_GAP)
            if rng.random() < 0.3 and y < 680.0:
                y += 16.0
                prefix = "图" if lang == "zh" else "Figure"
                runs.append((72.0, y, 11.0,
                             f"{prefix} {rng.randint(1, 9)}: "
                             f"{_sentence(rng, lang, 3)}"))
                y += 11.0 * 1.35
            if rng.random() < 0.25:
                break
        runs.append((72.0, h - 30.0, 8.0, f"page {rng.randint(1, 40)}"))
        pages.append({"w": w, "h": h, "runs": runs})
    return write_pdf(pages)


_FAMILY_FN = {
    "plain": _html_plain,
    "twocol": _html_twocol,
    "boiler": _html_boiler,
    "nesteddup": _html_nesteddup,
    "tableslists": _html_tableslists,
    "equations": _html_equations,
    "malformed": _html_malformed,
    "giant": _html_giant,
    "tiny": _html_tiny,
}


# ------------------------------------------------------- candidate channel


def _candidate_text(rng: random.Random, extracted: str) -> str:
    u = rng.random()
    if u < 0.80:  # accept-class near variant (reconciliation must choose it)
        if len(extracted) <= 4000:
            chars = list(extracted)
            for i in range(40, len(chars), 41):
                chars[i] = "~"
            return "".join(chars)
        lines = extracted.split("\n")
        if len(lines) >= 50:
            # stride scales with textnorm's line-chunk factor so the edited
            # fraction of line-DP tokens stays ~1/25 even when the distance
            # check chunk-merges long documents (textnorm.MAX_LINES)
            from .textnorm import MAX_LINES

            k = max(1, -(-len(lines) // MAX_LINES))
            for i in range(0, len(lines), 25 * k):
                lines[i] = lines[i] + " ~"
            return "\n".join(lines)
        return extracted
    if u < 0.95:  # reject-class corruption (edit distance ≈ 1)
        return "".join(
            rng.choice("qwertyuiopasdfghjklzxcvbnm ") for _ in range(len(extracted))
        )
    return ""  # empty channel


# ----------------------------------------------------------- row assembly


def make_row(doc_id: int) -> dict:
    rng = _rng(doc_id)
    site = doc_id % 97
    category = _CATEGORIES[doc_id % 5]
    lang = _pick(_LANG_CUM, _rng(doc_id, "lang").random())
    family = _pick(_FAMILY_CUM, _rng(doc_id, "family").random())

    if family == "pdf":
        html = _pdf_payload(rng, lang)
    elif family == "pdf_real":
        html = _pdf_real_payload(rng, lang)
    else:
        html = _FAMILY_FN[family](rng, site, lang).encode("utf-8")

    url = f"https://site{site}.example/{category}/{doc_id}"
    extracted = extract_one(url, html, None, lang)["extracted_text"]
    cand = _candidate_text(_rng(doc_id, "cand"), extracted)
    # corpus /7: 0x1F-token spans in the TEXT channel (extraction's
    # collapse_ws treats 0x1F as Python whitespace, so html-side material
    # can never reach the text column — inject where the webtext ops
    # tokenize).  Sites 13/14 carry DIFFERENT 10-token sequences whose
    # chr(31)-joined strings are IDENTICAL; each repeats across its
    # site's documents, so the dup-span census gets genuine 0x1F-token
    # duplicate rows and a separator-join identity would wrongly merge
    # the two sites' spans (ops/webtext.py span_key).
    if site == 13:
        cand += "\nrec\x1fsep unit farm tag mode grid plan vane kite jolt"
    elif site == 14:
        cand += "\nrec sep\x1funit farm tag mode grid plan vane kite jolt"
    return {
        "url": url,
        "warc_ts": EPOCH_2024_US + doc_id * 1337 * 1_000_000,
        "html": html,
        "text": cand,
        "lang": lang,
    }


def make_table(doc_ids: List[int]) -> pa.Table:
    cols = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for d in doc_ids:
        row = make_row(d)
        for k in cols:
            cols[k].append(row[k])
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def _shard_ranges(n_rows: int, n_shards: int) -> List[range]:
    per = -(-n_rows // n_shards)
    return [range(i, min(i + per, n_rows)) for i in range(0, n_rows, per)]


# Rows per parquet row group.  Row groups are Ray Data's read-split unit:
# one-row-group shards cap read parallelism at the file count and make the
# whole pipeline ramp behind a handful of multi-second whole-file reads
# (real CC dumps are many-row-group files for the same reason).
ROW_GROUP_ROWS = 512


def _write_shard(out_dir: str, shard_idx: int, doc_ids: List[int]) -> int:
    table = make_table(doc_ids)
    tmp = os.path.join(out_dir, f".tmp-pages-{shard_idx:05d}.parquet")
    dst = os.path.join(out_dir, f"pages-{shard_idx:05d}.parquet")
    pq.write_table(table, tmp, compression="zstd", row_group_size=ROW_GROUP_ROWS)
    os.replace(tmp, dst)
    return table.num_rows


def generate_corpus(
    out_dir: str,
    n_rows: int,
    n_shards: Optional[int] = None,
    use_ray: str = "auto",
) -> str:
    """Generate (or reuse a cached) corpus directory.  Idempotent: a
    ``_SUCCESS`` marker matching the parameters skips regeneration."""
    if n_shards is None:
        n_shards = max(8, -(-n_rows // 8192))
    params = {
        "version": CORPUS_VERSION,
        "n_rows": n_rows,
        "n_shards": n_shards,
        "row_group_rows": ROW_GROUP_ROWS,
    }
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == params:
                    return out_dir
        except Exception:
            pass
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    ranges = _shard_ranges(n_rows, n_shards)
    ray_ok = False
    if use_ray in ("auto", "ray"):
        try:
            import ray

            ray_ok = ray.is_initialized()
        except ImportError:
            ray_ok = False
    if ray_ok:
        import ray

        shard_task = ray.remote(num_cpus=1)(_write_shard)
        ray.get(
            [shard_task.remote(out_dir, i, list(r)) for i, r in enumerate(ranges)]
        )
    else:
        for i, r in enumerate(ranges):
            _write_shard(out_dir, i, list(r))

    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as f:
        json.dump(params, f)
    os.replace(tmp_marker, marker)
    return out_dir


def default_corpus_dir(sf_label: str, base: str = "/tmp/latyas_ray/corpus") -> str:
    return os.path.join(base, sf_label)


def ensure_corpus_for_sf(sf_label: str, use_ray: str = "auto") -> str:
    """Generate-and-cache the corpus for a scale-factor label
    (``sf0.001`` / ``sf0.01`` / ``sf0.1``)."""
    n = SF_ROWS[sf_label]
    return generate_corpus(default_corpus_dir(sf_label), n, use_ray=use_ray)


def sf_label_from_dir(sf_dir: str) -> str:
    """Map a driver sf dir (``/root/testdata/sf0.01``) to a corpus label."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in SF_ROWS else "sf0.01"
