"""Webtext op kernels: url parsing pinned to split_part semantics, PII
regex composition, and line-accounting edge cases.  End-to-end
correctness (engine vs independent DuckDB SQL over the same shards) is
covered by test_oracle_parity.py."""

import hashlib
import re

import pandas as pd

from latyas_ray.ops.webtext import (
    EMAIL_PAT,
    EMAIL_RE,
    IPV4_PAT,
    IPV4_RE,
    PHONE_PAT,
    PHONE_RE,
    _host_section,
)


def test_host_section_matches_split_part():
    import duckdb

    urls = [
        "https://site3.example/news/42",
        "http://a.b/x",
        "no-scheme/path",
        "https://host.only",
        "https://h/",
        "",
        "https://a/b://c",  # second '://' in the path: split_part splits
        "x://y://z/w",      # on EVERY occurrence, not just the first
    ]
    host, section = _host_section(pd.Series(urls))
    con = duckdb.connect()
    for u, h, s in zip(urls, host, section):
        eh, es = con.execute(
            "SELECT split_part(split_part(?, '://', 2), '/', 1), "
            "split_part(split_part(?, '://', 2), '/', 2)",
            [u, u],
        ).fetchone()
        assert h == eh, f"{u!r}: host {h!r} vs {eh!r}"
        assert s == es, f"{u!r}: section {s!r} vs {es!r}"


def test_pii_patterns():
    t = "mail a.b+c@x-y.org, ip 10.0.0.1, bad 10.0.0.1234, tel +1-555-0042"
    assert len(EMAIL_PAT.findall(t)) == 1
    assert len(IPV4_PAT.findall(t)) == 1  # the 4-digit tail breaks \b
    assert len(PHONE_PAT.findall(t)) == 1
    s = EMAIL_PAT.sub("<EMAIL>", t)
    s = IPV4_PAT.sub("<IP>", s)
    s = PHONE_PAT.sub("<PHONE>", s)
    assert s == "mail <EMAIL>, ip <IP>, bad 10.0.0.1234, tel <PHONE>"


def test_pii_ascii_boundary_matches_re2():
    """RE2's \\b is ASCII-only; the compiled patterns must match it even
    when a Unicode word char abuts the number ('é192.0.2.1')."""
    import duckdb

    t = "é192.0.2.1 and ١@١.ab x9@y.zw"  # arabic-indic digits
    got = IPV4_PAT.findall(t), EMAIL_PAT.findall(t)
    con = duckdb.connect()
    want = tuple(
        con.execute(
            "SELECT regexp_extract_all(?, ?)", [t, pat]
        ).fetchone()[0]
        for pat in (IPV4_RE, EMAIL_RE)
    )
    assert got[0] == want[0], f"ipv4 {got[0]} vs {want[0]}"
    assert got[1] == want[1], f"email {got[1]} vs {want[1]}"


def test_line_md5_matches_duckdb():
    import duckdb

    line = "© 2024 site0.example · Terms · Privacy"
    got = hashlib.md5(line.encode("utf-8")).hexdigest()
    want = duckdb.connect().execute("SELECT md5(?)", [line]).fetchone()[0]
    assert got == want


def test_corpus_carries_pii_material():
    """The /4 corpus injects a deterministic contact line on every third
    site — pii_scrub must have real matches to scrub (guards against the
    op silently verifying on all-zero counts)."""
    from latyas_ray.corpus import make_row

    hits = 0
    for doc_id in range(0, 120):
        row = make_row(doc_id)
        if row["text"] and re.search(EMAIL_RE, row["text"]):
            hits += 1
    assert hits > 5


def test_gopher_quality_kernel_semantics(ray_session):
    """Edge semantics of the Gopher counters on a crafted corpus batch:
    non-overlapping '...' counting, bullet/ellipsis line accounting over
    non-empty lines only, exact-match stop words, and the integer-only
    pass flag."""
    import ray.data as rd

    docs = {
        # 60 words incl stopwords, clean → passes
        "u_pass": ("the cat and the dog sat with the bird that came "
                   "to rest of all small birds here now " * 3).strip(),
        # ellipsis edge: '....' is ONE non-overlapping '...' match
        "u_ellipsis": "wait....\nmore...\n\nplain line",
        # bullets and a '#' symbol
        "u_bullets": "- one\n* two\n• three\nnot a bullet\n# heading",
        "u_empty": "",
        # words but zero stopwords → fails the stop-word rule
        "u_nostop": "alpha beta gamma " * 30,
    }
    df_in = {"url": list(docs), "text": list(docs.values())}

    import latyas_ray.ops.webtext as wt

    # drive the PUBLIC op end-to-end on a temp corpus-shaped parquet
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.table({"url": df_in["url"], "text": df_in["text"]}),
                       os.path.join(td, "pages-00000.parquet"))
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        # drive the same kernel the op uses by temporarily pointing
        # _read_corpus at the temp table
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = wt.gopher_quality(td).to_pandas()
        finally:
            wt._read_corpus = orig

    out = out.set_index("url")
    assert out.loc["u_pass", "passes_gopher"] == 1
    assert out.loc["u_pass", "n_stop_words"] >= 2

    e = out.loc["u_ellipsis"]
    assert e["n_ellipsis"] == 2          # '....' → one match, 'more...' → one
    assert e["n_lines"] == 3             # empty line excluded
    assert e["n_ellipsis_lines"] == 2    # both '...'-ended lines count
    assert e["passes_gopher"] == 0       # too few words

    b = out.loc["u_bullets"]
    assert b["n_bullet_lines"] == 3 and b["n_lines"] == 5
    assert b["n_hash"] == 1

    z = out.loc["u_empty"]
    assert z["n_words"] == 0 and z["n_lines"] == 0 and z["passes_gopher"] == 0

    ns = out.loc["u_nostop"]
    assert ns["n_words"] == 90 and ns["n_stop_words"] == 0
    assert ns["passes_gopher"] == 0


def test_dup_span_census_kernel_semantics(ray_session):
    """dup_span_census on a crafted corpus: spans shared across docs are
    found with exact (n_urls, n_total); windows never cross document
    boundaries; same-doc-only repeats are excluded by min_urls."""
    import hashlib
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    span = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"  # exactly W=10 tokens
    docs = {
        # the span appears once in a and twice in b -> n_urls=2, n_total=3
        "u_a": f"xx {span} yy",
        "u_b": f"{span} zz {span}",
        # same 10 tokens split across a would-be boundary: doc too short
        "u_short": "w0 w1 w2 w3 w4",
        # repeats only within ONE doc -> excluded by min_urls=2
        "u_selfrep": "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9 pad s0 s1 s2 s3 s4 s5 s6 s7 s8 s9",
        "u_empty": "",
    }
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": list(docs), "text": list(docs.values())}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = wt.dup_span_census(td).to_pandas()
        finally:
            wt._read_corpus = orig

    expect_md5 = hashlib.md5(
        wt.span_key(span.split()).encode()
    ).hexdigest()
    assert list(out["span_md5"]) == [expect_md5]
    assert out.loc[0, "n_urls"] == 2 and out.loc[0, "n_total"] == 3


def test_span_key_injective_with_separator_tokens():
    """The span/n-gram identity must stay injective when a token itself
    contains the old chr(31) separator (corpus /7 ships exactly this
    material at sites 13/14): the engineered pair joins to the SAME
    string under a chr(31) separator but to distinct length-prefixed
    keys, and the SQL realization (length(tok) || ':' || tok, DuckDB
    length = code points = Python len) matches byte-for-byte, including
    on multi-byte tokens."""
    import duckdb

    from latyas_ray.ops.webtext import span_key

    a = ["rec\x1fsep", "unit"]
    b = ["rec", "sep\x1funit"]
    assert "\x1f".join(a) == "\x1f".join(b)  # the collision
    assert span_key(a) != span_key(b)  # the fix

    con = duckdb.connect()
    for toks in (a, b, ["économie", "经济", "x"], ["", "y"], ["12:ab", "c"]):
        expr = " || ".join(
            f"length(${i + 1}) || ':' || ${i + 1}" for i in range(len(toks))
        )
        got = con.execute(f"SELECT {expr}", toks).fetchone()[0]
        assert got == span_key(toks), toks


def test_corpus_carries_separator_material():
    """Corpus /7: the sf0.001 corpus must CONTAIN 0x1F tokens (sites
    13/14 plain pages) so the oracle rows exercise the injective key on
    real inputs rather than merely tolerating its absence."""
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from latyas_ray.corpus import ensure_corpus_for_sf

    corpus = ensure_corpus_for_sf("sf0.001", use_ray="no")
    hits = 0
    for path in sorted(glob.glob(os.path.join(corpus, "pages-*.parquet"))):
        t = pq.read_table(path, columns=["text"])
        hits += pc.sum(
            pc.cast(
                pc.match_substring(pc.fill_null(t.column("text"), ""), "\x1f"),
                "int64",
            )
        ).as_py() or 0
    assert hits > 0, "no 0x1F material in the generated corpus"


def test_dup_span_census_all_docs_shorter_than_window(ray_session):
    """Regression: a batch whose docs all have 1..w-1 tokens used to
    crash pass1 (new_pair[0] on a zero-length window array); it must
    return an empty census instead."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    docs = {"u1": "one two three", "u2": "x y z", "u3": ""}
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": list(docs), "text": list(docs.values())}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = wt.dup_span_census(td).to_pandas()
        finally:
            wt._read_corpus = orig
    assert len(out) == 0


def test_gopher_repetition_adversarial_vs_duckdb(ray_session):
    """Randomized engine-vs-DuckDB differential for the n-gram kernel on
    ADVERSARIAL text the clean corpus never contains: divergent Unicode
    whitespace (NBSP, U+3000, VT — where Python str.split over-splits
    vs RE2 \\S+), runs of '...', '#', empty docs, and 1-token docs.
    Pins that ascii_token_lists + the integer n-gram ids agree with the
    SQL lead()-window recompute beyond the generated corpus."""
    import os
    import random
    import tempfile

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    rng = random.Random("adversarial-ngram/1")
    vocab = ["a", "bb", "ccc", "the", "of", "#", "...", "x....y", "zz"]
    ws = [" ", "\t", "\n", "\xa0", "　", "\x0b", "  ", " \n "]
    docs = {}
    for i in range(40):
        k = rng.randint(0, 30)
        parts = []
        for _ in range(k):
            parts.append(rng.choice(vocab))
            parts.append(rng.choice(ws))
        docs[f"u{i:02d}"] = "".join(parts)
    docs["u_empty"] = ""
    docs["u_one"] = "solo"

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "pages-00000.parquet")
        pq.write_table(
            pa.table({"url": list(docs), "text": list(docs.values())}), path
        )
        base = rd.read_parquet(path)
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            eng = wt.gopher_repetition(td).to_pandas()
        finally:
            wt._read_corpus = orig

        # THE production oracle builder, retargeted at the temp shard —
        # an inline copy of the SQL would silently drift if the pinned
        # construction ever changes
        import __ray_entry__ as entry

        sql = entry._gopher_repetition_sql().replace(
            wt.corpus_glob(entry._GOLDEN_SF), path
        ) + " ORDER BY url"
        assert path in sql  # the retarget actually happened
        ora = duckdb.connect().execute(sql).df()

    eng = eng.sort_values("url").reset_index(drop=True)[list(ora.columns)]
    pd_eq = eng.astype("object").equals(ora.astype("object"))
    assert pd_eq, (
        "engine vs DuckDB divergence:\n"
        f"{eng.compare(ora) if eng.shape == ora.shape else (eng, ora)}"
    )


def test_dup_span_candidates_sharded_not_broadcast(ray_session):
    """The dup-span candidate set must reach map tasks as per-part
    slices with the driver never holding the full array (the r3 form
    `ray.put` the whole sorted candidate array — O(duplicated content)
    on a crawl corpus).  Checks: every slice holds only hashes ≡ its
    part (mod n_parts), slices are sorted, their union equals the exact
    candidate set recomputed directly, and no single slice carries the
    whole set."""
    import os
    import tempfile
    from collections import Counter

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    n_parts, w = 64, 10
    rows = []
    for i in range(40):  # 40 cross-doc spans -> 40 candidate hashes
        span = " ".join(f"s{i}w{j}" for j in range(w))
        rows.append((f"u{i}a", span))
        rows.append((f"u{i}b", f"pad{i} {span}"))
    df = pd.DataFrame(rows, columns=["url", "text"])

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": df["url"], "text": df["text"]}),
            os.path.join(td, "pages-00000.parquet"),
        )
        ds = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        refs = wt._dup_span_candidates(ds, w, 2, n_parts)

        assert len(refs) == n_parts
        slices = []
        for p, ref in enumerate(refs):
            if ref is None:
                continue
            sl = ray.get(ref)
            assert (sl % np.uint64(n_parts) == np.uint64(p)).all()
            if len(sl) > 1:
                assert (np.diff(sl.view(np.uint64)) > 0).all()
            slices.append(np.asarray(sl))

    got = np.sort(np.concatenate(slices))
    # driver-side O(1/n_parts): the set spans many parts, none holds all
    assert len([s for s in slices if len(s)]) >= 4
    assert max(len(s) for s in slices) < len(got)

    # exact expected candidate set: distinct (hash, doc) pairs with >= 2
    # docs, recomputed over the whole corpus as one batch
    doc_w, _, acc, _, _ = wt._window_hashes(df, w)
    c = Counter(h for h, _ in set(zip(acc.tolist(), doc_w.tolist())))
    expect = np.sort(
        np.array([h for h, n in c.items() if n >= 2], dtype=np.uint64)
    )
    assert np.array_equal(got, expect)


def test_dup_span_removal_kernel_semantics(ray_session):
    """dup_span_removal on a crafted corpus: tokens inside cross-doc
    duplicated windows are removed in EVERY carrier (symmetric, no
    keeper); overlapping dup windows cover a token once; same-doc-only
    repeats and short docs survive untouched; clean_md5 rebuilds the
    surviving tokens with a single-space join."""
    import hashlib
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    span = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"  # exactly W=10 tokens
    docs = {
        "u_a": f"xx {span} yy",
        "u_b": f"{span} zz {span}",
        "u_short": "w0 w1 w2 w3 w4",
        "u_selfrep": ("s0 s1 s2 s3 s4 s5 s6 s7 s8 s9 pad "
                      "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9"),
        "u_empty": "",
        # dup span twice with one-token stagger: the two windows'
        # covers overlap, each covered token must count once
        "u_overlap": f"a0 {span} {span}",
    }
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": list(docs), "text": list(docs.values())}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = (
                wt.dup_span_removal(td).to_pandas()
                .set_index("url").sort_index()
            )
        finally:
            wt._read_corpus = orig

    def md5(s):
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    # u_a: the 10 span tokens removed, 'xx yy' survives
    assert out.loc["u_a", "n_tokens"] == 12
    assert out.loc["u_a", "n_removed"] == 10
    assert out.loc["u_a", "clean_md5"] == md5("xx yy")
    # u_b: both occurrences removed, 'zz' survives
    assert out.loc["u_b", "n_removed"] == 20
    assert out.loc["u_b", "clean_md5"] == md5("zz")
    # u_overlap: all 20 span tokens removed once each, 'a0' survives
    assert out.loc["u_overlap", "n_tokens"] == 21
    assert out.loc["u_overlap", "n_removed"] == 20
    assert out.loc["u_overlap", "clean_md5"] == md5("a0")
    # same-doc-only repeats: min_urls=2 distinct urls -> untouched
    assert out.loc["u_selfrep", "n_removed"] == 0
    # short and empty docs: pass through with whitespace-normalized md5
    assert out.loc["u_short", "n_removed"] == 0
    assert out.loc["u_short", "clean_md5"] == md5("w0 w1 w2 w3 w4")
    assert out.loc["u_empty", "n_tokens"] == 0
    assert out.loc["u_empty", "clean_md5"] == md5("")


def test_url_filter_kernel_semantics(ray_session):
    """url_filter flags blocklisted hosts (with category) and banned
    first-path segments; everything else keeps.  Missing-scheme urls
    parse to host '' (split_part semantics) and keep."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    urls = [
        "https://site11.example/news/1",   # blocklisted host (adult)
        "https://site29.example/docs/2",   # blocklisted host (gambling)
        "https://site0.example/shop/3",    # banned path segment
        "https://site0.example/news/4",    # clean
        "no-scheme-url",                    # host '' -> keep
    ]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls}), os.path.join(td, "pages-00000.parquet")
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = wt.url_filter(td).to_pandas().set_index("url")
        finally:
            wt._read_corpus = orig

    assert out.loc[urls[0], "block_category"] == "adult"
    assert out.loc[urls[0], "host_blocked"] == 1 and out.loc[urls[0], "keep"] == 0
    assert out.loc[urls[1], "block_category"] == "gambling"
    assert out.loc[urls[2], "path_flagged"] == 1 and out.loc[urls[2], "keep"] == 0
    assert out.loc[urls[3], "keep"] == 1
    assert out.loc[urls[4], "host"] == "" and out.loc[urls[4], "keep"] == 1


def test_meta_refresh_kernel_semantics(ray_session):
    """meta_refresh parses the FIRST refresh tag (delay + target),
    classifies external vs same-host vs relative targets, and is inert
    on tag-less pages and PDF payloads."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    def page(body: str) -> bytes:
        return f"<html><head>{body}</head><body></body></html>".encode()

    rows = [
        ("https://a.example/p1",
         page('<meta http-equiv="refresh" content="0; url=https://b.example/x">')),
        ("https://a.example/p2",
         page('<meta http-equiv="refresh" content="5; url=https://a.example/y">')),
        ("https://a.example/p3",
         page('<meta http-equiv="refresh" content="3; url=/relative/path">')),
        ("https://a.example/p4", page("<p>no redirect</p>")),
        ("https://a.example/p5", b"%PDF-1.4 fake"),
        # two tags: first match wins on both engine and oracle sides
        ("https://a.example/p6",
         page('<meta http-equiv="refresh" content="1; url=https://c.example/">'
              '<meta http-equiv="refresh" content="9; url=https://d.example/">')),
        # tag past the pinned head window: missed on BOTH sides
        ("https://a.example/p7",
         page("x" * 5000
              + '<meta http-equiv="refresh" content="0; url=https://e.example/">')),
        # 20-digit delay (regex-valid garbage): clamps at the pinned cap
        # instead of overflowing int64 / killing the job
        ("https://a.example/p8",
         page('<meta http-equiv="refresh" '
              'content="99999999999999999999; url=https://f.example/">')),
        # multibyte chars filling the head window: the byte-bounded
        # decode (4 bytes/char) must still see a tag inside the CHAR
        # window — 1000 three-byte chars (3000 bytes) precede the tag,
        # well past head_chars bytes read naively but < 4096 chars
        ("https://a.example/p9",
         page("世" * 1000
              + '<meta http-equiv="refresh" content="2; url=https://g.example/">')),
    ]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": [r[0] for r in rows],
                      "html": pa.array([r[1] for r in rows], pa.binary())}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = wt.meta_refresh(td).to_pandas().set_index("url")
        finally:
            wt._read_corpus = orig

    p1 = out.loc["https://a.example/p1"]
    assert (p1.has_refresh, p1.refresh_delay, p1.target_host,
            p1.is_external) == (1, 0, "b.example", 1)
    p2 = out.loc["https://a.example/p2"]
    assert (p2.has_refresh, p2.refresh_delay, p2.is_external) == (1, 5, 0)
    p3 = out.loc["https://a.example/p3"]
    assert (p3.has_refresh, p3.target_url, p3.target_host,
            p3.is_external) == (1, "/relative/path", "", 0)
    for u in ("https://a.example/p4", "https://a.example/p5"):
        r = out.loc[u]
        assert (r.has_refresh, r.refresh_delay, r.target_url) == (0, -1, "")
    p6 = out.loc["https://a.example/p6"]
    assert (p6.refresh_delay, p6.target_host) == (1, "c.example")
    p7 = out.loc["https://a.example/p7"]
    assert (p7.has_refresh, p7.refresh_delay) == (0, -1)
    p8 = out.loc["https://a.example/p8"]
    from latyas_ray.ops.webtext import META_REFRESH_DELAY_CAP

    assert (p8.has_refresh, p8.refresh_delay, p8.target_host) == (
        1, META_REFRESH_DELAY_CAP, "f.example")
    p9 = out.loc["https://a.example/p9"]
    assert (p9.has_refresh, p9.refresh_delay, p9.target_host) == (
        1, 2, "g.example")


def test_meta_refresh_exercised_on_corpus(ray_session):
    """The synthetic corpus must contain redirect shells — otherwise the
    driver row would verify a vacuous gate."""
    from latyas_ray.ops.webtext import meta_refresh

    out = meta_refresh("/root/testdata/sf0.001").to_pandas()
    assert int(out["has_refresh"].sum()) > 0
    assert (out.loc[out["has_refresh"] == 1, "is_external"] == 1).any()


def test_outlink_stats_kernel_semantics(ray_session):
    """outlink_stats on a crafted corpus: PDF payloads count as pages
    but not html pages; internal/relative links are never external;
    scheme-absolute links to another host are; distinct-href counting is
    per host across pages."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    rows = [
        ("https://a.example/news/1",
         b'<a href="/news">n</a><a href="/news">n</a>'
         b'<a href="https://b.example/x">b</a>'),
        ("https://a.example/blog/2",
         b'<a href="/news">n</a><a href="https://a.example/self">s</a>'),
        ("https://a.example/docs/3", b"%PDF-1.4 binary\xff\x00stuff"),
        ("https://b.example/news/4", b"<p>no links</p>"),
    ]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": [r[0] for r in rows],
                      "html": pa.array([r[1] for r in rows], pa.binary())}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = wt.outlink_stats(td).to_pandas().set_index("host")
        finally:
            wt._read_corpus = orig

    a = out.loc["a.example"]
    # 3 pages, 2 html (the PDF is gated out), 5 links, distinct hrefs:
    # /news, https://b.example/x, https://a.example/self -> 3
    assert a["n_pages"] == 3 and a["n_html_pages"] == 2
    assert a["n_links"] == 5 and a["n_distinct_hrefs"] == 3
    # only the b.example link is external (same-host absolute is not)
    assert a["n_external_links"] == 1
    b = out.loc["b.example"]
    assert b["n_pages"] == 1 and b["n_links"] == 0
    assert b["n_external_links"] == 0 and b["n_distinct_hrefs"] == 0


def test_corpus_html_channel_decodes_strictly():
    """Pinned invariant the outlink SQL oracle's exact decode() relies
    on: every non-PDF payload in the generated corpus is valid utf-8
    (the engine's errors='replace' is therefore a no-op here)."""
    from latyas_ray.corpus import make_row

    for doc_id in range(400):
        row = make_row(doc_id)
        h = row["html"]
        if h[:4] == b"%PDF":
            continue
        h.decode("utf-8")  # raises on violation


def test_curation_pipeline_kernel_semantics(ray_session):
    """curation_pipeline gate composition on a crafted corpus: each gate
    fires independently; the exact-dedup keeper is the lexicographic-min
    url of a text group; shard is assigned only to survivors."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt
    from latyas_ray.ops.export import md5_number_lower

    # a paragraph that passes all three quality batteries (>=50 tokens
    # incl. stopwords, terminal lines, >=5 sentences, no lorem/brace)
    good = (
        "The market and the report with a growth of the system are here. "
        "The energy and the water with a policy of the model are here. "
        "The value and the trade with a health of the city are here. "
        "The region and the science with a data of the plan are here. "
        "The industry and the network with a result of the change are here."
    )
    rows = {
        "https://site0.example/news/1": good,            # survivor (keeper)
        "https://site0.example/news/2": good,            # dup -> dropped
        "https://site11.example/news/3": good + " More of the same story here.",  # blocked host
        "https://site0.example/shop/4": good + " Another different story here.",  # banned path
        "https://site0.example/news/5": "short low quality",  # fails funnel
    }
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": list(rows), "text": list(rows.values())}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = wt.curation_pipeline(td).to_pandas().set_index("url")
        finally:
            wt._read_corpus = orig

    k = out.loc["https://site0.example/news/1"]
    assert k["keep"] == 1
    assert k["shard"] == md5_number_lower("https://site0.example/news/1") % 64
    d = out.loc["https://site0.example/news/2"]
    assert d["keep_dedup"] == 0 and d["keep"] == 0 and d["shard"] == -1
    assert d["keep_url"] == 1 and d["keep_quality"] == 1
    b = out.loc["https://site11.example/news/3"]
    assert b["keep_url"] == 0 and b["keep"] == 0
    s = out.loc["https://site0.example/shop/4"]
    assert s["keep_url"] == 0 and s["keep_dedup"] == 1
    q = out.loc["https://site0.example/news/5"]
    assert q["keep_quality"] == 0 and q["keep_url"] == 1 and q["keep"] == 0


def test_domain_mixture_quota_semantics(ray_session):
    """Alpha=1/2 quota math on a crafted skewed corpus: isqrt weights,
    global budget, per-host caps, hash-ordered keeps, and invariance to
    the coarse partition count."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt
    from latyas_ray.ops.export import md5_number_lower

    urls = (
        [f"https://big.example/p/{i}" for i in range(9)]
        + [f"https://mid.example/p/{i}" for i in range(4)]
        + ["https://tiny.example/only"]
    )
    # n_total=14, weights isqrt: big 3, mid 2, tiny 1 (W=6),
    # t_keep = 14 * 1 // 2 = 7 -> quotas min(n, 7*w//6): big 3, mid 2,
    # tiny 1
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls}), os.path.join(td, "pages-00000.parquet")
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = wt.domain_mixture(td).to_pandas()
            out4 = wt.domain_mixture(td, n_parts=4).to_pandas()
        finally:
            wt._read_corpus = orig

    out = out.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out, out4.sort_values("url").reset_index(drop=True)
    )
    g = out.groupby("host")
    assert g["host_quota"].first().to_dict() == {
        "big.example": 3, "mid.example": 2, "tiny.example": 1}
    assert g["n_host_pages"].first().to_dict() == {
        "big.example": 9, "mid.example": 4, "tiny.example": 1}
    assert g["keep"].sum().to_dict() == {
        "big.example": 3, "mid.example": 2, "tiny.example": 1}
    # within a host, the kept docs are exactly the quota smallest by
    # (md5_number_lower(url), url) — an unbiased deterministic sample
    for host, hg in out.groupby("host"):
        hg = hg.copy()
        hg["m"] = [md5_number_lower(u) for u in hg["url"]]
        hg = hg.sort_values(["m", "url"]).reset_index(drop=True)
        q = int(hg["host_quota"].iloc[0])
        assert list(hg["host_rank"]) == list(range(1, len(hg) + 1))
        assert (hg["keep"].to_numpy()[:q] == 1).all()
        assert (hg["keep"].to_numpy()[q:] == 0).all()
    # global budget respected
    assert int(out["keep"].sum()) <= len(out) * wt.DOMAIN_MIX_NUM // wt.DOMAIN_MIX_DEN


def test_isqrt_arr_matches_math_isqrt():
    """floor(sqrt(double(n))) is exact for the int64 host-count range we
    use — property-check vs math.isqrt incl. perfect-square boundaries."""
    import math

    import numpy as np

    import latyas_ray.ops.webtext as wt

    ns = [0, 1, 2, 3, 4, 8, 9, 15, 16, 10**6, 10**6 + 1, 2**40, 2**40 + 1]
    ns += [k * k for k in range(1, 2000, 37)]
    ns += [k * k - 1 for k in range(2, 2000, 41)]
    arr = np.array(ns, dtype=np.int64)
    got = wt._isqrt_arr(arr)
    exp = np.array([math.isqrt(int(n)) for n in ns], dtype=np.int64)
    assert (got == exp).all()


def test_host_pagerank_matches_reference_loop(ray_session):
    """Engine vs an independent dict-and-loop PageRank on a crafted
    graph covering every edge rule: duplicate hrefs collapse to one
    edge, relative and same-host links are not edges, links to
    non-corpus hosts are dropped, PDF payloads carry no links, dangling
    and isolated hosts keep teleport-only mass."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    rows = [
        ("https://a.example/1",
         '<a href="https://b.example/x">l</a>'
         '<a href="https://c.example/y">m</a>'
         '<a href="https://offsite.example/z">drop-nonnode</a>'
         '<a href="https://a.example/self">drop-samehost</a>'
         '<a href="/rel">drop-relative</a>'),
        ("https://a.example/2", '<a href="https://b.example/x2">dup-edge</a>'),
        ("https://b.example/1", '<a href="https://a.example/home">back</a>'),
        ("https://c.example/1", "dangling: no links"),
        ("https://d.example/1", None),  # PDF payload -> isolated host
    ]
    urls = [r[0] for r in rows]
    htmls = [(r[1].encode() if r[1] else b"%PDF-1.4 fake") for r in rows]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls, "html": htmls}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = (
                wt.host_pagerank(td).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
            out8 = (
                wt.host_pagerank(td, n_parts=8).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
        finally:
            wt._read_corpus = orig

    # independent reference: plain dicts, no hashing, no partitioning
    nodes = ["a.example", "b.example", "c.example", "d.example"]
    edges = {("a.example", "b.example"), ("a.example", "c.example"),
             ("b.example", "a.example")}
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: wt.PAGERANK_SCALE for n in nodes}
    for _ in range(wt.PAGERANK_ITERS):
        nr = {n: wt.PAGERANK_TELEPORT for n in nodes}
        for s, d in edges:
            nr[d] += (
                r[s] * wt.PAGERANK_DAMP_NUM // wt.PAGERANK_DAMP_DEN
            ) // outdeg[s]
        r = nr
    exp = pd.DataFrame(
        {"host": nodes,
         "n_out_hosts": [outdeg.get(n, 0) for n in nodes],
         "rank_micro": [r[n] for n in nodes]}
    )
    got = out.astype({"n_out_hosts": "int64", "rank_micro": "int64"})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # partition-count invariance
    pd.testing.assert_frame_equal(out, out8)
    # mass sanity: dangling/isolated hosts sit at pure teleport
    assert int(got.set_index("host").loc["d.example", "rank_micro"]) == (
        wt.PAGERANK_TELEPORT
    )


def test_host_two_hop_matches_reference_loop(ray_session):
    """Engine vs an independent set-based two-hop/reciprocity loop on a
    crafted graph: cycles count toward two-hop reach (b reaches itself
    via a), hosts without out-edges never appear, duplicate paths to
    the same target collapse to one, and the result is partition-count
    invariant."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    rows = [
        # a -> b, a -> c; b -> a, b -> c; c dangling; d isolated (PDF)
        ("https://a.example/1",
         '<a href="https://b.example/x">l</a>'
         '<a href="https://c.example/y">m</a>'),
        ("https://b.example/1",
         '<a href="https://a.example/home">back</a>'
         '<a href="https://c.example/z">side</a>'),
        ("https://c.example/1", "dangling: no links"),
        ("https://d.example/1", None),  # PDF payload
    ]
    urls = [r[0] for r in rows]
    htmls = [(r[1].encode() if r[1] else b"%PDF-1.4 fake") for r in rows]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls, "html": htmls}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = (
                wt.host_two_hop(td).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
            out8 = (
                wt.host_two_hop(td, n_parts=8).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
        finally:
            wt._read_corpus = orig

    # independent reference: plain sets, no hashing, no partitioning
    edges = {("a.example", "b.example"), ("a.example", "c.example"),
             ("b.example", "a.example"), ("b.example", "c.example")}
    out_map: dict = {}
    for s, d in edges:
        out_map.setdefault(s, set()).add(d)
    exp_rows = []
    for h in sorted(out_map):
        two = set()
        for m in out_map[h]:
            two |= out_map.get(m, set())
        rec = sum(1 for m in out_map[h] if h in out_map.get(m, set()))
        exp_rows.append((h, len(out_map[h]), len(two), rec))
    exp = pd.DataFrame(
        exp_rows,
        columns=["host", "n_out_hosts", "n_two_hop", "n_reciprocal"],
    )
    got = out.astype(
        {"n_out_hosts": "int64", "n_two_hop": "int64",
         "n_reciprocal": "int64"}
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    pd.testing.assert_frame_equal(out, out8)
    # a reaches {a, c} via b (cycle counts); b reaches {b, c} via a
    m = got.set_index("host")
    assert int(m.loc["a.example", "n_two_hop"]) == 2
    assert int(m.loc["a.example", "n_reciprocal"]) == 1
    assert "c.example" not in m.index and "d.example" not in m.index


def test_host_components_matches_reference_bfs(ray_session):
    """Engine vs an independent BFS on a crafted multi-component graph:
    a 6-host undirected chain (propagation must cross 5 hops — deeper
    than one round), a separate reciprocal pair, and an isolated PDF
    host forming a singleton.  Representative = member with the minimum
    md5_number_lower (recomputed here from hashlib, not the engine's
    helper); result is partition-count invariant."""
    import hashlib
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    chain = [f"c{i}.example" for i in range(6)]
    rows = [
        # chain: c0 -> c1 -> ... -> c5 (one directed link each)
        *[
            (f"https://{chain[i]}/1",
             f'<a href="https://{chain[i + 1]}/x">n</a>')
            for i in range(5)
        ],
        ("https://c5.example/1", "end of chain: no links"),
        # reciprocal pair e <-> f
        ("https://e.example/1", '<a href="https://f.example/x">l</a>'),
        ("https://f.example/1", '<a href="https://e.example/y">l</a>'),
        ("https://d.example/1", None),  # PDF payload -> singleton
    ]
    urls = [r[0] for r in rows]
    htmls = [(r[1].encode() if r[1] else b"%PDF-1.4 fake") for r in rows]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls, "html": htmls}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = (
                wt.host_components(td).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
            out8 = (
                wt.host_components(td, n_parts=8).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
        finally:
            wt._read_corpus = orig

    # independent reference: BFS over plain sets, min-md5 representative
    def m64(s: str) -> int:
        return int.from_bytes(
            hashlib.md5(s.encode()).digest()[8:], "little"
        )

    comps = [set(chain), {"e.example", "f.example"}, {"d.example"}]
    exp_rows = []
    for comp in comps:
        rep = min(comp, key=m64)
        for h in comp:
            exp_rows.append((h, rep, len(comp)))
    exp = (
        pd.DataFrame(
            exp_rows, columns=["host", "component_host", "component_size"]
        )
        .sort_values("host").reset_index(drop=True)
    )
    got = out.astype({"component_size": "int64"})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    pd.testing.assert_frame_equal(out, out8)


def test_host_components_exact_rounds_short_of_fixpoint(ray_session):
    """Pinned exactly-``iters``-rounds semantics: with iters=2 on a
    6-host chain (diameter 5) the engine must match an independent
    Python recompute of two min-propagation rounds, INCLUDING labels
    whose owner sits in a different partial group — every group still
    gets its owner's name, never an empty representative (the SQL
    oracle's l0-join property)."""
    import hashlib
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    chain = [f"c{i}.example" for i in range(6)]
    rows = [
        *[
            (f"https://{chain[i]}/1",
             f'<a href="https://{chain[i + 1]}/x">n</a>')
            for i in range(5)
        ],
        ("https://c5.example/1", "end of chain: no links"),
    ]
    urls = [r[0] for r in rows]
    htmls = [r[1].encode() for r in rows]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls, "html": htmls}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = (
                wt.host_components(td, iters=2).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
        finally:
            wt._read_corpus = orig

    # independent reference: two rounds of plain-dict min propagation
    def m64(s: str) -> int:
        return int.from_bytes(
            hashlib.md5(s.encode()).digest()[8:], "little"
        )

    und = [(chain[i], chain[i + 1]) for i in range(5)]
    und += [(b, a) for a, b in und]
    lab = {h: m64(h) for h in chain}
    owner = {m64(h): h for h in chain}
    for _ in range(2):
        nxt = dict(lab)
        for a, b in und:
            nxt[b] = min(nxt[b], lab[a])
        lab = nxt
    from collections import Counter

    sizes = Counter(lab.values())
    exp = (
        pd.DataFrame(
            {"host": chain,
             "component_host": [owner[lab[h]] for h in chain],
             "component_size": [sizes[lab[h]] for h in chain]}
        )
        .sort_values("host").reset_index(drop=True)
    )
    # two rounds cannot connect a 5-hop chain: must be >1 partial group
    assert exp["component_host"].nunique() > 1
    assert (out["component_host"] != "").all()
    pd.testing.assert_frame_equal(
        out.astype({"component_size": "int64"}), exp, check_dtype=False
    )


def test_host_components_doubling_converges_faster(ray_session):
    """The pointer-doubling variant on the 6-host chain: proves the
    fixpoint in 5 rounds where plain propagation needs 6 (5 change
    rounds + the observe round), produces the identical component
    table, and raises below its convergence point instead of emitting
    a partial result (the doubling recurrence has no SQL form short of
    the fixpoint)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    chain = [f"c{i}.example" for i in range(6)]
    rows = [
        *[
            (f"https://{chain[i]}/1",
             f'<a href="https://{chain[i + 1]}/x">n</a>')
            for i in range(5)
        ],
        ("https://c5.example/1", "end of chain: no links"),
    ]
    urls = [r[0] for r in rows]
    htmls = [r[1].encode() for r in rows]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls, "html": htmls}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            with pytest.raises(RuntimeError, match="fixpoint"):
                wt.host_components_fast(td, iters=4)
            fast = (
                wt.host_components_fast(td, iters=5).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
            plain = (
                wt.host_components(td).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
        finally:
            wt._read_corpus = orig

    pd.testing.assert_frame_equal(fast, plain)
    assert fast["component_host"].nunique() == 1
    assert (fast["component_size"] == 6).all()


def test_anchor_text_stats_matches_reference_loop(ray_session):
    """Engine vs an independent dict-and-Counter loop on a crafted
    graph: occurrence weighting (no (src, dst) dedup), relative and
    same-host anchors dropped, non-corpus targets dropped, PDF payloads
    contribute nothing, and the mode tie-break goes to the
    lexicographically smallest text."""
    import os
    import tempfile
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    rows = [
        ("https://a.example/1",
         '<a href="https://b.example/p">x</a>'
         '<a href="https://b.example/q">x</a>'
         '<a href="https://b.example/r">y</a>'
         '<a href="https://c.example/s">m</a>'
         '<a href="https://offsite.example/z">drop-nonnode</a>'
         '<a href="https://a.example/self">drop-samehost</a>'
         '<a href="/rel">drop-relative</a>'),
        ("https://b.example/1",
         '<a href="https://a.example/h">z</a>'
         '<a href="https://c.example/t">k</a>'),
        ("https://c.example/1", "no links"),
        ("https://d.example/1", None),  # PDF payload
    ]
    urls = [r[0] for r in rows]
    htmls = [(r[1].encode() if r[1] else b"%PDF-1.4 fake") for r in rows]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls, "html": htmls}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = (
                wt.anchor_text_stats(td).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
            out8 = (
                wt.anchor_text_stats(td, n_parts=8).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
        finally:
            wt._read_corpus = orig

    # independent reference: Counter per destination host
    anchors = {
        "a.example": [("b.example", "x"), ("b.example", "x"),
                      ("b.example", "y"), ("c.example", "m")],
        "b.example": [("a.example", "z"), ("c.example", "k")],
    }
    per_dst: dict = {}
    for src, lst in anchors.items():
        for dst, text in lst:
            per_dst.setdefault(dst, Counter())[text] += 1
    exp_rows = []
    for dst in sorted(per_dst):
        c = per_dst[dst]
        top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        exp_rows.append(
            (dst, sum(c.values()), len(c), top[0], top[1])
        )
    exp = pd.DataFrame(
        exp_rows,
        columns=["host", "n_anchor_refs", "n_distinct_anchor_texts",
                 "top_anchor_text", "top_anchor_count"],
    )
    got = out.astype(
        {"host": object, "n_anchor_refs": "int64",
         "n_distinct_anchor_texts": "int64", "top_anchor_text": object,
         "top_anchor_count": "int64"}
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    pd.testing.assert_frame_equal(out, out8)
    # the engineered tie: c receives "m" and "k" once each -> "k" wins
    m = got.set_index("host")
    assert m.loc["c.example", "top_anchor_text"] == "k"
    assert int(m.loc["c.example", "top_anchor_count"]) == 1


def test_tier_extraction_invariants(ray_session):
    """Capstone invariants at sf0.001: host_tier == -1 exactly for
    rejected documents, kept tiers land in {1..4}, keep agrees
    row-for-row with curation_pipeline, and every document of one host
    that survives shares that host's tier."""
    import latyas_ray.ops.webtext as wt

    sf_dir = "/root/testdata/sf0.001"
    out = wt.tier_extraction(sf_dir).to_pandas()
    cur = wt.curation_pipeline(sf_dir).to_pandas()

    kept = out[out["keep"] == 1]
    rej = out[out["keep"] == 0]
    assert (rej["host_tier"] == -1).all()
    assert kept["host_tier"].isin([1, 2, 3, 4]).all()
    m = out.merge(cur[["url", "keep"]], on="url", suffixes=("", "_cur"))
    assert (m["keep"] == m["keep_cur"]).all()
    # one tier per host among keepers
    host = kept["url"].str.split("://").str[1].str.split("/").str[0]
    per_host = kept.assign(host=host).groupby("host")["host_tier"].nunique()
    assert (per_host == 1).all()


# ----------------------------------------------------------- joined mode


def _crafted_corpus_base(rows: dict):
    """Write a crafted {url: text} corpus and return a read_parquet
    dataset over it (caller patches wt._read_corpus)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    td = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"url": list(rows), "text": list(rows.values())}),
        os.path.join(td, "pages-00000.parquet"),
    )
    return td, rd.read_parquet(os.path.join(td, "pages-00000.parquet"))


_JOINED_OPS = [
    ("boilerplate_strip", {}),
    ("curation_pipeline", {}),
    ("dup_span_stats", {}),
    ("dup_span_removal", {}),
]


def test_joined_mode_matches_broadcast(ray_session):
    """VERDICT r4 #1: every sharded-broadcast consumer's joined
    (co-partitioned) mode returns EXACTLY the broadcast rows on the
    sf0.001 corpus — same values, same dtypes, order-insensitive."""
    import latyas_ray.ops.webtext as wt

    sf_dir = "/root/testdata/sf0.001"
    for name, kwargs in _JOINED_OPS:
        fn = getattr(wt, name)
        a = fn(sf_dir, **kwargs).to_pandas()
        b = fn(sf_dir, mode="joined", **kwargs).to_pandas()
        cols = list(a.columns)
        assert list(b.columns) == cols, name
        a = a.sort_values(cols).reset_index(drop=True)
        b = b.sort_values(cols).reset_index(drop=True)
        for c in cols:
            av, bv = a[c], b[c]
            if av.dtype == object or str(av.dtype) == "string":
                assert av.astype(str).equals(bv.astype(str)), (name, c)
            else:
                assert av.equals(bv.astype(av.dtype)), (name, c)


def test_joined_mode_never_builds_broadcast_refs(ray_session, monkeypatch):
    """Joined mode must not touch the sharded-broadcast machinery AT ALL
    — zero `_shard_refs` slices built, zero `ray.put` of a set slice —
    which is strictly stronger than the 'each map task fetches ≤1 slice'
    bar: each part's set slice reaches exactly the one groupby task that
    owns its part, through the shuffle, never through the object store.
    Verified by making the broadcast entry points raise: the crafted
    corpora below exercise dup windows, boilerplate lines and a dedup
    group, so every op still produces its non-trivial verdicts."""
    import hashlib

    import latyas_ray.ops.webtext as wt

    def boom(*a, **k):
        raise AssertionError("broadcast machinery used in joined mode")

    span = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    rows = {
        "https://a.example/1": f"xx {span} yy",
        "https://a.example/2": f"{span} zz",
        "https://b.example/1": "common line\nunique one\ncommon line",
        "https://b.example/2": "common line\nunique two",
        "https://c.example/1": "same text body",
        "https://c.example/2": "same text body",
    }
    td, base = _crafted_corpus_base(rows)
    monkeypatch.setattr(
        wt, "_read_corpus", lambda sf_dir, columns: base.select_columns(columns)
    )
    monkeypatch.setattr(wt, "_shard_refs", boom)
    monkeypatch.setattr(wt, "_sharded_isin", boom)
    monkeypatch.setattr(wt, "_sharded_value_lookup", boom)

    def md5(s):
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    rem = (
        wt.dup_span_removal(td, mode="joined").to_pandas()
        .set_index("url")
    )
    assert rem.loc["https://a.example/1", "n_removed"] == 10
    assert rem.loc["https://a.example/1", "clean_md5"] == md5("xx yy")
    assert rem.loc["https://b.example/1", "n_removed"] == 0

    st = (
        wt.dup_span_stats(td, mode="joined").to_pandas().set_index("url")
    )
    assert st.loc["https://a.example/2", "n_dup_windows"] == 1
    assert st.loc["https://c.example/1", "n_dup_windows"] == 0

    bp = (
        wt.boilerplate_strip(td, min_urls=2, mode="joined").to_pandas()
        .set_index("url")
    )
    assert bp.loc["https://b.example/1", "n_removed"] == 2
    assert bp.loc["https://b.example/1", "clean_md5"] == md5("unique one")
    assert bp.loc["https://a.example/1", "n_removed"] == 0

    cur = (
        wt.curation_pipeline(td, mode="joined").to_pandas()
        .set_index("url")
    )
    # keeper = lexicographic-min url of the identical-text group
    assert cur.loc["https://c.example/1", "keep_dedup"] == 1
    assert cur.loc["https://c.example/2", "keep_dedup"] == 0


def test_host_two_hop_hub_salting(ray_session):
    """Adversarial hub family (VERDICT r4 #2): one hub intermediate with
    indeg·outdeg ≫ the cell cap.  With ``cell_cap`` lowered so the grid
    activates (r > 1), the result must be IDENTICAL to the unsalted
    plan and to an independent set-based loop — salting only changes
    partitioning.  Also pins the grid math: r = ceil(sqrt(prod/cap))
    bounds per-cell join output at ~cap, and the r table is sparse
    (hub only)."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    import latyas_ray.ops.webtext as wt

    n_in, n_out = 20, 15  # product 300 >> cap 16
    rows = []
    # a0..a19 -> hub (every a also links one sibling to stay non-trivial)
    for i in range(n_in):
        rows.append((
            f"https://a{i}.example/1",
            f'<a href="https://hub.example/x">h</a>'
            f'<a href="https://a{(i + 1) % n_in}.example/y">s</a>',
        ))
    # hub -> b0..b14
    hub_html = "".join(
        f'<a href="https://b{j}.example/z">o</a>' for j in range(n_out)
    )
    rows.append(("https://hub.example/1", hub_html))
    for j in range(n_out):
        rows.append((f"https://b{j}.example/1", "no links"))
    urls = [r[0] for r in rows]
    htmls = [r[1].encode() for r in rows]

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls, "html": htmls}),
            os.path.join(td, "pages-00000.parquet"),
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            plain = (
                wt.host_two_hop(td).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
            salted = (
                wt.host_two_hop(td, cell_cap=16).to_pandas()
                .sort_values("host").reset_index(drop=True)
            )
            # the r table itself: sparse, hub-only, grid factor as pinned
            ds_urls = wt._read_corpus(td, ["url"])
            _, node_refs = wt._host_nodes(ds_urls, wt.PAGERANK_PARTS)
            edges = wt._host_edges(
                wt._read_corpus(td, ["url", "html"]), node_refs,
                wt.PAGERANK_PARTS,
            )
            refs = wt._hub_grid_refs(edges, wt.PAGERANK_PARTS, cell_cap=16)
            entries = []
            for ref in refs:
                if ref is None:
                    continue
                hm, r = ray.get(ref)
                entries += list(zip(hm.tolist(), r.tolist()))
        finally:
            wt._read_corpus = orig

    pd.testing.assert_frame_equal(plain, salted)
    # independent reference loop
    out_map: dict = {}
    for i in range(n_in):
        out_map.setdefault(f"a{i}.example", set()).update(
            {"hub.example", f"a{(i + 1) % n_in}.example"}
        )
    out_map["hub.example"] = {f"b{j}.example" for j in range(n_out)}
    exp_rows = []
    for h in sorted(out_map):
        two = set()
        for m in out_map[h]:
            two |= out_map.get(m, set())
        rec = sum(1 for m in out_map[h] if h in out_map.get(m, set()))
        exp_rows.append((h, len(out_map[h]), len(two), rec))
    exp = pd.DataFrame(
        exp_rows,
        columns=["host", "n_out_hosts", "n_two_hop", "n_reciprocal"],
    )
    pd.testing.assert_frame_equal(
        salted.astype({"n_out_hosts": "int64", "n_two_hop": "int64",
                       "n_reciprocal": "int64"}),
        exp, check_dtype=False,
    )
    # exactly one hub entry; r = ceil(sqrt((20*1 + ... ) hub product/16))
    # hub indeg = 20 (a_i -> hub), outdeg = 15
    assert len(entries) == 1
    from latyas_ray.ops.export import md5_number_lower
    assert entries[0][0] == md5_number_lower("hub.example")
    r = entries[0][1]
    assert r == int(np.ceil(np.sqrt(20 * 15 / 16)))
    # per-cell bound: indeg/r * outdeg/r <= cap (the de-skew claim)
    assert (20 / r) * (15 / r) <= 16 + 1e-9


def test_domain_mixture_giant_host_not_colocated(ray_session):
    """De-skew invariant (VERDICT r4 #5): a giant host's rows split
    across md5n buckets — no group ever holds the host's full row set —
    while ranks/quotas/keeps stay EXACTLY the serial reference's.  The
    bucket split is pinned by recomputing the deterministic bucket
    assignment in the test."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import latyas_ray.ops.webtext as wt
    from latyas_ray.ops.export import md5_number_lower
    from latyas_ray.ops.webtext import _isqrt_arr

    n_big, n_small = 1500, 5
    urls = [f"https://giant.example/p/{i}" for i in range(n_big)] + [
        f"https://tiny.example/p/{i}" for i in range(n_small)
    ]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"url": urls}), os.path.join(td, "pages-00000.parquet")
        )
        base = rd.read_parquet(os.path.join(td, "pages-00000.parquet"))
        orig = wt._read_corpus
        wt._read_corpus = lambda sf_dir, columns: base.select_columns(columns)
        try:
            out = wt.domain_mixture(td).to_pandas()
        finally:
            wt._read_corpus = orig

    # serial reference: exact md5-order ranks and integer quotas
    md5n = np.array([md5_number_lower(u) for u in urls], dtype=np.uint64)
    host = np.array([u.split("://")[1].split("/")[0] for u in urls],
                    dtype=object)
    n_total = len(urls)
    counts = pd.Series(host).value_counts()
    w_total = int(_isqrt_arr(counts.to_numpy(np.int64)).sum())
    t_keep = n_total * wt.DOMAIN_MIX_NUM // wt.DOMAIN_MIX_DEN
    ref = pd.DataFrame({"url": urls, "host": host, "md5n": md5n})
    ref = ref.sort_values(["host", "md5n", "url"]).reset_index(drop=True)
    ref["host_rank"] = ref.groupby("host").cumcount() + 1
    ref["n_host_pages"] = ref.groupby("host")["url"].transform("size")
    ref["host_quota"] = np.minimum(
        ref["n_host_pages"].to_numpy(np.int64),
        t_keep * _isqrt_arr(ref["n_host_pages"].to_numpy(np.int64))
        // w_total,
    )
    ref["keep"] = (ref["host_rank"] <= ref["host_quota"]).astype(np.int64)

    got = out.sort_values(["host", "host_rank"]).reset_index(drop=True)
    exp = ref[["url", "host", "n_host_pages", "host_quota", "host_rank",
               "keep"]].sort_values(["host", "host_rank"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_host_pages": "int64", "host_quota": "int64",
                    "host_rank": "int64", "keep": "int64"}),
        exp.astype({"n_host_pages": "int64", "host_quota": "int64",
                    "host_rank": "int64", "keep": "int64"}),
        check_dtype=False,
    )
    # the split invariant: the giant host occupies MANY buckets and its
    # largest bucket is far below the full row set
    shift = np.uint64(64 - (wt.DOMAIN_MIX_BUCKETS.bit_length() - 1))
    buckets = (md5n[:n_big] >> shift).astype(np.int64)
    sizes = np.bincount(buckets, minlength=wt.DOMAIN_MIX_BUCKETS)
    assert (sizes > 0).sum() >= wt.DOMAIN_MIX_BUCKETS // 2
    assert sizes.max() < n_big // 8


def test_sorted_lookup_empty_vals_string_default():
    """ADVICE r4: an empty values slice with a string default must
    return all-defaults, not raise on a hardcoded int64 dtype."""
    import numpy as np

    from latyas_ray.ops.webtext import _sorted_lookup

    out = _sorted_lookup(
        np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint64),
        np.array([1, 2], dtype=np.uint64), default="",
    )
    assert out.dtype == object and list(out) == ["", ""]
    out2 = _sorted_lookup(
        None, np.zeros(0, dtype=np.int64),
        np.array([7], dtype=np.uint64), default=-5,
    )
    assert list(out2) == [-5]


def test_lenprefix_name_pack_roundtrip():
    """ADVICE r4: the component name cards survive hosts containing
    newlines and a LONE empty host — the failure modes of the old
    newline-joined cell."""
    import numpy as np

    from latyas_ray.ops.webtext import _unpack_lenprefix

    for names in (["a\nb.example", "", "c.example"], [""], [],
                  ["héllo.example"]):
        enc = [h.encode("utf-8") for h in names]
        blob = b"".join(enc)
        lens = np.fromiter((len(e) for e in enc), dtype=np.int32,
                           count=len(enc)).tobytes()
        got = _unpack_lenprefix(blob, lens)
        assert list(got) == names


def test_cached_artifact_reuse_tier_and_removal(ray_session, monkeypatch,
                                                tmp_path):
    """VERDICT r4 #7: the composites accept materialized artifacts —
    tier_extraction a host_pagerank parquet, dup_span_removal a
    dup_span_census parquet — producing byte-identical output while the
    redundant recompute NEVER RUNS (the recompute entry points are
    monkeypatched to raise, driver-side)."""
    import latyas_ray.ops.webtext as wt

    sf_dir = "/root/testdata/sf0.001"

    # ---- tier_extraction(rank_table=...)
    base = wt.tier_extraction(sf_dir).to_pandas()
    rank_path = str(tmp_path / "rank")
    wt.host_pagerank(sf_dir).write_parquet(rank_path)

    def boom(*a, **k):
        raise AssertionError("recompute ran despite cached artifact")

    monkeypatch.setattr(wt, "host_pagerank", boom)
    cached = wt.tier_extraction(sf_dir, rank_table=rank_path).to_pandas()
    monkeypatch.undo()
    a = base.sort_values("url").reset_index(drop=True)
    b = cached.sort_values("url").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # ---- dup_span_removal(census_path=...)
    base_r = wt.dup_span_removal(sf_dir).to_pandas()
    census_path = str(tmp_path / "census")
    wt.dup_span_census(sf_dir).write_parquet(census_path)
    monkeypatch.setattr(wt, "_dup_removal_refs", boom)
    cached_r = wt.dup_span_removal(
        sf_dir, census_path=census_path
    ).to_pandas()
    monkeypatch.undo()
    a = base_r.sort_values("url").reset_index(drop=True)
    b = cached_r.sort_values("url").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # census reuse is a broadcast-mode feature
    import pytest as _pytest
    with _pytest.raises(ValueError):
        wt.dup_span_removal(sf_dir, mode="joined", census_path=census_path)


def test_membership_mode_validated():
    """A typo'd mode must fail loudly, not silently fall through to the
    broadcast plan (whose per-node residency joined mode exists to
    avoid)."""
    import pytest as _pytest

    from latyas_ray.ops import webtext as wt

    for fn in (wt.boilerplate_strip, wt.dup_span_stats,
               wt.dup_span_removal, wt.curation_pipeline):
        with _pytest.raises(ValueError, match="membership mode"):
            fn("/root/testdata/sf0.001", mode="Joined")
