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
