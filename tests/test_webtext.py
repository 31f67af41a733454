"""Webtext op kernels: url parsing pinned to split_part semantics, PII
regex composition, and line-accounting edge cases.  End-to-end
correctness (engine vs independent DuckDB SQL over the same shards) is
covered by test_oracle_parity.py."""

import hashlib
import re

import pandas as pd

from latyas_ray.ops.webtext import (
    EMAIL_RE,
    IPV4_RE,
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
    assert len(re.findall(EMAIL_RE, t)) == 1
    assert len(re.findall(IPV4_RE, t)) == 1  # the 4-digit tail breaks \b
    assert len(re.findall(PHONE_RE, t)) == 1
    s = re.sub(EMAIL_RE, "<EMAIL>", t)
    s = re.sub(IPV4_RE, "<IP>", s)
    s = re.sub(PHONE_RE, "<PHONE>", s)
    assert s == "mail <EMAIL>, ip <IP>, bad 10.0.0.1234, tel <PHONE>"


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
