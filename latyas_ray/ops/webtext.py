"""Web-corpus operators over the Common-Crawl-shaped pages table.

These run over the exact ``input_hint`` table — ``(url:string,
warc_ts:timestamp, html:binary, text:string, lang:string)`` — the same
corpus the extraction pipeline reads, and cover the web-scale curation
steps a training-data pipeline layers on top of extraction: snapshot
dedup, per-domain rollups, PII scrubbing, and C4/Gopher-style line-level
repetition handling.

Every op here is verified against an INDEPENDENT DuckDB SQL oracle that
reads the same parquet shards (no serial-Python snapshot in the loop), so
string semantics are pinned engine↔SQL:

- url parsing: ``host = split_part(split_part(url,'://',2),'/',1)`` —
  the pandas side uses ``str.partition``, which agrees including the
  missing-scheme edge (both yield '');
- line splitting is a literal ``'\\n'`` split (``string_split`` /
  ``str.split``), no stripping, empty lines excluded by ``line <> ''``;
- PII regexes are RE2-safe ASCII classes (identical match sets under
  Python ``re`` and DuckDB's RE2), counts taken on the ORIGINAL text,
  replacements composed in one pinned order (email → ipv4 → phone);
- hashes are ``md5`` hex (identical in hashlib and DuckDB).

Scale shapes (the part that must survive 100 TB):

- per-document ops (``line_repetition``, ``pii_scrub``) are map-only —
  a document's text lives in one row, so no shuffle ever;
- bounded-key rollups (``domain_stats``, ``latest_snapshot``) do a
  per-batch vectorized partial aggregate and merge the O(batches × keys)
  survivors in one task (``repartition(1)`` is a move of partial rows,
  not a data shuffle);
- the unbounded-key op (``line_dedup``) shuffles PARTIAL COUNTS keyed by
  a coarse 64-way hash of the line digest — the ``word_counts`` pattern:
  bounded Python callbacks, C-groupby inside each partition, and only
  (digest, url, n) rows move, never the text.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..corpus import ensure_corpus_for_sf, sf_label_from_dir

# RE2-safe ASCII patterns, shared verbatim with the SQL oracles.  The
# Python side MUST compile with re.ASCII: RE2's \b and \d are ASCII-only,
# while Python's are Unicode-aware — for 'é192.0.2.1' Unicode re finds no
# \b boundary (é is a word char) where RE2 does.
import re as _re

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+1-555-\d{4}"
EMAIL_PAT = _re.compile(EMAIL_RE, _re.ASCII)
IPV4_PAT = _re.compile(IPV4_RE, _re.ASCII)
PHONE_PAT = _re.compile(PHONE_RE, _re.ASCII)


def _read_corpus(sf_dir: str, columns: List[str]) -> rd.Dataset:
    import glob

    corpus = ensure_corpus_for_sf(sf_label_from_dir(sf_dir))
    paths = sorted(glob.glob(os.path.join(corpus, "pages-*.parquet")))
    return rd.read_parquet(paths, columns=columns)


def corpus_glob(sf_label: str) -> str:
    """The parquet glob the SQL oracles read — one definition."""
    from ..corpus import default_corpus_dir

    return os.path.join(default_corpus_dir(sf_label), "pages-*.parquet")


def _host_section(urls: pd.Series) -> Tuple[pd.Series, pd.Series]:
    """Vectorized host / first-path-segment parse, pinned to DuckDB's
    ``split_part`` semantics: split on EVERY delimiter occurrence and
    take the field (missing field → '').  ``str.partition`` would differ
    for urls embedding a second '://' in the path ('https://a/b://c':
    split_part's rest is 'a/b', partition's is 'a/b://c')."""
    rest = urls.str.split("://").str[1].fillna("")
    segs = rest.str.split("/")
    host = segs.str[0].fillna("")
    section = segs.str[1].fillna("")
    return host, section


# ------------------------------------------------------- latest_snapshot


def latest_snapshot(sf_dir: str) -> pd.DataFrame:
    """Latest crawl snapshot per (host, section): the CC re-crawl dedup
    shape — keep the newest ``warc_ts`` (url desc tie-break) in every
    site section.  Per-batch argmax partials, one-task final merge."""
    ds = _read_corpus(sf_dir, ["url", "warc_ts"])

    def best(df: pd.DataFrame) -> pd.DataFrame:
        host, section = _host_section(df["url"])
        f = pd.DataFrame(
            {"host": host, "section": section, "url": df["url"],
             "warc_ts": df["warc_ts"]}
        )
        f = f.sort_values(["warc_ts", "url"], ascending=[False, False])
        return f.drop_duplicates(["host", "section"], keep="first")

    out = (
        ds.map_batches(best, batch_format="pandas", batch_size=8192)
        .repartition(1)
        .map_batches(best, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    return out.sort_values(["host", "section"]).reset_index(drop=True)


# --------------------------------------------------------- domain_stats


def domain_stats(sf_dir: str) -> pd.DataFrame:
    """Per-domain rollup: page/PDF counts, distinct langs, payload bytes,
    text chars.  Partials are per (host, lang) so the distinct-lang count
    is exact after one bounded merge."""
    ds = _read_corpus(sf_dir, ["url", "html", "text", "lang"])

    def partial(tbl: pa.Table) -> pd.DataFrame:
        urls = tbl.column("url").to_pandas()
        host, _ = _host_section(urls)
        n_bytes = pc.binary_length(tbl.column("html")).to_numpy(
            zero_copy_only=False
        )
        n_chars = pc.utf8_length(
            pc.fill_null(tbl.column("text"), "")
        ).to_numpy(zero_copy_only=False)
        is_pdf = pc.equal(
            pc.binary_slice(tbl.column("html"), 0, 4), b"%PDF"
        ).to_numpy(zero_copy_only=False)
        f = pd.DataFrame(
            {"host": host, "lang": tbl.column("lang").to_pandas(),
             "nb": n_bytes.astype(np.int64), "nc": n_chars.astype(np.int64),
             "pdf": is_pdf.astype(np.int64)}
        )
        # dropna=False: a null lang must still count toward every per-host
        # statistic (the SQL GROUP BY host keeps such rows; only
        # count(DISTINCT lang) ignores the NULL, which nunique matches)
        return f.groupby(["host", "lang"], as_index=False, dropna=False).agg(
            n_pages=("nb", "size"), n_pdf=("pdf", "sum"),
            sum_html_bytes=("nb", "sum"), sum_text_chars=("nc", "sum"),
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["host", "lang"], as_index=False, dropna=False).sum()
        return g.groupby("host", as_index=False).agg(
            n_pages=("n_pages", "sum"), n_pdf=("n_pdf", "sum"),
            n_langs=("lang", "nunique"),
            sum_html_bytes=("sum_html_bytes", "sum"),
            sum_text_chars=("sum_text_chars", "sum"),
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    cols = ["n_pages", "n_pdf", "n_langs", "sum_html_bytes", "sum_text_chars"]
    return (
        out.sort_values("host").reset_index(drop=True).astype({c: "int64" for c in cols})
    )


# ------------------------------------------------------------ pii_scrub


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """PII redaction over page text: per-document match counts (on the
    original text) plus the md5 of the scrubbed text (email → ipv4 →
    phone replacement order, pinned with the SQL oracle).  Map-only."""
    ds = _read_corpus(sf_dir, ["url", "text"])

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        n_emails = t.str.count(EMAIL_PAT).astype(np.int64)
        n_ipv4 = t.str.count(IPV4_PAT).astype(np.int64)
        n_phones = t.str.count(PHONE_PAT).astype(np.int64)
        s = t.str.replace(EMAIL_PAT, "<EMAIL>", regex=True)
        s = s.str.replace(IPV4_PAT, "<IP>", regex=True)
        s = s.str.replace(PHONE_PAT, "<PHONE>", regex=True)
        digests = [
            hashlib.md5(x.encode("utf-8")).hexdigest() for x in s.tolist()
        ]
        return pd.DataFrame(
            {"url": df["url"], "n_emails": n_emails, "n_ipv4": n_ipv4,
             "n_phones": n_phones, "scrubbed_md5": digests}
        )

    return ds.map_batches(scrub, batch_format="pandas", batch_size=2048)


# ------------------------------------------------------ line_repetition


def line_repetition(sf_dir: str) -> rd.Dataset:
    """Gopher-style per-document repetition signals over newline-split
    lines: total / duplicated line and char counts as exact integers
    (ratios are the consumer's division; integers dodge float-parity).
    A document's lines live in its own row → map-only, zero shuffle."""
    ds = _read_corpus(sf_dir, ["url", "text"])

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        lines = df.set_index("url")["text"].fillna("").str.split("\n").explode()
        f = lines[lines != ""].rename("line").reset_index()
        if not len(f):
            return pd.DataFrame(
                {"url": pd.Series(dtype="object"),
                 "n_lines": pd.Series(dtype="int64"),
                 "n_dup_lines": pd.Series(dtype="int64"),
                 "n_chars": pd.Series(dtype="int64"),
                 "n_dup_chars": pd.Series(dtype="int64")}
            )
        g = f.groupby(["url", "line"], sort=False).size().reset_index(name="c")
        chars = g["line"].str.len().to_numpy(np.int64) * g["c"].to_numpy(np.int64)
        dup = (g["c"] > 1).to_numpy()
        agg = pd.DataFrame(
            {"url": g["url"], "n_lines": g["c"].to_numpy(np.int64),
             "n_dup_lines": np.where(dup, g["c"], 0).astype(np.int64),
             "n_chars": chars,
             "n_dup_chars": np.where(dup, chars, 0).astype(np.int64)}
        )
        return agg.groupby("url", as_index=False).sum()

    return ds.map_batches(sig, batch_format="pandas", batch_size=2048)


# ----------------------------------------------------------- line_dedup


def line_dedup(sf_dir: str, min_count: int = 2, min_urls: int = 0) -> rd.Dataset:
    """C4-style corpus-wide duplicate-line census: md5 every non-empty
    line, count total occurrences and distinct documents per digest, keep
    digests with ≥ ``min_count`` occurrences (the removal list a line-
    dedup pass would broadcast).  Only (digest, url, n) partial rows move
    through the coarse 64-way shuffle — never the line text."""
    ds = _read_corpus(sf_dir, ["url", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lines = df.set_index("url")["text"].fillna("").str.split("\n").explode()
        f = lines[lines != ""].rename("line").reset_index()
        if not len(f):
            return pd.DataFrame(
                {"line_md5": pd.Series(dtype="object"),
                 "url": pd.Series(dtype="object"),
                 "n": pd.Series(dtype="int64"),
                 "part": pd.Series(dtype="int64")}
            )
        g = f.groupby(["url", "line"], sort=False).size().reset_index(name="c")
        uniq = g["line"].unique()
        dig = {
            s: hashlib.md5(s.encode("utf-8")).hexdigest() for s in uniq
        }
        md5s = g["line"].map(dig)
        h = pd.util.hash_array(md5s.to_numpy(dtype=object))
        return pd.DataFrame(
            {"line_md5": md5s, "url": g["url"],
             "n": g["c"].to_numpy(np.int64),
             "part": (h % 64).astype("int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        # (line_md5, url) pairs are globally unique (a url's text sits in
        # exactly one input row), so n_urls is a plain row count.
        # nunique, not size: if the pages table ever carries the same url
        # on multiple rows (re-crawl snapshots), its (line_md5, url)
        # partials can arrive once per batch — distinct-count matches the
        # oracle's count(DISTINCT url) regardless of batching
        out = g.groupby("line_md5", as_index=False).agg(
            n_urls=("url", "nunique"), n_total=("n", "sum")
        )
        out = out[out["n_total"] >= min_count]
        # min_urls filter applied INSIDE the reduce so consumers needing
        # only high-document-frequency lines (boilerplate_strip) never
        # pull the full census to the driver
        return out[out["n_urls"] >= min_urls] if min_urls else out

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=2048)
        .groupby("part")
        .map_groups(reduce, batch_format="pandas")
        .select_columns(["line_md5", "n_urls", "n_total"])
    )


# ----------------------------------------------------- boilerplate_strip


def boilerplate_strip(sf_dir: str, min_urls: int = 10) -> rd.Dataset:
    """C4-style boilerplate removal, the consumer of the ``line_dedup``
    census: drop every non-empty line whose digest appears in ≥
    ``min_urls`` distinct documents, keep the rest in original order.

    Two-pass broadcast shape: pass 1 computes the removal set (the
    ``min_urls`` filter runs inside the census reduce, so only the
    high-document-frequency survivors — boilerplate by definition, a
    bounded set for any sane threshold — reach the driver); the set is
    ``ray.put`` ONCE and read from the local object store in every map
    task, never re-shipped per batch.  Pass 2 is map-only.

    Output: (url, n_removed, clean_md5) — the md5 of the cleaned text
    keeps the oracle compare exact without moving full text twice.
    """
    import ray

    census = line_dedup(sf_dir, min_count=2, min_urls=min_urls).to_pandas()
    removal_ref = ray.put(frozenset(census["line_md5"]))

    ds = _read_corpus(sf_dir, ["url", "text"])

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        rset = ray.get(removal_ref)
        lines = (
            df.set_index("url")["text"].fillna("").str.split("\n").explode()
            .rename("line").reset_index()
        )
        uniq = {
            s: hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in lines["line"].unique()
        }
        rm = (lines["line"] != "") & lines["line"].map(uniq).isin(rset)
        n_removed = (
            rm.groupby(lines["url"], sort=False).sum().rename("n_removed")
        )
        clean = (
            lines[~rm].groupby("url", sort=False)["line"].agg("\n".join)
            .rename("clean")
        )
        out = n_removed.to_frame().join(clean).reset_index()
        out["clean"] = out["clean"].fillna("")
        out["clean_md5"] = [
            hashlib.md5(x.encode("utf-8")).hexdigest() for x in out["clean"]
        ]
        return pd.DataFrame(
            {"url": out["url"],
             "n_removed": out["n_removed"].astype(np.int64),
             "clean_md5": out["clean_md5"]}
        )

    return ds.map_batches(strip, batch_format="pandas", batch_size=2048)
