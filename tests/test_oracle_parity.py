"""Driver-mimic correctness gate: run every ``queries()`` entry that has an
``oracle_sql()`` and compare against DuckDB exactly the way the driver
does (schema + row count + order-insensitive values).

Ops queries run on the real testdata at sf0.01.  Extraction queries run on
the synthetic corpus at sf0.001 (same mechanism, smaller scale) with the
golden paths rewritten accordingly.
"""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="session")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(res):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, ray_df, sql_df):
    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=name)


OPS_QUERIES = [
    "doc_stats_by_lang", "token_counts", "quality_stats", "top_docs",
    "dedup_exact", "ann_topk", "embedding_neardup", "events_window_counts",
    "sessionize", "lineitem_pricing_summary", "orders_by_nation",
    # round-2 additions (plain SQL oracles)
    "quality_filter", "chars_percentiles_by_lang", "word_counts",
    "sample_stratified", "sample_bernoulli",
    "knn_label_vote", "events_top_users_by_value", "events_props_rollup",
    "contamination_check", "ngram_jaccard",
    # corpus-facing M8 pipeline vs its serial snapshot
    "latex_normalize",
    # serial-oracle snapshot queries (latyas_ray/oracles.py)
    "lang_id", "doc_fingerprints", "minhash_dedup", "simhash_fingerprints",
    "simhash_neardup", "ann_topk_ivf", "embedding_neardup_ivf",
    "embedding_kmeans", "media_features", "media_resize",
    "video_frame_features", "tsr_assemble", "tsr_tables_csv",
    "texmix_recognize",
    # round-3 additions
    "semantic_reflow",
    # web-corpus curation (independent SQL over the corpus shards)
    "latest_snapshot", "domain_stats", "pii_scrub", "line_repetition",
    "line_dedup", "boilerplate_strip", "gopher_quality",
    "gopher_repetition", "c4_quality", "dup_span_census",
    "quality_funnel", "attribution_asof", "events_nearby_counts",
    "dup_span_stats",
    # round-4 additions: training export (plain SQL) + CCNet LM family
    # (serial-oracle snapshots)
    "shard_export", "pack_sequences", "lm_perplexity", "ccnet_tiers",
    "dup_span_removal", "url_filter", "dsir_weights", "outlink_stats",
    "curation_pipeline", "contamination_scrub", "dsir_resample",
    "token_budget_mix", "domain_mixture", "host_pagerank",
    "host_two_hop", "tier_extraction", "host_components",
    "anchor_text_stats", "host_components_fast",
    # round-5 co-partitioned membership modes (same oracles as the
    # broadcast-mode base ops)
    "boilerplate_strip_joined", "curation_pipeline_joined",
    "dup_span_stats_joined", "dup_span_removal_joined",
    # round-5 keeper election (SQL window-function derivation over the
    # minhash cluster snapshot) + redirect-shell gate
    "minhash_keep_best", "meta_refresh",
    # previously only driver-verified: every queries() entry now has a
    # LOCAL parity row too (texmix_markdown also builds its sf0.01
    # snapshot before test_every_oracle_sql_parses EXPLAINs its path)
    "texmix_markdown", "parts_by_brand", "events_hopping_counts",
    "top_suppliers_by_revenue", "customers_by_region",
]


@pytest.mark.parametrize("name", OPS_QUERIES)
def test_ops_query_matches_oracle(entry_mod, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    ray_df = _to_pandas(q(SF_DIR))
    sql_df = con.execute(sql).fetchdf()
    _compare(name, ray_df, sql_df)


def test_extraction_queries_match_golden(entry_mod, con):
    """Same mechanism as the driver, at sf0.001: distributed pipeline vs
    serial-oracle golden snapshot read by DuckDB."""
    from latyas_ray.golden import ensure_golden, golden_paths

    sf = "sf0.001"
    sf_dir = f"/root/testdata/{sf}"
    ensure_golden(sf)
    gp, rp = golden_paths(sf)
    gp01, rp01 = golden_paths("sf0.01")

    for name in ("extract_pipeline", "extract_regions"):
        sql = entry_mod.oracle_sql()[name].replace(gp01, gp).replace(rp01, rp)
        ray_df = _to_pandas(entry_mod.queries()[name](sf_dir))
        sql_df = con.execute(sql).fetchdf()
        _compare(name, ray_df, sql_df)


def test_every_query_has_an_oracle(entry_mod):
    """Round-2 invariant: every ``queries()`` entry has an ``oracle_sql()``
    entry (no more rows-only checks on the driver scoreboard)."""
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert q == o, f"missing oracles: {sorted(q - o)}; stale: {sorted(o - q)}"


def test_every_oracle_sql_parses(entry_mod, con):
    """r2 shipped a parse error in an oracle string (trailing CTE comma in
    ngram_jaccard) that only the driver caught.  EXPLAIN every oracle_sql()
    entry so a string refactor can never ship a syntax error again.

    Golden-snapshot paths are rewritten from sf0.01 to the sf0.001 golden
    (built by the extraction parity test) so EXPLAIN can bind read_parquet
    schemas without paying for the sf0.01 serial oracle."""
    from latyas_ray.golden import ensure_golden, golden_paths

    from latyas_ray.ops.webtext import corpus_glob

    ensure_golden("sf0.001")
    gp, rp = golden_paths("sf0.001")
    gp01, rp01 = golden_paths("sf0.01")
    for name, sql in entry_mod.oracle_sql().items():
        sql = sql.replace(gp01, gp).replace(rp01, rp)
        sql = sql.replace(corpus_glob("sf0.01"), corpus_glob("sf0.001"))
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as exc:  # pragma: no cover - failure message only
            raise AssertionError(f"oracle_sql[{name}] does not parse: {exc}")


def test_entry_smoke(entry_mod):
    ds = entry_mod.entry()
    df = _to_pandas(ds)
    assert len(df) == 1000
    assert "extracted_text" in df.columns and "checksum" in df.columns
