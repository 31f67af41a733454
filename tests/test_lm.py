"""CCNet-style LM family: engine vs serial-oracle parity at sf0.001,
edge-case parity on a hand-built table (empty / letterless / unicode
lowering traps), model caps, and tier-partition invariants."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from latyas_ray.ops import lm
from latyas_ray.oracles import (
    _oracle_ccnet_tiers,
    _oracle_lm_perplexity,
)

SF = "/root/testdata/sf0.001"


def _fresh_cache():
    lm._MODEL_CACHE.clear()


def test_lm_perplexity_matches_oracle(ray_session):
    _fresh_cache()
    eng = (
        lm.lm_perplexity(SF).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    ora = (
        _oracle_lm_perplexity(SF).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # scores are genuinely informative: multiple distinct norms per corpus
    assert eng["norm_micro"].nunique() > 10
    assert (eng["logprob_micro"] <= 0).all()


def test_ccnet_tiers_matches_oracle_and_partitions(ray_session):
    eng = (
        lm.ccnet_tiers(SF)
        .sort_values(["lang", "tier"]).reset_index(drop=True)
    )
    ora = (
        _oracle_ccnet_tiers(SF).to_pandas()
        .sort_values(["lang", "tier"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # tiers partition each language's scored docs: reconcile against the
    # per-doc output
    scores = lm.lm_perplexity(SF).to_pandas()
    docs = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "lang"]
    ).to_pandas()
    per_doc = scores.merge(docs, on="doc_id")
    for lang, g in eng.groupby("lang"):
        scored = int(
            ((per_doc["lang"] == lang) & (per_doc["n_bigrams"] > 0)).sum()
        )
        tiered = int(
            g[g["tier"].isin(["head", "middle", "tail"])]["n_docs"].sum()
        )
        assert tiered == scored, lang
    assert eng["n_docs"].sum() == len(docs)
    assert eng["sum_bigrams"].sum() == per_doc["n_bigrams"].sum()


def test_edge_cases_parity(ray_session, tmp_path):
    """Hand-built table exercising: empty text, null text, letterless
    text, sub-2-token docs, the U+212A KELVIN SIGN lowering trap, \\x1f
    separators, and OOV-only docs (doc_id 1 is outside the seed)."""
    rows = {
        "doc_id": [0, 1, 2, 3, 4, 5, 6, 7, 8],
        "text": [
            "the cat sat on the mat the cat",   # seed doc (id 0)
            "zzz qqq unseen words only",         # OOV-only, non-seed
            "",                                   # empty
            None,                                 # null
            "123 456 !!!",                        # letterless
            "word",                               # single token
            "Kelvin Know",              # KELVIN SIGN trap
            "a\x1fb c\x1fd",                      # 0x1f is a separator char
            "The CAT sat",                        # case folding
        ],
        "lang": ["en"] * 9,
    }
    d = tmp_path / "edge"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    sf = str(d)
    _fresh_cache()
    eng = (
        lm.lm_perplexity(sf).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    ora = (
        _oracle_lm_perplexity(sf).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    by_id = eng.set_index("doc_id")
    assert by_id.loc[2, "n_bigrams"] == 0 and by_id.loc[2, "norm_micro"] == 0
    assert by_id.loc[3, "n_bigrams"] == 0
    assert by_id.loc[4, "n_bigrams"] == 0
    assert by_id.loc[5, "n_bigrams"] == 0
    # "Kelvin Know": ASCII letter runs are elvin/now -> 1 bigram
    assert by_id.loc[6, "n_bigrams"] == 1
    # "a\x1fb c\x1fd" -> tokens a,b,c,d -> 3 bigrams
    assert by_id.loc[7, "n_bigrams"] == 3
    te = lm.ccnet_tiers(sf).sort_values(["lang", "tier"]).reset_index(drop=True)
    to = (
        _oracle_ccnet_tiers(sf).to_pandas()
        .sort_values(["lang", "tier"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(te, to, check_dtype=False)
    assert set(te["tier"]) >= {"unscored"}
    _fresh_cache()


def test_model_caps_and_total_scoring(ray_session):
    """Capped model: vocab/pair tables honor the caps, and scoring stays
    a TOTAL function (every bigram gets the fallback, no misses)."""
    _fresh_cache()
    small = lm.build_model(SF, vocab_cap=5, pair_cap=10)
    assert len(small.vocab_sorted) == 5
    assert small.v_total == 6
    assert len(small.pair_keys) == 10
    assert len(small.fallback) == small.v_total
    # pair keys are unique + ascending (searchsorted contract)
    assert (np.diff(small.pair_keys) > 0).all()
    scored = lm._scored_ds(SF, small).to_pandas()
    full = lm.lm_perplexity(SF).to_pandas()
    m = scored.merge(full, on="doc_id", suffixes=("_s", "_f"))
    # same tokenizer -> identical bigram counts under any model
    assert (m["n_bigrams_s"] == m["n_bigrams_f"]).all()
    # capped model scores strictly lower or equal total prob mass
    assert (scored["logprob_micro"] <= 0).all()
    _fresh_cache()


def test_qlog_micro_pinned():
    # floor(x + 0.5) half-up, single-quotient formulation
    assert lm._qlog_micro(1, 1) == 0
    assert lm._qlog_micro(1, 2) == -693147
    assert lm._qlog_micro(2, 1) == 693147


def test_dsir_weights_matches_oracle_and_discriminates(ray_session):
    """Engine vs independent serial oracle at sf0.001; the weight must
    actually discriminate: English docs (the target slice) score higher
    on average than non-English ones, and a tokenless doc scores 0."""
    from latyas_ray.oracles import _oracle_dsir_weights

    out = (
        lm.dsir_weights(SF).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    exp = _oracle_dsir_weights(SF).to_pandas()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)

    docs = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "lang"]
    ).to_pandas()
    m = out.merge(docs, on="doc_id")
    scored = m[m["n_features"] > 0]
    en = scored[scored["lang"] == lm.DSIR_TARGET_LANG]["dsir_logw_micro"]
    rest = scored[scored["lang"] != lm.DSIR_TARGET_LANG]["dsir_logw_micro"]
    assert en.mean() > rest.mean()
    assert (out.loc[out["n_features"] == 0, "dsir_logw_micro"] == 0).all()


def test_dsir_weights_batch_invariance(ray_session, tmp_path):
    """Bit-identical output across batch boundaries (the integer-exact
    contract): tiny batches vs one batch over a hand-built table."""
    t = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": ["alpha beta gamma", "alpha beta", "", "gamma gamma gamma",
                 "x", "alpha beta gamma delta", "beta", "delta delta"],
        "lang": ["en", "en", "en", "de", "de", "en", "fr", "de"],
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    a = (
        lm.dsir_weights(str(tmp_path)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    import latyas_ray.ops.common as common
    import ray.data as rd

    orig = common.read_table
    try:
        common.read_table = lambda sf_dir, name, columns=None: (
            rd.read_parquet(
                os.path.join(sf_dir, f"{name}.parquet"), columns=columns,
                override_num_blocks=8,
            )
        )
        lm_read = lm.read_table
        lm.read_table = common.read_table
        b = (
            lm.dsir_weights(str(tmp_path)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
    finally:
        common.read_table = orig
        lm.read_table = lm_read
    pd.testing.assert_frame_equal(a, b)


def test_dsir_resample_matches_oracle_and_is_weighted(ray_session):
    """Engine vs serial oracle at sf0.001; Gumbel-top-k must actually
    favor high-weight docs: the kept set's mean weight exceeds the
    corpus mean, and the selection is deterministic across runs."""
    from latyas_ray.oracles import _oracle_dsir_resample

    out = lm.dsir_resample(SF)
    exp = _oracle_dsir_resample(SF).to_pandas()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp, check_dtype=False
    )
    assert len(out) == lm.DSIR_RESAMPLE_K
    w = lm.dsir_weights(SF).to_pandas()
    assert out["dsir_logw_micro"].mean() > w["dsir_logw_micro"].mean()
    again = lm.dsir_resample(SF)
    pd.testing.assert_frame_equal(out, again)


def test_token_budget_mix_matches_greedy_prefix(ray_session):
    """The distributed histogram/refine/tie cutoff must equal the plain
    greedy rule: order eligible docs by (norm desc, doc_id asc), keep
    while the inclusive bigram cumsum stays within total // 3 — computed
    here straight off the serial lm_perplexity oracle snapshot, blind to
    the engine's bucket machinery."""
    snap = _oracle_lm_perplexity(SF).to_pandas()
    el = (
        snap[snap["n_bigrams"] > 0]
        .sort_values(["norm_micro", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    budget = int(el["n_bigrams"].sum()) // lm.TBM_BUDGET_DEN
    el["keep"] = (el["n_bigrams"].cumsum() <= budget).astype("int64")
    exp = (
        el[["doc_id", "norm_micro", "n_bigrams", "keep"]]
        .sort_values("doc_id").reset_index(drop=True)
    )
    eng = (
        lm.token_budget_mix(SF).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng, exp, check_dtype=False)
    # the cut is real: something kept, something dropped, and the best
    # dropped doc would not fit
    kept_cost = int(eng.loc[eng["keep"] == 1, "n_bigrams"].sum())
    assert 0 < kept_cost <= budget
    dropped = el[el["keep"] == 0]
    assert len(dropped) > 0
    assert kept_cost + int(dropped["n_bigrams"].iloc[0]) > budget


def test_token_budget_mix_explicit_budgets(ray_session):
    """Degenerate budgets exercise the all-keep and none-keep branches
    (no boundary bucket / cut before the first tie)."""
    big = lm.token_budget_mix(SF, budget=2**60).to_pandas()
    assert (big["keep"] == 1).all()
    zero = lm.token_budget_mix(SF, budget=0).to_pandas()
    assert (zero["keep"] == 0).all()
    assert len(big) == len(zero)
