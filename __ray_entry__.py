"""Driver contract for the latyas_ray engine.

``entry()`` runs the flagship extraction pipeline on the sf0.001 synthetic
corpus; ``queries()`` exposes every implemented operator/pipeline;
``oracle_sql()`` gives the DuckDB-verifiable subset.  Ray is initialised
by the driver BEFORE import — nothing here calls ``ray.init`` /
``ray.shutdown``.

Every query has an oracle.  Extraction queries are verified against the
*serial oracle's* golden snapshot (built once into /tmp and read by
DuckDB via ``read_parquet``) — the driver's hash compare is then exactly
the "distributed pipeline ≡ serial oracle, byte-identical per url"
invariant.  Ops over the testdata tables are verified against plain ANSI
SQL on the pre-registered views where SQL can express the op; the rest
(minhash clusters, simhash, lang-id, IVF-ANN, k-means, fingerprints,
media stages, latex normalization) are verified against serial-oracle
parquet snapshots (``latyas_ray/oracles.py`` — independent pure-Python
reimplementations) read by DuckDB, the same mechanism as the extraction
golden.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from latyas_ray.corpus import ensure_corpus_for_sf, sf_label_from_dir
from latyas_ray.golden import ensure_golden, golden_paths
from latyas_ray.oracles import ensure_oracle, oracle_path
from latyas_ray.ops import dedup as _dedup
from latyas_ray.ops import events as _events
from latyas_ray.ops import export as _export
from latyas_ray.ops import lm as _lm
from latyas_ray.ops import relational as _relational
from latyas_ray.ops import similarity as _similarity
from latyas_ray.ops import textstats as _textstats
from latyas_ray.ops import webtext as _webtext
from latyas_ray.pipelines.extract_pipeline import extract_dataset, read_pages

_EXTRACT_COLUMNS = [
    "url", "payload_kind", "text_source", "n_regions", "extracted_text", "checksum",
]


def _extract_ds(sf_dir: str):
    sf = sf_label_from_dir(sf_dir)
    corpus = ensure_corpus_for_sf(sf)
    return extract_dataset(read_pages(corpus), batch_size=32,
                           use_actors=True, concurrency=(1, 8))


def _q_extract_pipeline(sf_dir: str):
    ensure_golden(sf_label_from_dir(sf_dir))  # build the oracle side too
    return _extract_ds(sf_dir).select_columns(_EXTRACT_COLUMNS)


def _q_extract_regions(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from latyas_ray.golden import GOLDEN_REGIONS_SCHEMA

    ensure_golden(sf_label_from_dir(sf_dir))

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized list-of-struct explode: flatten once, repeat the url
        # by parent index — no per-row Python loop (ADVICE r3 #6)
        regions = batch.column("regions").combine_chunks()
        flat = pc.list_flatten(regions)
        urls = pc.take(
            batch.column("url"), pc.list_parent_indices(regions)
        )
        return pa.table(
            {
                "url": urls,
                "region_id": pc.struct_field(flat, "region_id"),
                "kind": pc.struct_field(flat, "kind"),
                "order_idx": pc.struct_field(flat, "order"),
                "page": pc.struct_field(flat, "page"),
                "char_start": pc.struct_field(flat, "char_start"),
                "char_end": pc.struct_field(flat, "char_end"),
            },
            schema=GOLDEN_REGIONS_SCHEMA,
        )

    return _extract_ds(sf_dir).select_columns(["url", "regions"]).map_batches(
        explode, batch_format="pyarrow"
    )


def _is_golden_dir(sf_dir: str) -> bool:
    """True only for a directory actually NAMED after the correctness
    scale factor — ``sf_label_from_dir``'s fallback maps *any* unknown
    dir to sf0.01, and building the cached oracle snapshot from a foreign
    directory's parquet would poison later verification runs."""
    import os

    return os.path.basename(os.path.normpath(sf_dir)) == _GOLDEN_SF


def _oracled(name: str, fn: Callable[[str], Any]) -> Callable[[str], Any]:
    """Wrap an op query so its serial-oracle snapshot is (re)built before
    the distributed run whenever the driver's correctness scale factor is
    in play — the same golden-snapshot mechanism ``extract_pipeline``
    uses.  (simhash_neardup passes ``name="simhash_fingerprints"``: its
    SQL is a self-join over the fingerprint snapshot.)"""

    def q(sf_dir: str):
        if _is_golden_dir(sf_dir):
            ensure_oracle(sf_dir, _GOLDEN_SF, name)
        return fn(sf_dir)

    return q


def _q_latex_normalize(sf_dir: str):
    from latyas_ray.pipelines.extract_pipeline import latex_normalize_dataset

    sf = sf_label_from_dir(sf_dir)
    corpus = ensure_corpus_for_sf(sf)
    if sf == _GOLDEN_SF:
        ensure_oracle(sf_dir, _GOLDEN_SF, "latex_normalize")
    return latex_normalize_dataset(corpus)


def _materialized_extract(sf_dir: str) -> str:
    """Run the DISTRIBUTED extraction once per (sf, extractor, corpus)
    and cache the parquet under /tmp — downstream queries (semantic
    reflow) consume the materialized flagship output the way a real
    multi-stage job would, instead of re-extracting the corpus inside
    every consumer (VERDICT r3 #7: the re-extract variant paid ~45 s of
    extraction per correctness run)."""
    import json
    import os
    import shutil

    from latyas_ray import EXTRACTOR_VERSION
    from latyas_ray.corpus import CORPUS_VERSION

    sf = sf_label_from_dir(sf_dir)
    d = f"/tmp/latyas_ray/extract_cache/{sf}"
    marker = os.path.join(d, "_SUCCESS.json")
    params = {"version": EXTRACTOR_VERSION, "corpus": CORPUS_VERSION, "sf": sf}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == params:
                    return d
        except Exception:
            pass
    # build into a process-private tmp dir and publish with one atomic
    # rename (the run_partition pattern): two concurrent cold starts
    # would otherwise both write_parquet into the SAME dir and leave a
    # union of both jobs' files (every row twice) under a valid marker
    tmp = f"{d}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    _extract_ds(sf_dir).write_parquet(tmp)
    with open(os.path.join(tmp, "_SUCCESS.json"), "w") as f:
        json.dump(params, f)
    shutil.rmtree(d, ignore_errors=True)
    try:
        os.replace(tmp, d)
    except OSError:
        # lost the publish race to a concurrent builder — its cache is
        # equivalent (same params); keep it and drop ours
        shutil.rmtree(tmp, ignore_errors=True)
    return d


def _q_semantic_reflow(sf_dir: str):
    """A9 semantic reflow: NSP-gated reading-order refinement over the
    extraction output (actor-pool stage; digest scorer stands in for
    BertForNextSentencePrediction — see functions/semantic_reflow.py)."""
    import ray.data as rd

    from latyas_ray.pipelines.semantic_pipeline import semantic_reflow_dataset

    if _is_golden_dir(sf_dir):
        ensure_oracle(sf_dir, _GOLDEN_SF, "semantic_reflow")
    return semantic_reflow_dataset(
        rd.read_parquet(
            _materialized_extract(sf_dir),
            columns=["url", "extracted_text", "regions"],
        )
    )


def entry() -> Any:
    """Flagship: synth corpus at sf0.001 → streaming extraction pipeline."""
    corpus = ensure_corpus_for_sf("sf0.001")
    return extract_dataset(read_pages(corpus), batch_size=32,
                           use_actors=True, concurrency=(1, 8))


def queries() -> dict[str, Callable[[str], Any]]:
    """Dict ORDER is load-bearing: the driver verifies the first 50
    entries.  Policy: every query sits inside the window for at least
    one round before anything else may displace it; the tail (entries
    51+) holds only queries that were driver-green in ≥2 prior rounds
    AND are redundant with an in-window query of the same shape (the
    simple relational/events/sampling rows — their operators are also
    exercised by the in-window joins/windows).  VERDICT r3 #1."""
    return {
        # extraction pipelines (verified vs serial-oracle golden snapshot)
        "extract_pipeline": _q_extract_pipeline,
        "extract_regions": _q_extract_regions,
        "latex_normalize": _q_latex_normalize,
        "semantic_reflow": _q_semantic_reflow,
        # TexMix composite mixed text+equation stage (A7) and TATR
        # table-structure assembly (A12) — round-3 flagships, never
        # driver-verified before this round
        "texmix_recognize": _q_texmix,
        "tsr_assemble": _q_tsr_assemble,
        "tsr_tables_csv": _q_tsr_tables_csv,
        # multimodal plumbing (stubbed decode, real Ray stages) — green
        # r2, dropped out of the window in r3
        "media_features": _q_media_features,
        # the round's namesake capstone: curation gate × host-authority
        # tier (in-window: new this round, never driver-verified;
        # displaces 3×-green doc_stats_by_lang, whose partial-agg
        # rollup shape stays in-window via domain_stats)
        "tier_extraction": _webtext.tier_extraction,
        # round-4 token-budget head extraction (in-window: never
        # driver-verified; displaces 3-round-green token_counts, whose
        # per-doc tokenization shape stays in-window via quality_funnel
        # and doc_stats_by_lang)
        "token_budget_mix": _oracled("lm_perplexity", _lm.token_budget_mix),
        # CCNet-style LM scoring + tiering (new this round — in-window;
        # they displace 3-round-green chars_percentiles_by_lang, whose
        # exact-percentile shape ccnet_tiers itself exercises, and
        # simhash_fingerprints, a strict subset of in-window
        # simhash_neardup's pipeline)
        "lm_perplexity": _oracled("lm_perplexity", _lm.lm_perplexity),
        "ccnet_tiers": _oracled("ccnet_tiers", _lm.ccnet_tiers),
        # round-4 DSIR importance weights (in-window: never
        # driver-verified; displaces 3-round-green
        # lineitem_pricing_summary, whose partial-agg-rollup shape stays
        # covered in-window by doc_stats_by_lang / domain_stats)
        "dsir_weights": _oracled("dsir_weights", _lm.dsir_weights),
        # web-corpus curation over the CC-shaped pages table (independent
        # DuckDB SQL oracles over the same parquet shards)
        "domain_stats": _webtext.domain_stats,
        # round-4 alpha-sampling mixture plan (in-window: never
        # driver-verified; displaces 2-round-green quality_filter, whose
        # threshold-gate shape stays in-window via gopher_quality /
        # c4_quality)
        "domain_mixture": _webtext.domain_mixture,
        # round-4 link-graph rollup over the html channel (in-window:
        # never driver-verified; displaces 3-round-green dedup_exact,
        # whose coarse-hash-shuffle dedup shape is embedded in in-window
        # minhash_dedup's exact-collapse stage)
        "outlink_stats": _webtext.outlink_stats,
        # round-4 iterative centrality over the host link graph
        # (in-window: never driver-verified; displaces 2-round-green
        # orders_by_nation — the broadcast-join shape stays in-window
        # via attribution_asof and the rule-table joins inside
        # curation_pipeline)
        "host_pagerank": _webtext.host_pagerank,
        # two-hop reach + reciprocity over the same host graph — the
        # module's one distributed hash self-join (in-window: new this
        # round, never driver-verified; displaces 2×-green
        # contamination_check, whose broadcast-shingle shape is a strict
        # subset of in-window contamination_scrub)
        "host_two_hop": _webtext.host_two_hop,
        # connected components of the undirected host graph — the
        # module's one iterate-to-fixpoint label propagation (in-window:
        # new this round, never driver-verified; displaces 2×-green
        # doc_fingerprints, whose rolling-hash map shape is a strict
        # subset of in-window dup_span_census's window pass)
        "host_components": _webtext.host_components,
        # pointer-jump variant of host_components — same fixpoint output,
        # a measured 2.25-3.4× round reduction (constant-factor, not
        # logarithmic).  In-window: VERDICT r4 #4 — the ONE query that
        # had never had a driver CORRECTNESS row (tail from birth);
        # displaces its own shape-sibling slot (see the tail rotations
        # at the joined-mode block above).
        "host_components_fast": _webtext.host_components_fast,
        # per-destination-host anchor-text rollup with a distributed
        # mode/argmax (in-window: new this round, never driver-verified;
        # displaces 2×-green simhash_neardup, whose banded-LSH
        # bucket-and-verify shape stays in-window via minhash_dedup)
        "anchor_text_stats": _webtext.anchor_text_stats,
        # round-4 stage-1 URL gate (in-window: never driver-verified; it
        # displaces 2-round-green embedding_neardup — the exact baseline
        # (blocked distributed pair join since r5) whose sub-quadratic
        # path, in-window embedding_neardup_ivf, computes the same pair
        # set)
        "url_filter": _webtext.url_filter,
        "pii_scrub": _webtext.pii_scrub,
        "line_dedup": _webtext.line_dedup,
        "boilerplate_strip": _webtext.boilerplate_strip,
        # round-5 co-partitioned (joined) membership modes — VERDICT r4
        # #1's 100-TB blocker fix.  Each is the SAME op under the SAME
        # SQL oracle with mode="joined": the candidate/removal/keeper
        # set never broadcasts, probes cogroup with their one part
        # slice, verdicts cogroup back with the documents by url part.
        # In-window: never driver-verified (new this round); they
        # displace media_resize + video_frame_features (2×-green; their
        # actor-pool stub-decode shape stays in-window via
        # media_features), lang_id (3×-green; map-only per-doc heuristic
        # shape stays via gopher_quality / c4_quality), latest_snapshot
        # (2×-green; partial-argmax rollup shape stays via domain_stats)
        # and line_repetition (2×-green; map-only line shape stays via
        # c4_quality).
        "boilerplate_strip_joined": _q_boilerplate_strip_joined,
        "curation_pipeline_joined": _q_curation_pipeline_joined,
        "dup_span_stats_joined": _q_dup_span_stats_joined,
        "dup_span_removal_joined": _q_dup_span_removal_joined,
        "gopher_quality": _webtext.gopher_quality,
        "gopher_repetition": _webtext.gopher_repetition,
        "c4_quality": _webtext.c4_quality,
        # round-5 redirect-shell gate over the html channel (in-window:
        # new this round, never driver-verified; displaces 2×-green
        # dup_span_census, whose lead-window md5 machinery is stage 1 of
        # in-window dup_span_stats and dup_span_removal)
        "meta_refresh": _webtext.meta_refresh,
        "dup_span_stats": _webtext.dup_span_stats,
        # round-4 removal counterpart to the census (in-window: never
        # driver-verified; it displaces 2-round-green ann_topk, whose
        # broadcast brute-force scoring is a strict subset of in-window
        # ann_topk_ivf's pipeline)
        "dup_span_removal": _webtext.dup_span_removal,
        "quality_funnel": _webtext.quality_funnel,
        # round-4 end-to-end curation composite (in-window: never
        # driver-verified; displaces 2-round-green knn_label_vote, whose
        # broadcast-matmul scoring shape is in-window via ann_topk_ivf)
        "curation_pipeline": _webtext.curation_pipeline,
        # round-4 training-export ops (in-window: never driver-verified;
        # they displace 3-round-green quality_stats/word_counts, whose
        # shapes stay covered by token_counts/doc_stats_by_lang)
        "shard_export": _export.shard_export,
        "pack_sequences": _export.pack_sequences,
        # dedup family
        "minhash_dedup": _oracled("minhash_dedup", _dedup.minhash_dedup),
        # round-5 keeper election over the same clusters (in-window: new
        # this round, never driver-verified; displaces 2×-green
        # ngram_jaccard, whose broadcast-shingle pair scoring is a strict
        # subset of in-window contamination_scrub's machinery).  Oracle:
        # an independent SQL window-function derivation over the minhash
        # cluster snapshot + the documents view.
        "minhash_keep_best": _oracled(
            "minhash_dedup", _dedup.minhash_keep_best
        ),
        # round-4 decontamination removal (in-window: never
        # driver-verified; displaces 3-round-green events_window_counts,
        # whose tumbling bucket-count is embedded in in-window
        # events_nearby_counts' bucket-replication machinery)
        "contamination_scrub": _dedup.contamination_scrub,
        # similarity search over embeddings
        "ann_topk_ivf": _oracled("ann_topk_ivf", _similarity.ann_topk_ivf),
        "embedding_neardup_ivf": _oracled(
            "embedding_neardup_ivf", _similarity.embedding_neardup_ivf
        ),
        "embedding_kmeans": _oracled("embedding_kmeans", _similarity.embedding_kmeans),
        # stream-shaped ops over events (the two custom-join shapes Ray
        # Data lacks natively stay in-window; the plain tumbling/rollup
        # rows rotate to the tail; sessionize — 2× green, its
        # coarse-hash + per-partition sort/diff shape embedded in
        # attribution_asof — rotates out for dsir_resample)
        "attribution_asof": _events.attribution_asof,
        "events_nearby_counts": _events.events_nearby_counts,
        # dsir_resample completes the DSIR recipe (Gumbel-top-k
        # importance resampling over in-window dsir_weights); in-window:
        # never driver-verified — displaces 2×-green sessionize
        "dsir_resample": _oracled("dsir_resample", _lm.dsir_resample),
        # relational patterns (partial agg; the broadcast-join sibling
        # orders_by_nation rotated to the tail for host_pagerank)
        "parts_by_brand": _relational.parts_by_brand,
        # entry #50 — the round-4 addition takes the window's last slot
        "texmix_markdown": _q_texmix_markdown,
        # ---- tail: entries 51+ are OUTSIDE the driver's verification
        # window this round (all green in ≥2 prior rounds; shapes
        # redundant with in-window queries: quality_stats/word_counts ≡
        # token_counts/doc_stats_by_lang, top-k sort ≡ top_suppliers
        # in-window history, hash-sampling ≡ lang-stratified history,
        # hopping ≡ tumbling, rollup ≡ props rollup history, 2/3-way
        # broadcast joins ≡ orders_by_nation; late-round rotations —
        # ann_topk/embedding_neardup/knn_label_vote's broadcast-matmul
        # scoring ≡ in-window ann_topk_ivf / embedding_neardup_ivf,
        # dedup_exact's coarse-hash dedup ≡ minhash_dedup's
        # exact-collapse stage, lineitem partial-agg ≡
        # doc_stats_by_lang/domain_stats) ----
        "sessionize": _events.sessionize,
        # rotated out for minhash_keep_best (2×+ green; its broadcast
        # pair-scoring shape is a strict subset of in-window
        # contamination_scrub's shingle machinery)
        "ngram_jaccard": _dedup.ngram_jaccard,
        # rotated out for meta_refresh (2× green; its lead-window md5
        # census is stage 1 of in-window dup_span_stats/removal)
        "dup_span_census": _webtext.dup_span_census,
        # rotated out for tier_extraction (3× green; partial-agg rollup
        # shape covered in-window by domain_stats / quality_funnel)
        "doc_stats_by_lang": _textstats.doc_stats_by_lang,
        # rotated out for host_two_hop (2× green; its broadcast-shingle
        # shape is a strict subset of in-window contamination_scrub)
        "contamination_check": _dedup.contamination_check,
        # rotated out for host_components (2× green; rolling-hash map
        # shape subsumed by in-window dup_span_census's window pass)
        "doc_fingerprints": _oracled("doc_fingerprints", _textstats.doc_fingerprints),
        # rotated out for anchor_text_stats (2× green; its banded-LSH
        # bucket-and-verify shape stays in-window via minhash_dedup;
        # its SQL oracle is an all-pairs popcount self-join over the
        # FINGERPRINT snapshot, so it depends on that snapshot)
        "simhash_neardup": _oracled("simhash_fingerprints", _dedup.simhash_neardup),
        # rotated out for the round-5 joined-mode block (all ≥2× green;
        # shapes redundant with in-window queries — media_resize /
        # video_frame_features' actor-pool stub-decode ≡ in-window
        # media_features, lang_id's map-only per-doc heuristic ≡
        # gopher_quality / c4_quality, latest_snapshot's partial-argmax
        # rollup ≡ domain_stats, line_repetition's map-only line shape ≡
        # c4_quality)
        "media_resize": _q_media_resize,
        "video_frame_features": _q_video_frames,
        "lang_id": _oracled("lang_id", _textstats.lang_id),
        "latest_snapshot": _webtext.latest_snapshot,
        "line_repetition": _webtext.line_repetition,
        # rotated out for host_pagerank (2× green; broadcast-join shape
        # covered in-window — see the displacement note at host_pagerank)
        "orders_by_nation": _relational.orders_by_nation,
        # rotated out for the round-4 mixture ops (token_counts 3×
        # green, quality_filter 2× green; shapes covered in-window —
        # see the displacement notes at their replacements)
        "token_counts": _textstats.token_counts,
        "quality_filter": _textstats.quality_filter,
        "top_docs": _textstats.top_docs,
        "ann_topk": _similarity.ann_topk,
        "embedding_neardup": _similarity.embedding_neardup_pairs,
        "dedup_exact": _dedup.dedup_exact,
        "knn_label_vote": _similarity.knn_label_vote,
        "events_window_counts": _events.events_window_counts,
        "lineitem_pricing_summary": _relational.lineitem_pricing_summary,
        "quality_stats": _textstats.quality_stats,
        "word_counts": _textstats.word_counts,
        "chars_percentiles_by_lang": _textstats.chars_percentiles_by_lang,
        "simhash_fingerprints": _oracled(
            "simhash_fingerprints", _dedup.simhash_fingerprints
        ),
        "sample_stratified": _textstats.sample_stratified,
        "sample_bernoulli": _textstats.sample_bernoulli,
        "events_hopping_counts": _events.events_hopping_counts,
        "events_top_users_by_value": _events.events_top_users_by_value,
        "events_props_rollup": _events.events_props_rollup,
        "top_suppliers_by_revenue": _relational.top_suppliers_by_revenue,
        "customers_by_region": _relational.customers_by_region,
    }


def _q_boilerplate_strip_joined(sf_dir: str):
    """boilerplate_strip under the co-partitioned membership mode
    (VERDICT r4 #1): identical rows and oracle, zero broadcast."""
    return _webtext.boilerplate_strip(sf_dir, mode="joined")


def _q_curation_pipeline_joined(sf_dir: str):
    """curation_pipeline with the keeper election co-partitioned."""
    return _webtext.curation_pipeline(sf_dir, mode="joined")


def _q_dup_span_stats_joined(sf_dir: str):
    """dup_span_stats with candidates + per-url counts co-partitioned."""
    return _webtext.dup_span_stats(sf_dir, mode="joined")


def _q_dup_span_removal_joined(sf_dir: str):
    """dup_span_removal with candidates + removal set co-partitioned."""
    return _webtext.dup_span_removal(sf_dir, mode="joined")


def _q_texmix(sf_dir: str):
    from latyas_ray.pipelines.texmix_pipeline import texmix_recognize

    if _is_golden_dir(sf_dir):
        ensure_oracle(sf_dir, _GOLDEN_SF, "texmix_recognize")
    return texmix_recognize(sf_dir)


def _q_texmix_markdown(sf_dir: str):
    from latyas_ray.pipelines.texmix_pipeline import texmix_markdown

    if _is_golden_dir(sf_dir):
        ensure_oracle(sf_dir, _GOLDEN_SF, "texmix_markdown")
    return texmix_markdown(sf_dir)


def _q_tsr_assemble(sf_dir: str):
    from latyas_ray.pipelines.tsr_pipeline import tsr_assemble_cells

    if _is_golden_dir(sf_dir):
        ensure_oracle(sf_dir, _GOLDEN_SF, "tsr_assemble")
    return tsr_assemble_cells(sf_dir)


def _q_tsr_tables_csv(sf_dir: str):
    from latyas_ray.pipelines.tsr_pipeline import tsr_serialize

    if _is_golden_dir(sf_dir):
        ensure_oracle(sf_dir, _GOLDEN_SF, "tsr_tables_csv")
    return tsr_serialize(sf_dir, fmt="csv")


def _q_media_features(sf_dir: str):
    from latyas_ray.ops.multimodal import generate_media_table, media_features

    path = generate_media_table("/tmp/latyas_ray/media/media.parquet", n_rows=200)
    ensure_oracle(sf_dir, _GOLDEN_SF, "media_features")
    return media_features(path).select_columns(["media_id", "media_type", "decoded"])


def _q_media_resize(sf_dir: str):
    from latyas_ray.ops.multimodal import generate_media_table, media_resize

    path = generate_media_table("/tmp/latyas_ray/media/media.parquet", n_rows=200)
    ensure_oracle(sf_dir, _GOLDEN_SF, "media_resize")
    return media_resize(path)


def _q_video_frames(sf_dir: str):
    from latyas_ray.ops.multimodal import generate_video_table, video_frame_features

    path = generate_video_table("/tmp/latyas_ray/media/video.parquet", n_rows=60)
    ensure_oracle(sf_dir, _GOLDEN_SF, "video_frame_features")
    return video_frame_features(path).select_columns(
        ["media_id", "frame_idx", "ts_sec"]
    )


_GOLDEN_SF = "sf0.01"  # the driver's correctness scale factor


def _shingle_cte(where: str = "") -> str:
    """The word-3-gram shingle CTE shared by the ngram_jaccard and
    contamination_check oracles — ONE definition, so it can't drift from
    the Python shingle kernel in only one of them.  Emits CTEs ``w``
    (whitespace words) and ``sh`` (distinct shingle strings; <3 words →
    one whole-text shingle).  No trailing comma — callers join CTE
    fragments explicitly (a trailing comma shipped a parse error in r2)."""
    return (
        f"w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS words "
        f"FROM documents {where}), "
        "sh AS (SELECT doc_id, list_distinct(CASE "
        "WHEN len(words) = 0 THEN CAST([] AS VARCHAR[]) "
        "WHEN len(words) < 3 THEN [array_to_string(words, ' ')] "
        "ELSE [array_to_string(words[i:i+2], ' ') "
        "FOR i IN range(1, len(words) - 1)] END) AS s FROM w)"
    )


def _gopher_repetition_sql() -> str:
    """Independent n-gram recompute of ``gopher_repetition``: one
    list-slice subquery chain per n (2–10) over the same parquet shards.
    N-gram identity is the INJECTIVE length-prefixed token key
    (``length(tok) || ':' || tok`` concatenated — ``span_key`` in
    ``ops/webtext.py``; a separator join would collide on tokens that
    contain the separator, which the corpus carries since /7), and its
    token chars are the explicit per-token length sum; every counter is
    CAST to BIGINT so the driver hash compare is bit-exact."""
    from latyas_ray.ops.webtext import (
        GOPHER_DUP_NGRAM_CAPS,
        GOPHER_TOP_NGRAM_CAPS,
    )

    # Linear construction: exploded (url, position, token) rows, then
    # lead(w, k) windows — NEVER unnest-with-the-list-in-tow (a row per
    # start position carrying the whole toks list is quadratic in doc
    # length; the megabyte docs of the 'giant' family made that version
    # effectively hang).  lead() is NULL only at the partition tail, so
    # "last joined token IS NOT NULL" is exactly "window fits in doc",
    # and '||' NULL-propagation keeps partial windows out of g{n}.
    leads = ", ".join(
        f"lead(w, {k}) OVER (PARTITION BY url ORDER BY i) AS w{k}"
        for k in range(1, 10)
    )
    ctes = [
        "d AS (SELECT url, coalesce(text, '') AS text "
        f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}'))",
        "t AS (SELECT url, regexp_extract_all(text, '\\S+') AS toks FROM d)",
        "wp AS MATERIALIZED (SELECT url, unnest(toks) AS w, "
        "generate_subscripts(toks, 1) AS i FROM t)",
        "wa AS (SELECT url, CAST(sum(length(w)) AS BIGINT) AS swc "
        "FROM wp GROUP BY url)",
        f"wo AS MATERIALIZED (SELECT url, w, {leads} FROM wp)",
    ]
    sel = ["d.url", "coalesce(wa.swc, 0) AS sum_word_chars"]
    joins = ["LEFT JOIN wa USING (url)"]
    rules = []
    for n in range(2, 11):
        col = f"top{n}_chars" if n <= 4 else f"dup{n}_chars"
        agg = (
            "max(c * nch)"
            if n <= 4
            else "sum(CASE WHEN c >= 2 THEN c * nch ELSE 0 END)"
        )
        cols = ["w"] + [f"w{k}" for k in range(1, n)]
        ng = " || ".join(f"length({c}) || ':' || {c}" for c in cols)
        lensum = " + ".join(f"length({c})" for c in cols)
        ctes.append(
            f"g{n} AS (SELECT url, {ng} AS ng, {lensum} AS nch FROM wo "
            f"WHERE w{n - 1} IS NOT NULL)"
        )
        ctes.append(
            # nch is functionally dependent on ng (the key decodes to its
            # tokens), so max() just surfaces the per-group constant
            f"c{n} AS (SELECT url, ng, count(*) AS c, "
            f"max(nch) AS nch FROM g{n} GROUP BY url, ng)"
        )
        ctes.append(
            f"a{n} AS (SELECT url, CAST({agg} AS BIGINT) AS v "
            f"FROM c{n} GROUP BY url)"
        )
        sel.append(f"coalesce(a{n}.v, 0) AS {col}")
        joins.append(f"LEFT JOIN a{n} USING (url)")
        cap = (GOPHER_TOP_NGRAM_CAPS if n <= 4 else GOPHER_DUP_NGRAM_CAPS)[n]
        rules.append(
            f"100 * coalesce(a{n}.v, 0) <= {cap} * coalesce(wa.swc, 0)"
        )
    sel.append(
        "CAST(CASE WHEN " + " AND ".join(rules)
        + " THEN 1 ELSE 0 END AS BIGINT) AS passes_repetition"
    )
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT " + ", ".join(sel)
        + " FROM d " + " ".join(joins)
    )


def _span_window_ctes(w: int, keep_pos: bool = False) -> str:
    """The shared lead()-window md5 span-identity construction (one
    window per token position, NULL-propagating '||' keeps partial
    windows out of ``gm``).  ONE definition: ``_dup_span_sql``,
    ``_dup_span_stats_sql`` and ``_dup_span_removal_sql`` must agree on
    what a span IS, so the CTE chain ending in ``gm(url, span_md5)``
    lives here.  ``keep_pos`` threads the window's start token index
    through as ``gm.i`` (the removal oracle expands windows back into
    covered token positions; the census/stats oracles don't need it)."""
    leads = ", ".join(
        f"lead(w, {k}) OVER (PARTITION BY url ORDER BY i) AS w{k}"
        for k in range(1, w)
    )
    cols = ["w"] + [f"w{k}" for k in range(1, w)]
    ng = " || ".join(f"length({c}) || ':' || {c}" for c in cols)
    pos = "i, " if keep_pos else ""
    return (
        "WITH d AS (SELECT url, coalesce(text, '') AS text "
        f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
        "t AS (SELECT url, regexp_extract_all(text, '\\S+') AS toks FROM d), "
        "wp AS (SELECT url, unnest(toks) AS w, "
        "generate_subscripts(toks, 1) AS i FROM t), "
        f"wo AS (SELECT url, {pos}w, {leads} FROM wp), "
        f"gm AS (SELECT url, {pos}md5({ng}) AS span_md5 FROM wo "
        f"WHERE w{w - 1} IS NOT NULL)"
    )


def _dup_span_sql(w: int = 10, min_urls: int = 2) -> str:
    """Independent recompute of ``dup_span_census`` over the shared span
    identity: the window is ``md5`` of the length-prefixed token key —
    matching the op's PUBLIC key, not its internal cheap-hash prefilter,
    so the two sides share only the pinned tokenizer + join + md5."""
    return (
        _span_window_ctes(w)
        + ", c AS (SELECT span_md5, CAST(count(DISTINCT url) AS BIGINT) "
        "AS n_urls, CAST(count(*) AS BIGINT) AS n_total "
        "FROM gm GROUP BY span_md5) "
        f"SELECT span_md5, n_urls, n_total FROM c WHERE n_urls >= {min_urls}"
    )


def _dup_span_stats_sql(w: int = 10, min_urls: int = 2) -> str:
    """Independent recompute of ``dup_span_stats``: the shared span
    identity, then per-url window counts with a HAVING-count census
    subquery — blind to the engine's candidate-prefilter +
    broadcast-dict shape."""
    return (
        _span_window_ctes(w)
        + ", cen AS (SELECT span_md5 FROM gm GROUP BY span_md5 "
        f"HAVING count(DISTINCT url) >= {min_urls}), "
        "wu AS (SELECT url, CAST(count(*) AS BIGINT) AS n_windows, "
        "CAST(count(*) FILTER (span_md5 IN (SELECT span_md5 FROM cen)) "
        "AS BIGINT) AS n_dup_windows FROM gm GROUP BY url) "
        "SELECT d.url, coalesce(wu.n_windows, 0) AS n_windows, "
        "coalesce(wu.n_dup_windows, 0) AS n_dup_windows "
        "FROM d LEFT JOIN wu USING (url)"
    )


def _contamination_scrub_sql(n_benchmark: int = 10) -> str:
    """Independent recompute of ``contamination_scrub``: the shared
    shingle CTE for the benchmark set (string identity — blind to the
    engine's blake2b/mix hashing), POSITIONAL shingles via lockstep
    unnest comprehensions (generate_series cannot take lateral column
    args), cover expansion, ordered filtered string_agg rebuild.  The
    shingle width is pinned to the op's ``SHINGLE_K`` (the window-range
    comprehensions and `_shingle_cte`'s bench strings are 3-gram forms;
    a parameterized k here would silently diverge from them)."""
    from latyas_ray.ops.dedup import SHINGLE_K

    k = SHINGLE_K
    last = k - 1
    return (
        "WITH " + _shingle_cte()
        + f", bench AS (SELECT list_distinct(flatten(list(s))) AS bs "
        f"FROM sh WHERE doc_id < {n_benchmark}), "
        "ps AS (SELECT doc_id, "
        "unnest([i FOR i IN range(1, len(words) - 1)]) AS i, "
        f"unnest([array_to_string(words[i:i+{last}], ' ') "
        "FOR i IN range(1, len(words) - 1)]) AS s "
        f"FROM w WHERE len(words) >= {k}), "
        "shrt AS (SELECT doc_id, array_to_string(words, ' ') AS s, "
        f"len(words) AS nw FROM w WHERE len(words) BETWEEN 1 AND {last}), "
        "hitp AS (SELECT doc_id, i FROM ps, bench "
        "WHERE list_contains(bench.bs, ps.s)), "
        "cov AS (SELECT DISTINCT doc_id, i + gs.generate_series AS j "
        f"FROM hitp, generate_series(0, {last}) gs "
        "UNION SELECT shrt.doc_id, gs2.generate_series AS j "
        f"FROM shrt, bench, generate_series(1, {last}) gs2 "
        "WHERE list_contains(bench.bs, shrt.s) "
        "AND gs2.generate_series <= shrt.nw), "
        "wp AS (SELECT doc_id, unnest(words) AS wd, "
        "generate_subscripts(words, 1) AS i FROM w), "
        "ka AS (SELECT wp.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(count(*) FILTER (cov.j IS NOT NULL) AS BIGINT) AS n_removed, "
        "md5(coalesce(string_agg(wp.wd, ' ' ORDER BY wp.i) "
        "FILTER (cov.j IS NULL), '')) AS clean_md5 "
        "FROM wp LEFT JOIN cov ON cov.doc_id = wp.doc_id AND cov.j = wp.i "
        "GROUP BY wp.doc_id) "
        "SELECT d.doc_id, coalesce(ka.n_tokens, 0) AS n_tokens, "
        "coalesce(ka.n_removed, 0) AS n_removed, "
        "coalesce(ka.clean_md5, md5('')) AS clean_md5 "
        "FROM documents d LEFT JOIN ka USING (doc_id)"
    )


def _meta_refresh_sql() -> str:
    """Independent recompute of ``meta_refresh``: DuckDB ``decode()``
    over the hex-magic-gated html channel, ``regexp_extract`` with the
    SAME pinned pattern (first match on both sides), split_part target
    host parse.  The delay clamps at the op's pinned cap — expressed on
    the digit STRING (>15 significant digits ⇔ value ≥ 10^15) so the
    BIGINT cast can never overflow where the engine's min() doesn't."""
    from latyas_ray.ops.webtext import (
        META_REFRESH_DELAY_CAP,
        META_REFRESH_HEAD_CHARS,
        META_REFRESH_RE,
    )

    pat = META_REFRESH_RE.replace(chr(39), chr(39) * 2)
    cap = META_REFRESH_DELAY_CAP
    delay = (
        "CASE WHEN ltrim(delay_s, '0') = '' THEN 0 "
        f"WHEN length(ltrim(delay_s, '0')) > 15 THEN {cap} "
        "ELSE CAST(delay_s AS BIGINT) END"
    )
    return (
        "WITH d AS (SELECT url, CASE WHEN substr(hex(html), 1, 8) = "
        "'25504446' THEN NULL ELSE "
        f"substr(decode(html), 1, {META_REFRESH_HEAD_CHARS}) END AS h "
        f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
        "m AS (SELECT url, split_part(split_part(url, '://', 2), '/', 1) "
        "AS host, "
        f"CASE WHEN h IS NOT NULL AND regexp_matches(h, '{pat}') "
        "THEN 1 ELSE 0 END AS has_refresh, "
        f"regexp_extract(h, '{pat}', 1) AS delay_s, "
        f"regexp_extract(h, '{pat}', 2) AS tgt FROM d), "
        "t AS (SELECT url, host, has_refresh, "
        f"CASE WHEN has_refresh = 1 THEN {delay} "
        "ELSE -1 END AS refresh_delay, "
        "CASE WHEN has_refresh = 1 THEN tgt ELSE '' END AS target_url "
        "FROM m), "
        "e AS (SELECT *, CASE WHEN target_url LIKE 'http://%' OR "
        "target_url LIKE 'https://%' THEN "
        "split_part(split_part(target_url, '://', 2), '/', 1) "
        "ELSE '' END AS target_host FROM t) "
        "SELECT url, host, CAST(has_refresh AS BIGINT) AS has_refresh, "
        "refresh_delay, target_url, target_host, "
        "CAST(CASE WHEN target_host <> '' AND target_host <> host "
        "THEN 1 ELSE 0 END AS BIGINT) AS is_external FROM e"
    )


def _outlink_stats_sql() -> str:
    """Independent recompute of ``outlink_stats``: DuckDB ``decode()``
    over the hex-magic-gated html channel (exact — every non-PDF corpus
    payload is valid utf-8, a pinned corpus invariant), unnested
    ``regexp_extract_all`` hrefs, split_part target-host parse."""
    from latyas_ray.ops.webtext import OUTLINK_HREF_RE

    return (
        "WITH d AS (SELECT url, CASE WHEN substr(hex(html), 1, 8) = "
        "'25504446' THEN NULL ELSE decode(html) END AS h "
        f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
        "p AS (SELECT split_part(split_part(url, '://', 2), '/', 1) "
        "AS host, h FROM d), "
        "l AS (SELECT host, unnest(regexp_extract_all(h, "
        f"'{OUTLINK_HREF_RE.replace(chr(39), chr(39) * 2)}', 1)) AS href "
        "FROM p WHERE h IS NOT NULL), "
        "le AS (SELECT host, href, CASE WHEN (href LIKE 'http://%' OR "
        "href LIKE 'https://%') AND "
        "split_part(split_part(href, '://', 2), '/', 1) <> host "
        "THEN 1 ELSE 0 END AS ext FROM l), "
        "la AS (SELECT host, CAST(count(*) AS BIGINT) AS n_links, "
        "CAST(sum(ext) AS BIGINT) AS n_external_links, "
        "CAST(count(DISTINCT href) AS BIGINT) AS n_distinct_hrefs "
        "FROM le GROUP BY host), "
        "pg AS (SELECT host, CAST(count(*) AS BIGINT) AS n_pages, "
        "CAST(count(h) AS BIGINT) AS n_html_pages FROM p GROUP BY host) "
        "SELECT pg.host, n_pages, n_html_pages, "
        "coalesce(n_links, 0) AS n_links, "
        "coalesce(n_external_links, 0) AS n_external_links, "
        "coalesce(n_distinct_hrefs, 0) AS n_distinct_hrefs "
        "FROM pg LEFT JOIN la USING (host)"
    )


def _host_edges_ctes() -> str:
    """The shared host-graph edge construction — decode the html
    channel (PDF rows masked by the %PDF hex magic), extract hrefs with
    the op's own pattern, keep scheme-absolute external links whose
    target is a corpus host, distinct (src, dst) — as a WITH prefix
    ending at the ``e`` (edges) and ``od`` (outdegree) CTEs.  One home
    for `_host_pagerank_sql` and the `host_two_hop` oracle."""
    from latyas_ray.ops.webtext import OUTLINK_HREF_RE

    href = OUTLINK_HREF_RE.replace("'", "''")
    th = "split_part(split_part(href, '://', 2), '/', 1)"
    return (
        "WITH d AS (SELECT url, CASE WHEN substr(hex(html), 1, 8) = "
        "'25504446' THEN NULL ELSE decode(html) END AS h "
        f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
        "p AS (SELECT split_part(split_part(url, '://', 2), '/', 1) "
        "AS host, h FROM d), "
        "hosts AS (SELECT DISTINCT host FROM p), "
        "l AS (SELECT host AS src, unnest(regexp_extract_all(h, "
        f"'{href}', 1)) AS href FROM p WHERE h IS NOT NULL), "
        f"e AS (SELECT DISTINCT src, {th} AS dst FROM l "
        "WHERE (href LIKE 'http://%' OR href LIKE 'https://%') "
        f"AND {th} <> src "
        f"AND {th} IN (SELECT host FROM hosts)), "
        "od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e "
        "GROUP BY src)"
    )


def _host_pagerank_sql() -> str:
    """Independent recompute of ``host_pagerank``: the same decode/href
    edge construction as the outlink oracle, then the fixed-iteration
    integer recurrence as a GENERATED chain of join/group CTEs — plain
    window-free SQL, blind to the engine's sharded-rank-blob machinery.
    Every constant is imported from the op's module (one home)."""
    from latyas_ray.ops.webtext import (
        PAGERANK_DAMP_DEN,
        PAGERANK_DAMP_NUM,
        PAGERANK_ITERS,
        PAGERANK_SCALE,
        PAGERANK_TELEPORT,
    )

    sql = (
        _host_edges_ctes()
        + f", r0 AS (SELECT host, CAST({PAGERANK_SCALE} AS BIGINT) AS r "
        "FROM hosts)"
    )
    for k in range(1, PAGERANK_ITERS + 1):
        sql += (
            f", r{k} AS (SELECT hs.host, CAST({PAGERANK_TELEPORT} + "
            "coalesce(c.s, 0) AS BIGINT) AS r FROM hosts hs LEFT JOIN ("
            f"SELECT e.dst AS host, sum((r.r * {PAGERANK_DAMP_NUM} "
            f"// {PAGERANK_DAMP_DEN}) // od.outdeg) AS s "
            f"FROM e JOIN r{k - 1} r ON r.host = e.src "
            "JOIN od ON od.src = e.src GROUP BY e.dst) c "
            "ON c.host = hs.host)"
        )
    sql += (
        " SELECT hs.host, coalesce(od.outdeg, 0) AS n_out_hosts, "
        f"rf.r AS rank_micro FROM hosts hs "
        f"JOIN r{PAGERANK_ITERS} rf ON rf.host = hs.host "
        "LEFT JOIN od ON od.src = hs.host"
    )
    return sql


def _host_two_hop_sql() -> str:
    """Independent recompute of ``host_two_hop``: the shared edge CTEs,
    then plain self-joins — distinct two-hop targets via e1.dst =
    e2.src, reciprocal partners via the reversed-pair join — blind to
    the engine's co-partitioned merge and tagged-union rollup."""
    return (
        _host_edges_ctes()
        + ", two AS (SELECT e1.src AS host, "
        "CAST(count(DISTINCT e2.dst) AS BIGINT) AS n_two_hop "
        "FROM e e1 JOIN e e2 ON e2.src = e1.dst GROUP BY e1.src), "
        "rec AS (SELECT e1.src AS host, "
        "CAST(count(*) AS BIGINT) AS n_reciprocal "
        "FROM e e1 JOIN e e2 ON e2.src = e1.dst AND e2.dst = e1.src "
        "GROUP BY e1.src) "
        "SELECT od.src AS host, od.outdeg AS n_out_hosts, "
        "coalesce(two.n_two_hop, 0) AS n_two_hop, "
        "coalesce(rec.n_reciprocal, 0) AS n_reciprocal "
        "FROM od LEFT JOIN two ON two.host = od.src "
        "LEFT JOIN rec ON rec.host = od.src"
    )


def _host_components_sql() -> str:
    """Independent recompute of ``host_components``: the shared edge
    CTEs, an undirected view (both directions of every edge), then the
    fixed-iteration min-label recurrence as a GENERATED chain of
    join/group CTEs — `least(own, min over neighbors)` per round, the
    exact pinned semantics — blind to the engine's sharded-label-blob
    iteration and early fixpoint exit (idempotent extra rounds make the
    two iteration counts equivalent).  Labels are
    ``md5_number_lower(host)`` (the module's pinned host identity);
    only the representative's NAME and the component size reach the
    compare."""
    from latyas_ray.ops.webtext import COMPONENTS_ITERS

    return _host_components_sql_rounds(COMPONENTS_ITERS)


def _host_components_sql_rounds(rounds: int) -> str:
    """The generated plain-propagation chain with an explicit round
    count: `_host_components_sql` passes the engine's COMPONENTS_ITERS
    (exact-round parity at ANY convergence state); the fast variant's
    oracle passes FAST_ORACLE_UNROLL, since the hop recurrence only
    matches plain at the fixpoint and plain may need more rounds than
    the engine's proof took (extra rounds are idempotent)."""
    # MATERIALIZED is load-bearing: DuckDB's default inlining
    # re-expands the (ue, l_{k-1}) references per level — the 10-round
    # chain took 12.6 s and a 40-round chain did not finish in 500 s;
    # materialized, 40 rounds run in under a second.  The self-loop
    # per host folds the own-label term into the same min so each
    # round references its predecessor exactly once even inlined.
    sql = (
        _host_edges_ctes()
        + ", ue AS MATERIALIZED (SELECT src AS a, dst AS b FROM e "
        "UNION ALL SELECT dst AS a, src AS b FROM e "
        "UNION ALL SELECT host AS a, host AS b FROM hosts), "
        "l0 AS (SELECT host, md5_number_lower(host) AS lab FROM hosts)"
    )
    for k in range(1, rounds + 1):
        sql += (
            f", l{k} AS MATERIALIZED (SELECT ue.b AS host, "
            f"min(l.lab) AS lab "
            f"FROM ue JOIN l{k - 1} l ON l.host = ue.a GROUP BY ue.b)"
        )
    lf = f"l{rounds}"
    sql += (
        f", sz AS (SELECT lab, CAST(count(*) AS BIGINT) "
        f"AS component_size FROM {lf} GROUP BY lab) "
        f"SELECT f.host, r.host AS component_host, s.component_size "
        f"FROM {lf} f JOIN l0 r ON r.lab = f.lab "
        "JOIN sz s ON s.lab = f.lab"
    )
    return sql


def _anchor_text_stats_sql() -> str:
    """Independent recompute of ``anchor_text_stats``: the shared
    decode/host CTEs, anchor PAIRS via two lockstep ``unnest``s of the
    same generated pattern (groups 1 and 2 stay aligned), the same
    qualifying-link rule inline, then plain GROUP BYs and a
    row_number() mode with the pinned ``n DESC, atext ASC`` tie-break —
    blind to the engine's distinct-pair partials and coarse dst-keyed
    exchange."""
    from latyas_ray.ops.webtext import ANCHOR_PAIR_RE

    pat = ANCHOR_PAIR_RE.replace("'", "''")
    th = "split_part(split_part(href, '://', 2), '/', 1)"
    return (
        "WITH d AS (SELECT url, CASE WHEN substr(hex(html), 1, 8) = "
        "'25504446' THEN NULL ELSE decode(html) END AS h "
        f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
        "p AS (SELECT split_part(split_part(url, '://', 2), '/', 1) "
        "AS host, h FROM d), "
        "hosts AS (SELECT DISTINCT host FROM p), "
        "l AS (SELECT host AS src, "
        f"unnest(regexp_extract_all(h, '{pat}', 1)) AS href, "
        f"unnest(regexp_extract_all(h, '{pat}', 2)) AS atext "
        "FROM p WHERE h IS NOT NULL), "
        f"q AS (SELECT {th} AS dst, atext FROM l "
        "WHERE (href LIKE 'http://%' OR href LIKE 'https://%') "
        f"AND {th} <> src AND {th} IN (SELECT host FROM hosts)), "
        "c AS (SELECT dst, atext, CAST(count(*) AS BIGINT) AS n "
        "FROM q GROUP BY dst, atext), "
        "a AS (SELECT dst, CAST(sum(n) AS BIGINT) AS n_anchor_refs, "
        "CAST(count(*) AS BIGINT) AS n_distinct_anchor_texts "
        "FROM c GROUP BY dst), "
        "t AS (SELECT dst, atext, n, row_number() OVER ("
        "PARTITION BY dst ORDER BY n DESC, atext ASC) AS rk FROM c) "
        "SELECT a.dst AS host, a.n_anchor_refs, "
        "a.n_distinct_anchor_texts, t.atext AS top_anchor_text, "
        "t.n AS top_anchor_count "
        "FROM a JOIN t ON t.dst = a.dst AND t.rk = 1"
    )


def _url_filter_sql() -> str:
    """Independent recompute of ``url_filter`` with DuckDB's
    ``split_part`` url parsing (the host/section semantics every webtext
    oracle pins); the blocklist CASE and banned-segment IN list are
    generated from the op's own constants — one home, no drift."""
    cases = " ".join(
        f"WHEN '{h}' THEN '{c}'"
        for h, c in sorted(_webtext.URL_BLOCKLIST.items())
    )
    segs = ", ".join(f"'{s}'" for s in _webtext.URL_BANNED_SEGMENTS)
    return (
        "WITH d AS (SELECT url, "
        "split_part(split_part(url, '://', 2), '/', 1) AS host, "
        "split_part(split_part(url, '://', 2), '/', 2) AS section "
        f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
        f"f AS (SELECT url, host, CASE host {cases} ELSE '' END "
        "AS block_category, section FROM d) "
        "SELECT url, host, block_category, "
        "CAST(block_category <> '' AS BIGINT) AS host_blocked, "
        f"CAST(section IN ({segs}) AS BIGINT) AS path_flagged, "
        "CAST(block_category = '' "
        f"AND section NOT IN ({segs}) AS BIGINT) AS keep "
        "FROM f"
    )


def _dup_span_removal_sql(w: int = 10, min_urls: int = 2) -> str:
    """Independent recompute of ``dup_span_removal``: shared span
    identity WITH positions, census via HAVING, duplicated windows
    expanded back into covered token indices (``generate_series`` cross
    join + DISTINCT — overlapping windows cover a token once), then a
    per-url rebuild of the surviving text with an ordered filtered
    ``string_agg`` — blind to the engine's cheap-hash prefilter, sharded
    md5 set, and diff-array cover mask."""
    return (
        _span_window_ctes(w, keep_pos=True)
        + ", cen AS (SELECT span_md5 FROM gm GROUP BY span_md5 "
        f"HAVING count(DISTINCT url) >= {min_urls}), "
        "dw AS (SELECT url, i FROM gm "
        "WHERE span_md5 IN (SELECT span_md5 FROM cen)), "
        "cov AS (SELECT DISTINCT url, i + gs.generate_series AS j "
        f"FROM dw, generate_series(0, {w - 1}) gs), "
        "ka AS (SELECT wp.url, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(count(*) FILTER (cov.j IS NOT NULL) AS BIGINT) AS n_removed, "
        "md5(coalesce(string_agg(wp.w, ' ' ORDER BY wp.i) "
        "FILTER (cov.j IS NULL), '')) AS clean_md5 "
        "FROM wp LEFT JOIN cov ON cov.url = wp.url AND cov.j = wp.i "
        "GROUP BY wp.url) "
        "SELECT d.url, coalesce(ka.n_tokens, 0) AS n_tokens, "
        "coalesce(ka.n_removed, 0) AS n_removed, "
        "coalesce(ka.clean_md5, md5('')) AS clean_md5 "
        "FROM d LEFT JOIN ka USING (url)"
    )


def oracle_sql() -> dict[str, str]:
    golden, golden_regions = golden_paths(_GOLDEN_SF)
    oracles = {
        "extract_pipeline": (
            "SELECT url, payload_kind, text_source, n_regions, extracted_text, "
            f"checksum FROM read_parquet('{golden}')"
        ),
        "extract_regions": (
            "SELECT url, region_id, kind, order_idx, page, char_start, char_end "
            f"FROM read_parquet('{golden_regions}')"
        ),
        "doc_stats_by_lang": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "CAST(max(n_chars) AS BIGINT) AS max_chars, "
            "CAST(min(n_chars) AS BIGINT) AS min_chars "
            "FROM documents GROUP BY lang"
        ),
        "token_counts": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) "
            "AS BIGINT) AS n_tokens_bpe "
            "FROM documents"
        ),
        "quality_stats": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_text, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha, "
            "CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit, "
            "CAST(len(regexp_extract_all(text, '\\s')) AS BIGINT) AS n_space, "
            "CAST(length(text) - len(regexp_extract_all(text, '[A-Za-z]')) "
            "- len(regexp_extract_all(text, '[0-9]')) "
            "- len(regexp_extract_all(text, '\\s')) AS BIGINT) AS n_other "
            "FROM documents"
        ),
        "top_docs": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 20"
        ),
        "sample_bernoulli": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, "
            "CAST(n_chars AS BIGINT) AS n_chars FROM documents "
            "WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < "
            f"'{(10 * (16 ** 8)) // 100:08x}'"
        ),
        "sample_stratified": (
            "SELECT lang, doc_id, sample_key FROM ("
            "SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, "
            "md5(CAST(doc_id AS VARCHAR)) AS sample_key, "
            "row_number() OVER (PARTITION BY lang "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 50"
        ),
        "dedup_exact": (
            "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, "
            "CAST(count(*) AS BIGINT) AS n_dups FROM documents GROUP BY text"
        ),
        "ngram_jaccard": (
            "WITH pairs AS (SELECT 2*i AS a, 2*i+1 AS b FROM range(0, 50) t(i)), "
            + _shingle_cte("WHERE doc_id < 100") +
            " SELECT CAST(p.a AS BIGINT) AS a, CAST(p.b AS BIGINT) AS b, "
            "round(CASE WHEN len(sa.s) = 0 AND len(sb.s) = 0 THEN 1.0 "
            "ELSE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) "
            "/ len(list_distinct(sa.s || sb.s)) END, 6) AS jaccard "
            "FROM pairs p JOIN sh sa ON sa.doc_id = p.a "
            "JOIN sh sb ON sb.doc_id = p.b"
        ),
        "contamination_check": (
            "WITH " + _shingle_cte() +
            ", bench AS (SELECT list_distinct(flatten(list(s))) AS bs "
            "FROM sh WHERE doc_id < 10) "
            "SELECT sh.doc_id, "
            "CAST(len(list_intersect(sh.s, b.bs)) AS BIGINT) AS n_shared, "
            "len(list_intersect(sh.s, b.bs)) >= 10 AS contaminated "
            "FROM sh CROSS JOIN bench b"
        ),
        "contamination_scrub": _contamination_scrub_sql(),
        "ann_topk": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 5), "
            "sims AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, "
            "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(n.embedding AS DOUBLE[])), 6) AS sim "
            "FROM q CROSS JOIN embeddings n WHERE n.vec_id <> q.vec_id), "
            "ranked AS (SELECT query_id, neighbor_id, "
            "row_number() OVER (PARTITION BY query_id "
            "ORDER BY sim DESC, neighbor_id) AS rnk FROM sims) "
            'SELECT query_id, CAST(rnk AS BIGINT) AS "rank", neighbor_id '
            "FROM ranked WHERE rnk <= 10"
        ),
        "embedding_neardup": (
            "SELECT a.vec_id AS a, b.vec_id AS b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) >= 0.5"
        ),
        "events_window_counts": (
            "SELECT event_type, date_trunc('hour', ts) AS window_start, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
        "events_hopping_counts": (
            "SELECT event_type, CAST(u AS TIMESTAMP) AS window_start, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events, UNNEST(["
            "to_timestamp(floor(epoch(ts)/1800)*1800), "
            "to_timestamp(floor(epoch(ts)/1800)*1800 - 1800)]) AS t(u) "
            "GROUP BY event_type, u"
        ),
        # attribution_asof: running-max window recompute — the click side
        # contributes NULL on purchase rows, so max() over the (ts,
        # event_id)-ordered frame is exactly "latest click at or before"
        "attribution_asof": (
            "WITH e AS (SELECT event_id, user_id, ts, event_type "
            "FROM events WHERE event_type IN ('click', 'purchase')), "
            "w AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "event_type, "
            "max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c "
            "FROM e) "
            "SELECT event_id, user_id, ts_us, "
            "CAST(coalesce(c, -1) AS BIGINT) AS click_ts_us, "
            "CAST(CASE WHEN c IS NULL THEN -1 ELSE ts_us - c END AS BIGINT) "
            "AS gap_us FROM w WHERE event_type = 'purchase'"
        ),
        # events_nearby_counts: direct interval self-join recompute —
        # blind to the engine's bucket-replication co-location strategy
        "events_nearby_counts": (
            "SELECT a.event_id, CAST(count(*) - 1 AS BIGINT) AS n_nearby "
            "FROM events a JOIN events b "
            "ON epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 60000000 "
            "AND epoch_us(a.ts) + 60000000 "
            "GROUP BY a.event_id"
        ),
        "sessionize": (
            "WITH d AS (SELECT user_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
            "AS new_s FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, "
            "CAST(count(*) AS BIGINT) AS n_events FROM d GROUP BY user_id"
        ),
        "lineitem_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_base_cents "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_by_nation": (
            "SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "top_suppliers_by_revenue": (
            "WITH r AS (SELECT l_suppkey, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_c100 FROM lineitem GROUP BY l_suppkey) "
            "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, "
            "revenue_c100 FROM r JOIN supplier ON s_suppkey = l_suppkey "
            "ORDER BY revenue_c100 DESC, s_suppkey LIMIT 10"
        ),
        "customers_by_region": (
            "SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "parts_by_brand": (
            "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_retail_cents FROM part GROUP BY p_brand"
        ),
        "quality_filter": (
            "WITH base AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_words, "
            "CAST(length(text) - len(regexp_extract_all(text, '\\s')) AS BIGINT) "
            "AS char_sum, "
            "CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha "
            "FROM documents), "
            "g AS (SELECT doc_id, n_words, "
            "CASE WHEN n_words > 0 THEN (100 * char_sum) // n_words ELSE 0 END "
            "AS mean_word_len_c100, "
            "CASE WHEN n_chars > 0 THEN (100 * n_alpha) // n_chars ELSE 0 END "
            "AS alpha_ratio_c100 FROM base) "
            "SELECT doc_id, n_words, mean_word_len_c100, alpha_ratio_c100, "
            "(n_words >= 15 AND n_words <= 100000 "
            "AND mean_word_len_c100 >= 150 AND mean_word_len_c100 <= 1200 "
            "AND alpha_ratio_c100 >= 50) AS passes FROM g"
        ),
        "word_counts": (
            "WITH w AS (SELECT unnest(regexp_extract_all(text, '\\S+')) "
            "AS word FROM documents), "
            "c AS (SELECT word, count(*) AS n FROM w GROUP BY word) "
            "SELECT word, CAST(n AS BIGINT) AS n FROM c "
            "ORDER BY n DESC, word LIMIT 100"
        ),
        "chars_percentiles_by_lang": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars, "
            "CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_chars "
            "FROM documents GROUP BY lang"
        ),
        "knn_label_vote": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 5), "
            "sims AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, "
            "n.label AS label, "
            "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(n.embedding AS DOUBLE[])), 6) AS sim "
            "FROM q CROSS JOIN embeddings n WHERE n.vec_id <> q.vec_id), "
            "ranked AS (SELECT query_id, label, row_number() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk "
            "FROM sims), "
            "votes AS (SELECT query_id, label, count(*) AS n FROM ranked "
            "WHERE rnk <= 10 GROUP BY query_id, label), "
            "win AS (SELECT query_id, label, row_number() OVER "
            "(PARTITION BY query_id ORDER BY n DESC, label) AS r FROM votes) "
            "SELECT query_id, CAST(label AS BIGINT) AS pred_label "
            "FROM win WHERE r = 1"
        ),
        "events_top_users_by_value": (
            "WITH totals AS (SELECT event_type, user_id, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS total_cents FROM events GROUP BY event_type, user_id), "
            "ranked AS (SELECT event_type, user_id, total_cents, "
            "row_number() OVER (PARTITION BY event_type "
            "ORDER BY total_cents DESC, user_id) AS rnk FROM totals) "
            'SELECT event_type, CAST(rnk AS BIGINT) AS "rank", user_id, '
            "total_cents FROM ranked WHERE rnk <= 3"
        ),
        "events_props_rollup": (
            "WITH e AS (SELECT event_type, "
            "CAST(COALESCE(NULLIF(regexp_extract(props, "
            "'\"k\":\\s*(-?\\d+)', 1), ''), '0') AS BIGINT) AS k FROM events) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(k) AS BIGINT) AS sum_k, CAST(min(k) AS BIGINT) AS min_k, "
            "CAST(max(k) AS BIGINT) AS max_k FROM e GROUP BY event_type"
        ),
        # --- serial-oracle snapshots (latyas_ray/oracles.py): the SQL side
        # reads an independently-computed serial result, the same mechanism
        # as the extraction golden ---
        "latex_normalize": (
            "SELECT url, eq_idx, raw, katex "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'latex_normalize')}')"
        ),
        "semantic_reflow": (
            "SELECT url, page, region_id, sem_order "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'semantic_reflow')}')"
        ),
        # --- web-corpus curation: INDEPENDENT SQL over the same corpus
        # parquet shards the Ray ops read (no serial snapshot in the loop);
        # string semantics pinned in ops/webtext.py ---
        "latest_snapshot": (
            "WITH p AS (SELECT split_part(split_part(url, '://', 2), '/', 1)"
            " AS host, split_part(split_part(url, '://', 2), '/', 2) AS"
            " section, url, warc_ts "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')) "
            "SELECT host, section, url, warc_ts FROM ("
            "SELECT p.*, row_number() OVER (PARTITION BY host, section "
            "ORDER BY warc_ts DESC, url DESC) AS rn FROM p) WHERE rn = 1"
        ),
        "domain_stats": (
            "WITH p AS (SELECT split_part(split_part(url, '://', 2), '/', 1)"
            " AS host, lang, octet_length(html) AS nb, "
            "length(coalesce(text, '')) AS nc, "
            "CASE WHEN substr(hex(html), 1, 8) = '25504446' THEN 1 ELSE 0 "
            "END AS pdf "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')) "
            "SELECT host, CAST(count(*) AS BIGINT) AS n_pages, "
            "CAST(sum(pdf) AS BIGINT) AS n_pdf, "
            "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, "
            "CAST(sum(nb) AS BIGINT) AS sum_html_bytes, "
            "CAST(sum(nc) AS BIGINT) AS sum_text_chars "
            "FROM p GROUP BY host"
        ),
        # domain_mixture: all-integer alpha=1/2 host quotas; the oracle
        # recomputes them with plain window functions, blind to the
        # engine's two-pass coarse-hash shape.  floor(sqrt(double(n)))
        # is the engine's _isqrt_arr expression verbatim.
        "domain_mixture": (
            "WITH p AS (SELECT url, split_part(split_part(url, '://', 2),"
            " '/', 1) AS host "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
            "w AS (SELECT host, CAST(count(*) AS BIGINT) AS n, "
            "CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS wh "
            "FROM p GROUP BY host), "
            "t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total, "
            "greatest(CAST(sum(wh) AS BIGINT), 1) AS w_total FROM w), "
            "r AS (SELECT p.url, p.host, w.n, w.wh, "
            "CAST(row_number() OVER (PARTITION BY p.host "
            "ORDER BY md5_number_lower(p.url), p.url) AS BIGINT) AS rnk "
            "FROM p JOIN w ON p.host = w.host) "
            "SELECT r.url, r.host, r.n AS n_host_pages, "
            "least(r.n, (t.n_total "
            f"* {_webtext.DOMAIN_MIX_NUM} // {_webtext.DOMAIN_MIX_DEN}) "
            "* r.wh // t.w_total) AS host_quota, "
            "r.rnk AS host_rank, "
            "CAST(CASE WHEN r.rnk <= least(r.n, (t.n_total "
            f"* {_webtext.DOMAIN_MIX_NUM} // {_webtext.DOMAIN_MIX_DEN}) "
            "* r.wh // t.w_total) THEN 1 ELSE 0 END AS BIGINT) AS keep "
            "FROM r CROSS JOIN t"
        ),
        "pii_scrub": (
            "SELECT url, "
            "CAST(length(regexp_extract_all(coalesce(text, ''), "
            f"'{_webtext.EMAIL_RE}')) AS BIGINT) AS n_emails, "
            "CAST(length(regexp_extract_all(coalesce(text, ''), "
            f"'{_webtext.IPV4_RE}')) AS BIGINT) AS n_ipv4, "
            "CAST(length(regexp_extract_all(coalesce(text, ''), "
            f"'{_webtext.PHONE_RE}')) AS BIGINT) AS n_phones, "
            "md5(regexp_replace(regexp_replace(regexp_replace("
            f"coalesce(text, ''), '{_webtext.EMAIL_RE}', '<EMAIL>', 'g'), "
            f"'{_webtext.IPV4_RE}', '<IP>', 'g'), "
            f"'{_webtext.PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5 "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')"
        ),
        "line_repetition": (
            "WITH lines AS (SELECT url, unnest(string_split("
            "coalesce(text, ''), chr(10))) AS line "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
            "nl AS (SELECT url, line, count(*) AS c FROM lines "
            "WHERE line <> '' GROUP BY url, line) "
            "SELECT url, CAST(sum(c) AS BIGINT) AS n_lines, "
            "CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) "
            "AS n_dup_lines, "
            "CAST(sum(length(line) * c) AS BIGINT) AS n_chars, "
            "CAST(sum(CASE WHEN c > 1 THEN length(line) * c ELSE 0 END) "
            "AS BIGINT) AS n_dup_chars "
            "FROM nl GROUP BY url"
        ),
        "line_dedup": (
            "WITH lines AS (SELECT url, unnest(string_split("
            "coalesce(text, ''), chr(10))) AS line "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')) "
            "SELECT md5(line) AS line_md5, "
            "CAST(count(DISTINCT url) AS BIGINT) AS n_urls, "
            "CAST(count(*) AS BIGINT) AS n_total "
            "FROM lines WHERE line <> '' GROUP BY md5(line) "
            "HAVING count(*) >= 2"
        ),
        "boilerplate_strip": (
            "WITH src AS (SELECT url, string_split(coalesce(text, ''), "
            "chr(10)) AS ls "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
            "lines AS (SELECT url, unnest(ls) AS line, "
            "generate_subscripts(ls, 1) AS ord FROM src), "
            "removal AS (SELECT md5(line) AS m FROM lines WHERE line <> '' "
            "GROUP BY md5(line) HAVING count(DISTINCT url) >= 10), "
            "flagged AS (SELECT url, line, ord, (line <> '' AND md5(line) "
            "IN (SELECT m FROM removal)) AS rm FROM lines), "
            "agg AS (SELECT url, CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_removed, "
            "coalesce(string_agg(CASE WHEN rm THEN NULL ELSE line END, "
            "chr(10) ORDER BY ord), '') AS clean FROM flagged GROUP BY url) "
            "SELECT url, n_removed, md5(clean) AS clean_md5 FROM agg"
        ),
        # gopher_quality: every counter is an exact integer and the pass
        # flag pure integer arithmetic, so the independent SQL recompute
        # is bit-exact (rule constants pinned in ops/webtext.py)
        "gopher_quality": (
            "WITH d AS (SELECT url, coalesce(text, '') AS text "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
            "w AS (SELECT url, unnest(regexp_extract_all(text, '\\S+')) AS w"
            " FROM d), "
            "wa AS (SELECT url, CAST(count(*) AS BIGINT) AS n_words, "
            "CAST(sum(length(w)) AS BIGINT) AS sum_word_chars, "
            "CAST(sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0"
            " END) AS BIGINT) AS n_alpha_words, "
            "CAST(sum(CASE WHEN w IN ('the','be','to','of','and','that',"
            "'have','with') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_words "
            "FROM w GROUP BY url), "
            "l AS (SELECT url, unnest(string_split(text, chr(10))) AS line "
            "FROM d), "
            "la AS (SELECT url, CAST(count(*) FILTER (WHERE line <> '') "
            "AS BIGINT) AS n_lines, "
            "CAST(count(*) FILTER (WHERE line <> '' AND (line LIKE '- %' OR"
            " line LIKE '* %' OR line LIKE '• %')) AS BIGINT) "
            "AS n_bullet_lines, "
            "CAST(count(*) FILTER (WHERE line <> '' AND line LIKE '%...') "
            "AS BIGINT) AS n_ellipsis_lines FROM l GROUP BY url), "
            "c AS (SELECT url, CAST(length(text) - length(replace(text, "
            "'#', '')) AS BIGINT) AS n_hash, "
            "CAST((length(text) - length(replace(text, '...', ''))) // 3 "
            "AS BIGINT) AS n_ellipsis FROM d) "
            "SELECT d.url, coalesce(wa.n_words, 0) AS n_words, "
            "coalesce(wa.sum_word_chars, 0) AS sum_word_chars, "
            "coalesce(wa.n_alpha_words, 0) AS n_alpha_words, "
            "coalesce(wa.n_stop_words, 0) AS n_stop_words, "
            "c.n_hash, c.n_ellipsis, coalesce(la.n_lines, 0) AS n_lines, "
            "coalesce(la.n_bullet_lines, 0) AS n_bullet_lines, "
            "coalesce(la.n_ellipsis_lines, 0) AS n_ellipsis_lines, "
            "CAST(CASE WHEN coalesce(wa.n_words, 0) >= 50 "
            "AND coalesce(wa.n_words, 0) <= 100000 "
            "AND 3 * coalesce(wa.n_words, 0) <= coalesce(wa.sum_word_chars, 0) "
            "AND coalesce(wa.sum_word_chars, 0) <= 10 * coalesce(wa.n_words, 0) "
            "AND 10 * (c.n_hash + c.n_ellipsis) <= coalesce(wa.n_words, 0) "
            "AND 10 * coalesce(la.n_bullet_lines, 0) <= "
            "9 * coalesce(la.n_lines, 0) "
            "AND 10 * coalesce(la.n_ellipsis_lines, 0) <= "
            "3 * coalesce(la.n_lines, 0) "
            "AND 5 * coalesce(wa.n_alpha_words, 0) >= "
            "4 * coalesce(wa.n_words, 0) "
            "AND coalesce(wa.n_stop_words, 0) >= 2 "
            "THEN 1 ELSE 0 END AS BIGINT) AS passes_gopher "
            "FROM d LEFT JOIN wa USING (url) LEFT JOIN la USING (url) "
            "JOIN c USING (url)"
        ),
        # gopher_repetition: nine independent list-slice n-gram recomputes
        # (construction shared via _gopher_repetition_sql — definitions
        # pinned in ops/webtext.py, every counter an exact BIGINT)
        "gopher_repetition": _gopher_repetition_sql(),
        # dup_span_census: full lead-window md5 recompute — no prefilter,
        # so the oracle is blind to the op's cheap-hash candidacy pass
        "dup_span_census": _dup_span_sql(),
        "meta_refresh": _meta_refresh_sql(),
        "dup_span_stats": _dup_span_stats_sql(),
        "dup_span_removal": _dup_span_removal_sql(),
        # joined-mode variants: the SAME op semantics under the SAME
        # independent SQL — only the engine's membership transport
        # differs (co-partitioned cogroups instead of sharded broadcast)
        "dup_span_stats_joined": _dup_span_stats_sql(),
        "dup_span_removal_joined": _dup_span_removal_sql(),
        "url_filter": _url_filter_sql(),
        "outlink_stats": _outlink_stats_sql(),
        "host_pagerank": _host_pagerank_sql(),
        "host_two_hop": _host_two_hop_sql(),
        "host_components": _host_components_sql(),
        "anchor_text_stats": _anchor_text_stats_sql(),
        # the hop variant's oracle is the SAME plain chain unrolled to
        # FAST_ORACLE_UNROLL rounds: the engine raises unless it PROVES
        # the fixpoint, where the two recurrences coincide — but plain
        # may need more rounds than the hop proof took to get there
        "host_components_fast": _host_components_sql_rounds(
            _webtext.FAST_ORACLE_UNROLL
        ),
        # training-export ops: md5_number_lower(url) is the pinned
        # shard/partition identity (≡ int.from_bytes(md5[8:], 'little'),
        # tests/test_export.py); checksum is the order-independent
        # bit_xor of per-document content ids
        "shard_export": (
            "SELECT CAST(md5_number_lower(url) % 64 AS BIGINT) AS shard_id, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS sum_chars, "
            "bit_xor(md5_number_lower(url || chr(10) || coalesce(text, ''))) "
            "AS checksum "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}') "
            "GROUP BY 1"
        ),
        "pack_sequences": (
            "WITH d AS (SELECT url, coalesce(text, '') AS text "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
            "t AS (SELECT url, "
            "CAST(md5_number_lower(url) % 32 AS BIGINT) AS upart, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tokens "
            "FROM d), "
            "p AS (SELECT upart, tokens, "
            "coalesce(sum(tokens) OVER (PARTITION BY upart ORDER BY url "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "// 2048 AS pack_id FROM t) "
            "SELECT upart, CAST(pack_id AS BIGINT) AS pack_id, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(tokens) AS BIGINT) AS sum_tokens "
            "FROM p GROUP BY upart, pack_id"
        ),
        # c4_quality: line rules + page flags recomputed in SQL; kept-line
        # reconstruction via string_agg(ORDER BY ord) FILTER, digests md5
        "c4_quality": (
            "WITH d AS (SELECT url, coalesce(text, '') AS text "
            f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')), "
            "l AS (SELECT url, unnest(string_split(text, chr(10))) AS line, "
            "generate_subscripts(string_split(text, chr(10)), 1) AS ord "
            "FROM d), "
            "f AS (SELECT url, line, ord, (line <> '') AS ne, "
            "regexp_matches(line, '[.!?\"]$') AS term, "
            "len(regexp_extract_all(line, '\\S+')) < 3 AS short, "
            "regexp_matches(line, '[Jj]ava[Ss]cript') AS js FROM l), "
            "la AS (SELECT url, "
            "CAST(count(*) FILTER (ne) AS BIGINT) AS n_lines, "
            "CAST(count(*) FILTER (ne AND term) AS BIGINT) "
            "AS n_terminal_lines, "
            "CAST(count(*) FILTER (ne AND short) AS BIGINT) "
            "AS n_short_lines, "
            "CAST(count(*) FILTER (ne AND js) AS BIGINT) AS n_js_lines, "
            "CAST(count(*) FILTER (ne AND term AND NOT short AND NOT js) "
            "AS BIGINT) AS n_kept_lines, "
            "md5(coalesce(string_agg(line, chr(10) ORDER BY ord) "
            "FILTER (ne AND term AND NOT short AND NOT js), '')) "
            "AS clean_md5 FROM f GROUP BY url), "
            "c AS (SELECT url, CAST(len(regexp_extract_all(text, '[.!?]')) "
            "AS BIGINT) AS n_sentences, "
            "CAST(CASE WHEN regexp_matches(text, '[Ll]orem [Ii]psum') "
            "THEN 1 ELSE 0 END AS BIGINT) AS has_lorem, "
            "CAST(CASE WHEN contains(text, '{') THEN 1 ELSE 0 END "
            "AS BIGINT) AS has_brace FROM d) "
            "SELECT d.url, la.n_lines, la.n_terminal_lines, "
            "la.n_short_lines, la.n_js_lines, la.n_kept_lines, "
            "c.n_sentences, c.has_lorem, c.has_brace, la.clean_md5, "
            "CAST(CASE WHEN c.has_lorem = 0 AND c.has_brace = 0 "
            "AND c.n_sentences >= 5 AND la.n_kept_lines >= 1 "
            "THEN 1 ELSE 0 END AS BIGINT) AS passes_c4 "
            "FROM d JOIN la USING (url) JOIN c USING (url)"
        ),
        "lang_id": (
            "SELECT doc_id, lang_pred "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'lang_id')}')"
        ),
        # CCNet-style LM family: serial-oracle snapshots (the quantized
        # log-prob model is not SQL-expressible; the snapshot builder is
        # an independent dict-and-loop reimplementation)
        "lm_perplexity": (
            "SELECT doc_id, n_bigrams, logprob_micro, norm_micro "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'lm_perplexity')}')"
        ),
        "ccnet_tiers": (
            "SELECT lang, tier, n_docs, sum_bigrams "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'ccnet_tiers')}')"
        ),
        "dsir_weights": (
            "SELECT doc_id, n_features, dsir_logw_micro "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'dsir_weights')}')"
        ),
        "dsir_resample": (
            "SELECT doc_id, dsir_logw_micro, gumbel_micro, score_micro "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'dsir_resample')}')"
        ),
        # token_budget_mix: the greedy budget cutoff is ONE window
        # cumulative sum over the independent serial lm_perplexity
        # snapshot — blind to the engine's histogram/refine/tie passes.
        "token_budget_mix": (
            "WITH s AS (SELECT doc_id, n_bigrams, norm_micro FROM "
            f"read_parquet('{oracle_path(_GOLDEN_SF, 'lm_perplexity')}') "
            "WHERE n_bigrams > 0), "
            "b AS (SELECT CAST(sum(n_bigrams) AS BIGINT) "
            f"// {_lm.TBM_BUDGET_DEN} AS budget FROM s), "
            "c AS (SELECT doc_id, n_bigrams, norm_micro, "
            "CAST(sum(n_bigrams) OVER (ORDER BY norm_micro DESC, doc_id "
            "ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS cum FROM s) "
            "SELECT c.doc_id, c.norm_micro, c.n_bigrams, "
            "CAST(CASE WHEN c.cum <= b.budget THEN 1 ELSE 0 END AS BIGINT) "
            "AS keep FROM c CROSS JOIN b"
        ),
        "doc_fingerprints": (
            "SELECT doc_id, min_window_hash, md5_64 "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'doc_fingerprints')}')"
        ),
        "minhash_dedup": (
            "SELECT doc_id, cluster_id "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'minhash_dedup')}')"
        ),
        # Keeper election derived INDEPENDENTLY in SQL (window functions
        # over the cluster snapshot joined with the documents view) —
        # the engine side never sorts, it runs partial argmax reduces.
        "minhash_keep_best": (
            "WITH j AS (SELECT c.doc_id, c.cluster_id, d.n_chars "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'minhash_dedup')}') c "
            "JOIN documents d ON c.doc_id = d.doc_id), "
            "r AS (SELECT doc_id, cluster_id, "
            "row_number() OVER (PARTITION BY cluster_id "
            "ORDER BY n_chars DESC, doc_id) AS rn, "
            "count(*) OVER (PARTITION BY cluster_id) AS csize FROM j), "
            "k AS (SELECT cluster_id, doc_id AS keeper_doc_id FROM r "
            "WHERE rn = 1) "
            "SELECT r.doc_id, r.cluster_id, k.keeper_doc_id, "
            "CAST(r.csize AS BIGINT) AS cluster_size, "
            "CAST(CASE WHEN r.doc_id = k.keeper_doc_id THEN 1 ELSE 0 END "
            "AS BIGINT) AS keep "
            "FROM r JOIN k ON r.cluster_id = k.cluster_id"
        ),
        "simhash_fingerprints": (
            "SELECT doc_id, simhash "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'simhash_fingerprints')}')"
        ),
        # Independent of the banded-LSH path under test: exact all-pairs
        # popcount in SQL over the fingerprint snapshot.
        "simhash_neardup": (
            "WITH fp AS (SELECT doc_id, simhash FROM read_parquet("
            f"'{oracle_path(_GOLDEN_SF, 'simhash_fingerprints')}')) "
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
            "FROM fp a JOIN fp b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
        ),
        "ann_topk_ivf": (
            'SELECT query_id, "rank", neighbor_id '
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'ann_topk_ivf')}')"
        ),
        "embedding_neardup_ivf": (
            "SELECT a, b "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'embedding_neardup_ivf')}')"
        ),
        "embedding_kmeans": (
            "SELECT vec_id, cluster_id "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'embedding_kmeans')}')"
        ),
        "texmix_recognize": (
            "SELECT doc_id, mixed_text "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'texmix_recognize')}')"
        ),
        "texmix_markdown": (
            "SELECT doc_id, markdown "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'texmix_markdown')}')"
        ),
        "tsr_assemble": (
            "SELECT doc_id, table_idx, cell_idx, row_start, col_start, "
            "row_span, col_span, is_header, cell_text, confidence "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'tsr_assemble')}')"
        ),
        "tsr_tables_csv": (
            "SELECT doc_id, table_idx, payload "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'tsr_tables_csv')}')"
        ),
        "media_features": (
            "SELECT media_id, media_type, decoded "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'media_features')}')"
        ),
        "media_resize": (
            "SELECT media_id, out_w, out_h, px_mean, px_std "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'media_resize')}')"
        ),
        "video_frame_features": (
            "SELECT media_id, frame_idx, ts_sec "
            f"FROM read_parquet('{oracle_path(_GOLDEN_SF, 'video_frame_features')}')"
        ),
    }
    # quality_funnel: the three rule batteries re-derived independently
    # (each subquery is that op's own oracle construction) and joined on
    # url — verifies the funnel's single-pass composition end-to-end
    oracles["quality_funnel"] = (
        "SELECT a.url, a.passes_gopher, b.passes_repetition, c.passes_c4, "
        "CAST(a.passes_gopher * b.passes_repetition * c.passes_c4 "
        "AS BIGINT) AS keep "
        f"FROM ({oracles['gopher_quality']}) a "
        f"JOIN ({oracles['gopher_repetition']}) b USING (url) "
        f"JOIN ({oracles['c4_quality']}) c USING (url)"
    )
    # curation_pipeline: the full gate recomposed from the INDIVIDUAL
    # ops' oracle constructions (url_filter + quality_funnel subqueries)
    # plus a window-function keeper election — blind to the engine's
    # single-pass shape, sharded keeper refs, and md5-number compare
    oracles["curation_pipeline"] = (
        f"WITH uf AS ({oracles['url_filter']}), "
        f"fun AS ({oracles['quality_funnel']}), "
        "ded AS (SELECT url, CAST(CASE WHEN url = min(url) OVER "
        "(PARTITION BY md5(coalesce(text, ''))) THEN 1 ELSE 0 END "
        "AS BIGINT) AS keep_dedup "
        f"FROM read_parquet('{_webtext.corpus_glob(_GOLDEN_SF)}')) "
        "SELECT uf.url, uf.keep AS keep_url, fun.keep AS keep_quality, "
        "ded.keep_dedup, "
        "CAST(uf.keep * fun.keep * ded.keep_dedup AS BIGINT) AS keep, "
        "CAST(CASE WHEN uf.keep * fun.keep * ded.keep_dedup = 1 "
        "THEN md5_number_lower(uf.url) % 64 ELSE -1 END AS BIGINT) "
        "AS shard "
        "FROM uf JOIN fun USING (url) JOIN ded USING (url)"
    )
    # joined-mode variants share their base op's oracle verbatim — the
    # semantics are identical, only the membership transport differs
    oracles["boilerplate_strip_joined"] = oracles["boilerplate_strip"]
    oracles["curation_pipeline_joined"] = oracles["curation_pipeline"]
    # tier_extraction: the curation composite joined to an authority
    # tier derived from the pagerank CTE chain — thresholds generated
    # from the op's own constants; the mean is one integer aggregate
    # (blind to the engine's sharded tier-blob lookup)
    from latyas_ray.ops.webtext import (
        TIER_CORE_MULT,
        TIER_MID_DEN,
        TIER_MID_NUM,
    )

    oracles["tier_extraction"] = (
        f"WITH cur AS ({oracles['curation_pipeline']}), "
        f"pr AS ({_host_pagerank_sql()}), "
        "m AS (SELECT CAST(sum(rank_micro) AS BIGINT) // count(*) "
        "AS mean FROM pr), "
        "t AS (SELECT host, CASE "
        f"WHEN rank_micro >= {TIER_CORE_MULT} * m.mean THEN 1 "
        "WHEN rank_micro >= m.mean THEN 2 "
        f"WHEN rank_micro >= {TIER_MID_NUM} * m.mean // {TIER_MID_DEN} "
        "THEN 3 ELSE 4 END AS tier FROM pr CROSS JOIN m) "
        "SELECT cur.url, cur.keep, "
        "CAST(CASE WHEN cur.keep = 1 THEN t.tier ELSE -1 END AS BIGINT) "
        "AS host_tier FROM cur JOIN t ON t.host = "
        "split_part(split_part(cur.url, '://', 2), '/', 1)"
    )
    return oracles
