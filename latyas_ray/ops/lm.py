"""CCNet-style n-gram LM quality scoring and head/middle/tail tiering.

The reference has no language-model machinery; this pair is a
beyond-reference training-data operator modeled on CCNet (Wenzek et
al. 2019, "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data"): score every document with an n-gram LM perplexity proxy
trained on a seed slice of the corpus itself, then split the corpus
into head / middle / tail quality tiers at the per-language score
terciles.  CCNet trains a 5-gram KenLM per language on Wikipedia; here
the model is an add-one-smoothed word-BIGRAM LM trained on a
hash-selected seed subset (no external data in this environment), which
keeps the exact distributed shape — train pass, broadcast model, map-only
scoring, percentile-based tiering — while staying oracle-verifiable.

Integer-exact contract (what makes the driver hash compare possible):
the model ships QUANTIZED log-probabilities — per seen bigram,
``floor(ln((c(w1,w2)+1) / (cl(w1)+V)) * 1e6 + 0.5)`` as an int64
(micro-nats), with the per-left-token add-one fallback
``floor(ln(1 / (cl(w1)+V)) * 1e6 + 0.5)`` for unseen pairs — computed
ONCE on the driver with ``math.log`` over exact integer counts.
Scoring is then pure integer lookup + int64 summation, so the
distributed engine and the serial oracle agree bit-for-bit regardless
of batch boundaries, actor topology, or float summation order.

Tokenization is pinned to ASCII letter runs: ``[A-Za-z]+`` on the raw
text, each token ascii-lowercased.  (Engine: ``pc.ascii_lower`` on the
full text then ``split_pattern_regex('[^a-z]+')`` — equivalent because
``ascii_lower`` maps exactly A-Z into a-z and nothing else into the
class.  Full-Unicode ``str.lower()`` is deliberately avoided: U+212A
KELVIN SIGN lowers into ASCII 'k' under Python but not under
``ascii_lower``, and the oracle must not depend on which library
lowercases.)

Scale shape (100 TB):
- Train pass A (vocab): seed docs only (``doc_id % LM_SEED_MOD == 0``),
  per-batch token value_counts (partial combine), coarse hash shuffle on
  the word, per-partition reduce + local top-V, driver merges
  O(partitions x V) survivor rows — the ``word_counts`` shape.
- Train pass B (counts): token->id mapping under the broadcast vocab,
  per-batch bincount/unique partials, coarse hash shuffle on the pair
  key, per-partition reduce + local top-P, driver merges survivors.
  Left-token counts are bounded by V+1; pair counts are capped at
  ``LM_PAIR_CAP`` with the drop logged (CCNet prunes its LMs the same
  way).  Model size is O(V + P), independent of corpus size.
- Scoring: model broadcast once (``ray.put`` of sorted int64 key/value
  arrays); each batch dictionary-encodes its tokens (C), maps only the
  UNIQUE tokens through the vocab (searchsorted), forms bigram keys and
  scores them with one searchsorted against the pair table — map-only,
  no shuffle.
- Tiering: per-(lang, norm-score) histogram via partial value_counts +
  coarse hash reduce.  The histogram is bounded by the VALUE RANGE of
  the quantized normalized score (ln-probabilities in micro-nats //
  bigram count), not by corpus size, so the driver-side boundary
  computation stays small at any scale.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .common import merge_partials, read_table

LM_SEED_MOD = 8          # seed subset: doc_id % LM_SEED_MOD == 0
LM_VOCAB_CAP = 30_000    # top-V unigrams kept; everything else -> <unk>
LM_PAIR_CAP = 1_000_000  # top-P bigrams kept; unseen pairs use fallback
LM_QSCALE = 1_000_000    # micro-nats quantization
# RE2 complement class: splitting the ascii-lowered text on this yields
# exactly the [A-Za-z]+ runs of the raw text, lowercased.
LM_SPLIT_RE = "[^a-z]+"

_TIER_NAMES = ("head", "middle", "tail", "unscored")


def _qlog_micro(num: int, den: int) -> int:
    """Pinned quantization: ``floor(ln(num/den) * 1e6 + 0.5)`` (round
    half up — Python round() is banker's and would diverge from the
    oracle on exact .5 landings).  ``num/den`` is evaluated as ONE
    float64 quotient before the log; computing ``log(num) - log(den)``
    instead gives a different last bit."""
    return int(math.floor(math.log(num / den) * LM_QSCALE + 0.5))


def _token_scaffold(texts: pd.Series):
    """Per-batch tokenization at C speed under the LM's letters-only
    lowercased tokenizer.  Returns ``(n_tok, doc, tok_id, uniq)`` —
    per-row token counts, per-token row index, per-token dictionary id,
    and the unique token strings — or ``None`` for a tokenless batch.
    Delegates to ``webtext._flat_tokens`` (one construction home — a
    line-for-line local copy here once diverged from the shared one's
    guards)."""
    from .webtext import _flat_tokens

    r = _flat_tokens(texts, split_pattern=LM_SPLIT_RE, lower=True)
    if r is None:
        return None
    n_tok, doc, tok_id, uniq, _starts = r
    return n_tok, doc, tok_id, uniq


def _map_uniq_to_vocab(uniq: np.ndarray, vocab_sorted: np.ndarray,
                       unk_id: int) -> np.ndarray:
    """Vocab id for each UNIQUE batch token (OOV -> unk): one
    searchsorted over the ascending vocab array — only the dictionary,
    never the full token stream, pays the string comparisons."""
    if len(vocab_sorted) == 0:
        return np.full(len(uniq), unk_id, dtype=np.int64)
    idx = np.searchsorted(vocab_sorted, uniq)
    idx_c = np.minimum(idx, len(vocab_sorted) - 1)
    hit = vocab_sorted[idx_c] == uniq
    return np.where(hit, idx_c, unk_id).astype(np.int64)


class _LMModel:
    """Quantized bigram model: broadcast payload for the scoring pass."""

    def __init__(self, vocab_sorted: np.ndarray, pair_keys: np.ndarray,
                 pair_logp: np.ndarray, fallback: np.ndarray) -> None:
        self.vocab_sorted = vocab_sorted      # object[V], ascending
        self.unk_id = len(vocab_sorted)
        self.v_total = len(vocab_sorted) + 1  # vocab + <unk>
        self.pair_keys = pair_keys            # int64[P], ascending
        self.pair_logp = pair_logp            # int64[P] micro-nats
        self.fallback = fallback              # int64[V+1] micro-nats


_MODEL_CACHE: Dict[tuple, _LMModel] = {}
_EMPTY_COUNT = pd.DataFrame(
    {"key": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64"),
     "kind": pd.Series(dtype="int64"), "part": pd.Series(dtype="int64")}
)


def _seed_vocab(sf_dir: str, seed_mod: int, vocab_cap: int) -> np.ndarray:
    """Train pass A: top-``vocab_cap`` unigrams over the seed docs, ties
    broken (count desc, token asc) — the ``word_counts`` distributed
    top-k shape."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"word": pd.Series(dtype="object"),
             "n": pd.Series(dtype="int64"),
             "part": pd.Series(dtype="int64")}
        )
        seed = batch[(batch["doc_id"].to_numpy() % seed_mod) == 0]
        if not len(seed):
            return empty
        sc = _token_scaffold(seed["text"])
        if sc is None:
            return empty
        _, _, tok_id, uniq = sc
        counts = np.bincount(tok_id, minlength=len(uniq)).astype(np.int64)
        h = pd.util.hash_array(uniq)
        return pd.DataFrame(
            {"word": uniq, "n": counts, "part": (h % 64).astype("int64")}
        )

    def reduce_top(g: pd.DataFrame) -> pd.DataFrame:
        totals = g.groupby("word", as_index=False)["n"].sum()
        top = totals.sort_values(
            ["n", "word"], ascending=[False, True]
        ).head(vocab_cap).copy()
        # true distinct count of this part BEFORE its cap, so the
        # driver's drop warning counts what was actually pruned (each
        # word hashes to one part, so the per-part counts sum exactly)
        top["part"] = int(g["part"].iloc[0])
        top["nd"] = len(totals)
        return top

    survivors = (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby("part")
        .map_groups(reduce_top, batch_format="pandas")
        .to_pandas()
    )
    if not len(survivors):
        return np.asarray([], dtype=object)
    top = survivors.sort_values(
        ["n", "word"], ascending=[False, True]
    ).head(vocab_cap)
    n_distinct = int(survivors.drop_duplicates("part")["nd"].sum())
    if n_distinct > len(top):
        logging.getLogger(__name__).warning(
            "lm vocab capped at %d (dropped %d rarer seed words)",
            vocab_cap, n_distinct - len(top),
        )
    return np.sort(top["word"].to_numpy(dtype=object))


def _seed_counts(sf_dir: str, seed_mod: int, pair_cap: int,
                 vocab_sorted: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Train pass B: left-token counts (positions 0..n-2) and bigram
    counts over the seed docs under the broadcast vocab.  Returns
    ``(left_counts[V+1], pair_keys, pair_counts)`` with the pair table
    globally capped at ``pair_cap`` by (count desc, key asc)."""
    unk_id = len(vocab_sorted)
    v_total = unk_id + 1
    vocab_ref = ray.put(vocab_sorted)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        seed = batch[(batch["doc_id"].to_numpy() % seed_mod) == 0]
        if not len(seed):
            return _EMPTY_COUNT.copy()
        sc = _token_scaffold(seed["text"])
        if sc is None:
            return _EMPTY_COUNT.copy()
        n_tok, doc, tok_id, uniq = sc
        ids = _map_uniq_to_vocab(uniq, ray.get(vocab_ref), unk_id)[tok_id]
        # bigram positions: every token whose successor is in the same doc
        left_mask = np.empty(len(ids), dtype=bool)
        if len(ids):
            left_mask[:-1] = doc[:-1] == doc[1:]
            left_mask[-1] = False
        w1 = ids[left_mask]
        lc = np.bincount(w1, minlength=v_total).astype(np.int64)
        lnz = np.flatnonzero(lc)
        frames = [pd.DataFrame(
            {"key": lnz.astype(np.int64), "n": lc[lnz],
             "kind": np.int64(0),
             "part": (lnz % 64).astype(np.int64)}
        )]
        if len(w1):
            keys = w1 * v_total + ids[np.flatnonzero(left_mask) + 1]
            uk, uc = np.unique(keys, return_counts=True)
            frames.append(pd.DataFrame(
                {"key": uk.astype(np.int64), "n": uc.astype(np.int64),
                 "kind": np.int64(1), "part": (uk % 64).astype(np.int64)}
            ))
        return pd.concat(frames, ignore_index=True)

    def reduce_cap(g: pd.DataFrame) -> pd.DataFrame:
        totals = g.groupby(["kind", "key"], as_index=False)["n"].sum()
        lefts = totals[totals["kind"] == 0]
        all_pairs = totals[totals["kind"] == 1]
        pairs = all_pairs.sort_values(
            ["n", "key"], ascending=[False, True]
        ).head(pair_cap)
        # kind=2 summary row: this part's TRUE distinct-bigram count
        # before its cap, so the driver's drop warning counts what was
        # actually pruned (a key hashes to one part — counts sum exactly)
        census = pd.DataFrame(
            {"kind": [np.int64(2)], "key": [np.int64(-1)],
             "n": [np.int64(len(all_pairs))]}
        )
        return pd.concat([lefts, pairs, census], ignore_index=True)

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby("part")
        .map_groups(reduce_cap, batch_format="pandas")
        .to_pandas()
    )
    left_counts = np.zeros(v_total, dtype=np.int64)
    if len(merged):
        lefts = merged[merged["kind"] == 0]
        left_counts[lefts["key"].to_numpy(dtype=np.int64)] = (
            lefts["n"].to_numpy(dtype=np.int64)
        )
        pairs = merged[merged["kind"] == 1].sort_values(
            ["n", "key"], ascending=[False, True]
        ).head(pair_cap)
        n_pairs_total = int(merged.loc[merged["kind"] == 2, "n"].sum())
        if n_pairs_total > len(pairs):
            logging.getLogger(__name__).warning(
                "lm pair table capped at %d (dropped %d rarer bigrams)",
                pair_cap, n_pairs_total - len(pairs),
            )
        order = np.argsort(pairs["key"].to_numpy(dtype=np.int64))
        pair_keys = pairs["key"].to_numpy(dtype=np.int64)[order]
        pair_counts = pairs["n"].to_numpy(dtype=np.int64)[order]
    else:
        pair_keys = np.asarray([], dtype=np.int64)
        pair_counts = np.asarray([], dtype=np.int64)
    return left_counts, pair_keys, pair_counts


def build_model(sf_dir: str, seed_mod: int = LM_SEED_MOD,
                vocab_cap: int = LM_VOCAB_CAP,
                pair_cap: int = LM_PAIR_CAP) -> _LMModel:
    """Two train passes + driver-side quantization (math.log over exact
    integer counts — the ONLY floating-point step in the family, and it
    runs once, on one machine).  Cached per (corpus dir, file identity,
    params) — the file's (mtime, size) is part of the key, so a table
    REGENERATED at the same path (test fixtures, a re-synthesized sf
    dir) is never silently scored with the stale model."""
    doc_path = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(doc_path)
        ident: Tuple[int, int] = (st.st_mtime_ns, st.st_size)
    except OSError:
        ident = (0, 0)
    key = (os.path.abspath(sf_dir), ident, seed_mod, vocab_cap, pair_cap)
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    vocab_sorted = _seed_vocab(sf_dir, seed_mod, vocab_cap)
    left, pair_keys, pair_counts = _seed_counts(
        sf_dir, seed_mod, pair_cap, vocab_sorted
    )
    v_total = len(vocab_sorted) + 1
    pair_logp = np.fromiter(
        (
            _qlog_micro(int(c) + 1, int(left[int(k) // v_total]) + v_total)
            for k, c in zip(pair_keys, pair_counts)
        ),
        dtype=np.int64, count=len(pair_keys),
    )
    fallback = np.fromiter(
        (_qlog_micro(1, int(lc) + v_total) for lc in left),
        dtype=np.int64, count=v_total,
    )
    model = _LMModel(vocab_sorted, pair_keys, pair_logp, fallback)
    _MODEL_CACHE[key] = model
    return model


def _scored_ds(sf_dir: str, model: _LMModel) -> rd.Dataset:
    """Map-only scoring under the broadcast model: per document, the
    int64 sum of quantized bigram log-probs, the bigram count, and the
    floor-division normalized score."""
    model_ref = ray.put(model)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m: _LMModel = ray.get(model_ref)
        n = len(batch)
        doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
        langs = batch["lang"].fillna("").to_numpy(dtype=object)
        n_bi = np.zeros(n, dtype=np.int64)
        total = np.zeros(n, dtype=np.int64)
        sc = _token_scaffold(batch["text"])
        if sc is not None:
            _, doc, tok_id, uniq = sc
            ids = _map_uniq_to_vocab(uniq, m.vocab_sorted, m.unk_id)[tok_id]
            left_mask = np.empty(len(ids), dtype=bool)
            left_mask[:-1] = doc[:-1] == doc[1:]
            left_mask[-1] = False
            pos = np.flatnonzero(left_mask)
            if len(pos):
                w1 = ids[pos]
                keys = w1 * m.v_total + ids[pos + 1]
                if len(m.pair_keys):
                    idx = np.searchsorted(m.pair_keys, keys)
                    idx_c = np.minimum(idx, len(m.pair_keys) - 1)
                    hit = m.pair_keys[idx_c] == keys
                    lp = np.where(hit, m.pair_logp[idx_c], m.fallback[w1])
                else:
                    lp = m.fallback[w1]
                bdoc = doc[pos]
                # int64 groupby-sum (exact; float bincount would be
                # exact only below 2**53 micro-nats per doc)
                agg = pd.DataFrame({"d": bdoc, "lp": lp}).groupby("d")["lp"]
                sums = agg.sum()
                cnts = agg.size()
                total[sums.index.to_numpy()] = sums.to_numpy(dtype=np.int64)
                n_bi[cnts.index.to_numpy()] = cnts.to_numpy(dtype=np.int64)
        norm = np.where(n_bi > 0, total // np.maximum(n_bi, 1), 0)
        return pd.DataFrame(
            {"doc_id": doc_ids, "lang": langs, "n_bigrams": n_bi,
             "logprob_micro": total, "norm_micro": norm.astype(np.int64)}
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=2048)


def lm_perplexity(sf_dir: str) -> rd.Dataset:
    """Per-document LM quality score (CCNet's per-doc perplexity step):
    (doc_id, n_bigrams, logprob_micro, norm_micro) with norm_micro =
    logprob_micro // n_bigrams (floor; 0 for docs under 2 tokens).
    Lower (more negative) norm = higher perplexity = worse."""
    model = build_model(sf_dir)
    return _scored_ds(sf_dir, model).select_columns(
        ["doc_id", "n_bigrams", "logprob_micro", "norm_micro"]
    )


def _tier_bounds(hist: pd.DataFrame) -> Dict[str, Tuple[int, int]]:
    """Per-lang tercile boundaries over the (lang, norm, count)
    histogram of SCORED docs: with values ascending, t_lo = value at
    rank n//3 and t_hi = value at rank (2n)//3 (0-based)."""
    bounds: Dict[str, Tuple[int, int]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("norm_micro")
        vals = g["norm_micro"].to_numpy(dtype=np.int64)
        cnts = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        t_lo = int(vals[np.searchsorted(cum, n // 3 + 1)])
        t_hi = int(vals[np.searchsorted(cum, (2 * n) // 3 + 1)])
        bounds[str(lang)] = (t_lo, t_hi)
    return bounds


def ccnet_tiers(sf_dir: str) -> pd.DataFrame:
    """CCNet's corpus split: per language, head / middle / tail tiers at
    the terciles of the normalized LM score (higher norm = lower
    perplexity = better; ties resolve by value so equal scores share a
    tier).  Docs with no bigrams are reported as 'unscored'.  Output:
    (lang, tier, n_docs, sum_bigrams)."""
    model = build_model(sf_dir)
    scored = _scored_ds(sf_dir, model).materialize()

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[batch["n_bigrams"] > 0]
        if not len(g):
            return pd.DataFrame(
                {"lang": pd.Series(dtype="object"),
                 "norm_micro": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64"),
                 "part": pd.Series(dtype="int64")}
            )
        vc = g.groupby(["lang", "norm_micro"], as_index=False).size()
        return pd.DataFrame(
            {"lang": vc["lang"], "norm_micro": vc["norm_micro"],
             "n": vc["size"].astype(np.int64),
             "part": (vc["norm_micro"].to_numpy(dtype=np.int64) % 64)}
        )

    hist = (
        scored.map_batches(hist_partial, batch_format="pandas",
                           batch_size=8192)
        .groupby("part")
        .map_groups(
            lambda g: g.groupby(["lang", "norm_micro"], as_index=False)
            .agg(n=("n", "sum")),
            batch_format="pandas",
        )
        .to_pandas()
    )
    bounds = _tier_bounds(hist) if len(hist) else {}
    bounds_ref = ray.put(bounds)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        b: Dict[str, Tuple[int, int]] = ray.get(bounds_ref)
        langs = batch["lang"].to_numpy(dtype=object)
        norm = batch["norm_micro"].to_numpy(dtype=np.int64)
        n_bi = batch["n_bigrams"].to_numpy(dtype=np.int64)
        tier = np.full(len(batch), "unscored", dtype=object)
        for lang, (t_lo, t_hi) in b.items():
            sel = (langs == lang) & (n_bi > 0)
            tier[sel & (norm >= t_hi)] = "head"
            tier[sel & (norm >= t_lo) & (norm < t_hi)] = "middle"
            tier[sel & (norm < t_lo)] = "tail"
        out = pd.DataFrame(
            {"lang": langs, "tier": tier, "n_docs": np.int64(1),
             "sum_bigrams": n_bi}
        )
        return out.groupby(["lang", "tier"], as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_bigrams=("sum_bigrams", "sum")
        )

    partials = scored.map_batches(assign, batch_format="pandas",
                                  batch_size=8192)
    out = merge_partials(partials, ["lang", "tier"],
                         {"n_docs": "sum", "sum_bigrams": "sum"})
    return out.astype({"n_docs": "int64", "sum_bigrams": "int64"})


# ------------------------------------------------------------ dsir_weights
#
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every document by
# the log-likelihood ratio of a hashed-n-gram bag-of-words model fit on a
# TARGET slice vs one fit on the RAW corpus.  The paper hashes unigrams +
# bigrams into a fixed bucket space (10k); here the space is DSIR_NB
# buckets and the target slice is the lang == DSIR_TARGET_LANG documents
# (no external target corpus exists in this environment).  Hash-bucket
# collisions are part of the operator DEFINITION (hashed features are
# lossy by design), so the bucket hash — pandas' fixed-key siphash over
# the token string, bigrams combined with the same FNV multiplier the
# dup-span rolling hash uses — is a pinned shared constant, like
# TOKEN_RE; the serial oracle re-derives everything else (counting,
# smoothing, quantization, summation) with an independent dict-and-loop
# construction (oracles.py).
#
# Integer-exact contract, same as the LM above: per-bucket scores are
# quantized micro-nats, ``qlog(p_cnt+1, p_tot+NB) - qlog(q_cnt+1,
# q_tot+NB)`` (add-one smoothing over the bucket space), computed ONCE on
# the driver from exact integer counts; per-document weights are integer
# sums of those scores, so batch boundaries and float summation order
# cannot move a single bit.
#
# Scale shape (100 TB):
# - counts pass: per-batch bincount into two length-NB int64 arrays
#   (raw + target), packed as ONE blob row per batch — the exchange is
#   O(batches) 64 KiB rows into a single-task sum, never a per-key
#   shuffle (the key space is bounded at NB);
# - score table: O(NB) ints, broadcast once via ray.put;
# - scoring pass: map-only — re-hash, gather scores, one bincount
#   segment-sum per batch.  Nothing corpus-proportional on the driver.

DSIR_NB = 4096
DSIR_B = 1099511628211  # FNV-64 prime (webtext._SPAN_HASH_B)
DSIR_TARGET_LANG = "en"


def _dsir_buckets(texts: pd.Series):
    """(doc_index, bucket) per hashed feature — all unigrams then all
    bigrams of the pinned ``\\S+`` tokens.  Returns ``None`` for a
    tokenless batch."""
    from .webtext import _flat_tokens

    tok = _flat_tokens(texts)
    if tok is None:
        return None
    n_tok, doc, tok_id, uniq, starts = tok
    th = pd.util.hash_array(uniq.astype(object))[tok_id]
    total = len(th)
    uni = th % np.uint64(DSIR_NB)
    pos_in_doc = np.arange(total, dtype=np.int64) - starts[doc]
    i = np.nonzero(pos_in_doc <= n_tok[doc] - 2)[0]
    bi = (th[i] + th[i + 1] * np.uint64(DSIR_B)) % np.uint64(DSIR_NB)
    return (
        np.concatenate([doc, doc[i]]),
        np.concatenate([uni, bi]).astype(np.int64),
    )


def _qlog_table(p_cnt: np.ndarray, p_tot: int,
                q_cnt: np.ndarray, q_tot: int) -> np.ndarray:
    """Per-bucket quantized log-ratio scores from exact integer counts."""
    return np.array(
        [
            _qlog_micro(int(p_cnt[b]) + 1, p_tot + DSIR_NB)
            - _qlog_micro(int(q_cnt[b]) + 1, q_tot + DSIR_NB)
            for b in range(DSIR_NB)
        ],
        dtype=np.int64,
    )


def dsir_weights(sf_dir: str) -> rd.Dataset:
    """Per-document DSIR importance weight over the documents table:
    (doc_id, n_features, dsir_logw_micro) — n_features the hashed
    unigram+bigram count, dsir_logw_micro the integer micro-nat
    log-likelihood ratio (positive = looks like the target slice)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        q = np.zeros(DSIR_NB, dtype=np.int64)
        p = np.zeros(DSIR_NB, dtype=np.int64)
        r = _dsir_buckets(df["text"].fillna("").reset_index(drop=True))
        if r is not None:
            doc, buckets = r
            q = np.bincount(buckets, minlength=DSIR_NB).astype(np.int64)
            en = (
                df["lang"].reset_index(drop=True) == DSIR_TARGET_LANG
            ).to_numpy()
            p = np.bincount(
                buckets[en[doc]], minlength=DSIR_NB
            ).astype(np.int64)
        return pd.DataFrame({"q": [q.tobytes()], "p": [p.tobytes()]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        q = np.frombuffer(b"".join(g["q"]), dtype=np.int64).reshape(
            -1, DSIR_NB
        ).sum(axis=0)
        p = np.frombuffer(b"".join(g["p"]), dtype=np.int64).reshape(
            -1, DSIR_NB
        ).sum(axis=0)
        return pd.DataFrame({"q": [q.tobytes()], "p": [p.tobytes()]})

    row = (
        ds.map_batches(counts, batch_format="pandas", batch_size=1024)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    q_cnt = np.frombuffer(row["q"].iloc[0], dtype=np.int64)
    p_cnt = np.frombuffer(row["p"].iloc[0], dtype=np.int64)
    score_ref = ray.put(
        _qlog_table(p_cnt, int(p_cnt.sum()), q_cnt, int(q_cnt.sum()))
    )

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        n_features = np.zeros(n, dtype=np.int64)
        logw = np.zeros(n, dtype=np.int64)
        r = _dsir_buckets(df["text"].fillna("").reset_index(drop=True))
        if r is not None:
            sc = ray.get(score_ref)
            doc, buckets = r
            n_features = np.bincount(doc, minlength=n).astype(np.int64)
            # pure-int64 segment sum: a float64-weighted bincount would
            # lose low bits past 2^53 on pathologically long documents
            # (hundreds of MB), silently breaking the bit-exact oracle
            # contract — np.add.at keeps it unconditional
            np.add.at(logw, doc, sc[buckets])
        return pd.DataFrame(
            {"doc_id": df["doc_id"].reset_index(drop=True).astype("int64"),
             "n_features": n_features, "dsir_logw_micro": logw}
        )

    return ds.map_batches(score_batch, batch_format="pandas", batch_size=1024)


# ----------------------------------------------------------- dsir_resample

DSIR_RESAMPLE_K = 100


def _gumbel_micro(doc_ids) -> np.ndarray:
    """Deterministic per-doc Gumbel noise in integer micro-nats: the
    uniform is seeded from the pinned md5-number of ``dsir-gumbel:{id}``
    (``u = (v + 0.5) / 2^64``, clamped below 1.0 — the quotient itself
    ROUNDS to exactly 1.0 for v in the top ~2^10 of the range, p ≈
    5.5e-17 per doc but a hard task crash at trillion-doc scale), then
    ``floor(-ln(-ln(u)) * 1e6 + 0.5)`` with ``math.log`` per value —
    the same one-float64-quotient discipline as ``_qlog_micro``, so the
    serial oracle reproduces every bit (identical clamp line there)."""
    from .export import md5_number_lower

    out = np.empty(len(doc_ids), dtype=np.int64)
    for i, d in enumerate(doc_ids):
        v = md5_number_lower(f"dsir-gumbel:{int(d)}")
        u = min((v + 0.5) / 2.0 ** 64, 1.0 - 2.0 ** -53)
        out[i] = int(math.floor(-math.log(-math.log(u)) * LM_QSCALE + 0.5))
    return out


def dsir_resample(sf_dir: str, n_keep: int = DSIR_RESAMPLE_K) -> pd.DataFrame:
    """DSIR step 2 — importance RESAMPLING via Gumbel-top-k (sampling
    ``n_keep`` docs without replacement with probability ∝ exp(logw),
    the standard Gumbel-max construction): keep the top ``n_keep`` docs
    by ``dsir_logw_micro + gumbel_micro`` (deterministic seeded noise,
    doc_id tie-break).  Emits (doc_id, dsir_logw_micro, gumbel_micro,
    score_micro) for the kept set.

    Scale shape: the weights pass is `dsir_weights` (map-only after a
    bounded counts merge); the selection is distributed top-k without a
    global sort — each batch keeps its local top-``n_keep``, the driver
    merges O(batches × k) survivor rows (the ``top_docs`` shape)."""
    scored = dsir_weights(sf_dir)

    def add_score(df: pd.DataFrame) -> pd.DataFrame:
        g = _gumbel_micro(df["doc_id"].to_numpy(dtype=np.int64))
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "dsir_logw_micro": df["dsir_logw_micro"].astype("int64"),
             "gumbel_micro": g}
        )
        out["score_micro"] = out["dsir_logw_micro"] + out["gumbel_micro"]
        return out

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["score_micro", "doc_id"], ascending=[False, True]
        ).head(n_keep)

    parts = (
        scored.map_batches(add_score, batch_format="pandas",
                           batch_size=8192)
        .map_batches(local_topk, batch_format="pandas", batch_size=65536)
        .to_pandas()
    )
    return (
        parts.sort_values(["score_micro", "doc_id"], ascending=[False, True])
        .head(n_keep)
        .reset_index(drop=True)
    )


# ------------------------------------------------------ token_budget_mix

TBM_SHIFT = 13          # histogram bucket = norm_micro >> 13 (8192 µnats)
TBM_BUDGET_DEN = 3      # default budget: a third of the eligible bigrams
TBM_TIE_CAP = 1_000_000


def token_budget_mix(sf_dir: str, budget: Optional[int] = None) -> rd.Dataset:
    """CCNet's "take the head until the token budget is spent": keep the
    best-scoring documents (highest ``norm_micro``, doc_id tie-break)
    while the cumulative bigram count stays within ``budget`` (default:
    ``Σ n_bigrams // 3`` over eligible docs).  Per eligible doc:
    (doc_id, norm_micro, n_bigrams, keep).

    A GLOBAL ordered prefix-sum cutoff computed WITHOUT a global sort —
    the shape Ray Data lacks natively:

    1. score once (map-only under the broadcast model) and materialize
       the compact (doc_id, n_bigrams, norm_micro) projection;
    2. histogram pass: per-batch partial sums over ``norm_micro >>
       TBM_SHIFT`` buckets (arithmetic shift = floor on negatives;
       bounded key space), one-task merge — the driver walks buckets
       best-first to find the BOUNDARY bucket;
    3. refine pass: exact per-norm sums inside the boundary bucket only
       (≤ 2**TBM_SHIFT distinct values) — the exact threshold t*;
    4. tie pass: fetch only docs at exactly t* (size-gated; ties at one
       exact micro-nat are rare), rank by doc_id, place the cut;
    5. gate pass: map-only ``keep = norm > t* OR (norm == t* AND
       doc_id ≤ cut)``.

    Docs under 2 tokens have ``n_bigrams == 0`` and ``norm_micro == 0``
    ("perfect" only by convention), so they are EXCLUDED — the same
    eligibility rule as ``ccnet_tiers``.  All arithmetic is int64, so
    the oracle — a window cumulative sum over the independent serial
    ``lm_perplexity`` snapshot, blind to the bucket machinery — matches
    bit-for-bit.
    """
    model = build_model(sf_dir)

    def compact(df: pd.DataFrame) -> pd.DataFrame:
        f = df[df["n_bigrams"].to_numpy(dtype=np.int64) > 0]
        return f[["doc_id", "n_bigrams", "norm_micro"]]

    base = _scored_ds(sf_dir, model).map_batches(
        compact, batch_format="pandas", batch_size=4096
    ).materialize()

    def _merge(key):
        def m(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(key, as_index=False).sum()

        return m

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"bucket": df["norm_micro"].to_numpy(np.int64) >> TBM_SHIFT,
             "cost": df["n_bigrams"].to_numpy(np.int64),
             "n": 1}
        ).groupby("bucket", as_index=False).sum()

    hist = (
        base.map_batches(hist_partial, batch_format="pandas",
                         batch_size=8192)
        .repartition(1)
        .map_batches(_merge("bucket"), batch_format="pandas",
                     batch_size=None)
        .to_pandas()
        .sort_values("bucket", ascending=False)
        .reset_index(drop=True)
    )
    total = int(hist["cost"].sum())
    b = total // TBM_BUDGET_DEN if budget is None else int(budget)
    cum = hist["cost"].cumsum()
    over = cum > b
    if not bool(over.any()):
        t_norm, cut_id = np.int64(-(2 ** 62)), np.int64(-1)  # all keep
    else:
        bi = int(over.idxmax())
        boundary = int(hist["bucket"].iloc[bi])
        before = int(cum.iloc[bi - 1]) if bi > 0 else 0

        def refine(df: pd.DataFrame) -> pd.DataFrame:
            nm = df["norm_micro"].to_numpy(np.int64)
            f = df[(nm >> TBM_SHIFT) == boundary]
            return pd.DataFrame(
                {"norm_micro": f["norm_micro"].to_numpy(np.int64),
                 "cost": f["n_bigrams"].to_numpy(np.int64),
                 "n": 1}
            ).groupby("norm_micro", as_index=False).sum()

        fine = (
            base.map_batches(refine, batch_format="pandas", batch_size=8192)
            .repartition(1)
            .map_batches(_merge("norm_micro"), batch_format="pandas",
                         batch_size=None)
            .to_pandas()
            .sort_values("norm_micro", ascending=False)
            .reset_index(drop=True)
        )
        cum2 = before + fine["cost"].cumsum()
        fi = int((cum2 > b).idxmax())  # guaranteed: cum2 ends > b
        t_norm = np.int64(fine["norm_micro"].iloc[fi])
        before_t = int(cum2.iloc[fi - 1]) if fi > 0 else before
        if int(fine["n"].iloc[fi]) > TBM_TIE_CAP:
            raise ValueError(
                f"token_budget_mix: {int(fine['n'].iloc[fi])} docs tie at "
                f"norm_micro={int(t_norm)} (cap {TBM_TIE_CAP}); a corpus "
                "this degenerate needs a finer score, not a bigger driver"
            )

        def tie_rows(df: pd.DataFrame) -> pd.DataFrame:
            f = df[df["norm_micro"].to_numpy(np.int64) == t_norm]
            return f[["doc_id", "n_bigrams"]]

        tdf = (
            base.map_batches(tie_rows, batch_format="pandas",
                             batch_size=8192)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        adm = (before_t + tdf["n_bigrams"].cumsum()) <= b
        cut_id = (
            np.int64(tdf["doc_id"][adm].iloc[-1]) if bool(adm.any())
            else np.int64(-1)
        )

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["norm_micro"].to_numpy(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        keep = (nm > t_norm) | ((nm == t_norm) & (ids <= cut_id))
        return pd.DataFrame(
            {"doc_id": ids, "norm_micro": nm,
             "n_bigrams": df["n_bigrams"].to_numpy(np.int64),
             "keep": keep.astype(np.int64)}
        )

    return base.map_batches(gate, batch_format="pandas", batch_size=8192)
