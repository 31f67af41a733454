"""Training-data EXPORT operators over the curated corpus — the last
mile of a pretraining pipeline: deterministic shard assignment (the
zero-shuffle alternative to ``random_shuffle``) and fixed-token-budget
sequence packing.

Scale shapes:

- ``shard_export`` is MAP-ONLY + a tiny manifest merge: every document's
  shard is a pure function of its url (``md5_number_lower(url) % N``),
  so no all-to-all exchange ever happens — the writer emits
  ``shard=K/`` files directly from each map task, and what moves is one
  manifest partial row per (batch, shard).  Contrast with
  ``ds.random_shuffle()``: a full O(corpus) exchange whose only benefit
  is randomness that a hash of a unique key already provides.  The
  manifest (count, chars, order-independent xor checksum) makes a
  partial export verifiable and resumable per shard.
- ``pack_sequences`` shuffles only (url, token_count) pairs — a few
  dozen bytes per document — keyed by a coarse url-hash partition; the
  packing itself is one vectorized sort + prefix sum per partition.

Pinned cross-engine identities (shared with the DuckDB SQL oracles):

- ``md5_number_lower(s)`` ≡ ``int.from_bytes(md5(s).digest()[8:],
  "little")`` — pinned by ``tests/test_export.py`` against DuckDB.
- token count = occurrences of the pinned ASCII token class
  (``TOKEN_RE`` ≡ RE2 ``\\S+``).
- pack assignment = EXCLUSIVE prefix sum of token counts (docs ordered
  by url within their partition) integer-divided by the budget — the
  "budget-aligned greedy with overflow" convention: a document that
  crosses a boundary belongs to the pack its first token falls in, and
  packs may overflow by at most one document's tail.  This is the
  SQL-window-expressible form of greedy packing (exact greedy bin
  packing needs a running reset that plain window functions cannot
  express).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

from .common import TOKEN_RE
from .webtext import _read_corpus

N_SHARDS = 64
PACK_BUDGET = 2048
PACK_PARTS = 32


def md5_number_lower(s: str) -> int:
    """DuckDB ``md5_number_lower`` semantics (the low 64 bits of the
    md5 digest as a little-endian integer)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def _md5_lower_arr(vals) -> np.ndarray:
    return np.fromiter(
        (md5_number_lower(v) for v in vals), dtype=np.uint64, count=len(vals)
    )


# ---------------------------------------------------------- shard_export


def shard_export(sf_dir: str, n_shards: int = N_SHARDS) -> rd.Dataset:
    """Per-shard export manifest: (shard_id, n_docs, sum_chars,
    checksum) where ``checksum`` is the ``bit_xor`` of each document's
    content id ``md5_number_lower(url || '\\n' || text)`` — order
    independent, so any parallel writer placement verifies."""
    ds = _read_corpus(sf_dir, ["url", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        shard = (_md5_lower_arr(df["url"]) % np.uint64(n_shards)).astype(
            np.int64
        )
        content = _md5_lower_arr(
            [u + "\n" + x for u, x in zip(df["url"], t)]
        )
        f = pd.DataFrame(
            {"shard_id": shard,
             "n_docs": np.ones(len(df), dtype=np.int64),
             "sum_chars": t.str.len().to_numpy(np.int64),
             "checksum": content}
        )
        return _merge_manifest(f)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .repartition(1)
        .map_batches(_merge_manifest, batch_format="pandas", batch_size=None)
    )


def _merge_manifest(f: pd.DataFrame) -> pd.DataFrame:
    return f.groupby("shard_id", as_index=False).agg(
        n_docs=("n_docs", "sum"),
        sum_chars=("sum_chars", "sum"),
        checksum=(
            "checksum",
            lambda s: np.bitwise_xor.reduce(s.to_numpy(dtype=np.uint64)),
        ),
    )


def shard_export_write(sf_dir: str, out_dir: str,
                       n_shards: int = N_SHARDS) -> pd.DataFrame:
    """Actually write the shards: hive-partitioned parquet
    (``shard_id=K/``) straight from the map tasks — no shuffle; a
    failed export resumes by diffing written shards against the
    manifest.  Returns the manifest."""
    ds = _read_corpus(sf_dir, ["url", "text"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["shard_id"] = (
            _md5_lower_arr(df["url"]) % np.uint64(n_shards)
        ).astype(np.int64)
        return out

    ds.map_batches(tag, batch_format="pandas", batch_size=4096).write_parquet(
        out_dir, partition_cols=["shard_id"]
    )
    return shard_export(sf_dir, n_shards=n_shards).to_pandas()


# --------------------------------------------------------- pack_sequences


def pack_sequences(sf_dir: str, budget: int = PACK_BUDGET,
                   n_parts: int = PACK_PARTS) -> rd.Dataset:
    """Fixed-token-budget sequence packing: documents are dealt into
    ``n_parts`` url-hash partitions; within a partition (docs ordered
    by url) ``pack_id = exclusive_prefix_tokens // budget``.  Output is
    one row per pack: (upart, pack_id, n_docs, sum_tokens)."""
    ds = _read_corpus(sf_dir, ["url", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        return pd.DataFrame(
            {"url": df["url"],
             "tokens": t.str.count(TOKEN_RE).to_numpy(np.int64),
             "upart": (_md5_lower_arr(df["url"]) % np.uint64(n_parts)).astype(
                 np.int64
             )}
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("url", kind="mergesort").reset_index(drop=True)
        prefix = g["tokens"].cumsum().shift(fill_value=0)
        pid = (prefix // budget).astype(np.int64)
        out = pd.DataFrame(
            {"upart": g["upart"],
             "pack_id": pid,
             "n_docs": np.ones(len(g), dtype=np.int64),
             "sum_tokens": g["tokens"]}
        )
        return out.groupby(["upart", "pack_id"], as_index=False).sum()

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby("upart")
        .map_groups(pack, batch_format="pandas")
    )
