"""Deduplication ops over the ``documents`` table.

- exact: content-hash → hash-partitioned groupby → first per group (the
  canonical exact-dedup shuffle, over 16-byte hashes rather than texts)
- minhash-LSH: shingle → 128-perm minhash → banded buckets → candidate
  pairs → Jaccard verify → connected components (near-dup clusters)
- simhash: 64-bit simhash per doc (Hamming-proximity fingerprint)
- n-gram Jaccard verify is shared by the LSH path

Determinism: every hash is derived from blake2b/md5 of content — no
``hash()``, no seed dependence — so results are identical across runs and
partitionings.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Set, Tuple

import numpy as np
import pandas as pd

import ray.data as rd

from .common import read_table

_MERSENNE = (1 << 61) - 1


def _hash64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


# ------------------------------------------------------------- exact dedup


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """One row per distinct text: the smallest doc_id and the duplicate
    count.  The shuffle key is the 16-hex-char content hash (added
    vectorized in ``map_batches``), so at corpus scale the exchange moves
    (hash, doc_id) pairs, never documents."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "h": batch["text"].fillna("").map(
                    lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()[:16]
                ),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pandas", batch_size=8192)

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": [int(g["doc_id"].min())], "n_dups": [int(len(g))]}
        )

    return hashed.groupby("h").map_groups(first_per_group, batch_format="pandas")


# ----------------------------------------------------------------- minhash

N_PERMS = 128
N_BANDS = 16  # 16 bands × 8 rows
ROWS_PER_BAND = N_PERMS // N_BANDS
SHINGLE_K = 3  # word 3-grams


def _minhash_params() -> Tuple[np.ndarray, np.ndarray]:
    """Fixed (a, b) permutation parameters derived from a seeded generator
    (deterministic across processes)."""
    rng = np.random.RandomState(0x1A7A5)
    a = rng.randint(1, _MERSENNE, size=N_PERMS, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=N_PERMS, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingles(text: str, k: int = SHINGLE_K) -> Set[int]:
    words = text.split()
    if len(words) < k:
        return {_hash64(" ".join(words).encode("utf-8"))} if words else set()
    return {
        _hash64(" ".join(words[i: i + k]).encode("utf-8"))
        for i in range(len(words) - k + 1)
    }


class MinHashStage:
    """Actor-pool minhash stage: permutation tables built once per actor."""

    def __init__(self) -> None:
        self.a, self.b = _minhash_params()

    def signature(self, shingle_hashes: Set[int]) -> np.ndarray:
        if not shingle_hashes:
            return np.zeros(N_PERMS, dtype=np.uint64)
        x = np.fromiter(shingle_hashes, dtype=np.uint64)
        # (a*x + b) mod p for every perm — outer product, vectorized
        vals = (np.outer(self.a, x) + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Emit (band_id, band_hash, doc_id) rows — the LSH bucket keys."""
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            sig = self.signature(_shingles(text))
            for band in range(N_BANDS):
                chunk = sig[band * ROWS_PER_BAND: (band + 1) * ROWS_PER_BAND]
                bh = _hash64(chunk.tobytes())
                out_doc.append(int(doc_id))
                out_band.append(band)
                out_hash.append(bh - (1 << 63))  # center into int64
        return pd.DataFrame(
            {"doc_id": out_doc, "band_id": out_band, "band_hash": out_hash}
        )


def minhash_buckets(sf_dir: str) -> rd.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(MinHashStage, batch_format="pandas", batch_size=4096,
                          concurrency=(1, 4))


def jaccard(a: Set[int], b: Set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def minhash_dedup(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """Near-dup clusters: LSH buckets → candidate pairs → exact Jaccard
    verify → connected components.  Returns (doc_id, cluster_id) where
    cluster_id = min doc_id of the component.

    Scale notes: bucket grouping is a groupby over (band_id, band_hash)
    keys; candidate pairs are a tiny fraction of the corpus (banding
    guarantees most docs are singletons), so the verify + union-find runs
    on the collected candidate edges only — documents never all-gather.
    """
    buckets = minhash_buckets(sf_dir)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(d) for d in set(g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    cand = (
        buckets.groupby(["band_id", "band_hash"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )

    # verify candidates with exact shingle Jaccard (re-read only the docs
    # that appear in candidate pairs — a semi-join via broadcast id set)
    need = sorted(set(cand["a"]).union(set(cand["b"]))) if len(cand) else []
    shingle_map: Dict[int, Set[int]] = {}
    if need:
        need_set = set(need)
        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

        def keep(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["doc_id"].isin(need_set)]

        kept = docs.map_batches(keep, batch_format="pandas").to_pandas()
        for doc_id, text in zip(kept["doc_id"], kept["text"].fillna("")):
            shingle_map[int(doc_id)] = _shingles(text)

    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b in zip(cand.get("a", []), cand.get("b", [])):
        if jaccard(shingle_map[int(a)], shingle_map[int(b)]) >= threshold:
            union(int(a), int(b))

    all_ids = read_table(sf_dir, "documents", columns=["doc_id"]).to_pandas()
    out = pd.DataFrame(
        {
            "doc_id": all_ids["doc_id"].astype("int64"),
            "cluster_id": [find(int(d)) for d in all_ids["doc_id"]],
        }
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ----------------------------------------------------------------- simhash


class SimHashStage:
    """64-bit simhash over word features, weights = term frequency."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(batch), dtype=np.int64)
        for i, text in enumerate(batch["text"].fillna("")):
            words = text.split()
            if not words:
                out[i] = 0
                continue
            acc = np.zeros(64, dtype=np.int64)
            freq: Dict[str, int] = {}
            for w in words:
                freq[w] = freq.get(w, 0) + 1
            for w, f in freq.items():
                h = _hash64(w.encode("utf-8"))
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), f, -f)
            sig = np.uint64(0)
            for bit in range(64):
                if acc[bit] > 0:
                    sig |= np.uint64(1) << np.uint64(bit)
            out[i] = int(sig.astype(np.int64))
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": out})


def simhash_fingerprints(sf_dir: str) -> rd.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(SimHashStage, batch_format="pandas", batch_size=4096,
                          concurrency=(1, 4))


def ngram_jaccard_pairs(
    sf_dir: str, ids_a: List[int], ids_b: List[int]
) -> pd.DataFrame:
    """Exact word-shingle Jaccard for given id pairs (the verify kernel,
    exposed standalone)."""
    need = set(ids_a) | set(ids_b)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["doc_id"].isin(need)]

    kept = docs.map_batches(keep, batch_format="pandas").to_pandas()
    sh = {int(d): _shingles(t) for d, t in zip(kept["doc_id"], kept["text"].fillna(""))}
    sims = [jaccard(sh[a], sh[b]) for a, b in zip(ids_a, ids_b)]
    return pd.DataFrame({"a": ids_a, "b": ids_b, "jaccard": sims})


def ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    """Fixed-pair word-3-gram Jaccard similarity — the ``queries()`` face
    of :func:`ngram_jaccard_pairs` (pairs (2i, 2i+1) over doc_ids 0..99,
    present at every scale factor; SQL-oracle-verifiable since Jaccard
    over hashed shingles equals Jaccard over the shingle strings)."""
    ids_a = [2 * i for i in range(50)]
    ids_b = [2 * i + 1 for i in range(50)]
    out = ngram_jaccard_pairs(sf_dir, ids_a, ids_b)
    out["jaccard"] = out["jaccard"].round(6)
    return out


def simhash_neardup(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs: (a, b, hamming) for all doc pairs whose
    64-bit simhash fingerprints differ in ≤ ``max_hamming`` bits.

    Exact via banded LSH (pigeonhole): the fingerprint is split into
    ``max_hamming + 1`` bit-bands; any pair within the radius must agree
    on at least one whole band, so candidates are pairs sharing a
    (band_id, band_value) bucket — a tiny groupby over (band, value,
    doc_id) rows, never documents — then candidates are verified by
    popcount.  Same shuffle shape as MinHash-LSH banding.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands

    fp = simhash_fingerprints(sf_dir)

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sig = batch["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        rows = {"band_id": [], "band_val": [], "doc_id": [], "simhash": []}
        for b in range(n_bands):
            lo = b * width
            hi = 64 if b == n_bands - 1 else lo + width
            mask = (np.uint64(1) << np.uint64(hi - lo)) - np.uint64(1)
            val = (sig >> np.uint64(lo)) & mask
            rows["band_id"].extend([b] * len(sig))
            rows["band_val"].extend(val.view(np.int64).tolist())
            rows["doc_id"].extend(batch["doc_id"].astype("int64").tolist())
            rows["simhash"].extend(sig.view(np.int64).tolist())
        return pd.DataFrame(rows)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uniq = sorted(set(zip(g["doc_id"].astype(int), g["simhash"].astype(int))))
        out_a, out_b, out_h = [], [], []
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                (a, sa), (b, sb) = uniq[i], uniq[j]
                h = int(bin((sa ^ sb) & ((1 << 64) - 1)).count("1"))
                if h <= max_hamming:
                    out_a.append(a)
                    out_b.append(b)
                    out_h.append(h)
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    cand = (
        fp.map_batches(to_bands, batch_format="pandas", batch_size=4096)
        .groupby(["band_id", "band_val"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "hamming": pd.Series(dtype="int64")}
        )
    out = cand.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)
    return out.astype("int64")
