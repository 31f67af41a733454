"""Similarity search over the ``embeddings`` table (``list<float>``).

- brute-force cosine top-k: broadcast query matrix (``ray.put`` once),
  per-batch numpy matmul partials, tiny final merge — the baseline
- IVF-bucketed variant: coarse k-means-style bucketing by nearest of B
  deterministic centroids; queries probe only nearby buckets — the scale
  path (documented recall trade-off)
- embedding near-dup: all-pairs cosine ≥ threshold via per-batch matmul
  against the broadcast matrix (feasible when one side fits memory; at
  10^12 scale swap in the IVF bucketing)

Similarities are rounded to 6 decimals before ranking with doc-id
tie-breaks, so rankings are reproducible bit-for-bit across engines
(numpy vs DuckDB evaluate the same rounded keys).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray

from .common import read_table


def _embedding_matrix(sf_dir: str) -> tuple:
    """Full table → driver matrix.  Used only where one side must be dense
    in memory (near-dup broadcast side, centroid fit); at 10^12 scale the
    centroid fit samples and the broadcast side becomes the IVF index."""
    t = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).to_pandas()
    ids = t["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def _query_vectors(sf_dir: str, n_queries: int) -> tuple:
    """The ``n_queries`` smallest vec_ids and their vectors, selected
    distributed: each batch keeps its local min-k, the driver merges
    O(batches × k) survivors — the full table never lands on the driver."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def local_min(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nsmallest(n_queries, "vec_id")

    parts = ds.map_batches(
        local_min, batch_format="pandas", batch_size=4096
    ).to_pandas()
    sel = parts.nsmallest(n_queries, "vec_id").sort_values("vec_id")
    ids = sel["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(sel["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def ann_topk(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 10,
) -> pd.DataFrame:
    """Brute-force cosine top-k: queries = the ``n_queries`` smallest
    vec_ids; neighbors = all other vectors.  Output (query_id, rank,
    neighbor_id), rank 1-based.

    The query matrix is broadcast once (``ray.put``); each batch of the
    corpus side computes its local top-k partial with one matmul; partials
    (n_queries × k rows each) merge on the driver.  No shuffle.
    """
    q_ids, q_raw = _query_vectors(sf_dir, n_queries)
    q_mat = _normalize(q_raw)
    q_ref = ray.put((q_ids, q_mat))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qmat = ray.get(q_ref)
        bids = batch["vec_id"].to_numpy(dtype=np.int64)
        bmat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = np.round(qmat @ bmat.T, 6)  # (n_queries, batch)
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(len(qids)):
            mask = bids != qids[qi]
            s = sims[qi][mask]
            nb = bids[mask]
            if len(s) == 0:
                continue
            take = min(k, len(s))
            # partial top-k with (−sim, id) lexicographic tie-break
            sel = np.lexsort((nb, -s))[:take]
            rows["query_id"].extend([int(qids[qi])] * take)
            rows["neighbor_id"].extend(int(x) for x in nb[sel])
            rows["sim"].extend(float(x) for x in s[sel])
        return pd.DataFrame(rows)

    partials = ds.map_batches(local_topk, batch_format="pandas", batch_size=4096).to_pandas()
    out_rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            out_rows.append((int(qid), rank, int(r["neighbor_id"])))
    out = pd.DataFrame(out_rows, columns=["query_id", "rank", "neighbor_id"])
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """All pairs (a < b) with rounded cosine ≥ threshold.  (The synthetic
    embeddings carry no true near-dups — max pairwise cosine ≈ 0.51 at
    sf0.01 — so the default threshold is set where pairs exist; the
    operator is threshold-agnostic.)"""
    ids, mat = _embedding_matrix(sf_dir)
    ref = ray.put((ids, _normalize(mat)))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(ref)
        bids = batch["vec_id"].to_numpy(dtype=np.int64)
        bmat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = np.round(bmat @ all_mat.T, 6)
        ai, bj = np.nonzero(sims >= threshold)
        a = bids[ai]
        b = all_ids[bj]
        keep = a < b  # dedupe symmetric pairs + drop self
        return pd.DataFrame({"a": a[keep], "b": b[keep]})

    out = ds.map_batches(pairs, batch_format="pandas", batch_size=4096).to_pandas()
    if out.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    return out.sort_values(["a", "b"]).reset_index(drop=True).astype("int64")


# --------------------------------------------------------------- IVF index


def _centroids(mat: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic coarse centroids: k-means with fixed seeding and a
    fixed small iteration count (no convergence-dependent branching)."""
    rng = np.random.RandomState(0xC3)
    idx = rng.choice(len(mat), size=min(n_buckets, len(mat)), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(5):
        assign = np.argmax(_normalize(mat) @ _normalize(cent).T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ann_topk_ivf(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 10,
    n_buckets: int = 8,
    n_probe: int = 2,
) -> pd.DataFrame:
    """IVF-bucketed approximate top-k: vectors are assigned to their
    nearest coarse centroid inside ``map_batches``; each query scans only
    its ``n_probe`` nearest buckets.  At corpus scale the bucket column is
    the partition key (co-locate one bucket per block); here the pruning
    happens per batch.  Returns the same (query_id, rank, neighbor_id)
    shape as :func:`ann_topk` — recall < 1.0 by design."""
    _, mat = _embedding_matrix(sf_dir)  # centroid fit (sampled at scale)
    cent = _centroids(mat, n_buckets)
    q_ids, q_raw = _query_vectors(sf_dir, n_queries)
    q_mat = _normalize(q_raw)
    q_buckets = np.argsort(-(q_mat @ _normalize(cent).T), axis=1)[:, :n_probe]
    ref = ray.put((q_ids, q_mat, _normalize(cent), q_buckets))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qmat, ncent, qbk = ray.get(ref)
        bids = batch["vec_id"].to_numpy(dtype=np.int64)
        bmat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        assign = np.argmax(bmat @ ncent.T, axis=1)
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(len(qids)):
            probe_mask = np.isin(assign, qbk[qi]) & (bids != qids[qi])
            if not probe_mask.any():
                continue
            nb = bids[probe_mask]
            s = np.round(qmat[qi] @ bmat[probe_mask].T, 6)
            take = min(k, len(s))
            sel = np.lexsort((nb, -s))[:take]
            rows["query_id"].extend([int(qids[qi])] * take)
            rows["neighbor_id"].extend(int(x) for x in nb[sel])
            rows["sim"].extend(float(x) for x in s[sel])
        return pd.DataFrame(rows)

    partials = ds.map_batches(local, batch_format="pandas", batch_size=4096).to_pandas()
    out_rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            out_rows.append((int(qid), rank, int(r["neighbor_id"])))
    return (
        pd.DataFrame(out_rows, columns=["query_id", "rank", "neighbor_id"])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


# ------------------------------------------------------------------ k-means


def embedding_kmeans(sf_dir: str, k: int = 8, iters: int = 5) -> pd.DataFrame:
    """Distributed k-means over the embedding column (spherical: cosine
    assignment).  Each iteration broadcasts the centroids once
    (``ray.put``) and reduces per-batch partial (sum-vector, count) pairs
    on the driver — O(k·d·n_batches) driver bytes per iteration, never the
    data.  Deterministic: init = the k smallest vec_ids' vectors, fixed
    iteration count, no convergence branching.  Returns (vec_id,
    cluster_id) for every vector — the scale path that IVF bucketing
    (:func:`ann_topk_ivf`) plugs into.  Not SQL-expressible (iterative);
    covered by pytest determinism + assignment-quality checks."""
    _, init = _query_vectors(sf_dir, k)
    cent = _normalize(init)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            bmat = _normalize(
                np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            )
            assign = np.argmax(bmat @ c.T, axis=1)
            rows = []
            for ci in np.unique(assign):
                member = bmat[assign == ci]
                rows.append(
                    {
                        "cluster": int(ci),
                        "count": int(len(member)),
                        "vsum": member.sum(axis=0).tolist(),
                    }
                )
            return pd.DataFrame(rows)

        parts = ds.map_batches(
            partial, batch_format="pandas", batch_size=4096
        ).to_pandas()
        new = cent.copy()
        for ci in range(len(cent)):
            sel = parts[parts["cluster"] == ci]
            if len(sel):
                total = np.sum(np.stack(sel["vsum"].to_numpy()), axis=0)
                n = int(sel["count"].sum())
                new[ci] = total / n
        cent = _normalize(new)

    final_ref = ray.put(cent)

    def assign_batch(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(final_ref)
        bmat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].astype("int64"),
                "cluster_id": np.argmax(bmat @ c.T, axis=1).astype("int64"),
            }
        )

    out = ds.map_batches(assign_batch, batch_format="pandas", batch_size=4096).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)
