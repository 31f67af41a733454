"""Serial oracles for the ops whose semantics plain ANSI SQL cannot
express (LSH dedup, simhash, lang-id, IVF-ANN, k-means, fingerprints,
media stages).

Each oracle is an independent SERIAL implementation (pure-Python masked
integer arithmetic where the engine uses numpy uint64 wraparound; full
in-memory numpy where the engine streams batches) that writes a parquet
snapshot under ``/tmp/latyas_ray/oracle/{sf}/{name}.parquet``.  The
driver's ``oracle_sql()`` reads that snapshot with DuckDB while
``queries()`` runs the distributed Ray pipeline — so the driver's
row/schema/value-hash compare is exactly the "distributed output ≡ serial
oracle" invariant, the same mechanism the extraction golden uses
(``golden.py``).  This is a genuine differential check: the serial side
re-derives every hash with ``& MASK64`` Python ints, catching
vectorization bugs in the numpy side (and vice versa).

Shared constants (permutation seeds, band counts, thresholds) are part of
the operator DEFINITION; the computation paths are disjoint.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import struct
from typing import Dict, List, Set

import numpy as np

from .ops.common import ascii_words
import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_BASE = "/tmp/latyas_ray/oracle"
ORACLE_VERSION = 3  # /3: semantic-reflow page cap (SEM_REFLOW_MAX_REGIONS)

_M64 = (1 << 64) - 1
_MERSENNE = (1 << 61) - 1
_GAMMA = 0x9E3779B97F4A7C15
_SM1 = 0xBF58476D1CE4E5B9
_SM2 = 0x94D049BB133111EB


def _bhash(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def _splitmix(x: int) -> int:
    x = (x + _GAMMA) & _M64
    x = ((x ^ (x >> 30)) * _SM1) & _M64
    x = ((x ^ (x >> 27)) * _SM2) & _M64
    return x ^ (x >> 31)


def _mix_step_py(acc: int, wh: int) -> int:
    """Pure-Python replica of ``dedup._mix_step`` (one chain step of the
    shingle hash), masked to uint64 wraparound semantics."""
    return _splitmix(acc ^ ((wh * _GAMMA) & _M64))


def _shingles_py(text: str, k: int = 3) -> Set[int]:
    words = ascii_words(text)
    if not words:
        return set()
    whs = [_bhash(w.encode("utf-8")) for w in words]
    if len(whs) < k:
        acc = 0
        for wh in whs:
            acc = _mix_step_py(acc, wh)
        return {acc}
    out = set()
    for i in range(len(whs) - k + 1):
        acc = 0
        for t in range(k):
            acc = _mix_step_py(acc, whs[i + t])
        out.add(acc)
    return out


def _jaccard_py(a: Set[int], b: Set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _content_hash_py(text: str) -> int:
    return _bhash(text.encode("utf-8")) - (1 << 63)


# ------------------------------------------------------------ io / caching


def _read_docs(sf_dir: str) -> tuple:
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = t.column("doc_id").to_pylist()
    texts = [x if x is not None else "" for x in t.column("text").to_pylist()]
    return ids, texts


def _read_embeddings(sf_dir: str) -> tuple:
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    ids = t["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def oracle_path(sf_label: str, name: str) -> str:
    return os.path.join(ORACLE_BASE, sf_label, f"{name}.parquet")


def ensure_oracle(sf_dir: str, sf_label: str, name: str) -> str:
    """Build (or reuse) the serial-oracle snapshot for one op at one scale
    factor.  Cached by (oracle version, corpus version, extractor
    version, name, sf) — corpus/extractor versions matter for builders
    that read the generated corpus (latex_normalize); including them for
    every oracle costs only a cheap rebuild on version bumps and removes
    the stale-snapshot hazard entirely.  Atomic writes."""
    from . import EXTRACTOR_VERSION
    from .corpus import CORPUS_VERSION

    path = oracle_path(sf_label, name)
    marker = path + ".meta"
    params = {"version": ORACLE_VERSION, "corpus": CORPUS_VERSION,
              "extractor": EXTRACTOR_VERSION, "name": name, "sf": sf_label}
    if os.path.exists(marker) and os.path.exists(path):
        try:
            with open(marker) as f:
                if json.load(f) == params:
                    return path
        except Exception:
            pass
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = _BUILDERS[name](sf_dir)
    pq.write_table(table, path + ".tmp", compression="zstd")
    os.replace(path + ".tmp", path)
    with open(marker + ".tmp", "w") as f:
        json.dump(params, f)
    os.replace(marker + ".tmp", marker)
    return path


# ----------------------------------------------------------------- lang id

_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "para"},
}


def _oracle_lang_id(sf_dir: str) -> pa.Table:
    import re

    word_re = re.compile(r"[a-zA-Z]+")
    ids, texts = _read_docs(sf_dir)
    preds = []
    for text in texts:
        if not text:
            preds.append("und")
            continue
        head = text[:400]
        cjk = sum(1 for ch in head if "一" <= ch <= "鿿")
        if cjk > len(head) * 0.2:
            preds.append("zh")
            continue
        words = [w.lower() for w in word_re.findall(text[:2000])]
        if not words:
            preds.append("und")
            continue
        best, best_hits = "und", 0
        for lang in sorted(_STOPWORDS):
            hits = sum(1 for w in words if w in _STOPWORDS[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        preds.append(best if best_hits > 0 else "en")
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "lang_pred": pa.array(preds)}
    )


# ------------------------------------------------------------ fingerprints


def _oracle_doc_fingerprints(sf_dir: str, window: int = 16) -> pa.Table:
    base = 1099511628211
    weights = [pow(base, window - 1 - j, 1 << 64) for j in range(window)]
    ids, texts = _read_docs(sf_dir)
    mins, md5s = [], []
    for text in texts:
        data = text.encode("utf-8")
        m = int.from_bytes(hashlib.md5(data).digest()[:8], "little", signed=True)
        md5s.append(m)
        if len(data) < window:
            mins.append(m)
            continue
        best = _M64 + 1
        for i in range(len(data) - window + 1):
            h = 0
            for j in range(window):
                h = (h + data[i + j] * weights[j]) & _M64
            if h < best:
                best = h
        mins.append(best - (1 << 64) if best >= (1 << 63) else best)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "min_window_hash": pa.array(mins, pa.int64()),
            "md5_64": pa.array(md5s, pa.int64()),
        }
    )


# ----------------------------------------------------------------- simhash


def _oracle_simhash(sf_dir: str) -> pa.Table:
    ids, texts = _read_docs(sf_dir)
    sigs = []
    for text in texts:
        words = ascii_words(text)
        if not words:
            sigs.append(0)
            continue
        acc = [0] * 64
        freq: Dict[str, int] = {}
        for w in words:
            freq[w] = freq.get(w, 0) + 1
        for w, f in freq.items():
            h = _bhash(w.encode("utf-8"))
            for bit in range(64):
                acc[bit] += f if (h >> bit) & 1 else -f
        sig = 0
        for bit in range(64):
            if acc[bit] > 0:
                sig |= 1 << bit
        sigs.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "simhash": pa.array(sigs, pa.int64())}
    )


# ----------------------------------------------------------------- minhash

_N_PERMS = 128
_N_BANDS = 16
_ROWS_PER_BAND = _N_PERMS // _N_BANDS
_BUCKET_REP_CAP = 64


def _minhash_params_py() -> tuple:
    rng = np.random.RandomState(0x1A7A5)
    a = rng.randint(1, _MERSENNE, size=_N_PERMS, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=_N_PERMS, dtype=np.int64)
    return [int(x) for x in a], [int(x) for x in b]


def _oracle_minhash_dedup(sf_dir: str, threshold: float = 0.8) -> pa.Table:
    A, B = _minhash_params_py()
    ids, texts = _read_docs(sf_dir)

    def signature(sh: Set[int]) -> List[int]:
        if not sh:
            return [0] * _N_PERMS
        out = []
        for j in range(_N_PERMS):
            best = _MERSENNE
            aj, bj = A[j], B[j]
            for x in sh:
                v = (((aj * x) & _M64) + bj) & _M64
                v %= _MERSENNE
                if v < best:
                    best = v
            out.append(best)
        return out

    shingle_sets = {int(d): _shingles_py(t) for d, t in zip(ids, texts)}
    chashes = {int(d): _content_hash_py(t) for d, t in zip(ids, texts)}

    buckets: Dict[tuple, List[tuple]] = {}
    for d in ids:
        sig = signature(shingle_sets[int(d)])
        for band in range(_N_BANDS):
            chunk = sig[band * _ROWS_PER_BAND: (band + 1) * _ROWS_PER_BAND]
            bh = _bhash(struct.pack("<8Q", *chunk)) - (1 << 63)
            buckets.setdefault((band, bh), []).append((int(d), chashes[int(d)]))

    pairs = set()
    for members in buckets.values():
        seen_h: Set[int] = set()
        reps: List[int] = []
        for d, ch in sorted(members):
            if ch in seen_h:
                continue
            seen_h.add(ch)
            reps.append(d)
        if len(reps) > _BUCKET_REP_CAP:
            reps = reps[:_BUCKET_REP_CAP]
        for i in range(len(reps)):
            for j in range(i + 1, len(reps)):
                pairs.add((reps[i], reps[j]))

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

    for a, b in sorted(pairs):
        if _jaccard_py(shingle_sets[a], shingle_sets[b]) >= threshold:
            union(a, b)

    # exact-dup groups follow their representative
    by_hash: Dict[int, List[int]] = {}
    for d in ids:
        by_hash.setdefault(chashes[int(d)], []).append(int(d))

    out_ids, out_cl = [], []
    for d in ids:
        group = by_hash[chashes[int(d)]]
        rep = min(group)
        out_ids.append(int(d))
        out_cl.append(find(rep))
    return pa.table(
        {"doc_id": pa.array(out_ids, pa.int64()),
         "cluster_id": pa.array(out_cl, pa.int64())}
    )


# --------------------------------------------------------------- ivf / ann

_SAMPLE_MAX = 2048
_QUANT_SCALE = 1 << 24


def _sample_mask_py(ids: np.ndarray, frac: float) -> np.ndarray:
    cut = min(1 << 32, int(frac * (1 << 32)))
    keep = np.zeros(len(ids), dtype=bool)
    for i, v in enumerate(ids):
        h = _mix_step_py(0, int(v) & _M64)
        keep[i] = (h & ((1 << 32) - 1)) < cut
    return keep


def _normalize_np(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _centroids_py(mat: np.ndarray, n_buckets: int) -> np.ndarray:
    rng = np.random.RandomState(0xC3)
    idx = rng.choice(len(mat), size=min(n_buckets, len(mat)), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(5):
        assign = np.argmax(
            np.round(_normalize_np(mat) @ _normalize_np(cent).T, 9), axis=1
        )
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def _fit_ivf_py(sf_dir: str, n_buckets: int) -> np.ndarray:
    ids, mat = _read_embeddings(sf_dir)
    frac = min(1.0, _SAMPLE_MAX / max(1, len(ids)))
    smat = mat[_sample_mask_py(ids, frac)]
    return _normalize_np(_centroids_py(smat, n_buckets))


def _oracle_ann_topk_ivf(
    sf_dir: str, n_queries: int = 5, k: int = 10, n_buckets: int = 8,
    n_probe: int = 2,
) -> pa.Table:
    ids, mat = _read_embeddings(sf_dir)
    ncent = _fit_ivf_py(sf_dir, n_buckets)
    nmat = _normalize_np(mat)
    q_idx = np.argsort(ids, kind="stable")[:n_queries]
    q_ids = ids[q_idx]
    q_mat = nmat[q_idx]
    q_buckets = np.argsort(-np.round(q_mat @ ncent.T, 9), axis=1,
                           kind="stable")[:, :n_probe]
    assign = np.argmax(np.round(nmat @ ncent.T, 9), axis=1)

    out_q, out_r, out_n = [], [], []
    for qi in range(len(q_ids)):
        mask = np.isin(assign, q_buckets[qi]) & (ids != q_ids[qi])
        nb = ids[mask]
        s = np.round(q_mat[qi] @ nmat[mask].T, 6)
        sel = np.lexsort((nb, -s))[: min(k, len(nb))]
        for rank, x in enumerate(sel, start=1):
            out_q.append(int(q_ids[qi]))
            out_r.append(rank)
            out_n.append(int(nb[x]))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
        }
    )


def _oracle_embedding_neardup_ivf(
    sf_dir: str, threshold: float = 0.5, n_buckets: int = 8, n_probe: int = 2,
) -> pa.Table:
    ids, mat = _read_embeddings(sf_dir)
    ncent = _fit_ivf_py(sf_dir, n_buckets)
    nmat = _normalize_np(mat)
    order = np.argsort(-np.round(nmat @ ncent.T, 9), axis=1,
                       kind="stable")[:, :n_probe]
    pairs = set()
    for b in range(n_buckets):
        member_mask = (order == b).any(axis=1)
        m_ids = ids[member_mask]
        m_mat = nmat[member_mask]
        if len(m_ids) < 2:
            continue
        sims = np.round(m_mat @ m_mat.T, 6)
        ai, bj = np.nonzero(sims >= threshold)
        for x, y in zip(m_ids[ai], m_ids[bj]):
            if x < y:
                pairs.add((int(x), int(y)))
    out = sorted(pairs)
    return pa.table(
        {
            "a": pa.array([p[0] for p in out], pa.int64()),
            "b": pa.array([p[1] for p in out], pa.int64()),
        }
    )


def _oracle_embedding_kmeans(sf_dir: str, k: int = 8, iters: int = 5) -> pa.Table:
    ids, mat = _read_embeddings(sf_dir)
    nmat = _normalize_np(mat)
    q = np.round(nmat * _QUANT_SCALE).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cent = _normalize_np(mat[order[:k]])
    for _ in range(iters):
        assign = np.argmax(np.round(nmat @ cent.T, 9), axis=1)
        new = cent.copy()
        for ci in range(k):
            members = q[assign == ci]
            if len(members):
                total = members.sum(axis=0, dtype=np.int64)
                new[ci] = total.astype(np.float64) / _QUANT_SCALE / len(members)
        cent = _normalize_np(new)
    assign = np.argmax(np.round(nmat @ cent.T, 9), axis=1)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(assign.astype(np.int64), pa.int64()),
        }
    )


# ------------------------------------------------------------------- media

_MEDIA_PATH = "/tmp/latyas_ray/media/media.parquet"
_VIDEO_PATH = "/tmp/latyas_ray/media/video.parquet"


def _oracle_media_features(sf_dir: str) -> pa.Table:
    from .ops.multimodal import generate_media_table

    path = generate_media_table(_MEDIA_PATH, n_rows=200)
    t = pq.read_table(path, columns=["media_id", "media_type"])
    decoded = [m.startswith("image/") for m in t.column("media_type").to_pylist()]
    return pa.table(
        {
            "media_id": t.column("media_id").cast(pa.int64()),
            "media_type": t.column("media_type"),
            "decoded": pa.array(decoded, pa.bool_()),
        }
    )


def _oracle_media_resize(sf_dir: str, resize_to: int = 64) -> pa.Table:
    from .ops.multimodal import generate_media_table

    path = generate_media_table(_MEDIA_PATH, n_rows=200)
    t = pq.read_table(path)
    out = {"media_id": [], "out_w": [], "out_h": [], "px_mean": [], "px_std": []}
    for mid, mtype, w, h, payload in zip(
        t.column("media_id").to_pylist(),
        t.column("media_type").to_pylist(),
        t.column("width").to_pylist(),
        t.column("height").to_pylist(),
        t.column("payload").to_pylist(),
    ):
        if not mtype.startswith("image/") or not w or not h:
            continue
        need = w * h
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = -(-need // max(1, len(raw)))
        img = np.tile(raw, reps)[:need].reshape(h, w)
        ys = (np.arange(resize_to) * h) // resize_to
        xs = (np.arange(resize_to) * w) // resize_to
        small = img[np.ix_(ys, xs)]
        out["media_id"].append(mid)
        out["out_w"].append(resize_to)
        out["out_h"].append(resize_to)
        out["px_mean"].append(round(float(small.mean()), 4))
        out["px_std"].append(round(float(small.std()), 4))
    return pa.table(
        {
            "media_id": pa.array(out["media_id"], pa.int64()),
            "out_w": pa.array(out["out_w"], pa.int32()),
            "out_h": pa.array(out["out_h"], pa.int32()),
            "px_mean": pa.array(out["px_mean"], pa.float64()),
            "px_std": pa.array(out["px_std"], pa.float64()),
        }
    )


def _oracle_video_frames(sf_dir: str, stride: int = 10,
                         frame_bytes: int = 256) -> pa.Table:
    from .ops.multimodal import generate_video_table

    path = generate_video_table(_VIDEO_PATH, n_rows=60)
    t = pq.read_table(path, columns=["media_id", "n_frames", "fps"])
    out_id, out_f, out_ts = [], [], []
    for mid, n_frames, fps in zip(
        t.column("media_id").to_pylist(),
        t.column("n_frames").to_pylist(),
        t.column("fps").to_pylist(),
    ):
        for fi in range(0, n_frames, stride):
            out_id.append(mid)
            out_f.append(fi)
            out_ts.append(round(float(fi) / float(fps), 4))
    return pa.table(
        {
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_f, pa.int32()),
            "ts_sec": pa.array(out_ts, pa.float64()),
        }
    )


def _oracle_latex_normalize(sf_dir: str) -> pa.Table:
    """Serial scan of the corpus pages for ``$$…$$`` equations + KaTeX
    normalization — the golden side of the ``latex_normalize`` pipeline
    (verifies distributed ≡ serial for the M8 kernel; the kernel's own
    semantics are pinned by its unit tests)."""
    import glob
    import re

    from .corpus import ensure_corpus_for_sf, sf_label_from_dir
    from .functions.latex import to_katex

    label = sf_label_from_dir(sf_dir)
    corpus = ensure_corpus_for_sf(label, use_ray="no")
    eq_re = re.compile(r"\$\$(.+?)\$\$", re.DOTALL)
    urls, idxs, raws, katexs = [], [], [], []
    for path in sorted(glob.glob(os.path.join(corpus, "pages-*.parquet"))):
        t = pq.read_table(path, columns=["url", "html"])
        for url, html in zip(t.column("url").to_pylist(),
                             t.column("html").to_pylist()):
            if html is None or html.startswith(b"%PDF") or b"$$" not in html:
                continue
            text = html.decode("utf-8", errors="replace")
            for i, m in enumerate(eq_re.findall(text)):
                urls.append(url)
                idxs.append(i)
                raws.append(m)
                katexs.append(to_katex(m))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "eq_idx": pa.array(idxs, pa.int64()),
            "raw": pa.array(raws, pa.string()),
            "katex": pa.array(katexs, pa.string()),
        }
    )



# --------------------------------------------------------------------- tsr


def _oracle_tsr_assemble(sf_dir: str) -> pa.Table:
    """Serial TATR assembly over the same per-doc synthetic fixtures the
    distributed stage uses.  This snapshot pins "distributed ≡ serial,
    deterministic"; kernel-level correctness vs the reference flow is
    covered separately by the differential fuzz against the verbatim port
    in tests/test_tatr_differential.py."""
    from .pipelines.tsr_pipeline import _CELL_DTYPES, cell_rows_for_doc

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    rows: List[dict] = []
    for d in sorted(t.column("doc_id").to_pylist()):
        rows.extend(cell_rows_for_doc(int(d)))
    cols = {k: [r[k] for r in rows] for k in _CELL_DTYPES}
    return pa.table({
        "doc_id": pa.array(cols["doc_id"], pa.int64()),
        "table_idx": pa.array(cols["table_idx"], pa.int64()),
        "cell_idx": pa.array(cols["cell_idx"], pa.int64()),
        "row_start": pa.array(cols["row_start"], pa.int64()),
        "col_start": pa.array(cols["col_start"], pa.int64()),
        "row_span": pa.array(cols["row_span"], pa.int64()),
        "col_span": pa.array(cols["col_span"], pa.int64()),
        "is_header": pa.array(cols["is_header"], pa.bool_()),
        "cell_text": pa.array(cols["cell_text"], pa.string()),
        "confidence": pa.array(cols["confidence"], pa.float64()),
    })


def _oracle_texmix(sf_dir: str) -> pa.Table:
    """Serial TexMix composite over the same per-doc synthetic mixed
    pages the actor-pool stage uses (distributed ≡ serial; the composite's
    reading-order/equation-wrapping properties are pinned by
    tests/test_texmix.py's 2000-seed sweep)."""
    from .pipelines.texmix_pipeline import texmix_serial_rows

    rows = texmix_serial_rows(sf_dir)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "mixed_text": pa.array([r[1] for r in rows], pa.string()),
    })


def _oracle_texmix_markdown(sf_dir: str) -> pa.Table:
    """Serial TexMix markdown-assembly variant (distributed ≡ serial;
    the walk's quirks are pinned by the 500-seed differential vs the
    verbatim port in tests/test_mix_assembly.py)."""
    from .pipelines.texmix_pipeline import texmix_markdown_serial_rows

    rows = texmix_markdown_serial_rows(sf_dir)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "markdown": pa.array([r[1] for r in rows], pa.string()),
    })


def _oracle_semantic_reflow(sf_dir: str) -> pa.Table:
    """Serial semantic-reflow oracle (A9): ``extract_one`` per corpus
    document, then a verbatim port of the reference's NSP pair-scan loop
    (``bert_reflow.py:19-53``) seeded by a port of the grid sort it
    intends to call (``position_reflow.py:5-19``), with the digest
    scorer's margin reimplemented inline — independent of
    ``functions.semantic_reflow``'s loop structure.

    Deviations shared with the engine (documented there): grid scale
    factors clamped to ≥1 (the strict reference divides by zero for
    pages narrower than a chunk), and page dims taken from the rect
    extents because extracted documents carry no pixel page.
    """
    import glob as _glob
    import hashlib as _hashlib

    from .corpus import ensure_corpus_for_sf, sf_label_from_dir
    from .extract import extract_one
    from .functions.semantic_reflow import SEM_REFLOW_MAX_REGIONS

    def _margin(lhs: str, rhs: str) -> float:
        h = _hashlib.blake2b(
            f"nsp/1|{lhs}\x00{rhs}".encode("utf-8"), digest_size=8
        ).digest()
        return (int.from_bytes(h, "big") % 12001 - 6000) / 1000.0

    def _grid_seed(rects, page_h, page_w):
        # position_reflow.py:8-19 (sf clamped)
        sf = (max(1, int(page_h) // 256), max(1, int(page_w) // 3))
        sorted_bbox = []
        for bbox_i in range(len(rects)):
            x, y, x2, y2 = rects[bbox_i]
            x, y, x2, y2 = int(x), int(y), int(x2), int(y2)
            sorted_bbox.append(((x // sf[1], y // sf[0], x2 // sf[1], y2 // sf[0]), bbox_i))
        sorted_bbox = sorted(sorted_bbox, key=lambda x: x[0])
        return [item[1] for item in sorted_bbox]

    def _nsp_loop(rects, texts, position_blocks, threshold=3):
        # bert_reflow.py:19-53, with the model call replaced by _margin.
        # Region cap is the SHARED CONFIG constant (not part of the
        # algorithm's independence argument): oversized pages keep the
        # seed order.
        if len(position_blocks) > SEM_REFLOW_MAX_REGIONS:
            return position_blocks
        for bbox_i in range(len(position_blocks)):
            for bbox_j in range(bbox_i, len(position_blocks)):
                if bbox_i == bbox_j:
                    continue
                lhs_bbox = rects[position_blocks[bbox_i]]
                rhs_bbox = rects[position_blocks[bbox_j]]
                if rhs_bbox[0] < lhs_bbox[2] and rhs_bbox[1] < lhs_bbox[3]:
                    continue
                lhs_text = texts[position_blocks[bbox_i]]
                rhs_text = texts[position_blocks[bbox_j]]
                if lhs_text is None or rhs_text is None:
                    continue
                if _margin(lhs_text, rhs_text) - 0.0 > threshold:
                    old_ele = position_blocks[bbox_j]
                    del position_blocks[bbox_j]
                    position_blocks.insert(bbox_i + 1, old_ele)
        return position_blocks

    label = sf_label_from_dir(sf_dir)
    corpus = ensure_corpus_for_sf(label, use_ray="no")
    urls, pages, rids, orders = [], [], [], []
    for path in sorted(_glob.glob(os.path.join(corpus, "pages-*.parquet"))):
        t = pq.read_table(path, columns=["url", "html", "text", "lang"])
        for url, html, text, lang in zip(
            t.column("url").to_pylist(), t.column("html").to_pylist(),
            t.column("text").to_pylist(), t.column("lang").to_pylist(),
        ):
            res = extract_one(url, html, text, lang)
            by_page: dict = {}
            for reg in res["regions"]:
                by_page.setdefault(int(reg["page"]), []).append(reg)
            for page in sorted(by_page):
                regs = sorted(by_page[page], key=lambda r: int(r["region_id"]))
                rects = [(r["x1"], r["y1"], r["x2"], r["y2"]) for r in regs]
                texts = []
                for r in regs:
                    cs, ce = int(r["char_start"]), int(r["char_end"])
                    texts.append(
                        res["extracted_text"][cs:ce] if 0 <= cs <= ce else None
                    )
                page_h = max(r[3] for r in rects)
                page_w = max(r[2] for r in rects)
                order = _nsp_loop(
                    rects, texts, _grid_seed(rects, float(page_h), float(page_w))
                )
                for pos, li in enumerate(order):
                    urls.append(url)
                    pages.append(page)
                    rids.append(int(regs[li]["region_id"]))
                    orders.append(pos)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "page": pa.array(pages, pa.int32()),
        "region_id": pa.array(rids, pa.int32()),
        "sem_order": pa.array(orders, pa.int32()),
    })


def _oracle_tsr_tables_csv(sf_dir: str) -> pa.Table:
    from .pipelines.tsr_pipeline import serialized_rows_for_doc

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    rows: List[dict] = []
    for d in sorted(t.column("doc_id").to_pylist()):
        rows.extend(serialized_rows_for_doc(int(d), "csv"))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "table_idx": pa.array([r["table_idx"] for r in rows], pa.int64()),
        "payload": pa.array([r["payload"] for r in rows], pa.string()),
    })


# ------------------------------------------------- LM scoring / tiers


def _lm_tokens_py(text: str) -> List[str]:
    """Pinned LM tokenizer, serial form: ASCII letter runs of the RAW
    text, each token lowercased.  (Must NOT lower the whole text with
    str.lower() first — full-Unicode lowering maps e.g. U+212A KELVIN
    SIGN into ASCII 'k', which the engine's ascii_lower never does.)"""
    import re

    return [w.lower() for w in re.findall(r"[A-Za-z]+", text or "")]


def _lm_scores_py(sf_dir: str) -> list:
    """Serial reimplementation of the CCNet-style bigram LM family
    (ops/lm.py): dict-and-loop training over the hash-seeded subset,
    driver-identical quantization (math.log over exact integer counts,
    floor(x*1e6 + 0.5)), integer lookup scoring.  Shares only the pinned
    config constants with the engine (the SEM_REFLOW_MAX_REGIONS
    precedent); every counting / selection / scoring step is
    re-derived here with plain Python containers."""
    from collections import Counter

    from .ops.lm import (
        LM_PAIR_CAP,
        LM_QSCALE,
        LM_SEED_MOD,
        LM_VOCAB_CAP,
    )

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    docs = sorted(
        zip(
            t.column("doc_id").to_pylist(),
            [x or "" for x in t.column("text").to_pylist()],
            [x or "" for x in t.column("lang").to_pylist()],
        )
    )
    # train pass A: vocab = top-V seed unigrams (count desc, token asc)
    uni: Counter = Counter()
    for doc_id, text, _lang in docs:
        if doc_id % LM_SEED_MOD == 0:
            uni.update(_lm_tokens_py(text))
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:LM_VOCAB_CAP]
    vocab = {w: i for i, w in enumerate(sorted(w for w, _ in top))}
    unk = len(vocab)
    v_total = unk + 1
    # train pass B: left counts (positions 0..n-2) + capped pair counts
    left: Counter = Counter()
    pairs: Counter = Counter()
    for doc_id, text, _lang in docs:
        if doc_id % LM_SEED_MOD != 0:
            continue
        ids = [vocab.get(w, unk) for w in _lm_tokens_py(text)]
        for a, b in zip(ids, ids[1:]):
            left[a] += 1
            pairs[(a, b)] += 1
    kept = sorted(
        pairs.items(), key=lambda kv: (-kv[1], kv[0][0] * v_total + kv[0][1])
    )[:LM_PAIR_CAP]

    def qlog(num: int, den: int) -> int:
        return int(math.floor(math.log(num / den) * LM_QSCALE + 0.5))

    pair_logp = {
        k: qlog(c + 1, left.get(k[0], 0) + v_total) for k, c in kept
    }
    fallback = {i: qlog(1, left.get(i, 0) + v_total) for i in range(v_total)}
    # scoring
    out = []
    for doc_id, text, lang in docs:
        ids = [vocab.get(w, unk) for w in _lm_tokens_py(text)]
        total = 0
        n_bi = 0
        for a, b in zip(ids, ids[1:]):
            total += pair_logp.get((a, b), fallback[a])
            n_bi += 1
        norm = total // n_bi if n_bi > 0 else 0
        out.append((doc_id, lang, n_bi, total, norm))
    return out


def _oracle_lm_perplexity(sf_dir: str) -> pa.Table:
    rows = _lm_scores_py(sf_dir)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_bigrams": pa.array([r[2] for r in rows], pa.int64()),
        "logprob_micro": pa.array([r[3] for r in rows], pa.int64()),
        "norm_micro": pa.array([r[4] for r in rows], pa.int64()),
    })


def _oracle_ccnet_tiers(sf_dir: str) -> pa.Table:
    from collections import defaultdict

    rows = _lm_scores_py(sf_dir)
    by_lang = defaultdict(list)
    for _doc, lang, n_bi, _tot, norm in rows:
        if n_bi > 0:
            by_lang[lang].append(norm)
    bounds = {}
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        bounds[lang] = (vals[n // 3], vals[(2 * n) // 3])
    agg = defaultdict(lambda: [0, 0])
    for _doc, lang, n_bi, _tot, norm in rows:
        if n_bi <= 0 or lang not in bounds:
            tier = "unscored"
        else:
            t_lo, t_hi = bounds[lang]
            tier = "head" if norm >= t_hi else (
                "middle" if norm >= t_lo else "tail"
            )
        cell = agg[(lang, tier)]
        cell[0] += 1
        cell[1] += n_bi
    keys = sorted(agg)
    return pa.table({
        "lang": pa.array([k[0] for k in keys]),
        "tier": pa.array([k[1] for k in keys]),
        "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
        "sum_bigrams": pa.array([agg[k][1] for k in keys], pa.int64()),
    })


# ------------------------------------------------------------ dsir_weights


def _oracle_dsir_weights(sf_dir: str) -> pa.Table:
    """Independent serial recompute of ``ops.lm.dsir_weights``: per-doc
    Python token loop, Counter-based bucket counts, masked-int bigram
    combine, math.log quantization — shares with the engine only the
    pinned definitional constants (token class, bucket hash function,
    DSIR_NB / DSIR_B / target lang, qlog form)."""
    import re as _re
    from collections import Counter

    import pandas as _pd

    from .ops.common import TOKEN_RE
    from .ops.lm import DSIR_B, DSIR_NB, DSIR_TARGET_LANG, LM_QSCALE

    tok_pat = _re.compile(TOKEN_RE)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    ).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)

    def buckets_of(text: str) -> list:
        toks = tok_pat.findall(text or "")
        if not toks:
            return []
        hs = [int(h) for h in _pd.util.hash_array(np.array(toks, dtype=object))]
        out = [h % DSIR_NB for h in hs]
        out += [((a + b * DSIR_B) & _M64) % DSIR_NB for a, b in zip(hs, hs[1:])]
        return out

    per_doc = [buckets_of(x) for x in t["text"]]
    q_cnt = Counter()
    p_cnt = Counter()
    for bks, lang in zip(per_doc, t["lang"]):
        q_cnt.update(bks)
        if lang == DSIR_TARGET_LANG:
            p_cnt.update(bks)
    q_tot = sum(q_cnt.values())
    p_tot = sum(p_cnt.values())

    def qlog(num: int, den: int) -> int:
        return int(math.floor(math.log(num / den) * LM_QSCALE + 0.5))

    score = {
        b: qlog(p_cnt.get(b, 0) + 1, p_tot + DSIR_NB)
        - qlog(q_cnt.get(b, 0) + 1, q_tot + DSIR_NB)
        for b in range(DSIR_NB)
    }
    n_features = [len(bks) for bks in per_doc]
    logw = [sum(score[b] for b in bks) for bks in per_doc]
    return pa.table({
        "doc_id": pa.array(t["doc_id"].astype("int64"), pa.int64()),
        "n_features": pa.array(n_features, pa.int64()),
        "dsir_logw_micro": pa.array(logw, pa.int64()),
    })


def _oracle_dsir_resample(sf_dir: str) -> pa.Table:
    """Serial recompute of ``ops.lm.dsir_resample``: weights via the
    independent `_oracle_dsir_weights` construction, Gumbel noise from
    the pinned seed function (definitional, like the bucket hash), full
    sort + head instead of the engine's distributed local-top-k."""
    from .ops.export import md5_number_lower
    from .ops.lm import DSIR_RESAMPLE_K, LM_QSCALE

    w = _oracle_dsir_weights(sf_dir).to_pandas()
    rows = []
    for doc_id, lw in zip(w["doc_id"], w["dsir_logw_micro"]):
        v = md5_number_lower(f"dsir-gumbel:{int(doc_id)}")
        # clamp pinned with lm._gumbel_micro: the quotient rounds to
        # exactly 1.0 for v in the top ~2^10 of the range
        u = min((v + 0.5) / 2.0 ** 64, 1.0 - 2.0 ** -53)
        g = int(math.floor(-math.log(-math.log(u)) * LM_QSCALE + 0.5))
        rows.append((int(doc_id), int(lw), g, int(lw) + g))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:DSIR_RESAMPLE_K]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "dsir_logw_micro": pa.array([r[1] for r in rows], pa.int64()),
        "gumbel_micro": pa.array([r[2] for r in rows], pa.int64()),
        "score_micro": pa.array([r[3] for r in rows], pa.int64()),
    })


_BUILDERS = {
    "lang_id": _oracle_lang_id,
    "doc_fingerprints": _oracle_doc_fingerprints,
    "simhash_fingerprints": _oracle_simhash,
    "minhash_dedup": _oracle_minhash_dedup,
    "ann_topk_ivf": _oracle_ann_topk_ivf,
    "embedding_neardup_ivf": _oracle_embedding_neardup_ivf,
    "embedding_kmeans": _oracle_embedding_kmeans,
    "latex_normalize": _oracle_latex_normalize,
    "semantic_reflow": _oracle_semantic_reflow,
    "texmix_recognize": _oracle_texmix,
    "texmix_markdown": _oracle_texmix_markdown,
    "tsr_assemble": _oracle_tsr_assemble,
    "tsr_tables_csv": _oracle_tsr_tables_csv,
    "media_features": _oracle_media_features,
    "media_resize": _oracle_media_resize,
    "video_frame_features": _oracle_video_frames,
    "lm_perplexity": _oracle_lm_perplexity,
    "ccnet_tiers": _oracle_ccnet_tiers,
    "dsir_weights": _oracle_dsir_weights,
    "dsir_resample": _oracle_dsir_resample,
}
