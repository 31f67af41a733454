"""The flagship streaming extraction pipeline.

Physical plan (SURVEY.md §4.3) — one pass, zero shuffles on the hot path:

    read_parquet(corpus shards)                    # 5 pruned columns
      └─ map_batches(extract_route_batch)          # stateless tasks, full
                                                   # width: HTML extraction;
                                                   # PDF payloads carried
      └─ map_batches(PdfExtractStage,              # actor pool (warm model
                     concurrency=P, batch_size=B)  # state): PDF rows only,
                                                   # rest pass through
      └─ write part-{pid}/ parquet (atomic rename) + lineage sidecar
      └─ groupby("lang").aggregate(...)            # metrics rollup ONLY,
                                                   # post-write, tiny shuffle

Routing is handled inside the UDF (payload magic sniff) rather than by a
filter→branch→union plan: Ray Data has no common-subexpression reuse, so
two filtered branches would read the corpus twice; with a heavyweight real
model and a small PDF share, flip ``split_stages=True`` to trade the
second read for an isolated GPU actor-pool stage.

Skew: documents are the atomic unit; giant rows are bounded by the corpus
cap (single-digit MB) and ``batch_size`` rows per batch keeps any one
batch's payload bounded without a repartition.  Default concurrency leaves
CPUs for the read/write stages (a pool that reserves every CPU serializes
the pipeline).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import List, Optional

import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from .. import EXTRACTOR_VERSION
from ..pdf_extract import PDF_MAGIC
from .presets import preset_resume_id
from ..stages.extract_stage import (
    ExtractStage,
    PdfExtractStage,
    extract_batch,
    extract_route_batch,
)
from ..state.lineage import (
    LineageRecord,
    completed_partitions,
    partition_input_files,
    write_lineage,
)

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
DEFAULT_BATCH_SIZE = 32


def list_corpus_files(corpus_dir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(corpus_dir, "pages-*.parquet")))


def read_pages(corpus: str | List[str]) -> rd.Dataset:
    """Read the corpus with explicit column pruning (prune-at-the-read)."""
    paths = list_corpus_files(corpus) if isinstance(corpus, str) else corpus
    return rd.read_parquet(paths, columns=PAGES_COLUMNS)


def extract_dataset(
    ds: rd.Dataset,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[tuple | int] = None,
    use_actors: bool = True,
    split_stages: bool = False,
    preset: Optional[str] = None,
) -> rd.Dataset:
    """Attach the extraction stage(s) to a pages Dataset (lazy).

    ``preset`` selects a named pipeline config (``paper`` / ``report``
    / ``book``, :mod:`latyas_ray.pipelines.presets`) for the PDF model
    stage's OCR rule table; ``None`` keeps the default (echo) registry
    the golden snapshots are built against.  Requires the routed
    actor-pool plan (``use_actors=True``, ``split_stages=False``) —
    that is the only plan with a model stage to configure."""
    if preset is not None and (split_stages or not use_actors):
        raise ValueError(
            "preset requires the routed actor-pool plan "
            "(use_actors=True, split_stages=False)"
        )
    if split_stages:
        # Two-branch plan for a heavyweight stateful detector: stateless
        # tasks take HTML rows, the actor pool takes only PDF rows.  Costs
        # a second pass over the input (no CSE in Ray Data) — worth it only
        # when the PDF stage holds real accelerator-bound weights.
        def _pdf_mask(t):
            # binary-level prefix test: covers BOTH PDF channels (%PDF-SYN
            # and real %PDF-1.x) and never string-casts — a cast would
            # raise ArrowInvalid on non-UTF-8 PDF bytes and crash the
            # batch instead of dead-lettering the row.  Null payloads are
            # explicitly False so they take the HTML branch (which treats
            # None as b"") instead of vanishing from both.
            return pc.fill_null(pc.starts_with(t["html"], pattern=b"%PDF"), False)

        html_ds = ds.map_batches(
            lambda t: t.filter(pc.invert(_pdf_mask(t))), batch_format="pyarrow"
        ).map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)
        pdf_ds = ds.map_batches(
            lambda t: t.filter(_pdf_mask(t)), batch_format="pyarrow"
        ).map_batches(
            ExtractStage,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or (1, 4),
        )
        return html_ds.union(pdf_ds)
    if use_actors:
        # Routed two-stage default: stateless tasks extract the HTML
        # majority at full width; the actor pool (warm model state) sees
        # only PDF rows and forwards the rest zero-copy.  A fixed-size
        # pool avoids the autoscaler's ramp-up lag; it is sized to the PDF
        # share of the workload, not the whole corpus.
        pool = concurrency if isinstance(concurrency, int) else 4
        try:  # never let the pool starve the stateless/read stages: leave
            import ray  # at least 2 CPUs free (pool-holds-every-CPU deadlocks
            # a small local cluster and serializes a big one)
            avail = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
            if avail:
                pool = max(1, min(pool, avail - 2))
        except Exception:
            pass
        return ds.map_batches(
            extract_route_batch, batch_format="pyarrow", batch_size=batch_size
        ).map_batches(
            PdfExtractStage,
            fn_constructor_kwargs={"preset": preset} if preset else None,
            batch_format="pyarrow",
            # coarse batches: ~93% of rows pass through untouched, so this
            # stage is transfer-bound, not compute-bound — fewer, larger
            # batches cut per-batch scheduling/IPC overhead
            batch_size=max(batch_size, 256),
            concurrency=pool,
            # 0.5 CPU: the pool is pass-through for ~93% of rows, and the
            # distinct remote args keep Ray Data from fusing the stateless
            # stage into this pool (fusion would run ALL extraction on the
            # few model actors, serializing the job)
            num_cpus=0.5,
        )
    return ds.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=batch_size
    )


# ------------------------------------------------------------ resumable run


def _checksum_xor_and_rows(part_dir: str) -> tuple:
    """Columnar read-back of just the checksum column → order-independent
    partition checksum (cheap: one narrow column; the hex→u64 parse is
    vectorized — a per-row ``int(s, 16)`` loop would cost minutes on a
    10^8-row partition)."""
    import numpy as np

    acc = np.uint64(0)
    n = 0
    powers = (np.uint64(16) ** np.arange(15, -1, -1, dtype=np.uint64))
    for f in sorted(glob.glob(os.path.join(part_dir, "*.parquet"))):
        col = pq.read_table(f, columns=["checksum"]).column("checksum")
        for chunk in col.chunks:
            vals = chunk.to_pylist()
            if not vals:
                continue
            raw = np.frombuffer(
                "".join(v[:16] for v in vals).encode("ascii"), dtype=np.uint8
            ).reshape(-1, 16)
            digits = (raw - 48 - 39 * (raw >= 97)).astype(np.uint64)
            acc ^= np.bitwise_xor.reduce(digits @ powers)
            n += len(vals)
    return f"{int(acc):016x}", n


def run_partition(
    pid: int,
    files: List[str],
    out_dir: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[tuple | int] = None,
    use_actors: bool = True,
    preset: Optional[str] = None,
) -> LineageRecord:
    """Process one partition: read its files → extract → atomic write →
    lineage record."""
    part_name = f"part-{pid:05d}"
    final_dir = os.path.join(out_dir, part_name)
    tmp_dir = os.path.join(out_dir, f".tmp-{part_name}")
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)  # torn previous attempt
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)  # stale output without valid lineage

    ds = extract_dataset(
        read_pages(files),
        batch_size=batch_size,
        concurrency=concurrency,
        use_actors=use_actors,
        preset=preset,
    )
    ds.write_parquet(tmp_dir)
    os.replace(tmp_dir, final_dir)

    checksum, n_rows = _checksum_xor_and_rows(final_dir)
    rec = LineageRecord(
        pid=pid,
        input_files=[os.path.basename(f) for f in files],
        n_rows=n_rows,
        checksum_xor=checksum,
        extractor_version=EXTRACTOR_VERSION,
        preset=preset_resume_id(preset),
    )
    write_lineage(out_dir, rec)
    return rec


def run_resumable(
    corpus_dir: str,
    out_dir: str,
    n_partitions: int = 8,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[tuple | int] = None,
    use_actors: bool = True,
    max_partitions: Optional[int] = None,
    preset: Optional[str] = None,
) -> dict:
    """Resumable whole-corpus run.  Completed partitions (valid lineage +
    output dir + matching extractor version) are skipped; the rest are
    (re)processed.  ``max_partitions`` caps work this call (used by the
    kill-resume test to simulate preemption)."""
    files = list_corpus_files(corpus_dir)
    parts = partition_input_files(files, n_partitions)
    os.makedirs(out_dir, exist_ok=True)
    # resume identity is the preset's STRING id (name, or
    # name+content-digest for customized config-file presets) — passing
    # the PipelinePreset object itself compared string == object and
    # never matched, so a resumed --config run reprocessed everything
    done = completed_partitions(
        out_dir, EXTRACTOR_VERSION, preset=preset_resume_id(preset)
    )

    processed, skipped = [], []
    for pid, part_files in enumerate(parts):
        if pid in done:
            skipped.append(pid)
            continue
        if max_partitions is not None and len(processed) >= max_partitions:
            continue
        run_partition(
            pid, part_files, out_dir,
            batch_size=batch_size, concurrency=concurrency,
            use_actors=use_actors, preset=preset,
        )
        processed.append(pid)
    return {
        "n_partitions": len(parts),
        "processed": processed,
        "skipped": skipped,
        "complete": len(processed) + len(skipped) == len(parts),
    }


# ------------------------------------------------------------- debug sinks


def export_labelme(ds: rd.Dataset, out_dir: str) -> None:
    """LabelMe-style annotation export (SURVEY.md §2.1 S7; the reference
    writes one ``labelme`` JSON per image at ``auto_labelme.py:36-62``).
    Input: an extracted Dataset (``EXTRACTED_SCHEMA``); output: JSON rows
    with one rectangle shape per region, written as sharded files via
    ``ds.write_json`` — a debug sink, off the hot path."""
    import pyarrow as pa

    def to_labelme(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        regions_col = batch.column("regions").to_pylist()
        rows = []
        for url, regions in zip(urls, regions_col):
            shapes = [
                {
                    "label": reg["kind"],
                    "points": [[reg["x1"], reg["y1"]], [reg["x2"], reg["y2"]]],
                    "group_id": reg["region_id"],
                    "shape_type": "rectangle",
                    "flags": {},
                }
                for reg in regions or []
            ]
            rows.append(
                {
                    "version": "5.0.0",
                    "flags": {},
                    "imagePath": url,
                    "shapes": json.dumps(shapes, sort_keys=True),
                }
            )
        return pa.Table.from_pylist(rows)

    ds.select_columns(["url", "regions"]).map_batches(
        to_labelme, batch_format="pyarrow"
    ).write_json(out_dir)


# ------------------------------------------------------------ metric rollup


def rollup_metrics(out_dir: str, write_json: bool = True) -> "object":
    """Per-lang/per-payload metric rollup over the written output — the
    job's ONLY groupby, off the hot path (north rule; SURVEY.md §2.5).
    Returns a small pandas DataFrame."""
    from ray.data.aggregate import Count, Sum

    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "*.parquet")))
    ds = rd.read_parquet(files, columns=["lang", "payload_kind", "n_bytes", "n_regions"])
    out = (
        ds.groupby(["lang", "payload_kind"])
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_bytes", alias_name="total_bytes"),
            Sum("n_regions", alias_name="total_regions"),
        )
        .to_pandas()
        .sort_values(["lang", "payload_kind"])
        .reset_index(drop=True)
    )
    if write_json:
        path = os.path.join(out_dir, "metrics.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out.to_dict(orient="records"), f, sort_keys=True)
        os.replace(tmp, path)
    return out


# ------------------------------------------------------- latex normalize

_EQ_RE = None


def latex_normalize_dataset(corpus_dir: str) -> "rd.Dataset":
    """M8 as a first-class pipeline: scan the corpus pages for display
    equations (``$$…$$`` in the raw HTML payload) and emit each with its
    KaTeX-normalized form (``functions.latex.to_katex``, the re-expression
    of the reference's ``to_katex`` chain).  Output: (url, eq_idx, raw,
    katex) — one row per equation, map-only, no shuffle."""
    import re

    import pyarrow as pa

    from ..functions.latex import to_katex

    global _EQ_RE
    if _EQ_RE is None:
        _EQ_RE = re.compile(r"\$\$(.+?)\$\$", re.DOTALL)
    eq_re = _EQ_RE

    ds = read_pages(corpus_dir).select_columns(["url", "html"])

    def eqs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Arrow-level prefilter: one vectorized C substring scan drops the
        # (giant) equation-free majority BEFORE any per-row Python bytes
        # materialization — to_pylist on the full html column was the
        # dominant cost of this map-only stage.
        mask = pc.match_substring(batch.column("html"), "$$")
        batch = batch.filter(pc.fill_null(mask, False))
        urls, idxs, raws, katexs = [], [], [], []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if html is None or html.startswith(b"%PDF"):
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

    return ds.map_batches(eqs, batch_format="pyarrow", batch_size=512)
