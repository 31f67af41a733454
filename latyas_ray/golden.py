"""Golden outputs: the serial oracle's extraction snapshot per scale
factor, cached under ``/tmp/latyas_ray/golden/{sf}``.

The golden files power the driver-visible correctness check for the
extraction pipeline: ``oracle_sql`` reads the golden parquet with DuckDB
while ``queries()`` runs the distributed Ray pipeline — so the driver's
row/schema/value-hash compare is exactly the "distributed output ≡ serial
oracle bytes" invariant (FIXTURES.md §5).  Golden rows are produced by
direct ``extract_one`` calls per document (plain Ray tasks over shards for
speed — NOT the map_batches pipeline under test).
"""

from __future__ import annotations

import json
import os
from typing import List

import pyarrow as pa
import pyarrow.parquet as pq

from . import EXTRACTOR_VERSION
from .corpus import CORPUS_VERSION, SF_ROWS, default_corpus_dir, ensure_corpus_for_sf

GOLDEN_BASE = "/tmp/latyas_ray/golden"

GOLDEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("payload_kind", pa.string()),
        ("text_source", pa.string()),
        ("n_regions", pa.int32()),
        ("extracted_text", pa.large_string()),
        ("checksum", pa.string()),
    ]
)

GOLDEN_REGIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("region_id", pa.int32()),
        ("kind", pa.string()),
        ("order_idx", pa.int32()),
        ("page", pa.int32()),
        ("char_start", pa.int64()),
        ("char_end", pa.int64()),
    ]
)


def _golden_for_rows(doc_ids: List[int]) -> tuple:
    from .corpus import make_row
    from .extract import extract_one

    g = {name: [] for name in GOLDEN_SCHEMA.names}
    r = {name: [] for name in GOLDEN_REGIONS_SCHEMA.names}
    for d in doc_ids:
        row = make_row(d)
        res = extract_one(row["url"], row["html"], row["text"], row["lang"])
        g["url"].append(res["url"])
        g["payload_kind"].append(res["payload_kind"])
        g["text_source"].append(res["text_source"])
        g["n_regions"].append(res["n_regions"])
        g["extracted_text"].append(res["extracted_text"])
        g["checksum"].append(res["checksum"])
        for reg in res["regions"]:
            r["url"].append(res["url"])
            r["region_id"].append(reg["region_id"])
            r["kind"].append(reg["kind"])
            r["order_idx"].append(reg["order"])
            r["page"].append(reg["page"])
            r["char_start"].append(reg["char_start"])
            r["char_end"].append(reg["char_end"])
    return (
        pa.table(g, schema=GOLDEN_SCHEMA),
        pa.table(r, schema=GOLDEN_REGIONS_SCHEMA),
    )


def golden_paths(sf_label: str) -> tuple:
    d = os.path.join(GOLDEN_BASE, sf_label)
    return os.path.join(d, "golden.parquet"), os.path.join(d, "golden_regions.parquet")


def ensure_golden(sf_label: str) -> tuple:
    """Build (or reuse) the golden snapshot for one scale factor."""
    d = os.path.join(GOLDEN_BASE, sf_label)
    marker = os.path.join(d, "_SUCCESS")
    gp, rp = golden_paths(sf_label)
    params = {"version": EXTRACTOR_VERSION, "corpus": CORPUS_VERSION,
              "sf": sf_label, "n_rows": SF_ROWS[sf_label]}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == params:
                    return gp, rp
        except Exception:
            pass
    ensure_corpus_for_sf(sf_label)
    os.makedirs(d, exist_ok=True)

    n = SF_ROWS[sf_label]
    chunk = 512
    ranges = [list(range(i, min(i + chunk, n))) for i in range(0, n, chunk)]

    ray_ok = False
    try:
        import ray

        ray_ok = ray.is_initialized()
    except ImportError:
        pass
    if ray_ok:
        import ray

        task = ray.remote(num_cpus=1)(_golden_for_rows)
        results = ray.get([task.remote(r) for r in ranges])
    else:
        results = [_golden_for_rows(r) for r in ranges]

    g = pa.concat_tables([t for t, _ in results])
    r = pa.concat_tables([t for _, t in results])
    pq.write_table(g, gp + ".tmp", compression="zstd")
    pq.write_table(r, rp + ".tmp", compression="zstd")
    os.replace(gp + ".tmp", gp)
    os.replace(rp + ".tmp", rp)
    with open(marker + ".tmp", "w") as f:
        json.dump(params, f)
    os.replace(marker + ".tmp", marker)
    return gp, rp


def corpus_dir_for(sf_label: str) -> str:
    return default_corpus_dir(sf_label)
