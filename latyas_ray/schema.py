"""Arrow schemas crossing the Ray object store.

The input schema is exactly the ``input_hint`` shape; the output schema
uses ``large_string`` for extracted text (FIXTURES.md §3 — guards >2 GiB
offsets when a block of giant documents lands in one Arrow column) and a
``list<struct>`` regions column so per-document region ordering survives
without any shuffle (SURVEY.md §1.3).
"""

from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

REGION_TYPE = pa.struct(
    [
        ("region_id", pa.int32()),
        ("kind", pa.string()),
        ("order", pa.int32()),
        ("x1", pa.float32()),
        ("y1", pa.float32()),
        ("x2", pa.float32()),
        ("y2", pa.float32()),
        ("dom_path", pa.string()),
        ("page", pa.int32()),
        ("char_start", pa.int64()),
        ("char_end", pa.int64()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("payload_kind", pa.string()),
        ("extracted_text", pa.large_string()),
        ("final_text", pa.large_string()),
        ("text_source", pa.string()),
        ("n_bytes", pa.int64()),
        ("n_regions", pa.int32()),
        ("regions", pa.list_(REGION_TYPE)),
        ("checksum", pa.string()),
        ("error", pa.string()),
        ("extractor_version", pa.string()),
    ]
)
