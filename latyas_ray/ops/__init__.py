"""Corpus-scale data-processing ops beyond the extraction hot path.

Each op is a function ``(sf_dir) -> Dataset | pandas.DataFrame |
pyarrow.Table`` over the driver's testdata tables (``documents``,
``embeddings``, ``events``, ``lineitem``), designed so that a DuckDB SQL
oracle can verify it row-for-row wherever SQL can express the semantics.
Aggregations follow the partial-aggregate pattern (combine inside
``map_batches``, then a small ``groupby`` over partials) so the shuffle
moves per-key partials, not rows.
"""
