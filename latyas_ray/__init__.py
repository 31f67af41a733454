"""latyas_ray — a Ray-Data-native main-content extraction engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``quantmew/LATYAS`` (layout-analysis-driven content extraction),
re-expressed Ray-Data-first: ``ray.data.Dataset`` pipelines, ``map_batches``
over zero-copy Arrow batches, actor pools for stateful (model) stages, and
``groupby``/aggregate only for small metric rollups off the hot path.

Layout:

- :mod:`latyas_ray.geometry`   — axis-aligned rectangle ops (union/intersect/area)
- :mod:`latyas_ray.blocks`     — region kinds + label classification
- :mod:`latyas_ray.reflow`     — XY-cut reading-order sort (per-page, pure)
- :mod:`latyas_ray.overlap`    — overlapping-region merge/dedup
- :mod:`latyas_ray.textnorm`   — Levenshtein, reconciliation, caption filters
- :mod:`latyas_ray.html_extract` / :mod:`latyas_ray.pdf_extract` — the two
  extraction channels (HTML boilerplate strip; pseudo-PDF layout parse)
- :mod:`latyas_ray.extract`    — ``extract_one``: the serial per-document oracle
- :mod:`latyas_ray.corpus`     — deterministic synthetic web-page corpus
- :mod:`latyas_ray.stages`     — Ray Data batch UDFs / actor classes
- :mod:`latyas_ray.pipelines`  — end-to-end Dataset pipelines
- :mod:`latyas_ray.state`      — per-partition lineage / resume
- :mod:`latyas_ray.ops`        — corpus-scale ops (dedup, text stats, ANN, windows)
"""

__version__ = "0.1.0"

EXTRACTOR_VERSION = "latyas-ray-extractor/3"  # /3: span-occupancy fill guard
# rule routing, <pre>/<dl>/rowspan-colspan HTML coverage
