from .extract_pipeline import (
    extract_dataset,
    read_pages,
    rollup_metrics,
    run_resumable,
)

__all__ = ["extract_dataset", "read_pages", "rollup_metrics", "run_resumable"]
