from .lineage import (
    LineageRecord,
    completed_partitions,
    partition_input_files,
    read_lineage,
    write_lineage,
)

__all__ = [
    "LineageRecord",
    "completed_partitions",
    "partition_input_files",
    "read_lineage",
    "write_lineage",
]
