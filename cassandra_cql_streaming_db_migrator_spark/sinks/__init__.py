from .sinks import (
    MigrationStats,
    noop_sink,
    quarantine_split,
    upsert_parquet,
    write_parquet,
)

__all__ = [
    "MigrationStats",
    "noop_sink",
    "quarantine_split",
    "upsert_parquet",
    "write_parquet",
]
