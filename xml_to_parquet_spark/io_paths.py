"""Per-process scratch locations for operators with on-disk side effects
(persisted IVF index, materialized aggregates, format round-trips, bucketed
fixtures).

Paths are keyed by pid so concurrent runs at the same scale factor never
race on each other's persisted artifacts; within one process the path is
stable, so build-once-serve-many operators still amortize their build.
"""

from __future__ import annotations

import os


def scratch_dir(sf_dir: str, name: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/"))
    return f"/tmp/xml_to_parquet_spark_io/pid{os.getpid()}/{sf}/{name}"


def committed(path: str) -> bool:
    """True only when a Spark write to ``path`` COMMITTED: build-once
    guards must key on the committer's ``_SUCCESS`` marker, not bare
    directory existence — an interrupted write leaves a partial directory
    that a bare ``exists()`` check would silently trust (ADVICE r7)."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))
