"""Per-process scratch locations for operators with on-disk side effects
(persisted IVF index, materialized aggregates, format round-trips, bucketed
fixtures).

Paths are keyed by pid so concurrent runs at the same scale factor never
race on each other's persisted artifacts; within one process the path is
stable, so build-once-serve-many operators still amortize their build.
"""

from __future__ import annotations

import os


def scratch_root() -> str:
    """The single configurable root for ALL fixture/scratch IO (ADVICE
    r10: no module builds its own /tmp side-channel path)."""
    return os.environ.get("XTPS_SCRATCH_ROOT", "/tmp/xml_to_parquet_spark_io")


def scratch_dir(sf_dir: str, name: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/"))
    return f"{scratch_root()}/pid{os.getpid()}/{sf}/{name}"


def committed(path: str) -> bool:
    """True only when a Spark write to ``path`` COMMITTED: build-once
    guards must key on the committer's ``_SUCCESS`` marker, not bare
    directory existence — an interrupted write leaves a partial directory
    that a bare ``exists()`` check would silently trust (ADVICE r7)."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def has_data_files(path: str) -> bool:
    """True when a committed Spark write at ``path`` produced data files
    (or partition subdirectories), not just the ``_SUCCESS`` marker.

    A ``partitionBy`` write of an EMPTY DataFrame commits only
    ``_SUCCESS``; reading that layout back raises AnalysisException on
    schema inference. Callers pre-check with this instead of wrapping the
    read in a blanket ``except Exception`` that would also swallow genuine
    IO/schema failures on non-empty fixtures (ADVICE r10)."""
    if not os.path.isdir(path):
        return False
    return any(not e.startswith(("_", ".")) for e in os.listdir(path))
