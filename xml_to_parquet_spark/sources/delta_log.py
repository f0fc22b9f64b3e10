"""Read-only adapter for the Delta Lake transaction log (VERDICT r11 #7).

The lake_* operators (operators/sources_io.py) implement snapshot
isolation, time travel, incremental diff, and CoW merge over a
hand-rolled manifest layout. This module de-risks the "real table
format" gap by reading the REAL on-disk protocol of a public lake
format: Delta Lake's `_delta_log` (delta-io PROTOCOL.md — versioned
JSON-lines commit files whose `add`/`remove` actions define each
snapshot's data-file set). Delta came first deliberately: its commits
are plain JSON (stdlib-writable and -readable, so the fixture in
tests/test_delta_log_adapter.py is genuine protocol bytes). Iceberg's
manifests are Avro — originally documented out of scope for that
reason, since closed from first principles by sources/avro_codec.py +
sources/iceberg.py.

Semantics implemented (the subset the lake_* ops model):
  * a table version IS the replay of actions 0..N — `add` activates a
    data file, `remove` retires it (Delta's logical delete);
  * snapshot isolation/time travel: `read_delta_snapshot(..., version=N)`
    scans exactly version N's active files, unaffected by later commits;
  * checkpoint files — single-part (`<v>.checkpoint.parquet`),
    complete multi-part sets (`<v>.checkpoint.<i>.<n>.parquet`,
    every part 1..n present; the parts PARTITION the reconciled state,
    so an incomplete set is never a seed and is read around exactly as
    if a concurrent writer were mid-checkpoint), AND V2 checkpoints
    (`<v>.checkpoint.<uniqueId>.{json,parquet}` whose file actions live
    in `_delta_log/_sidecars/` parquet files; the v2Checkpoint reader
    feature): a checkpoint is the
    RECONCILED action state at version v — rows whose `add` struct is
    non-null are exactly v's active files — so replay seeds from the
    newest checkpoint ≤ the target version and applies only the JSON
    commits after it. This is what makes a long-lived table readable:
    log retention deletes old JSON commits, so a real table usually has
    NO commit 0 — versions at/after a checkpoint stay readable, versions
    before the oldest seed are honestly refused;
  * `_last_checkpoint` is NEVER read. It is purely a listing-avoidance
    hint and this adapter lists the log directory anyway (it must, for
    the JSON commits), so a stale, dangling, corrupt, or torn hint file
    cannot affect any read — checkpoint completeness is always verified
    from the listing itself;
  * partitioned tables: partition column values live ONLY in the log
    (`add.partitionValues` — the data files never contain them), so the
    reader attaches them per partition-value group as typed literals
    (types from metaData.schemaString) and prunes groups driver-side via
    ``partition_filter`` before a single scan is planned;
  * per-file zone-map skipping: ``stats_filter`` prunes files by the
    minValues/maxValues recorded in ``add.stats`` — numeric predicates
    only (string stats may be writer-truncated, which would make string
    pruning unsound), keep-on-missing, so it can skip work but never
    rows;
  * incremental consumption: ``delta_incremental_files(since, to)``
    returns the data-changing adds of a version window — the
    streaming-from-Delta micro-batch planner — skipping
    ``dataChange: false`` rewrites and refusing windows containing real
    deletes (those need a CDC feed, not an append replay);
  * change data feed: ``delta_changes(since, to)`` serves that CDC feed
    — `cdc` actions' `_change_data` files verbatim (they carry
    `_change_type` physically), with insert/delete synthesis for
    commits that lack them, `_commit_version`/`_commit_timestamp`
    stamping, and loud refusal of the shapes only writer-recorded
    change data can describe (DV rewrites without cdc files, mid-window
    schema changes);
  * the scan itself is a plain Spark parquet read over the active file
    list — predicate pushdown, column pruning, and partition-level
    parallelism all apply downstream, and log replay costs O(actions),
    never a data scan (the same cost shape as lake_snapshot_read's
    manifest read). Checkpoint reads are pyarrow, driver-side,
    action-count-sized.

  * schema evolution: the TABLE schema is the latest metaData.schemaString
    in the replay (a schema change commits a new metaData action), and
    the scan reads under it explicitly — files written before a column
    was added surface it as null, never as a sampling-dependent schema;

  * column mapping, 'name' AND 'id' modes: when metaData.configuration
    sets `delta.columnMapping.mode` (the rename/drop-safe layouts), the
    data files, add.partitionValues and add.stats all speak the stable
    PHYSICAL names in each field's `delta.columnMapping.physicalName`
    metadata — the scan reads under the physical schema and aliases back
    to logical names (a zero-cost projection), partition and stats
    lookups translate logical -> physical, and callers keep speaking
    logical names everywhere. In 'id' mode the parquet columns resolve
    BY FIELD ID (`delta.columnMapping.id` attached as the read schema's
    `parquet.field.id` metadata, honored by Spark's fieldId resolution)
    — the protocol's actual contract, immune to physical-name drift.
    Nested-field renames are refused loudly, not served wrong.

  * deletion vectors (row-level deletes): an `add` carrying a
    `deletionVector` descriptor marks SOME of its rows deleted; the
    descriptor's RoaringBitmapArray (decoded in delta_dv.py from the
    public PROTOCOL.md + RoaringFormatSpec layouts, CRC-verified) holds
    the deleted 0-based row indexes. The scan applies them as a
    LEFT-ANTI join of `_metadata.row_index` against the decoded
    positions — bitmap bytes (the compressed-deleted-set size) are the
    only driver-side state; positions materialize on executors via
    mapInPandas and the join broadcasts when the descriptors' summed
    cardinality is small. Snapshot isolation holds: each version joins
    against exactly its own replayed descriptors;

  * protocol gating: `protocol` actions are replayed like metaData and
    reads REFUSE tables whose minReaderVersion / readerFeatures demand
    semantics this adapter does not implement — per PROTOCOL.md a
    reader that ignores an unknown reader feature can silently return
    wrong rows, the one failure mode a lake reader must never have.
    Served features: deletionVectors, columnMapping (name+id),
    v2Checkpoint, timestampNtz, vacuumProtocolCheck.

Out of scope, documented: nested-field renames under column mapping,
and the writer path. Reads enforce the protocol invariants this adapter
relies on: a replay path with no holes (every readable version is a
checkpoint seed plus a contiguous JSON tail) and a reader-feature set
it fully implements.
"""

from __future__ import annotations

import json
import math
import os
import re
import urllib.parse
from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_MULTIPART_RE = re.compile(
    r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$"
)
# V2 checkpoints: <v>.checkpoint.<uniqueId>.{json,parquet} — ONE middle
# segment (multi-part has two; dots are excluded from uniqueId so the
# two shapes cannot collide), carrying non-file actions plus `sidecar`
# actions whose files under _delta_log/_sidecars/ hold the file actions
_V2_CHECKPOINT_RE = re.compile(
    r"^(\d{20})\.checkpoint\.([0-9A-Za-z-]+)\.(json|parquet)$"
)


def _log_dir(table_path: str) -> str:
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"no _delta_log under {table_path}")
    return log_dir


def _fs_path(table_path: str, logged: str) -> str:
    """Resolve a log-recorded data-file path (`add.path` / `remove.path`
    / `cdc.path`) to the filesystem. The protocol records these
    PERCENT-ENCODED (RFC 2396) relative to the table root: a data file
    under a partition directory like `name=a b/` is logged as
    `name=a%20b/...`, and a literal `%` on disk is logged `%25` —
    joining the raw form reads a nonexistent (or, worse, a differently
    named existing) file. Decode at the FILESYSTEM boundary ONLY:
    replay state stays keyed by the raw log form, so add/remove/cdc
    pairing matches byte-for-byte regardless of writer encoding quirks.
    A POSIX-absolute `logged` path survives os.path.join unchanged; a
    protocol-legal SCHEME-PREFIXED absolute URI (``s3://bucket/x``,
    ``file:/x``) would NOT — os.path.join would produce a bogus local
    path like ``<table>/s3:/bucket/x`` and fail with a confusing
    missing-file error, so it is refused loudly instead (ADVICE r16;
    this adapter reads local filesystems only — validate, don't
    no-op). ``file:`` URIs are the one scheme that CAN be resolved
    locally, so they are."""
    if m := re.match(r"([A-Za-z][A-Za-z0-9+.-]*):", logged):
        scheme = m.group(1)
        if scheme.lower() != "file":
            raise ValueError(
                f"log-recorded data file path {logged!r} uses scheme "
                f"{scheme!r}; this adapter resolves local paths only — "
                "copy the table (or mount the store) locally first"
            )
        parsed = urllib.parse.urlparse(logged)
        if parsed.netloc not in ("", "localhost"):
            raise ValueError(
                f"file: URI {logged!r} names remote host "
                f"{parsed.netloc!r}; this adapter resolves local paths only"
            )
        return urllib.parse.unquote(parsed.path)
    return os.path.join(table_path, urllib.parse.unquote(logged))


def _listed_versions(log_dir: str) -> tuple[set[int], dict[int, list[str]]]:
    """(JSON commit versions, usable checkpoint seeds) from one listing.

    A seed maps a version to the ORDERED checkpoint file list holding its
    complete reconciled state: a single-part `<v>.checkpoint.parquet`, or
    a COMPLETE multi-part set `<v>.checkpoint.<i>.<n>.parquet` with every
    part 1..n present (PROTOCOL.md: the parts PARTITION the state — one
    slice is NOT a snapshot, so an incomplete set is never a seed).
    Incomplete sets are simply unusable — which is also the correct
    read-around behavior while a concurrent writer is mid-checkpoint:
    readability falls back to JSON replay exactly as if the torn
    checkpoint did not exist. When a version offers both a single-part
    file and a complete multi-part set, the fewest-files form wins
    (identical state, least IO). `_last_checkpoint` is NEVER read: it is
    purely a listing-avoidance hint and this adapter lists anyway, so a
    corrupt, stale, dangling, or even adversarial hint file cannot affect
    any read (ADVICE r12 generalized — the hint-parsing failure mode is
    gone because the hint has no consumer)."""
    json_v: set[int] = set()
    single: set[int] = set()
    parts: dict[tuple[int, int], set[int]] = {}
    v2: dict[int, str] = {}
    for f in os.listdir(log_dir):
        if m := _COMMIT_RE.match(f):
            json_v.add(int(m.group(1)))
        elif m := _CHECKPOINT_RE.match(f):
            single.add(int(m.group(1)))
        elif m := _MULTIPART_RE.match(f):
            v, i, n = (int(m.group(k)) for k in (1, 2, 3))
            if 1 <= i <= n:
                parts.setdefault((v, n), set()).add(i)
        elif m := _V2_CHECKPOINT_RE.match(f):
            v = int(m.group(1))
            # several v2 checkpoints may coexist for one version (each a
            # complete state); pick deterministically
            if v not in v2 or f < v2[v]:
                v2[v] = f
    seeds: dict[int, list[str]] = {
        v: [f"{v:020d}.checkpoint.parquet"] for v in single
    }
    for (v, n), have in sorted(parts.items(), key=lambda kv: kv[0][1]):
        if have == set(range(1, n + 1)) and (
            v not in seeds or n < len(seeds[v])
        ):
            seeds[v] = [
                f"{v:020d}.checkpoint.{i:010d}.{n:010d}.parquet"
                for i in range(1, n + 1)
            ]
    for v, f in v2.items():
        # classic forms are preferred when both exist (identical state;
        # the classic path needs no sidecar fan-out), so a v2 file seeds
        # only versions with no classic checkpoint
        seeds.setdefault(v, [f])
    return json_v, seeds


def list_delta_versions(table_path: str) -> list[int]:
    """Sorted READABLE versions of the table at ``<table>/_delta_log``.

    A version V is readable iff a replay path exists: V is itself a
    checkpoint, or V-1 is readable and V's JSON commit is present —
    i.e. some checkpoint (or commit 0) seeds a contiguous JSON tail up
    to V. On a log with no checkpoints this reduces to the original
    contiguous-from-0 rule. With checkpoints, missing JSON BELOW the
    oldest checkpoint is the normal log-retention state (those versions
    are simply not listed); a hole that makes the LATEST version
    unreachable still raises — replaying past a hole would silently
    produce a wrong snapshot, the one failure mode a lake reader must
    never have.

    Raises FileNotFoundError when the directory is missing (not a Delta
    table) and ValueError when the log is empty or the latest version is
    non-contiguous with every available seed.
    """
    log_dir = _log_dir(table_path)
    json_v, cp_v = _listed_versions(log_dir)
    if not json_v and not cp_v:
        raise ValueError(f"empty _delta_log under {table_path}")
    latest = max(json_v | set(cp_v))
    readable: list[int] = []
    reachable = False
    for v in range(latest + 1):
        reachable = v in cp_v or (reachable and v in json_v) or (
            v == 0 and v in json_v
        )
        if reachable:
            readable.append(v)
    if latest not in readable:
        raise ValueError(
            f"non-contiguous Delta log under {table_path}: version "
            f"{latest} is unreachable from any checkpoint or commit 0 "
            f"(json={sorted(json_v)}, checkpoints={sorted(cp_v)}); "
            "refusing to replay a log with holes"
        )
    return readable


def _json_actions(path: str):
    """Parsed actions of one newline-delimited JSON log file, with LOUD
    context on a torn or corrupt line. Delta writers publish commits
    atomically (write temp + rename), so a half-written line means
    filesystem corruption or a non-atomic copy of the log — a bare
    JSONDecodeError with no provenance sends the user grepping a
    500-commit log; name the file and line and refuse instead (r16,
    validate-don't-no-op rule)."""
    with open(path) as fh:
        for lineno, line in enumerate(fh, start=1):
            line = line.strip()
            if not line:
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError as e:
                raise ValueError(
                    f"corrupt Delta log file {os.path.basename(path)} "
                    f"line {lineno}: {e}. Commits are published "
                    "atomically, so a torn line means corruption or a "
                    "non-atomic copy — refusing to serve a partial commit"
                ) from e


def _commit_instant_ms(info):
    """A commit's instant from its ``commitInfo``, per the protocol
    precedence: ``inCommitTimestamp`` (the ICT writer feature — commit
    time recorded IN the commit, authoritative) falls back to
    ``timestamp`` (best-effort wall clock). The fallback applies when
    ICT is ABSENT OR EXPLICITLY NULL — ``info.get(key, default)``
    short-circuits on a present-but-null key and would silently skip a
    perfectly good wall-clock instant (r16; shared by
    delta_version_as_of and the CDF reader so the two surfaces can
    never disagree about the same commit's instant)."""
    if not isinstance(info, dict):
        return None
    ts = info.get("inCommitTimestamp")
    if ts is None:
        ts = info.get("timestamp")
    return ts


def delta_version_as_of(table_path: str, timestamp_ms: int) -> int:
    """The readable version current AS OF ``timestamp_ms`` — Delta's
    timestamp-based time travel, mirroring iceberg_snapshot_as_of.

    Per-commit instants follow the protocol's precedence:
    `commitInfo.inCommitTimestamp` (the ICT writer feature — commit time
    recorded IN the commit, authoritative) > `commitInfo.timestamp`
    (best-effort wall clock) > the commit file's modification time (the
    classic pre-ICT behavior). Non-monotonic raw instants are adjusted
    upward (ts[v] = max(ts[v], ts[v-1] + 1), the reference
    implementation's rule) so resolution is well-defined under writer
    clock skew. Versions whose JSON commit the retention policy removed
    (checkpoint-only seeds) carry no instant; an instant that predates
    the EARLIEST dated version raises — that history is gone, serving
    the oldest version instead would silently misrepresent it. An
    instant AFTER the latest dated version also raises (ADVICE r14),
    matching Delta's reference timestampAsOf (DeltaHistoryManager with
    canReturnLastCommit=false): a caller probing a future instant gets
    the error, not a version that may be superseded moments later —
    note this deliberately diverges from iceberg_snapshot_as_of's
    Iceberg-style clamp-to-current semantics, because each adapter
    mirrors ITS reference's contract."""
    log_dir = _log_dir(table_path)
    versions = list_delta_versions(table_path)
    json_v, _ = _listed_versions(log_dir)
    dated: list[tuple[int, int]] = []
    for v in versions:
        if v not in json_v:
            continue
        path = os.path.join(log_dir, f"{v:020d}.json")
        ts = None
        for action in _json_actions(path):
            info = action.get("commitInfo")
            if info is not None:
                ts = _commit_instant_ms(info)
                break
        if ts is None:
            ts = int(os.path.getmtime(path) * 1000)
        dated.append((v, int(ts)))
    if not dated:
        raise ValueError(
            f"no dated commits under {table_path}: every readable version "
            "is checkpoint-only (JSON removed by retention), so no "
            "timestamp can be resolved"
        )
    adjusted: list[tuple[int, int]] = []
    prev = None
    for v, ts in dated:
        if prev is not None and ts <= prev:
            ts = prev + 1
        adjusted.append((v, ts))
        prev = ts
    if timestamp_ms > adjusted[-1][1]:
        raise ValueError(
            f"timestamp {timestamp_ms} is after the latest dated version "
            f"{adjusted[-1][0]} at {adjusted[-1][1]} (Delta timestampAsOf "
            "semantics: a future instant is an error, not the latest "
            "version)"
        )
    best = None
    for v, ts in adjusted:
        if ts <= timestamp_ms:
            best = v
    if best is None:
        raise ValueError(
            f"no commit at or before timestamp {timestamp_ms}: the "
            f"earliest dated version is {adjusted[0][0]} at "
            f"{adjusted[0][1]} (earlier history, if any, has been "
            "removed by log retention)"
        )
    return best


def _replay(
    table_path: str, version: int | None
) -> tuple[dict[str, dict], dict | None]:
    """Replay through ``version``: (active adds keyed by relative path,
    each mapped to {"partitionValues": dict, "stats": dict|None,
    "deletionVector": dict|None}; the table's metaData action or None).
    The single replay loop every public reader shares. Refuses snapshots
    whose replayed `protocol` action demands reader features this
    adapter does not implement."""
    versions = list_delta_versions(table_path)
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(
            f"version {version} not in Delta log (readable: {versions})"
        )
    log_dir = _log_dir(table_path)
    _, cp_v = _listed_versions(log_dir)
    active: dict[str, dict] = {}  # insertion-ordered: rel path -> partitionValues
    meta: dict | None = None
    protocol: dict | None = None
    # Seed from the newest checkpoint ≤ the target. Readability (checked
    # above) guarantees the JSON tail after it is complete: any replay
    # chain to `version` must either cross every intermediate version via
    # JSON or re-seed at a later checkpoint — and there is none later
    # than the max. Versions below the oldest seed were never listed.
    seed = max((c for c in cp_v if c <= version), default=None)
    start = 0
    if seed is not None:
        adds, meta, protocol = _checkpoint_state(
            [os.path.join(log_dir, f) for f in cp_v[seed]]
        )
        for p, entry in adds:
            active[p] = entry
        start = seed + 1
    for v in range(start, version + 1):
        for action in _json_actions(os.path.join(log_dir, f"{v:020d}.json")):
            if "add" in action:
                active[action["add"]["path"]] = _add_entry(
                    action["add"].get("partitionValues"),
                    action["add"].get("stats"),
                    action["add"].get("deletionVector"),
                )
            elif "remove" in action:
                # logical delete: the file stays on disk (old
                # snapshots still reference it) but leaves this and
                # later versions
                active.pop(action["remove"]["path"], None)
            elif "metaData" in action:
                meta = action["metaData"]
            elif "protocol" in action:
                protocol = action["protocol"]
    _check_reader_protocol(protocol, table_path)
    return active, meta


def _add_entry(partition_values, stats, deletion_vector=None) -> dict:
    """Normalized per-add replay entry. `stats` is PROTOCOL.md's JSON
    STRING (kept lazy: parsed only if a stats_filter asks);
    `deletionVector` is the raw descriptor dict or None (decoded lazily
    by the scan, and only for descriptors with nonzero cardinality)."""
    return {
        "partitionValues": dict(partition_values or {}),
        "stats": stats,
        "deletionVector": dict(deletion_vector) if deletion_vector else None,
    }


# Reader features this adapter fully implements; anything else refuses.
# 'deletionVectors', 'columnMapping' and 'v2Checkpoint' are served
# above/below; 'timestampNtz' is a pure type (Spark's TimestampNTZType
# reads it); 'vacuumProtocolCheck' constrains VACUUM, demanding nothing
# of a reader.
_SUPPORTED_READER_FEATURES = frozenset(
    {"deletionVectors", "columnMapping", "timestampNtz",
     "vacuumProtocolCheck", "v2Checkpoint"}
)


def _check_reader_protocol(protocol: dict | None, table_path: str) -> None:
    """Refuse tables whose `protocol` action demands reader capabilities
    this adapter lacks (PROTOCOL.md: readers MUST refuse, not ignore,
    unknown reader features — serving a table under an unimplemented
    feature can silently drop or resurrect rows). Tables with no
    retained protocol action, or minReaderVersion <= 2 (base + column
    mapping, both handled or refused precisely elsewhere), pass."""
    if not protocol:
        return
    min_reader = int(protocol.get("minReaderVersion") or 1)
    if min_reader <= 2:
        return
    if min_reader > 3:
        raise ValueError(
            f"table {table_path} requires minReaderVersion {min_reader}; "
            "this adapter implements reader protocol 3 — refusing rather "
            "than misreading a newer table"
        )
    features = set(protocol.get("readerFeatures") or [])
    if unsupported := features - _SUPPORTED_READER_FEATURES:
        raise ValueError(
            f"table {table_path} requires reader features "
            f"{sorted(unsupported)} this adapter does not implement "
            f"(supported: {sorted(_SUPPORTED_READER_FEATURES)}); refusing "
            "rather than serving a silently-wrong snapshot"
        )


def delta_active_files(table_path: str, version: int | None = None) -> list[str]:
    """Replay the log through ``version`` (default: latest) and return the
    snapshot's active data-file paths, absolute, in first-added order.

    Pure metadata work: cost ∝ number of log actions, independent of
    table data size — the property that makes lake commits cheap at
    100 TB (a commit is new files + one small log object; old data is
    never rewritten or rescanned to read history).

    Note: a FILE list cannot express row-level deletes — an active file
    may carry a deletionVector whose rows must be dropped at scan time.
    read_delta_snapshot applies them; callers scanning this list
    directly are reading the physical files, deleted rows included.
    """
    active, _ = _replay(table_path, version)
    return [_fs_path(table_path, p) for p in active]


def _first_struct_row(table, col):
    """First non-null struct row of an action column (metaData/protocol
    appear exactly once per checkpoint). None for absent or all-null
    columns (an all-null column infers a null, non-struct type)."""
    import pyarrow as pa

    if col in table.column_names and pa.types.is_struct(
        table.column(col).type
    ):
        for row in table.column(col).to_pylist():
            if row is not None:
                return row
    return None


def _parquet_add_rows(table) -> list[tuple[str, dict]]:
    """(path, replay entry) for every non-null `add` row of a checkpoint
    or sidecar parquet table. to_pylist returns None for rows where the
    parent struct is null (protocol/metaData/remove rows) regardless of
    child buffers; map<string,string> materializes as (k, v) pairs,
    which dict() inside _add_entry normalizes alongside plain dicts."""
    import pyarrow as pa

    if "add" not in table.column_names:
        return []  # part with no add actions (or empty-table checkpoint)
    adds_col = table.column("add")
    if not pa.types.is_struct(adds_col.type):
        return []  # all-null add column infers null type
    return [
        (row["path"],
         _add_entry(row.get("partitionValues"), row.get("stats"),
                    row.get("deletionVector")))
        for row in adds_col.to_pylist()
        if row is not None
    ]


def _checkpoint_state(
    cp_files: list[str],
) -> tuple[list[tuple[str, dict]], dict | None, dict | None]:
    """(active (path, partitionValues) pairs, metaData action or None,
    protocol action or None) from one checkpoint — a single-part file,
    every part of a complete multi-part set (the caller guarantees
    completeness; the parts PARTITION the reconciled action state, so
    their concatenation is exactly the single-part content, in any part
    order — action rows are keyed, never positional), or a V2 top-level
    file (routed to _v2_checkpoint_state, which follows its sidecars).

    A checkpoint row is one action; rows whose `add` struct is non-null
    ARE the snapshot's active file set (remove rows are VACUUM
    tombstones, irrelevant to a snapshot read; txn rows carry no files;
    the metaData row carries the schema and partition columns a
    partitioned read needs; the protocol row gates readability). An
    add row's `deletionVector` struct survives into the replay entry —
    a checkpointed DV is as binding as a JSON one. Driver-side pyarrow
    read, action-count-sized — same cost class as the JSON replay it
    replaces."""
    import pyarrow.parquet as pq

    if len(cp_files) == 1 and _V2_CHECKPOINT_RE.match(
        os.path.basename(cp_files[0])
    ):
        return _v2_checkpoint_state(cp_files[0])
    adds: list[tuple[str, dict]] = []
    meta: dict | None = None
    protocol: dict | None = None
    for cp_file in cp_files:
        table = pq.read_table(cp_file)
        if meta is None:
            meta = _first_struct_row(table, "metaData")
        if protocol is None:
            protocol = _first_struct_row(table, "protocol")
        adds.extend(_parquet_add_rows(table))
    return adds, meta, protocol


def _v2_checkpoint_state(
    top_path: str,
) -> tuple[list[tuple[str, dict]], dict | None, dict | None]:
    """Reconciled state from a V2 checkpoint (PROTOCOL.md "V2
    Checkpoints"): the top-level `<v>.checkpoint.<uniqueId>.{json,
    parquet}` file carries the non-file actions (protocol, metaData,
    checkpointMetadata) plus `sidecar` actions; the file actions live in
    the referenced parquet files under `_delta_log/_sidecars/`, which
    together hold the same row set a classic checkpoint would. File
    actions directly in the top-level file (the no-sidecar variant) are
    honored too. A missing sidecar fails loudly — a partial state must
    never be served as a snapshot."""
    import pyarrow.parquet as pq

    adds: list[tuple[str, dict]] = []
    meta: dict | None = None
    protocol: dict | None = None
    sidecars: list[str] = []
    if top_path.endswith(".json"):
        for action in _json_actions(top_path):
            if "add" in action:
                adds.append(
                    (action["add"]["path"],
                     _add_entry(action["add"].get("partitionValues"),
                                action["add"].get("stats"),
                                action["add"].get("deletionVector")))
                )
            elif "metaData" in action:
                meta = action["metaData"]
            elif "protocol" in action:
                protocol = action["protocol"]
            elif "sidecar" in action:
                sidecars.append(action["sidecar"]["path"])
    else:
        table = pq.read_table(top_path)
        meta = _first_struct_row(table, "metaData")
        protocol = _first_struct_row(table, "protocol")
        adds.extend(_parquet_add_rows(table))
        import pyarrow as pa

        if "sidecar" in table.column_names and pa.types.is_struct(
            table.column("sidecar").type
        ):
            sidecars.extend(
                row["path"]
                for row in table.column("sidecar").to_pylist()
                if row is not None
            )
    sidecar_dir = os.path.join(os.path.dirname(top_path), "_sidecars")
    for sp in sidecars:
        if sp.startswith("file:"):
            sp = "/" + sp.split(":", 1)[1].lstrip("/")
        elif "://" in sp:
            raise ValueError(
                f"sidecar at non-local URI {sp!r}: this adapter reads "
                "the local filesystem only"
            )
        path = sp if os.path.isabs(sp) else os.path.join(sidecar_dir, sp)
        adds.extend(_parquet_add_rows(pq.read_table(path)))
    return adds, meta, protocol


def read_delta_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    partition_filter: dict[str, str] | None = None,
    stats_filter: list[tuple[str, str, float]] | None = None,
) -> DataFrame:
    """Spark DataFrame over one Delta snapshot (default: latest version).

    The returned plan is an ordinary multi-file parquet scan restricted
    to the snapshot's active files — Catalyst sees a FileScan, so filter
    pushdown and column pruning behave exactly as on a native table; the
    log replay above it is driver-side metadata only (file-list-sized,
    the Iceberg planning pattern the lake_* ops already use).

    Partitioned tables: Delta stores partition column VALUES only in the
    log (`add.partitionValues`) — the data files do not contain those
    columns at all, so a naive multi-file read would silently drop them.
    Here each partition-value group becomes one scan with its partition
    columns attached as literals (cast per the metaData schemaString,
    Delta's canonical string encoding, "" meaning null), unioned by
    name. Literal partition columns constant-fold under Catalyst, and
    ``partition_filter`` ({column: string-encoded value}) prunes whole
    groups driver-side BEFORE any scan is built — the log-only partition
    pruning that makes a 100 TB partitioned read list only the files it
    touches.

    ``stats_filter`` ([(column, op, numeric_literal)], op in
    = < <= > >=) prunes individual FILES by the per-file
    minValues/maxValues in ``add.stats`` — Delta's zone-map device. A
    file is dropped only when its [min, max] provably excludes every
    matching row; files with missing/partial stats are always kept, so
    the filter can only skip work, never rows. Restricted to NUMERIC
    literals on purpose: writers may truncate long string stats, which
    would make string range pruning unsound, while numeric stats are
    always exact. The predicate still belongs in `.filter()` too — this
    only shrinks the file list the scan is planned over.
    """
    active, meta = _replay(table_path, version)
    if not active:
        raise ValueError(
            f"Delta snapshot {version} of {table_path} has no active "
            "files; cannot infer a schema from an empty file list"
        )
    mapping = _column_mapping(meta)  # column-mapping descriptor, or None
    # Row-level deletes: abs data-file path -> deletionVector descriptor,
    # for every active add whose DV actually deletes something. Built
    # from THIS version's replay, so time travel joins each snapshot
    # against exactly its own deleted sets.
    dv_map = {
        os.path.abspath(_fs_path(table_path, p)): entry["deletionVector"]
        for p, entry in active.items()
        if entry.get("deletionVector")
        and int(entry["deletionVector"].get("cardinality") or 0) > 0
    }
    with_rowpos = bool(dv_map)

    def _phys(col: str) -> str:
        return mapping["physical"].get(col, col) if mapping else col

    if stats_filter:
        _validate_stats_filter(stats_filter)
        # callers speak LOGICAL names; add.stats is keyed by the
        # physical names under column mapping
        phys_stats_filter = [
            (_phys(col), op, lit) for col, op, lit in stats_filter
        ]
        survivors = {
            p: entry
            for p, entry in active.items()
            if _stats_file_survives(entry["stats"], phys_stats_filter)
        }
        if not survivors:
            # A filter legitimately matching zero files is an empty
            # RESULT, not an error — when metaData.schemaString is present
            # the schema is known without any file, so behave like the
            # equivalent .filter(): empty DataFrame, correct schema
            # (ADVICE r12). Only the schema-inference fallback (no
            # schemaString in the retained log) still has to refuse.
            if (empty := _empty_snapshot_df(spark, meta)) is not None:
                return empty
            raise ValueError(
                f"stats_filter {stats_filter} prunes every file of "
                f"snapshot {version}; an empty scan has no schema — "
                "drop the filter or relax it"
            )
        active = survivors
    part_cols = list((meta or {}).get("partitionColumns") or [])
    if not part_cols:
        if partition_filter:
            raise ValueError(
                f"partition_filter {partition_filter} on an unpartitioned "
                f"table (metaData declares no partitionColumns)"
            )
        if any(a["partitionValues"] for a in active.values()):
            raise ValueError(
                f"table {table_path} has add actions with partitionValues "
                "but no metaData declaring partitionColumns in the "
                "retained log — refusing to read partition columns as "
                "data-only"
            )
        df = _read_files(
            spark, meta, [], [_fs_path(table_path, p) for p in active],
            mapping, with_rowpos=with_rowpos,
        )
        if dv_map:
            df = _apply_deletion_vectors(spark, df, dv_map, table_path)
        return df
    if partition_filter and (bad := set(partition_filter) - set(part_cols)):
        raise ValueError(
            f"partition_filter keys {sorted(bad)} are not partition "
            f"columns {part_cols}"
        )
    part_types = _partition_column_types(meta, part_cols)
    groups: dict[tuple, list[str]] = {}
    for p, entry in active.items():
        # Normalize the group key at construction: a null partition value
        # has THREE raw encodings (missing key -> None, JSON null -> None,
        # "" per Delta's canonical string encoding) that must form ONE
        # group — different writers use different encodings for the same
        # null partition (ADVICE r12).
        key = tuple(
            _norm_part_value(entry["partitionValues"].get(_phys(c)))
            for c in part_cols
        )
        groups.setdefault(key, []).append(_fs_path(table_path, p))
    if partition_filter:
        # Values must be Delta's canonical STRING encoding (or None/""
        # for null) — the log stores partitionValues as strings, so a
        # date/int/bool literal would compare unequal against every
        # group and silently return an empty result; refuse loudly
        # instead (the Iceberg adapter's validate-don't-no-op rule).
        bad_vals = {
            c: v for c, v in partition_filter.items()
            if v is not None and not isinstance(v, str)
        }
        if bad_vals:
            raise ValueError(
                f"partition_filter values must be Delta's canonical "
                f"string encoding (or None for null); got non-string "
                f"values {bad_vals!r} — encode them as the log does "
                "(e.g. '2024-01-15', '42', 'true')"
            )
        # the same normalization applies to filter values, so
        # partition_filter={"col": ""} matches null-partition files
        # whichever encoding their writer chose
        norm_filter = {
            c: _norm_part_value(v) for c, v in partition_filter.items()
        }
        groups = {
            key: files
            for key, files in groups.items()
            if all(
                key[part_cols.index(c)] == v
                for c, v in norm_filter.items()
            )
        }
        if not groups:
            # empty RESULT, not an error, when the schema is known —
            # same contract as the stats_filter branch above (ADVICE r12)
            if (empty := _empty_snapshot_df(spark, meta)) is not None:
                return empty
            raise ValueError(
                f"partition_filter {partition_filter} matches no partition "
                f"of snapshot {version}"
            )
    from pyspark.sql import functions as F

    out: DataFrame | None = None
    for key, files in groups.items():
        df = _read_files(spark, meta, part_cols, files, mapping,
                         with_rowpos=with_rowpos)
        for c, raw in zip(part_cols, key):
            # keys are normalized above: None IS the null marker
            lit = F.lit(None) if raw is None else F.lit(raw)
            df = df.withColumn(c, lit.cast(part_types[c]))
        out = df if out is None else out.unionByName(df)
    if dv_map:
        out = _apply_deletion_vectors(spark, out, dv_map, table_path)
    return out


def _norm_part_value(raw):
    """Canonical null marker for a partition value: Delta encodes null as
    "" in partitionValues, but a missing key or a JSON null mean the same
    thing — one canonical form (None) so grouping and partition_filter
    comparison cannot split null-partition files by writer encoding."""
    return None if raw in (None, "") else raw


def _empty_snapshot_df(spark: SparkSession, meta: dict | None) -> DataFrame | None:
    """Empty DataFrame under the declared table schema, columns ordered
    exactly as a non-empty read would return them (data fields in
    schemaString order, then partition columns in metaData order, typed
    per _partition_column_types). None when the retained log carries no
    schemaString — the schema-inference path genuinely cannot represent
    an empty scan."""
    schema_str = (meta or {}).get("schemaString")
    if not schema_str:
        return None
    from pyspark.sql.types import StructType, _parse_datatype_string

    full = StructType.fromJson(json.loads(schema_str))
    part_cols = list((meta or {}).get("partitionColumns") or [])
    fields = [f for f in full.fields if f.name not in set(part_cols)]
    schema = StructType(fields)
    for c, t in _partition_column_types(meta, part_cols).items():
        schema = schema.add(c, _parse_datatype_string(t))
    return spark.createDataFrame([], schema)


def _read_files(
    spark: SparkSession,
    meta: dict | None,
    part_cols: list[str],
    files: list[str],
    mapping: dict[str, str] | None = None,
    with_rowpos: bool = False,
    extra_fields: tuple = (),
) -> DataFrame:
    """Parquet scan over one snapshot's files, under the TABLE schema.

    The schema of a Delta table is metaData.schemaString, NOT whatever a
    sample data file happens to contain — files written before a column
    was added simply lack it, and Spark's explicit-schema parquet read
    fills those as nulls, which is exactly Delta's schema-evolution
    semantics. Without the explicit schema the read would take its
    schema from an arbitrary file and either drop the new column or fail
    depending on which file Spark samples. Partition columns are carved
    out (they are never in the data files; the caller attaches them as
    typed literals). Falls back to inference when the retained log has
    no schemaString.

    Under column mapping (``mapping``: logical -> physical), the data
    files store PHYSICAL column names (rename/drop-safe GUIDs), so the
    scan reads under the physical schema and immediately aliases back to
    the logical names — the rename is a zero-cost projection Catalyst
    folds into the scan.

    ``with_rowpos`` (the deletion-vector path) additionally selects the
    parquet reader's hidden `_metadata.file_path` / `_metadata.row_index`
    columns as `__dv_fp` / `__dv_rowidx` — the per-file row ordinal a DV's
    deleted positions are defined against.

    ``extra_fields`` (StructFields) extend the explicit read schema
    beyond the table columns — the change-data-feed path reads the
    `_change_type` column cdc files physically carry. They are metadata
    columns, never subject to column mapping."""
    from pyspark.sql import functions as F

    rowpos_cols = (
        [
            F.col("_metadata.file_path").alias("__dv_fp"),
            F.col("_metadata.row_index").alias("__dv_rowidx"),
        ]
        if with_rowpos
        else []
    )
    schema_str = (meta or {}).get("schemaString")
    if not schema_str:
        df = spark.read.parquet(*files)
        return df.select("*", *rowpos_cols) if rowpos_cols else df
    from pyspark.sql.types import StructField, StructType

    full = StructType.fromJson(json.loads(schema_str))
    data_fields = [f for f in full.fields if f.name not in set(part_cols)]
    if mapping:
        phys_names = mapping["physical"]
        ids = mapping["ids"]
        phys = StructType(
            [
                StructField(
                    phys_names[f.name], f.dataType, f.nullable,
                    metadata=(
                        {"parquet.field.id": ids[f.name]}
                        if f.name in ids
                        else None
                    ),
                )
                for f in data_fields
            ]
            + list(extra_fields)
        )
        if mapping["mode"] == "id":
            # id-mode files resolve by parquet field id, not name; the
            # conf only affects reads whose schema carries id metadata
            spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        return spark.read.schema(phys).parquet(*files).select(
            *[F.col(phys_names[f.name]).alias(f.name) for f in data_fields],
            *[F.col(f.name) for f in extra_fields],
            *rowpos_cols,
        )
    df = spark.read.schema(
        StructType(data_fields + list(extra_fields))
    ).parquet(*files)
    return df.select("*", *rowpos_cols) if rowpos_cols else df


# Path characters whose Hadoop-URI form is identity — the anti-join
# compares `_metadata.file_path` (a URI) against plain absolute paths,
# which is only sound when no character needed percent-escaping. Delta
# writers name data files with UUID-hex + dashes and encode partition
# directories themselves, so real tables pass; anything exotic refuses
# loudly instead of silently resurrecting deleted rows on a mismatch.
_DV_SAFE_PATH_RE = re.compile(r"^[A-Za-z0-9/._\-=+]+$")

# Broadcast the decoded deleted-positions side while its row count (the
# summed descriptor cardinality, known from metadata alone) stays well
# under executor-memory scale; beyond that the anti-join shuffles both
# sides on (file, row_index) like any large join.
_DV_BROADCAST_MAX_CARDINALITY = 4_000_000


def _apply_deletion_vectors(
    spark: SparkSession, df: DataFrame, dv_map: dict[str, dict],
    table_path: str,
) -> DataFrame:
    """Drop each file's DV-deleted row indexes from a snapshot scan.

    Shape: the descriptors' bitmap BYTES (compressed-deleted-set-sized,
    CRC-verified — delta_dv.load_dv_bytes) are the only driver-side
    state; they ship to executors as a binary column and a mapInPandas
    decode (delta_dv.decode_dv_positions, vectorized numpy) materializes
    the (file, row_index) deleted set distributed — the driver never
    holds positions. The scan side carries `_metadata.row_index`, and a
    LEFT-ANTI join removes deleted rows; the deleted side broadcasts
    when the descriptors' summed cardinality (metadata, no decode
    needed) is small, which is every realistic DV workload — DVs exist
    precisely because the deleted fraction is tiny relative to the data.
    """
    from pyspark.sql import functions as F

    from . import delta_dv

    for path in dv_map:
        if not _DV_SAFE_PATH_RE.match(path):
            raise ValueError(
                f"data file path {path!r} contains characters that "
                "percent-escape in Spark's _metadata.file_path URI; the "
                "deletion-vector row join cannot be proven sound for it "
                "— refusing rather than risking resurrected rows"
            )
    payload = [
        (
            path,
            bytes(delta_dv.load_dv_bytes(desc, table_path)),
            int(desc.get("cardinality") or 0),
        )
        for path, desc in dv_map.items()
    ]
    total_card = sum(card for _, _, card in payload)
    blobs = spark.createDataFrame(
        payload, schema="__dv_file string, __dv_blob binary, __dv_card long"
    ).repartition(min(len(payload), 32))

    def _positions(batches):
        import pandas as pd

        for pdf in batches:
            for path, blob, card in zip(
                pdf["__dv_file"], pdf["__dv_blob"], pdf["__dv_card"]
            ):
                pos = delta_dv.decode_dv_positions(bytes(blob))
                if len(pos) != card:
                    raise ValueError(
                        f"deletion vector for {path} decodes to "
                        f"{len(pos)} positions but its descriptor "
                        f"declares cardinality {card}"
                    )
                yield pd.DataFrame({"__dv_file": path, "__dv_pos": pos})

    deleted = blobs.mapInPandas(
        _positions, schema="__dv_file string, __dv_pos long"
    )
    if total_card <= _DV_BROADCAST_MAX_CARDINALITY:
        deleted = F.broadcast(deleted)
    # `_metadata.file_path` is a URI ("file:/abs/path"); strip the scheme
    # to compare against the replay's absolute paths (guarded above to
    # contain no escaping characters).
    scan_path = F.regexp_replace(
        F.col("__dv_fp"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/*", "/"
    )
    out = df.join(
        deleted,
        (scan_path == deleted["__dv_file"])
        & (F.col("__dv_rowidx") == deleted["__dv_pos"]),
        "left_anti",
    )
    return out.drop("__dv_fp", "__dv_rowidx")


def _column_mapping(meta: dict | None) -> dict | None:
    """Column-mapping descriptor when the table has it enabled
    (PROTOCOL.md: `delta.columnMapping.mode` in metaData.configuration;
    each schema field then carries its stable physical name in
    `delta.columnMapping.physicalName` metadata, and data files /
    add.partitionValues / add.stats all speak PHYSICAL names). Returns
    None in the default 'none' mode, else {"mode": "name"|"id",
    "physical": {logical: physical name}, "ids": {logical: field id}}.

    Both modes are served on FLAT schemas. 'name' resolves parquet
    columns by physical name; 'id' resolves them BY PARQUET FIELD ID
    (`delta.columnMapping.id`, written into the files' parquet field_id
    metadata) — the read schema carries each field's id as
    `parquet.field.id` metadata and Spark's fieldId resolution honors
    it, so a physical-name drift between log and files cannot misread.
    Refused loudly rather than served wrong: nested fields carrying
    their own physicalName (rewriting names inside struct/array/map
    types is a type surgery this adapter does not claim)."""
    conf = (meta or {}).get("configuration") or {}
    mode = conf.get("delta.columnMapping.mode") or "none"
    if mode == "none":
        return None
    if mode not in ("name", "id"):
        raise ValueError(
            f"columnMapping mode {mode!r} is not a protocol mode "
            "(none/name/id); refusing rather than guessing"
        )
    schema_str = meta.get("schemaString")
    if not schema_str:
        raise ValueError(
            f"columnMapping={mode} but the retained log carries no "
            "metaData.schemaString to map from"
        )
    physical: dict[str, str] = {}
    ids: dict[str, int] = {}
    for f in json.loads(schema_str).get("fields", []):
        if _has_nested_physical_name(f.get("type")):
            raise ValueError(
                f"columnMapping={mode} with a NESTED physicalName under "
                f"field {f.get('name')!r}: nested-type renames are out "
                "of scope for this adapter — refusing rather than "
                "serving wrong nested names"
            )
        fmeta = f.get("metadata") or {}
        phys = fmeta.get("delta.columnMapping.physicalName")
        if not phys:
            raise ValueError(
                f"columnMapping={mode} but field {f.get('name')!r} lacks "
                "delta.columnMapping.physicalName metadata — the log is "
                "inconsistent; refusing rather than guessing the "
                "physical name"
            )
        physical[f["name"]] = phys
        fid = fmeta.get("delta.columnMapping.id")
        if mode == "id":
            if fid is None:
                raise ValueError(
                    f"columnMapping=id but field {f.get('name')!r} lacks "
                    "delta.columnMapping.id metadata — id-mode resolution "
                    "has nothing to resolve by"
                )
            ids[f["name"]] = int(fid)
    return {"mode": mode, "physical": physical, "ids": ids}


def _has_nested_physical_name(t) -> bool:
    """True when a Spark-JSON type tree contains a field-level
    physicalName below the top level (nested column mapping)."""
    if not isinstance(t, dict):
        return False
    if t.get("type") == "struct":
        for f in t.get("fields", []):
            if (f.get("metadata") or {}).get("delta.columnMapping.physicalName"):
                return True
            if _has_nested_physical_name(f.get("type")):
                return True
        return False
    if t.get("type") == "array":
        return _has_nested_physical_name(t.get("elementType"))
    if t.get("type") == "map":
        return _has_nested_physical_name(t.get("keyType")) or (
            _has_nested_physical_name(t.get("valueType"))
        )
    return False


_STATS_OPS = ("=", "<", "<=", ">", ">=")


def _validate_stats_filter(stats_filter) -> None:
    for pred in stats_filter:
        col, op, lit = pred
        if op not in _STATS_OPS:
            raise ValueError(f"stats_filter op {op!r} not in {_STATS_OPS}")
        if isinstance(lit, bool) or not isinstance(lit, (int, float)):
            raise ValueError(
                f"stats_filter literal {lit!r} for {col} must be numeric "
                "(string stats may be writer-truncated; pruning on them "
                "would be unsound)"
            )


class _RawJsonFloat(str):
    """A JSON fractional number kept as its RAW decimal text.

    json.loads' default parse_float routes every fractional stat through
    float64 — but add.stats records DECIMAL-column bounds as JSON
    numbers too, and a decimal min like 92233720368547758.09 rounds UP
    to 92233720368547760 in float64, silently pruning a file that holds
    a matching row (representation-boundary class, found r16; the same
    caller-literal-vs-stored-form family as the r15 Iceberg
    _stored_repr fix). Keeping the text lets _numeric_bound compare
    EXACTLY under both possible storage interpretations."""


def _numeric_bound(v, side: str):
    """Exact comparable value for a JSON-recorded numeric bound, or None
    (None KEEPS the file). The stats JSON does not say whether the
    column is float-typed (the text denotes the nearest float64 — the
    shortest-roundtrip form Spark writes) or decimal-typed (the text IS
    the exact value), so a fractional bound takes the CONSERVATIVE of
    the two exact interpretations: the smaller for a lower bound, the
    larger for an upper bound — sound under either column type, at the
    cost of at most one kept file per half-ulp of divergence."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, _RawJsonFloat):
        try:
            as_decimal = Fraction(str(v))
            as_float = float(v)
        except (ValueError, OverflowError):
            return None
        if math.isinf(as_float) or math.isnan(as_float):
            return None
        as_f64 = Fraction(as_float)
        return min(as_decimal, as_f64) if side == "lo" else max(as_decimal, as_f64)
    if isinstance(v, float):  # NaN/Infinity arrive via parse_constant
        if math.isnan(v) or math.isinf(v):
            return None
        return v
    return None


def _stats_file_survives(stats_json, stats_filter) -> bool:
    """True unless the file's [min, max] provably excludes every row
    matching ALL predicates. Missing stats / missing column stats /
    non-numeric recorded bounds keep the file — skipping is an
    optimization that must never be able to drop a matching row.
    Fractional bounds are compared EXACTLY (see _numeric_bound) —
    float64 round-tripping a decimal column's recorded bound can move
    it past a matching literal."""
    if not stats_json:
        return True
    try:
        stats = (
            json.loads(stats_json, parse_float=_RawJsonFloat)
            if isinstance(stats_json, str)
            else stats_json
        )
    except (ValueError, TypeError):
        return True
    mins = stats.get("minValues") or {}
    maxs = stats.get("maxValues") or {}
    for col, op, lit in stats_filter:
        lo = _numeric_bound(mins.get(col), "lo")
        hi = _numeric_bound(maxs.get(col), "hi")
        if op == "=" and (
            (lo is not None and lit < lo) or (hi is not None and lit > hi)
        ):
            return False
        if op == "<" and lo is not None and lo >= lit:
            return False
        if op == "<=" and lo is not None and lo > lit:
            return False
        if op == ">" and hi is not None and hi <= lit:
            return False
        if op == ">=" and hi is not None and hi < lit:
            return False
    return True


def delta_incremental_files(
    table_path: str, since_version: int, to_version: int | None = None
) -> list[tuple[int, str]]:
    """(version, absolute path) for every data-CHANGING file added in
    (since_version, to_version] — the micro-batch planner of
    streaming-from-Delta: a reader that has consumed through
    ``since_version`` processes exactly these files to catch up, each
    file exactly once (Delta appends are immutable; a row's file is its
    one delivery). Adds with ``dataChange: false`` (compaction /
    clustering rewrites) are SKIPPED — their rows were already delivered
    by the original files — and a remove with ``dataChange: true`` in
    the window raises, because deletes cannot be represented as an
    append-only increment (that is what CDC feeds are for; the lake_*
    ops' stream_cdc_apply models that consumption path).

    Requires the JSON commits in the window: increments are
    PER-VERSION facts that a checkpoint (a reconciled state) cannot
    reconstruct — asking below the retained history raises.
    """
    versions = list_delta_versions(table_path)
    if to_version is None:
        to_version = versions[-1]
    log_dir = _log_dir(table_path)
    json_v, _ = _listed_versions(log_dir)
    need = range(since_version + 1, to_version + 1)
    if missing := [v for v in need if v not in json_v]:
        raise ValueError(
            f"incremental read needs JSON commits {list(need)} but "
            f"{missing} are not retained (checkpoints cannot reconstruct "
            "per-version increments)"
        )
    out: list[tuple[int, str]] = []
    for v in need:
        for action in _json_actions(
            os.path.join(log_dir, f"{v:020d}.json")
        ):
            if "add" in action:
                if action["add"].get("dataChange", True):
                    dv = action["add"].get("deletionVector") or {}
                    if int(dv.get("cardinality") or 0) > 0:
                        raise ValueError(
                            f"version {v} adds "
                            f"{action['add']['path']} with a "
                            "deletion vector: its rows are the file "
                            "MINUS the deleted set, which an "
                            "append-only file increment cannot "
                            "express (a DV commit is a row-level "
                            "delete — consume it via CDC, not "
                            "incremental files)"
                        )
                    out.append(
                        (v, _fs_path(table_path, action["add"]["path"]))
                    )
            elif "remove" in action:
                if action["remove"].get("dataChange", True):
                    raise ValueError(
                        f"version {v} removes "
                        f"{action['remove']['path']} with "
                        "dataChange=true: a delete cannot be served "
                        "as an append-only increment"
                    )
            elif "protocol" in action:
                # a mid-window protocol upgrade to features this
                # adapter lacks invalidates the increments after it
                _check_reader_protocol(action["protocol"], table_path)
    return out


def delta_changes(
    spark: SparkSession,
    table_path: str,
    since_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change-data-feed read: every row-level change committed in
    ``(since_version, to_version]``, as a DataFrame of the table columns
    plus `_change_type` (insert / delete / update_preimage /
    update_postimage), `_commit_version`, and `_commit_timestamp` —
    the consumption path `delta_incremental_files` refuses deletes for.

    Semantics follow Delta's own CDF reader (PROTOCOL.md "Add CDC
    File"): a commit that records `cdc` actions is described EXACTLY by
    its `_change_data` files (which physically carry `_change_type`;
    the commit's add/remove actions are the state effect, not the
    change set — using both would double-count). A commit with no cdc
    actions synthesizes: `add` with dataChange=true -> every row of the
    file as `insert`; `remove` with dataChange=true -> every LIVE row
    of the file at removal time as `delete` (the file's prior replay
    entry supplies its partition values AND its deletion vector, so
    rows a DV had already deleted are not re-deleted). Refused loudly,
    never served wrong: a no-cdc commit that rewrites a file with a
    deletion vector (the masked row-level delete — only its cdc files
    can say which rows), a schema or partition-column change inside the
    window (the frames would not union), and windows below the retained
    JSON history (per-version facts, like incremental reads).

    Scale shape: per version the work is O(actions) driver-side
    metadata plus ordinary parquet scans of only the files that changed
    — never a table scan; partition values attach as literals exactly
    like snapshot reads, and synthesized deletes reuse the DV anti-join
    machinery. dataChange=false housekeeping (compaction) contributes
    nothing, matching the no-rewrite-no-change contract.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    versions = list_delta_versions(table_path)
    if to_version is None:
        to_version = versions[-1]
    if since_version not in versions:
        raise ValueError(
            f"CDF base version {since_version} is not readable "
            f"(readable: {versions}); the window's deletes need the "
            "active state at its start"
        )
    log_dir = _log_dir(table_path)
    json_v, _ = _listed_versions(log_dir)
    need = range(since_version + 1, to_version + 1)
    if missing := [v for v in need if v not in json_v]:
        raise ValueError(
            f"CDF read needs JSON commits {list(need)} but {missing} "
            "are not retained (checkpoints cannot reconstruct "
            "per-version change sets)"
        )
    state, meta = _replay(table_path, since_version)
    part_cols = list((meta or {}).get("partitionColumns") or [])
    mapping = _column_mapping(meta)
    base_schema = (meta or {}).get("schemaString")
    ct_field = StructField("_change_type", StringType(), True)
    frames: list[DataFrame] = []
    for v in need:
        adds: list[dict] = []
        removes: list[dict] = []
        cdcs: list[dict] = []
        file_actions: list[tuple[str, dict]] = []  # in commit order
        commit_ts = None
        for action in _json_actions(
            os.path.join(log_dir, f"{v:020d}.json")
        ):
            if "add" in action:
                adds.append(action["add"])
                file_actions.append(("add", action["add"]))
            elif "remove" in action:
                removes.append(action["remove"])
                file_actions.append(("remove", action["remove"]))
            elif "cdc" in action:
                cdcs.append(action["cdc"])
            elif "metaData" in action:
                m = action["metaData"]
                if m.get("schemaString") != base_schema or list(
                    m.get("partitionColumns") or []
                ) != part_cols:
                    raise ValueError(
                        f"version {v} changes the table schema or "
                        "partitioning inside the CDF window; change "
                        "frames across a schema change do not union "
                        "— split the window at the change"
                    )
                meta = m
            elif "protocol" in action:
                _check_reader_protocol(action["protocol"], table_path)
            elif "commitInfo" in action:
                commit_ts = _commit_instant_ms(action["commitInfo"])
        if cdcs:
            df = _scan_change_batch(
                spark, meta, part_cols, mapping, table_path,
                [(c["path"], c.get("partitionValues"), None) for c in cdcs],
                extra_fields=(ct_field,),
            )
        else:
            parts: list[DataFrame] = []
            inserts = [a for a in adds if a.get("dataChange", True)]
            for a in inserts:
                dv = a.get("deletionVector") or {}
                if int(dv.get("cardinality") or 0) > 0:
                    raise ValueError(
                        f"version {v} rewrites {a['path']} with a "
                        "deletion vector but records no cdc files: only "
                        "the writer's change data can say which rows "
                        "changed — enable change data feed on the writer"
                    )
            if inserts:
                parts.append(
                    _scan_change_batch(
                        spark, meta, part_cols, mapping, table_path,
                        [(a["path"], a.get("partitionValues"), None)
                         for a in inserts],
                        change_type="insert",
                    )
                )
            deletes = [r for r in removes if r.get("dataChange", True)]
            if deletes:
                del_entries = []
                for r in deletes:
                    prior = state.get(r["path"])
                    if prior is None:
                        raise ValueError(
                            f"version {v} removes {r['path']} which is "
                            f"not active at version {v - 1}; the log is "
                            "inconsistent"
                        )
                    del_entries.append(
                        (r["path"], prior["partitionValues"],
                         prior["deletionVector"])
                    )
                parts.append(
                    _scan_change_batch(
                        spark, meta, part_cols, mapping, table_path,
                        del_entries, change_type="delete",
                    )
                )
            if not parts:
                df = None  # housekeeping-only version: no changes
            elif len(parts) == 1:
                df = parts[0]
            else:
                df = parts[0].unionByName(parts[1])
        if df is not None:
            df = df.withColumn("_commit_version", F.lit(v).cast("long"))
            ts_col = (
                F.timestamp_millis(F.lit(int(commit_ts)))
                if commit_ts is not None
                else F.lit(None).cast("timestamp")
            )
            frames.append(df.withColumn("_commit_timestamp", ts_col))
        # advance the active state to version v (cdc or not, the
        # add/remove actions ARE the state effect) — in COMMIT ORDER,
        # because a remove + re-add of the same path within one commit
        # (the standard DV / rewrite shape) must leave the re-add active
        for kind, a in file_actions:
            if kind == "add":
                state[a["path"]] = _add_entry(
                    a.get("partitionValues"), a.get("stats"),
                    a.get("deletionVector"),
                )
            else:
                state.pop(a["path"], None)
    if not frames:
        empty = _empty_snapshot_df(spark, meta)
        if empty is None:
            raise ValueError(
                f"CDF window ({since_version}, {to_version}] of "
                f"{table_path} has no changes and the retained log has "
                "no schemaString to shape an empty result"
            )
        return (
            empty.withColumn("_change_type", F.lit(None).cast("string"))
            .withColumn("_commit_version", F.lit(None).cast("long"))
            .withColumn("_commit_timestamp", F.lit(None).cast("timestamp"))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _scan_change_batch(
    spark: SparkSession,
    meta: dict | None,
    part_cols: list[str],
    mapping: dict[str, str] | None,
    table_path: str,
    entries: list[tuple],
    extra_fields: tuple = (),
    change_type: str | None = None,
) -> DataFrame:
    """One CDF batch: scan ``entries`` ((rel path, partitionValues,
    deletionVector|None)) under the table schema, attach partition
    literals per group exactly like a snapshot read, apply any deletion
    vectors, and stamp a synthesized `_change_type` when the files do
    not physically carry one (cdc files do; add/remove files do not)."""
    from pyspark.sql import functions as F

    def _phys(col: str) -> str:
        return mapping["physical"].get(col, col) if mapping else col

    part_types = _partition_column_types(meta, part_cols) if part_cols else {}
    dv_map = {
        os.path.abspath(_fs_path(table_path, p)): d
        for p, _, d in entries
        if d and int(d.get("cardinality") or 0) > 0
    }
    with_rowpos = bool(dv_map)
    groups: dict[tuple, list[str]] = {}
    for p, pv, _ in entries:
        key = tuple(
            _norm_part_value((pv or {}).get(_phys(c))) for c in part_cols
        )
        groups.setdefault(key, []).append(_fs_path(table_path, p))
    out: DataFrame | None = None
    for key, files in groups.items():
        df = _read_files(spark, meta, part_cols, files, mapping,
                         with_rowpos=with_rowpos, extra_fields=extra_fields)
        for c, raw in zip(part_cols, key):
            lit = F.lit(None) if raw is None else F.lit(raw)
            df = df.withColumn(c, lit.cast(part_types[c]))
        out = df if out is None else out.unionByName(df)
    if dv_map:
        out = _apply_deletion_vectors(spark, out, dv_map, table_path)
    if change_type is not None:
        out = out.withColumn("_change_type", F.lit(change_type))
    return out


def _partition_column_types(meta: dict, part_cols: list[str]) -> dict[str, str]:
    """Partition column -> Spark type, from metaData.schemaString (a
    Spark-JSON StructType, per PROTOCOL.md). Falls back to string when
    the schemaString is absent — values then stay in Delta's canonical
    string encoding rather than failing the read."""
    schema_str = (meta or {}).get("schemaString")
    types = {c: "string" for c in part_cols}
    if schema_str:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(schema_str))
        for f in schema.fields:
            if f.name in types:
                types[f.name] = f.dataType.simpleString()
    return types
