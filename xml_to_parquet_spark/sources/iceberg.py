"""Read-only adapter for Apache Iceberg tables (HadoopTables layout).

The Delta adapter (delta_log.py) covered the JSON-logged half of the
lake-format story; Iceberg was documented out of scope for one reason
only — its manifests are Avro. avro_codec.py removes that constraint
from the public Avro spec, so this module now reads the REAL Iceberg
metadata tree (iceberg.apache.org/spec, format versions 1 and 2):

  * table metadata: `metadata/v<N>.metadata.json` (the newest N, or the
    one `version-hint.text` names) — schemas keyed by schema-id,
    partition specs, and the snapshot list; every snapshot is readable,
    giving time travel by snapshot id exactly like Delta's by-version;
  * manifest list (Avro): one row per manifest — content kind
    (data/deletes), partition-summary and count fields; read driver-side
    through avro_codec, O(manifests);
  * manifests (Avro): `manifest_entry` rows — status
    (EXISTING/ADDED/DELETED; DELETED entries are files removed as of
    this snapshot and are skipped), and the `data_file` struct: path,
    format, partition values, record count, and per-file column bounds;
  * the scan: an ordinary Spark parquet read over the live data files —
    a CURRENT read under the current schema (metadata-only renames
    surface immediately), explicit time travel under the snapshot's
    recorded schema-id (the table as it was) — translated
    field-by-field, with
    each field's Iceberg ID attached as `parquet.field.id` metadata and
    `spark.sql.parquet.fieldId.read.enabled` set — Iceberg resolves
    columns BY FIELD ID, never by name, which is what makes renames
    safe; a name-based read would silently null a renamed column;
  * partition pruning: `partition_filter` matches the manifest entries'
    partition structs driver-side before any scan is planned (stored
    values: for identity specs that IS the column value; for
    bucket/truncate the caller passes the transformed value), and
    `source_partition_filter` takes SOURCE column values instead — the
    adapter evaluates identity / bucket[N] (the spec's seed-0 Murmur3,
    vectors pinned) / truncate[W] / year / month / day / hour itself
    (temporal only from unambiguous datetime inputs), keeping entries
    under anything it cannot evaluate;
  * zone-map pruning: `stats_filter` decodes `lower_bounds` /
    `upper_bounds` (the spec's single-value binary serialization:
    little-endian numerics, and minimal big-endian two's-complement
    decimals decoded to EXACT Fractions so boundary comparisons cannot
    flip on float representability) for NUMERIC predicates only,
    keep-on-missing — same soundness contract as the Delta adapter;
  * v2 row-level deletes, BOTH kinds: POSITION delete files (content=1)
    are read as ordinary parquet (file_path, pos) and applied as a
    left-anti join against `_metadata.file_path`/`_metadata.row_index`
    — the same machinery as Delta deletion vectors, and sound without
    sequence numbers because position deletes reference an immutable
    file path (a rewritten file gets a new path, so a stale delete row
    matches nothing). EQUALITY deletes (content=2) apply with the
    spec's full sequence-number scoping: each data row carries its
    file's data sequence number (entries inherit their manifest's when
    null), and a delete row removes rows matching its `equality_ids`
    columns NULL-SAFELY only in files whose sequence is STRICTLY less
    than the delete's — rows written at or after the delete survive,
    the ordering that makes concurrent upsert streams correct. A
    delete's SCOPE is its manifest's partition SPEC, never its
    partition values: an unpartitioned spec means global, a partitioned
    spec scopes the delete to its partition tuple (a NULL tuple value
    scopes to the null partition, not to everything) — identity
    transforms scope as null-safe literal terms on the source columns;
    non-identity transforms (bucket/truncate/...) scope per FILE by
    comparing STORED partition tuples under the same spec (data files
    are partition-pure, so no transform is ever evaluated); a delete
    under a non-identity spec coexisting with data files of a DIFFERENT
    spec refuses loudly — membership is unprovable without transform
    evaluation.

Nested types read natively (r14): struct fields carry their ids at
every nesting level, so renames inside structs stay safe; list and map
translate to ArrayType/MapType — the parquet LIST/MAP wrapper groups
have exactly one repeated child, so structural matching inside the
id-resolved field is unambiguous per the parquet spec, and struct
fields nested in a list element resolve by id again.

Out of scope, documented: the writer path, non-parquet data files
(AVRO/ORC file_format is refused per file, not guessed), and
equality-delete scopes under non-identity transforms where the DATA
files were written under a different spec (the same-spec case applies
by stored-tuple file matching — see above). Everything metadata-side
is driver-side and manifest-sized; the scan is a plain Catalyst
FileScan with pushdown and pruning intact.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re
import struct

from pyspark.sql import DataFrame, SparkSession

from .avro_codec import read_container_file

_VMETA_RE = re.compile(r"^v(\d+)\.metadata\.json$")

# Path characters whose Hadoop-URI form is identity — the row-level
# delete joins compare `_metadata.file_path` (a URI) against plain
# absolute paths, sound only when no character needed percent-escaping
# (mirrors delta_log._DV_SAFE_PATH_RE).
_SAFE_PATH_RE = re.compile(r"^[A-Za-z0-9/._\-=+]+$")


def _metadata_dir(table_path: str) -> str:
    d = os.path.join(table_path, "metadata")
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no metadata/ directory under {table_path}")
    return d


def load_iceberg_metadata(table_path: str) -> dict:
    """The CURRENT table-metadata JSON: the file `version-hint.text`
    names when present (the HadoopTables commit protocol makes the hint
    authoritative), else the highest `v<N>.metadata.json` — unlike
    Delta's `_last_checkpoint`, the hint here is load-bearing, but a
    missing or unparsable one still falls back to the listing."""
    d = _metadata_dir(table_path)
    hint = os.path.join(d, "version-hint.text")
    if os.path.isfile(hint):
        try:
            with open(hint) as fh:
                n = int(fh.read().strip())
            path = os.path.join(d, f"v{n}.metadata.json")
            if os.path.isfile(path):
                with open(path) as fh:
                    return json.load(fh)
        except (ValueError, OSError):
            pass  # torn hint: the listing below is still authoritative
    versions = sorted(
        int(m.group(1)) for f in os.listdir(d) if (m := _VMETA_RE.match(f))
    )
    if not versions:
        raise ValueError(f"no v*.metadata.json under {d}")
    path = os.path.join(d, f"v{versions[-1]}.metadata.json")
    with open(path) as fh:
        try:
            return json.load(fh)
        except json.JSONDecodeError as e:
            # metadata commits swap in atomically (write vN+1, then point
            # the catalog/hint at it), so a torn file means corruption or
            # a non-atomic copy — name it instead of a bare decode error
            # (r16, same provenance rule as the Delta torn-commit guard)
            raise ValueError(
                f"corrupt Iceberg table metadata {os.path.basename(path)}: "
                f"{e}"
            ) from e


def list_iceberg_snapshots(table_path: str) -> list[dict]:
    """[{snapshot-id, timestamp-ms, operation}] oldest-first — the
    time-travel surface, mirroring list_delta_versions.

    Order is the metadata's own lineage, not wall clocks (ADVICE r13):
    the `snapshot-log` sequence is authoritative where present, and
    snapshots outside it are appended by walking `parent-snapshot-id`
    chains; only snapshots with neither signal fall back to
    timestamp-ms. Writer clock skew therefore cannot reorder history —
    which matters because iceberg_added_files slices windows out of
    this order."""
    meta = load_iceberg_metadata(table_path)
    by_id = {}
    for s in meta.get("snapshots") or []:
        by_id[s["snapshot-id"]] = {
            "snapshot-id": s["snapshot-id"],
            "timestamp-ms": s.get("timestamp-ms"),
            "operation": (s.get("summary") or {}).get("operation"),
            "__parent": s.get("parent-snapshot-id"),
        }
    ordered: list[int] = []
    placed: set[int] = set()
    for entry in meta.get("snapshot-log") or []:
        sid = entry.get("snapshot-id")
        if sid in by_id and sid not in placed:
            ordered.append(sid)
            placed.add(sid)
    # snapshots the log does not cover: append any whose parent is
    # already placed (or expired / absent), candidates timestamp-ordered
    # only as the within-step tiebreak
    remaining = [sid for sid in by_id if sid not in placed]
    while remaining:
        ready = [
            sid
            for sid in remaining
            if by_id[sid]["__parent"] not in remaining
        ]
        if not ready:  # parent cycle — degenerate metadata; timestamps
            ready = remaining
        ready.sort(key=lambda i: (by_id[i]["timestamp-ms"] or 0, i))
        sid = ready[0]
        ordered.append(sid)
        placed.add(sid)
        remaining.remove(sid)
    out = []
    for sid in ordered:
        s = dict(by_id[sid])
        s.pop("__parent")
        out.append(s)
    return out


def _resolve_path(uri: str, table_path: str) -> str:
    """Metadata stores file locations as URIs; serve local paths only."""
    if uri.startswith("file:"):
        return "/" + uri.split(":", 1)[1].lstrip("/")
    if "://" in uri:
        raise ValueError(
            f"non-local Iceberg file URI {uri!r}: this adapter reads the "
            "local filesystem only"
        )
    return uri if os.path.isabs(uri) else os.path.join(table_path, uri)


def _snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise ValueError("table has no snapshots")
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise ValueError("table metadata has no current-snapshot-id")
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(
        f"snapshot {snapshot_id} not in table (have: "
        f"{[s['snapshot-id'] for s in snaps]})"
    )


def _current_schema(meta: dict) -> dict:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id") == sid:
                return s
        raise ValueError(f"current-schema-id {sid} not among schemas")
    if "schema" in meta:  # format v1 single-schema field
        return meta["schema"]
    raise ValueError("table metadata carries no schema")


def _schema_for_snapshot(meta: dict, snapshot: dict) -> dict:
    """Time travel reads the table AS IT WAS: a snapshot's recorded
    `schema-id` selects its schema from the metadata's schema list (the
    Iceberg VERSION AS OF contract — a column added after the snapshot
    must not appear, a column renamed after it keeps its old name).
    Snapshots without a recorded schema-id (or ids the metadata no
    longer lists — e.g. v1-era writers) fall back to the current
    schema, which field-id resolution keeps sound for reads."""
    sid = snapshot.get("schema-id")
    if sid is not None:
        for s in meta.get("schemas") or []:
            if s.get("schema-id") == sid:
                return s
    return _current_schema(meta)


def iceberg_snapshot_as_of(table_path: str, timestamp_ms: int) -> int:
    """The snapshot id current AS OF ``timestamp_ms`` — the newest
    snapshot-log entry at or before the instant (the log is the
    authority for as-of resolution; lineage order per
    list_iceberg_snapshots when the log is absent). Raises if the
    instant predates the table's first snapshot."""
    meta = load_iceberg_metadata(table_path)
    log = meta.get("snapshot-log") or []
    have = {s["snapshot-id"] for s in meta.get("snapshots") or []}
    best = None
    for entry in log:
        ts = entry.get("timestamp-ms")
        if ts is not None and ts <= timestamp_ms and entry.get("snapshot-id") in have:
            best = entry["snapshot-id"]  # log is append-ordered
    if best is not None:
        return best
    for s in list_iceberg_snapshots(table_path):
        ts = s.get("timestamp-ms")
        if ts is not None and ts <= timestamp_ms:
            best = s["snapshot-id"]
    if best is None:
        raise ValueError(
            f"no snapshot at or before timestamp {timestamp_ms} "
            "(the instant predates the table)"
        )
    return best


_PRIMITIVES = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "string": "string",
    "binary": "binary",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
}


def _spark_type(t):
    from pyspark.sql.types import ArrayType, MapType, _parse_datatype_string

    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _parse_datatype_string(_PRIMITIVES[t])
        if t.startswith("decimal"):
            return _parse_datatype_string(t)
        if t.startswith("fixed"):
            return _parse_datatype_string("binary")
        raise ValueError(f"Iceberg type {t!r} is not served by this adapter")
    if isinstance(t, dict) and t.get("type") == "struct":
        return _spark_struct(t)
    if isinstance(t, dict) and t.get("type") == "list":
        # A parquet LIST group has exactly one element child, so Spark's
        # structural matching inside the (field-id-resolved) list wrapper
        # is unambiguous; struct fields NESTED in the element still carry
        # their own ids via _spark_struct and resolve by id.
        return ArrayType(
            _spark_type(t["element"]),
            containsNull=not t.get("element-required", False),
        )
    if isinstance(t, dict) and t.get("type") == "map":
        return MapType(
            _spark_type(t["key"]),
            _spark_type(t["value"]),
            valueContainsNull=not t.get("value-required", False),
        )
    raise ValueError(
        f"Iceberg type {t!r} is not served by this adapter's read schema"
    )


def _spark_struct(schema: dict):
    """Iceberg struct -> Spark StructType, each field carrying its
    Iceberg field ID as `parquet.field.id` metadata so the scan resolves
    columns by ID (the Iceberg contract), not by name."""
    from pyspark.sql.types import StructField, StructType

    fields = []
    for f in schema["fields"]:
        fields.append(
            StructField(
                f["name"],
                _spark_type(f["type"]),
                not f.get("required", False),
                metadata={"parquet.field.id": f["id"]},
            )
        )
    return StructType(fields)


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit Murmur3, x86 variant (public domain algorithm; Appendix B
    of the Iceberg spec mandates it with seed 0 for bucket transforms).
    Returns the SIGNED 32-bit value, matching the spec's test vectors."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n - n % 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _bucket_hash_bytes(value) -> bytes:
    """The single-value hash serialization of spec Appendix B: int/long
    hash as the 8-byte little-endian long — which is what makes
    bucket(34::int) == bucket(34::long) — a date as its DAY-ORDINAL
    int64, a timestamp as its epoch-MICROS int64 (tz-aware normalized
    to UTC first, naive treated as the spec's zoneless timestamp —
    ADVICE r14), strings as UTF-8, binary raw. An int outside int64
    raises ValueError (never struct.error — the keep-on-unevaluable
    caller catches ValueError only)."""
    if isinstance(value, bool):
        raise ValueError("bucket transform is not defined for booleans")
    if isinstance(value, _dt.datetime):  # before date: datetime IS a date
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        delta = value - _dt.datetime(1970, 1, 1)
        micros = (delta.days * 86400 + delta.seconds) * 1_000_000 + (
            delta.microseconds
        )
        return struct.pack("<q", micros)
    if isinstance(value, _dt.date):
        return struct.pack("<q", (value - _dt.date(1970, 1, 1)).days)
    if isinstance(value, int):
        try:
            return struct.pack("<q", value)
        except struct.error:
            raise ValueError(
                f"bucket transform input {value} outside int64"
            ) from None
    if isinstance(value, str):
        return value.encode("utf-8")
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    raise ValueError(
        f"bucket transform not served for value type {type(value).__name__} "
        "(int/long/date/timestamp/string/binary are)"
    )


_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNCATE_RE = re.compile(r"^truncate\[(\d+)\]$")


def _apply_transform(transform: str, value):
    """Evaluate a partition transform on a SOURCE value, driver-side —
    the device that lets source_partition_filter prune bucket/truncate
    manifest entries without the caller precomputing stored values.
    Returns (True, transformed) when this adapter can evaluate the
    transform, (False, None) when it cannot (year/month/day/hour/...,
    where pruning must keep the entry rather than guess)."""
    if value is None:
        return True, None  # every transform maps null to null (spec)
    if transform == "identity":
        return True, value
    m = _BUCKET_RE.match(transform or "")
    if m:
        n = int(m.group(1))
        if n <= 0:
            raise ValueError(f"bucket transform with non-positive N: {transform}")
        try:
            h = murmur3_x86_32(_bucket_hash_bytes(value))
        except ValueError:
            # keep-on-unevaluable contract (ADVICE r14): a value this
            # adapter can't hash (boolean, out-of-int64, exotic type)
            # keeps the manifest entry rather than failing the prune.
            return False, None
        return True, (h & 0x7FFFFFFF) % n
    m = _TRUNCATE_RE.match(transform or "")
    if m:
        w = int(m.group(1))
        if w <= 0:
            raise ValueError(f"truncate transform with non-positive W: {transform}")
        if isinstance(value, bool):
            return False, None
        if isinstance(value, int):
            return True, value - (value % w)  # W * floor(v/W), negatives too
        if isinstance(value, str):
            return True, value[:w]
        return False, None
    if transform in ("year", "month", "day", "hour"):
        # Temporal transforms evaluate only from UNAMBIGUOUS inputs
        # (datetime.date / datetime.datetime) — an int could be a day
        # ordinal or epoch micros, and guessing would prune wrong files.
        if isinstance(value, _dt.datetime):
            # tz-aware values normalize to UTC FIRST (ADVICE r14): spec
            # timestamptz ordinals are UTC-based, and evaluating in
            # local wall time prunes files that contain matching rows
            # (e.g. 2017-11-16T22:31:08-05:00 is UTC day 17487/hour
            # 419691, not local 17486/419686).
            if value.tzinfo is not None:
                value = value.astimezone(_dt.timezone.utc)
            if transform == "hour":
                # Exact integer micros, then floor-div — NOT
                # timedelta.total_seconds(), whose float64 ulp exceeds
                # 1µs past ~year 2100 magnitudes, where a value 1µs
                # below an hour boundary can round UP across it and
                # prune a file that held matching rows (same failure
                # class as the ADVICE-r14 local-wall-time bug).
                epoch = _dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
                delta = value - epoch
                micros = (
                    delta.days * 86400 + delta.seconds
                ) * 1_000_000 + delta.microseconds
                return True, micros // 3_600_000_000
            value = value.date()
        elif transform == "hour":
            return False, None  # hour of a bare date is undefined
        if isinstance(value, _dt.date):
            if transform == "year":
                return True, value.year - 1970
            if transform == "month":
                return True, (value.year - 1970) * 12 + (value.month - 1)
            return True, (value - _dt.date(1970, 1, 1)).days  # day ordinal
        return False, None
    return False, None


def _stored_repr(value) -> tuple[bool, object]:
    """Convert a transform OUTPUT to the manifest's stored partition
    representation for comparison in source_partition_filter. The Avro
    codec surfaces logical types raw — a date partition value decodes as
    its day-ordinal int, a timestamp as epoch-micros long — so an
    IDENTITY transform's output (the caller's datetime.date / datetime)
    compared `!=` against the stored int ALWAYS differed and silently
    PRUNED files holding matching rows (the late-r15 self-found twin of
    the ADVICE-r14 ordinal bugs). Returns (True, stored-form value), or
    (False, None) when no sound stored form exists — float/Fraction
    identity values keep the entry rather than risk a float32-storage vs
    float64-literal inequality prune."""
    if isinstance(value, bool) or value is None:
        return True, value
    if isinstance(value, _dt.datetime):  # before date: datetime IS a date
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        delta = value - _dt.datetime(1970, 1, 1)
        return True, (
            (delta.days * 86400 + delta.seconds) * 1_000_000
            + delta.microseconds
        )
    if isinstance(value, _dt.date):
        return True, (value - _dt.date(1970, 1, 1)).days
    if isinstance(value, float):
        return False, None  # float32 storage vs float64 literal: unsound
    if isinstance(value, (int, str, bytes)):
        return True, value
    return False, None


def _partition_specs(meta: dict) -> dict[int, dict]:
    """{spec-id: spec} from v2 `partition-specs`, falling back to the v1
    single `partition-spec` field (under `default-spec-id`, default 0)."""
    specs = meta.get("partition-specs")
    if specs is not None:
        return {int(s.get("spec-id", 0)): s for s in specs}
    if "partition-spec" in meta:
        sid = int(meta.get("default-spec-id", 0))
        return {sid: {"spec-id": sid, "fields": meta["partition-spec"]}}
    return {}


def _as_int_map(raw) -> dict[int, bytes]:
    """Normalize the two physical encodings of Iceberg's int-keyed maps
    (Avro maps need string keys, so the spec encodes map<int, bytes> as
    an array of {key, value} records; a plain dict also appears when a
    writer uses string-keyed maps)."""
    if not raw:
        return {}
    if isinstance(raw, dict):
        return {int(k): v for k, v in raw.items()}
    return {int(kv["key"]): kv["value"] for kv in raw}


_NUMERIC_DECODERS = {
    "int": lambda b: struct.unpack("<i", b)[0],
    "long": lambda b: struct.unpack("<q", b)[0],
    "float": lambda b: struct.unpack("<f", b)[0],
    "double": lambda b: struct.unpack("<d", b)[0],
    "date": lambda b: struct.unpack("<i", b)[0],
}


_DECIMAL_RE = re.compile(r"^decimal\(\s*\d+\s*,\s*(\d+)\s*\)$")


def _decode_bound(type_name, raw):
    """Single-value binary serialization (spec Appendix D), numeric types
    only — None for anything else or malformed, which KEEPS the file.
    Decimals (minimal big-endian two's-complement unscaled value) decode
    to EXACT Fractions so a comparison against the caller's literal can
    never flip at a float-representability boundary and prune a file
    that held matching rows."""
    if not isinstance(type_name, str) or raw is None:
        return None
    m = _DECIMAL_RE.match(type_name)
    if m:
        from fractions import Fraction

        b = bytes(raw)
        if not b:
            return None
        unscaled = int.from_bytes(b, "big", signed=True)
        return Fraction(unscaled, 10 ** int(m.group(1)))
    dec = _NUMERIC_DECODERS.get(type_name)
    if dec is None:
        return None
    try:
        return dec(bytes(raw))
    except struct.error:
        return None


def _live_entries(meta: dict, snapshot: dict, table_path: str):
    """(data entries, delete entries) across the snapshot's manifests.
    Each entry is the `data_file` struct augmented with `__seq` — its
    DATA SEQUENCE NUMBER, inherited from the manifest's
    `sequence_number` when the entry's own is null (the spec's
    inheritance rule for entries added by the manifest's snapshot;
    format v1 has no sequence numbers, so everything reads as 0, which
    only matters to equality deletes — a v2 feature). Delete entries
    keep their `content` kind (1 = position, 2 = equality) for the
    read path to route."""
    ml_uri = snapshot.get("manifest-list")
    if not ml_uri:
        raise ValueError(
            "snapshot carries no manifest-list (v1 inline `manifests` "
            "lists are not written by current writers and are not served)"
        )
    _, manifests = read_container_file(_resolve_path(ml_uri, table_path))
    data_entries: list[dict] = []
    delete_entries: list[dict] = []
    for m in manifests:
        manifest_content = m.get("content") or 0  # v1: absent -> data
        manifest_seq = m.get("sequence_number") or 0
        _, entries = read_container_file(
            _resolve_path(m["manifest_path"], table_path)
        )
        for e in entries:
            if e.get("status") == 2:  # DELETED: removed as of this snapshot
                continue
            df = dict(e["data_file"])
            seq = e.get("sequence_number")
            df["__seq"] = int(seq) if seq is not None else int(manifest_seq)
            df["__spec_id"] = int(m.get("partition_spec_id") or 0)
            file_content = df.get("content") or 0
            if file_content == 0 and manifest_content == 0:
                data_entries.append(df)
            elif file_content in (1, 2) and manifest_content == 1:
                delete_entries.append(df)
            else:
                raise ValueError(
                    f"manifest {m['manifest_path']!r} (content "
                    f"{manifest_content}) carries an entry of content "
                    f"{file_content} for {df.get('file_path')!r}: the "
                    "log is inconsistent — refusing rather than guessing "
                    "which kind it is"
                )
    return data_entries, delete_entries


def iceberg_data_files(
    table_path: str, snapshot_id: int | None = None
) -> list[str]:
    """The snapshot's live data-file paths — metadata-only, O(manifest
    entries), the Iceberg planning cost shape. Like delta_active_files,
    a FILE list cannot express row-level (position) deletes; the
    snapshot read applies those."""
    meta = load_iceberg_metadata(table_path)
    snapshot = _snapshot(meta, snapshot_id)
    data_entries, _ = _live_entries(meta, snapshot, table_path)
    return [_resolve_path(e["file_path"], table_path) for e in data_entries]


def iceberg_added_files(
    table_path: str,
    from_snapshot_id: int | None,
    to_snapshot_id: int | None = None,
) -> list[tuple[int, str]]:
    """(snapshot-id, absolute data-file path) for every file added by
    the snapshots after ``from_snapshot_id`` (None: from the table's
    beginning) through ``to_snapshot_id`` (None: current) — the
    streaming-from-Iceberg micro-batch planner, mirroring
    delta_incremental_files: appends are immutable files, so a reader
    that has consumed through `from` catches up by processing exactly
    these, each once.

    Only `append` snapshots can be served this way: delete / overwrite /
    replace operations change or remove rows in files already delivered,
    which an append-only increment cannot express — those windows refuse
    loudly (consume them as snapshots diffs or a CDC feed instead).
    Added files are the manifests this snapshot itself added
    (added_snapshot_id == snapshot-id) restricted to entries with ADDED
    status; metadata-only, O(manifest entries)."""
    meta = load_iceberg_metadata(table_path)
    ordered = list_iceberg_snapshots(table_path)
    ids = [s["snapshot-id"] for s in ordered]
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id")
    if to_snapshot_id not in ids:
        raise ValueError(f"snapshot {to_snapshot_id} not in table ({ids})")
    start = 0
    if from_snapshot_id is not None:
        if from_snapshot_id not in ids:
            raise ValueError(
                f"snapshot {from_snapshot_id} not in table ({ids})"
            )
        start = ids.index(from_snapshot_id) + 1
    end = ids.index(to_snapshot_id) + 1
    if end < start:
        raise ValueError(
            f"snapshot {to_snapshot_id} predates {from_snapshot_id}: an "
            "incremental window runs forward"
        )
    window = ordered[start:end]
    out: list[tuple[int, str]] = []
    for s in window:
        if s["operation"] != "append":
            raise ValueError(
                f"snapshot {s['snapshot-id']} is a "
                f"{s['operation'] or 'unknown'} operation: only appends "
                "can be served as an incremental file list"
            )
        snap = _snapshot(meta, s["snapshot-id"])
        _, manifests = read_container_file(
            _resolve_path(snap["manifest-list"], table_path)
        )
        for m in manifests:
            if m.get("added_snapshot_id") != s["snapshot-id"]:
                continue  # carried forward from an earlier snapshot
            if (m.get("content") or 0) != 0:
                raise ValueError(
                    f"append snapshot {s['snapshot-id']} added a DELETE "
                    "manifest: the log is inconsistent"
                )
            _, entries = read_container_file(
                _resolve_path(m["manifest_path"], table_path)
            )
            for e in entries:
                if e.get("status") == 1:  # ADDED by this snapshot
                    out.append(
                        (
                            s["snapshot-id"],
                            _resolve_path(
                                e["data_file"]["file_path"], table_path
                            ),
                        )
                    )
    return out


def read_iceberg_snapshot(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
    stats_filter: list[tuple[str, str, float]] | None = None,
    source_partition_filter: dict | None = None,
) -> DataFrame:
    """Spark DataFrame over one Iceberg snapshot (default: current).

    The plan is an ordinary parquet FileScan over the live files —
    current reads under the current schema, explicit time travel under
    the snapshot's recorded schema-id, both resolved by parquet field
    ID so renames are safe — minus position-deleted rows via the
    same
    `_metadata.row_index` anti-join the Delta adapter uses for deletion
    vectors. `partition_filter` ({spec-field-name: STORED value}),
    `source_partition_filter` ({source-column-name: SOURCE value} — the
    adapter evaluates the spec's transform driver-side: identity,
    bucket[N] via the spec's seed-0 Murmur3, truncate[W]; transforms it
    cannot evaluate keep the entry), and `stats_filter`
    ([(column, op, numeric)], op in = < <= > >=) prune manifest entries
    driver-side before the scan is planned; all three can only skip
    work, never rows (keep-on-missing bounds, exact tuple match,
    keep-on-unevaluable transform)."""
    from pyspark.sql import functions as F

    meta = load_iceberg_metadata(table_path)
    snapshot = _snapshot(meta, snapshot_id)
    # Schema selection is read-mode-dependent (the Iceberg engine
    # contract): a CURRENT read serves the table as it is now — current
    # schema, which metadata-only renames change without a new snapshot
    # — while explicit TIME TRAVEL serves the table as it was, under the
    # snapshot's recorded schema-id.
    if snapshot_id is None:
        schema = _current_schema(meta)
    else:
        schema = _schema_for_snapshot(meta, snapshot)
    data_entries, delete_entries = _live_entries(meta, snapshot, table_path)
    for e in data_entries:
        fmt = (e.get("file_format") or "PARQUET").upper()
        if fmt != "PARQUET":
            raise ValueError(
                f"data file {e['file_path']!r} has format {fmt}; this "
                "adapter scans parquet only"
            )
    if partition_filter:
        # Validate keys against the table's partition spec(s) — a typo'd
        # key must raise, not silently prune every file (ADVICE r13; the
        # Delta adapter has the same contract). A key that IS a spec
        # field but absent from a particular entry's spec (multi-spec
        # table) KEEPS that entry: pruning can only skip work, never
        # rows.
        specs = _partition_specs(meta)
        known = {
            f["name"] for s in specs.values() for f in (s.get("fields") or [])
        }
        unknown = sorted(set(partition_filter) - known)
        if unknown:
            raise ValueError(
                f"partition_filter keys {unknown} are not fields of any "
                f"partition spec (have: {sorted(known)})"
            )
        # Values are compared against the manifest's STORED form, and
        # stored temporals are ints (day ordinals / epoch micros /
        # transform ordinals) — a datetime/date literal can never match
        # and would silently prune every file. Refuse it with the two
        # sound alternatives named (validate-don't-no-op).
        bad_vals = {
            k: v for k, v in partition_filter.items()
            if isinstance(v, (_dt.date, _dt.datetime))
        }
        if bad_vals:
            raise ValueError(
                f"partition_filter values {bad_vals!r} are datetime "
                "objects, but stored partition values are their integer "
                "encodings — pass the stored int, or use "
                "source_partition_filter to have the adapter evaluate "
                "the transform from the source value"
            )

        def _keeps(e: dict) -> bool:
            spec = specs.get(e.get("__spec_id", 0))
            spec_fields = {
                f["name"] for f in ((spec or {}).get("fields") or [])
            }
            part = e.get("partition") or {}
            for k, v in partition_filter.items():
                if k not in spec_fields:
                    continue  # this entry's spec lacks the field: keep
                if part.get(k) != v:
                    return False
            return True

        data_entries = [e for e in data_entries if _keeps(e)]
    if source_partition_filter:
        # SOURCE-value pruning: the caller names a data COLUMN and its
        # value; for every spec field sourcing that column this adapter
        # evaluates the transform itself (identity / bucket[N] /
        # truncate[W]) and compares against the STORED partition value —
        # the usable form of bucket pruning, no precomputed bucket
        # numbers required. Unknown columns raise; a column no spec
        # sources raises (the filter would be a silent no-op);
        # unevaluable transforms (year/month/...) keep the entry.
        specs = _partition_specs(meta)
        col_ids = {f["name"]: f["id"] for f in schema["fields"]}
        unknown = sorted(set(source_partition_filter) - set(col_ids))
        if unknown:
            raise ValueError(
                f"source_partition_filter columns {unknown} are not in "
                "the schema"
            )
        sourced = {
            sf.get("source-id")
            for s in specs.values()
            for sf in (s.get("fields") or [])
        }
        unsourced = sorted(
            c for c in source_partition_filter if col_ids[c] not in sourced
        )
        if unsourced:
            raise ValueError(
                f"source_partition_filter columns {unsourced} are not "
                "partition sources in any spec — the filter could never "
                "prune and would read as if it had been honored"
            )

        def _keeps_src(e: dict) -> bool:
            spec = specs.get(e.get("__spec_id", 0))
            part = e.get("partition") or {}
            for col, v in source_partition_filter.items():
                fid = col_ids[col]
                for sf in ((spec or {}).get("fields") or []):
                    if sf.get("source-id") != fid:
                        continue
                    ok, tv = _apply_transform(sf.get("transform"), v)
                    if not ok:
                        continue  # cannot evaluate: keep the entry
                    ok, tv = _stored_repr(tv)
                    if not ok:
                        continue  # no sound stored form: keep the entry
                    if part.get(sf["name"]) != tv:
                        return False
            return True

        data_entries = [e for e in data_entries if _keeps_src(e)]
    if stats_filter:
        _validate_stats_filter(stats_filter)
        by_name = {f["name"]: f for f in schema["fields"]}
        preds = []
        for col, op, lit in stats_filter:
            f = by_name.get(col)
            if f is None:
                raise ValueError(f"stats_filter column {col!r} not in schema")
            preds.append((f["id"], f["type"], op, lit))
        data_entries = [
            e for e in data_entries if _entry_survives(e, preds)
        ]
    spark_schema = _spark_struct(schema)
    if not data_entries:
        return spark.createDataFrame([], spark_schema)
    files = [_resolve_path(e["file_path"], table_path) for e in data_entries]
    pos_entries = [
        e for e in delete_entries if (e.get("content") or 0) == 1
    ]
    eq_entries = [
        e for e in delete_entries if (e.get("content") or 0) == 2
    ]
    for e in delete_entries:
        fmt = (e.get("file_format") or "PARQUET").upper()
        if fmt != "PARQUET":
            raise ValueError(
                f"delete file {e['file_path']!r} has format {fmt}; this "
                "adapter scans parquet only"
            )
    for e in eq_entries:
        if not e.get("equality_ids"):
            raise ValueError(
                f"equality delete {e['file_path']!r} carries no "
                "equality_ids; there is nothing sound to match on"
            )
        # A delete's SCOPE is its manifest's partition spec, never its
        # partition values: an unpartitioned spec (no fields) means
        # GLOBAL; a partitioned spec scopes the delete to its partition
        # tuple — including a NULL tuple value, which scopes to the
        # null partition, NOT to everything. Resolved here, driver-side,
        # into (source column, value) pairs for identity transforms;
        # non-identity transforms refuse (honoring their scope needs
        # transform evaluation this adapter does not claim).
        e["__scope"] = _eq_delete_scope(meta, schema, e)
    # Iceberg readers resolve parquet columns by field ID; Spark does the
    # same when the requested schema carries parquet.field.id metadata
    # and this conf is on. Session-scoped by design: it only affects
    # reads whose schema asks for IDs.
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    reader = spark.read.schema(spark_schema)
    if not delete_entries:
        return reader.parquet(*files)
    # The delete joins compare `_metadata.file_path` (a URI) against
    # plain paths, which is only sound when no character percent-escapes
    # in the URI form (ADVICE r13; same guard as the Delta adapter's
    # deletion-vector join). A space/%/non-ASCII path would silently
    # resurrect position-deleted rows and null `__ib_seq` so equality
    # deletes never fire — refuse loudly instead.
    for p in files + [
        _resolve_path(e["file_path"], table_path) for e in delete_entries
    ]:
        if not _SAFE_PATH_RE.match(p):
            raise ValueError(
                f"file path {p!r} contains characters that percent-escape "
                "in Spark's _metadata.file_path URI; the row-level delete "
                "joins cannot be proven sound for it — refusing rather "
                "than risking resurrected or surviving deleted rows"
            )
    df = reader.parquet(*files).select(
        "*",
        F.col("_metadata.file_path").alias("__ib_fp"),
        F.col("_metadata.row_index").alias("__ib_rowidx"),
    )
    scan_path = F.regexp_replace(
        F.col("__ib_fp"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/*", "/"
    )
    helper_cols = ["__ib_fp", "__ib_rowidx"]
    if pos_entries:
        # position delete files: (file_path, pos) rows, paths as written
        # by the original writer — normalize both sides to plain
        # absolute paths
        del_files = [
            _resolve_path(e["file_path"], table_path) for e in pos_entries
        ]
        deletes = (
            spark.read.parquet(*del_files)
            .select(
                F.regexp_replace(
                    F.col("file_path"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/*", "/"
                ).alias("__del_path"),
                F.col("pos").alias("__del_pos"),
            )
        )
        total = sum(int(e.get("record_count") or 0) for e in pos_entries)
        if total <= _DELETE_BROADCAST_MAX_ROWS:
            deletes = F.broadcast(deletes)
        df = df.join(
            deletes,
            (scan_path == deletes["__del_path"])
            & (F.col("__ib_rowidx") == deletes["__del_pos"]),
            "left_anti",
        )
    if eq_entries:
        df = _apply_equality_deletes(
            spark, df, scan_path, schema, data_entries, files, eq_entries,
            table_path,
        )
        helper_cols.append("__ib_seq")
    return df.drop(*helper_cols)


_DELETE_BROADCAST_MAX_ROWS = 4_000_000


def _eq_delete_scope(meta: dict, schema: dict, entry: dict) -> tuple:
    """The partition SCOPE of one equality delete, resolved from its
    manifest's partition spec. Three shapes, each a hashable tuple
    (deletes sharing scope + equality_ids union into one anti-join):

      ()                              — GLOBAL: the spec has no fields;
      ("rows", ((src, value), ...))   — all-identity spec: null-safe
        equality terms on the SOURCE columns (identity-partition values
        are present in Iceberg data rows), applied row-level — the
        historical behavior, sound for any data file;
      ("files", spec_id, ((field, value), ...)) — a spec with any
        NON-identity transform (bucket/truncate/...): data files are
        partition-pure, so the scope is decided per FILE by comparing
        stored partition tuples under the SAME spec — no transform
        evaluation needed. Data files under a DIFFERENT spec cannot be
        proven in- or out-of-scope without evaluating the transform, so
        their coexistence with such a delete refuses loudly at apply
        time (_file_scope_paths).
    """
    spec_id = entry.get("__spec_id", 0)
    by_id = _partition_specs(meta)
    if not by_id:
        raise ValueError(
            "equality deletes present but table metadata carries no "
            "partition-specs to resolve their scope against"
        )
    spec = by_id.get(spec_id)
    if spec is None:
        raise ValueError(
            f"equality delete {entry['file_path']!r} references partition "
            f"spec {spec_id}, which is not in partition-specs"
        )
    fields = spec.get("fields") or []
    if not fields:
        return ()
    part = entry.get("partition") or {}
    if any(f.get("transform") != "identity" for f in fields):
        return (
            "files",
            spec_id,
            tuple((f["name"], part.get(f["name"])) for f in fields),
        )
    src_by_id = {f["id"]: f["name"] for f in schema["fields"]}
    scope = []
    for f in fields:
        src = src_by_id.get(f.get("source-id"))
        if src is None:
            raise ValueError(
                f"partition spec field {f.get('name')!r} sources field id "
                f"{f.get('source-id')}, which is not in the current schema"
            )
        scope.append((src, part.get(f["name"])))
    return ("rows", tuple(scope))


def _file_scope_paths(
    scope: tuple, data_entries: list[dict], files: list[str], delete_path: str
) -> list[str]:
    """The data-file paths a file-scoped equality delete applies to:
    same spec, same stored partition tuple (None matches None — the
    null partition is a partition, not a wildcard). A data file under a
    DIFFERENT spec refuses: its membership in the delete's partition is
    unprovable without evaluating the transform."""
    _, spec_id, tup = scope
    out = []
    for path, e in zip(files, data_entries):
        if e.get("__spec_id", 0) != spec_id:
            raise ValueError(
                f"equality delete {delete_path!r} is scoped by a "
                f"non-identity-transformed spec {spec_id}, but data file "
                f"{e['file_path']!r} was written under spec "
                f"{e.get('__spec_id', 0)}: its membership in the delete's "
                "partition cannot be proven without transform evaluation "
                "— refusing rather than deleting rows outside the scope"
            )
        part = e.get("partition") or {}
        if all(part.get(k) == v for k, v in tup):
            out.append(path)
    return out


def _apply_equality_deletes(
    spark, df, scan_path, schema, data_entries, files, eq_entries,
    table_path,
):
    """Equality deletes with the spec's sequence-number scoping: a
    delete row removes data rows whose `equality_ids` columns match
    null-safely AND whose data file's sequence number is STRICTLY less
    than the delete file's — a row written in the same or a later
    snapshot than the delete is untouched (that ordering is what makes
    concurrent upsert streams correct).

    Shape: each data row gets its file's sequence number via a
    file-count-sized broadcast map on `_metadata.file_path`; delete
    files (read under field-id resolution like everything else) union
    per distinct equality_ids set and apply as one LEFT-ANTI broadcast
    hash join each — the null-safe equality terms are the hash keys and
    the sequence comparison rides along as a join filter."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    seq_df = spark.createDataFrame(
        [(p, int(e["__seq"])) for p, e in zip(files, data_entries)],
        schema="__ib_path string, __ib_seq long",
    )
    df = df.join(
        F.broadcast(seq_df), scan_path == seq_df["__ib_path"], "left"
    ).drop("__ib_path")
    by_id = {f["id"]: f for f in schema["fields"]}
    groups: dict[tuple, list[dict]] = {}
    for e in eq_entries:
        # one anti-join per distinct (match columns, partition scope):
        # deletes sharing both union into a single delete side
        key = (tuple(sorted(e["equality_ids"])), e["__scope"])
        groups.setdefault(key, []).append(e)
    for (ids, scope), group in groups.items():
        scope_paths = None
        if scope and scope[0] == "files":
            scope_paths = _file_scope_paths(
                scope, data_entries, files, group[0]["file_path"]
            )
            if not scope_paths:
                continue  # no surviving file is in the delete's partition
        fields = []
        for fid in ids:
            f = by_id.get(fid)
            if f is None:
                raise ValueError(
                    f"equality delete references field id {fid}, which is "
                    "not in the current schema"
                )
            fields.append(f)
        eq_schema = StructType([
            StructField(f["name"], _spark_type(f["type"]), True,
                        metadata={"parquet.field.id": f["id"]})
            for f in fields
        ])
        deletes = None
        for e in group:
            one = (
                spark.read.schema(eq_schema)
                .parquet(_resolve_path(e["file_path"], table_path))
                .select(
                    *[F.col(f["name"]).alias(f"__eq_{f['name']}")
                      for f in fields]
                )
                .withColumn("__eq_seq", F.lit(int(e["__seq"])))
            )
            deletes = one if deletes is None else deletes.unionByName(one)
        total = sum(int(e.get("record_count") or 0) for e in group)
        if total <= _DELETE_BROADCAST_MAX_ROWS:
            deletes = F.broadcast(deletes)
        cond = F.col("__ib_seq") < F.col("__eq_seq")
        for f in fields:
            cond = cond & F.col(f["name"]).eqNullSafe(
                F.col(f"__eq_{f['name']}")
            )
        if scope and scope[0] == "rows":
            # identity scope: source columns are in the data rows, so the
            # scope is extra null-safe literal terms — a NULL scope value
            # scopes to the null partition, never to everything
            for src_col, value in scope[1]:
                cond = cond & F.col(src_col).eqNullSafe(F.lit(value))
        elif scope_paths is not None:
            # file scope (non-identity transform): data files are
            # partition-pure, so membership was decided driver-side from
            # the manifests; the path term keeps the anti-join from
            # touching rows of out-of-scope files. Manifest-sized literal
            # list; Catalyst compiles it to an InSet probe per row.
            cond = cond & scan_path.isin(scope_paths)
        df = df.join(deletes, cond, "left_anti")
    return df


_STATS_OPS = ("=", "<", "<=", ">", ">=")


def _validate_stats_filter(stats_filter) -> None:
    for col, op, lit in stats_filter:
        if op not in _STATS_OPS:
            raise ValueError(f"stats_filter op {op!r} not in {_STATS_OPS}")
        if isinstance(lit, bool) or not isinstance(lit, (int, float)):
            raise ValueError(
                f"stats_filter literal {lit!r} for {col} must be numeric"
            )


def _entry_survives(entry: dict, preds: list[tuple]) -> bool:
    """Keep unless [lower, upper] provably excludes every matching row —
    the Delta stats_filter contract, decoded from Iceberg's bound maps."""
    lowers = _as_int_map(entry.get("lower_bounds"))
    uppers = _as_int_map(entry.get("upper_bounds"))
    for fid, type_name, op, lit in preds:
        lo = _decode_bound(type_name, lowers.get(fid))
        hi = _decode_bound(type_name, uppers.get(fid))
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
