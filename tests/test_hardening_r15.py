"""Self-found hardening regressions (late r15) — the advisor's failure
classes, hunted proactively before the next round's ADVICE.

1. Iceberg `hour` transform computed the ordinal via
   timedelta.total_seconds() — a FLOAT64 — whose ulp exceeds 1µs past
   ~year-3000 magnitudes: a timestamp 1µs below an hour boundary
   rounded UP across it, so source_partition_filter compared the wrong
   hour ordinal and could PRUNE a file that held matching rows (the
   same violates-"can only skip work, never rows" class as the
   ADVICE-r14 local-wall-time bug). Fixed: exact integer micros, then
   floor-div.
2. Delta `add.path` / `remove.path` / `cdc.path` are PERCENT-ENCODED
   per the protocol (RFC 2396), but every filesystem join used the raw
   logged string: a spec-legal table whose partition directory holds a
   space (logged `name=a%20b/...`) read a nonexistent path, and a
   literal `%` on disk (logged `%25`) read a DIFFERENT existing path if
   one matched the escaped spelling. Fixed: `_fs_path` decodes at the
   filesystem boundary only — replay state stays keyed by the raw log
   form so add/remove pairing is byte-exact.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from xml_to_parquet_spark.sources.delta_log import (
    delta_active_files,
    read_delta_snapshot,
)
from xml_to_parquet_spark.sources.iceberg import _apply_transform


class TestHourTransformExactMicros:
    def test_hour_1us_below_boundary_far_future(self):
        # The advisor-style counterexample: total_seconds() rounds
        # 3000-06-01T12:59:59.999999 UP across the 13:00 boundary
        # (float ulp at ~3.2e10 s is ~4µs); exact micros floor to the
        # 12:00 hour. Verified divergent against the old formula.
        v = dt.datetime(3000, 6, 1, 13, 0, 0) - dt.timedelta(microseconds=1)
        ok, hour = _apply_transform("hour", v)
        assert ok
        epoch = dt.datetime(1970, 1, 1)
        delta = v - epoch
        micros = (delta.days * 86400 + delta.seconds) * 1_000_000 + (
            delta.microseconds
        )
        assert hour == micros // 3_600_000_000
        # and the old float path really does disagree here — the test
        # documents the counterexample, not just the fixed value
        assert int(delta.total_seconds() // 3600) == hour + 1

    def test_hour_boundary_exact_and_pre_epoch(self):
        ok, h = _apply_transform("hour", dt.datetime(1970, 1, 1, 1, 0, 0))
        assert ok and h == 1
        ok, h = _apply_transform(
            "hour", dt.datetime(1970, 1, 1, 0, 59, 59, 999999)
        )
        assert ok and h == 0
        # pre-epoch floors toward -inf (Java floorDiv parity)
        ok, h = _apply_transform(
            "hour", dt.datetime(1969, 12, 31, 23, 59, 59, 999999)
        )
        assert ok and h == -1

    def test_hour_tz_aware_still_utc_normalized(self):
        # the ADVICE-r14 fix must survive the exact-micros rewrite
        tz = dt.timezone(dt.timedelta(hours=-5))
        v = dt.datetime(2017, 11, 16, 22, 31, 8, tzinfo=tz)
        ok, h = _apply_transform("hour", v)
        assert ok and h == 419691  # UTC 2017-11-17T03:31:08


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


_SCHEMA = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "name", "type": "string", "nullable": True, "metadata": {}},
    ],
})


def _add(path, pv):
    return {"add": {"path": path, "partitionValues": pv, "size": 1,
                    "modificationTime": 0, "dataChange": True}}


class TestDeltaPercentEncodedPaths:
    def _table(self, tmp_path):
        """On disk: a partition dir with a SPACE, and a file whose name
        holds a literal `%`. The log records both percent-encoded, as
        the protocol requires."""
        table = str(tmp_path / "enc")
        os.makedirs(os.path.join(table, "name=a b"), exist_ok=True)
        pq.write_table(pa.Table.from_pylist([{"k": 1}]),
                       os.path.join(table, "name=a b", "f1.parquet"))
        pq.write_table(pa.Table.from_pylist([{"k": 2}]),
                       os.path.join(table, "p%1.parquet"))
        # decoy: if `%25` is NOT decoded, this wrong file gets read
        pq.write_table(pa.Table.from_pylist([{"k": 99}]),
                       os.path.join(table, "p%251.parquet"))
        _commit(table, 0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "enc-fixture",
                          "format": {"provider": "parquet"},
                          "schemaString": _SCHEMA,
                          "partitionColumns": ["name"],
                          "configuration": {}}},
            _add("name=a%20b/f1.parquet", {"name": "a b"}),
            _add("p%251.parquet", {"name": "pct"}),
        ])
        return table

    def test_active_files_decode_to_disk_paths(self, tmp_path):
        table = self._table(tmp_path)
        files = {os.path.relpath(f, table)
                 for f in delta_active_files(table)}
        assert files == {"name=a b/f1.parquet", "p%1.parquet"}

    def test_snapshot_reads_decoded_files_not_decoys(self, spark, tmp_path):
        table = self._table(tmp_path)
        got = {(r["k"], r["name"])
               for r in read_delta_snapshot(spark, table).collect()}
        # k=99 (the undecoded-spelling decoy) must NOT appear
        assert got == {(1, "a b"), (2, "pct")}

    def test_remove_pairs_on_raw_log_form(self, spark, tmp_path):
        table = self._table(tmp_path)
        _commit(table, 1, [
            {"remove": {"path": "name=a%20b/f1.parquet",
                        "deletionTimestamp": 0, "dataChange": True}},
        ])
        got = {r["k"] for r in read_delta_snapshot(spark, table).collect()}
        assert got == {2}


# ---------------------------------------------------------------------------
# property bonds for the fixes above — the writer side of each contract
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

from xml_to_parquet_spark.sources.delta_log import _fs_path  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(
    segs=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_characters="/\x00", blacklist_categories=("Cs",)
            ),
            min_size=1,
            max_size=12,
        ).filter(lambda s: s not in (".", "..")),
        min_size=1,
        max_size=3,
    )
)
def test_property_fs_path_inverts_writer_encoding(segs):
    """A protocol-conformant writer percent-encodes each path segment
    (urllib.parse.quote); _fs_path must resolve the logged form back to
    the exact on-disk relative path, for ANY segment content — spaces,
    literal %, unicode."""
    import urllib.parse

    rel = "/".join(segs)
    logged = "/".join(urllib.parse.quote(s) for s in segs)
    assert _fs_path("/tbl", logged) == "/tbl/" + rel


@settings(max_examples=300, deadline=None)
@given(
    ts=st.datetimes(
        min_value=dt.datetime(1, 1, 2),
        max_value=dt.datetime(9999, 12, 30),
    )
)
def test_property_temporal_transform_ordinals_consistent(ts):
    """Cross-transform invariants over the full datetime domain: the
    hour ordinal floor-divides to the day ordinal (86400s = 24h), the
    day ordinal matches the date subtraction, and month/year agree with
    the calendar — the relation a wrong epoch, a float rounding, or a
    truncate-vs-floor slip each break somewhere in the domain."""
    ok_h, hour = _apply_transform("hour", ts)
    ok_d, day = _apply_transform("day", ts)
    ok_m, month = _apply_transform("month", ts)
    ok_y, year = _apply_transform("year", ts)
    assert ok_h and ok_d and ok_m and ok_y
    assert hour // 24 == day
    assert day == (ts.date() - dt.date(1970, 1, 1)).days
    assert month == (ts.year - 1970) * 12 + (ts.month - 1)
    assert year == ts.year - 1970
    # and the bucket serialization agrees with the hour ordinal's micros
    from xml_to_parquet_spark.sources.iceberg import _bucket_hash_bytes
    import struct as _struct

    micros = _struct.unpack("<q", _bucket_hash_bytes(ts))[0]
    assert micros // 3_600_000_000 == hour


def test_partition_filter_rejects_non_string_values(spark, tmp_path):
    """The log stores partitionValues as STRINGS; a date/int/bool
    literal compared unequal against every group and silently returned
    an empty result. The contract violation now refuses loudly."""
    import pytest

    table = TestDeltaPercentEncodedPaths()._table(tmp_path)
    with pytest.raises(ValueError, match="canonical"):
        read_delta_snapshot(spark, table, partition_filter={"name": 42})
    with pytest.raises(ValueError, match="canonical"):
        read_delta_snapshot(
            spark, table, partition_filter={"name": dt.date(2024, 1, 15)}
        )
    # strings and the None null marker stay accepted
    got = {r["k"] for r in read_delta_snapshot(
        spark, table, partition_filter={"name": "a b"}).collect()}
    assert got == {1}
