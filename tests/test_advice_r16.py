"""Closures for the four ADVICE r16 items, one section per item (the
r14/r15 pattern: every advisory lands with a regression test re-running
the advisor's own verified counterexample).

1. low — encode_datum's nested-union guard was order-dependent: it only
   fired when iteration REACHED the list branch, so an illegal union
   like ['null', ['int','string']] silently encoded None via branch 0.
   Fixed: all branches are scanned for nested unions BEFORE matching.
2. low — _ZERO_BYTE_COUNT_CAP bounded a single forged block, but a small
   crafted file of CHAINED sub-cap zero-byte-record blocks could still
   materialize unbounded Python dicts. Fixed: the cap now applies to a
   cumulative total threaded through the container loop and each block
   cursor (arrays/maps included).
3. low — _fs_path joined a protocol-legal scheme-prefixed absolute URI
   (s3://bucket/x, file:/x) into a bogus local path like
   <table>/s3:/bucket/x. Fixed: non-file schemes refuse loudly
   (validate-don't-no-op); file: URIs resolve to their local path.
4. low — curate_pack_sharded claimed 'exact (all int64)' but both
   floor(x / budget) divisions routed through double, losing exactness
   past 2^53. Fixed: integer `div` in Spark and `//` in the DuckDB
   oracle (cum_before >= 0, so truncating div IS floor).
"""

from __future__ import annotations

import pytest

from xml_to_parquet_spark.sources import avro_codec
from xml_to_parquet_spark.sources.avro_codec import (
    AvroError,
    _check_block_count,
    _Cursor,
    _ZERO_BYTE_COUNT_CAP,
    encode_datum,
    read_container,
    write_container,
)
from xml_to_parquet_spark.sources.delta_log import _fs_path

# ---------------------------------------------------------------------------
# 1. encode_datum: nested unions refuse regardless of branch order
# ---------------------------------------------------------------------------


def test_encode_nested_union_rejected_even_when_earlier_branch_matches():
    """The advisor's counterexample: value None matches branch 0 ('null')
    BEFORE iteration reaches the illegal list branch — the old in-loop
    check never fired and None encoded silently."""
    illegal = ["null", ["int", "string"]]
    with pytest.raises(AvroError, match="itself a union"):
        encode_datum(illegal, None)


def test_encode_nested_union_rejected_when_value_matches_first():
    # symmetric case: a non-null value matching branch 0 also refuses
    illegal = ["int", ["null", "string"]]
    with pytest.raises(AvroError, match="itself a union"):
        encode_datum(illegal, 5)


def test_encode_legal_union_still_works():
    legal = ["null", "int"]
    assert encode_datum(legal, None) == b"\x00"
    assert encode_datum(legal, 3) == b"\x02\x06"


def test_encode_decode_union_rejection_symmetric():
    """Both codec sides refuse the same illegal schema (the r15 decode
    guard plus the r16 hoisted encode guard)."""
    illegal = ["null", ["int", "string"]]
    with pytest.raises(AvroError, match="itself a union"):
        encode_datum(illegal, None)
    with pytest.raises(AvroError, match="itself a union"):
        avro_codec._decode(illegal, _Cursor(b"\x02\x00"), {})


# ---------------------------------------------------------------------------
# 2. zero-byte-item cap is cumulative, not per-block
# ---------------------------------------------------------------------------

NULL_FIELD_RECORD = {
    "type": "record",
    "name": "Nothing",
    "fields": [{"name": "nothing", "type": "null"}],
}


def _zigzag_bytes(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_check_block_count_cumulative_across_calls():
    """Unit form of the fix: two sub-cap zero-byte blocks on ONE cursor
    must trip the cap when their sum exceeds it."""
    half = _ZERO_BYTE_COUNT_CAP // 2 + 1
    cur = _Cursor(b"")
    _check_block_count(half, cur, 0)  # first block admits
    with pytest.raises(AvroError, match="cumulative"):
        _check_block_count(half, cur, 0)  # sum crosses the cap


def test_check_block_count_nonzero_byte_path_unaffected():
    cur = _Cursor(b"\x00" * 10)
    _check_block_count(5, cur, 1)  # within remaining bytes: fine
    with pytest.raises(AvroError, match="corrupt block"):
        _check_block_count(100, cur, 1)


def test_container_chained_zero_byte_blocks_rejected(tmp_path, monkeypatch):
    """The advisor's file-level counterexample: chain several blocks each
    BELOW the per-block cap; the cumulative total must refuse. The cap is
    monkeypatched small so the test doesn't materialize 2^24 dicts."""
    path = str(tmp_path / "chain.avro")
    write_container(path, NULL_FIELD_RECORD, [{"nothing": None}] * 4)
    data = bytearray(open(path, "rb").read())
    # tail block = zigzag(4) + zigzag(0) + 16-byte sync
    tail = bytes(data[-18:])
    assert tail[:2] == _zigzag_bytes(4) + b"\x00"
    monkeypatch.setattr(avro_codec, "_ZERO_BYTE_COUNT_CAP", 10)
    # one 4-record block alone stays legal under the patched cap
    schema, out = read_container(bytes(data))
    assert out == [{"nothing": None}] * 4
    # three chained 4-record blocks (12 > 10) must refuse, though every
    # individual block passes the old per-block check
    forged = bytes(data) + tail + tail
    with pytest.raises(AvroError, match="corrupt block"):
        read_container(forged)


def test_container_multi_block_zero_byte_file_within_cap_still_reads(
    tmp_path, monkeypatch
):
    """Legal multi-block zero-byte files under the cumulative cap keep
    reading (the guard must not over-reject)."""
    path = str(tmp_path / "ok.avro")
    write_container(path, NULL_FIELD_RECORD, [{"nothing": None}] * 4)
    data = bytearray(open(path, "rb").read())
    tail = bytes(data[-18:])
    monkeypatch.setattr(avro_codec, "_ZERO_BYTE_COUNT_CAP", 10)
    schema, out = read_container(bytes(data) + tail)  # 8 <= 10
    assert out == [{"nothing": None}] * 8


# ---------------------------------------------------------------------------
# 3. _fs_path: scheme-prefixed logged paths
# ---------------------------------------------------------------------------


def test_fs_path_s3_uri_refused_loudly():
    with pytest.raises(ValueError, match="scheme 's3'"):
        _fs_path("/tbl", "s3://bucket/part-00000.parquet")


def test_fs_path_other_remote_schemes_refused():
    for logged in ("abfss://c@a.dfs.core.windows.net/x", "hdfs://nn/x",
                   "gs://bucket/x"):
        with pytest.raises(ValueError, match="local paths only"):
            _fs_path("/tbl", logged)


def test_fs_path_file_uri_resolves_locally():
    assert _fs_path("/tbl", "file:/data/x.parquet") == "/data/x.parquet"
    assert _fs_path("/tbl", "file:///data/x.parquet") == "/data/x.parquet"
    assert (
        _fs_path("/tbl", "file://localhost/data/x.parquet")
        == "/data/x.parquet"
    )
    # percent-decoding applies inside file: URIs too
    assert _fs_path("/tbl", "file:/data/a%20b/x.parquet") == "/data/a b/x.parquet"


def test_fs_path_file_uri_remote_host_refused():
    with pytest.raises(ValueError, match="remote host"):
        _fs_path("/tbl", "file://nas01/data/x.parquet")


def test_fs_path_relative_and_posix_absolute_unchanged():
    # the r15 contract: relative paths percent-decode and join; POSIX
    # absolutes survive os.path.join
    assert _fs_path("/tbl", "name=a%20b/part.parquet") == "/tbl/name=a b/part.parquet"
    assert _fs_path("/tbl", "/abs/part.parquet") == "/abs/part.parquet"
    # a '=' before the colon-ish segment keeps partition dirs out of the
    # scheme grammar entirely (scheme chars exclude '=')
    assert (
        _fs_path("/tbl", "ts=2021-01-01 00%3A00%3A00/p.parquet")
        == "/tbl/ts=2021-01-01 00:00:00/p.parquet"
    )


# ---------------------------------------------------------------------------
# 4. packing bucket division is int64 end-to-end
# ---------------------------------------------------------------------------


def test_pack_bucket_division_exact_past_double_mantissa(spark):
    """The advisor's regime: cum_before > 2^53. floor(x / 512) through
    double mis-buckets (2^53+511 rounds to 2^53+512 before dividing ->
    bucket 2^44+1); integer div gives the exact 2^44."""
    x = 2**53 + 511
    exact = x // 512
    assert int(float(x) / 512 // 1) == exact + 1  # the double-path bug
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0,), (511,), (512,), (x,)], "cum_before bigint"
    ).select(F.expr("cum_before div 512").cast("bigint").alias("seq"))
    got = sorted(r.seq for r in df.collect())
    assert got == sorted([0, 0, 1, exact])


def test_pack_sharded_plan_has_no_double_floor(spark, sf_dir):
    """Pin the fixed device in the plan: the sharded packer's bucket math
    never routes through double (no floor(... as double) anywhere)."""
    from xml_to_parquet_spark.registry import load_all, lookup

    load_all()
    df = lookup("curate_pack_sharded").fn(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "FLOOR" not in analyzed and "floor(" not in analyzed
    assert " div " in analyzed


def test_pack_sharded_oracle_uses_integer_division():
    from xml_to_parquet_spark.registry import load_all

    reg = load_all()
    sql = reg["curate_pack_sharded"].oracle
    assert "//" in sql and "floor(" not in sql


def test_duckdb_integer_division_matches_python():
    import duckdb

    x = 2**53 + 511
    [(got,)] = duckdb.sql(
        f"SELECT CAST(CAST({x} AS BIGINT) // 512 AS BIGINT)"
    ).fetchall()
    assert got == x // 512
