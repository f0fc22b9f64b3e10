"""Self-found r16 hardening regressions, continuing the r15
representation-boundary hunt (caller literal vs stored/decoded form) the
verdict mandated for the lake adapters' remaining comparison sites.

Find: Delta stats-based skipping parsed every fractional JSON bound
through float64 — but ``add.stats`` records DECIMAL-column bounds as
JSON numbers too, and a decimal min like 92233720368547758.09 rounds UP
to 92233720368547760 in float64, silently PRUNING a file that holds a
row matching the caller's exact literal. Fixed: fractional bounds keep
their raw text (json parse_float) and compare exactly under the
CONSERVATIVE of the two storage interpretations (exact decimal vs the
float64 the text round-trips to) — smaller for lower bounds, larger for
upper bounds, sound for both float- and decimal-typed columns.

Swept clean (no fix needed, pinned here): the Iceberg bounds path never
round-trips through text — float/double unpack the exact IEEE bits and
decimals decode to exact Fractions — so the analogous bug cannot occur.
"""

from __future__ import annotations

import struct
from fractions import Fraction

from xml_to_parquet_spark.sources.delta_log import (
    _numeric_bound,
    _RawJsonFloat,
    _stats_file_survives,
)
from xml_to_parquet_spark.sources.iceberg import _decode_bound

# the advisor-class counterexample: decimal(20,2) column, true file
# min 92233720368547758.09; float64 parses it UP to 92233720368547760
DECIMAL_STATS = (
    '{"minValues":{"x":92233720368547758.09},'
    '"maxValues":{"x":92233720368547999.99}}'
)


def test_decimal_bound_no_longer_prunes_matching_file():
    """A row with value 92233720368547759 is inside the file's true
    range; the float64-parsed min excluded it before the fix."""
    assert _stats_file_survives(DECIMAL_STATS, [("x", "=", 92233720368547759)])
    # and the exact recorded min itself survives an >= probe
    assert _stats_file_survives(DECIMAL_STATS, [("x", "<=", 92233720368547759)])


def test_decimal_bound_still_prunes_provable_exclusions():
    """The conservative parse must not stop REAL pruning: literals
    outside the range under BOTH interpretations still drop the file."""
    assert not _stats_file_survives(DECIMAL_STATS, [("x", "<", 1000)])
    assert not _stats_file_survives(DECIMAL_STATS, [("x", "=", 1.5)])
    assert not _stats_file_survives(
        DECIMAL_STATS, [("x", ">", 92233720368548000.0)]
    )


def test_float_column_roundtrip_still_sound():
    """Shortest-roundtrip float64 text ("0.1" denotes the float64 just
    above 1/10): a literal equal to the stored float64 min must survive
    >= / = probes even though Fraction("0.1") < float64(0.1)."""
    s = '{"minValues":{"x":0.1},"maxValues":{"x":0.5}}'
    assert _stats_file_survives(s, [("x", ">=", 0.1)])
    assert _stats_file_survives(s, [("x", "=", 0.1)])
    assert _stats_file_survives(s, [("x", "=", 0.5)])
    assert not _stats_file_survives(s, [("x", ">", 0.5)])


def test_numeric_bound_conservative_sides():
    raw = _RawJsonFloat("92233720368547758.09")
    lo = _numeric_bound(raw, "lo")
    hi = _numeric_bound(raw, "hi")
    exact = Fraction("92233720368547758.09")
    f64 = Fraction(float("92233720368547758.09"))
    assert lo == min(exact, f64) and hi == max(exact, f64)
    assert lo < hi  # the two interpretations genuinely diverge here


def test_numeric_bound_edge_values_keep_file():
    # NaN / Infinity (json parse_constant path) and bools keep the file
    assert _numeric_bound(float("nan"), "lo") is None
    assert _numeric_bound(float("inf"), "hi") is None
    assert _numeric_bound(True, "lo") is None
    assert _numeric_bound("truncated-string-stat", "lo") is None
    # huge exponent text overflows float64 -> conservatively kept
    assert _numeric_bound(_RawJsonFloat("1e999"), "lo") is None
    # ints pass through exactly
    assert _numeric_bound(2**70, "lo") == 2**70


def test_nan_and_infinity_stats_keep_file():
    s = '{"minValues":{"x":NaN},"maxValues":{"x":Infinity}}'
    assert _stats_file_survives(s, [("x", "=", 5)])


def test_int_bounds_unchanged_exact():
    s = '{"minValues":{"x":92233720368547758},"maxValues":{"x":92233720368547999}}'
    assert _stats_file_survives(s, [("x", "=", 92233720368547758)])
    assert not _stats_file_survives(s, [("x", "=", 92233720368547757)])


# ---------------------------------------------------------------------------
# Iceberg sweep: binary bounds decode exactly — the text-round-trip bug
# class cannot occur (pinned so a refactor to text parsing trips this)
# ---------------------------------------------------------------------------


def test_iceberg_decimal_bound_decodes_exact_fraction():
    unscaled = 9223372036854775809  # > 2^63: breaks any float64 path
    raw = unscaled.to_bytes(9, "big", signed=True)
    got = _decode_bound("decimal(20,2)", raw)
    assert got == Fraction(unscaled, 100)
    assert isinstance(got, Fraction)


def test_iceberg_float_bounds_decode_exact_ieee_bits():
    f32 = struct.pack("<f", 0.1)
    got = _decode_bound("float", f32)
    assert got == struct.unpack("<f", f32)[0]  # exact float32 value
    f64 = struct.pack("<d", 0.1)
    assert _decode_bound("double", f64) == 0.1
    assert _decode_bound("long", struct.pack("<q", 2**62)) == 2**62


# ---------------------------------------------------------------------------
# commitInfo instant precedence (r16 find #2): an explicitly-null
# inCommitTimestamp must fall back to commitInfo.timestamp, not to file
# mtime — and the CDF reader must honor ICT at all (it read only
# `timestamp` before, so delta_version_as_of and _commit_timestamp could
# disagree about the same commit's instant). Both sites now share
# _commit_instant_ms.
# ---------------------------------------------------------------------------

import json as _json
import os as _os

import pytest as _pytest

from xml_to_parquet_spark.sources.delta_log import (
    _commit_instant_ms,
    delta_version_as_of,
)


def test_commit_instant_precedence_unit():
    assert _commit_instant_ms({"inCommitTimestamp": 7, "timestamp": 5}) == 7
    assert _commit_instant_ms({"inCommitTimestamp": None, "timestamp": 5}) == 5
    assert _commit_instant_ms({"timestamp": 5}) == 5
    assert _commit_instant_ms({}) is None
    assert _commit_instant_ms(None) is None


def _delta_table_with_infos(tmp_path, infos):
    table = str(tmp_path / "t")
    log = _os.path.join(table, "_delta_log")
    _os.makedirs(log)
    meta = {
        "metaData": {
            "id": "hardening-r16",
            "format": {"provider": "parquet"},
            "schemaString": _json.dumps({"type": "struct", "fields": []}),
            "partitionColumns": [],
            "configuration": {},
        }
    }
    for v, info in enumerate(infos):
        actions = [{"commitInfo": info}]
        if v == 0:
            actions.append({"protocol": {"minReaderVersion": 1}})
            actions.append(meta)
        actions.append(
            {
                "add": {
                    "path": f"f{v}.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            }
        )
        with open(_os.path.join(log, f"{v:020d}.json"), "w") as fh:
            fh.write("\n".join(_json.dumps(a) for a in actions))
    return table


def test_version_as_of_null_ict_falls_back_to_timestamp(tmp_path):
    """v1 carries {"inCommitTimestamp": null, "timestamp": 2000}. The old
    dict.get(key, default) short-circuit dropped to the commit FILE's
    mtime (written just now — far in the future), so as-of(2000) wrongly
    resolved to v0 instead of v1."""
    table = _delta_table_with_infos(
        tmp_path,
        [{"timestamp": 1000}, {"inCommitTimestamp": None, "timestamp": 2000}],
    )
    assert delta_version_as_of(table, 2000) == 1
    assert delta_version_as_of(table, 1500) == 0
    # and the latest dated instant really is 2000 now, not the file
    # mtime: a probe past it raises per the r14 ADVICE semantics
    with _pytest.raises(ValueError, match="after the latest dated version"):
        delta_version_as_of(table, 2500)


def test_version_as_of_ict_takes_precedence(tmp_path):
    """v1's authoritative ICT (5000) outranks its wall clock (2000): an
    instant of 2500 must resolve to v0, not v1."""
    table = _delta_table_with_infos(
        tmp_path,
        [{"timestamp": 1000}, {"inCommitTimestamp": 5000, "timestamp": 2000}],
    )
    assert delta_version_as_of(table, 2500) == 0
    assert delta_version_as_of(table, 5000) == 1


def test_torn_commit_line_refuses_with_file_context(tmp_path):
    """A half-written (torn) commit line used to surface as a bare
    JSONDecodeError with no provenance — no file, no table. Commits are
    published atomically (temp + rename), so a torn line means
    filesystem corruption or a non-atomic log copy: every JSON-commit
    reader must refuse loudly, naming the file and line (r16,
    validate-don't-no-op rule)."""
    from xml_to_parquet_spark.sources.delta_log import (
        delta_active_files,
        delta_incremental_files,
    )

    table = _delta_table_with_infos(
        tmp_path, [{"timestamp": 1000}, {"timestamp": 2000}]
    )
    log = _os.path.join(table, "_delta_log")
    with open(_os.path.join(log, f"{1:020d}.json"), "a") as fh:
        fh.write('\n{"add": {"path": "torn.par')

    with _pytest.raises(ValueError, match=r"corrupt Delta log file "
                        r"0*1\.json line 3"):
        delta_active_files(table)
    with _pytest.raises(ValueError, match="corrupt Delta log"):
        delta_incremental_files(table, since_version=0)
    # delta_version_as_of stays servable: it stops at the commitInfo
    # line, BEFORE the torn tail - a deliberate laziness, pinned here
    assert delta_version_as_of(table, 2000) == 1


def test_torn_iceberg_metadata_names_the_file(tmp_path):
    """A torn v*.metadata.json (same atomic-swap contract as a Delta
    commit) must name the file, not surface a bare JSONDecodeError."""
    from xml_to_parquet_spark.sources.iceberg import load_iceberg_metadata

    md = tmp_path / "t" / "metadata"
    md.mkdir(parents=True)
    (md / "v3.metadata.json").write_text('{"format-version": 2, "snapsho')
    with _pytest.raises(ValueError, match=r"corrupt Iceberg table "
                        r"metadata v3\.metadata\.json"):
        load_iceberg_metadata(str(tmp_path / "t"))


def test_truncated_avro_manifest_names_the_file(tmp_path):
    """A truncated manifest must report WHICH file is torn — a snapshot
    read walks dozens of manifests and 'wanted N bytes at P' alone is
    a needle in a haystack."""
    from xml_to_parquet_spark.sources.avro_codec import (
        AvroError,
        read_container_file,
        write_container,
    )

    path = str(tmp_path / "m1.avro")
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "long"}]}
    write_container(path, schema, [{"a": i} for i in range(50)])
    whole = open(path, "rb").read()
    open(path, "wb").write(whole[:-7])  # tear mid-block
    with _pytest.raises(AvroError, match=r"m1\.avro: .*"):
        read_container_file(path)
