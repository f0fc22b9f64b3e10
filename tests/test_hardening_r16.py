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
