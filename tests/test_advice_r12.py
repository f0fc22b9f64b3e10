"""Round-12 ADVICE closures (ADVICE.md, r11 advisor):

1. scripts/profile_ops.py advertised '--reps N' but only parsed
   '--reps=N' — the space-separated form raised IndexError and the bare
   'N' was swallowed as an op name. Now argparse-backed: both forms
   parse, the rep count never leaks into the op list, and a non-integer
   rep count is a clean usage error.
2. timeseries_theil_sen's banded-median docstring now states the
   tie-degeneracy bound (band size ≤ 0.1·n + the largest straddling
   slope tie-group) so reuse on tie-heavy data doesn't assume the 10%
   slice. Docstring-only; pinned here so the note isn't dropped in a
   future rewrite.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _profile_ops_module():
    spec = importlib.util.spec_from_file_location(
        "profile_ops", REPO / "scripts" / "profile_ops.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_profile_ops_parses_equals_form():
    args = _profile_ops_module().parse_args(
        ["/root/testdata/sf0.1", "op_a", "op_b", "--reps=5"]
    )
    assert args.sf_dir == "/root/testdata/sf0.1"
    assert args.ops == ["op_a", "op_b"]
    assert args.reps == 5


def test_profile_ops_parses_space_form():
    """The form the usage string advertises — previously IndexError, with
    the bare '7' additionally misread as an op name."""
    args = _profile_ops_module().parse_args(
        ["/root/testdata/sf0.1", "op_a", "--reps", "7"]
    )
    assert args.ops == ["op_a"]
    assert args.reps == 7


def test_profile_ops_defaults_to_three_reps():
    args = _profile_ops_module().parse_args(["/root/testdata/sf0.1", "op_a"])
    assert args.reps == 3


def test_profile_ops_rejects_non_integer_reps():
    with pytest.raises(SystemExit):
        _profile_ops_module().parse_args(
            ["/root/testdata/sf0.1", "op_a", "--reps", "many"]
        )


def test_theil_sen_docstring_states_tie_degeneracy_bound():
    from xml_to_parquet_spark.operators.relational_ext import (
        timeseries_theil_sen,
    )

    doc = timeseries_theil_sen.__doc__
    assert "Tie-degeneracy bound" in doc
    assert "tie-group" in doc
