"""Registry-wide checkpoint-WIDTH audit (VERDICT r16 next-round #2).

The round-16/17 optimization device materializes shared subtrees once
(``materialize()`` → localCheckpoint / reliable checkpoint). The device's
own rule — applied at text_tfidf, text_bm25_topk, curate_decontaminate,
and (fixed this round) text_perplexity_bigram — is: NEVER materialize an
exploded/amplified intermediate; checkpoint the compact per-key grid or
array table and re-derive the exploded rows map-side per consumer. A
checkpoint holding MORE ROWS than the operator's largest base input is a
larger-than-corpus intermediate pushed to executor-local disk at 100 TB
(guide §5 spill risk) and must carry an explicit docstring adjudication.

This audit enforces that mechanically: it intercepts every eager
materialization while building each registered operator's plan at a tiny
SF, records the materialized row count and columns, compares against the
operator's largest base-table input (intercepted at ``tables.table``),
and prints one line per violating checkpoint. Exit code 1 if any
non-allowlisted hit is found.

Row count, not byte width, is the enforced axis: the explode-amplified
class is what produced the r16 defect, and row counts are exact and
cheap post-checkpoint. Payload columns (text/embedding/...) riding a
checkpoint are reported informationally for manual review — a compact
per-doc array table legitimately carries them.

ALLOWLIST entries are (op, reason) — every reason must also appear in
the operator's docstring.

Usage: python scripts/checkpoint_width_audit.py [sf_dir] [op ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark import tables as tables_mod
from xml_to_parquet_spark.registry import load_all

HEAVY = re.compile(r"^(text|embedding|body|payload|png|bmp|jpg|gif|wav|toks)$")

# (op, reason) — reason must be defensible from the operator's docstring.
ALLOWLIST: dict[str, str] = {
    # dedup_ngram_jaccard / dedup_containment checkpoint the exploded
    # shingle list deliberately: every downstream consumer (candidate
    # grouping, anti-join, pair verify) is keyed on the SHINGLE, so the
    # compact-array form would re-explode per consumer AND re-shuffle;
    # the exploded table is the join-ready layout (r16 phase-1 table).
    "dedup_ngram_jaccard": "exploded shingle list is the join-keyed layout",
    "dedup_containment": "exploded shingle list is the join-keyed layout",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("checkpoint-width-audit")
    reg = load_all()

    table_rows: dict[str, int] = {}
    state = {"inputs": set(), "ckpts": []}

    orig_table = tables_mod.table

    def spy_table(spark_, sf_dir, name):
        df = orig_table(spark_, sf_dir, name)
        if sf_dir == sf:
            state["inputs"].add(name)
        return df

    orig_lc = DataFrame.localCheckpoint
    orig_cp = DataFrame.checkpoint

    def record(df_out, cols):
        state["ckpts"].append((df_out.count(), cols))
        return df_out

    def spy_lc(self, eager=True):
        out = orig_lc(self, eager=eager)
        return record(out, list(self.columns)) if eager else out

    def spy_cp(self, eager=True):
        out = orig_cp(self, eager=eager)
        return record(out, list(self.columns)) if eager else out

    tables_mod.table = spy_table
    # operators import `table` by name (sometimes aliased, e.g. `_t`);
    # patch every module attribute bound to the original function
    patched: list[tuple[object, str]] = []
    for mod in list(sys.modules.values()):
        for attr, val in list(getattr(mod, "__dict__", {}).items()):
            if val is orig_table:
                setattr(mod, attr, spy_table)
                patched.append((mod, attr))
    DataFrame.localCheckpoint = spy_lc
    DataFrame.checkpoint = spy_cp

    bad = 0
    try:
        for name in sorted(reg):
            if only and name not in only:
                continue
            state["inputs"] = set()
            state["ckpts"] = []
            try:
                # building the plan runs the eager materializations
                reg[name].fn(spark, sf)
            except Exception as e:  # noqa: BLE001 — record and continue
                print(f"{name}\tERR\t{type(e).__name__}: {e}")
                continue
            if not state["ckpts"]:
                continue
            input_rows = max(
                (table_rows.setdefault(
                    t, orig_table(spark, sf, t).count()
                ) for t in state["inputs"]),
                default=0,
            )
            for rows, cols in state["ckpts"]:
                heavy = [c for c in cols if HEAVY.match(c)]
                amplified = input_rows > 0 and rows > input_rows
                if amplified and name not in ALLOWLIST:
                    bad += 1
                    print(
                        f"{name}\tAMPLIFIED\trows={rows} > input={input_rows}"
                        f"\tcols={','.join(cols)}"
                    )
                elif amplified:
                    print(
                        f"{name}\tALLOWLISTED\trows={rows} > input={input_rows}"
                        f"\t{ALLOWLIST[name]}"
                    )
                elif heavy:
                    print(
                        f"{name}\tINFO\trows={rows} <= input={input_rows}"
                        f"\tpayload_cols={','.join(heavy)}"
                    )
    finally:
        tables_mod.table = orig_table
        for mod, attr in patched:
            setattr(mod, attr, orig_table)
        DataFrame.localCheckpoint = orig_lc
        DataFrame.checkpoint = orig_cp
    if bad:
        print(f"FAIL: {bad} unadjudicated amplified checkpoint(s)")
        sys.exit(1)
    print("OK: no unadjudicated amplified checkpoints")


if __name__ == "__main__":
    main()
