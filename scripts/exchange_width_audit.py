"""Registry-wide §2.3 audit: which Exchange nodes carry heavy payload
columns (text / embedding / binary image payloads)? Shuffling a payload
the downstream only needs for a map-side compute is the guide §2.3 smell
("project before the exchange" / "shuffle keys and metadata instead of
payloads", §8). Prints ops whose plan has at least one such Exchange,
with the count and the matched column names.

Usage: python scripts/exchange_width_audit.py [sf_dir] [op ...]

Known blind spot (ADVICE r16): HEAVY matches raw column NAMES, so a
payload column renamed by an alias before the exchange (toks -> vs,
text -> s) escapes the regex — audit conclusions are "no exchange
carries a payload column under its well-known name", slightly weaker
than "no payload bytes cross any exchange". The registry's payload
columns keep their names across the hot paths (pinned by the r16
adjudication pass), so the gap is accepted and documented here rather
than chased with alias tracking.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark.registry import load_all

HEAVY = re.compile(r"\b(text|embedding|body|payload|png|bmp|jpg|gif|wav|toks)#")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("exchange-width-audit")
    reg = load_all()
    for name in sorted(reg):
        if only and name not in only:
            continue
        try:
            df = reg[name].fn(spark, sf)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record and continue
            print(f"{name}\tERR\t{type(e).__name__}: {e}")
            continue
        hits = []
        in_ex = False
        for line in txt.splitlines():
            # ADVICE r16: any new node header ends the current Exchange
            # block — previously only a blank line or an Input line did,
            # so a detail block leading with a non-Input line could
            # misattribute the NEXT node's Input to the Exchange.
            if re.match(r"^\(\d+\) ", line):
                in_ex = bool(re.match(r"^\(\d+\) Exchange", line))
                continue
            if in_ex and line.startswith("Input"):
                cols = sorted(set(HEAVY.findall(line)))
                if cols:
                    hits.append(",".join(cols))
                in_ex = False
            elif in_ex and not line.strip():
                in_ex = False
        if hits:
            print(f"{name}\t{len(hits)}\t{';'.join(hits)}")


if __name__ == "__main__":
    main()
