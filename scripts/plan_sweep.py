#!/usr/bin/env python
"""All-entries plan audit: one TSV row of plan-shape counters per entry.

The optimization rounds' "every operator examined" checklist (guide
§7.2, applied catalog-wide): for every catalog entry, build the plan at
a small SF and count the structures the guide says to look for —
shuffle exchanges, sort-merge joins, broadcast nested-loop joins,
CartesianProduct (always a finding), Python-boundary nodes
(ArrowEvalPython / BatchEvalPython / MapInPandas / FlatMapGroupsInPandas
— BatchEvalPython anywhere is a finding: the repo is pandas/Arrow-only),
duplicate evaluation of one Python UDF in several eval nodes (§4.4),
and SortAggregate sites. Explain-only: no query executes, but entries
with build-time driver work (fits, gated counts) still pay it.

Usage:
    python scripts/plan_sweep.py --out plans/r13/plan_sweep_all_entries.tsv \
        [--sf-dir /root/testdata/sf0.01] [name-substring ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_EVAL_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInArrow",
)


def analyze(plan: str) -> dict[str, int]:
    node = re.compile(r"^\s*\(\d+\) ([A-Za-z]+)", re.MULTILINE)
    names = node.findall(plan)
    counts = Counter(names)
    # duplicate Python-UDF evaluation: the same UDF symbol appearing in
    # the argument list of MORE THAN ONE eval node (§4.4 — the pushed-
    # filter copy). Symbols are taken from "Arguments: [f(...)#id]" lines
    # that belong to eval nodes.
    udf_nodes = re.findall(
        r"\(\d+\) (?:%s)[^\n]*\n(?:[^\n(]*\n)*?\s*Arguments: \[([^\n]*)\]"
        % "|".join(_EVAL_NODES),
        plan,
    )
    per_node_syms = [set(re.findall(r"(\w+)\(", args)) for args in udf_nodes]
    sym_counts: Counter[str] = Counter()
    for syms in per_node_syms:
        sym_counts.update(syms)
    dup_udf = sum(1 for _, c in sym_counts.items() if c > 1)
    return {
        "exchanges": counts.get("Exchange", 0),
        "smj": counts.get("SortMergeJoin", 0),
        "bnlj": counts.get("BroadcastNestedLoopJoin", 0),
        "cartesian": counts.get("CartesianProduct", 0),
        "arrow_nodes": sum(counts.get(n, 0) for n in _EVAL_NODES),
        "batch_eval_python": counts.get("BatchEvalPython", 0),
        "dup_udf": dup_udf,
        "sortagg": counts.get("SortAggregate", 0),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("filters", nargs="*", help="name substrings (default: all)")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    args = ap.parse_args()

    from live_data_spark.catalog import catalog
    from live_data_spark.session import get_spark

    spark = get_spark(
        app_name="plan_sweep",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    cat = catalog()
    names = [
        n
        for n in cat
        if not args.filters or any(f in n for f in args.filters)
    ]
    cols = [
        "exchanges",
        "smj",
        "bnlj",
        "cartesian",
        "arrow_nodes",
        "batch_eval_python",
        "dup_udf",
        "sortagg",
    ]
    rows = []
    for i, n in enumerate(names):
        try:
            df = cat[n].spark(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            rows.append((n, analyze(buf.getvalue())))
        except Exception as exc:  # keep sweeping; a broken build IS a finding
            print(f"{n}: BUILD FAILED: {exc}", file=sys.stderr)
            rows.append((n, {c: -1 for c in cols}))
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(names)}", file=sys.stderr)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w") as f:
        f.write("entry\t" + "\t".join(cols) + "\n")
        for n, a in rows:
            f.write(n + "\t" + "\t".join(str(a[c]) for c in cols) + "\n")
    tot = Counter()
    for _, a in rows:
        for c in cols:
            if a[c] > 0:
                tot[c] += a[c]
    print(f"{len(rows)} entries -> {out}")
    print("totals:", dict(tot))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
