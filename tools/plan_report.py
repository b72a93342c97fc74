#!/usr/bin/env python
"""Physical-plan shape report over the whole registry → ``PLANS.md``.

For every registered query, build (don't run) the executed plan at
``SF_DIR`` and count the shapes that determine scale behavior: exchanges,
join strategies, TakeOrderedAndProject vs global Sort, Python
boundaries (Arrow-batched only — row-at-a-time would fail
``plans.assert_no_python_udf``), and parquet filter pushdown.  The
audit TEST (tests/test_plan_audit.py) enforces the hard rules; this
report is the human-readable evidence trail the audit summarizes.

Usage::

    python tools/plan_report.py          # sf0.001, writes PLANS.md
    SF_DIR=/root/testdata/sf0.01 python tools/plan_report.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

MARKS = [
    ("exchanges", r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning)"),
    ("single_part", r"Exchange SinglePartition"),
    ("bhj", r"BroadcastHashJoin"),
    ("smj", r"SortMergeJoin"),
    ("shj", r"ShuffledHashJoin"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("topk", r"TakeOrderedAndProject"),
    ("global_sort", r"Exchange rangepartitioning"),
    ("arrow_py", r"(?:MapInArrow|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|AggregateInPandas)"),
    ("pushed", r"PushedFilters: \[[^\]]"),
]


def main() -> int:
    from aws_glue_jobs_incremental_database_etl_spark import registry
    from aws_glue_jobs_incremental_database_etl_spark.session import get_spark

    spark = get_spark(
        app_name="plan-report",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    totals = {k: 0 for k, _ in MARKS}
    for name, fn in registry.Q.items():
        try:
            p = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - report, don't die
            rows.append((name, {"error": f"{type(e).__name__}"}))
            continue
        counts = {k: len(re.findall(rx, p)) for k, rx in MARKS}
        for k, v in counts.items():
            totals[k] += 1 if v else 0
        rows.append((name, counts))

    out = ["# PLANS — physical-plan shapes per query",
           "",
           f"Built (not executed) at `{SF_DIR}`, local[4].  Counts of",
           "plan nodes per query; the hard rules live in",
           "`tests/test_plan_audit.py` (no CartesianProduct anywhere;",
           "SinglePartition/BNLJ only on the audited bounded whitelist).",
           "",
           f"Queries: {len(rows)}.  With ≥1: " + ", ".join(
               f"{k}={totals[k]}" for k, _ in MARKS),
           "",
           "| query | exch | 1part | bhj | smj | shj | bnlj | topk | arrow | pushdown |",
           "|---|---|---|---|---|---|---|---|---|---|"]
    for name, c in sorted(rows):
        if "error" in c:
            out.append(f"| {name} | plan error: {c['error']} |")
            continue
        out.append(
            f"| {name} | {c['exchanges']} | {c['single_part']} | {c['bhj']} |"
            f" {c['smj']} | {c['shj']} | {c['bnlj']} | {c['topk']} |"
            f" {c['arrow_py']} | {'y' if c['pushed'] else ''} |"
        )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"PLANS.md written: {len(rows)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
