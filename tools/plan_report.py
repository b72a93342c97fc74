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

    from aws_glue_jobs_incremental_database_etl_spark.plans.audit import (
        codegen_absent,
        registry_names_hash,
        scan_violations,
    )

    rows = []
    plans: dict[str, str] = {}
    totals = {k: 0 for k, _ in MARKS}
    plan_errors = 0
    for name, fn in registry.Q.items():
        try:
            p = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - report, don't die
            rows.append((name, {"error": f"{type(e).__name__}"}))
            plan_errors += 1
            continue
        plans[name] = p
        counts = {k: len(re.findall(rx, p)) for k, rx in MARKS}
        for k, v in counts.items():
            totals[k] += 1 if v else 0
        rows.append((name, counts))

    # The driver-visible audit (VERDICT r9 #5): the IDENTICAL scan the
    # pytest gate runs, over the plans just built — an unaudited
    # SinglePartition/BNLJ/CartesianProduct fails this script (exit 1)
    # and is recorded in the committed artifact either way.
    violations = scan_violations(plans)

    # Static codegen health (VERDICT r9 #8 / r10 #8): embeddings-family
    # plans rebuilt with AQE OFF (``*(n)`` markers only exist there)
    # must each carry ≥1 WholeStageCodegen span — zero means the wide
    # per-dimension term chains fell back to interpreted evaluation.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        cg_plans = {}
        for name, fn in registry.Q.items():
            if "embedding" not in name:
                continue
            try:
                cg_plans[name] = (
                    fn(spark, SF_DIR)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
            except Exception:
                pass  # plan errors already reported above
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    violations["codegen_absent_embeddings"] = codegen_absent(cg_plans)

    n_viol = sum(len(v) for v in violations.values())
    audit_line = (
        "Audit: CLEAN — no CartesianProduct; every SinglePartition/BNLJ "
        "on the audited bounded whitelist."
        if not n_viol
        else "Audit: **VIOLATIONS** — " + "; ".join(
            f"{k}: {', '.join(v)}" for k, v in violations.items() if v
        )
    )

    out = ["# PLANS — physical-plan shapes per query",
           "",
           f"Built (not executed) at `{SF_DIR}`, local[4].  Counts of",
           "plan nodes per query; the hard rules live in",
           "`aws_glue_jobs_incremental_database_etl_spark/plans/audit.py` (no CartesianProduct",
           "anywhere; SinglePartition/BNLJ only on the audited bounded",
           "whitelist) and are enforced BOTH by tests/test_plan_audit.py",
           "and by this generator (exit 1 on violation).",
           "",
           f"Registry hash: `{registry_names_hash()}` "
           "(pinned by tests/test_doc_sync.py — a stale PLANS.md fails "
           "the suite)",
           "",
           audit_line,
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
    if n_viol:
        print(f"PLAN AUDIT VIOLATIONS: {violations}", file=sys.stderr)
        return 1
    if plan_errors:
        print(f"PLAN BUILD ERRORS: {plan_errors}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
