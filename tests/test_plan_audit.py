"""Registry-wide physical-plan audit: EVERY registered query's
executed plan is checked for the three shapes that cannot survive a
100× scale-up — CartesianProduct (never allowed), and
Exchange SinglePartition / BroadcastNestedLoopJoin (allowed only for
queries on the audited whitelists below, where the single partition
or nested-loop side is BOUNDED BY CONSTRUCTION: a ≤1-row scalar
aggregate, a literal-bounded table (bins / top-k candidates / bucket
summaries), or an explicit broadcast cross join against a dimension).
A new query drifting into these shapes fails here and must be either
re-planned or explicitly audited onto the list."""

from __future__ import annotations

from aws_glue_jobs_incremental_database_etl_spark import registry
from tests.test_plans import plan_of

# The whitelists and scanner live in the package so the driver-visible
# PLANS.md generator (tools/plan_report.py) runs the IDENTICAL audit.
from aws_glue_jobs_incremental_database_etl_spark.plans.audit import (  # noqa: F401
    BNLJ_OK,
    SINGLE_PARTITION_OK,
    scan_violations,
)


def test_every_registered_query_plan_is_scale_safe(spark, sf_dir):
    plans = {
        name: plan_of(fn(spark, sf_dir)) for name, fn in registry.Q.items()
    }
    v = scan_violations(plans)
    assert not v["cartesian_product"], (
        f"CartesianProduct (never allowed): {v['cartesian_product']}"
    )
    assert not v["unaudited_single_partition"], (
        f"unaudited Exchange SinglePartition: "
        f"{v['unaudited_single_partition']}"
    )
    assert not v["unaudited_bnlj"], (
        f"unaudited BroadcastNestedLoopJoin: {v['unaudited_bnlj']}"
    )
    # Whitelist entries whose bounded shape no longer appears (AQE
    # re-plans at small sf, or the query was improved) are fine —
    # shrinkage is progress, growth is what the lists gate.


def test_embeddings_family_plans_enter_codegen(spark, sf_dir):
    """Static codegen health (VERDICT r9 #8 / r10 #8): every
    embeddings-family plan must carry ≥1 WholeStageCodegen span — this
    family generates the wide per-dimension term chains that blow the
    janino 64 KB method limit (the pq_distortion failure of r9), and a
    plan with ZERO codegen stages has silently fallen back to
    interpreted evaluation.  ``*(n)`` markers only exist on non-AQE
    plans, so the audited plans are built with AQE off."""
    from aws_glue_jobs_incremental_database_etl_spark.plans.audit import (
        codegen_absent,
    )

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plans = {
            name: plan_of(fn(spark, sf_dir))
            for name, fn in registry.Q.items()
            if "embedding" in name
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plans, "no embeddings-family queries found"
    missing = codegen_absent(plans)
    assert not missing, (
        "embeddings plans with ZERO WholeStageCodegen spans "
        f"(interpreted-eval fallback): {missing}"
    )
