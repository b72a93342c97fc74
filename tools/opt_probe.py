#!/usr/bin/env python
"""Round-11 optimization probe: time individual registry queries with
the noop sink (min-of-N, same methodology as bench.py) and capture
``explain("formatted")`` for the plan evidence files under plans/r11/.

Usage::

    python tools/opt_probe.py boilerplate_ngrams_docs closeness      # time + plan
    TAG=before python tools/opt_probe.py boilerplate_ngrams_docs     # plans/r11/<q>_before.txt
    REPS=3 SF_DIR=/root/testdata/sf0.1 python tools/opt_probe.py ...

Substring filters match bench.py's HEADLINE names.  The probe reuses
the exact bench session config (get_spark defaults + _prepare), so
timings here are comparable to BENCH_LOCAL.json entries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    filters = sys.argv[1:]
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "2"))
    tag = os.environ.get("TAG", "")
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    import __spark_entry__ as entry_mod
    from aws_glue_jobs_incremental_database_etl_spark.session import get_spark
    from aws_glue_jobs_incremental_database_etl_spark import registry

    spark = get_spark(
        app_name="opt-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    entry_mod._prepare(spark)

    # same warm-up as bench.py: JVM/codegen + Python-worker/Arrow paths
    registry.Q["topk_orders"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    spark.range(0, 1024, 1, n_parts).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    names = [n for n in registry.Q if not filters or any(f in n for f in filters)]
    total = 0.0
    for name in names:
        spark.sparkContext.setJobDescription(f"opt-probe: {name}")
        best = 0.0
        for _ in range(reps):
            t0 = time.time()
            registry.Q[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t = time.time() - t0
            best = t if best == 0.0 else min(best, t)
        total += best
        print(f"{best:8.2f}s  {name}", flush=True)
        if tag:
            out = os.path.join(here, "plans", "r11", f"{name}_{tag}.txt")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            df = registry.Q[name](spark, sf_dir)
            with open(out, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
            print(f"          plan -> {out}", flush=True)
    spark.sparkContext.setJobDescription(None)
    print(f"{total:8.2f}s  TOTAL ({len(names)} queries, min-of-{reps})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
