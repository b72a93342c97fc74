"""Incremental JOIN-view maintenance: keep ``L ⋈ R`` current under
append-only batches to EITHER side without ever re-joining history
with history.

The delta-join identity for appends (the classic incremental-view
rule; e.g. DBSP / differential dataflow for the general case):

    Δ(L ⋈ R) = ΔL ⋈ R_old  ∪  L_old ⋈ ΔR  ∪  ΔL ⋈ ΔR

so each ``apply_batch`` joins only delta-vs-accumulated and
delta-vs-delta; the accumulated×accumulated work that dominates a
full recompute is never repeated.  Deletes/updates need retraction
weights — out of scope here, matching the append-only bookmark
pipelines this repo models (``pipeline.py``).

Scale shape: before each delta-vs-accumulated join the accumulated
side is SEMI-JOIN pre-filtered on the delta's (small, broadcastable)
key set, so the wide side's shuffle carries only rows that can match
— at 100 TB the per-batch cost is O(|Δ| + matching slice), not
O(corpus).  Store the accumulators bucketed by the join key and even
that filtered scan prunes to touched buckets.

State: three append-only parquet dirs (``left/``, ``right/``,
``view/``).  Appends are at-least-once like the other incremental
operators — wrap calls in txn.py staging or a streaming checkpoint
(``sketch_fold_writer``'s batch-id rule) for exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalJoinView:
    """Maintained inner equi-join view at ``path``."""

    def __init__(self, path: str, on: str) -> None:
        self.path = path.rstrip("/")
        self.on = on
        self.left_dir = os.path.join(self.path, "left")
        self.right_dir = os.path.join(self.path, "right")
        self.view_dir = os.path.join(self.path, "view")

    def _read(self, spark: SparkSession, d: str) -> DataFrame | None:
        try:
            return spark.read.parquet(d)
        except Exception:
            return None  # first batch: no accumulated state yet

    def apply_batch(
        self,
        spark: SparkSession,
        left_delta: DataFrame | None = None,
        right_delta: DataFrame | None = None,
    ) -> None:
        """Fold one batch of appends (either side or both) into the
        maintained view.  Delta frames are materialized via
        ``localCheckpoint`` before any state append so the three
        identity terms all see the PRE-batch accumulators even though
        this call appends to them."""
        on = self.on
        l_old = self._read(spark, self.left_dir)
        r_old = self._read(spark, self.right_dir)
        dl = left_delta.localCheckpoint(eager=True) if left_delta is not None else None
        dr = right_delta.localCheckpoint(eager=True) if right_delta is not None else None

        parts = []
        if dl is not None and r_old is not None:
            keys = F.broadcast(dl.select(on).distinct())
            parts.append(dl.join(r_old.join(keys, on, "semi"), on))
        if dr is not None and l_old is not None:
            keys = F.broadcast(dr.select(on).distinct())
            parts.append(l_old.join(keys, on, "semi").join(dr, on))
        if dl is not None and dr is not None:
            parts.append(dl.join(dr, on))

        if parts:
            delta_view = parts[0]
            for p in parts[1:]:
                delta_view = delta_view.unionByName(p)
            delta_view.write.mode("append").parquet(self.view_dir)
        if dl is not None:
            dl.write.mode("append").parquet(self.left_dir)
        if dr is not None:
            dr.write.mode("append").parquet(self.right_dir)

    def read_view(self, spark: SparkSession) -> DataFrame:
        view = self._read(spark, self.view_dir)
        if view is None:
            raise FileNotFoundError(
                f"no view state at {self.view_dir}: apply a batch first"
            )
        return view
