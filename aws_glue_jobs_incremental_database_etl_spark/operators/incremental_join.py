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

Exactly-once: state lives in three ``batch=<id>``-partitioned parquet
dirs (``left/``, ``right/``, ``view/``).  Every commit is
write-to-staging + one atomic rename; the VIEW partition doubles as
the batch's commit marker, so a replayed ``batch_id`` is skipped, and
a crash between an accumulator commit and the view commit replays
safely because accumulator reads EXCLUDE the in-flight batch's own
partition (the identity always sees pre-batch state).  This is
``sketch_fold_writer``'s contract adapted to append-dir state.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _heal(d: str) -> None:
    """Finish an interrupted compaction GC: any committed
    ``batch=compact-*`` partition lists the partitions it superseded
    in its ``_REPLACES`` manifest — delete any still present (a crash
    landed between the compaction commit and its GC; reading both
    would double-count).  Idempotent; no-op when nothing is pending."""
    if not os.path.isdir(d):
        return
    for e in os.listdir(d):
        if not e.startswith("batch=compact-"):
            continue
        manifest = os.path.join(d, e, "_REPLACES")
        if not os.path.exists(manifest):
            continue
        with open(manifest) as f:
            for victim in f.read().splitlines():
                if victim and victim != e:
                    shutil.rmtree(os.path.join(d, victim), ignore_errors=True)


class IncrementalJoinView:
    """Maintained inner equi-join view at ``path``."""

    def __init__(self, path: str, on: str) -> None:
        self.path = path.rstrip("/")
        self.on = on
        self.left_dir = os.path.join(self.path, "left")
        self.right_dir = os.path.join(self.path, "right")
        self.view_dir = os.path.join(self.path, "view")

    # -- state plumbing ----------------------------------------------------

    def _read(
        self, spark: SparkSession, d: str, exclude_batch: str | None = None
    ) -> DataFrame | None:
        """Committed state at ``d``, minus ``exclude_batch``'s own
        partition (replay safety), minus the engine-added ``batch``
        partition column."""
        _heal(d)  # finish any interrupted compaction GC before reading
        if not os.path.isdir(d) or not any(
            e.startswith("batch=") for e in os.listdir(d)
        ):
            return None
        df = spark.read.parquet(d)
        if exclude_batch is not None:
            # partition values may be inferred as int — compare as string
            df = df.filter(F.col("batch").cast("string") != exclude_batch)
        return df.drop("batch")

    def _commit(self, df: DataFrame, root: str, batch_id: str) -> None:
        final = os.path.join(root, f"batch={batch_id}")
        if os.path.exists(final):
            return  # replay: this piece already committed
        tmp = os.path.join(root, f".staging-{batch_id}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)  # half-written crash leftovers
        df.write.mode("overwrite").parquet(tmp)
        os.makedirs(root, exist_ok=True)
        os.rename(tmp, final)

    # -- the fold ----------------------------------------------------------

    def apply_batch(
        self,
        spark: SparkSession,
        left_delta: DataFrame | None = None,
        right_delta: DataFrame | None = None,
        batch_id: str | int | None = None,
    ) -> None:
        """Fold one batch of appends (either side or both) into the
        maintained view.  Pass the upstream batch id (e.g. the
        foreachBatch epoch) for exactly-once replay; without one a
        random id is used (at-least-once, like plain appends)."""
        bid = str(uuid.uuid4()) if batch_id is None else str(batch_id)
        if os.path.exists(os.path.join(self.view_dir, f"batch={bid}")):
            return  # replayed batch: fully committed already
        on = self.on
        l_old = self._read(spark, self.left_dir, exclude_batch=bid)
        r_old = self._read(spark, self.right_dir, exclude_batch=bid)
        dl = (
            left_delta.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
            if left_delta is not None
            else None
        )
        dr = (
            right_delta.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
            if right_delta is not None
            else None
        )

        parts = []
        if dl is not None and r_old is not None:
            keys = F.broadcast(dl.select(on).distinct())
            parts.append(dl.join(r_old.join(keys, on, "semi"), on))
        if dr is not None and l_old is not None:
            keys = F.broadcast(dr.select(on).distinct())
            parts.append(l_old.join(keys, on, "semi").join(dr, on))
        if dl is not None and dr is not None:
            parts.append(dl.join(dr, on))

        # accumulators first; the view partition is the commit marker,
        # so a crash here replays into the exclude-own-batch reads
        if dl is not None:
            self._commit(dl, self.left_dir, bid)
        if dr is not None:
            self._commit(dr, self.right_dir, bid)
        if parts:
            delta_view = parts[0]
            for p in parts[1:]:
                delta_view = delta_view.unionByName(p)
            self._commit(delta_view, self.view_dir, bid)
        # parts empty (first-ever batch of one side): no view partition
        # is written — the join schema is unknown until both sides have
        # state, and every commit above is idempotent, so a replay of
        # this batch is still safe without the view marker

    def read_view(self, spark: SparkSession) -> DataFrame:
        view = self._read(spark, self.view_dir)
        if view is None:
            raise FileNotFoundError(
                f"no view state at {self.view_dir}: apply a batch first"
            )
        return view


class WeightedIncrementalJoinView(IncrementalJoinView):
    """The RETRACTION half: deltas carry a weight column (+1 insert,
    −1 delete/retract — an update is a −1 of the old row and a +1 of
    the new one, exactly a CDC feed), and the join is maintained over
    the weighted multiset.  The delta-join identity is BILINEAR in
    the weights, so the same three terms apply with the view row's
    weight = product of the joined weights:

        w(l ⋈ r) = w(l) · w(r)

    A row deleted from the left retracts every joined output it ever
    produced (−1 · +1 = −1), and net multiplicities fall out of a
    final sum — this is the z-set/DBSP construction specialised to
    inner equi-joins.  ``read_view_net`` collapses to rows with net
    weight > 0 (kept as a ``_net`` multiplicity column; weighted
    aggregates should consume ``_net`` directly instead of
    materialising repeats)."""

    def __init__(self, path: str, on: str, weight_col: str = "_w") -> None:
        super().__init__(path, on)
        self.weight_col = weight_col

    def apply_batch(
        self,
        spark: SparkSession,
        left_delta: DataFrame | None = None,
        right_delta: DataFrame | None = None,
        batch_id: str | int | None = None,
    ) -> None:
        w = self.weight_col
        for side, d in (("left", left_delta), ("right", right_delta)):
            if d is not None and w not in d.columns:
                raise ValueError(f"{side} delta lacks weight column {w!r}")
        import uuid as _uuid

        bid = str(_uuid.uuid4()) if batch_id is None else str(batch_id)
        if os.path.exists(os.path.join(self.view_dir, f"batch={bid}")):
            return
        on = self.on
        l_old = self._read(spark, self.left_dir, exclude_batch=bid)
        r_old = self._read(spark, self.right_dir, exclude_batch=bid)
        dl = (
            left_delta.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
            if left_delta is not None
            else None
        )
        dr = (
            right_delta.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
            if right_delta is not None
            else None
        )

        def wjoin(a: DataFrame, b: DataFrame) -> DataFrame:
            aw = a.withColumnRenamed(w, "_wl")
            bw = b.withColumnRenamed(w, "_wr")
            return (
                aw.join(bw, on)
                .withColumn(w, F.col("_wl") * F.col("_wr"))
                .drop("_wl", "_wr")
            )

        parts = []
        if dl is not None and r_old is not None:
            keys = F.broadcast(dl.select(on).distinct())
            parts.append(wjoin(dl, r_old.join(keys, on, "semi")))
        if dr is not None and l_old is not None:
            keys = F.broadcast(dr.select(on).distinct())
            parts.append(wjoin(l_old.join(keys, on, "semi"), dr))
        if dl is not None and dr is not None:
            parts.append(wjoin(dl, dr))

        if dl is not None:
            self._commit(dl, self.left_dir, bid)
        if dr is not None:
            self._commit(dr, self.right_dir, bid)
        if parts:
            delta_view = parts[0]
            for p in parts[1:]:
                delta_view = delta_view.unionByName(p)
            self._commit(delta_view, self.view_dir, bid)

    def read_view_net(self, spark: SparkSession) -> DataFrame:
        """Rows with positive net multiplicity, carrying it as
        ``_net`` — the materialised current state of the view."""
        w = self.weight_col
        view = self.read_view(spark)
        keys = [c for c in view.columns if c != w]
        return (
            view.groupBy(*keys)
            .agg(F.sum(w).alias("_net"))
            .filter(F.col("_net") > 0)
        )

    # -- compaction --------------------------------------------------------

    def _net_rows(self, df: DataFrame) -> DataFrame:
        """Collapse a weighted frame to net multiplicities, dropping
        rows whose inserts and retractions cancel; weighted sums over
        the result equal weighted sums over the input exactly."""
        w = self.weight_col
        keys = [c for c in df.columns if c != w]
        return (
            df.groupBy(*keys)
            .agg(F.sum(w).cast("int").alias(w))
            .filter(F.col(w) != 0)
        )

    def compact(self, spark: SparkSession) -> dict[str, int]:
        """Rewrite history so reads stay O(live rows), not O(history):
        for each state dir (view + both accumulators), net ALL
        committed batch partitions EXCEPT the most recent into one
        ``batch=compact-<n>`` partition and drop the originals — once
        the retraction ratio grows, cancelled ±1 pairs stop being
        re-scanned and re-summed by every ``read_view_net`` and every
        delta-vs-accumulated join (VERDICT r4 #4; the retraction
        analogue of log-structured compaction).

        Crash safety: the compacted partition carries a ``_REPLACES``
        manifest (an underscore file — invisible to the parquet
        reader) listing the partitions it supersedes, and publishes
        via staging + ONE atomic rename; the superseded partitions
        are deleted strictly after the commit, and ``_heal`` (run
        before every read/fold) finishes that deletion if a crash
        interrupted it — so no interleaving double-counts.

        The LATEST partition is never compacted: its ``batch=<id>``
        marker is what makes a Structured-Streaming replay of the
        in-flight epoch a no-op.  Change-feed consumers
        (``read_changes``) must be drained first — compaction rewrites
        the feed's history into one synthetic ``compact-<n>`` batch.
        """
        stats = {}
        for name, d in (
            ("view", self.view_dir),
            ("left", self.left_dir),
            ("right", self.right_dir),
        ):
            _heal(d)
            parts = sorted(
                e
                for e in (os.listdir(d) if os.path.isdir(d) else [])
                if e.startswith("batch=")
            )
            if len(parts) <= 1:  # nothing to compact
                stats[name] = 0
                continue
            # newest partition (by mtime — ids are opaque strings)
            newest = max(
                parts, key=lambda e: os.path.getmtime(os.path.join(d, e))
            )
            victims = [e for e in parts if e != newest]
            n_compact = sum(1 for e in parts if e.startswith("batch=compact-"))
            cid = f"compact-{n_compact + 1}"
            netted = self._net_rows(
                spark.read.parquet(*[os.path.join(d, e) for e in victims])
            )
            tmp = os.path.join(d, f".staging-{cid}")
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            netted.write.mode("overwrite").parquet(tmp)
            with open(os.path.join(tmp, "_REPLACES"), "w") as f:
                f.write("\n".join(victims))
            os.rename(tmp, os.path.join(d, f"batch={cid}"))  # commit
            for e in victims:  # GC strictly after the commit point
                shutil.rmtree(os.path.join(d, e), ignore_errors=True)
            stats[name] = len(victims)
        return stats


def read_changes(view: IncrementalJoinView, spark: SparkSession) -> DataFrame:
    """The view's change feed: every committed view delta WITH its
    ``batch`` id — downstream consumers (a second incremental view, a
    reverse-ETL sink) subscribe to exactly what each batch changed
    instead of diffing snapshots.  For the weighted view the rows
    carry their ±weights, i.e. a full CDC stream OUT of the
    maintained join.  Batch ids are opaque strings; consumers track
    the set they have seen (ids are only ordered if the caller makes
    them so, e.g. zero-padded epochs)."""
    import os as _os

    d = view.view_dir
    _heal(d)
    if not _os.path.isdir(d) or not any(
        e.startswith("batch=") for e in _os.listdir(d)
    ):
        raise FileNotFoundError(f"no view state at {d}")
    return spark.read.parquet(d).withColumn(
        "batch", F.col("batch").cast("string")
    )
