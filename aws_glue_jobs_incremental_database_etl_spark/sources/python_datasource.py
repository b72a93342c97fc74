"""Spark 4 Python Data Source API: a pure-Python batch source with
real partition planning, registered via ``spark.dataSource.register``.

The reference engine's sources are all catalog/JDBC/file readers
(SURVEY.md §2.1); this adds the Spark-4-native extension point for
everything else — internal REST feeds, bespoke binary logs, synthetic
load — without touching the JVM.  The source here generates a
deterministic keyed stream (md5-derived values, same contract as
:mod:`..functions.bloom`), so its output is oracle-checkable in any
engine; swap ``read`` for an HTTP/file cursor to adapt it.

Scale: ``partitions()`` declares ``num_partitions`` independent
splits; Spark schedules one task per split, so a 1000-executor
cluster reads 1000 ranges concurrently — the Python reader is the
same per-task generator either way.  Rows stream from the generator
(Arrow-batched by the runner); nothing materializes driver-side.
"""

from __future__ import annotations

import hashlib

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count.
    Module-level so executor pickling round-trips it."""

    file: str = ""
    rows: int = 0


def _det_value(i: int) -> int:
    """60-bit md5 of ``row:{i}``, mod 1000 — engine-portable
    (DuckDB: ``CAST('0x' || substr(md5('row:' || i), 1, 15) AS
    BIGINT) % 1000``)."""
    return int(hashlib.md5(f"row:{i}".encode()).hexdigest()[:15], 16) % 1000


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class DeterministicNumbersDataSource(DataSource):
    """``format("deterministic_numbers")``: rows ``(i, value, bucket)``
    for ``i`` in ``[0, n)``, value = md5-derived, bucket = value % 5.

    Options: ``n`` (row count, default 1000), ``numPartitions``
    (parallel splits, default 8)."""

    @classmethod
    def name(cls) -> str:
        return "deterministic_numbers"

    def schema(self) -> str:
        return "i bigint, value bigint, bucket bigint"

    def reader(self, schema) -> "DeterministicNumbersReader":
        return DeterministicNumbersReader(self.options)

    def simpleStreamReader(
        self, schema
    ) -> "DeterministicNumbersStreamReader":
        return DeterministicNumbersStreamReader(self.options)


class DeterministicNumbersReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))
        if self.n < 0 or self.num_partitions < 1:
            raise ValueError("need n >= 0 and numPartitions >= 1")

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            v = _det_value(i)
            yield (i, v, v % 5)


class DeterministicNumbersStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the Spark 4 Python Data Source surface: the
    same deterministic rows arriving as offset-tracked micro-batches.

    Offset = the next unread ``i`` (a dict, checkpointed by the
    engine).  ``read(start)`` returns up to ``batchRows`` new rows and
    the advanced offset; once ``n`` is exhausted it returns an empty
    batch with an UNCHANGED offset, which is what lets
    ``processAllAvailable()``/availableNow terminate.
    ``readBetweenOffsets`` replays a committed range verbatim on
    recovery — the determinism of the generator IS the replay
    contract (same rule real adapters must honor: re-reading a
    committed range must yield identical rows)."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch_rows = int(options.get("batchRows", 100))
        if self.n < 0 or self.batch_rows < 1:
            raise ValueError("need n >= 0 and batchRows >= 1")

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, lo: int, hi: int):
        # a list_iterator, not a generator: the runner both pickles
        # the result into its prefetch cache (generators can't pickle)
        # and advances it with next() (a bare list can't)
        return iter(
            [(i, v, v % 5) for i in range(lo, hi) for v in (_det_value(i),)]
        )

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.batch_rows, self.n)
        return self._rows(lo, hi), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["i"]), int(end["i"]))


def register(spark) -> None:
    """Idempotently register the source on this session."""
    spark.dataSource.register(DeterministicNumbersDataSource)


class JsonLinesWriter(DataSourceWriter):
    """Batch WRITER half of the Python Data Source surface (Spark 4
    ``DataSourceWriter``): each task streams its partition's rows to a
    uniquely-named ``.jsonl`` part file under a hidden staging name,
    returns the file name as its commit message, and the DRIVER-side
    ``commit`` publishes exactly the successful tasks' files by
    renaming them visible and writing a ``_MANIFEST`` listing them —
    the same two-phase contract real table formats implement (a failed
    job's staging files are dropped by ``abort``; readers trust only
    the manifest)."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl writer requires a path option")
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(self.path, f".staging-{name}")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.columns, row))) + "\n")
                n += 1
        return JsonlCommit(file=name, rows=n)

    def commit(self, messages):
        import json
        import os

        files = []
        for m in messages:
            if m is None:
                continue
            os.rename(
                os.path.join(self.path, f".staging-{m.file}"),
                os.path.join(self.path, m.file),
            )
            files.append({"file": m.file, "rows": m.rows})
        with open(os.path.join(self.path, "_MANIFEST"), "w") as f:
            json.dump({"files": files}, f)
        if self.overwrite:
            # mode("overwrite") must actually truncate: the documented
            # read-back path is spark.read.json, which globs every
            # part file and ignores _MANIFEST — stale parts from prior
            # commits would surface as mixed old+new rows (ADVICE r4).
            # Deleting strictly AFTER the new files are visible keeps
            # the abort path (staging-only cleanup) untouched.
            keep = {f["file"] for f in files} | {"_MANIFEST"}
            for name in os.listdir(self.path):
                if (
                    name.endswith(".jsonl")
                    and not name.startswith(".")  # not in-flight staging
                    and name not in keep
                ):
                    try:
                        os.remove(os.path.join(self.path, name))
                    except FileNotFoundError:
                        pass

    def abort(self, messages):
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, f".staging-{m.file}"))
            except FileNotFoundError:
                pass


class JsonLinesDataSource(DataSource):
    """``format("jsonl_lines")`` — a pure-Python sink with the
    two-phase task-commit protocol.  The reader half is intentionally
    absent: reading back goes through ``spark.read.json`` (tested),
    keeping this class a minimal writer-surface demonstration."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_lines"

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(self.options, schema, overwrite)


def register_writer(spark) -> None:
    """Idempotently register the jsonl sink on this session."""
    spark.dataSource.register(JsonLinesDataSource)
