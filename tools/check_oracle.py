#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value hash (canonical string
rows, sorted).  Usage::

    python tools/check_oracle.py            # all queries at sf0.01
    python tools/check_oracle.py q1 topk    # substring-filtered subset
    SF_DIR=/root/testdata/sf0.001 python tools/check_oracle.py

Driver-parity rules (learned from round 1, where this replica said
60/60 while the driver failed 5 queries):

* the driver's pandas canonicalizer preserves type distinctions —
  ``Decimal('123.40')`` != ``123.4`` != ``123`` — so ``canon`` here
  must NOT collapse Decimal→float or round floats;
* the driver crashes (``unhashable type: 'list'``) on array/map cells,
  and DuckDB renders DECIMAL/HUGEINT aggregates through pandas as
  floats while Spark keeps Decimals — so gate outputs must contain
  only double/bigint/int/string/bool/date/timestamp columns.
  ``lint_schema`` enforces that on BOTH engines before comparing.
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v) -> str:
    """Canonical cell string that preserves type distinctions.

    int 5234 → '5234', float 5234.0 → '5234.0', Decimal('5234.00') →
    "Decimal('5234.00')" — three different strings, as the driver's
    pandas-based canon would see three different values."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(v + 0.0)  # kills -0.0; no rounding — driver doesn't round
    if isinstance(v, decimal.Decimal):
        return f"Decimal('{v}')"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def lint_spark_schema(sdf) -> list[str]:
    """Gate-unsafe Spark output types: array/map/struct crash the
    driver's canonicalizer; decimal stringifies differently than
    DuckDB's pandas float rendering; binary is ambiguous."""
    from pyspark.sql import types as T

    bad = []
    for f in sdf.schema.fields:
        if isinstance(
            f.dataType,
            (T.ArrayType, T.MapType, T.StructType, T.DecimalType, T.BinaryType),
        ):
            bad.append(f"spark col `{f.name}` is {f.dataType.simpleString()} (gate-unsafe)")
    return bad


def lint_duckdb_schema(con, sql: str) -> list[str]:
    """Gate-unsafe DuckDB output types: DECIMAL/HUGEINT reach pandas
    as floats (mismatching Spark bigint/decimal); LIST/STRUCT/MAP
    crash the canonicalizer."""
    bad = []
    rel = con.sql(sql)
    for cname, ctype in zip(rel.columns, rel.types):
        ts = str(ctype).upper()
        if (
            ts.startswith(("DECIMAL", "HUGEINT", "STRUCT", "MAP", "UNION"))
            or "[" in ts
        ):
            bad.append(f"duckdb col `{cname}` is {ts} (gate-unsafe)")
    return bad


def main() -> int:
    filters = sys.argv[1:]
    import __spark_entry__ as entry_mod
    from aws_glue_jobs_incremental_database_etl_spark.session import get_spark

    # match the driver's runtime exactly (local[32], 32 shuffle
    # partitions): AQE coalescing / broadcast decisions can differ
    # with parallelism, and plan parity is the point of this replica
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="oracle-check",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = [n for n in qs if not filters or any(f in n for f in filters)]
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            problems = [] if name not in oracles else lint_spark_schema(sdf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            problems += lint_duckdb_schema(con, oracles[name])
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems and table_hash(scols, srows) != table_hash(ocols, orows):
            problems.append("value-hash mismatch")
            so = sorted(
                "|".join(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                for r in srows
            )
            oo = sorted(
                "|".join(canon(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                for r in orows
            )
            diff = [(a, b) for a, b in zip(so, oo) if a != b][:3]
            extra = [x for x in so if x not in set(oo)][:3]
            for a, b in diff:
                problems.append(f"  spark : {a[:200]}\n  duckdb: {b[:200]}")
            if not diff and extra:
                problems.append(f"  spark-only rows: {extra}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(p.splitlines()[0] for p in problems))
            for p in problems:
                if "\n" in p:
                    print(p)
            failures += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
