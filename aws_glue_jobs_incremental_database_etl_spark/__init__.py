"""PySpark-native incremental-ETL + analytics engine.

A from-scratch reimplementation of the *capabilities* of the reference
repo ``kenzo0107/aws-glue-jobs-incremental-database-etl`` (an AWS Glue /
Lake Formation "incremental database" blueprint job —
``/root/reference/jdbc_incremental.py``), re-expressed as idiomatic
PySpark DataFrame code with a self-contained catalog / bookmark layer,
plus a large-scale LLM-data-pipeline operator library (dedup,
similarity search, text analysis, streaming) designed for 100 TB scale.

Layout (see SURVEY.md §7):

- ``session``    — tuned SparkSession factory
- ``types``      — Hive/catalog type string ↔ Spark type mapping
- ``config``     — table_config model + validation
- ``bookmarks``  — watermark state store (incremental reads)
- ``transforms`` — ApplyMapping / DropNullFields equivalents
- ``evolution``  — schema-evolution merge
- ``catalog``    — file-backed Glue-catalog shim
- ``sharding``   — md5-mod work sharding
- ``pipeline``   — per-table incremental orchestration
- ``sources``    — parquet / jdbc / csv / json readers
- ``sinks``      — partitioned multi-format append writer
- ``operators``  — joins, aggregates, windows, set ops, dedup,
                   similarity, text analysis, multimodal
- ``functions``  — scalar/vector expression helpers
- ``streaming``  — Structured Streaming + batch-mode window equivalents
- ``plans``      — plan inspection / optimization assertions
"""

__version__ = "0.1.0"
