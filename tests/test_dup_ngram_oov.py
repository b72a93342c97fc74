"""dup_ngram_profile and oov_rate: edge cases, hash-repr parity,
plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.operators.text import (
    dup_ngram_profile,
    oov_rate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_ngram_small_case(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d"),   # grams: "a b c", "b c d"
            (2, "a b c x"),   # grams: "a b c", "b c x"
            (3, "q r"),       # too short for n=3 → 0 grams
            (4, ""),          # empty
        ],
    )
    out = {r["id"]: r for r in dup_ngram_profile(df, n=3).collect()}
    assert out[1]["n_ngrams"] == 2 and out[1]["n_dup"] == 1
    assert out[2]["n_ngrams"] == 2 and out[2]["n_dup"] == 1
    assert out[1]["dup_ratio"] == 0.5
    assert out[3]["n_ngrams"] == 0 and out[3]["dup_ratio"] == 0.0
    assert out[4]["n_ngrams"] == 0 and out[4]["n_dup"] == 0


def test_dup_ngram_within_doc_repeat_counts(spark):
    # the same gram twice in ONE doc is a duplicate too (Lee et al.)
    df = _docs(spark, [(1, "x y x y x y x")])  # "x y x" appears at 0,2,4
    out = dup_ngram_profile(df, n=3).collect()[0]
    assert out["n_dup"] == out["n_ngrams"] == 5


def test_dup_ngram_hash_repr_same_counts(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = dup_ngram_profile(d, n=3, gram_repr="text").orderBy("id").collect()
    b = dup_ngram_profile(d, n=3, gram_repr="xxhash64").orderBy("id").collect()
    assert a == b  # 8-byte-key scale path is semantics-identical


def test_oov_rate_small_case(spark):
    df = _docs(spark, [(1, "a a a b"), (2, "a z"), (3, "")])
    # vocab_size=1 → vocab = {a} (count 4)
    out = {r["id"]: r for r in oov_rate(df, vocab_size=1).collect()}
    assert out[1]["n_oov"] == 1 and out[1]["oov_rate"] == 0.25
    assert out[2]["n_oov"] == 1 and out[2]["oov_rate"] == 0.5
    assert out[3]["n_tokens"] == 0 and out[3]["oov_rate"] == 0.0


def test_oov_vocab_plan_is_topk_and_broadcast(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        oov_rate(d, vocab_size=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan  # vocab top-k, no global sort
    assert "BroadcastHashJoin" in plan, plan      # membership join broadcast


def test_span_removal_cuts_covered_tokens_only(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.text import (
        remove_duplicate_spans,
    )

    # "x y z" (k=3) appears in docs 1 and 2 → covered in both; the
    # surrounding words survive.  Doc 3 shares no 3-gram.
    df = _docs(
        spark,
        [
            (1, "alpha x y z beta"),
            (2, "x y z gamma delta"),
            (3, "unrelated words entirely here"),
        ],
    )
    out = {r["id"]: r for r in remove_duplicate_spans(df, k=3).collect()}
    assert out[1]["n_tokens"] == 5 and out[1]["n_removed"] == 3
    assert out[1]["kept_text"] == "alpha beta"
    assert out[2]["kept_text"] == "gamma delta"
    assert out[3]["n_removed"] == 0
    assert out[3]["kept_text"] == "unrelated words entirely here"


def test_span_removal_overlapping_spans_merge(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.text import (
        remove_duplicate_spans,
    )

    # doc 1 repeats "a b" internally with overlap through "a b a b a":
    # every position is covered by some duplicated 2-gram ("a b" ×2,
    # "b a" ×2) → everything removed; no double-count from overlaps.
    df = _docs(spark, [(1, "a b a b a"), (2, "c d")])
    out = {r["id"]: r for r in remove_duplicate_spans(df, k=2).collect()}
    assert out[1]["n_removed"] == 5 and out[1]["kept_text"] == ""
    assert out[2]["n_removed"] == 0 and out[2]["kept_text"] == "c d"


def test_span_removal_short_and_empty_docs_pass_through(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.text import (
        remove_duplicate_spans,
    )

    df = _docs(spark, [(1, "only four words here"), (2, ""), (3, None)])
    out = {r["id"]: r for r in remove_duplicate_spans(df, k=5).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["n_tokens"] == 4
    assert out[2]["n_tokens"] == 0 and out[2]["kept_text"] == ""
    assert out[3]["n_tokens"] == 0 and out[3]["kept_text"] == ""


def test_span_removal_hash_repr_matches_text_repr(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.operators.text import (
        remove_duplicate_spans,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    a = remove_duplicate_spans(d, k=5, gram_repr="text")
    b = remove_duplicate_spans(d, k=5, gram_repr="xxhash64")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
