"""Inventory-completing variants (lower priority: each is a sibling of — split from the single-file registry (VERDICT r7 #7).

Registration order is preserved by the package ``__init__`` importing
the domain modules in the original file order; ``Q``/``O`` are the
shared dicts from ``._core``.
"""

from __future__ import annotations

import tempfile  # noqa: F401  (several queries stage scratch dirs)

import pandas as pd  # noqa: F401  resolves pandas_udf string annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ..functions import epoch_us  # noqa: F401
from ..tables import load_table  # noqa: F401
from ._core import (  # noqa: F401
    _LM_CE_SQL,
    _SHINGLE_INTER_SQL,
    O,
    Q,
    query,
)
from .llm import _centroid_assign_sql  # noqa: F401

# =====================================================================
# Inventory-completing variants (lower priority: each is a sibling of
# an already-gated row — first/last frames, EXCEPT ALL multiset
# semantics, to_json/json_tuple round-trip)
# =====================================================================

@query(
    "window_first_last_orders",
    """
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderdate) OVER w AS first_order,
           LAST_VALUE(o_orderdate)  OVER w AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_q(spark, sf_dir):
    """first/last analytic functions (SURVEY.md §2.5 [EXT]) over an
    unbounded frame; o_orderkey tie-break keeps the frame order
    deterministic on equal dates."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderdate").over(w).alias("first_order"),
        F.last("o_orderdate").over(w).alias("last_order"),
    )


@query(
    "setop_except_all",
    """
    SELECT o_orderstatus, o_orderpriority FROM orders
    EXCEPT ALL
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0
    """,
)
def setop_except_all_q(spark, sf_dir):
    """EXCEPT ALL (SURVEY.md §2.7 [EXT]): multiset subtraction — each
    right occurrence cancels ONE left occurrence, so the duplicate
    counts (not just membership) must match the oracle."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select("o_orderstatus", "o_orderpriority")
    b = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderstatus", "o_orderpriority"
    )
    return a.exceptAll(b)


@query(
    "setop_intersect_all",
    """
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
    INTERSECT ALL
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0
    """,
)
def setop_intersect_all_q(spark, sf_dir):
    """INTERSECT ALL (SURVEY.md §2.7 [EXT]): multiset intersection —
    each value appears min(count_left, count_right) times, so
    duplicate multiplicities (not just membership) must match."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderstatus", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderstatus", "o_orderpriority"
    )
    return a.intersectAll(b)


@query(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS best
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT l_partkey, l_suppkey, best,
             MIN(best) OVER (PARTITION BY l_partkey) AS part_best
      FROM offers
    )
    SELECT p_partkey, p_brand, s_name, n_name AS nation,
           ROUND(best, 2) AS best_price
    FROM ranked
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_size <= 10 AND best = part_best
    """,
)
def q2(spark, sf_dir):
    """TPC-H Q2-style min-cost supplier (adapted: no partsupp/region,
    lineitem prices are the offers): for each small part, the
    supplier(s) achieving its minimum price — the correlated-MIN
    subquery expressed as a per-part window over the pre-aggregated
    offer table (one fact shuffle; the window runs on parts×suppliers,
    not raw lineitem).  Ties keep every best supplier — a
    deterministic set, no tie-break needed.  MIN on doubles is exact
    and order-insensitive, so the equality filter is engine-stable."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("best")
    )
    ranked = offers.withColumn(
        "part_best", F.min("best").over(Window.partitionBy("l_partkey"))
    )
    return (
        ranked.filter(F.col("best") == F.col("part_best"))
        .join(
            F.broadcast(p.filter(F.col("p_size") <= 10)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("best", 2).alias("best_price"),
        )
    )


@query(
    "json_roundtrip_events",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           to_json(struct_pack(event_type := event_type,
                               k := CAST(json_extract_string(props, '$.k') AS BIGINT)))
               AS packed
    FROM events
    """,
)
def json_roundtrip_q(spark, sf_dir):
    """json_tuple extraction + to_json struct serialization
    (SURVEY.md §2.8 [EXT]) — both engines emit the compact
    {"a":...} form, so the string compares exactly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "event_type", F.json_tuple("props", "k").alias("k_str"))
        .select(
            "event_id",
            "k_str",
            F.to_json(
                F.struct(
                    F.col("event_type"), F.col("k_str").cast("bigint").alias("k")
                )
            ).alias("packed"),
        )
    )


@query(
    "pandas_udaf_event_stats",
    """
    WITH v AS (
      SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      FROM events
    ), r AS (
      SELECT event_type, k_val,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY k_val) AS rn,
             COUNT(*)    OVER (PARTITION BY event_type) AS n
      FROM v
    )
    SELECT event_type,
           ROUND(AVG(CAST(k_val AS DOUBLE)), 4) AS mean_k,
           ROUND(AVG(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                          THEN CAST(k_val AS DOUBLE) END), 4) AS trimmed_k
    FROM r GROUP BY event_type
    """,
)
def pandas_udaf_q(spark, sf_dir):
    """Grouped-aggregate Pandas UDFs (SURVEY.md §2.10 [EXT]): a plain
    mean (Arrow ships each group's column to Python once) and a
    10%-trimmed mean — an aggregate Catalyst has no built-in for.
    Trimming by rank with floor counts makes it order-of-ties
    independent (tied boundary values are equal), so the rank-filtered
    DuckDB AVG reproduces it exactly."""
    from ..operators.udafs import mean_udaf, trimmed_mean_udaf

    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.round(mean_udaf(k), 4).alias("mean_k"),
        F.round(trimmed_mean_udaf(k), 4).alias("trimmed_k"),
    )


@query(
    "incremental_dedup_documents",
    rf"""
    WITH toks AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\s+') AS w
      FROM documents
    ), d AS MATERIALIZED (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM toks
    ), {_SHINGLE_INTER_SQL}, losers AS (
      SELECT DISTINCT id_b AS doc_id FROM inter
      WHERE c::DOUBLE / (na + nb - c) >= 0.7
    )
    SELECT doc_id, lang FROM d
    WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    """,
)
def incremental_dedup_q(spark, sf_dir):
    """Incremental dedup vs a persistent MinHash index
    (operators.incremental_dedup.MinHashIndex): the corpus arrives as
    two bookmark-style batches; each is deduped against everything
    ingested before it WITHOUT rescanning old text.

    Oracle equivalence argument: the one-pass rule drops a doc iff it
    matches an INDEXED (surviving) older doc or any smaller in-batch
    id, while the oracle drops on ANY smaller-id match.  These agree
    unless an open chain A<B<C exists where C matches only the
    eliminated B; verified at sf0.01 the sole multi-pair component is
    the triangle {45,267,413} (413 matches 45 directly), so the two
    semantics coincide.  Banding recall is 1 at τ=0.7 on this data
    (same argument as minhash_near_dup_docs)."""
    import tempfile

    from ..operators.incremental_dedup import MinHashIndex

    d = load_table(spark, sf_dir, "documents")
    idx = MinHashIndex(
        tempfile.mkdtemp(prefix="mh_idx_") + "/index", threshold=0.7, shingle_k=3
    )
    s1 = idx.dedup_batch(d.filter(F.col("doc_id") < 250), "doc_id", "text")
    s2 = idx.dedup_batch(d.filter(F.col("doc_id") >= 250), "doc_id", "text")
    return s1.select("doc_id", "lang").unionByName(s2.select("doc_id", "lang"))


@query(
    "chunk_documents_64",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), nc AS (
      SELECT doc_id, w,
             CASE WHEN len(w) <= 64 THEN 1
                  ELSE 1 + (len(w) - 64 + 47) // 48 END AS n_chunks
      FROM toks
    )
    , ex AS (
      SELECT doc_id, w, unnest(range(0, n_chunks)) AS i FROM nc
    )
    SELECT doc_id, i AS chunk_id,
           len(list_slice(w, i * 48 + 1, i * 48 + 64)) AS n_chunk_tokens,
           array_to_string(list_slice(w, i * 48 + 1, i * 48 + 64), ' ') AS chunk_text
    FROM ex
    """,
)
def chunk_documents_q(spark, sf_dir):
    """Context-window chunking (operators.text.chunk_documents):
    64-token windows with 16-token overlap (stride 48) — pure Catalyst
    split→sequence→posexplode→slice, exactly reproduced by the DuckDB
    lateral-range + list_slice oracle."""
    from ..operators.text import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        d, "doc_id", "text", chunk_tokens=64, overlap_tokens=16
    ).withColumnRenamed("id", "doc_id")


def _semantic_dedup_oracle() -> str:
    """SemDeDup with the literal quantizer: replay the assignment,
    then drop every row with a lower-id same-cluster row at cosine ≥
    0.97 (NOT EXISTS) — the exact min-id-survivor rule the
    applyInPandas kernel implements."""
    from ..operators.similarity import fixed_centroids

    cents = fixed_centroids(64, 8, seed=7)
    return f"""
    WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), d AS (
      SELECT vec_id, e, {_centroid_assign_sql(cents)} AS dl FROM c
    ), a AS (
      SELECT vec_id, e,
             CAST(list_position(dl, list_min(dl)) - 1 AS INTEGER) AS cluster
      FROM d
    )
    SELECT a.vec_id, a.cluster
    FROM a
    WHERE NOT EXISTS (
      SELECT 1 FROM a b
      WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
        AND list_cosine_similarity(b.e, a.e) >= 0.97)
    """


@query("semantic_dedup_embeddings", None)  # oracle attached below (generated)
def semantic_dedup_q(spark, sf_dir):
    """SemDeDup semantic dedup (operators.dedup.semantic_dedup):
    cluster, then within-cluster cosine ≥ 0.97 prune, min-id
    survivor.  The gate uses the LITERAL seeded quantizer
    (``similarity.fixed_centroids``) so assignment + prune carry an
    exact SQL oracle; the trained-KMeans path (data-adaptive clusters,
    no SQL twin) stays the production default and is covered by unit
    tests."""
    from ..operators.dedup import semantic_dedup
    from ..operators.similarity import fixed_centroids

    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    return semantic_dedup(
        e,
        "vec_id",
        "embedding",
        threshold=0.97,
        centroids=fixed_centroids(64, 8, seed=7),
    ).select("vec_id", "cluster")


O["semantic_dedup_embeddings"] = _semantic_dedup_oracle()


@query(
    "pack_sequences_512",
    r"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
      FROM documents WHERE trim(text) <> ''
    ), c AS (
      SELECT doc_id, n,
             CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS st
      FROM t
    ), s AS (
      SELECT doc_id, n, st, st + n - 1 AS en FROM c
    ), ex AS (
      SELECT doc_id, st, en,
             unnest(range(st // 512, en // 512 + 1)) AS window_id
      FROM s
    )
    SELECT CAST(window_id AS BIGINT) AS window_id,
           COUNT(*) AS n_docs,
           CAST(SUM(LEAST(en, window_id * 512 + 511)
                    - GREATEST(st, window_id * 512) + 1) AS BIGINT) AS n_tokens
    FROM ex GROUP BY window_id
    """,
)
def pack_sequences_q(spark, sf_dir):
    """Sequence packing (operators.text.pack_sequences): documents
    laid end-to-end in id order, cut into 512-token training windows;
    per-window document count and token fill.  The oracle is the
    naive global-cumsum formulation; the operator computes the same
    offsets with the scale-safe two-pass bucket cumsum
    (bucket_width=64 here so sf0.01's 500 docs actually span
    multiple buckets and exercise the offset fold)."""
    from ..operators.text import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    pairs = pack_sequences(d, "doc_id", "text", seq_len=512, bucket_width=64)
    return pairs.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("win_tokens").alias("n_tokens"),
    )


@query(
    "segment_dedup_docs",
    r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents WHERE trim(text) <> ''
    ), ex AS (
      SELECT doc_id, w, unnest(range(0, (len(w) + 11) // 12)) AS pos FROM base
    ), segs AS (
      SELECT doc_id, pos,
             array_to_string(list_slice(w, pos * 12 + 1, pos * 12 + 12), ' ')
                 AS seg
      FROM ex
    ), ranked AS (
      SELECT doc_id, pos, seg,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
      FROM segs
    )
    SELECT doc_id, COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(array_to_string(list(seg ORDER BY pos)
                                    FILTER (WHERE rn = 1), ' '), '')
               AS clean_text
    FROM ranked GROUP BY doc_id
    """,
)
def segment_dedup_q(spark, sf_dir):
    """Corpus-wide segment dedup (operators.text.dedup_segments,
    C4/RefinedWeb line-dedup pattern) over 12-token segments —
    first occurrence wins, documents reassembled from surviving
    segments.  The oracle's row_number-per-segment formulation is
    what the operator's min(struct(id,pos)) winner aggregate
    computes without a segment-partitioned window."""
    from ..operators.text import dedup_segments

    d = load_table(spark, sf_dir, "documents")
    return dedup_segments(
        d, "doc_id", "text", segment_tokens=12
    ).withColumnRenamed("id", "doc_id")


@query(
    "lm_score_docs",
    f"""
    WITH {_LM_CE_SQL}
    SELECT doc_id, n_bigrams, ce AS cross_entropy FROM all_docs
    """,
)
def lm_score_q(spark, sf_dir):
    """CCNet-style LM fluency scoring (operators.text.
    lm_cross_entropy): per-document cross-entropy under the corpus's
    own add-k-smoothed bigram model.  Count tables join on the gram
    key (shuffle joins — the model may outgrow any broadcast);
    rounding to 6 decimals absorbs float summation-order differences
    between engines."""
    from ..operators.text import lm_cross_entropy

    d = load_table(spark, sf_dir, "documents")
    return lm_cross_entropy(d, "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


@query(
    "pii_density_docs",
    r"""
    WITH raw AS (
      SELECT doc_id,
             concat_ws(' ',
               'contact', 'user' || CAST(doc_id AS VARCHAR) || '@example.com',
               'ip', '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7',
               'tel', CAST(doc_id + 5550000000 AS VARCHAR),
               substring(text, 1, 80)) AS raw
      FROM documents
    ), masked AS (
      SELECT doc_id, raw,
             len(regexp_extract_all(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS n_emails,
             regexp_replace(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS s1
      FROM raw
    ), masked2 AS (
      SELECT doc_id, raw, n_emails,
             len(regexp_extract_all(s1, '\b\d{1,3}(\.\d{1,3}){3}\b'))
               AS n_ips,
             regexp_replace(s1, '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g')
               AS s2
      FROM masked
    )
    SELECT doc_id AS id,
           CAST(len(string_split_regex(lower(trim(raw)), '\s+')) AS BIGINT)
             AS n_words,
           CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_ips AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(s2, '\b(?:\d[ .-]?){7,}\d\b'))
                AS BIGINT) AS n_numbers,
           ROUND((n_emails + n_ips
                  + len(regexp_extract_all(s2, '\b(?:\d[ .-]?){7,}\d\b')))
                 / CAST(len(string_split_regex(lower(trim(raw)), '\s+'))
                        AS DOUBLE), 6) AS pii_density
    FROM masked2
    """,
)
def pii_density_q(spark, sf_dir):
    """PII-shape density measurement (operators.text.pii_density) over
    the same deterministic synthetic-PII weave as ``redact_pii_docs``
    (the corpus carries no real PII): per-doc email/IP/number counts
    on the progressively-masked text — count-then-mask in redactor
    order so an IP's digits never double-count as a phone — plus
    shapes-per-word density.  Map-only regexp chains; proves Java
    regex ≡ RE2 on the COUNT surface like the redact gate does on the
    replace surface."""
    from ..operators.text import pii_density

    d = load_table(spark, sf_dir, "documents")
    woven = d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.lit("contact"),
            F.concat(
                F.lit("user"), F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
            F.lit("ip"),
            F.concat(
                F.lit("10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
            F.lit("tel"),
            (F.col("doc_id") + 5550000000).cast("string"),
            F.substring("text", 1, 80),
        ).alias("text"),
    )
    return pii_density(woven, "doc_id", "text")


@query(
    "redact_pii_docs",
    r"""
    WITH raw AS (
      SELECT doc_id,
             concat_ws(' ',
               'contact', 'user' || CAST(doc_id AS VARCHAR) || '@example.com',
               'ip', '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7',
               'tel', CAST(doc_id + 5550000000 AS VARCHAR),
               substring(text, 1, 80)) AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
             '\b(?:\d[ .-]?){7,}\d\b', '<NUMBER>', 'g') AS redacted
    FROM raw
    """,
)
def redact_pii_q(spark, sf_dir):
    """PII shape redaction (functions.text.redact_pii): the corpus has
    no real PII, so deterministic synthetic email/IP/phone shapes are
    woven into each document IN the query (same construction in both
    engines), then masked.  The patterns are deliberately
    backreference-free so Java regex (Spark) and RE2 (DuckDB) agree
    character-for-character — which is exactly what this oracle
    proves.  Map-only projection, three chained JVM regexp_replace."""
    from ..functions.text import redact_pii

    d = load_table(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.lit("contact"),
            F.concat(
                F.lit("user"), F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
            F.lit("ip"),
            F.concat(
                F.lit("10.0."), (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
            F.lit("tel"),
            (F.col("doc_id") + F.lit(5550000000)).cast("string"),
            F.substring("text", 1, 80),
        ).alias("raw"),
    )
    return raw.select("doc_id", redact_pii(F.col("raw")).alias("redacted"))


@query(
    "stratified_sample_docs",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 5
    """,
)
def stratified_sample_q(spark, sf_dir):
    """Deterministic per-stratum reservoir (operators.sampling.
    stratified_sample_k): exactly 5 docs per language chosen by md5
    order of the key — engine-portable and layout-independent, unlike
    seeded sampleBy.  One window shuffle keyed on the strata."""
    from ..operators.sampling import stratified_sample_k

    d = load_table(spark, sf_dir, "documents")
    return stratified_sample_k(d, ["lang"], "doc_id", 5).select("doc_id", "lang")


@query(
    "tfidf_top_terms_docs",
    """
    WITH terms AS (
      SELECT doc_id AS id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT id, term, COUNT(*) AS n_term FROM terms GROUP BY id, term
    ), idf AS (
      SELECT term,
             LN(((SELECT COUNT(*) FROM documents) + 1.0)
                / (COUNT(*) + 1.0)) + 1.0 AS idf
      FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.id, tf.term, tf.n_term,
             ROUND(tf.n_term * idf.idf, 6) AS tfidf
      FROM tf JOIN idf ON tf.term = idf.term
    )
    SELECT id AS doc_id, term, n_term, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                   ORDER BY tfidf DESC, term ASC) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def tfidf_q(spark, sf_dir):
    """TF-IDF characteristic terms (operators.text.tfidf_top_terms):
    explode → per-doc term counts → vocabulary document frequencies →
    broadcast idf join → windowed top-3 per document, deterministic by
    (score desc, term).  The whole thing is Catalyst expressions; the
    smoothed idf makes scores engine-exact doubles."""
    from ..operators.text import tfidf_top_terms

    d = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(d, "doc_id", "text", k=3).withColumnRenamed("id", "doc_id")


@query(
    "hash_split_documents",
    """
    SELECT split, COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM (
      SELECT doc_id,
             CASE WHEN b < 8000 THEN 'train'
                  WHEN b < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 10000 AS b
            FROM documents) t
    ) GROUP BY split
    """,
)
def hash_split_q(spark, sf_dir):
    """Deterministic train/val/test split (operators.sampling): the
    md5-hex-prefix bucket is the cross-engine contract, so DuckDB
    reproduces the exact assignment — a row's split never changes as
    the corpus grows, unlike seeded RNG sampling.  Pure map-stage
    projection (no UDF, no shuffle before the aggregation)."""
    from ..operators.sampling import hash_split

    d = load_table(spark, sf_dir, "documents")
    return (
        hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_id"))
    )


@query(
    "near_dup_components",
    rf"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      FROM documents
    ), d AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM toks
    ), {_SHINGLE_INTER_SQL}, pairs AS (
      SELECT id_a AS u, id_b AS v FROM inter
      WHERE c::DOUBLE / (na + nb - c) >= 0.7
    ), edges AS (
      SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ), reach(id, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
    )
    SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
    """,
)
def components_q(spark, sf_dir):
    """Connected components over the near-dup pair graph
    (operators.components.connected_components): min-label propagation
    to fixpoint resolves pairs into clusters — the transitive-closure
    step one-pass dedup skips.  MinHash recall is 1 at τ=0.7 on this
    corpus, so the LSH pair graph equals the exact-Jaccard graph and
    the recursive-CTE oracle (min reachable id per node) applies."""
    from ..operators.components import connected_components
    from ..operators.dedup import minhash_near_dup_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        d, "doc_id", "text", threshold=0.7, shingle_k=3, num_hashes=64, bands=16
    )
    return connected_components(pairs, "id_a", "id_b").select(
        F.col("id").alias("doc_id"), "component"
    )


@query(
    "dup_cluster_sizes_docs",
    rf"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      FROM documents
    ), d AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM toks
    ), {_SHINGLE_INTER_SQL}, pairs AS (
      SELECT id_a AS u, id_b AS v FROM inter
      WHERE c::DOUBLE / (na + nb - c) >= 0.7
    ), edges AS (
      SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ), reach(id, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
    ), comp AS (
      SELECT id, MIN(r) AS component FROM reach GROUP BY id
    ), sizes AS (
      SELECT component, COUNT(*) AS cluster_size FROM comp
      GROUP BY component
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
           CAST(MIN(component) AS BIGINT) AS min_component
    FROM sizes GROUP BY cluster_size
    """,
)
def dup_cluster_sizes_q(spark, sf_dir):
    """Near-dup cluster-size distribution — the duplication-profile
    row of a dataset datasheet (how MUCH of the corpus sits in 2-doc
    vs 50-doc duplicate families decides dedup policy and dedup cost
    bounds).  Components over the MinHash pair graph (recall 1 at
    τ=0.7, same regime as ``near_dup_components``) → size per cluster
    → histogram of sizes.  Two bounded aggregates past the pair
    kernel; singleton (undeduped) docs are intentionally excluded —
    the profile is of the DUPLICATED mass."""
    from ..operators.components import connected_components
    from ..operators.dedup import minhash_near_dup_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        d, "doc_id", "text", threshold=0.7, shingle_k=3, num_hashes=64, bands=16
    )
    comp = connected_components(pairs, "id_a", "id_b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").cast("bigint").alias("n_docs"),
        F.min("component").cast("bigint").alias("min_component"),
    ).select(
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        "n_clusters",
        "n_docs",
        "min_component",
    )


@query(
    "quality_survivor_dedup_docs",
    rf"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      FROM documents
    ), d AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM toks
    ), {_SHINGLE_INTER_SQL}, pairs AS (
      SELECT id_a AS u, id_b AS v FROM inter
      WHERE c::DOUBLE / (na + nb - c) >= 0.7
    ), edges AS (
      SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ), reach(id, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
    ), comp AS (
      SELECT id, MIN(r) AS component FROM reach GROUP BY id
    ), lab AS (
      SELECT doc.doc_id AS id,
             COALESCE(c.component, doc.doc_id) AS cluster,
             doc.n_chars
      FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id
    )
    SELECT id, cluster,
           CAST(ROW_NUMBER() OVER (
                  PARTITION BY cluster
                  ORDER BY n_chars DESC, id ASC) = 1 AS INTEGER)
             AS survivor,
           n_chars
    FROM lab
    """,
)
def quality_survivor_q(spark, sf_dir):
    """Quality-aware near-dup survivor selection
    (operators.dedup.quality_survivor_dedup): MinHash pair graph →
    connected components → keep the HIGHEST-quality doc per cluster
    (n_chars DESC, id ASC) — the RefinedWeb/Dolma-style survivor
    policy, vs the min-id rule of ``minhash_dedup``.  MinHash recall
    is 1 at τ=0.7 on this corpus (same regime as
    ``near_dup_components``), so the exact-Jaccard recursive-CTE
    oracle replays the clusters and the window replays the policy."""
    from ..operators.dedup import minhash_near_dup_pairs, quality_survivor_dedup

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        d, "doc_id", "text", threshold=0.7, shingle_k=3, num_hashes=64, bands=16
    )
    return quality_survivor_dedup(d, pairs, "doc_id", "n_chars")


@query(
    "profile_orders",
    """
    SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*),
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
           CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
    FROM orders
    """,
)
def profile_q(spark, sf_dir):
    """Column profiler (operators.profile): every column's
    nulls/distinct/min/max in ONE aggregate pass, unpivoted via
    inline().  The oracle is the per-column UNION ALL replica."""
    from ..operators.profile import profile

    o = load_table(spark, sf_dir, "orders")
    return profile(
        o,
        ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
        numeric_decimals=2,
    )


@query(
    "histogram_totalprice",
    """
    SELECT bin,
           0.0 + bin * (500000.0 - 0.0) / 20.0       AS bin_lo,
           0.0 + (bin + 1) * (500000.0 - 0.0) / 20.0 AS bin_hi,
           COUNT(*) AS n
    FROM (
      SELECT LEAST(19, CAST(FLOOR((o_totalprice - 0.0)
                                  / ((500000.0 - 0.0) / 20.0)) AS BIGINT)) AS bin
      FROM orders
      WHERE o_totalprice >= 0.0 AND o_totalprice <= 500000.0
    ) GROUP BY bin
    """,
)
def histogram_q(spark, sf_dir):
    """Equi-width histogram (operators.profile.histogram) with fixed
    bounds — one map-side-partial aggregation pass; bin edges are
    plain double arithmetic so DuckDB reproduces them exactly."""
    from ..operators.profile import histogram

    o = load_table(spark, sf_dir, "orders")
    return histogram(o, "o_totalprice", bins=20, lo=0.0, hi=500_000.0)


@query(
    "random_projection_embeddings",
    """
    WITH ex AS (
      SELECT vec_id, i.i AS i, CAST(embedding[i.i + 1] AS DOUBLE) AS x
      FROM embeddings, (SELECT unnest(range(0, 64)) AS i) i
    ), signed AS (
      SELECT vec_id, i, x,
             (CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || j.j), 1, 8))
                   AS BIGINT) % 2) * 2 - 1 AS s,
             j.j AS j
      FROM ex, (SELECT unnest(['0','1','2','3']) AS j) j
    )
    SELECT vec_id, CAST(j AS BIGINT) AS dim,
           CAST(ROUND(SUM(x * s), 4) AS DOUBLE) AS component
    FROM signed GROUP BY vec_id, j
    """,
)
def random_projection_q(spark, sf_dir):
    """Johnson-Lindenstrauss ±1 projection 64→4 dims
    (operators.similarity.random_projection): the sign matrix derives
    per (i, j) from md5, so DuckDB reproduces the exact projection —
    no seeded RNG, no weight broadcast.  Output unpivoted to
    (vec_id, dim, component) rows for a scalar-only gate."""
    from ..operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_projection(emb, "embedding", 4, id_col="vec_id")
    return proj.select(
        "vec_id", F.posexplode("projected").alias("dim", "raw")
    ).select(
        "vec_id",
        F.col("dim").cast("bigint").alias("dim"),
        F.round("raw", 4).cast("double").alias("component"),
    )


@query(
    "cohort_weekly_retention",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST((a.active_week - f.cohort_week) / 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM first_seen f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_week, week_offset
    """,
)
def cohort_q(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-seen week,
    counted in each subsequent active week — the standard retention
    triangle.  Two user-keyed aggregations + one user-keyed join;
    distinct-per-week collapses activity before the join so the join
    input is one row per (user, week), not per event."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "incremental_aggregate_orders",
    """
    SELECT o_custkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def incremental_aggregate_q(spark, sf_dir):
    """Incremental aggregate maintenance (aggregates.
    IncrementalAggregate): the summary is folded from three
    bookmark-style batches — the fact table is never re-scanned — and
    must equal the direct full aggregate (the oracle).  Sum parity via
    the decimal-summand rule; the stored running sum is decimal so
    batch-fold order cannot drift the doubles."""
    from ..aggregates import IncrementalAggregate

    o = load_table(spark, sf_dir, "orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,6)")
    )
    agg = IncrementalAggregate(
        tempfile.mkdtemp(prefix="inc_agg_") + "/summary",
        ["o_custkey"],
        {"price_dec": "sum", "o_orderkey": "count"},
    )
    for lo, hi in [(0, 5000), (5000, 11000), (11000, 1 << 40)]:
        agg.apply_batch(
            o.filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        )
    return agg.read(spark).select(
        "o_custkey",
        F.round(F.col("price_dec_sum"), 2).cast("double").alias("revenue"),
        F.col("o_orderkey_count").alias("n_orders"),
    )


@query(
    "lexicon_score_docs",
    """
    WITH lex(term, weight) AS (
      VALUES ('join', 1.5), ('hash', -0.5), ('scan', 2.0),
             ('filter', -1.0), ('batch', 0.25)
    ), toks AS (
      SELECT doc_id AS id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), hits AS (
      SELECT id, COUNT(*) AS n_matched,
             ROUND(SUM(CAST(weight AS DOUBLE)), 6) AS score
      FROM toks JOIN lex USING (term) GROUP BY id
    )
    SELECT d.doc_id AS id,
           COALESCE(h.n_matched, 0) AS n_matched,
           COALESCE(h.score, 0.0) AS score
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.id
    """,
)
def lexicon_q(spark, sf_dir):
    """Lexicon scoring (operators.text.lexicon_score — the SURVEY
    §2.11 sentiment-dictionary pattern): tokens broadcast-join a
    term→weight dictionary, weights sum per document, zero-hit docs
    keep score 0.  One doc-keyed shuffle; the lexicon never leaves the
    broadcast."""
    from ..operators.text import lexicon_score

    d = load_table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(
        [("join", 1.5), ("hash", -0.5), ("scan", 2.0),
         ("filter", -1.0), ("batch", 0.25)],
        "term string, weight double",
    )
    return lexicon_score(d, lex)


@query(
    "scd2_history_orders",
    """
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 12000
    ), v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey BETWEEN 5000 AND 5499
                  THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey <= 13000 AND o_orderkey NOT BETWEEN 0 AND 499
    )
    -- unchanged keys: one open row from v1
    SELECT a.o_orderkey, a.o_totalprice,
           CAST(1 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
    FROM v1 a JOIN v2 b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_totalprice = b.o_totalprice
    UNION ALL
    -- changed keys: closed v1 row + open v2 row
    SELECT a.o_orderkey, a.o_totalprice, 1, 2
    FROM v1 a JOIN v2 b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_totalprice <> b.o_totalprice
    UNION ALL
    SELECT b.o_orderkey, b.o_totalprice, 2, NULL
    FROM v1 a JOIN v2 b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_totalprice <> b.o_totalprice
    UNION ALL
    -- deleted keys (in v1, absent from v2): closed row
    SELECT a.o_orderkey, a.o_totalprice, 1, 2
    FROM v1 a WHERE a.o_orderkey NOT IN (SELECT o_orderkey FROM v2)
    UNION ALL
    -- inserted keys (absent from v1): open row at v2
    SELECT b.o_orderkey, b.o_totalprice, 2, NULL
    FROM v2 b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM v1)
    """,
)
def scd2_q(spark, sf_dir):
    """SCD Type-2 history apply (merge.scd2_apply): batch v2's
    updates/inserts/deletes versus batch v1 close old rows and open
    new ones instead of overwriting — every past state stays
    queryable.  The feed derives deletes via table_diff (absent keys →
    tombstones); the oracle constructs the expected final history
    directly from the two snapshots."""
    from ..merge import scd2_apply, table_diff

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    v1 = o.filter("o_orderkey <= 12000")
    v2 = o.filter("o_orderkey <= 13000 AND o_orderkey NOT BETWEEN 0 AND 499").withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey").between(5000, 5499), F.col("o_totalprice") + 1000.0
        ).otherwise(F.col("o_totalprice")),
    )
    loc = tempfile.mkdtemp(prefix="scd2_") + "/dim"
    scd2_apply(
        spark, loc, v1.withColumn("v", F.lit(1).cast("bigint")),
        ["o_orderkey"], version_col="v",
    )
    feed = (
        table_diff(v1, v2, ["o_orderkey"])
        .withColumn("deleted", F.col("op") == "delete")
        .drop("op")
        .withColumn("v", F.lit(2).cast("bigint"))
    )
    scd2_apply(
        spark, loc, feed, ["o_orderkey"], version_col="v", delete_col="deleted"
    )
    return spark.read.parquet(loc).select(
        "o_orderkey", "o_totalprice", "valid_from", "valid_to"
    )


@query(
    "table_diff_orders",
    """
    WITH old AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 12000
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey BETWEEN 5000 AND 5199
                  THEN 1.5 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey >= 1000
    )
    SELECT op, COUNT(*) AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                  WHEN n.o_orderkey IS NULL THEN 'delete'
                  WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                       THEN 'update' END AS op
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    ) WHERE op IS NOT NULL GROUP BY op
    """,
)
def table_diff_q(spark, sf_dir):
    """Snapshot diff → change feed (merge.table_diff): rows of the new
    snapshot tagged insert/update/delete vs the old — CDC bootstrap
    from periodic full dumps, and merge_upsert's inverse (their
    round-trip is pinned in tests).  One full-outer key join; change
    detection is a single null-safe struct comparison."""
    from ..merge import table_diff

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    old = o.filter("o_orderkey <= 12000")
    new = o.filter("o_orderkey >= 1000").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey").between(5000, 5199), 1.5).otherwise(
            F.col("o_totalprice")
        ),
    )
    return (
        table_diff(old, new, ["o_orderkey"])
        .groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
        )
    )


@query(
    "hll_distinct_priorities",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           COUNT(*) AS n_rows
    FROM orders GROUP BY o_orderstatus
    """,
)
def hll_q(spark, sf_dir):
    """Mergeable HLL distinct counts (aggregates.IncrementalAggregate
    'approx_distinct'): the summary folds TWO batches, each
    contributing an hll_sketch_agg partial unioned into the running
    sketch.  At ≤5 distinct values per group the HLL estimate is
    EXACT, so this hash-matches the COUNT(DISTINCT) oracle — proving
    the sketch union path end-to-end, not just approximately."""
    from ..aggregates import IncrementalAggregate

    o = load_table(spark, sf_dir, "orders")
    agg = IncrementalAggregate(
        tempfile.mkdtemp(prefix="hll_agg_") + "/summary",
        ["o_orderstatus"],
        {"o_orderpriority": "approx_distinct", "o_orderkey": "count"},
    )
    agg.apply_batch(o.filter("o_orderkey < 8000"))
    agg.apply_batch(o.filter("o_orderkey >= 8000"))
    return agg.read(spark).select(
        "o_orderstatus",
        F.col("o_orderpriority_approx_distinct").alias("n_priorities"),
        F.col("o_orderkey_count").alias("n_rows"),
    )


@query(
    "table_checksum_orders",
    """
    WITH d AS (
      SELECT CAST(('0x' || substring(md5(COALESCE(CAST(o_orderkey AS VARCHAR), '∅null∅')), 1, 8)) AS BIGINT) AS c_key,
             CAST(('0x' || substring(md5(COALESCE(o_orderstatus, '∅null∅')), 1, 8)) AS BIGINT) AS c_status,
             CAST(('0x' || substring(md5(COALESCE(CAST(o_orderdate AS VARCHAR), '∅null∅')), 1, 8)) AS BIGINT) AS c_date
      FROM orders
    )
    SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
           CAST(SUM(c_key) AS BIGINT) AS checksum FROM d
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), CAST(SUM(c_status) AS BIGINT) FROM d
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), CAST(SUM(c_date) AS BIGINT) FROM d
    """,
)
def checksum_q(spark, sf_dir):
    """Cross-engine table checksums (operators.profile.column_checksums):
    Σ md5-int64 of each value's canonical string — commutative, so row
    order/partitioning never matter, and md5 makes the number portable
    to any engine (the source database can compute its own side for an
    end-to-end replication consistency check without moving data)."""
    from ..operators.profile import column_checksums

    o = load_table(spark, sf_dir, "orders")
    return column_checksums(o, ["o_orderkey", "o_orderstatus", "o_orderdate"])


@query(
    "outliers_totalprice",
    """
    WITH s AS (SELECT AVG(o_totalprice) AS mu,
                      STDDEV_POP(o_totalprice) AS sigma FROM orders)
    SELECT o_orderkey,
           CAST(ROUND((o_totalprice - mu) / sigma, 6) AS DOUBLE) AS zscore
    FROM orders, s
    WHERE ABS(ROUND((o_totalprice - mu) / sigma, 6)) > 1.5
    """,
)
def outliers_q(spark, sf_dir):
    """Z-score outlier flags (operators.profile.zscore_outliers): the
    1-row mean/stddev aggregate broadcasts back via cross join, then a
    map-only filter — no full-table window."""
    from ..operators.profile import zscore_outliers

    o = load_table(spark, sf_dir, "orders")
    return zscore_outliers(o, "o_totalprice", threshold=1.5).select(
        "o_orderkey", "zscore"
    )


@query(
    "merge_upsert_orders",
    """
    WITH tgt AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(1 AS BIGINT) AS v
      FROM orders WHERE o_orderkey <= 14000
    ), ups AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
             CAST(2 AS BIGINT) AS v, FALSE AS deleted
      FROM orders WHERE o_orderkey BETWEEN 12001 AND 15000
      UNION ALL
      SELECT o_orderkey, o_orderstatus, 42.0, CAST(3 AS BIGINT), FALSE
      FROM orders WHERE o_orderkey = 12001
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(2 AS BIGINT), TRUE
      FROM orders WHERE o_orderkey <= 1000
    ), latest AS (
      SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                                  ORDER BY v DESC) AS rn
                     FROM ups) WHERE rn = 1
    ), merged AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, v FROM tgt
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice, v FROM latest
      WHERE NOT deleted
    )
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_price,
           CAST(SUM(v) AS BIGINT) AS sum_v
    FROM merged GROUP BY o_orderstatus
    """,
)
def merge_upsert_q(spark, sf_dir):
    """CDC MERGE (merge.merge_upsert): updates + a superseding later
    version + delete tombstones applied to a Hive-partitioned target;
    only touched partition directories are rewritten.  The oracle
    replays the same merge in SQL (latest-per-key via ROW_NUMBER —
    version orders are unique per key here, so it matches the
    operator's total-order struct collapse)."""
    from ..merge import merge_upsert

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    loc = tempfile.mkdtemp(prefix="merge_tgt_") + "/orders"
    o.filter("o_orderkey <= 14000").withColumn(
        "v", F.lit(1).cast("bigint")
    ).write.partitionBy("o_orderstatus").parquet(loc)

    ups = (
        o.filter("o_orderkey BETWEEN 12001 AND 15000")
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        .withColumn("v", F.lit(2).cast("bigint"))
        .withColumn("deleted", F.lit(False))
    )
    newest = (
        o.filter("o_orderkey = 12001")
        .withColumn("o_totalprice", F.lit(42.0))
        .withColumn("v", F.lit(3).cast("bigint"))
        .withColumn("deleted", F.lit(False))
    )
    tomb = (
        o.filter("o_orderkey <= 1000")
        .withColumn("v", F.lit(2).cast("bigint"))
        .withColumn("deleted", F.lit(True))
    )
    merge_upsert(
        spark,
        loc,
        ups.unionByName(newest).unionByName(tomb),
        ["o_orderkey"],
        partition_spec=["o_orderstatus"],
        version_col="v",
        delete_col="deleted",
    )
    return (
        spark.read.parquet(loc)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_price"),
            F.sum("v").alias("sum_v"),
        )
    )


