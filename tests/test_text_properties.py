"""Property-based checks for sequence packing and segment dedup:
against random small corpora, the Spark operators must agree with a
plain Python reference.  Few examples × real Spark jobs — the value
is the weird corpora hypothesis finds (empty docs, whitespace-only
docs, all-identical segments), not volume."""

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_glue_jobs_incremental_database_etl_spark.operators.text import (
    dedup_segments,
    pack_sequences,
)

WORDS = ["a", "bb", "ccc", "dd", "e"]


def _doc():
    return st.one_of(
        st.just(""),
        st.just("   "),
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=17).map(" ".join),
    )


def _corpus():
    return st.lists(_doc(), min_size=1, max_size=7)


def _pack_reference(texts, seq_len):
    """Reference: docs end-to-end in id order, windows of seq_len."""
    out, off = {}, 0
    for i, t in enumerate(texts):
        toks = t.strip().split()
        if not t.strip():
            continue
        n = len(toks)
        st_, en = off, off + n - 1
        for w in range(st_ // seq_len, en // seq_len + 1):
            lo, hi = max(st_, w * seq_len), min(en, (w + 1) * seq_len - 1)
            out[(w, i)] = hi - lo + 1
        off += n
    return out


@given(_corpus(), st.sampled_from([1, 3, 8]), st.sampled_from([1, 2, 100]))
@settings(max_examples=12, deadline=None)
def test_pack_sequences_matches_reference(spark, texts, seq_len, bucket_width):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.window_id, r.id): r.win_tokens
        for r in pack_sequences(
            df, seq_len=seq_len, bucket_width=bucket_width
        ).collect()
    }
    assert got == _pack_reference(texts, seq_len)


def _segment_reference(texts, seg_tokens):
    """Reference keep_first semantics over fixed-token segments."""
    segs_by_doc, seen, out = {}, {}, {}
    for i, t in enumerate(texts):
        if not t.strip():
            continue
        toks = t.strip().split()
        segs = [
            " ".join(toks[p * seg_tokens : (p + 1) * seg_tokens])
            for p in range((len(toks) + seg_tokens - 1) // seg_tokens)
        ]
        segs_by_doc[i] = segs
        for p, s in enumerate(segs):
            seen.setdefault(s, (i, p))
    for i, segs in segs_by_doc.items():
        kept = [s for p, s in enumerate(segs) if seen[s] == (i, p)]
        out[i] = (len(segs), len(kept), " ".join(kept))
    return out


@given(_corpus(), st.sampled_from([1, 2, 5]))
@settings(max_examples=12, deadline=None)
def test_dedup_segments_matches_reference(spark, texts, seg_tokens):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.id: (r.n_segments, r.n_kept, r.clean_text)
        for r in dedup_segments(df, segment_tokens=seg_tokens).collect()
    }
    assert got == _segment_reference(texts, seg_tokens)


def test_bm25_ordering_and_edges(spark):
    """BM25: more hits => higher score at equal length; docs without
    query terms score exactly 0; empty docs survive."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.text import (
        bm25_score,
    )

    df = spark.createDataFrame(
        [
            (1, "spark spark spark pad pad"),
            (2, "spark pad pad pad pad"),
            (3, "pad pad pad pad pad"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in bm25_score(df, ["spark"]).collect()}
    assert out[1]["score"] > out[2]["score"] > 0
    assert out[3]["score"] == 0.0 and out[3]["n_hits"] == 0
    assert out[4]["n_tokens"] == 0 and out[4]["score"] == 0.0
    import pytest

    with pytest.raises(ValueError):
        bm25_score(df, [])


def test_lm_heldout_backoff_and_no_leakage(spark):
    """Unseen test bigrams get the positive backoff probability; a
    test doc of entirely-unseen words still scores finitely, and a
    test doc duplicated in train scores LOWER (more predictable)."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.text import (
        lm_heldout_cross_entropy,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zyx wvu tsr")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in lm_heldout_cross_entropy(train, test).collect()}
    assert out[10]["n_bigrams"] == 2 and out[11]["n_bigrams"] == 2
    # in-model text is far more predictable than novel-vocab text
    assert out[10]["cross_entropy"] < out[11]["cross_entropy"]
    # both finite (backoff worked)
    assert out[11]["cross_entropy"] < 100
