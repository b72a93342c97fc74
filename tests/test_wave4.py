"""Round-4 retrieval/statistics operators: Product-Quantization ADC
search, MMR diversified rerank, and the two-sample statistics built on
bounded-domain folds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.operators.similarity import (
    cosine_topk,
    mmr_rerank,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )


def test_pq_encode_matches_numpy_argmin(emb):
    cb = pq_codebooks(64, 4, 16, seed=11)
    got = {
        r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3)
        for r in pq_encode(emb.limit(50), cb).collect()
    }
    rows = {r.vec_id: np.array(r.embedding) for r in emb.limit(50).collect()}
    for vid, v in rows.items():
        want = tuple(
            int(np.argmin(((cb[s] - v[s * 16 : (s + 1) * 16]) ** 2).sum(1)))
            for s in range(4)
        )
        assert got[vid] == want, vid


def test_pq_codebooks_validate_and_shape():
    assert pq_codebooks(64, 4, 16).shape == (4, 16, 16)
    with pytest.raises(ValueError):
        pq_codebooks(65, 4, 16)


def test_pq_adc_is_a_faithful_l2_surrogate(emb):
    """ADC distance must equal the exact L2² between the query and the
    RECONSTRUCTED (codeword-concatenated) vector — that is the PQ
    contract; approximation error lives in the encode step only."""
    cb = pq_codebooks(64, 4, 16, seed=11)
    q = emb.filter(F.col("vec_id") == 0).first().embedding
    top = pq_adc_topk(emb, list(q), cb, k=15).collect()
    qa = np.array(q)
    for r in top:
        recon = np.concatenate(
            [cb[s][[r.code_0, r.code_1, r.code_2, r.code_3][s]] for s in range(4)]
        )
        assert abs(((qa - recon) ** 2).sum() - r.adc_dist) < 1e-9
    # ranking is ascending with id tie-break
    dists = [(r.adc_dist, r.vec_id) for r in top]
    assert dists == sorted(dists)


def test_mmr_first_pick_is_top_relevance_and_diversifies(emb):
    q = emb.filter(F.col("vec_id") == 0).first().embedding
    corpus = emb.filter(F.col("vec_id") != 0)
    sel = mmr_rerank(corpus, list(q), k=5, pool=20, lam=0.5).collect()
    assert [r.step for r in sel] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in sel}) == 5
    top1 = cosine_topk(corpus, list(q), k=1).first()
    assert sel[0].vec_id == top1.vec_id
    # diversification really kicked in: at least one selection differs
    # from the plain relevance top-5
    plain = [r.vec_id for r in cosine_topk(corpus, list(q), k=5).collect()]
    assert [r.vec_id for r in sel] != plain


def test_mmr_lam_one_reduces_to_plain_topk(emb):
    """With lam=1 the penalty vanishes, so MMR must return exactly the
    relevance top-k in order."""
    q = emb.filter(F.col("vec_id") == 0).first().embedding
    corpus = emb.filter(F.col("vec_id") != 0)
    sel = mmr_rerank(corpus, list(q), k=5, pool=20, lam=1.0).collect()
    want = cosine_topk(corpus, list(q), k=5).collect()
    assert [r.vec_id for r in sel] == [r.vec_id for r in want]


def test_mannwhitney_z_matches_scipy_formula(spark, sf_dir):
    """Cross-check the bounded-domain U fold against a direct python
    computation of U and the tie-corrected z on the same rows."""
    from aws_glue_jobs_incremental_database_etl_spark.registry import Q

    row = Q["mannwhitney_quantity_returnflag"](spark, sf_dir).first()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.col("l_quantity").cast("bigint").alias("v"), "l_returnflag"
        )
        .collect()
    )
    a = sorted(r.v for r in li if r.l_returnflag == "A")
    b = sorted(r.v for r in li if r.l_returnflag == "R")
    # U = #{(x,y): x>y} + 0.5 * ties, brute force on the value domain
    import collections

    ca, cb_ = collections.Counter(a), collections.Counter(b)
    u = 0.0
    for v, na in ca.items():
        u += na * (sum(nb for w, nb in cb_.items() if w < v) + 0.5 * cb_[v])
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.u_stat - u) < 1e-6
    n, m = len(a), len(b)
    nn = n + m
    tie3 = sum(
        (ca[v] + cb_[v]) ** 3 - (ca[v] + cb_[v])
        for v in set(ca) | set(cb_)
    )
    sigma = (n * m / 12.0 * ((nn + 1.0) - tie3 / (nn * (nn - 1.0)))) ** 0.5
    assert abs(row.z_score - (u - n * m / 2.0) / sigma) < 1e-3


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.registry import Q

    row = Q["bootstrap_ci_orders"](spark, sf_dir).first()
    assert row.n_boot == 64
    assert row.ci_lo <= row.point_mean <= row.ci_hi
    # half-subsample means concentrate: the CI is tight around the mean
    assert (row.ci_hi - row.ci_lo) / row.point_mean < 0.1


def test_welch_t_is_antisymmetric_and_dof_bounded(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.registry import Q

    rows = Q["welch_ttest_orders"](spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) priority pairs
    for r in rows:
        assert min(r.na, r.nb) - 1 <= r.welch_dof <= r.na + r.nb - 2


def test_zipf_slope_is_negative_decay(spark, sf_dir):
    from aws_glue_jobs_incremental_database_etl_spark.registry import Q

    rows = Q["zipf_slope_by_source"](spark, sf_dir).collect()
    assert rows, "at least one source"
    for r in rows:
        assert r.zipf_slope < 0, (r.source, r.zipf_slope)
