"""Property tests for the third-wave operators: brute-force reference
implementations on small random inputs — each example runs a real
Spark job, so max_examples stays small (the value is the weird shapes:
overlapping spans, isolated nodes, oscillating labels, ties)."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st


_edges = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=16,
)

_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=9
    ),
    min_size=1,
    max_size=6,
)


def _adj(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


@given(_edges)
@settings(max_examples=8, deadline=None)
def test_local_clustering_matches_bruteforce(spark, edges):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        local_clustering,
    )

    adj = _adj(edges)
    expect = {
        n: sum(
            1
            for x, y in combinations(sorted(adj[n]), 2)
            if y in adj.get(x, ())
        )
        for n in adj
    }
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["id"]: r for r in local_clustering(df).collect()}
    assert set(got) == set(expect)
    for n, t in expect.items():
        assert got[n]["n_triangles"] == t, (n, edges)
        assert got[n]["degree"] == len(adj[n])


@given(_edges, st.integers(min_value=1, max_value=3))
@settings(max_examples=8, deadline=None)
def test_label_propagation_matches_bruteforce(spark, edges, rounds):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        label_propagation,
    )

    adj = _adj(edges)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        labels = {
            n: min(
                (
                    lbl
                    for lbl, c in Counter(
                        labels[m] for m in adj[n]
                    ).items()
                    if c == max(Counter(labels[m] for m in adj[n]).values())
                ),
            )
            for n in adj
        }
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r["id"]: r["label"]
        for r in label_propagation(df, iterations=rounds).collect()
    }
    assert got == labels, edges


def _brute_span(docs, k):
    toks = {i: t.lower().strip().split() for i, t in docs}
    grams = Counter(
        tuple(w[s : s + k])
        for w in toks.values()
        for s in range(len(w) - k + 1)
    )
    out = {}
    for i, w in toks.items():
        covered = set()
        for s in range(len(w) - k + 1):
            if grams[tuple(w[s : s + k])] > 1:
                covered.update(range(s, s + k))
        kept = [t for p, t in enumerate(w) if p not in covered]
        out[i] = (len(w), len(w) - len(kept), " ".join(kept))
    return out


@given(_corpus, st.integers(min_value=1, max_value=3))
@settings(max_examples=8, deadline=None)
def test_span_removal_matches_bruteforce(spark, word_lists, k):
    from aws_glue_jobs_incremental_database_etl_spark.operators.text import (
        remove_duplicate_spans,
    )

    docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    expect = _brute_span(docs, k)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["kept_text"])
        for r in remove_duplicate_spans(df, k=k).collect()
    }
    assert got == expect, (docs, k)


@given(_edges, st.integers(min_value=0, max_value=100))
@settings(max_examples=8, deadline=None)
def test_merge_components_equals_full_recompute(spark, edges, split_pct):
    """Incremental cluster maintenance: resolve an arbitrary prefix of
    the edge list, fold the rest in via star edges — must equal one
    full resolution (for any split point, including all/none)."""
    from pyspark.sql import functions as F
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        connected_components,
        merge_components,
    )

    cut = len(edges) * split_pct // 100
    e1, e2 = edges[:cut], edges[cut:]
    all_ids = sorted({n for e in edges for n in e})
    universe = spark.createDataFrame([(i,) for i in all_ids], "id long")

    full = connected_components(
        spark.createDataFrame(edges, "id_a long, id_b long")
    )
    expect = {
        r["id"]: r["component"]
        for r in universe.join(full, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
        .collect()
    }

    if e1:
        comp1 = connected_components(
            spark.createDataFrame(e1, "id_a long, id_b long")
        )
        labels1 = (
            universe.join(comp1, "id", "left")
            .select("id", F.coalesce("component", F.col("id")).alias("component"))
        )
    else:
        labels1 = universe.withColumn("component", F.col("id"))
    delta = (
        spark.createDataFrame(e2, "id_a long, id_b long")
        if e2
        else spark.createDataFrame([], "id_a long, id_b long")
    )
    got = {
        r["id"]: r["component"]
        for r in merge_components(labels1, delta).collect()
    }
    assert got == expect, (edges, cut)


@given(_edges, st.integers(min_value=1, max_value=4))
@settings(max_examples=8, deadline=None)
def test_dbscan_matches_bruteforce(spark, edges, min_pts):
    """DBSCAN over random pair graphs ≡ a direct python rendering of
    the definition (core = ≥min_pts distinct neighbors; clusters =
    components of the core subgraph labeled by min core id; border =
    non-core with a core neighbor, attached to its minimum cluster)."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        dbscan_from_pairs,
    )

    adj = _adj(edges)
    ids = sorted(adj)
    core = {n for n in ids if len(adj[n]) >= min_pts}
    # components of the core subgraph
    label = {}
    for n in sorted(core):
        if n in label:
            continue
        stack, seen = [n], {n}
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        root = min(seen)
        for u in seen:
            label[u] = root
    expect = {}
    for n in ids:
        if n in core:
            expect[n] = ("core", label[n])
        else:
            cn = [label[v] for v in adj[n] if v in core]
            expect[n] = ("border", min(cn)) if cn else ("noise", -1)

    universe = spark.createDataFrame([(i,) for i in ids], "id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_from_pairs(universe, pairs, min_pts=min_pts).collect()
    }
    assert got == expect, (edges, min_pts)
