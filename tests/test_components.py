"""Connected-components / cluster dedup tests (operators/components.py)."""

from pyspark.sql import functions as F

from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
    cluster_dedup,
    connected_components,
)


def test_transitive_closure_resolves_chains(spark):
    # path 1-2-3-4 (diameter 3), separate pair 10-11, separate triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cc_inline_change_flag_converges_and_drops_helper_column(spark):
    """r11 optimization: the convergence check moved from a second
    full labels-vs-labels join per round into a ``_chg`` flag computed
    in the update pass.  Pin (a) the flag never leaks into the output
    schema, (b) a worst-case chain (needs diameter rounds, exercising
    the early-exit on the final no-change round) still resolves, and
    (c) max_iterations=1 shows the flag actually gates the loop (a
    partially-converged snapshot comes back, proving the loop ran
    exactly once rather than to convergence)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    out = connected_components(chain)
    assert out.columns == ["id", "component"]
    assert {r["component"] for r in out.collect()} == {1}
    partial = connected_components(chain, max_iterations=1)
    # after exactly one min-label round the tail of the chain cannot
    # have reached label 1 yet
    assert {r["component"] for r in partial.collect()} != {1}


def test_cluster_dedup_keeps_one_per_component_and_isolated_rows(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in (1, 2, 3, 4, 10, 11, 99)], "doc_id long, t string"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = sorted(r["doc_id"] for r in cluster_dedup(df, edges, "doc_id").collect())
    # one survivor (the min) per chain/pair; 99 untouched
    assert out == [1, 10, 99]


def test_one_pass_dedup_underdeletes_where_clusters_fix_it(spark):
    """The motivating case is a star whose center is the largest id:
    2~10 and 3~10 (no 2~3 edge).  Pair-level one-pass (drop id_b of
    each a<b pair) deletes only 10 and keeps both leaves; cluster
    dedup resolves {2,3,10} into one component and keeps only 2."""
    df = spark.createDataFrame(
        [(2, "a"), (3, "b"), (10, "c")], "doc_id long, t string"
    )
    edges = spark.createDataFrame([(2, 10), (3, 10)], "id_a long, id_b long")

    one_pass = df.join(
        edges.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    assert sorted(r["doc_id"] for r in one_pass.collect()) == [2, 3]  # under-delete

    clustered = cluster_dedup(df, edges, "doc_id")
    assert sorted(r["doc_id"] for r in clustered.collect()) == [2]


def test_star_matches_simple_on_random_graphs(spark):
    import random

    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.randint(5, 40)
        m = rng.randint(1, 2 * n)
        es = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(m)
        ]
        es = [(a, b) for a, b in es if a != b] or [(0, 1)]
        df = spark.createDataFrame(es, ["id_a", "id_b"])
        simple = sorted(map(tuple, connected_components(df).collect()))
        star = sorted(map(tuple, connected_components_star(df).collect()))
        assert star == simple, f"trial {trial}: {es}"


def test_star_handles_long_chain_in_few_rounds(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        connected_components_star,
    )

    # a 120-node path: diameter 119 — plain propagation needs ~119
    # rounds; the star algorithm must finish inside its default
    # max_iterations=50 (converges in O(log n) rounds)
    n = 120
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    out = connected_components_star(df).collect()
    assert len(out) == n
    assert all(r.component == 0 for r in out)


def test_pagerank_matches_numpy_power_iteration(spark):
    """10 iterations on a small digraph ≡ the dense numpy power
    iteration (same simplified dangling treatment)."""
    import numpy as np

    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        pagerank,
    )

    E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # 3 → 2 → 0 → {1,2}
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(edges, iterations=10).collect()}

    n, d = 4, 0.85
    M = np.zeros((n, n))
    outdeg = {u: sum(1 for a, _ in E if a == u) for u, _ in E}
    for u, v in E:
        M[v, u] = 1.0 / outdeg[u]
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1 - d) / n + d * (M @ r)
    assert got.keys() == {0, 1, 2, 3}
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])
    # node 2 has the most in-links → highest rank; 3 has none → lowest
    assert got[2] == max(got.values()) and got[3] == min(got.values())


def test_pagerank_uniform_on_a_ring(spark):
    """On a cycle every node is symmetric: ranks are all 1/n and sum
    to 1 (no dangling leak on a ring)."""
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        pagerank,
    )

    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    got = [r.rank for r in pagerank(edges, iterations=7).collect()]
    assert len(got) == n
    for v in got:
        assert abs(v - 1.0 / n) < 1e-12
    assert abs(sum(got) - 1.0) < 1e-9

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(edges, iterations=0)
    with _pytest.raises(ValueError):
        pagerank(edges, damping=1.5)


def test_local_clustering_counts_triangles_once(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import local_clustering

    # K4 on {1,2,3,4} (4 triangles, every node in 3 of them, coeff 1.0)
    # plus a pendant node 5 attached to 1 (degree 1, no triangles) and
    # a triangle-free path 10-11-12.
    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges = spark.createDataFrame(
        k4 + [(1, 5), (10, 11), (11, 12)], "u long, v long"
    )
    rows = {r["id"]: r for r in local_clustering(edges).collect()}
    for n in (2, 3, 4):
        assert rows[n]["n_triangles"] == 3
        assert rows[n]["coefficient"] == 1.0
    assert rows[1]["n_triangles"] == 3  # degree 4 → coeff 3/6
    assert rows[1]["coefficient"] == 0.5
    assert rows[5]["n_triangles"] == 0 and rows[5]["coefficient"] == 0.0
    assert rows[11]["n_triangles"] == 0 and rows[11]["degree"] == 2


def test_local_clustering_dedupes_and_ignores_self_loops(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import local_clustering

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (7, 7)], "u long, v long"
    )
    rows = {r["id"]: r for r in local_clustering(edges).collect()}
    assert set(rows) == {1, 2, 3}  # self-loop node dropped entirely
    assert all(r["n_triangles"] == 1 for r in rows.values())


def test_label_propagation_two_cliques_bridge(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import label_propagation

    # two triangles {1,2,3} and {10,11,12} joined by one bridge 3-10:
    # each clique converges to its own min label; the bridge is not
    # enough votes to flip either side.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "u long, v long",
    )
    out = {r["id"]: r["label"] for r in label_propagation(edges, iterations=4).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == out[12]
    assert out[10] != 1


def test_label_propagation_deterministic_tiebreak(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import label_propagation

    # star center 5 with leaves 1..4: round 1, center sees four
    # distinct labels (all count 1) → takes the MIN (1); each leaf
    # sees only {5} → takes 5.  Deterministic under the sync schedule.
    edges = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3), (5, 4)], "u long, v long"
    )
    out = {r["id"]: r["label"] for r in label_propagation(edges, iterations=1).collect()}
    assert out[5] == 1
    assert out[1] == out[2] == out[3] == out[4] == 5


def test_label_propagation_rejects_zero_iterations(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import label_propagation
    import pytest

    edges = spark.createDataFrame([(1, 2)], "u long, v long")
    with pytest.raises(ValueError):
        label_propagation(edges, iterations=0)


def test_bfs_distances_multi_source_min(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import bfs_distances

    # path 1-2-3-4-5 with sources {1, 5}: distances fold from both
    # ends; node 3 is 2 from either.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    seeds = spark.createDataFrame([(1,), (5,)], "id long")
    out = {r["id"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=4).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


def test_bfs_distances_hop_cap_excludes_far_nodes(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "u long, v long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    out = {r["id"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=2).collect()}
    # node 4 is 3 hops away → absent; disconnected 10/11 absent
    assert out == {1: 0, 2: 1, 3: 2}


def test_kcore_peels_fringe_cascade(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import kcore

    # K4 core {1,2,3,4} + a tail 4-5-6: k=2 peels 6 (deg 1), then 5
    # (its degree drops to 1) — the cascade needs two rounds.
    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges = spark.createDataFrame(k4 + [(4, 5), (5, 6)], "u long, v long")
    out = {r["id"]: r["degree"] for r in kcore(edges, k=2, peel_rounds=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(d == 3 for d in out.values())


def test_kcore_k3_kills_everything_but_clique(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import kcore

    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    star = [(1, x) for x in (7, 8, 9)]
    edges = spark.createDataFrame(k4 + star, "u long, v long")
    out = {r["id"] for r in kcore(edges, k=3, peel_rounds=3).collect()}
    assert out == {1, 2, 3, 4}


def test_personalized_pagerank_matches_hand_iteration(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import pagerank

    # symmetric path 1-2-3-4-5, seed {1}: compare against a
    # hand-rolled personalized power iteration (r0 = t, r' = 0.15·t +
    # 0.85·Σ r/deg).  Note rank need NOT decay monotonically with
    # distance at d=0.85 — the seed's sole neighbor receives its whole
    # outflow and overtakes it — so the pin is exact values, not shape.
    es = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        es + [(b, a) for a, b in es], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    out = {r["id"]: r["rank"] for r in pagerank(edges, iterations=6, teleport=seeds).collect()}

    adj = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3, 5], 5: [4]}
    t = {n: (1.0 if n == 1 else 0.0) for n in adj}
    r = dict(t)
    for _ in range(6):
        inc = {n: 0.0 for n in adj}
        for u, vs in adj.items():
            for v in vs:
                inc[v] += r[u] / len(vs)
        r = {n: 0.15 * t[n] + 0.85 * inc[n] for n in adj}
    for n in adj:
        assert abs(out[n] - r[n]) < 1e-12, n
    # distant nodes still rank far below the seed neighborhood
    assert out[5] < out[1] and out[4] < out[2]


def test_personalized_pagerank_rejects_unknown_seeds(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import pagerank
    import pytest

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "id long")
    with pytest.raises(ValueError):
        pagerank(edges, teleport=seeds)


def test_uniform_pagerank_unchanged_by_teleport_refactor(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    out = {r["id"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    # hand-rolled reference: r0 = 1/4 each, d=0.85
    import collections

    adj = {1: [2], 2: [3], 3: [1, 4]}
    r = {n: 0.25 for n in (1, 2, 3, 4)}
    for _ in range(3):
        nxt = collections.defaultdict(float)
        for u, vs in adj.items():
            for v in vs:
                nxt[v] += r[u] / len(vs)
        r = {n: 0.15 / 4 + 0.85 * nxt.get(n, 0.0) for n in (1, 2, 3, 4)}
    for n in r:
        assert abs(out[n] - r[n]) < 1e-12, n


def test_dbscan_roles_and_clusters(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        dbscan_from_pairs,
    )

    # dense blob {1,2,3,4} (complete) → all core at min_pts=3;
    # 5 touches only node 1 → border; 10-11 pair → too sparse, noise;
    # 99 isolated → noise.
    blob = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    pairs = spark.createDataFrame(
        blob + [(1, 5), (10, 11)], "id_a long, id_b long"
    )
    universe = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 10, 11, 99)], "id long"
    )
    out = {r["id"]: (r["role"], r["cluster"]) for r in
           dbscan_from_pairs(universe, pairs, min_pts=3).collect()}
    for n in (2, 3, 4):
        assert out[n] == ("core", 1)
    assert out[1] == ("core", 1)
    assert out[5] == ("border", 1)
    assert out[10] == ("noise", -1) and out[11] == ("noise", -1)
    assert out[99] == ("noise", -1)


def test_dbscan_border_attaches_to_min_cluster(spark):
    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        dbscan_from_pairs,
    )

    # two separate cores {1,2,3,4} and {20,21,22,23}; node 9 borders
    # BOTH → attaches to the minimum cluster id (1)
    b1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    b2 = [(a, b) for a in (20, 21, 22, 23) for b in (20, 21, 22, 23) if a < b]
    pairs = spark.createDataFrame(
        b1 + b2 + [(4, 9), (9, 20)], "id_a long, id_b long"
    )
    universe = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 9, 20, 21, 22, 23)], "id long"
    )
    out = {r["id"]: (r["role"], r["cluster"]) for r in
           dbscan_from_pairs(universe, pairs, min_pts=3).collect()}
    assert out[9] == ("border", 1)
    assert out[20] == ("core", 20) and out[23] == ("core", 20)


def test_dbscan_rejects_non_integral_ids(spark):
    """String ids would silently become NULL clusters under the
    BIGINT/-1 sentinel contract — must raise instead."""
    import pytest

    from aws_glue_jobs_incremental_database_etl_spark.operators.components import (
        dbscan_from_pairs,
    )

    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    universe = spark.createDataFrame([("a",), ("b",)], "id string")
    with pytest.raises(TypeError, match="integral"):
        dbscan_from_pairs(universe, pairs, min_pts=1)


def test_single_link_levels_nest(spark, sf_dir):
    """Dendrogram nesting invariant: every FINE cluster (higher
    threshold) must sit entirely inside one COARSE cluster — fine
    pairs are a subset of coarse pairs, so a fine cluster mapping to
    two coarse roots would be a correctness bug in components."""
    from aws_glue_jobs_incremental_database_etl_spark import registry

    out = registry.Q["single_link_hierarchy_embeddings"](spark, sf_dir)
    violations = (
        out.groupBy("cluster_fine")
        .agg(F.count_distinct("cluster_coarse").alias("n_coarse"))
        .filter(F.col("n_coarse") > 1)
        .count()
    )
    assert violations == 0
    # the coarse level must genuinely merge something at these taus
    stats = out.agg(
        F.count_distinct("cluster_fine"),
        F.count_distinct("cluster_coarse"),
    ).first()
    assert stats[1] < stats[0]
