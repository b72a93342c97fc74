"""Connected components over near-duplicate pair graphs.

One-pass LSH dedup (``dedup.minhash_dedup``) drops the larger id of
each PAIR, which under-deletes when duplicates chain (A~B, B~C, but
A!~C keeps both A and C's cluster-mates).  Cluster-level dedup first
resolves the pair graph into components, then keeps exactly one
representative per component — the standard last step of a corpus
dedup pipeline.

Algorithm: iterated min-label propagation to a fixpoint.  Each node's
label starts as its own id; every round each node takes the minimum
label in its closed neighborhood; converged when no label changes.
Rounds needed = graph diameter (near-dup clusters are tiny and
dense, so 2-4 rounds in practice); each round is one shuffle keyed on
node id.  ``localCheckpoint`` truncates the growing lineage each
round — without it the plan doubles per iteration and Catalyst
analysis dominates after ~10 rounds.

Scale notes (100 TB corpora): ``connected_components`` is the simple
propagation variant, O(rounds × |edges|) shuffle volume, the right
tool for near-dup graphs whose components are small.  For adversarial
diameters (million-node chains) ``connected_components_star``
implements the large-star/small-star decomposition [Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14] — same
DataFrame primitives, O(log n) rounds on any graph shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Resolve an undirected edge list into ``(id, component)`` where
    ``component`` is the minimum node id reachable from ``id``.

    Nodes appear in the output iff they appear in some edge; isolated
    nodes are the caller's identity mapping.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("u").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    for _ in range(max_iterations):
        # min label over the closed neighborhood: own label ∪ neighbors'
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if not changed:
            break
    sym.unpersist()
    return labels


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one representative per near-dup CLUSTER (transitive
    closure of ``pairs``): the minimum id of each component survives;
    rows in no pair survive untouched."""
    comp = connected_components(pairs, src, dst)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Alternating large-star / small-star connected components
    [Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14] — same output contract as :func:`connected_components`
    (``(id, component)``, component = min reachable id, nodes that
    appear in some edge), but converging in O(log n) rounds on ANY
    graph, including the million-node chains where plain min-label
    propagation needs diameter rounds.

    Each round is two phases over the (bidirectional) edge list:

    - **large-star**: every node u computes m = min({u} ∪ N(u)) and
      reconnects its strictly-larger neighbors to m;
    - **small-star**: u computes m over {u} ∪ {v ∈ N(u): v ≤ u} and
      reconnects those smaller-or-equal neighbors (and itself) to m.

    Both phases are partial-aggregated groupBy + join — no windows,
    no driver state; ``localCheckpoint`` truncates lineage per round.
    Converged when the edge multiset stops changing; the final graph
    is a forest of stars pointing at each component's minimum id.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _bidir(g: DataFrame) -> DataFrame:
        return g.unionByName(
            g.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    for _ in range(max_iterations):
        # large-star: m = min over {u} ∪ N(u); edges (v, m) for v > u
        nb = _bidir(e)
        mins = nb.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            nb.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: m over {u} ∪ {v ≤ u}; edges (v, m) and (u, m)
        small_nb = nb.filter(F.col("v") <= F.col("u"))
        mins_s = small_nb.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        small = (
            small_nb.join(mins_s, "u")
            .select(
                F.col("v").alias("n"), F.col("u").alias("self"), "m"
            )
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("n").alias("u"), F.col("m").alias("v")),
                        F.struct(
                            F.col("self").alias("u"), F.col("m").alias("v")
                        ),
                    )
                ).alias("p")
            )
            .select("p.u", "p.v")
        )
        new_e = (
            large.unionByName(small)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            new_e.exceptAll(e).limit(1).count()
            + e.exceptAll(new_e).limit(1).count()
        )
        e = new_e
        if not changed:
            break
    stars = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return all_nodes.join(stars, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a directed edge list → ``(id, rank)``.

    The simplified formulation: ``r' = (1−d)/N + d·Σ r(u)/outdeg(u)``
    over in-neighbors, dangling mass NOT redistributed (a node with no
    out-edges leaks its damped mass — the common simplification; both
    the operator and its SQL oracle use it, so they agree exactly).

    Per iteration: one shuffle join of the edge list against the
    current ranks on the source key + one aggregate keyed by
    destination — O(iterations × |edges|) shuffle volume, the same
    cost shape as the MapReduce formulation.  The edge list is
    pre-joined with out-degrees ONCE and persisted (it never changes);
    ``localCheckpoint`` every ``checkpoint_every`` rounds truncates
    the growing plan lineage, exactly as ``connected_components``
    does.  Node ids may be any orderable type; rank sums are doubles
    (round on output when comparing across engines).
    """
    if not 0 < damping < 1:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    checkpoint_every = max(int(checkpoint_every or 0), 0)  # 0/None → never
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    nodes = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # scalar: the teleport term is a literal
    outdeg = e.groupBy("u").agg(F.count(F.lit(1)).alias("_deg"))
    e_deg = e.join(outdeg, "u").persist()

    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        contribs = (
            e_deg.join(ranks, e_deg.u == ranks.id)
            .select("v", (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("v")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, nodes.id == contribs.v, "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("_in", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (
            checkpoint_every
            and (i + 1) % checkpoint_every == 0
            and i + 1 < iterations
        ):
            ranks = ranks.localCheckpoint()
    # materialize the result, then release the per-call caches — a
    # long-lived session calling pagerank repeatedly must not pin a
    # fresh copy of the edge list in storage memory per call (same
    # convention as connected_components)
    ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    e_deg.unpersist()
    return ranks
