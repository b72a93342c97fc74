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

Scale notes (100 TB corpora): this is the simple propagation variant,
O(rounds × |edges|) shuffle volume, the right tool for near-dup
graphs whose components are small.  For adversarial diameters
(million-node chains) use the large-star/small-star decomposition
[Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14] — same DataFrame primitives, alternating two asymmetric
propagation steps; the public algorithm drops in here unchanged.
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
