"""Deterministic hash-based sampling and dataset splits.

Training-data pipelines need splits with properties ``df.sample``
(seeded RNG, partition-order dependent) cannot give:

- a row's assignment NEVER changes as the corpus grows or files are
  rewritten/repartitioned — train/test contamination can't creep in
  across incremental runs;
- the assignment is reproducible across engines and languages — the
  md5 hex digest of the key is the contract (same choice the
  reference makes for its job sharding, ``jdbc_incremental.py:
  319-325``; see ``sharding.py`` for the table-level twin).

Mechanics: bucket = first 8 md5 hex digits of the key as an integer,
mod ``buckets`` (md5's avalanche makes the high 32 bits uniform, so
bucket/buckets is a uniform [0,1) draw per key).  All JVM-side
Catalyst expressions — no UDF, no shuffle; the split column is a
map-stage projection.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_BUCKETS = 10_000


def hash_bucket(key: Column | str, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Deterministic uniform bucket in ``[0, buckets)`` from a key."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float],
    buckets: int = DEFAULT_BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a stable split label (e.g. ``{"train": .8,
    "val": .1, "test": .1}``) keyed on ``key_col``.

    Fractions must sum to 1; thresholds are cumulative in mapping
    order, so the same mapping always yields the same assignment.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    b = hash_bucket(key_col, buckets)
    expr: Column | None = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = b < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, last)


def stratified_sample_k(
    df: DataFrame,
    strata: Sequence[str],
    key_col: str,
    k: int,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by md5
    order of the key — a deterministic per-group reservoir ("k docs
    per language" for a balanced eval set).  The md5 hex string is the
    sort key (tie-broken by the key itself), so the selection is
    engine-portable and stable across reruns, unlike ``sampleBy``
    whose seeded RNG depends on partition layout.

    One window shuffle keyed on the strata; each group's state is a
    running counter, not a buffer."""
    if k < 1:
        raise ValueError("k must be >= 1")
    c = F.col(key_col)
    w = Window.partitionBy(*[F.col(s) for s in strata]).orderBy(
        F.md5(c.cast("string")), c
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Stable ~``fraction`` sample: keeps exactly the rows whose key
    bucket falls below the threshold — repeatable across runs, engines,
    and any repartitioning, and monotone in ``fraction`` (a 1% sample
    is a subset of a 10% sample)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_bucket(key_col, buckets) < int(round(fraction * buckets)))


def mixture_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    target_shares: Mapping[str, float],
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Downsample groups so the surviving corpus matches a target
    mixture — the data-mixture step of training-set assembly ("30%
    web, 30% code, ...").

    Solves for the largest corpus achievable WITHOUT upsampling: the
    binding group is the one whose relative share must shrink least
    (min over groups of count/share); every group g then keeps
    ``rate_g = binding · share_g / count_g`` of its rows, applied as
    the same md5-bucket predicate as :func:`deterministic_sample` —
    stable under growth, engine-portable, no RNG.

    Group counts come from one partial-aggregated count (rows ≪
    corpus, broadcast back as a literal CASE); the resample itself is
    a map-only filter, so the whole operator adds ZERO data-side
    shuffles.  Groups absent from ``target_shares`` are dropped
    (share 0).  Shares need not sum to 1 — only ratios matter.
    """
    if not target_shares:
        raise ValueError("target_shares must be non-empty")
    if any(s < 0 for s in target_shares.values()):
        raise ValueError("target shares must be >= 0")
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total_share = sum(target_shares.values())
    binding = min(
        (counts.get(g, 0) / (s / total_share) for g, s in target_shares.items() if s > 0),
        default=0.0,
    )
    b = hash_bucket(key_col, buckets)
    expr = None
    for g, s in target_shares.items():
        n = counts.get(g, 0)
        rate = 0.0 if n == 0 or s == 0 else min(1.0, binding * (s / total_share) / n)
        # floor, not round(): identical IEEE double sequence is
        # reproducible in any engine's SQL (FLOOR), Python's banker's
        # rounding is not
        cond = (F.col(group_col) == g) & (b < int(rate * buckets))
        expr = cond if expr is None else expr | cond
    return df.filter(expr)


def temperature_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Temperature-smoothed source mixture (the multilingual sampling
    law of XLM-R / mT5, Conneau et al. 2020 §3: sample source ``g``
    with probability ``p_g ∝ (n_g/N)^alpha``): flattens the observed
    source distribution toward uniform as ``alpha → 0``, keeps it at
    ``alpha = 1``.  Downsamples only (no upsampling): the binding
    group is the one whose relative share must shrink least, every
    group keeps ``rate_g = binding · share_g / n_g`` of its rows via
    the same md5-bucket predicate as :func:`deterministic_sample` —
    growth-stable, engine-portable, no RNG.

    Cost shape is :func:`mixture_resample`'s: one partial-aggregated
    group count (rows ≪ corpus, collected bounded by source
    cardinality), then a map-only filter — zero data-side shuffles.

    ``alpha=0.5`` (the default and the gate setting) computes shares
    with ``sqrt``, which IEEE 754 requires to be correctly rounded —
    so the SQL twin (``SQRT``) is bit-exact by construction.  Other
    alphas use ``pow``, whose last-ulp behavior is libm-specific;
    cross-engine replays at the bucket floor boundary may then differ
    by one key in pathological cases.
    """
    import math

    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    counts = sorted(
        (r["g"], r["n"])
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["g"] is not None
    )
    total = sum(n for _, n in counts)
    if total == 0:
        return df.filter(F.lit(False))

    def share(n: int) -> float:
        frac = n / total
        return math.sqrt(frac) if alpha == 0.5 else frac**alpha

    binding = min(n / share(n) for _, n in counts if n > 0)
    b = hash_bucket(key_col, buckets)
    expr = None
    for g, n in counts:
        thr = int(math.floor(min(1.0, binding * share(n) / n) * buckets))
        cond = (F.col(group_col) == g) & (b < thr)
        expr = cond if expr is None else expr | cond
    return df.filter(expr)


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of ``k`` rows —
    inclusion probability proportional to ``weight_col`` — via the
    Efraimidis–Spirakis A-ES key: rank rows by ``ln(u) / w`` descending
    (``u`` a per-key uniform (0,1) draw) and keep the top ``k``; for
    w > 0 this order is equivalent to the textbook ``u^(1/w)`` and
    numerically tamer.  The distributed form of weighted reservoir
    sampling: a map-only projection + ``TakeOrderedAndProject``
    (per-partition top-k heaps), no shuffle, no global sort — the same
    plan at 100 TB.

    Determinism: ``u`` derives from the md5-bucket contract
    (``hash_bucket``), so the chosen sample is a pure function of keys
    and weights — stable across runs, file layouts, and engines (the
    oracle gate replays the identical arithmetic in SQL).  Rows with
    weight <= 0 or NULL are excluded (zero mass).  Ties (same key AND
    weight → same A-ES key) break by ``key_col`` for a total order.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    # (bucket + 1) / (B + 1) ∈ (0, 1]: ln of it is finite; u == 1 →
    # ln(u) = 0 is the best possible draw, which is fine
    u = (hash_bucket(F.col(key_col)) + 1) / F.lit(float(DEFAULT_BUCKETS + 1))
    out = (
        df.filter(w > 0)
        .withColumn("_aes", F.log(u) / w)
        .orderBy(F.col("_aes").desc(), F.col(key_col).asc())
        .limit(k)
    )
    return out.drop("_aes") if id_cols is None else out.select(*id_cols)


def weighted_sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    weight_col: str,
    key_col: str,
) -> DataFrame:
    """Per-group weighted sample without replacement: ``min(k, |g|)``
    rows per group, inclusion probability ∝ weight within each group —
    the grouped twin of :func:`weighted_sample_k` (per-source quotas
    weighted by document quality, per-language eval picks weighted by
    length).  Same A-ES key (``ln(u)/w`` over the md5 uniform), ranked
    by a window per group instead of a global top-k: ONE shuffle keyed
    on the group, the same cost shape as ``stratified_sample_k``.
    Zero/negative/NULL weights are excluded before ranking.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    u = (hash_bucket(F.col(key_col)) + 1) / F.lit(float(DEFAULT_BUCKETS + 1))
    win = Window.partitionBy(group_col).orderBy(
        (F.log(u) / w).desc(), F.col(key_col).asc()
    )
    return (
        df.filter(w > 0)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str | int = 0,
    n_shards: int = 16,
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic epoch shuffle: a reproducible pseudo-random total
    order over the corpus (md5 of ``seed:id``), split into
    ``n_shards`` equal shards — how a training run materializes
    "shuffle the dataset differently each epoch" as a pure, replayable
    transformation (new seed ⇒ new permutation; same seed ⇒ the same
    byte order on every rerun/retry, which random() can't promise).

    The global ranking uses profile.exact_ntile's two-level
    construction — coarse range placement + per-bucket row_number —
    so no single-partition sort appears at any size; the shuffle key
    is the engine-portable 60-bit md5 (same contract as
    functions.bloom), making shard assignment oracle-checkable.
    """
    from .profile import exact_ntile

    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    with_key = df.withColumn("_shuffle_key", key)
    return exact_ntile(
        with_key,
        n_shards,
        "_shuffle_key",
        id_col,
        bucket_col=shard_col,
    )


def pareto_frontier_2d(
    df: DataFrame,
    max_col: str,
    min_col: str,
) -> DataFrame:
    """2-D Pareto frontier (skyline): rows not dominated by any other
    row, where r' dominates r iff ``r'.max_col ≥ r.max_col`` and
    ``r'.min_col ≤ r.min_col`` with at least one strict — the
    multi-objective selection primitive ("highest quality at the
    shortest length") that a naive NOT EXISTS self-join computes in
    O(n²).

    O(n log n) distributed shape instead: collapse to the best
    (minimum) ``min_col`` per distinct ``max_col`` (one hash agg —
    under domination equal-``max_col`` rows with larger ``min_col``
    are always dominated, and ties on BOTH coordinates are kept as
    duplicates via a count), then a running exclusive minimum over
    strictly greater ``max_col`` values: a survivor is a row whose
    ``min_col`` beats every better-``max_col`` row's best.  The
    window runs over the DISTINCT-``max_col`` table — corpus-sized
    only when the maximize coordinate is unique, in which case sort
    by it (one range shuffle), never all-pairs.

    Returns the surviving ``(max_col, min_col, n_rows)`` frontier
    points, ``n_rows`` counting coordinate-tied duplicates.

    The running minimum uses the exact_ntile two-level construction —
    coarse ``max_col`` range buckets from ``approxQuantile``
    (placement only; exactness never depends on the sketch), a
    bucket-PARTITIONED exclusive cummin window, and ≤ 32 driver
    scalars of cross-bucket suffix minima folded back as a literal
    map — so no ``Exchange SinglePartition`` appears at any size.
    """
    mx, mn = F.col(max_col), F.col(min_col)
    best = df.groupBy(mx.alias("_mx")).agg(F.min(mn).alias("_mn"))
    # only rows AT the per-maxcol best min survive candidacy; count them
    cand = (
        df.join(
            best,
            (mx == F.col("_mx")) & (mn == F.col("_mn")),
        )
        .groupBy("_mx", "_mn")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    coarse_buckets = 32
    probs = [i / coarse_buckets for i in range(1, coarse_buckets)]
    cuts = df.approxQuantile(max_col, probs, 1e-3)
    bucket = F.lit(0)
    for t in cuts:
        bucket = bucket + F.when(F.col("_mx") > t, 1).otherwise(0)
    cand = cand.withColumn("_pb", bucket)
    # per-bucket minima → driver (≤ coarse_buckets scalars, bounded
    # by construction) → suffix minima over STRICTLY higher buckets
    mins = dict(
        cand.groupBy("_pb").agg(F.min("_mn").alias("m")).collect()
    )
    suffix: dict[int, object] = {}
    acc = None
    for pb in sorted(mins, reverse=True):
        suffix[pb] = acc  # min over buckets with larger _mx
        acc = mins[pb] if acc is None else min(acc, mins[pb])
    if not mins:
        return cand.select(
            F.col("_mx").alias(max_col), F.col("_mn").alias(min_col), "n_rows"
        )
    hi = F.create_map(
        *[
            F.lit(x)
            for pb, v in sorted(suffix.items())
            if v is not None
            for x in (pb, v)
        ]
    ) if any(v is not None for v in suffix.values()) else None
    w = Window.partitionBy("_pb").orderBy(F.col("_mx").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = F.min("_mn").over(w)
    cross = (
        F.element_at(hi, F.col("_pb")) if hi is not None else F.lit(None)
    )
    cummin = F.least(
        F.coalesce(local, cross), F.coalesce(cross, local)
    )
    return (
        cand.withColumn("_cummin", cummin)
        .filter(F.col("_cummin").isNull() | (F.col("_mn") < F.col("_cummin")))
        .select(
            F.col("_mx").alias(max_col),
            F.col("_mn").alias(min_col),
            "n_rows",
        )
    )


def select_token_budget(
    df: DataFrame,
    id_col: str,
    score_col: str,
    tokens_col: str,
    budget: int,
    coarse_buckets: int = 32,
) -> DataFrame:
    """Budget-constrained greedy selection: take documents in
    descending ``score_col`` order (ties by ``id_col``) until the
    running sum of ``tokens_col`` would exceed ``budget`` — the
    "best corpus that fits N tokens" curation step after quality
    scoring.  Returns the selected ``(id, score, tokens, cum_tokens)``
    rows; a document is kept iff its INCLUSIVE running total ≤ budget
    (greedy prefix, no partial documents).

    The global ordered cumsum uses the bucketed two-pass shape
    (pack_sequences / exact_ntile): coarse score-range buckets from
    ``approxQuantile`` (placement only), per-bucket token cumsums
    under a bucket-PARTITIONED window, per-bucket totals to the
    driver (≤ ``coarse_buckets`` scalars) folded back as literal
    offsets — no single-partition sort at any size.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    sc, tk = F.col(score_col), F.col(tokens_col).cast("long")
    probs = [i / coarse_buckets for i in range(1, coarse_buckets)]
    cuts = df.approxQuantile(score_col, probs, 1e-3)
    # bucket 0 = highest scores (selection order)
    b = F.lit(0)
    for t in cuts:
        b = b + F.when(sc <= t, 1).otherwise(0)
    staged = df.select(
        F.col(id_col).alias("id"),
        sc.alias("score"),
        tk.alias("tokens"),
        b.alias("_pb"),
    )
    w = (
        Window.partitionBy("_pb")
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = staged.withColumn("_cum_local", F.sum("tokens").over(w))
    sums = dict(
        staged.groupBy("_pb").agg(F.sum("tokens").alias("s")).collect()
    )
    offsets, acc = {}, 0
    for pb in sorted(sums):
        offsets[pb] = acc
        acc += sums[pb]
    if not offsets:
        return staged.select("id", "score", "tokens", tk.alias("cum_tokens"))
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        ),
        F.col("_pb"),
    )
    return (
        local.withColumn("cum_tokens", (off + F.col("_cum_local")).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select("id", "score", "tokens", "cum_tokens")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    splits: Mapping[str, float],
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
    split_col: str = "split",
) -> DataFrame:
    """Near-dup-aware train/val/test assignment: rows are split by
    their near-duplicate COMPONENT root, not by their own id, so two
    near-duplicate documents can never land on opposite sides of a
    split — the leakage failure mode a plain per-document hash split
    silently permits (a test document's twin in train inflates eval).

    ``pairs`` is any near-dup pair frame (MinHash/SimHash/embedding);
    components resolve transitively via
    :func:`..components.connected_components`, singletons keep their
    own id as the root, and the md5-bucket split contract
    (:func:`hash_split`) applies to the ROOT — deterministic, growth-
    stable, engine-portable.  Returns ``(id, split_key, split)``.

    Cost: the component resolution (O(log n) label-propagation rounds
    over the pair graph — pairs only, never the corpus) + one
    broadcastable join of the component map + the map-only split
    projection."""
    from .components import connected_components

    comp = connected_components(pairs, pair_cols[0], pair_cols[1]).select(
        F.col("id").alias("_cid"), F.col("component").alias("_root")
    )
    base = df.select(F.col(id_col).alias("id")).join(
        comp, F.col("id") == F.col("_cid"), "left"
    )
    keyed = base.select(
        "id", F.coalesce("_root", F.col("id")).alias("split_key")
    )
    return hash_split(keyed, "split_key", splits, split_col=split_col)


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    md5-bucket(key) mod k — the same engine-portable contract as
    :func:`hash_split`, so a row's fold never changes as the corpus
    grows, is repartitioned, or is recomputed in another engine, and
    training fold i's complement is exactly the other k−1 folds (the
    property seeded-RNG assignment cannot give an incremental
    pipeline).  Map-only projection; no shuffle."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(fold_col, hash_bucket(key_col, k).cast("int"))


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    score: Column,
    id_col: str,
    rank_col: str = "domain_rank",
) -> DataFrame:
    """Per-domain document cap — the Common-Crawl curation rule that
    stops one domain from dominating the corpus: keep the top ``cap``
    rows per ``domain_col`` by ``score`` (descending, ``id_col``
    ascending tie-break), annotated with their within-domain rank.

    Scale shape: ONE window partitioned by domain — the shuffle is
    keyed on the domain, each partition ranks only its own rows, and
    there is no global sort; skewed mega-domains are exactly the rows
    the cap discards, so the skew bounds itself at ``cap`` survivors
    per key."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(domain_col).orderBy(
        score.desc(), F.col(id_col).asc()
    )
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= cap
    )
