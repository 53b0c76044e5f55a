"""Similarity search over embedding columns (array<float>).

Two strategies, same result contract (query_id, neighbor_id, cosine):

- ``brute_force_topk`` — exact: cross-join queries × corpus, cosine via
  JVM higher-order functions, per-query top-k with row_number. The
  query set is always the broadcast side; the corpus streams through,
  so the cost is one corpus scan per batch of queries. Correct at any
  scale, bounded by |Q| × |corpus| dot products.
- ``ivf_topk`` — the scale path: a coarse quantizer (centroids per
  partition cell — here per label; in production, k-means trained
  offline) assigns every corpus vector to a cell; each query probes
  its nearest cell(s) only. Candidate count drops by ~|cells|×, the
  join is cell-key equi-join (shuffle on short keys), and recall is
  tunable via n_probe.

All math is double-precision sequential folds (functions/vectors.py),
so the DuckDB oracle reproduces results bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import managed_persist
from ..plans.partitioning import ensure_min_partitions
from ..plans.registry import register
from ..sources.testdata import load_table

def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``queries`` must carry (id_col, vec_col); self-matches (same id)
    are excluded. Deterministic: ties broken by neighbor id.
    """
    from ..functions.vectors import dot_product, l2_norm

    # Precompute each side's L2 norm ONCE (persist = a hard barrier so
    # CollapseProject can't inline the norm fold into the per-pair
    # expression, where it would be re-evaluated |Q|× per corpus row).
    # The pair stage then runs a single higher-order fold (the dot
    # product) instead of three. Same IEEE operation order as the
    # inline form, so results are bit-identical. At 100 TB the corpus
    # norm column is materialized alongside the vectors.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", l2_norm(F.col("qv")))
    # |Q|×|corpus| interpreted dot products is the hot loop; a corpus
    # read from one small parquet file would run it on one core.
    c = managed_persist(
        ensure_min_partitions(corpus)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn("cn", l2_norm(F.col("cv")))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                # try_divide: a zero-norm (all-zero) vector must score
                # null, not throw ANSI DIVIDE_BY_ZERO (see vectors.py).
                F.try_divide(
                    dot_product(F.col("qv"), F.col("cv")),
                    F.col("qn") * F.col("cn"),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    k: int = 5,
    n_probe: int = 1,
) -> DataFrame:
    """IVF-style ANN: centroids = per-cell mean vectors; each query is
    assigned to its ``n_probe`` nearest centroids and searched only
    within those cells. The centroid table is tiny → broadcast twice
    (assignment + probe); the candidate join is an equi-join on cell.

    ``n_probe`` is the recall dial: candidates grow linearly with it
    while staying bounded (n_probe × avg cell size per query — never
    all-pairs); with n_probe = number of cells the result provably
    equals brute force (pinned by a unit test).

    Unlike brute_force_topk the corpus scan is NOT spread here (r16
    measured): IVF's per-row work before any shuffle is one light norm
    fold, its dot products are bounded to n_probe cells per query, and
    the centroid build parallelizes through its own exchanges — the
    round-robin spread of a small corpus bought nothing and cost a
    32-task shuffle + 32-block persist per stage (~0.3 s of pure task
    launch at bench scale). At cluster scale big files split naturally
    either way.

    r17 examined and REVERTED (measured, interleaved same-process A/B
    at sf0.1): collapsing the assignment's crossJoin+row_number Window
    into a one-row all-centroids broadcast with per-query
    transform + array_sort(comparator) + slice removed the Window's
    exchange+sort and one broadcast build, but ran ~6% SLOWER
    (old 0.75/0.73 s vs new 0.80/0.77 s for n_probe 1/2) — the
    interpreted comparator lambda and nested per-struct fold cost more
    than the tiny windowed shuffle they replaced, the same
    interpreted-HOF tax minhash_signatures documents. The oracle was
    green under both shapes; the Window form is kept.
    """
    from ..functions.vectors import dot_product, l2_norm

    c = managed_persist(
        corpus
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(cell_col).alias("cell"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn("cn", l2_norm(F.col("cv")))
    )
    # Per-cell mean vector in long form: posexplode → avg per (cell,
    # dim index) → reassemble ordered. Width-agnostic (no dim parameter
    # or driver-side sniff needed) and each generated codegen unit stays
    # narrow — a 64-column avg(getItem(i)) aggregate compiles a single
    # huge janino class whose JIT cost (~seconds) dwarfs the query at
    # bench scale and grows with dim; the long-form shuffle moves only
    # |corpus|×dim (cell, i, v) doubles and aggregates map-side first.
    # NB: double avg is partition-merge-order nondeterministic in its
    # last bits — on BOTH engines (DuckDB's parallel AVG too), so a
    # decimal-exact mean here would trade one nondeterminism for a
    # cross-engine rounding mismatch. Acceptable because centroids only
    # RANK cells (crank ties between near-equal centroid cosines are
    # the ~1e-16 coincidence case) and candidate cosines are rounded to
    # 6 digits; at production scale centroids come from offline k-means
    # anyway, making them plan constants.
    centroids = (
        c.select("cell", F.posexplode("cv").alias("i", "v"))
        .groupBy("cell", "i")
        .agg(F.avg("v").alias("m"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))),
                lambda s: s.getField("m"),
            ).alias("centroid")
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    # Assign each query to its n_probe nearest centroids
    # (deterministic tiebreak). Norms are HOISTED out of the per-pair
    # expression (review finding — the inline cosine_similarity
    # re-folded l2_norm(qv) once per (query, centroid) PAIR): qn is
    # projected once per query on the streamed side, ctn once per
    # centroid below the broadcast exchange (which materializes its
    # child before broadcasting) — |Q|+C folds instead of |Q|×C.
    # Projects don't collapse across the join boundary, so no persist
    # barrier is needed here; qn then rides along into the scored
    # stage instead of being re-folded per assigned row.
    assigned = (
        q.crossJoin(
            F.broadcast(
                centroids.withColumn("ctn", l2_norm(F.col("centroid")))
            )
        )
        .withColumn(
            "csim",
            F.try_divide(
                dot_product(F.col("qv"), F.col("centroid")),
                F.col("qn") * F.col("ctn"),
            ),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("csim").desc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )
    scored = (
        c.join(F.broadcast(assigned), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                # try_divide: a zero-norm (all-zero) vector must score
                # null, not throw ANSI DIVIDE_BY_ZERO (see vectors.py).
                F.try_divide(
                    dot_product(F.col("qv"), F.col("cv")),
                    F.col("qn") * F.col("cn"),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cell", "neighbor_id", "cosine", "rank")
    )


@register(
    "ann_bruteforce_topk",
    oracle="""
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id % 101 = 0
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(q.qv, c.embedding::DOUBLE[]), 6) AS cosine
            FROM q, embeddings c
            WHERE q.query_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
            SELECT query_id, neighbor_id, cosine,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= 5
    """,
    tags=("similarity", "ann"),
)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for every 101st vector (the
    deterministic query sample) against the full embeddings corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    return brute_force_topk(emb, queries, "embedding", "vec_id", k=5)


# One oracle template for every registered IVF variant — n_probe is
# the only thing that differs, so the recall dial is certified against
# the SAME relational derivation with only `crank <= n` changing.
_IVF_ORACLE = """
        WITH c AS (
            SELECT vec_id AS neighbor_id, label AS cell, embedding::DOUBLE[] AS cv
            FROM embeddings
        ),
        dim_means AS (
            SELECT cell, i, AVG(cv[i]) AS m
            FROM c, (SELECT unnest(range(1, 65)) AS i) idx
            GROUP BY cell, i
        ),
        centroids AS (
            SELECT cell, list(m ORDER BY i) AS centroid
            FROM dim_means
            GROUP BY cell
        ),
        q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id % 101 = 0
        ),
        assigned AS (
            SELECT query_id, qv, cell FROM (
                SELECT q.query_id, q.qv, ct.cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(q.qv, ct.centroid) DESC,
                                    ct.cell ASC) AS crank
                FROM q, centroids ct
            ) WHERE crank <= {n_probe}
        ),
        scored AS (
            SELECT a.query_id, c.cell, c.neighbor_id,
                   ROUND(list_cosine_similarity(a.qv, c.cv), 6) AS cosine
            FROM c JOIN assigned a ON c.cell = a.cell
            WHERE a.query_id <> c.neighbor_id
        )
        SELECT query_id, cell, neighbor_id, cosine, rank FROM (
            SELECT query_id, cell, neighbor_id, cosine,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= 5
    """


@register(
    "ann_ivf_topk",
    oracle=_IVF_ORACLE.format(n_probe=1),
    tags=("similarity", "ann", "ivf"),
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed top-5: per-label centroids as the coarse quantizer,
    n_probe=1 — the bounded-candidate scale path for ANN. The Spark
    side infers nothing about vector width (posexplode centroids);
    only the static oracle SQL pins the fixture's 64-dim width via its
    hardcoded range(1, 65) — a fixture-width change edits the oracle
    string, nothing else."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    return ivf_topk(emb, queries, "embedding", "vec_id", "label", k=5)


@register(
    "ann_ivf_probe2",
    oracle=_IVF_ORACLE.format(n_probe=2),
    tags=("similarity", "ann", "ivf", "recall-dial"),
)
def q_ann_ivf_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall dial under the driver's oracle: n_probe=2 searches
    each query's TWO nearest cells — candidates double (still bounded,
    never all-pairs) and recall rises toward brute force (exhaustive
    probe ≡ brute force is pinned by a unit test). Certifying a second
    point on the recall/cost curve is what makes IVF an ANN *index*
    rather than a partitioner; the oracle differs from ann_ivf_topk's
    only in `crank <= 2`."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    return ivf_topk(emb, queries, "embedding", "vec_id", "label", k=5, n_probe=2)
