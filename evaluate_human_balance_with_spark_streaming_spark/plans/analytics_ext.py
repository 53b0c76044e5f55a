"""Extended relational surface: set operations, multidimensional
aggregation (CUBE/pivot), temporal as-of join, exact percentiles,
skew-resistant two-phase aggregation, and corpus statistics.

These go beyond the reference (which has a single inner join and no
aggregations, SURVEY §2.5) to round out what a user of a general
analytics engine expects, each with a DuckDB oracle.

Scale notes: every query here either broadcasts its small side or
shuffles exactly once on its group/join key; the salted variant shows
the two-phase pattern for keys too hot for AQE alone.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register
from ..functions.text import SQL_WS, SQL_WS_TRIM_TEXT, WS, ws_trim


@register(
    "q_set_semantics_battery",
    oracle="""
        SELECT 'union' AS op, CAST(user_id AS VARCHAR) AS key, 1 AS n FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            UNION
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
        UNION ALL
        SELECT 'intersect' AS op, CAST(user_id AS VARCHAR) AS key, 1 AS n FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
        UNION ALL
        SELECT 'except' AS op, CAST(user_id AS VARCHAR) AS key, 1 AS n FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
        UNION ALL
        SELECT 'semi_discounted' AS op, o_orderpriority AS key, COUNT(*) AS n
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
        )
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'anti_returned' AS op, o_orderpriority AS key, COUNT(*) AS n
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
        )
        GROUP BY o_orderpriority
    """,
    tags=("set-op", "semi-join", "anti-join", "agg", "battery"),
)
def q_set_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set + existential semantics in one tagged battery (merged from
    round 2's q_set_ops_battery and q_exists_battery to stay under the
    driver's 50-row cap; both component plans intact).

    Set-op rows — all three ANSI set operations over the same two
    filtered scans: UNION DISTINCT (engaged users), INTERSECT DISTINCT
    (users in both populations), EXCEPT DISTINCT (clickers who never
    buy). One row per surviving user (key = user_id, n = 1 row weight);
    each op is one hash shuffle on the full row; Catalyst plans
    INTERSECT/EXCEPT as left-semi/left-anti aggregates — no row
    multiplication anywhere.

    Existential rows — EXISTS as a LEFT SEMI join (orders with a
    discounted line) and NOT EXISTS as a LEFT ANTI join (orders with no
    returned line), aggregated per priority (key = o_orderpriority,
    n = order count). Each shuffles once on the order key and never
    multiplies rows; the lineitem filters are pushed to its scan."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            F.col("user_id").cast("string").alias("key"),
            F.lit(1).cast("bigint").alias("n"),
        )

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    discounted = l.filter(F.col("l_discount") > 0.05).select("l_orderkey")
    returned = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")

    def exists_agg(keys: DataFrame, how: str, op: str) -> DataFrame:
        return (
            o.join(keys, o["o_orderkey"] == keys["l_orderkey"], how)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.lit(op).alias("op"),
                F.col("o_orderpriority").alias("key"),
                "n",
            )
        )

    return (
        tag(clicks.union(buys).distinct(), "union")
        .unionAll(tag(clicks.intersect(buys), "intersect"))
        .unionAll(tag(clicks.subtract(buys), "except"))
        .unionAll(exists_agg(discounted, "left_semi", "semi_discounted"))
        .unionAll(exists_agg(returned, "left_anti", "anti_returned"))
    )


@register(
    "q_grouping_sets_sales",
    oracle="""
        SELECT 'rollup' AS op,
               COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows,
               ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE, 4) AS total_qty,
               ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE, 4) AS total_price
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'cube' AS op,
               COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows,
               ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE, 4) AS total_qty,
               ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE, 4) AS total_price
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup", "cube", "battery"),
)
def q_grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP and CUBE over the same measures, tagged by op. The cube
    runs as ONE Expand + partial/final HashAggregate (one shuffle
    regardless of the number of grouping sets); the rollup branch is
    then DERIVED from the cube output — ROLLUP(a,b)'s grouping sets
    {(a,b),(a),()} are a subset of CUBE's, so its rows are the cube
    rows minus the (b)-only set. Each cube row EXPLODES into its
    applicable op tags (every row is 'cube'; in-rollup rows also emit
    'rollup') — no self-union, so the whole query is ONE fact scan +
    ONE Expand shuffle by construction (a union of two branches over
    the same aggregate defeats both cache lookup and exchange reuse
    after attribute deduplication — measured as two full scans)."""
    l = load_table(spark, sf_dir, "lineitem")
    cube = (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 4
            ).alias("total_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                4,
            ).alias("total_price"),
            # Real grouping-set indicators — classifying sets by the
            # coalesced 'ALL' label instead would misfile any source row
            # whose column VALUE is NULL or the literal 'ALL'.
            F.grouping("l_returnflag").alias("g_rf"),
            F.grouping("l_linestatus").alias("g_ls"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "total_qty",
            "total_price",
            "g_rf",
            "g_ls",
        )
    )
    # ROLLUP(a,b) = CUBE minus the (b)-only set, i.e. grouping(a)=1 AND
    # grouping(b)=0.
    in_rollup = ~((F.col("g_rf") == 1) & (F.col("g_ls") == 0))
    ops = F.when(
        in_rollup, F.array(F.lit("rollup"), F.lit("cube"))
    ).otherwise(F.array(F.lit("cube")))
    return cube.select(
        F.explode(ops).alias("op"),
        "returnflag",
        "linestatus",
        "n_rows",
        "total_qty",
        "total_price",
    )


@register(
    "q_pivot_segment_status",
    oracle="""
        SELECT c.c_mktsegment,
               CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
               CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
               CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    tags=("agg", "pivot"),
)
def q_pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (no discovery scan): order
    counts per market segment × order status. customer joins UNHINTED
    (it scales with SF — threshold/AQE broadcasts while it fits,
    shuffle join beyond; review finding)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("status_F"),
            F.coalesce("O", F.lit(0)).alias("status_O"),
            F.coalesce("P", F.lit(0)).alias("status_P"),
        )
    )


@register(
    "q_asof_click_before_purchase",
    oracle="""
        WITH cand AS (
            SELECT p.event_id AS purchase_id, c.ts, c.event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.event_id
                       ORDER BY c.ts DESC, c.event_id DESC
                   ) AS rn
            FROM events p
            JOIN events c
              ON c.user_id = p.user_id
             AND c.event_type = 'click'
             AND c.ts <= p.ts
            WHERE p.event_type = 'purchase'
        )
        SELECT purchase_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               event_id AS click_id
        FROM cand WHERE rn = 1
    """,
    tags=("join", "asof"),
)
def q_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join — click→purchase attribution: for each
    purchase, the same user's latest click at or before it. Spark
    lacks a native as-of join; the idiomatic composition is equi-join
    on the entity key + range predicate + row_number — one shuffle on
    the key, the range filter applied at the join. (At extreme
    fan-out, bucket the right side by coarse time first to bound
    candidates per probe row.)"""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cand = purchases.join(
        clicks,
        (F.col("c_user") == F.col("p_user")) & (F.col("c_ts") <= F.col("p_ts")),
    )
    # Window keyed (p_user, purchase_id), not purchase_id alone (r16,
    # guide §2.4 "remove shuffles outright"): purchase_id is a unique
    # event id that functionally determines p_user, so the groups are
    # identical — but the leading p_user key lets the Window reuse the
    # join's hash(user) partitioning instead of re-exchanging the
    # join's FAN-OUT output (the largest intermediate in this plan) by
    # purchase_id. At sf0.1 the join broadcasts and the plans are
    # shape-identical either way; the exchange elision is a
    # NON-BROADCAST-regime property, demonstrated by the committed
    # forced-SMJ explain (plans/r17/q_asof_click_before_purchase_
    # smj_regime.txt: no Exchange between SortMergeJoin (11) and
    # Window (15) — the Window's Sort rides hashpartitioning(p_user)).
    w = Window.partitionBy("p_user", "purchase_id").orderBy(
        F.col("c_ts").desc(), F.col("click_id").desc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            "click_id",
        )
    )


@register(
    "q_event_value_profile",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.9), 6) AS p90,
               ROUND(quantile_cont(value, 0.99), 6) AS p99,
               COUNT(*) AS n_events,
               ROUND(SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE, 4) AS total_value
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY event_type
    """,
    tags=("agg", "percentile", "skew", "battery"),
)
def q_event_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value profile (merged from round 2's
    q_exact_percentiles and q_salted_hot_key_agg to stay under the
    driver's 50-row cap; BOTH component plans survive intact and join
    on the 5-key group).

    Percentile side: exact linear-interpolation percentiles per group
    (Spark percentile ≡ DuckDB quantile_cont). The streaming/100 TB
    variant would use approx_percentile (t-digest) — approximate
    sketches can't be oracle-matched across engines, so the exact form
    is the correctness anchor.

    Salted side: two-phase salted aggregation over a low-cardinality
    hot key (event_type has ~5 values — at 100 TB each key is a hot
    partition). Phase 1 groups by (key, salt) spreading each key over
    16 reducers; phase 2 merges the 16 partials per key — identical to
    the direct group-by (the oracle); the plan shape is the point.
    Decimal partial sums keep the merge order-independent. The final
    5-row × 5-row join of the two aggregates broadcasts.

    Certified domain is explicit: both sides keep only non-null
    event_type. The join is null-UNSAFE (Spark would silently drop a
    NULL group the single-pass oracle GROUP BY keeps), so the filter
    is mirrored in the SQL — parity survives fixture regeneration
    instead of assuming the current fixtures' zero-null column."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    percentiles = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )
    salted = e.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
    )
    totals = partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("pv").cast("double"), 4).alias("total_value"),
    )
    return percentiles.join(F.broadcast(totals), "event_type")


@register(
    "q_text_top_words",
    oracle=f"""
        WITH words AS (
            SELECT unnest(regexp_split_to_array(lower({SQL_WS_TRIM_TEXT}), '{SQL_WS}+')) AS word
            FROM documents
        )
        SELECT word, COUNT(*) AS n
        FROM words
        GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT 20
    """,
    tags=("text", "agg"),
)
def q_text_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 words: explode → count → ordered limit with a
    word tiebreak. The explode fans out ~tokens× but the aggregate is
    map-side-combined before its single shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(ws_trim(F.lower(F.col("text"))), WS + "+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


@register(
    "q_embedding_stats",
    oracle="""
        SELECT label,
               COUNT(*) AS n_vectors,
               ROUND(MIN(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum'))), 6) AS min_norm,
               ROUND(MAX(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum'))), 6) AS max_norm
        FROM embeddings
        GROUP BY label
    """,
    tags=("similarity", "agg"),
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster vector statistics (count + norm range) — the sanity
    sweep run before any ANN indexing job. min/max of deterministic
    per-row norms are order-independent."""
    from ..functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "label", l2_norm(F.col("embedding").cast("array<double>")).alias("norm")
    )
    return with_norm.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
    )


@register(
    "q_session_window_stats",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts, event_id,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ),
        flagged AS (
            SELECT user_id, ts, event_id,
                   -- STRICT >: Spark's session_window merges an event
                   -- arriving at exactly gap seconds (window [t, t+gap)
                   -- touching counts as the same session; verified
                   -- empirically and pinned by unit test). >= here
                   -- would split exact-boundary sessions the engine
                   -- merges.
                   CASE WHEN prev_ts IS NULL
                             OR epoch(ts) - epoch(prev_ts) > 3600
                        THEN 1 ELSE 0 END AS new_session
            FROM seq
        ),
        numbered AS (
            SELECT user_id, ts,
                   -- event_id tiebreak matches the LAG ordering above:
                   -- without it, tied timestamps at a session boundary
                   -- could be summed in either order, splitting a
                   -- session nondeterministically.
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_id
    """,
    tags=("agg", "session-window"),
)
def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregation (1h inactivity gap): one row
    per (user, session) with start + event count. The oracle rebuilds
    sessions relationally (LAG + running sum), proving Spark's
    session-merge semantics — a new session starts iff the gap
    STRICTLY exceeds the duration (an exact-3600s gap merges; pinned
    by tests/test_operators.py::test_session_window_boundary_semantics)
    — against an independent derivation. The same
    groupBy(session_window(...)) runs streaming with a watermark."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "1 hour").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


@register(
    "q_json_props_extract",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
               CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               COUNT(*) AS n
        FROM events
        WHERE json_extract(props, '$.k') IS NOT NULL
        GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract a field from the JSON
    `props` string per row (get_json_object — no schema declaration
    needed for ad-hoc access) and aggregate. At scale this is the
    schema-on-read path for sparse/evolving attributes; promote hot
    fields to real columns when they stabilize."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("total_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q_user_activity_similarity",
    oracle="""
        WITH ud AS (
            SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        norms AS (
            SELECT user_id, sqrt(SUM(n * n)) AS norm FROM ud GROUP BY user_id
        ),
        dots AS (
            SELECT a.user_id AS user_a, b.user_id AS user_b,
                   SUM(a.n * b.n) AS dot
            FROM ud a JOIN ud b ON a.day = b.day AND a.user_id < b.user_id
            GROUP BY 1, 2
        ),
        sims AS (
            SELECT d.user_a, d.user_b,
                   ROUND(d.dot / (na.norm * nb.norm), 6) AS cosine
            FROM dots d
            JOIN norms na ON na.user_id = d.user_a
            JOIN norms nb ON nb.user_id = d.user_b
        )
        SELECT user_a, user_b, cosine FROM (
            SELECT user_a, user_b, cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_a
                       ORDER BY cosine DESC, user_b ASC) AS rn
            FROM sims
        ) WHERE rn <= 5
    """,
    tags=("similarity", "time-series"),
)
def q_user_activity_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search over daily activity profiles: each
    user is a sparse day→count vector; cosine similarity is computed
    RELATIONALLY — a self-join on the day key accumulates integer dot
    products (exact), norms come from per-user sums of squares (exact),
    and the single double division at the end is deterministic. This
    sparse-join formulation (vs materializing dense vectors) is how
    distributed time-series similarity scales: the shuffle is on the
    time key, pair cost is bounded by co-active days, not |users|².
    Output is over CANONICAL pairs (user_a < user_b): top-5 per user_a
    among its HIGHER-id neighbors, tiebroken by id — a pair-dedup'd
    similarity table (each pair scored once), not a full per-user
    neighbor list. A serving-shape top-k per user would union both
    pair orientations first; ann_bruteforce_topk is that shape.

    The day key is low-cardinality (~30 here), so a naive self-join on
    day alone caps parallelism at the number of distinct days and a
    popular day is one hot partition. The pair join is therefore
    GRID-BLOCKED (the standard triangle/blocked self-join): users hash
    into B buckets, every profile row is replicated to the B grid
    cells (i ≤ j) whose coordinates contain its bucket, and the join
    runs on (day, cell_i, cell_j) — each day spreads over
    B(B+1)/2 reducers at B× replication of the slim profile rows.
    A pair (u, v) with buckets bu ≠ bv shares exactly one cell
    (min(bu,bv), max(bu,bv)); same-bucket pairs would meet in all B of
    their common cells, so the diagonal is deduplicated by keeping
    only the (bu, bu) cell meeting. Compare work stays ~n²/day (the
    blocking redistributes, it doesn't prune); the finer refinement
    when activity allows is an hourly grain.

    B is chosen ADAPTIVELY from measured skew (grid_buckets_for):
    blocking is pure overhead when day-parallelism already saturates
    the reducers — measured on the ×4 user-replication stress
    (SCALING.md): the B=8 grid cost 262 s where the flat day join
    cost 60 s, because 30 uniform days ≈ 32 cores means the grid's
    B× replication shuffle and ~2-3× pair-row fan (off-diagonal
    double-meet + same-bucket B-fold meets) buy no redistribution at
    all. The flat join's GROWTH is worse (17.7× vs 8.0× wall on 4×
    data) — the grid is still the scale path; it just must engage
    only when the hottest day's pair-work share exceeds one
    reducer's fair share. The stats read is one tiny aggregate over
    the persisted slim profile (~#days rows — a deliberate,
    documented plan-build action of the same class as
    connected-components' convergence count, NOT a hidden physical
    planning of the full input).

    This registered form is EXACT. For corpora where the exact pair
    output is itself intractable (~(users/day)² rows — no blocking
    prunes output), user_activity_similarity exposes the ``day_top``
    candidate-bounding dial (per-day top-C actives; IVF-probe-style
    recall contract, stress-measured at 1.11-1.39× wall on 10× data
    where this exact form drowns a single box — SCALING.md r05)."""
    return user_activity_similarity(load_table(spark, sf_dir, "events"))


def measured_grid_buckets(profile: DataFrame) -> int:
    """Bucket count for the grid-blocked pair self-join, measured from
    the day-skew of ``profile`` — a (user_id, day, n) frame, normally
    the query's already-persisted slim profile table. One deliberate
    plan-build stats action (aggregate output is ~#days rows):
    hottest day's share of the Σ m² pair-work proxy × the session's
    reducer count → grid_buckets_for. Empty/degenerate input → 1 (the
    flat join). Split out of user_activity_similarity so the
    Spark-side plumbing (stats column access, conf lookup) is
    integration-testable on corpora where it must pick B > 1 — the
    registered query's own test-scale data always degenerates to
    B=1."""
    day_m2 = (
        profile.groupBy("day")
        .count()
        .select((F.col("count").cast("double") * F.col("count")).alias("m2"))
    )
    stats = day_m2.agg(F.max("m2").alias("mx"), F.sum("m2").alias("tot")).first()
    try:
        parallelism = int(
            profile.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (ValueError, TypeError):
        # Platforms that auto-tune the conf report a non-numeric value
        # (e.g. "auto"); fall back to the cluster's default parallelism
        # rather than crashing the plan build.
        parallelism = profile.sparkSession.sparkContext.defaultParallelism
    if stats is None or not stats["tot"]:
        return 1
    return grid_buckets_for(stats["mx"] / stats["tot"], parallelism)


def grid_buckets_for(
    hot_share: float, parallelism: int, cap: int = 64, slack: float = 1.5
) -> int:
    """Smallest bucket count B whose B(B+1)/2 grid cells give the
    hottest day its fair share of reducers: a day carrying
    ``hot_share`` of the total pair work (Σ m_d² proxy, m_d = profile
    rows on day d) deserves ``hot_share × parallelism`` reducers, and
    one day's pair work lands on B(B+1)/2 cells. ``slack`` keeps the
    grid OFF until the overflow is worth its price — blocking costs
    B× replication shuffle plus ~2-3× pair-row fan (measured 4.4×
    wall on the ×4 stress where it bought nothing), so a hot day must
    exceed its fair share by ≥1.5× before B grows. B=1 — the flat
    day-only join, zero replication — whenever distinct-day
    parallelism covers the load (uniform 30 days on 32 reducers →
    1.07 cells → B=1); a 50%-hot day on 32 reducers → B=5 (15
    cells); 30 uniform days on 8000 reducers (the 1000-executor
    shape) → B=19 (190 cells). Pure math, pinned without Spark by
    tests/test_plan_shapes.py."""
    cells = hot_share * parallelism
    b = 1
    while b < cap and b * (b + 1) / 2 * slack < cells:
        b += 1
    return b


def user_activity_similarity(
    e: DataFrame,
    buckets: int | None = None,
    top_k: int = 5,
    day_top: int | None = None,
    warn_below_busiest: bool = True,
) -> DataFrame:
    """The q_user_activity_similarity pipeline over a caller-supplied
    events frame (user_id, ts) — the seam the hypothesis property test
    drives with random corpora (tests/test_property_fuzz.py pins the
    grid-blocked pair join against a brute-force cosine top-k
    reference for B ∈ {1, 2, 3, 8}; the RESULT is B-invariant since
    dot products are integer sums). ``buckets=None`` selects B
    adaptively via grid_buckets_for from the measured hottest-day
    pair-work share; an explicit B pins the physical shape (tests,
    stress harness). Semantics documented on the registered query
    above.

    ``day_top`` is the OUTPUT-BOUNDING scale dial (VERDICT r04 item
    5): the exact pair join's work AND output are inherently
    ~(users-per-day)² — no blocking can prune them — which at the ×10
    replication stress is ~100M pairs and drowns a single box. With
    ``day_top=C``, each day contributes pair work only for its C
    most-active users (rank by n desc, user_id asc — deterministic),
    bounding per-day pair work to C² regardless of corpus growth: the
    same contract shape as IVF's probe count, a recall dial, NOT the
    exact query (dot contributions from days where either user ranks
    below C are dropped; norms stay exact over the full profile, so
    scored pairs carry their true denominators and cosine is an
    UNDERESTIMATE for truncated pairs). Exact whenever C ≥ the
    busiest day's active-user count — pinned by a unit test. The
    per-day rank is one window sort, linear-ish in profile rows; at
    extreme per-day cardinality pre-aggregate to a coarser user grain
    first. ``day_top=None`` (the registered query's form) is exact.

    A dialed call measures the busiest day's active count and WARNS
    when C falls below it (the measured-recall-collapse regime —
    VERDICT r06 item 5); ``warn_below_busiest=False`` skips the guard
    and its one-aggregate stats action for callers that knowingly
    sweep approximate C."""
    from pyspark.sql.window import Window

    from ..caching import managed_persist

    # Persist the slim (user, day, n) profile table: it feeds BOTH
    # sides of the day self-join plus the norm aggregate, and without
    # the barrier the events scan+aggregate runs three times (measured
    # 6.9s → 2.3s warm at sf0.1). At 100 TB this is the materialized
    # profile table the pair join reads.
    ud = managed_persist(
        e.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Norms are computed over the FULL profile before any day_top
    # pruning — approximate candidates, exact denominators.
    norms = ud.groupBy("user_id").agg(F.sqrt(F.sum(F.col("n") * F.col("n"))).alias("norm"))
    if day_top is not None:
        if day_top < 1:
            raise ValueError(f"day_top must be >= 1, got {day_top}")
        # Runtime recall guard (VERDICT r06 item 5): the measured
        # recall curve (scripts/day_top_recall.py, SCALING.md r06) is
        # MARGIN-DEPENDENT — on a dense uniform corpus exact-score
        # recall collapses to ~0.08 the moment C drops below the
        # busiest day's active-user count, so a caller must never get
        # that silently believing the dial bought ~0.9. The busiest-day
        # count is one tiny aggregate over the already-persisted slim
        # profile (~#days rows), the same deliberate plan-build stats
        # action class as measured_grid_buckets; C >= busiest day means
        # no pair was pruned anywhere and the result is exact (pinned
        # by a unit test), so the exact path stays silent.
        # ``warn_below_busiest=False`` skips the guard AND its stats
        # action — for callers that knowingly sweep approximate C
        # values (scripts/day_top_recall.py times the dialed call
        # end-to-end per C; the guard's extra job inside that timed
        # window would silently shift the recorded recall-curve walls
        # against the r06 protocol — review finding).
        busiest = 0
        if warn_below_busiest:
            busiest = (
                ud.groupBy("day")
                .count()
                .agg(F.max("count").alias("mx"))
                .first()["mx"]
                or 0
            )
        if day_top < busiest:
            warnings.warn(
                f"day_top={day_top} is below the busiest day's "
                f"{busiest} active users: candidate pruning is ACTIVE "
                "and recall is margin-dependent (measured near-zero "
                "exact-score recall on dense uniform corpora — "
                "SCALING.md r06 day_top curve). Raise day_top to >= "
                f"{busiest} for the exact result, or treat the output "
                "as an approximate candidate set.",
                stacklevel=2,
            )
        wd = Window.partitionBy("day").orderBy(
            F.col("n").desc(), F.col("user_id").asc()
        )
        ud = (
            ud.withColumn("_r", F.row_number().over(wd))
            .filter(F.col("_r") <= day_top)
            .drop("_r")
        )
    if buckets is None:
        buckets = measured_grid_buckets(ud)
    B = buckets  # user-hash buckets → B(B+1)/2 cells per day (36 at 8)
    grid = F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("g")
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(B)).cast("int")

    def gridded(side: str) -> DataFrame:
        return ud.select(
            F.col("user_id").alias(f"user_{side}"),
            "day",
            F.col("n").alias(f"n{side}"),
            bucket.alias(f"b{side}"),
        ).select(
            "*",
            grid,
        ).select(
            f"user_{side}",
            "day",
            f"n{side}",
            f"b{side}",
            F.least(f"b{side}", "g").alias("ci"),
            F.greatest(f"b{side}", "g").alias("cj"),
        )

    dots = (
        gridded("a")
        .join(gridded("b"), ["day", "ci", "cj"])
        .filter(F.col("user_a") < F.col("user_b"))
        # Diagonal dedup: same-bucket pairs meet in every cell that
        # contains their shared bucket — count only the (b, b) cell.
        .filter(
            (F.col("ba") != F.col("bb"))
            | ((F.col("ci") == F.col("ba")) & (F.col("cj") == F.col("ba")))
        )
        .groupBy("user_a", "user_b")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("dot"))
    )
    sims = (
        # Norm joins UNHINTED: norms has one row per user, which grows
        # with the corpus — threshold/AQE broadcasts while it fits and
        # falls back to a shuffle join at scale (review finding).
        dots.join(
            norms.select(F.col("user_id").alias("user_a"), F.col("norm").alias("norm_a")),
            "user_a",
        )
        .join(
            norms.select(F.col("user_id").alias("user_b"), F.col("norm").alias("norm_b")),
            "user_b",
        )
        .withColumn("cosine", F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6))
    )
    w = Window.partitionBy("user_a").orderBy(F.col("cosine").desc(), F.col("user_b").asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("user_a", "user_b", "cosine")
    )


@register(
    "q_ranking_battery",
    oracle="""
        SELECT user_id, event_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnum,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
               CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS prank,
               ROUND(CUME_DIST() OVER w, 6) AS cdist,
               FIRST_VALUE(event_id) OVER w AS first_event,
               LAG(event_id, 1, -1) OVER w AS prev_event
        FROM events
        WHERE user_id % 10 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
    """,
    tags=("window-function",),
)
def q_ranking_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full analytic ranking surface over one window spec:
    row_number, dense_rank, ntile, percent_rank, cume_dist, first_value,
    lag with default. One shuffle + one sort serves all seven functions
    (Spark computes same-spec window functions in a single Window
    operator). row_number + a filter is also the per-group top-k
    pattern."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("bigint").alias("rnum"),
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("event_id").over(w).alias("first_event"),
        F.lag("event_id", 1, -1).over(w).alias("prev_event"),
    )


@register(
    "q_price_band_classification",
    oracle="""
        WITH bands(band, lo, hi) AS (
            VALUES ('budget', 0.0, 20000.0),
                   ('mid', 20000.0, 60000.0),
                   ('premium', 60000.0, 1e12)
        )
        SELECT b.band, COUNT(*) AS n_orders,
               ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))::DOUBLE, 4) AS total_value
        FROM orders o
        JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.band
    """,
    tags=("range-join", "agg"),
)
def q_price_band_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join: each order lands in the band
    whose [lo, hi) contains its price. The band table is a broadcast
    literal, so the non-equi condition runs as a BroadcastNestedLoop
    over 3 rows — the right plan when one side is tiny; for two large
    interval sets, bucketize the ranges first (turns it back into an
    equi-join)."""
    o = load_table(spark, sf_dir, "orders")
    bands = o.sparkSession.createDataFrame(
        [("budget", 0.0, 20000.0), ("mid", 20000.0, 60000.0), ("premium", 60000.0, 1e12)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o["o_totalprice"] >= bands["lo"]) & (o["o_totalprice"] < bands["hi"]),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4
            ).alias("total_value"),
        )
    )
