"""Relational/analytic operators over the TPC-H-ish testdata tables.

These exercise the engine surfaces the extraction job leans on — hash
aggregation with map-side combine, broadcast joins, window functions, and
session (gap-break) windows, which are the analytic twins of the builder's
geometry heuristics (`_resolve_sub_lines` gap-split == sessionize;
`resolve_enclosing_bbox` == min/max group fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F  # noqa: N812

from ..io.sources import scan_parallel

SESSION_GAP_MIN = 30


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (group agg with partial aggregation)."""
    li = scan_parallel(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    # accumulate in DECIMAL: decimal addition is exact and order-independent,
    # so the result is bit-identical across engines and partitionings
    # (double sums over ~60k rows carry order-dependent rounding error that
    # can flip the last rounded digit between Spark and the oracle)
    dec = "decimal(28,6)"
    qty = F.col("l_quantity").cast(dec)
    price = F.col("l_extendedprice").cast(dec)
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            # avg = exact decimal sum (as double) / count: one IEEE division,
            # bit-identical in any engine
            F.round(F.sum(qty).cast("double") / F.count("*"), 6).alias("avg_qty"),
            F.round(F.sum(F.col("l_discount").cast(dec)).cast("double") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by customer nation: fact table joined to two broadcast dims."""
    orders = scan_parallel(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-break sessionization: a new session starts when the time since
    the user's previous event exceeds SESSION_GAP_MIN minutes — the exact
    window-function analogue of the builder's sub-line gap split."""
    ev = scan_parallel(spark.read.parquet(f"{sf_dir}/events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap computed with timestampdiff on the NTZ values directly: immune to
    # the session timezone (an LTZ epoch round-trip would shift across DST
    # boundaries under a non-UTC driver session)
    with_prev = ev.withColumn("prev_ts", F.lag("ts").over(w))
    # truncate to whole seconds before differencing: Spark's timestampdiff
    # floors the exact microsecond delta while SQL date_diff('second')
    # counts boundary crossings — truncation makes them identical
    gap = F.expr("timestampdiff(SECOND, date_trunc('second', prev_ts), date_trunc('second', ts))")
    with_break = with_prev.withColumn(
        "is_break", F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    ).drop("prev_ts")
    sessions = with_break.withColumn(
        "session_id", F.sum("is_break").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


def events_topk(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k events per user by value (window row_number)."""
    ev = scan_parallel(spark.read.parquet(f"{sf_dir}/events.parquet"))
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("user_id", "event_id", "value", "rank")
    )


def bbox_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`resolve_enclosing_bbox` as a Spark aggregation
    (`doctr/utils/geometry.py:128-147`): synthetic boxes derived
    deterministically from events, folded to the per-user enclosing box."""
    ev = scan_parallel(spark.read.parquet(f"{sf_dir}/events.parquet"))
    x0 = (F.col("event_id") * 37 % 1000) / 1000.0
    y0 = (F.col("event_id") * 73 % 1000) / 1000.0
    boxes = ev.select(
        "user_id",
        x0.alias("x0"),
        y0.alias("y0"),
        (x0 + 0.05).alias("x1"),
        (y0 + 0.02).alias("y1"),
    )
    return boxes.groupBy("user_id").agg(
        F.min("x0").alias("xmin"),
        F.min("y0").alias("ymin"),
        F.max("x1").alias("xmax"),
        F.max("y1").alias("ymax"),
        F.count("*").cast("long").alias("n_boxes"),
    )


def aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation surface in one driver slot: the TPC-H Q1-style pricing
    summary (:func:`pricing_summary`) and the enclosing-bbox fold
    (:func:`bbox_aggregate`) union-tagged into a null-padded common schema
    (the driver caps correctness rows at 50 queries, so independent
    operators share a slot without losing their per-value hash check)."""
    nd = F.lit(None).cast("double")
    p = pricing_summary(spark, sf_dir).select(
        F.lit("pricing").alias("part"),
        F.col("l_returnflag").alias("key1"),
        F.col("l_linestatus").alias("key2"),
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "avg_qty",
        "avg_disc",
        F.col("count_order").alias("n_rows"),
        nd.alias("xmin"),
        nd.alias("ymin"),
        nd.alias("xmax"),
        nd.alias("ymax"),
    )
    b = bbox_aggregate(spark, sf_dir).select(
        F.lit("bbox").alias("part"),
        F.col("user_id").cast("string").alias("key1"),
        F.lit(None).cast("string").alias("key2"),
        nd.alias("sum_qty"),
        nd.alias("sum_base_price"),
        nd.alias("sum_disc_price"),
        nd.alias("avg_qty"),
        nd.alias("avg_disc"),
        F.col("n_boxes").alias("n_rows"),
        "xmin",
        "ymin",
        "xmax",
        "ymax",
    )
    return p.unionByName(b)


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking surface in one driver slot: revenue-by-nation over two
    broadcast dims (:func:`top_customers`) and per-user window top-k
    (:func:`events_topk`), union-tagged the same way as :func:`aggregates`."""
    tc = top_customers(spark, sf_dir).select(
        F.lit("customers").alias("part"),
        F.col("n_name").alias("grp"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("revenue").alias("val"),
        F.col("n_orders").alias("rnk"),
    )
    tk = events_topk(spark, sf_dir).select(
        F.lit("events").alias("part"),
        F.col("user_id").cast("string").alias("grp"),
        "event_id",
        F.col("value").alias("val"),
        F.col("rank").cast("long").alias("rnk"),
    )
    return tc.unionByName(tk)


ORACLES: dict[str, str] = {
    "rel_pricing_summary": """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity::DECIMAL(28,6))::DOUBLE AS sum_qty,
           sum(l_extendedprice::DECIMAL(28,6))::DOUBLE AS sum_base_price,
           sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,6))::DOUBLE AS sum_disc_price,
           round(sum(l_quantity::DECIMAL(28,6))::DOUBLE / count(*), 6) AS avg_qty,
           round(sum(l_discount::DECIMAL(28,6))::DOUBLE / count(*), 6) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "rel_top_customers": """
    SELECT n_name, sum(o_totalprice::DECIMAL(28,6))::DOUBLE AS revenue, count(*)::BIGINT AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "rel_events_sessionize": f"""
    WITH g AS (
        SELECT user_id, event_id, value, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN * 60}
                    THEN 1 ELSE 0 END AS is_break
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, value,
               sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM g
    )
    SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events,
           sum(value::DECIMAL(28,6))::DOUBLE AS session_value
    FROM s GROUP BY user_id, session_id
    """,
    "rel_events_topk": """
    SELECT user_id, event_id, value, rank::INT AS rank FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rank
        FROM events
    ) WHERE rank <= 3
    """,
    "rel_bbox_aggregate": """
    WITH b AS (
        SELECT user_id,
               (event_id * 37 % 1000) / 1000.0 AS x0,
               (event_id * 73 % 1000) / 1000.0 AS y0
        FROM events
    )
    SELECT user_id, min(x0) AS xmin, min(y0) AS ymin,
           max(x0 + 0.05) AS xmax, max(y0 + 0.02) AS ymax,
           count(*)::BIGINT AS n_boxes
    FROM b GROUP BY user_id
    """,
}

# the driver records correctness rows for at most 50 queries, so the four
# standalone relational oracles pair up into two union-tagged slots; the
# underlying SQL is reused verbatim as subqueries
_PRICING_SQL = ORACLES.pop("rel_pricing_summary")
_TOPCUST_SQL = ORACLES.pop("rel_top_customers")
_EVENTS_TOPK_SQL = ORACLES.pop("rel_events_topk")
_BBOX_SQL = ORACLES.pop("rel_bbox_aggregate")

ORACLES["rel_aggregates"] = f"""
SELECT 'pricing' AS part, l_returnflag AS key1, l_linestatus AS key2,
       sum_qty, sum_base_price, sum_disc_price, avg_qty, avg_disc,
       count_order AS n_rows,
       NULL::DOUBLE AS xmin, NULL::DOUBLE AS ymin,
       NULL::DOUBLE AS xmax, NULL::DOUBLE AS ymax
FROM ({_PRICING_SQL})
UNION ALL
SELECT 'bbox', user_id::VARCHAR, NULL::VARCHAR,
       NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE,
       n_boxes, xmin, ymin, xmax, ymax
FROM ({_BBOX_SQL})
"""

ORACLES["rel_topk"] = f"""
SELECT 'customers' AS part, n_name AS grp, NULL::BIGINT AS event_id,
       revenue AS val, n_orders AS rnk
FROM ({_TOPCUST_SQL})
UNION ALL
SELECT 'events', user_id::VARCHAR, event_id, value, rank::BIGINT
FROM ({_EVENTS_TOPK_SQL})
"""
