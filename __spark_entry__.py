"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator from SURVEY.md §2 (or a
training-data-pipeline operator) expressed through the sparkfp engine;
``oracle_sql()`` holds the DuckDB twin. Column names and float
rounding are aligned on both sides so the driver's order-insensitive
value-hash comparison is exact.

Conventions:
- timestamps exported as epoch seconds (BIGINT) on both sides;
- every aggregate/computed column aliased identically in both dialects;
- doubles rounded (4-6 dp) in BOTH engines to absorb summation-order
  ulp differences; counts exact.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Oracle fixtures for queries over deterministic synthesized input
# (the audio/multimodal graft): the expected rows are precomputed once
# by tools/gen_audio_fixtures.py and committed, so DuckDB can serve
# them to the driver's rows/schema/value-hash gate like any other
# oracle. tests/test_matching.py::test_audio_fixtures_current fails if
# engine output drifts from the committed fixtures.
FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _fixture_sql(name: str) -> str:
    return f"SELECT * FROM read_parquet('{FIXTURE_DIR}/{name}_expected.parquet')"


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ===================================================================
# flagship entry
# ===================================================================


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's windowed stats fingerprint (A1/A2)
    over the events stream table at sf0.001."""
    return q_fingerprint_stats(spark, "/root/testdata/sf0.001")


# ===================================================================
# §2.3 aggregations / windows
# ===================================================================


def q_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: keyed tumbling-window stats fingerprint (1-hour windows
    keyed by event_type; same stats set as reference aggregations.py:6-16)."""
    from sparkfp import fingerprint

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("equip_id"),
        F.col("event_type").alias("sensor_id"),
        F.col("value").cast("double").alias("value"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    # bounded input -> native-aggregate fast path; the collect_list
    # formulation (fingerprint.windowed_stats) is the shared
    # batch==stream plan and stays the streaming/parity path
    stats = fingerprint.windowed_stats_fast(ev, window="1 hour")
    return stats.select(
        (F.col("start_ms") / 1000).cast("long").alias("win_start_s"),
        F.col("equip_id").alias("event_type"),
        F.round("min", 6).alias("vmin"),
        F.round("max", 6).alias("vmax"),
        F.round("median", 6).alias("vmedian"),
        F.round("mean", 6).alias("vmean"),
        F.round("std_dev", 6).alias("vstd"),
    )


SQL_FINGERPRINT_STATS = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start_s,
       event_type,
       ROUND(MIN(value), 6) AS vmin,
       ROUND(MAX(value), 6) AS vmax,
       ROUND(MEDIAN(value), 6) AS vmedian,
       ROUND(AVG(value), 6) AS vmean,
       ROUND(CASE WHEN COUNT(*) = 1 THEN 0.0 ELSE STDDEV_POP(value) END, 6) AS vstd
FROM events
GROUP BY 1, 2
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary (P5 projection + multi-agg)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-09-02")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_unnest_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: parse the JSON props payload + numeric coercion (P3),
    aggregate by extracted-key decile."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), "[0-9]+", 0).cast("long")
    cleaned = F.coalesce(k, F.lit(0))
    return (
        ev.select((cleaned % 10).alias("k_decile"), F.col("value"))
        .groupBy("k_decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


SQL_UNNEST_PROPS = """
SELECT COALESCE(CAST(regexp_extract(props, '[0-9]+') AS BIGINT), 0) % 10 AS k_decile,
       COUNT(*) AS n,
       ROUND(AVG(value), 6) AS avg_value
FROM events
GROUP BY 1
"""


def q_resample_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: resample to 1-hour means per event_type (reference
    resample('1min').mean(), process_odr.py:941)."""
    from sparkfp import analytics

    ev = _t(spark, sf_dir, "events")
    res = analytics.resample_mean(ev, "ts", ["event_type"], ["value"], "1 hour")
    return res.select(
        F.unix_timestamp("bucket").alias("bucket_s"),
        "event_type",
        F.round("value", 6).alias("value"),
    )


SQL_RESAMPLE_MINUTE = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s,
       event_type,
       ROUND(AVG(value), 6) AS value
FROM events
GROUP BY 1, 2
"""


def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: long -> wide pivot, mean of duplicates (process_odr.py:934-936)."""
    from sparkfp import analytics

    ev = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    wide = analytics.pivot_wide(ev, "user_id", "event_type", "value", kinds)
    return wide.select(
        "user_id", *[F.round(F.col(c), 6).alias(c) for c in kinds]
    )


SQL_PIVOT_WIDE = """
SELECT user_id,
       ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
       ROUND(AVG(CASE WHEN event_type = 'error' THEN value END), 6) AS error,
       ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
       ROUND(AVG(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
       ROUND(AVG(CASE WHEN event_type = 'view' THEN value END), 6) AS view
FROM events
GROUP BY user_id
"""


def q_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: value_counts + percentage rollup (helpers.py:737-747)."""
    from sparkfp import analytics

    return analytics.value_counts_pct(_t(spark, sf_dir, "events"), "event_type")


SQL_VALUE_COUNTS = """
SELECT event_type, COUNT(*) AS count,
       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 2) AS pct
FROM events
GROUP BY event_type
ORDER BY count DESC, event_type
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number top-k per group (engine-internal op, SURVEY §2.9)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


SQL_TOPK_PER_GROUP = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 distinct + count-distinct aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


SQL_DISTINCT_COUNTS = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY l_returnflag
"""


def q_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate (Spark-native; §2.9 gap filled)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
        )
    )


SQL_CUBE_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (§2.9): big-spender custkeys EXCEPT 'BUILDING'."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 400_000).select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return big.exceptAll(bld.distinct()).distinct()


SQL_SET_OPS = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
EXCEPT
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
"""


# ===================================================================
# §2.4 joins
# ===================================================================


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (batch): equi+range window-correlation join — lineitems shipped
    within 30 days of their order date."""
    from sparkfp import joins

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("start"),
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("end"),
        "o_orderpriority",
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_shipdate").alias("ts"),
        "l_extendedprice",
        "l_discount",
    )
    j = joins.interval_join(li, o, "k", "ts", "start", "end")
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


SQL_INTERVAL_JOIN = """
SELECT o.o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderpriority
"""


def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: broadcast dim enrichment — revenue by part brand."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


SQL_BROADCAST_JOIN = """
SELECT p.p_brand, COUNT(*) AS n,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: anti-join dedup — customers with no orders, by segment."""
    from sparkfp import joins

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        joins.anti_join_dedup(c, o, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


SQL_ANTI_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-semi (EXISTS): parts with any shipped lineitem, by type."""
    from sparkfp import joins

    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return (
        joins.semi_join(p, li, "p_partkey")
        .groupBy("p_type")
        .agg(F.count("*").alias("n_parts"))
    )


SQL_SEMI_JOIN = """
SELECT p_type, COUNT(*) AS n_parts
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
GROUP BY p_type
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/as-of: for each purchase event, the user's most recent prior
    click (latest right row with ts <= left ts per key)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("p_ms"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("c_ms"),
    )
    j = purchases.join(
        clicks, (purchases.user_id == clicks.user_id) & (F.col("c_ms") <= F.col("p_ms")),
        "left",
    )
    w = Window.partitionBy("purchase_id").orderBy(F.desc("c_ms"), F.desc("click_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", F.col("click_id").alias("last_click_id"))
    )


SQL_ASOF_JOIN = """
SELECT purchase_id, last_click_id FROM (
  SELECT p.event_id AS purchase_id, c.event_id AS last_click_id,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON c.user_id = p.user_id AND c.ts <= p.ts
) WHERE rn = 1
"""


# ===================================================================
# §2.5 / §2.6 window analytics + rules
# ===================================================================


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: centered rolling median per key (exact, mean-of-middles)."""
    from sparkfp import analytics

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    return ev.select(
        "event_id",
        F.round(analytics.rolling_median("value", w), 6).alias("roll_med"),
    )


SQL_ROLLING_MEDIAN = """
SELECT event_id,
       ROUND(MEDIAN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6)
       AS roll_med
FROM events
"""


def q_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: Hampel outlier filter per user (helpers.py:104-122)."""
    from sparkfp import analytics

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = analytics.hampel(
        ev, "value", ["user_id"], "ts", window_size=7, n_sigmas=3.0, out_col="clean",
        order_cols=["ts", "event_id"],
    )
    return out.select("event_id", F.round("clean", 6).alias("clean"))


# Both engines order window frames by (ts, event_id): the composite
# tiebreak makes the frame contents deterministic under ts ties.
SQL_HAMPEL = """
WITH med AS (
  SELECT event_id, user_id, ts, value,
         MEDIAN(value) OVER w AS rmed
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), mad AS (
  SELECT *, MEDIAN(ABS(value - rmed)) OVER w AS rmad
  FROM med
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT event_id,
       ROUND(CASE WHEN rmad IS NOT NULL AND 3.0 * 1.4826 * rmad > 0
                   AND ABS(value - rmed) > 3.0 * 1.4826 * rmad
             THEN rmed ELSE value END, 6) AS clean
FROM mad
"""


def q_lowess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: LOWESS smoothing per user (tricube k-NN weighted linear
    regression over row positions, frac=0.3, single pass). The oracle
    is an independent closed-form SQL implementation of the same
    semantics (self-join per key, kth-distance bandwidth, weighted
    least squares)."""
    from sparkfp import analytics

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = analytics.lowess(
        ev, "value", ["user_id"], "ts", frac=0.3, order_cols=["ts", "event_id"]
    )
    return out.select("event_id", F.round("smooth", 4).alias("smooth"))


SQL_LOWESS = """
WITH base AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS x,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
), params AS (
  SELECT *, GREATEST(3, LEAST(n, CAST(FLOOR(0.3 * n) AS BIGINT))) AS k
  FROM base
), pairs AS (
  SELECT a.user_id, a.event_id, a.x AS xi, a.value AS yi, a.n, a.k,
         b.x AS xj, b.value AS yj, ABS(a.x - b.x) AS d,
         ROW_NUMBER() OVER (PARTITION BY a.user_id, a.event_id
                            ORDER BY ABS(a.x - b.x), b.x) AS dr
  FROM params a JOIN base b ON a.user_id = b.user_id
), with_h AS (
  SELECT *, MAX(CASE WHEN dr = k THEN d END)
              OVER (PARTITION BY user_id, event_id) AS h
  FROM pairs
), weighted AS (
  SELECT user_id, event_id, xi, yi, n, h, xj, yj,
         CASE WHEN d < h THEN POWER(1 - POWER(d * 1.0 / h, 3), 3)
              ELSE 0.0 END AS w
  FROM with_h
), fits AS (
  SELECT user_id, event_id, ANY_VALUE(xi) AS xi, ANY_VALUE(yi) AS yi,
         ANY_VALUE(n) AS n, ANY_VALUE(h) AS h,
         SUM(w) AS sw, SUM(w * xj) AS swx, SUM(w * yj) AS swy,
         SUM(w * xj * xj) AS swxx, SUM(w * xj * yj) AS swxy
  FROM weighted
  GROUP BY user_id, event_id
)
SELECT event_id,
       ROUND(CASE
         WHEN n < 3 OR h IS NULL OR h <= 0 OR sw <= 0 THEN yi
         WHEN swxx - swx * swx / sw < 1e-9 THEN swy / sw
         ELSE swy / sw
              + (swxy - swx * swy / sw) / (swxx - swx * swx / sw)
                * (xi - swx / sw)
       END, 4) AS smooth
FROM fits
"""


def q_time_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: per-key time-delta step with fallback (process_odr.py:279-287)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.coalesce(
        F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w), F.lit(60)
    )
    return (
        ev.select("user_id", dt.alias("dt"))
        .groupBy("user_id")
        .agg(F.round(F.avg("dt"), 4).alias("avg_dt_s"), F.count("*").alias("n"))
    )


SQL_TIME_DELTA = """
SELECT user_id, ROUND(AVG(dt), 4) AS avg_dt_s, COUNT(*) AS n
FROM (
  SELECT user_id,
         COALESCE(CAST(floor(epoch(ts)) AS BIGINT) - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id), 60) AS dt
  FROM events
)
GROUP BY user_id
"""


def q_rules_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-E7: compiled rule trees (comparison, between, abs_gt,
    deviation, nested AND/OR, IF/THEN/ELSE) evaluated in one pass."""
    from sparkfp import rules

    li = _t(spark, sf_dir, "lineitem")
    trees = [
        {
            "rule_id": "bulk_discounted",
            "logic": "AND",
            "checks": [
                {"param": "l_quantity", "op": ">", "value": 30},
                {"param": "l_discount", "op": "between", "value": [0.05, 0.1]},
            ],
        },
        {
            "rule_id": "price_dev_or_tax",
            "logic": "OR",
            "checks": [
                {"param": "l_extendedprice", "op": "deviation",
                 "value": {"base": 30000, "pct": 0.9}},
                {"param": "l_tax", "op": ">=", "value": 0.07},
            ],
        },
        {
            "rule_id": "iflogic",
            "logic": "IF",
            "if": {"checks": [{"param": "l_quantity", "op": ">", "value": 25}]},
            "then": {"checks": [{"param": "l_discount", "op": ">", "value": 0.05}]},
            "else": {"checks": [{"param": "l_tax", "op": "<", "value": 0.02}]},
        },
    ]
    cols = set(li.columns)
    masks = [(t["rule_id"], rules.compile_group(t, cols)) for t in trees]
    return li.select(
        "l_returnflag",
        *[m.cast("int").alias(rid) for rid, m in masks],
    ).groupBy("l_returnflag").agg(
        *[F.sum(rid).alias(f"n_{rid}") for rid, _ in masks]
    )


SQL_RULES_ENGINE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_quantity > 30 AND l_discount BETWEEN 0.05 AND 0.1
                THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk_discounted,
       CAST(SUM(CASE WHEN (l_extendedprice < 30000 * 0.1 OR l_extendedprice > 30000 * 1.9)
                  OR l_tax >= 0.07 THEN 1 ELSE 0 END) AS BIGINT) AS n_price_dev_or_tax,
       CAST(SUM(CASE WHEN (l_quantity > 25 AND l_discount > 0.05)
                  OR (l_quantity > 25 AND NOT (l_discount > 0.05) AND l_tax < 0.02)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_iflogic
FROM lineitem
GROUP BY l_returnflag
"""


def q_derived_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: derived parameters via Catalyst expr (helpers.py:196-291)."""
    from sparkfp import rules

    li = _t(spark, sf_dir, "lineitem")
    out = rules.derived_parameters(
        li,
        {
            "revenue": "l_extendedprice * (1 - l_discount)",
            "charge": "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
            "qty_root": "sqrt(abs(l_quantity))",
        },
    )
    return out.groupBy("l_linestatus").agg(
        F.round(F.sum("revenue"), 2).alias("sum_revenue"),
        F.round(F.sum("charge"), 2).alias("sum_charge"),
        F.round(F.avg("qty_root"), 6).alias("avg_qty_root"),
    )


SQL_DERIVED_PARAMS = """
SELECT l_linestatus,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(SQRT(ABS(l_quantity))), 6) AS avg_qty_root
FROM lineitem
GROUP BY l_linestatus
"""


def q_streak_triggers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8: gaps-and-islands duration-gated triggers — per user,
    alarm at the first event where a value>30 streak has lasted >= 4 h."""
    from sparkfp import streaks

    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id", "user_id", "ts", (F.col("value") > 30).alias("hot"),
            F.lit(14400).alias("duration_s"),
        )
    )
    trig = streaks.streak_triggers(
        ev, ["user_id"], "ts", "hot", "duration_s", step_fallback_s=60.0,
        order_cols=["ts", "event_id"],
    )
    return trig.select("user_id", "event_id")


SQL_STREAK_TRIGGERS = """
WITH flagged AS (
  SELECT event_id, user_id, ts, (value > 30) AS hot,
         CASE WHEN LAG(value > 30) OVER w IS NULL
               OR LAG(value > 30) OVER w <> (value > 30)
              THEN 1 ELSE 0 END AS changed,
         COALESCE(CAST(floor(epoch(ts)) AS BIGINT) - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER w, 60) AS dt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
  SELECT *, SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS island
  FROM flagged
), durs AS (
  SELECT *, SUM(dt) OVER (PARTITION BY user_id, island ORDER BY ts, event_id)
            AS streak_s
  FROM islands
), qualifying AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, island
                               ORDER BY ts, event_id) AS rn
  FROM durs WHERE hot AND streak_s >= 14400
)
SELECT user_id, event_id FROM qualifying WHERE rn = 1
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 analog (batch sessionization): sessions split on 30-min gaps;
    per user: session count + avg session event count."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
    new_sess = (gap.isNull() | (gap > 1800)).cast("long")
    sess = ev.withColumn("session_id", F.sum(new_sess).over(w))
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_session_events"),
    )


SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR CAST(floor(epoch(ts)) AS BIGINT) - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS session_id
  FROM marked
), per_sess AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
       ROUND(AVG(n_events), 4) AS avg_session_events
FROM per_sess GROUP BY user_id
"""


def q_run_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: run-state machine (RUNNING/SHUTDOWN/STARTING) over the event
    stream; running := event_type <> 'error'; 4h shutdown, 2h transition."""
    from sparkfp import stateful

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", (F.col("event_type") != "error").alias("running")
    )
    out = stateful.run_state_batch(
        ev, ["user_id"], "ts", "running",
        shutdown_window_s=14400, transition_window_s=7200,
        order_cols=["ts", "event_id"],
    )
    return out.groupBy("user_id", "run_state").agg(F.count("*").alias("n"))


# STARTING = running rows within the transition window of the FIRST
# running row after the last shutdown; the clock survives brief dips
# (reference keeps start_time across not-running rows,
# process_odr.py:1050-1065).
SQL_RUN_STATE = """
WITH flagged AS (
  SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         (event_type <> 'error') AS running,
         CASE WHEN LAG(event_type <> 'error') OVER w IS NULL
               OR LAG(event_type <> 'error') OVER w <> (event_type <> 'error')
              THEN 1 ELSE 0 END AS changed
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
  SELECT *, SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS island
  FROM flagged
), elapsed AS (
  SELECT *,
         ts_s - FIRST_VALUE(ts_s)
           OVER (PARTITION BY user_id, island ORDER BY ts, event_id) AS elap,
         NOT running AS down
  FROM islands
), shut AS (
  SELECT *, (down AND elap >= 14400) AS is_shutdown FROM elapsed
), carried AS (
  SELECT *,
         MAX(CASE WHEN is_shutdown THEN ts_s END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_shut_s
  FROM shut
), cohort AS (
  SELECT *,
         MIN(CASE WHEN running THEN ts_s END)
           OVER (PARTITION BY user_id, last_shut_s ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS start_s
  FROM carried
)
SELECT user_id,
       CASE WHEN is_shutdown THEN 'SHUTDOWN'
            WHEN running AND last_shut_s IS NOT NULL AND ts_s - start_s < 7200
            THEN 'STARTING'
            ELSE 'RUNNING' END AS run_state,
       COUNT(*) AS n
FROM cohort
GROUP BY 1, 2
"""


def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 sliding variant: 2-hour windows sliding by 1 hour."""
    from sparkfp import windows as W_

    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            W_.sliding("ts", "2 hours", "1 hour").alias("win"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start_s"),
            "event_type", "n", "avg_value",
        )
    )


SQL_SLIDING_WINDOWS = """
SELECT CAST(epoch(ws) AS BIGINT) AS win_start_s, event_type,
       COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
FROM (
  SELECT UNNEST([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
         event_type, value
  FROM events
)
GROUP BY ws, event_type
"""


def q_salted_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase windowed count (skew-aware hash-agg; the salting
    is internal — results equal a plain windowed count)."""
    from sparkfp import windows as W_

    ev = _t(spark, sf_dir, "events")
    out = W_.salted_windowed_count(
        ev, "event_type", "ts", "1 hour",
        salt_buckets=8, salt_source="event_id",
    )
    return out.select(
        F.unix_timestamp(F.col("win.start")).alias("win_start_s"),
        "event_type", "n",
    )


SQL_SALTED_WINDOW_COUNT = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start_s,
       event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


# ===================================================================
# training-data pipeline ops (documents / embeddings)
# ===================================================================


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups over documents (md5 hash-groupBy)."""
    from sparkfp import dedup

    d = _t(spark, sf_dir, "documents")
    return dedup.exact_duplicate_groups(d, "doc_id", "text")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, COUNT(*) AS n_dups, MIN(doc_id) AS keeper_id
FROM documents GROUP BY md5(text)
"""


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 hashes, word 3-shingles) per document."""
    from sparkfp import dedup

    d = _t(spark, sf_dir, "documents")
    # materialize the signature array once, then slice the column —
    # slicing the raw expression would inline (and recompute) the full
    # 8-way minhash per output column (see dedup.minhash_lsh_candidates)
    sig_df = d.select(
        "doc_id", dedup.minhash_signature("text", n_hashes=8, k=3).alias("_sig")
    )
    return sig_df.select(
        "doc_id",
        *[F.element_at(F.col("_sig"), i + 1).alias(f"mh{i}") for i in range(8)],
    )


def _sql_minhash(n_hashes: int = 8, k: int = 3) -> str:
    mins = ",\n       ".join(
        "list_min(list_transform(sh, x -> md5(concat('{i}:', x)))) AS mh{i}".format(i=i)
        for i in range(n_hashes)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - {k - 1}, 1)),
                        i -> array_to_string(list_slice(t, i, i + {k - 1}), ' '))
         AS sh
  FROM toks
)
SELECT doc_id, {mins} FROM sh
"""


_JACCARD_LSH = dict(n_hashes=16, n_bands=4, threshold=0.5)


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs >= 0.5, MinHash-LSH pruned:
    candidate pairs share >= 1 of 4 signature bands (equi-join on
    (band_idx, band_hash)); each candidate is verified by exact
    array_intersect Jaccard. No raw-token self-join anywhere — the
    token key space is Zipf-skewed (stopword keys are planet-hot) and
    quadratic in document frequency. The oracle mirrors the banding
    exactly, so the comparison is exact."""
    from sparkfp import dedup

    d = _t(spark, sf_dir, "documents")
    p = _JACCARD_LSH
    cand = dedup.minhash_lsh_candidates(
        d, "doc_id", "text", n_hashes=p["n_hashes"], n_bands=p["n_bands"], k=1
    )
    out = dedup.jaccard_pairs(
        d, "doc_id", "text", threshold=p["threshold"], k=1, candidates=cand
    )
    return out.select(
        "id_a", "id_b", "shared", F.round("jaccard", 6).alias("jaccard")
    )


def _sql_jaccard_lsh() -> str:
    """DuckDB replica of MinHash-LSH candidate generation + exact
    Jaccard verify (same 16 md5 minhashes over k=1 token shingles,
    same 4 band hashes — dedup.minhash_signature/lsh_bands)."""
    p = _JACCARD_LSH
    rpb = p["n_hashes"] // p["n_bands"]
    mins = ",\n         ".join(
        "list_min(list_transform(sh, x -> md5(concat('{i}:', x)))) AS mh{i}".format(
            i=i
        )
        for i in range(p["n_hashes"])
    )
    bands = "\n  UNION ALL ".join(
        "SELECT id, {b} AS band_idx, md5(concat_ws('|', {cols})) AS band FROM sig".format(
            b=b, cols=", ".join(f"mh{b * rpb + r}" for r in range(rpb))
        )
        for b in range(p["n_bands"])
    )
    return f"""
WITH sh AS (
  SELECT doc_id AS id,
         list_transform(
           generate_series(1, greatest(len(string_split_regex(trim(text), '\\s+')), 1)),
           i -> string_split_regex(trim(text), '\\s+')[i]) AS sh
  FROM documents
), sig AS (
  SELECT id, {mins} FROM sh
), bands AS (
  {bands}
), cand AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band = b.band AND a.id < b.id
  GROUP BY 1, 2
), toks AS (
  SELECT doc_id AS id,
         list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
  FROM documents
), verified AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(ta.toks, tb.toks)) AS BIGINT) AS shared,
         len(ta.toks) AS na, len(tb.toks) AS nb
  FROM cand c
  JOIN toks ta ON ta.id = c.id_a
  JOIN toks tb ON tb.id = c.id_b
)
SELECT id_a, id_b, shared,
       ROUND(shared * 1.0 / (na + nb - shared), 6) AS jaccard
FROM verified
WHERE shared * 1.0 / (na + nb - shared) >= {p["threshold"]}
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (32-bit, md5-derived bit votes) per document."""
    from sparkfp import dedup

    return dedup.simhash(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_simhash(bits: int = 32) -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN CAST(floor(h / {2**b}) AS BIGINT) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(list_distinct(string_split_regex(trim(text), '\\s+')))
         AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h
  FROM toks
), votes AS (
  SELECT doc_id,
         {votes}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3 over 32 bits): candidates
    share one of four 8-bit chunks (pigeonhole — a hash equi-join on
    (chunk_idx, chunk_value), never all-pairs), then the exact Hamming
    filter. Oracle mirrors the chunk pruning, so the comparison is
    exact."""
    from sparkfp import dedup

    d = _t(spark, sf_dir, "documents")
    sims = dedup.simhash(d, "doc_id", "text")
    out = dedup.simhash_near_pairs(sims, "doc_id", max_hamming=3)
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def _sql_simhash_pairs(max_hamming: int = 3) -> str:
    return f"""
WITH sims AS ({_sql_simhash()}),
chunks AS (
  SELECT doc_id AS id, simhash, u.c AS c,
         (simhash >> (u.c * 8)) & 255 AS v
  FROM sims, UNNEST([0, 1, 2, 3]) AS u(c)
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM chunks a JOIN chunks b ON a.c = b.c AND a.v = b.v AND a.id < b.id
)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
FROM cand c
JOIN sims sa ON sa.doc_id = c.id_a
JOIN sims sb ON sb.doc_id = c.id_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
"""


def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (k=8 chars, window 4)."""
    from sparkfp import text as sftext

    return sftext.winnow_fingerprints(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=8, w=4
    )


SQL_WINNOW = """
WITH grams AS (
  SELECT doc_id, i AS pos,
         CAST(concat('0x', substr(md5(substr(text, i, 8)), 1, 8)) AS BIGINT)
         AS gram_hash
  FROM documents,
       UNNEST(generate_series(1, greatest(length(text) - 7, 1))) AS u(i)
), winmin AS (
  SELECT doc_id,
         MIN(gram_hash) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
         AS fingerprint
  FROM grams
)
SELECT DISTINCT doc_id, fingerprint FROM winmin
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality features + composite score per document."""
    from sparkfp import text as sftext

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = sftext.quality_score(d, "text")
    return out.select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        "alpha_ratio", "punct_ratio",
        "stopword_ratio", "distinct_ratio", "quality_score",
    )


SQL_TEXT_QUALITY = """
WITH base AS (
  SELECT doc_id, text,
         string_split_regex(trim(lower(text)), '\\s+') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct
  FROM documents
), feat AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         ROUND(n_alpha * 1.0 / greatest(n_chars, 1), 6) AS alpha_ratio,
         ROUND(n_punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
         ROUND(len(list_filter(toks, x -> x IN
               ('the','a','of','and','to','in','is','it','that','for')))
               * 1.0 / greatest(len(toks), 1), 6) AS stopword_ratio,
         ROUND(len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1), 6)
           AS distinct_ratio
  FROM base
)
SELECT doc_id, n_tokens, alpha_ratio, punct_ratio, stopword_ratio, distinct_ratio,
       ROUND(least(n_tokens / 50.0, 1.0) * 0.25
             + (1 - least(punct_ratio * 5, 1.0)) * 0.25
             + least(stopword_ratio * 4, 1.0) * 0.25
             + distinct_ratio * 0.25, 6) AS quality_score
FROM feat
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-hit argmax) vs the labeled lang."""
    from sparkfp import text as sftext

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = sftext.lang_id(d, "text")
    return out.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))


def _sql_lang_id() -> str:
    from sparkfp.text import STOPWORDS

    score = {
        lang: "ROUND(len(list_filter(toks, x -> x IN ({w}))) * 1.0 / "
        "greatest(len(toks), 1), 9)".format(
            w=", ".join(f"'{x}'" for x in words)
        )
        for lang, words in STOPWORDS.items()
    }
    return f"""
WITH base AS (
  SELECT doc_id, lang,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), scores AS (
  SELECT doc_id, lang,
         {score['de']} AS s_de, {score['en']} AS s_en,
         {score['es']} AS s_es, {score['fr']} AS s_fr
  FROM base
)
SELECT lang,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
            WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
            WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
            WHEN s_en >= s_de THEN 'en'
            ELSE 'de' END AS lang_pred,
       COUNT(*) AS n
FROM scores GROUP BY 1, 2
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per source (whitespace tokenizer)."""
    from sparkfp import text as sftext

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", sftext.token_count("text").alias("n_tok"),
                 sftext.bpe_like_token_count("text").alias("n_bpe"),
                 F.length("text").alias("n_chars"))
        .groupBy("source")
        .agg(
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.count("*").alias("n_docs"),
        )
    )


SQL_TOKEN_STATS = r"""
SELECT source,
       CAST(SUM(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT)
         AS total_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
            AS BIGINT) AS total_bpe_tokens,
       ROUND(AVG(length(text)), 4) AS avg_chars,
       COUNT(*) AS n_docs
FROM documents GROUP BY source
"""


def q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= 0.8) via the LSH scale path:
    hyperplane-signature buckets generate candidates (equi-join on
    (table, sig)), exact cosine verifies candidates only — no cross
    join. The DuckDB oracle is the brute-force twin; verification is
    exact, so the comparison holds wherever LSH recall does (> 0.98 at
    cos 0.8 with these params, and exactly here: sf0.01 has no
    qualifying pairs to miss)."""
    from sparkfp import dedup

    e = _t(spark, sf_dir, "embeddings")
    out = dedup.embedding_near_pairs_lsh(
        e, "vec_id", "embedding", dim=64, threshold=0.8, n_planes=4, n_tables=8
    )
    return out.select("id_a", "id_b", F.round("cos", 4).alias("cos"))


SQL_EMBEDDING_NEAR_PAIRS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
         AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.8
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for the first 10 vectors."""
    from sparkfp import similarity

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(e, queries, "vec_id", "embedding", k=5)


SQL_ANN_TOPK = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS cos
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 10
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5
"""

_IVF_PARAMS = dict(dim=64, k=5, n_centroids=16, nprobe=4, seed=42)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k for the first 10 vectors: corpus rows live
    in one inverted list each (nearest seeded unit centroid); queries
    probe their nprobe nearest lists; exact cosine re-ranks candidates.
    The oracle replicates centroid assignment + probing + re-rank with
    the same literal centroids, so the comparison is exact."""
    from sparkfp import similarity

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(e, queries, "vec_id", "embedding", **_IVF_PARAMS)


def _sql_ivf_topk() -> str:
    from sparkfp import similarity

    p = _IVF_PARAMS
    cents = similarity.ivf_centroids(p["dim"], p["n_centroids"], p["seed"])
    vals = ",".join(
        "({i}, [{w}]::DOUBLE[])".format(
            i=i, w=",".join(repr(float(x)) for x in c)
        )
        for i, c in enumerate(cents)
    )
    return f"""
WITH cents(cid, w) AS (VALUES {vals}),
cdots AS (
  SELECT e.vec_id, c.cid,
         list_dot_product(e.embedding::DOUBLE[], c.w) AS dot
  FROM embeddings e CROSS JOIN cents c
), assign AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS r
  FROM cdots
), corpus_list AS (
  SELECT vec_id AS neighbor_id, cid AS list_id FROM assign WHERE r = 1
), probes AS (
  SELECT vec_id AS query_id, cid AS list_id
  FROM assign WHERE r <= {p["nprobe"]} AND vec_id < 10
), cand AS (
  SELECT p.query_id, c.neighbor_id
  FROM corpus_list c JOIN probes p USING (list_id)
  WHERE c.neighbor_id <> p.query_id
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND(list_cosine_similarity(qe.embedding::DOUBLE[],
                                      ce.embedding::DOUBLE[]), 6) AS cos
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {p["k"]}
"""


_LSH_TOPK_PARAMS = dict(dim=64, k=5, n_planes=4, n_tables=8, seed=42)


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k neighbors for the first 10
    vectors: candidates share a hyperplane signature in >= 1 of the
    hash tables (posexploded (table, sig) rows meet in a hash
    EQUI-join — never an OR-of-equalities nested loop), exact cosine
    re-ranks candidates only."""
    from sparkfp import similarity

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    return similarity.lsh_topk(
        e, queries, "vec_id", "embedding", **_LSH_TOPK_PARAMS
    )


def _sql_lsh_topk() -> str:
    """DuckDB replica of the full LSH-top-k pipeline — identical
    hyperplanes (seeded numpy, inlined as literals), signature bits,
    candidate bucketing, and exact re-rank, so the comparison is exact
    rather than statistical (LSH recall vs brute force is a property
    of the data; the implementation contract is bucket parity, proven
    bit-for-bit here and recall-tested on planted corpora in pytest)."""
    from sparkfp import similarity

    p = _LSH_TOPK_PARAMS
    vals = []
    for t in range(p["n_tables"]):
        planes = similarity.hyperplanes(p["dim"], p["n_planes"], p["seed"] + t)
        for b, w in enumerate(planes):
            lit = "[" + ",".join(repr(float(x)) for x in w) + "]::DOUBLE[]"
            vals.append(f"({t}, {2 ** b}::BIGINT, {lit})")
    return f"""
WITH planes(t, pw, w) AS (VALUES {",".join(vals)}),
sigs AS (
  SELECT e.vec_id, pl.t,
         CAST(SUM(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.w) > 0
                  THEN pl.pw ELSE 0 END) AS BIGINT) AS sig
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.t
), qsig AS (
  SELECT * FROM sigs WHERE vec_id < 10
), cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sigs c JOIN qsig q ON c.t = q.t AND c.sig = q.sig
                         AND c.vec_id <> q.vec_id
  GROUP BY 1, 2
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND(list_cosine_similarity(qe.embedding::DOUBLE[],
                                      ce.embedding::DOUBLE[]), 6) AS cos
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {p["k"]}
"""


# ===================================================================
# audio graft + streaming (non-SQL-expressible: rows-only checks)
# ===================================================================


def q_audio_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graft pipeline end-to-end in batch: synthesize tracks+clips
    (deterministic), build the landmark index, match. Non-SQL op."""
    from sparkfp import matching, synth

    index = matching.build_index(synth.tracks(spark, n_tracks=4))
    clips = synth.clips(spark, n_clips=24, n_tracks=4)
    return matching.match_pipeline(clips, index).select(
        "clip_id", "matched_track", "offset_ms", "vote_count",
        F.round("score", 4).alias("score"),
    )


def q_audio_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark fan-out stats per clip (the flatMap analog). Non-SQL."""
    from sparkfp import dsp, synth

    clips = synth.clips(spark, n_clips=16, n_tracks=4)
    lm = dsp.landmarks(clips)
    return lm.groupBy("clip_id").agg(
        F.count("*").alias("n_landmarks"),
        F.countDistinct("hash").alias("n_distinct_hashes"),
    )


def q_media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal byte-feature extraction over binary clip payloads."""
    from sparkfp import multimodal, synth

    clips = synth.clips(spark, n_clips=16, n_tracks=4).select(
        F.col("clip_id").alias("media_id"), "bytes",
        F.lit("audio").alias("media_type"), "codec",
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"), "dur_ms",
    )
    out = multimodal.byte_features(clips)
    return out.select(
        "media_id", "n_bytes",
        F.round("byte_mean", 4).alias("byte_mean"),
        F.round("byte_entropy", 4).alias("byte_entropy"),
        F.round("zero_ratio", 4).alias("zero_ratio"),
    )


# ===================================================================
# registry
# ===================================================================

_QUERIES: dict[str, tuple[Callable, str | None]] = {
    # aggregations / windows
    "fingerprint_stats": (q_fingerprint_stats, SQL_FINGERPRINT_STATS),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "unnest_props": (q_unnest_props, SQL_UNNEST_PROPS),
    "resample_minute": (q_resample_minute, SQL_RESAMPLE_MINUTE),
    "pivot_wide": (q_pivot_wide, SQL_PIVOT_WIDE),
    "value_counts": (q_value_counts, SQL_VALUE_COUNTS),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "distinct_counts": (q_distinct_counts, SQL_DISTINCT_COUNTS),
    "cube_rollup": (q_cube_rollup, SQL_CUBE_ROLLUP),
    "set_ops": (q_set_ops, SQL_SET_OPS),
    # joins
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "broadcast_join": (q_broadcast_join, SQL_BROADCAST_JOIN),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    # window analytics + rules + state
    "rolling_median": (q_rolling_median, SQL_ROLLING_MEDIAN),
    "hampel": (q_hampel, SQL_HAMPEL),
    "lowess": (q_lowess, SQL_LOWESS),
    "time_delta": (q_time_delta, SQL_TIME_DELTA),
    "rules_engine": (q_rules_engine, SQL_RULES_ENGINE),
    "derived_params": (q_derived_params, SQL_DERIVED_PARAMS),
    "streak_triggers": (q_streak_triggers, SQL_STREAK_TRIGGERS),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "run_state": (q_run_state, SQL_RUN_STATE),
    "sliding_windows": (q_sliding_windows, SQL_SLIDING_WINDOWS),
    "salted_window_count": (q_salted_window_count, SQL_SALTED_WINDOW_COUNT),
    # training-data ops
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "minhash_signatures": (q_minhash_signatures, _sql_minhash()),
    "jaccard_pairs": (q_jaccard_pairs, _sql_jaccard_lsh()),
    "simhash": (q_simhash, _sql_simhash()),
    "simhash_pairs": (q_simhash_pairs, _sql_simhash_pairs()),
    "winnow": (q_winnow, SQL_WINNOW),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "lang_id": (q_lang_id, _sql_lang_id()),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "embedding_near_pairs": (q_embedding_near_pairs, SQL_EMBEDDING_NEAR_PAIRS),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "lsh_topk": (q_lsh_topk, _sql_lsh_topk()),
    "ivf_topk": (q_ivf_topk, _sql_ivf_topk()),
    # audio graft + multimodal: non-SQL pipelines over deterministic
    # seeded synth input -> precomputed-fixture oracles (hard gate)
    "audio_match": (q_audio_match, _fixture_sql("audio_match")),
    "audio_landmarks": (q_audio_landmarks, _fixture_sql("audio_landmarks")),
    "media_byte_features": (
        q_media_byte_features, _fixture_sql("media_byte_features")
    ),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _QUERIES.items() if sql is not None}
