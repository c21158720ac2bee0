"""Relational operator queries (SURVEY.md §2.1-§2.10) over the testdata
star schema. Name prefixes are the §2 inventory row ids.

Every Spark plan here is written the way it should run at 100 TB: filters
and projections sit directly on the parquet scan (pushdown + pruning),
dimension joins carry explicit broadcast hints, aggregations rely on
Catalyst's partial aggregation, and window/tie-break orderings are total so
results are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.catalog.common import (
    SQL_MONEY_AVG,
    SQL_MONEY_SUM,
    SQL_PRODUCT_SUM,
    T,
)
from calp_cva_tracking_pipeline_spark.functions.numeric import (
    money_avg,
    money_sum,
    product_sum,
)
from calp_cva_tracking_pipeline_spark.functions.text import canonicalize_name
from calp_cva_tracking_pipeline_spark.operators import joins as J
from calp_cva_tracking_pipeline_spark.operators import reshape as X
from calp_cva_tracking_pipeline_spark.operators import windows as W
from calp_cva_tracking_pipeline_spark.operators.aggregate import (
    bool_any,
    geometric_growth,
    latest_row_per_group,
    ratio_of_sums,
    sum_clamped_percentage,
)
from calp_cva_tracking_pipeline_spark.operators.cascade import when_cascade
from calp_cva_tracking_pipeline_spark.operators.dedup import priority_dedup

# ---------------------------------------------------------------------------
# §2.2 filters / projections
# ---------------------------------------------------------------------------


def f1_filter_neq(spark, sf_dir):
    # F1/F6/F8: inequality filter pushed to the scan; small grouped result.
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") != "R")
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n"),
            money_sum("l_extendedprice").alias("sum_price"),
        )
    )


F1_SQL = f"""
SELECT l_linestatus, COUNT(*) AS n, {SQL_MONEY_SUM('l_extendedprice')} AS sum_price
FROM lineitem WHERE l_returnflag <> 'R' GROUP BY l_linestatus
"""


def f3_year_floor_string(spark, sf_dir):
    # F3: the reference's string-typed year comparison (code/08:34) —
    # years compared lexically, faithfully reproduced.
    o = T(spark, sf_dir, "orders")
    return (
        o.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .filter(F.col("o_year").cast("string") >= "1998")
        .groupBy("o_year")
        .agg(
            F.count("*").alias("n"),
            money_sum("o_totalprice").alias("sum_total"),
        )
    )


F3_SQL = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, COUNT(*) AS n,
       {SQL_MONEY_SUM('o_totalprice')} AS sum_total
FROM orders
WHERE CAST(year(o_orderdate) AS VARCHAR) >= '1998'
GROUP BY 1
"""

IN_LIST = ["NATION_1", "NATION_7", "NATION_19", "NATION_24"]


def f4_in_list(spark, sf_dir):
    n = T(spark, sf_dir, "nation")
    return n.filter(F.col("n_name").isin(IN_LIST)).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


F4_SQL = f"""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_name IN ({','.join(repr(x) for x in IN_LIST)})
"""


def f5_anti_join(spark, sf_dir):
    # F5: key-set exclusion as a left-anti join (reference !id %in% ...).
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


F5_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def f7_positive_finite(spark, sf_dir):
    # F7: CVAamount > 0 & is.finite analog (code/09:89).
    li = T(spark, sf_dir, "lineitem")
    v = F.col("l_extendedprice")
    return (
        li.filter((v > 1000.0) & ~F.isnan(v) & (v < float("inf")))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), money_sum(v).alias("sum_price"))
    )


F7_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n, {SQL_MONEY_SUM('l_extendedprice')} AS sum_price
FROM lineitem
WHERE l_extendedprice > 1000.0 AND isfinite(l_extendedprice)
GROUP BY l_returnflag
"""


def f10_regex_filter(spark, sf_dir):
    # F10: regex row filter (reference grepl on answers, code/07:100-101).
    p = T(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("(red|blue)")).select(
        "p_partkey", "p_name", "p_brand"
    )


F10_SQL = """
SELECT p_partkey, p_name, p_brand FROM part
WHERE regexp_matches(p_name, '(red|blue)')
"""


def f11_projection_rename(spark, sf_dir):
    # F11/F12: column projection + rename + drop (pruned at the scan).
    s = T(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("supplier_id"),
        F.col("s_name").alias("supplier_name"),
    )


F11_SQL = """
SELECT s_suppkey AS supplier_id, s_name AS supplier_name FROM supplier
"""

# ---------------------------------------------------------------------------
# §2.3 dedup
# ---------------------------------------------------------------------------


def d1_priority_dedup(spark, sf_dir):
    # D1: keep one row per key preferring a status order
    # (reference: incoming over internal per shared id, code/04:83-84).
    o = T(spark, sf_dir, "orders")
    priority = when_cascade(
        F.lit(2),
        [(F.col("o_orderstatus") == "F", F.lit(0)),
         (F.col("o_orderstatus") == "O", F.lit(1))],
    )
    return priority_dedup(
        o, ["o_custkey"], priority, ["o_orderkey"]
    ).select("o_custkey", "o_orderkey", "o_orderstatus")


D1_SQL = """
SELECT o_custkey, o_orderkey, o_orderstatus FROM (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END,
                    o_orderkey) AS rn
  FROM orders) t
WHERE rn = 1
"""


def d2_distinct_values(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    return c.select("c_mktsegment").distinct()


D2_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def d3_distinct_rows(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").dropDuplicates()


D3_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

# ---------------------------------------------------------------------------
# §2.4 joins
# ---------------------------------------------------------------------------


def j2_broadcast_enrich(spark, sf_dir):
    # J2/J3/J9: chained broadcast dimension enrichment — the fact side
    # (orders) is never shuffled for these joins.
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    enriched = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return enriched.groupBy("r_name").agg(
        F.count("*").alias("n_orders"),
        money_sum("o_totalprice").alias("sum_total"),
    )


J2_SQL = f"""
SELECT r_name, COUNT(*) AS n_orders, {SQL_MONEY_SUM('o_totalprice')} AS sum_total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def j4_fallback_join(spark, sf_dir):
    # J4: left join on the fine key with coarse-key fallback (deflator
    # (iso3,year) else DAC-by-year, code/04:117-118). Suppliers cover only
    # some nations, forcing the fallback path.
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    nation_avg = s.groupBy(F.col("s_nationkey").alias("c_nationkey")).agg(
        money_avg("s_acctbal").alias("nation_avg")
    )
    global_avg = s.agg(money_avg("s_acctbal").alias("global_avg"))
    enriched = (
        c.join(F.broadcast(nation_avg), "c_nationkey", "left")
        .crossJoin(F.broadcast(global_avg))
        .withColumn("deflator", F.coalesce("nation_avg", "global_avg"))
    )
    return enriched.groupBy("c_nationkey", "deflator").agg(
        F.count("*").alias("n_customers")
    )


J4_SQL = f"""
WITH nation_avg AS (
  SELECT s_nationkey AS c_nationkey, {SQL_MONEY_AVG('s_acctbal')} AS nation_avg
  FROM supplier GROUP BY s_nationkey),
global_avg AS (SELECT {SQL_MONEY_AVG('s_acctbal')} AS global_avg FROM supplier)
SELECT c_nationkey, COALESCE(nation_avg, global_avg) AS deflator,
       COUNT(*) AS n_customers
FROM customer
LEFT JOIN nation_avg USING (c_nationkey)
CROSS JOIN global_avg
GROUP BY 1, 2
"""


def j5_full_outer_fill(spark, sf_dir):
    # J5/J13: full-outer join of two aggregates + zero-fill.
    o = T(spark, sf_dir, "orders")
    big = (
        o.filter(F.col("o_totalprice") > 50000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    small = (
        o.filter(F.col("o_totalprice") < 5000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_small"))
    )
    return (
        big.join(small, "o_custkey", "full_outer")
        .fillna(0, subset=["n_big", "n_small"])
        .select("o_custkey", "n_big", "n_small")
    )


J5_SQL = """
WITH big AS (
  SELECT o_custkey, COUNT(*) AS n_big FROM orders
  WHERE o_totalprice > 50000 GROUP BY o_custkey),
small AS (
  SELECT o_custkey, COUNT(*) AS n_small FROM orders
  WHERE o_totalprice < 5000 GROUP BY o_custkey)
SELECT COALESCE(big.o_custkey, small.o_custkey) AS o_custkey,
       COALESCE(n_big, 0) AS n_big, COALESCE(n_small, 0) AS n_small
FROM big FULL OUTER JOIN small ON big.o_custkey = small.o_custkey
"""


def j7_left_join_cast_keys(spark, sf_dir):
    # J7/J8: join keys string-cast on both sides (reference code/08:38,47).
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    joined = o.join(
        F.broadcast(c),
        o.o_custkey.cast("string") == c.c_custkey.cast("string"),
        "left",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        money_sum("o_totalprice").alias("sum_total"),
    )


J7_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders, {SQL_MONEY_SUM('o_totalprice')} AS sum_total
FROM orders LEFT JOIN customer
  ON CAST(o_custkey AS VARCHAR) = CAST(c_custkey AS VARCHAR)
GROUP BY c_mktsegment
"""


def j10_fuzzy_levenshtein(spark, sf_dir):
    # J10: nearest-name fuzzy join, threshold max(1, ceil(0.2*len)),
    # min-distance then lexicographic tie-break (code/10:129-158).
    n = T(spark, sf_dir, "nation")
    left = n.select(F.col("n_name").alias("name_a"))
    right = n.select(F.col("n_name").alias("name_b"))
    return J.fuzzy_name_join(
        left, right, "name_a", "name_b", exclude_equal=True
    )


J10_SQL = """
WITH cand AS (
  SELECT a.n_name AS name_a, b.n_name AS name_b,
         levenshtein(a.n_name, b.n_name) AS dist
  FROM nation a CROSS JOIN nation b
  WHERE levenshtein(a.n_name, b.n_name)
        <= GREATEST(1, CAST(CEIL(0.2 * LENGTH(a.n_name)) AS INTEGER))
    AND a.n_name <> b.n_name
)
SELECT name_a, name_b AS matched_name, distance
FROM (
  SELECT name_a, name_b, CAST(dist AS INTEGER) AS distance,
         ROW_NUMBER() OVER (PARTITION BY name_a ORDER BY dist, name_b) AS rn
  FROM cand) t
WHERE rn = 1
"""

SUBSTRING_NEEDLES = ["ring", "bolt", "gizmo", "widget", "nonexistent thing"]


def j11_substring_join(spark, sf_dir):
    # J11: word-boundary containment, shortest container wins
    # (code/10:161-210).
    p = T(spark, sf_dir, "part")
    needles = spark.createDataFrame(
        [(x,) for x in SUBSTRING_NEEDLES], "needle string"
    )
    # deterministic container choice: shortest p_name, then smallest key
    w = Window.partitionBy("needle").orderBy(
        F.length("p_name"), F.col("p_partkey")
    )
    cand = (
        needles.crossJoin(F.broadcast(p))
        .withColumn("__pat", F.concat(F.lit("\\b"), F.col("needle"), F.lit("\\b")))
        .filter(F.expr("rlike(p_name, __pat)"))
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("needle", "p_partkey", "p_name")
    )


J11_SQL = f"""
WITH needles AS (
  SELECT * FROM (VALUES {','.join("(" + repr(x) + ")" for x in SUBSTRING_NEEDLES)})
  AS t(needle)),
cand AS (
  SELECT needle, p_partkey, p_name
  FROM needles CROSS JOIN part
  WHERE regexp_matches(p_name, '\\b' || needle || '\\b'))
SELECT needle, p_partkey, p_name FROM (
  SELECT needle, p_partkey, p_name,
         ROW_NUMBER() OVER (PARTITION BY needle
                            ORDER BY LENGTH(p_name), p_partkey) AS rn
  FROM cand) t
WHERE rn = 1
"""


def j12_subtract_floor(spark, sf_dir):
    # J12: aggregate-subtraction join with zero floor
    # (reference pmax(PC - subgrant, 0), code/10:312-315).
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(money_sum("l_extendedprice").alias("returned_amt"))
    )
    return (
        o.join(returned, "o_orderkey", "left")
        .withColumn(
            "net",
            F.greatest(
                F.lit(0.0),
                F.col("o_totalprice") - F.coalesce("returned_amt", F.lit(0.0)),
            ),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("net").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_net"),
        )
    )


J12_SQL = f"""
WITH returned AS (
  SELECT l_orderkey AS o_orderkey,
         {SQL_MONEY_SUM('l_extendedprice')} AS returned_amt
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey)
SELECT o_orderstatus, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(GREATEST(0.0, o_totalprice - COALESCE(returned_amt, 0.0))
                 AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_net
FROM orders LEFT JOIN returned USING (o_orderkey)
GROUP BY o_orderstatus
"""


def j14_anti_waterfall(spark, sf_dir):
    # J14: priority union — later sources contribute only unseen keys
    # (FX waterfall OECD→WB→IFS, code/util_exchange_rates.R:62,77).
    o = T(spark, sf_dir, "orders")
    srcs = [
        o.filter(F.col("o_orderstatus") == st)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("src", F.lit(tag))
        for st, tag in [("F", "first"), ("O", "second"), ("P", "third")]
    ]
    out = J.anti_waterfall_union(srcs, ["o_custkey"])
    return out.groupBy("src").agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("sum_total"),
    )


J14_SQL = f"""
WITH s1 AS (SELECT o_custkey, o_orderkey, o_totalprice, 'first' AS src
            FROM orders WHERE o_orderstatus = 'F'),
s2 AS (SELECT o_custkey, o_orderkey, o_totalprice, 'second' AS src
       FROM orders WHERE o_orderstatus = 'O'
       AND NOT EXISTS (SELECT 1 FROM s1 WHERE s1.o_custkey = orders.o_custkey)),
s3 AS (SELECT o_custkey, o_orderkey, o_totalprice, 'third' AS src
       FROM orders WHERE o_orderstatus = 'P'
       AND NOT EXISTS (SELECT 1 FROM s1 WHERE s1.o_custkey = orders.o_custkey)
       AND NOT EXISTS (SELECT 1 FROM s2 WHERE s2.o_custkey = orders.o_custkey)),
unioned AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
SELECT src, COUNT(*) AS n, {SQL_MONEY_SUM('o_totalprice')} AS sum_total
FROM unioned GROUP BY src
"""


def j15_grid_scaffold(spark, sf_dir):
    # J15: dense key×year grid left-joined to sparse values
    # (iso3 × 1950-2025 FX grid, code/util_exchange_rates.R:30,83).
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(money_sum("o_totalprice").alias("revenue"))
    )
    grid = J.grid_scaffold(n, "n_name", 1995, 2001, "o_year", rev)
    return grid.select(
        "n_name", "o_year", F.coalesce("revenue", F.lit(0.0)).alias("revenue")
    )


J15_SQL = f"""
WITH rev AS (
  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {SQL_MONEY_SUM('o_totalprice')} AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
grid AS (
  SELECT n_name, CAST(y AS INTEGER) AS o_year
  FROM (SELECT DISTINCT n_name FROM nation)
  CROSS JOIN (SELECT unnest(generate_series(1995, 2001)) AS y))
SELECT grid.n_name, grid.o_year, COALESCE(revenue, 0.0) AS revenue
FROM grid LEFT JOIN rev ON grid.n_name = rev.n_name AND grid.o_year = rev.o_year
"""

# ---------------------------------------------------------------------------
# §2.5 aggregations
# ---------------------------------------------------------------------------


def a1_sum_clamped(spark, sf_dir):
    # A1: per-key percentage sum clamped at 100 → [0,1] (code/07:130-132).
    li = T(spark, sf_dir, "lineitem")
    return sum_clamped_percentage(
        li, "l_orderkey", "l_quantity", out_col="pct"
    )


A1_SQL = f"""
SELECT l_orderkey,
       LEAST(100.0, {SQL_MONEY_SUM('l_quantity')}) / 100.0 AS pct
FROM lineitem GROUP BY l_orderkey
"""


def a2_bool_any(spark, sf_dir):
    # A2: per-key boolean OR via max (code/07:143).
    li = T(spark, sf_dir, "lineitem")
    flagged = li.withColumn("is_return", F.col("l_returnflag") == "R")
    return bool_any(flagged, "l_orderkey", "is_return", "any_return")


A2_SQL = """
SELECT l_orderkey, MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1
       AS any_return
FROM lineitem GROUP BY l_orderkey
"""


def a3_group_sum_millions(spark, sf_dir):
    # A3: the FTS CVA aggregation shape — (year, org, type) → sum/1e6
    # (code/10:55-60).
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"), F.col("n_name"))
        .agg((money_sum("o_totalprice") / 1e6).alias("total_usd_m"))
    )


A3_SQL = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, n_name,
       {SQL_MONEY_SUM('o_totalprice')} / 1e6 AS total_usd_m
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2
"""


def a7_ratio_of_sums(spark, sf_dir):
    # A7: sum(a)/sum(b) per group (DAC deflator ratio, code/03:122-123).
    li = T(spark, sf_dir, "lineitem")
    return ratio_of_sums(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", "price_per_unit"
    )


A7_SQL = f"""
SELECT l_returnflag,
       {SQL_MONEY_SUM('l_extendedprice')} / {SQL_MONEY_SUM('l_quantity')}
       AS price_per_unit
FROM lineitem GROUP BY l_returnflag
"""


def a8_rollup(spark, sf_dir):
    # Beyond-reference reporting surface promised in SURVEY §2.5: rollup
    # with grouping ids for the multi-dimension reporting of GUIDE.md.
    o = T(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            money_sum("o_totalprice").alias("sum_total"),
        )
        .select(
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            F.col("n"),
            F.col("sum_total"),
        )
    )


A8_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {SQL_MONEY_SUM('o_totalprice')} AS sum_total
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def a9_latest_per_group(spark, sf_dir):
    # A9: extreme row per group, deterministic under ties (code/03:154-168).
    o = T(spark, sf_dir, "orders")
    latest = latest_row_per_group(
        o, ["o_custkey"], "o_orderdate", ["o_orderkey"]
    )
    return latest.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


A9_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn = 1
"""


def a10_geometric_growth(spark, sf_dir):
    # A10: per-group (last/first)^(1/span) (code/03:154-157). Aggregate to
    # unique (cust, year) first so min_by/max_by are deterministic.
    o = T(spark, sf_dir, "orders")
    per_year = (
        o.groupBy(
            "o_custkey", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(money_sum("o_totalprice").alias("total"))
    )
    out = geometric_growth(per_year, ["o_custkey"], "o_year", "total")
    return out.filter(
        F.col("last_o_year") > F.col("first_o_year")
    ).select("o_custkey", "growth", "first_o_year", "last_o_year")


A10_SQL = f"""
WITH per_year AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {SQL_MONEY_SUM('o_totalprice')} AS total
  FROM orders GROUP BY 1, 2),
bounds AS (
  SELECT o_custkey, MIN(o_year) AS first_o_year, MAX(o_year) AS last_o_year,
         arg_min(total, o_year) AS first_total,
         arg_max(total, o_year) AS last_total
  FROM per_year GROUP BY o_custkey)
SELECT o_custkey,
       ROUND(POW(last_total / first_total,
                 1.0 / (last_o_year - first_o_year)), 6) AS growth,
       first_o_year, last_o_year
FROM bounds WHERE last_o_year > first_o_year
"""

# ---------------------------------------------------------------------------
# §2.6 windows
# ---------------------------------------------------------------------------


def w1_cumprod(spark, sf_dir):
    # W1: per-group cumulative product via exp(sum(ln)) —
    # deflator growth compounding (code/03:76-77).
    # (l_orderkey, l_linenumber) is NOT unique in the testdata; ordering by
    # the growth value too makes the running product well-defined (rows tied
    # on both keys are identical factors, which commute).
    li = T(spark, sf_dir, "lineitem").withColumn(
        "growth", 1.0 + F.col("l_discount")
    )
    out = W.cumulative_product(
        li, "growth", ["l_orderkey"], ["l_linenumber", "growth"], "cum_growth"
    )
    return out.select("l_orderkey", "l_linenumber", "cum_growth")


W1_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(EXP(SUM(LN(1.0 + l_discount)) OVER (
         PARTITION BY l_orderkey ORDER BY l_linenumber, l_discount
         ROWS UNBOUNDED PRECEDING)), 6) AS cum_growth
FROM lineitem
"""


def w2_rebase_anchor(spark, sf_dir):
    # W2: rebase to group anchor row (value / value[base], code/03:78,82).
    li = T(spark, sf_dir, "lineitem")
    out = W.rebase_to_anchor(
        li,
        "l_extendedprice",
        F.col("l_linenumber") == 1,
        ["l_orderkey"],
        "rebased",
    )
    return out.select("l_orderkey", "l_linenumber", "rebased")


W2_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice / MAX(CASE WHEN l_linenumber = 1 THEN l_extendedprice END)
         OVER (PARTITION BY l_orderkey) AS rebased
FROM lineitem
"""


def w3_lead(spark, sf_dir):
    # W3: next-row lookahead (shift(value,-1), code/03:77).
    o = T(spark, sf_dir, "orders")
    out = W.lead_value(
        o, "o_totalprice", ["o_custkey"], ["o_orderdate", "o_orderkey"],
        "next_total",
    )
    return out.select("o_custkey", "o_orderkey", "next_total")


W3_SQL = """
SELECT o_custkey, o_orderkey,
       LEAD(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_total
FROM orders
"""


def w4_reverse_cumprod(spark, sf_dir):
    # W4: reverse cumulative product (deflator back-fill, code/03:164-165).
    li = T(spark, sf_dir, "lineitem").withColumn(
        "growth", 1.0 + F.col("l_tax")
    )
    out = W.cumulative_product(
        li,
        "growth",
        ["l_orderkey"],
        ["l_linenumber", "growth"],
        "rev_cum_growth",
        reverse=True,
    )
    return out.select("l_orderkey", "l_linenumber", "rev_cum_growth")


W4_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(EXP(SUM(LN(1.0 + l_tax)) OVER (
         PARTITION BY l_orderkey ORDER BY l_linenumber DESC, l_tax DESC
         ROWS UNBOUNDED PRECEDING)), 6) AS rev_cum_growth
FROM lineitem
"""


def w5_top1_per_group(spark, sf_dir):
    # W5: deterministic best-row-per-group (code/10:139,173).
    o = T(spark, sf_dir, "orders")
    out = W.top1_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
    )
    return out.select("o_custkey", "o_orderkey", "o_totalprice")


W5_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# §2.7 reshape
# ---------------------------------------------------------------------------

# Deterministic packed-string construction shared by x1/cc5: parts get a
# '; '-packed tag list whose cardinality varies by p_size.
_PACK_SPARK = None  # built inline below


def _packed_parts(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    packed = when_cascade(
        F.col("p_brand"),
        [
            (
                F.col("p_size") % 3 == 0,
                F.concat_ws("; ", F.col("p_brand"), F.col("p_type")),
            ),
            (
                F.col("p_size") % 3 == 1,
                F.concat_ws(
                    "; ", F.col("p_brand"), F.col("p_type"), F.lit("EXTRA")
                ),
            ),
        ],
    )
    return p.withColumn("tags", packed)


_PACKED_SQL = """
  SELECT *, CASE
    WHEN p_size % 3 = 1 THEN p_brand || '; ' || p_type || '; ' || 'EXTRA'
    WHEN p_size % 3 = 0 THEN p_brand || '; ' || p_type
    ELSE p_brand END AS tags
  FROM part
"""


def x1_equal_split_explode(spark, sf_dir):
    # X1: the curate kernel — one row per packed part, amount divided by
    # part count; Σ preserved (code/02_fts_split_rows.R:8-21).
    p = _packed_parts(spark, sf_dir)
    out = X.split_rows_equal(
        p, "tags", amount_cols=["p_retailprice"], sep=";"
    )
    return out.select(
        "p_partkey",
        F.col("tags").alias("tag"),
        F.col("p_retailprice").alias("price_split"),
    )


X1_SQL = f"""
WITH packed AS ({_PACKED_SQL}),
exploded AS (
  SELECT p_partkey,
         TRIM(unnest(string_split(tags, ';'))) AS tag,
         p_retailprice / len(string_split(tags, ';')) AS price_split
  FROM packed)
SELECT p_partkey, tag, price_split FROM exploded
"""


def x2_union_ragged(spark, sf_dir):
    # X2: rbindlist(fill=TRUE) — union by name, null-filling missing cols.
    o = T(spark, sf_dir, "orders")
    a = o.select("o_orderkey", "o_totalprice")
    b = o.select("o_orderkey", "o_orderstatus")
    u = X.union_ragged([a, b])
    return u.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("sum_total"),
    )


X2_SQL = f"""
WITH u AS (
  SELECT o_orderkey, o_totalprice FROM orders
  UNION ALL BY NAME
  SELECT o_orderkey, o_orderstatus FROM orders)
SELECT o_orderstatus, COUNT(*) AS n, {SQL_MONEY_SUM('o_totalprice')} AS sum_total
FROM u GROUP BY o_orderstatus
"""


def x3_melt(spark, sf_dir):
    # X3: wide→long unpivot (WEO year-columns melt, code/03:51-53).
    c = T(spark, sf_dir, "customer")
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        (F.col("c_acctbal") * 2).alias("acctbal_x2"),
    )
    return X.melt(
        wide, ["c_custkey"], ["acctbal", "acctbal_x2"], "metric", "value"
    )


X3_SQL = """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'acctbal_x2' AS metric, c_acctbal * 2 AS value FROM customer
"""


def x4_group_concat(spark, sf_dir):
    # X4: per-group sorted '; '-join (nested-object collapse,
    # code/01:50-72).
    li = T(spark, sf_dir, "lineitem")
    out = X.collapse_group_concat(
        li.select(
            "l_orderkey",
            F.concat_ws("-", "l_returnflag", "l_linestatus").alias("flag"),
        ),
        ["l_orderkey"],
        ["flag"],
    )
    return out.select("l_orderkey", "flag")


X4_SQL = """
SELECT l_orderkey,
       string_agg(flag, '; ' ORDER BY flag) AS flag
FROM (SELECT l_orderkey, l_returnflag || '-' || l_linestatus AS flag
      FROM lineitem) t
GROUP BY l_orderkey
"""

FANOUT_MAPPING = [
    ("REGION_0", "REGION_0_COPY1"),
    ("REGION_0", "REGION_0_COPY2"),
    ("REGION_3", "REGION_3_COPY"),
]


def x7_row_fanout(spark, sf_dir):
    # X7: duplicate rows for dependent keys via broadcast mapping
    # (territory fan-out, code/03:131-147).
    r = T(spark, sf_dir, "region")
    out = X.fan_out_rows(r, "r_name", FANOUT_MAPPING)
    return out.select("r_regionkey", "r_name")


X7_SQL = f"""
WITH mapping AS (
  SELECT * FROM (VALUES
    {','.join(f"({src!r}, {dst!r})" for src, dst in FANOUT_MAPPING)})
  AS t(src, dst))
SELECT r_regionkey, r_name FROM region
UNION ALL
SELECT r_regionkey, dst AS r_name
FROM region JOIN mapping ON r_name = src
"""

# ---------------------------------------------------------------------------
# §2.8 set operations
# ---------------------------------------------------------------------------


def so1_except_all(spark, sf_dir):
    # SO1: setdiff with multiplicity (reference setdiff, code/07:89).
    o = T(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_orderpriority")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_orderpriority")
    return y95.exceptAll(y96).groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    )


SO1_SQL = """
WITH diff AS (
  SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1995
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996)
SELECT o_orderpriority, COUNT(*) AS n FROM diff GROUP BY o_orderpriority
"""


def so2_intersect(spark, sf_dir):
    # SO3-adjacent: distinct intersection of two derived key sets.
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


SO2_SQL = """
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""

# ---------------------------------------------------------------------------
# §2.9 scalar functions
# ---------------------------------------------------------------------------

KEYWORDS = ["spark", "stream", "vector"]


def c1_keyword_flag(spark, sf_dir):
    # C1: case-insensitive word-boundary alternation (the CVA keyword
    # regex, code/08:92-131).
    d = T(spark, sf_dir, "documents")
    pattern = "(?i)\\b(" + "|".join(KEYWORDS) + ")\\b"
    return (
        d.withColumn("keyword_match", F.col("text").rlike(pattern))
        .groupBy("lang", "keyword_match")
        .agg(F.count("*").alias("n"))
    )


C1_SQL = f"""
SELECT lang, regexp_matches(text, '(?i)\\b({'|'.join(KEYWORDS)})\\b')
       AS keyword_match, COUNT(*) AS n
FROM documents GROUP BY 1, 2
"""


def c2_regexp_extract_cast(spark, sf_dir):
    # C2/C10: regex extract + cast (percentage normalization pattern,
    # code/07:104-128; comma-stripped numeric cast, code/03:54).
    e = T(spark, sf_dir, "events")
    return (
        e.withColumn(
            "k", F.regexp_extract("props", "(\\d+)", 1).cast("int")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


C2_SQL = """
SELECT event_type,
       CAST(SUM(CAST(regexp_extract(props, '(\\d+)', 1) AS INTEGER)) AS BIGINT)
         AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def c5_canonicalize(spark, sf_dir):
    # C5: name canonicalization (code/10:88-105) applied to noisy input.
    p = T(spark, sf_dir, "part")
    noisy = F.concat(F.upper("p_name"), F.lit("!! ("), F.col("p_brand"), F.lit(")"))
    return p.select(
        "p_partkey", canonicalize_name(noisy).alias("canonical")
    )


C5_SQL = """
SELECT p_partkey,
       TRIM(regexp_replace(regexp_replace(
         LOWER(UPPER(p_name) || '!! (' || p_brand || ')'),
         '[!-/:-@\\[-`{-~]', ' ', 'g'), '\\s+', ' ', 'g')) AS canonical
FROM part
"""


def c8_conditional_clamp(spark, sf_dir):
    # C8/C11: when/otherwise + greatest-zero clamp + null fill
    # (ifelse/pmax, code/10:315; NA→0, code/10:313).
    c = T(spark, sf_dir, "customer")
    return (
        c.withColumn("bal_floor", F.greatest(F.lit(0.0), F.col("c_acctbal")))
        .withColumn(
            "tier",
            F.when(F.col("c_acctbal") > 5000, "high")
            .when(F.col("c_acctbal") > 0, "low")
            .otherwise("neg"),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            money_sum("bal_floor").alias("sum_floor"),
        )
    )


C8_SQL = f"""
SELECT CASE WHEN c_acctbal > 5000 THEN 'high'
            WHEN c_acctbal > 0 THEN 'low' ELSE 'neg' END AS tier,
       COUNT(*) AS n,
       {SQL_MONEY_SUM('GREATEST(0.0, c_acctbal)')} AS sum_floor
FROM customer GROUP BY 1
"""


def c12_coalesce_waterfall(spark, sf_dir):
    # C12: first-non-null waterfall across match stages (code/10:293-299).
    c = T(spark, sf_dir, "customer")
    stage1 = F.when(F.col("c_acctbal") > 7500, F.lit("exact"))
    stage2 = F.when(F.col("c_acctbal") > 5000, F.lit("fuzzy"))
    stage3 = F.when(F.col("c_acctbal") > 2500, F.lit("substring"))
    return (
        c.withColumn(
            "match_method", F.coalesce(stage1, stage2, stage3, F.lit("none"))
        )
        .groupBy("match_method")
        .agg(F.count("*").alias("n"))
    )


C12_SQL = """
SELECT COALESCE(CASE WHEN c_acctbal > 7500 THEN 'exact' END,
                CASE WHEN c_acctbal > 5000 THEN 'fuzzy' END,
                CASE WHEN c_acctbal > 2500 THEN 'substring' END,
                'none') AS match_method,
       COUNT(*) AS n
FROM customer GROUP BY 1
"""

# ---------------------------------------------------------------------------
# §2.10 cascades
# ---------------------------------------------------------------------------

CASH_PRIORITIES = ["1-URGENT", "2-HIGH"]


def cc1_relevance_cascade(spark, sf_dir):
    # CC1: ordered overwrite cascade with the Partial-overrides-Full rule
    # (code/08:121-128), as ONE when-chain.
    o = T(spark, sf_dir, "orders")
    relevance = when_cascade(
        F.lit("None"),
        [
            (F.col("o_orderpriority") == "1-URGENT", F.lit("Full")),
            (F.col("o_orderstatus") == "F", F.lit("Full")),
            (
                (F.col("o_orderpriority") == "2-HIGH")
                & (F.col("o_orderstatus") == "F"),
                F.lit("Partial"),
            ),
        ],
    )
    return (
        o.withColumn("relevance", relevance)
        .groupBy("relevance")
        .agg(
            F.count("*").alias("n"),
            money_sum("o_totalprice").alias("sum_total"),
        )
    )


# the equivalent single CASE checks the LAST rule first
CC1_SQL = f"""
SELECT CASE
         WHEN o_orderpriority = '2-HIGH' AND o_orderstatus = 'F' THEN 'Partial'
         WHEN o_orderstatus = 'F' THEN 'Full'
         WHEN o_orderpriority = '1-URGENT' THEN 'Full'
         ELSE 'None' END AS relevance,
       COUNT(*) AS n, {SQL_MONEY_SUM('o_totalprice')} AS sum_total
FROM orders GROUP BY 1
"""


def cc3_amount_cascade(spark, sf_dir):
    # CC3: the CVA amount cascade (code/09:29-54,84-86) — later rules fire
    # only where earlier ones left amount at 0; encoded as accumulated
    # negations so the whole cascade is one deterministic projection.
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    cluster_count = li.groupBy(
        F.col("l_orderkey").alias("o_orderkey")
    ).agg(F.count("*").alias("n_clusters"))
    df = o.join(cluster_count, "o_orderkey", "left").withColumns(
        {
            "relevance": when_cascade(
                F.lit("None"),
                [
                    (F.col("o_orderpriority") == "1-URGENT", F.lit("Full")),
                    (
                        (F.col("o_orderpriority") == "2-HIGH")
                        & (F.col("o_orderstatus") == "F"),
                        F.lit("Partial"),
                    ),
                ],
            ),
            "pct": (F.col("o_custkey") % 100) / 100.0,
            "confidence": ((F.col("o_orderkey") * 2654435761) % 1000) / 1000.0,
            "common_words": F.col("o_orderpriority").contains("H"),
            "manual_accept": F.col("o_orderkey") % 97 == 0,
        }
    )
    from calp_cva_tracking_pipeline_spark.operators.cascade import (
        cva_amount_cascade,
    )

    amount, amount_type = cva_amount_cascade(
        relevance=F.col("relevance"),
        amount=F.col("o_totalprice"),
        cluster_count=F.col("n_clusters"),
        pct=F.col("pct"),
        confidence=F.col("confidence"),
        common_words=F.col("common_words"),
        manual_accept=F.col("manual_accept"),
    )
    return (
        df.withColumn("CVAamount", amount)
        .withColumn("CVAamount_type", amount_type)
        .groupBy("CVAamount_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("CVAamount").cast("decimal(27,6)")).cast("double"),
                2,
            ).alias("sum_cva"),
        )
    )


CC3_SQL = """
WITH cc AS (
  SELECT l_orderkey AS lk, COUNT(*) AS n_clusters FROM lineitem
  GROUP BY l_orderkey),
base AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderpriority,
         o.o_orderstatus, cc.n_clusters,
         CASE
           WHEN o.o_orderpriority = '2-HIGH' AND o.o_orderstatus = 'F'
             THEN 'Partial'
           WHEN o.o_orderpriority = '1-URGENT' THEN 'Full'
           ELSE 'None' END AS relevance,
         (o.o_custkey % 100) / 100.0 AS pct,
         ((o.o_orderkey * 2654435761) % 1000) / 1000.0 AS confidence,
         o.o_orderpriority LIKE '%H%' AS common_words,
         o.o_orderkey % 97 = 0 AS manual_accept
  FROM orders o LEFT JOIN cc ON o.o_orderkey = cc.lk),
calc AS (
  SELECT *,
    CASE
      WHEN relevance = 'Full' THEN o_totalprice
      WHEN relevance = 'Partial' THEN o_totalprice / n_clusters
      WHEN pct IS NOT NULL AND pct > 0 THEN o_totalprice * pct
      WHEN confidence >= 0.8 AND common_words THEN o_totalprice
      WHEN manual_accept THEN o_totalprice
      ELSE 0.0 END AS CVAamount,
    CASE
      WHEN relevance = 'Full' THEN 'Sector, method, cluster'
      WHEN relevance = 'Partial' THEN 'Partial cluster'
      WHEN pct IS NOT NULL AND pct > 0 THEN 'Project CVA percentage'
      WHEN confidence >= 0.8 AND common_words THEN 'ML high predicted relevance'
      WHEN manual_accept THEN 'Manual'
      ELSE '' END AS CVAamount_type
  FROM base)
SELECT CVAamount_type, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(CVAamount AS DECIMAL(27,6))) AS DOUBLE), 2) AS sum_cva
FROM calc GROUP BY CVAamount_type
"""


def cc5_multi_collapse(spark, sf_dir):
    # CC5: '; '-packed multi-value → MULTI sentinel (code/04:97-98).
    p = _packed_parts(spark, sf_dir)
    from calp_cva_tracking_pipeline_spark.operators.cascade import (
        multi_destination_collapse,
    )

    name, iso = multi_destination_collapse(
        F.col("tags"), F.col("p_brand")
    )
    return (
        p.withColumn("dest_name", name)
        .withColumn("dest_code", iso)
        .groupBy("dest_name", "dest_code")
        .agg(F.count("*").alias("n"))
    )


CC5_SQL = f"""
WITH packed AS ({_PACKED_SQL})
SELECT CASE WHEN tags LIKE '%;%' THEN 'Multi-destination_org_country'
            ELSE tags END AS dest_name,
       CASE WHEN tags LIKE '%;%' THEN 'MULTI' ELSE p_brand END AS dest_code,
       COUNT(*) AS n
FROM packed GROUP BY 1, 2
"""


RELATIONAL_QUERIES = {
    "f1_filter_neq": (f1_filter_neq, F1_SQL),
    "f3_year_floor_string": (f3_year_floor_string, F3_SQL),
    "f4_in_list": (f4_in_list, F4_SQL),
    "f5_anti_join": (f5_anti_join, F5_SQL),
    "f7_positive_finite": (f7_positive_finite, F7_SQL),
    "f10_regex_filter": (f10_regex_filter, F10_SQL),
    "f11_projection_rename": (f11_projection_rename, F11_SQL),
    "d1_priority_dedup": (d1_priority_dedup, D1_SQL),
    "d2_distinct_values": (d2_distinct_values, D2_SQL),
    "d3_distinct_rows": (d3_distinct_rows, D3_SQL),
    "j2_broadcast_enrich": (j2_broadcast_enrich, J2_SQL),
    "j4_fallback_join": (j4_fallback_join, J4_SQL),
    "j5_full_outer_fill": (j5_full_outer_fill, J5_SQL),
    "j7_left_join_cast_keys": (j7_left_join_cast_keys, J7_SQL),
    "j10_fuzzy_levenshtein": (j10_fuzzy_levenshtein, J10_SQL),
    "j11_substring_join": (j11_substring_join, J11_SQL),
    "j12_subtract_floor": (j12_subtract_floor, J12_SQL),
    "j14_anti_waterfall": (j14_anti_waterfall, J14_SQL),
    "j15_grid_scaffold": (j15_grid_scaffold, J15_SQL),
    "a1_sum_clamped": (a1_sum_clamped, A1_SQL),
    "a2_bool_any": (a2_bool_any, A2_SQL),
    "a3_group_sum_millions": (a3_group_sum_millions, A3_SQL),
    "a7_ratio_of_sums": (a7_ratio_of_sums, A7_SQL),
    "a8_rollup": (a8_rollup, A8_SQL),
    "a9_latest_per_group": (a9_latest_per_group, A9_SQL),
    "a10_geometric_growth": (a10_geometric_growth, A10_SQL),
    "w1_cumprod": (w1_cumprod, W1_SQL),
    "w2_rebase_anchor": (w2_rebase_anchor, W2_SQL),
    "w3_lead": (w3_lead, W3_SQL),
    "w4_reverse_cumprod": (w4_reverse_cumprod, W4_SQL),
    "w5_top1_per_group": (w5_top1_per_group, W5_SQL),
    "x1_equal_split_explode": (x1_equal_split_explode, X1_SQL),
    "x2_union_ragged": (x2_union_ragged, X2_SQL),
    "x3_melt": (x3_melt, X3_SQL),
    "x4_group_concat": (x4_group_concat, X4_SQL),
    "x7_row_fanout": (x7_row_fanout, X7_SQL),
    "so1_except_all": (so1_except_all, SO1_SQL),
    "so2_intersect": (so2_intersect, SO2_SQL),
    "c1_keyword_flag": (c1_keyword_flag, C1_SQL),
    "c2_regexp_extract_cast": (c2_regexp_extract_cast, C2_SQL),
    "c5_canonicalize": (c5_canonicalize, C5_SQL),
    "c8_conditional_clamp": (c8_conditional_clamp, C8_SQL),
    "c12_coalesce_waterfall": (c12_coalesce_waterfall, C12_SQL),
    "cc1_relevance_cascade": (cc1_relevance_cascade, CC1_SQL),
    "cc3_amount_cascade": (cc3_amount_cascade, CC3_SQL),
    "cc5_multi_collapse": (cc5_multi_collapse, CC5_SQL),
}
