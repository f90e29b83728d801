"""SURVEY.md §2 relational operator matrix over the driver's TPC-H-ish
tables, each with a DuckDB oracle.

The reference's "query capability" is a fixed script DAG of map / filter /
lookup-join / group-aggregate / dedup steps (SURVEY.md §0.3); this module
re-expresses each capability class as a declarative DataFrame plan so
Catalyst handles pushdown/pruning/join-strategy (SURVEY.md §4), and pins
the semantics with ANSI SQL the driver cross-checks via DuckDB.

Scale notes are on each operator: which side broadcasts, where the shuffle
is, what AQE is expected to do.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .qreg import load, register

# ---------------------------------------------------------------------------
# (a) scans
# ---------------------------------------------------------------------------


@register(
    "scan_parquet",
    sql="""SELECT l_orderkey, l_partkey, l_quantity
           FROM lineitem WHERE l_quantity > 45""",
)
def scan_parquet(spark, sf):
    # filter + projection reach the parquet scan (PushedFilters/ReadSchema)
    return (
        load(spark, sf, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


# ---------------------------------------------------------------------------
# (b) projection / filter
# ---------------------------------------------------------------------------


@register(
    "proj_select",
    sql="""SELECT c_custkey AS custkey, c_name AS name,
                  c_acctbal * 2 + 10 AS adj_bal
           FROM customer""",
)
def proj_select(spark, sf):
    # *2 and +10 are exact in binary floating point — no cross-engine
    # rounding-mode drift (ROUND(x*1.1, 2) is HALF_UP in Spark, HALF_EVEN
    # in DuckDB)
    return load(spark, sf, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        (F.col("c_acctbal") * 2 + 10).alias("adj_bal"),
    )


@register(
    "filter_pred",
    sql="""SELECT o_orderkey, o_totalprice, o_orderpriority
           FROM orders
           WHERE (o_orderstatus = 'O' AND o_totalprice > 100000)
              OR (o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice <= 5000)""",
)
def filter_pred(spark, sf):
    o = load(spark, sf, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000))
        | (
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_totalprice") <= 5000)
        )
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "proj_normalize_text",
    sql="""SELECT doc_id,
                  LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS text_norm
           FROM documents""",
)
def proj_normalize_text(spark, sf):
    from .extract import normalize_text_col

    return load(spark, sf, "documents").select(
        "doc_id", normalize_text_col(F.col("text")).alias("text_norm")
    )


# ---------------------------------------------------------------------------
# (c) joins
# ---------------------------------------------------------------------------


@register(
    "join_broadcast",
    sql="""SELECT c.c_mktsegment AS segment, COUNT(*) AS n_orders,
                  ROUND(SUM(o.o_totalprice), 2) AS revenue
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY c.c_mktsegment""",
)
def join_broadcast(spark, sf):
    # dim side explicitly broadcast: BroadcastHashJoin, no shuffle of orders
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "join_shuffle_hash",
    sql="""SELECT o.o_orderpriority AS priority,
                  ROUND(SUM(l.l_quantity), 2) AS total_qty
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           GROUP BY o.o_orderpriority""",
)
def join_shuffle_hash(spark, sf):
    # large-large equi-join: strategy left to Catalyst/AQE (SMJ or SHJ)
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "join_salted_skew",
    sql="""SELECT s.s_name AS supplier, COUNT(*) AS n_items,
                  ROUND(SUM(l.l_extendedprice), 2) AS volume
           FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           GROUP BY s.s_name""",
)
def join_salted_skew(spark, sf):
    """Skew-safe join: fact side salted pmod(xxhash64(key),K), dim side
    exploded over 0..K-1, equi-join on (key, salt). Same result as the plain
    join — the salt only fans hot keys across K tasks (BASELINE.json:
    'salted aggregation keys')."""
    K = 8
    l = load(spark, sf, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(K)).cast("int")
    )
    s = load(spark, sf, "supplier").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(K)]))
    )
    return (
        l.join(s, (l.l_suppkey == s.s_suppkey) & (l.salt == s.salt))
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("volume"),
        )
    )


@register(
    "join_semi",
    sql="""SELECT c_custkey, c_name FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def join_semi(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    sql="""SELECT c_custkey, c_name FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def join_anti(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_outer",
    sql="""SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
                  ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS spend
           FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           GROUP BY c.c_custkey""",
)
def join_outer(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias("spend"),
        )
    )


@register(
    "join_range_asof",
    sql="""SELECT e1.event_id, COUNT(e2.event_id) AS prior_cnt
           FROM events e1 LEFT JOIN events e2
             ON e1.user_id = e2.user_id
            AND e2.ts >= e1.ts - INTERVAL 1 HOUR AND e2.ts < e1.ts
           GROUP BY e1.event_id""",
)
def join_range_asof(spark, sf):
    """Interval query: per event, how many events the same user produced in
    the preceding hour.

    Plan: a RANGE window over unix_micros(ts), partitioned by user_id —
    ONE shuffle + ONE sort, zero joins. The r1 formulation (equi-join on
    user_id with the 1-hour bound as a post-join predicate) generated
    O(per-user-rows²) candidate pairs before filtering — a blow-up on any
    hot user at scale; the window frame [-3600s, -1µs] visits each row's
    candidates in the already-sorted run instead. Frame bounds are in
    microseconds (parquet timestamp precision), so `ts ∈ [cur-1h, cur)`
    is matched exactly, including sub-second event times."""
    e = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        # parquet ts is TIMESTAMP_NTZ; the cast only anchors a timezone and
        # is order/difference-preserving, so the range frame is unaffected
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, -1)
    )
    return e.select(
        "event_id", F.count(F.lit(1)).over(w).alias("prior_cnt")
    )


@register(
    "join_asof",
    sql="""WITH dim AS (
             SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS valid_from,
                    COUNT(*) AS day_cnt
             FROM events GROUP BY event_type, DATE_TRUNC('day', ts))
           SELECT e.event_id, d.day_cnt
           FROM events e ASOF JOIN dim d
             ON e.event_type = d.event_type AND e.ts >= d.valid_from""",
)
def join_asof(spark, sf):
    """True as-of join: each event picks the LATEST dim snapshot with
    valid_from <= ts (slowly-changing dictionary pattern, SURVEY §2(c)).

    Implementation: broadcast the (small) dim, equi-join on the key with the
    non-equi bound as a join predicate, keep top-1 by valid_from desc via a
    window — candidate count per row is bounded by the dim's history length,
    never a full nested loop. At 100 TB with a large dim, the same semantics
    come from the union + last(ignorenulls) over ts-ordering trick on a
    bucketed sort."""
    e = load(spark, sf, "events")
    # integer dim attribute: AVG over doubles accumulates in a different
    # order per engine/partitioning, so ROUND(AVG,k) can flip on boundaries
    dim = (
        e.groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("valid_from"),
        )
        .agg(F.count("*").alias("day_cnt"))
        .withColumnRenamed("event_type", "d_event_type")
    )
    j = e.join(
        F.broadcast(dim),
        (e.event_type == dim.d_event_type) & (e.ts >= dim.valid_from),
    )
    w = Window.partitionBy("event_id").orderBy(F.desc("valid_from"))
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "day_cnt")
    )


# ---------------------------------------------------------------------------
# (d) aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_hash",
    sql="""SELECT l_returnflag, l_linestatus,
                  ROUND(SUM(l_quantity), 2) AS sum_qty,
                  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                  ROUND(AVG(l_quantity), 4) AS avg_qty,
                  COUNT(*) AS count_order
           FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def agg_hash(spark, sf):
    # TPC-H Q1 shape: partial+final HashAggregate, map-side combine free
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_salted_twophase",
    sql="""SELECT l_suppkey AS suppkey,
                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
                  COUNT(*) AS n
           FROM lineitem GROUP BY l_suppkey""",
)
def agg_salted_twophase(spark, sf):
    """Skew-safe aggregation: pre-aggregate on (key, salt), merge on key.
    Integer-domain measures so the two-phase float order cannot drift."""
    K = 8
    l = load(spark, sf, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(K)).cast("int")
    )
    partial = l.groupBy("l_suppkey", "salt").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("pq"),
        F.count("*").alias("pn"),
    )
    return partial.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum("pq").alias("total_qty"), F.sum("pn").alias("n")
    )


@register(
    "agg_distinct",
    sql="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def agg_distinct(spark, sf):
    return load(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register("agg_approx_distinct", sql=None)  # approximate -> rows-only check
def agg_approx_distinct(spark, sf):
    # HyperLogLog++: constant memory per group at any scale
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"))
    )


@register(
    "agg_collect",
    sql="""SELECT o_orderpriority AS priority,
                  ARRAY_TO_STRING(LIST(DISTINCT o_orderstatus ORDER BY o_orderstatus), ',') AS statuses
           FROM orders GROUP BY o_orderpriority""",
)
def agg_collect(spark, sf):
    # sort_array for determinism; string-join so the oracle hash is stable
    return (
        load(spark, sf, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias(
                "statuses"
            )
        )
    )


@register(
    "agg_grouping_sets",
    sql="""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
                  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
           FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def agg_grouping_sets(spark, sf):
    # gid (Spark grouping_id == DuckDB GROUPING bitmask, verified identical
    # int64 semantics) makes cube-generated NULLs distinguishable from data
    # NULLs should a nullable grouping column ever appear.
    return (
        load(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
            F.grouping_id().alias("gid"),
        )
    )


# ---------------------------------------------------------------------------
# (e) windows
# ---------------------------------------------------------------------------

def _w_cust():
    return Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


@register(
    "win_turn_order",
    sql="""SELECT o_orderkey, o_custkey,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS turn_rank
           FROM orders""",
)
def win_turn_order(spark, sf):
    # the W1 correctness anchor, exercised on the oracle-visible table
    return load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", F.row_number().over(_w_cust()).alias("turn_rank")
    )


@register(
    "win_topk_cand",
    sql="""SELECT * FROM (
             SELECT o_orderkey, o_custkey, o_totalprice,
                    ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
             FROM orders) WHERE rnk <= 3""",
)
def win_topk_cand(spark, sf):
    # top-k per group WITHOUT a global sort
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        load(spark, sf, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "win_lag_lead",
    sql="""SELECT o_orderkey,
                  ROUND(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
                  ROUND(LEAD(o_totalprice) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey), 2) AS next_price
           FROM orders""",
)
def win_lag_lead(spark, sf):
    return load(spark, sf, "orders").select(
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(_w_cust()), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(_w_cust()), 2).alias("next_price"),
    )


@register(
    "win_running",
    sql="""SELECT o_orderkey,
                  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
           FROM orders""",
)
def win_running(spark, sf):
    w = _w_cust().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load(spark, sf, "orders").select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend")
    )


@register(
    "win_ntile_rank",
    sql="""SELECT c_custkey,
                  RANK() OVER w AS rnk,
                  DENSE_RANK() OVER w AS drnk,
                  NTILE(4) OVER w AS quartile,
                  ROUND(PERCENT_RANK() OVER w, 6) AS prank
           FROM customer
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""",
)
def win_ntile_rank(spark, sf):
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return load(spark, sf, "customer").select(
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


# ---------------------------------------------------------------------------
# (f) sorts / limits
# ---------------------------------------------------------------------------


@register(
    "sort_global",
    sql="""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
           ORDER BY l_orderkey, l_linenumber LIMIT 100""",
)
def sort_global(spark, sf):
    # total order + limit -> TakeOrderedAndProject, not a full sort
    return (
        load(spark, sf, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .limit(100)
    )


@register(
    "sort_within_part",
    # the driver compare is order-insensitive, so the value oracle checks
    # CONTENT preservation (no lost/duplicated rows through the
    # repartition+sort); the physical ordering property itself is asserted
    # in tests/test_registry_new.py::test_sort_within_part_layout
    sql="SELECT l_orderkey, l_linenumber FROM lineitem",
)
def sort_within_part(spark, sf):
    return (
        load(spark, sf, "lineitem")
        .repartition(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber")
    )


@register(
    "limit_topk_global",
    sql="""SELECT p_partkey, p_name, p_retailprice FROM part
           ORDER BY p_retailprice DESC, p_partkey LIMIT 10""",
)
def limit_topk_global(spark, sf):
    return (
        load(spark, sf, "part")
        .orderBy(F.desc("p_retailprice"), "p_partkey")
        .select("p_partkey", "p_name", "p_retailprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# (g) set operations
# ---------------------------------------------------------------------------


@register(
    "set_union",
    sql="""SELECT c_nationkey AS nationkey FROM customer
           UNION SELECT s_nationkey FROM supplier""",
)
def set_union(spark, sf):
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "set_intersect",
    sql="""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
           INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
)
def set_intersect(spark, sf):
    o = load(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    sql="""SELECT c_custkey FROM customer
           EXCEPT SELECT o_custkey AS c_custkey FROM orders""",
)
def set_except(spark, sf):
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


# ---------------------------------------------------------------------------
# (h) scalar functions
# ---------------------------------------------------------------------------


@register(
    "str_funcs",
    sql="""SELECT p_partkey,
                  LOWER(p_name) AS name_lower,
                  UPPER(p_brand) AS brand_upper,
                  SUBSTRING(p_type, 1, 5) AS type_pfx,
                  LENGTH(p_name) AS name_len,
                  CONCAT_WS('-', p_brand, p_type) AS brand_type,
                  LEVENSHTEIN(p_brand, 'Brand#11') AS lev
           FROM part""",
)
def str_funcs(spark, sf):
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_pfx"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).alias("lev"),
    )


@register(
    "date_funcs",
    sql="""SELECT o_orderkey,
                  YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
                  DAY(o_orderdate) AS d,
                  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start
           FROM orders""",
)
def date_funcs(spark, sf):
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
    )


@register(
    "math_funcs",
    sql="""SELECT l_orderkey, l_linenumber,
                  l_extendedprice * (1 - l_discount) AS net,
                  ROUND(LN(l_quantity + 1), 6) AS log_qty,
                  GREATEST(l_tax, l_discount) AS max_rate,
                  LEAST(l_tax, l_discount) AS min_rate,
                  ABS(l_quantity - 25) AS qty_dev
           FROM lineitem""",
)
def math_funcs(spark, sf):
    l = load(spark, sf, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # raw double product: both engines compute the identical IEEE result;
        # ROUND here would diverge (HALF_UP vs HALF_EVEN) on .xx5 boundaries
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("log_qty"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
    )


@register(
    "array_funcs",
    sql="""SELECT vec_id,
                  LEN(embedding) AS n_dims,
                  ROUND(CAST(embedding[1] AS DOUBLE), 5) AS first_val,
                  ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_val
           FROM embeddings""",
)
def array_funcs(spark, sf):
    e = load(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(F.element_at("embedding", 1).cast("double"), 5).alias("first_val"),
        F.round(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            4,
        ).alias("sum_val"),
    )


@register(
    "map_funcs",
    sql="""SELECT event_id, event_type,
                  CAST(REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k_val
           FROM events""",
)
def map_funcs(spark, sf):
    from pyspark.sql.types import IntegerType, MapType, StringType

    e = load(spark, sf, "events")
    m = F.from_json("props", MapType(StringType(), IntegerType()))
    return e.select(
        "event_id", "event_type", F.element_at(m, "k").alias("k_val")
    )


@register(
    "json_funcs",
    sql="""SELECT event_id,
                  JSON_EXTRACT_STRING(props, '$.k') AS k_str
           FROM events""",
)
def json_funcs(spark, sf):
    e = load(spark, sf, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_str")
    )


@register(
    "hash_funcs",
    sql="""SELECT o_orderkey,
                  SHA256(CONCAT_WS('|', CAST(o_orderkey AS VARCHAR), o_orderstatus)) AS row_sha,
                  MD5(o_orderpriority) AS pri_md5
           FROM orders""",
)
def hash_funcs(spark, sf):
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.sha2(
            F.concat_ws("|", F.col("o_orderkey").cast("string"), "o_orderstatus"), 256
        ).alias("row_sha"),
        F.md5("o_orderpriority").alias("pri_md5"),
    )


# ---------------------------------------------------------------------------
# additional engine surface: pivot + deterministic sampling (training-data
# corpus sampling at 100 TB is a first-class op: seeded, partition-stable)
# ---------------------------------------------------------------------------


@register(
    "agg_pivot",
    sql="""SELECT l_returnflag,
                  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f,
                  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o
           FROM lineitem GROUP BY l_returnflag""",
)
def agg_pivot(spark, sf):
    """groupBy().pivot() with an EXPLICIT value list: at scale, never let
    pivot run its implicit distinct-scan to discover columns."""
    p = (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("bigint")))
    )
    return p.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    )


def _hash_bucket(key):
    """Engine-neutral deterministic sampling bucket in [0, 10000): first 8
    hex digits of md5(key) as an integer. Unlike a seeded Bernoulli sample
    (whose membership changes whenever the input partitioning changes —
    useless for a resumable pipeline), hash sampling is a pure row
    property: stable under repartitioning, across restarts, and across
    engines, which is what makes the full value oracle possible."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10000
    )


_HASH_BUCKET_SQL = (
    "CAST(CONCAT('0x', SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 10000"
)


@register(
    "sample_fraction",
    sql=f"SELECT * FROM orders WHERE {_HASH_BUCKET_SQL} < 1000",
)
def sample_fraction(spark, sf):
    """Deterministic 10% sample by md5 key bucket — the corpus-subsampling
    primitive (see _hash_bucket for why hash beats seeded Bernoulli at
    scale)."""
    o = load(spark, sf, "orders")
    return o.filter(_hash_bucket(F.col("o_orderkey")) < 1000)


@register(
    "sample_stratified",
    sql=f"""SELECT * FROM orders
            WHERE {_HASH_BUCKET_SQL} <
                  CASE o_orderstatus WHEN 'F' THEN 500 WHEN 'O' THEN 2000
                       ELSE 10000 END""",
)
def sample_stratified(spark, sf):
    """Per-stratum deterministic rates (downsample dominant strata, keep
    rare ones whole) — sampleBy semantics with a hash-bucket membership
    test instead of seeded RNG, for the same reproducibility reasons as
    sample_fraction."""
    o = load(spark, sf, "orders")
    rate = (
        F.when(F.col("o_orderstatus") == "F", 500)
        .when(F.col("o_orderstatus") == "O", 2000)
        .otherwise(10000)
    )
    return o.filter(_hash_bucket(F.col("o_orderkey")) < rate)
