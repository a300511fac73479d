"""Relational / aggregation coverage (TPC-H-shaped; SURVEY §2.6 extensions).

Split out of ``__spark_entry__.py`` (round 9): one module per query
family, registering into the shared registry on import. Entry bodies are
unchanged — see ``_registry`` for ``_register`` / ``_t`` / the index
builders, and ``__spark_entry__`` for the driver contract surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mortar_parquet_support_spark.plans.hints import maybe_broadcast

from ._registry import (
    _IVF_CACHE,
    _entry_digest,
    _register,
    _t,
    digest_index_for,
    ivf_index_for,
    pq_index_for,
)

# Relational / aggregation coverage (TPC-H-shaped; SURVEY §2.6 extensions)
# ===========================================================================

@_register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def _tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_register(
    "tpch_q3",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def _tpch_q3(spark, sf_dir):
    """Shipping priority: size-guarded broadcasts — guaranteed at bench SF,
    deferred to AQE when the filtered fact side outgrows the threshold."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(maybe_broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@_register(
    "tpch_q5",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def _tpch_q5(spark, sf_dir):
    """Local supplier volume: five joins; every dim side broadcast, the one
    fact shuffle keyed on l_orderkey."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(maybe_broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            maybe_broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_register(
    "tpch_q6",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def _tpch_q6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@_register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def _tpch_q10(spark, sf_dir):
    """Returned-item report (TPC-H Q10 shape on the available columns):
    fact shuffle on l_orderkey, every dim broadcast, deterministic top-20
    (c_custkey tiebreak so both engines agree on the cut line)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(maybe_broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_register(
    "tpch_q14",
    """
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def _tpch_q14(spark, sf_dir):
    """Promotion effect (TPC-H Q14 shape; testdata p_type is categorical so
    equality replaces LIKE 'PROMO%'): conditional aggregate over a
    broadcast dim join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@_register(
    "tpch_q18",
    """
    SELECT c_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
)
def _tpch_q18(spark, sf_dir):
    """Large-volume customers (TPC-H Q18 shape): self-aggregation of the
    fact drives a broadcast semi-join back onto it — the aggregate result is
    tiny even at 100 TB because the HAVING is selective."""
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(maybe_broadcast(big), "l_orderkey", "left_semi")
        .join(maybe_broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@_register(
    "tpch_q19",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 16 AND 40
           AND l_quantity BETWEEN 10 AND 35)
    """,
)
def _tpch_q19(spark, sf_dir):
    """Disjunctive-predicate join (TPC-H Q19 shape): the OR spans both
    sides, so it stays a post-join filter; the join itself remains a pure
    broadcast equi-join on partkey (no nested-loop fallback)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(maybe_broadcast(part), part.p_partkey == li.l_partkey)
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(16, 40)
        & F.col("l_quantity").between(10, 35)
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@_register(
    "cube_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def _cube_agg(spark, sf_dir):
    """Full CUBE grouping sets (complements rollup_agg's hierarchy):
    2^2 grouping sets computed in one pass + one shuffle."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


@_register(
    "range_join",
    """
    SELECT p.event_id AS purchase_id, e.event_id AS event_id,
           e.event_type AS event_type
    FROM events p JOIN events e
      ON p.user_id = e.user_id
     AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    """,
)
def _range_join(spark, sf_dir):
    """Interval/range join (declared-absent in the reference, SURVEY §2.6):
    follow-on events within 1h of each purchase. Equi on user_id carries the
    shuffle; the range lands as a post-join band predicate, so the plan is a
    hash join, not a nested loop over the cross product."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.select("event_id", "user_id", "ts", "event_type")
    return (
        p.join(
            e,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("ts") > F.col("p_ts"))
            & (F.col("ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("purchase_id", "event_id", "event_type")
    )


@_register(
    "window_frames",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ), 2) AS trailing_30d,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ), 4) AS ma4
    FROM orders
    """,
)
def _window_frames(spark, sf_dir):
    """Value-based RANGE frame (30-day trailing sum over epoch seconds —
    peer rows included by value, not position) + bounded sliding ROWS frame
    (4-row moving average, unique-key ordering so both engines agree on row
    position). Completes the frame-type coverage next to window_running's
    unbounded ROWS frame."""
    orders = _t(spark, sf_dir, "orders")
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    w_rows = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("trailing_30d"),
        F.round(F.avg("o_totalprice").over(w_rows), 4).alias("ma4"),
    )


@_register(
    "group_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def _group_distinct(spark, sf_dir):
    """Two EXACT count_distincts in one aggregate. Spark plans multiple
    distinct aggregates through Expand (each input row replicated once
    per distinct column, null-padded, then partial-deduped map-side) —
    the one known cost knob in this plan shape, and the reason
    operators/profile.py profile_table defaults to approx_count_distinct.
    Measured at sf1 (6M rows, local[32]): this Expand plan is ~1.0s
    steady-state, the two-single-distinct-aggregates + join rewrite is
    ~1.4s (two scans), and the approx variant below is ~0.35s. Exact
    stays the default; `group_distinct_approx` is the 100x scale path
    (fixed-size HLL sketch state, no Expand, no distinct-key shuffle)."""
    return _t(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@_register("group_distinct_approx")
def _group_distinct_approx(spark, sf_dir):
    """Approx (HLL++) variant of `group_distinct` — the scale path: one
    pass, no Expand, map-side sketch merge, shuffle carries one
    fixed-size sketch per (group, column) instead of every distinct key.
    Rows-only check (HLL estimates are engine-specific so no value
    oracle); tests/test_operators.py pins the estimates within the
    configured rsd against the exact counts."""
    return _t(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("n_supps"),
    )


@_register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def _rollup_agg(spark, sf_dir):
    """Hierarchical grouping-sets aggregate (declared-absent in the
    reference; SURVEY §2.6)."""
    return _t(spark, sf_dir, "lineitem").rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@_register(
    "window_topk",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def _window_topk(spark, sf_dir):
    """Top-k per group via ranking window (operators/timeseries.py
    topk_per_group)."""
    from mortar_parquet_support_spark.operators.timeseries import topk_per_group

    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return topk_per_group(
        orders,
        keys=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
        rank_col="rn",
    )


@_register(
    "window_running",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
)
def _window_running(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@_register(
    "pivot_status",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_partial
    FROM orders GROUP BY o_orderpriority
    """,
)
def _pivot_status(spark, sf_dir):
    """Pivot (explicit value list -> stable schema at any scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


@_register(
    "intersect_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def _intersect_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select("user_id").intersect(
        ev.filter(F.col("event_type") == "purchase").select("user_id")
    )


@_register(
    "except_users",
    """
    SELECT user_id FROM events
    WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-03 00:00:00'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03 00:00:00'
    """,
)
def _except_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("ts") < "2024-01-03 00:00:00")
    return (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .subtract(ev.filter(F.col("event_type") == "error").select("user_id"))
    )


@_register(
    "scalar_battery",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_type) AS type_len,
           abs(p_size - 25) AS size_dist,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           ROUND(sqrt(p_retailprice), 4) AS price_sqrt,
           coalesce(nullif(p_brand, 'Brand#13'), 'OTHER') AS brand_or_other,
           CASE WHEN p_size >= 30 THEN 'large' WHEN p_size >= 10 THEN 'mid' ELSE 'small' END AS size_class,
           greatest(p_size, 20) AS size_floor20
    FROM part
    """,
)
def _scalar_battery(spark, sf_dir):
    """String/math/conditional scalar-function coverage (SURVEY §2.6 —
    absent in the reference, required of an engine)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_type").alias("type_len"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#13")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.when(F.col("p_size") >= 30, "large")
        .when(F.col("p_size") >= 10, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.greatest("p_size", F.lit(20)).alias("size_floor20"),
    )


# ===========================================================================

@_register(
    "tpch_q8",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    ) GROUP BY o_year ORDER BY o_year
    """,
)
def _tpch_q8(spark, sf_dir):
    """National market share (TPC-H Q8 shape): seven-table star join —
    every dimension broadcasts, the lineitem fact never shuffles before
    the final 2-group aggregate. Two nation aliases (customer's region
    gate vs supplier's nation label)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(maybe_broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(maybe_broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(maybe_broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@_register(
    "tpch_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def _tpch_q13(spark, sf_dir):
    """Customer order-count distribution (TPC-H Q13 shape; the original's
    comment-LIKE exclusion becomes an orderpriority exclusion — same
    filtered-LEFT-JOIN-then-double-aggregate plan). count(o_orderkey)
    counts non-null keys, so customers with no surviving orders land in
    the c_count=0 bucket."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@_register(
    "tpch_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue FROM (
      SELECT s_suppkey, s_name, total_revenue,
             ROW_NUMBER() OVER (ORDER BY total_revenue DESC, s_suppkey) AS rn
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
    ) WHERE rn = 1
    """,
)
def _tpch_q15(spark, sf_dir):
    """Top supplier by quarterly revenue (TPC-H Q15 shape): the view-then-
    max becomes a deterministic rank-1 window on the ROUNDED revenue
    (suppkey tie-break) so both engines select the same supplier even on
    a revenue tie."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    supp = _t(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("total_revenue").desc(), F.col("s_suppkey"))
    return (
        supp.join(maybe_broadcast(revenue), supp.s_suppkey == revenue.supplier_no)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_register(
    "tpch_q17",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def _tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H Q17 shape; no container column
    in the fixture, brand filter only). The correlated scalar subquery
    decorrelates into a per-part average joined back — fixture quantities
    are small integers, so the avg is fp-exact and the strict < threshold
    is engine-stable."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(per_part), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@_register(
    "tpch_q22",
    """
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, c_acctbal
      FROM customer
      WHERE CAST(c_acctbal AS DECIMAL(18,2))
              * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
            > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
               WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_totalprice > 400000.0)
    ) GROUP BY cntrycode ORDER BY cntrycode
    """,
)
def _tpch_q22(spark, sf_dir):
    """Global sales opportunity (TPC-H Q22 shape; the phone-prefix country
    code becomes nationkey % 5 — no phone column in the fixture, and the
    no-orders test becomes no-BIG-TICKET-orders so the anti-join is
    non-vacuous at fixture density, where every customer has some order).
    Scalar threshold broadcast as a one-row cross join; the exclusion via
    broadcast LEFT ANTI. The above-average test is phrased as
    ``bal * n > sum(bal)`` in DECIMAL so both engines evaluate it EXACTLY
    — a float avg() would sum doubles in engine-specific order and a
    balance inside the resulting ~1e-12 window would flip the gate."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    bal_dec = F.col("c_acctbal").cast("decimal(18,2)")
    bal_stats = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_dec).alias("bal_total"),
        F.count(F.lit(1)).alias("bal_n"),
    )
    rich = (
        cust.crossJoin(F.broadcast(bal_stats))
        .filter(bal_dec * F.col("bal_n") > F.col("bal_total"))
        .join(
            orders.filter(F.col("o_totalprice") > 400000.0).select(
                F.col("o_custkey").alias("c_custkey")
            ),
            on="c_custkey",
            how="left_anti",
        )
    )
    return (
        rich.select(
            F.pmod(F.col("c_nationkey"), F.lit(5)).cast("int").alias("cntrycode"),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# The fixture has no partsupp table, so the five TPC-H shapes that need one
# (Q2/Q9/Q11/Q20/Q21 closes out all 22 query shapes; Q21 needs no partsupp
# but is grouped here) derive a deterministic stand-in from part × the
# supplier COUNT: each part gets 4 suppliers at evenly spaced key offsets
# (keys are 0-based contiguous in TESTDATA.md fixtures), with
# integer-arithmetic availqty and a cents-grid supplycost so Spark and
# DuckDB compute bit-identical values from the same integers. The SQL CTE
# below and ``_partsupp`` are the SAME derivation in each engine's dialect.
_PARTSUPP_SQL = """
    ps0 AS (
      SELECT p_partkey,
             (p_partkey + i.i * GREATEST(sc.n // 4, 1)) % sc.n AS ps_suppkey
      FROM part
      CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM supplier) sc
      CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
    ),
    partsupp AS (
      SELECT p_partkey AS ps_partkey, ps_suppkey,
             CAST((p_partkey * 7 + ps_suppkey * 13) % 9999 + 1 AS INT)
               AS ps_availqty,
             CAST((p_partkey * 419 + ps_suppkey * 97) % 20000 + 100 AS DOUBLE)
               / 100.0 AS ps_supplycost
      FROM ps0
    )
"""


def _partsupp(spark, sf_dir):
    """Derived partsupp (see _PARTSUPP_SQL): 4 suppliers per part at evenly
    spaced offsets modulo the supplier count. The one-row count aggregate
    is broadcast, so the derivation is a single narrow projection over
    part — no shuffle, and at 100 TB it scales with the part table scan.

    Supplier is loaded FRESH here (not via the _t memo): the memoized
    DataFrame shares attribute IDs with the supplier the Q2/Q9/Q11 outer
    plans join, and Spark treats the reuse as an ambiguous self-join."""
    from mortar_parquet_support_spark.tables import load_table

    part = _t(spark, sf_dir, "part").select("p_partkey")
    n = load_table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("n"))
    return (
        part.crossJoin(F.broadcast(n))
        .select("p_partkey", "n", F.explode(F.expr("sequence(0, 3)")).alias("i"))
        .select(
            "p_partkey",
            F.expr("(p_partkey + i * greatest(n div 4, 1)) % n").alias("ps_suppkey"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            "ps_suppkey",
            F.expr(
                "cast((p_partkey * 7 + ps_suppkey * 13) % 9999 + 1 as int)"
            ).alias("ps_availqty"),
            F.expr(
                "cast((p_partkey * 419 + ps_suppkey * 97) % 20000 + 100 as double)"
                " / 100.0"
            ).alias("ps_supplycost"),
        )
    )


@_register(
    "tpch_q2",
    f"""
    WITH {_PARTSUPP_SQL},
    eligible AS (
      SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
      FROM partsupp
      JOIN part ON p_partkey = ps_partkey
               AND p_size = 15 AND p_type = 'ECONOMY'
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
    FROM eligible e
    WHERE ps_supplycost = (SELECT min(ps_supplycost) FROM eligible e2
                           WHERE e2.p_partkey = e.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def _tpch_q2(spark, sf_dir):
    """Minimum-cost supplier (TPC-H Q2 shape over the derived partsupp;
    the type/size predicates become equality — the fixture's p_type is a
    6-value enum, no '%BRASS' suffixing). The correlated min subquery
    decorrelates into a per-part MIN window over the already-joined
    eligible set — one shuffle on p_partkey instead of a second scan +
    join of the whole subquery. Dimension sides (filtered part, nation,
    region) broadcast. Supplycost doubles sit on the derivation's cents
    grid, so the float equality against the window MIN is engine-stable.
    The LIMIT never truncates at fixture sizes (p_size×p_type keeps ~7
    parts of 2000), so no tie-at-the-cutoff nondeterminism."""
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .drop("min_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@_register(
    "tpch_q9",
    f"""
    WITH {_PARTSUPP_SQL}
    SELECT nation, o_year,
           CAST(ROUND(SUM(CAST(amount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity
               AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON n_nationkey = s_nationkey
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def _tpch_q9(spark, sf_dir):
    """Product-type profit (TPC-H Q9 shape; '%green%' becomes '%red%' for
    the fixture's two-word part names). Lineitem keeps only rows whose
    (partkey, suppkey) lands on the derived partsupp grid — same inner-
    join semantics in both engines. The per-row profit doubles are
    IEEE-identical across engines; each is cast to DECIMAL(18,4) BEFORE
    the SUM so the aggregate is exact and ORDER-INDEPENDENT — a plain
    double SUM would accumulate in engine-specific (and partition-
    specific) order and could round differently at a half-cent boundary.
    Part (filtered) and nation broadcast; orders/partsupp join on the
    lineitem keys."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    ps = _partsupp(spark, sf_dir)
    profit = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return (
        profit.groupBy("nation", "o_year")
        .agg(
            F.round(F.sum(F.col("amount").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@_register(
    "tpch_q11",
    f"""
    WITH {_PARTSUPP_SQL},
    ps_nation AS (
      SELECT ps_partkey,
             CAST(ROUND(ps_supplycost * 100) AS BIGINT) * ps_availqty
               AS value_cents
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_7'
    )
    SELECT ps_partkey,
           CAST(SUM(value_cents) AS DOUBLE) / 100.0 AS value
    FROM ps_nation
    GROUP BY ps_partkey
    HAVING SUM(value_cents) * 1000 > (SELECT SUM(value_cents) FROM ps_nation)
    ORDER BY value DESC, ps_partkey
    """,
)
def _tpch_q11(spark, sf_dir):
    """Important-stock identification (TPC-H Q11 shape). The whole
    computation runs on an INTEGER cents grid — value_cents reconstructs
    the supplycost cents exactly (the doubles are cents/100.0, so
    round(×100) is lossless), the per-part and global sums are exact
    BIGINT arithmetic, and the HAVING threshold (1/1000 of total) is an
    integer cross-multiplication — no float sum-order sensitivity
    anywhere; only the final display value divides to double. The global
    total is a one-row broadcast cross join, the per-part agg one shuffle."""
    ps = _partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    ps_nation = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            "ps_partkey",
            (
                F.round(F.col("ps_supplycost") * 100).cast("bigint")
                * F.col("ps_availqty")
            ).alias("value_cents"),
        )
    )
    total = ps_nation.agg(F.sum("value_cents").alias("total_cents"))
    return (
        ps_nation.groupBy("ps_partkey")
        .agg(F.sum("value_cents").alias("part_cents"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("part_cents") * 1000 > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("part_cents").cast("double") / 100.0).alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@_register(
    "tpch_q20",
    f"""
    WITH {_PARTSUPP_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
    WHERE s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'small%'
      JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE ps_availqty > 0.5 * qty
    )
    ORDER BY s_name, s_acctbal
    """,
)
def _tpch_q20(spark, sf_dir):
    """Potential part promotion (TPC-H Q20 shape). The correlated shipped-
    quantity subquery decorrelates into a pre-aggregated (partkey,
    suppkey) rollup joined to partsupp — the Spark-first shape: one
    map-side-combined agg over the filtered year of lineitem, then a
    LEFT SEMI into the (broadcast) national supplier slice. Fixture
    quantities are whole numbers in doubles, so SUM and the 0.5×
    threshold are float-exact in both engines. TPC-H's NULL semantics
    (no shipments → no qualification) fall out of the inner join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    ps = _partsupp(spark, sf_dir)
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    qualifying = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select(F.col("ps_suppkey").alias("s_suppkey"))
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(qualifying, on="s_suppkey", how="left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


@_register(
    "tpch_q21",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_1'
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def _tpch_q21(spark, sf_dir):
    """Suppliers who kept orders waiting (TPC-H Q21 shape; the fixture has
    no commit/receipt dates, so "late" becomes l_returnflag = 'R' — the
    EXISTS / NOT-EXISTS correlated structure is unchanged: the supplier
    was the ONLY one whose lines came back 'R' on a multi-supplier 'F'
    order). Instead of two self-joins of lineitem (the literal EXISTS
    translation — two extra shuffles of the big table), ONE per-order
    aggregate computes countDistinct(supplier) and countDistinct(supplier
    with 'R'); the predicates become n_supp > 1 AND n_r_supp = 1, which
    is equivalent for an l1 that itself has 'R' (its supplier is always
    counted in n_r_supp). Supplier×nation broadcasts; orders and the
    per-order agg join on the lineitem shuffle key. LIMIT never truncates
    (≤4 suppliers per fixture nation)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1)),
            on="l_orderkey",
        )
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
