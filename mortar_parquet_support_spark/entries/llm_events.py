"""Relational / timeseries odds and ends that ship with the LLM entry
set: per-stream stats, date parts, JSON extraction, HAVING,
percentiles, resample/gap-fill, funnels, snapshot diff / CDC,
interval merging, and coverage gaps.

Split out of ``entries/llm.py`` (round 11; llm.py itself was split out
of ``__spark_entry__.py`` in round 9). Entry bodies are unchanged —
see ``_registry`` for ``_register`` / ``_t`` / the index builders, and
``__spark_entry__`` for the driver contract surface (the 50-name
_WINDOW pin makes this refactor invisible to the driver).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._registry import (
    _register,
    _t,
)


@_register(
    "stats_per_stream",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           min(ts) AS min_ts, max(ts) AS max_ts,
           ROUND(min(value), 6) AS min_v, ROUND(max(value), 6) AS max_v
    FROM events GROUP BY event_type
    """,
)
def _stats_per_stream(spark, sf_dir):
    """O6 (make-metadata.py:13-18): per-stream min/max/count statistics —
    the footer-stats aggregation as a first-class query."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
    )


@_register(
    "date_parts",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders
    """,
)
def _date_parts(spark, sf_dir):
    """Date/time scalar functions (SURVEY §2.6 scalar library)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


@_register(
    "json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def _json_extract(spark, sf_dir):
    """Semi-structured JSON column access (props is a JSON string)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@_register(
    "having_filter",
    """
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem GROUP BY l_partkey HAVING count(*) > 35
    """,
)
def _having_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .filter(F.col("n") > 35)
    )


@_register(
    "percentiles",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
)
def _percentiles(spark, sf_dir):
    """Exact interpolated percentiles (both engines: linear interpolation
    over the sorted set; approx variants exist engine-side but aren't
    cross-checkable)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


@_register(
    "resample_gapfill",
    """
    WITH obs AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS bucket_s,
             ROUND(MAX(value), 6) AS v
      FROM events GROUP BY user_id, bucket_s
    ), bounds AS (
      SELECT user_id, min(bucket_s) AS lo, max(bucket_s) AS hi FROM obs GROUP BY user_id
    ), grid AS (
      SELECT b.user_id, CAST(gs.g AS BIGINT) AS bucket_s
      FROM bounds b, LATERAL (
        SELECT unnest(generate_series(b.lo, b.hi, 86400)) AS g
      ) gs
    )
    SELECT g.user_id, g.bucket_s AS t_s,
           last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket_s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value
    FROM grid g LEFT JOIN obs o
      ON o.user_id = g.user_id AND o.bucket_s = g.bucket_s
    """,
)
def _resample_gapfill(spark, sf_dir):
    """Per-stream resample to a 1-day grid + forward fill
    (operators/timeseries.py resample, how='max' for cross-engine
    determinism). Times exported as epoch seconds (timezone-proof)."""
    from mortar_parquet_support_spark.operators.timeseries import resample

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").alias("time"), "value"
    )
    out = resample(ev, keys=["user_id"], step="1 day", how="max", fill="ffill")
    return out.select(
        "user_id",
        F.unix_timestamp("time").alias("t_s"),
        F.round("value", 6).alias("value"),
    )


@_register(
    "funnel_steps",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s0 AS (SELECT user_id, min(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
    s1 AS (SELECT e.user_id, min(e.ts) AS t_click
           FROM events e JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'click' AND e.ts >= s0.t_view
             AND e.ts <= s0.t_view + INTERVAL 259200 SECOND
           GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.ts) AS t_purchase
           FROM events e JOIN s1 ON e.user_id = s1.user_id
                         JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= s1.t_click
             AND e.ts <= s0.t_view + INTERVAL 259200 SECOND
           GROUP BY 1)
    SELECT u.user_id, s0.t_view, s1.t_click, s2.t_purchase,
           CAST(s0.t_view IS NOT NULL AS INT)
             + CAST(s1.t_click IS NOT NULL AS INT)
             + CAST(s2.t_purchase IS NOT NULL AS INT) AS n_steps
    FROM u
    LEFT JOIN s0 USING (user_id)
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
    """,
)
def _funnel_steps(spark, sf_dir):
    """Sequential conversion funnel view -> click -> purchase within 3 days
    of the first view (operators/timeseries.py funnel): one shuffle via
    chained range-frame running-min windows, vs the oracle's k-join chain —
    the semantics equivalence the docstring proves, checked here
    end-to-end."""
    from mortar_parquet_support_spark.operators.timeseries import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(
        ev, ["view", "click", "purchase"], ts="ts", user="user_id",
        within="3 days",
    )


@_register(
    "diff_snapshots",
    """
    WITH o AS (
      SELECT doc_id, md5(text) AS d FROM documents WHERE doc_id % 3 = 0
    ), n AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN md5(text || 'x')
                  ELSE md5(text) END AS d
      FROM documents WHERE doc_id % 2 = 0
    )
    SELECT CAST(coalesce(o.doc_id, n.doc_id) AS BIGINT) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.d <> n.d THEN 'changed' END AS change
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.d <> n.d
    """,
)
def _diff_snapshots(spark, sf_dir):
    """Versioned-corpus diff (sources/maintenance.py diff_tables): v1 is
    docs with doc_id % 3 == 0, v2 is docs with doc_id % 2 == 0 and every
    7th text edited — exercising all three change classes (added keys
    only in v2, removed only in v1, changed in both with digest drift)
    against the oracle's full-outer formulation."""
    from mortar_parquet_support_spark.sources.maintenance import diff_tables

    docs = _t(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 3 == 0)
    v2 = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("x"))
        ).otherwise(F.col("text")),
    )
    out = diff_tables(v1, v2, keys=["doc_id"], digest=F.md5("text"))
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "change")


@_register(
    "apply_cdc",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 5 = 0 THEN ROUND(price + 1.0, 2)
                WHEN o_orderkey % 5 = 2 THEN ROUND(price * 2, 2)
                ELSE price END AS price
    FROM base WHERE o_orderkey % 5 NOT IN (1, 3)
    UNION ALL
    SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
           ROUND(price + 5.0, 2) AS price
    FROM base WHERE o_orderkey % 5 = 4
    """,
)
def _apply_cdc(spark, sf_dir):
    """CDC log compaction (sources/maintenance.py apply_cdc): a
    Debezium-shaped change log (op + version) applied to a snapshot,
    exercising every ordering rule — update wins over an OLDER delete
    (key%5==2: D@v1 then U@v3 -> updated row survives), same-version
    ties break toward delete (key%5==3: I@v5 + D@v5 -> dropped), plain
    updates (key%5==0), plain deletes (key%5==1), inserts of brand-new
    keys (key%5==4 -> key+10M), and untouched passthrough. The oracle
    states the final snapshot directly."""
    from mortar_parquet_support_spark.sources.maintenance import apply_cdc

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price")
    )
    m = F.col("o_orderkey") % 5
    upd = base.filter(m == 0).select(
        "o_orderkey", "o_custkey",
        F.round(F.col("price") + 1.0, 2).alias("price"),
        F.lit(2).alias("v"), F.lit("U").alias("op"),
    )
    dele = base.filter(m == 1).select(
        "o_orderkey", "o_custkey", "price",
        F.lit(1).alias("v"), F.lit("D").alias("op"),
    )
    conflict_d = base.filter(m == 2).select(
        "o_orderkey", "o_custkey", "price",
        F.lit(1).alias("v"), F.lit("D").alias("op"),
    )
    conflict_u = base.filter(m == 2).select(
        "o_orderkey", "o_custkey",
        F.round(F.col("price") * 2, 2).alias("price"),
        F.lit(3).alias("v"), F.lit("U").alias("op"),
    )
    tie_i = base.filter(m == 3).select(
        "o_orderkey", "o_custkey", "price",
        F.lit(5).alias("v"), F.lit("I").alias("op"),
    )
    tie_d = base.filter(m == 3).select(
        "o_orderkey", "o_custkey", "price",
        F.lit(5).alias("v"), F.lit("D").alias("op"),
    )
    ins = base.filter(m == 4).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.round(F.col("price") + 5.0, 2).alias("price"),
        F.lit(1).alias("v"), F.lit("I").alias("op"),
    )
    changes = upd
    for c in (dele, conflict_d, conflict_u, tie_i, tie_d, ins):
        changes = changes.unionByName(c)
    return apply_cdc(
        base, changes, keys=("o_orderkey",), version_col="v", op_col="op"
    )


@_register(
    "merge_intervals",
    """
    WITH iv AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + event_id % 100 AS e
      FROM events
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) THEN 1 ELSE 0 END AS brk
      FROM iv
    ), isl AS (
      SELECT user_id, s, e,
             sum(brk) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM marked
    )
    SELECT user_id, min(s) AS s, max(e) AS e,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM isl GROUP BY user_id, island
    """,
)
def _merge_intervals(spark, sf_dir):
    """Interval coalescing (operators/timeseries.py merge_intervals):
    per-user event spans [epoch, epoch + event_id%100] merged into
    maximal coverage islands — running-MAX-end gaps-and-islands, so
    contained intervals can't split an island. Integer bounds keep both
    engines exact; the oracle restates the same window algebra."""
    from mortar_parquet_support_spark.operators.timeseries import (
        merge_intervals,
    )

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + F.col("event_id") % 100).alias("e"),
    )
    return merge_intervals(iv, start="s", end="e", keys=["user_id"])


@_register(
    "coverage_gaps",
    """
    WITH iv AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + event_id % 1000 AS e
      FROM events
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) THEN 1 ELSE 0 END AS brk
      FROM iv
    ), isl AS (
      SELECT user_id, min(s) AS s, max(e) AS e
      FROM (
        SELECT user_id, s, e,
               sum(brk) OVER (
                 PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM marked
      ) GROUP BY user_id, island
    )
    SELECT user_id, gap_start, gap_end FROM (
      SELECT user_id,
             lag(e) OVER (PARTITION BY user_id ORDER BY s) AS gap_start,
             s AS gap_end
      FROM isl
    ) WHERE gap_start IS NOT NULL
    """,
)
def _coverage_gaps(spark, sf_dir):
    """Uncovered-span report (operators/timeseries.py coverage_gaps —
    the downtime complement of merge_intervals): per-user silent periods
    between coverage islands over integer event spans. The oracle
    composes the same islands then lags them."""
    from mortar_parquet_support_spark.operators.timeseries import (
        coverage_gaps,
    )

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + F.col("event_id") % 1000).alias("e"),
    )
    return coverage_gaps(iv, start="s", end="e", keys=["user_id"])
