"""Timeseries + telemetry operators (SURVEY §2.6 quality-of-life + north-star).

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

# Timeseries operators (SURVEY §2.6 quality-of-life + north-star)
# ===========================================================================

@_register(
    "time_bucket_rollup",
    """
    SELECT event_type,
           time_bucket(INTERVAL '15 minutes', ts) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value
    FROM events GROUP BY event_type, bucket
    """,
)
def _time_bucket_rollup(spark, sf_dir):
    """Hypertable rollup (operators/timeseries.py time_bucket_rollup):
    per-type 15-minute buckets."""
    from mortar_parquet_support_spark.operators.timeseries import time_bucket_rollup

    ev = _t(spark, sf_dir, "events")
    out = time_bucket_rollup(
        ev,
        ts="ts",
        keys=["event_type"],
        bucket="15 minutes",
        value="value",
        aggs={"n": "count", "sum_value": "sum", "min_value": "min", "max_value": "max"},
    )
    return out.select(
        "event_type",
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 2).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@_register(
    "sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def _sessionize(spark, sf_dir):
    """Gap-based sessionization (operators/timeseries.py sessionize):
    30-minute gap, events per (user, session)."""
    from mortar_parquet_support_spark.operators.timeseries import sessionize

    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, ts="ts", keys=["user_id"], gap="30 minutes")
    return s.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))


@_register(
    "asof_join",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, NULL::DOUBLE AS r_value, 1 AS side
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, NULL::BIGINT, value, 0
      FROM events WHERE event_type = 'click'
    ), matched AS (
      SELECT user_id, ts, event_id, side,
             last_value(CASE WHEN side = 0 THEN r_value END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS last_click_value
      FROM tagged
    )
    SELECT event_id, user_id, ts, last_click_value
    FROM matched WHERE side = 1
    """,
)
def _asof_join(spark, sf_dir):
    """As-of join (operators/timeseries.py asof_join): each purchase joined
    to the user's latest preceding-or-simultaneous click value. The oracle
    states the identical union+window algorithm in SQL, pinning the exact
    tie semantics on both engines."""
    from mortar_parquet_support_spark.operators.timeseries import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("value").alias("r_value")
    )
    out = asof_join(purchases, clicks, on=["user_id"], ts="ts", right_cols=["r_value"])
    return out.select(
        "event_id", "user_id", "ts", F.col("r_value").alias("last_click_value")
    )


# ===========================================================================

@_register(
    "counter_rate",
    """
    WITH pre AS (
      SELECT user_id, ts, sum(event_id % 100) AS inc
      FROM events GROUP BY user_id, ts
    ), c AS (
      SELECT user_id, ts,
             sum(inc) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) % 1000 AS v
      FROM pre
    ), r AS (
      SELECT user_id, ts, v,
             lag(v) OVER (PARTITION BY user_id ORDER BY ts) AS pv,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pt
      FROM c
    )
    SELECT user_id, ts,
           ROUND(CAST(CASE WHEN pv IS NULL THEN NULL
                           WHEN v >= pv THEN v - pv
                           ELSE v END AS DOUBLE)
                 / (CAST(floor(epoch(ts)) AS BIGINT)
                    - CAST(floor(epoch(pt)) AS BIGINT)), 6) AS rate
    FROM r
    """,
)
def _counter_rate(spark, sf_dir):
    """Prometheus-style monotonic-counter rate with reset handling
    (operators/timeseries.py counter_rate): a synthetic meter per user
    (integer cumsum of event_id % 100, wrapped mod 1000 so real resets
    occur) pre-aggregated per (user, ts) so ordering is tie-free — the
    lag/delta/reset/dt legs all compare exactly (integer counter, whole-
    second dt on both engines)."""
    from mortar_parquet_support_spark.operators.timeseries import counter_rate

    ev = _t(spark, sf_dir, "events")
    pre = ev.groupBy("user_id", "ts").agg(
        F.sum(F.col("event_id") % 100).alias("inc")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    counter = pre.select(
        "user_id", "ts", (F.sum("inc").over(w) % 1000).alias("v")
    )
    out = counter_rate(counter, ts="ts", value="v", keys=["user_id"])
    return out.select("user_id", "ts", F.round("rate", 6).alias("rate"))


@_register(
    "qc_flags",
    """
    WITH pre AS (
      SELECT user_id, ts, sum(event_id % 100) AS v
      FROM events GROUP BY user_id, ts
    ), s AS (
      SELECT user_id, ts, v,
             avg(v) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS m,
             stddev_samp(v) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS sd,
             lag(v, 1) OVER (PARTITION BY user_id ORDER BY ts) AS p1,
             lag(v, 2) OVER (PARTITION BY user_id ORDER BY ts) AS p2,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pt
      FROM pre
    )
    SELECT user_id, ts,
           coalesce(ROUND(abs(v - m) - 3.0 * sd, 6) > 0 AND sd > 0, false)
             AS qc_spike,
           coalesce(p1 = v AND p2 = v, false) AS qc_flatline,
           coalesce(CAST(floor(epoch(ts)) AS BIGINT)
                    - CAST(floor(epoch(pt)) AS BIGINT) > 1800, false) AS qc_gap
    FROM s
    """,
)
def _qc_flags(spark, sf_dir):
    """Sensor-stream QC screening (operators/timeseries.py qc_flags):
    spike vs a trailing 10-reading baseline (current excluded), 3-long
    flatline, 30-minute gap — over the tie-free integer per-(user, ts)
    stream. The spike margin is ROUNDED to 6dp on both engines
    (spike_round=6 / SQL ROUND) so a reading sitting exactly on the
    3-sigma boundary cannot flip on a last-ulp stddev-accumulation
    difference between Spark and DuckDB."""
    from mortar_parquet_support_spark.operators.timeseries import qc_flags

    ev = _t(spark, sf_dir, "events")
    pre = ev.groupBy("user_id", "ts").agg(
        F.sum(F.col("event_id") % 100).alias("v")
    )
    out = qc_flags(
        pre, ts="ts", value="v", keys=["user_id"], window=10,
        spike_sigmas=3.0, flatline_n=3, max_gap="30 minutes",
        spike_round=6,
    )
    return out.select("user_id", "ts", "qc_spike", "qc_flatline", "qc_gap")


@_register(
    "cohort_retention",
    """
    WITH e AS (
      SELECT user_id,
             CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS b
      FROM events WHERE user_id IS NOT NULL
    ), f AS (
      SELECT user_id, min(b) AS cohort FROM e GROUP BY 1
    ), a AS (
      SELECT f.cohort, e.b - f.cohort AS period_offset,
             count(DISTINCT e.user_id) AS n_users
      FROM e JOIN f USING (user_id) GROUP BY 1, 2
    ), s AS (SELECT cohort, count(*) AS sz FROM f GROUP BY 1)
    SELECT CAST(a.cohort AS BIGINT) AS cohort,
           CAST(a.period_offset AS BIGINT) AS period_offset,
           CAST(a.n_users AS BIGINT) AS n_users,
           ROUND(CAST(a.n_users AS DOUBLE) / s.sz, 6) AS retention_rate
    FROM a JOIN s USING (cohort)
    """,
)
def _cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix over the events stream
    (operators/timeseries.py cohort_retention): users bucketed by
    first-activity week, then distinct-active counts per later week —
    the double-aggregation product-analytics shape next to the funnel."""
    from mortar_parquet_support_spark.operators.timeseries import (
        cohort_retention,
    )

    ev = _t(spark, sf_dir, "events")
    out = cohort_retention(ev, ts="ts", user="user_id", period="1 week")
    return out.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("period_offset").cast("long").alias("period_offset"),
        F.col("n_users").cast("long").alias("n_users"),
        "retention_rate",
    )


@_register(
    "transition_matrix",
    """
    WITH p AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events WHERE user_id IS NOT NULL
    ), c AS (
      SELECT from_type, to_type, count(*) AS n FROM p GROUP BY 1, 2
    ), t AS (SELECT from_type, sum(n) AS tt FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
           ROUND(CAST(c.n AS DOUBLE) / t.tt, 6) AS p
    FROM c JOIN t USING (from_type)
    """,
)
def _transition_matrix(spark, sf_dir):
    """Event-to-next-event transition counts + row-normalized
    probabilities (operators/timeseries.py transition_matrix) — the
    Sankey/Markov input; event_id breaks timestamp ties so both engines
    walk identical journeys."""
    from mortar_parquet_support_spark.operators.timeseries import (
        transition_matrix,
    )

    ev = _t(spark, sf_dir, "events")
    return transition_matrix(
        ev, ts="ts", user="user_id", order_tiebreak=["event_id"]
    ).select("from_type", "to_type", F.col("n").cast("long").alias("n"), "p")


@_register(
    "lttb_downsample",
    """
    WITH RECURSIVE pre AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             CAST(sum(event_id % 100) AS BIGINT) AS v
      FROM events
      GROUP BY 1, 2
    ), pts AS (
      SELECT user_id, tsec, v,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY tsec) - 1
                  AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
      FROM pre
    ), big_users AS (
      SELECT DISTINCT user_id, n FROM pts WHERE n > 60
    ), bounds AS (
      -- np.linspace(1, n-1, 59).astype(int64): y_i = (i*step)+1 truncated,
      -- endpoint pinned to n-1 exactly (verified bit-identical for every
      -- n in 61..3000 plus spot checks to 100001)
      SELECT u.user_id, u.n, r.i,
             CASE WHEN r.i = 58 THEN u.n - 1
                  ELSE CAST(floor(1.0 + CAST(r.i AS DOUBLE)
                            * ((CAST(u.n AS DOUBLE) - 2.0) / 58.0)) AS BIGINT)
             END AS bnd
      FROM big_users u, range(59) r(i)
    ), walk AS (
      -- the sequential LTTB pick as a recursive CTE: state = (user, bucket,
      -- anchor row); each step averages the NEXT bucket (cx, cy), scores
      -- this bucket's candidates with the same 4-op triangle-area formula
      -- the kernel vectorizes, and takes argmax with first-index
      -- tie-breaking (min over [-area, rn] lists)
      SELECT user_id, CAST(-1 AS BIGINT) AS b, CAST(0 AS BIGINT) AS a
      FROM big_users
      UNION ALL
      SELECT user_id, bb, CAST(min(mkey)[2] AS BIGINT) AS a
      FROM (
        SELECT s.user_id, s.bb,
               [ -abs( (s.ax - s.cx) * (CAST(c.v AS DOUBLE) - s.ay)
                     - (s.ax - CAST(c.tsec AS DOUBLE)) * (s.cy - s.ay) ),
                 CAST(c.rn AS DOUBLE) ] AS mkey
        FROM (
          SELECT w.user_id, w.b + 1 AS bb, b0.bnd AS lo, b1.bnd AS hi,
                 CAST(ap.tsec AS DOUBLE) AS ax, CAST(ap.v AS DOUBLE) AS ay,
                 avg(CAST(np_.tsec AS DOUBLE)) AS cx,
                 avg(CAST(np_.v AS DOUBLE)) AS cy
          FROM walk w
          JOIN bounds b0 ON b0.user_id = w.user_id AND b0.i = w.b + 1
          JOIN bounds b1 ON b1.user_id = w.user_id AND b1.i = w.b + 2
          LEFT JOIN bounds b2 ON b2.user_id = w.user_id AND b2.i = w.b + 3
          JOIN pts ap ON ap.user_id = w.user_id AND ap.rn = w.a
          JOIN pts np_ ON np_.user_id = w.user_id AND np_.rn >= b1.bnd
                      AND np_.rn < coalesce(b2.bnd, np_.n)
          WHERE w.b + 1 <= 57
          GROUP BY 1, 2, 3, 4, 5, 6
        ) s
        JOIN pts c ON c.user_id = s.user_id AND c.rn >= s.lo AND c.rn < s.hi
      )
      GROUP BY user_id, bb
    ), sel AS (
      SELECT user_id, a AS rn FROM walk
      UNION ALL
      SELECT user_id, n - 1 AS rn FROM big_users
    )
    SELECT p.user_id, p.tsec, p.v
    FROM pts p JOIN sel s ON p.user_id = s.user_id AND p.rn = s.rn
    UNION ALL
    SELECT user_id, tsec, v FROM pts WHERE n <= 60
    """,
)
def _lttb_downsample(spark, sf_dir):
    """Dashboard-serving LTTB downsampling (operators/timeseries.py
    lttb_downsample): each user's event stream reduced to 60
    visually-representative points.

    Promoted from rows-only to a full DuckDB oracle (round-9 ask): the
    sequential pick is a RECURSIVE CTE whose per-step argmax replays the
    kernel bit-for-bit. Exactness argument: x = epoch SECONDS (~1.7e9,
    exact in float64 — the kernel's default ns would not be), y =
    integer sums, so both engines' bucket means divide identical exact
    sums; the triangle-area arithmetic is the same 4 IEEE ops on
    identical operands; np.argmax's first-max-wins tie-break is
    min([-area, rn]); np.linspace truncation is replayed with matching
    op order and a pinned endpoint. Verified identical at sf0.001 /
    sf0.01 / sf0.1."""
    from mortar_parquet_support_spark.operators.timeseries import (
        lttb_downsample,
    )

    ev = _t(spark, sf_dir, "events")
    pre = ev.groupBy(
        "user_id", F.unix_timestamp(F.col("ts")).alias("tsec")
    ).agg(F.sum(F.col("event_id") % 100).alias("v"))
    return lttb_downsample(
        pre, ts="tsec", value="v", keys=["user_id"], n_out=60
    )


@_register(
    "seasonal_decompose",
    # The oracle replays the estimator with the SAME range frames and the
    # same phase derivation. Exactness: the series value is a daily COUNT
    # (exact integer — no first-stage float reduction to diverge), the
    # trend is that exact sum / 7 (identical IEEE division both sides),
    # and every emitted component rounds to 6dp, orders of magnitude
    # above the last-ulp window-order differences.
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
             CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, bucket, value,
             CASE WHEN count(value) OVER win = 7
                  THEN avg(value) OVER win END AS trend,
             (CAST(epoch(bucket) AS BIGINT) // 86400) % 7 AS phase
      FROM d
      WINDOW win AS (
        PARTITION BY event_type ORDER BY CAST(epoch(bucket) AS BIGINT)
        RANGE BETWEEN 259200 PRECEDING AND 259200 FOLLOWING)
    ),
    pm AS (
      SELECT event_type, phase, avg(value - trend) AS pmean
      FROM w GROUP BY 1, 2 HAVING avg(value - trend) IS NOT NULL
    ),
    ctr AS (
      SELECT event_type, phase,
             pmean - avg(pmean) OVER (PARTITION BY event_type) AS seasonal
      FROM pm
    )
    SELECT w.event_type, w.bucket, ROUND(w.value, 6) AS value,
           ROUND(w.trend, 6) AS trend, ROUND(c.seasonal, 6) AS seasonal,
           ROUND(w.value - w.trend - c.seasonal, 6) AS resid
    FROM w LEFT JOIN ctr c
      ON c.event_type = w.event_type AND c.phase = w.phase
    """,
)
def _seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition
    (operators/timeseries.py seasonal_decompose) of the daily event-count
    series per event_type, weekly period: value = trend + seasonal +
    resid, trend NULL wherever the 7-day centered window is not full
    (gap-honest), phases anchored to the epoch. The fixtures are dense
    (every type has all 30 days at every SF), so the decomposition has a
    real interior at the driver's gate."""
    from mortar_parquet_support_spark.operators.timeseries import (
        seasonal_decompose,
        time_bucket_rollup,
    )

    ev = _t(spark, sf_dir, "events")
    daily = time_bucket_rollup(
        ev, ts="ts", keys=["event_type"], bucket="1 day",
        aggs={"value": "count"}, value="event_id",
    ).withColumn("value", F.col("value").cast("double"))
    out = seasonal_decompose(
        daily, ts="bucket", value="value", keys=["event_type"],
        period=7, step="1 day",
    )
    return out.select(
        "event_type",
        "bucket",
        F.round("value", 6).alias("value"),
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round("resid", 6).alias("resid"),
    )


@_register(
    "stream_correlation",
    # DuckDB's corr() and the operator's covar/stddev ratio agree wherever
    # Pearson is defined (the n-1 sample factors cancel); the hourly mean
    # inputs are each engine's own group-avg, so emitted values round to
    # 6dp — the repo's standard float-compare margin.
    """
    WITH h AS (
      SELECT event_type,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             avg(value) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS key_a, b.event_type AS key_b,
           ROUND(corr(a.v, b.v), 6) AS corr,
           COUNT(*) AS n_points
    FROM h a JOIN h b
      ON a.bucket = b.bucket AND a.event_type < b.event_type
    WHERE a.v IS NOT NULL AND b.v IS NOT NULL
    GROUP BY 1, 2 HAVING COUNT(*) >= 24
    """,
)
def _stream_correlation(spark, sf_dir):
    """Cross-stream Pearson correlation matrix
    (operators/timeseries.py pairwise_correlation): which event-type
    hourly series move together, over time-ALIGNED buckets only. The
    per-stream layer (rollup/EWMA/QC) can't answer this; the all-pairs
    join is quadratic in STREAMS, linear in TIME — the inherent output
    size of a correlation matrix."""
    from mortar_parquet_support_spark.operators.timeseries import (
        pairwise_correlation,
        time_bucket_rollup,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = time_bucket_rollup(
        ev, ts="ts", keys=["event_type"], bucket="1 hour",
        aggs={"v": "avg"}, value="value",
    )
    out = pairwise_correlation(
        hourly, ts="bucket", key="event_type", value="v", min_points=24
    )
    return out.select(
        "key_a", "key_b", F.round("corr", 6).alias("corr"), "n_points"
    )


@_register(
    "lagged_correlation",
    # Same exactness story as stream_correlation, per (pair, lag): the
    # shifted alignment is integer epoch arithmetic, corr's sample
    # factors cancel, emitted values round to 6dp.
    """
    WITH h AS (
      SELECT event_type,
             CAST(epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT)
               AS t, avg(value) AS v
      FROM events GROUP BY 1, 2
    ),
    b AS (
      SELECT h.event_type, h.t - lag * 3600 AS t, h.v, l.lag
      FROM h, (SELECT unnest(range(-3, 4)) AS lag) l
    )
    SELECT a.event_type AS key_a, b.event_type AS key_b, CAST(b.lag AS BIGINT) AS lag,
           ROUND(corr(a.v, b.v), 6) AS corr, COUNT(*) AS n_points
    FROM h a JOIN b ON a.t = b.t AND a.event_type < b.event_type
    WHERE a.v IS NOT NULL AND b.v IS NOT NULL
    GROUP BY 1, 2, 3 HAVING COUNT(*) >= 24
    """,
)
def _lagged_correlation(spark, sf_dir):
    """Lead/lag cross-correlation battery
    (operators/timeseries.py lagged_correlation) over the hourly
    event-type series, lags -3..+3: positive lag = key_b read later than
    key_a ("a leads b"). One explode-fanned equi-join + one aggregate for
    the whole battery — never one join per lag."""
    from mortar_parquet_support_spark.operators.timeseries import (
        lagged_correlation,
        time_bucket_rollup,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = time_bucket_rollup(
        ev, ts="ts", keys=["event_type"], bucket="1 hour",
        aggs={"v": "avg"}, value="value",
    )
    out = lagged_correlation(
        hourly, ts="bucket", key="event_type", value="v",
        max_lag=3, step="1 hour", min_points=24,
    )
    return out.select(
        "key_a", "key_b", "lag", F.round("corr", 6).alias("corr"), "n_points"
    )


@_register(
    "correlated_pairs",
    # The oracle enumerates ALL pairs above the threshold (trivial at
    # fixture stream counts), so — exactly like the dedup_minhash
    # promotion — a hash match every round WITNESSES the LSH screen's
    # recall 1.0 on the fixture: a true pair the sign-projection bands
    # missed would be a missing row. corr exactness is the
    # stream_correlation story (sample factors cancel, 6dp rounding);
    # the planted '~mix' sibling adds 4*sin(epoch-hours) — integer-hour
    # sin on both sides, so inputs agree to <=1 ulp, orders below 6dp.
    """
    WITH h AS (
      SELECT event_type,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS b, avg(value) AS v
      FROM events GROUP BY 1, 2
    ),
    aug AS (
      SELECT event_type, b, v FROM h
      UNION ALL
      SELECT event_type || '~mix', b,
             v + 4.0 * sin(CAST(epoch(b) AS DOUBLE) / 3600.0) FROM h
    )
    SELECT a.event_type AS key_a, b.event_type AS key_b,
           ROUND(corr(a.v, b.v), 6) AS corr, COUNT(*) AS n_points
    FROM aug a JOIN aug b ON a.b = b.b AND a.event_type < b.event_type
    WHERE a.v IS NOT NULL AND b.v IS NOT NULL
    GROUP BY 1, 2 HAVING COUNT(*) >= 24 AND corr(a.v, b.v) >= 0.8
    """,
)
def _correlated_pairs(spark, sf_dir):
    """Candidate-pruned correlation screen (r13 —
    operators/timeseries.py correlated_pairs): pairwise_correlation's
    scale-safe sibling. Sign-random-projection signatures (corr == cosine
    of the centered series) band through the dedup family's shared
    fingerprint_band_pairs; the exact Pearson aggregate runs on the
    pruned candidate set only. Each event_type stream gets a planted
    '~mix' sibling (v + 4*sin(epoch-hours) -> corr 0.95-0.996 by SF)
    so the fixture has true pairs above the 0.8 threshold while natural
    cross-pairs (|corr| <= 0.25) stay below it."""
    from mortar_parquet_support_spark.operators.timeseries import (
        correlated_pairs,
        time_bucket_rollup,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = time_bucket_rollup(
        ev, ts="ts", keys=["event_type"], bucket="1 hour",
        aggs={"v": "avg"}, value="value",
    )
    mixed = hourly.select(
        F.concat(F.col("event_type"), F.lit("~mix")).alias("event_type"),
        "bucket",
        (
            F.col("v")
            + 4.0 * F.sin(F.unix_timestamp("bucket").cast("double") / 3600.0)
        ).alias("v"),
    )
    out = correlated_pairs(
        hourly.unionByName(mixed), ts="bucket", key="event_type",
        value="v", threshold=0.8, min_points=24,
    )
    return out.select(
        "key_a", "key_b", F.round("corr", 6).alias("corr"), "n_points"
    )


@_register(
    "correlated_topk",
    # The correlated_pairs exactness + recall-witness story, plus a
    # ranking leg: both orientations of every surviving pair enter, rank
    # orders by corr rounded at 9dp (engines agree to ~1e-12) with
    # partner-id tie-break, so the rank is a pure function of the
    # hash-matched values. The two planted siblings per stream (sin and
    # cos mixes) make the per-stream ranking non-trivial: the mixes also
    # correlate with each OTHER through the shared base series, so every
    # stream has >= 2 above-threshold partners and k=1 genuinely drops
    # rows.
    """
    WITH h AS (
      SELECT event_type,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS b, avg(value) AS v
      FROM events GROUP BY 1, 2
    ),
    aug AS (
      SELECT event_type, b, v FROM h
      UNION ALL
      SELECT event_type || '~sin', b,
             v + 4.0 * sin(CAST(epoch(b) AS DOUBLE) / 3600.0) FROM h
      UNION ALL
      SELECT event_type || '~cos', b,
             v + 4.0 * cos(CAST(epoch(b) AS DOUBLE) / 3600.0) FROM h
    ),
    pairs AS (
      SELECT a.event_type AS key_a, b.event_type AS key_b,
             corr(a.v, b.v) AS c, COUNT(*) AS n_points
      FROM aug a JOIN aug b ON a.b = b.b AND a.event_type < b.event_type
      WHERE a.v IS NOT NULL AND b.v IS NOT NULL
      GROUP BY 1, 2 HAVING COUNT(*) >= 24 AND corr(a.v, b.v) >= 0.8
    ),
    orient AS (
      SELECT key_a AS key, key_b AS partner, c, n_points FROM pairs
      UNION ALL
      SELECT key_b AS key, key_a AS partner, c, n_points FROM pairs
    ),
    ranked AS (
      SELECT key, partner, c, n_points,
             ROW_NUMBER() OVER (
               PARTITION BY key
               ORDER BY ROUND(ABS(c), 9) DESC, partner
             ) AS rnk
      FROM orient
    )
    SELECT key, partner, ROUND(c, 6) AS corr, n_points,
           CAST(rnk AS BIGINT) AS rank
    FROM ranked WHERE rnk <= 1
    """,
)
def _correlated_topk(spark, sf_dir):
    """Per-stream strongest partner (r13 — operators/timeseries.py
    top_correlated_partners): correlated_pairs' ranking view, k=1 among
    pairs with corr >= 0.8. Each event_type stream gets TWO planted
    siblings (v + 4*sin / v + 4*cos of epoch-hours); the siblings also
    correlate with each other through the shared base, so every stream
    has at least two above-threshold partners and the k=1 cut is
    non-trivial. Rank determinism pinned by 9dp rounding + partner-id
    tie-break on both engines."""
    from mortar_parquet_support_spark.operators.timeseries import (
        time_bucket_rollup,
        top_correlated_partners,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = time_bucket_rollup(
        ev, ts="ts", keys=["event_type"], bucket="1 hour",
        aggs={"v": "avg"}, value="value",
    )
    ep_hours = F.unix_timestamp("bucket").cast("double") / 3600.0
    sin_mix = hourly.select(
        F.concat(F.col("event_type"), F.lit("~sin")).alias("event_type"),
        "bucket", (F.col("v") + 4.0 * F.sin(ep_hours)).alias("v"),
    )
    cos_mix = hourly.select(
        F.concat(F.col("event_type"), F.lit("~cos")).alias("event_type"),
        "bucket", (F.col("v") + 4.0 * F.cos(ep_hours)).alias("v"),
    )
    out = top_correlated_partners(
        hourly.unionByName(sin_mix).unionByName(cos_mix),
        ts="bucket", key="event_type", value="v",
        k=1, threshold=0.8, min_points=24,
    )
    return out.select(
        "key", "partner", F.round("corr", 6).alias("corr"), "n_points",
        F.col("rank").cast("long").alias("rank"),
    )


@_register(
    "cusum_changepoints",
    # The sequential fold replayed as a RECURSIVE CTE (the lttb/mmr
    # graduation pattern): inputs are exact integer daily counts, moments
    # are stated two-pass/ddof=1 on BOTH sides (never the engines'
    # internal one-pass stddev), the recurrence is the same
    # greatest/add/clamp ops per step, and the alarm flag compares the
    # ROUNDED statistics so the boolean can never knife-edge apart while
    # the values hash-match.
    """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, SUM(x) / COUNT(*) AS mean, COUNT(*) AS n
      FROM d GROUP BY 1
    ),
    v AS (
      SELECT d.event_type,
             SQRT(SUM((d.x - m.mean) * (d.x - m.mean)) / (m.n - 1)) AS std
      FROM d JOIN m USING (event_type) GROUP BY d.event_type, m.n
    ),
    z AS (
      SELECT d.event_type, d.bucket,
             CASE WHEN v.std > 0 THEN (d.x - m.mean) / v.std
                  ELSE 0.0 END AS z,
             ROW_NUMBER() OVER (PARTITION BY d.event_type
                                ORDER BY d.bucket) AS rn
      FROM d JOIN m USING (event_type) JOIN v USING (event_type)
    ),
    c AS (
      SELECT event_type, bucket, rn, z,
             greatest(0.0, z - 0.5) AS s_hi,
             greatest(0.0, -z - 0.5) AS s_lo
      FROM z WHERE rn = 1
      UNION ALL
      SELECT z.event_type, z.bucket, z.rn, z.z,
             greatest(0.0, c.s_hi + z.z - 0.5),
             greatest(0.0, c.s_lo - z.z - 0.5)
      FROM c JOIN z ON z.event_type = c.event_type AND z.rn = c.rn + 1
    )
    SELECT event_type AS key, bucket, ROUND(z, 6) AS z,
           ROUND(s_hi, 6) AS s_hi, ROUND(s_lo, 6) AS s_lo,
           (ROUND(s_hi, 6) > 5.0 OR ROUND(s_lo, 6) > 5.0) AS alarm
    FROM c
    """,
)
def _cusum_changepoints(spark, sf_dir):
    """Two-sided CUSUM mean-shift trace
    (operators/timeseries.py cusum_changepoints) over each event_type's
    daily-count series: full per-point s_hi/s_lo statistics plus the
    alarm flag, replayed exactly by a DuckDB recursive CTE. The alarm in
    THIS entry compares the rounded statistics (not the operator's raw
    ones) so the flag is a pure function of the hash-matched values."""
    from mortar_parquet_support_spark.operators.timeseries import (
        cusum_changepoints,
        time_bucket_rollup,
    )

    ev = _t(spark, sf_dir, "events")
    daily = time_bucket_rollup(
        ev, ts="ts", keys=["event_type"], bucket="1 day",
        aggs={"value": "count"}, value="event_id",
    ).withColumn("value", F.col("value").cast("double"))
    out = cusum_changepoints(
        daily, ts="bucket", key="event_type", value="value",
        drift=0.5, threshold=5.0,
    )
    s_hi = F.round("s_hi", 6)
    s_lo = F.round("s_lo", 6)
    return out.select(
        F.col("event_type").alias("key"),
        "bucket",
        F.round("z", 6).alias("z"),
        s_hi.alias("s_hi"),
        s_lo.alias("s_lo"),
        ((s_hi > 5.0) | (s_lo > 5.0)).alias("alarm"),
    )


@_register(
    "seasonal_anomalies",
    # Extends the seasonal_decompose oracle with the stated two-pass
    # ddof=1 residual std and the score; a +12*sqrt(count) spike (~12
    # Poisson sigmas, so it clears the 3-sigma gate at EVERY fixture
    # scale even after the outlier inflates the residual std) is planted
    # on day 15 of every type IDENTICALLY on both sides so the flag path
    # has positive signal, and the anomaly flag compares the ROUNDED
    # score (cusum's knife-edge-proof pattern).
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
             CAST(COUNT(*) AS DOUBLE)
               + CASE WHEN extract(day FROM date_trunc('day', ts)) = 15
                      THEN 12.0 * SQRT(CAST(COUNT(*) AS DOUBLE))
                      ELSE 0.0 END AS value
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    w AS (
      SELECT event_type, bucket, value,
             CASE WHEN count(value) OVER win = 7
                  THEN avg(value) OVER win END AS trend,
             (CAST(epoch(bucket) AS BIGINT) // 86400) % 7 AS phase
      FROM d
      WINDOW win AS (
        PARTITION BY event_type ORDER BY CAST(epoch(bucket) AS BIGINT)
        RANGE BETWEEN 259200 PRECEDING AND 259200 FOLLOWING)
    ),
    pm AS (
      SELECT event_type, phase, avg(value - trend) AS pmean
      FROM w GROUP BY 1, 2 HAVING avg(value - trend) IS NOT NULL
    ),
    ctr AS (
      SELECT event_type, phase,
             pmean - avg(pmean) OVER (PARTITION BY event_type) AS seasonal
      FROM pm
    ),
    r AS (
      SELECT w.event_type, w.bucket, w.value, w.trend, c.seasonal,
             w.value - w.trend - c.seasonal AS resid
      FROM w LEFT JOIN ctr c
        ON c.event_type = w.event_type AND c.phase = w.phase
    ),
    st AS (
      SELECT event_type,
             SQRT(SUM((resid - m) * (resid - m)) / (n - 1)) AS std
      FROM (SELECT event_type, resid,
                   AVG(resid) OVER (PARTITION BY event_type) AS m,
                   COUNT(resid) OVER (PARTITION BY event_type) AS n
            FROM r WHERE resid IS NOT NULL)
      GROUP BY event_type, n HAVING n > 1
    )
    SELECT r.event_type, r.bucket, ROUND(r.value, 6) AS value,
           ROUND(r.resid, 6) AS resid,
           ROUND(CASE WHEN st.std > 0 THEN abs(r.resid) / st.std END, 6)
             AS score,
           COALESCE(
             ROUND(CASE WHEN st.std > 0 THEN abs(r.resid) / st.std END, 6)
               > 3.0, FALSE) AS anomaly
    FROM r LEFT JOIN st ON st.event_type = r.event_type
    """,
)
def _seasonal_anomalies(spark, sf_dir):
    """Deseasonalized anomaly screen
    (operators/timeseries.py seasonal_anomalies) over the daily
    event-count series (+12*sqrt(count) planted on every type's day 15, identically
    in the oracle, so the flag path is exercised on fixture data): a
    spike is judged against the residual AFTER trend and weekly
    seasonality are removed. The in-entry assert witnesses that the
    plant is actually flagged."""
    from mortar_parquet_support_spark.operators.timeseries import (
        seasonal_anomalies,
        time_bucket_rollup,
    )

    ev = _t(spark, sf_dir, "events")
    daily = time_bucket_rollup(
        ev, ts="ts", keys=["event_type"], bucket="1 day",
        aggs={"value": "count"}, value="event_id",
    ).withColumn(
        "value",
        F.col("value").cast("double")
        + F.when(
            F.dayofmonth("bucket") == 15,
            12.0 * F.sqrt(F.col("value").cast("double")),
        ).otherwise(0.0),
    )
    out = seasonal_anomalies(
        daily, ts="bucket", value="value", keys=["event_type"],
        period=7, step="1 day", sigma=3.0,
    )
    score = F.round("score", 6)
    result = out.select(
        "event_type",
        "bucket",
        F.round("value", 6).alias("value"),
        F.round("resid", 6).alias("resid"),
        score.alias("score"),
        F.coalesce(score > 3.0, F.lit(False)).alias("anomaly"),
    )
    n_flagged = result.filter("anomaly").count()
    if n_flagged < 1:
        raise AssertionError("the planted day-15 spike must be flagged")
    return result
