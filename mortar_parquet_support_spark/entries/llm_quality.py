"""Data-quality, profiling, sketch, and drift entries: approx stats,
quantile / CMS / heavy-hitter sketches, expectations gate, PSI /
categorical / embedding drift (batch and streaming), outlier
handling, skew reporting, and salted aggregation.

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


@_register("approx_stats")
def _approx_stats(spark, sf_dir):
    """Sketch aggregates for 100 TB profiling passes: HyperLogLog++ distinct
    and approximate percentile — one pass, fixed memory, mergeable across
    partitions (the reason they exist; exact variants are oracle-checked by
    group_distinct / percentiles). Approximation is engine-specific ->
    rows-only check."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("nd_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_price"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "quantile_sketch",
    """
    SELECT event_type, CAST(sign(value) AS INT) AS sign,
           CASE WHEN value = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(log10(abs(value)) * 20.0 + 1e-9) AS BIGINT)
           END AS mag_bin,
           COUNT(*) AS cnt,
           CAST(20 AS INT) AS bpd
    FROM events WHERE value IS NOT NULL AND isfinite(value)
    GROUP BY 1, 2, 3
    """,
)
def _quantile_sketch(spark, sf_dir):
    """Mergeable quantile-histogram state (operators/sketches.py
    qhist_rollup): deterministic log-spaced bins, exactly re-aggregatable
    by summing counts — the persistable counterpart to percentile_approx,
    whose sketch state Spark cannot store/union. Binning is engine-
    portable by design (the 1e-9 nudge absorbs libm ulp differences at
    decimal bin edges), so the full state is DuckDB-oracle-checked."""
    from mortar_parquet_support_spark.operators.sketches import qhist_rollup

    ev = _t(spark, sf_dir, "events")
    return qhist_rollup(ev, value="value", keys=["event_type"])


@_register(
    "quantile_estimate",
    """
    WITH h AS (
      SELECT event_type, CAST(sign(value) AS INT) AS sign,
             CASE WHEN value = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(log10(abs(value)) * 20.0 + 1e-9) AS BIGINT)
             END AS mag_bin,
             COUNT(*) AS cnt
      FROM events WHERE value IS NOT NULL AND isfinite(value) GROUP BY 1, 2, 3
    ), t AS (
      SELECT event_type, cnt,
             sign * 100000 + CASE WHEN sign = -1 THEN -mag_bin
                                  ELSE mag_bin END AS skey,
             CASE WHEN sign = 0 THEN 0.0
                  ELSE sign * pow(10.0, (mag_bin + 0.5) / 20.0) END AS rep,
             SUM(cnt) OVER (
               PARTITION BY event_type
               ORDER BY sign * 100000 + CASE WHEN sign = -1 THEN -mag_bin
                                             ELSE mag_bin END
             ) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS total
      FROM h
    )
    SELECT event_type,
           ROUND(min_by(rep, skey) FILTER (
             WHERE cum >= CAST(0.5 AS DOUBLE) * total - 1e-9 - 1e-12 * total
           ), 6) AS p50,
           ROUND(min_by(rep, skey) FILTER (
             WHERE cum >= CAST(0.95 AS DOUBLE) * total - 1e-9 - 1e-12 * total
           ), 6) AS p95,
           ROUND(min_by(rep, skey) FILTER (
             WHERE cum >= CAST(0.99 AS DOUBLE) * total - 1e-9 - 1e-12 * total
           ), 6) AS p99,
           CAST(MAX(total) AS BIGINT) AS n
    FROM t GROUP BY event_type
    """,
)
def _quantile_estimate(spark, sf_dir):
    """Quantiles served FROM the histogram state (qhist_quantiles):
    lower-invCDF bin pick + geometric-midpoint representative, all
    deterministic — so unlike approx_percentile this estimator is fully
    oracle-checkable. Error bound 10^(1/40)-1 ~ 5.9% vs exact percentiles
    (pytest-pinned against numpy in
    test_qhist_quantiles_within_error_bound)."""
    from mortar_parquet_support_spark.operators.sketches import (
        qhist_quantiles,
        qhist_rollup,
    )

    ev = _t(spark, sf_dir, "events")
    state = qhist_rollup(ev, value="value", keys=["event_type"])
    out = qhist_quantiles(state, group_cols=["event_type"], qs=[0.5, 0.95, 0.99])
    return out.select(
        "event_type",
        F.round("p50", 6).alias("p50"),
        F.round("p95", 6).alias("p95"),
        F.round("p99", 6).alias("p99"),
        "n",
    )


@_register(
    "profile_table",
    """
    SELECT 'doc_id' AS col_name, 'rows' AS metric, CAST(count(*) AS VARCHAR) AS value FROM documents
    UNION ALL SELECT 'doc_id', 'nulls', CAST(count(CASE WHEN doc_id IS NULL THEN 1 END) AS VARCHAR) FROM documents
    UNION ALL SELECT 'doc_id', 'distinct', CAST(count(DISTINCT doc_id) AS VARCHAR) FROM documents
    UNION ALL SELECT 'doc_id', 'min', CAST(min(doc_id) AS VARCHAR) FROM documents
    UNION ALL SELECT 'doc_id', 'max', CAST(max(doc_id) AS VARCHAR) FROM documents
    UNION ALL SELECT 'lang', 'rows', CAST(count(*) AS VARCHAR) FROM documents
    UNION ALL SELECT 'lang', 'nulls', CAST(count(CASE WHEN lang IS NULL THEN 1 END) AS VARCHAR) FROM documents
    UNION ALL SELECT 'lang', 'distinct', CAST(count(DISTINCT lang) AS VARCHAR) FROM documents
    UNION ALL SELECT 'lang', 'min', min(lang) FROM documents
    UNION ALL SELECT 'lang', 'max', max(lang) FROM documents
    UNION ALL SELECT 'source', 'rows', CAST(count(*) AS VARCHAR) FROM documents
    UNION ALL SELECT 'source', 'nulls', CAST(count(CASE WHEN source IS NULL THEN 1 END) AS VARCHAR) FROM documents
    UNION ALL SELECT 'source', 'distinct', CAST(count(DISTINCT source) AS VARCHAR) FROM documents
    UNION ALL SELECT 'source', 'min', min(source) FROM documents
    UNION ALL SELECT 'source', 'max', max(source) FROM documents
    UNION ALL SELECT 'n_chars', 'rows', CAST(count(*) AS VARCHAR) FROM documents
    UNION ALL SELECT 'n_chars', 'nulls', CAST(count(CASE WHEN n_chars IS NULL THEN 1 END) AS VARCHAR) FROM documents
    UNION ALL SELECT 'n_chars', 'distinct', CAST(count(DISTINCT n_chars) AS VARCHAR) FROM documents
    UNION ALL SELECT 'n_chars', 'min', CAST(min(n_chars) AS VARCHAR) FROM documents
    UNION ALL SELECT 'n_chars', 'max', CAST(max(n_chars) AS VARCHAR) FROM documents
    """,
)
def _profile_table(spark, sf_dir):
    """Data-card profiling (operators/profile.py profile_table): rows /
    nulls / exact distinct / min / max per column in ONE global aggregate
    (map-side partials, single reduced row) exploded to long form — the
    audit table a corpus release ships with. Exact-distinct mode here so
    DuckDB can restate every number; text excluded (its min/max would
    hinge on cross-engine collation of arbitrary content, and a data card
    ranges ids/categories, not prose)."""
    from mortar_parquet_support_spark.operators.profile import profile_table

    docs = _t(spark, sf_dir, "documents")
    return profile_table(
        docs, columns=["doc_id", "lang", "source", "n_chars"],
        exact_distinct=True,
    )


@_register(
    "rank_normalize",
    """
    SELECT doc_id, lang,
           ROUND(PERCENT_RANK() OVER (
             PARTITION BY lang ORDER BY n_chars ASC NULLS FIRST
           ), 6) AS score_pct
    FROM documents
    """,
)
def _rank_normalize(spark, sf_dir):
    """Percentile-rank quality calibration per domain
    (operators/curation.py rank_normalize): (rank-1)/(n-1) within each
    lang, ordered by the raw score — 'top 5% of its domain' transfers
    across heterogeneous scorers where raw thresholds don't. Ties share
    a percentile (RANK semantics), NULL scores sort first. One window
    shuffle; the division is exact small-integer arithmetic, identical
    across engines."""
    from mortar_parquet_support_spark.operators.curation import rank_normalize

    docs = _t(spark, sf_dir, "documents")
    return rank_normalize(docs, "n_chars", by="lang", round_to=6).select(
        "doc_id", "lang", "score_pct"
    )


@_register(
    "cms_sketch",
    """
    WITH toks AS (
      SELECT lang,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), toks2 AS (SELECT lang, tok FROM toks WHERE tok <> ''),
    cells AS (
      SELECT lang, dd.d AS d,
             ('0x' || substr(md5('cms42:' || dd.d || ':' || tok), 1, 15))::BIGINT
               % 1024 AS w
      FROM toks2, (VALUES (0), (1), (2), (3)) AS dd(d)
    )
    SELECT lang, CAST(d AS INT) AS d, w, count(*) AS cnt,
           CAST(4 AS INT) AS depth, CAST(1024 AS INT) AS width,
           CAST(42 AS INT) AS seed
    FROM cells GROUP BY lang, d, w
    """,
)
def _cms_sketch(spark, sf_dir):
    """Count-min sketch state (operators/sketches.py cms_rollup): the
    mergeable FREQUENCY sketch completing the state family (HLL =
    distinct, qhist = quantiles, CMS = item counts). Hashing is the
    md5 hex-slice recipe, so the full depth x width cell state
    reproduces bit-for-bit in DuckDB."""
    from mortar_parquet_support_spark.operators.sketches import cms_rollup

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    return cms_rollup(toks, item="tok", keys=["lang"])


@_register(
    "cms_estimate",
    """
    WITH toks AS (
      SELECT lang,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), toks2 AS (SELECT lang, tok FROM toks WHERE tok <> ''),
    cells AS (
      SELECT lang, dd.d AS d,
             ('0x' || substr(md5('cms42:' || dd.d || ':' || tok), 1, 15))::BIGINT
               % 1024 AS w
      FROM toks2, (VALUES (0), (1), (2), (3)) AS dd(d)
    ), state AS (
      SELECT lang, d, w, count(*) AS cnt FROM cells GROUP BY 1, 2, 3
    ), pc AS (
      SELECT p.item, dd.d AS d,
             ('0x' || substr(md5('cms42:' || dd.d || ':' || p.item), 1, 15))::BIGINT
               % 1024 AS w
      FROM (VALUES ('the'), ('value'), ('scan'), ('zzz_absent')) AS p(item),
           (VALUES (0), (1), (2), (3)) AS dd(d)
    ), groups AS (SELECT DISTINCT lang FROM state)
    SELECT g.lang, pc.item, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
    FROM pc CROSS JOIN groups g
    LEFT JOIN state s ON s.lang = g.lang AND s.d = pc.d AND s.w = pc.w
    GROUP BY g.lang, pc.item
    """,
)
def _cms_estimate(spark, sf_dir):
    """Point-frequency estimates served from CMS state alone
    (operators/sketches.py cms_estimate): min over the depth rows with
    missing cells counting 0 — one-sided error (est >= true), checked
    end to end because every hash is engine-portable md5 arithmetic.
    'zzz_absent' pins the zero path."""
    from mortar_parquet_support_spark.operators.sketches import (
        cms_estimate,
        cms_rollup,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    state = cms_rollup(toks, item="tok", keys=["lang"])
    return cms_estimate(
        state, ["the", "value", "scan", "zzz_absent"], group_cols=["lang"]
    )


@_register(
    "heavy_hitters",
    """
    SELECT lang, w AS item, CAST(count(*) AS BIGINT) AS cnt,
           CAST(64 AS INT) AS k
    FROM (
      SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ) WHERE w <> ''
    GROUP BY lang, w
    """,
)
def _heavy_hitters(spark, sf_dir):
    """Bounded-state heavy hitters (operators/sketches.py heavy_hitters =
    mg_rollup partition-local Misra-Gries -> mg_reaggregate window trim):
    top words per language over the documents corpus. k=64 exceeds the
    fixture vocabulary (31 words), so the MG summary is provably EXACT
    (no trim ever fires) and the full mapInArrow + merge path value-
    hashes against plain GROUP BY counts; the lossy regime's frequency
    guarantee (miss/undercount <= n/(k+1)) is pytest-pinned."""
    from mortar_parquet_support_spark.operators.sketches import heavy_hitters

    from mortar_parquet_support_spark.functions import ws_tokens

    docs = _t(spark, sf_dir, "documents")
    # rlike guard + ws_tokens == the old explode(filter(split(trim)))
    # row-for-row: content-free docs exploded to nothing under the HOF
    # filter and are dropped pre-explode here; content docs tokenize
    # identically (functions.ws_tokens) — but codegen'd, not an
    # interpreted per-row lambda (r15)
    words = docs.filter(F.col("text").rlike(r"\S")).select(
        "lang", F.explode(ws_tokens(F.col("text"))).alias("word")
    )
    return heavy_hitters(words, item="word", keys=["lang"], k=64)


@_register(
    "streaming_heavy_hitters",
    """
    SELECT event_type AS item, CAST(count(*) AS BIGINT) AS cnt,
           CAST(16 AS INT) AS k
    FROM events WHERE event_type IS NOT NULL GROUP BY 1
    """,
)
def _streaming_heavy_hitters(spark, sf_dir):
    """Cross-batch bounded-state heavy hitters (streaming/rollup.py
    stream_heavy_hitters): per micro-batch Misra-Gries summaries merged
    into a persisted <= k-row running state via foreachBatch — forever
    top-items state that neither exact streaming groupBy (unbounded) nor
    watermarked state (forgets) provides. k=16 > the fixture's 5 event
    types, so the final state provably equals exact GROUP BY counts and
    value-hashes against DuckDB; the lossy regime is covered by the batch
    operator's pytest guarantee."""
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_heavy_hitters_once,
    )

    return stream_heavy_hitters_once(spark, sf_dir)


@_register(
    "winsorize",
    """
    WITH pre AS (
      SELECT user_id, CAST(user_id % 10 AS BIGINT) AS grp, ts,
             CAST(sum(event_id % 100) AS BIGINT) AS v
      FROM events GROUP BY 1, 2, 3
    ), b AS (
      SELECT grp, quantile_cont(v, 0.05) AS lo, quantile_cont(v, 0.95) AS hi
      FROM pre GROUP BY 1
    )
    SELECT p.user_id, p.ts, p.v,
           ROUND(least(greatest(CAST(p.v AS DOUBLE), b.lo), b.hi), 6)
             AS v_winsorized
    FROM pre p JOIN b USING (grp)
    """,
)
def _winsorize(spark, sf_dir):
    """Per-group percentile clipping (operators/features.py winsorize):
    integer per-(user, ts) sums clipped to their user-decile group's
    exact [p05, p95]. Spark's `percentile` and DuckDB's `quantile_cont`
    are both type-7 linear interpolation; integer inputs make the sort
    and the exact-index cases identical, and the clipped output is
    rounded at 6dp on both sides."""
    from mortar_parquet_support_spark.operators.features import winsorize

    ev = _t(spark, sf_dir, "events")
    pre = ev.groupBy(
        "user_id",
        (F.col("user_id") % 10).alias("grp"),
        "ts",
    ).agg(F.sum(F.col("event_id") % 100).alias("v"))
    out = winsorize(pre, value="v", keys=["grp"], lower=0.05, upper=0.95)
    return out.select(
        "user_id", "ts", "v",
        F.round(F.col("v_winsorized").cast("double"), 6).alias("v_winsorized"),
    )


@_register(
    "robust_outliers",
    """
    WITH pre AS (
      SELECT user_id, CAST(user_id % 10 AS BIGINT) AS grp, ts,
             CAST(sum(event_id % 100) AS BIGINT) AS v
      FROM events GROUP BY 1, 2, 3
    ), m AS (
      SELECT grp, quantile_cont(v, 0.5) AS med FROM pre GROUP BY 1
    ), d AS (
      SELECT grp, quantile_cont(abs(v - med), 0.5) AS mad
      FROM pre JOIN m USING (grp) GROUP BY 1
    )
    SELECT p.user_id, p.ts, p.v,
           ROUND(CASE WHEN d.mad > 0
                      THEN (p.v - m.med) / (1.4826 * d.mad) END, 6) AS robust_z,
           coalesce(CASE WHEN d.mad > 0
                         THEN ROUND(abs((p.v - m.med) / (1.4826 * d.mad))
                                    - 3.5, 6) > 0 END, false) AS is_outlier
    FROM pre p JOIN m USING (grp) JOIN d USING (grp)
    """,
)
def _robust_outliers(spark, sf_dir):
    """MAD-based robust outlier screen (operators/features.py
    robust_outliers): |value - median| in robust-sigma units per user
    decile — the screen the outliers cannot inflate (50% breakdown vs
    0% for mean/stddev). Margin rounded at 6dp on both engines
    (round_margin, same rationale as qc_flags' spike_round); robust_z
    itself compared rounded."""
    from mortar_parquet_support_spark.operators.features import (
        robust_outliers,
    )

    ev = _t(spark, sf_dir, "events")
    pre = ev.groupBy(
        "user_id",
        (F.col("user_id") % 10).alias("grp"),
        "ts",
    ).agg(F.sum(F.col("event_id") % 100).alias("v"))
    out = robust_outliers(
        pre, value="v", keys=["grp"], n_mads=3.5, round_margin=6
    )
    return out.select(
        "user_id", "ts", "v",
        F.round("robust_z", 6).alias("robust_z"),
        "is_outlier",
    )


@_register(
    "skew_report",
    """
    WITH c AS (
      SELECT event_type, user_id % 7 AS bucket, count(*) AS n
      FROM events GROUP BY 1, 2
    ), t AS (SELECT sum(n) AS total FROM c)
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / t.total, 6) AS share,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, event_type, bucket) AS INT)
             AS rank
    FROM c, t
    ORDER BY n DESC, event_type, bucket
    LIMIT 10
    """,
)
def _skew_report(spark, sf_dir):
    """Key-skew diagnosis (operators/profile.py skew_report): the 10
    heaviest (event_type, user-bucket) keys with exact counts and corpus
    share — the report that decides salting/AQE-skew/broadcast choices
    before a 100 TB join. Exact integer counts; share rounded at 6dp on
    both engines."""
    from mortar_parquet_support_spark.operators.profile import skew_report

    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 7).alias("bucket")
    )
    out = skew_report(ev, ["event_type", "bucket"], top=10)
    return out.select(
        "event_type", "bucket", "n",
        F.round("share", 6).alias("share"),
        F.col("rank").cast("int").alias("rank"),
    )


@_register(
    "histogram",
    """
    WITH pre AS (
      SELECT user_id % 5 AS grp, CAST(sum(event_id % 100) AS DOUBLE) AS v
      FROM events GROUP BY user_id % 5, user_id, ts
    ), b AS (
      SELECT grp, min(v) AS lo, max(v) AS hi FROM pre GROUP BY 1
    ), binned AS (
      SELECT p.grp,
             CASE WHEN b.hi = b.lo THEN 0
                  ELSE least(CAST(floor((p.v - b.lo) / ((b.hi - b.lo) / 8.0))
                                  AS INT), 7)
             END AS bin,
             b.lo AS glo, b.hi AS ghi
      FROM pre p JOIN b USING (grp)
    )
    SELECT CAST(grp AS BIGINT) AS grp, bin,
           ROUND(glo + bin * ((ghi - glo) / 8.0), 6) AS lo,
           ROUND(CASE WHEN bin = 7 THEN ghi
                      ELSE glo + (bin + 1) * ((ghi - glo) / 8.0) END, 6) AS hi,
           CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY 1, 2, glo, ghi
    """,
)
def _histogram(spark, sf_dir):
    """Exact equi-width histogram (operators/profile.py histogram): the
    per-(user, ts) integer sums binned into 8 buckets per user-quintile
    group. Bin edges are the same (v-lo)/((hi-lo)/bins) IEEE ops on both
    engines over integer-valued doubles, so assignments agree exactly;
    edges rounded at 6dp for display parity."""
    from mortar_parquet_support_spark.operators.profile import histogram

    ev = _t(spark, sf_dir, "events")
    pre = ev.groupBy(
        (F.col("user_id") % 5).alias("grp"), "user_id", "ts"
    ).agg(F.sum(F.col("event_id") % 100).cast("double").alias("v"))
    out = histogram(pre.select("grp", "v"), value="v", keys=["grp"], bins=8)
    return out.select(
        "grp", "bin",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        "n",
    )


@_register(
    "salted_agg",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total,
           ROUND(AVG(value), 6) AS mean,
           ROUND(MIN(value), 2) AS lo,
           ROUND(MAX(value), 2) AS hi
    FROM events GROUP BY event_type
    """,
)
def _salted_agg(spark, sf_dir):
    """Skew-mitigating two-phase aggregate (plans/skew.py salted_agg):
    shuffle on (key, salt) first so no reduce task owns a hot key, then
    re-aggregate the bounded partials — results EXACTLY equal the direct
    groupBy (the oracle is that direct groupBy), which is the point: the
    plan changes, the algebra does not. avg re-aggregates as exact
    sum/count; rounding only at the display edge."""
    from mortar_parquet_support_spark.plans.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": ("event_id", "count"),
            "total": ("value", "sum"),
            "mean": ("value", "avg"),
            "lo": ("value", "min"),
            "hi": ("value", "max"),
        },
        buckets=16,
    )
    return out.select(
        "event_type", "n",
        F.round("total", 2).alias("total"),
        F.round("mean", 6).alias("mean"),
        F.round("lo", 2).alias("lo"),
        F.round("hi", 2).alias("hi"),
    )


@_register(
    "validate_expectations",
    """
    SELECT 'orderkey_not_null' AS rule,
           CAST(coalesce(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'qty_le_30',
           CAST(coalesce(sum(CASE WHEN l_quantity IS NOT NULL AND l_quantity > 30 THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'returnflag_set',
           CAST(coalesce(sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'tax_nonneg_sql',
           CAST(coalesce(sum(CASE WHEN NOT coalesce(l_tax >= 0, FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'line_unique',
           CAST(coalesce((SELECT sum(n) FROM (
             SELECT count(*) AS n FROM lineitem
             GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
           )), 0) AS BIGINT)
    UNION ALL
    SELECT 'cust_fk',
           CAST((SELECT count(*) FROM orders
                 WHERE o_custkey IS NOT NULL
                   AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                         WHERE c_custkey IS NOT NULL)) AS BIGINT)
    """,
)
def _validate_expectations(spark, sf_dir):
    """Data-quality expectation gate (operators/validate.py
    validate_expectations): not_null / range / in_set / CHECK-sql rules
    in ONE aggregate scan of lineitem (plan-asserted in
    tests/test_validate.py), plus a uniqueness rule on the line key and
    an orders->customer foreign-key probe. qty_le_30 is deliberately
    tight so the fixture produces NONZERO violations — the machinery is
    value-checked, not just zero-checked."""
    from mortar_parquet_support_spark.operators.validate import (
        validate_expectations,
    )

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    li_report = validate_expectations(
        li,
        [
            {"name": "orderkey_not_null", "type": "not_null",
             "column": "l_orderkey"},
            {"name": "qty_le_30", "type": "range", "column": "l_quantity",
             "max": 30},
            {"name": "returnflag_set", "type": "in_set",
             "column": "l_returnflag", "values": ["A", "N", "R"]},
            {"name": "tax_nonneg_sql", "type": "sql", "expr": "l_tax >= 0"},
            {"name": "line_unique", "type": "unique",
             "columns": ["l_orderkey", "l_linenumber"]},
        ],
    )
    fk_report = validate_expectations(
        orders,
        [
            {"name": "cust_fk", "type": "foreign_key",
             "columns": ["o_custkey"], "ref": customer,
             "ref_columns": ["c_custkey"]},
        ],
    )
    return li_report.unionByName(fk_report)


@_register(
    "psi_drift",
    """
    WITH rf AS (
      SELECT CAST(length(text) AS DOUBLE) AS v FROM documents
      WHERE source = 'src0' AND text IS NOT NULL
    ), cu AS (
      SELECT CAST(length(text) AS DOUBLE) AS v FROM documents
      WHERE source = 'src2' AND text IS NOT NULL
    ), b AS (
      SELECT min(v) AS lo, max(v) AS hi FROM rf
    ), rbin AS (
      SELECT CASE WHEN hi <= lo THEN 0
                  ELSE GREATEST(LEAST(CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT), 9), 0)
             END AS bin,
             count(*) AS n_ref
      FROM rf CROSS JOIN b GROUP BY 1
    ), cbin AS (
      SELECT CASE WHEN hi <= lo THEN 0
                  ELSE GREATEST(LEAST(CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT), 9), 0)
             END AS bin,
             count(*) AS n_cur
      FROM cu CROSS JOIN b GROUP BY 1
    ), grid AS (
      SELECT CAST(unnest(range(0, 10)) AS INT) AS bin
    ), per_bin AS (
      SELECT g.bin, coalesce(r.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
      FROM grid g LEFT JOIN rbin r USING (bin) LEFT JOIN cbin c USING (bin)
    ), tot AS (
      SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM per_bin
    ), terms AS (
      SELECT n_ref, n_cur,
             CASE WHEN ROUND(n_ref / t_ref, 6) > 0
                  THEN ROUND(n_ref / t_ref, 6) ELSE 0.0001 END AS p_s,
             CASE WHEN ROUND(n_cur / GREATEST(t_cur, 1), 6) > 0
                  THEN ROUND(n_cur / GREATEST(t_cur, 1), 6) ELSE 0.0001 END AS q_s
      FROM per_bin CROSS JOIN tot
    )
    SELECT ROUND(sum((p_s - q_s) * ln(p_s / q_s)), 6) AS psi,
           CAST(sum(n_ref) AS BIGINT) AS n_ref,
           CAST(sum(n_cur) AS BIGINT) AS n_cur
    FROM terms
    """,
)
def _psi_drift(spark, sf_dir):
    """Population Stability Index drift monitor (operators/profile.py
    psi_drift): text-length distribution of src2 documents vs the src0
    reference, 10 equi-width bins fixed by the REFERENCE range (current
    values outside it clamp into the edge bins — counted as drift, not
    dropped). Proportions and the final statistic rounded at 1e-6 so
    libm ln ulps cannot leak into the report on either engine."""
    from mortar_parquet_support_spark.operators.profile import psi_drift

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ref = docs.filter(F.col("source") == "src0").select(
        F.length("text").cast("double").alias("v")
    )
    cur = docs.filter(F.col("source") == "src2").select(
        F.length("text").cast("double").alias("v")
    )
    return psi_drift(ref, cur, value="v", bins=10)


@_register(
    "categorical_drift",
    """
    WITH rf AS (
      SELECT coalesce(event_type, chr(0) || '<NULL>') AS category, count(*) AS n_ref
      FROM events WHERE CAST(event_id % 2 AS INT) = 0 GROUP BY 1
    ), cu AS (
      SELECT coalesce(event_type, chr(0) || '<NULL>') AS category, count(*) AS n_cur
      FROM events WHERE CAST(event_id % 2 AS INT) = 1 GROUP BY 1
    ), per_cat AS (
      SELECT coalesce(rf.category, cu.category) AS category,
             CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
             CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
      FROM rf FULL OUTER JOIN cu USING (category)
    ), tot AS (
      SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM per_cat
    )
    SELECT CASE WHEN category = chr(0) || '<NULL>' THEN NULL
                ELSE category END AS category,
           n_ref, n_cur,
           ROUND(n_ref / GREATEST(t_ref, 1), 6) AS p_ref,
           ROUND(n_cur / GREATEST(t_cur, 1), 6) AS p_cur,
           CASE WHEN n_ref > 0 THEN
             ROUND((ROUND(n_cur / GREATEST(t_cur, 1), 6)
                    - ROUND(n_ref / GREATEST(t_ref, 1), 6))
                   * (ROUND(n_cur / GREATEST(t_cur, 1), 6)
                      - ROUND(n_ref / GREATEST(t_ref, 1), 6))
                   / (CASE WHEN ROUND(n_ref / GREATEST(t_ref, 1), 6) > 0
                           THEN ROUND(n_ref / GREATEST(t_ref, 1), 6)
                           ELSE 0.0001 END), 6)
           END AS contrib
    FROM per_cat CROSS JOIN tot
    """,
)
def _categorical_drift(spark, sf_dir):
    """Categorical mix-shift report (operators/profile.py
    categorical_drift): event-type proportions of odd event_ids vs the
    even-id reference half — per-category chi-square contribution with
    rounded proportions, NULL types tracked as their own category, new
    categories flagged by NULL contrib."""
    from mortar_parquet_support_spark.operators.profile import (
        categorical_drift,
    )

    ev = _t(spark, sf_dir, "events")
    ref = ev.filter((F.col("event_id") % 2) == 0).select("event_type")
    cur = ev.filter((F.col("event_id") % 2) == 1).select("event_type")
    return categorical_drift(ref, cur, value="event_type")


@_register("stream_drift")
def _stream_drift(spark, sf_dir):
    """Streaming drift monitor (streaming/rollup.py
    stream_drift_monitor): per-micro-batch PSI of the events value
    stream against a FROZEN reference grid (first event_id half).
    Rows-only: batch boundaries are a streaming-runtime artifact with
    no SQL equivalent; the PSI arithmetic itself is the oracle-checked
    psi_drift formula, and the per-batch equivalence vs the batch
    operator is pytest-pinned (tests/test_stream_incremental.py)."""
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_drift_once,
    )

    return stream_drift_once(spark, sf_dir)


@_register("stream_drift_by")
def _stream_drift_by(spark, sf_dir):
    """Per-KEY streaming drift monitor (streaming/rollup.py
    stream_drift_monitor_by — r11, rounding out the family: psi_drift
    has psi_drift_by on the batch side, stream_drift now has this on
    the stream side): per-micro-batch PSI of the events value stream
    PER event_type, each group binned on its own frozen reference grid
    (first event_id half). Rows-only for the same reason as
    stream_drift: batch boundaries are a streaming-runtime artifact;
    the per-(batch, key) PSI == batch psi_drift_by equivalence is
    pytest-pinned (tests/test_stream_incremental.py)."""
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_drift_by_once,
    )

    return stream_drift_by_once(spark, sf_dir)


@_register("stream_validate")
def _stream_validate(spark, sf_dir):
    """Per-micro-batch expectations gate (streaming/rollup.py
    stream_validate_gate — r11, the streaming leg of
    validate_expectations): three representative rules (not_null /
    range / in_set, bounds chosen so the fixture yields NONZERO
    violations) run per batch over the events stream, report appended
    as (batch_id, rule, n_violations). Rows-only for the usual
    streaming reason; per-batch == batch validate_expectations is
    pytest-pinned (tests/test_stream_incremental.py)."""
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_validate_once,
    )

    return stream_validate_once(spark, sf_dir)


@_register(
    "psi_drift_by",
    """
    WITH rf AS (
      SELECT source, CAST(length(text) AS DOUBLE) AS v FROM documents
      WHERE CAST(doc_id % 2 AS INT) = 0 AND text IS NOT NULL
            AND source IS NOT NULL
    ), cu AS (
      SELECT source, CAST(length(text) AS DOUBLE) AS v FROM documents
      WHERE CAST(doc_id % 2 AS INT) = 1 AND text IS NOT NULL
            AND source IS NOT NULL
    ), b AS (
      SELECT source, min(v) AS lo, max(v) AS hi FROM rf GROUP BY source
    ), rbin AS (
      SELECT rf.source,
             CASE WHEN hi <= lo THEN 0
                  ELSE GREATEST(LEAST(CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT), 9), 0)
             END AS bin, count(*) AS n_ref
      FROM rf JOIN b USING (source) GROUP BY 1, 2
    ), cbin AS (
      SELECT cu.source,
             CASE WHEN hi <= lo THEN 0
                  ELSE GREATEST(LEAST(CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT), 9), 0)
             END AS bin, count(*) AS n_cur
      FROM cu JOIN b USING (source) GROUP BY 1, 2
    ), grid AS (
      SELECT source, CAST(unnest(range(0, 10)) AS INT) AS bin FROM b
    ), per_bin AS (
      SELECT g.source, g.bin,
             coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
      FROM grid g
      LEFT JOIN rbin USING (source, bin)
      LEFT JOIN cbin USING (source, bin)
    ), tot AS (
      SELECT source, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
      FROM per_bin GROUP BY source
    ), terms AS (
      SELECT p.source, p.n_ref, p.n_cur,
             CASE WHEN ROUND(p.n_ref / t.t_ref, 6) > 0
                  THEN ROUND(p.n_ref / t.t_ref, 6) ELSE 0.0001 END AS p_s,
             CASE WHEN ROUND(p.n_cur / GREATEST(t.t_cur, 1), 6) > 0
                  THEN ROUND(p.n_cur / GREATEST(t.t_cur, 1), 6) ELSE 0.0001 END AS q_s
      FROM per_bin p JOIN tot t USING (source)
    )
    SELECT source, ROUND(sum((p_s - q_s) * ln(p_s / q_s)), 6) AS psi,
           CAST(sum(n_ref) AS BIGINT) AS n_ref,
           CAST(sum(n_cur) AS BIGINT) AS n_cur
    FROM terms GROUP BY source
    """,
)
def _psi_drift_by(spark, sf_dir):
    """Per-source PSI in one plan (operators/profile.py psi_drift_by):
    text-length drift of odd-doc_id documents vs the even-id reference
    half, one row per source, each on its own reference-range bin grid.
    The grouped sibling of psi_drift — no driver-side group loop."""
    from mortar_parquet_support_spark.operators.profile import psi_drift_by

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    ref = docs.filter((F.col("doc_id") % 2) == 0).select(
        "source", F.length("text").cast("double").alias("v")
    )
    cur = docs.filter((F.col("doc_id") % 2) == 1).select(
        "source", F.length("text").cast("double").alias("v")
    )
    return psi_drift_by(ref, cur, value="v", keys=["source"], bins=10)


@_register(
    "embedding_drift",
    """
    WITH rme AS (
      SELECT i AS pos, ROUND(avg(v), 6) AS a, count(*) AS cr FROM (
        SELECT unnest(embedding::DOUBLE[]) AS v,
               unnest(range(0, array_length(embedding))) AS i
        FROM embeddings
        WHERE CAST(vec_id % 2 AS INT) = 0 AND embedding IS NOT NULL
      ) GROUP BY i
    ), cme AS (
      SELECT i AS pos, ROUND(avg(v), 6) AS b, count(*) AS cc FROM (
        SELECT unnest(embedding::DOUBLE[]) AS v,
               unnest(range(0, array_length(embedding))) AS i
        FROM embeddings
        WHERE CAST(vec_id % 2 AS INT) = 1 AND embedding IS NOT NULL
      ) GROUP BY i
    ), j AS (
      SELECT coalesce(a, 0.0) AS a, coalesce(b, 0.0) AS b
      FROM rme FULL OUTER JOIN cme USING (pos)
    ), agg AS (
      SELECT sum(a * b) AS dot, sum(a * a) AS na, sum(b * b) AS nb FROM j
    )
    SELECT ROUND(CASE WHEN na > 0 AND nb > 0
                      THEN dot / (sqrt(na) * sqrt(nb)) END, 6) AS mean_cosine,
           ROUND(sqrt(na), 6) AS ref_norm,
           ROUND(sqrt(nb), 6) AS cur_norm,
           (SELECT CAST(max(cr) AS BIGINT) FROM rme) AS n_ref,
           (SELECT CAST(max(cc) AS BIGINT) FROM cme) AS n_cur
    FROM agg
    """,
)
def _embedding_drift(spark, sf_dir):
    """Embedding-space drift alarm (operators/embeddings.py
    embedding_drift): mean-vector cosine between the odd-vec_id half
    and the even-id reference half. Per-position means rounded at 1e-6
    before the dims-bounded dot/norm arithmetic so float-sum order
    cannot leak into the report on either engine."""
    from mortar_parquet_support_spark.operators.embeddings import (
        embedding_drift,
    )

    emb = _t(spark, sf_dir, "embeddings")
    ref = emb.filter((F.col("vec_id") % 2) == 0)
    cur = emb.filter((F.col("vec_id") % 2) == 1)
    return embedding_drift(ref, cur)
