"""Feature-preprocessing operators: distribution cleanup a training-data
pipeline applies to numeric columns before they feed models or quality
scores (not in the reference — SURVEY §2.6 declares the absence; extends
the LLM-data north star alongside operators/curation.py).

- **winsorize**: clip to per-group exact percentiles — the standard
  heavy-tail guard before averaging/scaling.
- **robust_outliers**: flag values by distance from the MEDIAN in MAD
  units (median absolute deviation) — the robust sibling of qc_flags'
  rolling-sigma spike test: one global/partitioned screen instead of a
  trailing window, immune to the outliers inflating their own baseline.

Scale shape (both): one grouped EXACT-percentile aggregate over the
value column (groups << rows by construction — the group count bounds
the aggregate's output, and Spark's percentile is a single-pass typed
aggregate), then the tiny per-group bounds frame joins back
(broadcast-eligible; AQE decides above the threshold). The row side is
never shuffled. ``robust_outliers`` pays the percentile aggregate twice
(the MAD needs deviations from an already-known median) — still two
small aggregates and zero row-side shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mortar_parquet_support_spark.plans.hints import maybe_broadcast

#: scale factor making MAD a consistent sigma estimator under normality
#: (1 / Phi^-1(3/4)) — the constant every robust-z implementation uses.
MAD_SIGMA = 1.4826


def winsorize(
    df: DataFrame,
    *,
    value: str,
    keys: Sequence[str] = (),
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: "str | None" = None,
) -> DataFrame:
    """Clip ``value`` to its per-group [``lower``, ``upper``] exact
    percentiles (linear interpolation — Spark's ``percentile``, matching
    DuckDB's ``quantile_cont``). NULL values pass through NULL; a group
    of all-NULL values gets NULL bounds and passes everything through.
    Output column ``out_col`` (default ``<value>_winsorized``) rides
    along with every input column."""
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(
            f"need 0 <= lower <= upper <= 1, got ({lower}, {upper})"
        )
    keys = list(keys)
    out = out_col or f"{value}_winsorized"
    bounds = df.groupBy(*keys).agg(
        F.percentile(F.col(value), F.lit(float(lower))).alias("__lo"),
        F.percentile(F.col(value), F.lit(float(upper))).alias("__hi"),
    )
    joined = (
        df.join(maybe_broadcast(bounds), keys) if keys
        else df.crossJoin(F.broadcast(bounds))
    )
    clipped = F.when(
        F.col(value).isNotNull()
        & F.col("__lo").isNotNull()
        & F.col("__hi").isNotNull(),
        F.least(F.greatest(F.col(value), F.col("__lo")), F.col("__hi")),
    ).otherwise(F.col(value))
    return joined.withColumn(out, clipped).drop("__lo", "__hi")


def robust_outliers(
    df: DataFrame,
    *,
    value: str,
    keys: Sequence[str] = (),
    n_mads: float = 3.5,
    round_margin: "int | None" = None,
) -> DataFrame:
    """Flag rows whose ``value`` sits more than ``n_mads`` robust sigmas
    (MAD * 1.4826) from the per-group MEDIAN: adds ``robust_z`` (NULL
    for NULL values / degenerate groups) and ``is_outlier``. MAD-based
    screening survives what breaks mean/stddev screens: the outliers
    themselves cannot inflate the baseline that judges them (breakdown
    point 50% vs 0%).

    A zero MAD (>= half the group identical) yields NULL robust_z and
    flags nothing — the degenerate case where "robust sigma" has no
    meaning; pair with an exact-duplicate screen instead.

    ``round_margin``: like qc_flags' spike_round — when set, the
    |z| - n_mads margin is rounded before the > 0 test so a value
    sitting exactly on the boundary cannot flip on a last-ulp
    percentile-interpolation difference between engines."""
    keys = list(keys)
    med = df.groupBy(*keys).agg(
        F.percentile(F.col(value), F.lit(0.5)).alias("__med")
    )
    j1 = (
        df.join(maybe_broadcast(med), keys) if keys
        else df.crossJoin(F.broadcast(med))
    )
    mad = j1.groupBy(*keys).agg(
        F.percentile(
            F.abs(F.col(value) - F.col("__med")), F.lit(0.5)
        ).alias("__mad")
    )
    j2 = j1.join(maybe_broadcast(mad), keys) if keys else j1.crossJoin(
        F.broadcast(mad)
    )
    z = F.when(
        F.col("__mad") > 0,
        (F.col(value) - F.col("__med")) / (F.lit(MAD_SIGMA) * F.col("__mad")),
    )
    margin = F.abs(z) - F.lit(float(n_mads))
    if round_margin is not None:
        margin = F.round(margin, round_margin)
    return (
        j2.withColumn("robust_z", z)
        .withColumn(
            "is_outlier", F.coalesce(margin > 0, F.lit(False))
        )
        .drop("__med", "__mad")
    )


def quantile_buckets(
    df: DataFrame,
    *,
    value: str,
    tie_col: str,
    keys: Sequence[str] = (),
    buckets: int = 10,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-group quantile bucket (1-based NTILE) for every row — the
    stratification step under quality-tiered sampling ("keep the top
    quality decile per source, downsample the middle, drop the tail"):
    rows sort by (``value``, ``tie_col``) within each key group and
    split into ``buckets`` near-equal strata, largest values in the
    highest bucket. Standard-SQL NTILE semantics (earlier buckets take
    the remainder rows), so any engine reproduces the exact assignment
    — ``tie_col`` (a unique id) makes the order, and therefore every
    boundary row's bucket, deterministic rather than partition-order
    luck.

    NULL values get a NULL bucket (they have no rank position — and
    engines DISAGREE on default NULL sort order: Spark ASC is NULLS
    FIRST, DuckDB NULLS LAST, so leaving them in the window would
    silently shift every bucket by the NULL count on one engine).

    Scale shape: one shuffle (the per-key window); the NULL branch is a
    second scan of a filtered alias — Catalyst collapses both onto one
    source scan when the input is a file source. EMPTY ``keys`` means a
    GLOBAL NTILE, which (like any exact global ranking) funnels every
    row through ONE window partition — fine for model-sized frames,
    a wall for corpus-sized ones: stratify within a natural partition
    key (source, date, shard) instead, or use
    :func:`percentile_buckets` — the shipped zero-shuffle approximate
    strata (exact percentile boundaries + in-row comparison) for when
    an exact equal-count split is not actually required."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if bucket_col in df.columns:
        raise ValueError(
            f"quantile_buckets writes column {bucket_col!r}; rename first"
        )
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col(value).asc(), F.col(tie_col).asc()
    )
    nn = df.filter(F.col(value).isNotNull()).withColumn(
        bucket_col, F.ntile(buckets).over(w)
    )
    nulls = df.filter(F.col(value).isNull()).withColumn(
        bucket_col, F.lit(None).cast("int")
    )
    return nn.unionByName(nulls)


def percentile_buckets(
    df: DataFrame,
    *,
    value: str,
    keys: Sequence[str] = (),
    buckets: int = 10,
    bucket_col: str = "bucket",
    round_to: "int | None" = None,
) -> DataFrame:
    """Approximate quantile stratification at any scale — the
    first-class answer to :func:`quantile_buckets`' empty-``keys`` wall
    (an exact global NTILE funnels every row through ONE window
    partition; this never shuffles the row side at all): compute the
    ``buckets - 1`` exact interpolated percentile BOUNDARIES of
    ``value`` (one small aggregate — output is bounds-sized, not
    row-sized), broadcast them back, and assign each row
    ``1 + #{boundaries < value}`` in-row.

    The approximation is in the COUNTS, not the ordering: buckets are
    still monotone in ``value`` and boundaries are the exact i/buckets
    percentiles, but equal values always share a bucket (NTILE splits
    ties by the tie column to force equal counts) and interpolation
    places boundaries BETWEEN order statistics, so bucket populations
    are near-equal rather than exactly-equal — which is what
    stratified sampling actually needs ("top decile", "middle 80%"),
    and no tie column is required. Values exactly ON a boundary go to
    the LOWER bucket (``>`` comparison, deterministic on both engines);
    NULL values get a NULL bucket, and a NULL KEY group stratifies like
    any other via a null-safe join (both the quantile_buckets
    contract — rows are never silently dropped).
    ``round_to`` optionally rounds the boundaries first, for callers
    that want boundary comparisons robust to last-ulp interpolation
    differences across engines (Spark ``percentile`` and DuckDB
    ``quantile_cont`` agree bit-for-bit on the fixtures — the winsorize
    oracle pins that — so the default leaves values untouched).

    Scale shape: one grouped exact-percentile aggregate (the winsorize
    plan — groups << rows, single-pass typed aggregate), one broadcast
    join, zero row-side shuffles, zero windows. At 100 TB this is the
    difference between a map-side stamp and a corpus-wide sort."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if bucket_col in df.columns:
        raise ValueError(
            f"percentile_buckets writes column {bucket_col!r}; rename first"
        )
    keys = list(keys)
    v = F.col(value)
    fracs = [i / buckets for i in range(1, buckets)]

    def q(f):
        p = F.percentile(v, F.lit(f))
        return p if round_to is None else F.round(p, round_to)

    gen_cols = [f"__pb_q{i}" for i in range(len(fracs))] or ["__pb_q_none"]
    key_scratch = [f"__pb_k{i}" for i in range(len(keys))]
    clobbered = (set(gen_cols) | set(key_scratch)) & set(df.columns)
    if clobbered:
        raise ValueError(
            f"percentile_buckets uses scratch columns {sorted(clobbered)}; "
            "rename first"
        )
    aggs = [q(f).alias(c) for c, f in zip(gen_cols, fracs)]
    # buckets == 1 still needs one aggregate row to join against
    bounds = df.groupBy(*keys).agg(
        *(aggs or [F.count(F.lit(1)).alias(gen_cols[0])])
    )
    if keys:
        # null-SAFE join: groupBy keeps a NULL-key group, and
        # quantile_buckets (whose scale substitute this is) stratifies
        # it like any other — a plain equi-join would silently DROP
        # every NULL-keyed row instead (review r11)
        for i, k in enumerate(keys):
            bounds = bounds.withColumnRenamed(k, key_scratch[i])
        cond = F.lit(True)
        for i, k in enumerate(keys):
            cond = cond & F.col(k).eqNullSafe(F.col(key_scratch[i]))
        joined = df.join(maybe_broadcast(bounds), cond).drop(*key_scratch)
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    bucket = F.lit(1)
    for i in range(len(fracs)):
        bucket = bucket + (v > F.col(f"__pb_q{i}")).cast("int")
    out = joined.withColumn(
        bucket_col, F.when(v.isNotNull(), bucket).cast("int")
    )
    return out.drop(*gen_cols)
