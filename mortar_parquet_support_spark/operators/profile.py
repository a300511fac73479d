"""Dataset profiling: the data-card / audit stats a curation run ships with.

North-star extension (BASELINE.json:6): every corpus release wants a
profile table — row counts, null counts, cardinalities, ranges per column —
both as documentation and as the drift check between snapshots
(sources/maintenance.py diff_tables tells you WHICH rows changed; this
tells you whether the SHAPE moved). The reference has no profiling surface
(SURVEY.md §2.6).

Scale shape: ONE global aggregate over the table — map-side partial
aggregation, a single reduced row, no wide shuffle — then an in-row
explode to the long (col_name, metric, value) form. The one deliberate
cost knob is exact distinct counts: MULTIPLE exact count_distincts in one
aggregate plan through Spark's Expand (input replicated once per distinct
aggregate), so the default is approx_count_distinct (HLL++, one pass, no
Expand) and ``exact_distinct=True`` is opt-in for audits that need the
true number (the DuckDB-oracle entry runs exact mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mortar_parquet_support_spark.plans.hints import maybe_broadcast

#: types whose min/max are portable across engines (binary/collation-free
#: comparisons and unambiguous string rendering)
_ORDERABLE = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
    T.StringType, T.DateType, T.BooleanType,
    T.TimestampType, T.TimestampNTZType,
)


def profile_table(
    df: DataFrame,
    *,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-form profile (col_name, metric, value) with one row per
    (column, metric): ``rows`` (table row count, repeated per column so
    each column's block is self-contained), ``nulls``, ``distinct``
    (approx by default — see module docstring; nulls not counted),
    ``min`` / ``max`` (orderable types only, NULL otherwise — array/map/
    struct/binary ranges are not portable). Values render as strings so
    one schema fits every column type; timestamps render in ISO form via
    Spark's cast.

    One aggregate job + an in-row explode; with ``exact_distinct`` the
    aggregate plans through Expand (input x n_columns) — fine for an
    audit, wasteful as a recurring 100 TB job."""
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: no such columns {missing}")
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    dupes = sorted({c for c in cols if cols.count(c) > 1})
    if dupes:
        # duplicate requests would emit duplicate (col_name, metric) keys,
        # breaking the one-row-per-pair contract consumers key on
        raise ValueError(f"profile_table: duplicate columns {dupes}")
    types = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))

    def q(c: str) -> F.Column:
        return F.col("`" + c.replace("`", "``") + "`")

    n_distinct = (
        (lambda c: F.count_distinct(q(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(q(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.when(q(c).isNull(), 1)).alias(f"__nulls_{i}"))
        aggs.append(n_distinct(c).alias(f"__distinct_{i}"))
        if isinstance(types[c], _ORDERABLE):
            aggs.append(F.min(q(c)).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(q(c)).cast("string").alias(f"__max_{i}"))
    one = df.agg(*aggs)

    entries = []
    for i, c in enumerate(cols):
        block = [
            ("rows", F.col("__rows").cast("string")),
            ("nulls", F.col(f"__nulls_{i}").cast("string")),
            ("distinct", F.col(f"__distinct_{i}").cast("string")),
        ]
        if isinstance(types[c], _ORDERABLE):
            block.append(("min", F.col(f"__min_{i}")))
            block.append(("max", F.col(f"__max_{i}")))
        else:
            block.append(("min", F.lit(None).cast("string")))
            block.append(("max", F.lit(None).cast("string")))
        for metric, val in block:
            entries.append(
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.lit(metric).alias("metric"),
                    val.alias("value"),
                )
            )
    return one.select(F.explode(F.array(*entries)).alias("p")).select(
        "p.col_name", "p.metric", "p.value"
    )


def skew_report(
    df: DataFrame,
    keys: "Sequence[str]",
    *,
    top: int = 20,
) -> DataFrame:
    """Key-skew diagnosis: the ``top`` heaviest key values with exact
    counts, corpus share, and a rank — the report that decides whether a
    join/groupBy on these keys needs salting, AQE skew handling, or a
    broadcast rethink (one hot key holding 30% of a fact table is the
    single most common 100 TB plan-killer, and it is invisible until
    measured).

    Output: (keys..., ``n``, ``share``, ``rank``) — ``share`` is the
    exact fraction of ALL rows (NULL keys count; they are often the
    hottest "key"), rank 1 = heaviest, ties broken by key value.

    Scale shape: one map-side-combined count aggregate (output bounded by
    distinct keys), a 1-row total broadcast-joined back (never a global
    window over the counts), and a TakeOrdered for the top slice — the
    final rank window runs over ``top`` rows only."""
    if isinstance(keys, str):
        raise TypeError("keys must be a sequence of column names, not a str")
    keys = list(keys)
    if not keys:
        raise ValueError("skew_report needs at least one key column")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    sliced = (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.col("n").desc(), *[F.col(k) for k in keys])
        .limit(top)
    )
    w = Window.orderBy(F.col("n").desc(), *[F.col(k) for k in keys])
    return (
        sliced.withColumn("share", F.col("n") / F.col("__total"))
        .withColumn("rank", F.row_number().over(w))
        .drop("__total")
    )


def histogram(
    df: DataFrame,
    *,
    value: str,
    keys: "Sequence[str]" = (),
    bins: int = 20,
) -> DataFrame:
    """Exact equi-width histogram per group: (keys..., ``bin``, ``lo``,
    ``hi``, ``n``) with ``bins`` buckets spanning the group's [min, max]
    — the distribution panel on every data card, computed EXACTLY (the
    mergeable :func:`~...sketches.qhist_rollup` is the streaming/
    persistable sibling; this is the one-shot report). NULL values are
    not binned; a constant group (min == max) puts everything in bin 0;
    empty bins are not emitted (the caller's plot fills gaps — emitting
    them would manufacture groups x bins rows of zeros at scale).

    Scale shape: one grouped (min, max) aggregate, broadcast back (the
    bounds frame is group-count-sized), bin assignment in-row, then one
    (keys, bin) count — two aggregates, the row side shuffled once.
    The max value lands in the LAST bin (the right edge is closed there,
    half-open everywhere else — numpy.histogram semantics)."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if isinstance(keys, str):
        # list('src') would group by columns 's','r','c' — the same guard
        # skew_report already carries (review r14)
        raise TypeError("keys must be a sequence of column names, not a str")
    keys = list(keys)
    v = F.col(value).cast("double")
    # NULL group keys are EXCLUDED, by contract: the bounds broadcast
    # joins back on key equality, which never matches NULL — the rows
    # would silently vanish mid-plan (review r14); excluding them up
    # front makes the behavior explicit and symmetric. The NULL-keyed
    # slice is skew_report/null_report territory, or one
    # coalesce(key, '<NULL>') away for callers that want it binned.
    base = df.filter(v.isNotNull())
    for k in keys:
        base = base.filter(F.col(k).isNotNull())
    bounds = base.groupBy(*keys).agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )
    joined = (
        base.join(maybe_broadcast(bounds), keys)
        if keys
        else base.crossJoin(F.broadcast(bounds))
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    raw_bin = F.floor((v - F.col("__lo")) / width).cast("int")
    b = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(raw_bin, F.lit(bins - 1))  # max value joins the last bin
    )
    return (
        joined.withColumn("bin", b)
        .groupBy(*keys, "bin", "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            "bin",
            (F.col("__lo") + F.col("bin") * width).alias("lo"),
            F.when(
                F.col("bin") == bins - 1, F.col("__hi")
            ).otherwise(F.col("__lo") + (F.col("bin") + 1) * width).alias("hi"),
            "n",
        )
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    *,
    value: str,
    bins: int = 10,
    epsilon: float = 1e-4,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between a REFERENCE snapshot and the
    CURRENT batch of a numeric column — the standard distribution-drift
    monitor gating a training-data drop ("did this crawl's length/
    quality/score distribution move?"; common reading: < 0.1 stable,
    0.1-0.25 drifting, > 0.25 action). Returns ONE row:
    (``psi``, ``n_ref``, ``n_cur``) plus the per-bin detail frame is a
    trivial variant (see the implementation's ``per_bin``).

    Binning is fixed by the REFERENCE's [min, max] (equi-width, the
    :func:`histogram` arithmetic) so the comparison is apples-to-apples:
    current values left of the range clamp into bin 0, right of it into
    the last bin — drift OUT of the reference range lands in the edge
    bins and is counted, not silently dropped. NULLs are excluded on
    both sides (pair with a not_null expectation). Zero-count bins take
    ``epsilon`` mass before the log ratio (the standard PSI smoothing —
    ln(p/0) would be infinite); both proportions and the final sum are
    ROUNDED (``round_to``) so libm ln ulps cannot leak into the
    reported statistic across engines.

    Scale shape: one (min, max) aggregate over the reference, then one
    bucket-count aggregate per side (bins-bounded outputs), one tiny
    outer join of the two bin tables, one 1-row sum. Neither corpus is
    ever shuffled row-wise."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(value).cast("double")
    bounds = ref.filter(v.isNotNull()).agg(
        F.min(v).alias("lo"), F.max(v).alias("hi")
    ).first()
    if bounds["lo"] is None:
        raise ValueError("psi_drift: reference has no non-NULL values")
    lo, hi = float(bounds["lo"]), float(bounds["hi"])

    def bucketed(df: DataFrame, side: str) -> DataFrame:
        # THE shared bin expression — this function carried its own copy
        # with the identical cast-then-clamp overflow bug equi_bin just
        # fixed, the exact divergence equi_bin exists to prevent
        # (review r14)
        b = equi_bin(v, F.lit(lo), F.lit(hi), bins)
        return (
            df.filter(v.isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    all_bins = ref.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    per_bin = (
        all_bins.join(bucketed(ref, "ref"), "bin", "left")
        .join(bucketed(cur, "cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    totals = per_bin.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    eps = F.lit(float(epsilon))
    joined = per_bin.crossJoin(F.broadcast(totals))
    p = F.round(F.col("n_ref") / F.col("t_ref"), round_to)
    q = F.round(F.col("n_cur") / F.greatest(F.col("t_cur"), F.lit(1)), round_to)
    p_s = F.when(p > 0, p).otherwise(eps)
    q_s = F.when(q > 0, q).otherwise(eps)
    term = (p_s - q_s) * F.log(p_s / q_s)
    return joined.agg(
        F.round(F.sum(term), round_to).alias("psi"),
        F.sum("n_ref").cast("long").alias("n_ref"),
        F.sum("n_cur").cast("long").alias("n_cur"),
    )


def categorical_drift(
    ref: DataFrame,
    cur: DataFrame,
    *,
    value: str,
    round_to: int = 6,
    epsilon: float = 1e-4,
) -> DataFrame:
    """Categorical drift between snapshots: per-category reference vs
    current PROPORTIONS with the chi-square-style contribution
    ``(q - p)^2 / p`` and the PSI-style L1 shift — the categorical
    sibling of :func:`psi_drift` for source/language/event-type mixes
    ("did this crawl's language mix move?"). Returns one row per
    category seen on EITHER side: (``category``, ``n_ref``, ``n_cur``,
    ``p_ref``, ``p_cur``, ``contrib``) — sum ``contrib`` for the
    statistic, inspect rows for the why. Categories absent from the
    reference (``n_ref`` = 0) get NULL contrib (a new category has no
    expected proportion — it IS the finding; filter ``contrib IS NULL``
    for arrivals: NULL means truly-new, never merely-rare — a PRESENT
    reference category whose proportion rounds to 0 takes ``epsilon``
    as its expected value instead, the same smoothing psi_drift
    applies, so rare-but-known categories still contribute a finite
    number). NULL category values form their own category (an
    attribution gap is a real mix shift).

    Proportions are rounded (``round_to``) before the arithmetic so the
    report is engine-identical; the remaining ops are single IEEE
    multiply/divide. Scale shape: one groupBy per side (outputs bounded
    by category cardinality), one tiny outer join — corpora never
    row-shuffled."""
    sentinel = "\x00<NULL>"
    c = F.coalesce(F.col(value).cast("string"), F.lit(sentinel))

    def counted(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy(c.alias("category")).agg(
            F.count(F.lit(1)).alias(f"n_{side}")
        )

    per_cat = counted(ref, "ref").join(
        counted(cur, "cur"), "category", "full"
    ).select(
        "category",
        F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
    )
    totals = per_cat.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    j = per_cat.crossJoin(F.broadcast(totals))
    p = F.round(F.col("n_ref") / F.greatest(F.col("t_ref"), F.lit(1)), round_to)
    q = F.round(F.col("n_cur") / F.greatest(F.col("t_cur"), F.lit(1)), round_to)
    # arrival (n_ref == 0) -> NULL; present-but-rounds-to-zero -> epsilon
    p_s = F.when(p > 0, p).otherwise(F.lit(float(epsilon)))
    contrib = F.when(
        F.col("n_ref") > 0, F.round((q - p) * (q - p) / p_s, round_to)
    )
    return j.select(
        F.when(F.col("category") == sentinel, F.lit(None))
        .otherwise(F.col("category"))
        .alias("category"),
        "n_ref",
        "n_cur",
        p.alias("p_ref"),
        q.alias("p_cur"),
        contrib.alias("contrib"),
    )


def equi_bin(v, lo, hi, bins):
    """THE equi-width bin assignment every drift leg shares — batch
    (:func:`psi_drift_by`) and streaming (``stream_drift_monitor_by``,
    ``stream_drift_by_once``) compute bins through this one expression
    so their arithmetic can never drift apart (review r11: three
    hand-copied versions had already diverged on the constant-range
    guard). ``v``/``lo``/``hi`` are double Columns; ``bins`` is an int
    or an int Column. Semantics: width = (hi - lo) / bins (one IEEE
    division), raw = floor((v - lo) / width), clamped into [0, bins-1]
    so out-of-range values COUNT as edge-bin drift; a degenerate range
    (hi <= lo — a constant reference) puts everything in bin 0, the
    single-bin grid psi_drift_by documents for constant groups."""
    nb = F.lit(float(bins)) if isinstance(bins, int) else bins.cast("double")
    width = (hi - lo) / nb
    scaled = (v - lo) / width
    # clamp in DOUBLE space BEFORE any int cast: a value ~2^31 widths
    # outside the reference range — exactly the unit-mismatch outlier
    # drift monitoring exists to catch — would otherwise CAST_OVERFLOW
    # under ANSI mode instead of counting as edge-bin drift (review r14).
    # Spark's NaN ordering (NaN > everything) sends NaN to the top bin,
    # +/-inf to their respective edges; values inside [1, nb-1) take the
    # same floor() as before, so in-range arithmetic is unchanged.
    idx = (
        F.when(scaled < F.lit(1.0), F.lit(0))
        .when(scaled >= nb - 1, (nb - 1).cast("int"))
        .otherwise(F.floor(scaled).cast("int"))
    )
    return F.when(hi <= lo, F.lit(0)).otherwise(idx)


def psi_drift_by(
    ref: DataFrame,
    cur: DataFrame,
    *,
    value: str,
    keys: "Sequence[str]",
    bins: int = 10,
    epsilon: float = 1e-4,
    round_to: int = 6,
) -> DataFrame:
    """Per-group :func:`psi_drift` in ONE plan — the data-card shape
    ("PSI per source/language/domain") without a driver-side group loop:
    returns (keys..., ``psi``, ``n_ref``, ``n_cur``), one row per
    REFERENCE group. Groups are defined by the reference (each gets its
    own [min, max] bin grid); current rows in groups the reference never
    saw have no baseline to drift FROM and are excluded — detect
    arrivals with :func:`categorical_drift` on the key column, the tool
    for that question. A group whose reference values are constant
    (hi == lo) puts everything in bin 0 on both sides (PSI 0 unless the
    current side leaves... it cannot — single bin; pair with a range
    expectation if constancy itself must be enforced).

    Same arithmetic as the ungrouped operator (edge-bin clamping,
    epsilon smoothing, 1e-6 rounds), with the bin width computed IN-PLAN
    per group — identical single IEEE ops to any SQL replay. Scale
    shape: one grouped bounds aggregate, one (keys, bin) count per side
    (outputs bounded by groups x bins), one grid join — neither corpus
    ever row-shuffled beyond its count aggregate."""
    if isinstance(keys, str):
        raise TypeError("keys must be a sequence of column names, not a str")
    keys = list(keys)
    if not keys:
        raise ValueError("psi_drift_by needs keys; use psi_drift without")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(value).cast("double")

    def _non_null_keys(df: DataFrame) -> DataFrame:
        # NULL group keys are EXCLUDED, by contract: they survive the
        # groupBy into bounds/grid but the equi-joins below never match
        # them, leaving a zero-count group whose p = n/t_ref divides 0/0
        # — a DIVIDE_BY_ZERO crash under ANSI mode (review r14,
        # reproduced). Excluded symmetrically on BOTH sides; coalesce
        # keys first to monitor the NULL slice as a real group.
        out = df.filter(v.isNotNull())
        for k in keys:
            out = out.filter(F.col(k).isNotNull())
        return out

    ref_nn, cur_nn = _non_null_keys(ref), _non_null_keys(cur)
    bounds = ref_nn.groupBy(*keys).agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )
    b = equi_bin(v, F.col("__lo"), F.col("__hi"), bins)

    def bucketed(df: DataFrame, side: str) -> DataFrame:
        return (
            df.join(maybe_broadcast(bounds), keys)
            .groupBy(*keys, b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    grid = bounds.select(*keys).crossJoin(
        ref.sparkSession.range(bins).select(
            F.col("id").cast("int").alias("bin")
        )
    )
    per_bin = (
        grid.join(bucketed(ref_nn, "ref"), [*keys, "bin"], "left")
        .join(bucketed(cur_nn, "cur"), [*keys, "bin"], "left")
        .select(
            *keys,
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    w = Window.partitionBy(*keys)
    t_ref = F.sum("n_ref").over(w)
    t_cur = F.sum("n_cur").over(w)
    eps = F.lit(float(epsilon))
    p = F.round(F.col("n_ref") / t_ref, round_to)
    q = F.round(F.col("n_cur") / F.greatest(t_cur, F.lit(1)), round_to)
    p_s = F.when(p > 0, p).otherwise(eps)
    q_s = F.when(q > 0, q).otherwise(eps)
    term = (p_s - q_s) * F.log(p_s / q_s)
    return (
        per_bin.withColumn("__term", term)
        .groupBy(*keys)
        .agg(
            F.round(F.sum("__term"), round_to).alias("psi"),
            F.sum("n_ref").cast("long").alias("n_ref"),
            F.sum("n_cur").cast("long").alias("n_cur"),
        )
    )
