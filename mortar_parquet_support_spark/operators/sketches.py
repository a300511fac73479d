"""Mergeable-sketch rollups: pay the raw scan once, answer coarser
aggregations from sketch state forever after.

The 100 TB pattern this enables (the lambda-architecture "rollup reuse"
trick): a nightly job computes per-(hour, key) HLL sketches of e.g.
distinct users — one scan of the raw events. Daily / weekly / all-time
distinct counts are then answered by UNIONING the stored sketches
(`hll_union_agg`), which touches kilobytes of sketch state instead of
rescanning terabytes of raw rows. HLL union preserves the distinct set's
sketch information: in sparse mode the re-aggregated estimate equals a
direct coarse-grained sketch of the raw data exactly; in dense mode the
Datasketches union gadget (internally HLL_8) can differ from a directly
built HLL_4 sketch by well under ±1% — never more than the sketch's own
~1.6% error bound at lg_k=12 (tested at both regimes).

Built on Spark's native Datasketches bindings (`hll_sketch_agg`,
`hll_union_agg`, `hll_sketch_estimate`) — JVM-side, mergeable across
partitions, fixed memory per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    *,
    ts: str,
    bucket: str,
    keys: list[str],
    distinct_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """One raw scan -> per-(time-bucket, keys) HLL sketch columns
    (``<col>_sketch``) plus an exact row count. Output is the compact,
    mergeable representation to persist."""
    aggs = [
        F.hll_sketch_agg(F.col(c), F.lit(lg_k)).alias(f"{c}_sketch")
        for c in distinct_cols
    ]
    return (
        df.groupBy(F.window(F.col(ts), bucket).alias("w"), *keys)
        .agg(*aggs, F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("bucket"),
            *keys,
            *[f"{c}_sketch" for c in distinct_cols],
            "n",
        )
    )


def hll_reaggregate(
    sketches: DataFrame,
    *,
    group_cols: list[str],
    sketch_cols: list[str],
    allow_different_lg_k: bool = False,
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain WITHOUT touching raw
    data: union the sketch state per group and estimate. Row counts sum
    exactly alongside.

    ``allow_different_lg_k=True`` tolerates stored sketches built with
    different ``lg_k`` values (a job that raised precision mid-history —
    exactly the long-lived lambda-architecture table this module targets);
    the union downgrades to the coarsest config. Left strict by default so
    an UNINTENDED precision mix still fails loudly."""
    aggs = [
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(f"{c}_sketch"), allow_different_lg_k)
        ).alias(f"{c}_distinct")
        for c in sketch_cols
    ]
    return sketches.groupBy(*group_cols).agg(*aggs, F.sum("n").alias("n"))


def hll_estimate(sketches: DataFrame, *, sketch_cols: list[str]) -> DataFrame:
    """Estimate in place: swap each ``<col>_sketch`` for ``<col>_distinct``."""
    out = sketches
    for c in sketch_cols:
        out = out.withColumn(
            f"{c}_distinct", F.hll_sketch_estimate(F.col(f"{c}_sketch"))
        ).drop(f"{c}_sketch")
    return out


# ---------------------------------------------------------------------------
# Quantile-histogram sketch: the re-aggregatable counterpart to
# percentile_approx. Spark's percentile sketches are terminal aggregates —
# their state can't be persisted and unioned later — so the rollup-reuse
# pattern above has no quantile answer. This one is a deterministic
# log-spaced histogram: per (group) state is (sign, mag_bin, cnt) rows,
# EXACTLY mergeable by summing counts (unlike probabilistic sketches the
# merge is lossless by construction), with a hard relative-error bound of
# 10^(1/(2*bins_per_decade)) - 1 per quantile (~5.9% at the default 20
# bins/decade, ~2.9% at 40). State size is O(decades * bins_per_decade)
# per group — fixed KBs regardless of row count.
#
# Binning is engine-portable ON PURPOSE (a DuckDB oracle reproduces it):
# floor(log10(|x|) * bpd + 1e-9). The 1e-9 nudge absorbs cross-engine
# libm differences (<= 1 ulp ~ 1e-15) at decimal bin edges — e.g. x=0.01
# sits exactly on an edge, and an engine rounding log10 one ulp low would
# otherwise bin it one lower. The nudge only re-bins values within 1e-9
# (in log10 space) BELOW an edge into the upper bin: a deterministic,
# engine-agnostic choice that is noise against the sketch's own error
# bound.
# ---------------------------------------------------------------------------

_QHIST_EPS = 1e-9


def _qhist_sign_bin(value: Column, bins_per_decade: int):
    """(sign, mag_bin) columns for one value: sign in {-1, 0, 1}; mag_bin
    the log-spaced magnitude bin (0 for zero — sign alone disambiguates)."""
    sign = F.signum(value).cast("int")
    mag_bin = F.when(sign == 0, F.lit(0).cast("long")).otherwise(
        F.floor(
            F.log10(F.abs(value)) * F.lit(float(bins_per_decade))
            + F.lit(_QHIST_EPS)
        ).cast("long")
    )
    return sign, mag_bin


def qhist_rollup(
    df: DataFrame,
    *,
    value: str,
    keys: list[str] | None = None,
    ts: str | None = None,
    bucket: str | None = None,
    bins_per_decade: int = 20,
) -> DataFrame:
    """One raw scan -> per-(time-bucket, keys) histogram state rows
    (``bucket``?, keys..., ``sign``, ``mag_bin``, ``cnt``) — the compact,
    exactly-mergeable representation to persist. NULL values are dropped
    (they have no magnitude; count them separately if needed).

    Scale shape: one shuffle on (bucket, keys, sign, mag_bin) with
    map-side partial counting — the shuffle carries at most
    groups x occupied-bins rows, not data rows."""
    if bucket is not None and ts is None:
        raise ValueError("bucket duration given without ts column")
    keys = list(keys or [])
    v = F.col(value).cast("double")
    # non-finite values have no magnitude bin: NaN would crash the ANSI
    # signum->int cast and Infinity overflows the floor->long cast — a
    # single bad row (an upstream 0/0 metric) must not abort the rollup.
    # Dropped like NULLs; count them separately if they matter.
    finite = (
        v.isNotNull() & ~F.isnan(v) & (F.abs(v) != F.lit(float("inf")))
    )
    sign, mag_bin = _qhist_sign_bin(v, bins_per_decade)
    out = df.filter(finite).withColumns({"sign": sign, "mag_bin": mag_bin})
    group: list = []
    head: list = []
    if ts is not None:
        if bucket is None:
            raise ValueError("ts given without bucket duration")
        group.append(F.window(F.col(ts), bucket).alias("w"))
        head.append(F.col("w.start").alias("bucket"))
    group += keys + ["sign", "mag_bin"]
    # the state carries its own precision: persisted histograms from
    # different bins_per_decade settings must never silently mix (see
    # qhist_reaggregate / qhist_quantiles — the hll counterpart fails
    # loudly on an lg_k mismatch for the same reason)
    return (
        out.groupBy(*group)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *head,
            *keys,
            "sign",
            "mag_bin",
            "cnt",
            F.lit(bins_per_decade).cast("int").alias("bpd"),
        )
    )


def _ensure_bpd(hist: DataFrame, bins_per_decade: int | None) -> DataFrame:
    """Migration shim for histogram state persisted before the ``bpd``
    column existed: the caller must say what precision that state was
    built with — a silent default could mislabel bins by orders of
    magnitude, so absence fails loudly instead."""
    if "bpd" in hist.columns:
        if bins_per_decade is not None:
            raise ValueError(
                "state already carries its bpd column; do not pass "
                "bins_per_decade (it would be ignored or contradict it)"
            )
        return hist
    if bins_per_decade is None:
        raise ValueError(
            "histogram state predates the bpd column; pass "
            "bins_per_decade=<the value qhist_rollup was called with>"
        )
    return hist.withColumn(
        "bpd", F.lit(int(bins_per_decade)).cast("int")
    )


def qhist_reaggregate(
    hist: DataFrame,
    *,
    group_cols: list[str],
    bins_per_decade: int | None = None,
) -> DataFrame:
    """Re-aggregate stored histogram state to a coarser grain WITHOUT
    touching raw data — and, unlike HLL union, EXACTLY: summing per-bin
    counts loses nothing, so the result is identical to a direct rollup
    of the raw rows at the coarser grain. ``bpd`` joins the grouping keys,
    so states built at different precisions stay on separate rows instead
    of summing into a meaningless mixed histogram (qhist_quantiles then
    rejects the mix loudly). ``bins_per_decade`` is ONLY for migrating
    state persisted before the ``bpd`` column existed (see _ensure_bpd)."""
    hist = _ensure_bpd(hist, bins_per_decade)
    return (
        hist.groupBy(*group_cols, "sign", "mag_bin", "bpd")
        .agg(F.sum("cnt").alias("cnt"))
        .select(*group_cols, "sign", "mag_bin", "cnt", "bpd")
    )


def qhist_quantiles(
    hist: DataFrame,
    *,
    group_cols: list[str],
    qs: list[float] = (0.5, 0.95, 0.99),
    bins_per_decade: int | None = None,
) -> DataFrame:
    """Quantile estimates from histogram state: per group, the lower-
    inverted-CDF bin (smallest bin whose cumulative count reaches q * n),
    reported as the bin's geometric midpoint ``sign * 10^((b+0.5)/bpd)``
    (0 for the zero bin) in columns ``p50``/``p95``/... Relative error is
    bounded by the bin width: |est/true - 1| <= 10^(1/(2*bpd)) - 1.

    The bin precision comes from the state's own ``bpd`` column (written
    by qhist_rollup) — there is nothing for the caller to keep in sync.
    A group mixing rows from different ``bpd`` settings has no coherent
    bin space and raises at execution rather than returning quantiles
    that are silently off by orders of magnitude.

    All built-in expressions: one cumulative window + one min-of-struct
    aggregate per group — two shuffles on the (tiny) state table, raw
    data untouched. ``bins_per_decade`` is ONLY for migrating state
    persisted before the ``bpd`` column existed (see _ensure_bpd)."""
    hist = _ensure_bpd(hist, bins_per_decade)

    # ascending VALUE order: sign first; within sign=-1 larger magnitude
    # bins are smaller values, so their order key flips
    ordk = F.when(F.col("sign") == -1, -F.col("mag_bin")).otherwise(
        F.col("mag_bin")
    )
    rep = F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
        F.col("sign")
        * F.pow(
            F.lit(10.0),
            (F.col("mag_bin") + F.lit(0.5)) / F.col("bpd").cast("double"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("sign"), ordk)
    wall = Window.partitionBy(*group_cols)
    bpd_uniform = F.min("bpd").over(wall) == F.max("bpd").over(wall)
    staged = hist.withColumns(
        {
            "_ord": ordk,
            "_rep": F.when(bpd_uniform, rep).otherwise(
                F.raise_error(
                    F.lit(
                        "qhist_quantiles: group mixes states built at "
                        "different bins_per_decade — re-bin from raw data"
                    )
                )
            ),
            "_cum": F.sum("cnt").over(w),
            "_total": F.sum("cnt").over(wall),
        }
    )
    aggs = []
    for q in qs:
        name = f"p{q * 100:g}".replace(".", "_")  # p50, p95, p99_9
        # q * n nudged DOWN before the compare: the double product can
        # overshoot an exact integer rank (0.07 * 100 = 7.000000000000001)
        # and skip the bin that genuinely reaches it; the relative term
        # covers large totals where the product's ulp exceeds the absolute
        # epsilon. The nudge must stay BELOW 1 or it under-shoots the
        # rank by a whole count and the quantile comes from the preceding
        # bin (review r14: the old 1e-12 relative term reached 1 at
        # n=1e12); 2^-50 is 4x the product's ulp and stays < 0.5 through
        # n ~= 2^49 ~= 5.6e14 counts per group, where the least() cap
        # takes over (beyond ~2^52 the counts themselves exceed exact
        # double-integer range — re-aggregate per-subgroup histograms
        # before querying quantiles at that scale).
        threshold = (
            F.lit(float(q)) * F.col("_total")
            - F.lit(_QHIST_EPS)
            - F.least(
                F.lit(0.5), F.lit(2.0 ** -50) * F.col("_total")
            )
        )
        pick = F.min(
            F.when(
                F.col("_cum") >= threshold,
                F.struct(F.col("sign"), F.col("_ord"), F.col("_rep")),
            )
        )["_rep"]
        aggs.append(pick.alias(name))
    return staged.groupBy(*group_cols).agg(
        *aggs, F.max("_total").alias("n")
    )


# ---------------------------------------------------------------------------
# Count-min sketch: the re-aggregatable FREQUENCY counterpart to the two
# families above (HLL answers "how many distinct", qhist "what quantile",
# CMS "how often does item x occur"). State per group is the occupied
# cells of a depth x width counter matrix — (d, w, cnt) rows — built from
# ONE raw scan; merging states is elementwise count summation (lossless
# with respect to the sketch: identical to building one sketch over the
# union). Point estimates take min over the depth rows, so the error is
# one-sided: estimate >= true count, overshooting by at most ~2N/width
# with probability 1 - (1/2)^depth. Hashing is the engine-portable md5
# hex-slice recipe (operators/dedup.md5_int), so the full state AND the
# estimates reproduce bit-for-bit in any engine — a DuckDB oracle checks
# them end to end.
# ---------------------------------------------------------------------------


def _cms_cell(item: Column, d: int, width: int, seed: int) -> Column:
    """Column index of ``item`` in depth row ``d`` — an independent hash
    per row via a per-(seed, d) salt on the shared md5 recipe."""
    from mortar_parquet_support_spark.operators.dedup import md5_int

    return F.pmod(md5_int(item, salt=f"cms{seed}:{d}:"), F.lit(width))


def cms_rollup(
    df: DataFrame,
    *,
    item: str,
    keys: list[str] | None = None,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """One raw scan -> per-``keys`` count-min state rows
    (keys..., ``d``, ``w``, ``cnt``, ``depth``, ``width``, ``seed``) —
    only OCCUPIED cells are materialized, so small groups stay small.
    NULL items are dropped (count them separately if they matter); the
    sketch parameters ride along in the state like qhist's ``bpd`` so
    incompatible states can never silently mix.

    Scale shape: the depth-way fan-out happens in-row (one ``transform``
    over a literal depth sequence, then posexplode), and the single
    shuffle on (keys, d, w) is collapsed by map-side partial counting to
    at most groups x depth x width rows — independent of corpus size."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    keys = list(keys or [])
    it = F.col(item).cast("string")
    cells = F.array(*[_cms_cell(it, d, width, seed) for d in range(depth)])
    exploded = df.filter(it.isNotNull()).select(
        *keys, F.posexplode(cells).alias("d", "w")
    )
    return (
        exploded.groupBy(*keys, "d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *keys,
            "d",
            "w",
            "cnt",
            F.lit(depth).cast("int").alias("depth"),
            F.lit(width).cast("int").alias("width"),
            F.lit(seed).cast("int").alias("seed"),
        )
    )


def cms_reaggregate(state: DataFrame, *, group_cols: list[str]) -> DataFrame:
    """Merge stored states to a coarser grain by summing cells — identical
    to a direct sketch of the unioned raw data. The parameter columns join
    the grouping keys, so states from different (depth, width, seed)
    settings stay on separate rows instead of summing into garbage
    (cms_estimate then rejects the mix loudly)."""
    return (
        state.groupBy(*group_cols, "d", "w", "depth", "width", "seed")
        .agg(F.sum("cnt").alias("cnt"))
        .select(*group_cols, "d", "w", "cnt", "depth", "width", "seed")
    )


def cms_estimate(
    state: DataFrame,
    items: list[str],
    *,
    group_cols: list[str],
) -> DataFrame:
    """Frequency estimates for ``items`` from sketch state alone: per
    (group, item), ``est = min over d of cnt[d, h_d(item)]`` with never-
    touched cells counting 0. Returns (group_cols..., ``item``, ``est``).
    Same-parameter states that were unioned WITHOUT cms_reaggregate are
    handled (cells sum per (group, d, w) before the min); a group whose
    state mixes different (depth, width, seed) raises immediately.

    ``items`` is a driver-side list by contract (heavy-hitter candidates,
    a watchlist) — duplicates would duplicate output rows so they are
    rejected along with None (cms_rollup drops NULL items, so a NULL
    probe could only ever report 0, indistinguishable from absence).

    Each group's probe cells must be hashed with that group's OWN sketch
    parameters, which are data. The distinct (group, depth, width, seed)
    rows are tiny by contract (state is kilobytes per group), so this
    call eagerly collects them once: parameter mixes fail loudly up
    front, and the distributed plan then scans the state lineage exactly
    ONCE — a broadcast-inner join against the probe cells (zeros are
    reconstructed from the match count: fewer than ``depth`` matches
    means some cell was never touched, so the min is 0)."""
    if not items:
        raise ValueError("items must be non-empty")
    if any(i is None for i in items):
        raise ValueError(
            "items must not contain None: cms_rollup drops NULL items, so "
            "a NULL probe could only ever report 0"
        )
    if len(set(items)) != len(items):
        raise ValueError("items must not contain duplicates")
    from mortar_parquet_support_spark.functions import materialize
    from mortar_parquet_support_spark.operators.dedup import md5_int

    # TWO consumers read the state lineage (the parameter collect below
    # and the probe join's scan), so it gets the repo's standard
    # multi-consumer barrier (r16): left lazy, a state frame fresh off
    # cms_rollup re-executed the whole corpus sketch for each — the
    # barrier stores at most groups x depth x width rows, bounded by
    # construction. A caller passing an already-persisted state pays one
    # cheap re-materialization of kilobytes. Ordering note (ADVICE r16):
    # the mixed-parameter validation needs DATA (the collect below), so
    # an invalid state pays this one materialize job before raising —
    # validating first would instead execute the state lineage twice on
    # every VALID call (collect + join), the common path; the barrier
    # stays first deliberately.
    state = materialize(state)
    spark = state.sparkSession
    gparams = state.select(*group_cols, "depth", "width", "seed").distinct()
    rows = gparams.collect()
    per_group: dict = {}
    for r in rows:
        per_group.setdefault(tuple(r[c] for c in group_cols), []).append(r)
    # key=repr: group keys can be mutually unorderable (None vs str),
    # and a bare sorted() would raise TypeError instead of the intended
    # mixed-states ValueError (review r14)
    mixed = sorted(
        (g for g, ps in per_group.items() if len(ps) > 1), key=repr
    )
    if mixed:
        raise ValueError(
            "cms_estimate: group(s) mix states built with different "
            f"(depth, width, seed) — re-sketch from raw data: {mixed[:5]}"
        )
    # tiny_frame, not bare createDataFrame (r16): these two frames cross-
    # join and then broadcast-join the state — as 32-slice Python RDDs
    # that planned into a 32x32 CartesianProduct whose ~1000 near-empty
    # tasks each paid a Python-worker round-trip, 16s of the entry's 38s
    # at sf0.1 for 48 probe rows. Single-slice local frames collapse it
    # to one task (entry 38.6s -> see OPTIMIZATION_r16.md).
    from mortar_parquet_support_spark.functions import tiny_frame

    gp = tiny_frame(spark, rows, gparams.schema)
    probes = tiny_frame(spark, [(i,) for i in items], "item string")
    salt = F.concat(
        F.lit("cms"),
        F.col("seed").cast("string"),
        F.lit(":"),
        F.col("d").cast("string"),
        F.lit(":"),
    )
    probe_cells = (
        gp.crossJoin(probes)
        .withColumn("d", F.explode(F.sequence(F.lit(0), F.col("depth") - 1)))
        .withColumn(
            "w",
            F.pmod(
                md5_int(F.col("item").cast("string"), salt=salt),
                F.col("width").cast("long"),
            ),
        )
    )
    per_cell = (
        state.join(
            F.broadcast(probe_cells),
            [*group_cols, "d", "w", "depth", "width", "seed"],
            "inner",
        )
        .groupBy(*group_cols, "item", "depth", "d")
        .agg(F.sum("cnt").alias("_c"))
    )
    matched = per_cell.groupBy(*group_cols, "item", "depth").agg(
        F.min("_c").alias("_min"), F.count(F.lit(1)).alias("_nd")
    )
    expected = gp.crossJoin(probes).select(*group_cols, "item", "depth")
    return expected.join(
        matched, [*group_cols, "item", "depth"], "left"
    ).select(
        *group_cols,
        "item",
        F.when(F.col("_nd") == F.col("depth"), F.col("_min"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("est"),
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: the bounded-state answer to "top items per key"
# ---------------------------------------------------------------------------

def _mg_trim(counters: dict, k: int) -> dict:
    """Misra-Gries merge trim (Agarwal et al., Mergeable Summaries): if
    more than ``k`` counters, subtract the (k+1)-th largest count from
    all and drop the non-positive — the step that keeps state bounded
    while preserving the freq(x) - n/(k+1) <= est(x) <= freq(x)
    guarantee under arbitrary merges."""
    if len(counters) <= k:
        return counters
    t = sorted(counters.values(), reverse=True)[k]
    return {i: c - t for i, c in counters.items() if c - t > 0}


def mg_rollup(
    df: DataFrame,
    *,
    item: str,
    keys: "list[str] | None" = None,
    k: int = 64,
) -> DataFrame:
    """One raw scan -> per-partition Misra-Gries summaries: rows
    (keys..., ``item``, ``cnt``, ``k``), at most ``k`` items per key per
    input partition. NULL items are dropped (count them separately), and
    the ``k`` parameter rides along in the state like cms carries
    (depth, width, seed), so incompatible summaries can never silently
    mix.

    This is the bounded-state alternative to an exact
    groupBy(keys, item).count() when item cardinality is unbounded (URLs,
    n-grams, user ids at 100 TB): each task keeps <= k counters per key
    in memory — via pandas ``value_counts`` per Arrow batch merged into a
    dict with the MG trim — and the shuffle that follows
    (:func:`mg_reaggregate`) carries n_partitions x k rows per key
    instead of the full distinct-item set. Guarantee after any merge
    tree: every item with true frequency > n/(k+1) survives, and its
    count is undercounted by at most n/(k+1); with k >= the true distinct
    count the summary is EXACT (no trim ever fires — the oracle-checked
    regime)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import pyarrow as pa

    from pyspark.sql import types as T

    keys = list(keys or [])
    # NULL keys are dropped with the NULL items: a NaN key round-trips
    # badly through the pandas groupby -> typed-Arrow emission (an int64
    # key column cannot carry NaN back), and an unattributed group is not
    # a ranking anyone consumes — count those rows separately if they
    # matter.
    src = df.filter(F.col(item).isNotNull())
    for kc in keys:
        src = src.filter(F.col(kc).isNotNull())
    src = src.select(*keys, F.col(item).cast("string").alias("__item"))
    key_fields = [src.schema[c] for c in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("item", T.StringType(), False),
            T.StructField("cnt", T.LongType(), False),
            T.StructField("k", T.IntegerType(), False),
        ]
    )
    def summarize(batches):
        state: dict = {}  # key tuple -> {item: cnt}
        for batch in batches:
            pdf = batch.to_pandas()
            if keys:
                grouped = pdf.groupby(keys, dropna=False, sort=False)["__item"]
                for gk, items_series in grouped:
                    gk = gk if isinstance(gk, tuple) else (gk,)
                    counters = state.setdefault(gk, {})
                    for it, c in items_series.value_counts().items():
                        counters[it] = counters.get(it, 0) + int(c)
                    state[gk] = _mg_trim(counters, k)
            else:
                counters = state.setdefault((), {})
                for it, c in pdf["__item"].value_counts().items():
                    counters[it] = counters.get(it, 0) + int(c)
                state[()] = _mg_trim(counters, k)
        if not state:
            return
        import pandas as pd

        rows = [
            (*gk, it, cnt, k)
            for gk, counters in state.items()
            for it, cnt in counters.items()
        ]
        out = pd.DataFrame(rows, columns=[*keys, "item", "cnt", "k"])
        yield pa.RecordBatch.from_pandas(
            out, schema=pa.schema(to_arrow_schema_fields), preserve_index=False
        )

    # resolve the Arrow output schema once, driver-side (matching Spark's
    # own converter so key dtypes round-trip exactly)
    from pyspark.sql.pandas.types import to_arrow_type

    to_arrow_schema_fields = [
        *[(f.name, to_arrow_type(f.dataType)) for f in key_fields],
        ("item", pa.string()),
        ("cnt", pa.int64()),
        ("k", pa.int32()),
    ]
    return src.mapInArrow(summarize, out_schema)


def mg_reaggregate(state: DataFrame, *, group_cols: "list[str]") -> DataFrame:
    """Merge Misra-Gries summaries to one <= k-row summary per group —
    sum counts per item, then apply the MG trim with WINDOW functions
    (rank the summed counts, subtract the (k+1)-th largest, drop
    non-positive): the same algebra :func:`_mg_trim` runs in-process,
    expressed as two exchanges over summary-sized data (n_summaries x k
    rows per group — never raw data). ``k`` joins the grouping so
    incompatible summaries stay apart (mixing would silently void the
    error bound)."""
    summed = state.groupBy(*group_cols, "k", "item").agg(
        F.sum("cnt").alias("cnt")
    )
    w = Window.partitionBy(*group_cols, "k")
    wr = w.orderBy(F.col("cnt").desc(), F.col("item"))
    ranked = summed.withColumn("__rn", F.row_number().over(wr))
    kth1 = F.max(
        F.when(F.col("__rn") == F.col("k") + 1, F.col("cnt"))
    ).over(w)
    return (
        ranked.withColumn("__t", F.coalesce(kth1, F.lit(0)))
        .filter((F.col("__rn") <= F.col("k")) & (F.col("cnt") - F.col("__t") > 0))
        .select(
            *group_cols,
            "item",
            (F.col("cnt") - F.col("__t")).alias("cnt"),
            "k",
        )
    )


def heavy_hitters(
    df: DataFrame,
    *,
    item: str,
    keys: "list[str] | None" = None,
    k: int = 64,
) -> DataFrame:
    """End-to-end bounded-state heavy hitters per key:
    :func:`mg_rollup` (partition-local summaries) piped through
    :func:`mg_reaggregate` (global merge + trim). Returns at most ``k``
    rows per key, counts are MG estimates (exact when k >= true distinct
    count; otherwise undercount <= n/(k+1))."""
    keys = list(keys or [])
    return mg_reaggregate(
        mg_rollup(df, item=item, keys=keys, k=k), group_cols=keys
    )
