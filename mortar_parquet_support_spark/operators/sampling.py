"""Deterministic sampling / dataset splitting for training pipelines.

``df.sample()`` is seed-dependent but NOT stable under repartitioning or
input reordering — a re-run on re-bucketed data yields a different sample,
which is unacceptable for train/test splits of a 100 TB corpus. These
operators key every decision on a content hash of a stable id column
(md5 hex slice -> integer, also reproducible in any other engine), so:

- membership is a pure function of (id, salt) — stable across runs,
  partitionings, Spark versions, and engines;
- splits are disjoint and exhaustive by construction (bucket ranges);
- downstream joins can re-derive membership instead of persisting it.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mortar_parquet_support_spark.plans.hints import maybe_broadcast

#: buckets for split arithmetic — 1e-4 granularity on fractions
_BUCKETS = 10_000


def hash_bucket(col: Column, *, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from md5 of the stringified id.
    Engine-portable: DuckDB gets the same value via
    ``('0x' || substr(md5(salt || CAST(id AS VARCHAR)), 1, 8))::BIGINT % 10000``.

    NULL ids coalesce to a sentinel, so they share ONE deterministic
    bucket (all-or-nothing membership per salt) instead of hashing to NULL
    — a NULL bucket would make every filter predicate NULL and silently
    drop the rows from every sample and split, even at fraction 1.0.
    For well-distributed statistics ids should still be unique non-null;
    mirror ``coalesce(CAST(id AS VARCHAR), '<sentinel>')`` in any oracle."""
    sid = F.coalesce(col.cast("string"), F.lit("\x00<NULL>"))
    hex8 = F.substring(F.md5(F.concat(F.lit(salt), sid)), 1, 8)
    return F.pmod(F.conv(hex8, 16, 10).cast("long"), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float],
    *,
    salt: str = "",
    label_col: str = "split",
) -> DataFrame:
    """Label every row with a split name ('train'/'val'/'test'/...) from
    consecutive hash-bucket ranges. Weights must sum to <= 1; any remainder
    is labelled NULL (dropped data, explicit). Boundaries are CUMULATIVE
    rounds — rounding each width independently can leave trailing buckets
    unlabelled even when the weights sum to exactly 1 (three 1/3 weights
    would each round to 3333 and strand bucket 9999)."""
    bad = {k: w for k, w in weights.items() if w < 0}
    if bad:
        # a negative weight passes the sum check but yields an EMPTY
        # bucket range for its own label and shifts the labels after it —
        # a sign typo silently producing zero test data
        raise ValueError(f"negative split weights: {bad}")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    bucket = hash_bucket(F.col(id_col), salt=salt)
    expr = F.lit(None).cast("string")
    cum, hi = 0.0, 0
    cases = []
    for name, w in weights.items():
        lo = hi
        cum += w
        hi = int(round(cum * _BUCKETS))
        cases.append((lo, hi, name))
    for lo, hi, name in reversed(cases):
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
    return df.withColumn(label_col, expr)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Content-keyed Bernoulli sample: row kept iff its hash bucket falls
    under ``fraction``. Stable under any re-partitioning/re-run."""
    return df.filter(hash_bucket(F.col(id_col), salt=salt) < int(round(fraction * _BUCKETS)))


def hash_unit(col: Column, *, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) from the first 52 bits of md5 —
    the fine-grained sibling of :func:`hash_bucket` for per-row
    PROBABILITIES rather than bucket ranges. 13 hex chars = 52 bits fit
    a double exactly, so the value is bit-identical in any engine:
    DuckDB mirrors it as
    ``('0x' || substr(md5(salt || CAST(id AS VARCHAR)), 1, 13))::BIGINT
    / 4503599627370496.0``. NULL ids share one sentinel value (see
    :func:`hash_bucket` for why hashing NULL itself is a footgun)."""
    sid = F.coalesce(col.cast("string"), F.lit("\x00<NULL>"))
    hex13 = F.substring(F.md5(F.concat(F.lit(salt), sid)), 1, 13)
    return F.conv(hex13, 16, 10).cast("double") / F.lit(float(1 << 52))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Importance sampling: keep each row independently with probability
    ``min(1, rate * weight)`` — the SoftDeDup / quality-resampling shape
    (upweight rare-but-good rows by keeping them at higher probability,
    thin abundant boilerplate) without materializing a global total.

    Membership is ``hash_unit(id) < rate * weight``: a pure function of
    (id, salt, weight), so re-runs, re-partitionings, and other engines
    reproduce the exact sample — both sides of the comparison are
    bit-identical IEEE doubles (the 52-bit hash is exact, the product is
    one double multiply), so there is no boundary jitter to round away.
    Rows with NULL or NaN weight never pass — Spark's NaN-greatest
    ordering would otherwise make ``u < NaN`` TRUE and admit corrupt
    rows (0/0 upstream ratios) with probability 1 at ANY rate; mirror
    ``AND NOT isnan(weight * rate)`` in an oracle if the weight column
    can carry NaN. Zero shuffle: one projection + filter, same as
    :func:`deterministic_sample`.

    Expected sample size is ``sum(min(1, rate * w))`` — pick ``rate``
    from a weight-sum estimate when a target count matters; exact-k
    selection needs a global top-k by key instead (one sort, see
    Efraimidis-Spirakis), which this intentionally avoids at 100 TB.
    """
    if rate < 0:
        raise ValueError(f"rate must be >= 0, got {rate}")
    u = hash_unit(F.col(id_col), salt=salt)
    p = F.col(weight_col).cast("double") * F.lit(float(rate))
    return df.filter((u < p) & ~F.isnan(p))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10%,
    keep all 'de'). Unlisted strata get ``default_fraction``. One
    projection + filter — no shuffle, no driver-side stratum loop."""
    bucket = hash_bucket(F.col(id_col), salt=salt)
    threshold = F.lit(int(round(default_fraction * _BUCKETS)))
    for value, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * _BUCKETS)))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def mixture_coefficients(
    weights: Mapping[str, float], target_rows: int
) -> dict[str, float]:
    """Per-domain numerators for :func:`build_mixture`'s rate formula —
    ``coef_d = target_rows * (w_d / sum(weights))``, evaluated ONCE on the
    driver. Exposed so an oracle replaying the mixture in another engine
    can embed the exact same double literals: the remaining ``coef / n``
    is then a single identical IEEE division in both engines, keeping
    floor() and fractional-bucket thresholds bit-identical."""
    bad = {k: w for k, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative mixture weights: {bad}")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    if target_rows < 0:
        raise ValueError("target_rows must be >= 0")
    return {d: target_rows * (w / total_w) for d, w in weights.items()}


def build_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: Mapping[str, float],
    *,
    target_rows: int,
    salt: str = "",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Materialize a training mixture: resample ``df`` so each domain
    contributes ``target_rows * weight / sum(weights)`` rows in
    expectation — the DoReMi/Pile-style mixture step that upweights scarce
    high-quality domains (rows REPEAT, tagged with a 0-based ``epoch_col``)
    and downsamples abundant ones (deterministic content-keyed thinning).

    Per domain d with n_d rows and normalized weight w_d, every row gets
    ``floor(rate_d)`` guaranteed epochs plus one more iff its hash bucket
    falls under the fractional part, where ``rate_d = target_rows * w_d /
    n_d``. Epoch membership is a pure function of (id, salt, weights), so
    re-runs and re-partitionings rebuild the identical mixture — and an
    engine-portable one (see :func:`hash_bucket`). Domains absent from
    ``weights`` are dropped; weights are ratios and need not sum to 1.

    Scale shape: domain cardinality is tiny, so the per-domain count
    aggregate collapses map-side and broadcast-joins back onto the corpus
    — no corpus shuffle at all; the repeat fan-out is a per-row
    ``explode(sequence(...))`` that never materializes more than one
    domain coefficient per row. Skewed domains cost exactly their output
    share.
    """
    coefs = mixture_coefficients(weights, target_rows)
    if epoch_col in df.columns:
        raise ValueError(
            f"build_mixture writes column {epoch_col!r}; input already has "
            f"it — rename one first"
        )
    coef = F.lit(None).cast("double")
    for name, c in coefs.items():
        coef = F.when(F.col(domain_col) == name, F.lit(c)).otherwise(coef)
    counts = (
        df.filter(F.col(domain_col).isin(list(weights)))
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).cast("double").alias("__n"))
    )
    rate = coef / F.col("__n")
    base = F.floor(rate)  # long
    frac = rate - F.floor(rate)
    extra = (
        hash_bucket(F.col(id_col), salt=salt)
        < F.round(frac * _BUCKETS).cast("long")
    ).cast("long")
    reps = base + extra
    epochs = F.when(
        reps >= 1, F.sequence(F.lit(0).cast("long"), reps - 1)
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.join(maybe_broadcast(counts), domain_col)
        .withColumn(epoch_col, F.explode(epochs))
        .drop("__n")
    )


def sample_exact_k(
    df: DataFrame,
    id_col: str,
    k: int,
    *,
    by: "list[str] | None" = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic EXACT-size sample: the ``k`` rows (per ``by`` group,
    or globally) whose md5-derived hash sorts lowest — a reservoir-sample
    replacement with none of the reservoir's order-dependence. Where
    :func:`deterministic_sample` keeps a deterministic FRACTION (size
    varies with the data), this keeps a deterministic COUNT — the shape
    eval-set construction and per-domain inspection samples need.

    Membership is a pure function of (id, salt): re-runs, re-partitioning,
    and engine choice all agree (the hash is the cross-engine
    :func:`hash_unit`), and adding rows to OTHER groups never disturbs a
    group's picks. Ties on the hash (md5 collisions aside, only duplicate
    ids) break by id, so the result is total-order deterministic.

    One hash-partition shuffle + a row_number window — the domain_cap
    plan; at 100 TB the window sorts only each group's rows and the
    output is k rows per group regardless of input size."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    by = list(by or [])
    w = Window.partitionBy(*by).orderBy(
        hash_unit(F.col(id_col), salt=salt), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_sample_k(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    by: "list[str] | None" = None,
    salt: str = "",
    key_round: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, exact size k
    (per ``by`` group, or globally) — Efraimidis-Spirakis A-ES: each row
    gets key ``ln(u) / w`` with ``u = hash_unit(id, salt)``, and the k
    LARGEST keys win. A row's selection probability is proportional to
    its weight at every prefix (the one-pass weighted-reservoir
    distribution), which is the quality-weighted corpus-selection shape
    :func:`weighted_sample` (Bernoulli, variable size) and
    :func:`sample_exact_k` (exact size, unweighted) each cover half of.

    Deterministic and engine-portable: ``u`` is an exact 52-bit double
    clamped to at least 2^-52 (the all-zero-hex hash, p ~= 2^-52, would
    otherwise hit ln(0) — NULL in Spark, an ERROR in DuckDB: a latent
    cross-engine divergence, review r11) and the key is one ln + one
    divide, ROUNDED at ``key_round`` (1e-9) before ranking — ln is not
    correctly-rounded in every libm, and the round absorbs those
    last-ulp differences the same way qc_flags' spike_round does; ties
    (rounded-equal keys) break by id. Mirror in SQL:
    ``ROUND(ln(greatest(<hash_unit expr>, 1.0 / 4503599627370496.0))
    / w, 9)`` ranked DESC.

    Rows with NULL, NaN, zero, or negative weight carry no mass and are
    excluded — silently admitting them would put corrupt upstream
    ratios in every sample. Scale shape: one hash-partition shuffle +
    a per-group row_number window (the sample_exact_k plan); output is
    k rows per group regardless of input size."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    by = list(by or [])
    w_val = F.col(weight_col).cast("double")
    u = F.greatest(
        hash_unit(F.col(id_col), salt=salt), F.lit(1.0 / (1 << 52))
    )
    key = F.round(F.log(u) / w_val, key_round)
    eligible = df.filter((w_val > 0) & ~F.isnan(w_val))
    wnd = Window.partitionBy(*by).orderBy(key.desc(), F.col(id_col))
    return (
        eligible.withColumn("__rn", F.row_number().over(wnd))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def group_split(
    df: DataFrame,
    group_col: str,
    weights: "Mapping[str, float]",
    *,
    salt: str = "",
    label_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test labelling: the split is a pure
    function of the GROUP key (domain, author, url host, dedup-cluster
    id), so every row of a group lands in the SAME split. Row-keyed
    splitting (:func:`hash_split`) leaks when near-duplicate or
    same-source documents straddle the boundary — the eval split then
    contains training look-alikes and overstates quality; splitting by
    the grouping that captures that correlation is the standard fix.

    Same cumulative-bucket semantics as :func:`hash_split` (weights sum
    <= 1, remainder labelled NULL = explicitly dropped), same md5
    determinism (re-runs, repartitioning, and engines agree). NULL group
    keys share one sentinel bucket — they travel together too, which is
    the conservative choice (unattributed rows can't straddle).

    Zero shuffles and zero joins: the label is computed IN-ROW from the
    group column (hash + range cases), so this composes with any scan at
    any scale."""
    return hash_split(
        df, group_col, weights, salt=salt, label_col=label_col
    )


def global_shuffle(
    df: DataFrame,
    id_col: str,
    *,
    shards: int,
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic training-order shuffle: every row gets a ``shard``
    in [0, shards) and a 1-based ``pos`` within its shard, both pure
    functions of (id, salt) — the "shuffle the corpus once, write N
    shard files, stream them in order" step at the top of every training
    run. Re-runs, repartitionings, and engines agree on the exact order;
    changing ``salt`` is a fresh epoch-level reshuffle with zero data
    movement beyond the re-sort.

    The order within a shard is the md5 hex string of (salt || id)
    (ties broken by id) — uniformly "random" with respect to any data
    attribute, reproducible everywhere md5 exists. The global order is
    SHARD-MAJOR by construction: a single corpus-wide ``row_number``
    would funnel every row through ONE window partition (the classic
    driver-scale trap); per-shard numbering shuffles once on the shard
    key and each shard is an independently readable unit — which is how
    training jobs consume shards anyway (one reader per shard file).

    IDS MUST BE UNIQUE for the determinism contract to hold: two rows
    sharing an id (including two NULL-id rows, which share one sentinel
    hash) carry identical (hash, id) sort keys, and row_number then
    falls back to partition order — their positions can swap between
    runs, silently carrying different PAYLOAD columns at each position.
    No deterministic function of the id alone can order indistinguishable
    keys; dedup or synthesize a unique id first (the same precondition
    every md5-keyed operator here has, stated loudly because this one
    returns an ORDER). NULL ids otherwise land adjacent in one shard —
    mirror ``coalesce(CAST(id AS VARCHAR), sentinel)`` in any oracle,
    same convention as :func:`hash_bucket`."""
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    clobbered = {shard_col, pos_col} & set(df.columns)
    if clobbered:
        raise ValueError(
            f"global_shuffle writes {sorted(clobbered)}; rename first"
        )
    sid = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00<NULL>"))
    h = F.md5(F.concat(F.lit(salt), sid))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(shards)
    )
    staged = df.withColumn(shard_col, shard).withColumn("__gs_h", h)
    w = Window.partitionBy(shard_col).orderBy(
        F.col("__gs_h"), F.col(id_col)
    )
    return staged.withColumn(
        pos_col, F.row_number().over(w).cast("long")
    ).drop("__gs_h")


def temperature_weights(
    df: DataFrame,
    domain_col: str,
    *,
    alpha: float = 0.5,
) -> "dict[str, float]":
    """Temperature-scaled mixture weights from the corpus' own domain
    counts: ``w_d = n_d ** alpha``, normalized — the multilingual
    alpha-sampling rule (mBERT/XLM-R style). ``alpha = 1`` reproduces
    natural proportions, ``alpha = 0`` uniform; the usual 0.2-0.7 range
    boosts scarce domains without letting any head domain dominate.
    Feed the result straight into :func:`build_mixture` (whose
    coefficients embed these doubles identically on both engines).

    Driver-side by design: the output is a MODEL (one weight per
    domain, bounded by domain cardinality), computed from one count
    aggregate; NULL domains are excluded (they cannot be named in a
    weights mapping — route them explicitly if they matter)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = (
        df.filter(F.col(domain_col).isNotNull())
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not counts:
        raise ValueError("temperature_weights: no non-NULL domains")
    raw = {r[domain_col]: float(r["n"]) ** alpha for r in counts}
    total = sum(raw.values())
    return {d: w / total for d, w in sorted(raw.items())}


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    *,
    alpha: float = 0.5,
    target_rows: int,
    salt: str = "",
    epoch_col: str = "epoch",
    weight_round: int = 9,
) -> DataFrame:
    """:func:`temperature_weights` -> :func:`build_mixture` fused into ONE
    Spark plan — the alpha-sampled mixture with NO driver round-trip: the
    per-domain weight ``w_d = n_d^alpha / sum(n^alpha)`` is computed
    in-plan from the same count aggregate the mixture needs anyway, so the
    whole thing stays a single lazy DataFrame (composable, restartable,
    and SQL-oracle-expressible end to end, unlike the dict handoff).

    ``weight_round`` (default 9 decimal places) pins the weight before it
    feeds the repetition rate: ``pow`` is not correctly-rounded in either
    engine and the domain sum is float-order-dependent, so the raw weight
    can differ by ~1 ulp (1e-17) across engines/partitionings — rounding
    at 1e-9 absorbs that while every downstream op (rate division, floor,
    fractional-bucket threshold) is a single identical IEEE operation on
    both sides. Same discipline as qc_flags' spike_round.

    Epoch semantics are exactly :func:`build_mixture`'s: ``rate_d =
    target_rows * w_d / n_d`` guaranteed ``floor(rate_d)`` epochs plus one
    iff the row's md5 bucket falls under the fractional part. NULL domains
    are excluded (they cannot carry a weight). Scale shape: one tiny
    domain-count aggregate (map-side collapse) broadcast back, repeat
    fan-out via per-row ``explode(sequence(...))`` — the corpus is never
    shuffled."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if target_rows < 0:
        raise ValueError("target_rows must be >= 0")
    if epoch_col in df.columns:
        raise ValueError(
            f"temperature_mixture writes column {epoch_col!r}; input "
            f"already has it — rename one first"
        )
    counts = (
        df.filter(F.col(domain_col).isNotNull())
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).cast("double").alias("__n"))
    )
    # the window spans the domain-count frame (rows = domain cardinality,
    # tiny by contract) — NOT the corpus
    wsum = F.sum(F.pow(F.col("__n"), F.lit(float(alpha)))).over(
        Window.partitionBy()
    )
    wtab = counts.withColumn(
        "__w",
        F.round(
            F.pow(F.col("__n"), F.lit(float(alpha))) / wsum, weight_round
        ),
    )
    rate = F.lit(float(target_rows)) * F.col("__w") / F.col("__n")
    base = F.floor(rate)
    frac = rate - F.floor(rate)
    extra = (
        hash_bucket(F.col(id_col), salt=salt)
        < F.round(frac * _BUCKETS).cast("long")
    ).cast("long")
    reps = base + extra
    epochs = F.when(
        reps >= 1, F.sequence(F.lit(0).cast("long"), reps - 1)
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.join(maybe_broadcast(wtab), domain_col)
        .withColumn(epoch_col, F.explode(epochs))
        .drop("__n", "__w")
    )
