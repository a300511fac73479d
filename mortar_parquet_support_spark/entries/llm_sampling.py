"""Sampling and training-layout entries: splits, stratified /
weighted / exact-k sampling, deterministic global shuffle, domain
mixtures (incl. temperature sampling), stratification buckets, and
length-bucketed batching.

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
    "train_test_split",
    """
    SELECT doc_id,
           CASE
             WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 8000
               THEN 'train'
             WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9000
               THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def _train_test_split(spark, sf_dir):
    """Deterministic 80/10/10 split keyed on a content hash of the id
    (operators/sampling.py hash_split) — stable across runs, partitionings,
    and engines, unlike seed-based df.sample()."""
    from mortar_parquet_support_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@_register(
    "stratified_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
          < CASE WHEN lang = 'en' THEN 2000 ELSE 10000 END
    """,
)
def _stratified_sample(spark, sf_dir):
    """Per-stratum deterministic downsampling (operators/sampling.py):
    'en' docs kept at 20%, everything else kept whole."""
    from mortar_parquet_support_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.2}, default_fraction=1.0
    ).select("doc_id", "lang")


@_register(
    "budget_select",
    """
    SELECT doc_id, lang, n_chars, cum_cost FROM (
      SELECT doc_id, lang, n_chars,
             CAST(SUM(n_chars) OVER (
               PARTITION BY lang
               ORDER BY n_chars DESC NULLS LAST, doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_cost
      FROM documents
    ) WHERE cum_cost <= 20000
    """,
)
def _budget_select(spark, sf_dir):
    """Token-budget best-first selection (operators/curation.py
    budget_select): per lang, keep rows in descending-score order while
    the running char cost stays within 20k — the 'best N tokens per
    domain' data-recipe step as one window pass, no driver loop. Here
    score == cost (keep the longest docs until the budget), ties broken
    by doc_id; the first over-budget row and everything after it drop."""
    from mortar_parquet_support_spark.operators.curation import budget_select

    docs = _t(spark, sf_dir, "documents")
    return budget_select(
        docs, score_col="n_chars", cost_col="n_chars", budget=20000, by="lang"
    ).select("doc_id", "lang", "n_chars", "cum_cost")


@_register(
    "weighted_sample",
    """
    SELECT doc_id, n_chars FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
          / 4503599627370496.0 < CAST(n_chars AS DOUBLE) * 0.0004
    """,
)
def _weighted_sample(spark, sf_dir):
    """Importance sampling (operators/sampling.py weighted_sample): each
    doc kept with probability min(1, 0.0004 * n_chars) — longer docs
    proportionally more often, the quality-resampling shape. Membership is
    a 52-bit md5 uniform vs one double multiply, BIT-identical across
    engines (no rounding involved), pinned row-for-row by
    tests/test_operators.py::test_weighted_sample_bit_identical_to_duckdb."""
    from mortar_parquet_support_spark.operators.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample(docs, "doc_id", "n_chars", rate=0.0004).select(
        "doc_id", "n_chars"
    )


# Per-domain mixture coefficients for the build_mixture entry — the SAME
# driver-side computation build_mixture itself runs (exported precisely so
# the oracle cannot de-sync from the Spark plan at the 1-ulp level), so
# coef / n is a single identical IEEE division in both engines and
# floor() / fractional-bucket thresholds cannot diverge.
from mortar_parquet_support_spark.operators.sampling import (  # noqa: E402
    mixture_coefficients as _mixture_coefficients,
)

_MIX_TARGET = 120
_MIX_WEIGHTS = {"src0": 3.0, "src1": 1.0, "src2": 0.5}
_MIX_COEF = _mixture_coefficients(_MIX_WEIGHTS, _MIX_TARGET)


@_register(
    "build_mixture",
    f"""
    WITH cnt AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n
      FROM documents WHERE source IN ('src0', 'src1', 'src2')
      GROUP BY source
    ), planned AS (
      SELECT d.doc_id, d.source,
             (CASE d.source
                WHEN 'src0' THEN '{_MIX_COEF['src0']!r}'::DOUBLE
                WHEN 'src1' THEN '{_MIX_COEF['src1']!r}'::DOUBLE
                WHEN 'src2' THEN '{_MIX_COEF['src2']!r}'::DOUBLE
              END) / c.n AS rate
      FROM documents d JOIN cnt c USING (source)
    ), reps AS (
      SELECT doc_id, source,
             CAST(floor(rate) AS BIGINT) +
             CASE WHEN ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10000
                       < CAST(round((rate - floor(rate)) * 10000) AS BIGINT)
                  THEN 1 ELSE 0 END AS n_reps
      FROM planned
    )
    SELECT doc_id, source, CAST(unnest(range(0, n_reps)) AS BIGINT) AS epoch
    FROM reps
    """,
)
def _build_mixture(spark, sf_dir):
    """Domain-weighted training-mixture materialization (operators/
    sampling.py build_mixture): src0 upweighted 3x, src1 1x, src2 0.5x
    toward a 120-row target — scarce domains repeat with an epoch tag,
    abundant ones thin deterministically via the engine-portable md5
    bucket. The oracle replays the identical plan in SQL, including the
    driver-precomputed coefficient literals (see _MIX_COEF)."""
    from mortar_parquet_support_spark.operators.sampling import build_mixture

    docs = _t(spark, sf_dir, "documents")
    out = build_mixture(
        docs,
        "doc_id",
        "source",
        _MIX_WEIGHTS,
        target_rows=_MIX_TARGET,
        salt="mix",
    )
    return out.select("doc_id", "source", "epoch")


@_register(
    "sample_exact_k",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5('k:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                        / 4503599627370496.0,
                        doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 7
    """,
)
def _sample_exact_k(spark, sf_dir):
    """Deterministic exact-size sampling (operators/sampling.py
    sample_exact_k): the 7 lowest-md5-hash docs per source — reservoir
    semantics without order dependence; membership is a pure function of
    (id, salt) so both engines pick the identical rows."""
    from mortar_parquet_support_spark.operators.sampling import sample_exact_k

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sample_exact_k(docs, "doc_id", 7, by=["source"], salt="k:")


@_register(
    "group_split",
    """
    SELECT doc_id, source,
           CASE WHEN b < 8000 THEN 'train'
                WHEN b < 9000 THEN 'val'
                WHEN b < 10000 THEN 'test' END AS split
    FROM (
      SELECT doc_id, source,
             ('0x' || substr(md5('gs:' || source), 1, 8))::BIGINT % 10000 AS b
      FROM documents
    )
    """,
)
def _group_split(spark, sf_dir):
    """Leakage-safe splits (operators/sampling.py group_split): the
    train/val/test label is a pure md5 function of the SOURCE key, so
    every document of a source lands in one split — same-source
    look-alikes can never straddle the eval boundary. Row-identical vs
    the DuckDB restatement; the per-group single-split invariant is
    pytest-pinned."""
    from mortar_parquet_support_spark.operators.sampling import group_split

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return group_split(
        docs, "source",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="gs:",
    )


@_register(
    "temperature_mixture",
    """
    WITH cnt AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n
      FROM documents WHERE source IS NOT NULL
      GROUP BY source
    ), wtab AS (
      SELECT source, n,
             ROUND(POW(n, 0.3) / SUM(POW(n, 0.3)) OVER (), 9) AS w
      FROM cnt
    ), planned AS (
      SELECT d.doc_id, d.source,
             CAST(2000 AS DOUBLE) * t.w / t.n AS rate
      FROM documents d JOIN wtab t USING (source)
    ), reps AS (
      SELECT doc_id, source,
             CAST(floor(rate) AS BIGINT) +
             CASE WHEN ('0x' || substr(md5('tm:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10000
                       < CAST(round((rate - floor(rate)) * 10000) AS BIGINT)
                  THEN 1 ELSE 0 END AS n_reps
      FROM planned
    )
    SELECT doc_id, source, CAST(unnest(range(0, n_reps)) AS BIGINT) AS epoch
    FROM reps
    """,
)
def _temperature_mixture(spark, sf_dir):
    """Alpha-sampled training mixture, fully in-plan (operators/
    sampling.py temperature_mixture): domain weights n_d^0.3 normalized
    from the corpus' own counts inside the SAME plan that materializes
    the mixture — no driver dict handoff, so the whole pipeline is
    SQL-expressible and the oracle replays it end to end (weights
    rounded at 1e-9 on both engines to absorb pow/sum-order ulps;
    everything downstream is identical single IEEE ops). Promoted from
    rows-only in r10 (VERDICT r9 ask #4)."""
    from mortar_parquet_support_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = _t(spark, sf_dir, "documents")
    out = temperature_mixture(
        docs.select("doc_id", "source"),
        "doc_id",
        "source",
        alpha=0.3,
        target_rows=2000,
        salt="tm:",
    )
    return out.select("doc_id", "source", "epoch")


@_register(
    "global_shuffle",
    """
    SELECT doc_id,
           ('0x' || substr(md5('gs:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 16 AS shard,
           ROW_NUMBER() OVER (
             PARTITION BY
               ('0x' || substr(md5('gs:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 16
             ORDER BY md5('gs:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS pos
    FROM documents
    """,
)
def _global_shuffle(spark, sf_dir):
    """Deterministic training-order shuffle (operators/sampling.py
    global_shuffle): every doc gets a (shard, pos) that is a pure
    function of (doc_id, salt) — the md5 hex order both engines replay
    byte for byte. Shard-major by design: per-shard row_number instead
    of one corpus-wide window partition."""
    from mortar_parquet_support_spark.operators.sampling import (
        global_shuffle,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return global_shuffle(docs, "doc_id", shards=16, salt="gs:")


@_register(
    "quantile_buckets",
    """
    SELECT doc_id, source, CAST(NTILE(10) OVER (
             PARTITION BY source ORDER BY length(text), doc_id
           ) AS INT) AS bucket
    FROM documents WHERE text IS NOT NULL
    UNION ALL
    SELECT doc_id, source, CAST(NULL AS INT) AS bucket
    FROM documents WHERE text IS NULL
    """,
)
def _quantile_buckets(spark, sf_dir):
    """Per-source quality-decile stratification (operators/features.py
    quantile_buckets): docs NTILE into 10 buckets by text length within
    their source, ties broken by doc_id — standard-SQL NTILE semantics
    so both engines assign identical boundary rows; NULL texts get NULL
    buckets explicitly (Spark and DuckDB disagree on default NULL sort
    order, so they are never left inside the window)."""
    from mortar_parquet_support_spark.operators.features import (
        quantile_buckets,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("v")
    )
    return quantile_buckets(
        docs, value="v", tie_col="doc_id", keys=["source"], buckets=10
    ).select("doc_id", "source", "bucket")


_PB_FRACS = [i / 10 for i in range(1, 10)]
_PB_BOUNDS_SQL = ", ".join(
    f"quantile_cont(v, {f!r}) AS q{i}" for i, f in enumerate(_PB_FRACS)
)
_PB_BUCKET_SQL = " + ".join(
    f"CAST(v > q{i} AS INT)" for i in range(len(_PB_FRACS))
)


@_register(
    "percentile_buckets",
    f"""
    WITH src AS (
      SELECT doc_id, source, length(text) AS v FROM documents
    ), b AS (
      SELECT {_PB_BOUNDS_SQL} FROM src
    )
    SELECT doc_id, source,
           CASE WHEN v IS NULL THEN NULL
                ELSE CAST(1 + {_PB_BUCKET_SQL} AS INT) END AS bucket
    FROM src CROSS JOIN b
    """,
)
def _percentile_buckets(spark, sf_dir):
    """GLOBAL approximate decile stratification (operators/features.py
    percentile_buckets — the shipped 100x answer to quantile_buckets'
    empty-keys single-partition wall): exact interpolated percentile
    boundaries of text length (one small aggregate, Spark percentile ==
    DuckDB quantile_cont bit-for-bit — the winsorize pin), broadcast
    back, bucket = 1 + #{boundaries < value} stamped IN-ROW with zero
    row-side shuffles and zero windows. Boundary ties go to the LOWER
    bucket on both engines; NULL lengths get NULL buckets."""
    from mortar_parquet_support_spark.operators.features import (
        percentile_buckets,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("v")
    )
    return percentile_buckets(docs, value="v", buckets=10).select(
        "doc_id", "source", "bucket"
    )


@_register(
    "length_bucket_batches",
    """
    SELECT doc_id,
           ((doc_id % 8) + 8) % 8 AS shard,
           CAST(floor(length(text) / 64) AS BIGINT) AS bucket,
           CAST(floor((ROW_NUMBER() OVER (
             PARTITION BY ((doc_id % 8) + 8) % 8, floor(length(text) / 64)
             ORDER BY doc_id
           ) - 1) / 32) AS BIGINT) AS batch
    FROM documents WHERE text IS NOT NULL
    """,
)
def _length_bucket_batches(spark, sf_dir):
    """Padding-minimizing batch layout (operators/curation.py
    length_bucket_batches): docs bucket by floor(len/64), then fixed
    32-row batches within each (shard, bucket) in doc_id order — the
    dynamic-batching sibling of pack_sequences (fixed COUNT of similar
    lengths vs fixed token BUDGET)."""
    from mortar_parquet_support_spark.operators.curation import (
        length_bucket_batches,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.length("text").alias("cost"))
    )
    return length_bucket_batches(
        docs, id_col="doc_id", cost_col="cost", bucket_width=64,
        batch_size=32, shards=8,
    ).select("doc_id", "shard", "bucket", "batch")


@_register(
    "weighted_sample_k",
    """
    WITH e AS (
      SELECT doc_id, source,
             ROUND(
               ln(greatest(
                 ('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                   / 4503599627370496.0,
                 1.0 / 4503599627370496.0))
               / length(text), 9) AS key
      FROM documents WHERE length(text) > 0 AND NOT isnan(length(text))
    )
    SELECT doc_id, source, key FROM (
      SELECT doc_id, source, key, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY key DESC, doc_id
      ) AS rn FROM e
    ) WHERE rn <= 50
    """,
)
def _weighted_sample_k(spark, sf_dir):
    """Exact-k weighted sampling without replacement (operators/
    sampling.py weighted_sample_k, Efraimidis-Spirakis A-ES): top-50
    docs per source by ln(u)/weight with weight = text length, key
    rounded at 1e-9 so libm ln ulps cannot flip a boundary rank on
    either engine."""
    from mortar_parquet_support_spark.operators.sampling import (
        hash_unit,
        weighted_sample_k,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("w")
    )
    out = weighted_sample_k(
        docs, "doc_id", "w", 50, by=["source"], salt="ws:"
    )
    u = F.greatest(
        hash_unit(F.col("doc_id"), salt="ws:"), F.lit(1.0 / (1 << 52))
    )
    key = F.round(F.log(u) / F.col("w"), 9)
    return out.select("doc_id", "source", key.alias("key"))
