"""Shared registry for the per-family entry modules: the name->callable
and name->oracle-SQL maps, the ``_register`` decorator, the memoized
table loader, and the per-session index builders the kNN/dedup entries
share. Split out of ``__spark_entry__.py`` (round 9)."""


from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mortar_parquet_support_spark.plans.hints import maybe_broadcast

_SPARK_FNS: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn):
        _SPARK_FNS[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


import weakref

_TABLE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
# built IVF indexes per session (see _knn_ivf): avoids re-persisting the
# assigned corpus on every invocation of the entry in one session
_IVF_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized lazy table handle. load_table re-lists the directory and
    re-infers the parquet schema on every call — one or two driver jobs per
    table per query, ~30 redundant jobs across a 20-query bench session.
    Caching the (lazy) DataFrame is catalog-metadata caching, not data
    caching — though the file LISTING is pinned at first load, which is
    correct here because the fixture dirs are immutable within a session
    (regeneration happens between driver sessions). Keyed on the owning
    session (weakly — entries die with it), since a DataFrame is bound to
    the SparkSession that built it."""
    from mortar_parquet_support_spark.tables import load_table

    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    if key not in per_session:
        per_session[key] = load_table(spark, sf_dir, name)
    return per_session[key]


def _char3_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared char-3-gram Jaccard scorer for the three entries that
    brute-force the 10% documents sample (ngram_jaccard_pairs,
    dedup_clusters, resolve_duplicates — their DuckDB oracles share the
    same ``sample``/``pairs`` CTEs verbatim). Returns (id_a, id_b, _jac)
    with the raw unrounded Jaccard, for every pair sharing AT LEAST ONE
    gram — pairs with an empty intersection are absent instead of scored
    0.0/NULL, so callers MUST keep their ``_jac >= t`` filter with t > 0
    (all three use 0.5; a zero-intersection pair can never reach it).

    r16 optimization — inverted-index formulation. The previous spelling
    joined the two gram-array sides on ``id_a < id_b`` and computed
    ``size(array_intersect(..))`` per pair: filter pushdown inlined the
    Jaccard predicate into the join CONDITION, so the intersect (a hash
    set built per call over ~140-string arrays) ran up to THREE times
    per pair, and every joined row materialized both gram arrays —
    measured 23s at sf0.1. This shape explodes each document's DISTINCT
    grams once (char_ngrams is array_distinct, so the per-pair match
    count off the gram equi-join IS |A∩B| — the same argument the
    dedup_minhash oracle's inverted index rests on), aggregates with
    map-side partial counting, and never carries an array through a
    join: 3.7s at sf0.1, byte-identical output (r16 A/B: 0 differing
    rows; arithmetic unchanged — int sizes, same cast-to-double points).
    Scale note: the equi-join fan-out is sum over grams of count² — fine
    on the deliberate 10% sample these entries score, quadratic-in-hot-
    grams on a full corpus, where the operator-level answer is minhash
    LSH candidates, not this verify-stage brute force."""
    from mortar_parquet_support_spark.functions import char_ngrams

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    g = docs.select(F.col("doc_id"), char_ngrams(F.col("text"), 3).alias("grams"))
    tok = g.select("doc_id", F.size("grams").alias("sz"), F.explode("grams").alias("gr"))
    a = tok.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"), "gr")
    b = tok.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"), "gr")
    inter = (
        a.join(b, "gr")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    jac = F.col("_inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("_inter")
    ).cast("double")
    return inter.withColumn("_jac", jac).select("id_a", "id_b", "_jac")


def pq_index_for(spark: SparkSession, sf_dir: str):
    """Build (or fetch) the memoized per-session PQ index over the
    embeddings table — same amortized build-offline/probe-online shape
    as ivf_index_for."""
    per_session = _IVF_CACHE.setdefault(spark, {})
    key = ("pq", sf_dir)
    if key not in per_session:
        from mortar_parquet_support_spark.operators.pq import PqIndex

        per_session[key] = PqIndex.build(
            _t(spark, sf_dir, "embeddings"), m=16, ksub=32, iters=2,
            persist=True,
        )
    return per_session[key]


def _entry_digest():
    """Digest for the incremental_dedup entry: md5 over the (lang, source)
    channel rather than the text — every fixture text is unique, so a
    content digest would never hit the index and the seen path (Bloom hit
    -> verify semi-join -> anti-join drop) would go unwitnessed. The 97
    channels over 500 docs give the driver's compare real cross-batch
    duplicates. concat (not concat_ws) so a NULL field nulls the digest
    exactly like DuckDB's ||."""
    return F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("source")))


def digest_index_for(spark: SparkSession, sf_dir: str):
    """Build (or fetch) the memoized per-session DigestIndex holding the
    channel digests (see _entry_digest) of every documents row with
    doc_id % 3 == 0 — the 'historically ingested' corpus the
    incremental_dedup entry probes against. Same amortized
    build-offline/probe-online shape as ivf_index_for; the index lives in
    a session-scoped scratch dir."""
    per_session = _IVF_CACHE.setdefault(spark, {})
    key = ("digest", sf_dir)
    if key not in per_session:
        import tempfile

        from mortar_parquet_support_spark.operators.incremental import DigestIndex

        idx = DigestIndex.create(
            spark,
            tempfile.mkdtemp(prefix="mortar_digest_idx_"),
            n_shards=8,
            capacity=200_000,
        )
        idx.add(
            _entry_digest(),
            _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0),
        )
        per_session[key] = idx
    return per_session[key]


def ivf_index_for(spark: SparkSession, sf_dir: str):
    """Build (or fetch) the memoized per-session IVF index over the
    embeddings table — one persisted assignment reused by every knn_ivf
    invocation in a session, the amortized build-offline/probe-online
    serving shape. Public so bench.py can time the one-time BUILD
    separately from the per-query PROBE."""
    per_session = _IVF_CACHE.setdefault(spark, {})
    if sf_dir not in per_session:
        from mortar_parquet_support_spark.operators.similarity import IvfIndex

        per_session[sf_dir] = IvfIndex.build(
            _t(spark, sf_dir, "embeddings"), n_list=8, persist=True
        )
    return per_session[sf_dir]


def ivf_index_rebuild(spark: SparkSession, sf_dir: str):
    """Fresh IVF build, replacing (and unpersisting) any memoized index for
    this (session, sf_dir). bench.py's knn_ivf_build line is median-of-3
    from round 12 — it was the only timed entry outside the median policy
    and swung +23% r10->r11 on unchanged code — and each of the three runs
    must be a REAL build, which ivf_index_for's memoization would
    otherwise turn into two no-ops."""
    per_session = _IVF_CACHE.setdefault(spark, {})
    old = per_session.pop(sf_dir, None)
    if old is not None:
        old.unpersist()
    return ivf_index_for(spark, sf_dir)


