"""LLM-data-pipeline extensions (dedup / kNN / text / curation; BASELINE.json:6).

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

# LLM-pipeline extensions (BASELINE.json:6)
# ===========================================================================

@_register(
    "dedup_exact",
    """
    SELECT md5(text) AS digest,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def _dedup_exact(spark, sf_dir):
    from mortar_parquet_support_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, ["text"], id_col="doc_id").select(
        "digest", F.col("keep_id").cast("long").alias("keep_id"), "n_copies"
    )


@_register(
    "dedup_fingerprint",
    """
    SELECT md5(trim(regexp_replace(lower(text), '[^\\p{L}\\p{N}]+', ' ', 'g'))) AS digest,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def _dedup_fingerprint(spark, sf_dir):
    """Normalized-fingerprint dedup (operators/text.py fingerprint)."""
    from mortar_parquet_support_spark.operators.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint(F.col("text")).alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@_register(
    "ngram_jaccard_pairs",
    """
    WITH sample AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, greatest(len(text) - 2, 1) + 1),
               i -> substr(text, CAST(i AS INT), 3))) AS grams
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
                 (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6
           ) AS jaccard
    FROM sample a JOIN sample b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
          (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
    """,
)
def _ngram_jaccard_pairs(spark, sf_dir):
    """Exact character-3-gram Jaccard near-dup pairs on a deterministic
    sample (all-pairs is the VERIFY stage; candidate generation at scale is
    minhash_lsh — see dedup_minhash entry)."""
    from mortar_parquet_support_spark.functions import char_ngrams

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    g = docs.select(F.col("doc_id"), char_ngrams(F.col("text"), 3).alias("grams"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size("ga") + F.size("gb") - F.size(F.array_intersect("ga", "gb"))
    jac = inter / union.cast("double")
    return pairs.select("id_a", "id_b", F.round(jac, 6).alias("jaccard")).filter(
        jac >= 0.5
    )


@_register("dedup_minhash")
def _dedup_minhash(spark, sf_dir):
    """MinHash+LSH fuzzy dedup (operators/dedup.py minhash_dedup). Uses
    xxhash64 signatures (no DuckDB equivalent) -> rows-only check; its
    verify stage (exact Jaccard) is oracle-checked via ngram_jaccard_pairs."""
    from mortar_parquet_support_spark.operators.dedup import minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup(docs, id_col="doc_id", text_col="text", threshold=0.5)


@_register("dedup_simhash")
def _dedup_simhash(spark, sf_dir):
    """SimHash banded near-dup candidates (xxhash64-based -> rows-only)."""
    from mortar_parquet_support_spark.operators.dedup import simhash_dedup

    docs = _t(spark, sf_dir, "documents")
    return simhash_dedup(docs, id_col="doc_id", text_col="text")


@_register(
    "knn_cosine",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 3
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(
               list_dot_product(q.qv, e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6
             ) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def _knn_cosine(spark, sf_dir):
    """Brute-force cosine top-k (operators/similarity.py cosine_topk),
    scores rounded to 6 dp on both sides; rank ties broken by neighbor id."""
    from mortar_parquet_support_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    # overfetch k=10 on raw scores, then cut to 5 on the ROUNDED score with
    # the neighbor_id tie-break — the oracle ranks on rounded values, so a
    # raw-rank-5/6 pair that rounds equal must both be in the candidate
    # pool or the engines can select different rows (same mitigation as
    # knn_cosine_arrow)
    out = cosine_topk(emb, queries, k=10)
    rounded = out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


@_register(
    "knn_cosine_arrow",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 100
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(
               list_dot_product(q.qv, e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6
             ) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def _knn_cosine_arrow(spark, sf_dir):
    """Vectorized brute-force top-k (operators/similarity.py
    cosine_topk_arrow): mapInArrow + numpy matmul with map-side partial
    top-k — the throughput path for large query batches (~8x the fold
    formulation at 100 queries, measured).

    Oracle-checked despite BLAS pairwise summation vs DuckDB's
    sequential fold: raw scores differ only at ~1e-15 relative, so after
    ROUND(...,6) values coincide; the kernel OVERFETCHES 10 extra raw
    ranks batch-locally and the single final window ranks the rounded
    score with the neighbor_id tie-break (round_to=6 folds the re-rank
    into cosine_topk_arrow itself — one window, no second pass), so a
    k-boundary pair whose raw order differs between engines cannot flip
    the selected set UNLESS a single rounded tie group spans more than
    10 raw ranks past the cut — vanishingly unlikely for continuous
    scores and verified exact at sf0.01 and sf0.1 (equivalence with the
    fold implementation is also pytest-verified)."""
    from mortar_parquet_support_spark.operators.similarity import cosine_topk_arrow

    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_topk_arrow(
        emb, emb.filter(F.col("vec_id") < 100), k=10, round_to=6, overfetch=10
    )
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


@_register("knn_lsh")
def _knn_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-k (operators/similarity.py lsh_topk;
    xxhash64 hyperplanes -> rows-only)."""
    from mortar_parquet_support_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, n_planes=6)


@_register("multimodal_features")
def _multimodal_features(spark, sf_dir):
    """Arrow-batched media feature extraction (operators/multimodal.py
    extract_features over mapInPandas): documents' text bytes stand in for
    media content with the deterministic 'fake' tier, so the
    schema/partitioning/batch plumbing runs for real on the fixture. REAL
    image decode exists too — decode_fn='image' decodes PNGs via the
    pure-stdlib codec in operators/imaging.py (pytest-verified pixel
    features) — but the synthetic documents aren't images. Python decode
    loop -> rows-only."""
    from mortar_parquet_support_spark.operators.multimodal import extract_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("txt").alias("format"),
            F.length("text").cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
    )
    out = extract_features(media, n_features=8)
    return out.select(
        "media_id", "modality", "n_bytes", F.round(F.element_at("features", 1), 6).alias("f0")
    )


@_register("multimodal_resize")
def _multimodal_resize(spark, sf_dir):
    """REAL image resize through the Arrow-batched resize_images operator
    (operators/multimodal.py): deterministic 8x8 grayscale PNGs are
    synthesized from doc ids (stdlib encoder, operators/imaging.py),
    resized to 4x4 with vectorized nearest-neighbor resampling, and
    re-encoded. Output is the decoded-deterministic md5 of the resized PNG
    bytes plus updated meta dims. Binary pipeline -> rows-only."""
    import hashlib

    from mortar_parquet_support_spark.operators.imaging import encode_png
    from mortar_parquet_support_spark.operators.multimodal import (
        MEDIA_SCHEMA, resize_images,
    )

    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(24).collect()
    ]
    rows = []
    for i in ids:
        digest = hashlib.md5(str(i).encode()).digest()
        pixels = (digest * 4)[:64]  # 8x8 grayscale
        png = encode_png(pixels, 8, 8, 1, filter_type=i % 5)
        rows.append(
            (str(i), bytearray(png), ("image", "png", len(png), 8, 8, None))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(media, width=4, height=4)
    return out.select(
        "media_id",
        F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("content").alias("png_md5"),
    ).orderBy("media_id")


@_register(
    "knn_ivf",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(
               list_dot_product(q.qv, e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6
             ) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def _knn_ivf(spark, sf_dir):
    """IVF-flat top-k (operators/similarity.py ivf_topk) run at full probe
    (nprobe = n_list = 8): the index machinery — hash-seeded Lloyd-refined
    centroids, nearest-cell assignment, probe equi-join — all executes, and
    full probe makes the result exact, so it is oracle-checked against
    DuckDB brute-force top-k. Partial-probe recall is covered by
    tests/test_operators.py. Re-ranked on the rounded score so both engines
    order identical values the same way.

    Uses the amortized ``IvfIndex.build(persist=True)`` shape — the
    assignment scan materializes once and the probe join reuses it, instead
    of the one-shot ``ivf_topk`` recomputing it under AQE replanning. This
    is also the documented 100 TB serving shape (build offline, probe per
    query batch)."""
    emb = _t(spark, sf_dir, "embeddings")
    index = ivf_index_for(spark, sf_dir)
    # rank ONCE, directly on the rounded score (scored_candidates skips
    # topk's internal window — ranking twice would double the window cost)
    rounded = index.scored_candidates(
        emb.filter(F.col("vec_id") < 10), nprobe=8
    ).select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
        )
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
    "curation_pipeline",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    ), words AS (
      SELECT doc_id, text, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM corpus
    ), feats AS (
      SELECT doc_id, text,
        len(list_filter(w, x -> list_contains(['the','and','of','to','is','in','that','it','for','was'], x))) AS h_en,
        len(list_filter(w, x -> list_contains(['der','die','und','das','ist','nicht','ein','mit','auf','sich'], x))) AS h_de,
        len(list_filter(w, x -> list_contains(['le','la','les','et','est','pas','des','une','dans','que'], x))) AS h_fr,
        len(list_filter(w, x -> list_contains(['el','la','los','y','es','en','que','por','con','para'], x))) AS h_es,
        length(text) AS n,
        CASE WHEN length(text) > 0
             THEN CAST(len(regexp_extract_all(text, '[^\\p{L}\\p{N}_\\s]')) AS DOUBLE) / length(text)
             ELSE 0.0 END AS pr,
        CASE WHEN length(text) > 0
             THEN CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)
             ELSE 0.0 END AS dr,
        CASE WHEN len(w) > 0
             THEN CAST(len(list_filter(w, x -> list_contains(
                    ['the','and','of','to','is','in','that','it','for','was',
                     'a','an','on','with','as','at','by','be'], x))) AS DOUBLE) / len(w)
             ELSE 0.0 END AS sw
      FROM words
    ), scored AS (
      SELECT doc_id, text,
        CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
             WHEN h_fr >= h_en AND h_fr >= h_de AND h_fr >= h_es THEN 'fr'
             WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
             WHEN h_en >= h_de THEN 'en'
             ELSE 'de' END AS lang,
        (CASE WHEN n < 20 THEN n / 20.0 WHEN n > 10000 THEN 0.5 ELSE 1.0 END) * 0.3
          + greatest(0.0, 1.0 - pr * 4) * 0.25
          + greatest(0.0, 1.0 - dr * 4) * 0.2
          + (CASE WHEN sw > 0.05 THEN 1.0 ELSE sw * 20 END) * 0.25 AS q
      FROM feats
    ), pre AS (
      SELECT doc_id, text,
        CASE WHEN lang <> 'en' THEN 'language'
             WHEN q < 0.8725 THEN 'low_quality' END AS r0
      FROM scored
    ), final AS (
      SELECT doc_id,
        COALESCE(r0, CASE WHEN doc_id <> MIN(CASE WHEN r0 IS NULL THEN doc_id END)
                            OVER (PARTITION BY md5(text))
                     THEN 'duplicate' END) AS drop_reason
      FROM pre
    )
    SELECT doc_id, drop_reason IS NULL AS kept, drop_reason FROM final
    """,
)
def _curation_pipeline(spark, sf_dir):
    """End-to-end audited curation recipe (pipelines/curation.py curate):
    language filter -> quality filter -> exact dedup scoped to surviving
    rows, every row labeled with the FIRST rejecting stage. Exact
    duplicates are planted (every 10th doc copied under doc_id+100000) so
    the dedup stage is non-vacuous on this fixture; the oracle restates
    the full stage cascade including the survivors-only MIN window. The
    0.8725 threshold sits in a ~2e-3 gap of the fixture's quality-score
    distribution at both sf0.01 and sf0.1 (no cross-engine float-edge
    risk)."""
    from mortar_parquet_support_spark.pipelines import curate

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    out = curate(
        docs.unionByName(planted),
        keep_languages=("en",),
        min_quality=0.8725,
        dedup="exact",
        audit=True,
    )
    return out.select("doc_id", "kept", "drop_reason")


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
    "embedding_dedup",
    """
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(
               list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6
             ) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) WHERE cosine >= 0.4
    """,
)
def _embedding_dedup(spark, sf_dir):
    """Embedding-cosine near-dup pairs in exact mode (n_planes=0 ->
    all-pairs within the single bucket), oracle-checked against DuckDB
    brute-force pairwise cosine. The LSH-bucketed scale path (n_planes>0)
    keeps its recall guarantee tested in tests/test_operators.py; the
    threshold 0.4 is chosen so the fixture emits rows (max pairwise cosine
    in the synthetic embeddings is ~0.51 — 0.8 validated nothing)."""
    from mortar_parquet_support_spark.operators.dedup import embedding_dedup

    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_dedup(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.0, n_planes=0
    )
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).filter(F.col("cosine") >= 0.4)


@_register(
    "semantic_dedup",
    """
    SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
           CAST(1.0 AS DOUBLE) AS cosine
    FROM embeddings WHERE vec_id % 10 = 0
    """,
)
def _semantic_dedup(spark, sf_dir):
    """SemDeDup-style cluster-pruned dedup (operators/dedup.py
    semantic_dedup; Abbas et al. 2023): k-means cells, pairwise cosine
    within cells only. Oracle design: exact duplicates are planted (every
    10th vector copied under vec_id+100000) — identical vectors share one
    nearest centroid under the deterministic tie-break, so they can NEVER
    straddle a cell boundary (pinned by
    test_semantic_dedup_identical_members_never_split), making the pruned
    result deterministic and SQL-expressible even though real clustering
    runs (n_clusters=4, 2 Lloyd iters). The fixture's natural max pairwise
    cosine is ~0.51, far under the 0.999 threshold, so ONLY planted pairs
    emit. Boundary-recall bounds for non-identical near-dups are
    pytest-pinned (test_semantic_dedup_cluster_pruned_recall)."""
    from mortar_parquet_support_spark.operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    pairs = semantic_dedup(
        emb.unionByName(dups),
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.999,
        n_clusters=4,
        iters=2,
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


@_register(
    "text_metrics",
    """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]')) AS n_bpe_tokens,
           CASE WHEN length(text) > 0
                THEN ROUND(CAST(len(regexp_extract_all(text, '[^\\p{L}\\p{N}_\\s]')) AS DOUBLE) / length(text), 6)
                ELSE 0.0 END AS punct_ratio,
           CASE WHEN length(text) > 0
                THEN ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text), 6)
                ELSE 0.0 END AS digit_ratio
    FROM documents
    """,
)
def _text_metrics(spark, sf_dir):
    """Token counting + ratio metrics (operators/text.py)."""
    from mortar_parquet_support_spark.operators import text as T_

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        T_.whitespace_token_count(t).alias("n_tokens"),
        T_.bpe_token_count(t).alias("n_bpe_tokens"),
        F.round(T_.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(T_.digit_ratio(t), 6).alias("digit_ratio"),
    )


@_register(
    "text_langid",
    """
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
    ), hits AS (
      SELECT doc_id,
        len(list_filter(w, x -> list_contains(['the','and','of','to','is','in','that','it','for','was'], x))) AS h_en,
        len(list_filter(w, x -> list_contains(['der','die','und','das','ist','nicht','ein','mit','auf','sich'], x))) AS h_de,
        len(list_filter(w, x -> list_contains(['le','la','les','et','est','pas','des','une','dans','que'], x))) AS h_fr,
        len(list_filter(w, x -> list_contains(['el','la','los','y','es','en','que','por','con','para'], x))) AS h_es
      FROM words
    )
    -- tie policy mirrors Spark's array_max over (hits, code): max hits,
    -- then lexicographically LARGEST code -> check fr, es, en, de in order
    SELECT doc_id,
           CASE
             WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
             WHEN h_fr >= h_en AND h_fr >= h_de AND h_fr >= h_es THEN 'fr'
             WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
             WHEN h_en >= h_de THEN 'en'
             ELSE 'de'
           END AS lang_guess
    FROM hits
    """,
)
def _text_langid(spark, sf_dir):
    """Stopword-marker language ID (operators/text.py lang_id). Tie policy:
    max hits, later language code wins ties (array_max on (hits, code))."""
    from mortar_parquet_support_spark.operators.text import lang_id

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_guess"))


@_register(
    "text_quality",
    """
    WITH m AS (
      SELECT doc_id,
             length(text) AS n,
             CASE WHEN length(text) > 0
                  THEN CAST(len(regexp_extract_all(text, '[^\\p{L}\\p{N}_\\s]')) AS DOUBLE) / length(text)
                  ELSE 0.0 END AS pr,
             CASE WHEN length(text) > 0
                  THEN CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)
                  ELSE 0.0 END AS dr,
             CASE WHEN len(string_split_regex(trim(lower(text)), '\\s+')) > 0
                  THEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                       x -> list_contains(['the','and','of','to','is','in','that','it','for','was',
                                           'a','an','on','with','as','at','by','be'], x))) AS DOUBLE)
                       / len(string_split_regex(trim(lower(text)), '\\s+'))
                  ELSE 0.0 END AS sw
      FROM documents
    )
    SELECT doc_id,
           ROUND(
             (CASE WHEN n < 20 THEN n / 20.0 WHEN n > 10000 THEN 0.5 ELSE 1.0 END) * 0.3
             + greatest(0.0, 1.0 - pr * 4) * 0.25
             + greatest(0.0, 1.0 - dr * 4) * 0.2
             + (CASE WHEN sw > 0.05 THEN 1.0 ELSE sw * 20 END) * 0.25, 6) AS quality
    FROM m
    """,
)
def _text_quality(spark, sf_dir):
    """Composite quality heuristic (operators/text.py score_quality — the
    CSE form: each ratio bound once as an intermediate column, score as a
    second tiny projection); the oracle restates the documented fixed-weight
    formula. (least(1, sw*20) == CASE WHEN sw > 0.05 THEN 1 ELSE sw*20 END
    for sw >= 0, so values are unchanged.)"""
    from mortar_parquet_support_spark.operators.text import score_quality

    docs = _t(spark, sf_dir, "documents")
    return score_quality(docs).select("doc_id", "quality")


@_register(
    "bm25_topk",
    """
    WITH feat AS (
      -- coalesce(text, ''): the operator's documented NULL-text convention
      -- (NULL scores 0.0 and still counts toward N/avgdl)
      SELECT doc_id,
             CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0.0
                  ELSE CAST(len(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+')) AS DOUBLE) END AS dl,
             CAST(len(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'), x -> x = 'merge')) AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'), x -> x = 'spark')) AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'), x -> x = 'window')) AS DOUBLE) AS tf2
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      FROM feat
    )
    SELECT doc_id,
           ROUND(
             ln(1 + (n - df0 + 0.5)/(df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2*(0.25 + 0.75*dl/avgdl))
           + ln(1 + (n - df1 + 0.5)/(df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2*(0.25 + 0.75*dl/avgdl))
           + ln(1 + (n - df2 + 0.5)/(df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2*(0.25 + 0.75*dl/avgdl)), 6) AS bm25
    FROM feat CROSS JOIN stats
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def _bm25_topk(spark, sf_dir):
    """Okapi BM25 ranked retrieval (operators/search.py) — the sparse leg
    of the retrieval story (dense = knn_*). Query-term tf via array
    expressions (zero shuffle), corpus stats (N, avgdl, per-term df) as ONE
    broadcast scalar aggregate, top-k as TakeOrdered on the rounded score
    with doc_id tie-break. Oracle restates the same Lucene-idf formula
    (k1=1.2, b=0.75 -> k1+1=2.2, 1-b=0.25)."""
    from mortar_parquet_support_spark.operators.search import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "merge", "window"], k=20)


@_register(
    "hybrid_rrf",
    """
    WITH feat AS (
      SELECT doc_id,
             CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0.0
                  ELSE CAST(len(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+')) AS DOUBLE) END AS dl,
             CAST(len(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'), x -> x = 'merge')) AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'), x -> x = 'spark')) AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'), x -> x = 'window')) AS DOUBLE) AS tf2
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      FROM feat
    ), bm AS (
      SELECT doc_id,
             ROUND(
               ln(1 + (n - df0 + 0.5)/(df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2*(0.25 + 0.75*dl/avgdl))
             + ln(1 + (n - df1 + 0.5)/(df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2*(0.25 + 0.75*dl/avgdl))
             + ln(1 + (n - df2 + 0.5)/(df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2*(0.25 + 0.75*dl/avgdl)), 6) AS s
      FROM feat CROSS JOIN stats
    ), bmr AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank FROM bm
      ) WHERE rank <= 20
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), cs AS (
      SELECT e.vec_id AS doc_id,
             ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv) /
                   (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(q.qv, q.qv))), 6) AS c
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> 0 AND e.embedding IS NOT NULL
    ), csr AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS rank FROM cs
      ) WHERE rank <= 20
    ), fused AS (
      SELECT doc_id, 1.0 / (60.0 + rank) AS contrib FROM bmr
      UNION ALL
      SELECT doc_id, 1.0 / (60.0 + rank) FROM csr
    )
    SELECT doc_id, ROUND(sum(contrib), 6) AS rrf_score, count(*) AS n_sources
    FROM fused GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
    """,
)
def _hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion (operators/search.py
    rrf_fuse) of the BM25 lexical leg and the dense-cosine leg — the
    standard two-tower retrieval combiner, needing no score calibration
    between legs. Both legs rank on ROUNDED scores with doc_id
    tie-breaks (the knn_cosine overfetch mitigation on the dense leg), so
    the rank inputs — and therefore the fused 1/(60+rank) sums, at most
    one commutative double add each — are engine-identical. The fixture's
    vec_id aligns 1:1 with doc_id; the query is document 0's embedding
    (self excluded, as cosine_topk does)."""
    from mortar_parquet_support_spark.operators.search import bm25_topk, rrf_fuse
    from mortar_parquet_support_spark.operators.similarity import cosine_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    one_part = F.pmod(F.col("doc_id"), F.lit(1))  # non-foldable single partition

    bm = bm25_topk(docs, ["spark", "merge", "window"], k=20)
    wb = Window.partitionBy(one_part).orderBy(F.col("bm25").desc(), F.col("doc_id"))
    bm_ranked = bm.withColumn("rank", F.row_number().over(wb)).select("doc_id", "rank")

    # overfetch the dense leg on raw scores, then cut to 20 on the ROUNDED
    # score with id tie-break (same mitigation as knn_cosine)
    cs = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=40)
    cs = cs.select(
        F.col("neighbor_id").alias("doc_id"), F.round("cosine", 6).alias("c")
    )
    wc = Window.partitionBy(one_part).orderBy(F.col("c").desc(), F.col("doc_id"))
    cs_ranked = (
        cs.withColumn("rank", F.row_number().over(wc))
        .filter(F.col("rank") <= 20)
        .select("doc_id", "rank")
    )

    fused = rrf_fuse([bm_ranked, cs_ranked], k=60)
    return (
        fused.select(
            "doc_id",
            F.round("rrf_score", 6).alias("rrf_score"),
            F.col("n_sources").cast("long").alias("n_sources"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
    )


@_register(
    "keyword_search",
    """
    WITH pairs AS (
      SELECT DISTINCT doc_id, t.token
      FROM documents, unnest(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+')) AS t(token)
      WHERE t.token <> ''
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched
    FROM pairs
    WHERE token IN ('merge', 'spark', 'window')
    GROUP BY doc_id
    """,
)
def _keyword_search(spark, sf_dir):
    """Inverted-index keyword query (operators/search.py): postings built
    once (explode + groupBy, the amortized write-time shuffle), then the
    query resolves against the postings table alone — the corpus is never
    rescanned at query time. n_matched counts distinct matched terms."""
    from mortar_parquet_support_spark.operators.search import (
        build_inverted_index,
        keyword_search,
    )

    docs = _t(spark, sf_dir, "documents")
    index = build_inverted_index(docs)
    return keyword_search(index, ["spark", "merge", "window"])


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
    "dedup_clusters",
    """
    WITH RECURSIVE sample AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, greatest(len(text) - 2, 1) + 1),
               i -> substr(text, CAST(i AS INT), 3))) AS grams
      FROM documents WHERE doc_id % 10 = 0
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sample a JOIN sample b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
            (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), walk AS (
      SELECT DISTINCT u, u AS label FROM edges
      UNION
      SELECT e.u, w.label FROM edges e JOIN walk w ON e.v = w.u
    )
    SELECT CAST(u AS BIGINT) AS id, CAST(min(label) AS BIGINT) AS cluster_id
    FROM walk GROUP BY u
    """,
)
def _dedup_clusters(spark, sf_dir):
    """Connected components over near-dup pairs
    (operators/dedup.py connected_components): cluster_id = min reachable
    doc id. Oracle states the same reachability min-label via a recursive
    CTE."""
    from mortar_parquet_support_spark.functions import char_ngrams
    from mortar_parquet_support_spark.operators.dedup import connected_components

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    g = docs.select(F.col("doc_id"), char_ngrams(F.col("text"), 3).alias("grams"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = (F.size("ga") + F.size("gb") - F.size(F.array_intersect("ga", "gb"))).cast("double")
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).filter(inter / union >= 0.5).select(
        "id_a", "id_b"
    )
    return connected_components(pairs).select(
        F.col("id").cast("long").alias("id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
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
    "fuzzy_match",
    """
    WITH l AS (
      SELECT DISTINCT source AS lk FROM documents WHERE source IS NOT NULL
    ), r AS (
      SELECT DISTINCT substr(source, 2) AS rk FROM documents
      WHERE source IS NOT NULL
    )
    SELECT lk, rk, CAST(levenshtein(lk, rk) AS INT) AS dist
    FROM l CROSS JOIN r
    WHERE levenshtein(lk, rk) <= 1
    """,
)
def _fuzzy_match(spark, sf_dir):
    """Fuzzy key matching (operators/entity.py fuzzy_key_map): SymSpell
    symmetric-delete candidates (in-row variant explode -> plain hash
    equi-join on the variant, NEVER a cartesian product) verified with
    the exact JVM levenshtein — so the result equals the brute-force
    cross join the oracle runs, at equi-join cost. Right side is the
    fixture's source keys with the first char dropped (a deterministic
    'dirty registry'), matching each srcN at distance 1."""
    from mortar_parquet_support_spark.operators.entity import fuzzy_key_map

    docs = _t(spark, sf_dir, "documents")
    left = docs.select(F.col("source").alias("lk"))
    right = docs.select(F.expr("substring(source, 2)").alias("rk"))
    return fuzzy_key_map(
        left, right, left_on="lk", right_on="rk", max_dist=1
    ).select("lk", "rk", F.col("dist").cast("int").alias("dist"))


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


@_register(
    "cluster_assign",
    """
    WITH c AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id < 4
    ), scored AS (
      SELECT e.vec_id, c.cid,
             ROUND(
               list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
               - 2 * list_dot_product(e.embedding::DOUBLE[], c.cv)
               + list_dot_product(c.cv, c.cv), 6
             ) AS d
      FROM embeddings e CROSS JOIN c
      WHERE e.embedding IS NOT NULL
    )
    SELECT vec_id, CAST(cid AS INT) AS cluster_id, d AS dist FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY d, cid
      ) AS rk FROM scored
    ) WHERE rk = 1
    """,
)
def _cluster_assign(spark, sf_dir):
    """Nearest-centroid assignment (operators/embeddings.py kmeans_assign):
    the centroid model inlines into the plan as a literal array and every
    vector folds over it — ZERO-shuffle map-only scan, the shape that
    assigns 100 TB of vectors in one pass. Centroids here are the four
    lowest-id fixture vectors so the oracle can derive the identical model;
    round_to=6 pins the argmin across the engines' float folds (ties break
    to the smaller cluster_id on both sides)."""
    from mortar_parquet_support_spark.operators.embeddings import kmeans_assign

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 4).collect()
    ]
    return kmeans_assign(emb, cents, metric="l2", round_to=6).select(
        "vec_id", "cluster_id", "dist"
    )


# ===========================================================================

@_register(
    "crosscorpus_dedup",
    """
    WITH ls AS (
      SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w)-1),
               i -> concat_ws(' ', w[CAST(i AS INT)], w[CAST(i AS INT)+1],
                              w[CAST(i AS INT)+2])))
          ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents WHERE doc_id % 2 = 0)
    ), rs AS (
      SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w)-1),
               i -> concat_ws(' ', w[CAST(i AS INT)], w[CAST(i AS INT)+1],
                              w[CAST(i AS INT)+2])))
          ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents WHERE doc_id % 2 = 1)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6
           ) AS jaccard
    FROM ls a JOIN rs b ON
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
    """,
)
def _crosscorpus_dedup(spark, sf_dir):
    """Cross-corpus near-dup join (operators/dedup.py crosscorpus_dedup):
    near-duplicate pairs BETWEEN two corpora — incremental-crawl-vs-
    training-set dedup where NEITHER side fits a broadcast. The oracle is
    the exact word-shingle cross Jaccard >= 0.5; the Spark side goes
    through the full banded-LSH candidate join + exact verify. With
    bands = num_perm = 64 (one signature per band) a J >= 0.5 pair escapes
    the candidate join with probability (1-J)^64 <= 6e-20 per pair —
    deterministic under the fixed seed, and verified exact against the
    oracle at sf0.01 (12 cross pairs, all J >= 0.9)."""
    from mortar_parquet_support_spark.operators.dedup import crosscorpus_dedup

    docs = _t(spark, sf_dir, "documents")
    out = crosscorpus_dedup(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
        num_perm=64,
        bands=64,
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@_register(
    "knn_sq8",
    """
    WITH mm AS (
      SELECT pos, min(v) AS lo, max(v) AS hi FROM (
        SELECT unnest(embedding::DOUBLE[]) AS v,
               unnest(range(1, len(embedding)+1)) AS pos
        FROM embeddings
      ) GROUP BY pos
    ), params AS (
      SELECT list(lo ORDER BY pos) AS lo_a,
             list(CASE WHEN hi > lo THEN 255.0/(hi-lo) ELSE 0.0 END
                  ORDER BY pos) AS sc_a,
             list(CASE WHEN hi > lo THEN (hi-lo)/255.0 ELSE 0.0 END
                  ORDER BY pos) AS st_a
      FROM mm
    ), deq AS (
      SELECT e.vec_id,
             list_transform(range(1, len(e.embedding)+1),
               i -> (greatest(-128, least(127,
                       CAST(round((e.embedding[CAST(i AS INT)]::DOUBLE
                                   - lo_a[CAST(i AS INT)])
                                  * sc_a[CAST(i AS INT)]) AS INT) - 128))
                     + 128.0) * st_a[CAST(i AS INT)]
                    + lo_a[CAST(i AS INT)]) AS dv
      FROM embeddings e, params
    ), q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10
    ), scored AS (
      SELECT q.query_id, d.vec_id AS neighbor_id,
             ROUND(
               list_dot_product(q.qv, d.dv) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(d.dv, d.dv))), 6
             ) AS cosine
      FROM deq d CROSS JOIN q
      WHERE d.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def _knn_sq8(spark, sf_dir):
    """Int8 scalar-quantized kNN (operators/quantize.py): per-dimension
    SQ8 codes (4x smaller than the float corpus — the 100 TB memory
    tier), asymmetric cosine of full-precision queries against the
    dequantized codes. Oracle-checked END TO END: train (per-dim min/max)
    -> quantize -> dequantize -> score all reproduce in DuckDB because
    every step is element-wise IEEE arithmetic with pre-divided scale
    literals — no summation-order dependence until the final dot product,
    which gets the same ROUND(...,6) + raw-overfetch treatment as
    knn_cosine."""
    from mortar_parquet_support_spark.operators.quantize import (
        sq8_quantize,
        sq8_topk,
        sq8_train,
    )

    emb = _t(spark, sf_dir, "embeddings")
    lo, hi = sq8_train(emb)
    codes = sq8_quantize(emb, lo=lo, hi=hi).select("vec_id", "codes")
    out = sq8_topk(
        codes, emb.filter(F.col("vec_id") < 10), lo=lo, hi=hi, k=10
    )
    rounded = out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
        )
    )


@_register("knn_pq")
def _knn_pq(spark, sf_dir):
    """Product-quantized ANN (operators/pq.py, Jégou et al. 2011): the
    memoized per-session PqIndex (m=16 subspaces × 32 centroids — 16
    bytes/vector against 512 for the floats) serves ADC top-k with an
    overfetched exact re-rank, the standard IVFADC code tier. No SQL
    oracle — the candidate set is inherently approximate (k-means
    codebooks are not SQL-expressible), so the driver records the
    rows-only check; exactness properties are pytest-pinned instead
    (lossless-codebook == brute force, recall bounds, save/load
    identity: tests/test_operators.py test_pq_*)."""
    emb = _t(spark, sf_dir, "embeddings")
    index = pq_index_for(spark, sf_dir)
    return index.topk(
        emb.filter(F.col("vec_id") < 10),
        k=10,
        rerank=50,
        rerank_corpus=emb,
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
    "unigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM documents
    ), toks2 AS (
      SELECT doc_id, token FROM toks WHERE token <> ''
    ), model AS (
      SELECT token, CAST(count(*) AS DOUBLE) AS freq FROM toks2 GROUP BY token
    ), total AS (
      SELECT CAST(sum(freq) AS DOUBLE) AS t FROM model
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           ROUND(avg(ln(m.freq / total.t)), 6) AS avg_logprob
    FROM toks2 d JOIN model m USING (token) CROSS JOIN total
    GROUP BY d.doc_id
    """,
)
def _unigram_logprob(spark, sf_dir):
    """CCNet-style unigram-LM quality signal (operators/text.py
    unigram_logprob): the corpus trains a unigram model of itself (explode
    + count, vocabulary-sized), then every document is scored with the
    mean ln-probability of its tokens — the head/middle/tail bucketing
    signal for crawl curation. The model broadcast-joins onto the token
    stream, so the corpus is never shuffled by token."""
    from mortar_parquet_support_spark.operators.text import unigram_logprob

    docs = _t(spark, sf_dir, "documents")
    return unigram_logprob(docs, id_col="doc_id", text_col="text")


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
    "bigram_logprob",
    """
    WITH docs_arr AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS arr
      FROM documents
    ), base AS (
      SELECT doc_id, arr FROM docs_arr WHERE len(arr) > 0
    ), uni AS (
      SELECT u.tok AS token, CAST(count(*) AS DOUBLE) AS freq
      FROM (SELECT unnest(arr) AS tok FROM base) u GROUP BY 1
    ), total AS (
      SELECT CAST(sum(freq) AS DOUBLE) AS t FROM uni
    ), pairs AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(arr)),
                                   i -> arr[CAST(i AS INT)])) AS w1,
             unnest(list_transform(range(1, len(arr)),
                                   i -> arr[CAST(i AS INT) + 1])) AS w2
      FROM base WHERE len(arr) >= 2
    ), big AS (
      SELECT w1, w2, CAST(count(*) AS DOUBLE) AS bfreq
      FROM pairs GROUP BY 1, 2
    ), ltot AS (
      SELECT w1, CAST(sum(bfreq) AS DOUBLE) AS lfreq FROM big GROUP BY 1
    ), first_lp AS (
      SELECT b.doc_id, ln(u.freq / total.t) AS lp
      FROM base b JOIN uni u ON u.token = b.arr[1] CROSS JOIN total
    ), pair_lp AS (
      SELECT p.doc_id, ln(g.bfreq / l.lfreq) AS lp
      FROM pairs p JOIN big g USING (w1, w2) JOIN ltot l USING (w1)
    ), all_lp AS (
      SELECT * FROM first_lp UNION ALL SELECT * FROM pair_lp
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           ROUND(avg(lp), 6) AS avg_logprob
    FROM all_lp GROUP BY doc_id
    """,
)
def _bigram_logprob(spark, sf_dir):
    """Bigram-LM quality scoring with stupid backoff (operators/text.py
    bigram_logprob), self-scored — first token takes the unigram
    probability, each following token the conditional MLE
    cnt(w1,w2)/cnt_left(w1). Pairs are formed IN-ROW (one transform over
    the token array; the corpus is never shuffled to build context) and
    the models join via maybe_broadcast. Self-scoring exercises every
    seen-bigram path; the backoff legs are pytest-pinned with an external
    train_df."""
    from mortar_parquet_support_spark.operators.text import bigram_logprob

    docs = _t(spark, sf_dir, "documents")
    return bigram_logprob(docs, id_col="doc_id", text_col="text")


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
    "duplicate_spans",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS a
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(range(0, len(a) - 7)) AS i, a
      FROM toks WHERE len(a) >= 8
    ), sh AS (
      SELECT doc_id, i, array_to_string(a[i+1:i+8], ' ') AS s FROM g
    ), dup AS (
      SELECT s FROM sh GROUP BY s HAVING count(*) >= 2
    ), hits AS (
      SELECT doc_id, i FROM sh JOIN dup USING (s)
    ), lagged AS (
      SELECT doc_id, i,
             CASE WHEN i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + 8
                  THEN 1 ELSE 0 END AS newgrp
      FROM hits
    ), isl AS (
      SELECT doc_id, i,
             SUM(newgrp) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM lagged
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(min(i) AS BIGINT) AS span_start,
           CAST(max(i) + 8 AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_grams
    FROM isl GROUP BY doc_id, grp
    """,
)
def _duplicate_spans(spark, sf_dir):
    """ExactSubstr-style duplicated-span detection (operators/dedup.py
    duplicate_spans): every 8-token shingle occurring >= 2 times corpus-
    wide marks its window; overlapping/adjacent windows merge per doc
    into [start, end) token spans. The oracle groups the raw shingle
    text where Spark groups its md5 hash — identical sets bar md5
    collisions, and the span merge is the same gaps-and-islands SQL."""
    from mortar_parquet_support_spark.operators.dedup import duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    return duplicate_spans(docs, k=8, min_count=2)


@_register(
    "remove_spans",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS a
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(range(0, len(a) - 7)) AS i, a
      FROM toks WHERE len(a) >= 8
    ), sh AS (
      SELECT doc_id, i, array_to_string(a[i+1:i+8], ' ') AS s FROM g
    ), dup AS (
      SELECT s FROM sh GROUP BY s HAVING count(*) >= 2
    ), hits AS (
      SELECT doc_id, i FROM sh JOIN dup USING (s)
    ), lagged AS (
      SELECT doc_id, i,
             CASE WHEN i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + 8
                  THEN 1 ELSE 0 END AS newgrp
      FROM hits
    ), isl AS (
      SELECT doc_id, i,
             SUM(newgrp) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM lagged
    ), spans AS (
      SELECT doc_id, min(i) AS s, max(i) + 8 AS e
      FROM isl GROUP BY doc_id, grp
    ), tw AS (
      SELECT doc_id, unnest(range(0, len(a))) AS i,
             unnest(a) AS w
      FROM toks
    ), kept AS (
      SELECT t.doc_id, t.i, t.w FROM tw t
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc_id = t.doc_id
                          AND t.i >= s.s AND t.i < s.e)
    ), agg AS (
      SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           coalesce(g.text, '') AS text,
           CAST(len(t.a) AS BIGINT) AS n_tokens,
           CAST(len(t.a) - coalesce(g.n_kept, 0) AS BIGINT) AS n_removed
    FROM toks t LEFT JOIN agg g ON t.doc_id = g.doc_id
    """,
)
def _remove_spans(spark, sf_dir):
    """The removal half of ExactSubstr dedup (operators/dedup.py
    remove_spans): duplicate_spans' [start, end) intervals broadcast back
    onto the corpus and every covered token drops in-row; text rebuilds
    from the casefolded tokenization. The oracle recomputes the same
    spans in SQL and anti-filters token positions with NOT EXISTS —
    every document survives, including span-free ones."""
    from mortar_parquet_support_spark.operators.dedup import (
        duplicate_spans,
        remove_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    spans = duplicate_spans(docs, k=8, min_count=2)
    return remove_spans(docs, spans)


@_register(
    "dedup_lines",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS a
      FROM documents
    ), chunked AS (
      SELECT doc_id,
             [array_to_string(a[i*5+1:i*5+5], ' ')
              FOR i IN range(0, CAST(ceil(len(a)/5.0) AS BIGINT))] AS lines
      FROM toks WHERE len(a) > 0
    ), ex AS (
      SELECT doc_id, unnest(range(0, len(lines))) AS pos,
             unnest(lines) AS line
      FROM chunked
    ), cnts AS (
      SELECT trim(lower(line)) AS nline, count(*) AS c
      FROM ex WHERE trim(lower(line)) <> '' GROUP BY 1
    ), dup AS (SELECT nline FROM cnts WHERE c >= 2),
    marked AS (
      SELECT e.doc_id, e.pos, e.line,
             (trim(lower(e.line)) <> '' AND d.nline IS NOT NULL) AS isdup
      FROM ex e LEFT JOIN dup d ON trim(lower(e.line)) = d.nline
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           coalesce(string_agg(CASE WHEN NOT isdup THEN line END,
                               chr(10) ORDER BY pos), '') AS text,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
    FROM marked GROUP BY doc_id
    """,
)
def _dedup_lines(spark, sf_dir):
    """C4/RefinedWeb-style corpus-level line dedup (operators/dedup.py
    dedup_lines): a line occurring >= 2 times across the corpus is removed
    from every document. The fixture has no newlines, so both engines
    first chunk each document into 5-word lines with the same arithmetic —
    the multi-line rebuild, empty-result, and n_removed legs all exercise
    for real. Token-free documents are filtered on BOTH sides before
    chunking: Spark's sequence(0, -1) yields [0, -1] (auto-negative step)
    where DuckDB's range(0, 0) yields [], so an empty doc would chunk
    differently — excluded symmetrically instead."""
    from mortar_parquet_support_spark.operators.dedup import dedup_lines

    docs = _t(spark, sf_dir, "documents")
    a = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    chunked = docs.filter(F.size(a) > 0).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0), F.ceil(F.size(a) / F.lit(5.0)).cast("int") - 1
                ),
                lambda i: F.array_join(F.slice(a, i * 5 + 1, 5), " "),
            ),
            "\n",
        ).alias("text"),
    )
    return dedup_lines(chunked, min_count=2)


@_register(
    "incremental_dedup",
    """
    SELECT CAST(b.doc_id AS BIGINT) AS doc_id
    FROM documents b
    WHERE b.doc_id % 3 <> 0
      AND NOT EXISTS (SELECT 1 FROM documents s
                      WHERE s.doc_id % 3 = 0
                        AND md5(s.lang || ':' || s.source)
                            = md5(b.lang || ':' || b.source))
    """,
)
def _incremental_dedup(spark, sf_dir):
    """Cross-batch exact dedup against the persisted DigestIndex
    (operators/incremental.py): docs with doc_id % 3 == 0 are the
    'already ingested' corpus (indexed once per session, see
    digest_index_for), the rest are the incoming batch; the digest keys
    the (lang, source) channel so the fixture yields real cross-batch
    duplicates (_entry_digest). Exactness under the Bloom prefilter is
    the contract: the oracle is the plain anti-join the index replaces.
    md5 hex agrees between Spark and DuckDB, so the digests compare
    engine-portably."""
    from mortar_parquet_support_spark.operators.incremental import (
        incremental_dedup,
    )

    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    out = incremental_dedup(
        batch, digest_index_for(spark, sf_dir), digest=_entry_digest()
    )
    return out.select(F.col("doc_id").cast("long").alias("doc_id"))


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
    "linear_classifier",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS a
      FROM documents
    ), grams AS (
      SELECT doc_id, unnest(a) AS g FROM toks
      UNION ALL
      SELECT doc_id,
             unnest([a[i+1] || ' ' || a[i+2] FOR i IN range(0, len(a)-1)]) AS g
      FROM toks WHERE len(a) >= 2
    ), ids AS (
      SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS fid
      FROM grams
    ), w AS (
      SELECT i AS feature,
             (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2001
              - 1000) / 1000.0 AS wt
      FROM range(4096) t(i)
    ), agg AS (
      SELECT ids.doc_id, sum(w.wt) AS z, count(*) AS nf
      FROM ids JOIN w ON ids.fid = w.feature GROUP BY 1
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(a.nf, 0) AS BIGINT) AS n_features,
           ROUND(1.0 / (1.0 + exp(-coalesce(a.z / a.nf, 0.0))), 6) AS score
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
)
def _linear_classifier(spark, sf_dir):
    """fastText-style hashed linear classifier inference (operators/text.py
    linear_classifier_score): score = sigmoid(mean weight of hashed word
    uni+bigrams), 4096 buckets. The weight table is synthesized
    deterministically from the bucket id via the same md5-hex-slice
    arithmetic both engines share, so the whole model — features, weights,
    pooling, sigmoid — is oracle-checkable bit-for-bit at 6 decimals."""
    from mortar_parquet_support_spark.operators.text import (
        linear_classifier_score,
    )

    n_buckets = 4096
    weights = spark.range(n_buckets).select(
        F.col("id").alias("feature"),
        (
            (
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 2001
                - 1000
            )
            / 1000.0
        ).alias("weight"),
    )
    # the fixture ships as ONE parquet file -> one scan task; spread the
    # hash/explode work across cores (a real corpus arrives pre-split, so
    # production callers skip this — the shuffle is the fixture's 1.5 MB
    # of text). Partitioning by doc_id also pre-aligns the per-doc agg.
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    out = linear_classifier_score(docs, weights, n_buckets=n_buckets)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_features").cast("long").alias("n_features"),
        F.round("score", 6).alias("score"),
    )


@_register("incremental_neardedup")
def _incremental_neardedup(spark, sf_dir):
    """Persisted fuzzy-dedup probe (operators/incremental.py MinHashIndex):
    docs with doc_id % 3 == 0 are the indexed history, the rest the
    incoming batch; survivors are batch docs whose estimated Jaccard
    (signature agreement) vs every indexed doc stays under 0.5. No SQL
    oracle (xxhash64 minhash — same reason as dedup_minhash); the
    signature/banding legs are oracle-checked via ngram_jaccard_pairs and
    the index mechanics pytest-pinned in tests/test_minhash_index.py."""
    import tempfile

    from mortar_parquet_support_spark.operators.incremental import MinHashIndex

    per_session = _IVF_CACHE.setdefault(spark, {})
    key = ("minhash_idx", sf_dir)
    if key not in per_session:
        idx = MinHashIndex.create(
            spark, tempfile.mkdtemp(prefix="mortar_mh_idx_"), num_perm=64,
            bands=16,
        )
        idx.add(
            _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0),
            id_col="doc_id",
            text_col="text",
        )
        per_session[key] = idx
    batch = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 != 0)
    out = per_session[key].dedup(
        batch, id_col="doc_id", text_col="text", threshold=0.5
    )
    return out.select(F.col("doc_id").cast("long").alias("doc_id"))


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

@_register("bpe_vocab")
def _bpe_vocab(spark, sf_dir):
    """Distributed BPE tokenizer training (operators/bpe.py bpe_train):
    12 merges learned from the documents corpus — the loop runs on the
    word-frequency table, never the corpus. No SQL oracle (iterative
    argmax-update isn't SQL-expressible); training == pure-python
    reference and encode == sequential merge application are
    pytest-pinned (tests/test_bpe.py). Memoized per session: the merge
    list is a model, like the IVF/PQ codebooks."""
    from mortar_parquet_support_spark.operators.bpe import bpe_train

    per_session = _IVF_CACHE.setdefault(spark, {})
    key = ("bpe", sf_dir)
    if key not in per_session:
        per_session[key] = bpe_train(
            _t(spark, sf_dir, "documents"), num_merges=12, min_freq=2
        )
    merges = per_session[key]
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string",
    )


@_register("pca_embed")
def _pca_embed(spark, sf_dir):
    """Distributed PCA fit + projection (operators/embeddings.py): one-pass
    tree-reduced covariance, driver-side eigh of the d x d Gram (a model,
    not data), zero-shuffle Arrow-batched transform. No SQL oracle
    (eigendecomposition); fit==numpy and transform==numpy are pinned in
    tests/test_embeddings.py, so this entry is the rows-only liveness
    check over the real fixture."""
    from mortar_parquet_support_spark.operators.embeddings import (
        pca_fit,
        pca_transform,
    )

    emb = _t(spark, sf_dir, "embeddings")
    model = pca_fit(emb, k=8)
    return pca_transform(emb, model).select(
        "vec_id", "label", F.col("pca").alias("pca8")
    )


@_register(
    "hashed_embed",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS a
      FROM documents
    ), grams AS (
      SELECT doc_id, unnest(a) AS g FROM toks
      UNION ALL
      SELECT doc_id,
             unnest([a[i+1] || ' ' || a[i+2] FOR i IN range(0, len(a)-1)]) AS g
      FROM toks WHERE len(a) >= 2
    ), contrib AS (
      SELECT doc_id,
             ('0x' || substr(md5(g), 1, 8))::BIGINT % 16 AS pos,
             CASE WHEN ('0x' || substr(md5('sign:' || g), 1, 15))::BIGINT % 2 = 1
                  THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS sgn
      FROM grams
    ), agg AS (
      SELECT doc_id, pos, sum(sgn) AS v, count(*) AS c
      FROM contrib GROUP BY 1, 2
    ), n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams FROM agg GROUP BY 1)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(n.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(p AS INT) AS pos,
           CAST(coalesce(a.v, 0) AS DOUBLE) AS val
    FROM documents d
    CROSS JOIN range(16) t(p)
    LEFT JOIN n ON n.doc_id = d.doc_id
    LEFT JOIN agg a ON a.doc_id = d.doc_id AND a.pos = p
    """,
)
def _hashed_embed(spark, sf_dir):
    """Signed-feature-hashing text embedder (operators/embeddings.py
    hashed_embedding, dim=16, unnormalized so coordinates are exact
    integer-valued doubles): the model-free bridge from the documents
    table into the vector stack. Emitted LONG (doc_id, pos, val) via
    posexplode so every coordinate — position hash, sign hash, collision
    sums, zero-vector docs — is value-hashed against DuckDB."""
    from mortar_parquet_support_spark.operators.embeddings import (
        hashed_embedding,
    )

    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    out = hashed_embedding(docs, dim=16, ngram=2, normalize=False)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_grams").cast("long").alias("n_grams"),
        F.posexplode("embedding").alias("pos", "val"),
    )


@_register(
    "contamination_score",
    """
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 5 THEN list_distinct(list_transform(
                    range(1, len(w) - 5 + 2),
                    i -> array_to_string(list_slice(w, i, i + 4), ' ')))
                  ELSE [array_to_string(w, ' ')] END AS g
      FROM words
    ),
    eval_grams AS (
      SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 97 = 1
    ),
    cg AS (
      SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 97 <> 1
    ),
    agg AS (
      SELECT doc_id,
             count(*) AS n_grams,
             count(CASE WHEN gram IN (SELECT gram FROM eval_grams)
                        THEN 1 END) AS n_cont
      FROM cg WHERE gram <> '' GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(a.n_cont, 0) AS BIGINT) AS n_contaminated,
           ROUND(CAST(a.n_cont AS DOUBLE) / a.n_grams, 6) AS contamination
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 1) d
    LEFT JOIN agg a USING (doc_id)
    """,
)
def _contamination_score(spark, sf_dir):
    """Scored decontamination (operators/curation.py contamination_score):
    per corpus doc, the fraction of its distinct word 5-grams found in the
    eval slice (doc_id%97==1 stands in for the benchmark) — the graded
    sibling of the binary decontaminate entry, same broadcast-eval /
    one-corpus-scan shape. The ratio is exact (integer counts divided
    once) so ROUND(...,6) agrees across engines; shingle-less docs report
    NULL contamination on both sides."""
    from mortar_parquet_support_spark.operators.curation import (
        contamination_score,
    )

    docs = _t(spark, sf_dir, "documents")
    out = contamination_score(
        docs.filter(F.col("doc_id") % 97 != 1),
        docs.filter(F.col("doc_id") % 97 == 1),
        id_col="doc_id",
        text_col="text",
        ngram_words=5,
    )
    return out.select(
        "doc_id", "n_grams", "n_contaminated",
        F.round("contamination", 6).alias("contamination"),
    )


@_register(
    "canonical_urls",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CASE doc_id % 6
             WHEN 0 THEN 'https://' || source || '.example.com/Docs/'
                         || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
             WHEN 1 THEN 'http://' || source || '.example.com/'
             WHEN 2 THEN 'https://' || source || '.example.com/a/b?UP=1&a=2'
             WHEN 3 THEN 'http://' || lower(source) || '.example.com/Mixed/'
                         || CAST(doc_id AS VARCHAR)
             WHEN 4 THEN 'https://' || source || '.example.com/'
             ELSE NULL
           END AS canonical_url
    FROM documents
    """,
)
def _canonical_urls(spark, sf_dir):
    """Crawl URL canonicalization (operators/curation.py
    canonicalize_url): six synthesized variants per doc exercise case
    folding, www/default-port/fragment strip, tracking-param removal,
    query sort, and the trailing-slash + bare-host rules; the oracle
    derives the expected canonical string per variant independently
    (expected-by-construction), so every branch is value-hashed."""
    from mortar_parquet_support_spark.operators.curation import (
        canonicalize_url,
    )

    docs = _t(spark, sf_dir, "documents")
    v = F.col("doc_id") % 6
    host = F.concat(F.col("source"), F.lit(".example.com"))
    raw = (
        F.when(v == 0, F.concat(
            F.lit("HTTPS://WWW."), F.upper(host), F.lit(":443/Docs/"),
            F.col("doc_id").cast("string"),
            F.lit("/?b=2&a=1&utm_source=feed&fbclid=x#sec"),
        ))
        .when(v == 1, F.concat(F.lit("http://"), host, F.lit(":80")))
        .when(v == 2, F.concat(
            F.lit("https://www."), host, F.lit("/a/b/?a=2&UP=1&UTM_CAMPAIGN=c#f"),
        ))
        .when(v == 3, F.concat(
            F.lit("HTTP://"), F.upper(host), F.lit("/Mixed/"),
            F.col("doc_id").cast("string"),
        ))
        .when(v == 4, F.concat(F.lit("https://"), host, F.lit("/?gclid=z")))
        .otherwise(F.concat(F.lit("no-scheme-"), F.col("doc_id").cast("string")))
    )
    return docs.select(
        "doc_id", canonicalize_url(raw).alias("canonical_url")
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

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "lang",
        F.explode(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda w: w != "")
        ).alias("word"),
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
    "similarity_join",
    """
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    sets AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
                    range(1, len(w) - 3 + 2),
                    i -> array_to_string(list_slice(w, i, i + 2), ' ')))
                  ELSE [array_to_string(list_filter(w, x -> x <> ''), ' ')]
             END AS g
      FROM words
    )
    SELECT id_a, id_b, ROUND(jac, 6) AS jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CASE WHEN len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) > 0
                  THEN CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                       / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
                  ELSE 1.0 END AS jac
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    ) WHERE jac >= 0.4
    """,
)
def _similarity_join(spark, sf_dir):
    """EXACT all-pairs set-similarity join via prefix filtering
    (operators/dedup.py similarity_join; Bayardo et al. WWW'07): every
    doc pair with word-3-shingle Jaccard >= 0.4, zero recall loss, no
    all-pairs comparison — candidates come from an equi-join on
    frequency-ordered shingle PREFIXES + a length band, then the exact
    verify. The oracle IS the brute-force cross join, so the filter's
    losslessness is value-hashed every round (also pytest-pinned vs an
    in-Spark brute force).

    Fixture caveat: the synthetic corpus draws from a ~31-word
    vocabulary, which is the prefix filter's ADVERSARIAL case — at
    t=0.4 prefixes are ~60% of each set and almost every token is hot,
    so candidates approach all-pairs (~21 s at sf0.1; the hard gate runs
    at sf0.01). Real corpora have heavy-tailed vocabularies, which is
    exactly what frequency-ascending prefixes exploit; for high-overlap
    thresholds (t >= 0.8, the dedup regime) prefixes shrink to ~20%."""
    from mortar_parquet_support_spark.operators.dedup import similarity_join

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = similarity_join(
        docs, id_col="doc_id", text_col="text", threshold=0.4
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


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


@_register("train_classifier")
def _train_classifier(spark, sf_dir):
    """Distributed full-batch logistic training (operators/text.py
    train_linear_classifier — the TRAINING half of linear_classifier's
    serving shape, same tokenizer/grams/mean-pooled model): 4 GD
    iterations learning 'is this document English' from the lang column.
    Rows-only (iterative float training is not SQL-expressible); the
    update rule is pinned bit-for-bit against a numpy reference and the
    trainer->scorer round-trip reaches full separable-data accuracy in
    tests/test_classifier.py. Output: one row per learned feature with
    the weight rounded for display stability."""
    from mortar_parquet_support_spark.operators.text import (
        train_linear_classifier,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("lang") == "en").cast("int").alias("y")
    )
    w, bias = train_linear_classifier(
        docs, label_col="y", id_col="doc_id", text_col="text",
        n_buckets=1 << 16, ngram=1, iters=4, lr=1.0,
    )
    return w.select(
        "feature", F.round("weight", 6).alias("weight"),
        F.round(F.lit(bias), 6).alias("bias"),
    )


@_register(
    "url_dedup",
    """
    WITH canon AS (
      SELECT doc_id,
             CASE doc_id % 6
               WHEN 0 THEN 'https://' || source || '.example.com/Docs/'
                           || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
               WHEN 1 THEN 'http://' || source || '.example.com/'
               WHEN 2 THEN 'https://' || source || '.example.com/a/b?UP=1&a=2'
               WHEN 3 THEN 'http://' || lower(source) || '.example.com/Mixed/'
                           || CAST(doc_id AS VARCHAR)
               WHEN 4 THEN 'https://' || source || '.example.com/'
               ELSE NULL
             END AS canonical_url
      FROM documents
    )
    SELECT doc_id, canonical_url FROM (
      SELECT doc_id, canonical_url,
             ROW_NUMBER() OVER (PARTITION BY canonical_url ORDER BY doc_id) AS rn
      FROM canon WHERE canonical_url IS NOT NULL
    ) WHERE rn = 1
    UNION ALL
    SELECT doc_id, canonical_url FROM canon WHERE canonical_url IS NULL
    """,
)
def _url_dedup(spark, sf_dir):
    """URL-keyed crawl dedup (operators/curation.py dedup_by_url) over
    the same six synthesized variants as canonical_urls. Duplicates are
    real: within each variant, every doc of a SOURCE canonicalizes to the
    same key (e.g. all doc_id%6==1 rows of src7 collapse to
    http://src7.example.com/), so the keep rule genuinely fires. Keep =
    lowest doc_id per canonical key; keyless rows (variant 5 — no
    scheme) pass through untouched. The oracle replays the keep rule on
    expected-by-construction canonical strings."""
    from mortar_parquet_support_spark.operators.curation import dedup_by_url

    docs = _t(spark, sf_dir, "documents")
    v = F.col("doc_id") % 6
    host = F.concat(F.col("source"), F.lit(".example.com"))
    raw = (
        F.when(v == 0, F.concat(
            F.lit("HTTPS://WWW."), F.upper(host), F.lit(":443/Docs/"),
            F.col("doc_id").cast("string"),
            F.lit("/?b=2&a=1&utm_source=feed&fbclid=x#sec"),
        ))
        .when(v == 1, F.concat(F.lit("http://"), host, F.lit(":80")))
        .when(v == 2, F.concat(
            F.lit("https://www."), host, F.lit("/a/b/?a=2&UP=1&UTM_CAMPAIGN=c#f"),
        ))
        .when(v == 3, F.concat(
            F.lit("HTTP://"), F.upper(host), F.lit("/Mixed/"),
            F.col("doc_id").cast("string"),
        ))
        .when(v == 4, F.concat(F.lit("https://"), host, F.lit("/?gclid=z")))
        .otherwise(F.concat(F.lit("no-scheme-"), F.col("doc_id").cast("string")))
    )
    out = dedup_by_url(
        docs.select("doc_id", raw.alias("url")),
        url_col="url",
        order_by=[F.col("doc_id")],
    )
    return out.select("doc_id", "canonical_url")


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
    "phrase_search",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), hits AS (
      SELECT doc_id,
             len(list_filter(range(1, len(w) - 1 + 1),
                 i -> w[i] = 'table' AND w[i + 1] = 'table')) AS n_occurrences
      FROM toks WHERE len(w) >= 2
    )
    SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM hits WHERE n_occurrences > 0
    """,
)
def _phrase_search(spark, sf_dir):
    """Exact phrase matching over a positional inverted index
    (operators/search.py build_positional_index + phrase_search): docs
    containing consecutive tokens 'table table', with OVERLAPPING
    occurrence counts ('table table table' counts 2). The Spark side
    probes token-pruned postings and groups (doc, anchor) — never
    rescanning text; the oracle slides a window over the tokenized
    documents directly, so the index path is value-hashed against the
    direct definition."""
    from mortar_parquet_support_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )

    docs = _t(spark, sf_dir, "documents")
    idx = build_positional_index(docs, id_col="doc_id", text_col="text")
    return phrase_search(idx, "table table", id_col="doc_id")


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


@_register("tokenize_and_pack")
def _tokenize_and_pack(spark, sf_dir):
    """End-to-end tokenize-and-pack (pipelines/tokenize.py): BPE merges
    trained on the documents corpus, every doc encoded to its EXACT token
    cost under that vocabulary, then packed into 512-token bins
    (sharded running sums). Rows-only (the trained merges are a model;
    each composed stage is independently pinned — bpe train/encode vs a
    python reference, pack_sequences vs its DuckDB oracle); the
    composition contract (bin budgets respected, every in-budget doc
    packed exactly once) is pytest-pinned."""
    from mortar_parquet_support_spark.pipelines.tokenize import (
        tokenize_and_pack,
    )

    docs = _t(spark, sf_dir, "documents")
    return tokenize_and_pack(
        docs, vocab_merges=12, budget=512, shards=8
    )


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
    "hard_negatives",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 3
    ), pos AS (
      SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
                            (CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
                            (CAST(2 AS BIGINT), CAST(0 AS BIGINT)))
        t(query_id, pos_id)
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(
               list_dot_product(q.qv, e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))), 6
             ) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ), kept AS (
      SELECT s.* FROM scored s
      LEFT JOIN pos p
        ON s.query_id = p.query_id AND s.neighbor_id = p.pos_id
      WHERE p.query_id IS NULL
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM kept
    ) WHERE rank <= 5
    """,
)
def _hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining (operators/similarity.py
    hard_negatives): top-5 most-similar corpus vectors per query,
    excluding the query and its positive. Same rounded-overfetch
    mitigation as knn_cosine: mine 10 raw, re-rank on the 6-dp rounded
    cosine with the neighbor-id tie-break, cut to 5 — so a raw-rank
    5/6 pair that rounds equal selects identically on both engines."""
    from mortar_parquet_support_spark.operators.similarity import (
        hard_negatives,
    )

    emb = _t(spark, sf_dir, "embeddings")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "query_id long, pos_id long"
    )
    raw = hard_negatives(emb, pairs, k=10, overfetch=14)
    rounded = raw.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "neighbor_id", "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


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


# np.round(x, 9) replayed exactly in SQL: the kernel computes
# rint(x * 1e9) / 1e9 in float64 with HALF-EVEN rint — NOT decimal
# half-up, so a plain ROUND(x, 9) can disagree whenever the scaled
# product lands on (or within a multiply-ulp of) an exact half. The
# emulation binds y = x * 1e9 and fy = floor(y) (both the identical
# IEEE ops numpy performs; y - fy is exact by Sterbenz for |y| >= 0.5,
# and the sub-5e-10 tail can only matter ON a half boundary) and
# applies half-even by parity of fy. Used for the MMR kernel's
# per-step score and pairwise-similarity rounds.
_NP_RINT9 = (
    "(CASE WHEN (y - fy) > 0.5 OR ((y - fy) = 0.5 "
    "AND CAST(fy AS BIGINT) % 2 <> 0) "
    "THEN fy + 1 ELSE fy END) / 1e9"
)


@_register(
    "mmr_rerank",
    f"""
    WITH RECURSIVE q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 3
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             e.embedding::DOUBLE[] AS ev,
             ROUND(
               list_dot_product(q.qv, e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))), 6
             ) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ), cand AS (
      SELECT query_id, neighbor_id, ev, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rn FROM scored WHERE cosine IS NOT NULL
      ) WHERE rn <= 15
    ), sims AS (
      -- all pairwise candidate similarities, rounded the kernel's way
      SELECT query_id, cid, pid, {_NP_RINT9} AS s
      FROM (
        SELECT query_id, cid, pid, sraw * 1e9 AS y,
               floor(sraw * 1e9) AS fy
        FROM (
          SELECT c.query_id, c.neighbor_id AS cid, p.neighbor_id AS pid,
                 list_dot_product(c.ev, p.ev) /
                 (sqrt(list_dot_product(c.ev, c.ev)) *
                  sqrt(list_dot_product(p.ev, p.ev))) AS sraw
          FROM cand c JOIN cand p ON p.query_id = c.query_id
                              AND p.neighbor_id <> c.neighbor_id
        )
      )
    ), walk AS (
      -- the sequential greedy as a recursive CTE: state = picked ids;
      -- each step scores every unpicked candidate with the kernel's
      -- exact arithmetic (0.5*rel - 0.5*max_rounded_sim, np-rounded)
      -- and takes argmax with smallest-id tie-break (min over
      -- [-mmr, id] lists)
      SELECT query_id, CAST(0 AS BIGINT) AS r,
             CAST([] AS BIGINT[]) AS picked,
             CAST(NULL AS BIGINT) AS pick_id,
             CAST(NULL AS DOUBLE) AS pick_mmr
      FROM (SELECT DISTINCT query_id FROM cand)
      UNION ALL
      SELECT query_id, r, list_append(picked, pick_id) AS picked,
             pick_id, pick_mmr
      FROM (
        SELECT query_id, r, picked,
               CAST(min(mkey)[2] AS BIGINT) AS pick_id,
               0.0 - min(mkey)[1] AS pick_mmr
        FROM (
          SELECT query_id, r, picked, neighbor_id,
                 [ 0.0 - ({_NP_RINT9}),
                   CAST(neighbor_id AS DOUBLE) ] AS mkey
          FROM (
            SELECT s.query_id, s.r + 1 AS r, s.picked, s.neighbor_id,
                   (0.5 * s.cosine - 0.5 * coalesce(max(si.s), 0.0))
                     * 1e9 AS y,
                   floor((0.5 * s.cosine
                          - 0.5 * coalesce(max(si.s), 0.0)) * 1e9) AS fy
            FROM (
              SELECT w.query_id, w.r, w.picked, c.neighbor_id, c.cosine
              FROM walk w JOIN cand c ON c.query_id = w.query_id
                   AND NOT list_contains(w.picked, c.neighbor_id)
              WHERE w.r < 5
            ) s
            LEFT JOIN sims si ON si.query_id = s.query_id
                 AND si.cid = s.neighbor_id
                 AND list_contains(s.picked, si.pid)
            GROUP BY s.query_id, s.r, s.picked, s.neighbor_id, s.cosine
          )
        ) GROUP BY query_id, r, picked
      )
    )
    SELECT w.query_id, w.pick_id AS neighbor_id,
           ROUND(c.cosine, 6) + 0.0 AS cosine,
           ROUND(w.pick_mmr, 6) + 0.0 AS mmr,
           CAST(w.r AS INT) AS rank
    FROM walk w JOIN cand c ON c.query_id = w.query_id
         AND c.neighbor_id = w.pick_id
    WHERE w.r >= 1
    """,
)
def _mmr_rerank(spark, sf_dir):
    """MMR diversity re-ranking (operators/search.py mmr_rerank): 15
    cosine candidates per query (vec_id < 3) re-ranked to a diverse
    top-5 at lam=0.5.

    Promoted from rows-only to a full DuckDB oracle (round-10 ask, the
    lttb recursive-CTE technique): candidates are selected on the
    6dp-ROUNDED cosine with id tie-break (overfetch 25 raw, re-rank
    rounded — the knn_cosine mitigation, wider because the cut is at
    15), so the kernel's relevance input is bit-identical on both
    engines; the sequential greedy is a RECURSIVE CTE whose per-step
    argmax replays the kernel exactly — same three IEEE ops for
    np.round (scale, HALF-EVEN rint emulated by floor parity, unscale),
    same 0.5*rel - 0.5*max_sim operand order on bit-identical rounded
    inputs, same first-max-wins tie-break as min([-mmr, id]). Output
    mmr/cosine get + 0.0 on both sides so a -0.0 canonical form can't
    hash-mismatch (Spark's BigDecimal round normalizes zero signs,
    DuckDB keeps them). Verified identical at sf0.001 / sf0.01 /
    sf0.1."""
    from mortar_parquet_support_spark.operators.search import mmr_rerank
    from mortar_parquet_support_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    raw = cosine_topk(emb, queries, k=25)
    w15 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    cand = (
        raw.select(
            "query_id", "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
        .withColumn("__rn", F.row_number().over(w15))
        .filter(F.col("__rn") <= 15)
        .drop("__rn")
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
    )
    return mmr_rerank(cand, k=5, lam=0.5).select(
        "query_id", "neighbor_id",
        (F.round("cosine", 6) + F.lit(0.0)).alias("cosine"),
        (F.round("mmr", 6) + F.lit(0.0)).alias("mmr"), "rank",
    )
