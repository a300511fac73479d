"""Int8 scalar quantization (SQ8) for embedding columns.

Driver north-star extension (similarity search at scale): at 100 TB of
float embeddings, int8 codes are 4-8x smaller (dim bytes per vector vs
dim*4/dim*8), which is the difference between a corpus that fits executor
memory / page cache and one that doesn't. The classic vector-store memory
tier (e.g. FAISS's ScalarQuantizer recipe — public knowledge, reimplemented
on DataFrame expressions):

- ``sq8_train``       one corpus scan -> per-dimension (lo, hi) ranges;
- ``sq8_quantize``    in-row code assignment, zero shuffle, array<tinyint>;
- ``sq8_dequantize``  the inverse mapping (reconstruction);
- ``sq8_topk``        asymmetric search: full-precision queries against
                      dequantized codes, optional exact re-rank of an
                      overfetched candidate pool against the full-precision
                      corpus (semi-join pruned — candidates only).

All arithmetic is element-wise JVM expressions (``zip_with`` over literal
parameter arrays) — deterministic, engine-portable (the driver entry
``knn_sq8`` is oracle-checked against the same formulas in DuckDB), and
never a UDF. Quantization error is bounded per dimension by half a step:
|v' - v| <= (hi-lo)/255/2 (pytest-pinned).

``IvfSq8Index`` composes the two tiers with IvfIndex
(operators/similarity.py): assign cells on full precision at build time,
store SQ8 codes (+ precomputed dequantized norms) per cell, probe with
asymmetric scoring + optional exact re-rank — the standard IVF+SQ
serving stack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mortar_parquet_support_spark.functions import cosine_similarity


def sq8_train(df: DataFrame, *, vec_col: str = "embedding") -> tuple[list[float], list[float]]:
    """Per-dimension (lo, hi) over the corpus in ONE scan.

    posexplode -> groupBy(pos) partial-aggregates map-side, so the shuffle
    carries ``dim`` rows per input partition — never the corpus. The
    collected result is dim floats x2 (small by contract: embedding dims
    are 10^2-10^4)."""
    mm = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    )
    mm.sort(key=lambda r: r["pos"])
    return [float(r["lo"]) for r in mm], [float(r["hi"]) for r in mm]


def _lit_array(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def sq8_quantize(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    lo: list[float],
    hi: list[float],
    out_col: str = "codes",
) -> DataFrame:
    """``code_i = clamp(round((v_i - lo_i) * scale_i) - 128, -128, 127)``
    with ``scale_i = 255/(hi_i - lo_i)`` (flat dimensions code to -128).

    The scale is PRE-divided (a literal array), so the per-element
    arithmetic is one subtract + one multiply — and, critically for the
    oracle, the exact same IEEE operation sequence DuckDB runs when given
    the same scale array. Zero shuffle; output is array<tinyint>: dim
    bytes per vector."""
    scale = [(255.0 / (h - l)) if h > l else 0.0 for l, h in zip(lo, hi)]
    shifted = F.zip_with(
        F.col(vec_col).cast("array<double>"), _lit_array(lo), lambda v, l: v - l
    )
    # clamp in the DOUBLE domain, cast after: saved (lo, hi) params applied
    # to a drifted/corrupt batch can put round(d*s) far outside int range,
    # and under ANSI mode (Spark 4 default) the int cast would THROW
    # (CAST_OVERFLOW) instead of saturating — the clamp exists to saturate.
    # For in-range values the result is bit-identical to the int-domain
    # clamp (round() output is integral, so the double arithmetic is exact).
    codes = F.zip_with(
        shifted,
        _lit_array(scale),
        lambda d, s: F.greatest(
            F.lit(-128.0),
            F.least(F.lit(127.0), F.round(d * s) - F.lit(128.0)),
        ).cast("tinyint"),
    )
    return df.withColumn(out_col, codes)


def sq8_dequantize(
    codes_col: Column | str, *, lo: list[float], hi: list[float]
) -> Column:
    """Reconstruction: ``v'_i = (code_i + 128) * step_i + lo_i`` with
    ``step_i = (hi_i - lo_i)/255`` (pre-divided literal, same reason as
    sq8_quantize). |v' - v| <= step/2 per dimension."""
    step = [((h - l) / 255.0) if h > l else 0.0 for l, h in zip(lo, hi)]
    c = codes_col if isinstance(codes_col, Column) else F.col(codes_col)
    scaled = F.zip_with(
        c,
        _lit_array(step),
        lambda code, s: (code.cast("double") + F.lit(128.0)) * s,
    )
    return F.zip_with(scaled, _lit_array(lo), lambda d, l: d + l)


def _exact_rerank(
    top: DataFrame,
    q: DataFrame,
    rerank_corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Full-precision re-rank of overfetched (query_id, neighbor_id)
    candidates: broadcast semi-prune to candidate vectors (only they are
    ever read at full width), exact cosine, one per-query ranking window.
    The SINGLE rerank implementation — sq8_topk and IvfSq8Index.topk both
    route here so the tie-break (cosine desc, neighbor_id asc) can never
    diverge between them. ``q`` is the (query_id, q_vec) frame.

    ``top`` is materialized first: it is consumed TWICE (the candidate-id
    broadcast and the exact join), and the candidate side feeds a
    BroadcastExchange that cannot reuse the other reference's exchanges —
    left lazy, the whole approximate pipeline (corpus scan + scoring +
    ranking window) would execute twice per call. The frame is
    k·overfetch rows per query — always small, always safe to cut."""
    from mortar_parquet_support_spark.functions import materialize

    top = materialize(top)
    cand_ids = top.select(F.col("neighbor_id").alias(id_col)).distinct()
    full = rerank_corpus.join(F.broadcast(cand_ids), id_col, "left_semi").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("f_vec"),
    )
    exact = (
        top.select("query_id", "neighbor_id")
        .join(full, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_vec"), F.col("f_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


class IvfSq8Index:
    """IVF + SQ8 — the standard memory-tiered vector store: cells come
    from a full-precision ``IvfIndex`` build (operators/similarity.py),
    but the per-cell corpus is stored as int8 codes (+ a precomputed
    dequantized norm), 4-8x smaller than the float vectors. Probing is
    asymmetric: full-precision queries against dequantized codes in the
    ``nprobe`` nearest cells, with an optional overfetch + full-precision
    re-rank (semi-join pruned to candidates) that recovers exact results.

    ``build`` pays one extra pass over the ALREADY-ASSIGNED corpus frame
    (quantize + norm — no re-scan, no re-clustering); the full-precision
    assignment is dropped afterwards unless the caller keeps the IvfIndex.
    """

    def __init__(self, ivf, lo: list[float], hi: list[float], coded: DataFrame, *, persisted: bool):
        self._ivf = ivf
        self.lo = lo
        self.hi = hi
        self.coded = coded  # (neighbor_id, list_id, codes, c_qnorm)
        self._persisted = persisted

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_list: int = 16,
        iters: int = 1,
        seed: int = 42,
        persist: bool = True,
    ) -> "IvfSq8Index":
        from mortar_parquet_support_spark.operators.similarity import IvfIndex

        ivf = IvfIndex.build(
            corpus, id_col=id_col, vec_col=vec_col, n_list=n_list,
            iters=iters, seed=seed, persist=False,
        )
        lo, hi = sq8_train(corpus, vec_col=vec_col)
        quantized = sq8_quantize(
            ivf.assigned, vec_col="c_vec", lo=lo, hi=hi, out_col="codes"
        )
        from mortar_parquet_support_spark.functions import vector_norm

        # the probe divides by the norm of the DEQUANTIZED vector — pay it
        # once at build (same trick as IvfIndex's c_norm), so each probe
        # pair costs one fold (the dot), not three
        coded = quantized.select(
            "neighbor_id",
            "list_id",
            "codes",
            vector_norm(sq8_dequantize(F.col("codes"), lo=lo, hi=hi)).alias(
                "c_qnorm"
            ),
        )
        if persist:
            coded = coded.persist()
            coded.count()
        return cls(ivf, lo, hi, coded, persisted=persist)

    def topk(
        self,
        queries: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 10,
        nprobe: int = 4,
        rerank_corpus: DataFrame | None = None,
        overfetch: int = 3,
    ) -> DataFrame:
        """(query_id, neighbor_id, cosine, rank): asymmetric scoring over
        the nprobe nearest cells; ``nprobe = n_list`` visits every cell.
        With ``rerank_corpus``, k*overfetch candidates re-rank against the
        full-precision vectors."""
        from mortar_parquet_support_spark.functions import dot_product, vector_norm

        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
        )
        probes = self._ivf._probes(q, nprobe).withColumn(
            "q_norm", vector_norm(F.col("q_vec"))
        )
        joined = self.coded.join(F.broadcast(probes), "list_id").filter(
            F.col("neighbor_id") != F.col("query_id")
        )
        scored = joined.select(
            "query_id",
            "neighbor_id",
            F.try_divide(
                dot_product(
                    F.col("q_vec"),
                    sq8_dequantize(F.col("codes"), lo=self.lo, hi=self.hi),
                ),
                F.col("q_norm") * F.col("c_qnorm"),
            ).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        fetch = k if rerank_corpus is None else k * overfetch
        top = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= fetch)
        )
        if rerank_corpus is None:
            return top
        return _exact_rerank(
            top, q, rerank_corpus, id_col=id_col, vec_col=vec_col, k=k
        )

    def unpersist(self) -> None:
        if self._persisted:
            self.coded.unpersist()
            self._persisted = False

    def save(self, path: str) -> None:
        """Persist to disk (same layout discipline as IvfIndex.save):
        ``<path>/centroids`` (tiny), ``<path>/params`` (one row of
        lo/hi arrays), and ``<path>/coded`` partitioned by ``list_id`` so
        a later ``load(...).topk(...)`` probe reads only its nprobe cell
        directories — and those directories hold int8 codes, so the
        serving footprint is the quantized one end to end."""
        base = path.rstrip("/")
        self._ivf.centroids.write.mode("overwrite").parquet(base + "/centroids")
        spark = self.coded.sparkSession
        from mortar_parquet_support_spark.functions import tiny_frame

        tiny_frame(
            spark, [(self.lo, self.hi)], "lo array<double>, hi array<double>"
        ).write.mode("overwrite").parquet(base + "/params")
        (
            self.coded.write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(base + "/coded")
        )

    @classmethod
    def load(cls, spark, path: str) -> "IvfSq8Index":
        """Reopen a saved index; codes stay on disk (list_id partitioning
        makes probes prune), persist() explicitly for hot serving."""
        from mortar_parquet_support_spark.operators.similarity import (
            IvfIndex,
            _vec_dim,
        )

        base = path.rstrip("/")
        cents = spark.read.parquet(base + "/centroids")
        dim = _vec_dim(cents, "centroid")
        n = cents.count()
        if dim and n * dim <= IvfIndex.MAX_DRIVER_CELLS:
            cents, cent_rows = IvfIndex._materialize_centroids(spark, cents)
        else:
            cent_rows = None
        row = spark.read.parquet(base + "/params").collect()[0]
        coded = spark.read.parquet(base + "/coded")
        # the inner IvfIndex serves ONLY the probe surface (_probes); its
        # full-precision assigned frame was intentionally not saved — the
        # quantized coded frame IS the corpus here. assigned=None makes
        # that structural: IvfIndex's own scoring/saving methods raise a
        # clear error instead of silently scoring against the wrong frame.
        ivf = IvfIndex(cents, None, persisted=False, cent_rows=cent_rows)
        return cls(ivf, list(row["lo"]), list(row["hi"]), coded, persisted=False)


def sq8_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    *,
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    k: int = 10,
    include_self: bool = False,
    rerank_corpus: DataFrame | None = None,
    overfetch: int = 3,
) -> DataFrame:
    """Asymmetric top-k: full-precision queries scored by cosine against
    the DEQUANTIZED corpus codes. Returns (query_id, neighbor_id, cosine,
    rank); ties broken by neighbor id.

    Scale shape mirrors cosine_topk: broadcast the small query set, scan
    the code corpus ONCE (dim bytes/row instead of dim*4/8 — the whole
    point), rank through one per-query window. With ``rerank_corpus``,
    ``k * overfetch`` approximate candidates per query are joined back to
    the full-precision vectors (broadcast semi-prune: only candidate
    vectors are ever read at full width) and exactly re-ranked to ``k`` —
    the standard two-stage ADC serving shape."""
    from mortar_parquet_support_spark.operators.similarity import cosine_topk

    # the approximate stage IS cosine_topk over the dequantized view —
    # one ranking implementation (tie-break, self-exclusion) to keep in sync
    deq = codes_df.select(
        F.col(id_col),
        sq8_dequantize(F.col(codes_col), lo=lo, hi=hi).alias(vec_col),
    )
    fetch = k if rerank_corpus is None else k * overfetch
    top = cosine_topk(
        deq, queries, id_col=id_col, vec_col=vec_col, k=fetch,
        include_self=include_self,
    )
    if rerank_corpus is None:
        return top
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    return _exact_rerank(
        top, q, rerank_corpus, id_col=id_col, vec_col=vec_col, k=k
    )
