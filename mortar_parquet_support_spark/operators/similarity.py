"""Similarity search over embedding columns (array<float>).

Driver north-star extension (BASELINE.json:6). Two tiers:

- ``cosine_topk``  brute-force exact top-k: broadcast the (small) query set
  against the corpus — one corpus scan, no shuffle except the final top-k
  window. The 100 TB shape: queries are O(1..10^4) rows, the corpus is the
  big side and is never shuffled or materialized.
- ``lsh_topk``     approximate: random-hyperplane signatures bucket the
  corpus once (reusable, persistable); queries probe only their bucket
  (plus optional multi-probe neighbors), then exact-rerank inside buckets.
- ``ivf_topk``     approximate, IVF-flat: partition the corpus into
  ``n_list`` Voronoi cells around centroids (hash-seeded from the corpus,
  optionally Lloyd-refined), probe the ``nprobe`` nearest cells per query,
  exact-rerank inside them. ``nprobe = n_list`` degenerates to exact
  brute force — the recall dial is explicit.

All vector math is JVM-side (``zip_with`` + left-fold ``aggregate`` — the
deterministic summation order makes scores reproducible bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mortar_parquet_support_spark.functions import (
    cosine_from_norms,
    cosine_similarity,
    dot_product,
    vector_norm,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cosine, rank).

    Ties broken by neighbor id (deterministic across engines/runs).
    Degenerate rows — NULL vectors, zero norms, NULL elements — score NULL
    (try_divide in cosine_similarity) and are dropped from the result:
    they have no cosine direction and must never occupy a neighbor slot.
    NULL-ID corpus rows are dropped too: an unaddressable neighbor is
    useless output, and leaving them in made the two paths disagree (the
    include_self filter silently dropped them here while the arrow path's
    id tie-break lexsort crashed on None). Same contract as
    :func:`cosine_topk_arrow`.
    """
    # norms are computed per ROW on each side BEFORE the cross join (r16):
    # the inline cosine_similarity recomputed both norms per PAIR —
    # O(queries * corpus * dim) folds where O((queries + corpus) * dim)
    # suffices. vector_norm shares the fold order, so
    # try_divide(dot, q_norm * c_norm) is bit-identical to the inline
    # formula (the IvfIndex build-time-norm contract).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        vector_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        vector_norm(F.col(vec_col)).alias("c_norm"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        cosine_from_norms(
            F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    # NULL cosines sort last under desc, so real neighbors keep ranks
    # 1..m and the filter only trims degenerate tails
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .filter(F.col("cosine").isNotNull())
    )


def hard_negatives(
    corpus: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "query_id",
    pos_col: str = "pos_id",
    k: int = 5,
    overfetch: "int | None" = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every
    (query, positive) pair, the ``k`` corpus vectors MOST similar to the
    query that are neither the query itself nor any of its positives —
    the negatives that actually teach a bi-encoder something (random
    negatives are trivially separable; the near-misses carry the
    gradient). Returns (``query_id``, ``neighbor_id``, ``cosine``,
    ``rank``), rank 1 = hardest.

    Built on :func:`cosine_topk` (exact brute force — swap in
    :func:`ivf_topk` upstream when the corpus outgrows it; the exclusion
    logic is identical): overfetch, anti-join the pair list, re-rank,
    cut to k. EXACTNESS CONTRACT: overfetch must be >= k + (max
    positives per query) + 1, or a query whose excluded rows crowd the
    overfetched head silently loses a deserving negative. By DEFAULT the
    bound is DERIVED — one tiny aggregate over ``pairs`` (model-sized by
    nature) computes the max per-query fan-out, so multi-positive
    datasets are exact out of the box; pass ``overfetch`` explicitly to
    skip that job when you already know the fan-out (it is validated
    against k only — the contract is then yours). Queries appearing in
    ``pairs`` but not the corpus yield nothing (no vector, no
    neighborhood); NULL/degenerate vectors never rank
    (:func:`cosine_topk`'s contract)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if overfetch is not None:
        over = overfetch
        if over < k + 1:
            raise ValueError(
                f"overfetch must be >= k + 1 (got {over} for k={k})"
            )
    else:
        max_pos = (
            pairs.groupBy(query_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .first()[0]
        )
        over = k + int(max_pos or 0) + 1
    queries = (
        pairs.select(F.col(query_col).alias(id_col))
        .distinct()
        .join(corpus, id_col)
        .select(id_col, vec_col)
    )
    raw = cosine_topk(
        corpus, queries, id_col=id_col, vec_col=vec_col, k=over
    )
    excluded = pairs.select(
        F.col(query_col).alias("query_id"),
        F.col(pos_col).alias("neighbor_id"),
    ).distinct()
    from mortar_parquet_support_spark.plans.hints import maybe_broadcast

    kept = raw.join(
        maybe_broadcast(excluded), ["query_id", "neighbor_id"], "left_anti"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        kept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
    round_to: "int | None" = None,
    overfetch: int = 0,
) -> DataFrame:
    """Vectorized brute-force top-k: same results as :func:`cosine_topk`
    (tested), different physical plan for throughput at scale.

    The query set (small by contract) is collected once and shipped inside
    the ``mapInArrow`` closure as a normalized numpy matrix; each Arrow
    batch of the corpus scores against ALL queries with one float64 matmul
    and emits only its batch-local top-k per query. The shuffle therefore
    carries ``n_batches x n_queries x k`` candidate rows — not the full
    score matrix — and the final window re-rank is tiny. This is the
    partial-aggregation shape applied to top-k: the 100 TB plan stays one
    corpus scan + a negligible shuffle, with the arithmetic in BLAS instead
    of per-element interpreted HOF lambdas (~10x on wide batches).

    Determinism caveat: BLAS picks kernels by matrix geometry, so a score
    can differ from the fold path (and from other batch layouts) by ~1 ulp
    — among semantically tied neighbors, rank order may therefore follow
    those ulps rather than the id tie-break. Within any one batch the
    selection IS deterministic (score desc, id asc — ties at the cut are
    widened and id-sorted, never arbitrarily dropped), and degenerate rows
    (NULL vectors, zero norms, NULL elements) never rank — same contract
    as :func:`cosine_topk`.

    ``round_to``/``overfetch`` make the BLAS path engine-comparable in
    ONE window: with ``round_to`` set, the final ranking orders by the
    JVM-rounded score (emitted as ``cosine``) instead of the raw BLAS
    score, so ulp-level kernel differences cannot reorder the selected
    set; ``overfetch`` widens only the BATCH-LOCAL raw cut by that many
    rows, guarding the case where rounding promotes a row that raw order
    would have dropped at the boundary (a miss needs a single rounded
    tie group spanning more than ``overfetch`` raw ranks past the cut
    within one batch). This replaces the old external re-rank (a second
    window over the partial results) with zero extra passes.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    from pyspark.sql import types as T

    q_id_type = queries.schema[id_col].dataType
    c_id_type = corpus.schema[id_col].dataType
    q_arrow = to_arrow_type(q_id_type)
    out_schema = T.StructType(
        [
            T.StructField("query_id", q_id_type, False),
            T.StructField("neighbor_id", c_id_type, False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )
    q_rows = [r for r in queries.select(id_col, vec_col).collect() if r[1] is not None]
    if q_rows:
        # degenerate queries (zero norm, NULL/NaN elements) have no cosine
        # direction: the exact path scores every pair NULL and emits
        # nothing for them, so drop them here too
        qm_all = np.asarray(
            [[np.nan if v is None else float(v) for v in r[1]] for r in q_rows],
            dtype=np.float64,
        )
        qn = np.linalg.norm(qm_all, axis=1)
        keep = np.isfinite(qn) & (qn > 0)
        q_rows = [r for r, kf in zip(q_rows, keep) if kf]
        qm = qm_all[keep] / qn[keep, None]
    if not q_rows:
        # schema must match the non-empty case exactly (actual id types,
        # not hardcoded longs) or a unionByName across query batches fails
        # only on the empty one
        from mortar_parquet_support_spark.functions import tiny_frame

        return tiny_frame(
            corpus.sparkSession, [],
            out_schema.add(T.StructField("rank", T.IntegerType(), False)),
        )
    q_ids = [r[0] for r in q_rows]

    def score(batches):
        import pyarrow.compute as pc

        for batch in batches:
            vec_arr = batch.column(1)
            if vec_arr.null_count or batch.column(0).null_count:
                # ListArray.flatten() silently DROPS null list slots — one
                # NULL embedding would shift every later vector's elements
                # in the reshape (silent mis-scoring). Degenerate rows never
                # rank (exact path: NULL cosine), so drop them up front.
                # NULL ids go too (exact-path contract): a None in ids_np
                # would make the tie-break lexsort an object-array compare
                # that raises TypeError mid-query.
                batch = batch.filter(
                    pc.and_(pc.is_valid(vec_arr), pc.is_valid(batch.column(0)))
                )
                vec_arr = batch.column(1)
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0)
            lens = pc.list_value_length(vec_arr).to_numpy()
            if (lens != lens[0]).any():
                raise ValueError(
                    "ragged embedding arrays in corpus batch: all vectors "
                    "must share one dimensionality"
                )
            flat = vec_arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            mat = flat.reshape(n, int(lens[0]))
            norms = np.linalg.norm(mat, axis=1)
            # zero-norm rows and rows with NULL elements (NaN after
            # to_numpy) score -inf and are skipped at emission — the exact
            # path's NULL-cosine exclusion, batch-side
            valid = np.isfinite(norms) & (norms > 0)
            unit = np.zeros_like(mat)
            unit[valid] = mat[valid] / norms[valid, None]
            sims = unit @ qm.T  # (n, n_queries)
            ids_py = ids.to_pylist()
            ids_np = np.asarray(ids_py)
            out_q, out_n, out_c = [], [], []
            kk = min(k + overfetch, n)
            for j, qid in enumerate(q_ids):
                col = np.where(valid, sims[:, j], -np.inf)
                # fetch the batch-local top by (cosine desc, id asc) — a
                # plain argpartition makes an ARBITRARY pick among rows
                # tied at the cut, dropping candidates the global
                # (cosine desc, neighbor_id asc) window would keep and
                # changing results under repartitioning. Partition by
                # score, widen to ALL rows tied at the boundary, then
                # lexsort the tied set to apply the id tie-break.
                fetch = kk if include_self else min(kk + 1, n)
                if fetch >= n:
                    tied = np.arange(n)
                else:
                    part = np.argpartition(-col, fetch - 1)[:fetch]
                    tied = np.nonzero(col >= col[part].min())[0]
                order = np.lexsort((ids_np[tied], -col[tied]))
                cand = tied[order[:fetch]]
                for i in cand:
                    if not np.isfinite(col[int(i)]):
                        continue
                    nid = ids_py[int(i)]
                    if not include_self and nid == qid:
                        continue
                    out_q.append(qid)
                    out_n.append(nid)
                    out_c.append(float(col[int(i)]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_q, type=q_arrow),
                    pa.array(out_n, type=ids.type),
                    pa.array(out_c, type=pa.float64()),
                ],
                names=["query_id", "neighbor_id", "cosine"],
            )

    partial = corpus.select(F.col(id_col), F.col(vec_col)).mapInArrow(score, out_schema)
    if round_to is not None:
        partial = partial.withColumn("cosine", F.round("cosine", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _vec_dim(corpus: DataFrame, vec_col: str) -> int:
    """Vector dimensionality probed from one NON-NULL row (arrays are not
    fixed-width in Spark's type system; a NULL first row would misreport
    dim 0 and misroute the centroid-size decision); 0 for an empty or
    all-NULL corpus."""
    row = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    return int(row["d"]) if row is not None and row["d"] is not None else 0


# widest embedding dim we assume without probing; n_list small enough that
# even this keeps n_list*dim under the driver bound skips the probe job
_MAX_ASSUMED_DIM = 1 << 16


def _centroids_fit_driver(corpus: DataFrame, vec_col: str, n_list: int) -> bool:
    """Decide small-vs-big centroid handling BEFORE any driver collect.
    When ``n_list`` alone guarantees the bound for any realistic dim, no
    probe job runs at all; otherwise one limit-1 scan reads the dim."""
    if n_list * _MAX_ASSUMED_DIM <= IvfIndex.MAX_DRIVER_CELLS:
        return True
    dim = _vec_dim(corpus, vec_col)
    return bool(dim) and n_list * dim <= IvfIndex.MAX_DRIVER_CELLS


def ivf_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_list: int = 16,
    iters: int = 1,
    seed: int = 42,
    _small: bool | None = None,
) -> DataFrame:
    """(list_id, centroid) centroid table for an IVF index.

    Seeding is deterministic: the ``n_list`` corpus vectors with the
    smallest ``xxhash64(id, seed)`` become the initial centroids (a seeded
    uniform sample — no ``rand()``, reruns identical). ``iters`` Lloyd
    steps refine them: assign every vector to its nearest centroid, then
    recompute each centroid as the element-wise mean.

    Scale shape: centroids are O(n_list * dim) and small-by-contract, so
    within ``IvfIndex.MAX_DRIVER_CELLS`` they live on the driver — each
    Lloyd iteration is then ONE shuffle-free Arrow-batched corpus scan
    (closure-broadcast centroid matrix, BLAS matmul per batch) emitting
    per-batch (list_id, n, sum) partials that the driver reduces. Above
    the bound, the fully distributed fallback (broadcast-join assignment,
    two-stage posexplode mean reassembly) runs instead.
    """
    spark = corpus.sparkSession
    schema = "list_id: int, centroid: array<double>"
    # NULL embeddings must neither seed a centroid nor enter assignment
    # (the small path filters again internally; the big path relies on this)
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # decide the path BEFORE any driver collect — the big path must never
    # pull n_list * dim cells into the driver
    if _small is None:
        _small = _centroids_fit_driver(corpus, vec_col, n_list)
    if _small:
        cent_rows = _centroids_small_rows(
            corpus, id_col=id_col, vec_col=vec_col, n_list=n_list,
            iters=iters, seed=seed,
        )
        from mortar_parquet_support_spark.functions import tiny_frame

        return tiny_frame(spark, cent_rows, schema)
    # Big-centroid path (n_list * dim beyond the driver bound): fully
    # distributed — window-numbered seeds, broadcast-join assignment,
    # two-stage mean reassembly; nothing centroid-sized touches the driver.
    seeds = (
        corpus.select(
            F.col(vec_col).cast("array<double>").alias("centroid"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("_h"),
        )
        .orderBy("_h")
        .limit(n_list)
    )
    # n_list rows: the single-partition window is trivially cheap; pmod
    # keeps the partition key non-foldable so Catalyst doesn't strip it.
    one_part = F.pmod(F.col("_h"), F.lit(1))
    cents = seeds.select(
        (F.row_number().over(Window.partitionBy(one_part).orderBy("_h")) - 1).alias(
            "list_id"
        ),
        F.col("centroid"),
    )
    for _ in range(iters):
        bc = F.broadcast(cents)
        assigned = _assign_lists(vecs, bc)
        by_dim = (
            assigned.select("list_id", F.posexplode(F.col("v").cast("array<double>")).alias("dim", "x"))
            .groupBy("list_id", "dim")
            .agg(F.avg("x").alias("m"))
        )
        cents = (
            by_dim.groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dims"))
            .select(
                "list_id",
                F.transform(F.col("dims"), lambda s: s["m"]).alias("centroid"),
            )
        )
    return cents


def _centroids_small_rows(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_list: int,
    iters: int,
    seed: int,
) -> list:
    """Driver-resident centroid rows ``[(list_id, vector), ...]`` for the
    small path (n_list * dim within ``IvfIndex.MAX_DRIVER_CELLS``).
    Separated from :func:`ivf_centroids` so ``IvfIndex.build`` can consume
    the rows DIRECTLY — wrapping them in a local DataFrame only to collect
    it again was a measurable fixed cost per build."""
    import numpy as np

    # NULL embeddings have no position in the space: they must not seed a
    # centroid (None -> TypeError below) and must not reach the Arrow
    # Lloyd scan (_vec_matrix rejects null slots). Callers that filter
    # already make this a no-op.
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    seeds = (
        corpus.select(
            F.col(vec_col).cast("array<double>").alias("centroid"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("_h"),
        )
        .orderBy("_h")
        .limit(n_list)
        .collect()
    )
    # (list_id, vector) on the driver — O(n_list * dim) by the bound
    cent_rows = [(i, list(r["centroid"])) for i, r in enumerate(seeds)]
    # Tight Lloyd loop: each iteration is ONE shuffle-free corpus scan
    # emitting per-batch (list_id, n, sum) partials; the driver sums the
    # O(n_batches * n_list) partials and divides. Partials are reduced
    # in (list_id, collect order), so reruns on the same partitioning
    # are bit-identical.
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    for _ in range(iters):
        parts = _list_partials(vecs, cent_rows).collect()
        acc: dict[int, tuple] = {}
        for r in sorted(parts, key=lambda r: r["list_id"]):
            n0, s0 = acc.get(r["list_id"], (0, 0.0))
            acc[r["list_id"]] = (n0 + r["n"], s0 + np.array(r["s"]))
        # lists that attracted no vectors drop out, same as the
        # distributed groupBy formulation
        cent_rows = [
            (lid, (s / n).tolist()) for lid, (n, s) in sorted(acc.items())
        ]
    return cent_rows


def _cent_matrix(cent_rows: list):
    """(lids int32[L], normalized centroid matrix float64[L,D]) for the
    Arrow-batched passes below."""
    import numpy as np

    lids = np.array([lid for lid, _ in cent_rows], dtype=np.int32)
    cent = np.array([vec for _, vec in cent_rows], dtype=np.float64)
    norms = np.linalg.norm(cent, axis=1)
    norms[norms == 0] = 1.0
    return lids, cent / norms[:, None]


def _vec_matrix(arr, n):
    """(n, dim) float64 matrix from an Arrow list column — flatten +
    to_numpy, no per-element Python objects (same pattern as
    cosine_topk_arrow). NULL or ragged vectors raise: flatten() silently
    DROPS null list slots, so tolerating them here would shift every later
    vector's elements in the reshape and mis-assign silently. IvfIndex
    filters NULL embeddings at build; anything else reaching this point is
    a caller error worth failing loudly on."""
    import numpy as np

    if arr.null_count:
        raise ValueError(
            "NULL embedding rows must be filtered before Arrow matrix "
            "assignment (IvfIndex.build does this on its scan)"
        )
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if n and flat.size % n != 0:
        raise ValueError(
            "ragged embedding arrays: all vectors must share one "
            "dimensionality"
        )
    return flat.reshape(n, flat.size // n)


def _best_lists(batch, lids, cent_unit):
    """argmax-cosine list per row of an Arrow batch (numpy, BLAS matmul).
    ``cent_rows`` are ordered by list_id, so argmax's first-max rule
    reproduces the (cosine desc, list_id asc) tie-break of the join path."""
    import numpy as np

    V = _vec_matrix(batch.column("v"), batch.num_rows)
    vn = np.linalg.norm(V, axis=1)
    vn[vn == 0] = 1.0
    sims = (V / vn[:, None]) @ cent_unit.T
    return lids[np.argmax(sims, axis=1)]


def _assign_lists_arrow(vecs: DataFrame, cent_rows: list) -> DataFrame:
    """Nearest-centroid assignment as a ZERO-shuffle Arrow-batched pass:
    the corpus is scanned once and never moves, each batch matrix-multiplies
    against the closure-broadcast centroid matrix — the 100 TB assignment
    shape (the join+groupBy alternative shuffles the full corpus to group
    by id, and an inlined-literal expression melts codegen once n_list*dim
    grows). Mirrors the repo's knn_cosine_arrow pattern."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    # fresh StructType: .add() would mutate the frame's own schema object
    out_schema = StructType(
        list(vecs.schema.fields) + [StructField("list_id", IntegerType())]
    )

    def fn(batches):
        import pyarrow as pa_

        lids, cent_unit = _cent_matrix(cent_rows)
        for b in batches:
            if b.num_rows == 0:
                continue
            best = _best_lists(b, lids, cent_unit)
            yield b.append_column("list_id", pa_.array(best, pa_.int32()))

    return vecs.mapInArrow(fn, out_schema)


def _list_partials(vecs: DataFrame, cent_rows: list) -> DataFrame:
    """Per-Arrow-batch partial sums for the Lloyd mean update:
    (list_id, n, s[dim]) — one corpus scan, NO shuffle; the driver sums the
    O(n_batches * n_list) partials and divides. Replaces a
    posexplode + two-shuffle aggregate whose result was tiny anyway."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    # only the vector crosses the Python boundary: the mean update never
    # reads ids, and mapInArrow ships every column it is given (Spark
    # cannot see inside the function — guide-§4 column pruning, r16)
    vecs = vecs.select("v")

    out_schema = StructType(
        [
            StructField("list_id", IntegerType()),
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
        ]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa_

        lids, cent_unit = _cent_matrix(cent_rows)
        for b in batches:
            if b.num_rows == 0:
                continue
            V = _vec_matrix(b.column("v"), b.num_rows)
            best = _best_lists(b, lids, cent_unit)
            out_l, out_n, out_s = [], [], []
            for lid in np.unique(best):
                mask = best == lid
                out_l.append(int(lid))
                out_n.append(int(mask.sum()))
                out_s.append(V[mask].sum(axis=0).tolist())
            yield pa_.RecordBatch.from_arrays(
                [
                    pa_.array(out_l, pa_.int32()),
                    pa_.array(out_n, pa_.int64()),
                    pa_.array(out_s, pa_.list_(pa_.float64())),
                ],
                schema=pa_.schema(
                    [
                        pa_.field("list_id", pa_.int32()),
                        pa_.field("n", pa_.int64()),
                        pa_.field("s", pa_.list_(pa_.float64())),
                    ]
                ),
            )

    return vecs.mapInArrow(fn, out_schema)


def _assign_lists(vecs: DataFrame, centroids) -> DataFrame:
    """Nearest-centroid assignment: broadcast the centroid table against the
    vector frame and keep the argmax-cosine list per vector (max_by over a
    (cosine, list_id) struct — no window, no second shuffle)."""
    # per-row norms factored out of the pair expression (r16, same
    # bit-identity argument as cosine_topk): the inline spelling recomputed
    # the vector's norm once per CENTROID and the centroid's norm once per
    # VECTOR — n_list x and corpus x redundant folds respectively
    scored = (
        vecs.withColumn("_vn", vector_norm(F.col("v")))
        # re-hint after the projection: callers pass F.broadcast(cents),
        # and wrapping the hinted frame in withColumn must not let the
        # hint get lost behind the new Project (broadcast-on-broadcast is
        # idempotent, and the big-centroid path NEEDS the forced hint)
        .crossJoin(
            F.broadcast(centroids.withColumn("_cn", vector_norm(F.col("centroid"))))
        )
        .select(
            "id",
            "v",
            "list_id",
            cosine_from_norms(
                F.col("v"), F.col("centroid"), F.col("_vn"), F.col("_cn")
            ).alias("_sim"),
        )
    )
    best = (
        scored.groupBy("id")
        .agg(
            F.max_by(F.struct("list_id", "v"), F.struct(F.col("_sim"), (-F.col("list_id")).alias("tb"))).alias("b")
        )
        .select("id", F.col("b.list_id").alias("list_id"), F.col("b.v").alias("v"))
    )
    return best


class IvfIndex:
    """A built IVF-flat index: broadcastable centroid table + the corpus
    assigned to its Voronoi cells. The 100 TB usage shape: ``build`` pays
    the centroid seeding + assignment scan ONCE (optionally persisting the
    assigned corpus in memory/disk), then every ``topk`` query batch is
    just a probe equi-join on list_id — amortized indexing, exactly how a
    vector store serves repeated query traffic.
    """

    # bound on keeping the centroid matrix driver/closure-resident
    # (n_list * dim cells ~= 32 MB of float64) — above it the fully
    # distributed join paths run instead
    MAX_DRIVER_CELLS = 1 << 22

    def __init__(
        self,
        centroids: DataFrame,
        assigned: DataFrame,
        *,
        persisted: bool,
        cent_rows: list | None = None,
    ):
        self.centroids = centroids
        self.assigned = assigned
        self.cent_rows = cent_rows  # driver copy when small enough to inline
        self._persisted = persisted
        self._cents_persisted = False  # big-centroid path caches centroids too
        self._lists_df: DataFrame | None = None  # lazy full-probe cell table

    @staticmethod
    def _materialize_centroids(spark, cents_lazy: DataFrame):
        """Centroids are O(n_list) small-by-contract: run the seeding +
        Lloyd subplan ONCE, pin the result as a driver-local literal frame.
        Left lazy, every broadcast/probe use would re-execute that subplan
        (a corpus scan + three shuffles per use). Rows are sorted by
        list_id — _best_lists/_probes rely on that ordering for their
        deterministic smallest-list_id tie-break, and neither a reloaded
        multi-part parquet nor the distributed-Lloyd path guarantees
        collect order."""
        rows = sorted(cents_lazy.collect(), key=lambda r: r["list_id"])
        cent_rows = [(r["list_id"], list(r["centroid"])) for r in rows]
        from mortar_parquet_support_spark.functions import tiny_frame

        cents = tiny_frame(spark, rows, cents_lazy.schema)
        return cents, cent_rows

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
    ) -> "IvfIndex":
        small = _centroids_fit_driver(corpus, vec_col, n_list)
        # NULL embeddings must never reach the Arrow matrix paths:
        # ListArray.flatten() silently drops null slots, which would shift
        # every later vector's elements in the reshape (silent wrong
        # assignment). One cheap IsNotNull on the scan removes the hazard.
        vecs = corpus.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        )
        if small:
            # rows come back driver-resident straight from the Lloyd loop —
            # no round-trip through a local DataFrame + collect; the lazy
            # local frame exists only for save()/big-path consumers
            cent_rows = _centroids_small_rows(
                corpus, id_col=id_col, vec_col=vec_col, n_list=n_list,
                iters=iters, seed=seed,
            )
            from mortar_parquet_support_spark.functions import tiny_frame

            cents = tiny_frame(
                corpus.sparkSession, cent_rows,
                "list_id: int, centroid: array<double>",
            )
            # zero-shuffle assignment: corpus scanned once, never moved
            assigned = _assign_lists_arrow(vecs, cent_rows)
        else:
            cents_lazy = ivf_centroids(
                corpus, id_col=id_col, vec_col=vec_col, n_list=n_list,
                iters=iters, seed=seed, _small=small,
            )
            # big centroids stay distributed: persist cuts the subplan
            # recompute per broadcast use without driver residence (always
            # needed while the index lives — released by unpersist())
            cents = cents_lazy.persist()
            cents.count()
            cents_persisted = True
            cent_rows = None
            assigned = _assign_lists(vecs, F.broadcast(cents))
        # precompute each corpus vector's norm AT BUILD TIME (what vector
        # stores do): the probe's per-pair work drops from three array
        # folds (dot + two norms) to one. vector_norm shares the fold
        # order of cosine_similarity's inline norm, so probe scores stay
        # bit-identical to the unindexed formula.
        assigned = assigned.select(
            F.col("id").alias("neighbor_id"),
            F.col("v").alias("c_vec"),
            "list_id",
            vector_norm(F.col("v")).alias("c_norm"),
        )
        if persist:
            # eager persist: materialize NOW so the first query batch
            # doesn't pay the assignment scan (and AQE never re-plans it)
            assigned = assigned.persist()
            assigned.count()
        out = cls(cents, assigned, persisted=persist, cent_rows=cent_rows)
        out._cents_persisted = not small and cents_persisted
        return out

    def _probes(self, q: DataFrame, nprobe: int) -> DataFrame:
        """(query_id, q_vec, list_id) for the nprobe nearest cells per
        query. Driver-resident-centroid path: rank cells in one Arrow
        numpy pass — no join, no window shuffle; big-centroid fallback:
        broadcast join + row_number window (same (cosine desc, list_id
        asc) ordering either way)."""
        if self.cent_rows is not None and nprobe >= len(self.cent_rows):
            # FULL probe: every query visits every cell — no ranking pass
            # at all, just the tiny list_id table cross-joined in (the
            # probe equi-join downstream is unchanged). Saves one Arrow
            # worker stage on the exact-search path.
            if self._lists_df is None:
                from mortar_parquet_support_spark.functions import tiny_frame

                # tiny_frame (r16): as a 32-slice Python RDD this probe-
                # side frame cost a Python-worker task fan-out on every
                # full-probe query batch (the knn_ivf headline path)
                self._lists_df = tiny_frame(
                    q.sparkSession, [(lid,) for lid, _ in self.cent_rows],
                    "list_id: int",
                )
            return q.crossJoin(F.broadcast(self._lists_df))
        if self.cent_rows is not None:
            from pyspark.sql.types import IntegerType, StructField, StructType

            cent_rows = self.cent_rows
            out_schema = StructType(
                list(q.schema.fields) + [StructField("list_id", IntegerType())]
            )

            def fn(batches):
                import numpy as np
                import pyarrow as pa_

                lids, cent_unit = _cent_matrix(cent_rows)
                for b in batches:
                    if b.num_rows == 0:
                        continue
                    V = _vec_matrix(b.column("q_vec"), b.num_rows)
                    vn = np.linalg.norm(V, axis=1)
                    vn[vn == 0] = 1.0
                    sims = (V / vn[:, None]) @ cent_unit.T
                    take_rows, take_lids = [], []
                    np_ = min(nprobe, len(lids))
                    for i in range(b.num_rows):
                        # stable sort of -sims: desc by sim, ties -> first
                        # occurrence = smaller list_id (cent_rows ordered)
                        order = np.argsort(-sims[i], kind="stable")[:np_]
                        take_rows.extend([i] * len(order))
                        take_lids.extend(lids[order].tolist())
                    yield b.take(pa_.array(take_rows, pa_.int64())).append_column(
                        "list_id", pa_.array(take_lids, pa_.int32())
                    )

            return q.mapInArrow(fn, out_schema)
        qs = q.crossJoin(F.broadcast(self.centroids)).select(
            "query_id",
            "q_vec",
            "list_id",
            cosine_similarity(F.col("q_vec"), F.col("centroid")).alias("_sim"),
        )
        wq = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("list_id"))
        return (
            qs.withColumn("_r", F.row_number().over(wq))
            .filter(F.col("_r") <= nprobe)
            .select("query_id", "q_vec", "list_id")
        )

    def scored_candidates(
        self, queries: DataFrame, *, id_col: str = "vec_id",
        vec_col: str = "embedding", nprobe: int = 4,
    ) -> DataFrame:
        """(query_id, neighbor_id, cosine) for every corpus vector in the
        nprobe nearest cells of each query — the probe join + scoring
        WITHOUT the final ranking window, for callers that apply their own
        ranking policy (e.g. rank on a rounded score for cross-engine
        determinism) and shouldn't pay two windows."""
        if self.assigned is None:
            raise ValueError(
                "probe-only IvfIndex (it carries no full-precision corpus; "
                "an IvfSq8Index.load created it for cell probing) — score "
                "through the owning IvfSq8Index instead"
            )
        # degenerate query vectors never probe (the cosine_topk contract):
        # on the driver-resident-centroid path a single NULL query would
        # crash the whole Arrow ranking job in _vec_matrix — with an error
        # blaming the corpus build — while the other paths degrade to NULL
        # cosines; filtering here makes every path agree (review r14)
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ).filter(F.col("q_vec").isNotNull() & (F.size("q_vec") > 0))
        probes = self._probes(q, nprobe)
        if "c_norm" in self.assigned.columns:
            # norms were precomputed at build: one fold per pair instead of
            # three. q_norm attaches BEFORE the join fan-out (one norm per
            # query row, broadcast with the probes). Bit-identical to the
            # inline formula — same fold, same operand order.
            probes_n = probes.withColumn("q_norm", vector_norm(F.col("q_vec")))
            joined = self.assigned.join(F.broadcast(probes_n), "list_id").filter(
                F.col("neighbor_id") != F.col("query_id")
            )
            return joined.select(
                "query_id",
                "neighbor_id",
                F.try_divide(
                    dot_product(F.col("q_vec"), F.col("c_vec")),
                    F.col("q_norm") * F.col("c_norm"),
                ).alias("cosine"),
            )
        joined = self.assigned.join(F.broadcast(probes), "list_id").filter(
            F.col("neighbor_id") != F.col("query_id")
        )
        return joined.select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )

    def topk(self, queries: DataFrame, *, id_col: str = "vec_id",
             vec_col: str = "embedding", k: int = 10, nprobe: int = 4) -> DataFrame:
        """(query_id, neighbor_id, cosine, rank) for the nprobe nearest
        cells per query; ``nprobe = n_list`` is exact brute force."""
        scored = self.scored_candidates(
            queries, id_col=id_col, vec_col=vec_col, nprobe=nprobe
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        # NULL cosines (zero-norm corpus vectors in a probed cell) sort
        # last under desc and are dropped AFTER ranking — real neighbors
        # keep contiguous ranks and degenerate vectors never occupy a
        # neighbor slot, exactly cosine_topk's contract (review r14: this
        # is what keeps nprobe=n_list bit-equal to brute force)
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .filter(F.col("cosine").isNotNull())
        )

    def unpersist(self) -> None:
        if self._persisted:
            self.assigned.unpersist()
            self._persisted = False
        if self._cents_persisted:
            # the big-centroid build caches the centroid table regardless
            # of the assigned-frame persist flag; without this release,
            # repeated one-shot builds leak cached centroid tables for the
            # session lifetime
            self.centroids.unpersist()
            self._cents_persisted = False

    def save(self, path: str) -> None:
        """Persist the index to disk: ``<path>/centroids`` (tiny) and
        ``<path>/assigned`` partitioned by ``list_id`` — so a later
        ``load(...).topk(...)`` probe reads ONLY its nprobe cell
        directories (partition pruning), never rescanning or re-clustering
        the corpus. This is the build-offline / serve-online split of a
        production vector store."""
        if self.assigned is None:
            raise ValueError(
                "probe-only IvfIndex has no corpus to save — save the "
                "owning IvfSq8Index instead"
            )
        self.centroids.write.mode("overwrite").parquet(path.rstrip("/") + "/centroids")
        (
            self.assigned.write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(path.rstrip("/") + "/assigned")
        )

    @classmethod
    def append_to_saved(
        cls,
        spark,
        path: str,
        vectors: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """Assign NEW vectors against a saved index's FIXED centroids and
        append them into its ``list_id`` partitions — the incremental-add
        shape of a serving vector store (faiss ``add()``): arriving
        embeddings join the index without re-clustering or rescanning the
        existing corpus, and the very next ``load(...).topk(...)`` sees
        them (probes prune by partition, so appends cost nothing to
        queries that don't touch their cells).

        Centroids stay fixed, so heavy distribution drift degrades cell
        balance over time — re-``build`` to re-center, the standard IVF
        maintenance tradeoff. Already-open index objects do NOT see the
        appended rows (their assigned frame was pinned at load/build);
        reopen after appending — same single-writer discipline as the
        incremental dedup indexes."""
        root = path.rstrip("/")
        cents_lazy = spark.read.parquet(root + "/centroids")
        dim = _vec_dim(cents_lazy, "centroid")
        n = cents_lazy.count()
        vecs = vectors.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        )
        cents_persisted = None
        if dim and n * dim <= cls.MAX_DRIVER_CELLS:
            _, cent_rows = cls._materialize_centroids(spark, cents_lazy)
            assigned = _assign_lists_arrow(vecs, cent_rows)
        else:
            cents_persisted = cents_lazy.persist()
            cents_persisted.count()
            assigned = _assign_lists(vecs, F.broadcast(cents_persisted))
        # c_norm unconditionally: every save() layout carries it (build
        # always precomputes norms and save refuses probe-only indexes),
        # and probing a schema guard here would cost a full file listing
        # of the assigned table per append
        try:
            (
                assigned.select(
                    F.col("id").alias("neighbor_id"),
                    F.col("v").alias("c_vec"),
                    F.col("list_id"),
                    vector_norm(F.col("v")).alias("c_norm"),
                )
                .write.mode("append")
                .partitionBy("list_id")
                .parquet(root + "/assigned")
            )
        finally:
            if cents_persisted is not None:
                cents_persisted.unpersist()

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        """Reopen a saved index. The assigned corpus stays on disk (its
        list_id partitioning makes probes prune); persist() it explicitly
        for hot-serving if memory allows. Centroids within the driver
        bound are pulled local so probes take the no-shuffle Arrow path;
        bigger ones stay distributed (window probe fallback)."""
        cents = spark.read.parquet(path.rstrip("/") + "/centroids")
        dim = _vec_dim(cents, "centroid")
        n = cents.count()
        assigned = spark.read.parquet(path.rstrip("/") + "/assigned")
        if dim and n * dim <= cls.MAX_DRIVER_CELLS:
            cents, cent_rows = cls._materialize_centroids(spark, cents)
        else:
            cent_rows = None
        return cls(cents, assigned, persisted=False, cent_rows=cent_rows)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_list: int = 16,
    nprobe: int = 4,
    iters: int = 1,
    seed: int = 42,
) -> DataFrame:
    """One-shot IVF-flat approximate top-k: (query_id, neighbor_id, cosine,
    rank) — builds an unpersisted :class:`IvfIndex` and probes it once.

    Scale shape: centroids are O(n_list) and always broadcast; the corpus is
    scanned once for assignment and then joined to queries ONLY on matching
    list_id — the equi-join on list_id replaces the brute-force cross join,
    cutting compared pairs by ~nprobe/n_list. For repeated query batches
    use ``IvfIndex.build(..., persist=True)`` and call ``topk`` per batch.
    ``nprobe = n_list`` probes every cell and reproduces exact brute-force
    results (tested equivalence).
    """
    index = IvfIndex.build(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_list=n_list,
        iters=iters,
        seed=seed,
        persist=False,
    )
    return index.topk(queries, id_col=id_col, vec_col=vec_col, k=k, nprobe=nprobe)


def hyperplane_signature(
    vec: Column, *, n_planes: int = 12, seed: int = 42
) -> Column:
    """Integer LSH bucket from ``n_planes`` pseudo-random hyperplane sign
    bits; hyperplane weights are ±1 derived from xxhash64(dim, plane, seed),
    so the signature is seed-deterministic with zero driver state."""
    dim_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bucket = F.lit(0)
    for p in range(n_planes):
        signed = F.zip_with(
            vec,
            dim_idx,
            lambda v, i: F.when(
                F.pmod(F.xxhash64(i, F.lit(p), F.lit(seed)), F.lit(2)) == 1,
                v.cast("double"),
            ).otherwise(-v.cast("double")),
        )
        dot = F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


class LshIndex:
    """A built hyperplane-LSH index: the corpus bucketed (and norm-tagged)
    ONCE, reusable across query batches — the same build-offline /
    probe-online split as :class:`IvfIndex`. ``lsh_topk`` is the one-shot
    convenience wrapper over it.

    Scale shape: bucketing is a pure projection over one corpus scan (no
    shuffle); ``persist=True`` pins the bucketed corpus so repeated query
    batches never recompute signatures; ``save()`` lands it partitioned by
    a bounded bucket prefix so a probe reads only matching directories.
    """

    def __init__(
        self, bucketed: DataFrame, *, n_planes: int, seed: int, persisted: bool
    ):
        self.bucketed = bucketed  # (neighbor_id, c_vec, bucket, c_norm)
        self.n_planes = n_planes
        self.seed = seed
        self._persisted = persisted

    # partition count bound for save(): bucket space is 2^n_planes, which
    # explodes into tiny directories past ~2^10; save() partitions on
    # pmod(bucket, _SAVE_PARTITIONS) instead — probes prune on the prefix
    # then filter the exact bucket inside it.
    _SAVE_PARTITIONS = 256

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_planes: int = 12,
        seed: int = 42,
        persist: bool = True,
    ) -> "LshIndex":
        bucketed = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            hyperplane_signature(
                F.col(vec_col), n_planes=n_planes, seed=seed
            ).alias("bucket"),
            vector_norm(F.col(vec_col)).alias("c_norm"),
        )
        if persist:
            bucketed = bucketed.persist()
            bucketed.count()  # materialize now: first query pays no build
        return cls(bucketed, n_planes=n_planes, seed=seed, persisted=persist)

    def _query_probes(self, queries: DataFrame, id_col: str, vec_col: str, multi_probe: int) -> DataFrame:
        """(query_id, q_vec, q_norm, bucket) — the query's own bucket plus
        every neighbor bucket within Hamming distance ``multi_probe`` of
        the signature (vectors near a hyperplane land on either side;
        flipping sign bits probes across it — the standard multi-probe
        generalization, so ``multi_probe=2`` really does add the 2-bit
        neighborhoods instead of silently behaving like 1). Fan-out is
        ``sum_{i<=multi_probe} C(n_planes, i)`` per query, on the SMALL
        side of the broadcast join."""
        from itertools import combinations

        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            vector_norm(F.col(vec_col)).alias("q_norm"),
            hyperplane_signature(
                F.col(vec_col), n_planes=self.n_planes, seed=self.seed
            ).alias("_b0"),
        )
        if multi_probe <= 0:
            return q.withColumn("bucket", F.col("_b0")).drop("_b0")
        masks = [
            sum(1 << p for p in bits)
            for r in range(1, min(multi_probe, self.n_planes) + 1)
            for bits in combinations(range(self.n_planes), r)
        ]
        flips = F.array(
            F.col("_b0"),
            *[F.col("_b0").bitwiseXOR(F.lit(m)) for m in masks],
        )
        return (
            q.select(
                "query_id", "q_vec", "q_norm",
                F.explode(flips).alias("bucket"),
            )
        )

    def topk(
        self,
        queries: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 10,
        multi_probe: int = 0,
    ) -> DataFrame:
        q = self._query_probes(queries, id_col, vec_col, multi_probe)
        join_keys = ["bucket"]
        if "bucket_p" in self.bucketed.columns:
            # loaded-from-disk index: the corpus is partitioned on
            # bucket_p = pmod(bucket, 256). Computing the same prefix on
            # the (small, broadcast) probe side and joining on it lets
            # dynamic partition pruning skip every non-probed directory
            # (DPP engages when the probe side carries a selective
            # predicate — Spark's standard benefit heuristic).
            q = q.withColumn(
                "bucket_p", F.pmod(F.col("bucket"), F.lit(self._SAVE_PARTITIONS))
            )
            join_keys = ["bucket_p", "bucket"]
        joined = self.bucketed.join(F.broadcast(q), join_keys).filter(
            F.col("neighbor_id") != F.col("query_id")
        )
        scored = joined.select(
            "query_id",
            "neighbor_id",
            F.try_divide(
                dot_product(F.col("q_vec"), F.col("c_vec")),
                F.col("q_norm") * F.col("c_norm"),
            ).alias("cosine"),
        )
        if multi_probe > 0:
            # a corpus vector can match via several probed buckets
            scored = scored.dropDuplicates(["query_id", "neighbor_id"])
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        # same degenerate-vector contract as cosine_topk / IvfIndex.topk:
        # NULL cosines rank last, then drop — never a neighbor slot
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .filter(F.col("cosine").isNotNull())
        )

    def unpersist(self) -> None:
        if self._persisted:
            self.bucketed.unpersist()
            self._persisted = False

    def save(self, path: str) -> None:
        """``<path>/bucketed`` partitioned by a bounded bucket prefix
        (pmod(bucket, 256)); ``<path>/meta`` pins (n_planes, seed) so
        ``load`` reproduces identical query signatures."""
        root = path.rstrip("/")
        spark = self.bucketed.sparkSession
        (
            self.bucketed.withColumn(
                "bucket_p", F.pmod(F.col("bucket"), F.lit(self._SAVE_PARTITIONS))
            )
            .write.mode("overwrite")
            .partitionBy("bucket_p")
            .parquet(root + "/bucketed")
        )
        from mortar_parquet_support_spark.functions import tiny_frame

        tiny_frame(
            spark, [(self.n_planes, self.seed)], "n_planes: int, seed: int"
        ).write.mode("overwrite").parquet(root + "/meta")

    @classmethod
    def load(cls, spark, path: str) -> "LshIndex":
        root = path.rstrip("/")
        meta = spark.read.parquet(root + "/meta").first()
        # bucket_p (the partition column) stays: topk joins on it so
        # dynamic partition pruning reads only probed directories
        bucketed = spark.read.parquet(root + "/bucketed")
        return cls(
            bucketed,
            n_planes=int(meta["n_planes"]),
            seed=int(meta["seed"]),
            persisted=False,
        )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket (plus every
    bucket within Hamming distance ``multi_probe`` of its signature),
    exact-rerank inside it. Recall < 1
    by construction (bucket misses); raise recall by lowering ``n_planes``
    (bigger buckets) or enabling multi-probe. One-shot wrapper — for
    repeated query batches use ``LshIndex.build(persist=True)`` and call
    ``topk`` per batch (the bucketed corpus is computed once)."""
    index = LshIndex.build(
        corpus, id_col=id_col, vec_col=vec_col, n_planes=n_planes, seed=seed,
        persist=False,
    )
    return index.topk(
        queries, id_col=id_col, vec_col=vec_col, k=k, multi_probe=multi_probe
    )
