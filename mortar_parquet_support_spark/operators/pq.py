"""Product quantization (PQ) for embedding columns — the code tier of the
classic IVFADC vector-store stack.

At 100 TB of float32 embeddings, PQ codes are ``m`` bytes per vector
against ``dim * 4`` for the floats (64-dim float32 → 8 bytes at m=8, a
32× compression): the difference between an ANN serving corpus that fits
executor memory / page cache and one that doesn't. Public recipe: Jégou,
Douze, Schmid 2011, "Product Quantization for Nearest Neighbor Search"
(IEEE TPAMI 33(1)), re-expressed Spark-first:

- :func:`pq_train`  — M per-subspace codebooks via Lloyd iterations where
  EVERY iteration is one shuffle-free Arrow-batched corpus scan covering
  ALL subspaces at once (the partial-sum shape of ivf_centroids' small
  path, operators/similarity.py:336-391); deterministic hash seeding, no
  ``rand()``.
- :func:`pq_encode` — zero-shuffle ``mapInArrow`` nearest-centroid coding
  (argmin L2 per subspace, BLAS batch matmuls); the corpus never moves.
- :func:`pq_decode` — codebook-lookup reconstruction as a pure JVM
  expression (test/debug utility; the search path never reconstructs).
- :class:`PqIndex` — build / save / load / ``topk`` with asymmetric
  distance computation (ADC): each query precomputes its ``m × ksub``
  inner-product table against the codebooks once; each corpus batch
  scores by table lookup + sum and emits only batch-local top-k partials
  (the shuffle carries ``n_batches × n_queries × k`` rows, exactly like
  cosine_topk_arrow); optional overfetch + full-precision re-rank
  (quantize._exact_rerank, shared with SQ8 so tie-breaks can never
  diverge) recovers exact cosine on the survivors.

Cosine is served as inner product over unit-normalized vectors: train,
encode, and the query tables all normalize FULL vectors first, then
slice into subspaces — so ``Σ_m  q_m · c_m[code_m]  ≈  cos(q, v)``.

Codebooks are driver/closure-resident BY DESIGN (``ksub * dim`` doubles
across all M books — 256 × 4096 = 1 M cells at the extreme end, bounded
by ``MAX_DRIVER_CELLS``); the corpus side only ever streams through
Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mortar_parquet_support_spark.functions import vector_norm

# all M codebooks together hold exactly ksub * dim doubles; same driver
# bound as IvfIndex.MAX_DRIVER_CELLS (similarity.py:547)
MAX_DRIVER_CELLS = 1 << 22


def _check_geometry(dim: int, m: int, ksub: int) -> int:
    if m < 1 or dim % m != 0:
        raise ValueError(
            f"m must divide the embedding dimension: dim={dim}, m={m}"
        )
    if not 2 <= ksub <= 256:
        raise ValueError(f"ksub must be in [2, 256] (one byte), got {ksub}")
    if ksub * dim > MAX_DRIVER_CELLS:
        raise ValueError(
            f"codebooks would hold {ksub * dim} cells > MAX_DRIVER_CELLS "
            f"({MAX_DRIVER_CELLS}); PQ codebooks are driver-resident by "
            "design — reduce ksub or train on a projection"
        )
    return dim // m


def _books_array(books):
    """[m, ksub, dsub] float64 ndarray from the nested-list codebooks."""
    import numpy as np

    return np.asarray(books, dtype=np.float64)


def _unit_matrix(arr, n):
    """(n, dim) row-normalized float64 matrix from an Arrow list column —
    same NULL/ragged contract as similarity._vec_matrix. Zero-norm rows
    stay all-zero (callers filter them before an index build; encode is
    permissive and codes them like any other vector)."""
    import numpy as np

    from mortar_parquet_support_spark.operators.similarity import _vec_matrix

    V = _vec_matrix(arr, n)
    norms = np.linalg.norm(V, axis=1)
    safe = np.where(norms > 0, norms, 1.0)
    return V / safe[:, None]


def _best_codes(U, B):
    """(n, m) int argmin-L2 code matrix for unit rows ``U`` against books
    ``B[m, ksub, dsub]``. ||x−c||² = ||x||² − 2x·c + ||c||²; the ||x||²
    term is constant per row, so argmin needs only ``cn − 2 X Bᵀ``.
    np.argmin's first-minimum rule makes ties deterministic (lowest code
    wins), independent of batch layout."""
    import numpy as np

    n = U.shape[0]
    m = B.shape[0]
    dsub = B.shape[2]
    cn = (B * B).sum(axis=2)  # [m, ksub]
    codes = np.empty((n, m), dtype=np.int64)
    for mi in range(m):
        X = U[:, mi * dsub : (mi + 1) * dsub]
        codes[:, mi] = np.argmin(cn[mi][None, :] - 2.0 * (X @ B[mi].T), axis=1)
    return codes


def pq_train(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    seed: int = 42,
) -> list:
    """Train M per-subspace codebooks; returns nested lists
    ``books[m][ksub][dsub]`` (serializable, closure-friendly).

    Seeding is deterministic: the ``ksub`` corpus vectors with the
    smallest ``xxhash64(id, seed)`` are unit-normalized and SLICED — seed
    j of every subspace comes from the same corpus vector, a seeded
    uniform sample with no ``rand()``. Each Lloyd iteration is then ONE
    shuffle-free Arrow-batched corpus scan emitting (subspace, code, n,
    sum) partials for all M subspaces together; the driver reduces the
    O(n_batches · m · ksub) partials and divides. Cells that attract no
    vectors KEEP their previous centroid (unlike ivf_centroids, which
    drops empty lists): codes index into a fixed-size table, so the
    codebook must stay dense.

    NULL and zero-norm/non-finite vectors are filtered before seeding and
    assignment — they have no direction in cosine space.
    """
    import numpy as np

    valid = corpus.filter(
        F.col(vec_col).isNotNull() & (vector_norm(F.col(vec_col)) > 0)
    )
    seeds = (
        valid.select(
            F.col(vec_col).cast("array<double>").alias("v"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("_h"),
        )
        .orderBy("_h")
        .limit(ksub)
        .collect()
    )
    if len(seeds) < ksub:
        raise ValueError(
            f"corpus has only {len(seeds)} usable vectors; ksub={ksub} "
            "needs at least that many distinct seeds"
        )
    S = np.asarray([r["v"] for r in seeds], dtype=np.float64)
    dim = S.shape[1]
    dsub = _check_geometry(dim, m, ksub)
    S = S / np.linalg.norm(S, axis=1)[:, None]
    B = S.reshape(ksub, m, dsub).transpose(1, 0, 2).copy()  # [m, ksub, dsub]

    vecs = valid.select(F.col(vec_col).alias("v"))
    for _ in range(iters):
        parts = _pq_partials(vecs, B.tolist()).collect()
        acc: dict[tuple, tuple] = {}
        # reduce in (sub, code, collect order) so reruns on the same
        # partitioning are bit-identical (same rationale as
        # _centroids_small_rows)
        for r in sorted(parts, key=lambda r: (r["sub"], r["code"])):
            key = (r["sub"], r["code"])
            n0, s0 = acc.get(key, (0, 0.0))
            acc[key] = (n0 + r["n"], s0 + np.asarray(r["s"]))
        for (mi, j), (n, s) in acc.items():
            if n > 0:
                B[mi, j] = s / n
    return B.tolist()


def _pq_partials(vecs: DataFrame, books: list) -> DataFrame:
    """Per-Arrow-batch partial sums for the joint-subspace Lloyd update:
    (sub, code, n, s[dsub]) — one corpus scan, NO shuffle, all M
    subspaces assigned per batch with BLAS matmuls."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("sub", IntegerType()),
            StructField("code", IntegerType()),
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
        ]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa_

        B = _books_array(books)
        m, _, dsub = B.shape
        for b in batches:
            if b.num_rows == 0:
                continue
            U = _unit_matrix(b.column("v"), b.num_rows)
            codes = _best_codes(U, B)
            out_m, out_j, out_n, out_s = [], [], [], []
            for mi in range(m):
                X = U[:, mi * dsub : (mi + 1) * dsub]
                col = codes[:, mi]
                for j in np.unique(col):
                    mask = col == j
                    out_m.append(int(mi))
                    out_j.append(int(j))
                    out_n.append(int(mask.sum()))
                    out_s.append(X[mask].sum(axis=0).tolist())
            yield pa_.RecordBatch.from_arrays(
                [
                    pa_.array(out_m, pa_.int32()),
                    pa_.array(out_j, pa_.int32()),
                    pa_.array(out_n, pa_.int64()),
                    pa_.array(out_s, pa_.list_(pa_.float64())),
                ],
                names=["sub", "code", "n", "s"],
            )

    return vecs.mapInArrow(fn, out_schema)


def pq_encode(
    df: DataFrame,
    books: list,
    *,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append an ``array<smallint>`` code column (length m): per subspace,
    the argmin-L2 codebook entry for the UNIT-normalized vector slice.
    Zero-shuffle ``mapInArrow`` — the frame is scanned once and never
    moves; arithmetic is batch BLAS, never per-row Python. NULL or ragged
    vectors raise (filter first — PqIndex.build does); zero-norm vectors
    code as all-zero slices (they never rank in topk because degenerate
    QUERIES are dropped and build filters degenerate corpus rows)."""
    from pyspark.sql.types import ArrayType, ShortType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(ShortType()))]
    )
    vec_idx = df.columns.index(vec_col)

    def fn(batches):
        import pyarrow as pa_

        B = _books_array(books)
        for b in batches:
            if b.num_rows == 0:
                continue
            U = _unit_matrix(b.column(vec_idx), b.num_rows)
            codes = _best_codes(U, B).astype("int16")
            yield b.append_column(
                out_col, pa_.array(list(codes), pa_.list_(pa_.int16()))
            )

    return df.mapInArrow(fn, out_schema)


def pq_decode(codes_col: Column | str, books: list) -> Column:
    """Reconstruction ``concat_m(books[m][code_m])`` as a pure JVM
    expression (literal nested array + element_at). Expression size is
    ksub·dim literals — fine as the test/debug utility it is documented
    to be; the ADC search path never reconstructs."""
    c = codes_col if isinstance(codes_col, Column) else F.col(codes_col)
    lit_books = F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in cent]) for cent in book])
            for book in books
        ]
    )
    # element_at is 1-based; codes and subspace positions are 0-based
    return F.flatten(
        F.zip_with(
            c,
            lit_books,
            lambda code, book: F.element_at(book, code.cast("int") + 1),
        )
    )


class PqIndex:
    """Flat PQ index: ``(neighbor_id, codes)`` + driver-resident
    codebooks. ``topk`` is ADC — approximate cosine via per-query lookup
    tables — with optional overfetch + exact re-rank. The lossless
    special case (every corpus subvector is itself a codebook entry)
    reproduces brute-force cosine_topk EXACTLY (pytest-pinned), the same
    "full fidelity == exact" equivalence IvfIndex pins with full probe.

    Scale shape: build is two corpus scans (train partials × iters +
    encode), both shuffle-free; the coded frame is ``m`` bytes of payload
    per vector; ``topk`` scans codes once, emits batch-local top-k
    partials, and the global re-rank window is tiny. Nothing
    corpus-sized is ever collected, shuffled, or broadcast.
    """

    def __init__(self, books: list, coded: DataFrame, *, persisted: bool):
        self.books = books
        self.coded = coded  # (neighbor_id, codes)
        self._persisted = persisted

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        m: int = 8,
        ksub: int = 16,
        iters: int = 2,
        seed: int = 42,
        persist: bool = True,
    ) -> "PqIndex":
        valid = corpus.filter(
            F.col(vec_col).isNotNull() & (vector_norm(F.col(vec_col)) > 0)
        )
        books = pq_train(
            valid, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub,
            iters=iters, seed=seed,
        )
        coded = pq_encode(
            valid.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
            ),
            books,
            vec_col="v",
        ).select("neighbor_id", "codes")
        if persist:
            coded = coded.persist()
            coded.count()
        return cls(books, coded, persisted=persist)

    def topk(
        self,
        queries: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 10,
        rerank: int = 0,
        rerank_corpus: DataFrame | None = None,
    ) -> DataFrame:
        """(query_id, neighbor_id, cosine, rank): ``cosine`` is the ADC
        approximation when ``rerank`` = 0, exact full-precision cosine on
        the overfetched survivors when ``rerank`` > 0 (``rerank`` is the
        candidate pool size per query, >= k; requires ``rerank_corpus`` —
        the full-precision frame, semi-join-pruned to candidates only).
        Self-matches are excluded by id; degenerate queries (NULL, zero
        norm, non-finite) emit nothing — the exact-path contract."""
        import numpy as np
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql import types as T

        if rerank:
            if rerank < k:
                raise ValueError(f"rerank pool ({rerank}) must be >= k ({k})")
            if rerank_corpus is None:
                raise ValueError(
                    "rerank requires rerank_corpus (the full-precision frame)"
                )
        q_id_type = queries.schema[id_col].dataType
        c_id_type = self.coded.schema["neighbor_id"].dataType
        q_arrow = to_arrow_type(q_id_type)
        out_schema = T.StructType(
            [
                T.StructField("query_id", q_id_type, False),
                T.StructField("neighbor_id", c_id_type, False),
                T.StructField("cosine", T.DoubleType(), False),
            ]
        )
        q_rows = [
            r
            for r in queries.select(id_col, vec_col).collect()
            if r[1] is not None
        ]
        if q_rows:
            qm_all = np.asarray(
                [
                    [np.nan if v is None else float(v) for v in r[1]]
                    for r in q_rows
                ],
                dtype=np.float64,
            )
            qn = np.linalg.norm(qm_all, axis=1)
            keep = np.isfinite(qn) & (qn > 0)
            q_rows = [r for r, kf in zip(q_rows, keep) if kf]
            qm = qm_all[keep] / qn[keep, None]
        if not q_rows:
            from mortar_parquet_support_spark.functions import tiny_frame

            return tiny_frame(
                self.coded.sparkSession, [],
                out_schema.add(T.StructField("rank", T.IntegerType(), False)),
            )
        q_ids = [r[0] for r in q_rows]
        B = _books_array(self.books)
        m, ksub, dsub = B.shape
        nq = qm.shape[0]
        if qm.shape[1] != m * dsub:
            raise ValueError(
                f"query dim {qm.shape[1]} != codebook dim {m * dsub}"
            )
        # the ADC tables: tables[q, mi, j] = q_slice(mi) · books[mi][j]
        tables = np.einsum("qmd,mkd->qmk", qm.reshape(nq, m, dsub), B)
        fetch_k = rerank if rerank else k

        def score(batches):
            for b in batches:
                n = b.num_rows
                if n == 0:
                    continue
                ids = b.column(0)
                codes_arr = b.column(1)
                flat = codes_arr.flatten().to_numpy(zero_copy_only=False)
                C = flat.reshape(n, m).astype(np.int64)
                # S[i, q] = Σ_mi tables[q, mi, C[i, mi]]
                S = np.zeros((n, nq), dtype=np.float64)
                for mi in range(m):
                    S += tables[:, mi, C[:, mi]].T
                ids_py = ids.to_pylist()
                ids_np = np.asarray(ids_py)
                out_q, out_n, out_c = [], [], []
                kk = min(fetch_k + 1, n)  # +1 absorbs a self-match
                for j, qid in enumerate(q_ids):
                    col = S[:, j]
                    # widen ties at the cut and id-sort them — the same
                    # deterministic batch-local selection as
                    # cosine_topk_arrow (arbitrary argpartition picks
                    # would vary under repartitioning)
                    if kk >= n:
                        tied = np.arange(n)
                    else:
                        part = np.argpartition(-col, kk - 1)[:kk]
                        tied = np.nonzero(col >= col[part].min())[0]
                    order = np.lexsort((ids_np[tied], -col[tied]))
                    for i in tied[order[:kk]]:
                        nid = ids_py[int(i)]
                        if nid == qid:
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

        partial = self.coded.select("neighbor_id", "codes").mapInArrow(
            score, out_schema
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        top = partial.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= fetch_k
        )
        if not rerank:
            return top
        from mortar_parquet_support_spark.operators.quantize import (
            _exact_rerank,
        )

        spark = self.coded.sparkSession
        from mortar_parquet_support_spark.functions import tiny_frame

        q_frame = tiny_frame(
            spark,
            [(qid, [float(x) for x in vec]) for qid, vec in zip(q_ids, qm)],
            T.StructType(
                [
                    T.StructField("query_id", q_id_type, False),
                    T.StructField(
                        "q_vec", T.ArrayType(T.DoubleType()), False
                    ),
                ]
            ),
        )
        return _exact_rerank(
            top, q_frame, rerank_corpus, id_col=id_col, vec_col=vec_col, k=k
        )

    def unpersist(self) -> None:
        if self._persisted:
            self.coded.unpersist()
            self._persisted = False

    def save(self, path: str) -> None:
        """``<path>/coded`` (the codes frame), ``<path>/books`` one row
        per (sub, code, centroid), ``<path>/meta`` pinning (m, ksub) so
        ``load`` rebuilds bit-identical codebooks."""
        root = path.rstrip("/")
        spark = self.coded.sparkSession
        self.coded.write.mode("overwrite").parquet(root + "/coded")
        rows = [
            (mi, j, [float(x) for x in cent])
            for mi, book in enumerate(self.books)
            for j, cent in enumerate(book)
        ]
        from mortar_parquet_support_spark.functions import tiny_frame

        tiny_frame(
            spark, rows, "sub: int, code: int, centroid: array<double>"
        ).write.mode("overwrite").parquet(root + "/books")
        tiny_frame(
            spark, [(len(self.books), len(self.books[0]))], "m: int, ksub: int"
        ).write.mode("overwrite").parquet(root + "/meta")

    @classmethod
    def load(cls, spark, path: str) -> "PqIndex":
        root = path.rstrip("/")
        meta = spark.read.parquet(root + "/meta").first()
        m, ksub = int(meta["m"]), int(meta["ksub"])
        brows = spark.read.parquet(root + "/books").collect()
        by_key = {(r["sub"], r["code"]): list(r["centroid"]) for r in brows}
        books = [[by_key[(mi, j)] for j in range(ksub)] for mi in range(m)]
        return cls(books, spark.read.parquet(root + "/coded"), persisted=False)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    seed: int = 42,
    rerank: int = 0,
) -> DataFrame:
    """One-shot convenience: build a :class:`PqIndex` (unpersisted) and
    query it; ``rerank`` > 0 re-ranks that many ADC candidates per query
    against the full-precision corpus. Amortized serving should build the
    index once (persist/save) and call ``topk`` per batch instead."""
    idx = PqIndex.build(
        corpus, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub, iters=iters,
        seed=seed, persist=False,
    )
    return idx.topk(
        queries, id_col=id_col, vec_col=vec_col, k=k, rerank=rerank,
        rerank_corpus=corpus if rerank else None,
    )
