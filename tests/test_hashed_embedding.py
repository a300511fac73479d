"""hashed_embedding: the value math is oracle-checked coordinate-by-
coordinate (hashed_embed entry); here the vector-level contracts — shared
vocabulary implies higher cosine, determinism, degenerate docs, normalize
mode, and that the output feeds the vector stack (cosine_topk).
"""

import math

from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.embeddings import hashed_embedding


def _emb(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in hashed_embedding(df, dim=32, **kw).collect()
    }


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb) if na and nb else None


def test_lexical_similarity_structure(spark):
    out = _emb(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox leaps over the lazy cat"),
            (3, "completely unrelated words about spark executors"),
        ],
        normalize=False,
    )
    near = _cos(out[1].embedding, out[2].embedding)
    far = _cos(out[1].embedding, out[3].embedding)
    assert near > far
    assert near > 0.5


def test_deterministic_and_counts(spark):
    rows = [(1, "alpha beta gamma")]
    a = _emb(spark, rows, normalize=False)[1]
    b = _emb(spark, rows, normalize=False)[1]
    assert a.embedding == b.embedding
    assert a.n_grams == 5  # 3 unigrams + 2 bigrams
    # unnormalized coordinates are integer-valued signed sums
    assert all(v == int(v) for v in a.embedding)
    assert sum(abs(v) for v in a.embedding) <= 5


def test_degenerate_docs(spark):
    out = _emb(spark, [(1, ""), (2, None), (3, "word")], normalize=False)
    assert out[1].n_grams == 0 and set(out[1].embedding) == {0.0}
    assert out[2].n_grams == 0 and set(out[2].embedding) == {0.0}
    assert out[3].n_grams == 1
    # normalized: zero vector has no direction -> all-NULL coordinates
    outn = _emb(spark, [(1, ""), (3, "word")], normalize=True)
    assert set(outn[1].embedding) == {None}
    assert math.isclose(
        sum(v * v for v in outn[3].embedding), 1.0, rel_tol=1e-9
    )


def test_feeds_vector_stack(spark):
    from mortar_parquet_support_spark.operators.similarity import cosine_topk

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data between executors"),
            (2, "spark moves shuffle data across executors"),
            (3, "ducks swim on the quiet pond"),
        ],
        "doc_id long, text string",
    )
    vecs = hashed_embedding(docs, dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    top = cosine_topk(
        vecs, vecs.filter(F.col("vec_id") == 1), k=2, include_self=True
    )
    ranked = [r.neighbor_id for r in top.orderBy("rank").collect()]
    assert ranked == [1, 2]  # self first, lexical twin second
