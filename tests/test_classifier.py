"""linear_classifier_score / hashed_features edge semantics.

The full model (hashing, pooling, sigmoid) is oracle-checked bit-for-bit
by the linear_classifier entry; here: gram construction, the
missing-weight-counts-as-zero rule, degenerate documents, and the
broadcast plan shape.
"""

import math

from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.text import (
    hashed_features,
    linear_classifier_score,
)
from tests.conftest import plan_str


def test_hashed_features_gram_count(spark):
    df = spark.createDataFrame(
        [("a b c",), ("hello",), ("",), (None,)], "text string"
    )
    out = df.select(F.size(hashed_features(F.col("text"))).alias("n")).collect()
    # "a b c": 3 unigrams + 2 bigrams; "hello": 1 + 0; "": size 0;
    # NULL text -> NULL array (size -1 under legacy sizeOfNull=false? no:
    # size(NULL) is NULL here because ansi returns null) -> accept None
    ns = [r.n for r in out]
    assert ns[0] == 5 and ns[1] == 1 and ns[2] == 0
    assert ns[3] in (None, -1)


def test_score_mean_pools_unweighted_features(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # find the actual feature id of unigram "a" via the same hashing
    fid_a = docs.select(
        F.element_at(hashed_features(F.lit("a"), n_buckets=64), 1).alias("f")
    ).head().f
    weights = spark.createDataFrame([(fid_a, 3.0)], "feature long, weight double")
    row = linear_classifier_score(
        docs, weights, n_buckets=64
    ).head()
    # grams: a, b, "a b" -> 3 features, one carries weight 3.0 (unless the
    # other two grams collide into fid_a in 64 buckets — then the margin
    # grows in steps of 1.0; accept the collision-consistent values)
    assert row.n_features == 3
    candidates = {1.0, 2.0, 3.0}  # 1, 2, or 3 grams landing on fid_a
    assert any(
        math.isclose(row.score, 1.0 / (1.0 + math.exp(-m))) for m in candidates
    )


def test_degenerate_documents_score_bias(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
    )
    weights = spark.createDataFrame([(0, 5.0)], "feature long, weight double")
    rows = {r.doc_id: r for r in linear_classifier_score(docs, weights).collect()}
    for i in (1, 2, 3):
        assert rows[i].n_features == 0
        assert math.isclose(rows[i].score, 0.5)
    # and a nonzero bias shifts them to sigmoid(bias)
    rows_b = {
        r.doc_id: r
        for r in linear_classifier_score(docs, weights, bias=2.0).collect()
    }
    assert math.isclose(rows_b[1].score, 1.0 / (1.0 + math.exp(-2.0)))


def test_weights_join_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} common text") for i in range(50)],
        "doc_id long, text string",
    )
    weights = spark.range(256).select(
        F.col("id").alias("feature"), (F.col("id") * 0.01).alias("weight")
    )
    out = linear_classifier_score(docs, weights, n_buckets=256)
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
