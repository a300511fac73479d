"""Distributed PCA: fit == numpy reference, transform == numpy projection,
degenerate-row contract, save/load identity, zero-shuffle transform plan.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.embeddings import (
    PcaModel,
    l2_normalize,
    pca_fit,
    pca_transform,
)
from tests.conftest import plan_str


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def ref(emb):
    rows = sorted(emb.select("vec_id", "embedding").collect())
    x = np.asarray([r.embedding for r in rows], dtype=np.float64)
    return rows, x


def test_fit_matches_numpy(emb, ref):
    _, x = ref
    model = pca_fit(emb, k=8)
    cov = np.cov(x, rowvar=False)  # ddof=1
    evals, evecs = np.linalg.eigh(cov)
    top = np.argsort(evals)[::-1][:8]
    assert np.allclose(model.explained_variance, evals[top], rtol=1e-8)
    got = np.asarray(model.components)
    want = evecs[:, top].T
    # eigenvectors agree up to sign
    for g, w in zip(got, want):
        assert np.allclose(g, w, atol=1e-8) or np.allclose(g, -w, atol=1e-8)
    # orthonormal, descending variance, deterministic sign convention
    assert np.allclose(got @ got.T, np.eye(8), atol=1e-10)
    assert all(
        a >= b - 1e-12
        for a, b in zip(model.explained_variance, model.explained_variance[1:])
    )
    for row in got:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_transform_matches_numpy(emb, ref):
    rows, x = ref
    model = pca_fit(emb, k=4)
    out = {
        r.vec_id: r.pca
        for r in pca_transform(emb, model).select("vec_id", "pca").collect()
    }
    want = (x - np.asarray(model.mean)) @ np.asarray(model.components).T
    for r, w in zip(rows, want):
        assert np.allclose(out[r.vec_id], w, atol=1e-9)


def test_degenerate_vectors_null_but_kept(spark):
    base = [(i, [float(i), float(i % 3), 1.0]) for i in range(10)]
    df = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    model = pca_fit(df, k=2)
    bad = spark.createDataFrame(
        [
            (100, None),
            (101, [1.0, 2.0]),  # wrong length
            (102, [1.0, float("nan"), 3.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.pca
        for r in pca_transform(df.unionByName(bad), model).collect()
    }
    assert len(out) == 13
    assert out[100] is None and out[101] is None and out[102] is None
    assert out[0] is not None

    # and the fit itself excludes them: same model with or without junk rows
    model2 = pca_fit(df.unionByName(bad), k=2)
    assert np.allclose(model.components, model2.components, atol=1e-12)
    assert np.allclose(model.mean, model2.mean, atol=1e-12)


def test_save_load_roundtrip(spark, emb, tmp_path):
    model = pca_fit(emb, k=3)
    model.save(spark, str(tmp_path / "pca"))
    back = PcaModel.load(spark, str(tmp_path / "pca"))
    assert back == model


def test_transform_is_zero_shuffle(emb):
    model = pca_fit(emb, k=2)
    out = pca_transform(emb, model)
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    assert "Exchange" not in plan


def test_l2_normalize(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.n
        for r in df.select(
            "vec_id", l2_normalize("embedding").alias("n")
        ).collect()
    }
    assert out[1] is not None and math.isclose(out[1][0], 0.6)
    assert math.isclose(sum(v * v for v in out[1]), 1.0)
    assert out[2] == [None, None]  # zero norm: per-element try_divide nulls
    assert out[3] is None


# ---------------------------------------------------------------------------
# k-means: public fit wrapper + zero-shuffle literal-centroid assignment
# ---------------------------------------------------------------------------

def test_kmeans_assign_hand_computed(spark):
    from mortar_parquet_support_spark.operators.embeddings import kmeans_assign

    df = spark.createDataFrame(
        [
            (1, [0.5, 0.0]),     # near c0
            (2, [9.5, 10.0]),    # near c1
            (3, [5.0, 5.0]),     # EXACTLY equidistant -> tie -> c0
            (4, None),           # null vector -> null assignment
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [0.0, 0.0]), (1, [10.0, 10.0])]
    out = {r.vec_id: r for r in kmeans_assign(df, cents, metric="l2").collect()}
    assert out[1].cluster_id == 0 and math.isclose(out[1].dist, 0.25)
    assert out[2].cluster_id == 1 and math.isclose(out[2].dist, 0.25)
    assert out[3].cluster_id == 0  # tie keeps the smallest cluster_id
    assert out[4].cluster_id is None and out[4].dist is None


def test_kmeans_assign_cosine_and_validation(spark):
    from mortar_parquet_support_spark.operators.embeddings import (
        _MAX_PLAN_CELLS,
        kmeans_assign,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [0.1, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {
        r.vec_id: r
        for r in kmeans_assign(df, cents, metric="cosine").collect()
    }
    assert out[1].cluster_id == 0 and out[2].cluster_id == 1
    assert out[1].dist > 0.99  # cosine emits SIMILARITY, argmax
    with pytest.raises(ValueError, match="metric"):
        kmeans_assign(df, cents, metric="manhattan")
    with pytest.raises(ValueError, match="empty"):
        kmeans_assign(df, [])
    with pytest.raises(ValueError, match="NULL"):
        kmeans_assign(df, [(0, [1.0, None])])
    with pytest.raises(ValueError, match="NULL"):
        kmeans_assign(df, [(0, None)])  # whole-vector NULL: clean error
    big_dim = _MAX_PLAN_CELLS + 1
    with pytest.raises(ValueError, match="broadcast join"):
        kmeans_assign(df, [(0, [0.0] * big_dim)])


def test_kmeans_assign_degenerate_rows_stay_null(spark):
    """Review finding: zero-norm (cosine), NULL-element, and
    dimension-mismatched vectors must NOT be captured by the first
    centroid with a NULL distance — they keep NULL cluster/dist."""
    from mortar_parquet_support_spark.operators.embeddings import kmeans_assign

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),        # zero norm: cosine undefined
            (2, [1.0, None]),       # NULL element
            (3, [1.0, 0.0, 0.0]),   # dim mismatch vs 2-d centroids
            (4, [1.0, 0.1]),        # healthy control
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {r.vec_id: r for r in kmeans_assign(df, cents, metric="cosine").collect()}
    for bad in (1, 2, 3):
        assert out[bad].cluster_id is None and out[bad].dist is None
    assert out[4].cluster_id == 0
    # l2 mode: NULL element / dim mismatch also stay NULL
    out2 = {r.vec_id: r for r in kmeans_assign(df, cents, metric="l2").collect()}
    assert out2[2].cluster_id is None and out2[3].cluster_id is None
    assert out2[1].cluster_id == 0  # zero vector has a perfectly good L2 argmin


def test_kmeans_assign_is_zero_shuffle(spark):
    from mortar_parquet_support_spark.operators.embeddings import kmeans_assign

    df = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_assign(df, [(0, [0.0, 0.0]), (1, [10.0, -10.0])])
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    assert "Exchange" not in plan


def test_kmeans_centroids_recovers_planted_blobs(spark):
    from mortar_parquet_support_spark.operators.embeddings import (
        kmeans_assign,
        kmeans_centroids,
    )

    # spherical k-means clusters by DIRECTION: two angular blobs around
    # orthogonal axes (magnitude-separated blobs would not split)
    rng = np.random.default_rng(7)
    a = np.array([1.0, 0.0, 0.0]) + rng.normal(scale=0.05, size=(40, 3))
    b = np.array([0.0, 1.0, 0.0]) + rng.normal(scale=0.05, size=(40, 3))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(a)] + [
        (100 + i, [float(x) for x in v]) for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(df, k=2, iters=3, seed=1)
    rows_c = sorted((r.cluster_id, list(r.centroid)) for r in cents.collect())
    assert len(rows_c) == 2
    # each centroid sits near one of the axes
    lead = sorted(int(np.argmax(v)) for _, v in rows_c)
    assert lead == [0, 1]
    for _, v in rows_c:
        assert abs(max(v) - 1.0) < 0.2
    # cosine assignment against the fit splits the blobs exactly
    assigned = kmeans_assign(
        df, [(c, v) for c, v in rows_c], metric="cosine"
    ).collect()
    groups = {}
    for r in assigned:
        groups.setdefault(r.cluster_id, set()).add(r.vec_id)
    blobs = sorted(groups.values(), key=min)
    assert blobs[0] == set(range(40))
    assert blobs[1] == {100 + i for i in range(40)}
