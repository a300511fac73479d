"""Round-10 training-layout operators: global_shuffle (deterministic
corpus shuffle -> shard/pos), quantile_buckets (per-group NTILE
stratification), length_bucket_batches (padding-minimizing fixed-count
batching), hard_negatives (ANN negative mining with exclusions)."""

import hashlib

import pytest
from pyspark.sql import functions as F


def test_global_shuffle_deterministic_and_complete(spark):
    from mortar_parquet_support_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    out = global_shuffle(df, "id", shards=8, salt="e0:")
    rows = [(r.id, r.shard, r.pos) for r in out.collect()]
    assert len(rows) == 500  # every row exactly once
    assert len({r[0] for r in rows}) == 500
    # shards in range; positions are 1..count(shard) dense per shard
    by_shard = {}
    for rid, sh, pos in rows:
        assert 0 <= sh < 8
        by_shard.setdefault(sh, []).append(pos)
    for sh, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), sh
    # pure function of (id, salt): re-run identical even repartitioned
    again = {
        (r.id): (r.shard, r.pos)
        for r in global_shuffle(
            df.repartition(13), "id", shards=8, salt="e0:"
        ).collect()
    }
    assert {(rid): (sh, pos) for rid, sh, pos in rows} == again
    # matches the documented md5 recipe exactly (python replay)
    def replay(rid):
        h = hashlib.md5(f"e0:{rid}".encode()).hexdigest()
        return int(h[:8], 16) % 8, h

    expect_order = {}
    for rid, sh, pos in rows:
        esh, eh = replay(rid)
        assert sh == esh, rid
        expect_order.setdefault(sh, []).append((eh, rid, pos))
    for sh, items in expect_order.items():
        items.sort()
        assert [pos for _h, _i, pos in items] == list(
            range(1, len(items) + 1)
        ), sh
    # a different salt is a genuinely different permutation
    other = {
        r.id: (r.shard, r.pos)
        for r in global_shuffle(df, "id", shards=8, salt="e1:").collect()
    }
    assert other != again
    with pytest.raises(ValueError, match="shards"):
        global_shuffle(df, "id", shards=0)
    with pytest.raises(ValueError, match="rename"):
        global_shuffle(df.withColumn("pos", F.lit(1)), "id", shards=2)


def test_quantile_buckets_ntile_semantics(spark):
    from mortar_parquet_support_spark.operators.features import (
        quantile_buckets,
    )

    rows = [("a", i, float(i)) for i in range(10)] + [
        ("b", 100 + i, float(i % 3)) for i in range(7)
    ] + [("a", 999, None)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = {
        r.id: r.bucket
        for r in quantile_buckets(
            df, value="v", tie_col="id", keys=["g"], buckets=4
        ).collect()
    }
    # group a: 10 non-null rows into 4 buckets -> sizes 3,3,2,2 in value
    # order (standard NTILE remainder-first)
    assert [out[i] for i in range(10)] == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # NULL value -> NULL bucket, row preserved
    assert out[999] is None
    # group b ties broken by id: values 0,1,2,0,1,2,0 sorted by (v, id)
    b_sorted = sorted(
        [(i % 3, 100 + i) for i in range(7)]
    )  # [(0,100),(0,103),(0,106),(1,101),(1,104),(2,102),(2,105)]
    expect = {}
    sizes = [2, 2, 2, 1]  # 7 rows, 4 buckets
    pos = 0
    for b_idx, n in enumerate(sizes, start=1):
        for _ in range(n):
            expect[b_sorted[pos][1]] = b_idx
            pos += 1
    assert {i: out[i] for i in expect} == expect
    with pytest.raises(ValueError, match="buckets"):
        quantile_buckets(df, value="v", tie_col="id", buckets=0)


def test_percentile_buckets_vs_exact_ntile(spark):
    """percentile_buckets (the zero-shuffle global stratification path):
    buckets monotone in value, populations near NTILE's on tie-free
    data, ties share a bucket, boundary values go LOWER, NULLs get NULL
    buckets, and the plan carries no window and no row-side Exchange."""
    from mortar_parquet_support_spark.operators.features import (
        percentile_buckets,
        quantile_buckets,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)] + [(999, None)],
        "id long, v double",
    )
    out = {
        r.id: r.bucket
        for r in percentile_buckets(df, value="v", buckets=4).collect()
    }
    assert out[999] is None
    # tie-free uniform data: the approximate split equals exact NTILE
    exact = {
        r.id: r.bucket
        for r in quantile_buckets(
            df, value="v", tie_col="id", buckets=4
        ).collect()
    }
    assert {i: out[i] for i in range(100)} == {
        i: exact[i] for i in range(100)
    }
    # monotone: sorted by value, buckets never decrease
    seq = [out[i] for i in range(100)]
    assert seq == sorted(seq) and set(seq) == {1, 2, 3, 4}
    # heavy ties: equal values always share a bucket (the documented
    # divergence from NTILE's forced equal counts)
    ties = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(50)], "id long, v double"
    )
    tout = percentile_buckets(ties, value="v", buckets=4)
    per_value = {
        r.v: r.n
        for r in tout.groupBy("v").agg(
            F.countDistinct("bucket").alias("n")
        ).collect()
    }
    assert per_value == {0.0: 1, 1.0: 1}
    # keys variant: per-group boundaries, groups isolated
    g = spark.createDataFrame(
        [("a", i, float(i)) for i in range(8)]
        + [("b", 100 + i, float(1000 + i)) for i in range(8)],
        "g string, id long, v double",
    )
    gout = {
        r.id: r.bucket
        for r in percentile_buckets(
            g, value="v", keys=["g"], buckets=2
        ).collect()
    }
    assert [gout[i] for i in range(8)] == [1, 1, 1, 1, 2, 2, 2, 2]
    assert [gout[100 + i] for i in range(8)] == [1, 1, 1, 1, 2, 2, 2, 2]
    # NULL key group: stratified like any other, never dropped
    # (regression, r11 review — the quantile_buckets contract)
    gnull = g.unionByName(spark.createDataFrame(
        [(None, 200 + i, float(i)) for i in range(4)],
        "g string, id long, v double",
    ))
    nout = {
        r.id: r.bucket
        for r in percentile_buckets(
            gnull, value="v", keys=["g"], buckets=2
        ).collect()
    }
    assert len(nout) == 20  # all rows survive
    assert [nout[200 + i] for i in range(4)] == [1, 1, 2, 2]
    # plan shape: no Window, and the only exchange feeds the tiny
    # bounds aggregate / broadcast — never a row-side repartition
    plan = percentile_buckets(
        df, value="v", buckets=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    import pytest as _pt

    with _pt.raises(ValueError, match="buckets"):
        percentile_buckets(df, value="v", buckets=0)
    with _pt.raises(ValueError, match="rename first"):
        percentile_buckets(
            df.withColumn("bucket", F.lit(1)), value="v", buckets=2
        )


def test_length_bucket_batches_layout(spark):
    from mortar_parquet_support_spark.operators.curation import (
        length_bucket_batches,
    )

    # costs 0..39 -> buckets of width 16: 0,1,2; shard = id % 2
    df = spark.createDataFrame(
        [(i, i) for i in range(40)], "id long, cost long"
    )
    out = [
        (r.id, r.shard, r.bucket, r.batch)
        for r in length_bucket_batches(
            df, id_col="id", cost_col="cost", bucket_width=16,
            batch_size=3, shards=2,
        ).collect()
    ]
    assert len(out) == 40
    for rid, sh, bu, ba in out:
        assert sh == rid % 2 and bu == rid // 16
    # within (shard, bucket), batches are 0-based thirds in id order
    groups = {}
    for rid, sh, bu, ba in out:
        groups.setdefault((sh, bu), []).append((rid, ba))
    for key, items in groups.items():
        items.sort()
        for idx, (_rid, ba) in enumerate(items):
            assert ba == idx // 3, (key, items)
    # padding bound: every batch spans < bucket_width of cost
    spans = {}
    for rid, sh, bu, ba in out:
        spans.setdefault((sh, bu, ba), []).append(rid)  # cost == id
    for key, cs in spans.items():
        assert max(cs) - min(cs) < 16, key
    # NULL cost fails loudly at action time (in-plan raise)
    with pytest.raises(Exception, match="NULL cost"):
        length_bucket_batches(
            spark.createDataFrame([(1, None)], "id long, cost long"),
            id_col="id", cost_col="cost", bucket_width=4, batch_size=2,
        ).collect()
    with pytest.raises(ValueError, match="rename"):
        length_bucket_batches(
            df.withColumn("batch", F.lit(0)), id_col="id",
            cost_col="cost", bucket_width=4, batch_size=2,
        )


def test_hard_negatives_excludes_and_ranks(spark):
    from mortar_parquet_support_spark.operators.similarity import (
        cosine_topk,
        hard_negatives,
    )

    # 1-D embeddings make cosine degenerate; use 2-D points on an arc so
    # similarity order is the angular order, hand-checkable
    import math

    corpus = spark.createDataFrame(
        [
            (i, [math.cos(i * 0.1), math.sin(i * 0.1)])
            for i in range(12)
        ],
        "vec_id long, embedding array<double>",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (5, 4), (5, 6)], "query_id long, pos_id long"
    )
    out = hard_negatives(corpus, pairs, k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for q in got:
        got[q].sort()
    # query 0: nearest by angle are 1 (excluded), 2, 3, 4 -> negatives 2,3,4
    assert [n for _rk, n in got[0]] == [2, 3, 4]
    # query 5: 4 and 6 excluded (equidistant nearest), then 3,7,2|8...
    neg5 = [n for _rk, n in got[5]]
    assert 4 not in neg5 and 6 not in neg5 and 5 not in neg5
    assert set(neg5) == {3, 7, 2} or set(neg5) == {3, 7, 8}
    # ranks are dense 1..k
    for q, items in got.items():
        assert [rk for rk, _n in items] == [1, 2, 3], q
    # never more than k, never the query itself, consistent with raw topk
    raw = cosine_topk(
        corpus, corpus.filter(F.col("vec_id") == 0), k=5
    ).collect()
    assert all(r.neighbor_id != 0 for r in raw)
    with pytest.raises(ValueError, match="overfetch"):
        hard_negatives(corpus, pairs, k=5, overfetch=5)


def test_weighted_sample_k_distribution_and_determinism(spark):
    """weighted_sample_k: exact k per group, pure function of
    (id, salt, weight), zero/NULL/NaN weights excluded, and the A-ES
    property — selection frequency across independent salts tracks
    weight (the heavy item appears far more often than a light one)."""
    from mortar_parquet_support_spark.operators.sampling import (
        weighted_sample_k,
    )

    rows = [(i, "g", 10.0 if i < 5 else 1.0) for i in range(50)] + [
        (100, "g", None),
        (101, "g", float("nan")),
        (102, "g", 0.0),
        (103, "g", -3.0),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    out = weighted_sample_k(df, "id", "w", 8, by=["grp"], salt="s0")
    ids = sorted(r.id for r in out.collect())
    assert len(ids) == 8
    assert not {100, 101, 102, 103} & set(ids)  # no-mass rows never win
    # re-run, repartitioned: identical
    again = sorted(
        r.id
        for r in weighted_sample_k(
            df.repartition(7), "id", "w", 8, by=["grp"], salt="s0"
        ).collect()
    )
    assert ids == again
    # frequency tracks weight: across 30 salts, the 5 heavy ids (w=10)
    # should each be picked far more often than an average light id
    heavy_hits = 0
    light_hits = 0
    for s in range(30):
        picked = {
            r.id
            for r in weighted_sample_k(
                df, "id", "w", 8, by=["grp"], salt=f"m{s}"
            ).collect()
        }
        heavy_hits += len(picked & set(range(5)))
        light_hits += len(picked - set(range(5)))
    # per-item rates; heavy items ~10x likelier per A-ES
    assert heavy_hits / 5 > 3 * (light_hits / 45)
    import pytest as _pt

    with _pt.raises(ValueError, match="k must be"):
        weighted_sample_k(df, "id", "w", 0)


def test_hard_negatives_multi_positive_exactness(spark):
    """Regression (r10 self-review): a query with MANY positives must
    still yield exactly k true negatives — the default overfetch is
    derived from the pair list's max fan-out, so the excluded rows can
    never crowd out a deserving negative."""
    import math

    from mortar_parquet_support_spark.operators.similarity import (
        hard_negatives,
    )

    corpus = spark.createDataFrame(
        [(i, [math.cos(i * 0.05), math.sin(i * 0.05)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    # query 0 excludes its 9 nearest (1..9): with the old fixed k+8
    # overfetch (k=3 -> 11), the head 1..9 + self leaves only 2 true
    # negatives — a silent undercount. Derived overfetch = 3 + 9 + 1.
    pairs = spark.createDataFrame(
        [(0, p) for p in range(1, 10)], "query_id long, pos_id long"
    )
    out = sorted(
        (r.rank, r.neighbor_id)
        for r in hard_negatives(corpus, pairs, k=3).collect()
    )
    # nearest non-excluded by angle from 0: 10, 11, 12
    assert [n for _rk, n in out] == [10, 11, 12]
    assert [rk for rk, _n in out] == [1, 2, 3]


def test_mmr_rerank_diversifies_and_is_deterministic(spark):
    """mmr_rerank: lam=1 reproduces relevance order; lam=0.5 demotes a
    near-duplicate of the first pick below a less-relevant-but-diverse
    candidate; ranks dense from 1; repartition-invariant."""
    import math

    from mortar_parquet_support_spark.operators.search import mmr_rerank

    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    # query 7: cand 1 (rel .99) and cand 2 (rel .98) nearly parallel;
    # cand 3 (rel .80) orthogonal. Pure relevance: 1,2,3. MMR(0.5):
    # 2's penalty ~cos(2deg)~1 -> mmr ~.49-.5~-.01; 3's ~.40-.5*0=.40
    rows = [
        (7, 1, vec(0.0), 0.99),
        (7, 2, vec(2.0), 0.98),
        (7, 3, vec(90.0), 0.80),
        (7, 4, None, 0.97),      # NULL vector dropped
        (7, 5, vec(45.0), None),  # NULL relevance dropped
    ]
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, embedding array<double>, cosine double"
    )
    got = sorted(
        (r.rank, r.neighbor_id)
        for r in mmr_rerank(df, k=3, lam=0.5).collect()
    )
    assert got == [(1, 1), (2, 3), (3, 2)]
    # lam = 1: pure relevance order
    pure = sorted(
        (r.rank, r.neighbor_id)
        for r in mmr_rerank(df, k=3, lam=1.0).collect()
    )
    assert pure == [(1, 1), (2, 2), (3, 3)]
    # repartition-invariant
    again = sorted(
        (r.rank, r.neighbor_id)
        for r in mmr_rerank(df.repartition(5), k=3, lam=0.5).collect()
    )
    assert again == got
    import pytest as _pt

    with _pt.raises(ValueError, match="lam"):
        mmr_rerank(df, k=3, lam=1.5)
    with _pt.raises(ValueError, match="k must"):
        mmr_rerank(df, k=0)


def test_mmr_rerank_negative_cosine_and_string_ids(spark):
    """Regression (r10 self-review): anti-similar candidates must get
    the full diversity boost (max_sim must not clamp negative cosines
    to 0), and non-integer id columns must work (schema follows input)."""
    from mortar_parquet_support_spark.operators.search import mmr_rerank

    # c1 picked first (rel .9). True MMR at lam=.5: c2 = .5*.5-.5*(-1)
    # = .75 beats c3 = .5*.55-.5*0 = .275 — the zero-clamp bug picked c3.
    rows = [
        ("q", "c1", [1.0, 0.0], 0.9),
        ("q", "c2", [-1.0, 0.0], 0.5),
        ("q", "c3", [0.0, 1.0], 0.55),
    ]
    df = spark.createDataFrame(
        rows,
        "query_id string, neighbor_id string, embedding array<double>, cosine double",
    )
    got = sorted(
        (r.rank, r.neighbor_id)
        for r in mmr_rerank(df, k=2, lam=0.5).collect()
    )
    assert got == [(1, "c1"), (2, "c2")]
    assert mmr_rerank(df, k=2, lam=0.5).schema["neighbor_id"].dataType.simpleString() == "string"
