"""Incremental dedup: DigestIndex lifecycle + Bloom-prefiltered probe.

The invariants, per operators/incremental.py's contract:
- exact results (Bloom prunes work, never decides membership);
- a fresh index passes everything through;
- add(survivors) -> re-probe drops everything (the mark-seen loop);
- deliberately undersized Bloom geometry (FPR ~1) still yields exact
  results via the verify join;
- NULL digests always survive;
- compact() preserves answers and restores segment count;
- probe plan: both joins broadcast, never sort-merge.
"""

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.incremental import (
    DigestIndex,
    incremental_dedup,
)
from tests.conftest import plan_str


def _docs(spark, ids_and_texts):
    return spark.createDataFrame(ids_and_texts, "doc_id long, text string")


@pytest.fixture()
def corpus(spark):
    # 40 docs; texts repeat every 10 ids -> ids 0-9 define the content
    # universe, everything later is a cross-batch duplicate.
    return _docs(spark, [(i, f"text number {i % 10}") for i in range(40)])


def test_fresh_index_passes_everything(spark, corpus, tmp_path):
    idx = DigestIndex.create(spark, str(tmp_path / "idx"), n_shards=4)
    out = incremental_dedup(corpus, idx, digest=F.md5("text"))
    assert out.count() == 40
    assert out.columns == ["doc_id", "text"]


def test_probe_matches_exact_anti_join(spark, corpus, tmp_path):
    idx = DigestIndex.create(spark, str(tmp_path / "idx"), n_shards=4)
    seed = corpus.filter(F.col("doc_id") < 7)  # contents 0..6 seen
    idx.add(F.md5("text"), seed)

    out = incremental_dedup(corpus, idx, digest=F.md5("text"))
    expected = corpus.join(
        seed.select(F.md5("text").alias("d")),
        F.md5(corpus["text"]) == F.col("d"),
        "left_anti",
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in expected.collect()
    )
    # contents 7,8,9 at ids {7,8,9,17,18,19,27,28,29,37,38,39}
    assert out.count() == 12


def test_mark_seen_loop(spark, corpus, tmp_path):
    idx = DigestIndex.create(spark, str(tmp_path / "idx"), n_shards=4)
    batch1 = corpus.filter(F.col("doc_id") < 20)
    survivors1 = incremental_dedup(batch1, idx, digest=F.md5("text"))
    assert survivors1.count() == 20  # fresh index
    idx.add(F.md5("text"), survivors1)

    batch2 = corpus.filter(F.col("doc_id") >= 20)  # all contents already seen
    survivors2 = incremental_dedup(batch2, idx, digest=F.md5("text"))
    assert survivors2.count() == 0

    # and a genuinely new document still gets through
    batch3 = _docs(spark, [(99, "brand new text")])
    assert incremental_dedup(batch3, idx, digest=F.md5("text")).count() == 1


def test_saturated_bloom_stays_exact(spark, tmp_path):
    # capacity=1 in one shard -> m floors at 64 bits; 60 distinct seen
    # contents x 7 hashes saturate it (est_fpr ~1), so nearly every batch
    # digest becomes a candidate — results must still be exact.
    idx = DigestIndex.create(
        spark, str(tmp_path / "idx"), n_shards=1, capacity=1
    )
    seen = _docs(spark, [(i, f"seen {i}") for i in range(60)])
    idx.add(F.md5("text"), seen)
    assert idx.stats()["est_fpr"] > 0.9
    batch = _docs(
        spark,
        [(i, f"seen {i}") for i in range(0, 60, 2)]
        + [(100 + i, f"new {i}") for i in range(30)],
    )
    out = incremental_dedup(batch, idx, digest=F.md5("text"))
    assert sorted(r.doc_id for r in out.collect()) == list(range(100, 130))


def test_null_digests_survive(spark, tmp_path):
    idx = DigestIndex.create(spark, str(tmp_path / "idx"), n_shards=2)
    idx.add(F.md5("text"), _docs(spark, [(1, "seen")]))
    batch = _docs(spark, [(2, "seen"), (3, None), (4, None)])
    out = incremental_dedup(batch, idx, digest=F.md5("text"))
    assert sorted(r.doc_id for r in out.collect()) == [3, 4]
    # add() must also have refused to index NULL
    assert idx.digests().filter(F.col("digest").isNull()).count() == 0


def test_add_returns_distinct_count_and_open_roundtrip(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    idx = DigestIndex.create(spark, path, n_shards=4, capacity=100)
    n = idx.add(F.md5("text"), corpus)  # 40 rows, 10 distinct contents
    assert n == 10

    reopened = DigestIndex.open(spark, path)
    assert (reopened.n_shards, reopened.m_per_shard, reopened.n_hashes) == (
        idx.n_shards,
        idx.m_per_shard,
        idx.n_hashes,
    )
    assert incremental_dedup(corpus, reopened, digest=F.md5("text")).count() == 0


def test_compact_preserves_answers(spark, corpus, tmp_path):
    idx = DigestIndex.create(spark, str(tmp_path / "idx"), n_shards=4)
    for lo, hi in [(0, 3), (3, 6), (0, 6)]:  # overlapping appends
        idx.add(
            F.md5("text"),
            corpus.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ),
        )
    before = sorted(
        r.doc_id
        for r in incremental_dedup(corpus, idx, digest=F.md5("text")).collect()
    )
    # three appends -> at least three segment rows (one per touched shard
    # per append) before compaction collapses them
    assert spark.read.parquet(idx._p("bloom")).count() >= 3

    idx.compact()
    stats = idx.stats()
    assert stats["n_digests"] == 6  # distinct contents 0..5
    assert spark.read.parquet(idx._p("bloom")).count() <= idx.n_shards
    after = sorted(
        r.doc_id
        for r in incremental_dedup(corpus, idx, digest=F.md5("text")).collect()
    )
    assert before == after


def test_batch_with_own_digest_column(spark, tmp_path):
    """A batch that precomputed its digests into a column literally named
    'digest' must not make the anti-join ambiguous (regression)."""
    idx = DigestIndex.create(spark, str(tmp_path / "idx"), n_shards=2)
    pre = _docs(spark, [(1, "seen"), (2, "new")]).withColumn(
        "digest", F.md5("text")
    )
    idx.add(F.md5("text"), _docs(spark, [(0, "seen")]))
    out = incremental_dedup(pre, idx, digest=F.col("digest"))
    assert [r.doc_id for r in out.collect()] == [2]
    assert "digest" in out.columns  # caller's column untouched


def test_probe_plan_is_broadcast_only(spark, corpus, tmp_path):
    idx = DigestIndex.create(spark, str(tmp_path / "idx"), n_shards=4)
    idx.add(F.md5("text"), corpus.filter(F.col("doc_id") < 7))
    out = incremental_dedup(corpus, idx, digest=F.md5("text"))
    out.collect()  # AQE: final plan only after execution
    plan = plan_str(out)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # semi (index) + anti (batch)


def test_interleaved_writers_commute(spark, tmp_path):
    """Concurrency contract (class docstring): two DigestIndex handles
    over the SAME path interleaving add() calls must commute — every
    append lands in new part files and Bloom segments OR-merge at load,
    so a fresh handle sees the union regardless of interleaving, with no
    false negatives on probe. (The two handles stand in for two writer
    processes; Spark append mode gives the same file-level isolation
    either way.)"""
    path = str(tmp_path / "idx")
    DigestIndex.create(spark, path, n_shards=4, capacity=1000)
    wa = DigestIndex.open(spark, path)
    wb = DigestIndex.open(spark, path)
    batches = {
        "a1": [(i, f"alpha {i}") for i in range(10)],
        "b1": [(i, f"beta {i}") for i in range(10)],
        "a2": [(i, f"alpha {i}") for i in range(5, 15)],  # overlaps a1
        "b2": [(i, f"gamma {i}") for i in range(10)],
    }
    # interleave: A, B, A, B — each add() goes through a different handle
    wa.add(F.md5("text"), source=_docs(spark, batches["a1"]))
    wb.add(F.md5("text"), source=_docs(spark, batches["b1"]))
    wa.add(F.md5("text"), source=_docs(spark, batches["a2"]))
    wb.add(F.md5("text"), source=_docs(spark, batches["b2"]))
    # a fresh reader sees the union: every previously-added text is a
    # known duplicate (no false negatives), a genuinely new one survives
    reader = DigestIndex.open(spark, path)
    seen = [t for rows in batches.values() for t in rows]
    probe = _docs(spark, [(100 + i, t) for i, (_, t) in enumerate(seen)])
    assert incremental_dedup(probe, reader, digest=F.md5("text")).count() == 0
    fresh = _docs(spark, [(999, "delta brand new")])
    assert incremental_dedup(fresh, reader, digest=F.md5("text")).count() == 1
    # the digest table holds the union (multiplicity from the a1/a2
    # overlap is allowed; distinct must equal the content universe)
    texts = {t for _, t in seen}
    assert reader.digests().distinct().count() == len(texts)
