"""MinHashIndex: persisted fuzzy-dedup index — near-dups of indexed docs
drop, novel docs survive, the mark-seen loop closes, reopen works, empty
docs always pass, and the probe never shuffles the index side.
"""

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.incremental import MinHashIndex
from tests.conftest import plan_str

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)
NEAR = (
    "the quick brown fox leaps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)
OTHER = (
    "completely different text about distributed query engines shuffling "
    "partitions across executors with adaptive execution enabled"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def idx(spark, tmp_path):
    idx = MinHashIndex.create(
        spark, str(tmp_path / "mh"), num_perm=64, bands=16
    )
    idx.add(_docs(spark, [(0, BASE)]), id_col="doc_id", text_col="text")
    return idx


def test_near_dup_drops_novel_survives(spark, idx):
    batch = _docs(spark, [(1, NEAR), (2, OTHER), (3, BASE)])
    out = idx.dedup(batch, id_col="doc_id", text_col="text")
    assert sorted(r.doc_id for r in out.collect()) == [2]

    m = idx.matches(batch, id_col="doc_id", text_col="text").collect()
    assert {r.batch_id for r in m} == {"1", "3"}
    exact = [r for r in m if r.batch_id == "3"][0]
    assert exact.sig_agreement == 1.0  # identical text -> identical sigs


def test_mark_seen_loop_and_reopen(spark, idx, tmp_path):
    batch = _docs(spark, [(2, OTHER)])
    survivors = idx.dedup(batch, id_col="doc_id", text_col="text")
    assert survivors.count() == 1
    idx.add(survivors, id_col="doc_id", text_col="text")

    reopened = MinHashIndex.open(spark, idx.path)
    assert (reopened.num_perm, reopened.bands) == (64, 16)
    # OTHER (and a near-variant of it) now match the extended index
    variant = OTHER.replace("enabled", "active")
    again = _docs(spark, [(10, OTHER), (11, variant), (12, BASE)])
    out = reopened.dedup(again, id_col="doc_id", text_col="text")
    assert out.count() == 0


def test_empty_docs_always_survive(spark, idx):
    batch = _docs(spark, [(1, ""), (2, None), (3, "   ")])
    out = idx.dedup(batch, id_col="doc_id", text_col="text")
    assert out.count() == 3


def test_threshold_dial(spark, idx):
    batch = _docs(spark, [(1, NEAR)])
    # NEAR differs by one word: high agreement, but below 1.0
    m = idx.matches(batch, id_col="doc_id", text_col="text", threshold=0.5)
    agr = m.head().sig_agreement
    assert 0.5 <= agr < 1.0
    strict = idx.dedup(batch, id_col="doc_id", text_col="text", threshold=0.999)
    assert strict.count() == 1  # survives a near-exact threshold


def test_probe_is_broadcast_only(spark, idx):
    batch = _docs(spark, [(1, NEAR), (2, OTHER)])
    out = idx.dedup(batch, id_col="doc_id", text_col="text")
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan


def test_compact_collapses_duplicates_and_preserves_answers(spark, tmp_path):
    idx = MinHashIndex.create(
        spark, str(tmp_path / "mh"), num_perm=64, bands=16
    )
    seed = _docs(spark, [(0, BASE), (1, OTHER)])
    for _ in range(3):  # overlapping appends -> duplicate sig rows
        idx.add(seed, id_col="doc_id", text_col="text")
    assert idx.sigs().count() == 6

    batch = _docs(spark, [(5, NEAR), (6, "novel text entirely " * 4)])
    before = sorted(
        r.doc_id
        for r in idx.dedup(batch, id_col="doc_id", text_col="text").collect()
    )
    idx.compact()
    assert idx.sigs().count() == 2
    after = sorted(
        r.doc_id
        for r in idx.dedup(batch, id_col="doc_id", text_col="text").collect()
    )
    assert before == after == [6]


def test_readded_ids_yield_one_match_row(spark, tmp_path):
    """An id added N times must not multiply matches() output — one row
    per (batch doc, indexed doc) pair (regression)."""
    idx = MinHashIndex.create(
        spark, str(tmp_path / "mh"), num_perm=64, bands=16
    )
    for _ in range(3):
        idx.add(_docs(spark, [(0, BASE)]), id_col="doc_id", text_col="text")
    m = idx.matches(
        _docs(spark, [(1, BASE)]), id_col="doc_id", text_col="text"
    ).collect()
    assert len(m) == 1
    assert (m[0].batch_id, m[0].index_id, m[0].sig_agreement) == ("1", "0", 1.0)
