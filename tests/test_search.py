"""Lexical retrieval operators (operators/search.py): BM25 scoring against
a hand-computed oracle, inverted-index postings correctness, and the
plan-shape guarantees (tf leg zero-shuffle, TakeOrdered top-k, corpus
untouched at keyword-query time)."""

import math

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.search import (
    bm25_scores,
    bm25_topk,
    build_inverted_index,
    keyword_search,
)

DOCS = [
    (1, "spark merge window spark"),
    (2, "merge batch row"),
    (3, "the quick brown fox"),
    (4, ""),
    (5, "spark spark spark spark spark"),
    (6, "window   merge"),  # multiple spaces: split on \s+
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _py_bm25(query, k1=1.2, b=0.75):
    """Independent driver-side reference implementation."""
    toks = {d: t.lower().split() for d, t in DOCS}
    n = len(toks)
    dls = {d: len(w) for d, w in toks.items()}
    avgdl = sum(dls.values()) / n
    out = {}
    for d, words in toks.items():
        score = 0.0
        for term in sorted(set(query)):
            tf = words.count(term)
            df = sum(1 for w in toks.values() if term in w)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
        out[d] = round(score, 6)
    return out


def test_bm25_matches_reference_formula(docs):
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, ["spark", "merge"]).collect()
    }
    want = _py_bm25(["spark", "merge"])
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-6), d


def test_bm25_empty_doc_scores_zero(docs):
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert got[4] == 0.0
    assert got[3] == 0.0  # no query term present


def test_bm25_duplicate_terms_collapse(docs):
    once = bm25_scores(docs, ["spark"]).collect()
    twice = bm25_scores(docs, ["spark", "SPARK"]).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_bm25_topk_deterministic_cut(docs):
    top2 = bm25_topk(docs, ["spark", "merge"], k=2).collect()
    want = sorted(_py_bm25(["spark", "merge"]).items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["doc_id"], r["bm25"]) for r in top2] == [
        (d, pytest.approx(s, abs=1e-6)) for d, s in want[:2]
    ]


def test_bm25_rejects_empty_query(docs):
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_bm25_tf_leg_is_zero_shuffle(docs):
    """The per-document feature projection must ride the scan: the only
    exchanges in the full plan are the singleton stats aggregate and its
    broadcast back — never a repartition of the corpus."""
    from tests.conftest import plan_str

    plan = plan_str(bm25_scores(docs, ["spark", "merge"]))
    # the corpus-side leg may be hash-partitioned only by the stats
    # aggregate's single-row reduction; no Exchange hashpartitioning of
    # doc rows is allowed
    assert "Exchange hashpartitioning(doc_id" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_bm25_topk_plans_take_ordered(docs):
    from tests.conftest import plan_str

    assert "TakeOrderedAndProject" in plan_str(bm25_topk(docs, ["spark"], k=3))


def test_inverted_index_postings(docs):
    rows = {
        r["token"]: (r["df"], r["postings"])
        for r in build_inverted_index(docs).collect()
    }
    assert rows["spark"] == (2, [1, 5])
    assert rows["merge"] == (3, [1, 2, 6])
    assert rows["window"] == (2, [1, 6])
    assert "" not in rows  # empty doc contributes nothing


def test_inverted_index_min_df(docs):
    rows = {r["token"] for r in build_inverted_index(docs, min_df=2).collect()}
    assert "spark" in rows and "fox" not in rows


def test_keyword_search_any_and_all(docs):
    idx = build_inverted_index(docs)
    any_hits = {
        r["doc_id"]: r["n_matched"]
        for r in keyword_search(idx, ["spark", "window"]).collect()
    }
    assert any_hits == {1: 2, 5: 1, 6: 1}
    all_hits = {
        r["doc_id"]
        for r in keyword_search(idx, ["spark", "window"], mode="all").collect()
    }
    assert all_hits == {1}


def test_keyword_search_validates(docs):
    idx = build_inverted_index(docs)
    with pytest.raises(ValueError):
        keyword_search(idx, ["x"], mode="or")
    with pytest.raises(ValueError):
        keyword_search(idx, [])


def test_bm25_null_text_scores_zero(spark):
    """NULL text must behave exactly like empty text: score 0.0, dl = 0,
    and the row still counts toward N/avgdl (coalesce-to-'' convention,
    same as curation.py). Without the guard a NULL row poisons avgdl and
    every tf under ANSI mode."""
    docs = spark.createDataFrame(
        [(1, "spark merge"), (2, None), (3, "spark")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert got[2] == 0.0
    assert got[1] is not None and got[1] > 0
    # oracle with the NULL row treated as "" (n=3, avgdl=(2+0+1)/3)
    n, avgdl = 3, 1.0
    df_ = 2
    idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
    for d, tf, dl in ((1, 1.0, 2.0), (3, 1.0, 1.0)):
        want = round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
        assert got[d] == pytest.approx(want, abs=1e-6), d


def test_bm25_all_blank_corpus_no_divide_by_zero(spark):
    """avgdl == 0 (every doc blank/NULL) must yield 0.0 scores, not an
    ANSI DIVIDE_BY_ZERO error."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert got == {1: 0.0, 2: 0.0, 3: 0.0}


def test_inverted_index_single_shuffle(docs):
    """The default build must dedup inside partial aggregation (collect_set)
    — exactly one wide exchange, no separate distinct pass."""
    from tests.conftest import plan_str

    plan = plan_str(build_inverted_index(docs))
    assert plan.count("Exchange hashpartitioning") == 1


def test_inverted_index_max_df_two_pass(docs):
    """max_df drops hot tokens before any postings array is built and the
    kept rows match the single-pass build exactly."""
    full = {
        r["token"]: (r["df"], r["postings"])
        for r in build_inverted_index(docs).collect()
    }
    capped = {
        r["token"]: (r["df"], r["postings"])
        for r in build_inverted_index(docs, max_df=2).collect()
    }
    assert "merge" in full and "merge" not in capped  # df=3 > max_df
    assert capped == {t: v for t, v in full.items() if v[0] <= 2}
    with pytest.raises(ValueError):
        build_inverted_index(docs, min_df=3, max_df=2)


def test_inverted_index_min_and_max_df(docs):
    rows = {
        r["token"]: r["df"]
        for r in build_inverted_index(docs, min_df=2, max_df=2).collect()
    }
    assert rows and all(v == 2 for v in rows.values())
    assert "fox" not in rows and "merge" not in rows


def test_keyword_search_missing_terms_error(docs):
    """AND-mode over a pruned index: 'empty' stays silent (plain AND),
    'error' names the absent terms."""
    idx = build_inverted_index(docs, min_df=2)  # prunes 'fox' (hapax)
    assert keyword_search(idx, ["fox", "spark"], mode="all").count() == 0
    with pytest.raises(ValueError, match="fox"):
        keyword_search(idx, ["fox", "spark"], mode="all", missing_terms="error")
    # present terms pass the check and return the AND result
    hits = {
        r["doc_id"]
        for r in keyword_search(
            idx, ["spark", "window"], mode="all", missing_terms="error"
        ).collect()
    }
    assert hits == {1}
    with pytest.raises(ValueError):
        keyword_search(idx, ["spark"], missing_terms="sometimes")


def test_bm25_full_length_normalization_with_empty_doc(spark):
    """Review finding r8: b=1.0 makes an empty doc's norm 0, and with
    tf=0 the contribution was 0.0/0.0 — DIVIDE_BY_ZERO under ANSI. The
    tf>0 short-circuit returns the mathematically-correct 0.0 instead."""
    docs = spark.createDataFrame(
        [(1, "spark merge"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, ["spark"], b=1.0).collect()
    }
    assert got[2] == 0.0 and got[3] == 0.0
    # the non-empty doc still scores by the standard formula (b=1.0)
    n, avgdl, df_, tf, dl = 3, 2.0 / 3.0, 1, 1.0, 2.0
    idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
    want = round(idf * tf * 2.2 / (tf + 1.2 * (dl / avgdl)), 6)
    assert got[1] == pytest.approx(want, abs=1e-6)


def test_keyword_search_missing_terms_error_any_mode(docs):
    """missing_terms='error' must fire in OR mode too — a pruned term
    silently missing from an OR result is the same footgun."""
    idx = build_inverted_index(docs, min_df=2)  # prunes 'fox'
    with pytest.raises(ValueError, match="fox"):
        keyword_search(idx, ["fox", "spark"], mode="any", missing_terms="error")
    hits = {
        r["doc_id"]
        for r in keyword_search(
            idx, ["spark"], mode="any", missing_terms="error"
        ).collect()
    }
    assert hits == {1, 5}


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion
# ---------------------------------------------------------------------------

def test_rrf_fuse_hand_computed(spark):
    from mortar_parquet_support_spark.operators.search import rrf_fuse

    r1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rank int"
    )
    out = {r.doc_id: r for r in rrf_fuse([r1, r2], k=60).collect()}
    assert math.isclose(out[20].rrf_score, 1 / 62 + 1 / 61)
    assert math.isclose(out[10].rrf_score, 1 / 61)
    assert math.isclose(out[40].rrf_score, 1 / 62)
    assert out[20].n_sources == 2 and out[10].n_sources == 1
    # doc 20 (present in both) outranks every single-source doc
    best = max(out.values(), key=lambda r: r.rrf_score)
    assert best.doc_id == 20


def test_rrf_fuse_weights_and_validation(spark):
    from mortar_parquet_support_spark.operators.search import rrf_fuse

    r1 = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    r2 = spark.createDataFrame([(2, 1)], "doc_id long, rank int")
    out = {
        r.doc_id: r.rrf_score
        for r in rrf_fuse([r1, r2], k=10, weights=[2.0, 1.0]).collect()
    }
    assert math.isclose(out[1], 2.0 / 11) and math.isclose(out[2], 1.0 / 11)
    # NULL ranks mean "absent from this leg": no contribution, and NOT
    # counted in n_sources (review finding)
    rn = spark.createDataFrame([(1, None), (2, 1)], "doc_id long, rank int")
    out_n = {r.doc_id: r for r in rrf_fuse([r1, rn], k=10).collect()}
    assert out_n[1].n_sources == 1 and math.isclose(out_n[1].rrf_score, 1 / 11)
    assert out_n[2].n_sources == 1
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([r1, r2], weights=[1.0])
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([r1], k=0)


def test_rrf_fuse_single_shuffle(spark):
    from mortar_parquet_support_spark.operators.search import rrf_fuse
    from tests.conftest import plan_str

    r1 = spark.createDataFrame([(i, i + 1) for i in range(5)], "doc_id long, rank int")
    r2 = spark.createDataFrame([(i * 2, i + 1) for i in range(5)], "doc_id long, rank int")
    out = rrf_fuse([r1, r2])
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    # one hash aggregate exchange over the union — nothing else
    assert plan.count("Exchange") <= 2  # shuffle + possible AQE read marker


def test_rrf_fuse_repeated_id_within_leg_collapses_to_min_rank(spark):
    """An id repeated within a single leg must contribute once, at its
    best rank, and count once in n_sources (review finding: repeats
    previously inflated both the score and the source count)."""
    from mortar_parquet_support_spark.operators.search import rrf_fuse

    r1 = spark.createDataFrame(
        [(10, 3), (10, 1), (20, 2)], "doc_id long, rank int"
    )
    r2 = spark.createDataFrame([(10, 2)], "doc_id long, rank int")
    out = {r.doc_id: r for r in rrf_fuse([r1, r2], k=60).collect()}
    assert math.isclose(out[10].rrf_score, 1 / 61 + 1 / 62)
    assert out[10].n_sources == 2
    assert math.isclose(out[20].rrf_score, 1 / 62)
    assert out[20].n_sources == 1


def test_phrase_search_overlaps_and_pruning(spark):
    """phrase_search: consecutive-run semantics, overlapping occurrences
    counted, duplicate phrase tokens handled via distinct offsets, casefold
    parity with the shared tokenizer, and no text rescan (the probe reads
    only the postings)."""
    from mortar_parquet_support_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick fox the quick dog"),
            (2, "quick the quick the quick"),   # 'the quick' twice
            (3, "THE QUICK"),                    # casefolded match
            (4, "the slow quick"),               # not consecutive
            (5, "a a a"),                        # overlapping dup-token runs
            (6, None),
        ],
        "doc_id long, text string",
    )
    idx = build_positional_index(docs)
    got = {r.doc_id: r.n_occurrences for r in phrase_search(idx, "the quick").collect()}
    assert got == {1: 2, 2: 2, 3: 1}
    got_aa = {r.doc_id: r.n_occurrences for r in phrase_search(idx, "a a").collect()}
    assert got_aa == {5: 2}  # overlapping anchors both count
    assert phrase_search(idx, "missing phrase").count() == 0
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one"):
        phrase_search(idx, "   ")
