"""Physical-plan regression guards: the optimizations SURVEY.md §4 promises
must actually appear in the executed plans — pushdown reaching the scan,
dimension joins staying broadcast, no accidental sort-merge or cartesian.

These assert on plan STRUCTURE, not timing, so they're stable across
machines while still failing loudly if a refactor silently de-optimizes a
query (e.g. a filter stops being pushable, a join loses its broadcast).
Bracket-content matching matters: Spark prints ``PartitionFilters: []`` /
``PushedFilters: []`` even when nothing is pushed, so substring checks on
the key alone are vacuous."""

import __spark_entry__ as entrymod
from tests.conftest import plan_str, scan_meta


def _plan(spark, name, sf_dir):
    return plan_str(entrymod.queries()[name](spark, sf_dir))


def test_flagship_pushdown_and_pruning(spark, sf_dir):
    p = _plan(spark, "flagship_scan", sf_dir)
    pushed = scan_meta(p, "PushedFilters")
    assert pushed is not None and "In(event_type" in pushed, p
    # column pruning: props (unused) must not be read
    assert "ReadSchema:" in p, p
    read_schema_line = p.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "props" not in read_schema_line


def test_dim_joins_broadcast_not_sortmerge(spark, sf_dir):
    for name in ["tpch_q3", "tpch_q5"]:
        p = _plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p
        assert "CartesianProduct" not in p


def test_semi_join_is_broadcast(spark, sf_dir):
    p = _plan(spark, "semi_join_ids", sf_dir)
    assert "LeftSemi" in p and "BroadcastHashJoin" in p


def test_new_tpch_joins_stay_broadcast(spark, sf_dir):
    for name in ["tpch_q10", "tpch_q14", "tpch_q18", "tpch_q19", "tpch_q4", "tpch_q7", "tpch_q12", "tpch_q16", "tpch_q8", "tpch_q13", "tpch_q15", "tpch_q17", "tpch_q22"]:
        p = _plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name
        assert "CartesianProduct" not in p, name


def test_partsupp_tpch_joins_stay_broadcast(spark, sf_dir):
    """The five derived-partsupp shapes that completed the 22: dimension
    sides broadcast, no sort-merge, no cartesian blowup (the one-row
    supplier-count cross join inside _partsupp must plan as a broadcast
    nested loop of a single row, not a CartesianProduct)."""
    for name in ["tpch_q2", "tpch_q9", "tpch_q11", "tpch_q20", "tpch_q21"]:
        p = _plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name
        assert "CartesianProduct" not in p, name


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    # equi on user_id must carry the join; the time band is a post-join
    # filter. A BroadcastNestedLoopJoin here would be quadratic at scale.
    p = _plan(spark, "range_join", sf_dir)
    assert "HashJoin" in p
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_rollup_has_partial_aggregation(spark, sf_dir):
    p = _plan(spark, "time_bucket_rollup", sf_dir)
    # two-phase hash aggregate: map-side partial + final after one shuffle
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange") <= 2


def test_single_window_shuffle(spark, sf_dir):
    # sessionize: exactly one exchange for the per-user window chain
    p = _plan(spark, "sessionize", sf_dir)
    assert p.count("Exchange") <= 2  # window partition + final agg


def test_lake_partition_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    from mortar_parquet_support_spark.sources.lake import TimeseriesLake

    rows = [(f"c{i%3}", f"u{i%5}", i * 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["collection", "uuid", "value"]).withColumn(
        "time", F.timestamp_micros(F.col("value").cast("long") * 1_000_000)
    )
    root = str(tmp_path / "lake")
    df.write.partitionBy("collection").parquet(root)
    lake = TimeseriesLake.open(spark, root)
    p = plan_str(lake.scan(collections=["c1"], start="1970-01-01", end="1970-01-02"))
    # the collection filter must appear INSIDE the PartitionFilters section
    # (an empty bracket + residual Filter also contains the substrings)
    section = scan_meta(p, "PartitionFilters")
    assert section is not None and "c1" in section, p


def test_maybe_broadcast_size_guard(spark, sf_dir):
    """Hint only when the Catalyst estimate fits: big side passes through
    unhinted (AQE decides at runtime), small side gets the guaranteed hint."""
    from mortar_parquet_support_spark.plans.hints import _parse_bytes, maybe_broadcast

    assert _parse_bytes("10485760") == 10485760
    assert _parse_bytes("10m") == 10 * 1024 * 1024
    assert _parse_bytes("64MB") == 64 * 1024 * 1024
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("-1") == -1

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert maybe_broadcast(li, threshold=1) is li  # too big: no hint forced
    hinted = maybe_broadcast(li, threshold=1 << 40)
    assert hinted is not li
    p = plan_str(hinted.join(li.select("l_orderkey").distinct(), "l_orderkey"))
    assert "BroadcastHashJoin" in p


def test_decontaminate_never_shuffles_corpus(spark, sf_dir):
    """Eval shingles broadcast; corpus side must reach the semi join
    without a hash exchange (the only exchanges allowed are on the tiny
    eval-gram / contaminated-id sides, which sit under broadcasts)."""
    p = _plan(spark, "decontaminate", sf_dir)
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    # every hash exchange must feed a broadcast (small side), never the
    # corpus-side probe of a join
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([a-zA-Z_]+)", p):
        assert m.group(1) in ("_g", "doc_id"), p  # gram dedup / id distinct only


def test_domain_cap_single_shuffle(spark, sf_dir):
    p = _plan(spark, "domain_cap", sf_dir)
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Window" in p


def test_pii_and_repetition_are_pure_projections(spark, sf_dir):
    for name in ["pii_scrub", "text_repetition"]:
        p = _plan(spark, name, sf_dir)
        assert "Exchange" not in p, name
        assert "Join" not in p, name


def test_pack_sequences_single_shuffle(spark, sf_dir):
    p = _plan(spark, "pack_sequences", sf_dir)
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Window" in p


def test_hll_rollup_partial_aggregation(spark, sf_dir):
    # sketch aggregates must combine map-side: partial + final per phase
    p = _plan(spark, "hll_rollup", sf_dir)
    assert p.count("ObjectHashAggregate") + p.count("HashAggregate") >= 2, p
    assert "CartesianProduct" not in p


def test_strip_boilerplate_bounded_shuffles(spark, sf_dir):
    # line-frequency agg + reassembly agg; boilerplate set joins broadcast
    p = _plan(spark, "strip_boilerplate", sf_dir)
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_ivf_assignment_is_shuffle_free(spark, sf_dir):
    # the 100 TB IVF property: nearest-centroid assignment is one Arrow
    # pass over the corpus — no Exchange, no Join (the centroid matrix
    # rides in the task closure, the corpus never moves)
    from pyspark.sql import functions as F

    from mortar_parquet_support_spark.operators.similarity import IvfIndex
    from mortar_parquet_support_spark.tables import load_table
    from tests.conftest import plan_str

    emb = load_table(spark, sf_dir, "embeddings")
    idx = IvfIndex.build(emb, n_list=4, persist=False)
    p = plan_str(idx.assigned)
    assert "Exchange" not in p, p
    assert "Join" not in p, p
    # probes stay broadcast against the assigned corpus: the corpus side of
    # the probe join must never hash-shuffle
    pq = plan_str(idx.topk(emb.filter(F.col("vec_id") < 3), k=3, nprobe=2))
    assert "BroadcastHashJoin" in pq, pq
    assert "SortMergeJoin" not in pq and "CartesianProduct" not in pq, pq


def test_score_quality_computes_shared_parts_once(spark, sf_dir):
    # CSE guard (r6 regression: 13x from duplicated subtrees): the word
    # split and each regexp ratio must appear exactly once in the final
    # physical plan of the DataFrame-level quality scorer
    from mortar_parquet_support_spark.operators.text import score_quality
    from mortar_parquet_support_spark.tables import load_table
    from tests.conftest import plan_str

    docs = load_table(spark, sf_dir, "documents")
    p = plan_str(score_quality(docs).select("doc_id", "quality"))
    assert p.count("split(") == 1, p
    # regexp_count compiles to size(regexp_extract_all(...)): punct + digit,
    # once each
    assert p.count("regexp_extract_all") == 2, p


def test_minhash_signatures_single_tiny_shuffle(spark, sf_dir):
    # the 100 TB minhash property: shingle hashes form inside the row and
    # partially aggregate BEFORE the exchange, so the plan's only shuffle
    # carries num_perm longs per doc — no window, no sort, no pre-agg
    # exchange of the exploded words
    from mortar_parquet_support_spark.operators.dedup import minhash_signatures
    from mortar_parquet_support_spark.tables import load_table
    from tests.conftest import plan_str

    docs = load_table(spark, sf_dir, "documents")
    p = plan_str(minhash_signatures(docs, id_col="doc_id", text_col="text"))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Window" not in p and "Sort" not in p.replace("array_sort", ""), p
    # partial aggregation present on both sides of the exchange
    assert p.count("HashAggregate") >= 2, p


def test_exchange_count_scale_invariant(spark):
    """The 100x question, asserted structurally: the number of shuffles
    (Exchange nodes) in every headline plan must NOT grow with the data —
    a plan whose shuffle count depends on SF would hit a wall at cluster
    scale. Compared between sf0.001 and sf0.01 fixtures (10x apart); the
    sf0.1 -> sf1 wall-clock curve is measured by tools/bench_scaling.py."""
    from bench import HEADLINE

    # exclude entries that eagerly EXECUTE during plan construction
    # (minhash materialization barrier, IVF index build) — plan-shape
    # comparison would trigger full runs; their scaling is covered by the
    # bench artifact instead
    lazy = [n for n in HEADLINE if n not in ("dedup_minhash", "knn_ivf")]
    qs = entrymod.queries()
    mismatches = {}
    for name in lazy:
        counts = {}
        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            counts[sf] = plan_str(qs[name](spark, sf)).count("Exchange")
        a, b = counts.values()
        if a != b:
            mismatches[name] = counts
    assert not mismatches, mismatches


def test_qhist_rollup_single_shuffle_partial_agg(spark, sf_dir):
    """quantile_sketch state build: one Exchange on the (keys, sign, bin)
    group with map-side partial counting — the shuffle carries occupied
    bins, never data rows."""
    p = _plan(spark, "quantile_sketch", sf_dir)
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "partial_count" in p or "HashAggregate" in p, p


def test_quantile_estimate_windows_on_state_only(spark, sf_dir):
    """quantile_estimate: the cumulative window + final pick run over the
    TINY histogram state — bounded exchanges, no sort of raw rows."""
    p = _plan(spark, "quantile_estimate", sf_dir)
    assert p.count("Exchange") <= 4, p
    assert "CartesianProduct" not in p, p


def test_semantic_dedup_joins_on_cluster_key(spark, sf_dir):
    """semantic_dedup's only wide op is the cell-keyed block-pair join
    (r17: list_id rides as the `bucket` join key of
    dedup._blocked_cosine_pairs) — never a cartesian product over the
    corpus, and the pair scoring is the Arrow batch engine, not a
    per-pair fold."""
    qs = entrymod.queries()
    p = plan_str(qs["semantic_dedup"](spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p, p
    assert "bucket" in p, p  # the cell key reaches the join
    assert "MapInArrow" in p, p  # vectorized scorer, not a cosine fold


def test_bm25_entry_no_corpus_exchange(spark, sf_dir):
    """bm25_topk at entry grain: corpus rows must never be hash-
    repartitioned (tf legs ride the scan; stats come back broadcast) and
    the top-k must plan as TakeOrdered, not a global sort."""
    p = _plan(spark, "bm25_topk", sf_dir)
    assert "Exchange hashpartitioning(doc_id" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_duplicate_spans_plan_shape(spark, sf_dir):
    """duplicate_spans: the corpus-wide shuffle carries gram HASHES (one
    hashpartitioning on h with map-side partial counting), the island
    window runs over hit rows only, and nothing goes cartesian."""
    p = _plan(spark, "duplicate_spans", sf_dir)
    assert "CartesianProduct" not in p, p
    assert "Exchange hashpartitioning(h" in p, p
    # hit-side window: a sort within doc_id partitions, not a global sort
    assert "Sort [doc_id" in p, p


def test_remove_spans_no_corpus_reshuffle(spark, sf_dir):
    """remove_spans: the span side aggregates per doc (tiny) and joins
    back onto the unshuffled corpus — the docs themselves must never be
    hash-repartitioned at corpus width for the rebuild join."""
    p = _plan(spark, "remove_spans", sf_dir)
    assert "CartesianProduct" not in p, p
    # doc_id exchanges may appear only on the span pipeline (window +
    # span aggregate + per-doc interval-list aggregate), all fed by the
    # already-filtered hit rows — never on the full-corpus rebuild side
    assert p.count("Exchange hashpartitioning(doc_id") <= 3, p


def test_dedup_lines_no_corpus_reshuffle(spark, sf_dir):
    """dedup_lines: documents must NEVER be hash-repartitioned by doc_id
    at corpus width — the removal positions aggregate on the tiny dup
    side and join back onto the unshuffled docs."""
    p = _plan(spark, "dedup_lines", sf_dir)
    assert "CartesianProduct" not in p, p
    # the only doc_id exchange allowed is the dup-positions aggregate,
    # whose input was already filtered to duplicated lines
    assert p.count("Exchange hashpartitioning(doc_id") <= 1, p


def test_phrase_search_plan_no_join(spark):
    """phrase_search is union + one grouped aggregate over token-pruned
    postings — no join operator of any kind in the plan (a self-join
    chain per phrase token is the shape this formulation avoids)."""
    from mortar_parquet_support_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )
    from tests.conftest import plan_str

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(50)],
        "doc_id long, text string",
    )
    out = phrase_search(build_positional_index(docs), "beta gamma")
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan[:500]


def test_salted_agg_first_exchange_carries_salt(spark):
    """salted_agg's first exchange partitions on (keys, __salt) — the
    property that splits a hot key across reduce tasks."""
    from mortar_parquet_support_spark.plans.skew import salted_agg
    from tests.conftest import plan_str

    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(500)], "k string, v double"
    )
    out = salted_agg(df, ["k"], {"s": ("v", "sum")}, buckets=8)
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    first_exchange = plan[plan.index("Exchange"):]
    assert "__salt" in first_exchange.split("Exchange")[1]
