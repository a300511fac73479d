"""Property-based invariants (hypothesis) for the text/curation operators.

Each property batches all generated examples into ONE DataFrame per test
run, so hypothesis explores dozens of inputs at the cost of a single Spark
job instead of one job per example.
"""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# printable-ish text incl. whitespace runs, unicode, and empties
TEXTS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=300,
)


def _one_job(spark, texts, exprs):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    return df.select("i", *exprs).collect()


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=24), st.integers(2, 40), st.integers(0, 39))
def test_chunk_text_reassembles_losslessly(spark, texts, chunk_chars, overlap):
    from mortar_parquet_support_spark.operators.curation import chunk_text

    if overlap >= chunk_chars:
        overlap = chunk_chars - 1
    step = chunk_chars - overlap
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    rows = chunk_text(
        df, id_col="i", text_col="text", chunk_chars=chunk_chars, overlap=overlap
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.i, {})[r.chunk_id] = r.chunk
    for i, t in enumerate(texts):
        chunks = [by_id[i][k] for k in sorted(by_id[i])]
        # chunk ids are dense from 0 and every doc chunks at least once
        assert sorted(by_id[i]) == list(range(len(chunks)))
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == t
        # every chunk except possibly the last is full-size
        assert all(len(c) == chunk_chars for c in chunks[:-1])
        # chunk starts advance by exactly the stride
        for k, c in enumerate(chunks):
            assert t[k * step : k * step + chunk_chars] == c


ASCII_TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=300
)


@settings(max_examples=8, deadline=None)
@given(st.lists(ASCII_TEXTS, min_size=1, max_size=32))
def test_ratio_bounds_and_fingerprint_invariance(spark, texts):
    # ASCII-only: Unicode case-folding can change length (ss vs SS), which
    # legitimately changes the fingerprint — the invariance contract is
    # about formatting (case/whitespace/punct), not locale folding
    from mortar_parquet_support_spark.operators.text import (
        dup_ngram_ratio,
        dup_word_ratio,
        fingerprint,
    )

    rows = _one_job(
        spark,
        texts,
        [
            dup_word_ratio(F.col("text")).alias("w"),
            dup_ngram_ratio(F.col("text"), 2).alias("b"),
            fingerprint(F.col("text")).alias("fp"),
            fingerprint(F.upper(F.concat(F.lit("  "), F.col("text")))).alias("fp2"),
        ],
    )
    for r in rows:
        assert 0.0 <= r.w <= 1.0 and 0.0 <= r.b <= 1.0
        # fingerprint is invariant to case and leading whitespace
        assert r.fp == r.fp2


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=32))
def test_mask_pii_is_idempotent(spark, texts):
    from mortar_parquet_support_spark.operators.curation import mask_pii

    rows = _one_job(
        spark,
        texts,
        [
            mask_pii(F.col("text")).alias("m1"),
            mask_pii(mask_pii(F.col("text"))).alias("m2"),
        ],
    )
    for r in rows:
        assert r.m1 == r.m2


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=60), min_size=2, max_size=16))
def test_exact_dedup_group_representative(spark, texts):
    """exact_dedup keeps exactly one representative (the min id) per
    distinct normalized text."""
    from mortar_parquet_support_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = exact_dedup(df, ["text"], id_col="doc_id", normalize=True).collect()
    import re

    norm = {}
    for i, t in enumerate(texts):
        key = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        norm.setdefault(key, []).append(i)
    want_keep = {min(v) for v in norm.values()}
    assert {r.keep_id for r in out} == want_keep


_SPARQL_FRAGMENTS = st.sampled_from([
    "SELECT", "WHERE", "{", "}", "(", ")", "?x", "?y", "a", "brick:VAV",
    "FILTER", "OPTIONAL", "UNION", "MINUS", "BIND", "VALUES", "EXISTS", "NOT",
    "GRAPH", "ASK", "CONSTRUCT", "DESCRIBE", "GROUP", "BY", "HAVING", "ORDER",
    "LIMIT", "10", "*", "+", "/", "^", "|", ";", ",", ".", '"lit"', "<urn:x>",
    "PREFIX", "rdf:", "COUNT", "AS", "SEPARATOR", "=", "-", "UNDEF",
])


@settings(max_examples=300, deadline=None)
@given(st.lists(_SPARQL_FRAGMENTS, max_size=25).map(" ".join))
def test_sparql_parser_fails_cleanly_on_fragment_soup(q):
    """The parser must either parse or raise its two documented error
    types — never an internal IndexError/KeyError/AttributeError."""
    from mortar_parquet_support_spark.plans.sparql import (
        SparqlUnsupported,
        parse_sparql,
    )

    try:
        parse_sparql(q)
    except (SparqlUnsupported, ValueError):
        pass


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_sparql_parser_fails_cleanly_on_arbitrary_text(q):
    from mortar_parquet_support_spark.plans.sparql import (
        SparqlUnsupported,
        parse_sparql,
    )

    try:
        parse_sparql(q)
    except (SparqlUnsupported, ValueError):
        pass


_TTL_FRAGMENTS = st.sampled_from([
    "@prefix", "b:", "<urn:x>", ".", ";", ",", "a", "[", "]", '"lit"', "(", ")",
    "brick:VAV", "^^", "xsd:int", "@en", "#c", "\n", "_:b1", "1.5", "true",
])


@settings(max_examples=250, deadline=None)
@given(st.lists(_TTL_FRAGMENTS, max_size=30).map(" ".join))
def test_ttl_parser_fails_cleanly(t):
    from mortar_parquet_support_spark.sources.ttl import parse_ttl

    try:
        parse_ttl(t, "s")
    except ValueError:
        pass


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),            # user
            st.integers(0, 50),           # ts offset seconds
            st.sampled_from("ABCX"),      # event type (X = noise)
        ),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([None, 10, 25]),      # within-window seconds
)
def test_funnel_matches_sequential_reference(spark, events, within):
    """funnel == the obvious per-user sequential reference: t_i is the
    min step-i timestamp >= t_{i-1} (and <= t_0 + within), computed here
    by brute force over every (user, step) in Python."""
    from datetime import datetime, timedelta

    from mortar_parquet_support_spark.operators.timeseries import funnel

    base = datetime(2024, 1, 1)
    rows = [
        (u, base + timedelta(seconds=s), t) for u, s, t in events
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r.user_id: (r.t_A, r.t_B, r.t_C, r.n_steps)
        for r in funnel(
            df,
            ["A", "B", "C"],
            ts="ts",
            within=f"{within} seconds" if within else None,
        ).collect()
    }

    by_user: dict = {}
    for u, ts, t in rows:
        by_user.setdefault(u, []).append((ts, t))
    assert set(got) == set(by_user)
    for u, evs in by_user.items():
        ts_of = lambda step, lo, hi: min(  # noqa: E731
            (ts for ts, t in evs
             if t == step and ts >= lo and (hi is None or ts <= hi)),
            default=None,
        )
        t0 = ts_of("A", datetime.min, None)
        hi = t0 + timedelta(seconds=within) if (t0 and within) else None
        t1 = ts_of("B", t0, hi) if t0 else None
        t2 = ts_of("C", t1, hi) if t1 else None
        want = (t0, t1, t2, sum(x is not None for x in (t0, t1, t2)))
        assert got[u] == want, (u, got[u], want)


@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=2, max_size=12
    ),
    t=st.sampled_from([0.3, 0.5, 0.8, 1.0]),
)
@settings(max_examples=12, deadline=None)
def test_similarity_join_lossless_property(spark, docs, t):
    """Property: prefix-filtered similarity_join == brute-force all-pairs
    for arbitrary tiny-alphabet corpora (the hardest case for the filter:
    nearly every token is hot) at several thresholds."""
    from mortar_parquet_support_spark.functions import word_shingles
    from mortar_parquet_support_spark.operators.dedup import similarity_join

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in similarity_join(
            df, id_col="doc_id", text_col="text", threshold=t
        ).collect()
    }
    # the brute-force reference applies the operator's content-free
    # exclusion (r14): empty/whitespace-only docs never enter candidacy —
    # they all share the [''] singleton shingle set, and pairing them is
    # exact_dedup's job, not the near-dup join's
    g = df.filter(
        F.col("text").isNotNull() & F.col("text").rlike(r"\S")
    ).select("doc_id", word_shingles(F.col("text"), 3).alias("sh")).filter(
        F.col("sh").isNotNull()
    )
    a = g.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = (F.size("sa") + F.size("sb")).cast("double") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    brute = {
        (r.id_a, r.id_b): round(r.j, 9)
        for r in pairs.select("id_a", "id_b", jac.alias("j"))
        .filter(jac >= t)
        .collect()
    }
    assert got == brute


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-5, max_value=100, allow_nan=False
                ),
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 6),
)
def test_weighted_sample_k_matches_python_replay(spark, rows, k):
    """weighted_sample_k == a pure-python Efraimidis-Spirakis replay of
    the documented recipe (md5 52-bit uniform -> ln(u)/w rounded at
    1e-9, top-k, id tie-break) on arbitrary ids/weights incl. NULLs,
    zeros, and negatives — the bit-level portability pin."""
    import hashlib
    import math

    from mortar_parquet_support_spark.operators.sampling import (
        weighted_sample_k,
    )

    # unique ids (duplicate ids are the documented precondition breach)
    seen = {}
    for i, (rid, w) in enumerate(rows):
        seen[rid + i * 100_000] = w
    data = list(seen.items())
    df = spark.createDataFrame(data, "id long, w double")
    got = sorted(
        r.id
        for r in weighted_sample_k(df, "id", "w", k, salt="p:").collect()
    )

    def key(rid, w):
        h = hashlib.md5(f"p:{rid}".encode()).hexdigest()
        # max(hash, 1): the u=0 clamp (r11 fix — ln(0) diverges
        # across engines; the operator uses greatest(u, 2^-52))
        u = max(int(h[:13], 16), 1) / float(1 << 52)
        return (round(math.log(u) / w, 9), -rid)  # desc key, asc id

    eligible = [
        (rid, w) for rid, w in data
        if w is not None and w > 0 and not math.isnan(w)
    ]
    want = sorted(
        rid
        for rid, _w in sorted(
            eligible, key=lambda rw: key(*rw), reverse=True
        )[:k]
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.one_of(st.integers(-50, 50), st.none()),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 8),
)
def test_percentile_buckets_matches_numpy_replay(spark, values, buckets):
    """percentile_buckets == an independent numpy replay (np.percentile
    linear interpolation boundaries + the same strictly-greater
    comparison) on arbitrary integer-valued data incl. NULLs and heavy
    ties — integer values keep the interpolation arithmetic exact in
    float64, so both engines compute identical boundaries and the pin
    is bit-level, not approximate."""
    import numpy as np

    from mortar_parquet_support_spark.operators.features import (
        percentile_buckets,
    )

    rows = [(i, float(v) if v is not None else None)
            for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r.id: r.bucket
        for r in percentile_buckets(df, value="v", buckets=buckets).collect()
    }
    nn = np.array([v for v in values if v is not None], dtype=np.float64)
    if nn.size:
        # np.quantile with the SAME i/buckets double Spark consumes —
        # np.percentile(100.0*i/buckets)/100 double-rounds the fraction
        # and diverges 1 ulp for buckets 3 and 6, flipping boundary rows
        # (review r11: (100.0*(5/6))/100.0 != 5/6)
        qs = [
            np.quantile(nn, i / buckets, method="linear")
            for i in range(1, buckets)
        ]
    for i, v in enumerate(values):
        if v is None:
            assert got[i] is None
        elif nn.size:
            assert got[i] == 1 + sum(float(v) > q for q in qs), (
                i, v, qs, got[i]
            )
