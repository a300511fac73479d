"""Distributed BPE: train == pure-python reference, encode == sequential
merge application, round-trips, and degenerate inputs.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.bpe import (
    _encoder,
    bpe_encode,
    bpe_token_count_exact,
    bpe_train,
)

CORPUS = [
    "low lower lowest low low",
    "new newer newest new new newer",
    "wider wide widest wide",
    "low new wide lower",
]


def _ref_train(texts, num_merges, min_freq=2):
    """Reference BPE (Sennrich et al.): word-freq table, repeated argmax
    pair merge, ties on (count desc, left asc, right asc)."""
    freqs = Counter(w for t in texts for w in t.strip().lower().split())
    words = {w: list(w) for w in freqs}
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_freq:
            break
        (l, r), _c = best
        merges.append((l, r))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def test_train_matches_reference(spark, corpus_df):
    got = bpe_train(corpus_df, num_merges=12, min_freq=2)
    want = _ref_train(CORPUS, 12, min_freq=2)
    assert got == want
    assert len(got) >= 5  # the corpus supports a real merge sequence


def test_encode_roundtrip_and_exact_count(spark, corpus_df):
    merges = bpe_train(corpus_df, num_merges=12, min_freq=2)
    out = corpus_df.select(
        "text",
        bpe_encode(F.col("text"), merges).alias("toks"),
        bpe_token_count_exact(F.col("text"), merges).alias("n"),
    ).collect()
    for r in out:
        # concatenated tokens reproduce the casefolded words exactly
        assert "".join(r.toks) == "".join(r.text.strip().lower().split())
        assert r.n == len(r.toks)
    # trained merges compress: strictly fewer tokens than characters
    chars = sum(len(w) for t in CORPUS for w in t.split())
    assert sum(r.n for r in out) < chars


def test_encode_equals_sequential_application(spark, corpus_df):
    """Greedy rank encoding == applying the merge list in order (the
    property that makes train-time and serve-time segmentations agree)."""
    merges = bpe_train(corpus_df, num_merges=10, min_freq=2)
    enc = _encoder(merges)
    for word in {w for t in CORPUS for w in t.lower().split()} | {"unseen"}:
        syms = list(word)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert enc(word) == syms, word


def test_degenerate_inputs(spark):
    df = spark.createDataFrame([("",), (None,), ("  ",), ("a",)], "text string")
    merges = [("a", "b")]
    out = df.select(bpe_encode(F.col("text"), merges).alias("t")).collect()
    assert out[0].t == [] and out[2].t == [] and out[3].t == ["a"]
    assert out[1].t is None
    # empty merge list: pure character segmentation
    chars = (
        spark.createDataFrame([("hi there",)], "text string")
        .select(bpe_encode(F.col("text"), []).alias("t"))
        .head()
        .t
    )
    assert chars == ["h", "i", "t", "h", "e", "r", "e"]
    # a corpus with nothing above min_freq learns nothing
    tiny = spark.createDataFrame([("x y z",)], "text string")
    assert bpe_train(tiny, num_merges=5, min_freq=2) == []


def test_non_ascii_whitespace_matches_training_tokenization(spark):
    """NBSP is NOT whitespace to training's Java-regex \\s — the encoder
    must keep it inside the word too, or served segmentations diverge
    from the trained vocabulary (regression)."""
    text = "foo bar baz"
    df = spark.createDataFrame([(text,)], "text string")
    toks = df.select(bpe_encode(F.col("text"), []).alias("t")).head().t
    # two words: 'foo<NBSP>bar' (7 symbols) and 'baz' (3)
    assert "".join(toks) == "foo barbaz"
    assert len(toks) == 10
    # and training sees the same single NBSP-joined word
    merges = bpe_train(df, num_merges=3, min_freq=1)
    assert ("b", "a") in merges  # 'ba' appears in both words
