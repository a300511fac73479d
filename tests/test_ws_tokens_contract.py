"""ws_tokens edge-input contract, pinned at EVERY consumer (VERDICT r15
"Next round" #3).

r15 replaced the interpreted HOF tokenization
``filter(split(trim(c), '\\s+'), w -> w != '')`` with the codegen'd
``split(btrim(c, <\\s chars>), '\\s+')`` (functions.ws_tokens). The
value-identity argument lives in docstrings; the oracles re-verified
green but their fixtures may not contain adversarial inputs. This
module turns the argument into evidence: the r14 HOF spelling is
re-materialized here VERBATIM and every consumer runs the full edge
battery against a monkeypatched build of itself using it — asserting
output identity row for row.

The ONE divergence, by design: on content-free input ('' / whitespace),
ws_tokens yields [''] where the HOF yielded []. Every consumer guards
content-free docs FIRST (rlike '\\S' or an isNotNull+rlike prefilter),
so the divergence is unreachable through any consumer — which is
exactly what the consumer-level tests prove, and the function-level
test documents the raw divergence so nobody "fixes" it silently.
"""


from pyspark.sql import functions as F

from mortar_parquet_support_spark import functions as mfuncs


def hof_tokens(col):
    """The r14 spelling, verbatim: interpreted HOF filter over a
    trim-then-split. Kept HERE (not in the package) as the reference
    implementation the contract is pinned against."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


# empty, NULL, all-whitespace (space/tab/newline/vertical-tab/formfeed/
# carriage-return), leading/trailing/interior runs, single token, and
# plain multi-token content
EDGE_BATTERY = [
    "",
    None,
    " ",
    " \t\n ",
    "\x0b\f\r",
    "\thello world",
    "\nfoo bar",
    "hello world\t",
    "a  b   c",
    " leading",
    "trailing ",
    "x",
    "a\tb\nc",
    "\x0b\f\r mixed \x0b",
    "many    interior     runs",
    "\t\n mixed \r\n lead and trail \f",
]


def _edge_df(spark):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(EDGE_BATTERY)],
        "id string, text string",
    )


def test_ws_tokens_function_contract(spark):
    """Raw function identity on content-bearing + NULL inputs; the
    documented [''] vs [] divergence on content-free inputs."""
    df = _edge_df(spark)
    rows = df.select(
        "id", "text",
        mfuncs.ws_tokens(F.col("text")).alias("new"),
        hof_tokens(F.col("text")).alias("old"),
        F.col("text").rlike(r"\S").alias("has_content"),
    ).collect()
    for r in rows:
        if r.text is None:
            assert r.new is None and r.old is None, r
        elif r.has_content:
            assert r.new == r.old, (r.text, r.new, r.old)
        else:  # content-free: the one designed divergence
            assert r.old == [] and r.new == [""], (r.text, r.new, r.old)


def _swap_ws_tokens(monkeypatch):
    """Substitute the r14 HOF spelling for ws_tokens package-wide.
    Consumers import it lazily (``from ...functions import ws_tokens``
    inside the function body), so patching the module attribute reroutes
    every call made after the patch."""
    monkeypatch.setattr(mfuncs, "ws_tokens", hof_tokens)


def test_minhash_signatures_identical_under_both_spellings(
    spark, monkeypatch
):
    from mortar_parquet_support_spark.operators.dedup import (
        minhash_signatures,
    )

    df = _edge_df(spark)
    new = minhash_signatures(df, text_col="text", id_col="id").collect()
    _swap_ws_tokens(monkeypatch)
    old = minhash_signatures(df, text_col="text", id_col="id").collect()
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))
    # the prefilter dropped every content-free doc in BOTH builds
    ids = {r[0] for r in new}
    assert "d1" not in ids and "d3" not in ids  # NULL, whitespace-only


def test_simhash_identical_under_both_spellings(spark, monkeypatch):
    from mortar_parquet_support_spark.operators import dedup

    df = _edge_df(spark)
    new = {
        r.id: r.fp
        for r in df.select(
            "id", dedup.simhash(F.col("text")).alias("fp")
        ).collect()
    }
    _swap_ws_tokens(monkeypatch)
    old = {
        r.id: r.fp
        for r in df.select(
            "id", dedup.simhash(F.col("text")).alias("fp")
        ).collect()
    }
    assert new == old
    # and the persisted content-free contract holds in both: fp 0
    for i, t in enumerate(EDGE_BATTERY):
        if t is None or not any(ch not in " \t\n\x0b\f\r" for ch in (t or "")):
            assert new[f"d{i}"] == 0, (t, new[f"d{i}"])


def test_word_shingles_identical_under_both_spellings(spark, monkeypatch):
    df = _edge_df(spark).filter(F.col("text").rlike(r"\S"))
    new = df.select(
        "id", mfuncs.word_shingles(F.col("text"), k=2).alias("s")
    ).collect()
    # word_shingles reads ws_tokens at CALL time inside functions/
    # __init__.py — patch, then rebuild the plan
    _swap_ws_tokens(monkeypatch)
    old = df.select(
        "id", mfuncs.word_shingles(F.col("text"), k=2).alias("s")
    ).collect()
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))


def test_heavy_hitters_tokenization_identical_under_both_spellings(
    spark, monkeypatch
):
    """The llm_quality heavy_hitters entry's exact tokenization shape:
    rlike guard + explode(ws_tokens) vs the old
    explode(filter(split(trim))) — row-for-row identical words."""
    df = _edge_df(spark)

    def words(tokenizer):
        return sorted(
            (r.id, r.word)
            for r in df.filter(F.col("text").rlike(r"\S"))
            .select("id", F.explode(tokenizer(F.col("text"))).alias("word"))
            .collect()
        )

    assert words(mfuncs.ws_tokens) == words(hof_tokens)
    # and no consumer-visible difference survives aggregation either
    from mortar_parquet_support_spark.operators.sketches import heavy_hitters

    base = df.filter(F.col("text").rlike(r"\S")).withColumn("lang", F.lit("en"))
    new = heavy_hitters(
        base.select("lang", F.explode(mfuncs.ws_tokens(F.col("text"))).alias("word")),
        item="word", keys=["lang"], k=64,
    ).collect()
    old = heavy_hitters(
        base.select("lang", F.explode(hof_tokens(F.col("text"))).alias("word")),
        item="word", keys=["lang"], k=64,
    ).collect()
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))
