"""Deterministic synthetic-testdata generator, Spark-native.

Reproduces the SHAPE of the driver's seed-42 fixtures (TESTDATA.md — same
tables, columns, dtypes, value domains and cross-table key relationships)
at any scale factor (timestamps as TIMESTAMP_NTZ, matching the driver
fixtures' parquet type — the session is UTC so the cast is value-
preserving), so the headline bench can be run above the driver's
largest fixture (sf0.1) and the sf0.1 -> sf1 wall-time ratio measured.

Everything is generated JVM-side from ``spark.range`` + xxhash64-derived
pseudo-randoms — no ``rand()`` (rerun-identical), no driver-side loops, no
Python row funcs — so generation itself scales to any SF on a cluster
(this is the engine's own medicine: a 100 TB fixture would be generated
exactly this way).

Usage: python tools/gen_sf.py [sf] [out_dir] [tables]
Defaults: sf=1 out=testdata_sf/sf1 tables=all (comma-separated subset,
e.g. 'documents' for the sf100 stress decade)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SEED = 42


def _h(*cols):
    """Deterministic 64-bit hash column from id + literal salts."""
    return F.xxhash64(*cols, F.lit(SEED))


def _u(idcol, salt: str, mod: int):
    """Uniform int in [0, mod) derived from (id, salt)."""
    return F.pmod(_h(idcol, F.lit(salt)), F.lit(mod))


def _uf(idcol, salt: str, scale: float = 1.0):
    """Uniform double in [0, scale)."""
    return _u(idcol, salt, 1_000_000) / F.lit(1_000_000.0) * F.lit(scale)


def generate(
    spark: SparkSession, sf: float, out: str, tables: "set | None" = None
) -> None:
    known = {
        "region_nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    if tables is not None:
        unknown = set(tables) - known
        if unknown:
            # a typo'd subset would otherwise generate NOTHING and exit 0
            # with a success message (review r13)
            raise ValueError(
                f"unknown table(s) {sorted(unknown)}; choose from "
                f"{sorted(known)}"
            )

    def _want(name: str) -> bool:
        # r13: subset generation — the sf100 stress decade needs ONLY
        # documents (minhash signatures / similarity-join candidates);
        # generating 600M lineitem rows for it would waste an hour of
        # wall-clock and 20 GB of disk
        return tables is None or name in tables

    n_customer = int(150_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_lineitem = int(6_000_000 * sf)
    n_part = int(200_000 * sf)
    n_supplier = int(10_000 * sf)
    n_events = int(1_000_000 * sf)
    n_documents = int(50_000 * sf)
    # embeddings grow sublinearly in the driver's fixtures (500 @0.01,
    # 2000 @0.1): continue the 4x-per-decade curve
    n_embeddings = int(2_000 * (sf / 0.1) ** 0.6)
    parts = max(32, int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))

    def rng(n):
        return spark.range(0, n, 1, parts).withColumnRenamed("id", "i")

    os.makedirs(out, exist_ok=True)

    if _want("region_nation"):
        # region / nation: fixed 5 / 25 rows, same contents as the fixtures
        spark.createDataFrame(
            [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST")],
            "r_regionkey: long, r_name: string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{out}/region.parquet")
        spark.createDataFrame(
            [(i, f"NATION_{i}", i % 5) for i in range(25)],
            "n_nationkey: long, n_name: string, n_regionkey: long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{out}/nation.parquet")

    if _want("customer"):
        rng(n_customer).select(
            F.col("i").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("i")).alias("c_name"),
            _u(F.col("i"), "cnat", 25).cast("int").alias("c_nationkey"),
            F.round(_uf(F.col("i"), "cbal", 11_000.0) - 1_000.0, 2).alias("c_acctbal"),
            F.element_at(
                F.array(*[F.lit(s) for s in
                          ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]]),
                (_u(F.col("i"), "cseg", 5) + 1).cast("int"),
            ).alias("c_mktsegment"),
        ).write.mode("overwrite").parquet(f"{out}/customer.parquet")

    if _want("supplier"):
        rng(n_supplier).select(
            F.col("i").alias("s_suppkey"),
            F.format_string("Supplier#%09d", F.col("i")).alias("s_name"),
            _u(F.col("i"), "snat", 25).cast("int").alias("s_nationkey"),
            F.round(_uf(F.col("i"), "sbal", 11_000.0) - 1_000.0, 2).alias("s_acctbal"),
        ).write.mode("overwrite").parquet(f"{out}/supplier.parquet")

    if _want("part"):
        rng(n_part).select(
            F.col("i").alias("p_partkey"),
            F.concat(
                F.element_at(
                    F.array(*[F.lit(s) for s in
                              ["blue", "cold", "hot", "large", "new", "old", "red", "small"]]),
                    (_u(F.col("i"), "padj", 8) + 1).cast("int"),
                ),
                F.lit(" "),
                F.element_at(
                    F.array(*[F.lit(s) for s in
                              ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]]),
                    (_u(F.col("i"), "pnoun", 8) + 1).cast("int"),
                ),
            ).alias("p_name"),
            F.concat(F.lit("Brand#"), _u(F.col("i"), "pbrand", 25) + 1).alias("p_brand"),
            F.element_at(
                F.array(*[F.lit(s) for s in
                          ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]]),
                (_u(F.col("i"), "ptype", 6) + 1).cast("int"),
            ).alias("p_type"),
            (_u(F.col("i"), "psize", 50) + 1).cast("int").alias("p_size"),
            F.round(F.lit(900.0) + _uf(F.col("i"), "price", 100.0), 2).alias("p_retailprice"),
        ).write.mode("overwrite").parquet(f"{out}/part.parquet")

    if _want("orders"):
        # orders: o_orderdate spans 1995-01-01 .. 2001-08-01 like the fixtures
        o_span_days = 2_405
        rng(n_orders).select(
            F.col("i").alias("o_orderkey"),
            _u(F.col("i"), "ocust", n_customer).alias("o_custkey"),
            F.element_at(
                F.array(F.lit("F"), F.lit("O"), F.lit("P")),
                (_u(F.col("i"), "ostat", 3) + 1).cast("int"),
            ).alias("o_orderstatus"),
            F.round(F.lit(1_000.0) + _uf(F.col("i"), "oprice", 499_000.0), 2).alias("o_totalprice"),
            (
                F.to_timestamp(F.lit("1995-01-01"))
                + F.make_interval(days=_u(F.col("i"), "odate", o_span_days).cast("int"))
            ).cast("timestamp_ntz").alias("o_orderdate"),
            F.element_at(
                F.array(*[F.lit(s) for s in
                          ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]]),
                (_u(F.col("i"), "oprio", 5) + 1).cast("int"),
            ).alias("o_orderpriority"),
        ).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    if _want("lineitem"):
        # lineitem: ~4 lines per order, shipdate spans 1995-01-02 .. 2001-11-04
        rng(n_lineitem).select(
            _u(F.col("i"), "lord", n_orders).alias("l_orderkey"),
            _u(F.col("i"), "lpart", n_part).alias("l_partkey"),
            _u(F.col("i"), "lsupp", n_supplier).alias("l_suppkey"),
            (_u(F.col("i"), "lline", 7) + 1).cast("int").alias("l_linenumber"),
            (_u(F.col("i"), "lqty", 50) + 1).cast("double").alias("l_quantity"),
            F.round(F.lit(900.0) + _uf(F.col("i"), "lprice", 104_000.0), 2).alias("l_extendedprice"),
            (F.round(_u(F.col("i"), "ldisc", 11) * 0.01, 2)).alias("l_discount"),
            (F.round(_u(F.col("i"), "ltax", 9) * 0.01, 2)).alias("l_tax"),
            F.element_at(
                F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                (_u(F.col("i"), "lret", 3) + 1).cast("int"),
            ).alias("l_returnflag"),
            F.element_at(
                F.array(F.lit("F"), F.lit("O")),
                (_u(F.col("i"), "lstat", 2) + 1).cast("int"),
            ).alias("l_linestatus"),
            (
                F.to_timestamp(F.lit("1995-01-02"))
                + F.make_interval(days=_u(F.col("i"), "lship", 2_499).cast("int"))
            ).cast("timestamp_ntz").alias("l_shipdate"),
        ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    if _want("events"):
        # events: a CONSTANT 30-day window (2024-01-01..2024-01-31) at every
        # SF, same as the driver fixtures — so growth adds users and per-bucket
        # density in fixture proportions, and fixed time-window predicates keep
        # the same selectivity across the scaling comparison
        span_us = 30 * 86_400 * 1_000_000
        n_users = max(1, int(15_000 * sf))
        rng(n_events).select(
            F.col("i").alias("event_id"),
            (
                # pmod, NOT %: Spark's % keeps the dividend's sign, which would
                # scatter half the timestamps BEFORE the epoch start
                F.to_timestamp(F.lit("2024-01-01"))
                + F.pmod(_h(F.col("i"), F.lit("ets")), F.lit(span_us)).cast("double")
                / F.lit(1_000_000.0) * F.expr("INTERVAL 1 SECOND")
            ).cast("timestamp_ntz").alias("ts"),
            _u(F.col("i"), "euser", n_users).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(s) for s in ["click", "error", "purchase", "signup", "view"]]),
                (_u(F.col("i"), "etype", 5) + 1).cast("int"),
            ).alias("event_type"),
            F.round(_uf(F.col("i"), "eval", 560.0), 2).alias("value"),
            F.concat(F.lit('{"k": '), _u(F.col("i"), "eprops", 100), F.lit("}")).alias("props"),
        ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    if _want("documents"):
        # documents: 8-100 words drawn from the fixtures' vocabulary
        vocab = [
            "batch", "part", "spark", "line", "column", "order", "small", "sort",
            "fast", "value", "scan", "a", "hash", "slow", "group", "agg",
            "filter", "query", "big", "key", "window", "row", "table", "stream",
            "merge", "data", "vector",
        ]
        vocab_arr = F.array(*[F.lit(w) for w in vocab])
        n_words = (_u(F.col("i"), "dlen", 93) + 8).cast("int")
        words = F.transform(
            F.sequence(F.lit(1), n_words),
            lambda j: F.element_at(
                vocab_arr, (F.pmod(_h(F.col("i"), j), F.lit(len(vocab))) + 1).cast("int")
            ),
        )
        rng(n_documents).select(
            F.col("i").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
            F.element_at(
                F.array(*[F.lit(s) for s in ["de", "en", "es", "fr", "zh"]]),
                (_u(F.col("i"), "dlang", 5) + 1).cast("int"),
            ).alias("lang"),
            F.concat(F.lit("src"), _u(F.col("i"), "dsrc", 20)).alias("source"),
        ).withColumn("n_chars", F.length("text").cast("long")).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )

    if _want("embeddings"):
        # embeddings: 64-dim float vectors in [-0.5, 0.5)
        dim = 64
        rng(n_embeddings).select(
            F.col("i").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: (
                    F.pmod(_h(F.col("i"), d, F.lit("edim")), F.lit(1_000_000))
                    / F.lit(1_000_000.0) - F.lit(0.5)
                ).cast("float"),
            ).alias("embedding"),
            _u(F.col("i"), "elabel", 10).cast("int").alias("label"),
        ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")



def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf", f"sf{sf:g}",
    )
    from mortar_parquet_support_spark.session import get_spark

    tables = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    spark = get_spark("gen-sf")
    generate(spark, sf, out, tables=tables)
    print(f"generated sf={sf} at {out}"
          + (f" (tables: {sorted(tables)})" if tables else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
