"""Fuzzy key matching (operators/entity.py): SymSpell symmetric-delete
candidate generation + exact levenshtein verify must equal brute force."""

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.entity import (
    fuzzy_join,
    fuzzy_key_map,
)
from tests.conftest import plan_str


def _df(spark, col, values):
    return spark.createDataFrame([(v,) for v in values], f"{col} string")


def test_fuzzy_key_map_all_edit_kinds(spark):
    left = _df(spark, "lk", ["kitten", "apple", "spark", "", "zzz"])
    right = _df(
        spark,
        "rk",
        [
            "kitten",   # equal           -> dist 0
            "kitte",    # deletion        -> dist 1
            "kittens",  # insertion       -> dist 1
            "mitten",   # substitution    -> dist 1
            "appel",    # transposition   -> dist 2: NOT matched at d=1
            "spa",      # dist 2          -> not matched
            "",         # equal empties   -> dist 0
        ],
    )
    got = {
        (r.lk, r.rk, r.dist)
        for r in fuzzy_key_map(
            left, right, left_on="lk", right_on="rk", max_dist=1
        ).collect()
    }
    assert got == {
        ("kitten", "kitten", 0),
        ("kitten", "kitte", 1),
        ("kitten", "kittens", 1),
        ("kitten", "mitten", 1),
        ("", "", 0),
    }


def test_fuzzy_key_map_equals_brute_force(spark):
    # randomized-ish small universe: every pair checked both ways
    words = ["abc", "abd", "ab", "abcd", "bac", "xyz", "xzy", "a", "b", ""]
    left = _df(spark, "lk", words)
    right = _df(spark, "rk", words)
    for d in (1, 2):
        got = {
            (r.lk, r.rk)
            for r in fuzzy_key_map(
                left, right, left_on="lk", right_on="rk", max_dist=d
            ).collect()
        }
        brute = {
            (r.lk, r.rk)
            for r in left.crossJoin(right)
            .filter(F.levenshtein("lk", "rk") <= d)
            .collect()
        }
        assert got == brute, f"max_dist={d}"


def test_fuzzy_key_map_shared_variant_but_far_pair_rejected(spark):
    # "ab"/"ba" share deletion variants {a, b} but lev = 2: the verify
    # stage must kill the candidate at d=1
    got = fuzzy_key_map(
        _df(spark, "lk", ["ab"]), _df(spark, "rk", ["ba"]),
        left_on="lk", right_on="rk", max_dist=1,
    ).collect()
    assert got == []


def test_fuzzy_key_map_nulls_dupes_and_validation(spark):
    left = spark.createDataFrame([("abc",), ("abc",), (None,)], "lk string")
    right = _df(spark, "rk", ["abc"])
    rows = fuzzy_key_map(
        left, right, left_on="lk", right_on="rk"
    ).collect()
    assert [(r.lk, r.rk, r.dist) for r in rows] == [("abc", "abc", 0)]
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_key_map(left, right, left_on="lk", right_on="rk", max_dist=3)
    with pytest.raises(ValueError, match="alias"):
        fuzzy_key_map(left, left, left_on="lk", right_on="lk")


def test_fuzzy_join_fans_out_duplicate_keys(spark):
    left = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "zzz")], "lid long, lk string"
    )
    right = spark.createDataFrame(
        [(10, "abd"), (11, "abc")], "rid long, rk string"
    )
    rows = {
        (r.lid, r.rid, r.dist)
        for r in fuzzy_join(
            left, right, left_on="lk", right_on="rk", max_dist=1
        ).collect()
    }
    assert rows == {
        (1, 10, 1), (1, 11, 0),
        (2, 10, 1), (2, 11, 0),
    }


def test_fuzzy_key_map_no_cartesian_in_plan(spark):
    left = _df(spark, "lk", [f"key{i}" for i in range(50)])
    right = _df(spark, "rk", [f"key{i}x" for i in range(50)])
    out = fuzzy_key_map(left, right, left_on="lk", right_on="rk")
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_fuzzy_join_rejects_cross_side_collisions(spark):
    """Review finding: a right_on (or dist_col) column already on the
    left made the second using-column join resolve to the wrong side and
    silently return empty results."""
    left = spark.createDataFrame(
        [(1, "abc", "noise")], "lid long, lk string, rk string"
    )
    right = spark.createDataFrame([(10, "abd")], "rid long, rk string")
    with pytest.raises(ValueError, match="left already has column 'rk'"):
        fuzzy_join(left, right, left_on="lk", right_on="rk")
    with pytest.raises(ValueError, match="right already has column 'lk'"):
        fuzzy_join(
            right.withColumnRenamed("rk", "lk"),
            spark.createDataFrame([(1, "abc", "x")], "rid long, rk string, lk string"),
            left_on="lk", right_on="rk",
        )


def test_fuzzy_key_map_rejects_dist_col_collision(spark):
    left = _df(spark, "lk", ["abc"])
    right = _df(spark, "rk", ["abd"])
    with pytest.raises(ValueError, match="dist_col"):
        fuzzy_key_map(left, right, left_on="lk", right_on="rk", dist_col="lk")


def test_fuzzy_key_map_expression_hostile_column_names(spark):
    """Key columns whose names contain spaces, dots, or hyphens must
    resolve (review finding: the deletion neighborhood was built by
    splicing raw names into SQL strings, which mis-parsed such names;
    it is now Column-based, so nothing is re-parsed)."""
    left = spark.createDataFrame(
        [("kitten",), ("apple",)], ["left key.with-odd chars"]
    )
    right = spark.createDataFrame(
        [("mitten",), ("apple",)], ["right key.with-odd chars"]
    )
    out = fuzzy_key_map(
        left,
        right,
        left_on="left key.with-odd chars",
        right_on="right key.with-odd chars",
        max_dist=1,
    ).collect()
    got = {
        (r["left key.with-odd chars"], r["right key.with-odd chars"], r["dist"])
        for r in out
    }
    assert got == {("kitten", "mitten", 1), ("apple", "apple", 0)}
