"""validate_expectations (operators/validate.py): declarative data-quality
gate — row-level rules share one aggregate scan; unique/foreign_key add
bounded jobs; per-rule NULL semantics are explicit."""

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.validate import (
    validate_expectations,
)


def test_validate_expectations_all_rule_types(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "x@y.com", 100),
            (2, None, "A", "bad", 100),
            (3, 99.0, "Z", None, 200),
            (3, 5.0, "N", "a@b.io", 999),
            (None, -1.0, "R", "c@d.net", 100),
        ],
        "id long, qty double, flag string, email string, fk long",
    )
    ref = spark.createDataFrame([(100,), (200,)], "k long")
    rules = [
        {"name": "id_not_null", "type": "not_null", "column": "id"},
        {"name": "qty_range", "type": "range", "column": "qty",
         "min": 0, "max": 50},
        {"name": "flag_set", "type": "in_set", "column": "flag",
         "values": ["A", "N", "R"]},
        {"name": "email_regex", "type": "regex", "column": "email",
         "pattern": r"^[^@]+@[^@]+\.[^@]+$"},
        {"name": "qty_pos_sql", "type": "sql", "expr": "qty > 0"},
        {"name": "id_unique", "type": "unique", "columns": ["id"]},
        {"name": "fk_valid", "type": "foreign_key", "columns": ["fk"],
         "ref": ref, "ref_columns": ["k"]},
    ]
    out = {r.rule: r.n_violations
           for r in validate_expectations(df, rules).collect()}
    assert out == {
        "id_not_null": 1,   # the NULL id
        "qty_range": 2,     # 99.0, -1.0; NULL qty passes (composable)
        "flag_set": 1,      # Z
        "email_regex": 1,   # 'bad'; NULL email passes
        "qty_pos_sql": 2,   # -1.0 fails, NULL qty is UNKNOWN -> violation
        "id_unique": 2,     # id=3 appears twice -> both rows count
        "fk_valid": 1,      # 999 not in ref; NULL fk would pass
    }
    # clean table: every rule reports 0 (rows present, all zeros)
    clean = spark.createDataFrame(
        [(1, 1.0, "A", "a@b.c", 100)],
        "id long, qty double, flag string, email string, fk long",
    )
    z = {r.rule: r.n_violations
         for r in validate_expectations(clean, rules).collect()}
    assert set(z) == set(out) and all(v == 0 for v in z.values())
    # validation of the rule list itself
    with pytest.raises(ValueError, match="at least one"):
        validate_expectations(df, [])
    with pytest.raises(ValueError, match="duplicate rule names"):
        validate_expectations(
            df,
            [{"name": "a", "type": "not_null", "column": "id"},
             {"name": "a", "type": "not_null", "column": "qty"}],
        )
    with pytest.raises(ValueError, match="unknown rule type"):
        validate_expectations(df, [{"name": "x", "type": "bogus"}])
    with pytest.raises(ValueError, match="length mismatch"):
        validate_expectations(
            df,
            [{"name": "f", "type": "foreign_key", "columns": ["fk", "id"],
              "ref": ref, "ref_columns": ["k"]}],
        )


def test_validate_expectations_single_scan_for_row_rules(spark):
    """All row-level rules fold into ONE aggregate over the input — the
    plan contains exactly one scan of the source for the stacked leg."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    out = validate_expectations(
        df,
        [
            {"name": "a", "type": "not_null", "column": "id"},
            {"name": "b", "type": "range", "column": "v", "min": 0},
            {"name": "c", "type": "sql", "expr": "v < 7"},
        ],
    )
    assert {r.rule: r.n_violations for r in out.collect()} == {
        "a": 0, "b": 0, "c": 0,
    }
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]  # AQE prints the plan twice
    )
    assert plan.count("Range (0, 1000") == 1  # one source scan


def test_psi_drift_known_values(spark):
    """psi_drift: hand-computable PSI on a 2-bin split, zero drift on
    identical frames, out-of-range current values clamp into edge bins,
    epsilon smoothing for empty bins, NULL exclusion, validation."""
    from mortar_parquet_support_spark.operators.profile import psi_drift

    # ref: 50 values in [0,1), 50 in [1,2) -> p = (0.5, 0.5) over 2 bins
    ref = spark.createDataFrame(
        [(i, 0.5) for i in range(50)] + [(i, 1.5) for i in range(50, 100)],
        "id long, v double",
    )
    # cur: 80/20 split -> q = (0.8, 0.2)
    cur = spark.createDataFrame(
        [(i, 0.5) for i in range(80)] + [(i, 1.5) for i in range(80, 100)],
        "id long, v double",
    )
    row = psi_drift(ref, cur, value="v", bins=2).collect()[0]
    import math

    expect = (0.5 - 0.8) * math.log(0.5 / 0.8) + (0.5 - 0.2) * math.log(
        0.5 / 0.2
    )
    assert abs(row.psi - round(expect, 6)) < 1e-9
    assert row.n_ref == 100 and row.n_cur == 100
    # identical distributions -> PSI 0.0
    z = psi_drift(ref, ref, value="v", bins=2).collect()[0]
    assert z.psi == 0.0
    # current values outside the reference range clamp to edge bins
    # (counted as drift, not dropped) and NULLs are excluded
    far = spark.createDataFrame(
        [(1, -99.0), (2, -98.0), (3, None)], "id long, v double"
    )
    c = psi_drift(ref, far, value="v", bins=2).collect()[0]
    # both clamp into bin 0 -> q = (1.0, 0.0) vs p = (0.5, 0.5)
    assert c.n_cur == 2 and c.psi > 0.25  # hard drift
    import pytest as _pt

    with _pt.raises(ValueError, match="bins"):
        psi_drift(ref, cur, value="v", bins=0)
    with _pt.raises(ValueError, match="no non-NULL"):
        psi_drift(
            spark.createDataFrame([(1, None)], "id long, v double"),
            cur, value="v",
        )


def test_categorical_drift_proportions_and_arrivals(spark):
    """categorical_drift: hand-checked proportions/contributions, NULL
    categories tracked as their own row, new categories surface with
    NULL contrib (no reference expectation), zero drift on identity."""
    from mortar_parquet_support_spark.operators.profile import (
        categorical_drift,
    )

    ref = spark.createDataFrame(
        [("en",)] * 8 + [("de",)] * 2, "lang string"
    )
    cur = spark.createDataFrame(
        [("en",)] * 5 + [("de",)] * 4 + [("fr",)] * 1, "lang string"
    )
    out = {r.category: r for r in categorical_drift(
        ref, cur, value="lang"
    ).collect()}
    assert out["en"].p_ref == 0.8 and out["en"].p_cur == 0.5
    assert abs(out["en"].contrib - round(0.3 * 0.3 / 0.8, 6)) < 1e-12
    assert out["de"].p_ref == 0.2 and out["de"].p_cur == 0.4
    # fr is NEW: no expected proportion -> NULL contrib, the arrival flag
    assert out["fr"].n_ref == 0 and out["fr"].contrib is None
    # identity -> every contrib 0
    same = categorical_drift(ref, ref, value="lang").collect()
    assert all(r.contrib == 0.0 for r in same)
    # NULL category is a category (attribution gap = mix shift)
    refn = spark.createDataFrame([("en",), (None,)], "lang string")
    curn = spark.createDataFrame([(None,), (None,)], "lang string")
    rows = {r.category: r for r in categorical_drift(
        refn, curn, value="lang"
    ).collect()}
    assert rows[None].n_ref == 1 and rows[None].n_cur == 2


def test_psi_drift_by_group_equals_ungrouped_per_group(spark):
    """psi_drift_by: each group's row equals running the ungrouped
    psi_drift on that group alone; reference-unseen current groups are
    excluded; constant groups are single-bin PSI 0."""
    from mortar_parquet_support_spark.operators.profile import (
        psi_drift,
        psi_drift_by,
    )

    def frame(spec):
        rows = []
        for g, vals in spec.items():
            rows += [(g, float(x)) for x in vals]
        return spark.createDataFrame(rows, "g string, v double")

    ref = frame({
        "a": [0.5] * 50 + [1.5] * 50,
        "b": [10] * 30 + [20] * 10,
        "c": [7] * 5,  # constant group
    })
    cur = frame({
        "a": [0.5] * 80 + [1.5] * 20,
        "b": [10] * 10 + [20] * 30,
        "c": [7] * 9,
        "newgrp": [1] * 4,  # no reference baseline -> excluded
    })
    out = {r.g: r for r in psi_drift_by(
        ref, cur, value="v", keys=["g"], bins=2
    ).collect()}
    assert set(out) == {"a", "b", "c"}
    for g in ("a", "b", "c"):
        solo = psi_drift(
            ref.filter(F.col("g") == g), cur.filter(F.col("g") == g),
            value="v", bins=2,
        ).collect()[0]
        assert out[g].psi == solo.psi, g
        assert out[g].n_ref == solo.n_ref and out[g].n_cur == solo.n_cur
    assert out["c"].psi == 0.0  # constant group, single bin
    assert out["a"].psi > 0.1 and out["b"].psi > 0.1
    import pytest as _pt

    with _pt.raises(ValueError, match="needs keys"):
        psi_drift_by(ref, cur, value="v", keys=[])


def test_embedding_drift_hand_computed(spark):
    """embedding_drift: hand-checkable mean vectors, identity cosine 1,
    opposed corpora NULL cosine (zero mean), NULL vectors excluded."""
    from mortar_parquet_support_spark.operators.embeddings import (
        embedding_drift,
    )

    ref = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    cur = spark.createDataFrame(
        [(4, [0.0, 2.0]), (5, [2.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    r = embedding_drift(ref, cur).collect()[0]
    # means: ref (1, 0); cur (1, 1) -> cos = 1/sqrt(2)
    import math

    assert abs(r.mean_cosine - round(1 / math.sqrt(2), 6)) < 1e-9
    assert r.ref_norm == 1.0 and abs(r.cur_norm - round(math.sqrt(2), 6)) < 1e-9
    assert r.n_ref == 2 and r.n_cur == 2  # NULL vector excluded
    # identity -> cosine exactly 1.0
    same = embedding_drift(ref, ref).collect()[0]
    assert same.mean_cosine == 1.0
    # perfectly opposed current corpus -> zero mean -> NULL cosine
    opp = spark.createDataFrame(
        [(6, [1.0, 1.0]), (7, [-1.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    z = embedding_drift(ref, opp).collect()[0]
    assert z.mean_cosine is None and z.cur_norm == 0.0
    # empty side (r11 ADVICE): n = NULL like SQL max over an empty set,
    # not 0 — Spark and a DuckDB oracle must agree on the edge
    empty = spark.createDataFrame(
        [(8, None)], "vec_id long, embedding array<double>"
    )
    e = embedding_drift(ref, empty).collect()[0]
    assert e.n_cur is None and e.n_ref == 2
    assert e.mean_cosine is None and e.cur_norm == 0.0
