"""Data-quality expectation checks — the validation gate a lake runs
before promoting a batch (Great-Expectations-shaped, engine-native):
declare rules, get one small violations report back, wire it to a
fail/quarantine decision. Not in the reference (its ingest validates
only filename UUIDs — SURVEY §2.2 P9); a 100 TB training pipeline runs
this on every drop.

Scale shape: every ROW-LEVEL rule (not_null / range / regex / in_set /
sql) folds into ONE aggregate pass over the table — a single scan with
one conditional-sum per rule, no shuffle beyond the final 1-row
partial merge. UNIQUENESS rules each need one groupBy on their key
columns (count>1 groups summed — output is bounded by 1 row);
FOREIGN-KEY rules each cost one left-anti join against the referenced
key set (broadcast when it fits). The report is rules-count rows,
always driver-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mortar_parquet_support_spark.plans.hints import maybe_broadcast

#: rule types handled by the single-pass row-level aggregate
_ROW_LEVEL = ("not_null", "range", "regex", "in_set", "sql")


def _row_violation(rule: dict) -> "F.Column":
    """Boolean Column: TRUE iff the row violates the rule. NULL
    semantics are per-rule and explicit: range/regex/in_set PASS NULLs
    (pair with a not_null rule to reject them — the composable
    convention every expectations library uses)."""
    kind = rule["type"]
    if kind == "not_null":
        return F.col(rule["column"]).isNull()
    if kind == "range":
        if "min" not in rule and "max" not in rule:
            # a bound-less range rule would report 0 violations forever —
            # a gate that validates nothing while appearing green
            raise ValueError(
                f"range rule {rule['name']!r} needs 'min' and/or 'max'"
            )
        c = F.col(rule["column"])
        cond = F.lit(False)
        if "min" in rule:
            cond = cond | (c < F.lit(rule["min"]))
        if "max" in rule:
            cond = cond | (c > F.lit(rule["max"]))
        return c.isNotNull() & cond
    if kind == "regex":
        c = F.col(rule["column"])
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    if kind == "in_set":
        c = F.col(rule["column"])
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if kind == "sql":
        # the rule is the PASS predicate, like a CHECK constraint; NULL
        # (unknown) counts as a violation — CHECK-constraint semantics
        # would pass it, but a quality gate must not wave through rows
        # its own predicate cannot evaluate
        return ~F.coalesce(F.expr(rule["expr"]), F.lit(False))
    raise ValueError(f"unknown row-level rule type: {kind!r}")


def validate_rule_specs(rules: "list[dict]") -> None:
    """Statically validate a rule list — everything checkable WITHOUT a
    DataFrame: non-empty, unique non-injectable names, known types, and
    per-type required fields (a bound-less range rule, a regex rule
    with no pattern, etc. would otherwise surface only when the first
    batch runs). Shared by :func:`validate_expectations` and the
    streaming gate so "fails at wiring time" is actually true for the
    stream (review r11: the gate's docstring promised it, but the
    injection check only ran inside batch 0)."""
    if not rules:
        raise ValueError("validate_expectations needs at least one rule")
    names = [r["name"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {sorted(names)}")
    # rule names are spliced into a selectExpr stack() literal —
    # quotes/backticks/newlines would break (or inject into) the
    # generated SQL, so reject them up front
    bad_names = [n for n in names if any(ch in n for ch in "'`\"\n\r\\")]
    if bad_names:
        raise ValueError(
            f"rule names may not contain quotes, backticks, or "
            f"newlines: {bad_names}"
        )
    required = {
        "not_null": ("column",),
        "range": ("column",),
        "regex": ("column", "pattern"),
        "in_set": ("column", "values"),
        "sql": ("expr",),
        "unique": ("columns",),
        "foreign_key": ("columns", "ref", "ref_columns"),
    }
    for r in rules:
        kind = r.get("type")
        if kind not in required:
            raise ValueError(f"unknown rule type: {kind!r}")
        missing = [f for f in required[kind] if f not in r]
        if missing:
            raise ValueError(
                f"rule {r['name']!r} ({kind}) is missing {missing}"
            )
        if kind == "range" and "min" not in r and "max" not in r:
            raise ValueError(
                f"range rule {r['name']!r} needs 'min' and/or 'max'"
            )
        if kind == "foreign_key" and len(list(r["columns"])) != len(
            list(r["ref_columns"])
        ):
            raise ValueError(
                f"foreign_key {r['name']!r}: columns/ref_columns "
                f"length mismatch"
            )


def validate_expectations(
    df: DataFrame, rules: "list[dict]"
) -> DataFrame:
    """Run declared expectations and return the violations report:
    (``rule``, ``n_violations``) with one row per rule, n_violations 0
    when the expectation holds. Rule dicts:

    - ``{"name", "type": "not_null", "column"}``
    - ``{"name", "type": "range", "column", "min"?, "max"?}`` —
      inclusive bounds; NULLs pass (compose with not_null)
    - ``{"name", "type": "regex", "column", "pattern"}``
    - ``{"name", "type": "in_set", "column", "values"}``
    - ``{"name", "type": "sql", "expr"}`` — a boolean PASS predicate
      (CHECK-constraint shape); NULL evaluations count as violations
    - ``{"name", "type": "unique", "columns"}`` — rows carrying a
      duplicated key count as violations (a key seen 3x contributes 3)
    - ``{"name", "type": "foreign_key", "columns", "ref": DataFrame,
      "ref_columns"}`` — rows whose (non-NULL-complete) key misses the
      referenced key set; keys with any NULL component pass (SQL FK
      semantics — compose with not_null)

    Every row-level rule shares ONE aggregate scan; each unique /
    foreign_key rule adds its own bounded job. Rule names must be
    unique (the report keys on them)."""
    validate_rule_specs(rules)

    spark = df.sparkSession
    reports: "list[DataFrame]" = []

    row_rules = [r for r in rules if r["type"] in _ROW_LEVEL]
    if row_rules:
        aggs = [
            F.sum(_row_violation(r).cast("long")).alias(r["name"])
            for r in row_rules
        ]
        wide = df.agg(*aggs)
        # long-form: one row per rule, stable schema regardless of count
        stacked = wide.selectExpr(
            "stack({n}, {args}) as (rule, n_violations)".format(
                n=len(row_rules),
                args=", ".join(
                    f"'{r['name']}', coalesce(`{r['name']}`, 0L)"
                    for r in row_rules
                ),
            )
        )
        reports.append(stacked)

    for r in rules:
        if r["type"] == "unique":
            cols = list(r["columns"])
            dup_rows = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("n_violations"))
                .select(
                    F.lit(r["name"]).alias("rule"),
                    F.col("n_violations").cast("long"),
                )
            )
            reports.append(dup_rows)
        elif r["type"] == "foreign_key":
            cols = list(r["columns"])
            ref_cols = list(r["ref_columns"])
            if len(cols) != len(ref_cols):
                raise ValueError(
                    f"foreign_key {r['name']!r}: columns/ref_columns "
                    f"length mismatch"
                )
            refs = (
                r["ref"]
                .select(
                    *[
                        F.col(rc).alias(c)
                        for c, rc in zip(cols, ref_cols)
                    ]
                )
                .distinct()
            )
            # only NULL-complete keys are checked (SQL FK semantics)
            cond = F.lit(True)
            for c in cols:
                cond = cond & F.col(c).isNotNull()
            misses = (
                df.select(*cols)
                .filter(cond)
                .join(maybe_broadcast(refs), cols, "left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(
                    F.lit(r["name"]).alias("rule"),
                    F.col("n_violations").cast("long"),
                )
            )
            reports.append(misses)
        elif r["type"] not in _ROW_LEVEL:
            raise ValueError(f"unknown rule type: {r['type']!r}")

    out = reports[0]
    for extra in reports[1:]:
        out = out.unionByName(extra)
    return out
