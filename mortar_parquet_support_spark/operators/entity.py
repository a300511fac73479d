"""Entity resolution: fuzzy key matching within a bounded edit distance.

North-star extension (BASELINE.json:6): joining two corpora on
almost-identical string keys — crawl domains vs registry domains, dirty
titles vs canonical titles, OCR'd ids vs master ids — is the
data-integration sibling of near-dup detection (operators/dedup.py). The
reference has no string-matching surface at all (SURVEY.md §2.6).

The scalable formulation is the SymSpell / symmetric-delete trick: two
strings are within Levenshtein distance ``d`` only if they share a member
of each other's ``<=d``-deletion neighborhoods, so candidate generation is
an EQUI-join on exploded deletion variants — never a cartesian product,
never a per-pair UDF — and the (tiny) candidate set is verified with the
built-in JVM ``levenshtein``. Cost model at 100 TB: the variant explode is
in-row (factor ~ key length for d=1), the join is a plain hash join on the
variant string, and the verify runs only on rows that share a variant —
shuffle ∝ sum of key lengths, not |L| x |R|.

Completeness (why the equi-join misses nothing, d=1 case): if lev(s,t)=0
they share the identity variant; if t deletes one char of s, t is in
del1(s) and is its own identity variant; insertion is the mirror; a
substitution at position i makes del_i(s) = del_i(t) a shared variant.
Induction extends to d=2 over the once-deleted sets. False positives
(shared variant, distance > d — e.g. "ab"/"ba") are killed by the verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hard cap — the deletion neighborhood grows ~len^d; beyond d=2 SymSpell
#: stops being the right tool (use n-gram LSH from operators/dedup.py).
_MAX_DIST = 2


def _q(name: str) -> str:
    """Backtick-quote an identifier so F.col resolves it literally —
    dots would otherwise parse as struct access, spaces/hyphens as
    syntax errors."""
    return "`" + name.replace("`", "``") + "`"


def _del1(c):
    """Column for the single-deletion neighborhood of a string Column —
    whole-stage-codegen built-ins only (transform/sequence/substr), no
    Python UDF and no SQL-string splicing, so key columns with spaces,
    dots, or backticks in their names resolve correctly (Column refs
    carry identity; nothing is re-parsed). Empty strings yield an empty
    array (sequence(1, 0) would otherwise count DOWN per Spark
    semantics). Works on lambda variables too (the d=2 inner round)."""
    return F.when(
        F.length(c) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat(
                c.substr(F.lit(1), i - F.lit(1)),
                c.substr(i + F.lit(1), F.length(c)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _attach_variants(df: DataFrame, col: str, max_dist: int, out: str) -> DataFrame:
    """Add ``out`` = all strings reachable from ``col`` by <= max_dist
    deletions, plus the identity. At d=2 the d=1 tier feeds BOTH the
    output and the second deletion round, so it is staged into its own
    named projection (functions.staged_columns semantics: CollapseProject
    keeps a multi-referenced non-trivial alias, so the O(len) variant
    array is built once per key, not twice)."""
    key = F.col(_q(col))
    if max_dist == 1:
        return df.withColumn(
            out,
            F.array_distinct(F.concat(F.array(key), _del1(key))),
        )
    return (
        df.withColumn("__d1", _del1(key))
        .withColumn(
            out,
            F.array_distinct(
                F.concat(
                    F.array(key),
                    F.col("__d1"),
                    F.flatten(F.transform(F.col("__d1"), _del1)),
                )
            ),
        )
        .drop("__d1")
    )


def fuzzy_key_map(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    max_dist: int = 1,
    dist_col: str = "dist",
) -> DataFrame:
    """Distinct key pairs (``left_on``, ``right_on``, ``dist_col``) with
    ``levenshtein(left_on, right_on) <= max_dist`` — the mapping table an
    entity-resolution pipeline joins back onto both row sets (key domains
    are small next to row counts; resolving keys once is the scalable
    shape, like IvfIndex resolves centroids once).

    Keys are deduplicated internally, NULL and non-matching keys drop
    (inner semantics). ``left_on`` and ``right_on`` must differ so the
    output is unambiguous — alias one side first. Candidates come from
    the symmetric-delete equi-join (module docstring); every candidate
    pair is verified with the exact JVM ``levenshtein``, so the result
    equals the brute-force cross join + filter, at equi-join cost."""
    if not 1 <= max_dist <= _MAX_DIST:
        raise ValueError(
            f"max_dist must be in [1, {_MAX_DIST}], got {max_dist} "
            "(for looser matching use n-gram LSH, operators/dedup.py)"
        )
    if left_on == right_on:
        raise ValueError(
            f"left_on and right_on are both {left_on!r}; alias one side "
            "so the output columns are unambiguous"
        )
    if dist_col in (left_on, right_on):
        raise ValueError(
            f"dist_col {dist_col!r} collides with a key column; the "
            "distance would silently overwrite that key"
        )
    reserved = {"__v", "__va", "__d1"}
    bad = reserved & {left_on, right_on}
    if bad:
        # the variant explode writes these scratch names via withColumn,
        # which would CLOBBER a same-named key column and emit mapping
        # rows whose key never existed in the input (review r14)
        raise ValueError(
            f"key column(s) {sorted(bad)} collide with fuzzy_key_map's "
            "scratch columns — alias them first"
        )
    # _q-escaped refs, never bare F.col(name) (or df[name], which parses
    # the same way): key names with dots/spaces/backticks must resolve
    # literally (review finding).
    lkey, rkey = F.col(_q(left_on)), F.col(_q(right_on))
    lk = _attach_variants(
        left.select(lkey).filter(lkey.isNotNull()).distinct(),
        left_on, max_dist, "__va",
    ).withColumn("__v", F.explode("__va")).drop("__va")
    rk = _attach_variants(
        right.select(rkey).filter(rkey.isNotNull()).distinct(),
        right_on, max_dist, "__va",
    ).withColumn("__v", F.explode("__va")).drop("__va")
    pairs = (
        lk.join(rk, "__v")
        .select(lkey, rkey)
        .distinct()
        .withColumn(dist_col, F.levenshtein(lkey, rkey))
        .filter(F.col(_q(dist_col)) <= max_dist)
    )
    return pairs


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    max_dist: int = 1,
    dist_col: str = "dist",
) -> DataFrame:
    """Row-level fuzzy inner join: every (left row, right row) pair whose
    keys are within ``max_dist`` edits, plus ``dist_col``. Composes
    :func:`fuzzy_key_map` with two equi-joins, so duplicate keys fan out
    exactly like a SQL join on the mapping table. The key map is tiny —
    broadcast when it fits (Catalyst/AQE decide); the row tables are only
    ever equi-joined, never compared pairwise.

    Cross-side name collisions are rejected up front: a ``right_on`` (or
    ``dist_col``) column already present in ``left`` would make the
    second using-column join resolve to the WRONG side and silently
    return empty/ambiguous results."""
    clashes = [
        f"left already has column {c!r}"
        for c in (right_on, dist_col)
        if c in left.columns
    ] + [
        f"right already has column {c!r}"
        for c in (left_on, dist_col)
        if c in right.columns
    ]
    if clashes:
        raise ValueError(
            "fuzzy_join column collisions — rename or alias first: "
            + "; ".join(clashes)
        )
    kmap = fuzzy_key_map(
        left, right, left_on=left_on, right_on=right_on,
        max_dist=max_dist, dist_col=dist_col,
    )
    return left.join(kmap, left_on).join(right, right_on)
