"""Reference-surface operators (SURVEY.md §2.1-2.3) on the events stream.

Split out of ``__spark_entry__.py`` (round 9): one module per query
family, registering into the shared registry on import. Entry bodies are
unchanged — see ``_registry`` for ``_register`` / ``_t`` / the index
builders, and ``__spark_entry__`` for the driver contract surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mortar_parquet_support_spark.plans.hints import maybe_broadcast

from ._registry import (
    _IVF_CACHE,
    _entry_digest,
    _register,
    _t,
    digest_index_for,
    ivf_index_for,
    pq_index_for,
)

# ===========================================================================
# Reference-surface operators (SURVEY.md §2.1-2.3) on the events "stream"
# ===========================================================================

@_register(
    "flagship_scan",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE event_type IN ('click', 'purchase')
      AND ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def _flagship_scan(spark, sf_dir):
    """P5∧P6∧P7 (client.py:65-72): IN-set + inclusive time range, pushed to
    the scan (PushedFilters on both columns)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("ts").between("2024-01-10 00:00:00", "2024-01-20 00:00:00")
    ).select("event_id", "ts", "user_id", "event_type", "value")


@_register(
    "semi_join_ids",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id IN (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 150
    )
    """,
)
def _semi_join_ids(spark, sf_dir):
    """§2.5 composite at scale: broadcast LEFT SEMI join of the stream
    against a derived id set (the graph->data bridge shape)."""
    ev = _t(spark, sf_dir, "events")
    ids = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150)).select(
        "user_id"
    ).distinct()
    return ev.join(F.broadcast(ids), "user_id", "left_semi").select(
        "event_id", "user_id", "event_type", "value"
    )


@_register(
    "anti_join",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 40
    )
    """,
)
def _anti_join(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS) — declared-absent in the reference
    (SURVEY §2.6), table stakes for an engine. The quantity restriction on
    the probe side keeps the result NON-empty (3 rows at sf0.01) so the
    oracle match is evidence, not a vacuous 0 == 0."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40)
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@_register(
    "union_sites",
    """
    SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
    """,
)
def _union_sites(spark, sf_dir):
    """O4 (client.py:63): vertical union of per-'site' result frames."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.filter(F.col("event_type") == "click").unionByName(
        ev.filter(F.col("event_type") == "error")
    )


@_register("distinct_types", "SELECT DISTINCT event_type FROM events")
def _distinct_types(spark, sf_dir):
    """O3 (client.py:69): distinct value harvest."""
    return _t(spark, sf_dir, "events").select("event_type").distinct()


@_register("row_count", "SELECT CAST(count(*) AS BIGINT) AS n FROM events")
def _row_count(spark, sf_dir):
    """O5 (client.py:75-80): row-count aggregate."""
    return _t(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("n"))


@_register(
    "limit_exact",
    "SELECT event_id, user_id, value FROM events ORDER BY event_id LIMIT 100",
)
def _limit_exact(spark, sf_dir):
    """O2 with the documented upgrade: EXACT limit (SURVEY §7 R4) over a
    deterministic order."""
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
        .limit(100)
    )


@_register(
    "stringify_cast",
    """
    SELECT CAST(event_id AS VARCHAR) AS event_id_str,
           CAST(user_id AS VARCHAR) AS user_id_str,
           'urn:site0/' || event_type AS uri
    FROM events
    """,
)
def _stringify_cast(spark, sf_dir):
    """P8 (client.py:43,53) stringified bindings + P3 computed uri."""
    return _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("event_id_str"),
        F.col("user_id").cast("string").alias("user_id_str"),
        F.concat(F.lit("urn:site0/"), F.col("event_type")).alias("uri"),
    )


@_register(
    "regex_extract_filter",
    """
    SELECT event_id, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
    FROM events
    WHERE regexp_matches(props, '"k": \\d+')
    """,
)
def _regex_extract_filter(spark, sf_dir):
    """P9/S2 analog: regex validity filter + extraction (transform.py:10-16
    filename-UUID parse re-expressed as a column op)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("props").rlike('"k": \\d+')).select(
        "event_id",
        F.regexp_extract("props", '"k": (\\d+)', 1).cast("long").alias("k"),
    )


# ===========================================================================
