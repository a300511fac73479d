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

# --- sparql_bridges: the flagship graph leg, under a full DuckDB oracle ----
#
# The entry runs the reference's QUERY1 verbatim (client.py:130-140 — the
# `rdf:type/rdfs:subClassOf*` temperature-bridge query) through the full
# engine stack: TTL parse -> triples DataFrame -> shared-ontology closure ->
# BGP join compilation, per-site scoping with a provenance column. Before
# returning, it exports the exact triples the engine consumed to parquet at
# an import-time-fixed path; the oracle restates the whole query as DuckDB
# SQL over that export, INCLUDING recomputing the subClassOf closure itself
# with a recursive CTE — a fully independent derivation of the binding set
# (promoted from rows-only in round 12, the same path that graduated
# lttb/temperature_mixture/mmr_rerank).
#
# The fixture graph is built so every binding has exactly ONE derivation
# (each point carries a single rdf:type, one timeseries bnode, one id), so
# SPARQL multiset semantics and the SQL join agree on multiplicity 1 and
# neither side needs a DISTINCT that could mask duplicate-row bugs.

import os as _os
import tempfile as _tempfile

_ONTOLOGY_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "resources",
    "brick_subset.ttl",
)
_BRICK = "https://brickschema.org/schema/Brick#"
_QUERY1 = """
    PREFIX brick: <https://brickschema.org/schema/Brick#>
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    SELECT ?vav ?sen ?sp  WHERE {
    ?sen_point rdf:type/rdfs:subClassOf* brick:Temperature_Sensor ;
        brick:timeseries [ brick:hasTimeseriesId ?sen ] .
    ?sp_point rdf:type/rdfs:subClassOf* brick:Temperature_Setpoint ;
        brick:timeseries [ brick:hasTimeseriesId ?sp ] .
    ?vav a brick:VAV .
    ?vav brick:hasPoint ?sen_point, ?sp_point .
}"""

# Sensor/setpoint leaf classes cycled across the fixture's points: each
# reaches Temperature_Sensor / Temperature_Setpoint through 0-3 hops of the
# shipped brick_subset.ttl hierarchy, so the closure leg is exercised at
# every depth including the zero-length path (the base class itself).
_SENSOR_CLASSES = [
    "Zone_Air_Temperature_Sensor",       # 3 hops to Temperature_Sensor
    "Supply_Air_Temperature_Sensor",     # 2 hops
    "Water_Temperature_Sensor",          # 1 hop
    "Temperature_Sensor",                # 0 hops (zero-length path)
]
_SETPOINT_CLASSES = [
    "Zone_Air_Temperature_Setpoint",
    "Occupied_Cooling_Temperature_Setpoint",
    "Temperature_Setpoint",
]


def _bridge_site_ttl(site: str, n_vav: int) -> str:
    """Deterministic Brick-shaped site graph: ``n_vav`` VAVs, each with one
    typed temperature sensor, one typed setpoint, and one non-temperature
    decoy point (CO2), all bridged to timeseries ids through blank nodes.
    vav0 additionally carries a second sensor and second setpoint (the
    object-list multi-match case, 4 bridge rows); an orphan sensor with an
    id but no hasPoint edge and an RVAV (subclass of VAV — QUERY1's
    ``a brick:VAV`` is an exact-type match, so it must NOT bridge) pin the
    negative space."""
    sid = [0]

    def uid() -> str:
        sid[0] += 1
        return f"00000000-0000-4000-8000-{ord(site[-1]):02x}{sid[0]:010d}"

    lines = [
        "@prefix brick: <https://brickschema.org/schema/Brick#> .",
        f"@prefix b: <urn:{site}#> .",
    ]

    def point(name: str, cls: str) -> None:
        lines.append(f"b:{name} a brick:{cls} .")
        lines.append(
            f'b:{name} brick:timeseries [ brick:hasTimeseriesId "{uid()}" ] .'
        )

    for i in range(n_vav):
        point(f"vav{i}_sen", _SENSOR_CLASSES[i % len(_SENSOR_CLASSES)])
        point(f"vav{i}_sp", _SETPOINT_CLASSES[i % len(_SETPOINT_CLASSES)])
        point(f"vav{i}_co2", "CO2_Sensor")
        extra = ""
        if i == 0:
            point("vav0_sen2", _SENSOR_CLASSES[(i + 1) % len(_SENSOR_CLASSES)])
            point("vav0_sp2", _SETPOINT_CLASSES[(i + 1) % len(_SETPOINT_CLASSES)])
            extra = ", b:vav0_sen2, b:vav0_sp2"
        lines.append(f"b:vav{i} a brick:VAV .")
        lines.append(
            f"b:vav{i} brick:hasPoint b:vav{i}_sen, b:vav{i}_sp, "
            f"b:vav{i}_co2{extra} ."
        )
    point("orphan_sen", _SENSOR_CLASSES[0])
    point("rv_sen", _SENSOR_CLASSES[0])
    point("rv_sp", _SETPOINT_CLASSES[0])
    lines.append("b:rv a brick:RVAV .")
    lines.append("b:rv brick:hasPoint b:rv_sen, b:rv_sp .")
    return "\n".join(lines)


def _sparql_fixture_fingerprint() -> str:
    """Content fingerprint of everything the export depends on (both
    site TTLs + the shipped ontology). The export dir is keyed on it —
    NOT on the pid (review r12: a pid-keyed path broke any harness that
    replays oracle_sql() in a different process than the entry, and
    accumulated one dir per process) — so the path is stable across
    processes, changes exactly when the fixture changes, and concurrent
    sessions write byte-identical content."""
    import hashlib

    with open(_ONTOLOGY_PATH, "rb") as fh:
        onto = fh.read()
    blob = (
        _bridge_site_ttl("siteA", 8) + _bridge_site_ttl("siteB", 3)
    ).encode() + onto
    return hashlib.md5(blob).hexdigest()[:12]


_SPARQL_ORACLE_DIR = _os.path.join(
    _tempfile.gettempdir(),
    f"mortar_sparql_oracle_{_sparql_fixture_fingerprint()}",
)

_SPARQL_BRIDGES_ORACLE = f"""
    WITH RECURSIVE t AS (
      SELECT site, subject, predicate, object
      FROM read_parquet('{_SPARQL_ORACLE_DIR}/*.parquet')
    ),
    edges AS (
      SELECT subject AS c, object AS s FROM t
      WHERE predicate = 'http://www.w3.org/2000/01/rdf-schema#subClassOf'
    ),
    types AS (
      SELECT site, subject, object AS cls FROM t
      WHERE predicate = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
        AND site <> '__ontology__'
    ),
    cls(node, super) AS (
      SELECT DISTINCT cls, cls FROM types
      UNION
      SELECT c.node, e.s FROM cls c JOIN edges e ON c.super = e.c
    ),
    ids AS (
      SELECT a.site, a.subject AS pt, b.object AS id
      FROM t a JOIN t b ON a.site = b.site AND a.object = b.subject
      WHERE a.predicate = '{_BRICK}timeseries'
        AND b.predicate = '{_BRICK}hasTimeseriesId'
    ),
    sens AS (
      SELECT ty.site, ty.subject FROM types ty JOIN cls ON ty.cls = cls.node
      WHERE cls.super = '{_BRICK}Temperature_Sensor'
    ),
    sps AS (
      SELECT ty.site, ty.subject FROM types ty JOIN cls ON ty.cls = cls.node
      WHERE cls.super = '{_BRICK}Temperature_Setpoint'
    ),
    vavs AS (
      SELECT site, subject FROM types WHERE cls = '{_BRICK}VAV'
    ),
    haspoint AS (
      SELECT site, subject, object FROM t
      WHERE predicate = '{_BRICK}hasPoint'
    )
    SELECT v.subject AS vav, i1.id AS sen, i2.id AS sp, v.site AS site
    FROM vavs v
    JOIN haspoint h1 ON h1.site = v.site AND h1.subject = v.subject
    JOIN sens se ON se.site = h1.site AND se.subject = h1.object
    JOIN ids i1 ON i1.site = h1.site AND i1.pt = h1.object
    JOIN haspoint h2 ON h2.site = v.site AND h2.subject = v.subject
    JOIN sps sp2 ON sp2.site = h2.site AND sp2.subject = h2.object
    JOIN ids i2 ON i2.site = h2.site AND i2.pt = h2.object
"""


@_register("sparql_bridges", _SPARQL_BRIDGES_ORACLE)
def _sparql_bridges(spark, sf_dir):
    """G1-G8 + closure under driver-grade hash evidence: the reference's
    QUERY1 (client.py:130-140) verbatim — `rdf:type/rdfs:subClassOf*`
    through the shipped Brick hierarchy, blank-node bridges, object lists,
    per-site scoping — over a deterministic two-site fixture graph. The
    triples the engine consumed (site graphs + shared ontology) are
    exported to parquet so the DuckDB oracle can replay the whole query,
    recursive closure included, as plain SQL self-joins. Graph data is
    independent of sf_dir (the corpus ships with the engine)."""
    from mortar_parquet_support_spark.client import Client
    from mortar_parquet_support_spark.sources.ttl import TRIPLES_SCHEMA, parse_ttl

    from mortar_parquet_support_spark.functions import tiny_frame

    rows = parse_ttl(_bridge_site_ttl("siteA", 8), "siteA") + parse_ttl(
        _bridge_site_ttl("siteB", 3), "siteB"
    )
    triples = tiny_frame(spark, rows, TRIPLES_SCHEMA)
    client = Client(spark, triples=triples, ontology_path=_ONTOLOGY_PATH)
    # export once per fixture version: the dir is content-fingerprinted
    # and the write is deterministic, so an existing _SUCCESS means the
    # bytes are already right — skipping avoids the overwrite's
    # delete-then-write window racing a concurrent session's oracle read.
    # tiny_frame (single-slice), not coalesce(1): the coalesce pulled all
    # 32 python-RDD slices through one task serially (review r12).
    if not _os.path.exists(_os.path.join(_SPARQL_ORACLE_DIR, "_SUCCESS")):
        tiny_frame(
            spark,
            [tuple(r) for r in client.triples.collect()],
            client.triples.schema,
        ).write.mode("overwrite").parquet(_SPARQL_ORACLE_DIR)
    return client.sparql(_QUERY1, sites=["siteA", "siteB"])


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
# Lake lifecycle (sources/maintenance.py) under full DuckDB oracles:
# compaction and keyed upsert must preserve/produce EXACTLY the content an
# independent engine derives from the source table — the maintenance ops'
# side effects (file counts, layout) are asserted loudly in-entry, while
# the surviving DATA is value-hashed against the oracle.
# ===========================================================================


def _events_lake_frame(spark, sf_dir, *, mod=5, rem=0, value=None, keep_id=True):
    """Deterministic lake-schema frame derived from the events table
    (collection = site || user_id%2, uuid = event_type) — SQL-expressible
    on purpose so maintenance round-trips can be oracle-checked. This is
    the ONE spelling of the mapping (the compaction base, the upsert
    base/corrections/inserts, and their oracle CTEs all mirror it — a
    schema tweak must change exactly one Spark site). ``event_id % mod ==
    rem`` slices the table; ``value`` overrides the value column (the
    corrections leg); (collection, uuid, time) is collision-free on the
    seed-42 fixtures at every SF for the slices used (verified r12 — a
    future fixture regen that breaks this shows up as an oracle hash
    mismatch, not a silent wrong answer)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % mod == rem)
    id_cols = [F.col("event_id")] if keep_id else []
    return ev.select(
        *id_cols,
        F.concat(F.lit("site"), (F.col("user_id") % 2).cast("string")).alias(
            "collection"
        ),
        F.col("event_type").alias("uuid"),
        F.col("ts").alias("time"),
        (F.col("value") if value is None else value).alias("value"),
        F.col("event_type").alias("label"),
        F.concat(F.lit("urn:"), F.col("event_type")).alias("uri"),
    )


_LAKE_AGG_SQL = """
    SELECT collection, uuid, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_value,
           MIN(time) AS min_time, MAX(time) AS max_time
    FROM {src} GROUP BY collection, uuid
"""


def _lake_agg(df):
    """The Spark twin of _LAKE_AGG_SQL (decimal sum: associative, so the
    two engines' reduction orders cannot diverge in the last bits)."""
    return df.groupBy("collection", "uuid").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_value"),
        F.min("time").alias("min_time"),
        F.max("time").alias("max_time"),
    )


@_register(
    "compact_roundtrip",
    """
    WITH lake AS (
      SELECT 'site' || CAST(user_id % 2 AS VARCHAR) AS collection,
             event_type AS uuid, ts AS time, value
      FROM events WHERE event_id % 5 = 0
    )
    """
    + _LAKE_AGG_SQL.format(src="lake"),
)
def _compact_roundtrip(spark, sf_dir):
    """Small-file compaction round-trip (sources/maintenance.py
    compact_collections): fragment a lake across four append passes,
    compact it back to few range-clustered files, and prove BOTH halves
    of the contract — the file count strictly drops (loud in-entry
    assert, the side effect the op exists for) and the surviving rows
    are bit-identical to what DuckDB derives straight from the events
    table (the oracle: compaction may move bytes, never change them)."""
    import glob
    import os
    import tempfile

    from mortar_parquet_support_spark.sources.ingest import (
        LAKE_COLUMNS,
        write_lake,
    )
    from mortar_parquet_support_spark.sources.maintenance import (
        compact_collections,
    )

    frame = _events_lake_frame(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="mortar_compact_")
    lake = os.path.join(work, "lake")
    # four disjoint append passes = the incremental-ingest fragmentation
    # pattern compaction exists to undo (>=1 file per collection per pass)
    for part in range(4):
        write_lake(
            frame.filter(F.pmod("event_id", F.lit(4)) == part).select(
                *LAKE_COLUMNS
            ),
            lake,
        )
    pattern = os.path.join(lake, "collection=*", "*.parquet")
    files_before = len(glob.glob(pattern))
    compact_collections(spark, lake)
    files_after = len(glob.glob(pattern))
    if not 0 < files_after < files_before:
        raise AssertionError(
            f"compaction must shrink the file count: {files_before} -> "
            f"{files_after}"
        )
    return _lake_agg(spark.read.parquet(lake))


@_register(
    "upsert_roundtrip",
    """
    WITH base AS (
      SELECT 'site' || CAST(user_id % 2 AS VARCHAR) AS collection,
             event_type AS uuid, ts AS time, value
      FROM events WHERE event_id % 5 = 0
    ),
    upd AS (
      SELECT 'site' || CAST(user_id % 2 AS VARCHAR) AS collection,
             event_type AS uuid, ts AS time, value + 100 AS value
      FROM events WHERE event_id % 10 = 0
      UNION ALL
      SELECT 'site' || CAST(user_id % 2 AS VARCHAR), event_type, ts, value
      FROM events WHERE event_id % 5 = 3
    ),
    merged AS (
      SELECT * FROM upd
      UNION ALL
      SELECT b.* FROM base b WHERE NOT EXISTS (
        SELECT 1 FROM upd u
        WHERE u.collection = b.collection AND u.uuid = b.uuid
          AND u.time = b.time)
    )
    """
    + _LAKE_AGG_SQL.format(src="merged"),
)
def _upsert_roundtrip(spark, sf_dir):
    """Keyed upsert round-trip (sources/maintenance.py upsert_lake):
    corrections (+100 on every %10 stream reading, update-wins) and
    late-arriving inserts (the disjoint %5==3 slice) merge into the lake;
    DuckDB replays the merge as upd UNION ALL (base EXCEPT upd-keys) and
    the result is value-hashed. Update-beats-base and insert-survives are
    thereby both pinned; the within-batch tie-break path never fires here
    (the updates batch is key-unique on these fixtures — divergence would
    fail the hash compare, not silently pass)."""
    import os
    import tempfile

    from mortar_parquet_support_spark.sources.ingest import (
        LAKE_COLUMNS,
        write_lake,
    )
    from mortar_parquet_support_spark.sources.maintenance import upsert_lake

    frame = _events_lake_frame(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="mortar_upsert_")
    lake = os.path.join(work, "lake")
    write_lake(frame.select(*LAKE_COLUMNS), lake)

    corrections = _events_lake_frame(
        spark, sf_dir, mod=10, rem=0, value=F.col("value") + 100, keep_id=False
    )
    inserts = _events_lake_frame(spark, sf_dir, mod=5, rem=3, keep_id=False)
    upsert_lake(spark, lake, corrections.unionByName(inserts))
    return _lake_agg(spark.read.parquet(lake))


@_register(
    "zorder_roundtrip",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_value,
           MIN(user_id) AS min_user, MAX(user_id) AS max_user
    FROM events GROUP BY event_type
    """,
)
def _zorder_roundtrip(spark, sf_dir):
    """Z-order layout round-trip (sources/maintenance.py write_zordered):
    events rewritten clustered on the Morton interleave of
    (user_id, log1p(value)) — value is exponentially skewed on these
    fixtures (median 35, max ~500) and zorder_key's uniform grid would
    pack 90% of rows into the bottom buckets, so the entry applies the
    function's own documented guidance and normalizes the skewed dim
    first. write_zordered clusters by NAMED columns, so the derived
    value_log rides along into the (throwaway) output files — at a real
    lake you would either accept the extra column or re-project after;
    the returned aggregate reads only the original columns either way.
    The multi-dim pruning property is witnessed
    in-entry off the real parquet footers — a value-box predicate must
    qualify a STRICT subset of the files (loud assert; a linear layout
    qualifies all of them, pinned comparatively in
    tests/test_skew_formats.py) — and the surviving rows value-hashed
    against DuckDB's direct view: the layout may move rows, never change
    them."""
    import glob
    import os
    import tempfile

    import pyarrow.parquet as pq

    from mortar_parquet_support_spark.sources.maintenance import write_zordered

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.log1p("value").alias("value_log"),
    )
    work = tempfile.mkdtemp(prefix="mortar_zorder_")
    out = os.path.join(work, "events_z")
    write_zordered(ev, out, cols=["user_id", "value_log"], bits=10, files=8)

    # the prunable box under this exponential skew is the HIGH-value tail
    # (low values appear in most z-runs; the tail clusters into few) — the
    # witness probes value >= 200, which exists at every fixture SF
    paths = glob.glob(os.path.join(out, "*.parquet"))
    hit = 0
    for f in paths:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("value")
        if any(
            md.row_group(g).column(idx).statistics.max >= 200.0
            for g in range(md.num_row_groups)
        ):
            hit += 1
    if not 0 < hit < len(paths):
        raise AssertionError(
            f"z-order must prune the value dimension: {hit}/{len(paths)} "
            "files qualify for value >= 200"
        )
    return spark.read.parquet(out).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_value"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )
