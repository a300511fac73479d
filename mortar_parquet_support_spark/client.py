"""Client — the reference's user-facing API
(``/root/reference/mortar-parquet-client/client.py:14-109``), Spark-native.

Holds the two abstractions together: the RDF metadata graphs (TTL -> triples
DataFrame -> SPARQL-subset engine) and the Parquet timeseries lake, bridged
by the composite graph->data semi-join (SURVEY.md §2.5): SPARQL finds stream
UUIDs, the UUIDs + a time range become a pruned scan of the lake.

Scale notes (local behavior identical, cluster behavior deliberate):

- The UUID bridge auto-switches between a driver-collected IN-list (prunes
  ``uuid=`` partition directories / row-group stats — best while the id set
  is small, reference behavior ``client.py:69-70``) and a broadcast
  ``LEFT SEMI`` join (no driver round-trip, best for huge id sets).
- ``limit`` is EXACT (``df.limit``) — documented upgrade over the
  reference's batch-granularity approximate limit (``client.py:101-104``,
  SURVEY.md §7 R4).
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mortar_parquet_support_spark.plans.sparql import SparqlEngine
from mortar_parquet_support_spark.sources import sinks
from mortar_parquet_support_spark.sources.lake import TimeseriesLake
from mortar_parquet_support_spark.sources.ttl import load_graph_dir

#: Above this many ids, skip the IN-list and use a broadcast semi-join.
IN_LIST_MAX = 10_000


class Client:
    """Parity constructor: ``Client(graph_dir, lake_root)`` mirrors
    ``Client(db_dir, bucket)`` (client.py:15). S3 lakes: pass an
    ``s3a://`` root and set fs.s3a confs on the session (S6)."""

    def __init__(
        self,
        spark: SparkSession,
        graph_dir: str | None = None,
        lake_root: str | None = None,
        *,
        triples: DataFrame | None = None,
        ontology_path: str | None = None,
    ):
        self.spark = spark
        if triples is None and graph_dir is not None:
            triples = load_graph_dir(spark, graph_dir)
        if ontology_path is not None and triples is not None:
            # the reference parses the Brick ontology into EVERY named graph
            # (setup-graphs.py:22); one shared copy with site='__ontology__'
            # unioned into every scope is equivalent for BGP matching and
            # avoids 45 duplicate copies of an 800k-triple ontology.
            from mortar_parquet_support_spark.sources.ttl import parse_ttl

            with open(ontology_path, encoding="utf-8") as fh:
                onto_rows = parse_ttl(fh.read(), "__ontology__")
            from mortar_parquet_support_spark.functions import tiny_frame

            onto = tiny_frame(spark, onto_rows, triples.schema)
            triples = triples.unionByName(onto)
        self.triples = triples
        self.engine = (
            SparqlEngine(triples, shared_sites=["__ontology__"])
            if triples is not None
            else None
        )
        self.lake = TimeseriesLake.open(spark, lake_root) if lake_root else None

    # ------------------------------------------------------------------
    # Graph queries (client.py:40-63)
    # ------------------------------------------------------------------
    def sparql(self, query: str, sites: Iterable[str] | None = None) -> DataFrame:
        """Run SPARQL; un-scoped queries span the union of all site graphs
        (default_union, setup-graphs.py:14); with ``sites`` the query runs
        per named graph and results carry a ``site`` provenance column
        (G5-G7, client.py:49-63). All columns are strings (client.py:43,53).
        """
        if self.engine is None:
            raise RuntimeError("no graphs loaded")
        if sites is None:
            return self.engine.sql(query)
        sites = list(sites)  # may be a generator; it is iterated twice below
        # compile once per site, THEN probe the first frame for the ?site
        # collision — probing with a separate engine.sql call would pay a
        # full extra compilation (pattern ordering, join planning, closure
        # lookups) for sites[0]
        bare = [self.engine.sql(query, site=site) for site in sites]
        if bare and "site" in bare[0].columns:
            # withColumn('site', provenance) would silently OVERWRITE the
            # query's own ?site binding — destroying result data beats a
            # loud error in no scenario
            raise ValueError(
                "query binds a variable named ?site, which collides with "
                "the provenance column added by sites=[...]; rename the "
                "variable or run with sites=None"
            )
        frames = [
            df.withColumn("site", F.lit(site)) for df, site in zip(bare, sites)
        ]
        if not frames:
            # reference returns an empty pd.DataFrame() for sites=[]
            # (client.py:59-60); mirror with an empty site-only frame
            from mortar_parquet_support_spark.functions import tiny_frame

            return tiny_frame(self.spark, [], "site string")
        return reduce(DataFrame.unionByName, frames)  # O4 (client.py:63)

    # ------------------------------------------------------------------
    # Composite graph->data queries (client.py:65-109)
    # ------------------------------------------------------------------
    def _uuid_ids_df(
        self, sparql_result: DataFrame, *, has_provenance: bool
    ) -> DataFrame:
        """O3 quirk parity, kept LAZY: harvest the UUID candidates from EVERY
        result column, not just the id variable (client.py:69), then keep only
        UUID-shaped strings (P9 filters what the reference would pass as
        garbage into the isin). Returns an unexecuted single-column ``uuid``
        DataFrame so the huge-id-set path never round-trips ids through the
        driver. The ``site`` column is excluded ONLY when it is the
        provenance column sites=[...] added — with sites=None a column
        named site is the user's own query variable and may bind stream
        UUIDs the reference's every-column harvest would take
        (review r14)."""
        cols = [
            c
            for c in sparql_result.columns
            if not (has_provenance and c == "site")
        ]
        stacked = sparql_result.select(
            # LOWERCASE the harvest: ingest stores uuid lowercased
            # (ingest.py F.lower on the filename stem), and isin/semi-join
            # are case-sensitive — an uppercase-hex graph id (which the
            # case-insensitive UUID_RE deliberately accepts) would
            # otherwise match zero lake rows with no error
            F.explode(
                F.array(*[F.lower(F.col(c).cast("string")) for c in cols])
            ).alias("uuid")
        )
        from mortar_parquet_support_spark.functions import is_uuid

        return stacked.filter(is_uuid("uuid")).distinct()

    def data_sparql_df(
        self,
        sparql: str,
        sites: Iterable[str] | None = None,
        start=None,
        end=None,
        limit: int | None = None,
    ) -> DataFrame:
        """The composite operator as a lazy DataFrame (the native shape; the
        pandas/CSV/DuckDB methods below are sinks over this)."""
        if self.lake is None:
            raise RuntimeError("no lake opened")
        res = self.sparql(sparql, sites=sites)
        ids_df = self._uuid_ids_df(res, has_provenance=sites is not None)
        # One bounded job picks the branch: materialize at most IN_LIST_MAX+1
        # ids. Small sets (the common case) are fully in hand already — reuse
        # them as the pruning IN-list with no second execution. Larger sets
        # stay distributed: the lazy ids frame goes straight into the
        # broadcast LEFT SEMI join and the driver never holds the id list.
        sample = ids_df.limit(IN_LIST_MAX + 1).collect()
        if len(sample) <= IN_LIST_MAX:
            out = self.lake.scan(
                uuids=sorted(row.uuid for row in sample), start=start, end=end
            )
        else:
            out = self.lake.scan_ids(ids_df, start=start, end=end)
        if limit is not None:  # limit=0 means 0 rows, not "no limit"
            out = out.limit(int(limit))
        return out

    def data_sparql(self, sparql, sites=None, start=None, end=None, limit=None):
        """client.py:95 — returns pandas."""
        return sinks.to_pandas(self.data_sparql_df(sparql, sites, start, end, limit))

    def data_sparql_to_csv(self, sparql, filename, sites=None, start=None, end=None, limit=None) -> int:
        """client.py:74 — appends to one local CSV, returns the row count."""
        return sinks.to_local_csv(self.data_sparql_df(sparql, sites, start, end, limit), filename)

    def data_sparql_to_duckdb(self, sparql, database, table, sites=None, start=None, end=None, limit=None):
        """client.py:82 — lands the result in a DuckDB table; the open
        connection persists as ``self.data_cache`` (parity with client.py:84)
        and the relation is returned. The cached connection is keyed by the
        database path: a call with a DIFFERENT path opens that database
        fresh (reference behavior — client.py:84 reconnects per call)
        instead of silently writing the table into the previous one."""
        cached_db, cached_con = getattr(self, "_duck_cache", (None, None))
        reuse = None
        if cached_con is not None:
            if cached_db == database:
                try:
                    cached_con.execute("SELECT 1")
                    reuse = cached_con
                except Exception:
                    # the caller owns the connection's lifetime and may
                    # have closed it — reopen instead of crashing on reuse
                    reuse = None
            else:
                # path changed: release the old handle (file lock/fd)
                # instead of leaking it for the process lifetime
                try:
                    cached_con.close()
                except Exception:
                    pass
        self.data_cache = sinks.to_duckdb(
            self.data_sparql_df(sparql, sites, start, end, limit),
            database,
            table,
            connection=reuse,
        )
        self._duck_cache = (database, self.data_cache)
        return self.data_cache.table(table)

    # ------------------------------------------------------------------
    # id -> data (the reference's own TODO at client.py:13)
    # ------------------------------------------------------------------
    def data_uuids(self, uuids: Iterable[str], start=None, end=None) -> DataFrame:
        if self.lake is None:
            raise RuntimeError("no lake opened")
        # same case normalization as the SPARQL harvest: the lake stores
        # lowercased uuids
        return self.lake.scan(
            uuids=[u.lower() for u in uuids], start=start, end=end
        )
