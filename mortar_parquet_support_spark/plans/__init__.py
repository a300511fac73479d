"""Query planning: SPARQL-subset -> DataFrame compiler, and the transitive
closure builder that implements property-path ``*`` reasoning."""

from mortar_parquet_support_spark.plans.closure import transitive_closure  # noqa: F401
from mortar_parquet_support_spark.plans.sparql import SparqlEngine, parse_sparql  # noqa: F401
