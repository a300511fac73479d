"""Composed end-to-end recipes over the operator families — the shapes a
training-data team actually runs, wired stage-to-stage with the scale
discipline each operator individually promises."""

from mortar_parquet_support_spark.pipelines.curation import curate  # noqa: F401
