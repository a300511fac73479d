"""Analytics operators: timeseries (rollup / asof / sessionize / resample),
deduplication, similarity search, text analysis, multimodal columns."""
