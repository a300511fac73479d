"""Analytics operators: timeseries (rollup / asof / sessionize / resample /
funnel / cohort), deduplication (exact / MinHash-LSH / SimHash / embedding /
incremental), similarity search (brute-force / IVF / LSH / PQ / SQ8 + PCA),
text analysis (quality / langid / LM scoring / BPE), retrieval (BM25 /
inverted index / RRF hybrid), entity resolution (fuzzy key join), curation
(decontaminate / budgets / calibration / packing), sampling (hash splits /
importance), clustering (spherical k-means), sketches (HLL / qhist / CMS),
profiling (data cards), and multimodal binary columns."""
