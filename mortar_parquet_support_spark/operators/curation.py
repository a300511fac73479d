"""Corpus-curation operators for training-data pipelines: benchmark
decontamination and per-domain quota capping.

These are the two filters every large-scale pretraining pipeline applies
after dedup (the reference has no analog — it is a timeseries client; these
extend the engine's LLM-data north star alongside operators/dedup.py):

- **decontamination**: drop (or flag) corpus documents that share any
  word n-gram with an evaluation/benchmark set, so training data can't
  leak test answers.
- **domain capping**: keep at most N documents per source/domain, picking
  the best by a caller-supplied ordering — bounds any single domain's
  share of the corpus.

Scale shapes (the 100 TB plan):

``contaminated_ids`` / ``decontaminate``: the eval set is small by
construction (benchmarks are thousands of documents, not billions), so its
distinct shingle set is broadcast. The corpus side is ONE scan: gram rows
via the codegen explode-offsets spelling (dedup._shingle_token_rows, r17 —
the earlier interpreted shingle ``transform`` was ~0.5 ms/doc, 4s per
corpus pass at sf0.1), broadcast LEFT SEMI join, distinct ids — no shuffle
of corpus data at all except the final distinct on the (tiny)
contaminated-id set. The explode factor is bounded by tokens/doc and the
whole leg stays a shuffle-free scan projection.

``domain_cap``: one hash-partition shuffle on the domain column + a
row_number window inside each partition — the minimal plan for a per-group
top-N. Skewed domains (a crawl dominated by one site) are exactly the
AQE-skew-split case; the window itself only needs the group's rows sorted,
which Spark does per-partition after the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



# Deliberately simple patterns that mean the same thing in Java regex
# (Spark) and RE2 (DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]?\d{0,4}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column) -> list[Column]:
    """One ``n_<kind>`` count column per PII pattern — a zero-shuffle
    projection for audit/reporting passes."""
    return [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]


def mask_pii(text: Column) -> Column:
    """Replace every PII match with a ``<KIND>`` token. Order matters:
    emails first so the ip pattern can't eat a dotted host fragment."""
    out = text
    # iterate the dict itself (insertion order IS email->phone->ip): a
    # pattern added to PII_PATTERNS must be masked here automatically, not
    # just counted by pii_counts — a hardcoded tuple would leak it
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def contaminated_ids(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    ngram_words: int = 3,
) -> DataFrame:
    """Ids of corpus documents sharing >= 1 word ``ngram_words``-gram with
    the eval set. Returns a 1-column DataFrame named ``id_col``.

    The standard decontamination test (n-gram collision against the
    benchmark); n is caller-tunable — 13 is the common choice for real
    pipelines, small corpora test with smaller n.
    """
    from mortar_parquet_support_spark.operators.dedup import _shingle_token_rows

    eval_text = eval_text_col or text_col
    # gram rows via the codegen explode-offsets spelling (r17;
    # dedup._shingle_token_rows — the word_shingles transform is
    # interpreted per element, 4.0s/corpus pass at sf0.1, and this
    # operator's result is dedup-invariant so even the per-doc distinct
    # is skipped). Value identity: same gram strings; the NULL-text
    # NULL-token row never equi-joins; the eval side's global distinct
    # subsumes word_shingles' per-doc distinct.
    # drop the empty gram: the whole-document fallback shingles
    # NULL/empty/whitespace-only text to '' — one blank row in a real
    # benchmark dump would otherwise mark every blank corpus document as
    # "contaminated" despite sharing zero actual n-grams
    eval_grams = (
        _shingle_token_rows(
            eval_df.select(
                F.lit(1).alias("id"), F.col(eval_text).alias("_text")
            ),
            ngram_words,
            distinct=False,
        )
        .select(F.col("tok").alias("_g"))
        .filter(F.col("_g") != "")
        .distinct()
    )
    return (
        _shingle_token_rows(
            corpus.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("_text")
            ),
            ngram_words,
            distinct=False,
        )
        .select(F.col("id").alias(id_col), F.col("tok").alias("_g"))
        .join(F.broadcast(eval_grams), "_g", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    ngram_words: int = 3,
) -> DataFrame:
    """Corpus minus contaminated documents (broadcast LEFT ANTI on the
    contaminated-id set, which is small relative to the corpus)."""
    bad = contaminated_ids(
        corpus,
        eval_df,
        id_col=id_col,
        text_col=text_col,
        eval_text_col=eval_text_col,
        ngram_words=ngram_words,
    )
    return corpus.join(F.broadcast(bad), id_col, "left_anti")


def contamination_score(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    ngram_words: int = 3,
) -> DataFrame:
    """Scored decontamination — the graded sibling of
    :func:`contaminated_ids`: per corpus document, how MUCH of it overlaps
    the eval set, as the fraction of its distinct word n-grams found
    there. Real pipelines threshold this (e.g. drop > 0.8 "benchmark
    paraphrases", keep <= 0.05 incidental collisions) where the binary
    any-collision test is too blunt for short n.

    Returns one row per corpus document: (``id_col``, ``n_grams``,
    ``n_contaminated``, ``contamination``), with ``contamination`` NULL
    when the document has no shingles (NULL/empty/whitespace-only text —
    overlap is undefined, not zero). CONTRACT: ``id_col`` must be unique
    (documents are the scoring unit) — duplicated ids have their copies'
    gram sets UNIONED into one row (r17; the pre-r17 spelling summed the
    copies' per-copy counts instead, an equally undefined answer to an
    ill-posed input).

    Scale shape: identical to :func:`contaminated_ids` on the eval side
    (distinct benchmark shingles broadcast); the corpus side is one scan
    + explode + broadcast LEFT join, then a per-document count aggregate
    — the only shuffle carries (id, hit-bit) pairs bounded by
    tokens/doc, and the final LEFT join back onto the id set restores
    shingle-less documents."""
    from mortar_parquet_support_spark.operators.dedup import _shingle_token_rows

    eval_text = eval_text_col or text_col
    # codegen gram rows (r17 — see contaminated_ids). The corpus side
    # KEEPS per-document distinctness (default): n_grams counts each
    # document's DISTINCT shingles, exactly size(word_shingles) did; the
    # NULL-token row of a NULL-text document reproduces explode_outer's
    # one NULL row (count 0 -> NULL contamination).
    eval_grams = (
        _shingle_token_rows(
            eval_df.select(
                F.lit(1).alias("id"), F.col(eval_text).alias("_text")
            ),
            ngram_words,
            distinct=False,
        )
        .select(F.col("tok").alias("_g"))
        .filter(F.col("_g") != "")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    grams = _shingle_token_rows(
        corpus.select(F.col(id_col).alias("id"), F.col(text_col).alias("_text")),
        ngram_words,
    ).select(
        F.col("id").alias(id_col),
        # the whole-document fallback shingles blank text to '' — that
        # is "no shingles", not a matchable gram (same rule as the eval
        # side above)
        F.when(F.col("tok") != "", F.col("tok")).alias("_g"),
    )
    counted = (
        grams.join(F.broadcast(eval_grams), "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count("_g").alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
        )
    )
    return counted.withColumn(
        "contamination",
        F.when(
            F.col("n_grams") > 0,
            F.col("n_contaminated") / F.col("n_grams"),
        ),
    )


def chunk_text(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    chunk_chars: int = 1000,
    overlap: int = 100,
) -> DataFrame:
    """Split documents into overlapping character windows for embedding /
    context-window pipelines: (id_col, chunk_id, chunk) with chunk_id
    0-based per document. Empty/short docs yield exactly one chunk.

    One projection + posexplode — the explode factor is doc_len/stride, so
    the plan is a single corpus scan with no shuffle; downstream embedding
    UDFs see bounded-size strings.
    """
    if not 0 <= overlap < chunk_chars:
        # a NEGATIVE overlap (sign typo, 'gap' confusion) would stride past
        # characters — silently absent from every chunk
        raise ValueError("overlap must be in [0, chunk_chars)")
    step = chunk_chars - overlap
    text = F.col(text_col)
    n_chunks = F.greatest(
        F.ceil((F.length(text) - F.lit(overlap)).cast("double") / step).cast("int"),
        F.lit(1),
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        idx, lambda i: text.substr(i * step + 1, F.lit(chunk_chars))
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "chunk"),
    )


def domain_cap(
    df: DataFrame,
    *,
    domain_col: str,
    max_per_domain: int,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per domain, best-first by
    ``order_by`` (callers should end the ordering with a unique id so the
    kept set is deterministic). Output schema = input schema.

    The default ordering hashes row content (NOT
    ``monotonically_increasing_id``, which changes under task retry and
    would silently keep a different subset after a fetch failure)."""
    from mortar_parquet_support_spark.operators.timeseries import topk_per_group

    ordering = order_by if order_by else [F.xxhash64(*[F.col(c) for c in df.columns])]
    return topk_per_group(
        df, keys=[domain_col], order_by=ordering, k=max_per_domain
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    cost_col: str,
    budget: int,
    shards: int = 64,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign rows to fixed-budget packing bins: within each shard, rows
    are laid out in ``id_col`` order and a row joins the bin its running
    start offset falls into — the deterministic contiguous-packing scheme
    used to fill fixed-size training batches/context windows. Output adds
    ``shard`` and ``bin`` (0-based per shard; (shard, bin) is the global
    bin key).

    Scale shape: a GLOBAL running sum would force one partition — instead
    rows shard by ``pmod(id, shards)`` (or a caller column: date, source),
    and the cumulative window runs per shard. Bins are equally full in
    expectation; cross-shard bin ids never collide because the shard is
    part of the key.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    # shard_col='shard' is an identity rewrite and safe; any other caller
    # column named 'shard' or 'bin' WOULD be overwritten — including
    # shard_col='bin' itself (it is read as the shard key, then replaced
    # by packing metadata), so 'bin' is never exempt.
    exempt = {"shard"} if shard_col == "shard" else set()
    clobbered = ({"shard", "bin"} - exempt) & set(df.columns)
    if clobbered:
        # withColumn would silently REPLACE the caller's data with packing
        # metadata; fail loudly instead (sibling operators either probe for
        # unused names or use __-prefixed internals)
        raise ValueError(
            f"pack_sequences writes columns 'shard' and 'bin'; input already "
            f"has {sorted(clobbered)} — rename them first"
        )
    from pyspark.sql.types import NumericType

    if shard_col:
        shard = F.col(shard_col)
    elif isinstance(df.schema[id_col].dataType, NumericType):
        shard = F.pmod(F.col(id_col).cast("long"), F.lit(shards))
    else:
        # string/uuid ids: cast('long') would yield NULL for every row and
        # silently collapse the whole corpus into ONE window partition —
        # the global cumsum this function exists to avoid. Hash instead.
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_shard = df.withColumn("shard", shard)
    # a NULL cost would propagate bin=NULL for its row (the window SUM
    # skips nulls but running - NULL is NULL) and silently segregate it
    # from every bin-keyed consumer — fail the job loudly instead
    cost = F.when(
        F.col(cost_col).isNotNull(), F.col(cost_col)
    ).otherwise(
        F.raise_error(
            F.lit(f"pack_sequences: NULL {cost_col} cannot be packed")
        )
    )
    running = F.sum(cost).over(w)
    start = running - cost
    return with_shard.withColumn(
        "bin", F.floor(start / F.lit(budget)).cast("long")
    )


def length_bucket_batches(
    df: DataFrame,
    *,
    id_col: str,
    cost_col: str,
    bucket_width: int,
    batch_size: int,
    shards: int = 64,
) -> DataFrame:
    """Length-bucketed fixed-COUNT batching — the padding-minimizing
    sibling of :func:`pack_sequences`: rows bucket by
    ``floor(cost / bucket_width)`` so each batch holds ``batch_size``
    sequences of SIMILAR length (padding waste per batch is bounded by
    ``bucket_width - 1`` tokens per row), the standard dynamic-batching
    layout for variable-length training/inference. Where pack_sequences
    fills a fixed token BUDGET with a variable row count, this fills a
    fixed ROW count with near-uniform lengths. Output adds ``shard``,
    ``bucket``, and ``batch`` (0-based per (shard, bucket); the global
    batch key is the triple).

    Same scale discipline as pack_sequences: a corpus-wide row_number
    per bucket would funnel hot buckets through single window
    partitions, so rows shard first (pmod of a numeric id, xxhash64
    otherwise) and batches number per (shard, bucket) — deterministic
    in ``id_col`` order within each. NULL costs fail loudly via the
    same in-plan raise (an unmeasured sequence cannot be bucketed);
    the trailing batch of each (shard, bucket) may be short — training
    loaders drop or pad it, their call."""
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    clobbered = {"shard", "bucket", "batch"} & set(df.columns)
    if clobbered:
        raise ValueError(
            f"length_bucket_batches writes columns 'shard', 'bucket', "
            f"'batch'; input already has {sorted(clobbered)} — rename "
            f"them first"
        )
    from pyspark.sql.types import NumericType

    if isinstance(df.schema[id_col].dataType, NumericType):
        shard = F.pmod(F.col(id_col).cast("long"), F.lit(shards))
    else:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    cost = F.when(
        F.col(cost_col).isNotNull(), F.col(cost_col)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"length_bucket_batches: NULL {cost_col} cannot be bucketed"
            )
        )
    )
    staged = df.withColumn("shard", shard).withColumn(
        "bucket", F.floor(cost / F.lit(bucket_width)).cast("long")
    )
    w = Window.partitionBy("shard", "bucket").orderBy(id_col)
    return staged.withColumn(
        "batch",
        F.floor((F.row_number().over(w) - 1) / F.lit(batch_size)).cast(
            "long"
        ),
    )


def strip_boilerplate_lines(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    min_docs: int = 10,
    sep: str = "\n",
) -> DataFrame:
    """Remove lines that occur in at least ``min_docs`` distinct documents
    (case/whitespace-normalized match) from every document — the classic
    crawl-cleaning step for navigation bars, cookie banners, and license
    footers that repeat across a site. Returns (id_col, text_col) with
    lines rejoined in their original order; fully-boilerplate documents
    come back as empty strings rather than vanishing.

    Scale shape: the split+posexplode subtree feeds BOTH the
    line-frequency aggregate (one shuffle on the normalized line; skewed
    hot lines are exactly what AQE splits) and the LEFT ANTI against the
    broadcast boilerplate set, i.e. the corpus is deliberately scanned
    TWICE rather than caching a posexploded copy of the whole corpus
    (which at crawl scale costs far more storage than a rescan costs IO;
    pass an already-persisted ``df`` to share the scan if it fits
    memory). The boilerplate set itself is small by construction (only
    lines crossing the threshold); one final groupBy(id) reassembles.
    Two shuffles total, both on bounded keys.
    """
    key = lambda c: F.lower(F.trim(c))  # noqa: E731
    # F.split takes a Java REGEX; \Q..\E quotes the separator so literal
    # metacharacters ('|', '.') split the same way array_join rejoins. A
    # separator CONTAINING the two-char sequence \E would terminate the
    # quote early (mis-split or PatternSyntaxException), so embedded \E is
    # escaped the way java.util.regex.Pattern.quote does: close the quote,
    # emit \\E, reopen.
    sep_quoted = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_quoted)).alias(
            "__pos", "__line"
        ),
    )
    boiler = (
        lines.groupBy(key(F.col("__line")).alias("__key"))
        .agg(F.count_distinct(id_col).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        # blank/whitespace-only lines are paragraph structure, not
        # boilerplate — without this exemption any corpus where >=min_docs
        # documents contain an empty line loses every paragraph boundary
        .filter(F.length("__key") > 0)
        .select("__key")
    )
    kept = lines.join(
        F.broadcast(boiler),
        key(F.col("__line")) == F.col("__key"),
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias(text_col)
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )


def rank_normalize(
    df: DataFrame,
    score_col: str,
    *,
    by: str | None = None,
    out_col: str = "score_pct",
    round_to: int | None = None,
) -> DataFrame:
    """Percentile-rank calibration of a quality score, optionally per
    group: ``percent_rank() = (rank - 1) / (n - 1)`` within each ``by``
    partition, ordered by the raw score. The standard fix for
    heterogeneous quality scorers — a 0.8 from one domain's classifier
    and a 0.8 from another's rarely mean the same thing, but "top 5% of
    its domain" does, so thresholds transfer across domains.

    Ties share a percent_rank (SQL-standard RANK semantics) — no
    arbitrary ordering leaks into the output, and a single-row group
    (or an all-tied one) gets 0.0. NULL scores sort FIRST (lowest
    percentile), keeping "no score" below every scored row. One shuffle
    (the per-group window). With ``by=None`` the window is GLOBAL —
    a single-partition sort, fine for a collected candidate set but not
    a corpus-scale pass; calibrate per domain at scale. ``round_to``
    rounds the emitted percentile
    (the value is (rank-1)/(n-1), an exact small-integer division —
    identical across engines even unrounded)."""
    w = Window.partitionBy(*( [by] if by else [] )).orderBy(
        F.col(score_col).asc_nulls_first()
    )
    pct = F.percent_rank().over(w)
    if round_to is not None:
        pct = F.round(pct, round_to)
    return df.withColumn(out_col, pct)


def budget_select(
    df: DataFrame,
    *,
    score_col: str,
    cost_col: str,
    budget: int,
    by: str | None = None,
    id_col: str = "doc_id",
    cum_col: str = "cum_cost",
) -> DataFrame:
    """Budgeted best-first selection: within each ``by`` group, take rows
    in descending ``score_col`` order (ties broken by ``id_col``) while
    the RUNNING ``cost_col`` total stays within ``budget`` — the
    token-budget curation step ("the best N-billion tokens per domain",
    Llama/phi-style data recipes) as one declarative pass, no driver
    loop over domains.

    A row is kept iff the running PEAK of the inclusive cost total is
    <= budget — a strict prefix cut: the first over-budget row and
    everything after it drop (even if later negative "credit" costs dip
    the running sum back under budget), and a single row larger than the
    whole budget drops too — budgets are hard. NULL
    scores sort LAST, so unscored rows only enter on leftover budget.
    Rows with NULL cost are excluded before ranking: the window sum
    would otherwise skip them, admitting unpriceable rows for free.
    One shuffle (the per-group window; ``by=None`` degrades to a
    single-partition global sort — per-domain budgets are the
    corpus-scale shape); emits the input columns plus ``cum_col`` for
    auditability."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    priced = df.filter(F.col(cost_col).isNotNull())
    w = (
        Window.partitionBy(*( [by] if by else [] ))
        .orderBy(F.col(score_col).desc_nulls_last(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(cost_col)).over(w)
    # the cut is on the running PEAK of the cumulative cost, not the
    # cumulative cost itself: a negative cost (credit/adjustment column)
    # could dip the running sum back under budget and re-admit rows after
    # the first over-budget one, breaking the documented prefix contract.
    # Same window spec -> both window functions run in ONE WindowExec
    # (the peak references the cum ALIAS, not a nested window call).
    return (
        priced.withColumn(cum_col, cum)
        .withColumn("__peak", F.max(F.col(cum_col)).over(w))
        .filter(F.col("__peak") <= budget)
        .drop("__peak")
    )


#: query parameters every crawl pipeline strips before URL-keyed dedup:
#: pure tracking state that multiplies otherwise-identical fetch targets.
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "ref_src")


def canonicalize_url(
    url,
    *,
    strip_www: bool = True,
    strip_fragment: bool = True,
    tracking_prefixes: "tuple[str, ...]" = TRACKING_PARAM_PREFIXES,
    tracking_params: "tuple[str, ...]" = TRACKING_PARAMS,
) -> Column:
    """Canonical form of an absolute http(s) URL, JVM-side (pure
    projection — composes with any scan, zero shuffle): lowercase scheme
    and host, optional ``www.`` strip, default-port strip (``:80`` for
    http, ``:443`` for https), fragment strip, tracking-parameter removal
    (exact names + prefixes, case-insensitive), remaining query params
    sorted bytewise, trailing path ``/`` stripped (bare host keeps
    ``/``). Non-absolute inputs (no ``://``) and NULLs canonicalize to
    NULL — the caller decides whether that is a reject or a passthrough.

    This is the key-normalization half of crawl dedup: two fetches of the
    same resource that differ only in case, tracking noise, param order,
    or a trailing slash collapse to one key (pair with
    operators/dedup.py exact dedup on the result). Everything is built
    from locate/substr/split-on-literal primitives so an engine-parity
    oracle can replay it step for step — no URI-library semantics hide in
    the middle.

    Implementation note: every intermediate (the trimmed input, the
    fragment-stripped form, scheme/host/path, the query) is LET-BOUND
    through a single-element-array transform before being referenced
    again. Column expressions inline their subtrees at every reference,
    and this function references each intermediate 3-6 times across ~6
    levels — inlined naively the tree grows multiplicatively (measured:
    a caller passing a complex url expression went from 120 s to
    sub-second on 5k rows once bound). A lambda variable is a
    materialized value, so each stage is computed once per row
    regardless of fan-out.
    """

    raw = F.col(url) if isinstance(url, str) else url

    def let(col, fn):
        # bind `col` once; `fn` receives the materialized lambda var
        return F.transform(F.array(col), fn).getItem(0)

    def before(c, sep):  # text before first sep (whole string if absent)
        i = F.instr(c, sep)
        return F.when(i > 0, c.substr(F.lit(1), i - 1)).otherwise(c)

    def after(c, sep):  # text after first sep (NULL if absent)
        i = F.instr(c, sep)
        return F.when(i > 0, c.substr(i + F.lit(len(sep)), F.length(c)))

    def is_tracking(kv):
        name = F.lower(before(kv, "="))
        t = F.lit(False)
        for p in tracking_params:
            t = t | (name == p.lower())
        for pre in tracking_prefixes:
            t = t | name.startswith(pre.lower())
        return t

    def with_parts(scheme, query, hostpath):
        slash = F.instr(hostpath, "/")
        hostport0 = F.lower(
            F.when(slash > 0, hostpath.substr(F.lit(1), slash - 1)).otherwise(
                hostpath
            )
        )
        path0 = F.when(
            slash > 0, hostpath.substr(slash, F.length(hostpath))
        ).otherwise(F.lit("/"))
        if strip_www:
            hostport0 = let(
                hostport0,
                lambda h: F.when(
                    h.startswith("www."), h.substr(F.lit(5), F.length(h))
                ).otherwise(h),
            )
        hostport0 = let(
            hostport0,
            lambda h: F.when(
                (scheme == "http") & h.endswith(":80"),
                h.substr(F.lit(1), F.length(h) - 3),
            )
            .when(
                (scheme == "https") & h.endswith(":443"),
                h.substr(F.lit(1), F.length(h) - 4),
            )
            .otherwise(h),
        )
        path0 = let(
            path0,
            lambda pa: F.when(
                (F.length(pa) > 1) & pa.endswith("/"),
                pa.substr(F.lit(1), F.length(pa) - 1),
            ).otherwise(pa),
        )
        qs = F.array_join(
            F.array_sort(
                F.filter(
                    F.split(F.coalesce(query, F.lit("")), "&"),
                    lambda kv: (kv != "") & ~is_tracking(kv),
                )
            ),
            "&",
        )

        def assemble(hostport, path):
            canon = F.concat(
                scheme,
                F.lit("://"),
                hostport,
                path,
                let(
                    qs,
                    lambda q: F.when(q != "", F.concat(F.lit("?"), q)).otherwise(
                        F.lit("")
                    ),
                ),
            )
            return F.when(hostpath.isNotNull() & (hostport != ""), canon)

        return let(
            hostport0, lambda hp: let(path0, lambda pa: assemble(hp, pa))
        )

    def with_no_frag(nf):
        # query comes from nf (everything after the first '?'); b is the
        # pre-'?' part the scheme/host/path parse runs on
        return let(
            before(nf, "?"),
            lambda b: let(
                F.coalesce(after(nf, "?"), F.lit("")),
                lambda query: let(
                    F.lower(before(b, "://")),
                    lambda scheme: let(
                        after(b, "://"),
                        lambda hostpath: with_parts(scheme, query, hostpath),
                    ),
                ),
            ),
        )

    return let(
        F.trim(raw),
        lambda u: let(
            before(u, "#") if strip_fragment else u,
            with_no_frag,
        ),
    )


def dedup_by_url(
    df: DataFrame,
    *,
    url_col: str,
    order_by: "Sequence[Column | str] | None" = None,
    canon_col: str = "canonical_url",
    **canon_kwargs,
) -> DataFrame:
    """Crawl dedup on the canonical URL key: keep ONE row per
    :func:`canonicalize_url` result (ties broken by ``order_by``, which
    callers should make deterministic — e.g. freshest fetch first).
    Rows whose URL does not canonicalize (NULL / relative) pass through
    untouched: they have no key to collide on. One hash-partition
    shuffle on the canonical key + a row_number window — the
    domain_cap plan shape, AQE handles skewed hosts."""
    keyed = df.withColumn(canon_col, canonicalize_url(url_col, **canon_kwargs))
    keyless = keyed.filter(F.col(canon_col).isNull())
    order = list(order_by) if order_by is not None else [F.col(url_col)]
    w = Window.partitionBy(canon_col).orderBy(*order)
    kept = (
        keyed.filter(F.col(canon_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return kept.unionByName(keyless)
