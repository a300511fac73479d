"""Lexical ranked retrieval over a documents table: BM25 scoring and an
inverted keyword index.

The sparse-retrieval counterpart to operators/similarity.py's dense kNN —
the other half of how a training-data pipeline finds "documents about X"
(decontamination sweeps, targeted subset mining, eval-set curation). The
reference engine has no text-search surface (SURVEY.md §2.6 declared-absent;
its corpus is timeseries+graph), so this is a north-star extension like the
dedup/ANN families.

Scale shape (100 TB corpus, small query):
- Per-document term frequencies for the (tiny, literal) query term set are
  pure array expressions over the tokenized text — zero shuffle, they ride
  the scan.
- Corpus statistics (N, avgdl, per-term document frequency) are ONE
  scalar aggregate — map-side partials, a single reduced row — broadcast
  back over the scoring scan. Two narrow passes over the corpus, no
  wide shuffle anywhere; the final top-k is a TakeOrdered, never a global
  sort.
- The inverted index is the amortized alternative: one explode+groupBy
  builds postings (shuffle ∝ corpus tokens, done ONCE at write time);
  a keyword query then broadcast-joins the query terms against the
  posting table and unions postings — never touching the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.text import _lower_words


def _tokenize(df: DataFrame, text_col: str) -> DataFrame:
    """Attach the casefolded whitespace token array + document length.
    NULL text is treated as empty (the curation-module convention —
    without the coalesce a NULL row would poison dl/avgdl and every tf).
    Empty/blank text has dl = 0 (split('') yields [''], which must not
    count as one token)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = _lower_words(t)
    dl = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(words))
    return df.withColumns({"__s_words": words, "__s_dl": dl.cast("double")})


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    score_col: str = "bm25",
) -> DataFrame:
    """Score every document against ``query_terms`` with Okapi BM25
    (Lucene's non-negative idf variant: ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

    Returns (id_col, score_col) with the score rounded to 6 places —
    deterministic across engines. Documents matching no query term score
    0.0 (kept: callers filter or top-k as needed).

    Terms are casefolded to match the tokenization. Duplicate query terms
    are collapsed (scoring a term twice would double its contribution).
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    toks = _tokenize(df, text_col)

    def _eq(term):
        # single-parameter lambda on purpose: a second parameter would be
        # interpreted by F.filter as the element INDEX, not a closure slot
        return lambda w: w == F.lit(term)

    tf_cols = {
        f"__s_tf{i}": F.size(F.filter(F.col("__s_words"), _eq(t))).cast("double")
        for i, t in enumerate(terms)
    }
    feat = toks.withColumns(tf_cols).select(id_col, "__s_dl", *tf_cols)

    # one scalar aggregate: corpus size, average doc length, per-term df.
    # Map-side partial aggregation reduces each partition to one row, so
    # the "shuffle" is n_partitions rows — broadcast back over the scan.
    stats = feat.agg(
        F.count(F.lit(1)).cast("double").alias("__s_n"),
        F.avg("__s_dl").alias("__s_avgdl"),
        *[
            F.sum((F.col(c) > 0).cast("long")).cast("double").alias(f"__s_df{i}")
            for i, c in enumerate(tf_cols)
        ],
    )
    scored = feat.crossJoin(F.broadcast(stats))

    # avgdl == 0 (all-blank corpus) would divide by zero — ANSI mode (the
    # Spark 4 default this engine runs under) raises instead of yielding
    # NULL, so guard it: every dl is 0 too, making the substituted 1.0
    # inert (norm = k1, tf = 0, score = 0.0 as documented).
    avgdl = F.col("__s_avgdl")
    safe_avgdl = F.when(avgdl > 0, avgdl).otherwise(F.lit(1.0))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__s_dl") / safe_avgdl
    )
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"__s_tf{i}")
        dfr = F.col(f"__s_df{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("__s_n") - dfr + 0.5) / (dfr + 0.5)
        )
        # tf == 0 contributes exactly 0 — short-circuited rather than
        # computed, because with b=1.0 (full length normalization) an
        # empty document has norm == 0 too and 0.0/0.0 raises
        # DIVIDE_BY_ZERO under ANSI mode; tf >= 1 makes the denominator
        # strictly positive.
        contribs.append(
            F.when(tf > 0, idf * tf * F.lit(k1 + 1.0) / (tf + norm)).otherwise(
                F.lit(0.0)
            )
        )
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return scored.select(
        id_col, F.round(total, 6).alias(score_col)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    *,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    score_col: str = "bm25",
) -> DataFrame:
    """Top-``k`` documents by BM25, deterministic ties (score desc, id asc).
    Ranking happens on the ROUNDED score so the cut line is reproducible
    across engines/float paths; orderBy+limit plans as TakeOrdered (per-
    partition heaps, no global sort)."""
    scores = bm25_scores(
        df, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b,
        score_col=score_col,
    )
    return scores.orderBy(F.col(score_col).desc(), F.col(id_col).asc()).limit(k)


def build_inverted_index(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Postings table (token, df, postings) — ``postings`` a sorted array of
    doc ids containing the token (distinct: a repeated token posts once).

    Default path: ONE wide shuffle. The explode produces (doc_id, token)
    pairs and ``collect_set`` dedups repeated tokens inside partial
    aggregation — no separate ``distinct`` pass (which would be a second
    full-width exchange of the same pairs). ``min_df`` prunes hapax tokens
    from the OUTPUT after their arrays are built — it shrinks the persisted
    index, not the build's reduce-side memory.

    ``max_df`` switches to a memory-bounded two-pass build. A stopword-
    frequency token posts in nearly every document, and an aggregation
    group can never be split (AQE skew handling applies to join partitions,
    not agg groups), so the single reduce task building that token's array
    is the scale ceiling. Pass 1 computes per-token document frequency
    with a count-distinct aggregate — its first exchange still carries
    the distinct (token, doc_id) pairs (that is what count_distinct
    shuffles), but each reduce task holds only row-at-a-time counters,
    never a materialized array; pass 2 joins the surviving vocabulary —
    ``min_df <= df <= max_df`` — back over the pairs and collects
    postings only for tokens whose array size is already known to be
    bounded. The win is reduce-side MEMORY (hot tokens are dropped BEFORE
    any array is built), not shuffle volume.

    Persist the result (parquet, ideally bucketed by token) and query via
    :func:`keyword_search` without ever rescanning the corpus."""
    if max_df is not None and max_df < min_df:
        raise ValueError(f"max_df ({max_df}) < min_df ({min_df})")
    toks = _tokenize(df, text_col)
    pairs = toks.select(
        F.col(id_col), F.explode("__s_words").alias("token")
    ).filter(F.col("token") != "")
    if max_df is not None:
        dfc = (
            pairs.groupBy("token")
            .agg(F.count_distinct(F.col(id_col)).alias("df"))
            .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
        )
        return (
            pairs.join(dfc, "token")
            .groupBy("token", "df")
            .agg(F.array_sort(F.collect_set(id_col)).alias("postings"))
            .select("token", "df", "postings")
        )
    grouped = pairs.groupBy("token").agg(
        F.array_sort(F.collect_set(id_col)).alias("postings")
    )
    grouped = grouped.select(
        "token", F.size("postings").cast("long").alias("df"), "postings"
    )
    if min_df > 1:
        grouped = grouped.filter(F.col("df") >= min_df)
    return grouped


def keyword_search(
    index: DataFrame,
    query_terms: list[str],
    *,
    mode: str = "any",
    missing_terms: str = "empty",
) -> DataFrame:
    """Resolve a keyword query against a postings table from
    :func:`build_inverted_index`. Returns (doc_id, n_matched) — documents
    containing ANY query term with how many distinct terms matched
    (``mode='all'`` keeps only docs matching EVERY term — boolean AND).

    The corpus is never touched: an isin filter over the (comparatively
    tiny) postings table, one explode of the matched postings, one
    count aggregate keyed on doc id. On a token-bucketed index the filter
    prunes to the query's buckets.

    Pruned-index footgun: a query term with no postings row silently
    contributes nothing — in AND mode the result goes empty, in OR mode
    the term's documents are missing. Correct when the term never occurs
    in the corpus, a SILENT false negative when the index was built with
    ``min_df``/``max_df`` pruning (the two cases are indistinguishable
    from the index alone). ``missing_terms='empty'`` (default) keeps the
    plain semantics; ``'error'`` eagerly checks the postings table (one
    small job) and raises naming the absent terms — the safe mode for
    decontamination sweeps over pruned indexes, in either query mode."""
    if mode not in ("any", "all"):
        raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
    if missing_terms not in ("empty", "error"):
        raise ValueError(
            f"missing_terms must be 'empty' or 'error', got {missing_terms!r}"
        )
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("keyword_search needs at least one query term")
    if missing_terms == "error":
        present = {
            r["token"]
            for r in index.filter(F.col("token").isin(terms))
            .select("token")
            .distinct()
            .collect()
        }
        absent = sorted(set(terms) - present)
        if absent:
            raise ValueError(
                "query terms absent from index (never in corpus, or pruned "
                f"by min_df/max_df): {absent}"
            )
    hits = (
        index.filter(F.col("token").isin(terms))
        .select(F.explode("postings").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    if mode == "all":
        hits = hits.filter(F.col("n_matched") == len(terms))
    return hits


def rrf_fuse(
    rankings: "list[DataFrame]",
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    weights: "list[float] | None" = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke 2009): combine N ranked
    lists — classically a lexical BM25 leg and a dense-cosine leg — into
    one hybrid ranking by ``score(d) = sum_i w_i / (k + rank_i(d))``,
    summing only over the lists where ``d`` appears. Rank-based fusion
    needs no score calibration between legs, which is exactly why it is
    the default hybrid-retrieval combiner.

    Each input frame carries (``id_col``, ``rank_col``) with 1-based
    ranks (ties already broken upstream — bm25_topk / knn_* emit
    deterministic ranks). Returns (id, rrf_score, n_sources), unordered;
    callers top-k with orderBy(desc(score), id).limit(n), which plans as
    TakeOrdered.

    Scale shape: the legs are top-k lists (k rows each), so this is
    arithmetic on N*k rows — one union + one grouped sum, a single
    shuffle of at most N*k rows regardless of corpus size. Engine
    parity: each addend is one double divide of exact inputs; for the
    two-leg case the grouped sum is a single commutative add, so fused
    scores are bit-identical across engines before any rounding.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError(
            f"weights length {len(weights)} != rankings length {len(rankings)}"
        )
    legs = []
    for i, r in enumerate(rankings):
        w = 1.0 if weights is None else float(weights[i])
        legs.append(
            # NULL ranks mean "absent from this leg" (e.g. a left join
            # against a missing leg) — dropping them keeps n_sources an
            # honest count of REAL contributions instead of inflating it
            # while F.sum silently skips the NULL addend. An id repeated
            # WITHIN a leg collapses to its best (min) rank first — a leg
            # is a ranking, and a repeat must not double-count in either
            # rrf_score or n_sources (the groupBy is over a top-k-sized
            # frame, so the extra partial agg is noise).
            r.filter(F.col(rank_col).isNotNull())
            .groupBy(id_col)
            .agg(F.min(F.col(rank_col).cast("double")).alias("__rank"))
            .select(
                F.col(id_col),
                (F.lit(w) / (F.lit(float(k)) + F.col("__rank"))).alias(
                    "__contrib"
                ),
            )
        )
    allc = legs[0]
    for leg in legs[1:]:
        allc = allc.unionByName(leg)
    return allc.groupBy(id_col).agg(
        F.sum("__contrib").alias("rrf_score"),
        F.count(F.lit(1)).alias("n_sources"),
    )


def build_positional_index(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional postings: one row per token OCCURRENCE — (``token``,
    ``id_col``, ``pos``) over the shared casefolded whitespace
    tokenization (the same tokenizer bm25/keyword search use, so the
    retrieval family agrees on what a token is). The phrase-capable
    sibling of :func:`build_inverted_index`: positions cost one long per
    occurrence but buy exact phrase/adjacency queries without rescanning
    text. Blank/NULL documents contribute nothing.

    Scale shape: posexplode is in-row; persist the result partitioned (or
    bucketed) by token so phrase probes prune to the query's tokens."""
    toks = _tokenize(df, text_col)
    return toks.select(
        F.col(id_col), F.posexplode("__s_words").alias("pos", "token")
    ).filter(F.col("token") != "").select("token", id_col, "pos")


def phrase_search(
    index: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase matching over a :func:`build_positional_index`:
    documents containing the (casefolded, whitespace-tokenized) phrase
    as a CONSECUTIVE token run, with the occurrence count (overlapping
    occurrences each count — every anchor position is one match).

    Plan: one pruned index scan per phrase token (``token = t_i``),
    each occurrence re-keyed to its ANCHOR ``pos - i``; a
    (doc, anchor) appears once per matched token, so anchors where the
    distinct-token count reaches the phrase length are full matches —
    a single groupBy over token-pruned postings, never a text rescan
    and never a self-join chain. Duplicate tokens in the phrase are
    handled by counting DISTINCT token offsets per anchor (the same
    occurrence can anchor two offsets of 'a a' without double-counting
    either).

    Returns (``id_col``, ``n_occurrences``), matches only."""
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase_search needs at least one token")
    legs = []
    for i, t in enumerate(terms):
        legs.append(
            index.filter(F.col("token") == t).select(
                F.col(id_col),
                (F.col("pos") - i).alias("__anchor"),
                F.lit(i).alias("__offset"),
            )
        )
    allc = legs[0]
    for leg in legs[1:]:
        allc = allc.unionByName(leg)
    anchors = (
        allc.filter(F.col("__anchor") >= 0)
        .groupBy(id_col, "__anchor")
        .agg(F.count_distinct("__offset").alias("__hit"))
        .filter(F.col("__hit") == len(terms))
    )
    return anchors.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )


def mmr_rerank(
    candidates: DataFrame,
    *,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    vec_col: str = "embedding",
    score_col: str = "cosine",
    k: int = 10,
    lam: float = 0.5,
    round_to: int = 9,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking per query — the
    diversity-aware top-k every RAG retriever and eval-set builder
    reaches for once plain cosine top-k returns five paraphrases of one
    document: greedily pick argmax of ``lam * relevance - (1 - lam) *
    max_cosine_to_already_picked`` until ``k`` are chosen (lam = 1 is
    pure relevance, lam = 0 pure diversity). Input is a CANDIDATE frame
    — (query, id, vector, relevance), e.g. :func:`~...similarity.
    cosine_topk` overfetch joined back to its vectors — and output is
    (query, id, relevance, ``mmr``, ``rank``), rank 1 first-picked.

    The greedy is inherently sequential IN k, so it runs per-query in
    an Arrow-batched ``applyInPandas`` — legitimate here because the
    per-group input is the OVERFETCHED CANDIDATE LIST (tens to
    hundreds of rows by construction), never the corpus: the quadratic
    pairwise-cosine work is bounded by overfetch^2 per query and
    queries parallelize across the cluster. Determinism: scores are
    rounded (``round_to``) before each argmax and ties break by id, so
    re-runs and repartitionings pick identical sets in identical order.
    NULL vectors never enter the picked set (they have no similarity
    to future candidates and would poison the penalty term) — filter
    upstream; rows with NULL relevance are dropped here."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")

    import pandas as pd

    # id/query types follow the INPUT schema (string doc ids are the
    # common RAG shape; hardcoding long would crash the UDF on them)
    q_type = candidates.schema[query_col].dataType.simpleString()
    i_type = candidates.schema[id_col].dataType.simpleString()
    out_schema = (
        f"`{query_col}` {q_type}, `{id_col}` {i_type}, "
        f"`{score_col}` double, mmr double, rank int"
    )

    def pick(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf[pdf[score_col].notna() & pdf[vec_col].notna()]
        if pdf.empty:
            return pd.DataFrame(
                columns=[query_col, id_col, score_col, "mmr", "rank"]
            )
        # id-sorted so every argmax tie resolves to the smallest id
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = np.nan  # zero vectors never win a similarity
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        picked: "list[int]" = []
        # -inf init, NOT zeros: a zero init would clamp NEGATIVE cosines
        # to 0 via the running maximum, denying anti-similar candidates
        # the diversity boost the formula gives them (review r10). The
        # first-pick branch bypasses it; after the first update every
        # entry is finite (undefined similarities map to 0 below).
        max_sim = np.full(n, -np.inf)
        taken = np.zeros(n, dtype=bool)
        rows = []
        for rank in range(1, min(k, n) + 1):
            if not picked:
                mmr = np.round(lam * rel, round_to)
            else:
                mmr = np.round(
                    lam * rel - (1.0 - lam) * max_sim, round_to
                )
            mmr_masked = np.where(taken, -np.inf, mmr)
            best = int(np.argmax(mmr_masked))  # first max = smallest id
            picked.append(best)
            taken[best] = True
            rows.append(
                (
                    pdf[query_col].iloc[best],
                    pdf[id_col].iloc[best],
                    float(rel[best]),
                    float(mmr_masked[best]),
                    rank,
                )
            )
            sims = vecs @ vecs[best] / (norms * norms[best])
            # undefined similarity (zero-norm vector) is NEUTRAL (0), not
            # -inf: -inf would turn into a +inf diversity bonus
            sims = np.nan_to_num(np.round(sims, round_to), nan=0.0)
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame(
            rows, columns=[query_col, id_col, score_col, "mmr", "rank"]
        )

    return candidates.groupBy(query_col).applyInPandas(pick, out_schema)
