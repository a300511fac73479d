"""similarity_join at corpus scale (VERDICT r9 ask #7; r10 ask #2): run
the exact prefix-filtered all-pairs join over the sf1 documents table —
AUGMENTED with planted near-duplicates so the verify stage is measured
on positive signal — and prove the fan-out bound EMPIRICALLY:
candidate-pair count vs the n*(n-1)/2 all-pairs space the prefix filter
exists to avoid, plus wall time, surviving (verified) pair count,
filter precision, and recall over the planted ground truth.

Planting (deterministic, in-memory, the source corpus is never
modified): every doc with doc_id % 100 == 7 and >= 40 words gets ONE
mutated copy (5th word replaced by a marker token, id offset +10^9).
Replacing one middle word of a w-word doc perturbs at most 3 of its
w-2 distinct 3-gram shingles, so the (source, copy) Jaccard is
>= (s-3)/(s+3) >= 0.85 for s >= 38 — above the t=0.8 threshold by
construction. Ground truth is nevertheless MEASURED, not assumed: the
operator's own exact ``jaccard_pairs`` scores every planted pair
directly, and ``planted_recall`` is found/true over that set — the
exactness (losslessness) contract says it must be 1.0 at corpus scale,
which this artifact now demonstrates on real positives (the r10
artifact measured a corpus with zero true pairs: the fan-out bound was
proven but filter precision was 0/0 — VERDICT r10 "What's missing" #4).

Writes BENCH_SIMJOIN.json at the repo root:

  {"sf_dir": .., "n_docs": .., "threshold": ..,
   "planted_copies": .., "planted_true_pairs": .., "planted_recall": ..,
   "all_pairs": .., "candidate_pairs": .., "candidate_fraction": ..,
   "verified_pairs": .., "precision_of_filter": ..,
   "join_wall_sec": .., "candidates_wall_sec": .., ...sentinels}

``candidate_fraction`` is the headline: the share of the quadratic
space the equi-join on prefix tokens actually materializes. The
property tests prove the filter LOSSLESS (no misses); this artifact
proves it SELECTIVE at corpus scale and EXACT on planted positives —
together they are the operator's scale story.

Usage: python tools/bench_simjoin.py [sf_dir] [threshold] [--no-plant]
(defaults: testdata_sf/sf1, 0.8, planting on)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PLANT_OFFSET = 1_000_000_000
MARKER = "xqzplantedxqz"


def plant_near_dups(docs, id_col: str, text_col: str):
    """Union the corpus with one mutated copy per planted source doc:
    5th word replaced by MARKER, id offset by PLANT_OFFSET. Pure
    column expressions — no driver loop, scales like the corpus."""
    from pyspark.sql import functions as F

    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    eligible = docs.filter(
        (F.col(id_col) % 100 == 7) & (F.size(words) >= 40)
    )
    mutated = F.concat_ws(
        " ",
        F.concat(
            F.slice(words, 1, 4),
            F.array(F.lit(MARKER)),
            F.slice(words, F.lit(6), F.size(words) - F.lit(5)),
        ),
    )
    def _meta(c: str):
        # r12 (ADVICE r11): copies must NOT inherit source/size metadata
        # verbatim — that double-counts planted sources in any per-source
        # breakdown. Re-id the provenance column and recompute sizes.
        if c == "source":
            return F.concat(F.lit("planted::"), F.col(c)).alias(c)
        if c == "n_chars":
            return F.length(mutated).cast("long").alias(c)
        return F.col(c)

    copies = eligible.select(
        (F.col(id_col) + PLANT_OFFSET).alias(id_col),
        mutated.alias(text_col),
        *[_meta(c) for c in docs.columns if c not in (id_col, text_col)],
    )
    return docs.select(*copies.columns).unionByName(copies), copies


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--no-plant"]
    plant = "--no-plant" not in sys.argv
    sf_dir = args[0] if args else os.path.join(ROOT, "testdata_sf/sf1")
    threshold = float(args[1]) if len(args) > 1 else 0.8

    from bench import gate_whole_run
    from mortar_parquet_support_spark.session import get_spark

    spark = get_spark("mortar-bench-simjoin")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    # whole-run sentinel gate (VERDICT r14 #7)
    out = gate_whole_run(jit_after_max_sec=None, run_fn=lambda attempt: _measure(spark, cpus, sf_dir, threshold, plant, attempt)
    )
    path = os.path.join(ROOT, "BENCH_SIMJOIN.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


def _measure(
    spark, cpus: int, sf_dir: str, threshold: float, plant: bool, attempt: int
) -> dict:
    from pyspark.sql import functions as F

    from bench import _cpu_jiffies, _jit_probe, warmup
    from mortar_parquet_support_spark.operators.dedup import (
        jaccard_pairs,
        similarity_join,
        similarity_join_candidates,
    )

    warmup(spark, cpus)
    jit_before = _jit_probe(spark, 11_000 + 100_000 * attempt)
    jif0, steal0 = _cpu_jiffies()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    planted_copies = 0
    planted_true = 0
    planted_recall = None
    if plant:
        corpus, copies = plant_near_dups(docs, "doc_id", "text")
        corpus = corpus.persist()
        planted_copies = copies.count()
        # ground truth: the operator's own exact verify over exactly the
        # (source, copy) pairs — id_a < id_b matches the join's contract
        truth_pairs = copies.select(
            (F.col("doc_id") - PLANT_OFFSET).alias("id_a"),
            F.col("doc_id").alias("id_b"),
        )
        truth = jaccard_pairs(
            corpus, truth_pairs, id_col="doc_id", text_col="text"
        ).filter(F.col("jaccard") >= threshold)
        truth_set = {(r.id_a, r.id_b) for r in truth.collect()}
        planted_true = len(truth_set)
    else:
        corpus = docs

    n_docs = corpus.count()
    all_pairs = n_docs * (n_docs - 1) // 2

    t0 = time.perf_counter()
    cand = similarity_join_candidates(
        corpus, id_col="doc_id", text_col="text", threshold=threshold
    )
    n_cand = cand.count()
    cand_sec = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    verified = similarity_join(
        corpus, id_col="doc_id", text_col="text", threshold=threshold
    )
    found = [(r.id_a, r.id_b) for r in verified.select("id_a", "id_b").collect()]
    n_verified = len(found)
    join_sec = round(time.perf_counter() - t0, 3)

    if plant and planted_true:
        planted_recall = round(
            len(truth_set & set(found)) / planted_true, 6
        )

    # drop this attempt's cached corpus before a potential gate retry:
    # attempt 2 must not contend with attempt 1's persisted blocks for
    # storage memory (review r15 — pre-gate the body ran once, so the
    # missing unpersist was harmless)
    if plant:
        corpus.unpersist()
    jit_after = _jit_probe(spark, 11_500 + 100_000 * attempt)
    jif1, steal1 = _cpu_jiffies()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (jif1 - jif0), 2)
        if jif1 > jif0
        else None
    )

    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "threshold": threshold,
        "planted_copies": planted_copies,
        "planted_true_pairs": planted_true,
        "planted_recall": planted_recall,
        "all_pairs": all_pairs,
        "candidate_pairs": n_cand,
        "candidate_fraction": round(n_cand / all_pairs, 10)
        if all_pairs
        else None,
        "verified_pairs": n_verified,
        "precision_of_filter": round(n_verified / n_cand, 6)
        if n_cand
        else None,
        "candidates_wall_sec": cand_sec,
        "join_wall_sec": join_sec,
        "jit_sentinel_before_sec": jit_before,
        "jit_sentinel_after_sec": jit_after,
        "steal_pct": steal_pct,
    }
    return out


if __name__ == "__main__":
    raise SystemExit(main())
