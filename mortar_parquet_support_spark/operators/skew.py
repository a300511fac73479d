"""Skew-handling join utilities for hot keys at scale.

AQE's skew-join splitting (on by default in session.py) covers sort-merge
joins at runtime; this module adds the explicit technique for the cases AQE
can't fix — e.g. a broadcast-ineligible dimension joined on a key where a
handful of values dominate (the classic 'null key' / 'default id' hot spot):

- ``salted_join``: replicate the small side R times and scatter the big
  side's hot keys across R salt buckets, so one hot key fans out over R
  tasks instead of one straggler.
- ``key_histogram``: cheap approximate frequency probe (sample + count) to
  decide WHETHER to salt and with what factor.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_histogram(df: DataFrame, key: str, *, top: int = 20, fraction: float = 0.01) -> list:
    """Approximate top-N key frequencies from a sample — a planning probe,
    not an exact count (one small job over ~fraction of the data). Sampled
    counts are SCALED by 1/fraction, so ``est_count`` is comparable to
    absolute hot-key thresholds ('salt when a key exceeds 1M rows'); the
    raw ``sample_count`` rides along."""
    return (
        df.sample(fraction=fraction, seed=42)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("sample_count"))
        .withColumn(
            "est_count", F.round(F.col("sample_count") / F.lit(fraction)).cast("long")
        )
        .orderBy(F.col("sample_count").desc())
        .limit(top)
        .collect()
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    *,
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Join with the small side replicated ``salt_buckets`` times and the
    big side salted deterministically, eliminating single-task stragglers on
    hot keys.

    Shuffle volume: big side unchanged (each row gets ONE salt), small side
    × salt_buckets (it must stay small-ish — that's the point of the
    technique). Works for inner and left joins on equi-keys.

    The salt hashes the ROW CONTENT (all big-side columns + seed), never a
    nondeterministic expression: if a map task is recomputed after a fetch
    failure every row lands in the same salt bucket again, so retries can't
    duplicate or drop join rows. Full-duplicate rows share a bucket — same
    join result, marginally less spread on duplicate-heavy data.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        # right/full would emit salt_buckets duplicates of every unmatched
        # small-side key (the small side is replicated) — refuse loudly
        # rather than silently multiply rows
        raise ValueError(f"salted_join supports how='inner'/'left', got {how!r}")
    salt_col = "__salt"
    while salt_col in big.columns or salt_col in small.columns:
        salt_col = "_" + salt_col  # never clobber a caller's column
    # xxhash64 rejects MapType (DATATYPE_MISMATCH.HASH_MAP_TYPE) — a big
    # frame with a properties map would fail at analysis time on a frame a
    # plain join handles. Hash only hashable columns; the join keys are
    # always among them (maps cannot be equi-join keys), so the degenerate
    # worst case is keys-only hashing: per-key-constant salt — correct,
    # just no spread for that pathological schema.
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _hashable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return _hashable(dt.elementType)
        return True

    hash_cols = [f.name for f in big.schema.fields if _hashable(f.dataType)]
    big_salted = big.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in hash_cols], F.lit(seed)),
            F.lit(salt_buckets),
        ),
    )
    small_salted = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_buckets).select(F.col("id").cast("long").alias(salt_col))
        )
    )
    out = big_salted.join(small_salted, on=[*keys, salt_col], how=how)
    return out.drop(salt_col)
