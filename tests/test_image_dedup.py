"""Perceptual image dedup (r12): pHash fingerprints + hamming-band LSH
(operators/imaging.phash64, operators/multimodal.phash_images /
image_dedup, operators/dedup.fingerprint_band_pairs).

Fixture images come from the SAME generator the image_dedup entry uses
(entries/llm_text._smooth_field_image / _perturb_image — review r12:
the pin must cover the entry's actual fixture recipe): smooth random
low-frequency fields with photo-like spectra where every DCT-block
coefficient carries signal, the regime pHash is built for. Planted
near-duplicates (local edit + mild noise) must land within a few
Hamming bits; unrelated images tens of bits apart."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.entries.llm_text import (
    _perturb_image,
    _smooth_field_image,
)
from mortar_parquet_support_spark.operators.imaging import encode_png, phash64
from mortar_parquet_support_spark.operators.multimodal import (
    image_dedup,
    phash_images,
)

H, W = 48, 64


def _base_image(i: int) -> np.ndarray:
    return _smooth_field_image(i, H, W)


def _perturb(img: np.ndarray, seed: int) -> np.ndarray:
    return _perturb_image(img, seed)


def _png(arr: np.ndarray) -> bytearray:
    return bytearray(encode_png(arr.tobytes(), W, H, 1))


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


N_BASE = 24


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(N_BASE):
        img = _base_image(i)
        rows.append((f"img{i}", _png(img)))
        if i % 3 == 0:  # planted near-duplicate
            rows.append((f"img{i}_copy", _png(_perturb(img, i))))
    return spark.createDataFrame(rows, "media_id string, content binary")


def test_phash_separation(media):
    """Planted copies within 4 bits of their source; unrelated bases at
    least 10 apart — the margins image_dedup's defaults rely on."""
    rows = {r.media_id: r.phash for r in phash_images(media).collect()}
    assert len(rows) == N_BASE + N_BASE // 3
    for i in range(0, N_BASE, 3):
        assert _hamming(rows[f"img{i}"], rows[f"img{i}_copy"]) <= 4
    for i in range(N_BASE):
        for j in range(i + 1, N_BASE):
            assert _hamming(rows[f"img{i}"], rows[f"img{j}"]) >= 10


def test_image_dedup_planted_recall(media):
    """Recall 1.0 over the planted ground truth, and every reported pair
    IS a planted pair (no false positives on this fixture)."""
    pairs = {
        (r.media_id_a, r.media_id_b)
        for r in image_dedup(media, max_distance=6).collect()
    }
    truth = {
        tuple(sorted((f"img{i}", f"img{i}_copy")))
        for i in range(0, N_BASE, 3)
    }
    got = {tuple(sorted(p)) for p in pairs}
    assert got == truth


def test_phash_matches_driver_side(media, spark):
    """The distributed mapInPandas hash == phash64 run driver-side on the
    same bytes (no batching/Arrow drift), and NULL content drops."""
    withnull = media.unionByName(
        spark.createDataFrame(
            [("img_null", None)], "media_id string, content binary"
        )
    )
    got = {r.media_id: r.phash for r in phash_images(withnull).collect()}
    assert "img_null" not in got
    exp = {
        r.media_id: phash64(bytes(r.content)) for r in media.collect()
    }
    assert got == exp


def test_phash_non_png_raises(spark):
    df = spark.createDataFrame(
        [("bad", bytearray(b"not a png"))], "media_id string, content binary"
    )
    with pytest.raises(Exception, match="PNG"):
        phash_images(df).collect()


def test_fingerprint_band_pairs_hamming_guarantee(spark):
    """Pigeonhole coverage: with 4 bands of 16 bits, EVERY pair within
    Hamming distance 3 is a candidate — exhaustively planted at
    distances 1, 2, 3 across different band boundaries."""
    from mortar_parquet_support_spark.operators.dedup import (
        fingerprint_band_pairs,
    )

    base = 0x123456789ABCDEF0
    variants = [("d0", base)]
    flips = [(1, [0]), (2, [5, 20]), (3, [10, 33, 63])]
    for dist, bits in flips:
        v = base
        for b in bits:
            v ^= 1 << b
        if v >= 1 << 63:
            v -= 1 << 64
        variants.append((f"d{dist}", v))
    signed_base = base - (1 << 64) if base >= 1 << 63 else base
    variants[0] = ("d0", signed_base)
    df = spark.createDataFrame(variants, "id string, fp long")
    pairs = {
        (r.id_a, r.id_b)
        for r in fingerprint_band_pairs(
            df, id_col="id", fp_col="fp", band_bits=16
        ).collect()
    }
    for dist, _ in flips:
        assert ("d0", f"d{dist}") in pairs or (f"d{dist}", "d0") in pairs


def test_image_dedup_rejects_lossy_band_combo(media):
    """band_bits/max_distance combinations whose pigeonhole guarantee
    falls below max_distance must be rejected, not silently lossy
    (review r12: the old default 16/6 missed true pairs at distance
    4-6 whose differing bits spanned all four bands)."""
    with pytest.raises(ValueError, match="band_bits"):
        image_dedup(media, band_bits=16, max_distance=6)
    with pytest.raises(ValueError, match="band_bits"):
        image_dedup(media, band_bits=32, max_distance=2)
