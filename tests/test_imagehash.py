"""Perceptual image hashing (operators/imagehash): bit-rule
exactness, encode/decode invariance, blocking completeness, stub
degradation."""

from __future__ import annotations

import pytest

from data_pipeline_childcare_spark.operators.imagehash import (
    _pack64,
    hamming_near_dup_pairs,
    perceptual_hashes_bytes,
)
from data_pipeline_childcare_spark.sources.imagecodec import encode_png


def _png(pix: bytes, w: int = 8, h: int = 8, filter_type: int = 0) -> bytes:
    return encode_png(w, h, pix, mode="L", filter_type=filter_type)


def _ref_ahash(pix: bytes) -> int:
    """Independent model of the 8x8 aHash bit rule."""
    total = sum(pix)
    return _pack64([1 if p * 64 > total else 0 for p in pix])


def test_ahash_known_bits_and_sign():
    # half dark / half bright -> bright cells above the mean
    pix = bytes([10] * 32 + [200] * 32)
    w, h, ahash, _, stub = perceptual_hashes_bytes(_png(pix))
    assert (w, h, stub) == (8, 8, False)
    assert ahash == _ref_ahash(pix)
    # bits 32..63 set, 0..31 clear -> negative as signed int64
    assert ahash < 0
    assert ahash == _pack64([0] * 32 + [1] * 32)


def test_ahash_invariant_to_png_filter_and_constant_shift():
    pix = bytes((i * 13 + 7) % 256 for i in range(64))
    hashes = {
        perceptual_hashes_bytes(_png(pix, filter_type=ft))[2] for ft in range(5)
    }
    assert len(hashes) == 1  # encoding choice never changes the hash
    shifted = bytes((p + 40) % 256 if max(pix) < 216 else p for p in pix)
    if max(pix) < 216:  # no wraparound -> pure brightness shift
        assert perceptual_hashes_bytes(_png(shifted))[2] == hashes.pop()


def test_dhash_gradient_directions():
    inc = bytes([i * 8 for i in range(8)] * 8)  # brighter to the right
    dec = bytes([(7 - i) * 8 for i in range(8)] * 8)
    _, _, _, dh_inc, _ = perceptual_hashes_bytes(_png(inc))
    _, _, _, dh_dec, _ = perceptual_hashes_bytes(_png(dec))
    # 9x8 grid over an 8-wide image duplicates one column per row:
    # rising rows set all-but-one bit per row, falling rows none
    assert dh_dec == 0
    assert bin(dh_inc & (1 << 64) - 1).count("1") == 8 * 7


def test_stub_tier_is_deterministic_and_marked():
    blob = b"certainly not an image"
    a = perceptual_hashes_bytes(blob)
    b = perceptual_hashes_bytes(blob)
    assert a == b
    assert a[4] is True


def test_pack64_signed_boundary():
    assert _pack64([0] * 64) == 0
    assert _pack64([1] * 64) == -1
    assert _pack64([0] * 63 + [1]) == -(1 << 63)


def test_hamming_pairs_blocking_complete(spark):
    # signatures with known pairwise distances: 0, 1, 3 within reach,
    # one far signature that shares no 16-bit band
    rows = [
        (1, 0x0F0F0F0F0F0F0F0F),
        (2, 0x0F0F0F0F0F0F0F0F),  # d(1,2)=0
        (3, 0x0F0F0F0F0F0F0F0E),  # d(1,3)=1
        (4, 0x0F0F0F0F0F0F0F00 | 0x07),  # d(1,4)=... one band differs
        (5, -1),  # 0xFFFF... far from everything above
    ]
    df = spark.createDataFrame(rows, "doc_id long, sig long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup_pairs(
            df, id_col="doc_id", sig_col="sig", max_hamming=3
        ).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 1
    assert (1, 4) in got  # hamming 1 (0x0F ^ 0x07 = 0x08)
    assert all(5 not in pair for pair in got)
    with pytest.raises(ValueError):
        hamming_near_dup_pairs(df, id_col="doc_id", sig_col="sig", max_hamming=4)


def test_image_perceptual_hashes_carries_id_cols(spark):
    # the generator must not close over test-module globals:
    # cloudpickle ships them by reference and executors have no
    # test_imagehash module
    def make_gen():
        def gen(batches):
            import pandas as pd

            from data_pipeline_childcare_spark.sources.imagecodec import encode_png

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "path": [f"x_{d}.png" for d in pdf["doc_id"]],
                        "content": [
                            encode_png(
                                8,
                                8,
                                bytes((int(d) * 31 + i * 7) % 256 for i in range(64)),
                                mode="L",
                            )
                            for d in pdf["doc_id"]
                        ],
                    }
                )

        return gen

    from data_pipeline_childcare_spark.operators.imagehash import (
        image_perceptual_hashes,
    )

    base = spark.createDataFrame([(1,), (2,)], "doc_id long").mapInPandas(
        make_gen(), schema="doc_id long, path string, content binary"
    )
    out = image_perceptual_hashes(base, id_cols=("doc_id",))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["width"] == 8 and not rows[1]["is_stub"]
    expected = _ref_ahash(bytes((1 * 31 + i * 7) % 256 for i in range(64)))
    assert rows[1]["ahash"] == expected


def test_video_keyframe_pipeline_real_tier(spark):
    """AVI synth → sample_frames (real tier, no stubs) → per-frame
    aHash → near-dup pairs: two identical 2-frame videos match on
    both frame positions; an unrelated video matches nothing."""

    def make_gen():
        def gen(batches):
            import pandas as pd

            from data_pipeline_childcare_spark.sources.imagecodec import (
                encode_avi_dib,
            )

            def vid(seed):
                frames = []
                for f in range(2):
                    frames.append(
                        bytes(
                            b
                            for i in range(64)
                            for b in [(seed * 13 + i * (7 + f)) % 256] * 3
                        )
                    )
                return encode_avi_dib(8, 8, frames)

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "path": [f"v_{d}.avi" for d in pdf["doc_id"]],
                        # docs 1,2 identical; doc 3 unrelated
                        "content": [
                            vid(1 if int(d) < 3 else 99) for d in pdf["doc_id"]
                        ],
                    }
                )

        return gen

    from pyspark.sql import functions as F

    from data_pipeline_childcare_spark.operators.imagehash import (
        hamming_near_dup_pairs,
        image_perceptual_hashes,
    )
    from data_pipeline_childcare_spark.sources.multimodal import sample_frames

    vids = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long").mapInPandas(
        make_gen(), schema="doc_id long, path string, content binary"
    )
    frames = sample_frames(vids, every_ms=100, max_frames=2)
    assert frames.filter("is_stub").count() == 0  # real AVI tier
    keyed = frames.select(
        (
            F.regexp_extract("path", r"v_(\d+)\.avi", 1).cast("long") * 16
            + F.col("frame_idx")
        ).alias("fkey"),
        F.col("frame").alias("content"),
        "path",
    )
    hashed = image_perceptual_hashes(keyed, id_cols=("fkey",))
    assert hashed.filter("is_stub").count() == 0
    pairs = hamming_near_dup_pairs(
        hashed, id_col="fkey", sig_col="ahash", max_hamming=0
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # videos 1 and 2: frame 0 keys (16, 32), frame 1 keys (17, 33)
    assert (16, 32) in got and (17, 33) in got
    assert all(48 not in p and 49 not in p for p in got)


def test_multimodal_agreement_exact_subset_of_perceptual(spark):
    """Audit invariant: byte-identical blobs decode to identical
    pixels, so every exact pair must also be a perceptual pair
    (n_exact_only == 0) and the perceptual-only mass (re-encodes,
    perturbations) is non-negative."""
    import __spark_entry__ as entry_mod

    row = entry_mod.queries()["multimodal_dedup_agreement"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row["n_exact_only"] == 0
    assert row["n_both"] == row["n_exact"]
    assert row["n_perceptual"] >= row["n_exact"]
    assert row["n_pairs_union"] == row["n_perceptual"] + row["n_exact_only"]
