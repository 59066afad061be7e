"""Multimodal media columns: dedup / stats / decode / embedding plumbing."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from hoshizora_spark import multimodal


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = docs.limit(3).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    aug = docs.select("doc_id", "text").unionByName(exact)
    return multimodal.synthesize_media(aug).cache()


def test_synthesize_deterministic_bytes(spark, media):
    row = media.filter(F.col("doc_id") == 0).first()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    text0 = docs.filter(F.col("doc_id") == 0).first()["text"]
    want = b"".join(
        hashlib.sha256((text0 + s).encode()).digest() for s in ("", "x", "y", "z")
    )
    assert bytes(row["content"]) == want
    assert row["modality"] in multimodal.MODALITIES


def test_media_exact_dedup_finds_copies_within_modality(media):
    res = multimodal.media_exact_dedup(media)
    dups = res.filter(F.col("n_dups") > 0).collect()
    assert len(dups) == 3
    # copies keep the source's modality (id % 1M), so the pair dedups together
    assert all(r["keep_id"] < 1_000_000 and r["n_dups"] == 1 for r in dups)


def test_media_stats_accounting(media):
    rows = {r["modality"]: r for r in multimodal.media_stats(media).collect()}
    n_total = sum(r["n_items"] for r in rows.values())
    assert n_total == media.count()
    for r in rows.values():
        assert r["total_bytes"] == r["n_items"] * 128  # 4 × 32-byte digests
        assert r["distinct_contents"] <= r["n_items"]


def test_decode_media_meta_matches_python_parse(media):
    got = {r["doc_id"]: r for r in multimodal.decode_media_meta(media).collect()}
    sample = media.limit(10).collect()
    for row in sample:
        b = bytes(row["content"])
        m = got[row["doc_id"]]
        assert m["n_bytes"] == len(b)
        assert m["width"] == (b[0] << 8 | b[1]) % 1920 + 1
        assert m["height"] == (b[2] << 8 | b[3]) % 1080 + 1
        assert m["channels"] == (3 if row["modality"] == "image" else 1)


def test_media_embeddings_copy_pairs_identical(media):
    emb = {r["doc_id"]: np.array(r["embedding"]) for r in
           multimodal.media_embeddings(media).collect()}
    for i in range(3):
        assert np.array_equal(emb[i], emb[i + 2_000_000])
    assert all(len(v) == 16 for v in emb.values())


def test_media_embed_near_dups_finds_copies(media):
    pairs = {(r["a"], r["b"]) for r in
             multimodal.media_embed_near_dups(media, threshold=0.9999).collect()}
    for i in range(3):
        assert (i, i + 2_000_000) in pairs


def test_codec_stubs_raise_not_implemented(media):
    with pytest.raises(NotImplementedError, match="image codec"):
        multimodal.resize_images(media, 224, 224)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        multimodal.sample_video_frames(media)


def test_media_plans_are_arrow_not_row_python(media):
    meta_plan = multimodal.decode_media_meta(media)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in meta_plan
    assert "MapInPandas" in meta_plan
    dedup_plan = multimodal.media_exact_dedup(media)._jdf.queryExecution().executedPlan().toString()
    # dedup is pure Catalyst: digests JVM-side, no Python at all
    assert "Python" not in dedup_plan
