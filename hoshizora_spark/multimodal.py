"""Multimodal media columns: binary content with typed metadata.

The reference engine is text/graph-only; a training-data pipeline at
100 TB also carries images/audio/video. The engine-level contract here:

* media rows are ``(doc_id: long, modality: string, content: binary)``
  plus whatever typed metadata columns a source provides — content is an
  opaque blob to Catalyst, so every byte-level op is either a JVM
  expression over the bytes (hash, length) or an Arrow-batched pandas UDF
  (``mapInPandas``), never per-row Python.
* per-modality exact dedup = sha256 over the raw bytes — identical to the
  text path (text.exact_dedup) so one dedup discipline covers every
  modality; the groupBy key is the 32-byte digest, the shuffle never
  carries blobs.
* decode / feature-extract run as ``mapInPandas`` over batches of blobs.
  The real image/audio codecs (PIL, ffmpeg, torchaudio) are NOT in this
  environment — the decode kernels below are deterministic byte-parsers
  standing in for them (STUB, marked per function), but the Spark-side
  plumbing (schema, Arrow batch shape, partitioning) is the real thing
  and is what the tests pin down.
* embeddings extracted from media feed the exact same similarity tier
  (similarity.cosine_topk / ann_lsh_topk) as text embeddings.

Scale notes: blobs never enter a shuffle — every op either reduces to a
digest/meta row first (dedup, stats, meta) or streams blob partitions
through Arrow once (embedding extraction). A 100 TB media corpus shuffles
only O(rows) small rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video")


def synthesize_media(docs: DataFrame, n_digests: int = 4) -> DataFrame:
    """Deterministic fake media corpus derived from a documents table.

    content = unhex(sha256(text) ‖ sha256(text+'x') ‖ ...) — ``n_digests``
    chained digests, 32 bytes each. Modality cycles by original doc id
    (copies injected at +1M/+2M keep their source's modality so dedup has
    same-modality positives). Deterministic and reproducible in any engine
    with sha256 — which is what lets DuckDB oracle-check every downstream
    op without real codecs in the container.
    """
    salts = ["", "x", "y", "z", "w", "v"][:n_digests]
    hex_parts = [F.sha2(F.concat(F.col("text"), F.lit(s)), 256) for s in salts]
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.pmod(F.pmod(F.col("doc_id"), F.lit(1_000_000)), F.lit(3)) + 1).cast("int"),
        ).alias("modality"),
        F.unhex(F.concat(*hex_parts)).alias("content"),
    )


def content_digest(content_col):
    """Portable digest of a blob: sha256 over its uppercase hex encoding.
    Hex is a bijection of the bytes, so dedup semantics equal hashing the
    raw bytes — but engines whose sha256 is VARCHAR-only (DuckDB) can
    reproduce it, which is what makes the dedup oracle cross-engine."""
    return F.sha2(F.hex(content_col), 256)


def media_exact_dedup(media: DataFrame) -> DataFrame:
    """(modality, content_hash, keep_id, n_dups) — byte-exact dedup per
    modality. Same shape/discipline as text.exact_dedup: the shuffle key
    is the digest, blobs stay in their scan partitions."""
    hashed = media.select(
        "doc_id", "modality", content_digest(F.col("content")).alias("content_hash")
    )
    return hashed.groupBy("modality", "content_hash").agg(
        F.min("doc_id").alias("keep_id"),
        (F.count(F.lit(1)) - 1).alias("n_dups"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """(modality, n_items, total_bytes, distinct_contents) — corpus
    accounting per modality; octet-level, no decode."""
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.count_distinct(content_digest(F.col("content"))).alias("distinct_contents"),
    )


# ------------------------------------------------------- decode kernels

META_SCHEMA = "doc_id long, modality string, n_bytes long, width int, height int, channels int"


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Per-item decoded metadata via ``mapInPandas`` (Arrow-batched).

    STUB CODEC: a real deployment decodes headers with PIL/ffmpeg here.
    This container has neither, so the "header" is parsed deterministically
    from the first bytes (width <- bytes[0:2] big-endian % 1920 + 1,
    height <- bytes[2:4] % 1080 + 1, channels = 3 for image else 1) — the
    parse is vectorized numpy over the Arrow batch, and the schema /
    batch plumbing is exactly what the real codec would use.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = pdf["content"]
            n_bytes = blobs.map(len).astype(np.int64)
            # zero-pad short/empty blobs: one malformed row must degrade to
            # a (deterministic) row-level result, never abort the Arrow batch
            b = np.frombuffer(
                b"".join(bytes(x[:4]).ljust(4, b"\0") for x in blobs),
                dtype=np.uint8,
            ).reshape(-1, 4).astype(np.int64)
            width = ((b[:, 0] << 8 | b[:, 1]) % 1920 + 1).astype(np.int32)
            height = ((b[:, 2] << 8 | b[:, 3]) % 1080 + 1).astype(np.int32)
            channels = np.where(pdf["modality"].to_numpy() == "image", 3, 1).astype(
                np.int32
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(np.int64),
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "width": width,
                    "height": height,
                    "channels": channels,
                }
            )

    return media.mapInPandas(run, schema=META_SCHEMA)


def media_embeddings(media: DataFrame, dim: int = 16) -> DataFrame:
    """(doc_id, embedding: array<double>) — feature extraction stub.

    STUB EXTRACTOR: a real deployment runs a vision/audio encoder on the
    decoded tensor. Here embedding[d] = byte[(7·d) mod n]/255 − 0.5 —
    vectorized numpy over the Arrow batch, identical output for identical
    bytes (so exact copies land at cosine 1.0 and the similarity tier's
    dedup/topk behavior is testable end-to-end).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            embs = []
            for blob in pdf["content"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.float64)
                if len(arr) == 0:
                    # empty blob → NULL embedding (row-level degradation,
                    # never a ZeroDivisionError that kills the whole batch)
                    embs.append(None)
                    continue
                idx = (7 * np.arange(dim)) % len(arr)
                embs.append(arr[idx] / 255.0 - 0.5)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype(np.int64), "embedding": embs}
            )

    return media.mapInPandas(run, schema="doc_id long, embedding array<double>")


def media_embed_near_dups(
    media: DataFrame, threshold: float = 0.999, use_lsh: bool = True
) -> DataFrame:
    """(a, b, cos) — same-bytes/near-bytes media pairs by embedding cosine.

    Composition proof that media plugs into the text similarity tier: the
    stub embeddings feed the similarity module unchanged. Default is the
    scale path (``cosine_near_dup_lsh``: LSH candidates → exact verify, no
    crossJoin; exact copies share every band so their recall is
    structural); ``use_lsh=False`` keeps the O(N²) all-pairs verifier for
    small-N oracle runs.
    """
    from hoshizora_spark.similarity import cosine_near_dup_lsh, cosine_near_dup_pairs

    emb = media_embeddings(media).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    if use_lsh:
        return cosine_near_dup_lsh(emb, threshold=threshold).selectExpr(
            "a", "b", "cos"
        )
    return cosine_near_dup_pairs(emb, threshold=threshold)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Decode + resize every image blob to (width, height) RGB tensors.

    NOT IMPLEMENTED in this container: requires a real image codec (PIL /
    libvips), which is deliberately not installed. The signature, schema
    contract ((doc_id, pixels: array<float>, width, height, channels)) and
    the mapInPandas batch shape are fixed here so a deployment with PIL
    drops its decoder into ``run`` without touching callers.
    """
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "resize_images needs an image codec (PIL); not available in this "
            "environment — see docstring for the deployment contract"
        ) from e
    raise NotImplementedError("real codec path intentionally not implemented here")


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every ``every_n``-th frame of each video blob.

    NOT IMPLEMENTED in this container: requires ffmpeg bindings. Contract:
    one output row per sampled frame (doc_id, frame_idx, frame: binary),
    emitted from a mapInPandas generator so a single video's frames never
    materialize at once.
    """
    try:
        import av  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "sample_video_frames needs ffmpeg bindings (PyAV); not available "
            "in this environment — see docstring for the deployment contract"
        ) from e
    raise NotImplementedError("real codec path intentionally not implemented here")
