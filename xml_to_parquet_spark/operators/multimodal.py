"""Multimodal-column operators [EXT]: opaque binary payloads with typed
metadata, decoded/feature-extracted through ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is STUBBED —
``decode_image_stub`` raises NotImplementedError and the registered
operators use a deterministic fake (byte-level features) instead. What IS
real and tested: the Spark-side plumbing — binary column construction,
Arrow batch shape through mapInPandas, declared output schema, and the
oracle parity of every derived value.

At scale this is the pattern for 100 TB of images: binary column + typed
metadata struct, mapInPandas with bounded Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch) so executor memory is
batch-bounded, never file-bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import md5 as _md5

import pandas as pd
from pyspark.sql import functions as F

from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table


def decode_image_stub(payload: bytes) -> dict:
    """Placeholder for a real image decode (PIL/libvips not installed in
    this environment). A production build plugs the codec in here; the
    operator's schema/batching contract does not change."""
    raise NotImplementedError("image codecs not available in this container")


def _fake_meta(payload: bytes) -> dict:
    """Deterministic stand-in features derived from raw bytes only."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "sig": _md5(payload).hexdigest()[:8],
        "width": len(payload) % 640,
        "height": (payload[0] * 4) if payload else 0,
    }


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        metas = [_fake_meta(bytes(b)) for b in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@register(
    "mm_decode_meta",
    """
    SELECT doc_id,
           octet_length(encode(text))          AS n_bytes,
           ascii(substr(text, 1, 1))           AS first_byte,
           substr(md5(text), 1, 8)             AS sig,
           octet_length(encode(text)) % 640    AS width,
           ascii(substr(text, 1, 1)) * 4       AS height
    FROM documents
    """,
)
def mm_decode_meta(spark, sf_dir):
    """Binary decode plumbing: text → binary payload column → mapInPandas
    'decode' producing a typed metadata row per object. The fake decode's
    outputs are byte-derived and deterministic, so the Arrow round-trip is
    oracle-checked end-to-end."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return docs.mapInPandas(
        _decode_batches,
        schema="doc_id bigint, n_bytes bigint, first_byte bigint, sig string, "
        "width bigint, height bigint",
    )


@register(
    "mm_frame_sample",
    """
    SELECT doc_id, unnest(range(0, n_chars % 100, 10)) AS frame_idx
    FROM documents
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing for video-like payloads: each document
    pretends to be a clip with (n_chars % 100) frames; sample every 10th.
    Explode-of-generated-sequence is the Spark shape for per-object fan-out
    (rows scale with frames, memory does not)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") % 100).alias("n_frames")
    )
    return (
        docs.filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(10))
            ).alias("frame_idx"),
        )
    )


def _resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        w = pdf["width"].astype("int64")
        h = pdf["height"].astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "out_w": 224,
                "out_h": (h * 224) // w,
                "scale_num": 224,
                "scale_den": w,
            }
        )
        yield out


@register(
    "mm_resize",
    """
    WITH meta AS (
      SELECT doc_id,
             octet_length(encode(text)) % 640 AS width,
             ascii(substr(text, 1, 1)) * 4    AS height
      FROM documents
    )
    SELECT doc_id, 224 AS out_w, (height * 224) // width AS out_h,
           224 AS scale_num, width AS scale_den
    FROM meta WHERE width > 0
    """,
)
def mm_resize(spark, sf_dir):
    """Resize plumbing: aspect-preserving target dims computed per object
    in a mapInPandas stage (where a real build calls the codec's resize).
    Integer math only, so the oracle reproduces it exactly. The Spark
    contract under test: filter → mapInPandas schema → Arrow batch shape."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.octet_length(F.col("text").cast("binary")) % 640).alias("width"),
        (F.ascii(F.substring("text", 1, 1)) * 4).cast("long").alias("height"),
    )
    return docs.filter(F.col("width") > 0).mapInPandas(
        _resize_batches,
        schema="doc_id bigint, out_w int, out_h bigint, scale_num int, scale_den bigint",
    )


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    hexmap = {c: i for i, c in enumerate("0123456789abcdef")}
    for pdf in it:
        feats = [
            [hexmap[c] / 15.0 for c in _md5(bytes(b)).hexdigest()[:8]]
            for b in pdf["payload"]
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "features": feats})


@register(
    "mm_feature_extract",
    """
    SELECT doc_id, d - 1 AS dim,
           (strpos('0123456789abcdef', substr(md5(text), d, 1)) - 1) / 15.0
               AS value
    FROM documents, range(1, 9) t(d)
    """,
)
def mm_feature_extract(spark, sf_dir):
    """Feature-extraction plumbing: binary payload → fixed-dim double
    vector through mapInPandas (a real build runs the vision encoder in
    this stage; batch size is the GPU-memory knob via
    spark.sql.execution.arrow.maxRecordsPerBatch). The fake features are
    md5-derived so the Arrow array<double> round-trip is oracle-checked.

    Output is exploded to one (doc_id, dim, value) row per vector component
    so every cell is a hashable scalar (list-valued cells break
    order-insensitive canonicalization in generic harnesses)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    feats = docs.mapInPandas(
        _feature_batches, schema="doc_id bigint, features array<double>"
    )
    return feats.select(
        "doc_id", F.posexplode("features").alias("dim", "value")
    ).withColumn("dim", F.col("dim").cast("bigint"))


AUDIO_WIN = 4096  # samples per analysis window
AUDIO_HOP = 3072  # hop size (25% overlap)


@register(
    "mm_audio_chunk",
    f"""
    WITH sized AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
      FROM documents WHERE octet_length(encode(text)) > 0
    ), fanned AS (
      SELECT doc_id, text, n_bytes,
             unnest(range(0, CAST(ceil(n_bytes / {AUDIO_HOP}.0) AS BIGINT))) AS chunk_idx
      FROM sized
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * {AUDIO_HOP}                                  AS start_byte,
           least({AUDIO_WIN}, n_bytes - chunk_idx * {AUDIO_HOP})    AS n_samples,
           substr(md5(substr(text, chunk_idx * {AUDIO_HOP} + 1, {AUDIO_WIN})), 1, 8)
               AS sig
    FROM fanned
    """,
)
def mm_audio_chunk(spark, sf_dir):
    """Audio-windowing plumbing: treat each payload as a PCM byte stream
    and fan it out into fixed windows (4096 samples, hop 3072 — the STFT
    frame pattern). A real build feeds each window to the audio featurizer
    inside mapInPandas; here the window arithmetic, fan-out shape and
    per-window identity (md5 of the byte slice) are real and
    oracle-checked. Rows scale with windows; memory stays per-batch."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.octet_length(F.col("text").cast("binary")).alias("n_bytes"),
    ).filter(F.col("n_bytes") > 0)
    fanned = docs.select(
        "doc_id",
        "text",
        "n_bytes",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.col("n_bytes") / float(AUDIO_HOP)).cast("bigint") - 1,
            )
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * AUDIO_HOP
    window = F.substring(F.col("text"), (start + 1).cast("int"), AUDIO_WIN)
    return fanned.select(
        "doc_id",
        "chunk_idx",
        start.alias("start_byte"),
        F.least(F.lit(AUDIO_WIN), F.col("n_bytes") - start).alias("n_samples"),
        F.substring(F.md5(window.cast("binary")), 1, 8).alias("sig"),
    )
