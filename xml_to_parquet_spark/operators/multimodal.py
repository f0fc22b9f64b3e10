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
