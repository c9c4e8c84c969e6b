"""Multimodal column plumbing: opaque ``binary`` payload columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

Decoding is IMPORT-GUARDED, not hard-stubbed: `decode_image` uses
pillow (`PIL.Image`) when installed — real width/height/format
metadata, looked up per executor worker — and falls back to the
deterministic stub (`decode_image_stub`) otherwise. The decode fields
are nullable on both branches so schemas and oracles are
backend-independent; this test container has no image libraries, so
tests exercise the real branch with an injected fake backend and the
stub branch end-to-end through Spark.

Scale notes: payloads stay in executor memory one Arrow batch at a
time (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch
bytes); never collect binaries to the driver; feature extraction is a
narrow map — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<width:int, height:int, n_bytes:bigint>"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "byte_mean double, header_hex string, "
    # nullable decode fields: populated only when an image backend
    # (pillow) is installed AND the payload decodes; the registry
    # query projects the always-present byte-level columns, so its
    # oracle is backend-independent
    "width int, height int, img_format string"
)


def decode_image_stub(payload: bytes) -> dict:
    """STUB decode — a real pipeline calls PIL/libvips here.

    Raises NotImplementedError for non-synthetic media; for synthetic
    (UTF-8 text) payloads produces deterministic fake features so the
    Spark plumbing is fully exercisable in tests.
    """
    try:
        payload.decode("utf-8")
    except UnicodeDecodeError as exc:  # real image bytes land here
        raise NotImplementedError(
            "real media decoding requires an image library not present "
            "in this environment"
        ) from exc
    return {
        "n_bytes": len(payload),
        "byte_mean": (sum(payload) / len(payload)) if payload else 0.0,
        "header_hex": payload[:8].hex(),
    }


def image_backend():
    """The OPTIONAL image decode backend: ``PIL.Image`` when pillow is
    installed, else None. Looked up at call time (inside the executor
    worker for the Spark path), so installing pillow on the cluster
    flips every worker to real decoding with zero code change."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes, backend=None) -> dict:
    """Decode one payload: byte-level stats always (the stub contract,
    unchanged), plus REAL image metadata — ``width``/``height``/
    ``img_format`` — when an image backend is available AND the payload
    is an actual decodable image. The decode fields are NULLABLE on
    both branches, so schema, oracle, and downstream plumbing are
    identical with or without pillow; only the values appear.

    Non-UTF-8 payloads with NO backend still raise NotImplementedError
    (the deliberate stub surface — silent nulls would hide that the
    deployment forgot its decode dependency)."""
    if backend is None:
        backend = image_backend()
    width = height = img_format = None
    if backend is not None:
        import io

        try:
            with backend.open(io.BytesIO(payload)) as img:
                width, height = int(img.width), int(img.height)
                img_format = img.format
        except Exception:
            # backend present but payload isn't an image it can read —
            # fall through to byte-level features with NULL decode
            # fields (matches the stub branch's shape)
            pass
        base = {
            "n_bytes": len(payload),
            "byte_mean": (sum(payload) / len(payload)) if payload else 0.0,
            "header_hex": payload[:8].hex(),
        }
    else:
        base = decode_image_stub(payload)
    return {**base, "width": width, "height": height, "img_format": img_format}


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap documents.text as a synthetic binary media column with a
    typed metadata struct — the storage convention for multimodal data
    (payload opaque, metadata queryable without decoding)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.lit("synthetic/text").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` keeps whole-batch vectorization and lets one input
    row produce 0..N output rows (corrupt payloads are dropped, like a
    real decode pipeline)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = image_backend()  # one lookup per worker batch stream
        for pdf in it:
            feats = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                try:
                    f = decode_image(bytes(payload), backend=backend)
                except NotImplementedError:
                    continue
                feats.append(
                    (
                        doc_id,
                        mtype,
                        f["n_bytes"],
                        f["byte_mean"],
                        f["header_hex"],
                        f["width"],
                        f["height"],
                        f["img_format"],
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "byte_mean",
                    "header_hex",
                    "width",
                    "height",
                    "img_format",
                ],
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_stub(payload: bytes, factor: int = 4) -> bytes:
    """STUB resize — a real pipeline calls PIL.Image.resize / libvips
    here. Deterministic byte downsample (every ``factor``-th byte)
    keeps the plumbing testable without an image library."""
    return payload[::factor]


def sample_frames(
    media: DataFrame, frame_len: int = 64, stride: int = 2
) -> DataFrame:
    """Frame sampling for video-like payloads: split the payload into
    fixed-size frames, keep every ``stride``-th, and emit one row per
    sampled frame with its fingerprint and a resized-thumbnail
    fingerprint (1→N mapInPandas — a real ffmpeg keyframe sampler has
    exactly this Spark-side shape).
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_len - 1) // frame_len
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_len : (i + 1) * frame_len]
                    thumb = resize_stub(fr)
                    rows.append(
                        (
                            doc_id,
                            i,
                            len(fr),
                            hashlib.md5(fr).hexdigest(),
                            hashlib.md5(thumb).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "n_bytes", "frame_md5", "thumb_md5"],
            )

    return media.mapInPandas(
        batches,
        schema=(
            "doc_id bigint, frame_idx int, n_bytes int, "
            "frame_md5 string, thumb_md5 string"
        ),
    )


def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: metadata-only scan (no decode — the point of the
    typed-metadata convention): payload byte stats per media type."""
    m = documents_as_media(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.round(F.avg(F.col("meta.n_bytes")), 4).alias("avg_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: decoded (stub) per-item features via
    mapInPandas; byte_mean rounded for oracle stability."""
    feats = extract_features(documents_as_media(spark, sf_dir))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round("byte_mean", 6).alias("byte_mean"),
        "header_hex",
    )


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: frame sampling + thumbnail fingerprints over the
    synthetic media payloads (1→N mapInPandas)."""
    return sample_frames(documents_as_media(spark, sf_dir))
