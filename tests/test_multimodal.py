"""Multimodal plumbing tests: schema convention, Arrow batch flow,
corrupt-payload handling (the stub decode's NotImplementedError path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.functions import multimodal


def test_media_schema_convention(spark, sf_smoke):
    m = multimodal.documents_as_media(spark, sf_smoke)
    assert dict(m.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "payload": "binary",
        "meta": "struct<width:int,height:int,n_bytes:bigint>",
    }


def test_feature_extraction_roundtrip(spark, sf_smoke):
    m = multimodal.documents_as_media(spark, sf_smoke)
    feats = multimodal.extract_features(m)
    row = feats.orderBy("doc_id").first()
    assert row["n_bytes"] > 0
    assert 0 < row["byte_mean"] < 128  # ASCII text
    assert len(row["header_hex"]) == 16


def test_corrupt_payload_dropped_not_fatal(spark):
    rows = [
        (1, "img", bytearray(b"valid ascii")),
        (2, "img", bytearray(b"\xff\xfe\x93binary junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media_type string, payload binary")
    out = multimodal.extract_features(df)
    ids = [r["doc_id"] for r in out.collect()]
    assert ids == [1]  # corrupt row dropped, pipeline survives


def test_decode_stub_raises_on_real_binary():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(b"\xff\xd8\xff\xe0JFIF")


def test_metadata_scan_does_not_touch_payload(spark, sf_smoke):
    from inf2106_map_reduce_spark.plans import explain_str

    stats = multimodal.media_metadata_stats(spark, sf_smoke)
    # the metadata-only aggregate must not evaluate the decode UDF path
    assert "mapInPandas" not in explain_str(stats, "simple").lower()
    assert stats.count() == 1


def test_resize_stub_downsamples_deterministically():
    assert multimodal.resize_stub(b"abcdefgh", 4) == b"ae"
    assert multimodal.resize_stub(b"", 4) == b""


def test_sample_frames_one_to_n_and_empty_payload(spark):
    rows = [
        (1, "vid", bytearray(b"x" * 130)),  # 3 frames of 64 -> sampled 0, 2
        (2, "vid", bytearray(b"")),  # zero frames -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media_type string, payload binary")
    out = multimodal.sample_frames(df, frame_len=64, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert by_doc == {1: [0, 2]}
    sizes = {r["frame_idx"]: r["n_bytes"] for r in out}
    assert sizes == {0: 64, 2: 2}  # last frame is the 2-byte remainder


class _FakeImage:
    """Minimal PIL.Image stand-in: decodes payloads of the form
    b'IMG:<w>x<h>' and rejects everything else — enough to drive the
    real-backend branch of decode_image without pillow installed."""

    def __init__(self, w, h):
        self.width, self.height, self.format = w, h, "FAKE"

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    @staticmethod
    def open(buf):
        data = buf.read()
        if not data.startswith(b"IMG:"):
            raise OSError("cannot identify image file")
        w, h = data[4:].decode().split("x")
        return _FakeImage(int(w), int(h))


def test_decode_image_both_branches():
    """The import-guarded decode must (a) produce real metadata when a
    backend is present, (b) null the decode fields for undecodable
    payloads WITH a backend, and (c) keep the stub contract — same
    keys, NotImplementedError surface — without one."""
    # real-backend branch (injected fake, same protocol as PIL.Image)
    f = multimodal.decode_image(b"IMG:640x480", backend=_FakeImage)
    assert (f["width"], f["height"], f["img_format"]) == (640, 480, "FAKE")
    assert f["n_bytes"] == 11 and f["header_hex"] == b"IMG:640x".hex()
    # backend present, payload not an image -> nullable decode fields,
    # byte stats still computed (no NotImplementedError on this branch)
    f2 = multimodal.decode_image(b"\xff\xd8 not really", backend=_FakeImage)
    assert f2["width"] is None and f2["img_format"] is None
    assert f2["n_bytes"] == 13
    # stub branch (no backend anywhere in this container)
    assert multimodal.image_backend() is None
    f3 = multimodal.decode_image(b"plain text")
    assert f3["width"] is None and f3["n_bytes"] == 10
    assert set(f3) == set(f)  # identical shape across branches
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0")  # binary, no backend


def test_feature_schema_decode_fields_null_on_stub_path(spark, sf_smoke):
    """End-to-end Spark path on the stub branch: the nullable decode
    columns exist in the schema and are NULL for every row."""
    feats = multimodal.extract_features(
        multimodal.documents_as_media(spark, sf_smoke)
    )
    assert {"width", "height", "img_format"} <= set(feats.columns)
    n = feats.count()
    assert n > 0
    assert feats.filter("width IS NULL AND height IS NULL").count() == n
