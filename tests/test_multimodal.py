"""Multimodal plumbing tests: schema/UDF-signature/batch shape are real;
the codec is stubbed (north-star contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from core_telecoms_etl_spark.operators import multimodal as mm


def _media(spark):
    rows = [
        (1, "image/png", bytearray(b"\x89PNG123456"), 4, 4, None),
        (2, "image/png", bytearray(b""), 0, 0, None),
        (3, "audio/wav", None, None, None, 2500),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_binary_metadata(spark):
    out = {
        r.media_id: (r.n_bytes, r.payload_sha256)
        for r in mm.binary_metadata(
            _media(spark), "payload", id_col="media_id"
        ).collect()
    }
    assert out[1][0] == 10
    assert len(out[1][1]) == 64
    assert out[2][0] == 0


def test_decode_features_with_fake_decoder(spark):
    out = mm.decode_features(
        _media(spark), decoder=mm.deterministic_fake_decoder
    )
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,mime:string,n_bytes:bigint,feature:array<double>>"
    )
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].n_bytes == 10 and len(rows[1].feature) == 4
    assert rows[1].feature[0] == 10.0  # length moment
    assert rows[3].feature == [0.0, 0.0, 0.0, 0.0]  # NULL payload → zeros


def test_decode_stub_raises(spark):
    with pytest.raises(Exception) as ei:
        mm.decode_features(_media(spark)).collect()
    assert "NotImplementedError" in str(ei.value) or "image decoding" in str(
        ei.value
    )


def test_frame_sample_plan(spark):
    df = _media(spark).filter(F.col("duration_ms").isNotNull())
    frames = mm.frame_sample_plan(df, every_ms=1000).select(
        "media_id", "frame_ts_ms"
    )
    got = sorted(r.frame_ts_ms for r in frames.collect())
    assert got == [0, 1000, 2000]


def test_resize_plumbing_with_fake_codec(spark):
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.operators.multimodal import (
        deterministic_fake_resizer,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, "image/png", bytearray(b"abc")), (2, "image/png", bytearray(b""))],
        "media_id long, mime string, payload binary",
    )
    out = resize_images(
        df, target=(4, 2), resizer=deterministic_fake_resizer
    ).collect()
    by_id = {r.media_id: r for r in out}
    assert by_id[1].width == 4 and by_id[1].height == 2
    assert len(bytes(by_id[1].payload)) == 8
    assert bytes(by_id[1].payload) == b"abcabcab"
    assert len(bytes(by_id[2].payload)) == 8  # empty payload padded


def test_resize_without_codec_fails_loudly(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    from core_telecoms_etl_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, "image/png", bytearray(b"abc"))],
        "media_id long, mime string, payload binary",
    )
    with pytest.raises(Exception) as e:
        resize_images(df).collect()
    assert "NotImplementedError" in str(e.value) or "image library" in str(
        e.value
    )
