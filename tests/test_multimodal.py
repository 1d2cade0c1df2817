"""Multimodal plumbing tests: schemas, Arrow batch shapes, determinism
of the stub codec, frame-sampling fan-out, native binary metadata."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.operators import multimodal as MM


def media_df(spark, items):
    rows = [
        (i, content, ("image", "png", 4, 4, duration))
        for i, (content, duration) in enumerate(items)
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


class TestBinaryMeta:
    def test_native_md5_and_length(self, spark):
        df = media_df(spark, [(b"hello", None)])
        meta = df.select(MM.binary_meta(F.col("content")).alias("m")).first().m
        assert meta.n_bytes == 5
        assert meta.content_md5 == hashlib.md5(b"hello").hexdigest()


class TestDecode:
    def test_schema_and_determinism(self, spark):
        df = media_df(spark, [(b"imgbytes-a", None), (b"imgbytes-b", None)])
        out1 = {r.media_id: r for r in MM.decode_media(df).collect()}
        out2 = {r.media_id: r for r in MM.decode_media(df).collect()}
        assert set(out1) == {0, 1}
        for mid in out1:
            assert out1[mid].decoder == "stub"  # no codec libs in container
            assert len(out1[mid].features) == MM.FEATURE_DIM
            assert all(0.0 <= f < 1.0 for f in out1[mid].features)
            assert out1[mid].features == out2[mid].features  # deterministic
        assert out1[0].features != out1[1].features  # content-sensitive
        assert out1[0].n_bytes == len(b"imgbytes-a")
        assert 1 <= out1[0].width <= 64 and 1 <= out1[0].height <= 64

    def test_empty_partition_batches(self, spark):
        # mapInPandas must tolerate empty Arrow batches (many partitions,
        # few rows) and emit the declared schema regardless.
        df = media_df(spark, [(b"x", None)]).repartition(8)
        out = MM.decode_media(df)
        assert [f.name for f in out.schema.fields] == [
            "media_id", "decoder", "width", "height", "duration_ms", "n_bytes", "features",
        ]
        assert out.count() == 1


class TestRealCodecs:
    """The stdlib BMP/WAV decode path — real headers, real pixels/samples."""

    def test_bmp_round_trip_decode(self, spark):
        from tomasz_weight_tracker_spark.operators import codecs

        # 4x2 image, top half red, bottom half blue (BGR byte order).
        raw = codecs.make_bmp(4, 2, lambda x, y: (0, 0, 255) if y == 0 else (255, 0, 0))
        df = media_df(spark, [(raw, None)])
        r = MM.decode_media(df).first()
        assert r.decoder == "bmp"
        assert (r.width, r.height) == (4, 2)
        assert r.n_bytes == len(raw)
        # Real channel-mean features: half red + half blue.
        assert r.features[0] == 0.5  # mean R
        assert r.features[1] == 0.0  # mean G
        assert r.features[2] == 0.5  # mean B

    def test_bmp_parser_pixel_order(self):
        from tomasz_weight_tracker_spark.operators import codecs

        raw = codecs.make_bmp(2, 2, lambda x, y: (x * 10, y * 10, 100))
        out = codecs.parse_bmp(raw)
        # Row-major top-down: (x=0,y=0), (1,0), (0,1), (1,1).
        assert out["pixels"] == [(0, 0, 100), (10, 0, 100), (0, 10, 100), (10, 10, 100)]

    def test_wav_decode_duration_and_features(self, spark):
        from tomasz_weight_tracker_spark.operators import codecs

        # 8000 samples at 8 kHz = exactly 1000 ms; square wave at half amplitude.
        samples = [16384 if (i // 4) % 2 == 0 else -16384 for i in range(8000)]
        raw = codecs.make_wav(samples, sample_rate=8000)
        r = MM.decode_media(media_df(spark, [(raw, None)])).first()
        assert r.decoder == "wav"
        assert r.duration_ms == 1000
        assert r.width is None and r.height is None
        assert abs(r.features[0] - 0.5) < 1e-9  # mean |amplitude|
        assert abs(r.features[1] - 0.5) < 1e-9  # RMS of a square wave
        assert abs(r.features[3] - 0.5) < 1e-9  # peak

    def test_corrupt_headers_fall_back_to_stub(self, spark):
        df = media_df(spark, [(b"BMgarbage", None), (b"RIFFjunkWAVE", None)])
        out = MM.decode_media(df).collect()
        assert {r.decoder for r in out} == {"stub"}


class TestFrameSampling:
    def test_fanout_matches_duration(self, spark):
        df = media_df(spark, [(b"video-a", 3500), (b"video-b", 1000)])
        out = MM.sample_frames(df, every_ms=1000).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r.media_id, []).append(r)
        assert len(by_id[0]) == 4  # 0,1000,2000,3000 ms
        assert len(by_id[1]) == 1
        frames = sorted(by_id[0], key=lambda r: r.frame_idx)
        assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000, 3000]
        # Per-frame features differ (the frame index salts the stub).
        assert frames[0].features != frames[1].features

    def test_resize_features(self, spark):
        df = media_df(spark, [(b"img", None)])
        out = MM.decode_media(df).select(
            MM.resize_features(F.col("features"), 3).alias("f")
        ).first()
        assert len(out.f) == 3
