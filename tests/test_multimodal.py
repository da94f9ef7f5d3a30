"""Multimodal plumbing: binary columns, metadata, stubbed decode."""

import pytest

from pyspark.sql import functions as F

from gliner_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\x89PNG fake image bytes " * 10),
        (1, b"RIFF fake audio bytes " * 100),
        (2, b""),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


class TestMetadata:
    def test_schema_and_values(self, media):
        got = {r.media_id: r for r in media_metadata(media).collect()}
        assert got[0].n_bytes == 220
        assert got[1].n_bytes == 2200
        assert got[2].n_bytes == 0
        assert len(got[0].magic) == 8
        assert got[0].payload_ref.startswith("cas://media/")
        # content-addressing: distinct payloads → distinct refs
        assert len({r.payload_ref for r in got.values()}) == 3


class TestDecode:
    def test_strict_mode_raises_not_implemented(self, media):
        from py4j.protocol import Py4JJavaError

        with pytest.raises(Exception) as ei:
            decode_media(media, strict=True).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, Py4JJavaError
        )

    def test_stub_features_deterministic_and_unit_norm(self, media):
        import math

        a = {r.media_id: r.feature for r in decode_media(media, dim=16).collect()}
        b = {r.media_id: r.feature for r in decode_media(media, dim=16).collect()}
        assert a == b
        for v in a.values():
            assert len(v) == 16
            assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-5)
        # different payloads → different features
        assert a[0] != a[1]


class TestFrameSample:
    def test_frame_shapes(self, media):
        got = frame_sample(media, every_n_bytes=1000, max_frames=8).collect()
        by_id = {}
        for r in got:
            by_id.setdefault(r.media_id, []).append(r)
        # 2200 bytes / 1000 → 3 frames
        assert sorted(r.frame_idx for r in by_id[1]) == [0, 1, 2]
        assert len(by_id[1][0].frame_bytes) == 1000
        # empty payload still yields one (empty) frame row
        assert len(by_id[2]) == 1

    def test_binary_pruned_after_substring(self, media):
        plan = (
            frame_sample(media)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "frame_bytes" in plan
