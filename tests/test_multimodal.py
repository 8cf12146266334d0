"""Multimodal plumbing: binary payloads + metadata, stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from ipes_data_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    media_metadata,
    sniff_media,
)

MEDIA = [
    ("img1", b"\x89PNG\r\n\x1a\n" + b"p" * 100),
    ("img2", b"\xff\xd8\xff\xe0" + b"j" * 100),
    ("aud1", b"ID3\x04" + b"m" * 100),
    ("vid1", b"\x1a\x45\xdf\xa3" + b"v" * 100),
    ("bin1", b"garbage-bytes" * 10),
]


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.createDataFrame(MEDIA, "media_id string, payload binary").cache()


def test_sniff_media():
    assert sniff_media(b"\x89PNGxxxx") == ("image", "png")
    assert sniff_media(b"\xff\xd8\xff\xe1") == ("image", "jpeg")
    assert sniff_media(b"ID3abc") == ("audio", "mp3")
    assert sniff_media(b"\x1a\x45\xdf\xa3zz") == ("video", "mkv_webm")
    assert sniff_media(b"nope") == ("unknown", "unknown")


def test_media_metadata_jvm_side(spark, media_df):
    meta = {r["media_id"]: r for r in
            media_metadata(media_df, "media_id", "payload").collect()}
    assert meta["img1"]["n_bytes"] == 108
    assert meta["img1"]["magic_hex"].startswith("89504E47")
    assert meta["bin1"]["content_md5"] is not None


def test_extract_features_fake_decode(spark, media_df):
    feats = extract_features(media_df, "media_id", "payload", dim=16)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert rows["img1"]["modality"] == "image"
    assert rows["aud1"]["modality"] == "audio"
    assert rows["vid1"]["modality"] == "video"
    assert rows["bin1"]["modality"] == "unknown"
    assert len(rows["img1"]["features"]) == 16
    assert all(0.0 <= v < 1.0 for v in rows["img1"]["features"])
    # deterministic: same payload → same features
    again = {r["media_id"]: r for r in
             extract_features(media_df, "media_id", "payload", dim=16).collect()}
    assert again["img1"]["features"] == rows["img1"]["features"]


def test_extract_features_raise_stub(spark, media_df):
    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_features(
            media_df, "media_id", "payload", decode_stub="raise"
        ).collect()


def test_real_decoder_seam_contract(spark, media_df):
    # the decode_stub seam accepts a real decoder callable: features
    # come from IT (not the fake), signature is (bytes, dim), and a
    # per-payload decoder exception yields an error ROW (features NULL,
    # modality error:<ExcName>) — never a task abort. Defined inside the
    # test so cloudpickle ships it by value, the same constraint a
    # production decoder wrapper satisfies by living in the package.
    def _toy_decoder(payload: bytes, dim: int) -> list[float]:
        assert type(payload) is bytes
        if payload.startswith(b"garbage"):
            raise ValueError("corrupt container")
        return [float(len(payload))] * dim

    out = {
        r["media_id"]: r
        for r in extract_features(
            media_df, "media_id", "payload", dim=4, decode_stub=_toy_decoder
        ).collect()
    }
    assert len(out) == len(MEDIA)  # the corrupt row did NOT kill the job
    assert out["img1"]["features"] == [108.0] * 4  # decoder's output, dim=4
    assert out["img1"]["modality"] == "image"  # sniff still JVM-input-side
    assert out["bin1"]["features"] is None
    assert out["bin1"]["modality"] == "error:ValueError"
    ok = [m for m, r in out.items() if r["features"] is not None]
    assert sorted(ok) == ["aud1", "img1", "img2", "vid1"]


def test_real_decoder_bad_dim_becomes_error_row(spark, media_df):
    # a decoder returning the WRONG vector length must not ship a
    # ragged array<float> column silently — it routes through the same
    # error-row path as a decode exception, tagged error:BadDim
    def _short_decoder(payload: bytes, dim: int) -> list[float]:
        if payload.startswith(b"garbage"):
            raise ValueError("corrupt container")
        if payload.startswith(b"\x89PNG"):
            return [1.0] * (dim - 1)  # wrong length
        return [float(len(payload))] * dim

    out = {
        r["media_id"]: r
        for r in extract_features(
            media_df, "media_id", "payload", dim=4, decode_stub=_short_decoder
        ).collect()
    }
    assert len(out) == len(MEDIA)  # nothing aborted the task
    png_ids = [m for m, r in out.items() if r["modality"] == "error:BadDim"]
    assert png_ids  # at least one PNG payload hit the wrong-length path
    for m in png_ids:
        assert out[m]["features"] is None
    ok = [r for r in out.values() if r["features"] is not None]
    assert all(len(r["features"]) == 4 for r in ok)


def test_frame_sample_plan(spark, media_df):
    plan = frame_sample_plan(media_df, "media_id", "payload", n_frames=4)
    assert plan.count() == 4 * len(MEDIA)
    vid = plan.filter(F.col("media_id") == "vid1").collect()
    assert sorted(r["frame_idx"] for r in vid) == [0, 1, 2, 3]
