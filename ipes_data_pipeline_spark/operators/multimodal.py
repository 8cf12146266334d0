"""Multimodal column operators: image / audio / video as opaque binary.

Model (SURVEY scope note): media travels as a ``binary`` payload column
plus typed metadata (modality, width/height, sample rate, duration).
The Spark-side plumbing — schemas, Arrow-batched UDF signatures, batch
shapes, partition spreading — is real and tested; the codec calls
themselves are STUBS (this container has no image/audio libraries):

- ``decode_stub='fake'`` produces deterministic fake features (pure
  function of the payload bytes) so pipelines are testable end-to-end;
- ``decode_stub='raise'`` raises NotImplementedError at the exact point
  a real decoder (PIL / librosa / pyav) would be wired in.

Design for 100 TB of media:

- payloads never hit the driver: all work in ``mapInPandas`` over
  Arrow record batches;
- ``spread()`` before decode: media tables are few-rows-per-file and
  decode is CPU-bound, the classic under-parallel hot stage;
- feature outputs are fixed-width ``array<float>`` columns → parquet-
  friendly, join-able with the similarity-search operators
  (operators/similarity.py) for embedding dedup.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.util import spread

MEDIA_META_DDL = (
    "media_id string, modality string, n_bytes long, magic_hex string"
)

#: magic bytes → (modality, container) for common media containers
_MAGIC = [
    (b"\x89PNG", "image", "png"),
    (b"\xff\xd8\xff", "image", "jpeg"),
    (b"GIF8", "image", "gif"),
    (b"RIFF", "audio", "wav_or_avi"),
    (b"ID3", "audio", "mp3"),
    (b"\x00\x00\x00\x18ftyp", "video", "mp4"),
    (b"\x00\x00\x00\x20ftyp", "video", "mp4"),
    (b"\x1a\x45\xdf\xa3", "video", "mkv_webm"),
]


def sniff_media(payload: bytes) -> tuple[str, str]:
    for magic, modality, container in _MAGIC:
        if payload[: len(magic)] == magic:
            return modality, container
    return "unknown", "unknown"


def media_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Typed metadata columns from an opaque binary column — pure column
    expressions (JVM-side), no decode needed."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.octet_length(p).cast("long").alias("n_bytes"),
        F.hex(F.substring(p, 1, 8)).alias("magic_hex"),
        F.md5(p).alias("content_md5"),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake feature vector: bytes of sha256(payload),
    cycled to `dim` and scaled to [0,1). Stands in for a real encoder."""
    h = hashlib.sha256(payload).digest()
    return [h[i % len(h)] / 256.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    dim: int = 32,
    decode_stub: str | Callable[[bytes, int], list[float]] = "fake",
) -> DataFrame:
    """(id, modality, features array<float>) via Arrow-batched decode.

    ``decode_stub`` is the codec wiring point, three settings:

    - ``'fake'`` — deterministic sha256-derived features (testable
      end-to-end without media libs);
    - ``'raise'`` — NotImplementedError at the exact call site a real
      decoder goes;
    - a callable ``(payload: bytes, dim: int) -> list[float]`` — a REAL
      decoder (PIL/librosa/pyav wrapper). It must pickle to executors
      (top-level function or plain closure). A per-payload decoder
      exception yields an ERROR ROW (features NULL, modality
      ``error:<ExcName>``) instead of aborting the task — one corrupt
      file cannot fail a 100 TB decode job, exactly the
      ``download_documents`` failure-row contract. The seam's
      signature, Arrow batching, and error-row path are pinned by
      ``tests/test_multimodal.py::test_real_decoder_seam_contract``.

    The batch shape (one Arrow batch in, one out, no row-at-a-time
    Python), schema, and partition spreading are what production needs.
    """
    src = spread(df).select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )
    decoder = None if isinstance(decode_stub, str) else decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, modalities, feats = [], [], []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload)
                modality, _ = sniff_media(payload)
                if decoder is not None:
                    try:
                        vec = [float(x) for x in decoder(payload, dim)]
                        if len(vec) != dim:
                            # a wrong-length vector must not ship a
                            # ragged array<float> column silently —
                            # same error-row path as a decode failure
                            modality, vec = "error:BadDim", None
                    except Exception as e:  # error row, not task abort
                        modality, vec = f"error:{type(e).__name__}", None
                elif decode_stub == "raise":
                    raise NotImplementedError(
                        "wire a real decoder here (PIL/librosa/pyav); "
                        "this container ships none"
                    )
                else:
                    vec = _fake_features(payload, dim)
                ids.append(row.media_id)
                modalities.append(modality)
                feats.append(vec)
            yield pd.DataFrame(
                {"media_id": ids, "modality": modalities, "features": feats}
            )

    return src.mapInPandas(
        run, schema="media_id string, modality string, features array<float>"
    )


def frame_sample_plan(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    n_frames: int = 8,
) -> DataFrame:
    """Explode each video into (media_id, frame_idx) work units — the
    shuffle-able task list a real frame extractor maps over. Sampling
    uniformly by index keeps the plan deterministic; the decode itself
    is the stubbed step."""
    return df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    ).select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    )
