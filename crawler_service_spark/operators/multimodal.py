"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video content rides through the engine as binary columns with a
``kind`` discriminator; per-modality processing runs as vectorized
``mapInPandas`` stages (Arrow batches, numpy over the whole batch).

The container has no image/audio codecs, so the *codec* step is stubbed behind
``decode_media`` (clearly-marked NotImplementedError unless
``fake_decode=True``), but everything Spark-side is real and tested: schema,
partitioning, UDF signatures, batch shapes, and the byte-level feature
extractor (byte histograms need no codec — they run for real).

At 100 TB the rule encoded here: binary payloads never pass through a shuffle
unless the operator needs them post-shuffle — features are extracted first
(map-side), then the (small) feature rows shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean_millis", T.LongType()),   # mean byte value * 1000
        T.StructField("byte_entropy_millis", T.LongType()),  # Shannon entropy * 1000
        T.StructField("histogram16", T.ArrayType(T.LongType())),
    ]
)


def extract_byte_features(media: DataFrame) -> DataFrame:
    """Real (codec-free) per-payload features: size, mean byte, entropy,
    16-bin byte histogram. Vectorized per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                n = len(arr)
                if n:
                    hist = np.bincount(arr >> 4, minlength=16).astype(np.int64)
                    p = hist[hist > 0] / n
                    entropy = float(-(p * np.log2(p)).sum())
                    mean = float(arr.mean())
                else:
                    hist = np.zeros(16, dtype=np.int64)
                    entropy = 0.0
                    mean = 0.0
                rows.append(
                    (int(mid), kind, n, int(round(mean * 1000)),
                     int(round(entropy * 1000)), hist.tolist())
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("frames", T.IntegerType()),
    ]
)


def decode_media(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """STUB: codec decode (PIL/ffmpeg are not in this container).

    With ``fake_decode=True`` a deterministic stand-in derives dimensions from
    the payload bytes so the full Spark plumbing (schema, batching,
    partition behavior) is exercised and tested; otherwise raises
    NotImplementedError at plan-build time, clearly marked.
    """
    if not fake_decode:
        raise NotImplementedError(
            "media codecs unavailable in this environment; pass fake_decode=True "
            "to exercise the pipeline with the deterministic stand-in decoder"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = payload or b"\x00\x00"
                w = 16 + (b[0] % 64) * 16
                h = 16 + (b[-1] % 64) * 16
                ch = 3 if kind == "image" else 1
                frames = 1 if kind == "image" else 1 + len(b) // 1024
                rows.append((int(mid), kind, w, h, ch, frames))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """"Frame sampling" over binary payloads: one output row per sampled
    offset (UDTF shape: 1 row -> many). Deterministic; exercises the
    explode-via-mapInPandas pattern a real video pipeline uses."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("frame_hash", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload or b""
                for idx, off in enumerate(range(0, len(b), every_n_bytes)):
                    window = b[off : off + every_n_bytes]
                    rows.append(
                        (int(mid), idx, off, int(np.frombuffer(
                            window.ljust(8, b"\x00")[:8], dtype="<i8")[0]))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(run, schema=schema)
