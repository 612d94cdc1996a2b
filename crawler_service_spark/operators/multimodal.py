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

from ..plans.partitioning import widen

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
        # mean byte value * 1000 as integer floor division (1000*sum DIV n):
        # exact, so the DuckDB oracle matches bit-for-bit
        T.StructField("byte_mean_millis", T.LongType()),
        T.StructField("byte_entropy_millis", T.LongType()),  # Shannon entropy * 1000
    ]
    # 16-bin nibble histogram as 16 scalar columns (hashable + oracle-able,
    # unlike an array column, which the driver's row canonicalizer can't sort)
    + [T.StructField(f"hist_{i}", T.LongType()) for i in range(16)]
)


def extract_byte_features(media: DataFrame) -> DataFrame:
    """Real (codec-free) per-payload features: size, integer mean-byte,
    entropy, 16-bin byte histogram (one column per bin).

    Fully vectorized over the Arrow batch: all payloads are concatenated into
    ONE uint8 buffer, per-row offsets map bytes back to rows, and both the
    byte sums and the (rows x 16) histogram come from single ``np.bincount``
    calls — no per-row numpy work.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0:
                continue
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=nrows)
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(nrows, dtype=np.int64), lens)
            # exact integer byte sums (float64 accumulation is exact < 2^53)
            byte_sum = np.bincount(row_idx, weights=buf, minlength=nrows).astype(np.int64)
            flat = row_idx * 16 + (buf >> 4).astype(np.int64)
            hist = np.bincount(flat, minlength=nrows * 16).reshape(nrows, 16).astype(np.int64)
            safe_n = np.maximum(lens, 1)
            mean_millis = (1000 * byte_sum) // safe_n
            p = hist / safe_n[:, None]
            with np.errstate(divide="ignore", invalid="ignore"):
                plogp = np.where(hist > 0, p * np.log2(p, where=hist > 0), 0.0)
            entropy_millis = np.rint(-plogp.sum(axis=1) * 1000).astype(np.int64)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64").to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": lens,
                    "byte_mean_millis": mean_millis,
                    "byte_entropy_millis": entropy_millis,
                }
            )
            for i in range(16):
                out[f"hist_{i}"] = hist[:, i]
            yield out

    return widen(media).mapInPandas(run, schema=FEATURE_SCHEMA)


def _gather_dims(pdf: pd.DataFrame):
    """Shared batch prologue of the stand-in decoder/resizer: concatenate all
    payloads into one buffer (empty/None rows fall back to b"\\x00\\x00"),
    derive per-row lens/starts, and the stand-in width/height from the first
    and last payload bytes — two gathers, no per-row Python arithmetic."""
    nrows = len(pdf)
    payloads = [p if p else b"\x00\x00" for p in pdf["payload"]]
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=nrows)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    w = 16 + (buf[starts].astype(np.int64) % 64) * 16
    h = 16 + (buf[starts + lens - 1].astype(np.int64) % 64) * 16
    return lens, buf, starts, w, h


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
            nrows = len(pdf)
            if nrows == 0:
                continue
            # vectorized like extract_byte_features — the template a real
            # codec drop-in should follow (decode headers batch-wise, never
            # loop rows in Python)
            lens, _buf, _starts, w, h = _gather_dims(pdf)
            is_image = (pdf["kind"] == "image").to_numpy()
            ch = np.where(is_image, 3, 1).astype(np.int32)
            frames = np.where(is_image, 1, 1 + lens // 1024).astype(np.int32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64").to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "channels": ch,
                    "frames": frames,
                }
            )

    return widen(media).mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(
    media: DataFrame, target_w: int, target_h: int, fake_decode: bool = False
) -> DataFrame:
    """STUB-gated resize (no image codecs in this container; a real deploy
    swaps the body for PIL/ffmpeg).

    The deterministic stand-in keeps ALL the Spark-side contract real —
    schema, Arrow batching, output payload sizing: source dims come from the
    same fake decoder as ``decode_media`` and the payload is stride-
    subsampled to ~(target area / source area) of its bytes, so downstream
    operators see size-reduced binaries exactly as they would from a real
    resampler.
    """
    if not fake_decode:
        raise NotImplementedError(
            "media codecs unavailable in this environment; pass fake_decode=True "
            "to exercise the pipeline with the deterministic stand-in resizer"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0:
                continue
            # vectorized with the gather/stride technique of sample_frames:
            # dims from two gathers on the shared buffer, every output byte
            # position from one arange — the only per-row step left is
            # slicing the contiguous result into per-row bytes objects
            # (which any real encoder also pays when materializing outputs)
            lens, buf, starts, w, h = _gather_dims(pdf)
            # integer round-half-up area ratio: deterministic AND
            # SQL-expressible (float round() ties differ across engines)
            target = target_w * target_h
            stride = np.maximum(1, (w * h + target // 2) // target)
            n_out = -(-lens // stride)  # ceil(len / stride) == len(b[::stride])
            total = int(n_out.sum())
            row_of = np.repeat(np.arange(nrows, dtype=np.int64), n_out)
            within = (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(n_out)[:-1]]), n_out)
            )
            pos = starts[row_of] + within * stride[row_of]
            flat = buf[pos].tobytes()
            bounds = np.concatenate([[0], np.cumsum(n_out)])
            outs = [flat[bounds[i] : bounds[i + 1]] for i in range(nrows)]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64").to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "width": np.full(nrows, target_w, dtype=np.int32),
                    "height": np.full(nrows, target_h, dtype=np.int32),
                    "payload": outs,
                    "n_bytes": n_out,
                }
            )

    return widen(media).mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """"Frame sampling" over binary payloads: one output row per sampled
    offset (UDTF shape: 1 row -> many). Deterministic; exercises the
    explode-via-mapInPandas pattern a real video pipeline uses.

    Fully vectorized over the Arrow batch (same repeat/arange technique as
    ``extract_byte_features``): payloads concatenate into ONE buffer, frame
    offsets come from a single arange over the exploded row index, and every
    frame's 8-byte little-endian hash is one (frames x 8) gather + uint64
    dot product — no per-row Python.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("frame_hash", T.LongType()),
        ]
    )
    cols = [f.name for f in schema.fields]
    every = every_n_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0:
                continue
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=nrows)
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            n_frames = -(-lens // every)  # ceil; 0 frames for empty payloads
            total = int(n_frames.sum())
            if total == 0:
                yield pd.DataFrame({c: [] for c in cols}).astype(
                    {"media_id": "int64", "frame_idx": "int32",
                     "offset": "int64", "frame_hash": "int64"}
                )
                continue
            row_of = np.repeat(np.arange(nrows, dtype=np.int64), n_frames)
            frame_idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(n_frames)[:-1]]), n_frames)
            )
            offset = frame_idx * every
            # 8-byte little-endian window hash, zero-padded past payload end:
            # one (total x 8) gather from the shared buffer + uint64 dot
            # (unsigned overflow wraps — exactly int64 wraparound semantics)
            pos = (starts[row_of] + offset)[:, None] + np.arange(8, dtype=np.int64)
            valid = pos < (starts[row_of] + lens[row_of])[:, None]
            vals = np.where(
                valid, buf[np.minimum(pos, max(len(buf) - 1, 0))], 0
            ).astype(np.uint64)
            weights = (np.uint64(256) ** np.arange(8, dtype=np.uint64))
            frame_hash = (vals * weights).sum(axis=1, dtype=np.uint64).view(np.int64)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64").to_numpy()[row_of],
                    "frame_idx": frame_idx.astype("int32"),
                    "offset": offset,
                    "frame_hash": frame_hash,
                }
            )

    return widen(media).mapInPandas(run, schema=schema)
