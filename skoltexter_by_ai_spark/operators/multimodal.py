"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference is text-only; this is the SURVEY §2.4 multimodal
extension for training-data pipelines. Design:

- media is an opaque ``BinaryType`` column plus a typed metadata
  struct — Spark never interprets the bytes except inside explicitly
  vectorized ``mapInPandas`` stages (Arrow batch transfer, no
  row-at-a-time Python);
- ingestion uses the built-in ``binaryFile`` source (pushdown on path
  glob + file pruning; at 100 TB the listing is partitioned by the
  directory layout);
- real codecs (PIL / libav) are NOT available in this container, so
  decode is pluggable: a deterministic pure-numpy "FAKM" container
  codec exercises the full plumbing (schema, batching, partitioning),
  and unknown formats raise ``NotImplementedError`` with a clear
  message — the Spark-side dataflow is identical either way.

Every operator is DataFrame-in / DataFrame-out and keeps the binary
payload out of shuffles where possible (metadata-only projections).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

# --- deterministic FAKM container (test/dev codec) ----------------------------
# Layout: b"FAKM" | kind:1B (i/a/v) | width:u16 | height:u16 | n_frames:u16
#         | sample_rate:u32 | payload bytes.
# image: width*height grayscale u8, row-major. video: n_frames such
# planes. audio: n_frames mono u8 samples at sample_rate.

_MAGIC = b"FAKM"
_HDR = ">c H H H I"
_HDR_LEN = 4 + struct.calcsize(_HDR)


def fakm_encode(
    kind: str, payload: bytes, width: int = 0, height: int = 0, n_frames: int = 0, sample_rate: int = 0
) -> bytes:
    return _MAGIC + struct.pack(_HDR, kind[:1].encode(), width, height, n_frames, sample_rate) + payload


def fakm_decode(data: bytes) -> tuple[str, int, int, int, int, bytes]:
    """-> (kind, width, height, n_frames, sample_rate, payload).

    Raises ``NotImplementedError`` for non-FAKM bytes when no real
    codec is installed — the documented stub boundary.

    >>> fakm_decode(fakm_encode("image", b"px", width=2, height=1))
    ('image', 2, 1, 0, 0, b'px')
    >>> fakm_decode(b"JPEGnotreally")
    Traceback (most recent call last):
        ...
    NotImplementedError: real image/audio codecs (PIL/libav) are not installed in this environment; only the deterministic FAKM container is decodable
    """
    if data[:4] != _MAGIC:
        raise NotImplementedError(
            "real image/audio codecs (PIL/libav) are not installed in this "
            "environment; only the deterministic FAKM container is decodable"
        )
    kind_b, width, height, n_frames, sample_rate = struct.unpack_from(_HDR, data, 4)
    kind = {b"i": "image", b"a": "audio", b"v": "video"}[kind_b]
    return kind, width, height, n_frames, sample_rate, data[_HDR_LEN:]


def read_media_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest a directory of media files via the ``binaryFile`` source.

    media_id = file stem. The source prunes on ``pathGlobFilter``
    before reading bytes, and never shuffles the payload.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+?)(\.[^./]*)?$", 1).alias("media_id"),
        F.col("content").alias("data"),
        F.col("length"),
    )


def decode_meta(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Populate ``kind`` + ``meta`` by decoding headers (mapInPandas).

    Only headers are parsed — payload bytes pass through untouched, so
    the stage is CPU-light and keeps its input partitioning.
    """
    out_schema = StructType(
        [f for f in df.schema.fields]
        + [StructField("kind", StringType()), StructField("meta", MEDIA_META_SCHEMA)]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            kinds, metas = [], []
            for data in pdf[data_col]:
                kind, w, h, n, sr, _ = fakm_decode(bytes(data))
                kinds.append(kind)
                metas.append({"format": "fakm", "width": w, "height": h, "n_frames": n, "sample_rate": sr})
            pdf = pdf.copy()
            pdf["kind"] = kinds
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(gen, out_schema)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("data", BinaryType()),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of FAKM images to ``width`` x ``height``.

    Real per-pixel work, vectorized in numpy per Arrow batch — the
    template for any decode-transform-reencode stage. Non-image rows
    are dropped (filter early, before the expensive stage).
    """

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, datas = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                kind, w, h, n, sr, payload = fakm_decode(bytes(data))
                if kind != "image":
                    continue
                img = np.frombuffer(payload, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                resized = img[np.ix_(ys, xs)]
                ids.append(mid)
                datas.append(fakm_encode("i", resized.tobytes(), width, height))
            yield pd.DataFrame(
                {"media_id": ids, "width": width, "height": height, "data": datas}
            )

    return df.mapInPandas(gen, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Explode FAKM videos into every ``every_n``-th frame.

    One input row fans out to n_frames/every_n rows — mapInPandas
    yields the expanded frame rows per batch; downstream per-frame
    stages then repartition by frame count, not by video count.
    """

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                kind, w, h, n, sr, payload = fakm_decode(bytes(data))
                if kind != "video":
                    continue
                plane = w * h
                for i in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * plane : (i + 1) * plane])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(gen, FRAME_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(df: DataFrame, n_bins: int = 8) -> DataFrame:
    """Per-media feature vector: [mean, std, histogram(n_bins)...] of
    the payload — the stand-in for a real embedding model stage; the
    Spark shape (binary in, fixed-width array<double> out, Arrow
    batches) is exactly what a model-backed encoder uses.
    """

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                kind, w, h, n, sr, payload = fakm_decode(bytes(data))
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                hist = np.histogram(arr, bins=n_bins, range=(0, 256))[0] if arr.size else np.zeros(n_bins)
                feats = [float(arr.mean()) if arr.size else 0.0, float(arr.std()) if arr.size else 0.0]
                feats += [float(x) for x in hist]
                rows.append((mid, kind, len(payload), feats))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "n_bytes", "features"])

    return df.mapInPandas(gen, FEATURE_SCHEMA)
