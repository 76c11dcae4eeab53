"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference operators (BASELINE.json north star).  The design:

- a multimodal asset is a row with an opaque ``binary`` payload column and
  a typed metadata struct (``mime``, ``width``/``height`` or
  ``sample_rate``/``duration``, ``size_bytes``, ``sha256``) — metadata is
  queryable/partitionable without touching bytes;
- decode / feature-extract / resize / frame-sample run as **Arrow-batched
  ``mapInPandas``** stages: each Python worker sees a pandas batch of
  (id, payload) and returns a batch of features.  The Spark-side plumbing
  (schemas, batch shapes, partition sizing) is real and tested; the codec
  call itself is STUBBED — image/audio libraries are not in this
  container — behind ``_decode_image_stub``, which raises
  ``NotImplementedError`` unless ``deterministic_fake=True`` produces a
  seeded fake feature vector (tests use the fake).

At 100 TB: payloads dominate I/O — keep them in their own parquet column
chunk (they are), repartition by target batch size before the UDF stage
(``bytes_per_partition``), and never collect payloads to the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def attach_metadata(df: DataFrame, payload_col: str = "payload", mime: str = "application/octet-stream") -> DataFrame:
    """Compute the queryable metadata struct JVM-side (no decode needed)."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(p).cast("long").alias("size_bytes"),
            F.sha2(p, 256).alias("sha256"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
        ),
    )


def _decode_image_stub(payload: bytes, deterministic_fake: bool) -> list:
    """STUB: the real implementation calls PIL/libvips.  Not available in
    this container; the fake derives a seeded 8-dim feature vector from
    the payload hash so tests are deterministic end-to-end."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "environment; pass deterministic_fake=True for plumbing tests"
        )
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


FEATURE_SCHEMA = "id long, feature array<double>"


def extract_image_features(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    deterministic_fake: bool = False,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches).  The UDF
    signature, output schema, and batch shaping are production-real; only
    the codec is stubbed."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            feats = [
                _decode_image_stub(p, deterministic_fake)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "feature": feats})

    narrow = df.select(F.col(id_col).alias(id_col), F.col(payload_col))
    return narrow.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_image(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    width: int = 64,
    height: int = 64,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize plumbing: binary in -> binary out with updated dimension
    metadata, Arrow-batched (``mapInPandas``).  The codec is stubbed
    like the decoder; the fake 'resized' payload is the sha256 digest of
    ``payload || ':WxH'`` — deterministic, size-independent, and
    reproducible as plain SQL (``sha256(text || ':WxH')``) for the
    cross-engine oracle.  Schema: (id, payload binary, width, height)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        suffix = f":{width}x{height}".encode()
        out_payloads = []
        ids = []
        for pdf in batches:
            for _, row in pdf.iterrows():
                if not deterministic_fake:
                    raise NotImplementedError(
                        "image resizing requires an imaging library not "
                        "present in this environment; pass "
                        "deterministic_fake=True for plumbing tests"
                    )
                ids.append(int(row[id_col]))
                out_payloads.append(
                    hashlib.sha256((row[payload_col] or b"") + suffix).digest()
                )
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "payload": out_payloads,
                    "width": pd.Series([width] * len(ids), dtype="int32"),
                    "height": pd.Series([height] * len(ids), dtype="int32"),
                }
            )
            ids, out_payloads = [], []

    return df.select(F.col(id_col).alias(id_col), F.col(payload_col)).mapInPandas(
        run, schema="id long, payload binary, width int, height int"
    )


def extract_audio_features(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    sample_rate: int = 16_000,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Audio featurization plumbing: (id, payload) -> (id, sample_rate,
    duration_s, feature).  Real pipelines decode PCM and run an MFCC/
    embedding model here; the codec is stubbed.  The fake derives
    ``duration_s = size_bytes / (2 * sample_rate)`` (16-bit mono PCM
    accounting — pure arithmetic, oracle-expressible) and the same
    seeded sha256 feature vector as the image stub."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "audio decoding requires an audio library not present "
                    "in this environment; pass deterministic_fake=True for "
                    "plumbing tests"
                )
            payloads = [p or b"" for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "sample_rate": pd.Series(
                        [sample_rate] * len(payloads), dtype="int32"
                    ),
                    "duration_s": [
                        len(p) / (2.0 * sample_rate) for p in payloads
                    ],
                    "feature": [
                        _decode_image_stub(p, True) for p in payloads
                    ],
                }
            )

    return df.select(F.col(id_col).alias(id_col), F.col(payload_col)).mapInPandas(
        run,
        schema="id long, sample_rate int, duration_s double, feature array<double>",
    )


def sample_video_frames(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    every_n: int = 10,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Frame sampling plumbing: one input row -> many frame rows
    (mapInPandas with row fan-out).  Codec stubbed as above; the fake
    yields 3 'frames' per asset keyed (id, frame_idx)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, feats = [], [], []
            for _, row in pdf.iterrows():
                if not deterministic_fake:
                    raise NotImplementedError("video decoding not available; use deterministic_fake")
                for fi in range(3):
                    ids.append(int(row[id_col]))
                    idxs.append(fi * every_n)
                    # printable frame marker (":<i>") rather than a raw
                    # byte: keeps the fake recipe expressible as plain
                    # VARCHAR ops in the cross-engine oracle
                    feats.append(_decode_image_stub((row[payload_col] or b"") + f":{fi}".encode(), True))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "feature": feats})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema="id long, frame_idx int, feature array<double>"
    )
