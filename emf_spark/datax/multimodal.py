"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
UDFs.

The decode step itself is STUBBED (image/audio libraries are not in
this container): ``decode_mode='fake'`` produces deterministic
hash-derived features so the Spark-side plumbing — schema, batch
iteration, partition sizing, UDF signatures — is real and tested;
``decode_mode='real'`` raises NotImplementedError at the exact point a
PIL/ffmpeg call would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("frames_sampled", T.IntegerType()),
        # 56-bit md5 payload checksum: lets an external SQL oracle verify
        # the mapInPandas plumbing end to end (DuckDB: CAST('0x' ||
        # substr(md5(text),1,14) AS BIGINT) when payload = encode(text))
        T.StructField("checksum", T.LongType()),
    ]
)

FEATURE_DIM = 16


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-media embedding: bytes ->
    seeded RNG -> unit vector. Replace with a real decoder+encoder."""
    seed = int.from_bytes((payload or b"\x00")[:8].ljust(8, b"\x00"), "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.linalg.norm(v)) or 1.0
    return v / n


def extract_features(
    df: DataFrame, decode_mode: str = "fake", frame_stride_ms: int = 1000
) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    Batch shape: the iterator yields Arrow-sized pandas batches; each
    batch is processed vectorized and yields one output row per input
    row. Partitioning: upstream should repartition by a size-balanced
    key (payload sizes skew); at cluster scale pair with
    ``spark.sql.files.maxPartitionBytes`` so a batch of blobs fits
    executor memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this "
                    "container; wire the decoder here"
                )
            import hashlib

            feats, frames, sums = [], [], []
            for payload, kind, meta in zip(
                pdf["payload"], pdf["kind"], pdf["meta"]
            ):
                feats.append(_fake_feature(payload))
                sums.append(
                    int(hashlib.md5(payload).hexdigest()[:14], 16)
                    if payload is not None
                    else 0
                )
                if kind == "video":
                    dur = (meta or {}).get("duration_ms") or 0
                    frames.append(max(1, int(dur // frame_stride_ms)))
                else:
                    frames.append(1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": feats,
                    "frames_sampled": frames,
                    "checksum": sums,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def fake_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/benches."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, int(rng.integers(64, 512)), dtype=np.uint8))
        rows.append(
            (
                f"m{i:06d}",
                kind,
                payload,
                (
                    int(rng.integers(16, 512)) if kind == "image" else None,
                    int(rng.integers(16, 512)) if kind == "image" else None,
                    int(rng.integers(1000, 20000)) if kind != "image" else None,
                    f"application/x-{kind}",
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents table:
    payload = utf-8 bytes of text, kind cycles image/audio/video by
    doc_id, duration_ms = n_chars * 10 for audio/video. Every derived
    stat (n_bytes, checksum, frames) is reproducible by a SQL oracle on
    the documents table, so the mapInPandas path gets an exact check."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    return docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(kind != "image", (F.col("n_chars") * 10).cast("int")).alias(
                "duration_ms"
            ),
            F.concat(F.lit("application/x-"), kind).alias("mime"),
        ).alias("meta"),
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payload through a mapInPandas stage that
    would call the image library; fake mode annotates the target size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["meta"] = [
                {
                    "width": width,
                    "height": height,
                    "duration_ms": (m or {}).get("duration_ms"),
                    "mime": (m or {}).get("mime"),
                }
                for m in pdf["meta"]
            ]
            yield out

    return df.mapInPandas(run, MEDIA_SCHEMA)
