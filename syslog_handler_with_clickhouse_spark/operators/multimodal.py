"""Multimodal column plumbing (tier X).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode/feature-extract step runs as Arrow-batched ``mapInPandas`` —
the real 100 TB shape: schema declared up front, work distributed per
input partition, bytes never round-trip through the driver.

The actual media codecs are NOT in this container, so the decode is a
deterministic fake (byte statistics); the Spark-side plumbing — binary
schema, UDF signature, batch iteration — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def as_binary_assets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model documents as binary assets: payload + typed metadata columns."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
    )


def decode_real(payload: bytes) -> bytes:
    """Placeholder for a real media decode (PIL/librosa/ffmpeg are not in
    this container)."""
    raise NotImplementedError("media codecs unavailable in this environment")


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake 'decode': byte count / sum / mean per payload —
    stands in for image resize / audio frame-sample while exercising the
    exact mapInPandas shape a real decoder would use.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n = payloads.map(len).astype("int64")
            s = payloads.map(lambda b: int(sum(b))).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n,
                    "byte_sum": s,
                    "byte_mean": s / n,
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)
