"""Multimodal column plumbing (SURVEY.md §7 Phase 5).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The decode/feature-extract step is a Pandas-UDF ``mapInPandas``
stage so the Spark-side plumbing — schema, Arrow binary batching, partition
shape — is real; the actual codec is STUBBED (no image/audio libraries in
this container) with a deterministic fake derived from the payload bytes,
clearly marked below.

At 100 TB: binary payloads ride their own column (parquet keeps them out of
unrelated scans thanks to column pruning), metadata predicates push down,
and the decode stage is an embarrassingly-parallel mapInPandas over
size-bounded Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, mime string, n_bytes int, width int, height int"
)


def attach_binary_payload(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Manufacture the multimodal shape from the documents fixture: the utf-8
    bytes of ``text`` stand in for an encoded image; metadata is a typed
    struct. Real pipelines read (path, bytes, metadata) from parquet the
    same way."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake for the image decoder.

    A real implementation would `PIL.Image.open(BytesIO(payload))`; that
    library is not in this container, so dimensions derive from the byte
    length (stable, oracle-checkable). Swap this function for the real
    codec; nothing else changes.
    """
    n = len(payload)
    return 16 + n % 64, 16 + (n * 7) % 64


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode stage: Arrow-batched binary in, typed features out.

    The iterator-of-batches shape is the real contract a codec UDF has at
    scale (bounded memory per batch, no per-row Python overhead).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)
