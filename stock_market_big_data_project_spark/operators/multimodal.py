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


RESIZED_SCHEMA = "doc_id bigint, out_width int, out_height int, out_n_bytes int, out_md5 string"


def resize_images(df: DataFrame) -> DataFrame:
    """mapInPandas resize stage (STUB codec, real plumbing).

    Fake 2×-downsample: output dims = decode dims halved, output payload =
    first ⌈n/4⌉ bytes. `out_md5` fingerprints the "resized" payload via its
    hex encoding (uppercase hex is identical across Spark/DuckDB, and
    DuckDB has no BLOB md5 — hashing the hex string keeps the oracle
    expressible). Swap `_fake_decode` + the truncation for PIL's
    `Image.resize`; schema and batching stay as-is.
    """
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_decode)
            out_bytes = pdf["payload"].map(lambda b: b[: (len(b) + 3) // 4])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": [w // 2 for w, _ in dims],
                    "out_height": [h // 2 for _, h in dims],
                    "out_n_bytes": out_bytes.map(len),
                    "out_md5": out_bytes.map(
                        lambda b: hashlib.md5(b.hex().upper().encode()).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_no int, frame_n_bytes int, frame_md5 string"


def sample_frames(df: DataFrame, k: int = 4) -> DataFrame:
    """1→N frame-sampling stage (video STUB): payload split into `k`
    equal byte ranges, frame j = bytes[⌊j·n/k⌋ : ⌊(j+1)·n/k⌋). The
    mapInPandas UDTF shape (one binary row in, k typed rows out) is the
    real contract a frame sampler has at scale — per-batch Python cost,
    bounded memory, no JVM round-trip per frame."""
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, lens, md5s = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for j in range(k):
                    lo, hi = j * n // k, (j + 1) * n // k
                    chunk = payload[lo:hi]
                    ids.append(doc_id)
                    nos.append(j)
                    lens.append(len(chunk))
                    md5s.append(
                        hashlib.md5(chunk.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": nos,
                    "frame_n_bytes": lens,
                    "frame_md5": md5s,
                }
            )

    return df.mapInPandas(frames, schema=FRAMES_SCHEMA)


PIPELINE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes int, width int, height int, "
    "out_width int, out_height int, out_n_bytes int, out_md5 string, "
    "frame_no int, frame_n_bytes int, frame_md5 string"
)


def multimodal_pipeline(df: DataFrame, k: int = 4) -> DataFrame:
    """Decode → resize → frame-sample FUSED into ONE mapInPandas pass
    (STUB codecs, real plumbing): per input payload, k rows carrying the
    decode metadata, the resized-output fingerprint, and one frame each.

    This is the shape a production multimodal pipeline wants at 100 TB:
    the binary payload is read ONCE per row inside a single Arrow batch
    stage — chaining the three stages as separate operators would either
    re-attach and re-ship the payload per stage or join three outputs on
    doc_id (two shuffles for data that never needed to leave the task).
    Swap the `_fake_decode`/truncation/byte-range stubs for PIL/ffmpeg
    calls; schema, batching, and the 1→k UDTF shape stay as-is.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                c: [] for c in (
                    "doc_id", "mime", "n_bytes", "width", "height",
                    "out_width", "out_height", "out_n_bytes", "out_md5",
                    "frame_no", "frame_n_bytes", "frame_md5",
                )
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h = _fake_decode(payload)
                out = payload[: (len(payload) + 3) // 4]
                out_md5 = hashlib.md5(out.hex().upper().encode()).hexdigest()
                n = len(payload)
                for j in range(k):
                    lo, hi = j * n // k, (j + 1) * n // k
                    chunk = payload[lo:hi]
                    rows["doc_id"].append(doc_id)
                    rows["mime"].append(meta["mime"])
                    rows["n_bytes"].append(meta["n_bytes"])
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["out_width"].append(w // 2)
                    rows["out_height"].append(h // 2)
                    rows["out_n_bytes"].append(len(out))
                    rows["out_md5"].append(out_md5)
                    rows["frame_no"].append(j)
                    rows["frame_n_bytes"].append(len(chunk))
                    rows["frame_md5"].append(
                        hashlib.md5(chunk.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=PIPELINE_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, bucket int, frac double"


def byte_histogram_features(df: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Feature-extraction stage — and NOT a stub: a 16-bucket byte
    histogram (bucket = high nibble) computed with one vectorized
    numpy.bincount per document, the batch shape a real embedding model
    would use (payload in, fixed-width feature vector out). Emitted long
    (doc_id, bucket, frac) so the DuckDB oracle can recompute it
    relationally from the hex encoding; frac is exact (integer count /
    integer n as one double division)."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, buckets, fracs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                counts = np.bincount(arr >> 4, minlength=n_buckets)
                n = len(arr)
                for b in range(n_buckets):
                    ids.append(doc_id)
                    buckets.append(b)
                    fracs.append(counts[b] / n if n else 0.0)
            yield pd.DataFrame({"doc_id": ids, "bucket": buckets, "frac": fracs})

    return df.mapInPandas(feats, schema=FEATURES_SCHEMA)
