"""Multimodal column plumbing (SURVEY.md §7 Phase 5).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The decode/feature-extract step is a Pandas-UDF ``mapInPandas``
stage so the Spark-side plumbing — schema, Arrow binary batching, partition
shape — is real. Codec status (r9 final): REAL, complete, dependency-free
implementations exist for ALL FIVE modality formats — BMP (encode_bmp /
decode_bmp below), PNG (operators/png.py — stdlib zlib + numpy
unfilter), baseline JPEG (operators/jpeg.py — Annex-K tables, Huffman
bitstream, fixed-point exact transforms), WAV/PCM audio
(operators/wav.py), and y4m video (operators/y4m.py). No codec stub
remains; the deterministic-fake stages below are retained as the
minimal plumbing example for adding the next format (schema, Arrow
batching, fused-stage shape), clearly labeled.

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
    """Deterministic placeholder decoder for the GENERIC-MIME plumbing
    demo only — NOT the engine's multimodal decode surface. Real,
    complete, hash-certified codecs exist for all five formats: BMP
    (this module, below), PNG (operators/png.py), baseline JPEG
    (operators/jpeg.py), WAV/PCM (operators/wav.py), y4m video
    (operators/y4m.py) — all driver-certified via
    `multimodal_decode_bundle`. This fake (dims derived from byte
    length, stable and oracle-checkable) exists so the fused
    decode→resize→sample PIPELINE SHAPE can be demonstrated on an
    arbitrary opaque mime without tying the demo to one format; swap it
    for a format dispatch over the real codecs and nothing else changes.
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
    """mapInPandas resize stage (placeholder codec, real plumbing — the
    REAL per-format decoders live in png.py/jpeg.py/wav.py/y4m.py + the
    BMP section below; this generic-mime stage demonstrates the
    plumbing shape only).

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
    """Decode → resize → frame-sample FUSED into ONE mapInPandas pass:
    per input payload, k rows carrying the decode metadata, the
    resized-output fingerprint, and one frame each. The decode step here
    is the `_fake_decode` placeholder (generic-mime demo) — the REAL,
    hash-certified codecs live in operators/png.py, operators/jpeg.py,
    operators/wav.py, operators/y4m.py and the BMP section below
    (driver-certified together via `multimodal_decode_bundle`); only
    this fused demo keeps a placeholder, to stay format-agnostic.

    This is the shape a production multimodal pipeline wants at 100 TB:
    the binary payload is read ONCE per row inside a single Arrow batch
    stage — chaining the three stages as separate operators would either
    re-attach and re-ship the payload per stage or join three outputs on
    doc_id (two shuffles for data that never needed to leave the task).
    Swap the `_fake_decode`/truncation/byte-range placeholders for a
    format dispatch over the real codecs (or PIL/ffmpeg where
    available); schema, batching, and the 1→k UDTF shape stay as-is.
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


# ---------------------------------------------------------------------------
# REAL codec: uncompressed 24-bit BMP (no external libraries needed).
#
# Only the generic-mime fused demo above keeps a placeholder decode; every
# per-format decoder is real (PNG/JPEG/WAV/y4m in their own modules, BMP
# here). BMP's uncompressed BI_RGB layout is fully specified by two
# fixed-size headers + padded BGR rows, so encode/decode here are complete,
# standard-conformant implementations — not fakes. The fixture payloads are REAL BMP
# files whose pixels follow a doc_id-derived integer formula, which lets the
# DuckDB oracle predict the decoded-pixel fingerprint relationally: the
# hash-green query certifies decode(encode(pixels)) == pixels end to end.
# ---------------------------------------------------------------------------

BMP_DECODED_SCHEMA = (
    "doc_id bigint, width int, height int, n_bytes int, pixel_md5 string, "
    "out_width int, out_height int, out_pixel_md5 string"
)


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB, bottom-up rows padded to
    4 bytes, BGR channel order) — the standard Windows DIB layout."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    size = off + len(data)

    def le(v: int, k: int) -> bytes:
        return int(v).to_bytes(k, "little")

    header = (
        b"BM" + le(size, 4) + le(0, 4) + le(off, 4)
        + le(40, 4) + le(w, 4) + le(h, 4) + le(1, 2) + le(24, 2)
        + le(0, 4) + le(len(data), 4) + le(2835, 4) + le(2835, 4)
        + le(0, 4) + le(0, 4)
    )
    return header + data


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24-bit BMP to an (h, w, 3) uint8 RGB array.
    Validates the magic, BI_RGB compression, and 24 bpp; handles row
    padding and bottom-up (positive height) or top-down (negative height)
    row order."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={comp}")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=off
    ).reshape(h, stride)
    arr = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return arr if top_down else arr[::-1]


def _fixture_pixels(doc_id: int):
    """Deterministic fixture image for one doc: dims and every channel
    value are integer formulas of (doc_id, x, y) — the same formulas the
    DuckDB oracle evaluates relationally to predict the decoded pixels."""
    import numpy as np

    w = 8 + doc_id % 9
    h = 8 + (doc_id * 3) % 7
    y, x = np.mgrid[0:h, 0:w]
    r = (doc_id + 7 * x + 13 * y) % 256
    g = (3 * doc_id + x + 11 * y) % 256
    b = (5 * doc_id + 3 * x + y) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def attach_bmp_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real BMP payloads for the fixture ids (mapInPandas encode stage)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_bmp(_fixture_pixels(int(d)))
                        for d in pdf[id_col]
                    ],
                }
            )

    return df.select(id_col).mapInPandas(gen, schema="doc_id bigint, payload binary")


def decode_resize_bmp(df: DataFrame) -> DataFrame:
    """REAL decode + resize in one fused mapInPandas pass: parse the BMP,
    fingerprint the decoded RGB array (md5 of its uppercase row-major
    hex), then 2× nearest-neighbor downsample by numpy striding
    (arr[::2, ::2]) and fingerprint that. The fingerprints make the
    decode bitwise-checkable: the oracle predicts them from the pixel
    formulas without ever parsing a BMP, so a one-byte decoder bug
    breaks the hash."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                c: []
                for c in (
                    "doc_id", "width", "height", "n_bytes", "pixel_md5",
                    "out_width", "out_height", "out_pixel_md5",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode_bmp(bytes(payload))
                h, w, _ = arr.shape
                small = arr[::2, ::2]
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(payload))
                out["pixel_md5"].append(
                    hashlib.md5(arr.tobytes().hex().upper().encode()).hexdigest()
                )
                out["out_width"].append(small.shape[1])
                out["out_height"].append(small.shape[0])
                out["out_pixel_md5"].append(
                    hashlib.md5(
                        small.tobytes().hex().upper().encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=BMP_DECODED_SCHEMA)


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
