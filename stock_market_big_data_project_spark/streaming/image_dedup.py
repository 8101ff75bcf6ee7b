"""Streaming incremental IMAGE dedup — the eleventh live-path parity (r9).

Extends the incremental-dedup contract (streaming_near_dup_parity's
MinHash path, r5) to the image modality: each micro-batch of freshly
ingested image payloads is decoded and dHashed (one fused Arrow stage),
then ONLY the delta's band keys probe the at-rest banded hash table
(`operators/dedup.py::incremental_lsh_candidates`, delta_in_full=False so
new-vs-new duplicates are found before the merge), survivors verify with
the exact 64-bit Hamming distance, and the delta's band rows + hashes
append to state. A pair is emitted exactly once — in the batch where its
later member arrives — so the union of emissions equals the from-scratch
batch query (`image_dhash_near_dup`), which is what the shared full-corpus
oracle hash-proves.

At 100 TB this is how a crawl pipeline dedups its daily image append in
O(delta): per-tick work is delta-sized (4 band-bucket probes per new
image), the at-rest table never self-joins again, and on a
(band, band_hash)-bucketed layout the probe is an exchange-free bucketed
equi-join.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import incremental_lsh_candidates
from ..operators.imagehash import attach_near_dup_png_payload, dhash_images

_BITS, _BANDS = 64, 4


def dhash_banded(fp: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, dhash, band, band_hash): the SimHash band split applied to a
    dHash column — 4 disjoint 16-bit prefixes, the pigeonhole-complete
    candidate index for Hamming ≤ 3 (same arithmetic as
    simhash_hamming_pairs; the mask cuts arithmetic-shift sign fill)."""
    width = _BITS // _BANDS
    mask = (1 << width) - 1
    return fp.select(
        id_col,
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("band"),
                        F.shiftright(F.col("dhash"), t * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_hash"),
                    )
                    for t in range(_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "dhash", "bk.band", "bk.band_hash")


def streaming_image_dhash_pairs(
    spark: SparkSession,
    docs: DataFrame,
    n_batches: int = 3,
    max_dist: int = 3,
) -> DataFrame:
    """Replay ``docs`` as ``n_batches`` doc_id-range micro-batches of
    image payloads through the incremental dedup chain; returns the union
    of per-batch emissions, (id_a, id_b, hamming_dist) — localCheckpointed
    so it outlives the temp state dirs."""
    from .ingest import read_documents_stream

    td = tempfile.mkdtemp(prefix="stream_imgdedup_")
    src = f"{td}/src"
    bands_dir = f"{td}/state_bands"
    out_dir = f"{td}/out_pairs"
    try:
        docs.repartitionByRange(n_batches, "doc_id").write.mode(
            "overwrite"
        ).parquet(src)

        def per_batch(batch_df: DataFrame, batch_id: int) -> None:
            fp = dhash_images(attach_near_dup_png_payload(batch_df))
            delta = dhash_banded(fp).localCheckpoint()
            try:
                old = spark.read.parquet(bands_dir)
            except Exception:  # first batch: no at-rest state yet
                old = spark.createDataFrame(
                    [], "doc_id bigint, dhash bigint, band int, band_hash bigint"
                )
            cand = incremental_lsh_candidates(
                old, delta, "doc_id", delta_in_full=False
            )
            hashes = (
                old.select("doc_id", "dhash")
                .unionByName(delta.select("doc_id", "dhash"))
                .distinct()
            )
            ha = hashes.select(
                F.col("doc_id").alias("id_a"), F.col("dhash").alias("_ha")
            )
            hb = hashes.select(
                F.col("doc_id").alias("id_b"), F.col("dhash").alias("_hb")
            )
            dist = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast(
                "int"
            )
            (
                cand.join(ha, "id_a")
                .join(hb, "id_b")
                .withColumn("hamming_dist", dist)
                .filter(F.col("hamming_dist") <= max_dist)
                .select("id_a", "id_b", "hamming_dist")
                .write.mode("append")
                .parquet(out_dir)
            )
            delta.write.mode("append").parquet(bands_dir)

        q = (
            read_documents_stream(spark, src)
            .writeStream.foreachBatch(per_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{td}/_ckpt")
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).localCheckpoint()
    finally:
        shutil.rmtree(td, ignore_errors=True)
