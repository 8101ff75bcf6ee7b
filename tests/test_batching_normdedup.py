"""Behavioral tests for the round-8 pipeline additions: normalized-key
near-exact dedup (planted case/punctuation variants collapse into one
group) and length-bucketed batch construction (padding waste is bounded
by the bucket width; membership is deterministic)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from stock_market_big_data_project_spark.plans import get_query

SF_DIR = "/root/testdata/sf0.001"


def _write_docs(spark, rows, td):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(f"{td}/documents.parquet")
    return td


def test_normalized_dedup_collapses_planted_variants(spark, tmp_path):
    base = "The quick brown fox jumps over the lazy dog"
    rows = [
        (1, base, "a"),
        (2, base.upper(), "a"),                    # recased
        (3, "  the QUICK   brown fox—jumps over, the lazy dog!! ", "b"),
        (4, "an unrelated document entirely", "b"),
        (5, "another distinct doc", "a"),
    ]
    td = _write_docs(spark, rows, str(tmp_path))
    got = {
        r.kept_id: r
        for r in get_query("dedup_normalized_exact")(spark, td).collect()
    }
    grp = got[1]  # min doc_id of the variant group
    assert grp.n_copies == 3
    assert grp.n_raw_variants == 3  # all three raw texts differ
    assert got[4].n_copies == 1 and got[5].n_copies == 1
    # plain exact dedup does NOT collapse them — the pass adds real recall
    exact = get_query("dedup_exact_documents")(spark, td).collect()
    assert all(r.n_copies == 1 for r in exact)


def test_normalized_dedup_subsumes_exact(spark):
    """On the real fixture: every exact-dup group is inside a normalized
    group, so normalized groups can never outnumber exact groups."""
    n_exact = get_query("dedup_exact_documents")(spark, SF_DIR).count()
    n_norm = get_query("dedup_normalized_exact")(spark, SF_DIR).count()
    assert n_norm <= n_exact


def test_length_bucketed_batches_properties(spark):
    pdf = get_query("length_bucketed_batches")(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    # batch size respected
    assert (pdf["n_docs"] <= 8).all() and (pdf["n_docs"] >= 1).all()
    # padding waste per doc is bounded by the bucket width for every
    # bucket below the open-ended top one: max_len - min_len < 32
    closed = pdf[pdf["bucket"] < 7]
    waste_per_doc = closed["pad_tokens"] / closed["n_docs"]
    assert (waste_per_doc < 32).all()
    # pad accounting is internally consistent
    assert (
        pdf["pad_tokens"] == pdf["n_docs"] * pdf["max_len"] - pdf["sum_len"]
    ).all()
    # batch ids are dense 0..k per (bucket, shard)
    for (_b, _s), grp in pdf.groupby(["bucket", "shard"]):
        ids = sorted(grp["batch_id"])
        assert ids == list(range(len(ids)))
    # determinism: a rerun reproduces identical membership
    pdf2 = get_query("length_bucketed_batches")(spark, SF_DIR).toPandas()
    key = ["bucket", "shard", "batch_id"]
    m1 = pdf.sort_values(key)["members_md5"].to_list()
    m2 = pdf2.sort_values(key)["members_md5"].to_list()
    assert m1 == m2


def test_length_bucketing_beats_random_batching(spark):
    """The economics claim itself: bucketed batches waste fewer pad
    tokens than seeded random batches of the same size on the same
    corpus (computed from the same token counts, pandas-side)."""
    pdf = get_query("length_bucketed_batches")(spark, SF_DIR).toPandas()
    bucketed_waste = float(pdf["pad_tokens"].sum())
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    lens = (
        docs["text"].fillna("").str.split().map(len).pipe(lambda s: s[s > 0])
    )
    import numpy as np

    rng = np.random.default_rng(0)
    arr = lens.to_numpy()
    rng.shuffle(arr)
    rand_waste = 0
    for i in range(0, len(arr), 8):
        chunk = arr[i : i + 8]
        rand_waste += int(chunk.max()) * len(chunk) - int(chunk.sum())
    assert bucketed_waste < 0.5 * rand_waste, (bucketed_waste, rand_waste)
