"""Guards for the DECIMAL(18,15) accumulation bound in operators/similarity.py.

The exact-dot accumulator has 3 integer digits; its safety argument
(module docstring) rests on the embeddings being unit-normalized so every
partial sum stays ≪ 10³. Verify that on the fixtures, plus the tree-sum
precision-growth property.
"""

from __future__ import annotations

import duckdb
import numpy as np

from .conftest import SF_DIR


def test_embeddings_unit_normalized():
    con = duckdb.connect()
    norms = con.execute(
        f"""SELECT list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*x))
            FROM '{SF_DIR}/embeddings.parquet'"""
    ).fetchall()
    con.close()
    arr = np.array([n for (n,) in norms])
    # ‖x‖² ≈ 1 ⇒ |dot| ≤ 1, LSH projection ≤ 0.5·√dims·‖x‖ = 4 ≪ 10³
    assert 0.9 < arr.min() and arr.max() < 1.1


def test_tree_sum_depth_keeps_scale():
    # 64 DECIMAL(18,15) terms summed as a balanced tree: precision grows by
    # ~1 per level (depth 6 → ≤ 24+ε digits), never hitting the 38 cap where
    # Spark's allowPrecisionLoss would silently drop the scale.
    depth = int(np.ceil(np.log2(64)))
    assert 18 + depth + 1 < 38


def test_ivf_probe_recall_and_consistency(spark):
    """IVF (probe 2/8 cells) vs brute force on the same 10 queries: recall
    must beat the random-cell floor (n_probe/n_cells = 0.25, minus margin
    for the tiny fixture), and any pair both searches return must carry the
    identical exact-decimal cosine (the rescore path is shared)."""
    from stock_market_big_data_project_spark.plans import QUERIES, load_all_plans

    load_all_plans()
    bf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in QUERIES["embedding_bruteforce_topk"](spark, SF_DIR).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in QUERIES["embedding_ivf_topk"](spark, SF_DIR).collect()
    }
    common = set(bf) & set(ivf)
    assert len(common) / len(bf) >= 0.2
    for pair in common:
        assert bf[pair] == ivf[pair], pair


def test_lsh_near_dup_subset_of_bruteforce(spark):
    """The banded-LSH near-dup pairs must be a strict subset of the exact
    brute-force answer with identical cosines (the rescore is shared), and
    must recover a non-trivial fraction of it on the fixture corpus."""
    from stock_market_big_data_project_spark.plans import (
        LOCAL_QUERIES,
        QUERIES,
        load_all_plans,
    )

    load_all_plans()
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in LOCAL_QUERIES["embedding_near_dup_bruteforce"](
            spark, SF_DIR
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in QUERIES["embedding_near_dup_pairs"](spark, SF_DIR).collect()
    }
    assert set(lsh) <= set(exact)
    assert len(lsh) > 0
    assert len(lsh) / len(exact) >= 0.3  # banded-LSH recall floor, 0.4 thresh
    for pair, cos in lsh.items():
        assert exact[pair] == cos, pair


def test_near_dup_bruteforce_size_gate(spark):
    """The brute-force baseline must refuse a corpus larger than its
    driver-collect gate instead of silently materializing it."""
    import pytest as _pytest

    from stock_market_big_data_project_spark.operators.similarity import (
        near_dup_pairs,
    )
    from stock_market_big_data_project_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    with _pytest.raises(ValueError, match="lsh_near_dup_pairs"):
        near_dup_pairs(emb, max_rows=10)
