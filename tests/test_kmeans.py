"""numpy-differential tests for the distributed k-means trainer
(operators/kmeans.py) — the tolerance-based pattern of the trainer
operators (SURVEY.md §5.1): float means are partition-order-sensitive at
the 1e-16 level, so the check is agreement with a single-process numpy
implementation of the same algorithm (same deterministic md5 init, same
argmin tie-break, same empty-cell rule) within tight tolerances, plus the
algorithmic invariant (inertia never increases across iterations)."""

from __future__ import annotations

import numpy as np
import pytest

from stock_market_big_data_project_spark.operators._planes import hyperplanes
from stock_market_big_data_project_spark.operators.kmeans import (
    assign_cells,
    kmeans_train,
)
from stock_market_big_data_project_spark.sources.tables import load_table

from .conftest import SF_DIR

K, N_ITER, D = 8, 5, 64


@pytest.fixture(scope="module")
def X(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    mat = np.array([np.array(e, dtype=np.float64) for e in pdf["embedding"]])
    return ids, mat


def _ref_kmeans(mat: np.ndarray):
    cents = np.array(hyperplanes(K, D, prefix="ivf:"))
    inertias = []
    for _ in range(N_ITER):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties → lowest index, same as Spark
        inertias.append(d2[np.arange(len(mat)), assign].sum())
        for c in range(K):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    inertias.append(d2[np.arange(len(mat)), assign].sum())
    return cents, assign, inertias


def test_centroids_and_assignment_match_numpy(spark, X):
    ids, mat = X
    emb = load_table(spark, SF_DIR, "embeddings")
    cents, summary = kmeans_train(emb, k=K, n_iter=N_ITER)
    ref_cents, ref_assign, _ = _ref_kmeans(mat)
    # mean updates differ only by float summation order → tight atol
    assert np.allclose(np.array(cents), ref_cents, atol=1e-9)
    got = {
        int(r.vec_id): int(r.cell)
        for r in assign_cells(emb, cents).collect()
    }
    agree = np.mean([got[int(i)] == a for i, a in zip(ids, ref_assign)])
    assert agree == 1.0, agree
    sizes = {int(r.cell): int(r.size) for r in summary.collect()}
    ref_sizes = dict(zip(*np.unique(ref_assign, return_counts=True)))
    assert sizes == {int(k): int(v) for k, v in ref_sizes.items()}


def test_inertia_never_increases(X):
    _, _, inertias = _ref_kmeans(X[1])
    assert all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:])), inertias


def test_training_improves_on_md5_init(spark, X):
    ids, mat = X
    emb = load_table(spark, SF_DIR, "embeddings")
    cents, summary = kmeans_train(emb, k=K, n_iter=N_ITER)
    init = [tuple(c) for c in hyperplanes(K, D, prefix="ivf:")]
    trained = sum(r.inertia for r in summary.collect())
    untrained = (
        assign_cells(emb, init)
        .agg({"dist2": "sum"})
        .collect()[0][0]
    )
    assert trained < untrained
