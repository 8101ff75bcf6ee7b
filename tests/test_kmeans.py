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


# --- the decimal-exact Lloyd tier (r9) ---------------------------------------


def _q15(x: float):
    """Spark's double→decimal(18,15) cast: shortest-repr, HALF_UP."""
    from decimal import ROUND_HALF_UP, Decimal

    return Decimal(repr(float(x))).quantize(
        Decimal("1e-15"), rounding=ROUND_HALF_UP
    )


def _round9(x: float) -> float:
    """F.round(col, 9) / DuckDB round(x, 9): HALF_UP at 9dp."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("1e-9"), rounding=ROUND_HALF_UP
        )
    )


def _ref_kmeans_exact(mat: np.ndarray):
    """Pure-Python replication of kmeans_train_exact's arithmetic
    contract: exact decimal distance sums, argmin ties → lowest cell,
    exact decimal sums → one double division → 9dp HALF_UP means,
    empty-cell carry."""
    cents = [list(c) for c in hyperplanes(K, D, prefix="ivf:")]
    for _ in range(N_ITER):
        assign = []
        for row in mat:
            dists = [
                sum(_q15((row[d] - cents[c][d]) * (row[d] - cents[c][d]))
                    for d in range(D))
                for c in range(K)
            ]
            assign.append(min(range(K), key=lambda c: (dists[c], c)))
        for c in range(K):
            members = [i for i, a in enumerate(assign) if a == c]
            if members:
                for d in range(D):
                    s = sum(_q15(mat[i][d]) for i in members)
                    cents[c][d] = _round9(float(s) / len(members))
    # final assignment + summary
    sizes: dict[int, int] = {}
    inert: dict[int, object] = {}
    for row in mat:
        dists = [
            sum(_q15((row[d] - cents[c][d]) * (row[d] - cents[c][d]))
                for d in range(D))
            for c in range(K)
        ]
        a = min(range(K), key=lambda c: (dists[c], c))
        sizes[a] = sizes.get(a, 0) + 1
        inert[a] = inert.get(a, 0) + dists[a]
    summary = {}
    for c in sizes:
        norm = sum(_q15(cents[c][d] * cents[c][d]) for d in range(D))
        summary[c] = (sizes[c], _round9(float(inert[c])), _round9(float(norm)))
    return cents, summary


def test_exact_tier_differential(spark, X):
    """kmeans_train_exact == the pure-Python decimal replication, BIT FOR
    BIT: every centroid component and every summary cell — the oracle's
    cross-engine claim, proven in-process a third way."""
    from stock_market_big_data_project_spark.operators.kmeans import (
        kmeans_train_exact,
    )

    ids, mat = X
    emb = load_table(spark, SF_DIR, "embeddings")
    cents, summary = kmeans_train_exact(emb, k=K, n_iter=N_ITER)
    ref_cents, ref_summary = _ref_kmeans_exact(mat)
    for c in range(K):
        assert list(cents[c]) == list(map(float, ref_cents[c])), f"cell {c}"
    got = {
        r["cell"]: (r["size"], r["inertia"], r["centroid_norm2"])
        for r in summary.collect()
    }
    assert got == ref_summary
