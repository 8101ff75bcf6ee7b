"""Product-quantization quality/identity tests (operators/pq.py).

The DuckDB oracle (tests/test_oracle_parity.py::embedding_pq_codes /
embedding_pq_adc_topk) proves the MACHINERY bit-for-bit; these tests prove
the MATH means what it claims:

1. ADC identity — the asymmetric distance is exactly the L2 distance from
   the full-precision query to the RECONSTRUCTED (decoded) neighbor:
   adc(q, v) = Σ_j ‖q_j − centroid[code_{v,j}]‖². Checked against a numpy
   recomputation from the codes.
2. Better-than-random — PQ is approximate, and with an UNTRAINED
   (md5-derived) codebook on near-uniform random 64-dim fixtures the
   quantization error is a large fraction of inter-point distance, so
   exact-rank recall is not a contract (measured recall@5 of 0-0.4 at
   sf0.001). What must hold for the geometry to have survived the 64×
   compression: every query's returned top-5 is strictly closer (true L2)
   than the corpus average, and the mean ratio clears a margin (measured
   0.77-0.97 per query, mean 0.88). A k-means-trained codebook tightens
   this — the machinery is codebook-agnostic (operators/pq.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from stock_market_big_data_project_spark.operators.pq import (
    N_CENTROIDS,
    N_SUBSPACES,
    SUB_DIM,
    _codebook,
    pq_adc_topk,
    pq_encode,
)
from stock_market_big_data_project_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def vectors(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    return {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}


@pytest.fixture(scope="module")
def codes(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = {}
    for r in pq_encode(emb).collect():
        out.setdefault(int(r.vec_id), {})[int(r.subspace)] = int(r.code)
    return out


def _decode(code_by_j: dict[int, int], cb) -> np.ndarray:
    return np.concatenate(
        [
            np.array(cb[code_by_j[j]][j * SUB_DIM : (j + 1) * SUB_DIM])
            for j in range(N_SUBSPACES)
        ]
    )


def test_adc_equals_distance_to_reconstruction(spark, vectors, codes):
    emb = load_table(spark, SF_DIR, "embeddings")
    cb = _codebook()
    top = pq_adc_topk(emb, emb.filter("vec_id < 10")).collect()
    assert len(top) > 0
    for r in top:
        q = vectors[int(r.query_id)]
        recon = _decode(codes[int(r.neighbor_id)], cb)
        want = float(np.sum((q - recon) ** 2))
        assert abs(r.adc_dist - want) < 1e-8, (r.query_id, r.neighbor_id)


def test_codes_are_nearest_centroids(vectors, codes):
    cb = _codebook()
    for vid, by_j in list(codes.items())[:50]:
        x = vectors[vid]
        for j in range(N_SUBSPACES):
            xj = x[j * SUB_DIM : (j + 1) * SUB_DIM]
            dists = [
                float(
                    np.sum(
                        (xj - np.array(cb[c][j * SUB_DIM : (j + 1) * SUB_DIM]))
                        ** 2
                    )
                )
                for c in range(N_CENTROIDS)
            ]
            best = min(range(N_CENTROIDS), key=lambda c: (dists[c], c))
            # float64 numpy vs exact decimal can differ only on knife-edge
            # ties; accept either argmin within 1e-12 of the minimum.
            assert dists[by_j[j]] <= dists[best] + 1e-12, (vid, j)


def test_fast_path_equals_exact_path(spark):
    # The Arrow fast path (float64 + guard-band Decimal fallback) must be
    # indistinguishable from the pure Column-expression decimal path —
    # codes AND rounded distances, every row.
    emb = load_table(spark, SF_DIR, "embeddings")
    fast = {
        (r.vec_id, r.subspace): (r.code, r.dist)
        for r in pq_encode(emb).collect()
    }
    exact = {
        (r.vec_id, r.subspace): (r.code, r.dist)
        for r in pq_encode(emb, exact=True).collect()
    }
    assert fast == exact


def test_ivf_assign_fast_equals_exact(spark):
    # The Arrow IVF assignment (float64 matmul + guard-band Decimal
    # fallback) must match the Column-expression decimal path — cells AND
    # rounded dots, every row.
    from stock_market_big_data_project_spark.operators.similarity import (
        ivf_cells,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    fast = {r.vec_id: (r.cell, r.cell_dot) for r in ivf_cells(emb).collect()}
    exact = {
        r.vec_id: (r.cell, r.cell_dot)
        for r in ivf_cells(emb, exact=True).collect()
    }
    assert fast == exact


def test_pq_encode_plan_is_narrow(spark):
    # The scale contract in the docstring, enforced: quantization is a pure
    # scan-side map — no exchange, no join; the fast path's one Arrow
    # stage (never a row-at-a-time UDF), the exact path none at all.
    from stock_market_big_data_project_spark.plans.audit import plan_facts

    emb = load_table(spark, SF_DIR, "embeddings")
    facts = plan_facts(pq_encode(emb))
    assert facts["exchanges"] == 0, facts
    assert facts["python_stages"] == 1, facts
    assert facts["row_python_udfs"] == 0, facts
    assert facts["sort_merge_joins"] + facts["broadcast_hash_joins"] == 0, facts
    exact_facts = plan_facts(pq_encode(emb, exact=True))
    assert exact_facts["exchanges"] == 0, exact_facts
    assert exact_facts["python_stages"] == 0, exact_facts


def test_topk_beats_corpus_average(spark, vectors):
    emb = load_table(spark, SF_DIR, "embeddings")
    top = pq_adc_topk(emb, emb.filter("vec_id < 10")).collect()
    by_q: dict[int, list[int]] = {}
    for r in top:
        by_q.setdefault(int(r.query_id), []).append(int(r.neighbor_id))
    ids = sorted(vectors)
    ratios = []
    for q, neighbors in by_q.items():
        qv = vectors[q]
        d_top = np.mean(
            [np.sum((qv - vectors[n]) ** 2) for n in neighbors]
        )
        d_all = np.mean(
            [np.sum((qv - vectors[i]) ** 2) for i in ids if i != q]
        )
        assert d_top < d_all, (q, d_top, d_all)
        ratios.append(d_top / d_all)
    assert np.mean(ratios) < 0.95, ratios


def test_rounding_guard_half_boundary():
    # ADVICE r4 counterexample class: a value whose exact decimal form
    # ends in …5 at the 10th digit. np.round (half-to-even) gives
    # 2.385722104, Spark round(·,9) (HALF_UP) gives 2.385722105 — the
    # guard MUST route such rows to the exact-decimal fallback. Round 4's
    # guard (distance to integer multiples of 1e-9 only) missed them.
    from stock_market_big_data_project_spark.operators.rounding import (
        ambiguous_round9,
    )

    vals = np.array(
        [
            2.3857221045,  # the advisor's counterexample (half hazard)
            1.000000001,  # exactly on the 1e-9 grid (grid hazard)
            0.999999999500001,  # half hazard just under a grid point
            0.1234567891,  # frac 0.1 — safe, must NOT be flagged
            0.1234567894,  # frac 0.4 — safe
        ]
    )
    mask = ambiguous_round9(vals)
    assert mask.tolist() == [True, True, True, False, False], mask
    # and the divergence is real: numpy would have emitted the wrong digit
    assert f"{np.round(vals[0], 9):.9f}" == "2.385722104"
