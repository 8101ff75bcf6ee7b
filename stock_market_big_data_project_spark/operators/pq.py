"""Product quantization (PQ) for the embedding surface (Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search").

The memory side of ANN at 100 TB: IVF (operators/similarity.py::ivf_cells)
prunes WHICH vectors a search reads; PQ compresses WHAT is stored — a
64-dim float32 vector (256 bytes) becomes 8 four-bit codes (4 bytes, 64×),
so the candidate set a probe rescans fits in cache instead of spilling.
Search is asymmetric (ADC): the query stays full-precision, per-subspace
distances to every centroid are precomputed once into a tiny lookup table,
and each corpus vector's approximate distance is 8 table lookups — the
corpus-side scan never touches floats.

Like the IVF/LSH family, the codebooks are deterministic md5-derived
constants (operators/_planes.py) rather than trained k-means: the
quantize/encode/ADC machinery — the part with engine content — is
bit-for-bit checkable against the DuckDB oracle, which a data-dependent
training loop would prevent. A trained codebook drops in by replacing
`_codebook()`; every plan shape below is unchanged.

Exactness: squared distances accumulate as DECIMAL(18,15) (values are
bounded: embeddings ∈ [-0.6, 0.6], centroids ∈ [-0.5, 0.5) ⇒ each term
≤ ~1.2, a subspace sum ≤ ~10), so per-subspace argmins and ADC sums are
engine- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._planes import hyperplanes

DIST_DECIMAL = "decimal(18,15)"

N_SUBSPACES = 8
SUB_DIM = 8
N_CENTROIDS = 16
_PREFIX = "pq:"


def _codebook(
    n_centroids: int = N_CENTROIDS,
    n_dims: int = N_SUBSPACES * SUB_DIM,
):
    """(centroid, global-dim) component grid; subspace j's centroid c is
    the slice [j*SUB_DIM, (j+1)*SUB_DIM)."""
    return hyperplanes(n_centroids, n_dims, prefix=_PREFIX)


def _sub_dist(emb_col: str, j: int, cent_slice: tuple[float, ...]):
    """Exact decimal ‖x_j − c‖² over subspace j's slice: the (x−v)² terms
    are deterministic IEEE doubles, summed as decimals (HOF fold — the
    unrolled form's codegen would not fit a janino method, see
    similarity.py::_ivf_best)."""
    subemb = F.slice(F.col(emb_col), j * SUB_DIM + 1, SUB_DIM)
    cent_lit = F.array(*[F.lit(v) for v in cent_slice])
    return F.aggregate(
        F.zip_with(
            subemb,
            cent_lit,
            lambda x, v: (x.cast("double") - v) * (x.cast("double") - v),
        ),
        F.lit(0).cast(DIST_DECIMAL),
        lambda acc, t: (acc + t.cast(DIST_DECIMAL)).cast(DIST_DECIMAL),
    )


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quantize: (id, subspace, code, dist) — per subspace the nearest
    centroid (exact decimal argmin, ties → lowest code). All 8×16 subspace
    distances evaluate ONCE per vector inside a single projection, and
    only then explode to the 8 code rows — a narrow map, no join, no
    shuffle: at 100 TB this is the pure scan+write that produces the
    4-bytes-per-vector code table."""
    cb = _codebook()
    per_j = F.array(
        *[
            F.struct(
                F.lit(j).alias("subspace"),
                F.array_min(
                    F.array(
                        *[
                            F.struct(
                                _sub_dist(
                                    emb_col,
                                    j,
                                    cb[c][j * SUB_DIM : (j + 1) * SUB_DIM],
                                ).alias("dist"),
                                F.lit(c).alias("code"),
                            )
                            for c in range(N_CENTROIDS)
                        ]
                    )
                ).alias("best"),
            )
            for j in range(N_SUBSPACES)
        ]
    )
    return (
        df.select(F.col(id_col), *extra_cols, F.explode(per_j).alias("s"))
        .select(
            id_col,
            *extra_cols,
            F.col("s.subspace").alias("subspace"),
            F.col("s.best.code").alias("code"),
            F.round(F.col("s.best.dist").cast("double"), 9).alias("dist"),
        )
    )


def pq_lut(
    queries: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Query-side ADC lookup table: (query_id, subspace, code, qdist) —
    ‖q_j − c‖² for every (subspace, centroid). |queries|×8×16 rows, built
    in one projection and small enough to broadcast."""
    cb = _codebook()
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("subspace"),
                F.lit(c).alias("code"),
                _sub_dist(
                    emb_col, j, cb[c][j * SUB_DIM : (j + 1) * SUB_DIM]
                ).alias("qdist"),
            )
            for j in range(N_SUBSPACES)
            for c in range(N_CENTROIDS)
        ]
    )
    return (
        queries.select(
            F.col(id_col).alias("query_id"), F.explode(cells).alias("s")
        )
        .select("query_id", "s.subspace", "s.code", "s.qdist")
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, neighbor_id, adc_dist, rank).

    The corpus side joins its codes against the BROADCAST lookup table on
    (subspace, code) and sums 8 exact decimals per (query, vector). That
    is the PQ contract at scale: the corpus scan reads 4-byte codes, never
    floats, and all float work is query-side and tiny. Ranking is
    ascending approximate L2, ties by neighbor id."""
    lut = pq_lut(queries, id_col, emb_col)
    codes = pq_encode(corpus, id_col, emb_col).select(
        F.col(id_col).alias("neighbor_id"), "subspace", "code"
    )
    scored = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qdist").alias("adc"))
    )
    return _rank_topk(scored, k)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, adc) → top-k rows with rounded distance and
    rank (ascending approximate L2, ties by neighbor id)."""
    w = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round(F.col("adc").cast("double"), 9).alias("adc_dist"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def ivfpq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_cells: int = 8,
    n_probe: int = 2,
    k: int = 5,
    n_dims: int = 64,
) -> DataFrame:
    """The composed FAISS-style index — IVF prunes WHICH vectors are read,
    PQ compresses WHAT is read: each query probes its `n_probe` best IVF
    cells and ADC-scores ONLY those cells' 4-byte codes.

    Corpus side stays one narrow projection: the IVF cell id (same
    expression as similarity.py::ivf_cells — never a join back to its
    output) rides along the PQ code explode, so at rest this is the
    `partitionBy(cell)` code table and a probe is partition pruning over
    4-byte rows. Query side: (probe cells × full LUT) ≈ n_probe×8×16 rows
    per query, broadcast; the corpus-side join key (cell, subspace, code)
    restricts candidates to probed cells with zero extra plan nodes.
    Candidate volume ≈ n·n_probe/n_cells, bytes read ≈ 1/64 of the float
    corpus — multiplicative with the IVF pruning."""
    from ._planes import hyperplanes
    from .similarity import _exact_dot, _ivf_best

    cents = hyperplanes(n_cells, n_dims, prefix="ivf:")

    def dot_c(c: int):
        cent = F.array(*[F.lit(v) for v in cents[c]])
        return _exact_dot(F.col(emb_col), cent, None)

    # ascending sort on (−dot, cell) ≡ dot desc, ties → lowest cell id —
    # identical probe rule to ivf_probe_topk.
    probes = F.slice(
        F.array_sort(
            F.array(
                *[
                    F.struct(
                        (-dot_c(c)).alias("negdot"), F.lit(c).alias("c")
                    )
                    for c in range(n_cells)
                ]
            )
        ),
        1,
        n_probe,
    )
    q_probe = queries.select(
        F.col(id_col).alias("query_id"), F.explode(probes).alias("_p")
    ).select("query_id", F.col("_p.c").alias("cell"))
    qside = q_probe.join(pq_lut(queries, id_col, emb_col), "query_id")

    best = _ivf_best(emb_col, cents)
    codes = pq_encode(
        corpus.withColumn("cell", (-best["negc"]).cast("int")),
        id_col,
        emb_col,
        extra_cols=("cell",),
    ).select(F.col(id_col).alias("neighbor_id"), "cell", "subspace", "code")
    scored = (
        codes.join(F.broadcast(qside), ["cell", "subspace", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qdist").alias("adc"))
    )
    return _rank_topk(scored, k)
