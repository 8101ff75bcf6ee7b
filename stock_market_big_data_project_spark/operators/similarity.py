"""Similarity search over embedding columns (SURVEY.md §7 Phase 5).

Two tiers, as a 100 TB pipeline needs:

- **brute-force cosine top-k** (the correctness baseline): broadcast the
  query set, cross-join against the corpus, evaluate cosine JVM-side.
  Exactness: per-dimension products are exact doubles (float32 inputs have
  24-bit mantissas, products fit in 53), and the *sums* accumulate in
  DECIMAL(38,24) — order-independent, so the score and therefore the
  ranking are bit-identical across engines and partitionings.
- **hyperplane-LSH buckets** (the scale path): 16 deterministic pseudo-random
  hyperplanes (component = md5-derived value per (plane, dim)) → sign-bit
  bucket; candidates meet in buckets via equi-join instead of a cross join.

No pandas UDFs needed: `aggregate`/`zip_with` lambdas are Catalyst
expressions and stay inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT_DECIMAL = "decimal(38,24)"


def _exact_dot(a, b):
    """Σ aᵢ·bᵢ with decimal accumulation — order-independent, bit-exact."""
    prod = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")))
    return F.aggregate(
        prod,
        F.lit(0).cast(DOT_DECIMAL),
        # re-cast each partial sum: Spark widens DECIMAL(38,24)+DECIMAL(38,24)
        # to (38,23), which must not leak into the fold's accumulator type
        # (lossless here — |Σ| < 10⁴ fits 14 integer digits)
        lambda acc, x: (acc + x.cast(DOT_DECIMAL)).cast(DOT_DECIMAL),
    ).cast("double")


def with_norm(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm2", _exact_dot(F.col(emb_col), F.col(emb_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors per query (self excluded).

    queries is broadcast (small side); ranking ties broken by neighbor id.
    Output: (query_id, neighbor_id, cosine, rank).
    """
    q = with_norm(queries, emb_col).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("_qe"),
        F.col("_norm2").alias("_qn"),
    )
    c = with_norm(corpus, emb_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("_ce"),
        F.col("_norm2").alias("_cn"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = F.try_divide(
        _exact_dot(F.col("_qe"), F.col("_ce")),
        F.sqrt(F.col("_qn")) * F.sqrt(F.col("_cn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 9).alias("cosine"), "rank")
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All embedding pairs (a<b) with cosine ≥ threshold — the
    embedding-cosine near-dup detector. Brute force O(n²) baseline; the LSH
    bucket variant below is the scale path."""
    n = with_norm(df, emb_col)
    a = n.select(
        F.col(id_col).alias("id_a"), F.col(emb_col).alias("_ea"), F.col("_norm2").alias("_na")
    )
    b = n.select(
        F.col(id_col).alias("id_b"), F.col(emb_col).alias("_eb"), F.col("_norm2").alias("_nb")
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = F.try_divide(
        _exact_dot(F.col("_ea"), F.col("_eb")),
        F.sqrt(F.col("_na")) * F.sqrt(F.col("_nb")),
    )
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 9).alias("cosine"))
    )


def lsh_bucket(df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding",
               n_planes: int = 16, n_dims: int = 64) -> DataFrame:
    """Sign-bit bucket id per vector: bit p = [⟨emb, plane_p⟩ > 0].

    The md5-derived hyperplanes are deterministic constants, so they are
    materialized driver-side (operators/_planes.py — identical values to the
    SQL md5 formula the oracle uses) and shipped as array literals: the
    runtime cost per vector is n_planes exact dot products, no hashing.
    The whole thing is a narrow map — no shuffle until the final per-id sum,
    and the downstream candidate join is an equi-join on the bucket id.
    """
    from ._planes import hyperplanes

    planes = hyperplanes(n_planes, n_dims)

    def proj(p: int):
        plane_lit = F.array(*[F.lit(c) for c in planes[p]])
        return F.aggregate(
            F.zip_with(
                F.col(emb_col), plane_lit, lambda x, c: x.cast("double") * c
            ),
            F.lit(0).cast(DOT_DECIMAL),
            lambda acc, x: (acc + x.cast(DOT_DECIMAL)).cast(DOT_DECIMAL),
        ).cast("double")

    bucket = None
    for p in range(n_planes):
        bit = F.when(proj(p) > 0, F.lit(1 << p).cast("bigint")).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    return df.select(id_col, bucket.alias("bucket"))
