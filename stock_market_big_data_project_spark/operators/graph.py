"""Connected components over near-dup pair lists (the cluster step of a
dedup pipeline: pairs → components → one canonical doc per component).

Iterative min-label propagation (the Pregel/GraphX formulation): every
node starts labeled with itself; each round a node takes the min of its
own label and its neighbors' labels; fixpoint in O(cluster diameter)
rounds — near-dup clusters are shallow (dozens of docs, diameter ≲ 5), so
the simple propagation beats the large-star/small-star machinery it would
take to guarantee O(log n). Each round is one shuffle join + one
aggregate; `localCheckpoint` truncates lineage so round N's plan does not
replay rounds 1..N-1.

Not SQL-expressible as one query in Spark — the driver loop IS the
operator — but DuckDB's recursive CTE computes the identical fixpoint, so
the result is still oracle-checkable (plans/llm.py::dedup_clusters_ngram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`; component =
    the min node id reachable through the undirected pair graph."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # each node hears the labels of its neighbors, keeps the min
        msgs = edges.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
