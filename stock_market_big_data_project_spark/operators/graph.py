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


def bfs_hops(edges: DataFrame, seed: int, max_hops: int) -> DataFrame:
    """(node, hops) — minimum hop count from `seed` through the directed
    edge list, for every node reachable within `max_hops` rounds.

    Same Pregel shape as connected_components: each round the frontier's
    neighbors learn `hops + 1`, a min-aggregate folds updates into the
    label table, `localCheckpoint` truncates lineage.  Fixed round count
    (not convergence-stopped) so the whole traversal replays as unrolled
    CTE rounds in an oracle — all-integer, hash-certifiable.  At 100 TB
    each round is one edges ⋈ labels equi-join + one aggregate over the
    frontier-adjacent slice."""
    edges = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).localCheckpoint()
    labels = (
        edges.sparkSession.createDataFrame(
            [(int(seed), 0)], "node long, hops int"
        ).localCheckpoint()
    )
    for _ in range(max_hops):
        grown = (
            edges.join(
                labels.withColumnRenamed("node", "src"), "src"
            ).select(
                F.col("dst").alias("node"),
                (F.col("hops") + 1).alias("hops"),
            )
        )
        labels = (
            labels.unionByName(grown)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint()
        )
    return labels


def bfs_oracle_sql(edges_cte: str, max_hops: int) -> str:
    """DuckDB twin of `bfs_hops`: `edges_cte` defines ``sym(src, dst)``;
    the seed is min(src) over sym (kept in lockstep with callers); the
    returned SQL unrolls the identical min-hop trajectory."""
    rounds = []
    prev = "d0"
    for k in range(1, max_hops + 1):
        rounds.append(
            f"""d{k} AS (
      SELECT node, min(hops) AS hops FROM (
        SELECT node, hops FROM {prev}
        UNION ALL
        SELECT s.dst AS node, p.hops + 1 AS hops
        FROM sym s JOIN {prev} p ON p.node = s.src
      ) GROUP BY node
    )"""
        )
        prev = f"d{k}"
    rounds_sql = ",\n    ".join(rounds)
    return f"""
    WITH {edges_cte},
    d0 AS (
      -- the IS NOT NULL guard keeps d0 vacuously empty on an empty
      -- graph (min over zero rows is NULL), matching the Spark side
      SELECT node, 0 AS hops FROM (
        SELECT CAST((SELECT min(src) FROM sym) AS BIGINT) AS node
      ) WHERE node IS NOT NULL
    ),
    {rounds_sql}
    SELECT node, hops FROM {prev}
    """


def label_propagation(edges: DataFrame, rounds: int) -> DataFrame:
    """(node, label) after `rounds` of deterministic semi-synchronous
    label propagation (community detection — Raghavan et al. 2007, made
    engine-reproducible): every node starts labeled with itself; each
    round a node adopts the most frequent label among its neighbors PLUS
    its own current label (the self-vote damps the 2-coloring
    oscillation synchronous LPA exhibits on bipartite graphs), ties
    broken toward the smallest label.  All-integer and fixed-round, so
    the whole trajectory replays as unrolled CTE rounds in an oracle —
    the PageRank/BFS certification pattern applied to community
    detection.  Each round is one edges ⋈ labels equi-join + two
    aggregates (label counts, then the argmax), lineage-truncated."""
    edges = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        votes = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "label")
            .unionByName(labels)
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max_by(
                    "label", F.struct(F.col("cnt"), -F.col("label"))
                ).alias("label")
            )
            .localCheckpoint()
        )
    return labels


def label_propagation_oracle_sql(edges_cte: str, rounds: int) -> str:
    """DuckDB twin of `label_propagation`: `edges_cte` defines
    ``sym(src, dst)``; unrolled CTE rounds with the identical
    most-frequent / smallest-label-tie-break update."""
    steps = []
    prev = "l0"
    for k in range(1, rounds + 1):
        steps.append(
            f"""l{k} AS (
      SELECT node, first(label ORDER BY cnt DESC, label) AS label FROM (
        SELECT node, label, count(*) AS cnt FROM (
          SELECT s.dst AS node, p.label
          FROM sym s JOIN l{k - 1} p ON p.node = s.src
          UNION ALL
          SELECT node, label FROM l{k - 1}
        ) GROUP BY node, label
      ) GROUP BY node
    )"""
        )
        prev = f"l{k}"
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH {edges_cte},
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
    {steps_sql}
    SELECT node, label FROM {prev}
    """


def wedge_pairs(
    op: DataFrame,
    node_col: str,
    part_col: str,
    hot_part_threshold: int | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """(c1, c2, shared): node pairs sharing ≥1 part, with the shared-part
    count — the wedge aggregate of bipartite butterfly counting (one
    part-keyed self-join of the incidence list; wedge space is
    Σ_p C(deg(p), 2)).

    ``hot_part_threshold`` (r13, guide §2.5 skew — OFF by default) wires
    the degree-skew cut as a SALTED plan, not a drop: parts with degree
    above the threshold are self-joined on (part, salt) — the left side
    salted by hash(c1) % n_salts, the right side exploded n_salts ways —
    so each hub part's quadratic bucket splits across n_salts partitions
    while every (c1, c2) pair still meets exactly once (c1's salt picks
    exactly one replica of c2). Cold parts take the plain self-join; the
    shared counts merge in the (c1, c2) aggregate. Output is provably
    row-identical to the unsalted join (tests/test_skew.py); the cost is
    a degree aggregate + the hot/cold split joins — measured +0.55 s at
    sf0.1 with an EMPTY hot set, so the threshold should be wired only
    on corpora whose part-degree tail is real (SCALE.md records the
    rule; AQE's skew-join split cannot divide a single hub key, which is
    exactly what the salt does)."""
    a = op.withColumnsRenamed({node_col: "c1"})
    b = op.withColumnsRenamed({node_col: "c2"})
    p = part_col
    if hot_part_threshold is None:
        wpairs = a.join(b, p)
    else:
        deg = op.groupBy(p).agg(F.count(F.lit(1)).alias("_d"))
        hot = deg.filter(F.col("_d") > hot_part_threshold).select(p)
        a_hot = a.join(F.broadcast(hot), p)
        b_hot = b.join(F.broadcast(hot), p)
        a_cold = a.join(F.broadcast(hot), p, "left_anti")
        b_cold = b.join(F.broadcast(hot), p, "left_anti")
        sa = a_hot.withColumn("_s", F.pmod(F.xxhash64("c1"), F.lit(n_salts)))
        sb = b_hot.withColumn(
            "_s", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        ).withColumn("_s", F.col("_s").cast("bigint"))
        wpairs = a_cold.join(b_cold, p).unionByName(
            sa.join(sb, [p, "_s"]).drop("_s")
        )
    return (
        wpairs.filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
