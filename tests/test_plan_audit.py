"""Red-flag gate over every registered query's physical plan.

The r02 lesson: the one query that shipped with a quadratic plan was the
one without an audited plan. This test builds the plan (no execution) for
every name in both registry tiers and fails on:

- any CartesianProduct
- any BroadcastNestedLoopJoin not on the documented tiny-cross allowlist
- any row-at-a-time Python UDF (BatchEvalPython) anywhere
- any Arrow/Python stage outside the documented mapInPandas allowlist
- exchange count above the audited ceiling

Plan build only — a few seconds per query at the test scale factor; the
sf0.1 numbers live in PLANS.md via tools/plan_audit.py.
"""

from __future__ import annotations

from .conftest import SF_DIR


def test_no_red_flag_plans(spark):
    from stock_market_big_data_project_spark.plans import (
        LOCAL_QUERIES,
        QUERIES,
        load_all_plans,
    )
    from stock_market_big_data_project_spark.plans.audit import (
        EAGER_ITERATIVE,
        STREAMING_HARNESS,
        plan_facts,
        red_flags,
    )

    load_all_plans()
    all_queries = {**LOCAL_QUERIES, **QUERIES}
    flags: list[str] = []
    audited = 0
    for name, fn in sorted(all_queries.items()):
        if name in STREAMING_HARNESS:
            continue
        # eager clustering queries: audit the pre-checkpoint constituent —
        # the registered callable would EXECUTE connected components and
        # return an opaque checkpoint scan (vacuously clean plan)
        fn = EAGER_ITERATIVE.get(name, fn)
        facts = plan_facts(fn(spark, SF_DIR))
        flags += red_flags(name, facts)
        audited += 1
    assert audited >= 50
    assert not flags, "\n".join(flags)


def test_streaming_harness_list_is_current(spark):
    """Every registered query skipped by the audit must actually be a
    streaming-harness query (guards against the skip list rotting into a
    blanket exemption)."""
    from stock_market_big_data_project_spark.plans import (
        LOCAL_QUERIES,
        QUERIES,
        load_all_plans,
    )
    from stock_market_big_data_project_spark.plans.audit import STREAMING_HARNESS

    load_all_plans()
    assert STREAMING_HARNESS <= set(QUERIES) | set(LOCAL_QUERIES)
    for name in STREAMING_HARNESS:
        assert "streaming" in name


def test_eager_iterative_list_is_current(spark):
    """Every name whose audit is redirected to a pre-checkpoint
    constituent must be a registered iterative query (connected-components
    clustering or the BPE trainer), and its constituent must build a
    non-trivial plan (a join/shuffle — i.e. NOT a checkpoint scan)."""
    from stock_market_big_data_project_spark.plans import (
        LOCAL_QUERIES,
        QUERIES,
        load_all_plans,
    )
    from stock_market_big_data_project_spark.plans.audit import (
        EAGER_ITERATIVE,
        plan_facts,
    )

    load_all_plans()
    registered = {**LOCAL_QUERIES, **QUERIES}
    assert set(EAGER_ITERATIVE) <= set(registered)
    iterative_trainers = {
        "bpe_learn_merges",
        "bpe_apply_encode",  # trainer-then-apply: the merge list is the
        # trainer's collected output, shipped into the encode plan
        "embedding_kmeans_train",
        "quality_classifier_train",
        "unigram_lm_segment",  # trainer-then-apply: EM-fitted piece LM,
        # segmentation audited via the fixed-LM constituent
        "zorder_compacted_scan",  # write-then-read: the registered query
        # checkpoints + cleans its temp rewrite (r8 leak fix); the
        # constituent re-stages it so the pruned scan stays audited
        "schema_evolution_read",  # same write-then-read shape
        "embedding_power_iteration_fixed",  # fixed-point eigensolve:
        # the registered callable collects the dim²-bounded covariance
        # and iterates driver-side; audited via the covariance-aggregate
        # constituent it collects
        "embedding_pca_project_fixed",  # r12 deflation extension: same
        # collected-covariance shape, plus a lazy projection plan that
        # IS the registered callable's return (audited directly); the
        # constituent re-audits the collected covariance aggregate
        "pagerank_copurchase",  # Pregel power iteration: per-round
        # equi-joins over the audited symmetrized-edges constituent
        "bfs_shortest_hops",  # Pregel traversal over the same audited
        # edges constituent
        "label_propagation_communities",  # Pregel community detection
        # over the same audited edges constituent
        "graph_analytics_bundle",  # r10 family bundle: its three
        # iterative legs execute at build time (each audited via the
        # shared symmetrized-edges constituent on its standalone
        # registration); the bundle's constituent is its LAZY butterfly
        # leg's composed union (ADVICE r10)
        "training_prep_bundle",  # r10 family bundle: the BPE/k-means
        # trainer legs execute at build time (each audited via its own
        # constituent above); the bundle's constituent is the union of
        # its three LAZY legs
    }
    for name, builder in EAGER_ITERATIVE.items():
        assert (
            "cluster" in name
            or "verified" in name
            or "dedup" in name  # CC-based dedup (e.g. SemDeDup)
            or name in iterative_trainers
        ), name
        facts = plan_facts(builder(spark, SF_DIR))
        assert facts["exchanges"] > 0, (name, "constituent plan is trivial")
