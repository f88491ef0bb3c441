"""Unit tests for the loop-until-convergence PageRank generalization
(operators/graph.py::pagerank_loop) -- the production form of the fixed
2-iteration declared query `pagerank_nations`."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.operators.graph import _pr_step, pagerank_loop


def _chain(spark, n):
    """Directed chain 0 -> 1 -> ... -> n-1, unit weights."""
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = (
        spark.range(n - 1)
        .select(
            F.col("id").alias("u"),
            (F.col("id") + 1).alias("v"),
            F.lit(1).cast("bigint").alias("w"),
        )
    )
    return nodes, edges


def test_pagerank_loop_converges_on_long_chain(spark):
    """A 60-node chain needs ~O(chain length) power iterations to settle;
    the loop must reach the exact integer fixpoint (one more step changes
    nothing) well within max_iter, which the unrolled 2-iteration form
    cannot do."""
    nodes, edges = _chain(spark, 60)
    rank = pagerank_loop(nodes, edges, max_iter=100)
    assert rank.count() == 60
    # Fixpoint: applying one more step changes no rank.
    edges_cp = edges.localCheckpoint(eager=True)
    outd = edges_cp.groupBy("u").agg(F.sum("w").cast("bigint").alias("outw"))
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nxt = _pr_step(edges_cp, outd, nodes, nn, rank)
    delta = (
        nxt.withColumnRenamed("r", "r_new")
        .join(rank, "node")
        .agg(F.max(F.abs(F.col("r_new") - F.col("r"))))
        .collect()[0][0]
    )
    assert delta == 0
    # Mass flows down the chain: deeper nodes accumulate at least as much
    # rank as the source until damping equilibrates; node 0 holds only
    # teleport mass.
    r = {row.node: row.r for row in rank.collect()}
    teleport_only = r[0]
    assert all(r[i] >= teleport_only for i in range(60))
    assert r[1] > r[0]


def test_pagerank_loop_matches_unrolled_two_steps_when_capped(spark):
    """With max_iter=2 the loop reproduces exactly the declared query's
    unrolled two power iterations (same integer arithmetic, same result),
    so the loop is a strict generalization, not a divergent twin."""
    nodes, edges = _chain(spark, 10)
    capped = pagerank_loop(nodes, edges, max_iter=2)

    edges_cp = edges.localCheckpoint(eager=True)
    outd = edges_cp.groupBy("u").agg(F.sum("w").cast("bigint").alias("outw"))
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r0 = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr("CAST(1000000 DIV n AS BIGINT)").alias("r")
    )
    unrolled = _pr_step(edges_cp, outd, nodes, nn, _pr_step(edges_cp, outd, nodes, nn, r0))
    got = {(row.node, row.r) for row in capped.collect()}
    want = {(row.node, row.r) for row in unrolled.collect()}
    assert got == want


def _und(spark, pairs, w=1):
    """Undirected edge list (both directions) from (a, b[, w]) tuples."""
    rows = []
    for t in pairs:
        a, b, ww = (t if len(t) == 3 else (t[0], t[1], w))
        rows += [(a, b, ww), (b, a, ww)]
    return spark.createDataFrame(rows, "a long, b long, w long")


def test_link_prediction_path_graph(spark):
    """Path 0-1-2-3: the only non-adjacent pairs sharing a neighbor are
    (0,2) via 1 and (1,3) via 2; both score cn=1, Jaccard 1/2, RA 1/2
    (shared neighbor has degree 2) -- hand-checked exact ppm values."""
    from etl_rf_matrix_controller_spark.operators.graph import link_prediction

    und = _und(spark, [(0, 1), (1, 2), (2, 3)])
    got = {
        (r.a, r.b): (r.common_neighbors, r.jaccard_ppm, r.ra_ppm)
        for r in link_prediction(und).collect()
    }
    assert got == {(0, 2): (1, 500000, 500000), (1, 3): (1, 500000, 500000)}


def test_link_prediction_excludes_adjacent_pairs(spark):
    """Triangle 0-1-2: every pair is adjacent, so no candidate survives
    the anti-join even though every pair has a common neighbor."""
    from etl_rf_matrix_controller_spark.operators.graph import link_prediction

    und = _und(spark, [(0, 1), (1, 2), (0, 2)])
    assert link_prediction(und).count() == 0


def test_sssp_fixed_relaxation_rounds(spark):
    """0->1->2 (cost 10+10) vs direct 0->2 (cost 100): round 1 can only
    see the direct edge (dist 100); round 2 relaxes through node 1 to the
    true shortest 20 -- pins Bellman-Ford synchronous-round semantics."""
    from etl_rf_matrix_controller_spark.operators.graph import sssp_fixed

    ec = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 10), (0, 2, 100)], "u long, v long, cost long"
    )
    d0 = spark.createDataFrame([(0, 0)], "node long, dist long")
    one = {r.node: r.dist for r in sssp_fixed(d0, ec, 1).collect()}
    two = {r.node: r.dist for r in sssp_fixed(d0, ec, 2).collect()}
    assert one == {0: 0, 1: 10, 2: 100}
    assert two == {0: 0, 1: 10, 2: 20}


def test_lpa_two_triangles_weak_bridge(spark):
    """Two w=10 triangles {0,1,2} and {3,4,5} joined by a w=1 bridge
    (2-3): after two synchronous rounds each triangle converges to its
    min member's label and the bridge does not merge them -- hand-traced
    including the tie-breaks (weighted argmax, min-label ties)."""
    from etl_rf_matrix_controller_spark.operators.graph import lpa_step

    und = _und(
        spark,
        [(0, 1, 10), (1, 2, 10), (0, 2, 10),
         (3, 4, 10), (4, 5, 10), (3, 5, 10), (2, 3, 1)],
    )
    labels = spark.createDataFrame(
        [(i, i) for i in range(6)], "node long, label long"
    )
    for _ in range(2):
        labels = lpa_step(labels, und)
    got = {r.node: r.label for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_lpa_isolated_node_keeps_label(spark):
    """A node with no edges must keep its own label through a round (the
    left-join coalesce path)."""
    from etl_rf_matrix_controller_spark.operators.graph import lpa_step

    und = _und(spark, [(0, 1)])
    labels = spark.createDataFrame(
        [(0, 0), (1, 1), (9, 9)], "node long, label long"
    )
    got = {r.node: r.label for r in lpa_step(labels, und).collect()}
    assert got[9] == 9 and got[0] == 1 and got[1] == 0


def test_collect_bounded_guards_driver_side_collects(spark):
    """The driver-side iteration rewrites collect dimension-bounded
    frames; collect_bounded must pass exactly-at-bound inputs through
    unchanged and FAIL LOUDLY (not driver-OOM) one row past the bound."""
    import pytest

    from etl_rf_matrix_controller_spark.plans.scale import collect_bounded

    df = spark.range(10).selectExpr("id AS u", "id AS v", "id AS w")
    rows = collect_bounded(df, 10, "at-bound lattice")
    assert {r.u for r in rows} == set(range(10))
    with pytest.raises(ValueError, match="dimension bound"):
        collect_bounded(df, 9, "over-bound lattice")
