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
