"""Graph analytics over relational edges: unrolled PageRank.

The reference has no graph surface (SURVEY.md SS2.12); this extends the
clustering/connected-components family (operators/clustering.py) with the
other canonical iterative-graph workload.  The nation-level trade graph
(supplier nation -> customer nation, weighted by lineitem count) is the
natural testdata graph: dimension-bounded nodes, fact-derived edge
weights.

Iterative algorithms on Spark are fixed-point loops of joins; for a
DuckDB-checkable declared query the iteration count must be FIXED, so
PageRank is unrolled to two power iterations (enough to rank a 25-node
graph; production would loop to convergence with localCheckpoint every
few steps to cut the lineage).  All rank mass is integer ppm with DIV
floor division -- deterministic on both engines, no float drift across
iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.plans.scale import collect_bounded
from etl_rf_matrix_controller_spark.sources.tables import load_table

# Guard for the driver-side graph iterations (round-10 rewrites): the
# nation trade lattice is <=|nations|^2 = 625 cells on TPC-H data; 4x
# headroom, still trivially driver-safe.  collect_bounded fails loudly
# (instead of OOMing the driver) if the dimension-bounded argument ever
# breaks -- e.g. the operator is pointed at a corpus-scale edge list.
_MAX_EDGE_CELLS = 2500

# Damping 0.85 as the exact rational 85/100; teleport mass (1-d) = 15%.
_EDGES_SQL = """
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, c.c_nationkey
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )


def _collect_trade_edges(spark: SparkSession, sf_dir: str) -> list:
    """The distributed fact-scan aggregation, collected under the
    dimension-bound guard -- the shared entry of every driver-side graph
    iteration (order-insensitive consumers only)."""
    return collect_bounded(
        _trade_edges(spark, sf_dir), _MAX_EDGE_CELLS, "nation trade edges"
    )


@declared(
    "pagerank_nations",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_EDGES_SQL}),
    outd AS MATERIALIZED (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY u),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nation),
    r0 AS MATERIALIZED (
      SELECT n_nationkey AS node, CAST(1000000 // nn.n AS BIGINT) AS r
      FROM nation CROSS JOIN nn
    ),
    c1 AS MATERIALIZED (
      SELECT e.v AS node,
             CAST(sum((r0.r * e.w * 85) // (outd.outw * 100)) AS BIGINT) AS m
      FROM edges e JOIN outd ON outd.u = e.u JOIN r0 ON r0.node = e.u
      GROUP BY e.v
    ),
    r1 AS MATERIALIZED (
      SELECT r0.node,
             CAST(150000 // nn.n + coalesce(c1.m, 0) AS BIGINT) AS r
      FROM r0 LEFT JOIN c1 ON c1.node = r0.node CROSS JOIN nn
    ),
    c2 AS MATERIALIZED (
      SELECT e.v AS node,
             CAST(sum((r1.r * e.w * 85) // (outd.outw * 100)) AS BIGINT) AS m
      FROM edges e JOIN outd ON outd.u = e.u JOIN r1 ON r1.node = e.u
      GROUP BY e.v
    ),
    r2 AS MATERIALIZED (
      SELECT r1.node,
             CAST(150000 // nn.n + coalesce(c2.m, 0) AS BIGINT) AS r
      FROM r1 LEFT JOIN c2 ON c2.node = r1.node CROSS JOIN nn
    )
    SELECT n.n_name AS nation, r2.r AS pagerank_ppm
    FROM r2 JOIN nation n ON n.n_nationkey = r2.node
    """,
)
def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (2 unrolled power iterations, damping 85/100) over the
    nation trade graph: edge u->v weighted by lineitems a supplier in
    nation u shipped to a customer in nation v.

    Rank mass is integer ppm: per-edge contribution
    (r(u) * w * 85) DIV (out(u) * 100), teleport 150000 DIV N -- floor
    division keeps every iteration bit-identical cross-engine (a float
    PageRank diverges in ulps after one iteration).  Dangling mass is
    dropped, the standard simplification.

    The fact scan builds the dimension-bounded edge list in ONE
    distributed aggregation; the power iterations then run DRIVER-SIDE
    over the collected <=|nations|^2 edges (the shapley lattice
    discipline) -- the previous unrolled-in-plan form scanned the nation
    dim 9x and planned 21 exchanges for a 25-node graph.  At real graph
    scale the same loop shuffles edges once on u and reuses that
    partitioning every iteration (the `_pr_step` library form).
    """
    raw = _collect_trade_edges(spark, sf_dir)
    outw: dict[int, int] = {}
    for r in raw:
        outw[r.u] = outw.get(r.u, 0) + r.w
    nations = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    nodes = [r.node for r in nations.select("node").collect()]
    n = len(nodes)
    rank = {x: 1000000 // n for x in nodes}
    for _ in range(2):
        m: dict[int, int] = {}
        for r in raw:
            m[r.v] = m.get(r.v, 0) + (rank[r.u] * r.w * 85) // (
                outw[r.u] * 100
            )
        rank = {x: 150000 // n + m.get(x, 0) for x in nodes}
    out = spark.createDataFrame(
        sorted(rank.items()), "node bigint, r bigint"
    )
    return out.join(F.broadcast(nations), "node").select(
        F.col("n_name").alias("nation"), F.col("r").alias("pagerank_ppm")
    )


def _pr_step(
    edges: DataFrame,
    outd: DataFrame,
    nodes: DataFrame,
    nn: DataFrame,
    rank: DataFrame,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """One integer-ppm power iteration: contributions flow u->v scaled by
    edge weight over out-weight, damped; teleport mass tops every node up.
    Floor division end-to-end -- bit-identical cross-engine, no float
    drift accumulating over iterations."""
    teleport = (scale * (100 - damping_pct)) // 100
    contrib = (
        edges.join(F.broadcast(outd), "u")
        .join(F.broadcast(rank.withColumnRenamed("node", "u")), "u")
        .groupBy(F.col("v").alias("node"))
        .agg(
            F.sum(F.expr(f"(r * w * {damping_pct}) DIV (outw * 100)"))
            .cast("bigint")
            .alias("m")
        )
    )
    return (
        nodes.join(F.broadcast(contrib), "node", "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "node",
            (
                F.expr(f"CAST({teleport} DIV n AS BIGINT)")
                + F.coalesce(F.col("m"), F.lit(0))
            )
            .cast("bigint")
            .alias("r"),
        )
    )


def pagerank_loop(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 50,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Loop-until-convergence PageRank over an arbitrary weighted edge
    list -- the production generalization of `pagerank_nations`'s fixed
    2-iteration declared form.

    ``nodes`` is DataFrame[node], ``edges`` is DataFrame[u, v, w]; returns
    DataFrame[node, r] with integer-``scale`` rank mass.  Same skeleton as
    near_dup_components (operators/clustering.py): localCheckpoint per
    iteration truncates the otherwise unbounded lineage, and convergence
    is a single-scalar probe per round -- integer ranks make exact
    fixpoint detection trivial (max |delta| == 0), where a float PageRank
    needs an epsilon.  max_iter guards the rare floor-division 2-cycle.

    Scale posture: edge list checkpointed once; each iteration is one
    shuffle of contributions on v plus a broadcast of the rank vector.
    The rank broadcast is right for dimension-bounded graphs (nations,
    categories); for billion-node graphs swap the two broadcasts for a
    u-partitioned edge cache co-located with a u-partitioned rank vector
    so every iteration reuses one partitioning, exactly as the CC loop
    reuses its edge partitioning.
    """
    edges = edges.localCheckpoint(eager=True)
    outd = (
        edges.groupBy("u")
        .agg(F.sum("w").cast("bigint").alias("outw"))
        .localCheckpoint(eager=True)
    )
    nodes = nodes.select("node").localCheckpoint(eager=True)
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rank = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"CAST({scale} DIV n AS BIGINT)").alias("r")
    )
    rank = rank.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nxt = _pr_step(
            edges, outd, nodes, nn, rank, damping_pct, scale
        ).localCheckpoint(eager=True)
        delta = (
            nxt.withColumnRenamed("r", "r_new")
            .join(rank, "node")
            .agg(F.max(F.abs(F.col("r_new") - F.col("r"))))
            .collect()[0][0]
        )
        rank = nxt
        if delta == 0:
            break
    return rank


@declared(
    "triangle_count_nations",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM edges WHERE u <> v
    ),
    tri AS MATERIALIZED (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM tri
    JOIN nation n ON n.n_nationkey = tri.x
    GROUP BY n.n_name
    """,
)
def triangle_count_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the (undirected) nation trade graph, reported
    per lowest-id member nation.

    The canonical ordered-edge formulation: orient every edge a < b,
    then a triangle is exactly one wedge (a-b, b-c) closed by (a-c) --
    each triangle counted ONCE, no 6x symmetry blowup.  At real graph
    scale the wedge join is the cost center and is bounded by
    sum(deg^2); production orients edges by DEGREE (low-degree node
    first) instead of by id, which provably caps wedge counts at
    O(m^1.5) -- the id orientation here keeps the oracle trivially
    mirrorable on a dimension-bounded graph.  Edge derivation is one
    fact-table pass (checkpointed), the joins are three
    dimension-bounded self-joins.
    """
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    und = (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    # The oriented edge list is dimension-bounded (<= nations^2 rows) but
    # checkpointed frames carry no stats, so hint the broadcast -- at
    # real graph scale drop the hints and let the wedge join shuffle on
    # its equi keys.
    tri = (
        e1.join(F.broadcast(e2), F.col("e2.a") == F.col("e1.b"))
        .join(
            F.broadcast(e3),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(F.col("e1.a").alias("x"))
    )
    nations = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("x"), "n_name"
    )
    return (
        tri.join(F.broadcast(nations), "x")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


# Edge capacity in scaled cents: round() of the identical double product
# is deterministic cross-engine (same binary input on both sides).
_EDGE_SQL = """
      SELECT n1.n_name AS src, n2.n_name AS dst,
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) AS BIGINT) AS cap
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE n1.n_name <> n2.n_name
      GROUP BY n1.n_name, n2.n_name
"""


@declared(
    "widest_two_hop_trade",
    oracle=f"""
    WITH edges AS ({_EDGE_SQL}),
    relay AS MATERIALIZED (
      SELECT e1.src, e2.dst,
             CAST(max(least(e1.cap, e2.cap)) AS BIGINT) AS relay_cap
      FROM edges e1 JOIN edges e2
        ON e2.src = e1.dst AND e2.dst <> e1.src
      GROUP BY e1.src, e2.dst
    ),
    unioned AS MATERIALIZED (
      SELECT src, dst, cap AS direct_cap, NULL::BIGINT AS relay_cap
      FROM edges
      UNION ALL
      SELECT src, dst, NULL::BIGINT, relay_cap FROM relay
    )
    SELECT src AS src_nation, dst AS dst_nation,
           CAST(coalesce(max(direct_cap), 0) AS BIGINT) AS direct_cap,
           CAST(coalesce(max(relay_cap), 0) AS BIGINT) AS best_relay_cap,
           CAST(greatest(coalesce(max(direct_cap), 0),
                         coalesce(max(relay_cap), 0)) AS BIGINT) AS best_cap
    FROM unioned
    GROUP BY src, dst
    """,
)
def widest_two_hop_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Widest-path (bottleneck-capacity) routing over the nation trade
    graph, paths of length <= 2: for each nation pair, the best
    single-corridor capacity vs the best relay through one intermediate
    (capacity of a path = its thinnest edge).  The graph family's path
    query, alongside reachability (near_dup_components) and centrality
    (pagerank_nations).

    The expensive part is the edge build -- the full Q7-shaped fact join
    -- which runs ONCE into a checkpointed |nations|^2-bounded edge
    list; the 2-hop exploration is a self-join on that tiny frame
    (broadcast, never a fact-side shuffle).  The direct/relay merge is a
    tagged union + group-max, not a full-outer join (Spark cannot
    broadcast full outer; the union form stays joinless -- CLAUDE.md
    trap).  All capacities are scaled-cent integers: least/greatest/max
    are exact, no float comparison anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("src")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("dst")
    )
    cap_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum(cap_cents).cast("bigint").alias("cap"))
        .localCheckpoint(eager=True)
    )
    e1 = edges.select(
        F.col("src").alias("r_src"),
        F.col("dst").alias("mid"),
        F.col("cap").alias("cap1"),
    )
    e2 = edges.select(
        F.col("src").alias("mid2"),
        F.col("dst").alias("r_dst"),
        F.col("cap").alias("cap2"),
    )
    relay = (
        e1.join(
            F.broadcast(e2),
            (F.col("mid2") == F.col("mid")) & (F.col("r_dst") != F.col("r_src")),
        )
        .groupBy(F.col("r_src").alias("src"), F.col("r_dst").alias("dst"))
        .agg(
            F.max(F.least(F.col("cap1"), F.col("cap2")))
            .cast("bigint")
            .alias("relay_cap")
        )
    )
    unioned = edges.select(
        "src", "dst", F.col("cap").alias("direct_cap"),
        F.lit(None).cast("bigint").alias("relay_cap"),
    ).unionByName(
        relay.select(
            "src", "dst", F.lit(None).cast("bigint").alias("direct_cap"),
            "relay_cap",
        )
    )
    direct_m = F.coalesce(F.max("direct_cap"), F.lit(0)).cast("bigint")
    relay_m = F.coalesce(F.max("relay_cap"), F.lit(0)).cast("bigint")
    return unioned.groupBy(
        F.col("src").alias("src_nation"), F.col("dst").alias("dst_nation")
    ).agg(
        direct_m.alias("direct_cap"),
        relay_m.alias("best_relay_cap"),
        F.greatest(direct_m, relay_m).cast("bigint").alias("best_cap"),
    )


@declared(
    "graph_degree_assortativity",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM edges WHERE u <> v
    ),
    strength AS MATERIALIZED (
      SELECT x, CAST(sum(w) AS BIGINT) AS s
      FROM (
        SELECT u AS x, w FROM edges WHERE u <> v
        UNION ALL
        SELECT v AS x, w FROM edges WHERE u <> v
      ) t GROUP BY x
    ),
    dirx AS MATERIALIZED (
      SELECT a AS x, b AS y FROM und
      UNION ALL
      SELECT b AS x, a AS y FROM und
    ),
    pairs AS MATERIALIZED (
      SELECT ss.s AS dj, sd.s AS dk
      FROM dirx e
      JOIN strength ss ON ss.x = e.x
      JOIN strength sd ON sd.x = e.y
    ),
    sums AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(dj) AS BIGINT) AS sj,
             CAST(sum(dj * dk) AS BIGINT) AS sjk,
             CAST(sum(dj * dj) AS BIGINT) AS sj2
      FROM pairs
    )
    SELECT m // 2 AS n_edges,
           CAST(sj AS DOUBLE) / CAST(m AS DOUBLE) AS mean_strength,
           CAST(m * sjk - sj * sj AS DOUBLE)
             / CAST(m * sj2 - sj * sj AS DOUBLE) AS assortativity
    FROM sums
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strength (weighted-degree) assortativity of the undirected nation
    trade graph: the Pearson correlation of endpoint STRENGTHS (total
    incident trade volume, self-loops excluded) across the distinct
    edge list (Newman 2002, weighted form).  Positive = heavy traders
    link to heavy traders; negative = hub-and-spoke.  Strength, not
    plain degree, deliberately: a dense dimension graph saturates to
    complete (every unweighted degree equal -- zero variance, the
    statistic undefined) while trade VOLUMES still differentiate nodes.

    Every moment is an exact integer over the directed edge list (each
    undirected edge in both orientations makes the two marginals
    identical), so the correlation collapses to
    (m*Sjk - Sj^2) / (m*Sj2 - Sj^2) -- no sqrt, one double division of
    exact integers, engine-exact (products stay under 2^53 for total
    volumes to ~10^8 lineitems; swap the moment sums to DECIMAL(38,0)
    beyond).  Edge derivation is the shared one-pass fact rollup;
    strengths and pairs are dimension-bounded equi-joins (broadcast
    here; plain shuffles on a web-scale graph -- the formula itself
    never needs more than 4 global integers).
    """
    edges = _trade_edges(spark, sf_dir).filter(F.col("u") != F.col("v"))
    edges = edges.localCheckpoint(eager=True)  # und + strength consumers
    und = (
        edges.select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)  # both orientations
    )
    strength = (
        edges.select(F.col("u").alias("x"), "w")
        .unionByName(edges.select(F.col("v").alias("x"), "w"))
        .groupBy("x")
        .agg(F.sum("w").cast("bigint").alias("s"))
    )
    dirx = und.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        und.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    ss = F.broadcast(strength.select(F.col("x"), F.col("s").alias("dj")))
    sd = F.broadcast(
        strength.select(F.col("x").alias("y"), F.col("s").alias("dk"))
    )
    pairs = dirx.join(ss, "x").join(sd, "y")
    sums = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("dj").cast("bigint").alias("sj"),
        F.sum(F.col("dj") * F.col("dk")).cast("bigint").alias("sjk"),
        F.sum(F.col("dj") * F.col("dj")).cast("bigint").alias("sj2"),
    )
    return sums.select(
        F.expr("m DIV 2").alias("n_edges"),
        (F.col("sj").cast("double") / F.col("m").cast("double")).alias(
            "mean_strength"
        ),
        (
            (F.col("m") * F.col("sjk") - F.col("sj") * F.col("sj")).cast("double")
            / (F.col("m") * F.col("sj2") - F.col("sj") * F.col("sj")).cast(
                "double"
            )
        ).alias("assortativity"),
    )


KCORE_K = 3
KCORE_PEELS = 6  # fixed unroll; fixpoint reached earlier (pytest pins it)


def _kcore_sql() -> str:
    parts = [
        f"""
    WITH edges AS MATERIALIZED ({_EDGES_SQL}),
    und0 AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM edges WHERE u <> v
    )"""
    ]
    for i in range(KCORE_PEELS):
        parts.append(f""",
    deg{i} AS (
      SELECT x, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT a AS x FROM und{i} UNION ALL SELECT b FROM und{i}) t
      GROUP BY x
    ),
    keep{i} AS MATERIALIZED (SELECT x FROM deg{i} WHERE c >= {KCORE_K}),
    und{i + 1} AS MATERIALIZED (
      SELECT e.a, e.b FROM und{i} e
      WHERE EXISTS (SELECT 1 FROM keep{i} k WHERE k.x = e.a)
        AND EXISTS (SELECT 1 FROM keep{i} k WHERE k.x = e.b)
    )""")
    last = KCORE_PEELS
    parts.append(f""",
    fdeg AS (
      SELECT x, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT a AS x FROM und{last} UNION ALL SELECT b FROM und{last}) t
      GROUP BY x
    ),
    allnodes AS (
      SELECT DISTINCT x
      FROM (SELECT a AS x FROM und0 UNION ALL SELECT b FROM und0) t
    )
    SELECT n.x AS node,
           coalesce(f.c, 0) AS core_degree,
           coalesce(f.c, 0) >= {KCORE_K} AS in_{KCORE_K}core
    FROM allnodes n LEFT JOIN fdeg f ON f.x = n.x
    """)
    return "".join(parts)


@declared("kcore_membership", oracle=_kcore_sql())
def kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core decomposition of the undirected nation trade graph by
    iterative peeling: repeatedly delete nodes of degree < 3 until the
    fixpoint; survivors form the 3-core, the standard dense-subgraph
    backbone (Seidman 1983) that pagerank/triangle analyses restrict to
    when the periphery is noise.

    Peeling is non-monotone (a deletion lowers neighbors' degrees), so
    no single recursive CTE expresses it; both engines unroll a FIXED
    {KCORE_PEELS}-round peel -- more rounds than this graph ever needs
    (the pytest pins that one extra peel is a no-op), and extra rounds
    are exact no-ops at the fixpoint.  The fact scan builds the
    dimension-bounded edge list in ONE distributed aggregation; the peel
    then runs DRIVER-SIDE over the collected <=|nations|^2 edges (the
    shapley lattice discipline) -- the previous shape paid a degree agg
    + two semi-joins + an eager checkpoint PER ROUND for a 25-node
    graph.  All-integer outputs; at web scale the peel goes back to
    distributed degree-filter rounds.
    """
    raw = _collect_trade_edges(spark, sf_dir)
    edges = {(min(r.u, r.v), max(r.u, r.v)) for r in raw if r.u != r.v}
    all_nodes = sorted({x for e in edges for x in e})
    cur = set(edges)
    for _ in range(KCORE_PEELS):
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {x for x, c in deg.items() if c >= KCORE_K}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    fdeg: dict[int, int] = {}
    for a, b in cur:
        fdeg[a] = fdeg.get(a, 0) + 1
        fdeg[b] = fdeg.get(b, 0) + 1
    return spark.createDataFrame(
        [
            (x, fdeg.get(x, 0), fdeg.get(x, 0) >= KCORE_K)
            for x in all_nodes
        ],
        f"node bigint, core_degree bigint, in_{KCORE_K}core boolean",
    )


@declared(
    "trade_graph_bfs_depths",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY s.s_nationkey, c.c_nationkey
    ),
    se AS (
      SELECT u, v FROM (
        SELECT u, v,
               row_number() OVER (PARTITION BY u ORDER BY w DESC, v) AS r
        FROM edges
      ) WHERE r <= 2
    ),
    walk(node, d) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION
      SELECT CAST(e.v AS BIGINT), wk.d + 1
      FROM walk wk JOIN se e ON e.u = wk.node WHERE wk.d < 25
    )
    SELECT n.n_name AS nation, CAST(b.d AS INT) AS depth
    FROM (SELECT node, min(d) AS d FROM walk GROUP BY node) b
    JOIN nation n ON n.n_nationkey = b.node
    """,
)
def trade_graph_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-path depths from nation 0 over the TOP-2-PARTNER
    trade graph: each nation keeps directed edges only to its two
    heaviest trading partners (self-loops dropped, tiebreak partner key
    asc), giving the sparse preferred-supplier network; depth = minimum
    hops along preferred links -- the "supply-chain reach" question, and
    the unweighted-shortest-path member of the iterative-graph family
    (`pagerank_loop` = eigenvector, `widest_two_hop_trade` = bottleneck,
    this = hop distance).  The top-k sparsification is what makes BFS
    non-trivial here: the raw trade graph is near-complete (everything
    depth 1), the top-2 graph has depth-3 chains.

    The fact scan builds the dimension-bounded weighted edge list in ONE
    distributed aggregation; the BFS fixpoint then runs DRIVER-SIDE over
    the collected <=|nations|^2 rows (the shapley 16-mask discipline: a
    lattice bounded by a dimension table costs zero jobs to iterate) --
    the previous per-round join+checkpoint+probe loop paid 2 Spark jobs
    per hop for a 25-node graph.  All-integer, bit-identical to the
    recursive-CTE oracle.  At web scale (corpus-sized node set) the
    rounds go back to distributed frontier joins -- sssp_fixed is that
    loop.
    """
    rows = _collect_trade_edges(spark, sf_dir)
    by_u: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        if r.u != r.v:
            by_u.setdefault(r.u, []).append((-r.w, r.v))
    adj: dict[int, list[int]] = {
        u: [v for _, v in sorted(lst)[:2]] for u, lst in by_u.items()
    }
    dist = {0: 0}
    frontier = [0]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):  # noqa: B020
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    nation = load_table(spark, sf_dir, "nation")
    out = spark.createDataFrame(
        sorted(dist.items()), "node bigint, d bigint"
    )
    return out.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        out.node == F.col("n_nationkey"),
    ).select(F.col("n_name").alias("nation"), F.col("d").cast("int").alias("depth"))


@declared(
    "hits_hubs_authorities",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_EDGES_SQL}),
    a1 AS MATERIALIZED (
      SELECT v AS node, CAST(sum(w) AS BIGINT) * 1000000 AS raw
      FROM edges GROUP BY v
    ),
    a1n AS MATERIALIZED (
      SELECT node,
             CAST((1000000 * raw) // (SELECT sum(raw) FROM a1) AS BIGINT)
               AS a FROM a1
    ),
    h1 AS MATERIALIZED (
      SELECT e.u AS node, CAST(sum(e.w * a1n.a) AS BIGINT) AS raw
      FROM edges e JOIN a1n ON a1n.node = e.v GROUP BY e.u
    ),
    h1n AS MATERIALIZED (
      SELECT node,
             CAST((1000000 * raw) // (SELECT sum(raw) FROM h1) AS BIGINT)
               AS h FROM h1
    ),
    a2 AS MATERIALIZED (
      SELECT e.v AS node, CAST(sum(e.w * h1n.h) AS BIGINT) AS raw
      FROM edges e JOIN h1n ON h1n.node = e.u GROUP BY e.v
    ),
    a2n AS MATERIALIZED (
      SELECT node,
             CAST((1000000 * raw) // (SELECT sum(raw) FROM a2) AS BIGINT)
               AS a FROM a2
    ),
    h2 AS MATERIALIZED (
      SELECT e.u AS node, CAST(sum(e.w * a2n.a) AS BIGINT) AS raw
      FROM edges e JOIN a2n ON a2n.node = e.v GROUP BY e.u
    ),
    h2n AS MATERIALIZED (
      SELECT node,
             CAST((1000000 * raw) // (SELECT sum(raw) FROM h2) AS BIGINT)
               AS h FROM h2
    )
    SELECT n.n_name AS nation, h2n.h AS hub_ppm, a2n.a AS auth_ppm
    FROM h2n JOIN a2n USING (node)
    JOIN nation n ON n.n_nationkey = h2n.node
    """,
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999), 2 unrolled mutual-reinforcement iterations
    over the weighted nation trade graph: authority(v) = sum of hub
    scores shipping INTO v, hub(u) = sum of authority scores u ships TO
    -- the directed complement of `pagerank_nations` (which measures a
    single stationary flow; HITS separates "big exporter to important
    markets" from "big import market").

    Sum-normalized in integer ppm each half-step ((1e6*raw) DIV
    sum(raw), all positive, floor division) so every iteration is
    bit-identical cross-engine -- the pagerank_nations discipline; a
    float HITS diverges in ulps after one normalization.

    The fact scan builds the dimension-bounded edge list in ONE
    distributed aggregation; the four half-steps then run DRIVER-SIDE
    over the collected <=|nations|^2 edges (the shapley lattice
    discipline) -- the previous unrolled-in-plan form paid 4 broadcast
    builds + 3 eager checkpoints for a 25-node graph.  At real graph
    scale the half-steps go back to broadcast joins over a partitioned
    edge list.
    """
    raw_edges = _collect_trade_edges(spark, sf_dir)

    def norm(raw: dict[int, int]) -> dict[int, int]:
        t = sum(raw.values())
        return {x: (1000000 * r) // t for x, r in raw.items()}

    a_raw: dict[int, int] = {}
    for e in raw_edges:
        a_raw[e.v] = a_raw.get(e.v, 0) + e.w * 1000000
    a_n = norm(a_raw)
    h_raw: dict[int, int] = {}
    for e in raw_edges:
        if e.v in a_n:
            h_raw[e.u] = h_raw.get(e.u, 0) + e.w * a_n[e.v]
    h_n = norm(h_raw)
    a_raw = {}
    for e in raw_edges:
        if e.u in h_n:
            a_raw[e.v] = a_raw.get(e.v, 0) + e.w * h_n[e.u]
    a_n = norm(a_raw)
    h_raw = {}
    for e in raw_edges:
        if e.v in a_n:
            h_raw[e.u] = h_raw.get(e.u, 0) + e.w * a_n[e.v]
    h_n = norm(h_raw)
    nation = load_table(spark, sf_dir, "nation")
    both = sorted(set(h_n) & set(a_n))
    out = spark.createDataFrame(
        [(x, h_n[x], a_n[x]) for x in both],
        "node bigint, h bigint, a bigint",
    )
    return out.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        out.node == F.col("n_nationkey"),
    ).select(
        F.col("n_name").alias("nation"),
        F.col("h").alias("hub_ppm"),
        F.col("a").alias("auth_ppm"),
    )


@declared(
    "clustering_coefficient_nations",
    oracle="""
    WITH edges AS MATERIALIZED (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY s.s_nationkey, c.c_nationkey
    ),
    se AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT u, v,
               row_number() OVER (PARTITION BY u ORDER BY w DESC, v) AS r
        FROM edges
      ) WHERE r <= 3
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM se
    ),
    tri AS MATERIALIZED (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tric AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS n_tri
      FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
      GROUP BY node
    ),
    deg AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
      GROUP BY node
    )
    SELECT n.n_name AS nation, deg.d AS degree,
           CAST(coalesce(tric.n_tri, 0) AS BIGINT) AS n_triangles,
           CAST((2000000 * coalesce(tric.n_tri, 0))
                // (deg.d * (deg.d - 1)) AS BIGINT) AS cc_ppm
    FROM deg
    LEFT JOIN tric ON tric.node = deg.node
    JOIN nation n ON n.n_nationkey = deg.node
    WHERE deg.d >= 2
    """,
)
def clustering_coefficient_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per nation over the undirected
    TOP-3-PARTNER trade graph: cc(v) = 2*triangles(v) / (deg(v) choose
    2) * 2 -- how much of each nation's trading neighborhood trades
    among itself.  The per-node refinement of `triangle_count_nations`
    (global count, near-complete raw graph) on the sparsified graph
    where the statistic is informative; with `strength_assortativity`
    it gives the two standard structure diagnostics.

    Triangles enumerate once via the ordered-wedge join (a<b
    orientation) and are credited to ALL THREE corners by a 3-way
    union; degree comes from the same undirected edge list.  cc is
    integer ppm with the binomial denominator cross-multiplied --
    all-integer, isolated/degree-1 nodes excluded identically.

    Cost: one fact scan into the dimension-bounded edge list
    (checkpointed; top-k window + undirected dedup + wedge self-joins
    and degree rollup all run on <=3|nations| rows).
    """
    edges = _trade_edges(spark, sf_dir).filter(F.col("u") != F.col("v"))
    from pyspark.sql.window import Window as _W

    rk = _W.partitionBy("u").orderBy(F.desc("w"), F.asc("v"))
    und = (
        edges.withColumn("r", F.row_number().over(rk))
        .filter(F.col("r") <= 3)
        .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)  # wedge joins x3 + degree rollup
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(F.broadcast(e2), F.col("e2.a") == F.col("e1.b"))
        .join(
            F.broadcast(e3),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
        .localCheckpoint(eager=True)  # three corner projections
    )
    tric = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        deg.join(F.broadcast(tric), "node", "left")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            deg.node == F.col("n_nationkey"),
        )
        .filter(F.col("d") >= 2)
        .select(
            F.col("n_name").alias("nation"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_triangles"),
            F.expr(
                "CAST((2000000 * coalesce(n_tri, 0)) DIV (d * (d - 1))"
                " AS BIGINT)"
            ).alias("cc_ppm"),
        )
    )


@declared(
    "trade_edge_drift",
    oracle="""
    WITH thr AS (
      SELECT CAST((min(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
                   + max(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
                   + 1) // 2 AS BIGINT) AS mid_day
      FROM orders
    ),
    base AS (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(sum(CASE WHEN CAST(floor(epoch(o.o_orderdate)) AS BIGINT)
                                // 86400 < t.mid_day
                           THEN 1 ELSE 0 END) AS BIGINT) AS w1,
             CAST(sum(CASE WHEN CAST(floor(epoch(o.o_orderdate)) AS BIGINT)
                                // 86400 < t.mid_day
                           THEN 0 ELSE 1 END) AS BIGINT) AS w2
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      CROSS JOIN thr t
      GROUP BY s.s_nationkey, c.c_nationkey
    ),
    scored AS (
      SELECT u, v, w1, w2,
             CASE WHEN w2 > w1 THEN 1 WHEN w2 < w1 THEN -1 ELSE 0 END
               AS direction,
             CAST((1000000 * abs(w2 - w1)) // (w1 + w2) AS BIGINT)
               AS drift_ppm
      FROM base WHERE w1 + w2 >= 20
    )
    SELECT u, v, w1, w2, direction, drift_ppm
    FROM (
      SELECT *, row_number() OVER (ORDER BY drift_ppm DESC, u, v) AS rnk
      FROM scored
    ) WHERE rnk <= 15
    """,
)
def trade_edge_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain shift detection: for every nation trade edge, lineitem
    volume in the first vs second half of the order-date range, ranked by
    relative drift -- the edge-level generalization of
    `value_drift_histogram` (which watches one value column) applied to
    the graph: "which trade relationships grew or collapsed?"

    The calendar split point is the integer midpoint of the global
    order-day range (one tiny scalar broadcast onto the fact rows before
    aggregation -- never a second pass to tag halves).  Drift is
    integer ppm on abs(w2-w1) with a separate sign column (signed
    integer division differs trunc-vs-floor across engines -- the
    abs+direction split avoids the hazard); thin edges (<20 lineitems)
    are excluded identically.  Top-15 total-ordered.

    Cost: the standard edge derivation (one orderkey shuffle + two
    broadcast dims) with the half-tag folded INTO the same aggregate as
    two conditional sums -- same plan shape as `_trade_edges`, zero
    extra passes; the rank window runs on the <=625-row edge dim.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    oday = F.expr("to_unix_timestamp(o_orderdate) DIV 86400")
    thr = orders.agg(
        ((F.min(oday) + F.max(oday) + 1) / 2).cast("bigint").alias("mid_day")
    )
    base = (
        li.join(
            orders.select("o_orderkey", "o_custkey", oday.alias("oday")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .crossJoin(F.broadcast(thr))
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(
            F.sum(F.when(F.col("oday") < F.col("mid_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("w1"),
            F.sum(F.when(F.col("oday") < F.col("mid_day"), 0).otherwise(1))
            .cast("bigint")
            .alias("w2"),
        )
    )
    scored = base.filter(F.col("w1") + F.col("w2") >= 20).select(
        "u",
        "v",
        "w1",
        "w2",
        F.when(F.col("w2") > F.col("w1"), 1)
        .when(F.col("w2") < F.col("w1"), -1)
        .otherwise(0)
        .alias("direction"),
        F.expr(
            "CAST((1000000 * abs(w2 - w1)) DIV (w1 + w2) AS BIGINT)"
        ).alias("drift_ppm"),
    )
    from pyspark.sql.window import Window as _W

    w = _W.orderBy(F.desc("drift_ppm"), F.asc("u"), F.asc("v"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 15)
        .select("u", "v", "w1", "w2", "direction", "drift_ppm")
    )


# ---------------------------------------------------------------------------
# Sparse top-2-partner undirected graph, shared by the link-prediction and
# community queries below (same sparsification as trade_graph_bfs_depths:
# the raw trade graph is near-complete, so "non-adjacent pair" and
# "community" are only meaningful on the preferred-partner subgraph).

_SPARSE_UND_SQL = """
    edges AS MATERIALIZED (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY s.s_nationkey, c.c_nationkey
    ),
    se AS MATERIALIZED (
      SELECT u, v, w FROM (
        SELECT u, v, w,
               row_number() OVER (PARTITION BY u ORDER BY w DESC, v) AS r
        FROM edges
      ) WHERE r <= 2
    ),
    und AS MATERIALIZED (
      SELECT a, b, CAST(max(w) AS BIGINT) AS w FROM (
        SELECT u AS a, v AS b, w FROM se
        UNION ALL
        SELECT v AS a, u AS b, w FROM se
      ) GROUP BY a, b
    )
"""


def _sparse_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized top-2-partner trade graph as (a, b, w) with both
    directions present; w = max of the two directional weights.
    Checkpointed eagerly: every caller feeds it to 2+ join aliases (the
    CLAUDE.md shared-consumer rule), and it is dimension-bounded
    (<= 4*|nations| rows) so materialization is O(dims)."""
    from pyspark.sql.window import Window as _W

    edges = _trade_edges(spark, sf_dir).filter(F.col("u") != F.col("v"))
    rk = _W.partitionBy("u").orderBy(F.desc("w"), F.asc("v"))
    se = (
        edges.withColumn("r", F.row_number().over(rk))
        .filter(F.col("r") <= 2)
        .select("u", "v", "w")
    )
    return (
        se.select(F.col("u").alias("a"), F.col("v").alias("b"), "w")
        .unionByName(se.select(F.col("v").alias("a"), F.col("u").alias("b"), "w"))
        .groupBy("a", "b")
        .agg(F.max("w").cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )


def link_prediction(und: DataFrame) -> DataFrame:
    """Link-prediction scores for NON-adjacent node pairs of an undirected
    graph given as (a, b, w) with both directions present: common-neighbor
    count, Jaccard overlap of neighbor sets (ppm), and the Resource
    Allocation index sum(1/deg(z)) over common neighbors z, in exact
    integer ppm (1000000 DIV deg -- no float, so bit-identical on any
    engine and order-independent under Spark's parallel sum).

    Shape: neighbor-list self-join on the shared endpoint (the same
    wedge join as triangle counting), minus the adjacency via left-anti.
    Cost is sum of deg(z)^2 -- bounded by the top-k sparsification, the
    same reason production link prediction runs on pruned graphs.
    """
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    x = und.select(F.col("a").alias("xa"), F.col("b").alias("z"))
    y = und.select(F.col("a").alias("ya"), F.col("b").alias("z2"))
    zdeg = deg.select(F.col("node").alias("zn"), F.col("deg").alias("zdeg"))
    cand = (
        x.join(
            F.broadcast(y),
            (F.col("z") == F.col("z2")) & (F.col("xa") < F.col("ya")),
        )
        .join(F.broadcast(zdeg), F.col("z") == F.col("zn"))
        .groupBy(F.col("xa").alias("a"), F.col("ya").alias("b"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
            F.sum(F.expr("1000000 DIV zdeg")).cast("bigint").alias("ra_ppm"),
        )
    )
    nonadj = cand.join(F.broadcast(und.select("a", "b")), ["a", "b"], "left_anti")
    da = deg.select(F.col("node").alias("na_"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("nb_"), F.col("deg").alias("deg_b"))
    return (
        nonadj.join(F.broadcast(da), F.col("a") == F.col("na_"))
        .join(F.broadcast(db), F.col("b") == F.col("nb_"))
        .select(
            "a",
            "b",
            "common_neighbors",
            F.expr(
                "CAST(1000000 * common_neighbors"
                " DIV (deg_a + deg_b - common_neighbors) AS BIGINT)"
            ).alias("jaccard_ppm"),
            "ra_ppm",
        )
    )


@declared(
    "link_prediction_scores",
    oracle=f"""
    WITH {_SPARSE_UND_SQL},
    deg AS MATERIALIZED (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
            FROM und GROUP BY a),
    cand AS MATERIALIZED (
      SELECT x.a AS a, y.a AS b, CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(1000000 // dz.deg) AS BIGINT) AS ra_ppm
      FROM und x JOIN und y ON x.b = y.b AND x.a < y.a
      JOIN deg dz ON dz.node = x.b
      GROUP BY x.a, y.a
    ),
    nonadj AS MATERIALIZED (
      SELECT c.a, c.b, c.common_neighbors, c.ra_ppm
      FROM cand c LEFT JOIN und e ON e.a = c.a AND e.b = c.b
      WHERE e.a IS NULL
    )
    SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
           q.common_neighbors,
           CAST(1000000 * q.common_neighbors
                // (da.deg + db.deg - q.common_neighbors) AS BIGINT)
             AS jaccard_ppm,
           q.ra_ppm
    FROM nonadj q
    JOIN deg da ON da.node = q.a
    JOIN deg db ON db.node = q.b
    JOIN nation na ON na.n_nationkey = q.a
    JOIN nation nb ON nb.n_nationkey = q.b
    """,
)
def link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the top-2-partner trade graph: for every
    non-adjacent nation pair sharing >= 1 preferred partner, the
    common-neighbor count, neighbor-set Jaccard (ppm), and Resource
    Allocation index (sum of 1000000 DIV deg(z) over shared partners) --
    the classic "which trade link forms next" triple (Liben-Nowell &
    Kleinberg).  All-integer scoring; graph family member alongside
    `trade_graph_bfs_depths` (same sparsification) and
    `triangle_count_nations` (same wedge join).

    Plan: one fact scan builds the dimension-bounded edge list
    (checkpointed once, consumed by four aliases); every downstream join
    is a broadcast over <= 4|nations| rows.
    """
    und = _sparse_und(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    scored = link_prediction(und)
    na = nation.select(
        F.col("n_nationkey").alias("ka"), F.col("n_name").alias("nation_a")
    )
    nb = nation.select(
        F.col("n_nationkey").alias("kb"), F.col("n_name").alias("nation_b")
    )
    return (
        scored.join(F.broadcast(na), F.col("a") == F.col("ka"))
        .join(F.broadcast(nb), F.col("b") == F.col("kb"))
        .select(
            "nation_a", "nation_b", "common_neighbors", "jaccard_ppm", "ra_ppm"
        )
    )


def sssp_fixed(dist0: DataFrame, edges_cost: DataFrame, iters: int) -> DataFrame:
    """Bellman-Ford single-source shortest paths, ``iters`` synchronous
    relaxation rounds: dist_k(v) = min(dist_{k-1}(v), min over in-edges
    (dist_{k-1}(u) + cost)).  ``dist0`` is (node, dist); ``edges_cost``
    is (u, v, cost), integer costs.  Returns only REACHED nodes (the
    BFS convention).  Each round localCheckpoints (lineage truncation)
    and broadcasts the edge list; iteration cost is graph-bounded."""
    ec = edges_cost.localCheckpoint(eager=True)
    dist = dist0.localCheckpoint(eager=True)
    for _ in range(iters):
        nxt = dist.join(F.broadcast(ec), dist.node == ec.u).select(
            F.col("v").alias("node"),
            (F.col("dist") + F.col("cost")).cast("bigint").alias("dist"),
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def _sssp_sql(iters: int) -> str:
    steps = []
    prev = "d0"
    for i in range(1, iters + 1):
        cur = f"d{i}"
        steps.append(
            f"""
    {cur} AS MATERIALIZED (
      SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT e.v AS node, p.dist + e.cost AS dist
        FROM {prev} p JOIN ec e ON e.u = p.node
      ) GROUP BY node
    )"""
        )
        prev = cur
    return f"""
    WITH edges AS MATERIALIZED (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY s.s_nationkey, c.c_nationkey
    ),
    ec AS MATERIALIZED (
      SELECT u, v, CAST(1 + 1000000 // w AS BIGINT) AS cost FROM edges
    ),
    d0 AS MATERIALIZED (
      SELECT CAST(n_nationkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
      FROM nation WHERE n_nationkey = 0
    ),{",".join(steps)}
    SELECT n.n_name AS nation, {prev}.dist AS min_cost
    FROM {prev} JOIN nation n ON n.n_nationkey = {prev}.node
    """


@declared("sssp_min_cost_trade", oracle=_sssp_sql(3))
def sssp_min_cost_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest path over the full directed trade
    graph: edge cost 1 + 1000000 DIV w (rarely-used links are expensive,
    heavy corridors cheap), 3 fixed Bellman-Ford rounds from nation 0 --
    the weighted complement of `trade_graph_bfs_depths` (hops) and
    `widest_two_hop_trade` (bottleneck): min-PLUS instead of min-hop or
    max-min.  Fixed iteration count keeps the oracle an unrolled CTE
    chain; the library `sssp_fixed` loop is the distributed
    to-convergence form for corpus-sized graphs.

    The fact scan builds the dimension-bounded edge list in ONE
    distributed aggregation; the 3 synchronous relaxation rounds then
    run DRIVER-SIDE over the collected <=|nations|^2 edges (the shapley
    lattice discipline) -- all-integer costs, so every round is
    bit-identical cross-engine.
    """
    raw = _collect_trade_edges(spark, sf_dir)
    ec = [
        (r.u, r.v, 1 + 1000000 // r.w) for r in raw if r.u != r.v
    ]
    dist = {0: 0}
    for _ in range(3):
        prev = dict(dist)
        for u, v, c in ec:
            if u in prev:
                cand = prev[u] + c
                if cand < dist.get(v, cand + 1):
                    dist[v] = cand
        # synchronous rounds: relaxations read the PREVIOUS round's
        # vector (dist_k(v) = min(dist_{k-1}(v), min_u dist_{k-1}(u)+c))
    nation = load_table(spark, sf_dir, "nation")
    out = spark.createDataFrame(
        sorted(dist.items()), "node bigint, dist bigint"
    )
    return out.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        out.node == F.col("n_nationkey"),
    ).select(F.col("n_name").alias("nation"), F.col("dist").alias("min_cost"))


def lpa_step(labels: DataFrame, undw: DataFrame) -> DataFrame:
    """One synchronous label-propagation round: each node adopts the label
    with the highest total incident edge weight among its neighbors'
    CURRENT labels (tie-break: smaller label).  ``labels`` is (node,
    label); ``undw`` is (a, b, w) with both directions present.  Isolated
    nodes keep their label.  Deterministic: weighted argmax with a total
    tie-break order, integer weights."""
    from pyspark.sql.window import Window as _W

    nb = labels.select(F.col("node").alias("nbn"), F.col("label").alias("nbl"))
    scored = (
        undw.join(F.broadcast(nb), F.col("b") == F.col("nbn"))
        .groupBy(F.col("a").alias("node"), F.col("nbl").alias("label"))
        .agg(F.sum("w").cast("bigint").alias("s"))
    )
    rk = _W.partitionBy("node").orderBy(F.desc("s"), F.asc("label"))
    upd = (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("node", F.col("label").alias("new_label"))
    )
    return labels.join(F.broadcast(upd), "node", "left").select(
        "node", F.coalesce("new_label", "label").cast("bigint").alias("label")
    )


_LPA_STEP_SQL = """
    s{i} AS MATERIALIZED (
      SELECT e.a AS node, l.label, CAST(sum(e.w) AS BIGINT) AS s
      FROM und e JOIN l{p} l ON l.node = e.b
      GROUP BY e.a, l.label
    ),
    u{i} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY s DESC, label) AS rk
        FROM s{i}
      ) WHERE rk = 1
    ),
    l{i} AS MATERIALIZED (
      SELECT l{p}.node, CAST(coalesce(u{i}.label, l{p}.label) AS BIGINT) AS label
      FROM l{p} LEFT JOIN u{i} ON u{i}.node = l{p}.node
    )"""


@declared(
    "community_lpa_two_step",
    oracle=f"""
    WITH {_SPARSE_UND_SQL},
    l0 AS MATERIALIZED (
      SELECT n_nationkey AS node, CAST(n_nationkey AS BIGINT) AS label
      FROM nation
    ),{_LPA_STEP_SQL.format(i=1, p=0)},{_LPA_STEP_SQL.format(i=2, p=1)}
    SELECT n.n_name AS nation, l2.label AS community,
           CAST(count(*) OVER (PARTITION BY l2.label) AS BIGINT)
             AS community_size
    FROM l2 JOIN nation n ON n.n_nationkey = l2.node
    """,
)
def community_lpa_two_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007), 2 fixed rounds over the top-2-partner undirected trade
    graph: every nation starts in its own community, then twice adopts
    the weighted-majority label of its preferred partners (tie-break:
    min label).  The declared fixed unroll mirrors `pagerank_nations` /
    `kmeans_lloyd_two_step`; the library `lpa_step` is the distributed
    loop body for corpus-sized graphs.  Deterministic: integer weights +
    total tie-break order (float-scored LPA is not reproducible).

    The fact scan builds the dimension-bounded weighted graph in ONE
    distributed aggregation; the two label rounds then run DRIVER-SIDE
    over the collected <=4|nations| symmetrized rows (the shapley
    lattice discipline) -- the previous shape paid two broadcast joins,
    a window, and an eager checkpoint per round for a 25-node graph.
    """
    raw = _collect_trade_edges(spark, sf_dir)
    by_u: dict[int, list[tuple[int, int]]] = {}
    for r in raw:
        if r.u != r.v:
            by_u.setdefault(r.u, []).append((-r.w, r.v))
    undw: dict[tuple[int, int], int] = {}
    for u, lst in by_u.items():
        for negw, v in sorted(lst)[:2]:
            w = -negw
            undw[(u, v)] = max(undw.get((u, v), 0), w)
            undw[(v, u)] = max(undw.get((v, u), 0), w)
    nation = load_table(spark, sf_dir, "nation")
    nodes = [r.n_nationkey for r in nation.select("n_nationkey").collect()]
    lbl = {x: x for x in nodes}
    for _ in range(2):
        score: dict[int, dict[int, int]] = {}
        for (a, b), w in undw.items():
            sc = score.setdefault(a, {})
            l = lbl[b]
            sc[l] = sc.get(l, 0) + w
        lbl = {
            x: (
                min(sc := score[x], key=lambda k: (-sc[k], k))
                if x in score
                else lbl[x]
            )
            for x in nodes
        }
    sizes: dict[int, int] = {}
    for x in nodes:
        sizes[lbl[x]] = sizes.get(lbl[x], 0) + 1
    out = spark.createDataFrame(
        [(x, lbl[x], sizes[lbl[x]]) for x in sorted(nodes)],
        "node bigint, community bigint, community_size bigint",
    )
    return out.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        out.node == F.col("n_nationkey"),
    ).select(
        F.col("n_name").alias("nation"), "community", "community_size"
    )


def _harmonic_sql(iters: int) -> str:
    """All-pairs hop distances via ``iters`` synchronous min-plus rounds
    over the top-2-partner graph (unit hop cost), then harmonic sums."""
    steps = []
    prev = "d0"
    for i in range(1, iters + 1):
        cur = f"d{i}"
        steps.append(
            f"""
    {cur} AS MATERIALIZED (
      SELECT src, node, CAST(min(d) AS BIGINT) AS d FROM (
        SELECT src, node, d FROM {prev}
        UNION ALL
        SELECT p.src, e.v AS node, p.d + 1 AS d
        FROM {prev} p JOIN se e ON e.u = p.node
      ) GROUP BY src, node
    )"""
        )
        prev = cur
    return f"""
    WITH edges AS MATERIALIZED (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY s.s_nationkey, c.c_nationkey
    ),
    se AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT u, v,
               row_number() OVER (PARTITION BY u ORDER BY w DESC, v) AS r
        FROM edges
      ) WHERE r <= 2
    ),
    d0 AS MATERIALIZED (
      SELECT CAST(n_nationkey AS BIGINT) AS src,
             CAST(n_nationkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS d
      FROM nation
    ),{",".join(steps)}
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_reached,
           CAST(sum(1000000 // f.d) AS BIGINT) AS harmonic_ppm
    FROM {prev} f JOIN nation n ON n.n_nationkey = f.src
    WHERE f.d > 0
    GROUP BY n.n_name
    """


@declared("harmonic_centrality_trade", oracle=_harmonic_sql(6))
def harmonic_centrality_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality over the top-2-partner trade graph: for each
    nation, sum of 1/d(u,v) over all nations it can REACH in <= 6 hops
    (integer ppm per reciprocal, unreachable pairs contribute 0 by the
    harmonic convention -- the reason harmonic beats closeness on
    disconnected graphs, Boldi & Vigna 2014).  The centrality member of
    the graph family: PageRank ranks by mass flow, k-core by cohesion,
    harmonic by proximity-to-everything.

    The fact scan builds the dimension-bounded weighted edge list in ONE
    distributed aggregation; the all-pairs <=6-hop BFS then runs
    DRIVER-SIDE over the collected <=|nations|^2 rows (the shapley
    lattice discipline) -- the previous shape paid a join + re-min + an
    eager checkpoint per hop round over a |V|^2 pair frame.  All-integer
    (1000000 DIV d per pair), bit-identical to the CTE-chain oracle.  At
    real scale this is HyperBall territory (per-node HLL counters); the
    exact driver loop is right for dimension-sized graphs.
    """
    rows = _collect_trade_edges(spark, sf_dir)
    by_u: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        if r.u != r.v:
            by_u.setdefault(r.u, []).append((-r.w, r.v))
    adj: dict[int, list[int]] = {
        u: [v for _, v in sorted(lst)[:2]] for u, lst in by_u.items()
    }
    nation = load_table(spark, sf_dir, "nation")
    srcs = [
        r.n_nationkey for r in nation.select("n_nationkey").collect()
    ]
    out_rows = []
    for src in srcs:
        dist = {src: 0}
        frontier = [src]
        for _ in range(6):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        reached = [d for n, d in dist.items() if d > 0]
        if reached:
            out_rows.append(
                (src, len(reached), sum(1000000 // d for d in reached))
            )
    out = spark.createDataFrame(
        sorted(out_rows), "src bigint, n_reached bigint, harmonic_ppm bigint"
    )
    return out.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        out.src == F.col("n_nationkey"),
    ).select(
        F.col("n_name").alias("nation"), "n_reached", "harmonic_ppm"
    )


K_TRUSS = 5  # every surviving edge sits in >= K_TRUSS - 2 = 3 triangles

# DuckDB-oracle trap: DuckDB INLINES multiply-referenced CTEs, so any CTE
# chain that touches the lineitem-scale edge join >= 2 levels deep
# re-evaluates it exponentially many times (observed: >80 GB spill at
# sf0.1).  Every CTE below is therefore AS MATERIALIZED, and the grouped
# undirected-edge subquery is hoisted into ONE materialized `undw` leg
# instead of being inlined twice.
_UNDW_SQL = """
      SELECT least(u, v) AS a, greatest(u, v) AS b,
             CAST(sum(w) AS BIGINT) AS wu
      FROM edges WHERE u <> v GROUP BY 1, 2
"""

_UND_ABOVE_MEAN_SQL = """
      SELECT e.a, e.b FROM undw e
      CROSS JOIN (
        SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(wu) AS BIGINT) AS tot
        FROM undw
      ) s
      WHERE e.wu * s.m >= s.tot
"""

_TRUSS_SUP_SQL = """
      SELECT a, b, CAST(count(*) AS BIGINT) AS sup FROM (
        SELECT t.x AS a, t.y AS b FROM {tri} t
        UNION ALL SELECT t.y AS a, t.z AS b FROM {tri} t
        UNION ALL SELECT t.x AS a, t.z AS b FROM {tri} t
      ) GROUP BY a, b
"""

_TRI_SQL = """
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM {und} e1
      JOIN {und} e2 ON e2.a = e1.b
      JOIN {und} e3 ON e3.a = e1.a AND e3.b = e2.b
"""


@declared(
    "ktruss_peel_two_step",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_EDGES_SQL}),
    undw AS MATERIALIZED ({_UNDW_SQL}),
    und0 AS MATERIALIZED ({_UND_ABOVE_MEAN_SQL}),
    tri1 AS MATERIALIZED ({_TRI_SQL.format(und='und0')}),
    sup1 AS MATERIALIZED ({_TRUSS_SUP_SQL.format(tri='tri1')}),
    und1 AS MATERIALIZED (
      SELECT u.a, u.b FROM und0 u JOIN sup1 s ON s.a = u.a AND s.b = u.b
      WHERE s.sup >= {K_TRUSS - 2}
    ),
    tri2 AS MATERIALIZED ({_TRI_SQL.format(und='und1')}),
    sup2 AS MATERIALIZED ({_TRUSS_SUP_SQL.format(tri='tri2')}),
    und2 AS MATERIALIZED (
      SELECT u.a, u.b, s.sup FROM und1 u
      JOIN sup2 s ON s.a = u.a AND s.b = u.b
      WHERE s.sup >= {K_TRUSS - 2}
    )
    SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
           e.sup AS support
    FROM und2 e
    JOIN nation na ON na.n_nationkey = e.a
    JOIN nation nb ON nb.n_nationkey = e.b
    """,
)
def ktruss_peel_two_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss backbone (Cohen 2008) of the above-mean-weight trade
    graph, k = 5: iteratively peel every edge supported by
    fewer than k-2 triangles; what survives is the cohesive core where
    every tie is embedded in multiple closed triads -- the edge-level
    strengthening of kcore_membership (degree can be faked by one hub,
    triangle support cannot).  Two peel rounds unrolled, the fixpoint
    on this graph at every test SF (same two-step discipline as
    community_lpa_two_step / kmeans_lloyd_two_step; production loops
    until no edge drops, ~O(log) rounds with the same per-round plan).

    Per round: triangles from the ordered wedge walk (each counted
    once, triangle_count_nations machinery), support = the 3 edge
    projections counted, then a support filter.  Edge derivation is ONE
    distributed fact pass; the peel rounds then run DRIVER-SIDE over
    the collected nation-bounded edge set (the shapley lattice
    discipline -- the previous shape paid a wedge join, a support agg,
    and an eager checkpoint per round for a 25-node graph; at corpus
    scale the same rounds go back to distributed wedge joins).  Support
    counts change as edges peel, which is why support is RECOMPUTED per
    round rather than decremented (decrementing needs ordered cascades;
    recompute is embarrassingly parallel).
    """
    raw = _collect_trade_edges(spark, sf_dir)
    undw: dict[tuple[int, int], int] = {}
    for r in raw:
        if r.u != r.v:
            e = (min(r.u, r.v), max(r.u, r.v))
            undw[e] = undw.get(e, 0) + r.w
    m, tot = len(undw), sum(undw.values())
    cur = {e for e, wu in undw.items() if wu * m >= tot}

    def peel(edges: set[tuple[int, int]]) -> dict[tuple[int, int], int]:
        nxt: dict[int, list[int]] = {}
        for a, b in edges:
            nxt.setdefault(a, []).append(b)
        sup: dict[tuple[int, int], int] = {}
        for x, y in edges:
            for z in nxt.get(y, ()):
                if (x, z) in edges:
                    for e in ((x, y), (y, z), (x, z)):
                        sup[e] = sup.get(e, 0) + 1
        return {
            e: c for e, c in sup.items() if c >= K_TRUSS - 2
        }

    und1 = set(peel(cur))
    final = peel(und1)
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = spark.createDataFrame(
        [(a, b, c) for (a, b), c in sorted(final.items())],
        "a bigint, b bigint, support bigint",
    )
    return (
        out.join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("a"),
                                   F.col("n_name").alias("nation_a"))),
            "a",
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("b"),
                                   F.col("n_name").alias("nation_b"))),
            "b",
        )
        .select("nation_a", "nation_b", "support")
    )
