"""Similarity search over embeddings: norms, brute-force k-NN, LSH ANN,
cosine near-dup.

Extension operators (build contract SS2.11): approximate-nearest-neighbor
over an ``array<float>`` column.  Brute force is the correctness baseline;
random-hyperplane LSH bucketing is the scale path (candidates come from an
equi-join on bucket ids instead of a cross join).

Float determinism: every dot product is an explicit left-to-right fold in
double precision (``aggregate``/``zip_with`` in Spark, ``list_transform``
+ ``list_sum`` in DuckDB), so both engines produce bit-identical scores
and the rank/threshold cuts agree.  Engine-internal similarity built-ins
(e.g. DuckDB list_cosine_similarity) are avoided in oracles because their
summation order/precision is unspecified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.registry import (
    ORACLES as _REGISTRY_ORACLES,
)
from etl_rf_matrix_controller_spark.operators.aggregates import HDR_SUBS
from etl_rf_matrix_controller_spark.operators.pipeline import hash_bucket
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

DIM = 64  # fixed embedding dim (FIXTURES.md)
N_QUERIES = 5  # vec_id < 5 are the probe queries
TOP_K = 3
N_PLANES = 8  # LSH hyperplanes -> 256 buckets
# Knuth multiplicative constant drives the pseudo-random hyperplanes;
# integer-exact on both engines, so bucket ids hash-match.
LSH_MULT = 2654435761
LSH_MOD = 4294967296


def dot_double(a: Column, b: Column) -> Column:
    """Deterministic double dot product: zip -> multiply -> sequential sum."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


@declared(
    "embed_norm",
    oracle=f"""
    SELECT vec_id, label,
           sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS l2_norm
    FROM embeddings
    """,
)
def embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: L2 norm per embedding -- the canonical vector-math projection.
    Pure higher-order fold, no shuffle, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.sqrt(dot_double(F.col("embedding"), F.col("embedding"))).alias("l2_norm"),
    )


@declared(
    "knn_brute_force",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             {_DOT_SQL.format(a='q.qe', b='c.embedding')} AS score
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, rnk, score
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 baseline: exact top-k by dot product, brute force.

    The query set (a handful of probes) broadcasts; every candidate
    partition scores its rows against all queries locally and only the
    per-partition survivors reach the top-k window -- O(n_candidates)
    scans, no candidate shuffle.  This is the correctness baseline the
    ANN variant (ann_lsh_topk) is measured against.
    """
    return knn_topk_df(load_table(spark, sf_dir, "embeddings"))


def _topk(scored: DataFrame, top_k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "cand_id", "rnk", "score")
    )


def knn_topk_df(
    emb: DataFrame, n_queries: int = N_QUERIES, top_k: int = TOP_K
) -> DataFrame:
    """Core of knn_brute_force over an arbitrary (vec_id, embedding)
    frame; queries are vec_id < n_queries.  Exposed so the recall gate
    (tests/test_ann_recall.py) can drive it on a clustered corpus."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            dot_double(F.col("qe"), F.col("ce")).alias("score"),
        )
    )
    return _topk(scored, top_k)


# w(j, i) = pseudo-random hyperplane weight in [-1, 1), integer-derived.
_BUCKET_SPARK = f"""
aggregate(sequence(0, {N_PLANES - 1}), CAST(0 AS BIGINT), (acc, j) ->
  acc * 2 + IF(
    aggregate(sequence(1, {DIM}), CAST(0 AS DOUBLE), (a, i) ->
      a + CAST(element_at({{col}}, i) AS DOUBLE) *
          (CAST((CAST(j * {DIM} + i - 1 AS BIGINT) * {LSH_MULT}) % {LSH_MOD} AS DOUBLE)
           / 2147483648.0 - 1.0)
    ) > 0.0, CAST(1 AS BIGINT), CAST(0 AS BIGINT)))
"""

_BUCKET_DUCK = f"""
list_sum(list_transform(generate_series(0, {N_PLANES - 1}), j ->
  CASE WHEN list_sum(list_transform(generate_series(1, {DIM}), i ->
         CAST({{col}}[i] AS DOUBLE) *
         (CAST((CAST(j * {DIM} + i - 1 AS BIGINT) * {LSH_MULT}) % {LSH_MOD} AS DOUBLE)
          / 2147483648.0 - 1.0))) > 0.0
       THEN (1::BIGINT << ({N_PLANES - 1} - j)) ELSE 0::BIGINT END))
"""


@declared(
    "ann_lsh_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             CAST({_BUCKET_DUCK.format(col='embedding')} AS BIGINT) AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qe, bucket
      FROM b WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             {_DOT_SQL.format(a='q.qe', b='c.embedding')} AS score
      FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, rnk, score
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 scale path: random-hyperplane LSH bucketing, top-k within bucket.

    Eight sign bits of hyperplane projections give a 256-bucket code; a
    query only scores candidates sharing its bucket, replacing the
    brute-force scan with an equi-join on the bucket id -- at 100 TB this
    is the difference between O(n) per query and O(n / buckets), and the
    bucket join shuffles uniformly (hash-like codes).  Recall tradeoff:
    queries in sparse buckets return < k (or zero) neighbors; production
    raises recall by probing adjacent codes or unioning multiple tables.
    """
    return lsh_topk_df(load_table(spark, sf_dir, "embeddings"))


def lsh_topk_df(
    emb: DataFrame,
    multiprobe: bool = False,
    n_queries: int = N_QUERIES,
    top_k: int = TOP_K,
) -> DataFrame:
    """Core of ann_lsh_topk / ann_lsh_multiprobe over an arbitrary
    (vec_id, embedding) frame.  multiprobe=True additionally probes the
    N_PLANES buckets at Hamming distance 1 from each query's code."""
    b = emb.select(
        "vec_id",
        "embedding",
        F.expr(_BUCKET_SPARK.format(col="embedding")).cast("bigint").alias("bucket"),
    )
    q = b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    if multiprobe:
        probe_codes = F.expr(
            f"concat(array(qbucket), transform(sequence(0, {N_PLANES - 1}), "
            "j -> qbucket ^ shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))))"
        )
        q = q.select(
            "query_id", "qe", F.explode(probe_codes).alias("qbucket")
        )
    scored = b.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        dot_double(F.col("qe"), F.col("embedding")).alias("score"),
    )
    if multiprobe:
        scored = scored.distinct()
    return _topk(scored, top_k)


@declared(
    "ann_lsh_multiprobe",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             CAST({_BUCKET_DUCK.format(col='embedding')} AS BIGINT) AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qe, bucket
      FROM b WHERE vec_id < {N_QUERIES}
    ),
    probes AS (
      SELECT query_id, qe, p.pb AS probe_bucket
      FROM (
        SELECT query_id, qe,
               list_concat([bucket],
                 list_transform(generate_series(0, {N_PLANES - 1}),
                                j -> xor(bucket, (1::BIGINT << j)))) AS pbs
        FROM q
      ) plist, unnest(pbs) AS p(pb)
    ),
    scored AS (
      SELECT DISTINCT p.query_id, c.vec_id AS cand_id,
             {_DOT_SQL.format(a='p.qe', b='c.embedding')} AS score
      FROM probes p
      JOIN b c ON c.bucket = p.probe_bucket AND c.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, rnk, score
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 recall knob: multiprobe LSH -- each query also probes the 8
    buckets at Hamming distance 1 from its own code (flip one sign bit),
    scanning ~9/256 of the data instead of ~1/256.  Measured recall@3 on
    the (near-orthogonal, worst-case) testdata: 0.07 single-probe -> see
    BENCHNOTES for the multiprobe lift.  The probe expansion is a 9x
    fan-out of the tiny query dim; candidates still arrive via the bucket
    equi-join, never a scan."""
    return lsh_topk_df(load_table(spark, sf_dir, "embeddings"), multiprobe=True)


_DIST_SQL = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
    "* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
)


def _sq_dist(a: Column, b: Column) -> Column:
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


@declared(
    "ann_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id FROM (
        SELECT v.vec_id, v.embedding, c.cent_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_DIST_SQL.format(a='v.embedding', b='c.ce')}, c.cent_id
               ) AS rn
        FROM embeddings v CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qe, cent_id
      FROM assigned WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, a.vec_id AS cand_id,
             {_DOT_SQL.format(a='q.qe', b='a.embedding')} AS score
      FROM q JOIN assigned a
        ON a.cent_id = q.cent_id AND a.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, rnk, score
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4c: IVF-flavored ANN -- coarse quantizer + inverted lists.

    Centroids are a deterministic sample of the data (every 100th vector
    -- a stand-in for k-means centroids, which aren't oracle-reproducible);
    every vector joins its nearest centroid's inverted list; queries probe
    only their own list.  nprobe=1 here; production probes the nearest
    few lists to trade cost for recall (ivf_topk_df keeps that knob for
    the recall gate and tools/ann_recall.py).

    Round 7: the declared query consumes the PERSISTENT bucketed IVF
    index (ivfpq_index) instead of re-running the corpus x centroids
    assignment fold per query -- the FAISS index-on-disk posture: probe
    cost is a 3-column scan of the bucketed table + one broadcast join.
    Values are byte-identical to the rebuild path (result_manifest pins
    this); ivf_topk_df remains the from-scratch spelling for arbitrary
    frames."""
    idx = ivfpq_index(spark, sf_dir)
    q = idx.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("cent_id").alias("q_cent"),
    )
    scored = idx.join(
        F.broadcast(q),
        (F.col("cent_id") == F.col("q_cent"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        dot_double(F.col("qe"), F.col("embedding")).alias("score"),
    )
    return _topk(scored, TOP_K)


def ivf_topk_df(
    emb: DataFrame,
    cent_mod: int = 100,
    nprobe: int = 1,
    n_queries: int = N_QUERIES,
    top_k: int = TOP_K,
) -> DataFrame:
    """Core of ann_ivf_topk over an arbitrary (vec_id, embedding) frame:
    every cent_mod-th vector is a centroid, vectors join their nearest
    centroid's inverted list, queries probe their nprobe nearest lists
    (nprobe=1 is the declared-query shape; raising it is the recall
    knob the gate test exercises)."""
    # The frame feeds three consumers (centroid sample, list assignment,
    # query ranking); checkpoint it once so the table is scanned once, not
    # four times.  At 100 TB this materialization IS the IVF build step:
    # the assignment pass is a write-once index artifact, exactly the
    # FAISS layout; probes afterwards touch only their lists.
    emb = emb.select("vec_id", "embedding").localCheckpoint(eager=True)
    cents = emb.filter(F.col("vec_id") % cent_mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    dist = _sq_dist(F.col("embedding"), F.col("ce"))
    w = Window.partitionBy("vec_id").orderBy(dist.asc(), F.col("cent_id").asc())
    ranked = emb.crossJoin(F.broadcast(cents)).withColumn(
        "rn", F.row_number().over(w)
    )
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "embedding", "cent_id"
    )
    q = ranked.filter(
        (F.col("vec_id") < n_queries) & (F.col("rn") <= nprobe)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("cent_id").alias("q_cent"),
    )
    scored = assigned.join(
        F.broadcast(q),
        (F.col("cent_id") == F.col("q_cent")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        dot_double(F.col("qe"), F.col("embedding")).alias("score"),
    )
    if nprobe > 1:
        scored = scored.distinct()
    return _topk(scored, top_k)


# The HDR log-linear grid's guaranteed relative error (bucket width /
# bucket floor <= 1/HDR_SUBS = 6.25%) in ppm: the audited envelope.
HDR_BOUND_PPM = 62500
_PCTL_QS = [500000, 900000]  # p50 / p90, ppm


@declared(
    "approx_percentile_prices",
    oracle=f"""
    WITH vals AS (
      SELECT l_returnflag AS rf,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    bk AS (
      SELECT rf, v, l_orderkey, l_linenumber,
             (length(bin(v)) - 1) * {{HDR_SUBS}}
             + ((v - (CAST(1 AS BIGINT) << (length(bin(v)) - 1)))
                * {{HDR_SUBS}}) // (CAST(1 AS BIGINT) << (length(bin(v)) - 1))
               AS bucket
      FROM vals
    ),
    hist AS (
      SELECT rf, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM bk GROUP BY rf, bucket
    ),
    cum AS (
      SELECT rf, bucket, cnt,
             CAST(sum(cnt) OVER (PARTITION BY rf ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM hist
    ),
    n AS (SELECT rf, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY rf),
    qs AS (SELECT unnest([{{QS}}]) AS q_ppm),
    tgt AS (
      SELECT n.rf, q_ppm, (q_ppm * n.n + 999999) // 1000000 AS target, n.n
      FROM qs CROSS JOIN n
    ),
    pick AS (
      SELECT rf, q_ppm, target, n, bucket, cum - cnt AS below FROM (
        SELECT t.rf, t.q_ppm, t.target, t.n, c.bucket, c.cnt, c.cum,
               row_number() OVER (PARTITION BY t.rf, t.q_ppm
                                  ORDER BY c.bucket) AS rk
        FROM tgt t JOIN cum c ON c.rf = t.rf AND c.cum >= t.target
      ) WHERE rk = 1
    ),
    est AS (
      SELECT rf, q_ppm, target, n, bucket, below,
             (CAST(1 AS BIGINT) << (bucket // {{HDR_SUBS}}))
             + ((bucket % {{HDR_SUBS}})
                * (CAST(1 AS BIGINT) << (bucket // {{HDR_SUBS}})))
               // {{HDR_SUBS}} AS est_lo_c
      FROM pick
    ),
    refined AS (
      SELECT e.rf, e.q_ppm, r.v AS exact_c
      FROM est e
      JOIN (
        SELECT p.rf, p.q_ppm, b.v,
               row_number() OVER (PARTITION BY p.rf, p.q_ppm
                                  ORDER BY b.v, b.l_orderkey, b.l_linenumber)
                 AS rn
        FROM bk b
        JOIN pick p ON p.rf = b.rf AND b.bucket = p.bucket
      ) r ON r.rf = e.rf AND r.q_ppm = e.q_ppm
         AND r.rn = e.target - e.below
    )
    SELECT e.rf AS l_returnflag, e.q_ppm, e.n AS n_rows,
           e.est_lo_c, f.exact_c,
           CAST((1000000 * abs(e.est_lo_c - f.exact_c)) // f.exact_c
             AS BIGINT) AS rel_err_ppm,
           (1000000 * abs(e.est_lo_c - f.exact_c)) // f.exact_c
             <= {HDR_BOUND_PPM} AS within_hdr_bound
    FROM est e JOIN refined f ON f.rf = e.rf AND f.q_ppm = e.q_ppm
    """.format(
        # the SHARED constant, not a literal: a future HDR_SUBS change
        # cannot silently desync engine vs oracle (ADVICE r8)
        HDR_SUBS=HDR_SUBS,
        QS=", ".join(str(q) for q in _PCTL_QS),
    ),
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles per return flag, AUDITED (round-8 promotion
    from the rows-only check): the deterministic HDR log-linear bucket
    sketch (hdr_quantile_sketch's grid, grouped by l_returnflag) read
    out at p50/p90, with the EXACT rank value recovered by the in-bucket
    refine and the relative error emitted in ppm against the <= 1/16
    grid guarantee -- every column DuckDB-oracled.  The engine-internal
    ``percentile_approx`` spelling shares the plan shape (mergeable
    per-group sketch) but its KLL bytes are engine-private, which is
    what kept this row rows-only through round 7.

    Scale: histogram is one map-side-combinable groupBy over ~1.5k fixed
    buckets per group; refine touches only the picked buckets' rows."""
    from pyspark.sql.window import Window

    from etl_rf_matrix_controller_spark.operators.aggregates import (
        HDR_SUBS,
        hdr_bucket_expr,
    )

    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v"),
        "l_orderkey",
        "l_linenumber",
    ).localCheckpoint(eager=True)  # histogram + refine share one scan
    bk = vals.select(
        "rf", "v", "l_orderkey", "l_linenumber",
        F.expr(hdr_bucket_expr("v")).alias("bucket"),
    )
    hist = bk.groupBy("rf", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = (
        Window.partitionBy("rf")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wc).cast("bigint"))
    n = vals.groupBy("rf").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _PCTL_QS])).alias("q_ppm")
    )
    tgt = qs.crossJoin(F.broadcast(n)).select(
        "rf", "q_ppm",
        F.expr("(q_ppm * n + 999999) DIV 1000000").alias("target"), "n",
    )
    wp = Window.partitionBy("rf", "q_ppm").orderBy("bucket")
    pick = (
        F.broadcast(tgt)
        .join(cum, ["rf"])
        .filter(F.col("cum") >= F.col("target"))
        .withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select(
            "rf", "q_ppm", "target", "n", "bucket",
            (F.col("cum") - F.col("cnt")).alias("below"),
        )
        .localCheckpoint(eager=True)  # feeds est AND the refine join
    )
    est = pick.select(
        "rf", "q_ppm", "target", "n", "bucket", "below",
        F.expr(
            f"(CAST(1 AS BIGINT) << (bucket DIV {HDR_SUBS}))"
            f" + ((bucket % {HDR_SUBS})"
            f" * (CAST(1 AS BIGINT) << (bucket DIV {HDR_SUBS})))"
            f" DIV {HDR_SUBS}"
        ).alias("est_lo_c"),
    )
    wr = Window.partitionBy("rf", "q_ppm").orderBy(
        "v", "l_orderkey", "l_linenumber"
    )
    refined = (
        bk.join(
            F.broadcast(pick.select("rf", "q_ppm", "bucket", "target", "below")),
            ["rf", "bucket"],
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == F.col("target") - F.col("below"))
        .select("rf", "q_ppm", F.col("v").alias("exact_c"))
    )
    err = F.expr("(1000000 * abs(est_lo_c - exact_c)) DIV exact_c")
    return (
        est.join(F.broadcast(refined), ["rf", "q_ppm"])
        .select(
            F.col("rf").alias("l_returnflag"),
            "q_ppm",
            F.col("n").alias("n_rows"),
            "est_lo_c",
            "exact_c",
            err.cast("bigint").alias("rel_err_ppm"),
            (err <= HDR_BOUND_PPM).alias("within_hdr_bound"),
        )
    )


# Near-dup corpus: every vec_id % 20 == 0 re-emitted verbatim with +100000.
_VEC_CORPUS_SQL = """
      SELECT vec_id, label, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, label, embedding
      FROM embeddings WHERE vec_id % 20 = 0
"""


@declared(
    "cosine_near_dup_pairs",
    oracle=f"""
    WITH corpus AS ({_VEC_CORPUS_SQL}),
    n AS (
      SELECT vec_id, label, embedding,
             sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS nrm
      FROM corpus
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
             {_DOT_SQL.format(a='a.embedding', b='b.embedding')}
               / (a.nrm * b.nrm) AS cosine
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, label, cosine
    FROM pairs WHERE cosine >= 0.99
    """,
)
def cosine_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5e: embedding-cosine near-duplicate pairs, blocked by LSH sign-bucket.

    The driver's embeddings are near-orthogonal (max natural within-label
    cosine ~0.45), so duplicates are synthesized deterministically
    (verbatim copies, +100000 ids) and the 0.99 threshold sits far from
    any float boundary.  The candidate join keys on the random-hyperplane
    sign-bucket (the same 8-bit code as ann_lsh_topk) with Hamming-1
    multiprobe on one side, NOT on label: bucket population is
    data-independent-bounded (~n/256 expected per bucket, and the plane
    count is a knob), so the pair join is never quadratic within a data
    block -- the property the label block lacked at 100x.  Pairs at
    cosine >= 0.99 agree on all/most sign bits (exact copies on all), so
    the probe set covers them; the verify stage (exact double-fold cosine
    + label equality) is unchanged and the DuckDB oracle stays the
    label-blocked ground truth, making every gate run a recall check of
    the bucketing itself.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    copies = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", "embedding"
    )
    return cosine_pairs_df(spark, emb.unionByName(copies))


def cosine_pairs_df(
    spark: SparkSession,
    corpus: DataFrame,
    block: str = "bucket",
    threshold: float = 0.99,
) -> DataFrame:
    """Near-dup pair join over a (vec_id, label, embedding) corpus.

    block="bucket" (default): candidates pair via an equi-join on the LSH
    sign-bucket, with the left side probing its own code plus the
    N_PLANES codes at Hamming distance 1 (flip one sign bit).  The probe
    codes of one row are pairwise distinct and the right side keys on its
    single code, so each (vec_a, vec_b) pair joins at most once -- no
    distinct pass needed.  block="label": the legacy quadratic-in-block
    form, kept only so tests/test_ann_recall.py can assert the bucket
    path's recall against it.

    The norm+bucket projection is consumed by both join sides, so it is
    localCheckpointed once (CLAUDE.md rule); checkpointed frames carry no
    stats, so the join strategy is pinned with a shuffle_hash hint -- the
    honest 100 TB choice too (both sides are corpus-sized; hash-partition
    by bucket, hash-join, never sort-merge and never broadcast).
    """
    n = (
        corpus.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id",
            "label",
            "embedding",
            F.sqrt(dot_double(F.col("embedding"), F.col("embedding"))).alias("nrm"),
            F.expr(_BUCKET_SPARK.format(col="embedding"))
            .cast("bigint")
            .alias("bucket"),
        )
        .localCheckpoint(eager=True)
    )
    a = n.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("nrm_a"),
        F.col("bucket").alias("bucket_a"),
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nrm_b"),
        F.col("bucket").alias("bucket_b"),
    )
    if block == "bucket":
        probe_codes = F.expr(
            f"concat(array(bucket_a), transform(sequence(0, {N_PLANES - 1}), "
            "j -> bucket_a ^ shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))))"
        )
        a = a.select(
            "vec_a", "label_a", "ea", "nrm_a", F.explode(probe_codes).alias("probe")
        )
        cond = (F.col("probe") == F.col("bucket_b")) & (
            F.col("vec_a") < F.col("vec_b")
        )
    else:
        cond = (F.col("label_a") == F.col("label_b")) & (
            F.col("vec_a") < F.col("vec_b")
        )
    cosine = dot_double(F.col("ea"), F.col("eb")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    return (
        a.join(b.hint("shuffle_hash"), cond)
        .filter(F.col("label_a") == F.col("label_b"))
        .select(
            "vec_a",
            "vec_b",
            F.col("label_a").alias("label"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


@declared(
    "label_centroid_components",
    oracle="""
    SELECT label,
           CAST(i - 1 AS BIGINT) AS pos,
           list_sum(list(CAST(embedding[i] AS DOUBLE) ORDER BY vec_id))
             / count(*) AS centroid_comp
    FROM embeddings, generate_series(1, 64) AS g(i)
    GROUP BY label, i
    """,
)
def label_centroid_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension) --
    the class-prototype computation behind IVF coarse quantizers and
    nearest-centroid classifiers.

    posexplode fans each vector into (label, pos, comp); per (label,
    pos) the component sum is a SEQUENTIAL double fold over the
    vec_id-sorted collected values (matches DuckDB's ordered list_sum
    bit-for-bit -- float components are NOT clean decimals, so the
    scaled-integer convention does not apply; ordered folding is the
    repo's float-parity tool, cf. dot_double).  The mean divides two
    bit-identical operands; emitted RAW per the no-round convention.
    Per-group collection is |vectors in label| values; the 100 TB path
    chunks the fold with a fixed-size tree aggregate, same determinism.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # Narrow parquet (1-3 splits) fans out 64x: rebalance BEFORE the
    # explode so the fan-out and fold use every core (CLAUDE.md rule).
    emb = emb.repartition(spark.sparkContext.defaultParallelism)
    exploded = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "comp")
    )
    ordered_sum = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct("vec_id", "comp"))),
            lambda s: s.comp.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return exploded.groupBy("label", F.col("pos").cast("bigint").alias("pos")).agg(
        (ordered_sum / F.count(F.lit(1))).alias("centroid_comp")
    )


@declared(
    "vector_quantize_i8",
    oracle="""
    WITH comps AS (
      SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
             CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, generate_series(1, 64) AS g(i)
    ),
    stats AS (
      SELECT pos, min(v) AS mn, max(v) AS mx FROM comps GROUP BY pos
    )
    SELECT c.vec_id, c.pos,
           CAST(CASE WHEN s.mx = s.mn THEN 0
                     ELSE floor(((c.v - s.mn) / (s.mx - s.mn)) * 255.0)
                END AS BIGINT) AS code
    FROM comps c JOIN stats s ON s.pos = c.pos
    """,
)
def vector_quantize_i8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-dimension min-max) int8 quantization of the embedding
    table -- the 4x storage/bandwidth compression step before an ANN
    index build.

    Two-pass by design: pass 1 reduces to a 64-row (pos, min, max) stats
    table -- partial->final, tiny; pass 2 re-expands and quantizes with
    the stats BROADCAST back.  The window alternative (min/max OVER
    (PARTITION BY pos)) would shuffle the full component fan-out into
    |dims|=64 partitions -- a parallelism ceiling and a skew magnet at
    100 TB -- so the double scan of the (narrow) embeddings table is the
    right trade here, the mirror image of the single-scan rule for
    per-KEY correlations.  Quantization arithmetic is fixed-order double
    ops on float32-exact values, identical in both engines; degenerate
    dims (mx == mn) code to 0.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # Same repartition-before-fan-out rule as label_centroid_components;
    # paid once, feeds both the stats pass and the quantize pass.
    emb = emb.repartition(spark.sparkContext.defaultParallelism)
    comps = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "comp")
    ).select(
        "vec_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("comp").cast("double").alias("v"),
    )
    stats = comps.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint")).otherwise(
        F.floor(((F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn"))) * 255.0)
    )
    return comps.join(F.broadcast(stats), "pos").select(
        "vec_id", "pos", code.cast("bigint").alias("code")
    )


@declared(
    "embedding_quantile_normalize",
    oracle="""
    WITH flat0 AS (
      -- select-list unnests zip positionally (lateral generate_series
      -- cannot see the embedding column)
      SELECT vec_id,
             unnest(generate_series(0, len(embedding) - 1)) AS dim0,
             unnest(embedding) AS v
      FROM embeddings
    ),
    flat AS (SELECT vec_id, CAST(dim0 AS BIGINT) AS dim, v FROM flat0),
    ranked AS (
      SELECT vec_id, dim,
             CAST(row_number() OVER (
               PARTITION BY dim ORDER BY v, vec_id) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY dim) AS BIGINT) AS n
      FROM flat
    )
    SELECT vec_id, dim,
           CAST(((rn - 1) * 1000000) // greatest(n - 1, 1) AS BIGINT)
             AS q_ppm
    FROM ranked
    """,
)
def embedding_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension quantile normalization: map each embedding component
    to its empirical quantile rank in that dimension (0..1e6 ppm) -- the
    rank-based whitening that makes dimensions comparable regardless of
    their marginal distributions (and the exact form of what quantile
    sketches approximate).

    Emitting the INTEGER rank quantile (ties broken by vec_id) rather
    than the float value sidesteps any cross-engine float formatting;
    the source floats only ever feed the sort comparator, where identical
    bits give identical order.  Plan: posexplode fans each vector into
    (dim, value) rows; ONE shuffle partitions by dim (64 even
    partitions); rank + count are two window passes over the same
    partitioning.  At 100 TB swap row_number for a per-dim histogram
    cumulative rank (the doc_char_length_mad trick) to avoid the
    per-dim global sort.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", F.col("dim").cast("bigint").alias("dim"), "v")
    wr = Window.partitionBy("dim").orderBy("v", "vec_id")
    wn = Window.partitionBy("dim")
    ranked = flat.select(
        "vec_id",
        "dim",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    return ranked.select(
        "vec_id",
        "dim",
        F.expr("CAST(((rn - 1) * 1000000) DIV greatest(n - 1, 1) AS BIGINT)").alias(
            "q_ppm"
        ),
    )


_QABS_SPARK = "aggregate(embedding, 0.0D, (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
_QABS_DUCK = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
_QCODE_SPARK = (
    "transform(embedding, x -> CAST(floor((CAST(x AS DOUBLE) * 127.0) / maxabs)"
    " AS BIGINT))"
)
_QCODE_DUCK = (
    "list_transform(embedding, x -> CAST(floor((CAST(x AS DOUBLE) * 127.0)"
    " / maxabs) AS BIGINT))"
)


@declared(
    "knn_quantized_i8",
    oracle=f"""
    WITH q8 AS (
      SELECT vec_id, maxabs / 127.0 AS scale, {_QCODE_DUCK} AS codes
      FROM (SELECT vec_id, embedding, {_QABS_DUCK} AS maxabs FROM embeddings)
      WHERE maxabs > 0
    ),
    q AS (
      SELECT vec_id AS query_id, scale AS qs, codes AS qc
      FROM q8 WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             (q.qs * c.scale) * CAST(list_sum(list_transform(
                generate_series(1, {DIM}), i -> q.qc[i] * c.codes[i]))
               AS DOUBLE) AS score
      FROM q JOIN q8 c ON c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, rnk, score
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def knn_quantized_i8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 quantized path: top-k by int8 dot product -- the production
    memory/bandwidth trade (4x smaller vectors, integer SIMD dots).

    Per-vector symmetric quantization: code_i = floor(v_i * 127 / max|v|),
    score = (scale_a * scale_b) * integer_dot.  The inner loop is EXACT
    integer arithmetic (bit-identical cross-engine; only the two scale
    multiplies are float, in a fixed order), and at 100 TB the candidate
    scan moves 64 bytes/vector instead of 256 -- the quantized corpus is
    what actually fits in cluster memory.  Same broadcast-probe shape as
    knn_brute_force; recall retention vs the full-precision top-k is
    pinned by tests/test_ann_recall.py on the clustered corpus.
    """
    return quantized_knn_df(load_table(spark, sf_dir, "embeddings"))


def quantized_knn_df(
    emb: DataFrame, n_queries: int = N_QUERIES, top_k: int = TOP_K
) -> DataFrame:
    """Core of knn_quantized_i8 over an arbitrary (vec_id, embedding)
    frame (exposed for the recall gate)."""
    q8 = (
        emb.select("vec_id", "embedding", F.expr(_QABS_SPARK).alias("maxabs"))
        .filter(F.col("maxabs") > 0)
        .select(
            "vec_id",
            (F.col("maxabs") / 127.0).alias("scale"),
            F.expr(_QCODE_SPARK).alias("codes"),
        )
    )
    q = q8.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("qs"),
        F.col("codes").alias("qc"),
    )
    int_dot = F.aggregate(
        F.zip_with(F.col("qc"), F.col("codes"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = (
        q8.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            ((F.col("qs") * F.col("scale")) * int_dot.cast("double")).alias(
                "score"
            ),
        )
    )
    return _topk(scored, top_k)


@declared(
    "semantic_dedup_keeper",
    oracle=f"""
    WITH corpus AS ({_VEC_CORPUS_SQL}),
    cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM corpus WHERE vec_id % 100 = 0
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id, cdist FROM (
        SELECT v.vec_id, v.embedding, c.cent_id,
               {_DIST_SQL.format(a='v.embedding', b='c.ce')} AS cdist,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_DIST_SQL.format(a='v.embedding', b='c.ce')},
                          c.cent_id
               ) AS rn
        FROM corpus v CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    keepers AS (
      SELECT cent_id, vec_id AS keeper_id, embedding AS ke FROM (
        SELECT cent_id, vec_id, embedding,
               row_number() OVER (PARTITION BY cent_id
                                  ORDER BY cdist, vec_id) AS krn
        FROM assigned
      ) t WHERE krn = 1
    )
    SELECT a.vec_id, a.cent_id,
           a.vec_id = k.keeper_id AS is_keeper,
           ({_DOT_SQL.format(a='a.embedding', b='k.ke')}
             / (sqrt({_DOT_SQL.format(a='a.embedding', b='a.embedding')})
                * sqrt({_DOT_SQL.format(a='k.ke', b='k.ke')})))
             AS cos_to_keeper,
           a.vec_id <> k.keeper_id AND
           ({_DOT_SQL.format(a='a.embedding', b='k.ke')}
             / (sqrt({_DOT_SQL.format(a='a.embedding', b='a.embedding')})
                * sqrt({_DOT_SQL.format(a='k.ke', b='k.ke')}))) >= 0.99
             AS is_semantic_dup
    FROM assigned a JOIN keepers k ON k.cent_id = a.cent_id
    """,
)
def semantic_dedup_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17 SemDeDup-style semantic dedup: cluster the corpus with the IVF
    coarse quantizer, elect each cluster's exemplar (closest to the
    centroid, vec_id tiebreak), and flag members whose cosine to the
    exemplar >= 0.99 as semantic duplicates to drop.

    The pruning join is members x exemplar (ONE row per cluster,
    broadcast) -- linear in corpus size, never a within-cluster pair
    explosion; that is the entire reason SemDeDup scales where pairwise
    cosine dedup cannot.  Runs over the corpus with synthesized verbatim
    copies (+100000 ids) so real dup groups exist; every distance/cosine
    is an explicit sequential fold (bit-identical cross-engine) and the
    0.99 cut sits far from any float boundary.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    copies = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", "embedding"
    )
    corpus = emb.unionByName(copies).select("vec_id", "embedding")
    cents = corpus.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    cdist = _sq_dist(F.col("embedding"), F.col("ce"))
    wv = Window.partitionBy("vec_id").orderBy(cdist.asc(), F.col("cent_id").asc())
    assigned = (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("cdist", cdist)
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cent_id", "cdist")
    )
    # The keeper election and the pruning join both consume `assigned`;
    # materialize the quantizer pass once.
    assigned = assigned.localCheckpoint(eager=False)
    wk = Window.partitionBy("cent_id").orderBy(
        F.col("cdist").asc(), F.col("vec_id").asc()
    )
    keepers = (
        assigned.withColumn("krn", F.row_number().over(wk))
        .filter(F.col("krn") == 1)
        .select(
            "cent_id",
            F.col("vec_id").alias("keeper_id"),
            F.col("embedding").alias("ke"),
        )
    )
    cos = dot_double(F.col("embedding"), F.col("ke")) / (
        F.sqrt(dot_double(F.col("embedding"), F.col("embedding")))
        * F.sqrt(dot_double(F.col("ke"), F.col("ke")))
    )
    return assigned.join(F.broadcast(keepers), "cent_id").select(
        "vec_id",
        "cent_id",
        (F.col("vec_id") == F.col("keeper_id")).alias("is_keeper"),
        cos.alias("cos_to_keeper"),
        ((F.col("vec_id") != F.col("keeper_id")) & (cos >= 0.99)).alias(
            "is_semantic_dup"
        ),
    )


# ---------------------------------------------------------------------------
# MMR re-ranking and IVF diagnostics
# ---------------------------------------------------------------------------

MMR_LAMBDA = "0.7e0"  # relevance weight (0.3 = diversity); e0 forces DOUBLE
MMR_POOL = 8  # candidate pool per query fed to the greedy re-rank
MMR_PICKS = 3

_MMR_CAND_SQL = f"""
    q AS (
      SELECT vec_id AS query_id, embedding AS qe
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id, c.embedding AS ce,
             {_DOT_SQL.format(a='q.qe', b='c.embedding')} AS rel
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ),
    cand AS (
      SELECT query_id, cand_id, ce, rel FROM (
        SELECT query_id, cand_id, ce, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand_id) AS rnk
        FROM scored
      ) t WHERE rnk <= {MMR_POOL}
    )
"""


@declared(
    "mmr_rerank_topk",
    oracle=f"""
    WITH {_MMR_CAND_SQL},
    p1 AS (
      SELECT query_id, cand_id, ce, rel FROM (
        SELECT query_id, cand_id, ce, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand_id) AS rn
        FROM cand
      ) t WHERE rn = 1
    ),
    s2 AS (
      SELECT c.query_id, c.cand_id, c.ce, c.rel,
             {MMR_LAMBDA} * c.rel - (1e0 - {MMR_LAMBDA})
               * {_DOT_SQL.format(a='c.ce', b='p1.ce')} AS mmr
      FROM cand c JOIN p1 ON c.query_id = p1.query_id
                         AND c.cand_id <> p1.cand_id
    ),
    p2 AS (
      SELECT query_id, cand_id, ce, mmr FROM (
        SELECT query_id, cand_id, ce, mmr,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY mmr DESC, cand_id) AS rn
        FROM s2
      ) t WHERE rn = 1
    ),
    s3 AS (
      SELECT c.query_id, c.cand_id, c.rel,
             {MMR_LAMBDA} * c.rel - (1e0 - {MMR_LAMBDA})
               * greatest({_DOT_SQL.format(a='c.ce', b='p1.ce')},
                          {_DOT_SQL.format(a='c.ce', b='p2.ce')}) AS mmr
      FROM cand c
      JOIN p1 ON c.query_id = p1.query_id AND c.cand_id <> p1.cand_id
      JOIN p2 ON c.query_id = p2.query_id AND c.cand_id <> p2.cand_id
    ),
    p3 AS (
      SELECT query_id, cand_id, mmr FROM (
        SELECT query_id, cand_id, mmr,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY mmr DESC, cand_id) AS rn
        FROM s3
      ) t WHERE rn = 1
    )
    SELECT query_id, CAST(1 AS INT) AS pick_rank, cand_id,
           {MMR_LAMBDA} * rel AS mmr_score
    FROM p1
    UNION ALL
    SELECT query_id, CAST(2 AS INT) AS pick_rank, cand_id, mmr AS mmr_score
    FROM p2
    UNION ALL
    SELECT query_id, CAST(3 AS INT) AS pick_rank, cand_id, mmr AS mmr_score
    FROM p3
    """,
)
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998):
    greedy top-{MMR_PICKS} from a {MMR_POOL}-candidate pool, trading
    relevance against redundancy -- mmr(c) = lambda*rel(c) -
    (1-lambda)*max_sim(c, picked).

    Greedy selection is inherently sequential, so like pagerank_nations
    the declared form unrolls the (fixed, small) pick count; each step is
    a window argmax over the candidate pool with the picked vectors
    broadcast back.  The EXPENSIVE part -- scoring the corpus and taking
    the top pool per query -- is the same broadcast-probe scan as
    knn_brute_force: at 100 TB the pool extraction is the only corpus
    pass, and the re-rank runs on pools of tens of rows per query
    (driver-scale work, kept distributed here for the contract).  Floats
    follow the dot_double fold convention -- bit-exact vs the oracle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            "ce",
            dot_double(F.col("qe"), F.col("ce")).alias("rel"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("cand_id"))
    # The pool feeds every greedy step under multiple join aliases;
    # checkpoint once (stat-less afterwards -> explicit broadcasts below).
    cand = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= MMR_POOL)
        .select("query_id", "cand_id", "ce", "rel")
        .localCheckpoint(eager=False)
    )
    lam = F.lit(0.7)
    div = F.lit(1.0) - lam

    def argmax(df: DataFrame, score_col: str) -> DataFrame:
        wa = Window.partitionBy("query_id").orderBy(
            F.desc(score_col), F.asc("cand_id")
        )
        return (
            df.withColumn("rn", F.row_number().over(wa))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    p1 = argmax(cand, "rel")
    s2 = cand.join(
        F.broadcast(
            p1.select(
                "query_id",
                F.col("cand_id").alias("p1_id"),
                F.col("ce").alias("p1e"),
            )
        ),
        "query_id",
    ).filter(F.col("cand_id") != F.col("p1_id"))
    s2 = s2.withColumn(
        "mmr", lam * F.col("rel") - div * dot_double(F.col("ce"), F.col("p1e"))
    )
    p2 = argmax(s2, "mmr")
    s3 = (
        cand.join(
            F.broadcast(
                p1.select(
                    "query_id",
                    F.col("cand_id").alias("p1_id"),
                    F.col("ce").alias("p1e"),
                )
            ),
            "query_id",
        )
        .join(
            F.broadcast(
                p2.select(
                    "query_id",
                    F.col("cand_id").alias("p2_id"),
                    F.col("ce").alias("p2e"),
                )
            ),
            "query_id",
        )
        .filter(
            (F.col("cand_id") != F.col("p1_id"))
            & (F.col("cand_id") != F.col("p2_id"))
        )
        .withColumn(
            "mmr",
            lam * F.col("rel")
            - div
            * F.greatest(
                dot_double(F.col("ce"), F.col("p1e")),
                dot_double(F.col("ce"), F.col("p2e")),
            ),
        )
    )
    p3 = argmax(s3, "mmr")
    pick = lambda df, k, score: df.select(  # noqa: E731
        "query_id",
        F.lit(k).cast("int").alias("pick_rank"),
        "cand_id",
        F.col(score).alias("mmr_score"),
    )
    return (
        pick(p1.withColumn("lam_rel", lam * F.col("rel")), 1, "lam_rel")
        .unionByName(pick(p2, 2, "mmr"))
        .unionByName(pick(p3, 3, "mmr"))
    )


@declared(
    "ivf_list_balance",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    assigned AS (
      SELECT vec_id, cent_id FROM (
        SELECT v.vec_id, c.cent_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_DIST_SQL.format(a='v.embedding', b='c.ce')}, c.cent_id
               ) AS rn
        FROM embeddings v CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    lists AS (
      SELECT cent_id, CAST(count(*) AS BIGINT) AS list_size
      FROM assigned GROUP BY cent_id
    )
    SELECT cent_id, list_size,
           CAST(list_size * 1000000
                // (sum(list_size) OVER ()) AS BIGINT) AS share_ppm
    FROM lists
    """,
)
def ivf_list_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF build diagnostic: inverted-list sizes and their corpus share.

    The operational health check for ann_ivf_topk -- probe cost is
    proportional to the probed list's size, so a skewed assignment
    (one hot list) silently turns nprobe=1 into a near-full scan.
    Round 7: reads the PERSISTENT bucketed index (ivfpq_index) -- a
    1-column scan + vocabulary-sized aggregate, literally the
    "by-product of index construction" the docstring always promised.
    """
    assigned = ivfpq_index(spark, sf_dir).select("vec_id", "cent_id")
    lists = assigned.groupBy("cent_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("list_size")
    )
    total = Window.partitionBy()
    return lists.select(
        "cent_id",
        "list_size",
        F.expr("list_size * 1000000")
        .cast("bigint")
        .alias("_num"),
        F.sum("list_size").over(total).alias("_den"),
    ).select(
        "cent_id",
        "list_size",
        F.expr("_num DIV _den").cast("bigint").alias("share_ppm"),
    )


HARD_NEG_K = 3


@declared(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id, c.label AS cand_label,
             {_DOT_SQL.format(a='q.qe', b='c.embedding')} AS score
      FROM q JOIN embeddings c
        ON c.vec_id <> q.query_id AND c.label <> q.qlabel
    ),
    ranked AS (
      SELECT query_id, cand_id, cand_label, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id) AS neg_rank
      FROM scored
    )
    SELECT query_id, CAST(neg_rank AS INT) AS neg_rank, cand_id,
           cand_label, score
    FROM ranked WHERE neg_rank <= {HARD_NEG_K}
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for contrastive training: per query, the top-k
    highest-scoring candidates with a DIFFERENT label -- the near-miss
    examples that make an embedding model actually learn a boundary
    (random negatives are trivially separable; see DPR / ANCE-style
    mining, both public work).

    Identical scale shape to knn_brute_force: queries broadcast, one
    candidate scan, label inequality fused into the join predicate so
    same-label rows never leave the scan, per-query top-k window.  At
    100 TB production mines from an ANN index instead of the full scan
    (swap in ann_lsh_topk's bucket join); the ranking contract here is
    the exact baseline that path is measured against.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("cand_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("cand_id") != F.col("query_id"))
            & (F.col("cand_label") != F.col("qlabel"))
        )
        .select(
            "query_id",
            "cand_id",
            "cand_label",
            dot_double(F.col("qe"), F.col("ce")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= HARD_NEG_K)
        .select(
            "query_id",
            F.col("neg_rank").cast("int").alias("neg_rank"),
            "cand_id",
            "cand_label",
            "score",
        )
    )


@declared(
    "centroid_similarity_matrix",
    oracle=f"""
    WITH cent AS ({{cent}}),
    vecs AS (
      SELECT label, list(centroid_comp ORDER BY pos) AS cvec
      FROM cent GROUP BY label
    ),
    n AS (
      SELECT label, cvec,
             sqrt({_DOT_SQL.format(a='cvec', b='cvec')}) AS nrm
      FROM vecs
    )
    SELECT a.label AS label_a, b.label AS label_b,
           {_DOT_SQL.format(a='a.cvec', b='b.cvec')} / (a.nrm * b.nrm)
             AS cosine
    FROM n a JOIN n b ON a.label < b.label
    """.format(cent=_REGISTRY_ORACLES["label_centroid_components"]),
)
def centroid_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between label centroids -- the class-confusability
    matrix (which labels' embedding clusters overlap) used to audit a
    taxonomy before nearest-centroid classification or IVF list design.

    Composes the declared label_centroid_components (its oracle is
    embedded, so the prototype definition cannot drift).  The k
    centroids are a k-row frame: reassembly is one tiny shuffle, and the
    k x k/2 pair join is a broadcast nested loop over single-digit rows
    -- at 100 TB the corpus pass is the centroid aggregation (linear,
    already shuffle-bounded inside label_centroid_components); this
    matrix stage is O(k^2) driver-trivial.  Determinism: centroid
    components are bit-identical cross-engine (ordered folds), so the
    dot/norm folds over them match exactly.
    """
    from etl_rf_matrix_controller_spark.operators.similarity import (
        label_centroid_components as _lcc,
    )

    cent = _lcc(spark, sf_dir)
    vecs = (
        cent.groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "centroid_comp"))),
                lambda s: s.centroid_comp,
            ).alias("cvec")
        )
        .select(
            "label",
            "cvec",
            F.sqrt(dot_double(F.col("cvec"), F.col("cvec"))).alias("nrm"),
        )
        .localCheckpoint(eager=True)
    )
    a = vecs.select(
        F.col("label").alias("label_a"),
        F.col("cvec").alias("va"),
        F.col("nrm").alias("nrm_a"),
    )
    b = vecs.select(
        F.col("label").alias("label_b"),
        F.col("cvec").alias("vb"),
        F.col("nrm").alias("nrm_b"),
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            (
                dot_double(F.col("va"), F.col("vb"))
                / (F.col("nrm_a") * F.col("nrm_b"))
            ).alias("cosine"),
        )
    )


@declared(
    "percentile_cont_prices",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ),
    ranked AS (
      SELECT l_returnflag, v,
             CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY v)
               AS BIGINT) AS rn
      FROM s
    ),
    nn AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY l_returnflag
    ),
    ps AS (
      SELECT l_returnflag, p,
             ((p * (n - 1)) // 4) + 1 AS lo_rn,
             (p * (n - 1)) % 4 AS rem
      FROM nn, unnest([CAST(1 AS BIGINT), CAST(2 AS BIGINT),
                       CAST(3 AS BIGINT)]) AS t(p)
    )
    SELECT ps.l_returnflag,
           'p' || CAST(ps.p * 25 AS VARCHAR) AS pct,
           (lo.v * (4 - ps.rem) + hi.v * ps.rem) / 4.0 / 100.0 AS price_cont
    FROM ps
    JOIN ranked lo ON lo.l_returnflag = ps.l_returnflag AND lo.rn = ps.lo_rn
    JOIN ranked hi ON hi.l_returnflag = ps.l_returnflag
                  AND hi.rn = ps.lo_rn + CASE WHEN ps.rem > 0 THEN 1 ELSE 0 END
    """,
)
def percentile_cont_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (percentile_cont-style) quartiles per return flag,
    integer-exact: engine-builtin percentile_cont interpolates in float
    (engine-divergent in final ulps), so the interpolation runs in
    scaled-integer space -- position p*(n-1)/4 splits into an integer
    rank and a /4 remainder, and the blended value
    (v_lo*(4-rem) + v_hi*rem)/4 is exact (prices are clean 2-decimal).

    Completes the percentile family: exact rank (percentile_disc_prices)
    / sketch (approx_percentile_prices) / exact interpolated (this).
    The ranked frame feeds both boundary lookups: checkpointed once,
    with the per-group window being the only sort -- at 100 TB the
    row_number rank is replaced by a merge of per-partition sorted runs
    or a two-pass count-below-boundary selection, same contract.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v"),
    )
    ranked = (
        s.withColumn(
            "rn",
            F.row_number()
            .over(Window.partitionBy("l_returnflag").orderBy("v"))
            .cast("bigint"),
        )
        .localCheckpoint(eager=True)
    )
    nn = s.groupBy("l_returnflag").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ps = (
        nn.select(
            "l_returnflag",
            F.explode(
                F.array(F.lit(1), F.lit(2), F.lit(3)).cast("array<bigint>")
            ).alias("p"),
            F.col("n"),
        )
        .select(
            "l_returnflag",
            "p",
            (F.expr("(p * (n - 1)) DIV 4") + 1).alias("lo_rn"),
            F.expr("(p * (n - 1)) % 4").alias("rem"),
        )
    )
    lo = ranked.select(
        F.col("l_returnflag").alias("rf_lo"), F.col("v").alias("v_lo"), "rn"
    )
    hi = ranked.select(
        F.col("l_returnflag").alias("rf_hi"),
        F.col("v").alias("v_hi"),
        F.col("rn").alias("rn_hi"),
    )
    hi_rn = F.col("lo_rn") + F.when(F.col("rem") > 0, 1).otherwise(0)
    return (
        lo.join(
            F.broadcast(ps),
            (F.col("rf_lo") == F.col("l_returnflag")) & (F.col("rn") == F.col("lo_rn")),
        )
        .join(
            hi.hint("shuffle_hash"),
            (F.col("rf_hi") == F.col("l_returnflag")) & (F.col("rn_hi") == hi_rn),
        )
        .select(
            "l_returnflag",
            F.concat(F.lit("p"), (F.col("p") * 25).cast("string")).alias("pct"),
            (
                (F.col("v_lo") * (4 - F.col("rem")) + F.col("v_hi") * F.col("rem"))
                / 4.0
                / 100.0
            ).alias("price_cont"),
        )
    )


GRAM_DIMS = 16  # declared form covers the leading 16 dims (136 cells)


@declared(
    "embedding_gram_matrix",
    oracle=f"""
    SELECT CAST(i AS BIGINT) AS pos_a, CAST(j AS BIGINT) AS pos_b,
           list_sum(list(CAST(embedding[i] AS DOUBLE)
                         * CAST(embedding[j] AS DOUBLE) ORDER BY vec_id))
             AS gram
    FROM embeddings,
         generate_series(1, {GRAM_DIMS}) AS g(i),
         generate_series(1, {GRAM_DIMS}) AS h(j)
    WHERE j >= i
    GROUP BY i, j
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix (X^T X) over the leading GRAM_DIMS (=16) embedding
    dimensions, upper triangle -- the covariance precursor every
    PCA/whitening/linear-probe step needs, and the distributed
    matrix-product shape (cf. cuboid-fused matrix engines, FuseME
    SIGMOD'22): each row contributes its local outer product, cells
    partial-aggregate.

    Determinism: per-cell sums are SEQUENTIAL double folds over
    vec_id-sorted products (the label_centroid_components pattern --
    embedding floats are not clean decimals, so scaled integers cannot
    apply; ordered folding is the float-parity tool).  The declared form
    covers 136 cells; the full 64-dim matrix is the same expression with
    GRAM_DIMS=64 (2080 cells), and at 100 TB the per-cell collect
    becomes a fixed-fanout tree aggregate, same determinism.  The pair
    fan-out is per-row (no shuffle until the cell aggregation) and
    cells are corpus-size-independent.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    emb = emb.repartition(spark.sparkContext.defaultParallelism)
    pairs = emb.select(
        "vec_id",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, {GRAM_DIMS}), i ->
                      transform(sequence(i, {GRAM_DIMS}), j ->
                        struct(CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
                               CAST(element_at(embedding, i) AS DOUBLE)
                               * CAST(element_at(embedding, j) AS DOUBLE)
                               AS prod))))"""
            )
        ).alias("c"),
    ).select("vec_id", "c.i", "c.j", "c.prod")
    ordered_sum = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct("vec_id", "prod"))),
            lambda s: s.prod.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return pairs.groupBy(
        F.col("i").alias("pos_a"), F.col("j").alias("pos_b")
    ).agg(ordered_sum.alias("gram"))


@declared(
    "gram_top_eigvec",
    oracle=f"""
    WITH tri AS ({{tri}}),
    m AS (
      SELECT pos_a AS i, pos_b AS j, gram FROM tri
      UNION ALL
      SELECT pos_b, pos_a, gram FROM tri WHERE pos_a <> pos_b
    ),
    v1 AS (
      SELECT i, list_sum(list(gram ORDER BY j)) AS v FROM m GROUP BY i
    ),
    mx AS (SELECT max(abs(v)) AS ma FROM v1),
    v1n AS (SELECT i, v1.v / mx.ma AS v FROM v1, mx),
    v2 AS (
      SELECT m.i, list_sum(list(m.gram * v1n.v ORDER BY m.j)) AS comp
      FROM m JOIN v1n ON v1n.i = m.j
      GROUP BY m.i
    )
    SELECT i AS pos, comp FROM v2
    """.format(tri=_REGISTRY_ORACLES["embedding_gram_matrix"]),
)
def gram_top_eigvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power-iteration steps toward the Gram matrix's top
    eigenvector (the first principal direction), from an all-ones seed
    with an infinity-norm rescale between steps -- the declared
    fixed-unroll form of iterative linear algebra.

    Cross-engine float exactness: every matrix-vector component is a
    SEQUENTIAL fold over j-sorted terms (Gram cells are themselves
    ordered folds, so both engines see bit-identical inputs), and the
    rescale divides by an identically-computed max -- no epsilon
    anywhere.  Scale: the corpus-sized Gram aggregation runs
    distributed; the iteration space is GRAM_DIMS^2 cells, so the two
    power steps run DRIVER-SIDE over the collected cells in the same
    j-sorted IEEE order (the classic "aggregate once, iterate on the
    driver-scale Gram" split -- the previous in-plan unroll paid two
    eager checkpoints and per-step broadcast joins for 136 cells).
    """
    from etl_rf_matrix_controller_spark.plans.scale import collect_bounded

    # exactly GRAM_DIMS*(GRAM_DIMS+1)/2 upper-triangle cells by
    # construction; GRAM_DIMS^2 is the loose dimension bound
    tri = collect_bounded(
        embedding_gram_matrix(spark, sf_dir),
        GRAM_DIMS * GRAM_DIMS,
        "embedding Gram upper triangle",
    )
    cells: dict[int, list[tuple[int, float]]] = {}
    for r in tri:
        cells.setdefault(r.pos_a, []).append((r.pos_b, r.gram))
        if r.pos_a != r.pos_b:
            cells.setdefault(r.pos_b, []).append((r.pos_a, r.gram))
    for lst in cells.values():
        lst.sort()
    v1 = {
        i: _seq_sum(g for _, g in lst) for i, lst in cells.items()
    }
    ma = max(abs(v) for v in v1.values())
    vn = {i: v / ma for i, v in v1.items()}
    v2 = {
        i: _seq_sum(g * vn[j] for j, g in lst)
        for i, lst in cells.items()
    }
    return spark.createDataFrame(
        sorted(v2.items()), "pos bigint, comp double"
    )


def _seq_sum(terms) -> float:
    """Sequential IEEE double fold seeded at 0.0 -- mirrors the engines'
    ordered list_reduce/aggregate folds term for term."""
    acc = 0.0
    for t in terms:
        acc += t
    return acc


@declared(
    "pca_projection_topk",
    oracle=f"""
    WITH v AS ({{eig}}),
    scored AS (
      SELECT e.vec_id, e.label,
             list_sum(list(CAST(e.embedding[v.pos] AS DOUBLE) * v.comp
                           ORDER BY v.pos)) AS proj
      FROM embeddings e JOIN v ON v.pos BETWEEN 1 AND {GRAM_DIMS}
      GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, proj, rnk
    FROM (
      SELECT vec_id, label, proj,
             CAST(row_number() OVER (ORDER BY abs(proj) DESC, vec_id)
               AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """.format(eig=_REGISTRY_ORACLES["gram_top_eigvec"]),
)
def pca_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the learned principal direction and
    report the 10 most extreme vectors -- the apply phase of the
    aggregate-then-iterate PCA split (gram_top_eigvec is the train
    phase), and the outlier-surfacing pattern a curation pipeline uses
    on projection scores.

    The 16-component direction broadcasts; each vector's projection is
    a SEQUENTIAL pos-ordered fold (same parity discipline as every dot
    product here), so scores -- and therefore the |proj| ranking cut --
    hash-match the oracle.  One corpus pass + a broadcast join; the
    top-10 window runs over per-vector scalars.
    """
    v = gram_top_eigvec(spark, sf_dir).localCheckpoint(eager=True)
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    exploded = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.slice("embedding", 1, GRAM_DIMS)).alias("p0", "comp_e"),
    ).select(
        "vec_id", "label", (F.col("p0") + 1).alias("pos"), "comp_e"
    )
    joined = exploded.join(F.broadcast(v), "pos").select(
        "vec_id",
        "label",
        "pos",
        (F.col("comp_e").cast("double") * F.col("comp")).alias("t"),
    )
    ordered = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "t"))),
            lambda s: s.t.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = joined.groupBy("vec_id", "label").agg(ordered.alias("proj"))
    w = Window.orderBy(F.abs(F.col("proj")).desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .select("vec_id", "label", "proj", "rnk")
    )


# IVF-PQ parameters: 16 subspaces x 4 dims, 16 codewords per subspace ->
# 16 codes of 4 bits = 8 bytes/vector vs 256 bytes float32 (32x), the
# compression that puts a 100 TB embedding corpus in cluster memory.
# 4-dim subspaces matter: 16 random codewords cover a 4-dim residual
# space far more densely than an 8-dim one (measured recall 0.07 -> 0.6+
# on the clustered gate corpus).  PQ_TRAIN_MOD decouples the codebook
# sample stride from the centroid stride so the codebook is full even
# when centroids are sparse.
PQ_M, PQ_SUBDIM, PQ_CBK = 16, 4, 16
PQ_TRAIN_MOD = 20
# ADC ranks a shortlist; the top-k is re-ranked EXACTLY on the raw
# vectors (FAISS's refine step) -- PQ's job is to cheaply prune the list
# to PQ_SHORTLIST candidates, not to win the final ordering.
PQ_SHORTLIST = 10


def pq_encode_df(
    emb: DataFrame,
    cent_mod: int = 100,
    cb_k: int = PQ_CBK,
) -> tuple[DataFrame, DataFrame]:
    """IVF-PQ index build shared by ann_ivfpq_topk and
    pq_distortion_report: returns (assigned, encoded) where ``assigned``
    carries (vec_id, embedding, cent_id, ce, res) after map-side coarse
    assignment and ``encoded`` adds the PQ-reconstructed residual
    ``rres``.

    Index build = coarse assignment + PQ encoding, both MAP-SIDE: the
    centroid table and the codebook each collapse to a single broadcast
    row carrying a sorted struct array, and every vector argmins over
    them in-row (array_min over (dist, id) structs == the (dist, id)
    tie-break ordering).  No shuffle of the corpus happens anywhere in
    the build -- the design that holds at 100 TB, where the previous
    groupBy-per-vector encode shuffled the corpus twice.  Local sf0.1
    wall time is FLAT across the two designs (~2.9 s both): at 2k
    vectors the cost is the interpreted higher-order distance folds
    (~2.6M lambda steps for assignment alone), not the exchanges the
    rewrite removed -- the win is shuffle posture, measured honestly.
    The deterministic sequential fold is non-negotiable (the oracle's
    argmin must see bit-identical distances), which rules out the
    codegen'd explode+groupBy float sum here.  Queries score candidates
    against PQ reconstructions (asymmetric distance), so the scan-side
    memory is codes + the tiny codebook, never raw vectors.
    """
    # Lazy checkpoint: materialized inside the first consumer's job (the
    # eager `assigned` checkpoint below) instead of as a separate
    # blocking action; later consumers reuse the cached blocks.
    emb = emb.select("vec_id", "embedding").localCheckpoint(eager=False)

    # Coarse quantizer as ONE broadcast row: sorted (cent_id, ce) structs.
    cents_arr = (
        emb.filter(F.col("vec_id") % cent_mod == 0)
        .select(
            F.struct(
                F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("ce"),
            ).alias("c")
        )
        .groupBy()
        .agg(F.sort_array(F.collect_list("c")).alias("cents"))
    )
    # Map-side assignment: in-row argmin over the centroid array; the
    # distance is the same fixed-order fold as _sq_dist.  assigned keeps
    # the winning centroid and the RESIDUAL (v - c): PQ encodes
    # residuals, not raw vectors -- within one inverted list every
    # member shares the centroid, so only the residual carries ranking
    # information (the FAISS IVFADC design; quantizing raw vectors
    # collapses within-list ranking).
    best = F.expr(
        "array_min(transform(cents, c -> struct("
        " aggregate(zip_with(embedding, c.ce,"
        "  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        "   * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        "  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d,"
        " c.cent_id AS cent_id, c.ce AS ce)))"
    )
    assigned = (
        emb.crossJoin(F.broadcast(cents_arr))
        .select("vec_id", "embedding", best.alias("b"))
        .select(
            "vec_id",
            "embedding",
            F.col("b.cent_id").alias("cent_id"),
            F.col("b.ce").alias("ce"),
            F.zip_with(
                "embedding",
                F.col("b.ce"),
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("res"),
        )
        .localCheckpoint(eager=True)  # feeds codebook, encode, queries
    )

    # PQ codebook as ONE broadcast row: residual subvectors of the cb_k
    # lowest-id vectors at stride offset 1 (offset 0 would train on the
    # centroids themselves, whose residuals are identically zero) --
    # deterministic stand-in for per-subspace k-means, which isn't
    # oracle-reproducible.  Sorted (m, cw, sv) structs.
    train = (
        assigned.filter(F.col("vec_id") % PQ_TRAIN_MOD == 1)
        .withColumn("cw", F.row_number().over(Window.orderBy("vec_id")))
        .filter(F.col("cw") <= cb_k)
    )
    sub_structs = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.struct(
            m.alias("m"),
            F.slice("res", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
        ),
    )
    cb = (
        train.select("cw", F.explode(sub_structs).alias("s"))
        .select(
            F.struct(
                F.col("s.m").alias("m"),
                F.col("cw").alias("cw"),
                F.col("s.sv").alias("sv"),
            ).alias("e")
        )
        .groupBy()
        .agg(F.sort_array(F.collect_list("e")).alias("cb"))
    )

    # Map-side encode + reconstruct in ONE in-row expression: per
    # subspace, argmin over that subspace's codewords (same (d, cw)
    # ordering as before), emit the winning subvector; flatten in m
    # order = the reconstructed residual.
    rres = F.expr(
        f"flatten(transform(sequence(0, {PQ_M - 1}), m ->"
        f" array_min(transform(filter(cb, e -> e.m = m), e -> struct("
        f"  aggregate(zip_with(slice(res, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
        f"   e.sv, (x, y) -> (x - y) * (x - y)),"
        f"   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d,"
        f"  e.cw AS cw, e.sv AS sv))).sv))"
    )
    cand = assigned.crossJoin(F.broadcast(cb)).select(
        "vec_id", "embedding", "cent_id", "ce", "res", rres.alias("rres")
    )
    return assigned, cand


# Builder version for the persistent IVF-PQ index: bump when the
# assignment or encode semantics above change, or stale on-disk postings
# would be silently reused (the plans/gram_index.py contract).
IVFPQ_INDEX_VERSION = "1"


def ivfpq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent bucketed IVF-PQ index over the embeddings table: the
    full pq_encode_df artifact (vec_id, embedding, cent_id, ce, res,
    rres) written ONCE as a ``bucketBy(N, cent_id).sortBy(cent_id,
    vec_id)`` table -- the FAISS index-on-disk analogue, built with the
    same machinery as the gram-postings index (corpus fingerprint tag,
    staged atomic publish, cross-session re-registration).

    Before this index, every declared IVF query re-ran the coarse
    assignment (a corpus x centroids distance fold) and the PQ encode
    per query; now that cost is paid once per corpus, and probes are a
    bucketed columnar scan + broadcast joins.  Consumers prune columns
    they don't need (ReadSchema does the narrowing: ann_ivf reads 3 of
    6 columns, pq_distortion reads res/rres only)."""
    from etl_rf_matrix_controller_spark.plans.gram_index import (
        ensure_bucketed_index,
    )

    return ensure_bucketed_index(
        spark,
        sf_dir,
        "ivfpq",
        lambda s, d: pq_encode_df(load_table(s, d, "embeddings"))[1],
        ["cent_id"],
        version=IVFPQ_INDEX_VERSION,
        sort_cols=["cent_id", "vec_id"],
        source_table="embeddings",
    )


def ivfpq_topk_df(
    emb: DataFrame,
    cent_mod: int = 100,
    cb_k: int = PQ_CBK,
    n_queries: int = N_QUERIES,
    top_k: int = TOP_K,
    nprobe: int = 1,
) -> DataFrame:
    """Core of ann_ivfpq_topk over an arbitrary (vec_id, embedding) frame
    (exposed for the clustered-corpus recall gate and the
    tools/ann_recall.py nprobe sweep); index build is the shared
    pq_encode_df, scoring is asymmetric distance + exact refine.
    ``nprobe`` > 1 probes the query's nprobe nearest coarse lists (same
    recall knob as ivf_topk_df; nprobe=1 is the declared-query shape and
    reuses the build's own map-side assignment).
    """
    assigned, cand = pq_encode_df(emb, cent_mod=cent_mod, cb_k=cb_k)

    if nprobe == 1:
        q = assigned.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("cent_id").alias("q_cent"),
        )
    else:
        cents = assigned.filter(F.col("vec_id") % cent_mod == 0).select(
            F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_e")
        )
        qd = _sq_dist(F.col("embedding"), F.col("c_e"))
        wq = Window.partitionBy("vec_id").orderBy(qd.asc(), F.col("c_id").asc())
        q = (
            assigned.filter(F.col("vec_id") < n_queries)
            .crossJoin(F.broadcast(cents))
            .withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= nprobe)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"),
                F.col("c_id").alias("q_cent"),
            )
        )
    # Candidate reconstruction = centroid + quantized residual, built
    # in-row; the score is the usual fixed-order double fold against it.
    rv = F.zip_with("ce", "rres", lambda c, r: c.cast("double") + r)
    scored = cand.join(
        F.broadcast(q),
        (F.col("cent_id") == F.col("q_cent"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        dot_double(F.col("qe"), rv).alias("score"),
    )
    # Refine: the ADC shortlist (tiny: n_queries x PQ_SHORTLIST x nprobe
    # rows) is re-ranked exactly on the raw vectors -- only shortlist
    # members pay a full-precision fetch, the memory story PQ exists
    # for.  The shortlist SCALES with nprobe: probing more lists
    # multiplies ADC candidates, and a fixed-size shortlist floods with
    # quantization-noise scores that evict true neighbors BEFORE refine
    # (measured on the clustered gate corpus: recall 0.8 -> 0.33 as
    # nprobe went 1 -> 4 with a fixed 10-slot shortlist; monotone again
    # once the shortlist grows with the candidate pool).
    shortlist = _topk(scored, PQ_SHORTLIST * nprobe).select(
        "query_id", "cand_id"
    )
    # q carries one row per (query, probed list): project to one row per
    # query for the refine join, or every shortlist member scores nprobe
    # duplicate rows and the final top-k fills with copies of the best
    # candidate (measured: recall FELL 0.8 -> 0.33 as nprobe grew).
    q_one = q.select("query_id", "qe").dropDuplicates(["query_id"])
    refined = (
        assigned.select(F.col("vec_id").alias("cand_id"), "embedding")
        .join(F.broadcast(shortlist), "cand_id")
        .join(F.broadcast(q_one), "query_id")
        .select(
            "query_id",
            "cand_id",
            dot_double(F.col("qe"), F.col("embedding")).alias("score"),
        )
    )
    return _topk(refined, top_k)


@declared(
    "ann_ivfpq_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id, ce,
             list_transform(generate_series(1, {DIM}),
               i -> CAST(embedding[i] AS DOUBLE) - CAST(ce[i] AS DOUBLE))
               AS res
      FROM (
        SELECT v.vec_id, v.embedding, c.cent_id, c.ce,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_DIST_SQL.format(a='v.embedding', b='c.ce')}, c.cent_id
               ) AS rn
        FROM embeddings v CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    train AS (
      SELECT res, row_number() OVER (ORDER BY vec_id) AS cw
      FROM assigned WHERE vec_id % {PQ_TRAIN_MOD} = 1
      QUALIFY cw <= {PQ_CBK}
    ),
    subv AS (
      SELECT m.m AS m, t.cw,
             t.res[(m.m * {PQ_SUBDIM} + 1):(m.m * {PQ_SUBDIM} + {PQ_SUBDIM})]
               AS sv
      FROM train t, unnest(generate_series(0, {PQ_M - 1})) AS m(m)
    ),
    vsub AS (
      SELECT v.vec_id, m.m AS m,
             v.res[(m.m * {PQ_SUBDIM} + 1):(m.m * {PQ_SUBDIM} + {PQ_SUBDIM})]
               AS vv
      FROM assigned v, unnest(generate_series(0, {PQ_M - 1})) AS m(m)
    ),
    codes AS (
      SELECT vec_id, m, cw FROM (
        SELECT v.vec_id, v.m, s.cw,
               row_number() OVER (
                 PARTITION BY v.vec_id, v.m
                 ORDER BY list_sum(list_transform(
                   generate_series(1, {PQ_SUBDIM}),
                   i -> (v.vv[i] - s.sv[i]) * (v.vv[i] - s.sv[i]))), s.cw
               ) AS rn
        FROM vsub v JOIN subv s ON s.m = v.m
      ) t WHERE rn = 1
    ),
    recon AS (
      SELECT c.vec_id, flatten(list(s.sv ORDER BY c.m)) AS rres
      FROM codes c JOIN subv s ON s.m = c.m AND s.cw = c.cw
      GROUP BY c.vec_id
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qe, cent_id AS q_cent
      FROM assigned WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, a.vec_id AS cand_id,
             list_sum(list_transform(generate_series(1, {DIM}),
               i -> CAST(q.qe[i] AS DOUBLE)
                    * (CAST(a.ce[i] AS DOUBLE) + r.rres[i]))) AS score
      FROM q
      JOIN assigned a ON a.cent_id = q.q_cent AND a.vec_id <> q.query_id
      JOIN recon r ON r.vec_id = a.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id) AS rnk
      FROM scored
    ),
    shortlist AS (
      SELECT query_id, cand_id FROM ranked WHERE rnk <= {PQ_SHORTLIST}
    ),
    refined AS (
      SELECT s.query_id, s.cand_id,
             {_DOT_SQL.format(a='q.qe', b='a.embedding')} AS score
      FROM shortlist s
      JOIN assigned a ON a.vec_id = s.cand_id
      JOIN q ON q.query_id = s.query_id
    ),
    rr AS (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id) AS rnk
      FROM refined
    )
    SELECT query_id, cand_id, rnk, score
    FROM rr WHERE rnk <= {TOP_K}
    """,
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4d: IVF-PQ -- product quantization on top of ann_ivf_topk's
    coarse quantizer (similarity.py ivf_topk_df), the FAISS production
    layout for billion-vector search.

    Each vector is coarse-assigned to its nearest sampled centroid, then
    its RESIDUAL (v - centroid) is PQ-encoded: 8 subspaces of 8 dims,
    each mapped to its nearest of 16 deterministic codewords (residual
    subvectors of the lowest-id vectors at stride offset 1 -- offset 0
    would train on the centroids' own zero residuals; real deployments
    run per-subspace k-means, which isn't oracle-reproducible).
    Residual encoding is the IVFADC essential: within one inverted list
    every member shares the centroid, so quantizing raw vectors collapses
    within-list ranking (measured recall 0.07 raw vs 0.33 residual ADC on
    the clustered gate corpus).  Codes are 16 x 4 bits = 8 bytes/vector
    vs 256 raw -- 32x compression, the difference between spilling and
    serving from memory at 100 TB.  Queries probe their own inverted
    list, rank by asymmetric distance (full-precision query x centroid +
    reconstructed residual), then the ADC SHORTLIST alone is re-ranked
    exactly on raw vectors (FAISS's refine stage): only ~PQ_SHORTLIST
    full-width fetches per query ever happen.  The clustered-corpus
    recall gate (tests/test_ann_recall.py) pins the recall/bytes
    tradeoff row vs knn_quantized_i8 (64 B/vec).

    Determinism: every distance/score is the fixed-order double fold both
    engines share; codeword and rank ties break on (cw, cand_id); the
    reconstruction array orders subspaces by a struct sort.

    Round 7: the declared query consumes the PERSISTENT bucketed IVF-PQ
    index (ivfpq_index) -- coarse assignment + PQ encode are a
    write-once artifact, and the per-query cost is the ADC scan + the
    shortlist's full-precision refine, both against the bucketed table
    (values byte-identical to the rebuild path; result_manifest pins
    it).  ivfpq_topk_df remains the from-scratch spelling for arbitrary
    frames (recall gate, nprobe sweep)."""
    idx = ivfpq_index(spark, sf_dir)
    q = idx.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("cent_id").alias("q_cent"),
    )
    rv = F.zip_with("ce", "rres", lambda c, r: c.cast("double") + r)
    scored = idx.join(
        F.broadcast(q),
        (F.col("cent_id") == F.col("q_cent"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        dot_double(F.col("qe"), rv).alias("score"),
    )
    shortlist = _topk(scored, PQ_SHORTLIST).select("query_id", "cand_id")
    refined = (
        idx.select(F.col("vec_id").alias("cand_id"), "embedding")
        .join(F.broadcast(shortlist), "cand_id")
        .join(F.broadcast(q.select("query_id", "qe")), "query_id")
        .select(
            "query_id",
            "cand_id",
            dot_double(F.col("qe"), F.col("embedding")).alias("score"),
        )
    )
    return _topk(refined, TOP_K)


@declared(
    "cross_label_mutual_knn",
    oracle=f"""
    WITH a AS (
      SELECT vec_id AS a_id, embedding AS ae
      FROM embeddings WHERE label = 0
    ),
    b AS (
      SELECT vec_id AS b_id, embedding AS be
      FROM embeddings WHERE label = 1
    ),
    scored AS (
      SELECT a.a_id, b.b_id,
             {_DOT_SQL.format(a='a.ae', b='b.be')} AS score
      FROM a CROSS JOIN b
    ),
    r AS (
      SELECT a_id, b_id, score,
             row_number() OVER (PARTITION BY a_id
                                ORDER BY score DESC, b_id) AS rab,
             row_number() OVER (PARTITION BY b_id
                                ORDER BY score DESC, a_id) AS rba
      FROM scored
    )
    SELECT a_id, b_id, score FROM r WHERE rab = 1 AND rba = 1
    """,
)
def cross_label_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest neighbors ACROSS two embedding groups -- the bitext
    / parallel-pair mining primitive (Artetxe & Schwenk 2019's margin
    criterion starts from exactly this forward-AND-backward-NN set): a
    pair survives only if b is a's top match in group B AND a is b's top
    match in group A, which kills the hub vectors a one-directional kNN
    would pair with everything.

    Labels 0/1 play the two languages (the driver's embeddings carry no
    lang column).  Plan: one scored frame, TWO window passes over it
    (partition by a_id, then by b_id) and a single conjunction filter --
    mutuality needs no self-join of two kNN result sets.  The small side
    broadcasts; at 100 TB both sides are LSH/IVF-blocked first (the
    ann_lsh/ann_ivf machinery) so 'all pairs' becomes 'all pairs within a
    bucket', and the two windows shuffle only bucket-local candidates.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("ae")
    )
    b = emb.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("be")
    )
    scored = a.crossJoin(F.broadcast(b)).select(
        "a_id", "b_id", dot_double(F.col("ae"), F.col("be")).alias("score")
    )
    wab = Window.partitionBy("a_id").orderBy(F.desc("score"), F.asc("b_id"))
    wba = Window.partitionBy("b_id").orderBy(F.desc("score"), F.asc("a_id"))
    return (
        scored.withColumn("rab", F.row_number().over(wab))
        .withColumn("rba", F.row_number().over(wba))
        .filter((F.col("rab") == 1) & (F.col("rba") == 1))
        .select("a_id", "b_id", "score")
    )


@declared(
    "label_silhouette_lite",
    oracle=f"""
    WITH comps AS (
      SELECT label AS member_label, vec_id, CAST(i - 1 AS BIGINT) AS m,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS x
      FROM embeddings, generate_series(1, {DIM}) AS g(i)
    ),
    sizes AS (
      SELECT member_label AS cent_label,
             CAST(count(DISTINCT vec_id) AS BIGINT) AS n_c
      FROM comps GROUP BY member_label
    ),
    cent AS (
      SELECT c.member_label AS cent_label, c.m,
             CAST(sum(c.x) AS BIGINT) AS csum, max(s.n_c) AS n_c
      FROM comps c JOIN sizes s ON s.cent_label = c.member_label
      GROUP BY c.member_label, c.m
    ),
    pair_sums AS (
      SELECT c.member_label, t.cent_label,
             CAST(sum((CAST(t.n_c AS HUGEINT) * c.x - t.csum)
                      * (CAST(t.n_c AS HUGEINT) * c.x - t.csum)) AS HUGEINT)
               AS s2,
             CAST(count(DISTINCT c.vec_id) AS BIGINT) AS n_members,
             max(t.n_c) AS n_c
      FROM comps c JOIN cent t ON t.m = c.m
      GROUP BY c.member_label, t.cent_label
    ),
    scored AS (
      SELECT member_label, cent_label,
             CAST(s2 AS DOUBLE)
               / CAST(n_members * n_c * n_c AS DOUBLE) AS avg_d
      FROM pair_sums
    ),
    own AS (
      SELECT member_label, avg_d AS own_avg_d
      FROM scored WHERE member_label = cent_label
    ),
    other AS (
      SELECT member_label, cent_label, avg_d,
             row_number() OVER (PARTITION BY member_label
                                ORDER BY avg_d, cent_label) AS rn
      FROM scored WHERE member_label <> cent_label
    )
    SELECT o.member_label AS label, ow.own_avg_d,
           o.cent_label AS nearest_other_label,
           o.avg_d AS nearest_avg_d,
           o.avg_d / ow.own_avg_d AS separation
    FROM other o JOIN own ow ON ow.member_label = o.member_label
    WHERE o.rn = 1
    """,
)
def label_silhouette_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-separation report per embedding label (silhouette-lite):
    mean squared distance of members to their OWN centroid vs to the
    NEAREST OTHER centroid, and the separation ratio -- the standard
    clustering-quality readout (separation >> 1 = tight, well-separated
    labels; ~1 = the label blends into a neighbor), i.e. the evaluation
    the k-means/IVF assignment families get judged by.

    Exactness without float folds: components quantize to 1e4-scaled
    ints; with centroid SUMS kept unscaled, n_c^2 * ||x - mean||^2 ==
    sum_m (n_c*x_m - csum_m)^2 is PURE INTEGER (DECIMAL(38,0) products
    per the operand-cast rule), so every aggregation is order-independent
    and codegen'd -- no interpreted in-row lambdas (the doc_char_gini
    lesson) and no sequential-fold requirement.  Only the final avg_d
    and separation are doubles, each a single division of identical
    integers on both engines.  Plan: one posexplode feeds the centroid
    table (label x dim bounded) and the member-x-centroid term join
    (broadcast, |labels|-fan-out); both aggregations collapse map-side.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        F.col("label").alias("member_label"),
        "vec_id",
        F.posexplode("embedding").alias("m", "v"),
    ).select(
        "member_label",
        "vec_id",
        F.col("m").cast("bigint").alias("m"),
        F.round(F.col("v").cast("double") * 10000).cast("bigint").alias("x"),
    ).localCheckpoint(eager=True)  # feeds centroid build AND the term join
    sizes = comps.groupBy(F.col("member_label").alias("cent_label")).agg(
        F.countDistinct("vec_id").cast("bigint").alias("n_c")
    )
    cent = (
        comps.groupBy(F.col("member_label").alias("cent_label"), "m")
        .agg(F.sum("x").cast("bigint").alias("csum"))
        .join(F.broadcast(sizes), "cent_label")
    )
    # n_c is cast BEFORE the multiply (operand-cast rule): a bigint
    # n_c*x product would wrap silently at scale where DuckDB errors.
    term = F.expr(
        "(CAST(n_c AS DECIMAL(38,0)) * x - csum)"
        " * (CAST(n_c AS DECIMAL(38,0)) * x - csum)"
    )
    pair_sums = (
        comps.join(F.broadcast(cent), "m")
        .groupBy("member_label", "cent_label")
        .agg(
            F.sum(term).alias("s2"),
            F.countDistinct("vec_id").cast("bigint").alias("n_members"),
            F.max("n_c").alias("n_c"),
        )
    )
    scored = pair_sums.select(
        "member_label",
        "cent_label",
        F.expr(
            "CAST(s2 AS DOUBLE) / CAST(n_members * n_c * n_c AS DOUBLE)"
        ).alias("avg_d"),
    ).localCheckpoint(eager=True)  # feeds the own row AND the other-rank
    own = scored.filter(F.col("member_label") == F.col("cent_label")).select(
        "member_label", F.col("avg_d").alias("own_avg_d")
    )
    w = Window.partitionBy("member_label").orderBy("avg_d", "cent_label")
    other = (
        scored.filter(F.col("member_label") != F.col("cent_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return other.join(F.broadcast(own), "member_label").select(
        F.col("member_label").alias("label"),
        "own_avg_d",
        F.col("cent_label").alias("nearest_other_label"),
        F.col("avg_d").alias("nearest_avg_d"),
        (F.col("avg_d") / F.col("own_avg_d")).alias("separation"),
    )


SWEEP_THRESHOLDS = (0.10, 0.45, 0.75, 0.87, 0.94)
_SWEEP_DOT = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> {a}[i] * {b}[i]))"
)


@declared(
    "semantic_dup_threshold_sweep",
    oracle=f"""
    WITH js AS (SELECT unnest([1, 2, 3]) AS j),
    base AS (
      SELECT vec_id, label,
             list_transform(generate_series(1, 64),
               i -> CAST(embedding[i] AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    corpus AS (
      SELECT vec_id, label, e FROM base
      UNION ALL
      SELECT b.vec_id + 100000 * js.j AS vec_id, b.label,
             list_transform(generate_series(1, 64),
               i -> CASE WHEN i <= 8 * js.j THEN 0.0e0 ELSE b.e[i] END) AS e
      FROM base b CROSS JOIN js
    ),
    n AS (
      SELECT vec_id, label, e,
             sqrt({_SWEEP_DOT.format(a='e', b='e')}) AS nrm
      FROM corpus
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_SWEEP_DOT.format(a='a.e', b='b.e')} / (a.nrm * b.nrm)
               AS cosine
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    th AS (SELECT unnest([{', '.join(f'{t}e0' for t in SWEEP_THRESHOLDS)}])
           AS threshold)
    SELECT t.threshold,
           CAST(sum(CASE WHEN p.cosine >= t.threshold THEN 1 ELSE 0 END)
             AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT CASE WHEN p.cosine >= t.threshold
                                    THEN p.vec_b END) AS BIGINT) AS n_dropped
    FROM pairs p CROSS JOIN th t
    GROUP BY t.threshold
    """,
)
def semantic_dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup threshold calibration: how many near-dup pairs (and
    how many docs a keep-lowest-id policy would drop) at each candidate
    cosine threshold -- the tuning curve you read BEFORE committing a
    `semantic_dedup_keeper` threshold to a 100 TB run.  Planted graded
    duplicates (first 8/16/24 of 64 components zeroed -> cosine ~0.94 /
    0.87 / 0.79 to their originals) give the curve known knees; natural
    within-label pairs (~<=0.45) populate the low end.

    Calibration runs on a BOUNDED deterministic sample (vec_id % 50 = 0,
    same posture as minhash_estimator_calibration): the within-label
    ground-truth pair join is quadratic per label by design -- exactness
    over the sample is the point; the production dedup itself stays
    LSH-blocked (cosine_near_dup_pairs).  Cosines are sequential double
    folds (dot_double convention, bit-identical to DuckDB list_sum), so
    every >= comparison decides identically on both engines; thresholds
    ride as literal doubles.  Pairs are computed ONCE, then fanned 5x by
    an in-row threshold explode and collapsed by one map-side-combinable
    aggregation.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    base = (
        emb.filter(F.col("vec_id") % 50 == 0)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
    )
    variants = base.select(
        "vec_id",
        "label",
        "e",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
    ).select(
        (F.col("vec_id") + 100000 * F.col("j")).alias("vec_id"),
        "label",
        F.transform(
            "e",
            lambda x, i: F.when(i < 8 * F.col("j"), F.lit(0.0)).otherwise(x),
        ).alias("e"),
    )
    corpus = base.unionByName(variants)
    n = corpus.select(
        "vec_id",
        "label",
        "e",
        F.sqrt(dot_double(F.col("e"), F.col("e"))).alias("nrm"),
    ).localCheckpoint(eager=True)  # both sides of the pair join
    a = n.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("nrm_a"),
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nrm_b"),
    )
    cosine = dot_double(F.col("ea"), F.col("eb")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    pairs = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("label_a") == F.col("label_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", cosine.alias("cosine"))
    )
    swept = pairs.select(
        "vec_a",
        "vec_b",
        "cosine",
        F.explode(
            F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS])
        ).alias("threshold"),
    )
    return swept.groupBy("threshold").agg(
        F.sum(F.when(F.col("cosine") >= F.col("threshold"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pairs"),
        F.countDistinct(
            F.when(F.col("cosine") >= F.col("threshold"), F.col("vec_b"))
        )
        .cast("bigint")
        .alias("n_dropped"),
    )


@declared(
    "label_outlier_candidates",
    oracle=f"""
    WITH comps AS (
      SELECT label, vec_id, CAST(i AS BIGINT) AS m,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS x
      FROM embeddings, generate_series(1, {DIM}) AS g(i)
    ),
    sizes AS (
      SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_c
      FROM comps GROUP BY label
    ),
    cent AS (
      SELECT label, m, CAST(sum(x) AS BIGINT) AS csum
      FROM comps GROUP BY label, m
    ),
    s AS (
      SELECT c.label, c.vec_id,
             CAST(sum((CAST(z.n_c AS HUGEINT) * c.x - t.csum)
                      * (CAST(z.n_c AS HUGEINT) * c.x - t.csum))
               AS HUGEINT) AS sv
      FROM comps c
      JOIN cent t ON t.label = c.label AND t.m = c.m
      JOIN sizes z ON z.label = c.label
      GROUP BY c.label, c.vec_id
    ),
    lab AS (
      SELECT label, CAST(sum(sv) AS HUGEINT) AS sum_s,
             CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY label
    )
    SELECT s.label, s.vec_id,
           CAST(s.sv * l.n AS DOUBLE) / CAST(l.sum_s AS DOUBLE)
             AS dist_ratio,
           CAST(row_number() OVER (PARTITION BY s.label
                                   ORDER BY s.sv DESC, s.vec_id)
             AS BIGINT) AS rnk
    FROM s JOIN lab l ON l.label = s.label
    QUALIFY rnk <= 5
    """,
)
def label_outlier_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outliers: the 5 members FARTHEST from their
    own label centroid, with distance-to-label-mean ratio -- the
    mislabeled-sample / noise-candidate mining pass a curation pipeline
    runs before training (rank-based, not threshold-based, so it is
    never vacuous and needs no distribution assumption).

    Same n_c-scaled pure-integer distance trick as
    `label_silhouette_lite`: sv = sum_m (n_c*x_m - csum_m)^2 ==
    n_c^2 * ||x - mean||^2, exact in DECIMAL(38,0) (operand-cast rule),
    so the per-label ranking is an INTEGER sort -- ties impossible to
    split differently across engines; dist_ratio = sv*n/sum_s is one
    double division of identical exact integers.  Envelope: sv <=
    64 * n_c^2 * 4e8, sv*n <= 2.56e10 * n_c^3 < 1e38 up to n_c ~ 1.6e9
    members/label.  Plan: centroid table is |label| x dim (broadcast);
    the per-vector sum collapses map-side; s feeds the label totals AND
    the final ranking (checkpointed once).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comps = (
        emb.repartition(spark.sparkContext.defaultParallelism)
        .select("label", "vec_id", F.posexplode("embedding").alias("m0", "v"))
        .select(
            "label",
            "vec_id",
            (F.col("m0") + 1).cast("bigint").alias("m"),
            F.round(F.col("v").cast("double") * 10000)
            .cast("bigint")
            .alias("x"),
        )
        .localCheckpoint(eager=True)  # feeds cent, sizes, and the s join
    )
    sizes = comps.groupBy("label").agg(
        F.countDistinct("vec_id").cast("bigint").alias("n_c")
    )
    cent = comps.groupBy("label", "m").agg(
        F.sum("x").cast("bigint").alias("csum")
    )
    term = F.expr(
        "(CAST(n_c AS DECIMAL(38,0)) * x - csum)"
        " * (CAST(n_c AS DECIMAL(38,0)) * x - csum)"
    )
    s = (
        comps.join(F.broadcast(cent), ["label", "m"])
        .join(F.broadcast(sizes), "label")
        .groupBy("label", "vec_id")
        .agg(F.sum(term).alias("sv"))
        .localCheckpoint(eager=True)  # label totals AND final ranking
    )
    lab = s.groupBy("label").agg(
        F.sum("sv").alias("sum_s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("sv"), F.asc("vec_id"))
    return (
        s.join(F.broadcast(lab), "label")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select(
            "label",
            "vec_id",
            (
                F.expr("CAST(sv * n AS DOUBLE)")
                / F.expr("CAST(sum_s AS DOUBLE)")
            ).alias("dist_ratio"),
            "rnk",
        )
    )


@declared(
    "incremental_ann_ingest_check",
    oracle=f"""
    WITH newb AS (
      SELECT vec_id + 200000 AS new_id, embedding AS ne
      FROM embeddings WHERE vec_id % 25 = 7
    ),
    scored AS (
      SELECT n.new_id, v.vec_id AS match_id,
             {_DOT_SQL.format(a='n.ne', b='v.embedding')} AS score
      FROM newb n CROSS JOIN embeddings v
    ),
    ranked AS (
      SELECT new_id, match_id, score,
             row_number() OVER (PARTITION BY new_id
                                ORDER BY score DESC, match_id) AS rnk
      FROM scored
    )
    SELECT new_id, match_id, score FROM ranked WHERE rnk = 1
    """,
)
def incremental_ann_ingest_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-side incremental ingest: a NEW embedding batch
    (synthesized verbatim copies, +200000 ids) probes the EXISTING
    corpus's IVF inverted lists for its nearest neighbor -- the
    embedding twin of `incremental_near_dup_check` (text).  Cost scales
    with the BATCH (each new vector scores one inverted list), never
    corpus x corpus -- the property that makes continuous ingest dedup
    affordable at 100 TB.

    The oracle is the BRUTE-FORCE top-1 over the full corpus, and for
    this batch the IVF probe equals it deterministically: a verbatim
    copy assigns to the same centroid as its original (identical
    distance fold, identical tiebreak), so the original is always in
    the probed list and dominates the score ranking -- every gate run
    therefore re-proves the probe finds the true neighbor, not a
    proxy.  Plan: corpus checkpointed once (centroid sample + list
    assignment + nothing else); centroids broadcast to BOTH the corpus
    assignment and the new-batch assignment; the probe is an equi-join
    on list id, shuffle-hash pinned.
    """
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)  # centroid sample + list assignment
    )
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    dist = _sq_dist(F.col("embedding"), F.col("ce"))
    w = Window.partitionBy("vec_id").orderBy(dist.asc(), F.col("cent_id").asc())
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cent_id")
    )
    newb = emb.filter(F.col("vec_id") % 25 == 7).select(
        (F.col("vec_id") + 200000).alias("new_id"),
        F.col("embedding").alias("ne"),
    )
    wq = Window.partitionBy("new_id").orderBy(
        _sq_dist(F.col("ne"), F.col("ce")).asc(), F.col("cent_id").asc()
    )
    q = (
        newb.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select("new_id", "ne", F.col("cent_id").alias("q_cent"))
    )
    scored = q.join(
        assigned.hint("shuffle_hash"),
        F.col("q_cent") == F.col("cent_id"),
    ).select(
        "new_id",
        F.col("vec_id").alias("match_id"),
        dot_double(F.col("ne"), F.col("embedding")).alias("score"),
    )
    wr = Window.partitionBy("new_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") == 1)
        .select("new_id", "match_id", "score")
    )


IVFFLAT_INDEX_VERSION = "1"


def ivfflat_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent FLAT IVF assignment table: (cent_id, vec_id,
    embedding) written once as ``bucketBy(N, cent_id)`` -- the
    uncompressed inverted-file twin of `ivfpq_index` (same centroid
    rule: every vec_id % 100 == 0 corpus vector), for probes that
    re-rank on raw vectors without a PQ decode."""
    from etl_rf_matrix_controller_spark.plans.gram_index import (
        ensure_bucketed_index,
    )

    def _build(s: SparkSession, d: str) -> DataFrame:
        emb = (
            load_table(s, d, "embeddings")
            .select("vec_id", "embedding")
            .localCheckpoint(eager=True)  # centroid sample + assignment
        )
        cents = emb.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
        )
        dist = _sq_dist(F.col("embedding"), F.col("ce"))
        w = Window.partitionBy("vec_id").orderBy(
            dist.asc(), F.col("cent_id").asc()
        )
        return (
            emb.crossJoin(F.broadcast(cents))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cent_id", "vec_id", "embedding")
        )

    return ensure_bucketed_index(
        spark,
        sf_dir,
        "ivfflat",
        _build,
        ["cent_id"],
        version=IVFFLAT_INDEX_VERSION,
        sort_cols=["cent_id", "vec_id"],
        source_table="embeddings",
    )


def ivfflat_batch_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An ingest batch of NEW vectors (+200000 verbatim copies of every
    vec_id % 25 == 7) assigned against the BASE corpus's centroids
    (codebooks/centroids retrain rarely in production; appends encode
    with the current ones) and published as a bucketed DELTA leg of the
    flat IVF index -- under the DEDICATED planted kind ``ivfflat_ing``
    (round-10), so the shared ``ivfflat`` base keeps zero planted
    deltas and stays compactable without overrides."""
    from etl_rf_matrix_controller_spark.plans.gram_index import (
        append_index_delta,
    )

    def _build(s: SparkSession, d: str) -> DataFrame:
        emb = (
            load_table(s, d, "embeddings")
            .select("vec_id", "embedding")
            .localCheckpoint(eager=True)
        )
        cents = emb.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
        )
        newb = emb.filter(F.col("vec_id") % 25 == 7).select(
            (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
        )
        dist = _sq_dist(F.col("embedding"), F.col("ce"))
        w = Window.partitionBy("vec_id").orderBy(
            dist.asc(), F.col("cent_id").asc()
        )
        return (
            newb.crossJoin(F.broadcast(cents))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cent_id", "vec_id", "embedding")
        )

    return append_index_delta(
        spark,
        sf_dir,
        "ivfflat_ing",
        _build,
        ["cent_id"],
        version=IVFFLAT_INDEX_VERSION,
        batch_id="ing1",
        sort_cols=["cent_id", "vec_id"],
        source_table="embeddings",
    )


@declared(
    "incremental_ivf_delta_topk",
    oracle=f"""
    WITH ingested AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 200000 AS vec_id, embedding
      FROM embeddings WHERE vec_id % 25 = 7
    ),
    queries AS (
      SELECT vec_id + 300000 AS new_id, embedding AS ne
      FROM embeddings WHERE vec_id % 25 = 7
    ),
    scored AS (
      SELECT q.new_id, v.vec_id AS match_id,
             {_DIST_SQL.format(a='q.ne', b='v.embedding')} AS score
      FROM queries q CROSS JOIN ingested v
    ),
    ranked AS (
      SELECT new_id, match_id, score,
             row_number() OVER (PARTITION BY new_id
                                ORDER BY score ASC, match_id) AS rnk
      FROM scored
    )
    SELECT new_id, match_id, CAST(rnk AS BIGINT) AS rnk,
           match_id >= 200000 AS from_delta, score
    FROM ranked WHERE rnk <= 2
    """,
)
def incremental_ivf_delta_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vector ingest WITHOUT an index rebuild, certified exact: night
    1's embedding batch is APPENDED to the persistent flat-IVF index as
    a bucketed delta (plans/gram_index.py; assignments encode against
    the base's centroids, the production posture -- codebooks retrain
    rarely), and a query batch probes base ∪ delta for its top-2.  The
    oracle is BRUTE FORCE over corpus ∪ batch under SQUARED-DISTANCE
    scoring (ascending): each query is a verbatim copy of a vector
    whose twin also entered via the delta, so the true top-2 is
    (original, delta twin) at distance exactly 0 -- a GLOBAL optimum no
    other vector can displace at any data scale (round-8 ADVICE: under
    raw dot-product scoring a higher-norm vector in an unprobed cell
    could outrank the self-copies, making nprobe=1 equality
    data-dependent; squared distance makes self-match dominance
    unconditional).  Rank 2 can ONLY be found if the delta leg is live
    (`from_delta`); rank 1 re-proves the base probe end-to-end.

    100 TB posture: each leg's probe joins the query batch against the
    bucketed scan on cent_id (probe-scaled exchanges only, the
    incremental_band_append_check discipline); index maintenance is
    batch-scaled (BENCHNOTES round 8: append flat 0.85 s vs rebuild
    5.16 s at x100)."""
    base = ivfflat_index(spark, sf_dir)
    delta = ivfflat_batch_delta(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    queries = emb.filter(F.col("vec_id") % 25 == 7).select(
        (F.col("vec_id") + 300000).alias("new_id"),
        F.col("embedding").alias("ne"),
    )
    wq = Window.partitionBy("new_id").orderBy(
        _sq_dist(F.col("ne"), F.col("ce")).asc(), F.col("cent_id").asc()
    )
    q = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select("new_id", "ne", F.col("cent_id").alias("q_cent"))
        .localCheckpoint(eager=True)  # probes BOTH legs
    )

    def probe(leg: DataFrame) -> DataFrame:
        return q.hint("shuffle_hash").join(
            leg, F.col("q_cent") == F.col("cent_id")
        ).select(
            "new_id",
            F.col("vec_id").alias("match_id"),
            _sq_dist(F.col("ne"), F.col("embedding")).alias("score"),
        )

    wr = Window.partitionBy("new_id").orderBy(
        F.asc("score"), F.asc("match_id")
    )
    return (
        probe(base)
        .unionByName(probe(delta))
        .withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= 2)
        .select(
            "new_id",
            "match_id",
            "rnk",
            (F.col("match_id") >= 200000).alias("from_delta"),
            "score",
        )
    )


_PQ_DIST_SQL = f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id, ce,
             list_transform(generate_series(1, {DIM}),
               i -> CAST(embedding[i] AS DOUBLE) - CAST(ce[i] AS DOUBLE))
               AS res
      FROM (
        SELECT v.vec_id, v.embedding, c.cent_id, c.ce,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {{dist}}, c.cent_id
               ) AS rn
        FROM embeddings v CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    train AS (
      SELECT res, row_number() OVER (ORDER BY vec_id) AS cw
      FROM assigned WHERE vec_id % {PQ_TRAIN_MOD} = 1
      QUALIFY cw <= {PQ_CBK}
    ),
    subv AS (
      SELECT m.m AS m, t.cw,
             t.res[(m.m * {PQ_SUBDIM} + 1):(m.m * {PQ_SUBDIM} + {PQ_SUBDIM})]
               AS sv
      FROM train t, unnest(generate_series(0, {PQ_M - 1})) AS m(m)
    ),
    vsub AS (
      SELECT v.vec_id, m.m AS m,
             v.res[(m.m * {PQ_SUBDIM} + 1):(m.m * {PQ_SUBDIM} + {PQ_SUBDIM})]
               AS vv
      FROM assigned v, unnest(generate_series(0, {PQ_M - 1})) AS m(m)
    ),
    best AS (
      SELECT vec_id, m, vv, sv FROM (
        SELECT v.vec_id, v.m, v.vv, s.sv,
               row_number() OVER (
                 PARTITION BY v.vec_id, v.m
                 ORDER BY list_sum(list_transform(
                   generate_series(1, {PQ_SUBDIM}),
                   i -> (v.vv[i] - s.sv[i]) * (v.vv[i] - s.sv[i]))), s.cw
               ) AS rn
        FROM vsub v JOIN subv s ON s.m = v.m
      ) t WHERE rn = 1
    ),
    errs AS (
      SELECT m,
             CAST(list_sum(list_transform(generate_series(1, {PQ_SUBDIM}),
               i -> (CAST(round(vv[i] * 10000) AS BIGINT)
                     - CAST(round(sv[i] * 10000) AS BIGINT))
                    * (CAST(round(vv[i] * 10000) AS BIGINT)
                       - CAST(round(sv[i] * 10000) AS BIGINT))))
               AS BIGINT) AS err
      FROM best
    )
    SELECT CAST(m AS BIGINT) AS subspace,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(err) AS BIGINT) AS sse_scaled,
           CAST(sum(err) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 100000000.0e0) AS mse
    FROM errs
    GROUP BY m
    """


@declared(
    "pq_distortion_report",
    oracle=_PQ_DIST_SQL.format(dist=_DIST_SQL.format(a="v.embedding", b="c.ce")),
)
def pq_distortion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace product-quantization distortion: for each of the 16
    PQ subspaces, the corpus-wide squared reconstruction error between
    the residual and its chosen codeword -- the diagnostic that tells
    you WHERE the 32x compression of `ann_ivfpq_topk` loses signal
    (a subspace with outsized MSE wants more codewords or a rotation;
    the FAISS tuning loop reads exactly this table).

    Shares the index artifact with ann_ivfpq_topk (round 7: the
    PERSISTENT bucketed ivfpq_index -- a res/rres 2-column scan, no
    rebuild), then measures error ON THE 1e-4 REPORTING GRID: each
    per-subvector error term is an exact integer (round(res*1e4) -
    round(codeword*1e4))^2, so the corpus-wide sum is order-independent
    and engine-exact, and the final MSE is one double division of exact
    integers -- the same convention `vector_quantize_i8` uses for its
    integer dots.  Output is PQ_M rows at any corpus size; cost is one
    pass over the encoded frame with an in-row per-subspace fold.
    """
    encoded = ivfpq_index(spark, sf_dir)
    err_structs = F.expr(
        f"transform(sequence(0, {PQ_M - 1}), m -> struct(CAST(m AS BIGINT)"
        f" AS subspace, aggregate(zip_with("
        f"  slice(res, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
        f"  slice(rres, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
        f"  (x, y) -> (CAST(round(x * 10000) AS BIGINT)"
        f"             - CAST(round(y * 10000) AS BIGINT))"
        f"            * (CAST(round(x * 10000) AS BIGINT)"
        f"               - CAST(round(y * 10000) AS BIGINT))),"
        f"  CAST(0 AS BIGINT), (acc, v) -> acc + v) AS err))"
    )
    per_vec = encoded.select(F.explode(err_structs).alias("e"))
    return per_vec.groupBy(F.col("e.subspace").alias("subspace")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("e.err").cast("bigint").alias("sse_scaled"),
        (
            F.sum("e.err").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(100000000.0))
        ).alias("mse"),
    )


TWONN_PROBE_MOD = 20  # deterministic probe sample: vec_id % 20 == 0


@declared(
    "twonn_intrinsic_dim",
    oracle=f"""
    WITH comps AS (
      SELECT vec_id, m.i AS m,
             CAST(round(CAST(embedding[m.i] AS DOUBLE) * 10000) AS BIGINT)
               AS x
      FROM embeddings, unnest(generate_series(1, {DIM})) AS m(i)
    ),
    probes AS (
      SELECT vec_id AS query_id, m, x AS qx
      FROM comps WHERE vec_id % {TWONN_PROBE_MOD} = 0
    ),
    d2 AS (
      SELECT p.query_id, c.vec_id AS cand_id,
             CAST(sum((p.qx - c.x) * (p.qx - c.x)) AS BIGINT) AS d2
      FROM probes p JOIN comps c ON c.m = p.m
      WHERE c.vec_id <> p.query_id
      GROUP BY p.query_id, c.vec_id
    ),
    ranked AS (
      SELECT query_id, d2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d2, cand_id) AS rn
      FROM d2
    ),
    nn2 AS (
      SELECT query_id,
             max(CASE WHEN rn = 1 THEN d2 END) AS d1,
             max(CASE WHEN rn = 2 THEN d2 END) AS d2
      FROM ranked WHERE rn <= 2
      GROUP BY query_id
    ),
    mu AS (
      SELECT query_id, CAST(d2 AS DOUBLE) / CAST(d1 AS DOUBLE) AS mu2
      FROM nn2 WHERE d1 > 0 AND d2 IS NOT NULL
    ),
    med AS (
      SELECT mu2, row_number() OVER (ORDER BY mu2, query_id) AS rn,
             count(*) OVER () AS n
      FROM mu
    )
    SELECT CAST(n AS BIGINT) AS n_probes, mu2 AS mu2_median
    FROM med WHERE rn = (n + 1) // 2
    """,
)
def twonn_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension statistic (Facco et al. 2017): for a
    deterministic probe sample, the ratio of squared distances to the
    2nd vs 1st nearest neighbor; the reported median mu2 determines the
    intrinsic dimension as ID = 2*ln(2) / ln(mu2_median) -- a corpus
    whose embeddings live on a low-dimensional manifold shows a large
    ratio, a space-filling one drives mu2 toward 1.  The readout that
    says whether `pca_projection_topk`'s target rank or the IVF list
    count is even plausible for this corpus.

    The final ln() stays OUT of the query (not correctly-rounded
    cross-engine); everything emitted is either an exact integer or one
    double division of exact integers: distances are order-independent
    integer sums on the 1e-4 grid via a codegen'd posexplode join (the
    doc_char_gini lesson -- no interpreted per-pair lambda folds), the
    2-NN selection is an integer rank, and the median is the discrete
    lower-middle element.  Cost: probes x corpus x dims joined rows
    with map-side combine; probes are a fixed 1-in-{TWONN_PROBE_MOD}
    hash stride, so the work scales linearly with the corpus, and at
    100 TB the probe side stays broadcastable.  Zero-distance
    duplicates (d1 = 0) drop identically on both engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "vec_id", F.posexplode("embedding").alias("m", "v")
    ).select(
        "vec_id",
        F.col("m").cast("bigint").alias("m"),
        F.round(F.col("v").cast("double") * 10000).cast("bigint").alias("x"),
    ).localCheckpoint(eager=True)  # probe projection + candidate side
    probes = comps.filter(F.col("vec_id") % TWONN_PROBE_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "m", F.col("x").alias("qx")
    )
    d2 = (
        comps.join(F.broadcast(probes), "m")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(
            F.sum((F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x")))
            .cast("bigint")
            .alias("d2")
        )
    )
    wr = Window.partitionBy("query_id").orderBy("d2", "cand_id")
    nn2 = (
        d2.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 2)
        .groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("d2"))).alias("d1"),
            F.max(F.when(F.col("rn") == 2, F.col("d2"))).alias("d2"),
        )
    )
    mu = nn2.filter(
        (F.col("d1") > 0) & F.col("d2").isNotNull()
    ).select(
        "query_id",
        (F.col("d2").cast("double") / F.col("d1").cast("double")).alias("mu2"),
    )
    wm = Window.orderBy("mu2", "query_id")
    med = mu.select(
        "mu2",
        F.row_number().over(wm).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return med.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        F.col("n").cast("bigint").alias("n_probes"),
        F.col("mu2").alias("mu2_median"),
    )


@declared(
    "split_embedding_centroid_shift",
    oracle=f"""
    WITH comps AS (
      SELECT label, vec_id,
             CASE WHEN ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 100 < 80
                  THEN 'train' ELSE 'test' END AS split,
             m.i AS m,
             CAST(round(CAST(embedding[m.i] AS DOUBLE) * 10000) AS BIGINT)
               AS x
      FROM embeddings, unnest(generate_series(1, {DIM})) AS m(i)
    ),
    sums AS (
      SELECT label, split, m, CAST(sum(x) AS BIGINT) AS s
      FROM comps GROUP BY label, split, m
    ),
    sizes AS (
      SELECT label, split, CAST(count(DISTINCT vec_id) AS BIGINT) AS n
      FROM comps GROUP BY label, split
    ),
    joined AS (
      SELECT tr.label, tr.m,
             tr.s AS s1, te.s AS s2, ntr.n AS n1, nte.n AS n2
      FROM sums tr
      JOIN sums te ON te.label = tr.label AND te.m = tr.m
                   AND te.split = 'test' AND tr.split = 'train'
      JOIN sizes ntr ON ntr.label = tr.label AND ntr.split = 'train'
      JOIN sizes nte ON nte.label = tr.label AND nte.split = 'test'
    )
    SELECT label, max(n1) AS n_train, max(n2) AS n_test,
           CAST(sum((CAST(n2 AS HUGEINT) * s1 - CAST(n1 AS HUGEINT) * s2)
                    * (CAST(n2 AS HUGEINT) * s1
                       - CAST(n1 AS HUGEINT) * s2)) AS DOUBLE)
             / (CAST(max(n1) * max(n2) AS DOUBLE)
                * CAST(max(n1) * max(n2) AS DOUBLE) * 100000000.0e0)
             AS centroid_shift
    FROM joined
    GROUP BY label
    """,
)
def split_embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-shift audit for the hash train/test split, in embedding
    space: per label, the squared L2 distance between the train-split
    centroid and the test-split centroid (raw embedding units).  A
    healthy random split shows small shifts; a large one means the
    split leaks structure and offline eval will mislead -- the
    embedding-space sibling of `split_balance_tv_distance` (which
    audits categorical composition).

    Exactness by clearing denominators: with per-component integer sums
    s1, s2 and sizes n1, n2, (n1*n2)^2 * ||m1 - m2||^2 ==
    sum_m (n2*s1_m - n1*s2_m)^2 -- pure integers (HUGEINT/DECIMAL(38,0)
    products per the operand-cast rule), order-independent, codegen'd
    (no in-row lambda folds).  The single final division renders the
    shift on the 1e-4 grid's scale (the /1e8 undoes the component
    scaling).  Split membership is the engine-portable md5 bucket the
    split family shares.  Cost: one posexplode pass, two
    dimension-bounded aggregations, a (label x dim)-sized join.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "label",
        "vec_id",
        F.when(hash_bucket(F.col("vec_id")) < 80, "train")
        .otherwise("test")
        .alias("split"),
        F.posexplode("embedding").alias("m", "v"),
    ).select(
        "label",
        "vec_id",
        "split",
        F.col("m").cast("bigint").alias("m"),
        F.round(F.col("v").cast("double") * 10000).cast("bigint").alias("x"),
    ).localCheckpoint(eager=True)  # sums + sizes consumers
    sums = comps.groupBy("label", "split", "m").agg(
        F.sum("x").cast("bigint").alias("s")
    )
    sizes = comps.groupBy("label", "split").agg(
        F.countDistinct("vec_id").cast("bigint").alias("n")
    )
    tr = sums.filter(F.col("split") == "train").select(
        "label", "m", F.col("s").alias("s1")
    )
    te = sums.filter(F.col("split") == "test").select(
        "label", "m", F.col("s").alias("s2")
    )
    ntr = sizes.filter(F.col("split") == "train").select(
        "label", F.col("n").alias("n1")
    )
    nte = sizes.filter(F.col("split") == "test").select(
        "label", F.col("n").alias("n2")
    )
    joined = (
        tr.join(te.hint("shuffle_hash"), ["label", "m"])
        .join(F.broadcast(ntr), "label")
        .join(F.broadcast(nte), "label")
    )
    term = F.expr(
        "(CAST(n2 AS DECIMAL(38,0)) * s1 - CAST(n1 AS DECIMAL(38,0)) * s2)"
        " * (CAST(n2 AS DECIMAL(38,0)) * s1 - CAST(n1 AS DECIMAL(38,0)) * s2)"
    )
    return joined.groupBy("label").agg(
        F.max("n1").alias("n_train"),
        F.max("n2").alias("n_test"),
        (
            F.sum(term).cast("double")
            / (
                (F.max("n1") * F.max("n2")).cast("double")
                * (F.max("n1") * F.max("n2")).cast("double")
                * F.lit(100000000.0)
            )
        ).alias("centroid_shift"),
    )


@declared(
    "knn_label_noise",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             {_BUCKET_DUCK.format(col='embedding')} AS bucket
      FROM embeddings
    ),
    sc AS (
      SELECT a.vec_id, a.label, c.label AS cl, c.vec_id AS cand,
             {_DOT_SQL.format(a='a.embedding', b='c.embedding')} AS score
      FROM b a JOIN b c ON c.bucket = a.bucket AND c.vec_id <> a.vec_id
    ),
    rk AS (
      SELECT vec_id, label, cl,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY score DESC, cand) AS rnk
      FROM sc
    )
    SELECT vec_id, label,
           CAST(count(*) AS BIGINT) AS n_neighbors,
           CAST(sum(CASE WHEN cl <> label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_disagree,
           2 * sum(CASE WHEN cl <> label THEN 1 ELSE 0 END) > count(*)
             AS suspect
    FROM rk WHERE rnk <= {TOP_K}
    GROUP BY vec_id, label
    """,
)
def knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-noise detection (confident-learning-lite, Northcutt et
    al. 2021's neighborhood-consensus reduction): for EVERY vector, its
    top-3 same-LSH-bucket neighbors by dot product vote on the label;
    a majority of disagreeing neighbors flags the row as suspect.  The
    labeled-data QA pass a training pipeline runs before trusting its
    labels -- and the all-rows generalization of `hard_negative_mining`
    (which only ranks cross-label near-misses for the 5 probes).

    Scale: candidate pairs come ONLY from the 256-bucket LSH sign-code
    equi-join (the cosine_near_dup_pairs blocking; expected bucket
    population ~n/256, so pair volume ~n^2/256 spread uniformly --
    shuffle-hash pinned, never all-pairs).  Vectors alone in their
    bucket have no neighbors and drop out, identically on both engines
    (multiprobe raises coverage at scale).  Dot products are the
    deterministic sequential fold, ranking total-ordered by
    (score desc, cand_id).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.expr(_BUCKET_SPARK.format(col="embedding"))
        .cast("bigint")
        .alias("bucket"),
    ).localCheckpoint(eager=True)  # both sides of the bucket self-join
    a = b.select(
        F.col("vec_id"),
        F.col("label"),
        F.col("embedding").alias("ae"),
        "bucket",
    )
    c = b.select(
        F.col("vec_id").alias("cand"),
        F.col("label").alias("cl"),
        F.col("embedding").alias("ce"),
        "bucket",
    )
    sc = (
        a.join(c.hint("shuffle_hash"), "bucket")
        .filter(F.col("cand") != F.col("vec_id"))
        .select(
            "vec_id",
            "label",
            "cl",
            "cand",
            dot_double(F.col("ae"), F.col("ce")).alias("score"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cand"))
    top = sc.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )
    dis = F.sum(F.when(F.col("cl") != F.col("label"), 1).otherwise(0))
    return top.groupBy("vec_id", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
        dis.cast("bigint").alias("n_disagree"),
        (2 * dis > F.count(F.lit(1))).alias("suspect"),
    )


# Deterministic +-1 Johnson-Lindenstrauss projection entries from the
# same Knuth-multiplicative stream as the LSH planes: entry (j, i) is
# +1 iff hash(16*64-offset j*64+i) lands in the lower half of the ring.
_JL_DIM = 16
_JL_OFFSET = 1_000_000  # disjoint from the LSH plane index space

_JL_PROJ_SPARK = f"""
transform(sequence(0, {_JL_DIM - 1}), j ->
  aggregate(sequence(1, {DIM}), CAST(0.0 AS DOUBLE), (a, i) ->
    a + CAST(element_at({{col}}, i) AS DOUBLE) *
        (CASE WHEN CAST((CAST({_JL_OFFSET} + j * {DIM} + i - 1 AS BIGINT)
                         * {LSH_MULT}) % {LSH_MOD} AS BIGINT)
                   < {LSH_MOD // 2} THEN 1.0 ELSE -1.0 END)
  ) / 4.0)
"""

_JL_PROJ_DUCK = f"""
list_transform(generate_series(0, {_JL_DIM - 1}), j ->
  list_sum(list_transform(generate_series(1, {DIM}), i ->
    CAST({{col}}[i] AS DOUBLE) *
    (CASE WHEN CAST((CAST({_JL_OFFSET} + j * {DIM} + i - 1 AS BIGINT)
                     * {LSH_MULT}) % {LSH_MOD} AS BIGINT)
               < {LSH_MOD // 2} THEN 1.0 ELSE -1.0 END)
  )) / 4.0)
"""


@declared(
    "jl_projection_distortion",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id, embedding,
             {_JL_PROJ_DUCK.format(col='embedding')} AS p
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qe, p AS qp
          FROM proj WHERE vec_id < {N_QUERIES}),
    pairs AS (
      SELECT q.qid, c.vec_id AS cid,
             sqrt(list_sum(list_transform(generate_series(1, {DIM}), i ->
               (CAST(q.qe[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
               * (CAST(q.qe[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
             ))) AS d_full,
             sqrt(list_sum(list_transform(generate_series(1, {_JL_DIM}), j ->
               (q.qp[j] - c.p[j]) * (q.qp[j] - c.p[j])
             ))) AS d_proj
      FROM q JOIN proj c ON c.vec_id <> q.qid
    ),
    ratios AS (
      SELECT qid, cid, d_proj / d_full AS ratio
      FROM pairs WHERE d_full > 0
    ),
    ranked AS (
      SELECT ratio,
             CAST(row_number() OVER (ORDER BY ratio, qid, cid) AS BIGINT)
               AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM ratios
    )
    SELECT n AS n_pairs,
           max(CASE WHEN rk = 1 THEN ratio END) AS min_ratio,
           max(CASE WHEN rk = (n + 1) // 2 THEN ratio END) AS median_ratio,
           max(CASE WHEN rk = n THEN ratio END) AS max_ratio
    FROM ranked GROUP BY n
    """,
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distance preservation, measured: embeddings
    are projected 64 -> 16 dims through a deterministic +-1/sqrt(16)
    matrix (same Knuth-multiplicative hash stream as the LSH planes,
    disjoint index range), and the probe-pair L2 distance ratio
    d_proj/d_full is summarized as (min, median, max) -- the JL lemma
    says the ratio concentrates near 1, and THIS query is the check
    that the cheap 4x-smaller vectors are safe for coarse filtering
    (the dimension-reduction sibling of `pq_distortion_report`'s
    quantization study; at 100 TB you project once and run every
    downstream distance 4x cheaper).

    Projection and distances are deterministic sequential folds (the
    `dot_double` discipline); the order statistics come from a
    total-ordered rank window (ratio, then pair id), never a float
    aggregate.  sqrt(16)=4 keeps the scale factor exact.

    Cost: one embeddings scan computes all projections in-row (no
    shuffle); pair distances are the bounded probe set x corpus (the
    `knn_brute_force` posture); the rank window runs on ~5n rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    proj = emb.select(
        "vec_id",
        "embedding",
        F.expr(_JL_PROJ_SPARK.format(col="embedding")).alias("p"),
    ).localCheckpoint(eager=True)  # probe side + candidate side
    q = proj.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("p").alias("qp"),
    )
    c = proj.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("p").alias("cp"),
    )
    d_full = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("qe"),
                F.col("ce"),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    d_proj = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("qp"), F.col("cp"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", d_full.alias("d_full"), d_proj.alias("d_proj"))
    )
    ratios = pairs.filter(F.col("d_full") > 0).select(
        "qid", "cid", (F.col("d_proj") / F.col("d_full")).alias("ratio")
    )
    w = Window.orderBy("ratio", "qid", "cid")
    ranked = ratios.select(
        "ratio",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    return ranked.groupBy("n").agg(
        F.max(F.when(F.col("rk") == 1, F.col("ratio"))).alias("min_ratio"),
        F.max(
            F.when(F.col("rk") == F.expr("(n + 1) DIV 2"), F.col("ratio"))
        ).alias("median_ratio"),
        F.max(F.when(F.col("rk") == F.col("n"), F.col("ratio"))).alias("max_ratio"),
    ).select(
        F.col("n").alias("n_pairs"), "min_ratio", "median_ratio", "max_ratio"
    )


CKA_SPLIT = 32  # representation A = dims 1..32, representation B = 33..64


@declared(
    "cka_embedding_halves",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             unnest(generate_series(1, 64)) AS m,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 100) AS BIGINT)
               AS x
      FROM embeddings
    ),
    s AS (SELECT m, CAST(sum(x) AS BIGINT) AS sm FROM q GROUP BY m),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
    c AS (
      SELECT q.vec_id, q.m, nn.n * q.x - s.sm AS c
      FROM q JOIN s USING (m) CROSS JOIN nn
    ),
    g AS (
      SELECT a.m AS i, b.m AS j, CAST(sum(a.c * b.c) AS BIGINT) AS g
      FROM c a JOIN c b ON a.vec_id = b.vec_id
      GROUP BY 1, 2
    ),
    blocks AS (
      SELECT
        CAST(sum(CASE WHEN i <= {CKA_SPLIT} AND j <= {CKA_SPLIT}
                      THEN CAST(g AS HUGEINT) * g END) AS DOUBLE) AS hsic_xx,
        CAST(sum(CASE WHEN i > {CKA_SPLIT} AND j > {CKA_SPLIT}
                      THEN CAST(g AS HUGEINT) * g END) AS DOUBLE) AS hsic_yy,
        CAST(sum(CASE WHEN i <= {CKA_SPLIT} AND j > {CKA_SPLIT}
                      THEN CAST(g AS HUGEINT) * g END) AS DOUBLE) AS hsic_xy
      FROM g
    )
    SELECT nn.n AS n_vectors, b.hsic_xy, b.hsic_xx, b.hsic_yy,
           b.hsic_xy / sqrt(b.hsic_xx * b.hsic_yy) AS cka
    FROM blocks b CROSS JOIN nn
    """,
)
def cka_embedding_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered kernel alignment, Kornblith et al. ICML
    2019) between the two 32-dim halves of the embedding space --
    the standard representation-similarity readout (are two feature
    blocks / two model layers encoding the same structure?), here
    instrumenting whether the embedding's front and back halves are
    redundant (CKA ~ 1) or complementary (~ 0); the same query with
    a second table is the cross-model comparison.

    CKA = ||Xc'Yc||_F^2 / (||Xc'Xc||_F ||Yc'Yc||_F) is scale-invariant,
    so centering uses the INTEGER n-scaling trick (c = n*x - colsum,
    the label_silhouette_lite convention): every Gram cell is an exact
    bigint, cell squares accumulate in DECIMAL(38,0)/HUGEINT, and only
    the final three block sums convert to double (identical nearest
    rounding both engines) for one sqrt/divide.  Plan: column sums
    collapse to a 64-long broadcast array, centering + the 64x64 cell
    fan-out happen IN-ROW (embedding_gram_matrix shape -- no self-join
    shuffle, unlike the oracle's join spelling), cells partial-agg
    map-side to 4096 rows, blocks to 1.  Corpus-size-independent
    output; at 100 TB cells tree-reduce and the envelope needs
    DECIMAL(38,0) from the first product (n*|x| here stays < 2^18).
    """
    # embeddings feeds three consumers (column sums, the row count, the
    # centering pass): checkpoint the narrow projection once -- one scan.
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    q = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("m0", "v"),
    ).select(
        "vec_id",
        (F.col("m0") + 1).alias("m"),
        F.round(F.col("v").cast("double") * 100).cast("bigint").alias("x"),
    )
    sums = q.groupBy("m").agg(F.sum("x").cast("bigint").alias("sm"))
    sarr = sums.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("m", "sm"))), lambda s: s.sm
        ).alias("sv")
    )
    nn = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    centered = (
        emb.crossJoin(F.broadcast(sarr))
        .crossJoin(F.broadcast(nn))
        .select(
            "vec_id",
            "n",
            F.zip_with(
                "embedding",
                "sv",
                lambda v, s: F.col("n")
                * F.round(v.cast("double") * 100).cast("bigint")
                - s,
            ).alias("cv"),
        )
    )
    # The Gram matrix is symmetric (g[i][j] = g[j][i]), so only the
    # upper triangle's 2080 products per row are emitted (49% less
    # fan-out + aggregation than the full 64x64) and the off-diagonal
    # block sums double exactly in integer space below.
    pairs = centered.select(
        "n",
        F.explode(
            F.expr(
                """flatten(transform(sequence(1, 64), i ->
                     transform(sequence(i, 64), j ->
                       struct(CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
                              element_at(cv, i) * element_at(cv, j)
                                AS prod))))"""
            )
        ).alias("p"),
    ).select("n", "p.i", "p.j", "p.prod")
    cells = pairs.groupBy("i", "j").agg(
        F.sum("prod").cast("bigint").alias("g"), F.max("n").alias("n")
    )
    g2 = "CAST(g AS DECIMAL(38,0)) * g"
    # within-half blocks: upper-triangle cells with i < j stand for both
    # (i,j) and (j,i) -- weight 2, diagonal weight 1; the cross block
    # (i <= split < j) lives entirely in the upper triangle already
    g2w = f"(CASE WHEN i = j THEN 1 ELSE 2 END) * ({g2})"
    blocks = cells.agg(
        F.max("n").alias("n_vectors"),
        F.expr(
            f"CAST(sum(CASE WHEN i <= {CKA_SPLIT} AND j > {CKA_SPLIT}"
            f" THEN {g2} END) AS DOUBLE)"
        ).alias("hsic_xy"),
        F.expr(
            f"CAST(sum(CASE WHEN i <= {CKA_SPLIT} AND j <= {CKA_SPLIT}"
            f" THEN {g2w} END) AS DOUBLE)"
        ).alias("hsic_xx"),
        F.expr(
            f"CAST(sum(CASE WHEN i > {CKA_SPLIT} AND j > {CKA_SPLIT}"
            f" THEN {g2w} END) AS DOUBLE)"
        ).alias("hsic_yy"),
    )
    return blocks.select(
        "n_vectors",
        "hsic_xy",
        "hsic_xx",
        "hsic_yy",
        (F.col("hsic_xy") / F.sqrt(F.col("hsic_xx") * F.col("hsic_yy"))).alias(
            "cka"
        ),
    )


# Matryoshka-style truncation: rank with only the first MRL_PREFIX_DIM
# of the 64 embedding dimensions and measure recall against full-dim.
MRL_PREFIX_DIM = 8
MRL_TOP_K = 10
_MRL_DOT_PREFIX_SQL = (
    f"list_sum(list_transform(generate_series(1, {MRL_PREFIX_DIM}), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


@declared(
    "mrl_prefix_dim_recall",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    full_s AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             {_DOT_SQL.format(a='q.qe', b='c.embedding')} AS score
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ),
    full_r AS MATERIALIZED (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, cand_id) AS rnk
        FROM full_s
      ) WHERE rnk <= {MRL_TOP_K}
    ),
    pre_s AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             {_MRL_DOT_PREFIX_SQL.format(a='q.qe', b='c.embedding')} AS score
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ),
    pre_r AS MATERIALIZED (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, cand_id) AS rnk
        FROM pre_s
      ) WHERE rnk <= {MRL_TOP_K}
    )
    SELECT f.query_id,
           CAST({MRL_TOP_K} AS BIGINT) AS k,
           CAST(count(p.cand_id) AS BIGINT) AS n_overlap,
           CAST((1000000 * count(p.cand_id)) // {MRL_TOP_K} AS BIGINT)
             AS recall_ppm
    FROM full_r f
    LEFT JOIN pre_r p
      ON p.query_id = f.query_id AND p.cand_id = f.cand_id
    GROUP BY f.query_id
    """,
)
def mrl_prefix_dim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka / dimension-truncation recall (Kusupati et al. 2022):
    rank the corpus by dot product using only the FIRST
    {MRL_PREFIX_DIM} of 64 embedding dimensions and measure top-
    {MRL_TOP_K} recall against the full-dimension ranking, per probe
    query.  The knob table for the cheapest ANN accelerator there is --
    prefix truncation costs nothing at index time and divides both
    memory traffic and FLOPs by d/d'; this query measures what it costs
    in recall on the actual corpus (on non-MRL-trained embeddings,
    expect visible loss -- that honest number is the point).
    Complements the IVF/PQ cost knobs (`ann_ivfpq_topk` nprobe sweep,
    `pq_distortion_report`): truncation is the third axis after
    clustering and quantization.

    Both rankings use the sequential zip-multiply-fold dot product
    (bit-equal cross-engine); recall is an integer ppm.  Shape: probe
    queries broadcast ({N_QUERIES} rows), candidates score locally, two
    per-query top-{MRL_TOP_K} windows, and the overlap join runs on
    {N_QUERIES} x {MRL_TOP_K} rows.
    """
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(
        eager=True
    )  # query probe + two candidate passes
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce")
    )

    def topk(score_col) -> DataFrame:
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("cand_id") != F.col("query_id"))
            .select("query_id", "cand_id", score_col.alias("score"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("cand_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= MRL_TOP_K)
            .select("query_id", "cand_id")
        )

    full_r = topk(dot_double(F.col("qe"), F.col("ce")))
    pre_r = topk(
        dot_double(
            F.slice(F.col("qe"), 1, MRL_PREFIX_DIM),
            F.slice(F.col("ce"), 1, MRL_PREFIX_DIM),
        )
    )
    return (
        full_r.join(
            F.broadcast(pre_r.withColumn("hit", F.lit(1))),
            ["query_id", "cand_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.lit(MRL_TOP_K).cast("bigint").alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_overlap"),
            F.expr(
                f"CAST((1000000 * sum(coalesce(hit, 0))) DIV {MRL_TOP_K}"
                " AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )
