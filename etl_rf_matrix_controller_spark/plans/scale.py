"""Scale utilities: bucketed co-located joins and salted skew aggregation.

These are the two physical-design levers the engine owns beyond Catalyst
(SURVEY.md SS4): (a) bucketing fact tables on their join key so repeated
joins skip the exchange entirely, (b) salting hot keys so a skewed
aggregation spreads across executors.  Both are demonstrated and
plan-asserted in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> None:
    """Persist ``df`` bucketed+sorted by ``key``.

    Two tables bucketed identically on their join key co-locate: Spark
    plans a SortMergeJoin with NO Exchange on either side.  At 100 TB this
    converts every repeated fact-fact join (orders x lineitem) from two
    full-data shuffles into zero -- the single biggest recurring saving in
    a star-schema pipeline.  (Parquet+bucket metadata lives in the session
    catalog / metastore.)
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


from contextlib import contextmanager


@contextmanager
def low_overhead_plan_scope(spark, width: int):
    """Small-data job posture (round 11, guide §2.2/§2.6): shuffle
    width right-sized to the data in scope (not the cluster-wide conf)
    and AQE off -- plans in these scopes are already explicitly
    partitioned, so AQE has nothing to coalesce or re-plan, but it
    turns every Exchange into its own stage-job whose fixed driver
    latency dominates when the data is KB-scale (measured ~20
    jobs/micro-batch in streaming ingest, 71 jobs in dbscan's label
    loop).  Callers gate entry on a measured size signal (batch_width
    params, row counts), so corpus-scale runs keep AQE's skew/coalesce
    wins; confs restore on exit."""
    before_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    before_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", before_sp)


def adaptive_state_shards(spark, per_core: int = 4, floor: int = 32) -> int:
    """Shard count for applyInPandasWithState group keys, derived from
    the session's parallelism instead of a constant (guide §2: make
    partitioning scale-adaptive, never a constant tuned for one
    machine).  Entity-keyed state ops shard entities into group keys;
    results are shard-count-INVARIANT (entities/buckets are processed
    independently inside a shard), but the pandas per-GROUP overhead
    (~1-2 ms each) is not: the former fixed 1024 shards cost ~1-2 s per
    micro-batch at local core counts, while a 1000-core cluster wants
    thousands of shards for parallelism.  per_core x cores keeps every
    core busy with a few groups; the floor guards tiny test sessions."""
    return max(per_core * spark.sparkContext.defaultParallelism, floor)


def collect_bounded(df: DataFrame, bound: int, what: str) -> list:
    """Driver-side collect with a hard cardinality guard (guide §5: the
    driver does no data work).  The driver-side iteration rewrites
    (pagerank/kcore/bfs/hits/sssp/lpa/harmonic/ktruss/markov/eigvec)
    collect frames argued DIMENSION-bounded (<=|nations|^2 edges,
    <=|types|^2 cells, GRAM_DIMS^2 cells); this enforces the argument:
    exceeding ``bound`` fails loudly, naming the distributed fallback.
    The check runs post-collect so it costs ZERO extra jobs (a limit()
    would plan CollectLimit's incremental result-stage waves on queries
    that are already overhead-bound); the transfer itself is backstopped
    by spark.driver.maxResultSize (1g default), which errors -- not
    OOMs -- long before a pathological input hurts the driver."""
    rows = df.collect()
    if len(rows) > bound:
        raise ValueError(
            f"{what}: driver-side collect exceeds its dimension bound "
            f"({bound} rows) -- the input is not dimension-bounded here; "
            "run the documented distributed form instead"
        )
    return rows


def salted_agg(
    df: DataFrame,
    group_col: str,
    agg_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (key, salt) -- the hot key's rows spread over
    ``n_salts`` partial groups computed in parallel; phase 2 combines the
    tiny partials.  Identical results to a direct groupBy (sum is
    associative); the win is wall-clock under skew, where one reducer
    would otherwise process the entire hot key alone.  AQE's skew-join
    split does this automatically for joins; aggregation salting is ours.
    """
    # Row-unique salt source: salting on a VALUE column would collapse a
    # hot key with constant values into one salt bucket and spread nothing.
    salted = df.withColumn(
        "_salt", F.monotonically_increasing_id() % n_salts
    )
    partial = salted.groupBy(group_col, "_salt").agg(
        F.sum(agg_col).alias("_psum"), F.count(F.lit(1)).alias("_pcnt")
    )
    return partial.groupBy(group_col).agg(
        F.sum("_psum").alias(f"sum_{agg_col}"),
        F.sum("_pcnt").alias("n_rows"),
    )
