"""Training-data pipeline composition: portable sampling, splits,
deterministic shuffle, and the end-to-end curation query.

These are the glue operators a 100 TB corpus pipeline needs between the
per-doc analyses (operators/text.py) and training: reproducible sampling
and splitting that is ENGINE-PORTABLE (md5-derived, not engine hash()),
deterministic shuffling for stable data ordering, and the composed
filter -> dedup -> split -> aggregate flow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Portable deterministic bucket in [0, buckets): md5-prefix of the
    key's string form.  Unlike ``F.hash`` (Murmur3, Spark-specific) this
    reproduces in any engine, so sample membership survives an engine
    migration -- a property real pipelines need for audit trails."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
    return h % buckets


def _bucket_sql(expr: str, buckets: int = 100) -> str:
    return f"('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 8))::BIGINT % {buckets}"


@declared(
    "hash_mod_sample",
    oracle=f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE {_bucket_sql('event_id', 10)} = 0
    """,
)
def hash_mod_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample by key hash.  Engine-portable and
    rerun-stable, unlike .sample() (RNG) or hash() (Murmur3) -- the only
    sampling a reproducible pipeline should use.  Pure filter: pushdown
    composes, no shuffle."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(hash_bucket(F.col("event_id"), 10) == 0).select(
        "event_id", "user_id", "event_type"
    )


@declared(
    "hash_split_assign",
    oracle=f"""
    WITH tagged AS (
      SELECT lang,
             CASE WHEN {_bucket_sql('doc_id')} < 80 THEN 'train'
                  WHEN {_bucket_sql('doc_id')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, count(*) AS n_docs
    FROM tagged
    GROUP BY lang, split
    """,
)
def hash_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by key hash, stratified count by
    language.  Split membership is a pure function of the key: adding data
    never reshuffles existing examples across splits (no leakage on
    incremental builds)."""
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    tagged = docs.select(
        "lang",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )
    return tagged.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n_docs"))


@declared(
    "deterministic_shuffle_order",
    oracle="""
    SELECT doc_id, shuffle_rank
    FROM (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS shuffle_rank
      FROM documents
    ) t
    WHERE shuffle_rank <= 20
    """,
)
def deterministic_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffle: order by md5(key).  Gives every run
    (and every engine) the same pseudo-random training order -- the
    determinism knob for data-ordering ablations.  Top-20 shown; the full
    ordering is the same expression without the limit (at scale: sort
    within partitions after repartitioning by a hash prefix, avoiding a
    global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (
        docs.select("doc_id", F.row_number().over(w).alias("shuffle_rank"))
        .filter(F.col("shuffle_rank") <= 20)
    )


@declared(
    "pipeline_end_to_end",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             md5(lower(trim(text))) AS content_hash
      FROM documents
      WHERE length(text) >= 100
    ),
    deduped AS (
      SELECT doc_id, lang, n_tokens,
             row_number() OVER (PARTITION BY content_hash ORDER BY doc_id)
               AS rn
      FROM scored
    ),
    split_tagged AS (
      SELECT lang, n_tokens,
             CASE WHEN {_bucket_sql('doc_id')} < 80 THEN 'train'
                  WHEN {_bucket_sql('doc_id')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM deduped WHERE rn = 1
    )
    SELECT lang, split,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM split_tagged
    GROUP BY lang, split
    """,
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation flow: length filter -> exact dedup -> split
    assignment -> per-(lang, split) token budget.  One declared query
    proving the operators COMPOSE: the filter pushes to the scan, dedup is
    one hash-key shuffle, split tagging is a projection, and the final
    aggregate is partial+final -- three stages total regardless of corpus
    size."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 100)
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.md5(F.lower(F.trim("text"))).alias("content_hash"),
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    deduped = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    b = hash_bucket(F.col("doc_id"))
    tagged = deduped.select(
        "lang",
        "n_tokens",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )
    return tagged.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


@declared(
    "orders_above_cust_avg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice, 2) AS total_price,
           ((((a4 + 50) - (a4 + 50) % 100) / 100) / 100.0) AS cust_avg
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             ws / 10000.0 / n AS avg_raw,
             ((2 * ws + n) - (2 * ws + n) % (2 * n)) / (2 * n) AS a4
      FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               sum(CAST(round(o_totalprice * 10000) AS BIGINT))
                 OVER (PARTITION BY o_custkey) AS ws,
               count(*) OVER (PARTITION BY o_custkey) AS n
        FROM orders
      ) base
    ) t
    WHERE o_totalprice > avg_raw
    """,
)
def orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate filter: orders above their customer's average,
    expressed as a window (one shuffle) instead of a correlated subquery
    (which Catalyst would de-correlate into the same plan anyway).

    The filter compares against the RAW mean (identical doubles on both
    engines -- same integer sum, same two divisions); the reported mean is
    rounded in integer space (plans/conventions.py rationale: engine
    round() diverges on half-boundary doubles -- this query found that).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    ws = F.sum(F.round(F.col("o_totalprice") * 10000).cast("bigint")).over(w)
    n = F.count(F.lit(1)).over(w)
    avg_raw = ws / 10000.0 / n
    x = 2 * ws + n
    a4 = (x - x % (2 * n)) / (2 * n)
    y = a4 + 50
    cust_avg = ((y - y % 100) / 100) / 100.0
    return (
        orders.withColumn("avg_raw", avg_raw)
        .withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > F.col("avg_raw"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "cust_avg",
        )
    )


@declared(
    "null_handling_semantics",
    oracle="""
    WITH n AS (
      SELECT o_orderkey,
             nullif(o_orderstatus, 'P') AS status_n,
             round(o_totalprice, 2) AS price
      FROM orders
    )
    SELECT status_n,
           count(*) AS n_rows,
           count(status_n) AS n_nonnull,
           CAST(sum(CASE WHEN status_n IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_null,
           round(max(price), 2) AS max_price
    FROM n
    GROUP BY status_n
    """,
)
def null_handling_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null discipline the reference never had (absent dict keys ~ NULL,
    SURVEY SS2.12): NULL grouping keys group together, count(*) vs
    count(col) differ on nulls, and null-safe equality (<=>) treats NULL
    as a comparable value.  Both engines agree on all three -- pinned
    here."""
    orders = load_table(spark, sf_dir, "orders")
    n = orders.select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("P")).alias("status_n"),
        F.round("o_totalprice", 2).alias("price"),
    )
    return n.groupBy("status_n").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("status_n").alias("n_nonnull"),
        F.sum(F.col("status_n").eqNullSafe(F.lit(None)).cast("int"))
        .cast("bigint")
        .alias("n_nullsafe_null"),
        F.round(F.max("price"), 2).alias("max_price"),
    )


@declared(
    "embedding_array_ops",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(list_max(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))) AS DOUBLE) AS max_val,
           CAST(list_min(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))) AS DOUBLE) AS min_val,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val
    FROM embeddings
    """,
)
def embedding_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the vector column: size, min/max,
    element access -- all JVM-side higher-order/array built-ins, no
    explode, no shuffle.  Values are emitted RAW: both engines read the
    same float32 bits (including signed zeros), so any rounding could
    only introduce divergence (found at sf0.1: round() disagreement plus
    a -0.0 ordering artifact), never remove it."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr_d = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_max(arr_d).alias("max_val"),
        F.array_min(arr_d).alias("min_val"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
    )


@declared(
    "weighted_systematic_sample",
    oracle="""
    WITH w AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents
      FROM orders
    ),
    cum AS (
      SELECT o_orderkey, w_cents,
             CAST(sum(w_cents) OVER (
               ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumw,
             CAST(sum(w_cents) OVER () AS BIGINT) AS total
      FROM w
    ),
    strided AS (
      SELECT o_orderkey, w_cents, cumw,
             greatest(total // 400, 1) AS stride
      FROM cum
    )
    SELECT o_orderkey, w_cents,
           CAST(cumw // stride AS BIGINT) AS bucket
    FROM strided
    WHERE cumw // stride > (cumw - w_cents) // stride
    """,
)
def weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic (PPS) sampling: walk the cumulative weight line
    in strides of total/400 and keep each row that crosses a stride
    boundary -- selection probability proportional to o_totalprice, ~400
    rows out, zero RNG (deterministic across runs and engines).

    This is how you draw a weighted training subsample without
    normalizing weights to floats: all arithmetic is integer cents with
    floor division.  The running sum is an unpartitioned window here (the
    honest local formulation); at 100 TB you compute per-partition weight
    subtotals, prefix-sum the ~thousands of subtotals on the driver, and
    broadcast the offsets -- the same two-pass trick as
    deterministic_shuffle_order, turning the global cumsum into one scan
    + one map.
    """
    w = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("w_cents"),
    )
    wo = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, 0)
    cum = w.select(
        "o_orderkey",
        "w_cents",
        F.sum("w_cents").over(wo).cast("bigint").alias("cumw"),
        F.sum("w_cents")
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("total"),
    )
    strided = cum.select(
        "o_orderkey",
        "w_cents",
        "cumw",
        F.greatest(F.expr("total DIV 400"), F.lit(1)).alias("stride"),
    )
    return strided.filter(
        F.expr("cumw DIV stride > (cumw - w_cents) DIV stride")
    ).select(
        "o_orderkey", "w_cents", F.expr("cumw DIV stride").cast("bigint").alias("bucket")
    )


@declared(
    "split_balance_tv_distance",
    oracle=f"""
    WITH tagged AS (
      SELECT lang,
             CASE WHEN {_bucket_sql('doc_id')} < 80 THEN 'train'
                  WHEN {_bucket_sql('doc_id')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    per_lang AS (
      SELECT lang,
             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tr,
             CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_va,
             CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_te
      FROM tagged GROUP BY lang
    ),
    m AS (
      SELECT CAST(sum(n_tr) AS BIGINT) AS nt,
             CAST(sum(n_va) AS BIGINT) AS nv,
             CAST(sum(n_te) AS BIGINT) AS ne,
             CAST(sum(abs(n_va * (SELECT sum(n_tr) FROM per_lang)
                          - n_tr * (SELECT sum(n_va) FROM per_lang)))
               AS BIGINT) AS num_va,
             CAST(sum(abs(n_te * (SELECT sum(n_tr) FROM per_lang)
                          - n_tr * (SELECT sum(n_te) FROM per_lang)))
               AS BIGINT) AS num_te
      FROM per_lang
    )
    SELECT 'val' AS split, nv AS n_docs,
           CAST((num_va * 1000000) // (2 * nv * nt) AS BIGINT)
             AS tv_vs_train_ppm
    FROM m
    UNION ALL
    SELECT 'test', ne,
           CAST((num_te * 1000000) // (2 * ne * nt) AS BIGINT)
    FROM m
    """,
)
def split_balance_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-health audit: total-variation distance between each eval
    split's language distribution and train's -- the stratification
    check run after hash_split_assign (a TV near 0 means val/test are
    drawn from the same language mixture as train; a spike means some
    language landed lopsided and eval metrics will not transfer).

    Integer-exact: each |p_l - q_l| term cross-multiplies to
    |n_l_s * N_train - n_l_train * N_s| over the common denominator,
    so the sum is an integer and only the final ppm divides.  One
    aggregation to per-language conditional counts (|langs| rows), one
    scalar fold -- both corpus-size-independent after the first
    shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    tagged = docs.select(
        "lang",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias(
            "split"
        ),
    )
    per_lang = tagged.groupBy("lang").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("bigint")
        .alias("n_tr"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("bigint")
        .alias("n_va"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("bigint")
        .alias("n_te"),
    )
    tot = per_lang.agg(
        F.sum("n_tr").cast("bigint").alias("nt"),
        F.sum("n_va").cast("bigint").alias("nv"),
        F.sum("n_te").cast("bigint").alias("ne"),
    )
    m = (
        per_lang.crossJoin(F.broadcast(tot))
        .agg(
            F.max("nt").cast("bigint").alias("nt"),
            F.max("nv").cast("bigint").alias("nv"),
            F.max("ne").cast("bigint").alias("ne"),
            F.sum(F.abs(F.col("n_va") * F.col("nt") - F.col("n_tr") * F.col("nv")))
            .cast("bigint")
            .alias("num_va"),
            F.sum(F.abs(F.col("n_te") * F.col("nt") - F.col("n_tr") * F.col("ne")))
            .cast("bigint")
            .alias("num_te"),
        )
    )
    return m.selectExpr(
        "stack(2,"
        " 'val', nv, CAST((num_va * 1000000) DIV (2 * nv * nt) AS BIGINT),"
        " 'test', ne, CAST((num_te * 1000000) DIV (2 * ne * nt) AS BIGINT)"
        ") AS (split, n_docs, tv_vs_train_ppm)"
    )


@declared(
    "srm_check",
    oracle=f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    tagged AS (
      SELECT CASE WHEN {_bucket_sql('user_id', 2)} = 0 THEN 'A' ELSE 'B' END
               AS variant
      FROM users
    ),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
      FROM tagged
    )
    SELECT n_users, n_a, n_b, n_a - n_b AS delta,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             / CAST(n_users AS DOUBLE) AS chi2,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             / CAST(n_users AS DOUBLE) > 3.841e0 AS srm_flag
    FROM counts
    """,
)
def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for a 50/50 experiment assignment: users
    are bucketed into variants A/B by the same engine-portable md5 hash
    the split assigner uses, and the one-degree-of-freedom chi-square
    statistic against the expected even split is reported with the
    standard p<0.05 flag (chi2 > 3.841).  SRM is the first sanity gate of
    any A/B readout -- a biased assignment invalidates every downstream
    metric before it is computed (Kohavi et al. 2012).

    For an even split the chi-square collapses algebraically to
    (n_a - n_b)^2 / n -- a single double division of exact integers, so
    the statistic is bit-identical across engines (no float expected-count
    intermediates).  Cost: one distinct on user_id (map-side combinable)
    and one conditional aggregation riding the same pass; output is one
    row at any corpus size.
    """
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    tagged = users.select(
        F.when(hash_bucket(F.col("user_id"), 2) == 0, "A")
        .otherwise("B")
        .alias("variant")
    )
    counts = tagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    chi2 = (d * d).cast("double") / F.col("n_users").cast("double")
    return counts.select(
        "n_users",
        "n_a",
        "n_b",
        d.alias("delta"),
        chi2.alias("chi2"),
        (chi2 > F.lit(3.841)).alias("srm_flag"),
    )


@declared(
    "ab_conversion_ztest",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN {_bucket_sql('user_id', 2)} = 0 THEN 'A' ELSE 'B' END
               AS variant,
             max(CASE WHEN event_type = 'purchase' AND value > 90.0e0
                 THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    counts AS (
      SELECT
        CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)
             AS BIGINT) AS conv_a,
        CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)
             AS BIGINT) AS conv_b
      FROM per_user
    ),
    stat AS (
      SELECT n_a, n_b, conv_a, conv_b,
             CASE WHEN conv_a + conv_b > 0
                   AND conv_a + conv_b < n_a + n_b THEN
               (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
                      * (1.0e0 - CAST(conv_a + conv_b AS DOUBLE)
                                 / CAST(n_a + n_b AS DOUBLE))
                      * (1.0e0 / CAST(n_a AS DOUBLE)
                         + 1.0e0 / CAST(n_b AS DOUBLE)))
             END AS z_score
      FROM counts
    )
    SELECT n_a, n_b, conv_a, conv_b,
           CAST((1000000 * conv_a) // n_a AS BIGINT) AS rate_a_ppm,
           CAST((1000000 * conv_b) // n_b AS BIGINT) AS rate_b_ppm,
           z_score, abs(z_score) > 1.96e0 AS significant
    FROM stat
    """,
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on high-value conversion (any 'purchase'
    event with value > 90) between the hash-assigned A/B variants of
    `srm_check`: per-variant user and converter counts, integer-ppm
    rates, the pooled-variance z statistic and the |z| > 1.96
    significance call -- the canonical experiment readout, downstream
    of the SRM sanity gate.  The value threshold keeps the outcome
    non-saturated on this corpus (plain any-purchase converts every
    user); a degenerate pooled rate (0 or 1) yields NULL z on both
    engines instead of a divide-by-zero.

    One per-user aggregation (variant is a pure hash of the key;
    conversion a max() over the user's events) and one global
    conditional rollup -- two combinable passes, output is a single row
    at any scale.  The z-score is a fixed sequence of correctly-rounded
    double ops (divisions of exact integers, one IEEE sqrt) written
    identically on both engines, so even the float statistic
    hash-matches; rates are integer-floored ppm.
    """

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90.0),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(hash_bucket(F.col("user_id"), 2) == 0, "A")
        .otherwise("B")
        .alias("variant"),
        "converted",
    )
    counts = per_user.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    conv_t = F.col("conv_a") + F.col("conv_b")
    n_t = F.col("n_a") + F.col("n_b")
    z = F.when(
        (conv_t > 0) & (conv_t < n_t),
        (pa - pb)
        / F.sqrt(
            pp
            * (F.lit(1.0) - pp)
            * (
                F.lit(1.0) / F.col("n_a").cast("double")
                + F.lit(1.0) / F.col("n_b").cast("double")
            )
        ),
    )
    return counts.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.expr("CAST((1000000 * conv_a) DIV n_a AS BIGINT)").alias("rate_a_ppm"),
        F.expr("CAST((1000000 * conv_b) DIV n_b AS BIGINT)").alias("rate_b_ppm"),
        z.alias("z_score"),
        (F.abs(z) > F.lit(1.96)).alias("significant"),
    )


@declared(
    "mann_whitney_value_test",
    oracle="""
    WITH rows_in AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
             CAST(round(value * 10000) AS BIGINT) AS x_s
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    per_val AS (
      SELECT x_s,
             CAST(sum(g1) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS ct
      FROM rows_in GROUP BY x_s
    ),
    ranked AS (
      SELECT c1, ct,
             CAST(coalesce(sum(ct) OVER (ORDER BY x_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_less
      FROM per_val
    ),
    stat AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(ct - c1) AS BIGINT) AS n2,
             CAST(sum(c1 * (2 * cum_less + ct + 1)) AS BIGINT) AS r1_x2,
             CAST(sum(ct * ct * ct - ct) AS BIGINT) AS tie_term
      FROM ranked
    )
    SELECT n1, n2, r1_x2,
           CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           z, abs(z) > 1.96e0 AS significant
    FROM (
      SELECT *,
             CAST(r1_x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
             / (2.0e0 * sqrt(
                 CAST(n1 * n2 AS DOUBLE)
                 * CAST((n1 + n2 + 1) * (n1 + n2) * (n1 + n2 - 1)
                        - tie_term AS DOUBLE)
                 / CAST(12 * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)))
               AS z
      FROM stat
    )
    """,
)
def mann_whitney_value_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test comparing the `value` distributions
    of purchase vs click events -- the nonparametric sibling of
    `ab_conversion_ztest` (which tests a binary rate): does one event
    type stochastically dominate the other, with no normality
    assumption?  The workhorse A/B readout for skewed revenue-like
    metrics (Mann & Whitney 1947).

    Exactness under ties: average ranks are half-integers, so the engine
    carries DOUBLED rank sums -- for a distinct value with ct total rows
    and cum_less smaller rows, each row's doubled midrank is
    2*cum_less + ct + 1, an integer; R1 and U1 stay doubled integers
    end-to-end.  The tie-corrected variance assembles from the integer
    moments n1, n2, sum(ct^3 - ct) in one fixed float expression
    (divisions + one IEEE sqrt, written identically in the oracle), so
    even z hash-matches.  Integer envelope: n^3 must stay below 2^53 --
    fine to ~2e17 rows-per-test; past that, cast the variance operands
    to DECIMAL(38,0) first.

    Cost: one events scan -> per-distinct-value counts (map-combinable),
    then a window over DISTINCT VALUES only (the value grid, not the
    rows -- single-partition but grid-bounded, the `theil_sen` posture)
    and a one-row rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    rows_in = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g1"),
        F.round(F.col("value") * 10000).cast("bigint").alias("x_s"),
    )
    per_val = rows_in.groupBy("x_s").agg(
        F.sum("g1").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("ct"),
    )
    w = Window.orderBy("x_s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_val.select(
        "c1",
        "ct",
        F.coalesce(F.sum("ct").over(w), F.lit(0)).cast("bigint").alias("cum_less"),
    )
    stat = ranked.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("ct") - F.col("c1")).cast("bigint").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum_less") + F.col("ct") + 1))
        .cast("bigint")
        .alias("r1_x2"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("bigint")
        .alias("tie_term"),
    )
    n = F.col("n1") + F.col("n2")
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    z = (u1_x2 - F.col("n1") * F.col("n2")).cast("double") / (
        F.lit(2.0)
        * F.sqrt(
            (F.col("n1") * F.col("n2")).cast("double")
            * ((n + 1) * n * (n - 1) - F.col("tie_term")).cast("double")
            / (F.lit(12) * n * (n - 1)).cast("double")
        )
    )
    return stat.select(
        "n1",
        "n2",
        "r1_x2",
        u1_x2.cast("bigint").alias("u1_x2"),
        z.alias("z"),
        (F.abs(z) > F.lit(1.96)).alias("significant"),
    )


@declared(
    "welch_t_value_test",
    oracle="""
    WITH rows_in AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
             CAST(round(value * 10000) AS BIGINT) AS x_s
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    m AS (
      SELECT CAST(sum(g1) AS HUGEINT) AS n1,
             CAST(sum(1 - g1) AS HUGEINT) AS n2,
             CAST(sum(g1 * x_s) AS HUGEINT) AS s1,
             CAST(sum((1 - g1) * x_s) AS HUGEINT) AS s2,
             CAST(sum(g1 * CAST(x_s AS HUGEINT) * x_s) AS HUGEINT) AS q1,
             CAST(sum((1 - g1) * CAST(x_s AS HUGEINT) * x_s) AS HUGEINT) AS q2
      FROM rows_in
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           t_stat,
           (u1 + u2) * (u1 + u2)
             / (u1 * u1 / CAST(n1 - 1 AS DOUBLE)
                + u2 * u2 / CAST(n2 - 1 AS DOUBLE)) AS df_welch,
           abs(t_stat) > 1.96e0 AS significant
    FROM (
      SELECT n1, n2, u1, u2,
             (CAST(s1 * n2 - s2 * n1 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE))
               / sqrt(u1 + u2) AS t_stat
      FROM (
        SELECT n1, n2, s1, s2,
               CAST(n1 * q1 - s1 * s1 AS DOUBLE)
                 / CAST(n1 * n1 * (n1 - 1) AS DOUBLE) AS u1,
               CAST(n2 * q2 - s2 * s2 AS DOUBLE)
                 / CAST(n2 * n2 * (n2 - 1) AS DOUBLE) AS u2
        FROM m
      )
    )
    WHERE u1 + u2 > 0
    """,
)
def welch_t_value_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on the `value` of purchase vs
    click events -- the parametric counterpart of
    `mann_whitney_value_test` (same contrast, mean-difference instead of
    rank-dominance) with the Welch-Satterthwaite effective df, the
    default two-sample test when variances differ (Welch 1947).

    Exactness: the six moments (n, sum, sum-of-squares per group)
    accumulate as exact integers on 1e4-scaled values -- one conditional
    aggregation pass, no per-group split -- in DECIMAL(38,0) (operands
    cast BEFORE the square so q never wraps int64).  u_i = var_i/n_i =
    (n_i*q_i - s_i^2) / (n_i^2*(n_i-1)) and the mean difference
    (s1*n2 - s2*n1)/(n1*n2) are each ONE float division of exact
    integers; t and df assemble from those doubles in expressions
    written identically in the oracle, so both hash-match.  The 1e4
    scale cancels between numerator and sqrt(u1+u2).  Envelope:
    n*q < 1e38 holds to ~1e15 rows at |value| <= 1e5.

    Cost: one events scan, one partial+final aggregate to a single row.
    """
    ev = load_table(spark, sf_dir, "events")
    rows_in = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g1"),
        F.round(F.col("value") * 10000).cast("bigint").alias("x_s"),
    )
    dec = "decimal(38,0)"
    m = rows_in.agg(
        F.sum("g1").cast(dec).alias("n1"),
        F.sum(1 - F.col("g1")).cast(dec).alias("n2"),
        F.sum(F.col("g1") * F.col("x_s")).cast(dec).alias("s1"),
        F.sum((1 - F.col("g1")) * F.col("x_s")).cast(dec).alias("s2"),
        F.sum(F.col("g1") * F.col("x_s").cast(dec) * F.col("x_s"))
        .cast(dec)
        .alias("q1"),
        F.sum((1 - F.col("g1")) * F.col("x_s").cast(dec) * F.col("x_s"))
        .cast(dec)
        .alias("q2"),
    )
    u1 = (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / (F.col("n1") * F.col("n1") * (F.col("n1") - 1)).cast("double")
    u2 = (F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2")).cast(
        "double"
    ) / (F.col("n2") * F.col("n2") * (F.col("n2") - 1)).cast("double")
    t = (
        (F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1")).cast("double")
        / (F.col("n1") * F.col("n2")).cast("double")
    ) / F.sqrt(u1 + u2)
    df_w = ((u1 + u2) * (u1 + u2)) / (
        u1 * u1 / (F.col("n1") - 1).cast("double")
        + u2 * u2 / (F.col("n2") - 1).cast("double")
    )
    return m.filter(u1 + u2 > 0).select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        t.alias("t_stat"),
        df_w.alias("df_welch"),
        (F.abs(t) > F.lit(1.96)).alias("significant"),
    )


@declared(
    "neyman_allocation",
    oracle="""
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s,
             CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS q
      FROM documents GROUP BY source
    ),
    sig AS (
      SELECT source, n_docs,
             sqrt(CAST(n_docs * q - s * s AS DOUBLE)
                  / CAST(CAST(n_docs AS HUGEINT) * (n_docs - 1) AS DOUBLE))
               AS sigma
      FROM per WHERE n_docs >= 2
    ),
    ns AS (
      SELECT source, n_docs, sigma,
             CAST(n_docs AS DOUBLE) * sigma AS nsigma
      FROM sig
    ),
    arr AS (SELECT list(nsigma ORDER BY source) AS ls FROM ns),
    tot AS (
      SELECT list_reduce(ls, (a, b) -> a + b) AS total FROM arr
    )
    SELECT ns.source, ns.n_docs, ns.sigma,
           ns.nsigma / t.total AS neyman_share,
           CAST(floor(1000.0e0 * (ns.nsigma / t.total)) AS BIGINT)
             AS alloc_n
    FROM ns CROSS JOIN tot t
    """,
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation over document sources:
    stratum h of a 1000-doc sample gets n_h proportional to N_h*sigma_h
    (size x within-stratum std-dev of n_chars) -- the variance-minimizing
    design (Neyman 1934) that upgrades `stratified_sample_docs`'
    proportional allocation: high-variance strata get oversampled,
    near-constant strata barely sampled.

    Exactness: per-stratum moments are exact integers; sigma is ONE
    float expression of them (the Welch/`spearman` discipline).  The
    total sum(N_h*sigma_h) is a float over strata, so it is NOT summed
    by unordered aggregation -- the nsigma values are collected into a
    source-ordered list and folded sequentially, seeded with the FIRST
    element to mirror DuckDB's list_reduce exactly (the documented
    fold convention).  Shares divide identical doubles; alloc uses
    floor (safe on computed doubles where round() is not).

    Cost: one documents scan -> per-source moments (checkpointed for
    its two consumers); the fold and share math run on the |sources|
    dim.  Single-row total is a broadcast cross join.
    """
    docs = load_table(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    per = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("n_chars").cast(dec)).cast(dec).alias("s"),
            F.sum(F.col("n_chars").cast(dec) * F.col("n_chars"))
            .cast(dec)
            .alias("q"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    sigma = F.sqrt(
        (F.col("n_docs") * F.col("q") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n_docs").cast(dec) * (F.col("n_docs") - 1)).cast("double")
    )
    ns = per.select(
        "source",
        "n_docs",
        sigma.alias("sigma"),
        (F.col("n_docs").cast("double") * sigma).alias("nsigma"),
    ).localCheckpoint(eager=True)  # fold array build + final share join
    arr = ns.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("source", "nsigma"))),
            lambda x: x["nsigma"],
        ).alias("ls")
    )
    tot = arr.select(
        F.aggregate(
            F.slice(F.col("ls"), 2, F.greatest(F.size("ls") - 1, F.lit(0))),
            F.element_at(F.col("ls"), 1),
            lambda a, x: a + x,
        ).alias("total")
    )
    share = F.col("nsigma") / F.col("total")
    return ns.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "sigma",
        share.alias("neyman_share"),
        F.floor(F.lit(1000.0) * share).cast("bigint").alias("alloc_n"),
    )


@declared(
    "incremental_agg_maintenance",
    oracle="""
    WITH thr AS (
      SELECT CAST((min(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
                   + max(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
                   + 1) // 2 AS BIGINT) AS mid_day
      FROM events
    ),
    tagged AS (
      SELECT event_type,
             CAST(round(value * 10000) AS BIGINT) AS v_s,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) // 86400 < t.mid_day
                  THEN 0 ELSE 1 END AS is_new
      FROM events CROSS JOIN thr t
    ),
    parts AS (
      SELECT event_type, is_new,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v_s) AS BIGINT) AS s,
             CAST(min(v_s) AS BIGINT) AS mn,
             CAST(max(v_s) AS BIGINT) AS mx
      FROM tagged GROUP BY event_type, is_new
    ),
    merged AS (
      SELECT event_type,
             CAST(sum(n) AS BIGINT) AS n_m,
             CAST(sum(s) AS BIGINT) AS s_m,
             CAST(min(mn) AS BIGINT) AS mn_m,
             CAST(max(mx) AS BIGINT) AS mx_m
      FROM parts GROUP BY event_type
    ),
    full_r AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_f,
             CAST(sum(v_s) AS BIGINT) AS s_f,
             CAST(min(v_s) AS BIGINT) AS mn_f,
             CAST(max(v_s) AS BIGINT) AS mx_f
      FROM tagged GROUP BY event_type
    )
    SELECT m.event_type, m.n_m AS n_events, m.s_m AS sum_s,
           m.mn_m AS min_s, m.mx_m AS max_s,
           CAST((2 * m.s_m + m.n_m) // (2 * m.n_m) AS BIGINT) AS avg_s,
           (m.n_m = f.n_f AND m.s_m = f.s_f AND m.mn_m = f.mn_f
            AND m.mx_m = f.mx_f) AS matches_recompute
    FROM merged m JOIN full_r f USING (event_type)
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance certified: the event stream is split
    into a 'base' and a 'new batch' half (calendar midpoint), each half
    aggregated independently into MERGEABLE state (count, sum, min,
    max), the states merged algebraically, and the merged result proven
    equal to a from-scratch recompute per group -- the property that
    lets a 100 TB daily pipeline update its aggregates by touching ONLY
    the new partition (and the reason avg must ship as a (sum, count)
    pair: the merge is on the pair, the division happens at read time,
    here as the half-up integer-space rounding).

    All-integer on scaled values, so merged == recomputed is exact
    equality, not tolerance.  The `matches_recompute` column IS the
    certification, re-proven on every gate run.

    Cost: one tagging pass (midpoint scalar broadcast onto rows), one
    partial+final agg per granularity -- the recompute branch exists
    only to certify; production drops it and pays one partition's agg.
    """
    ev = load_table(spark, sf_dir, "events")
    eday = F.expr("CAST(ts AS LONG) DIV 86400")
    thr = ev.agg(
        ((F.min(eday) + F.max(eday) + 1) / 2).cast("bigint").alias("mid_day")
    )
    tagged = (
        ev.select(
            "event_type",
            F.round(F.col("value") * 10000).cast("bigint").alias("v_s"),
            eday.alias("eday"),
        )
        .crossJoin(F.broadcast(thr))
        .select(
            "event_type",
            "v_s",
            F.when(F.col("eday") < F.col("mid_day"), 0).otherwise(1).alias("is_new"),
        )
        .localCheckpoint(eager=True)  # parts + full recompute branches
    )
    parts = tagged.groupBy("event_type", "is_new").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v_s").cast("bigint").alias("s"),
        F.min("v_s").cast("bigint").alias("mn"),
        F.max("v_s").cast("bigint").alias("mx"),
    )
    merged = parts.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_m"),
        F.sum("s").cast("bigint").alias("s_m"),
        F.min("mn").cast("bigint").alias("mn_m"),
        F.max("mx").cast("bigint").alias("mx_m"),
    )
    full_r = tagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_f"),
        F.sum("v_s").cast("bigint").alias("s_f"),
        F.min("v_s").cast("bigint").alias("mn_f"),
        F.max("v_s").cast("bigint").alias("mx_f"),
    )
    return merged.join(F.broadcast(full_r), "event_type").select(
        "event_type",
        F.col("n_m").alias("n_events"),
        F.col("s_m").alias("sum_s"),
        F.col("mn_m").alias("min_s"),
        F.col("mx_m").alias("max_s"),
        F.expr("CAST((2 * s_m + n_m) DIV (2 * n_m) AS BIGINT)").alias("avg_s"),
        (
            (F.col("n_m") == F.col("n_f"))
            & (F.col("s_m") == F.col("s_f"))
            & (F.col("mn_m") == F.col("mn_f"))
            & (F.col("mx_m") == F.col("mx_f"))
        ).alias("matches_recompute"),
    )


@declared(
    "group_kfold_assign",
    oracle=f"""
    WITH folds AS (
      SELECT doc_id, source,
             {_bucket_sql('source', 5)} AS fold
      FROM documents
    ),
    per_fold AS (
      SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM folds GROUP BY fold
    ),
    leak AS (
      SELECT CAST(count(*) AS BIGINT) AS n_crossing
      FROM (
        SELECT source FROM folds GROUP BY source
        HAVING count(DISTINCT fold) > 1
      )
    )
    SELECT p.fold, p.n_docs, p.n_sources, l.n_crossing
    FROM per_fold p CROSS JOIN leak l
    """,
)
def group_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 5-fold cross-validation assignment: the fold is a
    deterministic md5 bucket of the SOURCE, not the document, so every
    document from one source lands in one fold -- the split that
    prevents near-duplicate leakage across train/test when documents
    within a source correlate (the group-k-fold discipline;
    `hash_split_assign` is the per-record form).  The emitted
    `n_crossing` column is the leakage audit: sources spanning more
    than one fold, provably 0 by construction, re-proven on every gate
    run.

    Engine-portable md5 bucketing (the `hash_bucket` convention), one
    documents scan (localCheckpointed for the per-fold rollup and the
    audit), dimension-bounded outputs.
    """
    docs = load_table(spark, sf_dir, "documents")
    folds = docs.select(
        "doc_id", "source", hash_bucket(F.col("source"), 5).alias("fold")
    ).localCheckpoint(eager=True)  # per-fold rollup + leakage audit
    per_fold = folds.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    leak = (
        folds.groupBy("source")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_crossing"))
    )
    return per_fold.crossJoin(F.broadcast(leak))


@declared(
    "pipeline_lineage_manifest",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             ('0x' || substring(md5(text), 1, 15))::BIGINT AS h,
             md5(lower(trim(text))) AS content_hash
      FROM documents
    ),
    filtered AS (SELECT * FROM base WHERE length(text) >= 100),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY content_hash
                                     ORDER BY doc_id) AS rn
        FROM filtered
      ) WHERE rn = 1
    ),
    train AS (
      SELECT * FROM deduped WHERE {_bucket_sql('doc_id')} < 80
    )
    SELECT 'a_raw' AS stage, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS content_checksum FROM base
    UNION ALL
    SELECT 'b_filtered', CAST(count(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT) FROM filtered
    UNION ALL
    SELECT 'c_deduped', CAST(count(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT) FROM deduped
    UNION ALL
    SELECT 'd_train', CAST(count(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT) FROM train
    """,
)
def pipeline_lineage_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage lineage manifest for the curation pipeline
    (`pipeline_end_to_end`'s flow): after each stage -- raw, length
    filter, exact dedup, train split -- the row count AND an
    order-independent content checksum (bit_xor of a 60-bit md5 prefix
    of each doc's text).  This is the audit trail a regulated training
    pipeline ships with its data: any replay (on any engine, any
    partitioning, any row order) must reproduce the same four
    (count, checksum) pairs, or the lineage is broken -- the corpus-wide
    generalization of the reference's per-frame XOR checksum
    (`checksum_xor`, etl_controller.py:387-418).

    XOR is associative+commutative, so the checksum is partial-agg-safe
    and order-independent BY CONSTRUCTION -- the only aggregate with
    that property over content hashes (sums overflow, concat orders).
    All stages derive from ONE checkpointed projection; each stage is
    one aggregate over the previous frame's rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "text",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
        F.md5(F.lower(F.trim("text"))).alias("content_hash"),
    ).localCheckpoint(eager=True)  # four stage rollups share the scan
    filtered = base.filter(F.length("text") >= 100)
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    deduped = (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .localCheckpoint(eager=True)  # deduped + train rollups
    )
    train = deduped.filter(hash_bucket(F.col("doc_id")) < 80)

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("CAST(bit_xor(h) AS BIGINT)").alias("content_checksum"),
        ).select(F.lit(name).alias("stage"), "n_rows", "content_checksum")

    return (
        stage(base, "a_raw")
        .unionByName(stage(filtered, "b_filtered"))
        .unionByName(stage(deduped, "c_deduped"))
        .unionByName(stage(train, "d_train"))
    )


# Fact-append IVM split date: orders at/after this date are the "delta"
# an incremental refresh would ingest; older rows are the materialized
# base.
IVM_SPLIT_DATE = "2000-01-01"


@declared(
    "incremental_join_view_delta",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             CASE WHEN o_orderdate >= TIMESTAMP '{IVM_SPLIT_DATE}'
                  THEN 1 ELSE 0 END AS is_delta
      FROM orders
    ),
    joined AS MATERIALIZED (
      SELECT c.c_nationkey AS nationkey, o.is_delta, o.price_c
      FROM o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    v_base AS (
      SELECT nationkey, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(price_c) AS BIGINT) AS price_c
      FROM joined WHERE is_delta = 0 GROUP BY nationkey
    ),
    v_delta AS (
      SELECT nationkey, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(price_c) AS BIGINT) AS price_c
      FROM joined WHERE is_delta = 1 GROUP BY nationkey
    ),
    merged AS (
      SELECT nationkey,
             CAST(sum(cnt) AS BIGINT) AS merged_cnt,
             CAST(sum(price_c) AS BIGINT) AS merged_price_c
      FROM (SELECT * FROM v_base UNION ALL SELECT * FROM v_delta)
      GROUP BY nationkey
    ),
    full_v AS (
      SELECT nationkey, CAST(count(*) AS BIGINT) AS full_cnt,
             CAST(sum(price_c) AS BIGINT) AS full_price_c
      FROM joined GROUP BY nationkey
    )
    SELECT m.nationkey,
           coalesce(b.cnt, 0) AS base_cnt,
           coalesce(d.cnt, 0) AS delta_cnt,
           m.merged_cnt, f.full_cnt, m.merged_price_c, f.full_price_c,
           CAST(CASE WHEN m.merged_cnt = f.full_cnt
                      AND m.merged_price_c = f.full_price_c
                THEN 1 ELSE 0 END AS BIGINT) AS consistent
    FROM merged m
    JOIN full_v f ON f.nationkey = m.nationkey
    LEFT JOIN v_base b ON b.nationkey = m.nationkey
    LEFT JOIN v_delta d ON d.nationkey = m.nationkey
    """,
)
def incremental_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view under fact appends: the
    materialized view V = agg(orders |>< customer) is refreshed by
    joining ONLY the delta partition (orders on/after {IVM_SPLIT_DATE})
    against the static dimension and merging per-group partials --
    DELTA |>< customer, never a re-scan of the base fact.  The row a
    warehouse's REFRESH MATERIALIZED VIEW ... INCREMENTAL executes; the
    query materializes both the incremental result and the full
    recompute and certifies them equal per group (`consistent`), the
    self-auditing form.  Extends `incremental_agg_maintenance` (agg-only
    view) to the join-view case; dimension updates would add the
    A |>< dB and dA |>< dB terms, deliberately out of scope for the
    append-only fact pattern.

    All-integer (cent sums, counts).  Shape: ONE orders scan tagged
    base/delta, one broadcast dim join shared by both legs (the joined
    frame is checkpointed and reused: base agg, delta agg, full agg),
    then nation-cardinality frames only.  At 100 TB the delta leg is
    the only fact-scale work a refresh pays -- proportional to the
    append, not the table.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
        F.when(
            F.col("o_orderdate") >= F.lit(IVM_SPLIT_DATE).cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_delta"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    joined = orders.join(F.broadcast(cust), "o_custkey").select(
        "nationkey", "is_delta", "price_c"
    ).localCheckpoint(eager=True)  # base + delta + full-recompute consumers
    v_base = joined.filter(F.col("is_delta") == 0).groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("price_c").cast("bigint").alias("price_c"),
    )
    v_delta = joined.filter(F.col("is_delta") == 1).groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("price_c").cast("bigint").alias("price_c"),
    )
    merged = (
        v_base.unionByName(v_delta)
        .groupBy("nationkey")
        .agg(
            F.sum("cnt").cast("bigint").alias("merged_cnt"),
            F.sum("price_c").cast("bigint").alias("merged_price_c"),
        )
    )
    full_v = joined.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("full_cnt"),
        F.sum("price_c").cast("bigint").alias("full_price_c"),
    )
    return (
        merged.join(F.broadcast(full_v), "nationkey")
        .join(
            F.broadcast(
                v_base.select("nationkey", F.col("cnt").alias("base_cnt"))
            ),
            "nationkey",
            "left",
        )
        .join(
            F.broadcast(
                v_delta.select("nationkey", F.col("cnt").alias("delta_cnt"))
            ),
            "nationkey",
            "left",
        )
        .select(
            "nationkey",
            F.coalesce(F.col("base_cnt"), F.lit(0))
            .cast("bigint")
            .alias("base_cnt"),
            F.coalesce(F.col("delta_cnt"), F.lit(0))
            .cast("bigint")
            .alias("delta_cnt"),
            "merged_cnt",
            "full_cnt",
            "merged_price_c",
            "full_price_c",
            F.expr(
                "CAST(CASE WHEN merged_cnt = full_cnt"
                " AND merged_price_c = full_price_c"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("consistent"),
        )
    )


# Rendezvous (HRW) hashing: shard counts before (N=8) and after (N=9)
# adding one shard; only docs whose new shard WINS the rendezvous move.
HRW_N_BEFORE = 8
HRW_N_AFTER = 9


@declared(
    "rendezvous_shard_assign",
    oracle=f"""
    WITH pairs AS (
      SELECT d.doc_id, s.shard,
             ('0x' || substring(
               md5(CAST(d.doc_id AS VARCHAR) || '|'
                   || CAST(s.shard AS VARCHAR)), 1, 12))::BIGINT AS h
      FROM documents d,
           (SELECT unnest(generate_series(0, {HRW_N_AFTER - 1})) AS shard) s
    ),
    picks AS MATERIALIZED (
      SELECT doc_id,
             max(CASE WHEN shard < {HRW_N_BEFORE}
                      THEN struct_pack(h := h, s := shard) END).s AS s8,
             max(struct_pack(h := h, s := shard)).s AS s9
      FROM pairs GROUP BY doc_id
    ),
    moved AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved
      FROM picks
    )
    SELECT s.shard,
           CAST(count(CASE WHEN p.s8 = s.shard THEN 1 END) AS BIGINT)
             AS n_docs_before,
           CAST(count(CASE WHEN p.s9 = s.shard THEN 1 END) AS BIGINT)
             AS n_docs_after,
           CAST(count(CASE WHEN p.s9 = s.shard AND p.s8 <> p.s9 THEN 1 END)
                AS BIGINT) AS gained,
           CAST(count(CASE WHEN p.s8 = s.shard AND p.s8 <> p.s9 THEN 1 END)
                AS BIGINT) AS lost,
           CAST((1000000 * m.n_moved) // m.n_docs AS BIGINT) AS moved_ppm
    FROM (SELECT unnest(generate_series(0, {HRW_N_AFTER - 1})) AS shard) s,
         picks p, moved m
    GROUP BY s.shard, m.n_moved, m.n_docs
    """,
)
def rendezvous_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    1998, the consistent-hashing variant behind most modern placement
    systems): each document goes to the shard with the highest
    md5(doc, shard) score, so growing the cluster {HRW_N_BEFORE} ->
    {HRW_N_AFTER} moves ONLY the documents whose NEW shard wins the
    rendezvous -- expected 1/{HRW_N_AFTER} of the corpus, vs ~100%%
    under naive mod-N (`hash_mod_sample`'s scheme).  Reports per-shard
    occupancy before/after, the gained/lost flows, and the global moved
    fraction; the pytest pins the defining invariant that every moved
    document lands on the NEW shard.

    Pure integer md5 scores (ties impossible in 48 bits at corpus
    scale; the (h, shard) struct max makes even a collision
    deterministic).  Shape: one documents scan fanned out x
    {HRW_N_AFTER} (bounded constant), one per-doc rollup, then
    {HRW_N_AFTER}-row frames.  At 100 TB this IS the placement
    computation a storage rebalancer runs, and it scales as one map +
    one keyed rollup.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    shards = F.expr(f"sequence(0, {HRW_N_AFTER - 1})")
    pairs = docs.select(
        "doc_id", F.explode(shards).alias("shard")
    ).select(
        "doc_id",
        "shard",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", "doc_id", "shard")), 1, 12
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    picks = pairs.groupBy("doc_id").agg(
        F.expr(
            f"max(CASE WHEN shard < {HRW_N_BEFORE}"
            " THEN struct(h, shard) END).shard"
        ).alias("s8"),
        F.expr("max(struct(h, shard)).shard").alias("s9"),
    ).localCheckpoint(eager=True)  # moved scalar + per-shard rollup
    moved = picks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("s8") != F.col("s9"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_moved"),
    )
    shard_dim = picks.sparkSession.range(HRW_N_AFTER).select(
        F.col("id").cast("int").alias("shard")
    )
    before = picks.groupBy(F.col("s8").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_before")
    )
    after = picks.groupBy(F.col("s9").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_after")
    )
    gained = (
        picks.filter(F.col("s8") != F.col("s9"))
        .groupBy(F.col("s9").alias("shard"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("gained"))
    )
    lost = (
        picks.filter(F.col("s8") != F.col("s9"))
        .groupBy(F.col("s8").alias("shard"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("lost"))
    )
    return (
        shard_dim.join(F.broadcast(before), "shard", "left")
        .join(F.broadcast(after), "shard", "left")
        .join(F.broadcast(gained), "shard", "left")
        .join(F.broadcast(lost), "shard", "left")
        .crossJoin(F.broadcast(moved))
        .select(
            "shard",
            F.coalesce(F.col("n_docs_before"), F.lit(0))
            .cast("bigint")
            .alias("n_docs_before"),
            F.coalesce(F.col("n_docs_after"), F.lit(0))
            .cast("bigint")
            .alias("n_docs_after"),
            F.coalesce(F.col("gained"), F.lit(0)).cast("bigint").alias("gained"),
            F.coalesce(F.col("lost"), F.lit(0)).cast("bigint").alias("lost"),
            F.expr(
                "CAST((1000000 * n_moved) DIV n_docs AS BIGINT)"
            ).alias("moved_ppm"),
        )
    )
