"""Corpus-level curation: boilerplate detection, per-source crawl caps,
DSIR-style importance weighting.

Frontier-pipeline operators over the ``documents`` table (no reference
analog -- SURVEY.md SS2.11 extension family, same contract as
operators/curation.py):

  * boilerplate detection: a char-8-gram appearing in >=30% of one
    source's documents is boilerplate (nav chrome, license headers,
    cookie banners in a real crawl); each doc reports its boilerplate
    fraction.  The gram doc-frequency table is the classic "stop-gram"
    structure: tiny relative to the corpus, broadcastable.
  * per-source cap: web crawls cap documents per domain so one giant
    host cannot dominate the mixture (CommonCrawl-style host capping) --
    deterministic hash-ordered keep-first-K, a window over the source.
  * DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" -- public paper):
    score out-of-domain docs by how target-like their token
    distribution is, here as the integer-ppm lift sum
    sum_t(ppm_target(t) - ppm_corpus(t)) over the doc's tokens.

All integer-space math (DIV / ppm) per plans/conventions.py -- results
hash-match the DuckDB oracles bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.operators.dedup import _gram_df
from etl_rf_matrix_controller_spark.plans.conventions import ratio4, ratio4_sql
from etl_rf_matrix_controller_spark.plans.gram_index import ensure_bucketed_index
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

# A gram is boilerplate within a source when present in >=30% of its docs
# (integer form: 10*doc_freq >= 3*n_docs).
BOILER_PCT_X10 = 3
# Per-source document cap (keep-first-K by deterministic hash order).
SOURCE_CAP = 8
# DSIR target domain.
DSIR_TARGET = "src0"
DSIR_TOPK = 20

_DOC_GRAMS_SQL = """
      SELECT doc_id, source, g.gram
      FROM (
        SELECT doc_id, source,
               list_distinct(list_transform(
                 generate_series(1, greatest(length(trim(text)) - 7, 1)),
                 i -> substring(trim(text), CAST(i AS INT), 8))) AS grams
        FROM documents
      ) grammed, unnest(grams) AS g(gram)
"""


@declared(
    "boilerplate_gram_ratio",
    oracle=f"""
    WITH g AS ({_DOC_GRAMS_SQL}),
    nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    freq AS (
      SELECT source, gram, count(*) AS df FROM g GROUP BY source, gram
    ),
    bl AS (
      SELECT freq.source, freq.gram
      FROM freq JOIN nd ON freq.source = nd.source
      WHERE freq.df * 10 >= {BOILER_PCT_X10} * nd.n_docs
    ),
    tot AS (
      SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_grams
      FROM g GROUP BY doc_id, source
    ),
    bc AS (
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_boiler
      FROM g JOIN bl ON g.source = bl.source AND g.gram = bl.gram
      GROUP BY g.doc_id
    )
    SELECT tot.doc_id, tot.source, tot.n_grams,
           CAST(coalesce(bc.n_boiler, 0) AS BIGINT) AS n_boiler,
           {ratio4_sql('coalesce(bc.n_boiler, 0)', 'tot.n_grams')}
             AS boiler_ratio
    FROM tot LEFT JOIN bc ON bc.doc_id = tot.doc_id
    """,
)
def boilerplate_gram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction via source-local stop-grams.

    Shape at 100 TB: the gram index is built ONCE (localCheckpoint -- it
    feeds the doc-frequency agg and the fused per-doc pass); the
    boilerplate table itself is doc-frequency-thresholded and therefore
    tiny (tens of grams per source here, bounded by the distinct-gram
    count of one source in general), so it broadcasts, and the per-doc
    totals and boilerplate counts come out of ONE grouped pass (a
    broadcast left join tags each gram row, then a single
    groupBy(doc_id, source) counts rows and hits together) -- the
    previous shape aggregated the gram set twice and joined the two
    per-doc aggregates back.  ``documents`` is scanned exactly twice
    (grams + the per-source doc counts), inside the suite's <=2-scans
    ceiling.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    grams = _gram_df(docs, "source").localCheckpoint(eager=False)
    n_docs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        grams.groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n_docs), "source")
        .filter(F.col("df") * 10 >= BOILER_PCT_X10 * F.col("n_docs"))
        .select("source", "gram", F.lit(1).alias("is_b"))
    )
    return (
        grams.join(F.broadcast(boiler), ["source", "gram"], "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("is_b"), F.lit(0)))
            .cast("bigint")
            .alias("n_boiler"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            "n_boiler",
            ratio4(F.col("n_boiler"), F.col("n_grams")).alias("boiler_ratio"),
        )
    )


@declared(
    "docs_per_source_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS cap_rank,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
               AS total_docs
      FROM documents
    )
    SELECT doc_id, source, CAST(cap_rank AS BIGINT) AS cap_rank, total_docs
    FROM ranked WHERE cap_rank <= {SOURCE_CAP}
    """,
)
def docs_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-cap sampling: keep at most SOURCE_CAP docs per source, chosen
    by deterministic hash order (md5 of the id -- stable across runs and
    engines, unbiased w.r.t. crawl insertion order).

    One window over the source key == one shuffle partitioned by source.
    At 100 TB the per-source ordering never needs a global sort: rank
    within partition only, and a giant source (the exact host-cap
    motivation) is ONE partition's worth of work -- for pathological
    hosts, pre-aggregate a per-source count and reservoir-sample instead.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(w.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
        .alias("cap_rank"),
        F.count(F.lit(1)).over(w).alias("total_docs"),
    )
    return ranked.filter(F.col("cap_rank") <= SOURCE_CAP).select(
        "doc_id",
        "source",
        F.col("cap_rank").cast("bigint").alias("cap_rank"),
        "total_docs",
    )


@declared(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, t.token
      FROM (
        SELECT doc_id, source, string_split(trim(text), ' ') AS toks
        FROM documents
      ) s, unnest(toks) AS t(token)
    ),
    tgt AS (
      SELECT token, count(*) AS c_t,
             sum(count(*)) OVER () AS n_t
      FROM tok WHERE source = '{DSIR_TARGET}' GROUP BY token
    ),
    allc AS (
      SELECT token, count(*) AS c_a,
             sum(count(*)) OVER () AS n_a
      FROM tok GROUP BY token
    ),
    lift AS (
      SELECT allc.token,
             CAST(coalesce(tgt.c_t, 0) * 1000000 // max(tgt.n_t) OVER ()
                  - allc.c_a * 1000000 // allc.n_a AS BIGINT) AS ppm_lift
      FROM allc LEFT JOIN tgt ON allc.token = tgt.token
    )
    SELECT tok.doc_id, tok.source,
           CAST(sum(lift.ppm_lift) AS BIGINT) AS dsir_score
    FROM tok JOIN lift ON tok.token = lift.token
    WHERE tok.source <> '{DSIR_TARGET}'
    GROUP BY tok.doc_id, tok.source
    ORDER BY dsir_score DESC, doc_id
    LIMIT {DSIR_TOPK}
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scores: rank out-of-domain docs by summed
    token-level ppm lift toward the target domain's distribution.

    The token stream is materialized once (localCheckpoint, 3 consumers:
    target counts, corpus counts, doc scoring); both frequency tables
    collapse to vocabulary size -- at 100 TB a hashed-feature vocabulary
    stays small by construction (DSIR uses hashed n-grams for exactly
    this reason), so the lift table always broadcasts and the scoring
    pass is a map-side join + partial-aggregated sum, one shuffle on
    doc_id.  All arithmetic is integer ppm (DIV), bit-exact vs DuckDB.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # No pre-explode rebalance: the ~50x word fan-out is below the
    # shuffle-payback threshold (see search._tok).
    tok = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split(F.trim("text"), " ")).alias("token"),
        )
        .localCheckpoint(eager=False)
    )
    wall = Window.partitionBy()
    tgt = (
        tok.filter(F.col("source") == DSIR_TARGET)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_t"))
        .select("token", "c_t", F.sum("c_t").over(wall).alias("n_t"))
    )
    allc = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_a"))
        .select("token", "c_a", F.sum("c_a").over(wall).alias("n_a"))
    )
    # max(n_t) over () mirrors the oracle's spelling: after the left join
    # rows missing from tgt carry NULL n_t; the window max rebroadcasts
    # the (single) target total to every row on both engines.
    lift = (
        allc.join(F.broadcast(tgt), "token", "left")
        .select(
            "token",
            "c_t",
            "c_a",
            "n_a",
            F.max("n_t").over(wall).alias("n_t"),
        )
        .select(
            "token",
            (
                F.expr("coalesce(c_t, 0) * 1000000 DIV n_t")
                - F.expr("c_a * 1000000 DIV n_a")
            )
            .cast("bigint")
            .alias("ppm_lift"),
        )
    )
    return (
        tok.filter(F.col("source") != DSIR_TARGET)
        .join(F.broadcast(lift), "token")
        .groupBy("doc_id", "source")
        .agg(F.sum("ppm_lift").cast("bigint").alias("dsir_score"))
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(DSIR_TOPK)
    )


# Token budget for one training run and the repeat ceiling (integer x100:
# 400 = at most 4 epochs over any source, the data-constrained-scaling
# rule of thumb -- repeating data beyond ~4 epochs stops buying loss).
EPOCH_BUDGET_TOKENS = 1_000_000
EPOCH_CAP_X100 = 400


@declared(
    "source_epoch_plan",
    oracle=f"""
    WITH toks AS (
      SELECT source,
             CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
               AS tokens_s
      FROM documents GROUP BY source
    ),
    weighted AS (
      SELECT source, tokens_s,
             CAST(floor(sqrt(tokens_s) * 10000) AS BIGINT) AS w_scaled
      FROM toks
    ),
    target AS (
      SELECT source, tokens_s, w_scaled,
             CAST({EPOCH_BUDGET_TOKENS} * w_scaled
                  // sum(w_scaled) OVER () AS BIGINT) AS target_tokens
      FROM weighted
    )
    SELECT source, tokens_s, target_tokens,
           CAST(least({EPOCH_CAP_X100},
                      target_tokens * 100 // tokens_s) AS BIGINT)
             AS epochs_x100,
           CAST(target_tokens * 100 // tokens_s
                > {EPOCH_CAP_X100} AS BOOLEAN) AS capped
    FROM target
    """,
)
def source_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch allocation under a fixed token budget: temperature-0.5
    mixture targets per source, converted to repeat counts (epochs x100)
    with a 4-epoch ceiling -- the data-constrained-scaling planning step
    (Muennighoff et al. 2023, public work) that decides how often each
    source is repeated when the target exceeds its available tokens.

    One token-count aggregation to a row per source, then a
    domain-cardinality window; every ratio is integer DIV so the plan is
    bit-identical cross-engine.  The `capped` flag is the monitoring
    signal: a capped source means the mixture wants more of it than
    exists -- go collect more, don't repeat a fifth time.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim("text"), " ")))
        .cast("bigint")
        .alias("tokens_s")
    )
    weighted = toks.select(
        "source",
        "tokens_s",
        F.floor(F.sqrt("tokens_s") * 10000).cast("bigint").alias("w_scaled"),
    ).withColumn("total_w", F.sum("w_scaled").over(Window.partitionBy()))
    target = weighted.select(
        "source",
        "tokens_s",
        F.expr(f"CAST({EPOCH_BUDGET_TOKENS} * w_scaled DIV total_w AS BIGINT)")
        .alias("target_tokens"),
    )
    raw_epochs = F.expr("target_tokens * 100 DIV tokens_s")
    return target.select(
        "source",
        "tokens_s",
        "target_tokens",
        F.least(F.lit(EPOCH_CAP_X100).cast("bigint"), raw_epochs.cast("bigint"))
        .alias("epochs_x100"),
        (raw_epochs > EPOCH_CAP_X100).alias("capped"),
    )


# Coverage mass threshold: the smallest doc set covering >=90% of a
# source's characters (integer form: 10*cum >= 9*total at the boundary).
COVERAGE_PCT_X10 = 9


@declared(
    "source_coverage_concentration",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             sum(n_chars) OVER (PARTITION BY source ORDER BY n_chars DESC,
                                doc_id ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n_chars) OVER (PARTITION BY source) AS total,
             count(*) OVER (PARTITION BY source) AS n_docs
      FROM documents
    ),
    kept AS (
      SELECT source, n_docs, total, count(*) AS n_kept,
             max(cum) AS chars_kept
      FROM ranked
      WHERE (cum - n_chars) * 10 < {COVERAGE_PCT_X10} * total
      GROUP BY source, n_docs, total
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_kept AS BIGINT) AS n_kept,
           CAST(total AS BIGINT) AS total_chars,
           CAST(chars_kept AS BIGINT) AS chars_kept
    FROM kept
    """,
)
def source_coverage_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is each source: the size of the smallest document
    set (largest-first) covering >=90% of the source's characters -- a
    nucleus/top-p-style concentration diagnostic.  A source where 3 of
    25 docs carry 90% of the mass is a few giant pages plus chaff; a
    source needing 20 is evenly spread -- they need different cap and
    sampling treatment upstream (docs_per_source_cap).

    One cumulative window per source partition + one aggregate; the
    boundary test is integer ((cum-prev)*10 < 9*total keeps exactly the
    prefix whose PREDECESSOR was still short of the mass), so the kept
    set is deterministic and bit-identical cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ws = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(w).alias("cum"),
        F.sum("n_chars").over(ws).alias("total"),
        F.count(F.lit(1)).over(ws).alias("n_docs"),
    )
    kept = (
        ranked.filter(
            (F.col("cum") - F.col("n_chars")) * 10
            < COVERAGE_PCT_X10 * F.col("total")
        )
        .groupBy("source", "n_docs", "total")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("cum").alias("chars_kept"),
        )
    )
    return kept.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.col("total").cast("bigint").alias("total_chars"),
        F.col("chars_kept").cast("bigint").alias("chars_kept"),
    )


# The driver's documents carry no URLs, so the op injects deterministic
# synthetic ones keyed off doc_id (same technique as pii_redact_stats'
# _AUG_SQL); the extraction + rollup is exactly what runs on a crawl.
_URL_AUG_SQL = """
    (text || CASE WHEN doc_id % 3 = 0
                  THEN ' https://site' || CAST(doc_id % 20 AS VARCHAR)
                       || '.example/p' || CAST(doc_id % 7 AS VARCHAR)
                  ELSE '' END)
"""


@declared(
    "domain_curation_profile",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, lang, n_chars, {_URL_AUG_SQL} AS text
      FROM documents
    ),
    tagged AS (
      SELECT doc_id, lang, n_chars,
             regexp_extract(text, 'https://([a-z0-9.]+)/', 1) AS domain
      FROM aug
    )
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           {ratio4_sql('sum(n_chars)', 'count(*)')} AS avg_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM tagged
    WHERE domain <> ''
    GROUP BY domain
    """,
)
def domain_curation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain curation rollup -- the CommonCrawl-style source-of-truth
    table crawl pipelines keep per registered domain (doc volume, byte
    mass, language spread) to drive domain-level keep/cap/block
    decisions; the companion of docs_per_source_cap at URL granularity.

    The URL is pulled with one regexp_extract (capture group 1 = the
    domain) -- a pure codegen'd projection -- and the rollup is a single
    partial->final aggregation keyed by domain, output bounded by
    |domains|.  Exact count(DISTINCT lang) rides in the same aggregate
    (Spark plans the distinct as an expand, still one scan).  The ratio
    is integer-space (ratio4), engine-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" https://site"),
                    (F.col("doc_id") % 20).cast("string"),
                    F.lit(".example/p"),
                    (F.col("doc_id") % 7).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    tagged = aug.select(
        "lang",
        "n_chars",
        F.regexp_extract("text", r"https://([a-z0-9.]+)/", 1).alias("domain"),
    ).filter(F.col("domain") != "")
    return tagged.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        ratio4(F.sum("n_chars"), F.count(F.lit(1))).alias("avg_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )


@declared(
    "gram_novelty_curve",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    grams AS (
      SELECT doc_id, g.gram
      FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(1, greatest(length(trim(text)) - 7, 1)),
                 i -> substring(trim(text), CAST(i AS INT), 8))) AS gs
        FROM corpus
      ) t, unnest(gs) AS g(gram)
    ),
    first_seen AS (
      SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS novel_grams,
           {ratio4_sql("sum(CASE WHEN f.first_doc < g.doc_id THEN 1 ELSE 0 END)", 'count(*)')} AS stale_ratio
    FROM grams g JOIN first_seen f ON f.gram = g.gram
    GROUP BY g.doc_id
    """,
)
def gram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty under the corpus's ingestion order (doc_id):
    how many of a doc's distinct char-8-grams were ALREADY introduced by
    an earlier doc -- the dataset-ordering memorization/duplication
    pressure curve (a rising stale_ratio across ids means later training
    batches are increasingly re-showing old text; the signal behind
    dedup-before-epoch-planning).

    first-seen is min(doc_id) per gram -- one partial-agg pass over the
    gram index -- joined back to the SAME gram frame.  Round 7: the gram
    frame is the PERSISTENT bucketBy(N, gram) table (plans/gram_index.py),
    so BOTH the first-seen aggregation AND the join back run entirely
    within buckets: zero Exchange until the final per-doc rollup (the
    per-query gram rebuild+shuffle was the round-6 x100 scale bill).
    shuffle_hash stays pinned: both sides scale with the corpus at 100 TB,
    so a broadcast is never right here.  The stale ratio is integer-space
    (ratio4).
    """
    grams = ensure_bucketed_index(
        spark,
        sf_dir,
        "nov8",
        lambda s, d: _gram_df(
            load_table(s, d, "documents").select("doc_id", "text")
        ),
        ["gram"],
        version="v1",
    )
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    stale = F.sum(
        F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
    )
    return (
        grams.join(first_seen.hint("shuffle_hash"), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("novel_grams"),
            ratio4(stale, F.count(F.lit(1))).alias("stale_ratio"),
        )
    )


@declared(
    "source_vocab_overlap",
    oracle="""
    WITH st AS (
      SELECT DISTINCT source, token
      FROM documents, unnest(string_split(trim(text), ' ')) AS t(token)
    ),
    sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY source
    ),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM st a JOIN st b
        ON a.token = b.token AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
           CAST((1000000 * i.n_common) // (sa.n + sb.n - i.n_common)
                AS BIGINT) AS jaccard_ppm,
           CAST((1000000 * i.n_common) // least(sa.n, sb.n)
                AS BIGINT) AS overlap_ppm
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary similarity: Jaccard and overlap
    coefficient between each pair of sources' token-TYPE sets -- the
    mixture-design readout that says which sources contribute redundant
    vocabulary versus genuinely new surface forms (a high-overlap pair
    is a candidate for down-weighting in `domain_mixture_weights`).

    The pair enumeration is an inverted-index equi-join ON TOKEN over
    the distinct (source, token) frame -- per token the fan-out is
    (sources containing it)^2, bounded by |sources|^2, never corpus
    rows; the same frame feeds sizes and both join aliases, so it is
    localCheckpointed once (stat-less checkpoint -> explicit broadcast
    of the bounded sizes dim).  All similarity values are
    integer-floored ppm: engine-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source", F.explode(F.split(F.trim("text"), " ")).alias("token")
        )
        .distinct()
        .localCheckpoint(eager=True)  # sizes + two join aliases
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = st.alias("a")
    b = st.alias("b").hint("shuffle_hash")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b")))
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "CAST((1000000 * n_common) DIV (n_a + n_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
            F.expr(
                "CAST((1000000 * n_common) DIV least(n_a, n_b) AS BIGINT)"
            ).alias("overlap_ppm"),
        )
    )
