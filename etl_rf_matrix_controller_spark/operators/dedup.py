"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Extension operators mandated by the build contract (SURVEY.md SS2.11):
the training-data-pipeline capabilities a 100 TB corpus needs.  No
reference analog -- the closest behavior is merged-selection dedupe
``sorted(set(...))`` (etl_controller.py:2193).

Scale design:
  * exact dedup: hash -> window keep-first == one shuffle on the hash key;
  * MinHash/LSH: signatures are 8 independent min-aggregates over the
    (doc, token) explosion -- map-side combinable; candidate pairs come
    from equi-joins on band buckets, NEVER an all-pairs cross join;
  * SimHash: bit-vote aggregation, equi-join on the 64-bit signature;
  * verification Jaccard runs only on LSH candidates.

The driver's ``documents`` table has no duplicates, so every query here
runs over a deterministic "dup corpus": each doc_id % 10 == 0 re-emitted
verbatim (exact dup) and each doc_id % 10 == 1 re-emitted with one token
appended (near dup).  Both engines construct the same corpus in-query.

All hashing is md5-prefix based (md5 is identical in Spark and DuckDB),
so signatures and buckets hash-match the oracle exactly -- integer math
only, no floats until the final Jaccard (which divides small exact ints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.conventions import ratio4, ratio4_sql
from etl_rf_matrix_controller_spark.plans.gram_index import ensure_bucketed_index
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

# MinHash parameters: k=8 permutations h_j(x) = (a_j * x + b_j) mod PRIME,
# banded 4x2 for LSH.  x is the md5-prefix token fingerprint (32-bit).
MINHASH_PRIME = 2038074743
MINHASH_A = [2971, 5023, 7919, 10007, 12653, 15731, 17389, 19937]
MINHASH_B = [1409, 2861, 4409, 6199, 8123, 9733, 11003, 12889]
# 2 bands x 4 rows (over the 8 permutations): r=4 makes a band collision
# require FOUR consecutive equal minhashes, so weakly-similar pairs
# (J<=0.1 here) collide with prob ~J^4 per band -- measured 120k -> ~4k
# candidates at sf0.1 vs the old 4x2 banding, while true near-dups
# (J~0.98) still collide with prob 1-(1-J^4)^2 ~ 99.4%.
N_BANDS, BAND_ROWS = 2, 4
WINNOW_PAIR_MIN = 3  # pairs must share >= 3 selected fingerprints
WINNOW_FP_DF_CAP = 50  # drop fingerprints appearing in > 50 docs pre-join

_CORPUS_SQL = """
      SELECT doc_id, text, lang, source FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text, lang, source
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2000000, text || ' zzextra', lang, source
      FROM documents WHERE doc_id % 10 = 1
"""


def dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthesized exact dups (+1M ids) and near dups (+2M).

    Built as a per-row variant fan-out (array -> filter nulls -> explode)
    over ONE scan of documents, not a 3-branch union: the union form read
    the table three times, which at 100 TB is two wasted full corpus
    passes (the oracle keeps the UNION ALL spelling -- DuckDB reads a
    view, the shape there is irrelevant)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    variants = F.filter(
        F.array(
            F.struct(
                F.col("doc_id"), F.col("text"), F.col("lang"), F.col("source")
            ),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.struct(
                    (F.col("doc_id") + 1000000).alias("doc_id"),
                    F.col("text"),
                    F.col("lang"),
                    F.col("source"),
                ),
            ),
            F.when(
                F.col("doc_id") % 10 == 1,
                F.struct(
                    (F.col("doc_id") + 2000000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
                    F.col("lang"),
                    F.col("source"),
                ),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return docs.select(F.explode(variants).alias("r")).select("r.*")


def token_fingerprint(token: Column) -> Column:
    """32-bit integer fingerprint of a token via md5 prefix (engine-portable:
    DuckDB mirror is ('0x' || substring(md5(t), 1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("bigint")


def doc_tokset_col() -> Column:
    """Distinct char-8-gram array of the (trimmed) text column -- the
    shingle set every MinHash/Jaccard operator is defined over.  One
    F.expr call (round 11): see the _TOKSET_SQL comment."""
    return F.expr(
        "array_distinct(transform("
        "sequence(1, greatest(length(trim(text)) - 7, 1)), "
        "i -> substring(trim(text), i, 8)))"
    )


# Spark-SQL spellings of the per-row shingle/fingerprint/signature
# machinery.  These are STRINGS for selectExpr rather than composed
# Column objects: every F.<fn>() Column node is one py4j round-trip
# (~1 ms), and the signature builders create hundreds of nodes -- the
# string form is 2-3 py4j calls for the identical expression tree
# (round 11; measured ~0.5 s of driver time per call in the streaming
# ingest loop, paid once per micro-batch).
_TOKSET_SQL = (
    "array_distinct(transform("
    "sequence(1, greatest(length(trim(text)) - 7, 1)), "
    "i -> substring(trim(text), i, 8)))"
)
_FPS_SQL = (
    f"transform({_TOKSET_SQL}, "
    "g -> CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT))"
)


def _mh_exprs(fps: str = "fps") -> list[str]:
    """The 8 in-row MinHash expressions over an ``fps`` array column:
    array_min of each (a*x+b) mod P permutation -- identical integers
    to the explode + groupBy.min spelling (min over the same
    distinct-gram fingerprints), zero shuffle."""
    return [
        f"CAST(array_min(transform({fps}, "
        f"x -> ({a} * x + {b}) % {MINHASH_PRIME})) AS BIGINT) AS mh{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def _band_inline_expr() -> str:
    """inline() over the per-band (band, bkey) structs -- the banded
    view of an mh0..mh{k} signature row, one expression string."""
    structs = []
    for band in range(N_BANDS):
        lo = BAND_ROWS * band
        keys = ", ".join(
            f"CAST(mh{j} AS STRING)" for j in range(lo, lo + BAND_ROWS)
        )
        structs.append(
            f"named_struct('band', {band}, "
            f"'bkey', concat_ws('_', {keys}))"
        )
    return f"inline(array({', '.join(structs)}))"


def per_row_band_rows(
    docs: DataFrame, width: int | None = None, rebalance: bool = True
) -> DataFrame:
    """(doc_id, band, bkey) rows computed STATELESS per document: the
    MinHash signature is an array fold over the doc's own distinct
    char-8-grams (same md5-prefix fingerprints and (a*x+b) mod P
    permutations as minhash_signatures, so values are identical to the
    batch groupBy.min spelling), banded rows x bands exactly like
    minhash_near_dup_pairs.  No shuffle, no streaming agg -- works
    unchanged on a batch OR streaming frame (streaming/neardup.py runs
    it inside micro-batches; the persistent incremental band index
    builds from it)."""

    # md5+conv is ~8x the cost of the integer permutations: fingerprint
    # each gram ONCE into an fps array, then run the 8 cheap (a*x+b)%P
    # min-folds over it.  Rebalance BEFORE the ~250x gram fan-out (the
    # _gram_df rule): a single-file input otherwise runs the whole fold
    # on one task.  ``width`` lets batch-scale callers (streaming
    # ingest micro-batches) right-size the fan-out instead of paying
    # full-corpus task counts on a few hundred rows; ``rebalance=False``
    # skips the repartition for callers whose input already sits behind
    # a width barrier (the ingest loop's cached quality-flagged batch:
    # repartitioning an already-right-width cache is a pure wasted
    # Exchange per micro-batch -- guide §2.4).
    #
    # Expressions are selectExpr STRINGS, not composed Column objects
    # (round 11): building the ~150 Column nodes here cost one py4j
    # round-trip each (~0.5 s of driver time PER CALL, measured in the
    # ingest loop, which pays it once per micro-batch); three expr
    # strings are three py4j calls for identical expression trees.
    if rebalance:
        docs = docs.repartition(
            width or docs.sparkSession.sparkContext.defaultParallelism
        )
    fps = docs.selectExpr("doc_id", f"{_FPS_SQL} AS fps")
    sig = fps.selectExpr("doc_id", *_mh_exprs())
    return sig.selectExpr("doc_id", _band_inline_expr())


def simhash_sig_expr(bits: int, fps: str = "fps") -> str:
    """In-row SimHash over a fingerprint-array column, as ONE selectExpr
    string: bit-vote v_j = 2*ones_j - n (ones_j = grams whose
    fingerprint has bit j set, n = gram count), signature bit j set iff
    v_j > 0 -- the EXACT integers the explode+groupBy spelling
    aggregates, computed without any shuffle.  A SimHash is a pure
    per-row function of the doc's own distinct-gram set (like the
    MinHash in per_row_band_rows), so the (doc, gram) explosion and the
    32/60-column vote aggregation it fed were a removable full-data
    Exchange (guide §2.4).  String form: 60 bits of composed Column
    objects cost ~500 py4j round-trips per call (seconds of driver
    time); this is one."""
    terms = " + ".join(
        f"IF(2 * size(filter({fps}, x -> (shiftright(x, {j}) & 1) = 1))"
        f" > size({fps}), CAST({1 << j} AS BIGINT), CAST(0 AS BIGINT))"
        for j in range(bits)
    )
    return f"CAST({terms} AS BIGINT)"


@declared(
    "dedup_exact_docs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    hashed AS (
      SELECT doc_id, md5(lower(trim(text))) AS content_hash FROM corpus
    ),
    ranked AS (
      SELECT doc_id, content_hash,
             row_number() OVER (PARTITION BY content_hash ORDER BY doc_id)
               AS rn,
             count(*) OVER (PARTITION BY content_hash) AS n_copies
      FROM hashed
    )
    SELECT doc_id AS keeper_doc_id, content_hash, n_copies
    FROM ranked WHERE rn = 1
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: exact dedup by normalized-text hash; keep lowest doc_id.

    hash -> window(keep first) is one shuffle on the content hash; at
    100 TB the hash key is uniform so no skew, and the text column itself
    never shuffles if you project it away first (only hash + id move).
    """
    corpus = dup_corpus(spark, sf_dir)
    hashed = corpus.select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("content_hash")
    )
    w = Window.partitionBy("content_hash")
    ranked = hashed.select(
        "doc_id",
        "content_hash",
        F.row_number().over(w.orderBy("doc_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_copies"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        F.col("doc_id").alias("keeper_doc_id"), "content_hash", "n_copies"
    )


# Shingling note: the corpus vocabulary is tiny (~31 tokens), so TOKEN-set
# similarity is degenerate (random doc pairs reach Jaccard 0.9+).  All
# MinHash/Jaccard near-dup detection therefore shingles on character
# 8-grams, which encode token ORDER and separate cleanly (random pairs
# ~0.0-0.1, true near-dups ~0.9+).
_GRAMS_SQL = """
      SELECT doc_id, g.gram
      FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(1, greatest(length(trim(text)) - 7, 1)),
                 i -> substring(trim(text), CAST(i AS INT), 8))) AS grams
        FROM corpus
      ) grammed, unnest(grams) AS g(gram)
"""


def _gram_df(corpus: DataFrame, *extra: str) -> DataFrame:
    """Distinct char-8-gram shingles per doc (order-encoding dedup unit).

    Dedup happens INSIDE the row (array_distinct before explode): per-doc
    uniqueness needs no cross-row information, so paying a 4M-row
    ``distinct`` shuffle for it would be pure waste -- this is the
    difference between zero exchanges and one full-data exchange in every
    shingle-based operator.

    The narrow corpus IS repartitioned first: the parquet is a few MB (1-3
    input splits) but each row fans out ~650 grams + md5s, so shuffling
    6000 thin rows to all cores before the expansion buys 10x parallelism
    for free.  Same rule at 100 TB: rebalance BEFORE per-row explosion,
    never after.
    """
    spark = corpus.sparkSession
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism)
    t = F.trim("text")
    return corpus.select(
        "doc_id",
        *extra,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(t) - 7, F.lit(1))),
                    lambda i: t.substr(i, F.lit(8)),
                )
            )
        ).alias("gram"),
    )


def _minhash_hashes_sql() -> str:
    cols = ", ".join(
        f"CAST(min(({a} * tokint + {b}) % {MINHASH_PRIME}) AS BIGINT) AS mh{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS ({_GRAMS_SQL}),
    fp AS (
      SELECT doc_id,
             ('0x' || substring(md5(gram), 1, 8))::BIGINT AS tokint
      FROM tok
    )
    SELECT doc_id, {cols} FROM fp GROUP BY doc_id
    """


def minhash_signature_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IN-ROW (round 11): the signature is a per-row function of the
    # doc's distinct-gram set -- the former explode + 8-min aggregation
    # shuffled one row per (doc, gram) for integers computable in place
    # (guide §2.4).  Fingerprint once into fps, then 8 cheap min-folds.
    corpus = dup_corpus(spark, sf_dir)
    fps = corpus.repartition(
        spark.sparkContext.defaultParallelism
    ).selectExpr("doc_id", f"{_FPS_SQL} AS fps")
    return fps.selectExpr("doc_id", *_mh_exprs())


@declared("minhash_signatures", oracle=_minhash_hashes_sql())
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5a: 8-permutation MinHash signatures per document.

    shingle -> fingerprint -> k min-aggregates: min() is map-side
    combinable, so the shuffle carries one row per (doc, k) not one per
    token.  Signature arithmetic is integer-exact, hence oracle-matchable.
    """
    return minhash_signature_df(spark, sf_dir)


def _bands_sql() -> str:
    """bands CTE body generated from (N_BANDS, BAND_ROWS) -- the oracle
    rebands automatically when the LSH shape constants change."""
    selects = []
    for band in range(N_BANDS):
        lo = BAND_ROWS * band
        key = " || '_' || ".join(
            f"CAST(mh{j} AS VARCHAR)" for j in range(lo, lo + BAND_ROWS)
        )
        selects.append(f"SELECT doc_id, {band} AS band, {key} AS bkey FROM sig")
    return "\n      UNION ALL\n      ".join(selects)


@declared(
    "minhash_near_dup_pairs",
    oracle=f"""
    WITH sig AS ({_minhash_hashes_sql()}),
    bands AS (
      {_bands_sql()}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    corpus AS ({_CORPUS_SQL}),
    toksets AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(trim(text)) - 7, 1)),
               i -> substring(trim(text), CAST(i AS INT), 8))) AS toks
      FROM corpus
    )
    SELECT c.doc_a, c.doc_b,
           len(list_intersect(ta.toks, tb.toks)) * 1.0
             / len(list_distinct(list_concat(ta.toks, tb.toks))) AS jaccard
    FROM cand c
    JOIN toksets ta ON ta.doc_id = c.doc_a
    JOIN toksets tb ON tb.doc_id = c.doc_b
    WHERE len(list_intersect(ta.toks, tb.toks)) * 1.0
          / len(list_distinct(list_concat(ta.toks, tb.toks))) >= 0.6
    """,
)
def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5b: LSH candidate generation + exact Jaccard verification.

    Candidates come from equi-joins on (band, band_key) -- the core LSH
    trick that replaces the O(n^2) cross join with a shuffle join on
    bucket keys.  Band shape is the precision/recall knob: r=BAND_ROWS
    sets the collision prob of a J-similar pair to 1-(1-J^r)^b, and the
    4x2 shape originally used here let this corpus's weakly-similar pairs
    (word-salad text, J<=0.1) through at ~0.25% precision -- 120k
    candidates at sf0.1, 28+ s spent on per-pair verification.  The 2x4
    shape cuts that to ~4k candidates (~7-10 s total) while keeping
    ~99.4% collision prob for the true near-dups (J~0.98); pairs at
    J~0.6 drop to ~24% recall, the documented cost of raising r --
    widen to more bands (b) of the same r to buy recall back.  Only
    candidates pay the exact token-set Jaccard, per-pair on gram ARRAYS
    (right at this volume; when LSH yields millions of candidates, flip
    to the inverted-index verification of ngram_jaccard_pairs, whose
    cost scales with shared grams, not pairs x set size).  At 100 TB:
    band buckets are uniformly distributed (hash keys), so the
    self-join partitions evenly; hot buckets (boilerplate docs) would
    be the one skew source -- AQE skew-join handles them.
    """
    # ONE corpus synthesis + shingling feeds BOTH stages: the tokset
    # arrays are materialized first (checkpoint), signatures derive from
    # their in-memory explode, and the verify join reuses the same arrays
    # -- previously signatures and toksets each re-shingled the corpus
    # (two full passes; at 100 TB one whole wasted corpus read).
    spark_para = spark.sparkContext.defaultParallelism
    t = F.trim("text")
    toksets = (
        dup_corpus(spark, sf_dir)
        .repartition(spark_para)
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(t) - 7, F.lit(1))),
                    lambda i: t.substr(i, F.lit(8)),
                )
            ).alias("toks"),
        )
        .localCheckpoint(eager=False)
    )
    # IN-ROW signatures off the same tokset arrays (round 11): the old
    # explode + groupBy.min spelling shuffled one row per (doc, gram)
    # for integers computable per row -- same values (min over the same
    # distinct-gram fingerprints), one less full-data Exchange.
    fps = toksets.selectExpr(
        "doc_id",
        "transform(toks, g -> CAST(conv(substring(md5(g), 1, 8), 16, 10)"
        " AS BIGINT)) AS fps",
    )
    sig = fps.selectExpr("doc_id", *_mh_exprs())
    # The self-join below consumes the banded view twice; checkpoint the
    # NARROW signature frame (1 id + N_BANDS*BAND_ROWS bigints) once and
    # derive (band, bkey) rows in-row with one explode per consumer -- a
    # pure projection off the checkpoint.  The previous shape unioned
    # N_BANDS selects over sig and checkpointed the union, which both
    # re-ran the signature aggregation once per band leg inside the
    # materialization job and wrote the wider exploded rows out.
    # localCheckpoint (not persist) is GC-cleaned when the frame drops.
    sig = sig.localCheckpoint(eager=False)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"mh{j}").cast("string")
                        for j in range(BAND_ROWS * band, BAND_ROWS * (band + 1))
                    ],
                ).alias("bkey"),
            )
            for band in range(N_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta = toksets.alias("ta")
    tb = toksets.alias("tb")
    jacc = F.size(F.array_intersect(F.col("ta.toks"), F.col("tb.toks"))) / F.size(
        F.array_union(F.col("ta.toks"), F.col("tb.toks"))
    )
    return (
        cand.join(ta, F.col("ta.doc_id") == F.col("doc_a"))
        .join(tb, F.col("tb.doc_id") == F.col("doc_b"))
        .filter(jacc >= 0.6)
        .select("doc_a", "doc_b", jacc.alias("jaccard"))
    )


_SIMHASH_VOTE_COLS = ", ".join(
    f"sum(CASE WHEN (tokint >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
    for j in range(32)
)
_SIMHASH_RECOMBINE = " + ".join(
    f"CASE WHEN v{j} > 0 THEN ({1 << j}::BIGINT) ELSE 0::BIGINT END"
    for j in range(32)
)


@declared(
    "simhash_docs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS ({_GRAMS_SQL}),
    fp AS (
      SELECT doc_id,
             ('0x' || substring(md5(gram), 1, 8))::BIGINT AS tokint
      FROM tok
    ),
    votes AS (
      SELECT doc_id, {_SIMHASH_VOTE_COLS}
      FROM fp
      GROUP BY doc_id
    )
    SELECT doc_id, CAST({_SIMHASH_RECOMBINE} AS BIGINT) AS simhash
    FROM votes
    """,
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5c: 32-bit SimHash per document (bit-vote majority).

    Computed IN-ROW (round 11): the signature is a pure per-row function
    of the doc's distinct-gram set, so the former explode + 32-vote-
    column aggregation -- one full (doc, gram) Exchange -- is removed
    outright (guide §2.4; the per_row_band_rows discipline).  Each gram
    fingerprints once into an fps array, then 32 cheap bit-filters vote
    (v_j = 2*ones_j - n, bit set iff v_j > 0 -- integers identical to
    the groupBy sum of +-1).  Near-dup lookup stays an equi-join on the
    signature (or banded substrings for hamming > 0), never a pairwise
    scan.  Rebalance BEFORE the per-row gram fan-out (the _gram_df rule).
    """
    corpus = dup_corpus(spark, sf_dir)
    fps = corpus.repartition(
        spark.sparkContext.defaultParallelism
    ).selectExpr("doc_id", f"{_FPS_SQL} AS fps")
    return fps.selectExpr(
        "doc_id", f"{simhash_sig_expr(32)} AS simhash"
    )


@declared(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    grams AS (
      SELECT doc_id, source, g.gram
      FROM (
        SELECT doc_id, source,
               list_distinct(list_transform(
                 generate_series(1, greatest(length(trim(text)) - 7, 1)),
                 i -> substring(trim(text), CAST(i AS INT), 8))) AS grams
        FROM corpus
      ) grammed, unnest(grams) AS g(gram)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM grams a
      JOIN grams b ON a.gram = b.gram AND a.source = b.source
                  AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           c * 1.0 / (sa.n + sb.n - c) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.6
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5d: character-8-gram Jaccard near-dup within source buckets.

    Inverted-index formulation: explode shingles, equi-join on (gram,
    source), count shared grams per pair, then Jaccard via
    |A u B| = |A| + |B| - |A n B|.  This never materializes per-pair
    arrays -- the naive formulation (array_intersect per blocked pair)
    is O(pairs x set size) and measured 280 s at sf0.1 vs <10 s for
    this join; at 100 TB only the inverted index survives.  Stop-gram
    skew (a gram shared by all docs) is the hot-key risk: AQE skew-join
    splits it, and production would drop top-percentile grams first.
    """
    # The gram index feeds FOUR consumers (both self-join aliases + both
    # size lookups).  Round 7: it is a PERSISTENT bucketBy(N, gram, source)
    # parquet table (plans/gram_index.py) -- written once per corpus, so
    # every consumer is a cheap columnar re-scan and the self-join runs
    # bucket-to-bucket with ZERO Exchange.  (Rounds 3-6 localCheckpointed
    # the gram frame per run: one materialization per QUERY; the x100
    # decade showed that per-query rebuild+shuffle is the scale bill.)
    grams = jac8_gram_index(spark, sf_dir)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.alias("a")
    b = grams.alias("b")
    shared = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jacc = F.col("c") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        shared.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jacc >= 0.6)
        .select("doc_a", "doc_b", jacc.alias("jaccard"))
    )


def jac8_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent bucketBy(N, gram, source) distinct char-8-gram postings
    over the dup corpus."""
    return ensure_bucketed_index(
        spark,
        sf_dir,
        "jac8src",
        lambda s, d: _gram_df(dup_corpus(s, d), "source"),
        ["gram", "source"],
        version="v1",
    )


@declared(
    "gram_index_df_profile",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    grams AS (
      SELECT doc_id, source, g.gram
      FROM (
        SELECT doc_id, source,
               list_distinct(list_transform(
                 generate_series(1, greatest(length(trim(text)) - 7, 1)),
                 i -> substring(trim(text), CAST(i AS INT), 8))) AS grams
        FROM corpus
      ) grammed, unnest(grams) AS g(gram)
    ),
    df AS (
      SELECT source, gram, count(*) AS df
      FROM grams GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(df) AS BIGINT) AS n_postings,
           CAST(count(*) AS BIGINT) AS n_distinct_grams,
           CAST(max(df) AS BIGINT) AS max_df,
           CAST(sum(CASE WHEN df > {WINNOW_FP_DF_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS hot_grams,
           {ratio4_sql('sum(df)', 'count(*)')} AS avg_df
    FROM df GROUP BY source
    """,
)
def gram_index_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency audit of the persistent gram index, per source:
    postings volume, distinct grams, max/avg df, and the count of HOT
    grams past the df-cap (WINNOW_FP_DF_CAP) -- the health check an
    operator consults before trusting any gram self-join's fan-out bound
    (a viral boilerplate gram's df grows linearly with the corpus; this
    is the table that says when the cap starts biting).

    Plan: the first-level groupBy(gram, source) runs with ZERO Exchange
    -- it groups on exactly the index's bucket keys, so the partial and
    final aggregates fuse over the bucketed scan; only the tiny
    per-source rollup shuffles.  Cost at 100 TB: one columnar index
    scan, no corpus re-shingling, no full-width exchange.
    """
    df = (
        jac8_gram_index(spark, sf_dir)
        .groupBy("gram", "source")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return df.groupBy("source").agg(
        F.sum("df").cast("bigint").alias("n_postings"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_grams"),
        F.max("df").cast("bigint").alias("max_df"),
        F.sum(F.when(F.col("df") > WINNOW_FP_DF_CAP, 1).otherwise(0))
        .cast("bigint")
        .alias("hot_grams"),
        ratio4(F.sum("df"), F.count(F.lit(1))).alias("avg_df"),
    )


@declared(
    "containment_pairs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    ccorp AS (
      SELECT doc_id, text, source FROM corpus
      UNION ALL
      SELECT doc_id + 3000000,
             substring(trim(text), 1,
               greatest(CAST(length(trim(text)) // 2 AS INT), 8)),
             source
      FROM corpus WHERE doc_id % 10 = 2
    ),
    grams AS (
      SELECT doc_id, source, g.gram
      FROM (
        SELECT doc_id, source,
               list_distinct(list_transform(
                 generate_series(1, greatest(length(trim(text)) - 7, 1)),
                 i -> substring(trim(text), CAST(i AS INT), 8))) AS grams
        FROM ccorp
      ) grammed, unnest(grams) AS g(gram)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared_grams
      FROM grams a
      JOIN grams b ON a.gram = b.gram AND a.source = b.source
                  AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, shared_grams,
           shared_grams * 1.0 / least(sa.n, sb.n) AS containment
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE shared_grams * 1.0 / least(sa.n, sb.n) >= 0.9
    """,
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: |A n B| / min(|A|, |B|) >= 0.9 over
    char-8-gram sets -- catches a short document EMBEDDED in a longer one
    (quote inclusion, truncated re-crawls), which symmetric Jaccard
    misses (a half-length prefix scores J ~ 0.5, containment ~ 1.0).

    The corpus adds half-prefix truncations (+3M ids) to the synthesized
    dup corpus to exercise exactly that case.  Same inverted-index shape
    as ngram_jaccard_pairs: shared-gram counting via the (gram, source)
    equi-join -- per-pair cost scales with shared grams, never pairs x
    set size; the containment ratio is a single float division of two
    exact integers (bit-identical cross-engine).
    """
    return _containment_pairs_impl(spark, sf_dir)


def containment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dup corpus + half-prefix truncations (+3M ids) of each doc_id%10==2
    -- the embedded-document case containment catches and Jaccard misses."""
    corpus = dup_corpus(spark, sf_dir).select("doc_id", "text", "source")
    t = F.trim("text")
    trunc = corpus.filter(F.col("doc_id") % 10 == 2).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        t.substr(
            F.lit(1),
            F.greatest(F.expr("CAST(length(trim(text)) DIV 2 AS INT)"), F.lit(8)),
        ).alias("text"),
        "source",
    )
    return corpus.unionByName(trunc)


def _containment_pairs_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same persistent-index shape as ngram_jaccard_pairs, over the
    # containment corpus (dup corpus + half-prefix truncations): written
    # once per corpus, every consumer re-scans the bucketed table and the
    # self-join is a zero-Exchange bucket-to-bucket join.
    grams = ensure_bucketed_index(
        spark,
        sf_dir,
        "cont8src",
        lambda s, d: _gram_df(containment_corpus(s, d), "source"),
        ["gram", "source"],
        version="v1",
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.alias("a")
    b = grams.alias("b")
    shared = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_grams"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    cont = F.col("shared_grams") * 1.0 / F.least(F.col("sa.n"), F.col("sb.n"))
    return (
        shared.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(cont >= 0.9)
        .select("doc_a", "doc_b", "shared_grams", cont.alias("containment"))
    )


# Incremental dedup: the nightly-ingest form.  The index is the full
# existing corpus; the new batch synthesizes one near-dup per doc_id%10==3
# (text + ' zznew', id+4M) and one scrambled non-dup per %10==4
# (reversed text, id+5M).  Candidates come from bands(new) x bands(index)
# -- never index x index, which is the entire point: ingest cost scales
# with the BATCH, not the corpus.
_INC_CORPUS_SQL = """
      SELECT doc_id, text, 'idx' AS tag FROM documents
      UNION ALL
      SELECT doc_id + 4000000, text || ' zznew', 'new'
      FROM documents WHERE doc_id % 10 = 3
      UNION ALL
      SELECT doc_id + 5000000, reverse(trim(text)), 'new'
      FROM documents WHERE doc_id % 10 = 4
"""

_INC_GRAMS_SQL = """
      SELECT doc_id, tag, g.gram
      FROM (
        SELECT doc_id, tag,
               list_distinct(list_transform(
                 generate_series(1, greatest(length(trim(text)) - 7, 1)),
                 i -> substring(trim(text), CAST(i AS INT), 8))) AS grams
        FROM corpus
      ) grammed, unnest(grams) AS g(gram)
"""


def _inc_sig_sql() -> str:
    cols = ", ".join(
        f"CAST(min(({a} * tokint + {b}) % {MINHASH_PRIME}) AS BIGINT) AS mh{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    return f"""
    corpus AS ({_INC_CORPUS_SQL}),
    tok AS ({_INC_GRAMS_SQL}),
    fp AS (
      SELECT doc_id, tag,
             ('0x' || substring(md5(gram), 1, 8))::BIGINT AS tokint
      FROM tok
    ),
    sig AS (SELECT doc_id, tag, {cols} FROM fp GROUP BY doc_id, tag)
    """


def _inc_bands_sql() -> str:
    selects = []
    for band in range(N_BANDS):
        lo = BAND_ROWS * band
        key = " || '_' || ".join(
            f"CAST(mh{j} AS VARCHAR)" for j in range(lo, lo + BAND_ROWS)
        )
        selects.append(
            f"SELECT doc_id, tag, {band} AS band, {key} AS bkey FROM sig"
        )
    return "\n      UNION ALL\n      ".join(selects)


@declared(
    "incremental_near_dup_check",
    oracle=f"""
    WITH {_inc_sig_sql()},
    bands AS (
      {_inc_bands_sql()}
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_doc_id, i.doc_id AS matched_doc_id
      FROM bands n JOIN bands i
        ON n.band = i.band AND n.bkey = i.bkey
       AND n.tag = 'new' AND i.tag = 'idx'
    ),
    toksets AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(trim(text)) - 7, 1)),
               i -> substring(trim(text), CAST(i AS INT), 8))) AS toks
      FROM corpus
    )
    SELECT c.new_doc_id, c.matched_doc_id,
           len(list_intersect(tn.toks, ti.toks)) * 1.0
             / len(list_distinct(list_concat(tn.toks, ti.toks))) AS jaccard
    FROM cand c
    JOIN toksets tn ON tn.doc_id = c.new_doc_id
    JOIN toksets ti ON ti.doc_id = c.matched_doc_id
    WHERE len(list_intersect(tn.toks, ti.toks)) * 1.0
          / len(list_distinct(list_concat(tn.toks, ti.toks))) >= 0.6
    """,
)
def incremental_near_dup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time near-dup check: LSH bands of the NEW batch probe the
    band index of the EXISTING corpus; only new-vs-index candidates are
    verified.

    This is the incremental form every production pipeline actually
    runs (the self-join form, minhash_near_dup_pairs, is the one-off
    backfill): the band index is a write-once artifact, tonight's batch
    shuffles only ITS bands against it, and cost scales with the batch
    size times collision rate -- never corpus x corpus.

    Round 7: the index side is a PERSISTENT bucketBy(N, band, bkey)
    table (plans/gram_index.py, kind "bandidx"), so the probe plans
    exactly ONE exchange -- on the BATCH's bands, shuffled into the
    index's bucketing; the corpus-scaled side never moves (pinned in
    tests/test_gram_index.py).  Per-row signatures (per_row_band_rows)
    replace the old explode+groupBy spelling -- identical values (same
    distinct-gram fingerprints and permutations), zero shuffle to
    compute.  The scrambled decoys (reversed text) exercise the
    no-match path.
    """
    idx = incremental_band_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # The batch feeds both its band computation and the verification
    # toksets: checkpoint it once (batch-scaled, tiny next to the
    # corpus) so documents is scanned once, not three times.
    new_docs = new_batch_docs(docs).localCheckpoint(eager=True)
    new_bands = per_row_band_rows(new_docs)
    # shuffle_hash with the BATCH as build side: at test scale Catalyst
    # would happily broadcast the index (it is tiny here), but the index
    # is corpus-scaled -- the honest 100 TB plan shuffles only the batch
    # bands into the index's bucketing and streams the bucketed scan.
    cand = (
        new_bands.alias("n")
        .hint("shuffle_hash")
        .join(
            idx.alias("i"),
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.bkey") == F.col("i.bkey")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc_id"),
            F.col("i.doc_id").alias("matched_doc_id"),
        )
        .distinct()
    )
    # Verification toksets: index docs + the new batch (candidate-scaled
    # join consumers; one corpus scan + one batch scan).
    toksets = (
        docs.unionByName(new_docs)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", doc_tokset_col().alias("toks"))
        .localCheckpoint(eager=False)
    )
    tn = toksets.alias("tn")
    ti = toksets.alias("ti")
    jacc = F.size(
        F.array_intersect(F.col("tn.toks"), F.col("ti.toks"))
    ) / F.size(F.array_union(F.col("tn.toks"), F.col("ti.toks")))
    return (
        cand.join(tn, F.col("tn.doc_id") == F.col("new_doc_id"))
        .join(ti, F.col("ti.doc_id") == F.col("matched_doc_id"))
        .filter(jacc >= 0.6)
        .select("new_doc_id", "matched_doc_id", jacc.alias("jaccard"))
    )


# Two-night ingest scenario for the band index's DELTA leg: night 1's
# batch (the +4M/+5M planted docs) is APPENDED to the persistent band
# index as a bucketed delta; night 2's batch (+7M: near-dups of both
# the original AND night 1's variant; +8M: scrambled decoys) probes
# base UNION delta.
_INC2_CORPUS_SQL = """
      SELECT doc_id, text, 'idx' AS tag FROM documents
      UNION ALL
      SELECT doc_id + 4000000, text || ' zznew', 'idx'
      FROM documents WHERE doc_id % 10 = 3
      UNION ALL
      SELECT doc_id + 5000000, reverse(trim(text)), 'idx'
      FROM documents WHERE doc_id % 10 = 4
      UNION ALL
      SELECT doc_id + 7000000, text || ' zznew zz2', 'new'
      FROM documents WHERE doc_id % 10 = 3
      UNION ALL
      SELECT doc_id + 8000000, reverse(trim(text) || ' q'), 'new'
      FROM documents WHERE doc_id % 10 = 8
"""


def batch2_docs(docs: DataFrame) -> DataFrame:
    """Night 2's ingest batch: +7M near-dups (of the original AND of
    night 1's +4M variant) and +8M scrambled decoys (no-match path)."""
    near2 = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 7000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zznew zz2")).alias("text"),
    )
    decoy2 = docs.filter(F.col("doc_id") % 10 == 8).select(
        (F.col("doc_id") + 8000000).alias("doc_id"),
        F.reverse(F.concat(F.trim("text"), F.lit(" q"))).alias("text"),
    )
    return near2.unionByName(decoy2)


def band_index_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Night 1's batch bands published as a DELTA leg of the persistent
    band index (plans/gram_index.py round-8 incremental maintenance):
    same bucketBy(N, band, bkey) layout as the base, batch-scaled
    bytes, base untouched.  Published under the DEDICATED planted kind
    ``bandidx_ing`` (round-10): the shared ``bandidx`` base keeps zero
    planted deltas, so a real corpus can compact it freely, while this
    leg's +4M/+5M docs can never be folded into the base the base-only
    consumers (incremental_near_dup_check) read."""
    from etl_rf_matrix_controller_spark.plans.gram_index import (
        append_index_delta,
    )

    return append_index_delta(
        spark,
        sf_dir,
        "bandidx_ing",
        lambda s, d: per_row_band_rows(
            new_batch_docs(
                load_table(s, d, "documents").select("doc_id", "text")
            )
        ),
        ["band", "bkey"],
        version="v1",
        batch_id="ing1",
    )


@declared(
    "incremental_band_append_check",
    oracle=f"""
    WITH corpus AS MATERIALIZED ({_INC2_CORPUS_SQL}),
    tok AS ({_INC_GRAMS_SQL}),
    fp AS (
      SELECT doc_id, tag,
             ('0x' || substring(md5(gram), 1, 8))::BIGINT AS tokint
      FROM tok
    ),
    sig AS (SELECT doc_id, tag, {", ".join(
        f"CAST(min(({a} * tokint + {b}) % {MINHASH_PRIME}) AS BIGINT) AS mh{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )} FROM fp GROUP BY doc_id, tag),
    bands AS MATERIALIZED (
      {_inc_bands_sql()}
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_doc_id, i.doc_id AS matched_doc_id
      FROM bands n JOIN bands i
        ON n.band = i.band AND n.bkey = i.bkey
       AND n.tag = 'new' AND i.tag = 'idx'
    ),
    toksets AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(trim(text)) - 7, 1)),
               i -> substring(trim(text), CAST(i AS INT), 8))) AS toks
      FROM corpus
    )
    SELECT c.new_doc_id, c.matched_doc_id,
           c.matched_doc_id >= 4000000 AS matched_in_delta,
           len(list_intersect(tn.toks, ti.toks)) * 1.0
             / len(list_distinct(list_concat(tn.toks, ti.toks))) AS jaccard
    FROM cand c
    JOIN toksets tn ON tn.doc_id = c.new_doc_id
    JOIN toksets ti ON ti.doc_id = c.matched_doc_id
    WHERE len(list_intersect(tn.toks, ti.toks)) * 1.0
          / len(list_distinct(list_concat(tn.toks, ti.toks))) >= 0.6
    """,
)
def incremental_band_append_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Night-over-night incremental ingest WITHOUT an index rebuild:
    night 1's admitted batch is APPENDED to the persistent band index
    as a bucketed delta leg (plans/gram_index.py), and night 2's batch
    probes base ∪ delta -- each leg joined separately (both share the
    base's bucketing, so each probe shuffles only the batch's bands;
    a union of the scans would erase the distribution), results
    unioned.  `matched_in_delta` rows prove the delta leg is live:
    night 2's ' zznew zz2' docs match BOTH their original (base) and
    night 1's ' zznew' variant (delta).

    100 TB posture: the round-7 probe kept the index immutable --
    every appended batch forced a full rebuild by corpus-fingerprint
    rotation.  Now maintenance is batch-scaled (measured x100: append
    0.85 s flat vs rebuild 5.16 s corpus-scaled, BENCHNOTES round 8);
    compaction amortizes across many appends off the query path.
    """
    base = incremental_band_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = band_index_delta(spark, sf_dir)
    b1 = new_batch_docs(docs).localCheckpoint(eager=True)
    b2 = batch2_docs(docs).localCheckpoint(eager=True)
    new_bands = per_row_band_rows(b2).localCheckpoint(eager=True)

    def probe(leg: DataFrame) -> DataFrame:
        return (
            new_bands.alias("n")
            .hint("shuffle_hash")
            .join(
                leg.alias("i"),
                (F.col("n.band") == F.col("i.band"))
                & (F.col("n.bkey") == F.col("i.bkey")),
            )
            .select(
                F.col("n.doc_id").alias("new_doc_id"),
                F.col("i.doc_id").alias("matched_doc_id"),
            )
        )

    cand = probe(base).unionByName(probe(delta)).distinct()
    toksets = (
        docs.unionByName(b1)
        .unionByName(b2)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", doc_tokset_col().alias("toks"))
        .localCheckpoint(eager=False)
    )
    tn = toksets.alias("tn")
    ti = toksets.alias("ti")
    jacc = F.size(
        F.array_intersect(F.col("tn.toks"), F.col("ti.toks"))
    ) / F.size(F.array_union(F.col("tn.toks"), F.col("ti.toks")))
    return (
        cand.join(tn, F.col("tn.doc_id") == F.col("new_doc_id"))
        .join(ti, F.col("ti.doc_id") == F.col("matched_doc_id"))
        .filter(jacc >= 0.6)
        .select(
            "new_doc_id",
            "matched_doc_id",
            (F.col("matched_doc_id") >= 4000000).alias("matched_in_delta"),
            jacc.alias("jaccard"),
        )
    )


def new_batch_docs(docs: DataFrame) -> DataFrame:
    """The synthesized ingest batch: one near-dup (+4M, ' zznew') per
    doc_id%10==3 and one scrambled decoy (+5M, reversed) per %10==4."""
    near = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zznew")).alias("text"),
    )
    decoy = docs.filter(F.col("doc_id") % 10 == 4).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.reverse(F.trim("text")).alias("text"),
    )
    return near.unionByName(decoy)


def incremental_band_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent bucketBy(N, band, bkey) MinHash band postings of the
    EXISTING corpus -- the write-once artifact nightly ingest batches
    probe (incremental_near_dup_check); only the batch's bands ever
    shuffle."""
    return ensure_bucketed_index(
        spark,
        sf_dir,
        "bandidx",
        lambda s, d: per_row_band_rows(
            load_table(s, d, "documents").select("doc_id", "text")
        ),
        ["band", "bkey"],
        version="v1",
    )


@declared(
    "dup_ratio_by_source",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    hashed AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS h FROM corpus
    ),
    marked AS (
      SELECT source,
             count(*) OVER (PARTITION BY h) > 1 AS is_dup
      FROM hashed
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE is_dup) AS BIGINT) AS n_dup_docs,
           {ratio4_sql('count(*) FILTER (WHERE is_dup)', 'count(*)')}
             AS dup_ratio
    FROM marked GROUP BY source
    """,
)
def dup_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate pressure per source: the fraction of a source's docs
    whose exact content appears more than once in the corpus -- the
    crawl-health signal that routes a mirror-heavy domain into
    aggressive dedup and leaves a clean one alone.

    One window over the content hash marks duplicates (same single
    shuffle as dedup_exact_docs -- only hash + source move, never
    text), then a per-source conditional count.  Runs over the dup
    corpus (the raw table is duplicate-free).
    """
    corpus = dup_corpus(spark, sf_dir)
    hashed = corpus.select(
        "source", F.md5(F.lower(F.trim("text"))).alias("h")
    )
    marked = hashed.select(
        "source",
        (F.count(F.lit(1)).over(Window.partitionBy("h")) > 1).alias("is_dup"),
    )
    dup_count = F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        dup_count.cast("bigint").alias("n_dup_docs"),
        ratio4(dup_count, F.count(F.lit(1))).alias("dup_ratio"),
    )


_SIG_MATCH_SQL = " + ".join(
    f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(8)
)


@declared(
    "minhash_estimator_calibration",
    oracle=f"""
    WITH sig AS ({_minhash_hashes_sql()}),
    corpus AS ({_CORPUS_SQL}),
    toksets AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(trim(text)) - 7, 1)),
               i -> substring(trim(text), CAST(i AS INT), 8))) AS toks
      FROM corpus
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST({_SIG_MATCH_SQL} AS BIGINT) AS n_match
      FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 2000000
    )
    SELECT p.doc_a, p.doc_b, p.n_match,
           p.n_match / 8.0 AS est_jaccard,
           len(list_intersect(ta.toks, tb.toks)) * 1.0
             / len(list_distinct(list_concat(ta.toks, tb.toks)))
             AS exact_jaccard
    FROM pairs p
    JOIN toksets ta ON ta.doc_id = p.doc_a
    JOIN toksets tb ON tb.doc_id = p.doc_b
    """,
)
def minhash_estimator_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration on ground-truth pairs: for every planted
    near-dup (doc, doc+2M), the MinHash similarity estimate (matching
    signature components / k) next to the exact gram Jaccard -- the
    report that justifies the k and banding knobs with data instead of
    faith (E[matches/k] = J; k=8 gives sd ~ sqrt(J(1-J)/8) ~ 0.17, so
    estimates are coarse and banding, not thresholding on the estimate,
    is the right use of the signature -- visible directly in the rows).

    The pair join is an equi-join on the planted id offset (ground
    truth is known); signatures and toksets come from the same one-pass
    materialization as the production operators.  est is an exact small
    rational (n/8), exact_jaccard the usual exact-int division -- both
    bit-stable cross-engine.
    """
    spark_para = spark.sparkContext.defaultParallelism
    t = F.trim("text")
    toksets = (
        dup_corpus(spark, sf_dir)
        .repartition(spark_para)
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(t) - 7, F.lit(1))),
                    lambda i: t.substr(i, F.lit(8)),
                )
            ).alias("toks"),
        )
        .localCheckpoint(eager=False)
    )
    fp = toksets.select("doc_id", F.explode("toks").alias("gram")).select(
        "doc_id", token_fingerprint(F.col("gram")).alias("tokint")
    )
    sig = fp.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("tokint") + F.lit(b)) % MINHASH_PRIME)
            .cast("bigint")
            .alias(f"mh{j}")
            for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
        ]
    ).localCheckpoint(eager=False)
    a = sig.alias("a")
    b = sig.alias("b")
    n_match = None
    for j in range(8):
        term = F.when(F.col(f"a.mh{j}") == F.col(f"b.mh{j}"), 1).otherwise(0)
        n_match = term if n_match is None else n_match + term
    pairs = a.join(
        b, F.col("b.doc_id") == F.col("a.doc_id") + 2000000
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        n_match.cast("bigint").alias("n_match"),
    )
    ta = toksets.alias("ta")
    tb = toksets.alias("tb")
    exact = F.size(
        F.array_intersect(F.col("ta.toks"), F.col("tb.toks"))
    ) / F.size(F.array_union(F.col("ta.toks"), F.col("tb.toks")))
    return (
        pairs.join(ta, F.col("ta.doc_id") == F.col("doc_a"))
        .join(tb, F.col("tb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            (F.col("n_match") / 8.0).alias("est_jaccard"),
            exact.alias("exact_jaccard"),
        )
    )


# Exact substring-span dedup (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better"): find >=K-char VERBATIM spans shared
# across otherwise-distinct documents.  K is sized so a chance collision
# is negligible (~8 words of this corpus's vocabulary) while any true
# copied passage of that length is caught; real deployments tune K to the
# tokenizer's ~50-token span.
SPAN_K = 40


@declared(
    "substring_span_dups",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    pg AS (
      SELECT doc_id, i.i AS pos,
             substring(t, CAST(i.i AS INT), {SPAN_K}) AS gram
      FROM (
        SELECT doc_id, trim(text) AS t,
               generate_series(1, greatest(length(trim(text)) - {SPAN_K - 1},
                                           0)) AS idxs
        FROM corpus
      ) g, unnest(idxs) AS i(i)
    ),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, a.pos - b.pos AS diag
      FROM pg a JOIN pg b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT doc_a, doc_b, diag, pos_a,
             pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                        ORDER BY pos_a) AS island
      FROM m
    )
    SELECT doc_a, doc_b,
           CAST(min(pos_a) AS BIGINT) AS start_a,
           CAST(min(pos_a) - diag AS BIGINT) AS start_b,
           CAST(max(pos_a) - min(pos_a) + {SPAN_K} AS BIGINT) AS span_chars
    FROM isl
    GROUP BY doc_a, doc_b, diag, island
    """,
)
def substring_span_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: exact substring-span dedup -- maximal verbatim char spans
    (>= SPAN_K chars) repeated across documents, the suffix-array-family
    member of the dedup suite (Lee et al. 2022's ExactSubstr; the
    reference's nearest behavior is whole-selection set dedupe,
    etl_controller.py:2193 -- this finds PARTIAL copies those miss).

    Algorithm (inverted positional index, not a driver-side suffix
    array): every position contributes its K-char gram; an equi-join on
    the gram groups identical spans; runs of consecutive positions on
    the same (doc pair, diagonal) merge into maximal spans via a
    gaps-and-islands pass (the display_group_islands machinery,
    operators/groups.py:48, inlined here over the composite key).

    Scale: cost is bounded by TRUE gram matches -- K=40 makes chance
    collisions vanishingly rare, so the join output is ~(number of
    actually-copied chars), never all-pairs; bucket skew from viral
    boilerplate spans is the one hot spot (AQE skew-join splits those
    buckets).  The positional gram frame feeds both join sides, so it
    is localCheckpointed once (one corpus scan + one fan-out, not two);
    checkpointed frames carry no stats, so the self-join pins a
    shuffle-hash hint (CLAUDE.md rule -- an SMJ would sort the full
    gram stream).  At 100 TB, join on a 128-bit gram hash instead of
    the string to shrink the shuffle; here the string keeps the oracle
    byte-identical.

    Round 7: the positional gram index is no longer rebuilt + shuffled
    per query -- it is a PERSISTENT bucketBy(N, gram) parquet table
    (plans/gram_index.py), written once per corpus, so this query's
    self-join runs bucket-to-bucket with ZERO Exchange (the round-6 x100
    decade showed the per-query ~20 GB gram shuffle was the suite's one
    sub-linear scale shape; the index turns it into a one-time cost).
    """
    return positional_span_pairs(
        span_char_gram_index(spark, sf_dir), SPAN_K, span_col="span_chars"
    )


def span_char_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent bucketBy(N, gram) positional char-40-gram postings over
    the dup corpus (write once; every span query joins bucket-locally)."""
    return ensure_bucketed_index(
        spark,
        sf_dir,
        "spanchar",
        lambda s, d: positional_gram_df(dup_corpus(s, d), SPAN_K),
        ["gram"],
        version="v1",
    )


# Span-family incremental ingest (round-10 verdict task #2): the gram
# indexes were the last rebuild-only family -- every appended batch
# forced a corpus-fingerprint rebuild of the ~650x positional-gram
# fan-out.  Night 1's batch appends its positional grams as a bucketed
# delta leg (dedicated planted kind `spanchar_ing`); night 2 probes
# base ∪ delta leg-by-leg.  The night-1 suffix is kept UNDER SPAN_K
# chars so unrelated night docs can never span-match through the shared
# suffix alone (a >=K shared tail would create |n1| x |n2| phantom
# pairs).
_SPAN_SUF1 = " zq-night-one-span-append"  # 25 chars < SPAN_K
_SPAN_SUF2 = " zq-night-two-probe-extension"

_SPAN_INC_CORPUS_SQL = f"""
      SELECT doc_id, trim(text) AS t, 'idx' AS tag FROM ({_CORPUS_SQL})
      UNION ALL
      SELECT doc_id + 4000000, trim(text) || '{_SPAN_SUF1}', 'idx'
      FROM documents WHERE doc_id % 10 = 3
      UNION ALL
      SELECT doc_id + 7000000,
             trim(text) || '{_SPAN_SUF1}' || '{_SPAN_SUF2}', 'new'
      FROM documents WHERE doc_id % 10 = 3
      UNION ALL
      SELECT doc_id + 8000000, reverse(trim(text)), 'new'
      FROM documents WHERE doc_id % 10 = 8
"""


def span_batch1_docs(docs: DataFrame) -> DataFrame:
    """Night 1's span-ingest batch (+4M): each doc_id%10==3 doc verbatim
    plus a sub-SPAN_K tail -- shares its full original text with the
    base corpus and (text + tail) with night 2's probes."""
    return docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.concat(F.trim("text"), F.lit(_SPAN_SUF1)).alias("text"),
    )


def span_batch2_docs(docs: DataFrame) -> DataFrame:
    """Night 2's probe batch: +7M extensions of night 1's docs (span-
    match BOTH the original, via base, and night 1's variant, via the
    delta leg) and +8M reversed decoys (no-match path)."""
    ext = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 7000000).alias("doc_id"),
        F.concat(
            F.trim("text"), F.lit(_SPAN_SUF1), F.lit(_SPAN_SUF2)
        ).alias("text"),
    )
    decoy = docs.filter(F.col("doc_id") % 10 == 8).select(
        (F.col("doc_id") + 8000000).alias("doc_id"),
        F.reverse(F.trim("text")).alias("text"),
    )
    return ext.unionByName(decoy)


def span_batch_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Night 1's positional char-grams published as a DELTA leg of the
    span index family: same bucketBy(N, gram) layout as the `spanchar`
    base, batch-scaled bytes (~650x the batch, never the corpus), base
    untouched.  Published under the DEDICATED planted kind
    ``spanchar_ing`` so the shared `spanchar` base stays compactable
    and these +4M planted grams can never be folded into it."""
    from etl_rf_matrix_controller_spark.plans.gram_index import (
        append_index_delta,
    )

    return append_index_delta(
        spark,
        sf_dir,
        "spanchar_ing",
        lambda s, d: positional_gram_df(
            span_batch1_docs(
                load_table(s, d, "documents").select("doc_id", "text")
            ),
            SPAN_K,
        ),
        ["gram"],
        version="v1",
        batch_id="ing1",
    )


@declared(
    "incremental_span_append_check",
    oracle=f"""
    WITH alld AS MATERIALIZED ({_SPAN_INC_CORPUS_SQL}),
    pg AS MATERIALIZED (
      SELECT doc_id, tag, i.i AS pos,
             substring(t, CAST(i.i AS INT), {SPAN_K}) AS gram
      FROM (
        SELECT doc_id, tag, t,
               generate_series(1, greatest(length(t) - {SPAN_K - 1}, 0))
                 AS idxs
        FROM alld
      ) g, unnest(idxs) AS i(i)
    ),
    m AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, a.pos - b.pos AS diag
      FROM pg a JOIN pg b
        ON a.gram = b.gram AND a.tag = 'idx' AND b.tag = 'new'
    ),
    isl AS (
      SELECT doc_a, doc_b, diag, pos_a,
             pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                        ORDER BY pos_a) AS island
      FROM m
    )
    SELECT doc_a, doc_b,
           CAST(min(pos_a) AS BIGINT) AS start_a,
           CAST(min(pos_a) - diag AS BIGINT) AS start_b,
           CAST(max(pos_a) - min(pos_a) + {SPAN_K} AS BIGINT) AS span_chars,
           doc_a >= 4000000 AS matched_in_delta
    FROM isl
    GROUP BY doc_a, doc_b, diag, island
    """,
)
def incremental_span_append_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Night-over-night incremental ingest for the SPAN-dedup family
    (round-10: the last rebuild-only index shape gets the delta-leg
    treatment).  Night 1's batch publishes its positional char-grams as
    a bucketed delta leg of the persistent span index; night 2's batch
    probes base ∪ delta -- each leg joined separately (both share the
    base's bucketing; a union of scans would erase the distribution the
    co-located probe needs), match frames unioned BEFORE one
    probe-scaled gaps-and-islands merge so spans never split at a leg
    boundary.  `matched_in_delta` rows prove the delta leg is live:
    night 2's extensions span-match BOTH their original (base) and
    night 1's variant (delta, with a strictly longer span that covers
    the night-1 tail).

    100 TB posture: the append writes only the batch's ~650x gram
    fan-out through the base's bucketing fn -- the corpus is never
    re-grammed or re-shuffled; probes shuffle only night 2's grams (one
    probe-side Exchange per leg against a bucketed scan); the island
    merge is match-scaled.  Compaction of real (non-planted) span
    deltas folds legs back to one file per bucket off the query path,
    same as every other kind since round 10 unblocked production
    compaction.
    """
    base = span_char_gram_index(spark, sf_dir)
    delta = span_batch_delta(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    npg = positional_gram_df(
        span_batch2_docs(docs), SPAN_K
    ).localCheckpoint(eager=True)

    def m_of(leg: DataFrame) -> DataFrame:
        return (
            npg.alias("n")
            .hint("shuffle_hash")
            .join(leg.alias("i"), F.col("n.gram") == F.col("i.gram"))
            .select(
                F.col("i.doc_id").alias("doc_a"),
                F.col("n.doc_id").alias("doc_b"),
                F.col("i.pos").alias("pos_a"),
                (F.col("i.pos") - F.col("n.pos")).alias("diag"),
            )
        )

    m = m_of(base).unionByName(m_of(delta))
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = m.select(
        "doc_a",
        "doc_b",
        "diag",
        "pos_a",
        (F.col("pos_a") - F.row_number().over(w)).alias("island"),
    )
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("pos_a").cast("bigint").alias("start_a"),
            (F.min("pos_a") - F.first("diag"))
            .cast("bigint")
            .alias("start_b"),
            (F.max("pos_a") - F.min("pos_a") + SPAN_K)
            .cast("bigint")
            .alias("span_chars"),
        )
        .select(
            "doc_a",
            "doc_b",
            "start_a",
            "start_b",
            "span_chars",
            (F.col("doc_a") >= 4000000).alias("matched_in_delta"),
        )
    )


def positional_gram_df(docs: DataFrame, k: int) -> DataFrame:
    """Positional k-char gram fan-out: (doc_id, pos, gram), one row per
    character position.  Shared by the ad-hoc span path (checkpointed
    per-run) and the persistent bucketed index builder.

    The pre-fan-out repartition is sized from spark.sql.shuffle.partitions,
    not defaultParallelism: the ~650x gram explode lands in these
    partitions, so a fixed core-count width puts (total_grams / n_cores)
    rows in every block -- at the x100 stress decade that was 10M
    grams/partition and the probe fell off the memory cliff (spill-bound,
    4x throughput drop).  Sizing by the shuffle conf keeps the
    post-explode block volume matched to what the consumer's joins are
    already sized for.
    """
    spark_para = max(
        docs.sparkSession.sparkContext.defaultParallelism,
        int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions")),
    )
    t = F.trim("text")
    grams = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (k - 1)),
            lambda i: t.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs
        .repartition(spark_para)  # rebalance BEFORE the ~650x fan-out
        .select("doc_id", F.posexplode(grams).alias("pos0", "gram"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )


def substring_span_pairs_df(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Core of substring_span_dups over an arbitrary (doc_id, text) frame
    (exposed for the overlapping-span edge tests and the stress probe's
    no-index baseline).  The gram frame feeds both join sides, so it is
    localCheckpointed once; the persistent-index path in
    substring_span_dups replaces this with the bucketed table."""
    pg = positional_gram_df(docs, k).localCheckpoint(eager=False)
    return positional_span_pairs(pg, k, span_col="span_chars")


def positional_span_pairs(
    pg: DataFrame, k: int, span_col: str = "span_chars"
) -> DataFrame:
    """Shared span-dedup core: positional gram index (doc_id, pos, gram)
    -> maximal repeated spans via gram equi-join + diagonal
    gaps-and-islands merge.  Unit-agnostic (char positions for
    substring_span_dups, token positions for token_span_dups -- the
    shared-machinery requirement of VERDICT round-4 task 5); ``pg`` must
    already be checkpointed by the caller so both join sides reuse one
    materialization, and the self-join pins shuffle_hash because
    checkpointed frames carry no stats (an SMJ would sort the full gram
    stream).
    """
    a, b = pg.alias("a"), pg.alias("b")
    m = a.join(
        b.hint("shuffle_hash"),
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = m.select(
        "doc_a",
        "doc_b",
        "diag",
        "pos_a",
        (F.col("pos_a") - F.row_number().over(w)).alias("island"),
    )
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("pos_a").cast("bigint").alias("start_a"),
            (F.min("pos_a") - F.first("diag")).cast("bigint").alias("start_b"),
            (F.max("pos_a") - F.min("pos_a") + k)
            .cast("bigint")
            .alias(span_col),
        )
        .select("doc_a", "doc_b", "start_a", "start_b", span_col)
    )


SIMHASH_BANDS, SIMHASH_BAND_BITS, SIMHASH_MAX_HAMMING = 4, 8, 3


@declared(
    "simhash_near_dup_pairs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS ({_GRAMS_SQL}),
    fp AS (
      SELECT doc_id,
             ('0x' || substring(md5(gram), 1, 8))::BIGINT AS tokint
      FROM tok
    ),
    votes AS (
      SELECT doc_id, {_SIMHASH_VOTE_COLS}
      FROM fp
      GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id, CAST({_SIMHASH_RECOMBINE} AS BIGINT) AS simhash
      FROM votes
    ),
    bands AS (
      SELECT doc_id, simhash, band,
             (simhash >> ({SIMHASH_BAND_BITS} * band))
               & {(1 << SIMHASH_BAND_BITS) - 1} AS bkey
      FROM sig, (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1}))
                 AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= {SIMHASH_MAX_HAMMING}
    """,
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5d: SimHash near-dup pairs at Hamming <= 3 via Manku-style band
    blocking (Manku et al., WWW 2007) -- the signature-space member of
    the near-dup family (MinHash banding finds Jaccard near-dups;
    this finds fingerprint near-dups without re-touching the text).

    The blocking is LOSSLESS for the declared predicate: 4 disjoint
    8-bit bands over the 32-bit signature mean any pair differing in
    <= 3 bits MUST agree exactly on at least one band (pigeonhole), so
    the banded equi-join + bit_count verify equals brute-force all-pairs
    -- the oracle is an equality, not a recall check.  Signatures ride
    the band rows, so candidate verification is bit_count(XOR) inline:
    ZERO joins back to the signature table.

    Scale: bucket population per band is n/2^band_bits; at 100 TB you
    widen the production knobs (64-bit signature, 4x16-bit bands per
    Manku) to keep buckets sparse -- same plan shape, declared here at
    the 32-bit/8-bit setting that matches `simhash_docs`.  The sig frame
    is checkpointed once (shared by all band rows); the self-join is
    shuffle-hash pinned (checkpointed inputs carry no stats, and both
    sides scale with the corpus -- never SMJ, never broadcast).
    """
    sig = simhash_docs(spark, sf_dir).localCheckpoint(eager=False)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.lit(j) for j in range(SIMHASH_BANDS)])
        ).alias("band"),
    ).withColumn(
        "bkey",
        F.expr(
            f"shiftright(simhash, {SIMHASH_BAND_BITS} * band)"
            f" & {(1 << SIMHASH_BAND_BITS) - 1}"
        ),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.expr("sig_a ^ sig_b")).cast("bigint")
    return cand.filter(hamming <= SIMHASH_MAX_HAMMING).select(
        "doc_a", "doc_b", hamming.alias("hamming")
    )


def simhash_wide_sig_df(corpus: DataFrame, bits: int = 60) -> DataFrame:
    """Production-width SimHash (default 60-bit): the scale knob the
    32-bit declared query documents.  Same bit-vote construction as
    `simhash_docs`, with the token fingerprint widened to bits/4 md5 hex
    chars (60 bits stays clear of BIGINT sign issues; Manku et al. use
    64).  Library path -- consumed by `simhash_wide_pairs_df`, the
    losslessness pytest, and the stress probe.  Computed IN-ROW like
    simhash_docs (round 11): no (doc, gram) explode, no 60-vote-column
    Exchange -- the signature is a per-row function of the gram set."""
    assert bits % 4 == 0 and bits <= 60
    fps_sql = (
        f"transform({_TOKSET_SQL}, g -> CAST(conv(substring(md5(g), 1, "
        f"{bits // 4}), 16, 10) AS BIGINT))"
    )
    fps = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).selectExpr("doc_id", f"{fps_sql} AS fps")
    return fps.selectExpr(
        "doc_id", f"{simhash_sig_expr(bits)} AS simhash"
    )


def simhash_wide_pairs_df(
    sig: DataFrame,
    bits: int = 60,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Banded Hamming-<=k blocking over an arbitrary-width signature
    frame -- the generic form of `simhash_near_dup_pairs`'s join.
    Lossless whenever max_hamming < n_bands (pigeonhole over disjoint
    equal-width bands).  At 60/4 the band key is 15 bits -> 32768
    buckets per band: expected bucket population n/32768 vs the 32-bit
    query's n/256 -- the 128x candidate-pair reduction that holds the
    join linear-ish at corpus scale (candidate pairs ~ n^2/2^band_bits).
    """
    assert max_hamming < n_bands and bits % n_bands == 0
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    sig = sig.localCheckpoint(eager=False)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(j) for j in range(n_bands)])).alias("band"),
    ).withColumn(
        "bkey", F.expr(f"shiftright(simhash, {band_bits} * band) & {mask}")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.expr("sig_a ^ sig_b")).cast("bigint")
    return cand.filter(hamming <= max_hamming).select(
        "doc_a", "doc_b", hamming.alias("hamming")
    )


@declared(
    "span_excision_stats",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    pg AS (
      SELECT doc_id, i.i AS pos,
             substring(t, CAST(i.i AS INT), {SPAN_K}) AS gram
      FROM (
        SELECT doc_id, trim(text) AS t,
               generate_series(1, greatest(length(trim(text)) - {SPAN_K - 1},
                                           0)) AS idxs
        FROM corpus
      ) g, unnest(idxs) AS i(i)
    ),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, a.pos - b.pos AS diag
      FROM pg a JOIN pg b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT doc_a, doc_b, diag, pos_a,
             pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                        ORDER BY pos_a) AS island
      FROM m
    ),
    spans AS (
      SELECT doc_a, doc_b,
             CAST(min(pos_a) - diag AS BIGINT) AS s,
             CAST(min(pos_a) - diag + max(pos_a) - min(pos_a)
                  + {SPAN_K} - 1 AS BIGINT) AS e
      FROM isl
      GROUP BY doc_a, doc_b, diag, island
    ),
    iv AS (SELECT DISTINCT doc_b AS doc_id, s, e FROM spans),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) >= s
                  THEN 0 ELSE 1 END AS new_grp
      FROM iv
    ),
    grouped AS (
      SELECT doc_id, s, e,
             sum(new_grp) OVER (PARTITION BY doc_id ORDER BY s, e
                                ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ),
    merged AS (
      SELECT doc_id, CAST(max(e) - min(s) + 1 AS BIGINT) AS len
      FROM grouped GROUP BY doc_id, grp
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_regions,
             CAST(sum(len) AS BIGINT) AS excisable_chars
      FROM merged GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_regions, p.excisable_chars,
           CAST(length(trim(c.text)) AS BIGINT) AS doc_chars,
           {ratio4_sql('p.excisable_chars', 'length(trim(c.text))')}
             AS excision_ratio
    FROM per_doc p JOIN corpus c ON c.doc_id = p.doc_id
    """,
)
def span_excision_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document excision report over the exact repeated spans: how
    many characters of each KEPT-LOWER duplicate's later copy are
    verbatim repeats of an earlier doc, as a merged interval UNION (no
    double counting when spans from different source docs overlap) --
    the actionable output of `substring_span_dups` (Lee et al. 2022
    excise-the-span policy needs exactly this union per doc).

    The pair spans project to [start_b, end_b] intervals on the
    higher-id doc; overlapping intervals merge with the classic
    running-max sweep (new region iff s > max(e) over all earlier
    intervals -- a ROWS-framed window, one shuffle on doc_id).  All
    integer arithmetic; the ratio is integer-space (ratio4).  Scale:
    interval count is bounded by true copied spans (the K=40 gram join
    property), so the per-doc sweep is tiny; the expensive stage remains
    the shared positional-gram join -- served from the SAME persistent
    bucketed index as substring_span_dups (round 7: the whole span family
    shares one write-once gram table).
    """
    pairs = substring_span_dups(spark, sf_dir)
    iv = pairs.select(
        F.col("doc_b").alias("doc_id"),
        F.col("start_b").alias("s"),
        (F.col("start_b") + F.col("span_chars") - 1).alias("e"),
    ).distinct()
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = iv.withColumn(
        "new_grp",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1),
    ).withColumn("grp", F.sum("new_grp").over(w_run))
    merged = grouped.groupBy("doc_id", "grp").agg(
        (F.max("e") - F.min("s") + 1).cast("bigint").alias("len")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_regions"),
        F.sum("len").cast("bigint").alias("excisable_chars"),
    )
    chars = dup_corpus(spark, sf_dir).select(
        "doc_id", F.length(F.trim("text")).cast("bigint").alias("doc_chars")
    )
    return per_doc.join(chars.hint("shuffle_hash"), "doc_id").select(
        "doc_id",
        "n_regions",
        "excisable_chars",
        "doc_chars",
        ratio4(F.col("excisable_chars"), F.col("doc_chars")).alias(
            "excision_ratio"
        ),
    )


_WIDE_BITS = 60
_WIDE_VOTE_COLS = ", ".join(
    f"sum(CASE WHEN (tokint >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
    for j in range(_WIDE_BITS)
)
_WIDE_RECOMBINE = " + ".join(
    f"CASE WHEN v{j} > 0 THEN ({1 << j}::BIGINT) ELSE 0::BIGINT END"
    for j in range(_WIDE_BITS)
)


@declared(
    "simhash_wide_near_dup_pairs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS ({_GRAMS_SQL}),
    fp AS (
      SELECT doc_id,
             ('0x' || substring(md5(gram), 1, {_WIDE_BITS // 4}))::BIGINT
               AS tokint
      FROM tok
    ),
    votes AS (
      SELECT doc_id, {_WIDE_VOTE_COLS}
      FROM fp
      GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id, CAST({_WIDE_RECOMBINE} AS BIGINT) AS simhash
      FROM votes
    ),
    bands AS (
      SELECT doc_id, simhash, band,
             (simhash >> (15 * band)) & 32767 AS bkey
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= 3
    """,
)
def simhash_wide_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5d-wide: the PRODUCTION-width SimHash near-dup join (60-bit
    signature, 4x15-bit bands, Hamming <= 3) as an oracle-checked
    declared query -- same lossless pigeonhole blocking as
    `simhash_near_dup_pairs`, with 32768 buckets per band instead of
    256: candidate pairs ~ n^2/2^band_bits, the 128x sparsity that keeps
    the self-join linear-ish at corpus scale (Manku et al., WWW 2007;
    60 bits rather than 64 keeps the md5-prefix fingerprint clear of
    BIGINT sign trouble on both engines).  The 32-bit sibling stays
    declared for parity with `simhash_docs`; this one is the setting a
    100 TB run ships with.  Plan identical: signature checkpointed once,
    signatures ride the band rows (zero verify-joins), shuffle-hash
    pinned self-join.
    """
    sig = simhash_wide_sig_df(dup_corpus(spark, sf_dir), bits=_WIDE_BITS)
    return simhash_wide_pairs_df(sig, bits=_WIDE_BITS, n_bands=4, max_hamming=3)


@declared(
    "fuzzy_levenshtein_join",
    oracle="""
    WITH cat AS (SELECT DISTINCT p_name AS name FROM part),
    probes AS (
      SELECT name AS src,
             substring(name, 1, 5) || substring(name, 7) AS probe
      FROM cat
    ),
    cand AS (
      SELECT p.src, p.probe, c.name,
             CAST(levenshtein(p.probe, c.name) AS INT) AS dist
      FROM probes p
      JOIN cat c ON substring(p.probe, 1, 3) = substring(c.name, 1, 3)
      WHERE levenshtein(p.probe, c.name) <= 2
    ),
    best AS (
      SELECT src, probe, name, dist,
             row_number() OVER (PARTITION BY src
                                ORDER BY dist, name) AS rk
      FROM cand
    )
    SELECT src, probe, name AS best_match, dist,
           name = src AS correct
    FROM best WHERE rk = 1
    """,
)
def fuzzy_levenshtein_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: a deterministically corrupted probe
    set (every distinct p_type with its 6th character deleted -- one
    planted typo each) is matched back to the clean catalog by
    Levenshtein distance <= 2, candidate pairs generated ONLY within
    3-char-prefix blocks, best match per probe by (distance, name).
    The scalable sibling of `token_edit_distance_pairs` (which runs
    unblocked on a small vocab dim): blocking makes the candidate set
    block-bounded instead of |probes| x |catalog|, the shape of a real
    entity-resolution pass over 100 TB of dirty names.  Planted ground
    truth makes every gate run a linkage-accuracy check (`correct` =
    did the typo resolve to its source type) -- the
    `minhash_estimator_calibration` discipline.

    Levenshtein is definitionally identical in both engines; prefix
    blocking is sound here because the deletion site (position 6) never
    touches the first 3 characters.  Best-match selection is
    total-ordered (dist, then name), so ties resolve identically.

    Cost: one part scan -> distinct type dim (localCheckpointed: probe
    derivation + catalog side), then a broadcast equi-join on the block
    key with per-pair edit distance only inside blocks.  At scale the
    block key stays an equi-join key (catalog side shuffles by prefix),
    and per-block cost is |block|^2 -- the knob is prefix length.
    """
    part = load_table(spark, sf_dir, "part")
    cat = (
        part.select(F.col("p_name").alias("name"))
        .distinct()
        .localCheckpoint(eager=True)  # probe derivation + catalog join side
    )
    probes = cat.select(
        F.col("name").alias("src"),
        F.concat(
            F.substring("name", 1, 5), F.expr("substring(name, 7)")
        ).alias("probe"),
    )
    cand = (
        probes.withColumn("blk", F.substring("probe", 1, 3))
        .join(
            F.broadcast(
                cat.select(
                    F.col("name"), F.substring("name", 1, 3).alias("blk")
                )
            ),
            "blk",
        )
        .withColumn("dist", F.levenshtein("probe", "name").cast("int"))
        .filter(F.col("dist") <= 2)
    )
    w = Window.partitionBy("src").orderBy("dist", "name")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "src",
            "probe",
            F.col("name").alias("best_match"),
            "dist",
            (F.col("name") == F.col("src")).alias("correct"),
        )
    )


TOK_SPAN_K = 8  # token-gram width: >= 8-token verbatim runs are spans
_TOK_LEADS = ", ".join(
    f"lead(tok,{j}) OVER w" for j in range(1, TOK_SPAN_K)
)


@declared(
    "token_span_dups",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (
      SELECT doc_id,
             unnest(generate_series(
               1, len(regexp_split_to_array(trim(text), '\\s+')))) AS pos,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM corpus
    ),
    grams AS (
      SELECT doc_id, pos,
             concat_ws(' ', tok, {_TOK_LEADS}) AS gram,
             lead(tok, {TOK_SPAN_K - 1}) OVER w AS t_last
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    pg AS (
      SELECT doc_id, pos, gram FROM grams WHERE t_last IS NOT NULL
    ),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, a.pos - b.pos AS diag
      FROM pg a JOIN pg b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT doc_a, doc_b, diag, pos_a,
             pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                        ORDER BY pos_a) AS island
      FROM m
    )
    SELECT doc_a, doc_b,
           CAST(min(pos_a) AS BIGINT) AS start_a,
           CAST(min(pos_a) - diag AS BIGINT) AS start_b,
           CAST(max(pos_a) - min(pos_a) + {TOK_SPAN_K} AS BIGINT)
             AS span_tokens
    FROM isl
    GROUP BY doc_a, doc_b, diag, island
    """,
)
def token_span_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9b: TOKEN-level exact substring-span dedup -- maximal verbatim
    runs of >= TOK_SPAN_K whitespace tokens repeated across documents,
    the production spelling of Lee et al. 2022's ExactSubstr (which
    operates on tokenizer ids with ~50-token spans; char-level
    substring_span_dups is the byte-exact sibling).  Span positions and
    lengths are reported in TOKENS.

    Same positional-index + diagonal-islands machinery
    (positional_span_pairs -- shared with the char version, pinned by the
    shared-machinery test in tests/test_round5_ops.py); only the gram
    unit changes: token k-grams are built with ONE window of k-1 leads
    over the exploded token stream (no per-row array slicing -- the
    window shuffles on doc_id once and the gram never re-touches the
    text).  At 100 TB, join on a 128-bit gram hash and substitute the
    real tokenizer's ids for whitespace tokens; cost stays bounded by
    true matches exactly as in the char version.

    Round 7: like the char sibling, the token-gram postings live in the
    PERSISTENT bucketBy(N, gram) index (plans/gram_index.py) -- written
    once, joined bucket-to-bucket with zero Exchange per query.
    """
    return positional_span_pairs(
        span_token_gram_index(spark, sf_dir),
        TOK_SPAN_K,
        span_col="span_tokens",
    )


def span_token_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent bucketBy(N, gram) positional token-8-gram postings over
    the dup corpus."""
    return ensure_bucketed_index(
        spark,
        sf_dir,
        "spantok",
        lambda s, d: token_positional_gram_df(dup_corpus(s, d), TOK_SPAN_K),
        ["gram"],
        version="v1",
    )


def token_positional_gram_df(docs: DataFrame, k: int) -> DataFrame:
    """Positional token k-gram postings: (doc_id, pos, gram), one row per
    token position with a full k-token window.  Shared by the ad-hoc path
    and the persistent bucketed index builder."""
    spark_para = docs.sparkSession.sparkContext.defaultParallelism
    tok = (
        docs.repartition(spark_para)  # rebalance BEFORE the ~56x fan-out
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "tok"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    return (
        tok.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", *leads).alias("gram"),
            F.lead("tok", k - 1).over(w).alias("t_last"),
        )
        .filter(F.col("t_last").isNotNull())
        .select("doc_id", "pos", "gram")
    )


def token_span_pairs_df(docs: DataFrame, k: int = TOK_SPAN_K) -> DataFrame:
    """Core of token_span_dups over an arbitrary (doc_id, text) frame
    (exposed for the shared-machinery edge tests)."""
    pg = token_positional_gram_df(docs, k).localCheckpoint(eager=False)
    return positional_span_pairs(pg, k, span_col="span_tokens")


WINNOW_K, WINNOW_W = 8, 4  # k-gram width, winnowing window (guarantee t=11)
_WIN_ENC = 1024  # pos-tiebreak encoding: doc gram streams stay < 1024 long


def _winnow_enc() -> F.Column:
    """Encoded rightmost-min key: h * _WIN_ENC + (_WIN_ENC - 1 - pos).

    The decode (fp = e DIV _WIN_ENC, fp_pos from e % _WIN_ENC) is only
    valid while pos < _WIN_ENC; a longer gram stream would silently
    decode fp as h-1 -- and because Spark and the DuckDB oracle corrupt
    IDENTICALLY, the gate could never catch it.  Guard loudly: any doc
    with >= _WIN_ENC grams raises at execution instead of mis-decoding
    (raise _WIN_ENC or pre-shard long documents to lift the limit).
    """
    return F.when(
        F.col("pos") < _WIN_ENC,
        F.col("h") * _WIN_ENC + (_WIN_ENC - 1 - F.col("pos")),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"winnowing: gram position >= _WIN_ENC ({_WIN_ENC}); "
                "position encoding would corrupt fingerprints"
            )
        )
    )


@declared(
    "winnowing_fingerprints",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    pg AS (
      SELECT doc_id, i.i AS pos,
             ('0x' || substring(md5(substring(t, CAST(i.i AS INT),
                                              {WINNOW_K})), 1, 8))::BIGINT
               AS h
      FROM (
        SELECT doc_id, trim(text) AS t,
               generate_series(1, greatest(length(trim(text))
                                           - {WINNOW_K - 1}, 0)) AS idxs
        FROM corpus
      ) g, unnest(idxs) AS i(i)
    ),
    enc AS (
      SELECT doc_id, pos,
             h * {_WIN_ENC} + ({_WIN_ENC - 1} - pos) AS e,
             count(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM pg
    ),
    sel AS (
      SELECT doc_id,
             min(e) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {WINNOW_W - 1} FOLLOWING) AS enc_min,
             pos, n_grams
      FROM enc
    ),
    fps AS (
      SELECT DISTINCT doc_id,
             enc_min // {_WIN_ENC} AS fp,
             {_WIN_ENC - 1} - (enc_min % {_WIN_ENC}) AS fp_pos
      FROM sel
      WHERE pos <= n_grams - {WINNOW_W - 1}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fps,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fps,
           CAST(min(fp_pos) AS BIGINT) AS first_pos,
           CAST(max(fp_pos) AS BIGINT) AS last_pos
    FROM fps GROUP BY doc_id
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003 --
    the MOSS algorithm): per document, hash every char k-gram, slide a
    w-wide window over the hash stream, keep each window's minimum
    (ties -> rightmost) -- a ~2/(w+1)-density fingerprint sample with
    the guarantee that any shared substring of length >= k + w - 1
    shares at least one selected fingerprint.  Reported per doc as a
    fingerprint-census summary (count / distinct / span); the pair
    detector is winnow_overlap_pairs.

    The rightmost-min tiebreak is ENCODED, not argmax'd: minimizing
    h * 1024 + (1023 - pos) picks the smallest hash and, on ties, the
    largest position -- one integer MIN over a row frame, identical on
    both engines (no argmin/arg_max cross-engine tie hazards).  Scale:
    the gram fan-out is the only volume (same posture as
    substring_span_dups); selection is a frame window inside the
    per-doc partition, and everything after operates on the ~25%
    surviving fingerprints.

    Round 7: the positional hash stream is a PERSISTENT
    bucketBy(N, doc_id).sortBy(doc_id, pos) table (plans/gram_index.py)
    -- the selection window's required distribution AND ordering come
    straight off the bucketed sorted scan, so the whole selection runs
    with zero Exchange and zero Sort, and the fan-out + md5 is paid
    once per corpus instead of per query.
    """
    return _winnow_census(
        winnow_select_fps_df(winnow_gram_index(spark, sf_dir))
    )


def winnow_gram_hash_df(docs: DataFrame) -> DataFrame:
    """Positional char-WINNOW_K-gram hash stream (doc_id, pos, h) --
    the winnow selection's input, shared by the ad-hoc path and the
    persistent index builder."""
    spark_para = docs.sparkSession.sparkContext.defaultParallelism
    t = F.trim("text")
    grams = F.when(
        F.length(t) >= WINNOW_K,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (WINNOW_K - 1)),
            lambda i: t.substr(i, F.lit(WINNOW_K)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.repartition(spark_para)
        .select("doc_id", F.posexplode(grams).alias("pos0", "gram"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
    )


def winnow_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent bucketBy(N, doc_id).sortBy(doc_id, pos) char winnow
    hash postings over the dup corpus: the per-doc selection windows
    read their distribution and ordering straight off the scan."""
    return ensure_bucketed_index(
        spark,
        sf_dir,
        "win8",
        lambda s, d: winnow_gram_hash_df(dup_corpus(s, d)),
        ["doc_id"],
        version="v1",
        sort_cols=["doc_id", "pos"],
    )


def winnow_select_fps_df(pg: DataFrame) -> DataFrame:
    """Winnowing selection over an arbitrary positional hash stream
    (doc_id, pos, h) with contiguous pos 1..n: encoded rightmost-min
    over a WINNOW_W-wide row frame, decoded to distinct
    (doc_id, fp, fp_pos).  Shared by the char and token units
    (winnowing_fingerprints / token_winnow_fingerprints) -- the
    machinery-sharing is pinned by tests/test_round6_ops.py."""
    wd = Window.partitionBy("doc_id")
    enc = pg.select(
        "doc_id",
        "pos",
        _winnow_enc().alias("e"),
        F.count(F.lit(1)).over(wd).alias("n_grams"),
    )
    wf = wd.orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    sel = enc.select(
        "doc_id",
        F.min("e").over(wf).alias("enc_min"),
        "pos",
        "n_grams",
    ).filter(F.col("pos") <= F.col("n_grams") - (WINNOW_W - 1))
    return sel.select(
        "doc_id",
        F.expr(f"enc_min DIV {_WIN_ENC}").alias("fp"),
        (F.lit(_WIN_ENC - 1) - F.col("enc_min") % _WIN_ENC).alias("fp_pos"),
    ).distinct()


def _winnow_census(fps: DataFrame) -> DataFrame:
    """Per-doc fingerprint census (count / distinct / position span)."""
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fps"),
        F.countDistinct("fp").cast("bigint").alias("n_distinct_fps"),
        F.min("fp_pos").cast("bigint").alias("first_pos"),
        F.max("fp_pos").cast("bigint").alias("last_pos"),
    )


# (WINNOW_PAIR_MIN / WINNOW_FP_DF_CAP live with the top-of-module LSH
# constants: gram_index_df_profile's oracle references the cap at module
# load, before this point in the file.)


@declared(
    "winnow_overlap_pairs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    pg AS (
      SELECT doc_id, i.i AS pos,
             ('0x' || substring(md5(substring(t, CAST(i.i AS INT),
                                              {WINNOW_K})), 1, 8))::BIGINT
               AS h
      FROM (
        SELECT doc_id, trim(text) AS t,
               generate_series(1, greatest(length(trim(text))
                                           - {WINNOW_K - 1}, 0)) AS idxs
        FROM corpus
      ) g, unnest(idxs) AS i(i)
    ),
    enc AS (
      SELECT doc_id, pos,
             h * {_WIN_ENC} + ({_WIN_ENC - 1} - pos) AS e,
             count(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM pg
    ),
    fps AS MATERIALIZED (
      SELECT DISTINCT doc_id, enc_min // {_WIN_ENC} AS fp
      FROM (
        SELECT doc_id, pos, n_grams,
               min(e) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {WINNOW_W - 1} FOLLOWING) AS enc_min
        FROM enc
      ) WHERE pos <= n_grams - {WINNOW_W - 1}
    ),
    fpd AS MATERIALIZED (
      SELECT doc_id, fp,
             count(*) OVER (PARTITION BY fp) AS df
      FROM fps
    ),
    rare AS MATERIALIZED (
      SELECT doc_id, fp FROM fpd WHERE df <= {WINNOW_FP_DF_CAP}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared_fps
    FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {WINNOW_PAIR_MIN}
    """,
)
def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap detection: document pairs sharing >=
    WINNOW_PAIR_MIN winnowing fingerprints -- the detector stage over
    winnowing_fingerprints' selection (any shared substring of length
    >= k + w - 1 = 11 chars is guaranteed to share a fingerprint, so
    the threshold counts guaranteed-distinct shared regions).

    Scale: this is the PAYOFF of winnowing vs the raw gram index --
    the pair join runs over the ~2/(w+1) selected sample instead of
    every gram (4x less join input at w=4, tunable), with identical
    blocking shape to ngram_jaccard_pairs (inverted index on the
    fingerprint, count per pair, threshold).  The fingerprint frame
    feeds both join sides: checkpointed once, shuffle-hash pinned.

    Hot-key protection: a fingerprint shared by d docs emits d^2 pair
    rows, and boilerplate-common fingerprints grow d linearly with the
    corpus -- the one O(df^2) scale-killer in the suite's gram joins.
    Fingerprints with document frequency > WINNOW_FP_DF_CAP are dropped
    BEFORE the join (one window count over the same fp shuffle the join
    needs anyway); high-df fingerprints carry no discriminative signal
    for the shared_fps >= {WINNOW_PAIR_MIN} threshold, and the cap
    bounds any single fingerprint's pair fan-out at CAP^2 regardless of
    corpus size.  Mirrored in the oracle (fpd/rare CTEs, materialized
    so DuckDB does not re-inline the document-scale chain per leg).
    """
    pg = winnow_gram_index(spark, sf_dir)
    wd = Window.partitionBy("doc_id")
    enc = pg.select(
        "doc_id",
        "pos",
        _winnow_enc().alias("e"),
        F.count(F.lit(1)).over(wd).alias("n_grams"),
    )
    wf = wd.orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    fps = (
        enc.select(
            "doc_id",
            "pos",
            "n_grams",
            F.min("e").over(wf).alias("enc_min"),
        )
        .filter(F.col("pos") <= F.col("n_grams") - (WINNOW_W - 1))
        .select("doc_id", F.expr(f"enc_min DIV {_WIN_ENC}").alias("fp"))
        .distinct()
    )
    # Hot-fingerprint cap: window df count rides the fp-hash shuffle the
    # self-join needs anyway; > CAP fingerprints never reach the join.
    fps = (
        fps.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .filter(F.col("df") <= WINNOW_FP_DF_CAP)
        .select("doc_id", "fp")
        .localCheckpoint(eager=False)  # feeds both sides of the pair join
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= WINNOW_PAIR_MIN)
    )


TOK_WINNOW_K = 5  # token-gram width for token-space winnowing
_TOKW_LEADS = ", ".join(
    f"lead(tok, {j}) OVER w" for j in range(1, TOK_WINNOW_K)
)


# Token-space winnowing selection as a reusable oracle CTE chain
# (corpus -> token stream -> k-token grams -> encoded rightmost-min
# selection -> distinct fps).  MATERIALIZED on the selection leg: the
# pair query below references it through two join legs, and DuckDB
# re-inlines (and re-evaluates) multiply-referenced fact-scale CTE
# chains otherwise (the ktruss trap pinned in CLAUDE.md).
_TOK_FPS_SQL = f"""
    tok AS (
      SELECT doc_id,
             unnest(generate_series(
               1, len(regexp_split_to_array(trim(text), '\\s+')))) AS pos,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM corpus
    ),
    grams AS (
      SELECT doc_id, pos,
             concat_ws(' ', tok, {_TOKW_LEADS}) AS gram,
             lead(tok, {TOK_WINNOW_K - 1}) OVER w AS t_last
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    pg AS (
      SELECT doc_id, pos,
             ('0x' || substring(md5(gram), 1, 8))::BIGINT AS h
      FROM grams WHERE t_last IS NOT NULL
    ),
    enc AS (
      SELECT doc_id, pos,
             h * {_WIN_ENC} + ({_WIN_ENC - 1} - pos) AS e,
             count(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM pg
    ),
    sel AS (
      SELECT doc_id,
             min(e) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {WINNOW_W - 1} FOLLOWING) AS enc_min,
             pos, n_grams
      FROM enc
    ),
    fps AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             enc_min // {_WIN_ENC} AS fp,
             {_WIN_ENC - 1} - (enc_min % {_WIN_ENC}) AS fp_pos
      FROM sel
      WHERE pos <= n_grams - {WINNOW_W - 1}
    )
"""


@declared(
    "token_winnow_fingerprints",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    {_TOK_FPS_SQL}
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fps,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fps,
           CAST(min(fp_pos) AS BIGINT) AS first_pos,
           CAST(max(fp_pos) AS BIGINT) AS last_pos
    FROM fps GROUP BY doc_id
    """,
)
def token_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-space winnowing -- the production unit of MOSS-style
    fingerprinting for LLM corpus dedup (Lee et al. 2022 operate on
    tokenizer ids, not characters): hash every TOK_WINNOW_K-token
    gram, slide the WINNOW_W window over the per-doc hash stream,
    keep each window's encoded rightmost minimum.  Guarantee in token
    units: any shared verbatim run of >= k + w - 1 = {TOK_WINNOW_K}
    + {WINNOW_W} - 1 = 8 tokens shares a selected fingerprint -- the
    same threshold token_span_dups detects exactly, so the sampled
    detector and the exact detector certify each other at the span
    boundary.  Positions are TOKEN positions.

    Composition, not duplication: the token-gram stream is the one
    window-of-leads build token_span_pairs_df uses (one doc_id shuffle,
    no array slicing), and the selection is the identical
    winnow_select_fps_df machinery behind winnowing_fingerprints --
    only the gram unit differs (shared-machinery pinned by
    tests/test_round6_ops.py).  Scale: token fan-out is ~8x smaller
    than char fan-out per doc; selection is a frame window inside the
    per-doc partition; output is the ~2/(w+1) sample.  At 100 TB,
    substitute real tokenizer ids for whitespace tokens and join
    downstream on the fingerprint exactly as winnow_overlap_pairs.

    Round 7: the token hash stream is a persistent
    bucketBy(N, doc_id).sortBy(doc_id, pos) table like the char unit's
    -- selection runs with zero Exchange / zero Sort off the scan.
    """
    return _winnow_census(
        winnow_select_fps_df(token_winnow_gram_index(spark, sf_dir))
    )


def token_winnow_gram_hash_df(
    docs: DataFrame, k: int = TOK_WINNOW_K
) -> DataFrame:
    """Positional token k-gram hash stream (doc_id, pos, h) -- the
    token winnow selection's input (the token_span_pairs_df
    window-of-leads build), shared by the ad-hoc path and the
    persistent index builder."""
    spark_para = docs.sparkSession.sparkContext.defaultParallelism
    tok = (
        docs.repartition(spark_para)  # rebalance BEFORE the token fan-out
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "tok"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    return (
        tok.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", *leads).alias("gram"),
            F.lead("tok", k - 1).over(w).alias("t_last"),
        )
        .filter(F.col("t_last").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
    )


def token_winnow_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent bucketBy(N, doc_id).sortBy(doc_id, pos) token winnow
    hash postings over the dup corpus."""
    return ensure_bucketed_index(
        spark,
        sf_dir,
        "wintok",
        lambda s, d: token_winnow_gram_hash_df(dup_corpus(s, d)),
        ["doc_id"],
        version="v1",
        sort_cols=["doc_id", "pos"],
    )


def token_winnow_fps_df(docs: DataFrame, k: int = TOK_WINNOW_K) -> DataFrame:
    """Core of token_winnow_fingerprints over an arbitrary
    (doc_id, text) frame: token-gram hash stream (the
    token_span_pairs_df window-of-leads build) -> winnow_select_fps_df
    selection.  Returns distinct (doc_id, fp, fp_pos) in token space
    (exposed for the span-boundary guarantee test)."""
    return winnow_select_fps_df(token_winnow_gram_hash_df(docs, k))


@declared(
    "token_winnow_overlap_pairs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    {_TOK_FPS_SQL},
    fpd AS MATERIALIZED (
      SELECT doc_id, fp,
             count(*) OVER (PARTITION BY fp) AS df
      FROM (SELECT DISTINCT doc_id, fp FROM fps)
    ),
    rare AS MATERIALIZED (
      SELECT doc_id, fp FROM fpd WHERE df <= {WINNOW_FP_DF_CAP}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared_fps
    FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {WINNOW_PAIR_MIN}
    """,
)
def token_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS overlap detection in TOKEN space -- the detector stage over
    token_winnow_fingerprints, closing the token unit's fingerprint ->
    pairs pipeline exactly as winnow_overlap_pairs closes the char
    unit's: document pairs sharing >= {WINNOW_PAIR_MIN} selected token
    fingerprints, each a guaranteed-distinct shared run of >= k + w - 1
    = 8 tokens.  This is the shape production near-dup sweeps run on
    tokenizer ids (Lee et al. 2022): the pair join consumes the
    ~2/(w+1) winnowed sample, never the raw gram stream.

    Scale discipline carried over verbatim from the char detector
    (dedup.py winnow_overlap_pairs -- the round-5 weak item): the
    fingerprint frame is df-capped at {WINNOW_FP_DF_CAP} docs BEFORE
    the self-join (one window count riding the fp shuffle the join
    needs anyway), bounding any fingerprint's pair fan-out at CAP^2
    regardless of corpus size; checkpointed once to feed both join
    sides, shuffle-hash pinned (no SMJ on the stat-less frame).  The
    oracle materializes the selection chain and both postings legs so
    DuckDB cannot re-inline the corpus-scale subquery per leg.
    """
    fps = (
        winnow_select_fps_df(token_winnow_gram_index(spark, sf_dir))
        .select("doc_id", "fp")
        .distinct()
    )
    fps = (
        fps.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .filter(F.col("df") <= WINNOW_FP_DF_CAP)
        .select("doc_id", "fp")
        .localCheckpoint(eager=False)  # feeds both sides of the pair join
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= WINNOW_PAIR_MIN)
    )


SNM_WINDOW = 2  # neighbors compared per sorted position
SNM_PREFIX = 24  # normalized-prefix length that makes a candidate pair


@declared(
    "sorted_neighborhood_pairs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    keyed AS (
      SELECT doc_id, lang,
             lower(trim(text)) AS norm,
             substring(lower(trim(text)), 1, 2) AS blk
      FROM corpus
    ),
    nbrs AS (
      SELECT doc_id, lang, norm, blk,
             lead(doc_id, 1) OVER w AS n1_id, lead(norm, 1) OVER w AS n1,
             lead(doc_id, 2) OVER w AS n2_id, lead(norm, 2) OVER w AS n2
      FROM keyed
      WINDOW w AS (PARTITION BY lang, blk ORDER BY norm, doc_id)
    ),
    cand AS (
      SELECT doc_id AS ia, n1_id AS ib, norm, n1 AS nb FROM nbrs
      WHERE n1_id IS NOT NULL
      UNION ALL
      SELECT doc_id AS ia, n2_id AS ib, norm, n2 AS nb FROM nbrs
      WHERE n2_id IS NOT NULL
    )
    SELECT least(ia, ib) AS doc_a, greatest(ia, ib) AS doc_b,
           (norm = nb) AS is_exact
    FROM cand
    WHERE substring(norm, 1, {SNM_PREFIX}) = substring(nb, 1, {SNM_PREFIX})
    """,
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup (Hernandez & Stolfo 1995): sort records
    by a normalized key inside coarse blocks, compare each record only
    to its next SNM_WINDOW sort neighbors, emit candidate pairs that
    share a {SNM_PREFIX}-char normalized prefix (flagging full-text
    equality) -- the third classical blocking family next to LSH
    banding (minhash/simhash) and inverted gram indexes: ZERO fan-out,
    one sort, window-bounded comparisons.

    Scale: the block key (lang, 2-char prefix) keeps every window
    partition a small slice of the corpus, so the sort is a partitioned
    shuffle, never global; at 100 TB you range-partition on the sort
    key with per-boundary overlap of SNM_WINDOW rows instead (same
    semantics, no block-key skew) and run several passes with rotated
    keys to catch prefix-divergent dups (the multi-pass SNM of the
    original paper; verbatim copies are caught in any pass).
    """
    corpus = dup_corpus(spark, sf_dir)
    norm = F.lower(F.trim("text"))
    keyed = corpus.select(
        "doc_id",
        "lang",
        norm.alias("norm"),
        F.substring(norm, 1, 2).alias("blk"),
    )
    w = Window.partitionBy("lang", "blk").orderBy("norm", "doc_id")
    nbrs = keyed.select(
        "doc_id",
        "norm",
        F.lead("doc_id", 1).over(w).alias("n1_id"),
        F.lead("norm", 1).over(w).alias("n1"),
        F.lead("doc_id", 2).over(w).alias("n2_id"),
        F.lead("norm", 2).over(w).alias("n2"),
    )
    cand = nbrs.filter(F.col("n1_id").isNotNull()).select(
        F.col("doc_id").alias("ia"),
        F.col("n1_id").alias("ib"),
        "norm",
        F.col("n1").alias("nb"),
    ).unionByName(
        nbrs.filter(F.col("n2_id").isNotNull()).select(
            F.col("doc_id").alias("ia"),
            F.col("n2_id").alias("ib"),
            "norm",
            F.col("n2").alias("nb"),
        )
    )
    return cand.filter(
        F.substring("norm", 1, SNM_PREFIX) == F.substring("nb", 1, SNM_PREFIX)
    ).select(
        F.least("ia", "ib").alias("doc_a"),
        F.greatest("ia", "ib").alias("doc_b"),
        (F.col("norm") == F.col("nb")).alias("is_exact"),
    )


def _snm_pass_sql(key: str, tag: str) -> str:
    """One sorted-neighborhood pass over `keyed` (doc_id, lang, norm)
    with sort key expression ``key``: window-bounded neighbor compares,
    {SNM_PREFIX}-char key-prefix agreement makes a candidate pair."""
    return f"""
      SELECT '{tag}' AS pass, least(ia, ib) AS doc_a,
             greatest(ia, ib) AS doc_b, (ka = kb) AS is_exact
      FROM (
        SELECT doc_id AS ia, n1_id AS ib, k AS ka, n1 AS kb FROM (
          SELECT doc_id, k,
                 lead(doc_id, 1) OVER w AS n1_id, lead(k, 1) OVER w AS n1,
                 lead(doc_id, 2) OVER w AS n2_id, lead(k, 2) OVER w AS n2
          FROM (SELECT doc_id, lang, {key} AS k FROM keyed)
          WINDOW w AS (PARTITION BY lang, substring(k, 1, 2)
                       ORDER BY k, doc_id)
        ) WHERE n1_id IS NOT NULL
        UNION ALL
        SELECT doc_id AS ia, n2_id AS ib, k AS ka, n2 AS kb FROM (
          SELECT doc_id, k,
                 lead(doc_id, 1) OVER w AS n1_id, lead(k, 1) OVER w AS n1,
                 lead(doc_id, 2) OVER w AS n2_id, lead(k, 2) OVER w AS n2
          FROM (SELECT doc_id, lang, {key} AS k FROM keyed)
          WINDOW w AS (PARTITION BY lang, substring(k, 1, 2)
                       ORDER BY k, doc_id)
        ) WHERE n2_id IS NOT NULL
      )
      WHERE substring(ka, 1, {SNM_PREFIX}) = substring(kb, 1, {SNM_PREFIX})
"""


@declared(
    "sorted_neighborhood_multipass",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    keyed AS MATERIALIZED (
      SELECT doc_id, lang, lower(trim(text)) AS norm FROM corpus
    ),
    p1 AS ({_snm_pass_sql('norm', 'fwd')}),
    p2 AS ({_snm_pass_sql('reverse(norm)', 'rev')})
    SELECT doc_a, doc_b,
           CAST(count(DISTINCT pass) AS BIGINT) AS n_passes,
           bool_or(is_exact) AS is_exact
    FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
    GROUP BY doc_a, doc_b
    """,
)
def sorted_neighborhood_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood dedup -- the rotated-key passes the
    original method (Hernandez & Stolfo 1995) prescribes and
    sorted_neighborhood_pairs only documents: pass 1 sorts on the
    normalized text (catches prefix-agreeing near-dups), pass 2 sorts
    on the REVERSED key (suffix agreement -- the prefix-divergent dups
    pass 1 is structurally blind to), and a pair's evidence is the
    number of passes that surfaced it.  Verbatim copies surface in
    every pass; a pair found by both is as strong as SNM evidence gets.

    Each pass is the identical zero-fan-out shape: one partitioned sort
    per (lang, 2-char block of that pass's key), SNM_WINDOW lead
    compares, {SNM_PREFIX}-char key-prefix filter.  The passes are
    independent shuffles over the same corpus frame (checkpointed once,
    scanned per pass -- P sorts for P passes, never a pair join), and
    the final merge groups the tiny candidate stream.  reverse() is
    portable here because the corpus is ASCII; a unicode corpus would
    rotate on a codepoint-safe key instead (DuckDB reverses grapheme
    clusters, Spark reverses code units).  At 100 TB: range-partition
    each pass on its own key with SNM_WINDOW-row boundary overlap, same
    semantics, no block-key skew.
    """
    return snm_multipass_pairs_df(dup_corpus(spark, sf_dir))


def snm_multipass_pairs_df(docs: DataFrame) -> DataFrame:
    """Core of sorted_neighborhood_multipass over an arbitrary
    (doc_id, lang, text) frame (exposed for the planted
    prefix-divergent-pair edge test in tests/test_round6_ops.py)."""
    norm = F.lower(F.trim("text"))
    keyed = docs.select(
        "doc_id", "lang", norm.alias("norm")
    ).localCheckpoint(eager=False)  # one synthesis, P pass scans

    def one_pass(key: F.Column, tag: str) -> DataFrame:
        kd = keyed.select("doc_id", "lang", key.alias("k"))
        w = Window.partitionBy("lang", F.substring("k", 1, 2)).orderBy(
            "k", "doc_id"
        )
        nbrs = kd.select(
            "doc_id",
            "k",
            F.lead("doc_id", 1).over(w).alias("n1_id"),
            F.lead("k", 1).over(w).alias("n1"),
            F.lead("doc_id", 2).over(w).alias("n2_id"),
            F.lead("k", 2).over(w).alias("n2"),
        )
        cand = nbrs.filter(F.col("n1_id").isNotNull()).select(
            F.col("doc_id").alias("ia"),
            F.col("n1_id").alias("ib"),
            F.col("k").alias("ka"),
            F.col("n1").alias("kb"),
        ).unionByName(
            nbrs.filter(F.col("n2_id").isNotNull()).select(
                F.col("doc_id").alias("ia"),
                F.col("n2_id").alias("ib"),
                F.col("k").alias("ka"),
                F.col("n2").alias("kb"),
            )
        )
        return cand.filter(
            F.substring("ka", 1, SNM_PREFIX)
            == F.substring("kb", 1, SNM_PREFIX)
        ).select(
            F.lit(tag).alias("pass"),
            F.least("ia", "ib").alias("doc_a"),
            F.greatest("ia", "ib").alias("doc_b"),
            (F.col("ka") == F.col("kb")).alias("is_exact"),
        )

    both = one_pass(F.col("norm"), "fwd").unionByName(
        one_pass(F.reverse(F.col("norm")), "rev")
    )
    return both.groupBy("doc_a", "doc_b").agg(
        F.count_distinct("pass").cast("bigint").alias("n_passes"),
        F.expr("bool_or(is_exact)").alias("is_exact"),
    )


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity join (PPJoin-style, round 7b)
# ---------------------------------------------------------------------------

# Jaccard threshold for the prefix-filtered join, as an exact rational
# (tau = PF_TAU_NUM / PF_TAU_DEN = 0.8): the threshold compare is integer
# (PF_TAU_DEN * inter >= PF_TAU_NUM * union), never a float boundary.
PF_TAU_NUM, PF_TAU_DEN = 4, 5


@declared(
    "prefix_filter_jaccard_pairs",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    toksets AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS toks
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM corpus)
      WHERE len(t) >= 3
    ),
    exploded AS MATERIALIZED (
      SELECT doc_id, s.sh FROM toksets, unnest(toks) AS s(sh)
    ),
    dfc AS MATERIALIZED (
      SELECT sh, CAST(count(*) AS BIGINT) AS df FROM exploded GROUP BY sh
    ),
    ranked AS MATERIALIZED (
      SELECT e.doc_id, e.sh,
             row_number() OVER (PARTITION BY e.doc_id
                                ORDER BY d.df, e.sh) AS rn,
             len(t.toks) AS n
      FROM exploded e
      JOIN dfc d ON d.sh = e.sh
      JOIN toksets t ON t.doc_id = e.doc_id
    ),
    prefix AS MATERIALIZED (
      SELECT doc_id, sh FROM ranked
      WHERE rn <= n - (({PF_TAU_NUM} * n + {PF_TAU_DEN} - 1) // {PF_TAU_DEN}) + 1
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, n_inter, n_union,
           n_inter * 1.0 / n_union AS jaccard
    FROM (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(ta.toks, tb.toks)) AS BIGINT)
               AS n_inter,
             CAST(len(ta.toks) + len(tb.toks)
                  - len(list_intersect(ta.toks, tb.toks)) AS BIGINT)
               AS n_union
      FROM cand c
      JOIN toksets ta ON ta.doc_id = c.doc_a
      JOIN toksets tb ON tb.doc_id = c.doc_b
    )
    WHERE {PF_TAU_DEN} * n_inter >= {PF_TAU_NUM} * n_union
    """,
)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity join with LOSSLESS prefix filtering (the
    PPJoin/AllPairs candidate rule, Xiao et al. 2008 / Bayardo et al.
    2007): order each doc's distinct token-3-gram shingles by ascending
    global document frequency (rarest first, ties lexicographic) and
    join only the first |T| - ceil(tau*|T|) + 1 of them -- any pair with
    Jaccard >= tau MUST share a prefix shingle under a common total
    order, so unlike MinHash banding (`minhash_near_dup_pairs`,
    probabilistic) or the df-cap (`winnow_overlap_pairs`, truncating)
    this prune is exact: candidates then verify with exact Jaccard and
    the result equals the all-pairs answer at a fraction of the join
    volume.  The third candidate-generation paradigm the dedup family
    lacked (banding, inverted-index + df-cap, and now prefix filtering).

    Scale: the prefix join's volume is sum(df_prefix^2) over RARE
    shingles only -- the frequent-shingle quadratic blowup that kills a
    naive inverted-index join is excluded by construction, which is why
    production set-similarity joins at corpus scale use exactly this
    rule.  df is shingle-vocabulary-bounded (broadcast); the verify join
    touches candidates only.  tau = {PF_TAU_NUM}/{PF_TAU_DEN} held as an
    integer cross-multiply, jaccard emitted as one bigint/bigint IEEE
    division.  Corpus: documents + planted exact (+1M) and near (+2M,
    ' zzextra') dups, the `dup_corpus` fixture every dedup op shares.
    """
    return prefix_filter_pairs_df(spark, dup_corpus(spark, sf_dir))


def prefix_filter_pairs_df(spark: SparkSession, corpus: DataFrame) -> DataFrame:
    """Core of prefix_filter_jaccard_pairs over an arbitrary (doc_id,
    text) frame -- exposed for the tools/stress.py scale-slope probe."""
    t = F.split(F.trim("text"), " ")
    sh_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i),
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
            ),
        )
    )
    toksets = (
        corpus.repartition(spark.sparkContext.defaultParallelism)
        .filter(F.size(t) >= 3)
        .select("doc_id", sh_arr.alias("toks"))
        .localCheckpoint(eager=True)
    )
    # The exploded view is a PURE PROJECTION off the tokset checkpoint:
    # derive it in-row per consumer (the round-10 minhash discipline)
    # instead of materializing a second, shingle-scaled checkpoint --
    # round 10 measured the exploded localCheckpoint as one whole extra
    # blocking job plus the widest frame in the query written twice.
    exploded = toksets.select(
        "doc_id", F.size("toks").alias("n"), F.explode("toks").alias("sh")
    )
    dfc = exploded.groupBy("sh").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("sh"))
    # Consumed under TWO join aliases below (a and b) -- without the
    # checkpoint each alias recomputes the bcast-join + window subtree
    # (the CLAUDE.md 2+-consumer rule; measured 232 s -> 42 s at x10
    # under a 48 g heap in tools/stress.py before this landed).
    prefix = (
        exploded.join(F.broadcast(dfc), "sh")
        .withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            <= F.expr(
                f"n - (({PF_TAU_NUM} * n + {PF_TAU_DEN} - 1) "
                f"DIV {PF_TAU_DEN}) + 1"
            )
        )
        .select("doc_id", "sh")
        .localCheckpoint(eager=True)
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ta = toksets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    tb = toksets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("bigint")
    union = (F.size("ta") + F.size("tb")).cast("bigint") - inter
    return (
        cand.hint("shuffle_hash")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("n_inter"),
            union.alias("n_union"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(PF_TAU_DEN * F.col("n_inter") >= PF_TAU_NUM * F.col("n_union"))
    )


# ---------------------------------------------------------------------------
# Content-defined chunking dedup estimator (round 7b)
# ---------------------------------------------------------------------------

# A chunk boundary triggers after position p when the 8-gram ENDING at p
# fingerprints to 0 mod CDC_DIVISOR: expected chunk length ~64 chars, the
# rsync/LBFS content-defined-chunking rule (boundaries move WITH content,
# so an insertion only reshapes its local chunk, never the whole file).
CDC_DIVISOR = 64


@declared(
    "chunk_dedup_stats",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    pre AS (
      SELECT doc_id, trim(text) AS t, length(trim(text)) AS n
      FROM corpus WHERE length(trim(text)) >= 1
    ),
    bpos AS (
      SELECT doc_id, t, n,
             list_filter(
               generate_series(8, greatest(n, 8)),
               p -> p < n AND ('0x' || substring(
                      md5(substring(t, CAST(p - 7 AS INT), 8)), 1, 8))::BIGINT
                      % {CDC_DIVISOR} = 0) AS bs
      FROM pre
    ),
    spans AS (
      SELECT doc_id, t,
             list_prepend(1, list_transform(bs, p -> p + 1)) AS starts,
             list_append(bs, n) AS ends
      FROM bpos
    ),
    chunks AS MATERIALIZED (
      SELECT doc_id, r.ch AS ch
      FROM (
        SELECT doc_id,
               list_transform(
                 generate_series(1, len(starts)),
                 i -> substring(t, CAST(starts[i] AS INT),
                                CAST(ends[i] - starts[i] + 1 AS INT))) AS cs
        FROM spans
      ), unnest(cs) AS r(ch)
    ),
    per_chunk AS (
      SELECT md5(ch) AS h, CAST(count(*) AS BIGINT) AS cnt,
             CAST(min(length(ch)) AS BIGINT) AS clen
      FROM chunks GROUP BY md5(ch)
    )
    SELECT CAST((SELECT count(*) FROM pre) AS BIGINT) AS n_docs,
           CAST(sum(cnt) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           CAST(sum(cnt * clen) AS BIGINT) AS total_bytes,
           CAST(sum(clen) AS BIGINT) AS unique_bytes,
           CAST(((sum(cnt * clen) - sum(clen)) * 1000000)
                // sum(cnt * clen) AS BIGINT) AS dedup_ppm,
           CAST(sum(cnt * clen) // sum(cnt) AS BIGINT) AS avg_chunk_len
    FROM per_chunk
    """,
)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/backup-dedup rule) over
    the corpus, with the storage-dedup estimate: cut each document where
    the rolling 8-gram fingerprint hits 0 mod {CDC_DIVISOR} (expected
    ~{CDC_DIVISOR}-char chunks whose boundaries move WITH the content --
    an edit reshapes only its local chunk, unlike fixed-width blocks
    where one insertion shifts every later block), hash every chunk, and
    report how many bytes chunk-level dedup would reclaim.  The
    CHUNK-granular tier of the dedup family: `dedup_exact_docs` is
    whole-doc, `substring_span_dups` is span-level match-finding; this
    is the storage estimator a lakehouse capacity plan reads.

    Plan: boundaries and chunk substrings are pure per-row array
    transforms (zero shuffle), the only aggregation is the chunk-hash
    groupBy (map-side combinable, chunk-cardinality-bounded) and a 1-row
    rollup; identical md5-prefix trigger and full-md5 chunk identity on
    both engines.  Corpus: `dup_corpus` (planted exact dups guarantee
    reclaimable mass; CDC finds the shared-prefix chunks of the near
    dups too)."""
    corpus = dup_corpus(spark, sf_dir)
    t = F.trim("text")
    n = F.length(t)
    bs = F.filter(
        F.sequence(F.lit(8), F.greatest(n, F.lit(8))),
        lambda p: (p < n)
        & (token_fingerprint(t.substr(p - 7, F.lit(8))) % CDC_DIVISOR == 0),
    )
    pre = (
        # ~200 md5 evaluations per row: repartition the narrow scan FIRST
        # so the boundary hunt runs corpus-wide parallel (the CLAUDE.md
        # fan-out discipline; 7.8 -> ~2 s at sf0.1).
        corpus.repartition(spark.sparkContext.defaultParallelism)
        .filter(n >= 1)
        .select("doc_id", t.alias("t"), n.alias("n"), bs.alias("bs"))
    )
    spans = pre.select(
        "doc_id",
        "t",
        F.concat(F.array(F.lit(1)), F.transform("bs", lambda p: p + 1)).alias(
            "starts"
        ),
        F.concat(F.col("bs"), F.array(F.col("n"))).alias("ends"),
    )
    chunks = spans.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("starts")),
                lambda i: F.expr("t").substr(
                    F.element_at(F.col("starts"), i),
                    F.element_at(F.col("ends"), i)
                    - F.element_at(F.col("starts"), i)
                    + 1,
                ),
            )
        ).alias("ch"),
    )
    per_chunk = chunks.groupBy(F.md5(F.col("ch").cast("binary")).alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.min(F.length("ch")).cast("bigint").alias("clen"),
    )
    n_docs = corpus.filter(n >= 1).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        per_chunk.agg(
            F.sum("cnt").cast("bigint").alias("n_chunks"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chunks"),
            F.sum(F.col("cnt") * F.col("clen")).cast("bigint").alias(
                "total_bytes"
            ),
            F.sum("clen").cast("bigint").alias("unique_bytes"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "n_docs",
            "n_chunks",
            "n_distinct_chunks",
            "total_bytes",
            "unique_bytes",
            F.expr(
                "CAST(((total_bytes - unique_bytes) * 1000000)"
                " DIV total_bytes AS BIGINT)"
            ).alias("dedup_ppm"),
            F.expr("CAST(total_bytes DIV n_chunks AS BIGINT)").alias(
                "avg_chunk_len"
            ),
        )
    )
