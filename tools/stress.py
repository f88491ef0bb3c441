"""Stress probe: run the headline operators on 10x/100x-unioned inputs
(x100: ~60M lineitem rows / ~10M events) to check the scale slope -- a
linear-ish slope confirms no hidden quadratic or driver-side bottleneck.

Usage: python tools/stress.py [multiplier]   # default 10; 100 = x100 run
The headline shapes (grouped agg, window dedup, top-k, span-dedup gram
join) run at every decade up to the multiplier; the SimHash band-width
comparison stays capped at x10 because the NARROW 32-bit setting is
intentionally quadratic-tailed (that is what the probe demonstrates) and
x100 would make its candidate join the probe's own bottleneck."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_rf_matrix_controller_spark.plans.conventions import exact_avg, exact_sum  # noqa: E402
from etl_rf_matrix_controller_spark.session import get_spark  # noqa: E402
from etl_rf_matrix_controller_spark.sources.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 10
# every decade up to MULT: 10 -> (1, 10); 100 -> (1, 10, 100)
MULTS = [m for m in (1, 10, 100) if m <= max(MULT, 1)]
if MULT not in MULTS:
    MULTS.append(MULT)


def amplify(df, mult: int):
    """mult-x the row count by unioning verbatim copies.  NB: group keys
    are NOT perturbed -- per-group row counts grow mult-x (deeper window
    partitions), group cardinality stays fixed; the probe measures the
    data-volume slope, not a key-cardinality slope."""
    out = df
    for i in range(1, mult):
        out = out.unionByName(df)
    return out


def main() -> None:
    # Partition count must scale with the decade: at x100 the span-dedup
    # gram join shuffles ~325M rows, and 32 static partitions put ~10M
    # rows in every shuffled-hash build side -- SparkOutOfMemoryError
    # ("not enough memory to build hash map"), the exact failure CLAUDE.md's
    # "size shuffle partitions so partitions fit in executor memory" rule
    # exists to prevent.  4 partitions per multiplier keeps the per-build
    # volume constant across decades (a 1000-executor cluster gets this
    # from AQE target-size splitting; local[32] needs it set statically).
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name="stress", shuffle_partitions=max(32, 4 * MULT)
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, SF_DIR, "lineitem")
    ev = load_table(spark, SF_DIR, "events")
    li.count()

    cases = {
        "q1_agg": lambda d: d.groupBy("l_returnflag", "l_linestatus").agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            exact_avg(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        ),
        "latest_state": lambda d: d.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ),
        ).filter(F.col("rn") == 1),
        "topk": lambda d: d.groupBy("user_id")
        .agg(exact_sum(F.col("value")).alias("tv"))
        .orderBy(F.desc("tv"), F.asc("user_id"))
        .limit(10),
    }
    for name, fn in cases.items():
        src = li if name == "q1_agg" else ev
        for mult in MULTS:
            data = amplify(src, mult)
            t0 = time.perf_counter()
            fn(data).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            rows = {"q1_agg": 600_000, "latest_state": 100_000, "topk": 100_000}[
                name
            ] * mult
            print(
                f"{name} x{mult}: {dt:.2f}s (~{rows/1e6:.1f}M rows, "
                f"{rows/dt/1e6:.1f}M rows/s)"
            )

    # Substring-span dedup slope.  Copies are ALPHABET-ROTATED, not
    # verbatim: verbatim clones would make every copy pair a true
    # full-length match (output genuinely quadratic in mult -- an
    # output-size property, not a cost bug), while rotation keeps the
    # cross-copy gram overlap at zero so the probe isolates the
    # index-build volume slope (gram explode + bucket join).
    from etl_rf_matrix_controller_spark.operators.dedup import (
        substring_span_pairs_df,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    n_docs = docs.count()

    def amplify_docs(mult: int):
        parts = []
        for i in range(mult):
            # Distinct substitution per copy even past 26: rotate by
            # i %% 26, then reverse the first (i // 26 + 1) letters of the
            # rotated alphabet for higher blocks -- 104 distinct
            # permutations, so cross-copy gram overlap stays zero at x100
            # (two copies sharing a permutation would be verbatim clones
            # and the TRUE-match output would go quadratic by design).
            rot = alpha[i % 26:] + alpha[:i % 26]
            b = i // 26
            if b:
                rot = rot[:b + 1][::-1] + rot[b + 1:]
            parts.append(
                docs.select(
                    (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                    F.translate("text", alpha, rot).alias("text"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    for mult in MULTS:
        t0 = time.perf_counter()
        substring_span_pairs_df(amplify_docs(mult)).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        grams = n_docs * mult * 650  # ~len-39 grams per doc
        print(
            f"span_dedup x{mult}: {dt:.2f}s (~{grams/1e6:.1f}M grams, "
            f"{grams/dt/1e6:.1f}M grams/s)"
        )

    # SimHash banded blocking: the band-width knob.  Candidate pairs per
    # band grow ~n^2/2^band_bits, so the 32-bit query's 8-bit bands go
    # quadratic-tailed as n grows while the production 60-bit/15-bit
    # setting stays sparse (simhash_wide_pairs_df docstring).  Measure
    # both on the same rotation-amplified corpus: the wide setting's
    # candidate count should collapse vs the narrow one.
    from etl_rf_matrix_controller_spark.operators.dedup import (
        simhash_wide_pairs_df,
        simhash_wide_sig_df,
    )

    for mult in (1, min(MULT, 10)):
        corpus = amplify_docs(mult)
        for bits, n_bands in ((32, 4), (60, 4)):
            sig = simhash_wide_sig_df(corpus, bits=bits).localCheckpoint(
                eager=True
            )
            t0 = time.perf_counter()
            n_pairs = simhash_wide_pairs_df(
                sig, bits=bits, n_bands=n_bands
            ).count()
            dt = time.perf_counter() - t0
            print(
                f"simhash_pairs x{mult} {bits}b/{bits // n_bands}b-bands: "
                f"{dt:.2f}s, {n_pairs} pairs at ham<=3"
            )
    spark.stop()


if __name__ == "__main__":
    main()
