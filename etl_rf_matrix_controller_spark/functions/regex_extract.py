"""Regex frame parsing, JSON property extraction, and regex predicates.

Reference semantics: every telemetry response is a semi-structured ASCII
frame parsed by regex -- status ``{BASTATUS,...}`` (etl_controller.py:616),
chassis ``{BAcC,...}`` with temps scaled /10 and 5-digit fan pulse counts
(etl_controller.py:742-795), device info ``{BBI,...}`` (:466); config JSON
round-trips string-keyed dicts (:341-342).  Input validation is regex +
range checks (IP octets, :1508-1514).

Spark re-expression: ``regexp_extract`` group pulls, ``get_json_object``,
``rlike`` predicates -- all whole-stage-codegen projections/filters with
pushdown-friendly shapes (a rlike filter on a scanned column prunes rows
before any shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

# Chassis frame shape distilled from _parse_chassis_status
# (etl_controller.py:741-795): two temps (tenths of degC, sign-prefixed),
# one 5-digit fan pulse count, one door flag char.
_FRAME_RE = r"^\{BAcC,\+(\d{3}),\+(\d{3}),(\d{5}),([OC])\}$"


@declared(
    "chassis_regex_extract",
    oracle=r"""
    WITH frames AS (
      SELECT s_suppkey,
             printf('{BAcC,+%03d,+%03d,%05d,%s}',
                    200 + (s_suppkey * 17) % 400,
                    150 + (s_suppkey * 31) % 450,
                    10000 + (s_suppkey * 997) % 20000,
                    CASE WHEN s_suppkey % 2 = 0 THEN 'O' ELSE 'C' END) AS frame
      FROM supplier
    )
    SELECT s_suppkey,
           frame,
           CAST(regexp_extract(frame,
             '^\{BAcC,\+([0-9]{3}),\+([0-9]{3}),([0-9]{5}),([OC])\}$', 1)
             AS INT) / 10.0 AS temp_a_c,
           CAST(regexp_extract(frame,
             '^\{BAcC,\+([0-9]{3}),\+([0-9]{3}),([0-9]{5}),([OC])\}$', 2)
             AS INT) / 10.0 AS temp_b_c,
           CAST(regexp_extract(frame,
             '^\{BAcC,\+([0-9]{3}),\+([0-9]{3}),([0-9]{5}),([OC])\}$', 3)
             AS INT) AS fan_pulses,
           regexp_extract(frame,
             '^\{BAcC,\+([0-9]{3}),\+([0-9]{3}),([0-9]{5}),([OC])\}$', 4) = 'O'
             AS door_open
    FROM frames
    """,
)
def chassis_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F10/S3: synthesize chassis frames, then regex-parse them back.

    Round-trip proves the parse: frame fields are derived deterministically
    from supplier keys, formatted into the reference's frame shape, then
    re-extracted with the same group semantics the reference uses
    (temps /10 degC :758-759, 5-digit pulses :767-770, door char :787-788).
    """
    sup = load_table(spark, sf_dir, "supplier")
    frames = sup.select(
        "s_suppkey",
        F.format_string(
            "{BAcC,+%03d,+%03d,%05d,%s}",
            (F.lit(200) + (F.col("s_suppkey") * 17) % 400).cast("int"),
            (F.lit(150) + (F.col("s_suppkey") * 31) % 450).cast("int"),
            (F.lit(10000) + (F.col("s_suppkey") * 997) % 20000).cast("int"),
            F.when(F.col("s_suppkey") % 2 == 0, "O").otherwise("C"),
        ).alias("frame"),
    )
    g = lambda i: F.regexp_extract("frame", _FRAME_RE, i)  # noqa: E731
    return frames.select(
        "s_suppkey",
        "frame",
        (g(1).cast("int") / 10.0).alias("temp_a_c"),
        (g(2).cast("int") / 10.0).alias("temp_b_c"),
        g(3).cast("int").alias("fan_pulses"),
        (g(4) == "O").alias("door_open"),
    )


@declared(
    "props_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11/S3: JSON property extraction with int re-cast.

    Mirrors the string-keyed JSON config round-trip
    (etl_controller.py:341-342, 355): pull a typed value out of a JSON
    string column.  ``get_json_object`` stays JVM-side; no UDF.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.filter(k.isNotNull()).select(
        "event_id",
        k.alias("k_value"),
        (k % 10).alias("k_bucket"),
    )


@declared(
    "status_frame_parse",
    oracle=r"""
    WITH frames AS (
      SELECT s_suppkey AS frame_id,
             '{BASTATUS,' ||
             CAST((s_suppkey * 7) % 16 AS VARCHAR) || ',' ||
             CAST((s_suppkey * 11) % 16 AS VARCHAR) || ',' ||
             CASE WHEN s_suppkey % 3 = 0 THEN 'x'
                  ELSE CAST((s_suppkey * 13) % 16 AS VARCHAR) END || ',' ||
             CAST((s_suppkey * 17) % 16 AS VARCHAR) || '}' AS frame
      FROM supplier
    ),
    parts AS (
      SELECT frame_id,
             string_split(regexp_extract(frame, '\{BASTATUS,(.*)\}', 1), ',')
               AS pl
      FROM frames
    ),
    indexed AS (
      SELECT frame_id, CAST(i AS INT) AS idx,
             list_extract(pl, CAST(i AS INT)) AS part
      FROM parts, unnest(generate_series(1, len(pl))) g(i)
    )
    SELECT frame_id,
           idx AS output_id,
           CAST(part AS INT) AS input_id
    FROM indexed
    WHERE regexp_matches(part, '^[0-9]+$')
    """,
)
def status_frame_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/P3: full-state status frame -> route rows.

    Mirrors ``_parse_status`` (etl_controller.py:615-623): split the
    ``{BASTATUS,...}`` payload, keep digit-only parts (:621), and use the
    1-based position as the output id (:619-622) -- non-digit slots (the
    'x' every third frame here) are skipped WITHOUT shifting later
    positions, exactly like the reference's enumerate.  posexplode is the
    Spark ordinality primitive (DuckDB lacks WITH ORDINALITY; the oracle
    indexes the split list instead).
    """
    sup = load_table(spark, sf_dir, "supplier")
    frames = sup.select(
        F.col("s_suppkey").alias("frame_id"),
        F.concat(
            F.lit("{BASTATUS,"),
            ((F.col("s_suppkey") * 7) % 16).cast("string"),
            F.lit(","),
            ((F.col("s_suppkey") * 11) % 16).cast("string"),
            F.lit(","),
            F.when(F.col("s_suppkey") % 3 == 0, "x").otherwise(
                ((F.col("s_suppkey") * 13) % 16).cast("string")
            ),
            F.lit(","),
            ((F.col("s_suppkey") * 17) % 16).cast("string"),
            F.lit("}"),
        ).alias("frame"),
    )
    parts = frames.select(
        "frame_id",
        F.posexplode(
            F.split(F.regexp_extract("frame", r"\{BASTATUS,(.*)\}", 1), ",")
        ).alias("pos", "part"),
    )
    return parts.filter(F.col("part").rlike("^[0-9]+$")).select(
        "frame_id",
        (F.col("pos") + 1).alias("output_id"),
        F.col("part").cast("int").alias("input_id"),
    )


@declared(
    "ip_valid_check",
    oracle=r"""
    WITH ips AS (
      SELECT s_suppkey,
             printf('%d.%d.%d.%d',
                    (s_suppkey * 37) % 300,
                    (s_suppkey * 53) % 256,
                    (s_suppkey * 71) % 300,
                    (s_suppkey * 89) % 256) AS ip
      FROM supplier
    )
    SELECT s_suppkey, ip,
           regexp_matches(ip, '^([0-9]{1,3}\.){3}[0-9]{1,3}$')
             AND len(list_filter(string_split(ip, '.'),
                                 o -> CAST(o AS INT) <= 255)) = 4
             AS is_valid
    FROM ips
    """,
)
def ip_valid_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: IP validation -- format regex + octet range check via the
    ``forall`` higher-order predicate (etl_controller.py:1508-1514:
    ``^(\\d{1,3}\\.){3}\\d{1,3}$`` then per-octet <= 255).  Addresses are
    synthesized from supplier keys; the % 300 octets produce genuine
    invalid cases.  Pure projection."""
    sup = load_table(spark, sf_dir, "supplier")
    ips = sup.select(
        "s_suppkey",
        F.format_string(
            "%d.%d.%d.%d",
            ((F.col("s_suppkey") * 37) % 300).cast("int"),
            ((F.col("s_suppkey") * 53) % 256).cast("int"),
            ((F.col("s_suppkey") * 71) % 300).cast("int"),
            ((F.col("s_suppkey") * 89) % 256).cast("int"),
        ).alias("ip"),
    )
    valid = F.col("ip").rlike(r"^(\d{1,3}\.){3}\d{1,3}$") & F.forall(
        F.split(F.col("ip"), r"\."), lambda o: o.cast("int") <= 255
    )
    return ips.select("s_suppkey", "ip", valid.alias("is_valid"))


@declared(
    "doc_token_match",
    oracle=r"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE regexp_matches(text, '\bspark\b.*\bvector\b')
      AND lang IN ('en', 'fr')
    """,
)
def doc_token_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: regex predicate parity (word-boundary + ordering constraint).

    Mirrors the validation-gate pattern (IP regex etl_controller.py:
    1508-1514; digit gates :621): a rlike filter composed with a membership
    predicate.  Catalyst pushes the IN down to the scan and short-circuits
    the regex; the filter runs before anything shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        F.col("text").rlike(r"\bspark\b.*\bvector\b")
        & F.col("lang").isin("en", "fr")
    ).select("doc_id", "lang", "source")
