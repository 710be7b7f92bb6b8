"""Scalar expression library — native Spark expressions only.

Each helper mirrors a hand-rolled Python transform in the reference
(SURVEY §2.7) as a JVM-side, codegen-friendly Column expression; none
of these drop to Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column | str, precision: int = 28, scale: int = 2) -> Column:
    """Exact sum of a fixed-point-valued double column, as double.

    Summing doubles is order-dependent (partition/merge order changes the
    last bits), which makes cross-engine comparison flaky. Routing the
    sum through decimal arithmetic makes it exact and deterministic for
    inputs with ≤ ``scale`` fractional digits, at identical JVM cost
    (decimal sum is still a single partial+final hash aggregate).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dec_avg(col: Column | str, round_to: int = 4, scale: int = 2) -> Column:
    """Deterministic half-up mean, EXACT to ``round_to`` decimals.

    ``round(sum/count, n)`` on doubles is not engine-portable: Spark
    rounds the shortest decimal rendering of the quotient while DuckDB
    rounds the binary value, and they disagree when the true quotient
    lands on a half-ulp boundary (e.g. 35.18825 → .1883 vs .1882 —
    observed at sf0.1). Instead compute ``floor((2·10ⁿ·Σ + N) / 2N)``
    in exact integer arithmetic (the half-up rounding identity for
    positive sums) and divide the resulting integer by 10ⁿ; the same
    integer divided by the same power of ten is the same double in
    every engine. Requires ``round_to ≥ scale`` so the scaled sum is
    integral. For Column inputs (no SQL name to splice) the legacy
    rounded-double form is kept — callers comparing against an oracle
    pass column names."""
    if isinstance(col, str):
        p = 10**round_to
        num = (
            f"CAST(sum(CAST({col} AS DECIMAL(28,{scale}))) * {2 * p} AS BIGINT)"
            f" + count({col})"
        )
        return F.expr(f"({num}) div (2 * count({col}))").cast("double") / F.lit(
            float(p)
        )
    return F.round(dec_sum(col, scale=scale) / F.count(col), round_to)


def safe_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """Guarded division — the reference's ``errors/calls if calls else 0``
    pattern (neptune_etl_deepflow.py:511)."""
    return F.when(den != 0, num / den).otherwise(F.lit(default))


def ipv4_to_string(col: Column | str) -> Column:
    """uint32 → dotted-quad, the ClickHouse ``IPv4NumToString`` the
    reference leans on (neptune_etl_deepflow.py:144,225,634). Pure
    bit-arithmetic expression — no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    octets = [F.shiftright(c.cast("bigint"), n).bitwiseAND(F.lit(255)) for n in (24, 16, 8, 0)]
    return F.concat_ws(".", *[o.cast("string") for o in octets])


def sanitize_str(col: Column | str, max_len: int = 256) -> Column:
    """Escape single quotes and truncate — ``safe_str``
    (neptune_etl_aws.py:182-183, neptune_etl_deepflow.py:446-447)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.regexp_replace(c, "'", r"\\'"), 1, max_len)


def split_part(col: Column | str, sep: str, index: int) -> Column:
    """n-th segment of a separator-split string (negative = from end) —
    the queue-URL / ARN suffix extraction family
    (neptune_etl_aws.py:652,1790-1797; neptune_etl_cfn.py:460-463)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, sep), index)


def register_sql_functions(spark) -> None:
    """Expose the scalar library to the pure-SQL surface as SQL UDFs
    (``CREATE FUNCTION … RETURN <expr>`` — expression-bodied, so they
    inline into Catalyst and stay in codegen; nothing here drops to
    Python). A spark.sql user gets the same function names the
    DataFrame API exposes."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION ipv4_to_string(ip BIGINT)
        RETURNS STRING
        RETURN concat_ws('.', CAST(shiftright(ip, 24) & 255 AS STRING),
                              CAST(shiftright(ip, 16) & 255 AS STRING),
                              CAST(shiftright(ip, 8) & 255 AS STRING),
                              CAST(ip & 255 AS STRING))
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION sanitize_str(s STRING, max_len INT)
        RETURNS STRING
        -- chr(92) = backslash: avoids double-unescaping of string
        -- literals when the SQL-UDF body text is re-parsed.
        RETURN substring(replace(s, "'", concat(chr(92), "'")), 1, max_len)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION safe_div(num DOUBLE, den DOUBLE)
        RETURNS DOUBLE
        RETURN CASE WHEN den != 0 THEN num / den ELSE 0.0 END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION split_part_at(s STRING, sep STRING, idx INT)
        RETURNS STRING
        RETURN element_at(split(s, sep), idx)
        """
    )
