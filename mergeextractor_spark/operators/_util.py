"""Shared helpers for registered queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def r4(c: Column) -> Column:
    """Round to 4 decimals, bit-identical to DuckDB's ``round(x, 4)``.

    DuckDB rounds doubles by scaling (std::round(x·1e4)/1e4, half away from
    zero, with the scaling's fp error); Spark's round() uses the exact
    BigDecimal expansion — the two disagree on values like 59.867549999...96
    (true decimal ...55). We reproduce DuckDB's algorithm with native
    expressions so both engines emit the same bits (verified over 120k
    derived values in tools/selfcheck.py development).
    """
    cd = c.cast("double")
    mag = F.floor(F.abs(cd) * 10000.0 + 0.5) / 10000.0
    return F.signum(cd) * mag


def date_str(c: Column) -> Column:
    """Emit dates as ISO strings on both sides (oracle uses strftime)."""
    return F.date_format(c, "yyyy-MM-dd")


def ts_str(c: Column) -> Column:
    """Emit timestamps as 'yyyy-MM-dd HH:mm:ss' strings on both sides."""
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
