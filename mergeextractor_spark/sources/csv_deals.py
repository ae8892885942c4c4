"""Header-less positional CSV scan for the deals table (SURVEY §2.1
scan_csv_deals; ref config.py:22-27 reads columns 1-3 of a ~160-column
SDC-style CSV by position, with row position as the implicit key).

Spark has no stable row order, so the row-position identity must be made
explicit: the fixture CSV carries the index in column 0 (the reference CSV
also has the deal number in column 0). Column pruning works even on the
wide CSV because we declare only the leading columns and Spark's CSV
reader tolerates extra columns per line (mode=PERMISSIVE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RAW = T.StructType(
    [
        T.StructField("_c0", T.LongType()),
        T.StructField("_c1", T.StringType()),
        T.StructField("_c2", T.StringType()),
        T.StructField("_c3", T.StringType()),
    ]
)


def scan_csv_deals(spark: SparkSession, path: str) -> DataFrame:
    """CSV → typed deals DataFrame (main_index, announcement_date,
    company_a, company_b)."""
    raw = spark.read.csv(path, header=False, schema=_RAW, mode="PERMISSIVE")
    return raw.select(
        F.col("_c0").alias("main_index"),
        F.col("_c1").alias("announcement_date"),
        F.col("_c2").alias("company_a"),
        F.col("_c3").alias("company_b"),
    )
