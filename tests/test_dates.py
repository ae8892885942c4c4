"""date_window edge semantics (SURVEY §7.4 risk 2): the reference rolls
invalid days to day 1 (and month+1 on the upper bound) instead of
clamping like add_months. Cases from FIXTURES.md §3."""

import datetime

import pytest
from pyspark.sql import functions as F

from mergeextractor_spark.functions.dates import date_window_lb, date_window_ub


def reference_window(date_str: str, margin: int):
    """Direct reimplementation of the documented semantics
    (CrawlerSupport.py:30-83) in plain datetime, used as the test oracle."""
    d = datetime.datetime.strptime(date_str, "%m/%d/%Y")
    lb_m, lb_y = d.month - margin, d.year
    if lb_m <= 0:
        lb_m += 12
        lb_y -= 1
    try:
        lb = d.replace(year=lb_y, month=lb_m)
    except ValueError:
        lb = d.replace(year=lb_y, month=lb_m, day=1)
    lb = max(lb, datetime.datetime(2001, 1, 1))
    ub_m, ub_y = d.month + margin, d.year
    if ub_m > 12:
        ub_m -= 12
        ub_y += 1
    try:
        ub = d.replace(year=ub_y, month=ub_m)
    except ValueError:
        ub = d.replace(year=ub_y, month=ub_m + 1, day=1)
    return lb.date(), ub.date()


CASES = [
    "1/15/2001",   # LB clamps to the 2001-01-01 floor
    "2/28/2001",
    "10/31/2001",  # ±4 → Feb 31 → UB rolls to Mar 1; LB Jun 31 → day-1 fallback
    "11/5/2000",   # year wrap both directions + floor
    "12/30/2004",  # UB Apr 30 valid; LB Aug 30 valid
    "12/31/2003",  # LB Aug 31 valid; UB Apr 31 → May 1 roll
    "3/31/2002",   # LB Nov 31 → day-1 fallback; UB Jul 31 valid
    "2/29/2004",   # leap day; LB Oct 29; UB Jun 29
    "5/31/2002",   # LB Jan 31; UB Sep 31 → Oct 1 roll
]


@pytest.mark.parametrize("date_str", CASES)
@pytest.mark.parametrize("margin", [2, 4])
def test_date_window_matches_reference_semantics(spark, date_str, margin):
    df = spark.createDataFrame([(date_str,)], "d string").select(
        F.to_date("d", "M/d/yyyy").alias("d")
    )
    row = df.select(
        date_window_lb(F.col("d"), margin).alias("lb"),
        date_window_ub(F.col("d"), margin).alias("ub"),
    ).collect()[0]
    exp_lb, exp_ub = reference_window(date_str, margin)
    assert row.lb == exp_lb, f"{date_str} ±{margin}: lb {row.lb} != {exp_lb}"
    assert row.ub == exp_ub, f"{date_str} ±{margin}: ub {row.ub} != {exp_ub}"
