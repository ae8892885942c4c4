"""Date-window arithmetic with the reference's exact overflow semantics.

Reference: ``src/crawler/CrawlerSupport.py:30-83`` (get_date_constraints).
Semantics (margin m months, differs from Spark's ``add_months`` clamping):
  * lower bound: month - m (wrap year); if the original day does not exist
    in the target month, fall back to day 1 of that SAME month; floor the
    result at 2001-01-01.
  * upper bound: month + m (wrap year); if the original day does not exist
    in the target month, roll to day 1 of the NEXT month
    (CrawlerSupport.py:78-81).

Everything is native Column expressions — no UDF — so it stays inside
whole-stage codegen and pushes through Catalyst untouched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FLOOR_DATE = "2001-01-01"  # "Database beginning date", CrawlerSupport.py:47


def _shifted(year: Column, month: Column, day: Column, overflow_next_month: bool) -> Column:
    """make_date(year, month, day) honoring the reference day-overflow rule."""
    first = F.make_date(year, month, F.lit(1))
    days_in_month = F.dayofmonth(F.last_day(first))
    if overflow_next_month:
        overflow = F.make_date(year, month + 1, F.lit(1))
    else:
        overflow = first
    return F.when(day > days_in_month, overflow).otherwise(F.make_date(year, month, day))


def date_window_lb(d: Column, margin: int) -> Column:
    """Lower bound of the search window (reference CrawlerSupport.py:50-66)."""
    day, mon, yr = F.dayofmonth(d), F.month(d), F.year(d)
    raw = mon - F.lit(margin)
    lb_mon = F.when(raw <= 0, raw + 12).otherwise(raw)
    lb_yr = F.when(raw <= 0, yr - 1).otherwise(yr)
    lb = _shifted(lb_yr, lb_mon, day, overflow_next_month=False)
    return F.greatest(lb, F.lit(FLOOR_DATE).cast("date"))


def date_window_ub(d: Column, margin: int) -> Column:
    """Upper bound of the search window (reference CrawlerSupport.py:69-81)."""
    day, mon, yr = F.dayofmonth(d), F.month(d), F.year(d)
    raw = mon + F.lit(margin)
    ub_mon = F.when(raw > 12, raw - 12).otherwise(raw)
    ub_yr = F.when(raw > 12, yr + 1).otherwise(yr)
    return _shifted(ub_yr, ub_mon, day, overflow_next_month=True)


def duckdb_date_window_sql(date_expr: str, margin: int) -> tuple[str, str]:
    """DuckDB CASE-WHEN mirror of (lb, ub) for the correctness oracle."""
    m = margin
    lb_mon = f"(CASE WHEN month({date_expr}) - {m} <= 0 THEN month({date_expr}) - {m} + 12 ELSE month({date_expr}) - {m} END)"
    lb_yr = f"(CASE WHEN month({date_expr}) - {m} <= 0 THEN year({date_expr}) - 1 ELSE year({date_expr}) END)"
    ub_mon = f"(CASE WHEN month({date_expr}) + {m} > 12 THEN month({date_expr}) + {m} - 12 ELSE month({date_expr}) + {m} END)"
    ub_yr = f"(CASE WHEN month({date_expr}) + {m} > 12 THEN year({date_expr}) + 1 ELSE year({date_expr}) END)"

    def dim(y: str, mo: str) -> str:
        return f"day(last_day(make_date({y}, {mo}, 1)))"

    lb = (
        f"greatest(CASE WHEN day({date_expr}) > {dim(lb_yr, lb_mon)} "
        f"THEN make_date({lb_yr}, {lb_mon}, 1) "
        f"ELSE make_date({lb_yr}, {lb_mon}, day({date_expr})) END, DATE '2001-01-01')"
    )
    ub = (
        f"CASE WHEN day({date_expr}) > {dim(ub_yr, ub_mon)} "
        f"THEN make_date({ub_yr}, {ub_mon} + 1, 1) "
        f"ELSE make_date({ub_yr}, {ub_mon}, day({date_expr})) END"
    )
    return lb, ub
