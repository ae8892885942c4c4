import pytest
from pyspark.sql import functions as F

from mergeextractor_spark.operators.llm import INITIATION_TYPES
from mergeextractor_spark.plans.filing_pipeline import (
    crawler_pipeline,
    identifier_pipeline,
    separator_pipeline,
)


@pytest.fixture(scope="module")
def crawler_out(spark, deals_df, filings_df):
    return crawler_pipeline(deals_df, filings_df).cache()


def test_crawler_accepts_expected_deals(crawler_out):
    accepted = {r.main_index for r in crawler_out.select("main_index").collect()}
    # 0 plain, 1 parens+TOC, 2 hyphen-retry, 3 bare Background, 5 abbreviation
    assert accepted == {0, 1, 2, 3, 5}


def test_crawler_output_schema(crawler_out):
    assert crawler_out.columns == [
        "main_index",
        "announcement_date",
        "tmanames",
        "amanames",
        "url",
    ]


def test_crawler_anti_join_skips_done(spark, deals_df, filings_df, crawler_out):
    done = spark.createDataFrame([(0,), (1,)], "main_index long")
    out = crawler_pipeline(deals_df, filings_df, done=done)
    accepted = {r.main_index for r in out.select("main_index").collect()}
    assert accepted == {2, 3, 5}


@pytest.fixture(scope="module")
def sections(spark, filings_df):
    return separator_pipeline(filings_df).cache()


def test_separator_extracts_sections(sections):
    idx = {r.main_index for r in sections.select("main_index").collect()}
    assert idx == {0, 1, 2, 3, 5}


def test_separator_header_prefix(sections):
    row = sections.filter(F.col("main_index") == 0).collect()[0]
    assert row.content.startswith(
        "The following provides details about the events leading up to the "
        "merger deal between Alpha Data Systems Inc & Beta Merge Corp:"
    )
    assert "Background of the Merger" in row.content


def test_separator_abbreviation_enrichment(sections):
    row = sections.filter(F.col("main_index") == 5).collect()[0]
    assert "abbreviation definitions" in row.content
    assert "Quantum Group" in row.content
    # the defining paragraph itself is included
    assert "Delaware corporation" in row.content


def test_separator_line_dedup(sections):
    # the overlapping-chunk assembly must not repeat the filler sentence
    row = sections.filter(F.col("main_index") == 0).collect()[0]
    filler = "Certain statements in this document constitute forward-looking"
    lines = [ln.strip() for ln in row.content.splitlines() if filler in ln]
    assert len(lines) == len(set(lines))


def test_identifier_typed_output(sections):
    out = identifier_pipeline(sections)
    rows = {r.main_index: r for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3, 5}
    for r in rows.values():
        assert r.type_of_initiation in INITIATION_TYPES
    assert rows[0].initiator == "Beta Merge Corp"
    assert rows[0].date_of_initiation == "March 5, 2002"
    assert "expand the combined market reach" in rows[0].reason
