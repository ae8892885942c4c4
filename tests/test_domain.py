

def test_filings_parquet_matches_python_fixture():
    """tests/fixtures/filings.parquet is the DuckDB-readable twin of
    build_filings() (it powers the phrase_catalog/ner_orgs oracles since
    r8) — any drift between the two would silently test different rows."""
    import pyarrow.parquet as pq

    from fixtures.filings import build_filings

    tbl = pq.read_table("tests/fixtures/filings.parquet").to_pylist()
    assert tbl == build_filings()
