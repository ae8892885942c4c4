"""Exact-named parity keys for the remaining SURVEY §2 inventory rows, so
every operator key in the survey maps 1:1 to a registered query:

  §2.1 source_http_fts, source_http_doc (offline injected fetcher),
       sink_csv_append, sink_csv_union, sink_kv_store, scan_kv_store,
       sink_fs_dump  (side-effecting → write-then-read-back, rows-only)
  §2.2 filter_exists_skip
  §2.7 str_regex_extract_cik, str_lstrip_zeros, str_build_url,
       str_drop_pagenums, str_collapse_newlines, str_strip_toc,
       str_html_to_text_v2
  §2.8 phrase_catalog, ner_orgs
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import strings as S
from ..registry import register
from ._util import golden_path, scratch_dir, t

# ---------------------------------------------------------------------------
# §2.1 sources / sinks

_REPO_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_DEALS_CSV_PATH = os.path.join(_REPO_DIR, "tests", "fixtures", "deals.csv")
_FILINGS_PQ_PATH = os.path.join(_REPO_DIR, "tests", "fixtures", "filings.parquet")


@register(
    "source_http_fts",
    # r10 graduation: the injected fetcher is a pure function of the URL,
    # so DuckDB recomputes the fetched+parsed rows from the nation table
    # directly — the hash row proves the token-bucket mapInPandas stage
    # and the from_json parse deliver exactly the per-URL responses.
    oracle="""
    SELECT 'https://example.invalid/search?q=' || replace(n_name, ' ', '%20') AS url,
           CAST(200 AS INTEGER) AS status,
           CAST(length(replace(n_name, ' ', '%20')) AS BIGINT) AS total_value,
           '0001-01-000001' AS adsh
    FROM nation
    """,
    doc="Rate-limited full-text-search source stage (ref "
    "CrawlerSupport.py:116-132): EDGAR query-param URLs built natively "
    "(pushdown-by-construction, O1), fetched via the token-bucket "
    "mapInPandas stage with an injected offline fetcher that serves the "
    "fixture JSON shape. No network.",
)
def source_http_fts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from ..sources.http import fetch_stage

    deals = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("main_index"),
        F.concat(
            F.lit("https://example.invalid/search?q="),
            S.urlencode_spaces(F.col("n_name")),
        ).alias("url"),
    )

    def fake_fetch(url: str):
        name = url.split("q=")[-1]
        return 200, json.dumps(
            {"hits": {"total": {"value": len(name)}, "hits": [{"_source": {"ciks": ["0001"], "adsh": "0001-01-000001"}}]}}
        )

    fetched = fetch_stage(deals, global_rate=1000.0, fetcher=fake_fetch)
    parsed = F.from_json(
        F.col("body"),
        "struct<hits:struct<total:struct<value:bigint>,hits:array<struct<_source:struct<ciks:array<string>,adsh:string>>>>>",
    )
    return fetched.select(
        "url",
        "status",
        parsed["hits"]["total"]["value"].alias("total_value"),
        F.element_at(parsed["hits"]["hits"], 1)["_source"]["adsh"].alias("adsh"),
    )


@register(
    "source_http_doc",
    # r10 graduation: injected fetcher = pure function of the URL, so
    # DuckDB recomputes (url, status, body_len) from the region table.
    oracle="""
    WITH u AS (
      SELECT 'https://www.sec.gov/Archives/edgar/data/'
             || CAST(r_regionkey AS VARCHAR) || '/'
             || replace('000000' || CAST(r_regionkey AS VARCHAR)
                        || '-01-00000' || CAST(r_regionkey AS VARCHAR), '-', '')
             || '/' || '000000' || CAST(r_regionkey AS VARCHAR)
             || '-01-00000' || CAST(r_regionkey AS VARCHAR) || '.txt' AS url
      FROM region
    )
    SELECT url, CAST(200 AS INTEGER) AS status,
           CAST(length('<html><body><p>Filing body for ' || url
                       || '</p></body></html>') AS BIGINT) AS body_len
    FROM u
    """,
    doc="Rate-limited document fetch stage (ref Processor.py:66-93): URL "
    "construction (str_build_url) + token-bucket fetch with an injected "
    "offline fetcher returning synthetic filing bodies.",
)
def source_http_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.http import fetch_stage

    urls = t(spark, sf_dir, "region").select(
        S.build_filing_url(
            F.col("r_regionkey").cast("string"),
            F.concat(F.lit("000000"), F.col("r_regionkey").cast("string"), F.lit("-01-00000"), F.col("r_regionkey").cast("string")),
        ).alias("url")
    )

    def fake_fetch(url: str):
        return 200, f"<html><body><p>Filing body for {url}</p></body></html>"

    fetched = fetch_stage(urls, global_rate=1000.0, fetcher=fake_fetch)
    return fetched.select(
        "url", "status", F.length("body").cast("long").alias("body_len")
    )


@register(
    "source_pyds_fts",
    # r10 graduation: the default synthetic fetcher is a pure md5
    # function of (query, page, idx), so DuckDB recomputes every row the
    # partition-per-page-slice reader must emit — the hash row proves
    # the DataSource protocol (partition planning, per-slice reads,
    # ragged tails) delivers exactly the per-page rows.
    oracle="""
    WITH g AS (
      SELECT p.page, i.idx,
             md5('background of the merger|' || CAST(p.page AS VARCHAR)
                 || '|' || CAST(i.idx AS VARCHAR)) AS h
      FROM (SELECT unnest(generate_series(0, 5)) AS page) p
      CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS idx) i
    )
    SELECT CAST(page AS BIGINT) AS page, CAST(idx AS BIGINT) AS idx,
           'https://example.test/filings/' || h[1:12] || '.htm' AS doc_url,
           'filing ' || h[1:8] AS title,
           '... background of the merger excerpt ' || h[9:16] || ' ...' AS snippet
    FROM g
    """,
    doc="Paged FTS ingestion as a Spark 4 PYTHON DATA SOURCE "
    "(sources/fts_datasource.py): spark.read.format('fts_pages') plans "
    "one input partition per page slice, so crawl pagination fans out "
    "across executors with scheduler-owned retries instead of a "
    "driver-side loop — the DataFrame-native form of the reference's "
    "FTS pager (ref CrawlerSupport.py:116-132). Per-partition token "
    "bucket at global-rate/slices, injectable fetcher resolved lazily "
    "on the executor; the default synthesizes deterministic rows so "
    "nothing touches the network.",
)
def source_pyds_fts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.fts_datasource import register_fts_datasource

    register_fts_datasource(spark)
    return (
        spark.read.format("fts_pages")
        .option("pages", "6")
        .option("pagesize", "20")
        .option("slices", "3")
        .option("rate", "1000")
        .option("query", "background of the merger")
        .load()
    )


@register(
    "sink_csv_append",
    # r10 graduation: the write->read-back roundtrip must reproduce the
    # source deals exactly, which DuckDB reads directly from the same CSV.
    oracle=f"""
    SELECT main_index, company_a
    FROM read_csv('{_DEALS_CSV_PATH}', header=false,
                  columns={{'main_index': 'BIGINT', 'announcement_date': 'VARCHAR',
                            'company_a': 'VARCHAR', 'company_b': 'VARCHAR'}})
    """,
    doc="Ordered CSV sink with header (output.csv semantics, ref "
    "CrawlerHandler.py:21-49): write via sink_csv_ordered, read back typed.",
    eager=True,  # construction writes to the scratch store
)
def sink_csv_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.csv_deals import scan_csv_deals
    from ..sources.sinks import sink_csv_ordered
    from .domain_queries import _DEALS_CSV

    path = os.path.join(scratch_dir("csvq_"), "out")
    sink_csv_ordered(scan_csv_deals(spark, _DEALS_CSV), path)
    back = spark.read.option("header", True).csv(path)
    return back.select(F.col("main_index").cast("long").alias("main_index"), "company_a")


@register(
    "sink_csv_union",
    # r10 graduation: the identifier pipeline's expected output is the
    # llm_extract_initiator golden table (sequential mirror), and the CSV
    # roundtrip must preserve it — incl. the NULL enum column (written
    # empty, read back NULL).
    oracle=f"""
    SELECT main_index, initiator, type_of_initiation
    FROM read_parquet('{golden_path("llm_extract_initiator")}')
    """,
    doc="Identifier-results CSV sink (outputUnion.csv semantics, ref "
    "InitiatorIdentifier.py:26-50): identifier pipeline → ordered CSV → "
    "read back.",
    eager=True,  # construction writes to the scratch store
)
def sink_csv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.filing_pipeline import identifier_pipeline
    from ..sources.sinks import sink_csv_ordered
    from .domain_queries import _sections_df

    out = identifier_pipeline(_sections_df(spark))
    path = os.path.join(scratch_dir("csvu_"), "union")
    sink_csv_ordered(out, path)
    back = spark.read.option("header", True).csv(path)
    return back.select(
        F.col("main_index").cast("long").alias("main_index"),
        "initiator",
        "type_of_initiation",
    )


@register(
    "sink_kv_store",
    # r10 graduation: the filing fixture ships as parquet, so DuckDB
    # recomputes the expected store — every filing under the
    # main_index // 100 bucketing rule — and the hash row proves the
    # partitioned write+read roundtrip preserves values.
    oracle=f"""
    SELECT main_index, CAST(floor(main_index / 100) AS INTEGER) AS bucket,
           CAST(length(content) AS BIGINT) AS content_len
    FROM read_parquet('{_FILINGS_PQ_PATH}')
    """,
    doc="Bucketed keyed store write → full read-back (ref Mongo inserts "
    "Processor.py:288-297 et al.; partitionBy('bucket') parquet).",
    eager=True,  # construction writes to the scratch store
)
def sink_kv_store_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import sink_kv_store
    from .domain_queries import _filings_df

    path = os.path.join(scratch_dir("kvs_"), "store")
    sink_kv_store(_filings_df(spark), path, mode="overwrite")
    back = spark.read.parquet(path)
    return back.select("main_index", "bucket", F.length("content").cast("long").alias("content_len"))


@register(
    "scan_kv_store",
    # r10 graduation: DuckDB recomputes the expected point-lookup row
    # (key 411 = filing 3 under the *137 rekey) from the filing fixture.
    oracle=f"""
    SELECT main_index * 137 AS main_index, company_a,
           CAST(floor((main_index * 137) / 100) AS INTEGER) AS bucket
    FROM read_parquet('{_FILINGS_PQ_PATH}')
    WHERE main_index * 137 = 411
    """,
    doc="Keyed point lookup with partition pruning (ref find_one at "
    "SeperatorHandler.py:53-64): bucket predicate prunes to one partition "
    "before the key filter.",
    eager=True,  # construction writes to the scratch store
)
def scan_kv_store_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import scan_kv_point, sink_kv_store
    from .domain_queries import _filings_df

    path = os.path.join(scratch_dir("kvp_"), "store")
    sink_kv_store(
        _filings_df(spark).withColumn("main_index", F.col("main_index") * 137), path, mode="overwrite"
    )
    return scan_kv_point(spark, path, 411).select("main_index", "company_a", "bucket")


@register(
    "sink_fs_dump",
    # r10 graduation: the dump must emit exactly one FILE: line per
    # filing, which DuckDB recomputes from the fixture.
    oracle=f"""
    SELECT main_index FROM read_parquet('{_FILINGS_PQ_PATH}')
    ORDER BY main_index
    """,
    doc="Store → per-row text dump, directory per bucket (ref "
    "tools/dumpdata.py:4-38), read back as text lines.",
    eager=True,  # construction writes to the scratch store
)
def sink_fs_dump_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import sink_fs_dump
    from .domain_queries import _filings_df

    path = os.path.join(scratch_dir("fsd_"), "dump")
    sink_fs_dump(_filings_df(spark), path)
    back = spark.read.text(path)
    return (
        back.filter(F.col("value").startswith("FILE: "))
        .select(F.regexp_extract("value", r"^FILE: (\d+)_", 1).cast("long").alias("main_index"))
        .orderBy("main_index")
    )


@register(
    "sink_log",
    # r10 graduation: the per-class line counts are a projection of the
    # crawler-audit golden table (sequential mirror) under the logs.txt
    # tag mapping — accepted -> [+], flagged -> [x], the three reject
    # classes -> [-].
    oracle=f"""
    SELECT tag, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT CASE WHEN status = 'accepted' THEN '[+]'
                  WHEN status = 'flagged_manual_inspection' THEN '[x]'
                  ELSE '[-]' END AS tag
      FROM read_parquet('{golden_path("pipeline_crawler_audit")}')
    ) t
    GROUP BY tag ORDER BY tag
    """,
    doc="Timestamped run-log sink with the reference's logs.txt line "
    "taxonomy (ref src/utils/Logger.py:12-24; line formats "
    "Processor.py:299, CrawlerSupport.py:414/435/445, "
    "SeperatorHandler.py:70): the 5-class crawler/separator audit "
    "formatted byte-exact and appended as a text sink, then read back "
    "and re-parsed into per-class counts. Closes SURVEY §2.1's last "
    "row — the reference's driver-side Logger re-expressed as a "
    "distributed sink over pipeline outcomes. Line-format parity vs "
    "verbatim logs.txt samples pinned in tests/test_sources_sinks.py.",
    eager=True,  # construction appends the log file
)
def sink_log_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.filing_pipeline import crawler_audit
    from ..sources.sinks import sink_log
    from .domain_queries import _deals_df, _filings_df

    deals = _deals_df(spark)
    audit = crawler_audit(deals, _filings_df(spark)).join(
        deals.select("main_index", "company_a", "company_b"), "main_index"
    )
    path = os.path.join(scratch_dir("runlog_"), "logs")
    sink_log(audit, path)
    back = spark.read.text(path)
    return (
        back.select(
            F.regexp_extract("value", r"^\[([0-9: -]+)\] (\[.\])", 2).alias("tag")
        )
        .groupBy("tag")
        .agg(F.count("*").alias("n"))
        .orderBy("tag")
    )


# ---------------------------------------------------------------------------
# §2.2 filters


@register(
    "filter_exists_skip",
    oracle="""
    SELECT e.event_id, e.event_type FROM events e
    WHERE e.event_id NOT IN (SELECT event_id FROM events WHERE event_id < 500)
    """,
    doc="Incremental-processing skip predicate as a set-oriented anti join "
    "(ref CrawlerSupport.py:373-379 exists-check): todo = all ⟕̸ done.",
)
def filter_exists_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    done = e.filter(F.col("event_id") < 500).select("event_id")
    return e.join(done, "event_id", "left_anti").select("event_id", "event_type")


# ---------------------------------------------------------------------------
# §2.7 scalar singles (also covered composite in str_cik_battery / str_page_clean)


@register(
    "str_regex_extract_cik",
    oracle=r"""
    SELECT n_nationkey, regexp_extract(n_name || ' (CIK 000' || n_nationkey::VARCHAR || ')', '\(CIK (\d+)\)', 1) AS cik
    FROM nation
    """,
    doc="Extract CIK digits from an entity label (ref CrawlerSupport.py:152).",
)
def str_regex_extract_cik(spark: SparkSession, sf_dir: str) -> DataFrame:
    entity = F.concat(F.col("n_name"), F.lit(" (CIK 000"), F.col("n_nationkey").cast("string"), F.lit(")"))
    return t(spark, sf_dir, "nation").select(
        "n_nationkey", S.regex_extract_cik(entity).alias("cik")
    )


@register(
    "str_lstrip_zeros",
    oracle="""
    SELECT n_nationkey, regexp_replace(lpad(n_nationkey::VARCHAR, 10, '0'), '^0+', '') AS cik
    FROM nation
    """,
    doc="Strip leading zeros from a CIK (ref CrawlerSupport.py:342).",
)
def str_lstrip_zeros(spark: SparkSession, sf_dir: str) -> DataFrame:
    padded = F.lpad(F.col("n_nationkey").cast("string"), 10, "0")
    return t(spark, sf_dir, "nation").select(
        "n_nationkey", S.lstrip_zeros(padded).alias("cik")
    )


@register(
    "str_build_url",
    oracle="""
    SELECT n_nationkey,
           'https://www.sec.gov/Archives/edgar/data/' || n_nationkey::VARCHAR || '/' ||
           replace('000' || n_nationkey::VARCHAR || '-01-000001', '-', '') || '/' ||
           '000' || n_nationkey::VARCHAR || '-01-000001' || '.txt' AS url
    FROM nation
    """,
    doc="EDGAR archive URL assembly (ref CrawlerSupport.py:345-349).",
)
def str_build_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    adsh = F.concat(F.lit("000"), F.col("n_nationkey").cast("string"), F.lit("-01-000001"))
    return t(spark, sf_dir, "nation").select(
        "n_nationkey",
        S.build_filing_url(F.col("n_nationkey").cast("string"), adsh).alias("url"),
    )


@register(
    "str_drop_pagenums",
    oracle=r"""
    SELECT doc_id,
           regexp_replace('line one' || chr(10) || ' 17 ' || chr(10) || substr(text, 1, 80),
                          '(?m)^\s*\d+\s*$', '', 'g') AS cleaned
    FROM documents
    """,
    doc="Remove standalone page-number lines (ref Processor.py:122-125).",
)
def str_drop_pagenums(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = F.concat(F.lit("line one\n 17 \n"), F.substring("text", 1, 80))
    return t(spark, sf_dir, "documents").select(
        "doc_id", S.drop_page_numbers(raw).alias("cleaned")
    )


@register(
    "str_collapse_newlines",
    oracle=r"""
    SELECT doc_id,
           regexp_replace('a' || chr(10) || chr(10) || chr(10) || 'b' || chr(10) || ' ' || chr(10) || substr(text, 1, 60),
                          '\n\s*\n+', chr(10) || chr(10), 'g') AS collapsed
    FROM documents
    """,
    doc="Collapse blank-line runs (ref Processor.py:127-128).",
)
def str_collapse_newlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = F.concat(F.lit("a\n\n\nb\n \n"), F.substring("text", 1, 60))
    return t(spark, sf_dir, "documents").select(
        "doc_id", S.collapse_newlines(raw).alias("collapsed")
    )


@register(
    "str_strip_toc",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace('See the Table of Contents. TableOfContents ' || substr(text, 1, 60),
                            '(?i)\btable\s*of\s*contents?\b|\btableofcontents?\b', '', 'g'),
             '(?i)table\s*of\s*contents?|tableofcontents?', '', 'g') AS cleaned
    FROM documents
    """,
    doc="Strip 'table of contents' phrases with the reference's exact "
    "TWO-pass semantics (ref Processor.py:149-150): word-bounded pass, "
    "then unbounded pass for embedded/word-adjacent occurrences (r9 "
    "property-test fix; divergent corners pinned in "
    "tests/test_twin_properties.py).",
)
def str_strip_toc(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = F.concat(F.lit("See the Table of Contents. TableOfContents "), F.substring("text", 1, 60))
    return t(spark, sf_dir, "documents").select(
        "doc_id", S.strip_toc_phrases(raw).alias("cleaned")
    )


@register(
    "str_html_to_text_v2",
    oracle=r"""
    SELECT doc_id,
      array_to_string(
        list_filter(
          list_transform(
            string_split(
              regexp_replace(
                regexp_replace(
                  '<div>First  block' || chr(10) || 'wrapped  line</div><p> 12 </p><p>' || substr(text, 1, 80) || '</p>',
                  '(?i)</(p|div|li|h[1-6]|blockquote)>', chr(10) || chr(10), 'g'),
                '<[^>]+>', '', 'g'),
              chr(10) || chr(10)),
            p -> trim(regexp_replace(replace(p, chr(10), ' '), '[ ' || chr(9) || ']+', ' ', 'g'))),
          p -> p <> '' AND NOT regexp_matches(p, '^\d+$')),
        chr(10) || chr(10)) AS paragraphs
    FROM documents
    """,
    doc="HTML→paragraphs v2 (ref tools/patchabbrev.py:48-85): leaf blocks → "
    "paragraphs, ragged line-wrap flattened to single spaces, standalone "
    "page-number blocks dropped, joined with blank lines. Pure array/regex "
    "expressions on both engines.",
)
def str_html_to_text_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = F.concat(
        F.lit("<div>First  block\nwrapped  line</div><p> 12 </p><p>"),
        F.substring("text", 1, 80),
        F.lit("</p>"),
    )
    blocks = F.regexp_replace(raw, r"(?i)</(p|div|li|h[1-6]|blockquote)>", "\n\n")
    stripped = F.regexp_replace(blocks, r"<[^>]+>", "")
    paras = F.split(stripped, r"\n\n")
    flattened = F.transform(
        paras,
        lambda p: F.trim(F.regexp_replace(F.regexp_replace(p, "\n", " "), "[ \t]+", " ")),
    )
    kept = F.filter(flattened, lambda p: (p != "") & ~p.rlike(r"^\d+$"))
    return t(spark, sf_dir, "documents").select(
        "doc_id", F.array_join(kept, "\n\n").alias("paragraphs")
    )


@register(
    "str_company_loose",
    oracle=r"""
    WITH raw AS (
      SELECT n_nationkey,
             CASE n_nationkey % 4
               WHEN 0 THEN n_name || ' Inc'
               WHEN 1 THEN 'Net ' || n_name || ' Group'
               WHEN 2 THEN n_name || ' (old name) & Partners'
               ELSE n_name || '_Holdings Co'
             END AS name
      FROM nation
    ),
    w AS (
      SELECT n_nationkey, name,
             string_split_regex(trim(regexp_replace(name, '\(.*?\)', '', 'g')), '[\s_]+') AS words
      FROM raw
    ),
    p AS (
      SELECT *, list_min(list_filter(
               list_transform(words, (x, i) -> CASE WHEN lower(x) IN ('net','com','org','co') AND i < len(words) THEN i END),
               v -> v IS NOT NULL)) AS pos
      FROM w
    ),
    m AS (
      SELECT n_nationkey,
             CASE WHEN pos IS NOT NULL
                  THEN list_concat(list_concat(words[1:pos-1], [words[pos] || '.' || words[pos+1]]), words[pos+2:])
                  ELSE words END AS merged
      FROM p
    )
    SELECT n_nationkey,
           array_to_string(
             CASE WHEN len(merged) > 1
                  THEN CASE WHEN merged[len(merged)-1] = '&'
                            THEN merged[1:len(merged)-2]
                            ELSE merged[1:len(merged)-1] END
                  ELSE merged END, ' ') AS loose_name
    FROM m
    """,
    doc="Loose-match company-name builder (ref Processor.py:30-64): strip "
    "parens, merge the first domain-like token with its successor, drop a "
    "trailing '& X' pair or last word. Indexed array lambdas on both "
    "engines — no UDF.",
)
def str_company_loose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.strings import company_loose_name

    raw = (
        F.when(F.col("n_nationkey") % 4 == 0, F.concat(F.col("n_name"), F.lit(" Inc")))
        .when(F.col("n_nationkey") % 4 == 1, F.concat(F.lit("Net "), F.col("n_name"), F.lit(" Group")))
        .when(F.col("n_nationkey") % 4 == 2, F.concat(F.col("n_name"), F.lit(" (old name) & Partners")))
        .otherwise(F.concat(F.col("n_name"), F.lit("_Holdings Co")))
    )
    return t(spark, sf_dir, "nation").select(
        "n_nationkey", company_loose_name(raw).alias("loose_name")
    )


@register(
    "str_mojibake_repair",
    oracle="""
    SELECT doc_id,
           translate(chr(145) || substr(text, 1, 40) || chr(148) || chr(150) || chr(160),
                     chr(145) || chr(146) || chr(147) || chr(148) || chr(150) || chr(151) || chr(133) || chr(160),
                     chr(8216) || chr(8217) || chr(8220) || chr(8221) || chr(8211) || chr(8212) || chr(8230) || ' ') AS repaired
    FROM documents
    """,
    doc="cp1252 mojibake repair: stray C1 controls → proper punctuation, "
    "NBSP → space (ref tools/patchabbrev.py:25-33,53-56). Single "
    "translate() pass on both engines.",
)
def str_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.strings import mojibake_repair

    raw = F.concat(
        F.lit("\u0091"),
        F.substring("text", 1, 40),
        F.lit("\u0094\u0096\u00a0"),
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id", mojibake_repair(raw).alias("repaired")
    )


# ---------------------------------------------------------------------------
# §2.8


# The filing fixture materialized as parquet so DuckDB can read the SAME
# rows the Spark side builds (tests/fixtures/filings.parquet, drift-guard
# pytest in tests/test_domain.py) — this is what lets the two §2.8 keys
# below graduate from rows-only to oracle-paired (r8).
_FILINGS_PQ = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "filings.parquet",
)


def _phrase_catalog_sql() -> str:
    from .cascade import START_PHRASES

    quoted = ", ".join("'" + p.lower() + "'" for p in START_PHRASES)
    return rf"""
    WITH f AS (
      SELECT main_index, lower(content) AS low
      FROM read_parquet('{_FILINGS_PQ}')
    ),
    m AS (
      SELECT main_index,
             list_filter([{quoted}], p -> contains(low, p))[1] AS specific,
             regexp_matches(low, '(?m)^background\s*$') AS bare
      FROM f
    )
    SELECT main_index,
           coalesce(specific, CASE WHEN bare THEN 'background' END) AS matched_phrase,
           CASE WHEN specific IS NOT NULL THEN 'specific'
                WHEN bare THEN 'fallback' ELSE 'none' END AS pass_type
    FROM m
    """


@register(
    "phrase_catalog",
    oracle=_phrase_catalog_sql(),
    doc="The 29-phrase START_PHRASES catalog with two-pass preference "
    "(specific phrases first, bare 'Background' fallback — ref "
    "config.py:32-62, Processor.py:266-269): per filing, the matched "
    "phrase and which pass matched. Oracle-paired since r8: the filing "
    "fixture ships as parquet so DuckDB runs the identical two-pass "
    "catalog scan (list_filter first-hit + multiline regex fallback) "
    "over the same rows.",
)
def phrase_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cascade import START_PHRASES
    from .domain_queries import _filings_df

    filings = _filings_df(spark)
    low = F.lower("content")
    # single array-filter expression: a 29-way nested coalesce(when(...))
    # chain makes Catalyst optimization time explode — the catalog is data,
    # not control flow. First hit in catalog order = the reference's
    # first-match preference.
    catalog = F.array(*[F.lit(p.lower()) for p in START_PHRASES])
    hits = F.filter(catalog, lambda p: low.contains(p))
    specific = F.get(hits, 0)
    bare = F.when(low.rlike(r"(?m)^background\s*$"), F.lit("background"))
    return filings.select(
        "main_index",
        F.coalesce(specific, bare).alias("matched_phrase"),
        F.when(specific.isNotNull(), F.lit("specific"))
        .when(bare.isNotNull(), F.lit("fallback"))
        .otherwise(F.lit("none"))
        .alias("pass_type"),
    )


def _ner_orgs_sql() -> str:
    from .enrich import ORG_PATTERN

    return f"""
    WITH f AS (
      SELECT main_index, content FROM read_parquet('{_FILINGS_PQ}')
    ),
    x AS (
      SELECT main_index,
             trim(unnest(regexp_extract_all(content, '{ORG_PATTERN}', 1))) AS org
      FROM f
    ),
    c AS (SELECT main_index, org, count(*) AS cnt FROM x GROUP BY 1, 2)
    SELECT main_index, org, cnt, CAST(rk AS BIGINT) AS rk FROM (
      SELECT main_index, org, cnt,
             row_number() OVER (PARTITION BY main_index
                                ORDER BY cnt DESC, org) AS rk
      FROM c
    ) WHERE rk <= 5
    """


@register(
    "ner_orgs",
    oracle=_ner_orgs_sql(),
    doc="Top-5 ORG entities per filing via the deterministic regex NER "
    "stand-in (ref ChunkProcessor.py:331-339; spaCy pluggable via "
    "mapInPandas, never on the test path). Oracle-paired since r8: the "
    "stand-in is one regexp_extract_all + count + rank, so DuckDB runs "
    "the identical extraction over the parquet-shipped fixture (Java "
    "regex and RE2 agree on this pattern — no backrefs/lookahead; "
    "alternation preference matters and matches: both engines take "
    "'Corp' before 'Corporation').",
)
def ner_orgs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .domain_queries import _filings_df
    from .enrich import top_orgs

    filings = _filings_df(spark)
    return top_orgs(
        filings.select("main_index", "content"), "main_index", "content", k=5
    ).select("main_index", "org", "cnt", F.col("rk").cast("long").alias("rk"))


@register(
    "scan_orc_roundtrip",
    # r10 graduation: DuckDB has no ORC reader, but it doesn't need one —
    # a lossless roundtrip means the ORC-read aggregate must equal the
    # same aggregate over the parquet source, which DuckDB computes
    # directly. The hash row now proves the roundtrip preserves VALUES
    # (per-source counts and char mass), not just the group count.
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM documents GROUP BY source ORDER BY source
    """,
    doc="Columnar-format breadth: write the documents table as ORC "
    "(zstd), read it back, and return per-source row counts + char "
    "sums. ORC is the other splittable columnar format a 100 TB lake "
    "ingests from (Hive/Trino estates); the engine's scan path is "
    "format-agnostic — same pushdown/pruning machinery as parquet. "
    "Value equality with the parquet source is pinned in "
    "tests/test_sources_sinks.py.",
    eager=True,  # construction writes to the scratch store
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import scratch_dir, t

    path = os.path.join(scratch_dir("orc_"), "docs")
    t(spark, sf_dir, "documents").write.option("compression", "zstd").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        )
        .orderBy("source")
    )


@register(
    "sink_pyds_kv",
    # r10 graduation: the manifest-verified read-back must reproduce the
    # source documents exactly (per-source counts are partition-layout
    # independent), which DuckDB computes directly — the hash row proves
    # the staged-write/commit/manifest protocol loses and duplicates
    # nothing; the commit/abort/idempotence edges stay in pytest.
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source ORDER BY source
    """,
    doc="Write side of the Spark 4 Python DataSource surface "
    "(sources/kv_datasource.py): documents stream through "
    "df.write.format('kv_json_sink') — per-task staged files named by "
    "partition id (retry-idempotent), atomic publish via the engine's "
    "commit hook with a _SUCCESS manifest, abort leaves the target "
    "untouched (both pinned in tests/test_kv_datasource.py). Returns "
    "the manifest-verified per-file row counts read back from the "
    "committed store.",
    eager=True,  # construction writes to the scratch store
)
def sink_pyds_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from ..sources.kv_datasource import register_kv_sink
    from ._util import scratch_dir, t

    register_kv_sink(spark)
    path = os.path.join(scratch_dir("pydskv_"), "store")
    os.makedirs(path, exist_ok=True)
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .repartition(4, "doc_id")
        .write.format("kv_json_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    manifest = _json.load(open(os.path.join(path, "_SUCCESS")))
    files = [f["file"] for f in manifest["files"]]
    # explicit schema: inference over an empty store (0 committed rows)
    # yields an empty struct and unresolvable columns downstream
    kv_schema = "doc_id bigint, source string, n_chars bigint"
    if not files:
        back = spark.createDataFrame([], kv_schema)
    else:
        back = spark.read.schema(kv_schema).json(
            [os.path.join(path, f) for f in files]
        )
    return (
        back.groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("source")
    )


@register(
    "scan_jsonl_roundtrip",
    oracle="""
    SELECT source, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM documents GROUP BY source
    """,
    doc="Interchange-format breadth: write the documents table as JSON "
    "Lines, read it back with an EXPLICIT schema (inference over 100 TB "
    "is a full extra pass — and over an empty store yields an "
    "unresolvable empty struct), and return per-source doc counts + "
    "char sums. Unlike the ORC twin this one is oracle-paired: the "
    "DuckDB oracle aggregates the original parquet view, so any "
    "byte lost or mangled in the JSON round-trip (newline escaping, "
    "unicode surrogates, column drift) breaks the hash match. Left "
    "uncompressed: bare JSONL splits by line at any byte offset, so a "
    "1000-executor scan parallelizes without gzip's whole-file decode "
    "barrier.",
    eager=True,  # construction writes to the scratch store
)
def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import scratch_dir, t

    path = os.path.join(scratch_dir("jsonl_"), "docs")
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .write.json(path)
    )
    back = spark.read.schema("doc_id bigint, text string, source string").json(path)
    return (
        back.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        )
    )


@register(
    "scan_csv_corrupt_permissive",
    oracle="""
    SELECT source,
           count(*) AS n_rows,
           CAST(count(CASE WHEN doc_id % 50 = 0 THEN 1 END) AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN doc_id % 50 <> 0 THEN n_chars END) AS BIGINT) AS good_chars
    FROM documents GROUP BY source
    """,
    doc="Malformed-input tolerance: the documents table is serialized to "
    "CSV with every 50th row's integer column mangled, then read back "
    "under PERMISSIVE mode with _corrupt_record in the schema — bad rows "
    "surface as typed nulls plus the captured raw line instead of "
    "failing the scan (a 100 TB crawl ALWAYS contains garbage lines; "
    "FAILFAST is not an option mid-pipeline). The oracle derives the "
    "same per-source good/corrupt counts from the injection rule on the "
    "original view, so the permissive parser's row accounting is "
    "value-checked, not just 'did not crash'.",
    eager=True,  # construction writes to the scratch store
)
def scan_csv_corrupt_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(scratch_dir("csvbad_"), "rows")
    line = F.concat(
        F.col("doc_id").cast("string"),
        F.lit(","),
        F.col("source"),
        F.lit(","),
        # corrupt the integer column on every 50th row
        F.when(F.col("doc_id") % 50 == 0, F.lit("xx")).otherwise(
            F.col("n_chars").cast("string")
        ),
    )
    t(spark, sf_dir, "documents").select(line.alias("value")).write.text(path)
    back = (
        spark.read.schema(
            "doc_id bigint, source string, n_chars bigint, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    return back.groupBy("source").agg(
        F.count("*").alias("n_rows"),
        F.count("_corrupt_record").cast("bigint").alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("n_chars")))
        .cast("bigint")
        .alias("good_chars"),
    )


# ---------------------------------------------------------------------------
# §2.8 cascade stages (b) and (c) as pure-SQL oracle twins (VERDICT r7
# item 7): SURVEY §2.8 notes these two stages are line-counting
# heuristics expressible with split/filter/size — registering them
# oracle-paired shrinks the rows-only set the way dedup_signature_banded
# did for the banded stage.  The pure-Python forms in operators/cascade.py
# remain the pipeline implementations (golden-corpus pytest); these twins
# prove the ALGORITHMS cross-engine at value level over deterministic
# multi-line chunks synthesized from the documents table (the fixture
# text is single-line, so the structure is fully controlled and identical
# on both engines).

_CASCADE_PHRASE = "background of the merger"


def _cascade_chunk_title(doc_id, text):
    """Deterministic multi-line chunk exercising every has_section_title
    branch: 1-line title para, 2-line para, bad-phrase para, 3-line para,
    short-line drop, and no-phrase."""
    body = F.substring(text, 1, 80)
    body2 = F.substring(text, 81, 80)
    m = doc_id % 6
    return (
        F.when(m == 0, F.concat(F.lit("BACKGROUND OF THE MERGER\n\n"), body))
        .when(m == 1, F.concat(F.lit("Item 7.\nBackground of the Merger\n\n"), body))
        .when(m == 2, F.concat(F.lit("As amended herein\nBackground of the Merger\n\n"), body))
        .when(m == 3, F.concat(F.lit("Background of the Merger\n"), body, F.lit("\n"), body2, F.lit("\n\n"), body))
        .when(m == 4, F.concat(F.lit("11.\nBackground of the Merger\n\n"), body))
        .otherwise(F.concat(F.lit("Introduction\n\n"), body))
    )


_CASCADE_CHUNK_TITLE_SQL = """
      CASE doc_id % 6
        WHEN 0 THEN e'BACKGROUND OF THE MERGER\\n\\n' || substr(text, 1, 80)
        WHEN 1 THEN e'Item 7.\\nBackground of the Merger\\n\\n' || substr(text, 1, 80)
        WHEN 2 THEN e'As amended herein\\nBackground of the Merger\\n\\n' || substr(text, 1, 80)
        WHEN 3 THEN e'Background of the Merger\\n' || substr(text, 1, 80) || e'\\n' || substr(text, 81, 80) || e'\\n\\n' || substr(text, 1, 80)
        WHEN 4 THEN e'11.\\nBackground of the Merger\\n\\n' || substr(text, 1, 80)
        ELSE e'Introduction\\n\\n' || substr(text, 1, 80)
      END
"""

# kept lines of one paragraph / their lowercased join, inlined twice in the
# DuckDB lambda (no local bindings inside lambdas)
_KEPT_SQL = "list_filter(list_transform(string_split(q, chr(10)), x -> trim(x)), x -> length(x) >= 4)"
_JOIN_SQL = f"lower(array_to_string({_KEPT_SQL}, chr(10)))"


@register(
    "cascade_title_check",
    oracle=f"""
    WITH c AS (SELECT doc_id, {_CASCADE_CHUNK_TITLE_SQL} AS chunk FROM documents),
    p AS (SELECT doc_id, regexp_split_to_array(chunk, '\\n\\s*\\n') AS paras FROM c)
    SELECT doc_id,
           len(list_filter(paras, q ->
                 NOT (contains({_JOIN_SQL}, 'amended')
                      OR contains({_JOIN_SQL}, 'restated')
                      OR contains({_JOIN_SQL}, 'schedule to')
                      OR contains({_JOIN_SQL}, 'as follow'))
                 AND contains({_JOIN_SQL}, '{_CASCADE_PHRASE}')
                 AND len({_KEPT_SQL}) <= 2)) AS n_title_paras,
           len(list_filter(paras, q ->
                 NOT (contains({_JOIN_SQL}, 'amended')
                      OR contains({_JOIN_SQL}, 'restated')
                      OR contains({_JOIN_SQL}, 'schedule to')
                      OR contains({_JOIN_SQL}, 'as follow'))
                 AND contains({_JOIN_SQL}, '{_CASCADE_PHRASE}')
                 AND len({_KEPT_SQL}) <= 2)) > 0 AS has_title
    FROM p
    """,
    doc="Cascade stage (b) has_section_title as native expressions (ref "
    "ChunkProcessor.py:75-114; pure-Python twin cascade.py:115-137): "
    "split the chunk on blank lines into paragraphs, keep lines of "
    "length >= 4 after trim (standalone page numbers drop), skip "
    "paragraphs carrying the amended/restated/schedule-to/as-follow "
    "poison terms, and accept iff some surviving paragraph contains the "
    "start phrase in <= 2 kept lines. All higher-order array functions "
    "(split/transform/filter/exists) — whole-stage codegen, zero UDF, "
    "zero shuffle: the check is a per-row map over the scan.",
)
def cascade_title_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    chunk = _cascade_chunk_title(F.col("doc_id"), F.col("text"))

    def kept(q):
        return F.filter(
            F.transform(F.split(q, "\n"), lambda x: F.trim(x)),
            lambda x: F.length(x) >= 4,
        )

    # per-paragraph (joined_lower, n_kept) structs via NESTED transforms so
    # the kept-lines array and its join are each evaluated once per
    # paragraph — a flat exists() predicate would re-inline the split+trim
    # chain per poison-term reference (PERFORMANCE.md rule 5); struct
    # field reads below are free
    infos = F.transform(
        F.transform(F.split(F.col("chunk"), r"\n\s*\n"), kept),
        lambda kl: F.struct(
            F.lower(F.array_join(kl, "\n")).alias("j"),
            F.size(kl).alias("n"),
        ),
    )

    def ok(s):
        bad = (
            s["j"].contains("amended")
            | s["j"].contains("restated")
            | s["j"].contains("schedule to")
            | s["j"].contains("as follow")
        )
        return ~bad & s["j"].contains(_CASCADE_PHRASE) & (s["n"] <= 2)

    # staged projections: chunk and n_title_paras are non-cheap and
    # multiply referenced, so CollapseProject keeps the stages apart
    return (
        docs.select("doc_id", chunk.alias("chunk"))
        .select("doc_id", F.size(F.filter(infos, ok)).alias("n_title_paras"))
        .select(
            "doc_id",
            "n_title_paras",
            (F.col("n_title_paras") > 0).alias("has_title"),
        )
    )


def _cascade_chunk_toc(doc_id, text):
    """Deterministic chunk exercising every is_not_toc branch: pure TOC,
    paragraph run, TOC followed by a long paragraph run, and no-phrase
    TOC (start index defaults to the first line)."""
    body = F.substring(text, 1, 80)
    body2 = F.substring(text, 81, 80)
    m = doc_id % 4
    return (
        F.when(m == 0, F.concat(F.lit("Background of the Merger\n\nItem 1.\n\nItem 2.\n\nItem 3.\n\n"), body))
        .when(m == 1, F.concat(F.lit("Background of the Merger\n"), body, F.lit("\n"), body2, F.lit("\nSigned and agreed by the parties hereto\nWitnessed this day\n")))
        .when(m == 2, F.concat(F.lit("Background of the Merger\n\nA. One\n\nB. Two\n\nC. Three\n\n"), body, F.lit("\n"), body2, F.lit("\nline three of text\nline four of text\nline five of text\nline six here")))
        .otherwise(F.concat(F.lit("Table of Contents\n\nOne\n\nTwo\n\nThree\n\n"), body))
    )


_CASCADE_CHUNK_TOC_SQL = """
      CASE doc_id % 4
        WHEN 0 THEN e'Background of the Merger\\n\\nItem 1.\\n\\nItem 2.\\n\\nItem 3.\\n\\n' || substr(text, 1, 80)
        WHEN 1 THEN e'Background of the Merger\\n' || substr(text, 1, 80) || e'\\n' || substr(text, 81, 80) || e'\\nSigned and agreed by the parties hereto\\nWitnessed this day\\n'
        WHEN 2 THEN e'Background of the Merger\\n\\nA. One\\n\\nB. Two\\n\\nC. Three\\n\\n' || substr(text, 1, 80) || e'\\n' || substr(text, 81, 80) || e'\\nline three of text\\nline four of text\\nline five of text\\nline six here'
        ELSE e'Table of Contents\\n\\nOne\\n\\nTwo\\n\\nThree\\n\\n' || substr(text, 1, 80)
      END
"""


@register(
    "cascade_toc_check",
    oracle=f"""
    WITH c AS (SELECT doc_id, {_CASCADE_CHUNK_TOC_SQL} AS chunk FROM documents),
    r AS (SELECT doc_id, chunk, string_split(chunk, chr(10)) AS raw FROM c),
    -- splitlines() parity: split('\\n') keeps a phantom trailing empty
    -- line when the chunk ends in a newline; splitlines() drops it
    -- (VERDICT r8 item 1, Hypothesis counterexample pinned in
    -- tests/test_cascade_properties.py)
    l AS (SELECT doc_id,
                 CASE WHEN chunk LIKE '%' || chr(10)
                      THEN array_slice(raw, 1, len(raw) - 1)
                      ELSE raw END AS lines
          FROM r),
    s AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 array_slice(lines,
                   coalesce(list_filter(list_transform(lines,
                       (x, i) -> CASE WHEN contains(lower(trim(x)), '{_CASCADE_PHRASE}') THEN i END),
                     v -> v IS NOT NULL)[1], 1),
                   len(lines)),
                 x -> CASE WHEN length(trim(x)) > 0 THEN '1' ELSE '0' END),
               '') AS bits
      FROM l
    )
    SELECT doc_id,
           len(list_filter(regexp_extract_all(bits, '1.|0'), t -> t = '10')) AS toc_like,
           len(list_filter(regexp_extract_all(bits, '1.|0'), t -> t = '11')) AS para_like,
           NOT (len(list_filter(regexp_extract_all(bits, '1.|0'), t -> t = '10')) >= 3
                AND len(list_filter(regexp_extract_all(bits, '1.|0'), t -> t = '11')) < 3) AS is_not_toc
    FROM s
    """,
    doc="Cascade stage (c) is_not_toc as native expressions (ref "
    "ChunkProcessor.py:116-140; pure-Python twin cascade.py:140-158): "
    "from the first line containing the phrase, the reference's greedy "
    "two-step scan classifies line pairs as TOC-like (text line + blank "
    "line) or paragraph-like (two text lines) and rejects iff "
    "toc_like >= 3 and para_like < 3. The scan is encoded as a regex "
    "tokenization: lines map to a '1'/'0' blank-ness string and "
    "regexp_extract_all(bits, '1.|0') reproduces the loop's greedy "
    "leftmost consumption exactly ('1x' eats two positions, '0' eats "
    "one, a trailing lone '1' is never classified — token '10' = "
    "toc_like, '11' = para_like). splitlines() parity: when the chunk "
    "ends in a newline, split('\\n') keeps a phantom trailing empty "
    "line that splitlines() drops — both engines slice it off before "
    "tokenizing (r8 Hypothesis counterexample, pinned in "
    "tests/test_cascade_properties.py). Whole-stage codegen, zero UDF, "
    "zero shuffle: a per-row map over the scan on both engines.",
)
def cascade_toc_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    chunk = _cascade_chunk_toc(F.col("doc_id"), F.col("text"))
    lines = F.col("lines")
    idx1 = F.coalesce(
        F.get(
            F.filter(
                F.transform(
                    lines,
                    lambda x, i: F.when(
                        F.lower(F.trim(x)).contains(_CASCADE_PHRASE), i + 1
                    ),
                ),
                lambda v: v.isNotNull(),
            ),
            0,
        ),
        F.lit(1),
    )
    bits = F.array_join(
        F.transform(
            F.slice(lines, idx1, F.size(lines)),
            lambda x: F.when(F.length(F.trim(x)) > 0, F.lit("1")).otherwise(
                F.lit("0")
            ),
        ),
        "",
    )
    toks = F.regexp_extract_all(F.col("bits"), F.lit("1.|0"), F.lit(0))
    toc = F.size(F.filter(F.col("toks"), lambda tk: tk == F.lit("10")))
    para = F.size(F.filter(F.col("toks"), lambda tk: tk == F.lit("11")))
    # staged projections (PERFORMANCE.md rule 5): lines feeds both the
    # phrase-index scan and the slice, toks feeds both token counts, and
    # the counts feed both the output columns and the verdict — each
    # heavy alias is multiply referenced, so CollapseProject leaves the
    # stages apart and everything evaluates once per row
    # splitlines() parity: split('\n') keeps a phantom trailing empty
    # line when the chunk ends in a newline; splitlines() drops it
    # (ref ChunkProcessor.py:116-140 iterates splitlines() output)
    raw = F.col("raw")
    trimmed = F.when(
        F.col("chunk").endswith("\n"), F.slice(raw, 1, F.size(raw) - 1)
    ).otherwise(raw)
    return (
        docs.select("doc_id", chunk.alias("chunk"))
        .select("doc_id", "chunk", F.split("chunk", "\n").alias("raw"))
        .select("doc_id", trimmed.alias("lines"))
        .select("doc_id", bits.alias("bits"))
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", toc.alias("toc_like"), para.alias("para_like"))
        .select(
            "doc_id",
            "toc_like",
            "para_like",
            (~((F.col("toc_like") >= 3) & (F.col("para_like") < 3))).alias(
                "is_not_toc"
            ),
        )
    )
