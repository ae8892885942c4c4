"""Scalar function battery as registered queries (SURVEY §2.7).

Inputs are the fixture tables; where the battery needs shapes the fixtures
lack (parens, CIK strings, HTML, page-number lines) the query constructs
them from fixture columns first — both sides construct identically, so the
transform under test is still exercised end-to-end.

DuckDB dialect notes: regexp_replace needs the 'g' flag for global
replacement (Spark is global by default); patterns stick to the
RE2 ∩ Java-regex common subset (no backrefs/lookaround).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..functions import strings as S
from ._util import t, r4, date_str


@register(
    "str_strip_parens",
    oracle="""
    SELECT p_partkey,
           trim(regexp_replace(p_name || ' (' || p_brand || ')', '\\(.*?\\)', '', 'g')) AS cleaned
    FROM part
    """,
    doc="Remove parenthesized content (ref CrawlerSupport.py:188-190).",
)
def str_strip_parens(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = F.concat(F.col("p_name"), F.lit(" ("), F.col("p_brand"), F.lit(")"))
    return t(spark, sf_dir, "part").select("p_partkey", S.strip_parens(raw).alias("cleaned"))


@register(
    "str_drop_last_word",
    oracle=r"""
    SELECT p_partkey,
           CASE WHEN len(string_split_regex(trim(p_name), '\s+')) <= 1 THEN trim(p_name)
                ELSE array_to_string(list_slice(string_split_regex(trim(p_name), '\s+'), 1,
                     len(string_split_regex(trim(p_name), '\s+')) - 1), ' ')
           END AS shortened
    FROM part
    """,
    doc="Drop the last word of a company name (ref Processor.py:30-41).",
)
def str_drop_last_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey", S.drop_last_word(F.col("p_name")).alias("shortened")
    )


@register(
    "str_first_token",
    oracle=r"""
    SELECT p_partkey,
           string_split(string_split_regex(lower(trim(p_name)), '\s+')[1], '.')[1] AS tok
    FROM part
    """,
    doc="First word minus domain suffix (ref ChunkProcessor.py:414).",
)
def str_first_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey", S.first_token(F.col("p_name")).alias("tok")
    )


@register(
    "str_replace_dash",
    oracle="SELECT p_partkey, replace(p_type, '-', ' ') AS detached FROM part",
    doc="Hyphen→space retry variant (ref CrawlerSupport.py:426-429).",
)
def str_replace_dash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey", S.replace_dash(F.col("p_type")).alias("detached")
    )


@register(
    "str_cik_battery",
    oracle="""
    SELECT c_custkey,
           regexp_extract(entity, '\\(CIK (\\d+)\\)', 1) AS cik_raw,
           regexp_replace(regexp_extract(entity, '\\(CIK (\\d+)\\)', 1), '^0+', '') AS cik,
           'https://www.sec.gov/Archives/edgar/data/' ||
             regexp_replace(regexp_extract(entity, '\\(CIK (\\d+)\\)', 1), '^0+', '') ||
             '/' || replace(adsh, '-', '') || '/' || adsh || '.txt' AS url
    FROM (
      SELECT c_custkey,
             c_name || ' (CIK ' || lpad(c_custkey::VARCHAR, 10, '0') || ')' AS entity,
             lpad(c_custkey::VARCHAR, 10, '0') || '-01-' || lpad((c_custkey % 1000)::VARCHAR, 6, '0') AS adsh
      FROM customer
    )
    """,
    doc="CIK extraction → zero-strip → EDGAR URL assembly, the crawler's URL "
    "battery (ref CrawlerSupport.py:152,342,345-349) on constructed entities.",
)
def str_cik_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    entity = F.concat(
        F.col("c_name"), F.lit(" (CIK "), F.lpad(F.col("c_custkey").cast("string"), 10, "0"), F.lit(")")
    )
    adsh = F.concat(
        F.lpad(F.col("c_custkey").cast("string"), 10, "0"),
        F.lit("-01-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 6, "0"),
    )
    cik_raw = S.regex_extract_cik(entity)
    cik = S.lstrip_zeros(cik_raw)
    return c.select(
        "c_custkey",
        cik_raw.alias("cik_raw"),
        cik.alias("cik"),
        S.build_filing_url(cik, adsh).alias("url"),
    )


@register(
    "str_urlencode",
    oracle="SELECT p_partkey, replace(p_name, ' ', '%20') AS encoded FROM part",
    doc="Query-string escape (ref CrawlerSupport.py:116).",
)
def str_urlencode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        "p_partkey", S.urlencode_spaces(F.col("p_name")).alias("encoded")
    )


@register(
    "str_page_clean",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace('intro line' || chr(10) || ' 42 ' || chr(10) || chr(10) || chr(10) ||
                                'Table of Contents' || chr(10) || substr(text, 1, 120),
                   '(?i)\btable\s*of\s*contents?\b|\btableofcontents?\b', '', 'g'),
                 '(?i)table\s*of\s*contents?|tableofcontents?', '', 'g'),
               '(?m)^\s*\d+\s*$', '', 'g'),
             '\n\s*\n+', chr(10) || chr(10), 'g') AS cleaned
    FROM documents
    """,
    doc="Page-number line removal + TOC-phrase strip + blank-line collapse "
    "(ref Processor.py:122-128,149-150) over constructed multi-line text.",
)
def str_page_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = F.concat(
        F.lit("intro line\n 42 \n\n\nTable of Contents\n"), F.substring("text", 1, 120)
    )
    cleaned = S.collapse_newlines(S.drop_page_numbers(S.strip_toc_phrases(raw)))
    return t(spark, sf_dir, "documents").select("doc_id", cleaned.alias("cleaned"))


@register(
    "str_truncate",
    oracle="SELECT doc_id, substr(text, 1, 300) AS capped, length(substr(text, 1, 300)) AS capped_len FROM documents",
    doc="Content cap (ref Processor.py:178-181; 450k in prod, 300 here).",
)
def str_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    capped = S.truncate_content(F.col("text"), 300)
    return t(spark, sf_dir, "documents").select(
        "doc_id", capped.alias("capped"), F.length(capped).cast("long").alias("capped_len")
    )


@register(
    "str_html_to_text",
    oracle=r"""
    SELECT doc_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    '<html><body><p>' || substr(text, 1, 200) || '</p><div>B &amp; C</div><p> 7 </p></body></html>',
                    '(?i)</(p|div|li|h[1-6]|blockquote|tr|table|ul|ol)>|<br\s*/?>', chr(10), 'g'),
                  '<[^>]+>', ' ', 'g'),
                '&amp;', '&', 'g'),
              '[ \t]+', ' ', 'g'),
            '(?m)^\s*\d+\s*$', '', 'g'),
          '\n\s*\n+', chr(10) || chr(10), 'g'),
        '^\s+|\s+$', '', 'g'
      ) AS plain
    FROM documents
    """,
    doc="HTML→text as a native regex chain (ref Processor.py:95-130, "
    "patchabbrev.py:48-85 — lxml row-at-a-time in the reference; here pure "
    "codegen). Oracle mirrors the chain minus the script/style stage "
    "(no-op on this input; RE2 lacks the backreference it needs).",
)
def str_html_to_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    html = F.concat(
        F.lit("<html><body><p>"),
        F.substring("text", 1, 200),
        F.lit("</p><div>B &amp; C</div><p> 7 </p></body></html>"),
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id", S.html_to_text(html).alias("plain")
    )


@register(
    "str_normalize_quotes",
    oracle="""
    SELECT doc_id,
           translate(chr(8216) || substr(text, 1, 40) || chr(8221) || chr(171),
                     chr(8216) || chr(8217) || chr(8218) || chr(8219) || chr(8249) || chr(8250) ||
                     chr(10075) || chr(10076) ||
                     chr(8220) || chr(8221) || chr(8222) || chr(8223) || chr(171) || chr(187) ||
                     chr(10077) || chr(10078),
                     repeat(chr(39), 8) || repeat(chr(34), 8)) AS normalized
    FROM documents
    """,
    doc="Unicode quote folding via static translate map (ref "
    "patchabbrev.py:87-107 computes it dynamically per char; the map is "
    "exhaustively equal to that rule over all of Unicode — r9 audit "
    "pinned in tests/test_twin_properties.py, which fixed U+02BC being "
    "wrongly folded and U+275B-275E being missed).",
)
def str_normalize_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = F.concat(F.lit("‘"), F.substring("text", 1, 40), F.lit("”«"))
    return t(spark, sf_dir, "documents").select(
        "doc_id", S.normalize_quotes(raw).alias("normalized")
    )


@register(
    "date_format_iso",
    oracle="SELECT o_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS iso FROM orders",
    doc="datetime → YYYY-MM-DD (ref CrawlerSupport.py:391-392).",
)
def date_format_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        "o_orderkey", date_str(F.to_date("o_orderdate")).alias("iso")
    )


@register(
    "math_weighted_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(0.4 * l_quantity + 0.6 * l_discount * 100.0, 4) AS hybrid
    FROM lineitem
    """,
    doc="0.4·cos + 0.6·rerank weighted score (ref ChunkProcessor.py:319-325).",
)
def math_weighted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        r4(0.4 * F.col("l_quantity") + 0.6 * F.col("l_discount") * 100.0).alias("hybrid"),
    )


@register(
    "math_sigmoid",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(1.0 / (1.0 + exp(-(l_discount * 10.0 - 0.5))), 4) AS activated
    FROM lineitem
    """,
    doc="Sigmoid on reranker logits (ref ChunkProcessor.py:317).",
)
def math_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    logit = F.col("l_discount") * 10.0 - 0.5
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        r4(1.0 / (1.0 + F.exp(-logit))).alias("activated"),
    )


@register(
    "json_parse_toolcall",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    doc="Parse JSON payload → typed column (ref Processor.py:351-353, LLM "
    "tool-call arguments; here the events.props JSON). from_json with an "
    "explicit schema — no inference, stays codegen'd.",
)
def json_parse_toolcall(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = F.from_json(F.col("props"), "struct<k:bigint>")
    return t(spark, sf_dir, "events").select("event_id", parsed["k"].alias("k"))


@register(
    "json_extract_hits",
    oracle="""
    SELECT event_type, count(*) AS n_hits, CAST(sum(k) AS BIGINT) AS k_total FROM (
      SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    ) WHERE k > 50
    GROUP BY event_type
    """,
    doc="Nested-JSON navigation + filter + agg (ref CrawlerSupport.py:133-141 "
    "hits.hits[]._source traversal, re-shaped over events.props).",
)
def json_extract_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = F.from_json(F.col("props"), "struct<k:bigint>")
    return (
        t(spark, sf_dir, "events")
        .select("event_type", parsed["k"].alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_hits"), F.sum("k").alias("k_total"))
    )


@register(
    "json_parse_corrupt_tolerant",
    oracle="""
    WITH seeded AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 100 = 0 THEN '{broken' || props ELSE props END AS props
      FROM events
    )
    SELECT event_type,
           count(*) AS n_rows,
           CAST(count(*) FILTER (WHERE usable) AS BIGINT) AS n_parsed,
           CAST(count(*) FILTER (WHERE NOT usable) AS BIGINT) AS n_corrupt
    FROM (
      SELECT event_type,
             -- CASE defers json_extract until json_valid holds (json_extract
             -- raises on malformed input even under an AND guard)
             CASE WHEN json_valid(props)
                  THEN json_type(json_extract(props, '$.k')) IN ('BIGINT', 'UBIGINT')
                       AND try_cast(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
                  ELSE FALSE END AS usable
      FROM seeded
    )
    GROUP BY event_type
    """,
    doc="Corrupt-tolerant JSON ingestion: 1% of payloads are seeded with "
    "broken JSON (deterministically, by event_id) and the parse must "
    "degrade to NULL + a corrupt count rather than fail the job — "
    "PERMISSIVE-mode semantics, the ingestion posture any 100 TB raw "
    "feed needs. n_parsed counts rows yielding a USABLE integer `k` on "
    "both engines (Spark: from_json struct field non-null; DuckDB: valid "
    "JSON whose $.k is a JSON integer) — same predicate either side, so "
    "invalid JSON, missing k, null k, and non-integer k all agree "
    "(ADVICE r2: the previous oracle counted json_valid instead).",
)
def json_parse_corrupt_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    seeded = F.when(
        F.col("event_id") % 100 == 0, F.concat(F.lit("{broken"), F.col("props"))
    ).otherwise(F.col("props"))
    parsed = F.from_json(seeded, "struct<k:bigint>")
    return (
        t(spark, sf_dir, "events")
        .select("event_type", parsed["k"].alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("k").cast("bigint").alias("n_parsed"),
            (F.count("*") - F.count("k")).cast("bigint").alias("n_corrupt"),
        )
    )


@register(
    "json_variant_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS item,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
    doc="Semi-structured ingestion through Spark 4's VARIANT type: "
    "``parse_json`` decodes each props payload ONCE into the binary "
    "variant encoding, then typed ``try_variant_get`` paths extract "
    "fields without re-parsing text per access — the modern lakehouse "
    "answer to schemaless JSON columns at scale (parse once at ingest, "
    "store variant, extract many). Malformed payloads yield NULL "
    "(try_ semantics) instead of failing the scan. The aggregate "
    "itself is an ordinary map-side-combinable groupBy.",
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        F.parse_json("props").alias("v"), "value"
    )
    return (
        ev.select(F.try_variant_get("v", "$.k", "int").alias("item"), "value")
        .groupBy("item")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            r4(F.avg("value")).alias("avg_value"),
        )
    )


@register(
    "str_xml_extract",
    oracle="""
    SELECT doc_id, source, lang, n_chars AS n
    FROM documents
    """,
    doc="Spark 4 native XML parsing (from_xml): each document's metadata "
    "is serialized to an XML fragment and parsed back with an explicit "
    "struct schema; the oracle selects the original columns, so the "
    "whole serialize→parse loop must be lossless for the hash to match. "
    "The XML path matters for ingest breadth (feeds, sitemaps, legacy "
    "filing formats are XML); like the JSON keys this is a pure map "
    "stage — no shuffle, whole-stage codegen around the parse.",
)
def str_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # alphanumeric columns only — no escaping concerns in the fragment
    xml = F.concat(
        F.lit("<d><s>"), F.col("source"),
        F.lit("</s><l>"), F.col("lang"),
        F.lit("</l><n>"), F.col("n_chars").cast("string"),
        F.lit("</n></d>"),
    )
    parsed = F.from_xml(xml, "s string, l string, n bigint")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        parsed["s"].alias("source"),
        parsed["l"].alias("lang"),
        parsed["n"].alias("n"),
    )


@register(
    "str_try_cast_battery",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 'n/a'
                  WHEN doc_id % 7 = 1 THEN ' ' || CAST(n_chars AS VARCHAR) || ' '
                  WHEN doc_id % 7 = 2 THEN CAST(n_chars AS VARCHAR) || '.5'
                  WHEN doc_id % 7 = 3 THEN '-' || CAST(n_chars AS VARCHAR)
                  WHEN doc_id % 7 = 4 THEN '12abc'
                  WHEN doc_id % 7 = 5 THEN ''
                  ELSE CAST(n_chars AS VARCHAR) END AS s
      FROM documents
    )
    SELECT doc_id, s,
           TRY_CAST(s AS DOUBLE) AS as_double,
           (TRY_CAST(s AS DOUBLE) IS NULL) AS unparseable
    FROM raw
    """,
    doc="Garbage-tolerant numeric parsing: a battery of messy numeric "
    "strings (whitespace-padded, decimal, negative, trailing-garbage, empty, "
    "sentinel text — built deterministically from fixture columns) "
    "pushed through try_cast to double with an unparseable flag. Under "
    "ANSI mode (this engine's default) a plain CAST THROWS on the first "
    "bad row, so try_cast IS the ingest path for untyped columns. The "
    "DOUBLE target is where engines agree cell-for-cell; integral "
    "try_cast is deliberately omitted — DuckDB ROUNDS '103.5' to 104 "
    "and accepts '1e3' where Spark yields NULL for both, a documented "
    "cross-engine semantic divergence. Pure map stage.",
)
def str_try_cast_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = F.col("n_chars").cast("string")
    s = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("n/a"))
        .when(F.col("doc_id") % 7 == 1, F.concat(F.lit(" "), n, F.lit(" ")))
        .when(F.col("doc_id") % 7 == 2, F.concat(n, F.lit(".5")))
        .when(F.col("doc_id") % 7 == 3, F.concat(F.lit("-"), n))
        .when(F.col("doc_id") % 7 == 4, F.lit("12abc"))
        .when(F.col("doc_id") % 7 == 5, F.lit(""))
        .otherwise(n)
    )
    d = t(spark, sf_dir, "documents").select("doc_id", s.alias("s"))
    return d.select(
        "doc_id",
        "s",
        F.expr("try_cast(s AS DOUBLE)").alias("as_double"),
        F.expr("try_cast(s AS DOUBLE) IS NULL").alias("unparseable"),
    )


@register(
    "str_multiformat_dates",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                  WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%d/%m/%Y')
                  WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%m-%d-%Y')
                  ELSE 'unknown' END AS s
      FROM orders
    )
    SELECT o_orderkey, s,
           strftime(coalesce(
             try_strptime(s, '%Y-%m-%d'),
             try_strptime(s, '%d/%m/%Y'),
             try_strptime(s, '%m-%d-%Y')), '%Y-%m-%d') AS parsed,
           (coalesce(
             try_strptime(s, '%Y-%m-%d'),
             try_strptime(s, '%d/%m/%Y'),
             try_strptime(s, '%m-%d-%Y')) IS NULL) AS unparsed
    FROM raw
    """,
    doc="Multi-format date normalization: order dates serialized into "
    "three regional formats (ISO, day-first, month-first) plus a "
    "sentinel, then parsed back through a try-parse fallback chain "
    "(first format that matches wins) and re-emitted as ISO strings — "
    "the messy-date ingest every cross-source pipeline needs, with "
    "unparseable rows flagged instead of failing the scan (ANSI-mode "
    "discipline, same family as str_try_cast_battery). Pure map stage; "
    "the ISO-string output keeps both engines' timestamp rendering out "
    "of the comparison. Ambiguity caveat pinned by construction: "
    "day-first and month-first only disagree when both fields are ≤12, "
    "and the fallback ORDER is the policy a real pipeline must choose.",
)
def str_multiformat_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("o_orderdate")
    s = (
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format(d, "dd/MM/yyyy"))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format(d, "MM-dd-yyyy"))
        .otherwise(F.lit("unknown"))
    )
    raw = t(spark, sf_dir, "orders").select("o_orderkey", s.alias("s"))
    parsed_ts = F.coalesce(
        F.try_to_timestamp(F.col("s"), F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(F.col("s"), F.lit("dd/MM/yyyy")),
        F.try_to_timestamp(F.col("s"), F.lit("MM-dd-yyyy")),
    )
    return raw.select(
        "o_orderkey",
        "s",
        F.date_format(parsed_ts, "yyyy-MM-dd").alias("parsed"),
        parsed_ts.isNull().alias("unparsed"),
    )
