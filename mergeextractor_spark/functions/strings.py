"""Scalar string battery (SURVEY §2.7) as native Column functions.

Every helper compiles to JVM-side Catalyst expressions (whole-stage
codegen) — no Python UDFs — so they vectorize and survive a 100 TB scan.
Reference citations per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_parens(c: Column) -> Column:
    """Remove parenthesized content + trim. Ref: CrawlerSupport.py:188-190."""
    return F.trim(F.regexp_replace(c, r"\(.*?\)", ""))


def drop_last_word(c: Column) -> Column:
    """Drop the last whitespace-separated word. Ref: Processor.py:30-41."""
    words = F.split(F.trim(c), r"\s+")
    n = F.size(words)
    return F.when(n <= 1, F.trim(c)).otherwise(F.array_join(F.slice(words, 1, n - 1), " "))


MERGE_WORDS = ["net", "com", "org", "co"]


def company_loose_name(c: Column) -> Column:
    """The reference's loose-match name builder (Processor.py:30-64):
    strip parenthesized content, split on whitespace/underscore, merge the
    FIRST domain-like token ('net','com','org','co') with its successor as
    'tok.next' (one merge only, never the last word), then drop a trailing
    '& X' pair or the last word. Pure array expressions with indexed
    lambdas — no UDF."""
    clean = F.trim(F.regexp_replace(c, r"\(.*?\)", ""))
    words = F.split(clean, r"[\s_]+")
    n = F.size(words)
    pos = F.array_min(
        F.filter(
            F.transform(
                words,
                lambda w, i: F.when(F.lower(w).isin(MERGE_WORDS) & (i < n - 1), i),
            ),
            lambda x: x.isNotNull(),
        )
    )
    head = F.when(pos > 0, F.slice(words, 1, pos)).otherwise(F.array().cast("array<string>"))
    mid = F.array(
        F.concat(F.element_at(words, pos + 1), F.lit("."), F.element_at(words, pos + 2))
    )
    tail_len = n - (pos + 2)
    tail = F.when(tail_len > 0, F.slice(words, pos + 3, tail_len)).otherwise(
        F.array().cast("array<string>")
    )
    merged = F.when(pos.isNotNull(), F.concat(head, mid, tail)).otherwise(words)
    m = F.size(merged)
    dropped = F.when(
        m > 1,
        F.when(F.element_at(merged, m - 1) == "&", F.slice(merged, 1, m - 2)).otherwise(
            F.slice(merged, 1, m - 1)
        ),
    ).otherwise(merged)
    return F.array_join(dropped, " ")


def first_token(c: Column) -> Column:
    """First word, minus domain suffix. Ref: ChunkProcessor.py:414."""
    return F.element_at(F.split(F.element_at(F.split(F.lower(F.trim(c)), r"\s+"), 1), r"\."), 1)


def replace_dash(c: Column) -> Column:
    """Hyphen → space. Ref: CrawlerSupport.py:426-429."""
    return F.regexp_replace(c, "-", " ")


def lstrip_zeros(c: Column) -> Column:
    """Strip leading zeros (CIK normalization). Ref: CrawlerSupport.py:342."""
    return F.regexp_replace(c, "^0+", "")


def regex_extract_cik(c: Column) -> Column:
    """Extract the CIK digits from '(CIK 0001234)'. Ref: CrawlerSupport.py:152."""
    return F.regexp_extract(c, r"\(CIK (\d+)\)", 1)


def build_filing_url(cik: Column, adsh: Column) -> Column:
    """EDGAR archive URL assembly. Ref: CrawlerSupport.py:345-349."""
    return F.concat(
        F.lit("https://www.sec.gov/Archives/edgar/data/"),
        cik,
        F.lit("/"),
        F.regexp_replace(adsh, "-", ""),
        F.lit("/"),
        adsh,
        F.lit(".txt"),
    )


def urlencode_spaces(c: Column) -> Column:
    """Spaces → %20 for query-string building. Ref: CrawlerSupport.py:116."""
    return F.regexp_replace(c, " ", "%20")


def drop_page_numbers(c: Column) -> Column:
    """Remove standalone page-number lines. Ref: Processor.py:122-125."""
    return F.regexp_replace(c, r"(?m)^\s*\d+\s*$", "")


def collapse_newlines(c: Column) -> Column:
    """Collapse runs of blank lines to one blank line. Ref: Processor.py:127-128."""
    return F.regexp_replace(c, r"\n\s*\n+", "\n\n")


def strip_toc_phrases(c: Column) -> Column:
    """Remove 'table of contents' phrases with the reference's exact
    TWO-pass semantics (Processor.py:149-150): pass 1 removes
    word-bounded occurrences, pass 2 removes any remaining embedded
    ones. One combined pass is NOT equivalent: a word-adjacent spaced
    phrase ('Table Of Contentsxs') fails pass 1's \\b but is caught by
    the unbounded pass 2, and a pass-1 removal can expose a pass-2
    match — divergences found and pinned by the r9 property test
    (tests/test_twin_properties.py)."""
    p1 = F.regexp_replace(
        c, r"(?i)\btable\s*of\s*contents?\b|\btableofcontents?\b", ""
    )
    return F.regexp_replace(p1, r"(?i)table\s*of\s*contents?|tableofcontents?", "")


def truncate_content(c: Column, limit: int = 450_000) -> Column:
    """Cap content length. Ref: Processor.py:178-181."""
    return F.substring(c, 1, limit)


def html_to_text(c: Column) -> Column:
    """HTML → text, re-expressed as a native regex chain (the reference uses
    lxml row-at-a-time; ref Processor.py:95-130 and the improved
    tools/patchabbrev.py:48-85). Block-level closing tags become newlines,
    all other tags are stripped, common entities decoded, page-number lines
    and blank-line runs collapsed. Pure Catalyst expressions → codegen.

    Parity envelope (ADVICE r9): the trailing strip below uses regex
    ``\\s``, which is ASCII-only in BOTH Java regex (Spark) and RE2
    (DuckDB) — so the two engines agree with each other and the hash
    gate holds — but the reference's Python ``.strip()``
    (Processor.py:130) strips Unicode whitespace (NBSP, U+2028,
    U+0085, ...). Reference parity therefore diverges only on documents
    whose html_to_text output ends in non-ASCII whitespace; the
    entity pass already folds ``&nbsp;`` before this point, which
    covers the form HTML actually emits. Same envelope-restriction
    class that tests/test_twin_properties.py documents per key.
    """
    t = F.regexp_replace(c, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    t = F.regexp_replace(
        t, r"(?i)</(p|div|li|h[1-6]|blockquote|tr|table|ul|ol)>|<br\s*/?>", "\n"
    )
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, rep in [
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
    ]:
        t = F.regexp_replace(t, ent, rep)
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = drop_page_numbers(t)
    t = collapse_newlines(t)
    # Python str.strip() strips ALL whitespace (the reference's trailing
    # .strip(), Processor.py:130) — trim() strips spaces only, which
    # would keep a trailing newline left by a final block tag
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def normalize_quotes(c: Column) -> Column:
    """Unicode quote folding via a static char map (the reference computes
    it dynamically from unicodedata categories — tools/patchabbrev.py:
    87-107; collapsed here to a translate() over the chars that matter).
    The map is EXHAUSTIVELY equal to the reference rule over the whole
    Unicode space (pinned by tests/test_twin_properties.py, which
    re-derives the rule from unicodedata and diffs every code point):
    the r9 audit found the old map normalized U+02BC MODIFIER LETTER
    APOSTROPHE (category Lm — NOT a quote to the reference) and missed
    the four ornament quotes U+275B-275E from its _EXTRA_QUOTES set."""
    singles = "‘’‚‛‹›❛❜"
    doubles = "“”„‟«»❝❞"
    return F.translate(c, singles + doubles, "'" * len(singles) + '"' * len(doubles))


def mojibake_repair(c: Column) -> Column:
    """cp1252 mojibake repair: stray C1 control chars \u0091-\u0097/\u0085 to
    proper Unicode punctuation, NBSP to space. Ref: tools/patchabbrev.py:25-33,
    53-56. translate() is a single codegen'd pass."""
    src_chars = "\u0091\u0092\u0093\u0094\u0096\u0097\u0085\u00a0"
    dst_chars = "\u2018\u2019\u201c\u201d\u2013\u2014\u2026 "
    return F.translate(c, src_chars, dst_chars)


def word_boundary_pattern(name: Column, flex_whitespace: bool = False) -> Column:
    """Build a \\b<literal>\\b regex from a (lowercased) name, escaping regex
    metachars. Used by filter_company_presence (ref Processor.py:181-186).
    ``flex_whitespace`` lets spaces in the name match any whitespace run —
    filings wrap prose at terminal width, so a multi-word name can straddle
    a line break."""
    escaped = F.regexp_replace(name, r"([\\.\[\]\{\}\(\)\*\+\?\^\$\|])", r"\\$1")
    if flex_whitespace:
        escaped = F.regexp_replace(escaped, r"\s+", r"\\s+")
    return F.concat(F.lit(r"\b"), escaped, F.lit(r"\b"))
