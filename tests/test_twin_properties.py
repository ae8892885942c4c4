"""Property tests for three more SQL-twin equivalence claims (VERDICT r8
item 7): the r8 cascade_toc_check failure showed fixture-green +
oracle-green can still hide reference divergence — the oracle proves
cross-engine agreement, not reference parity. These tests mirror each
registered key's SQL algorithm 1:1 in Python and pit it against a 1:1
mirror of the cited reference code under hypothesis-generated inputs.

Envelopes (each documented at the key): inputs use '\\n' separators and
space/tab intra-line whitespace only (no NBSP/\\r/\\x0b — the reference
normalizes NBSP upstream via _fix_quotes_and_spaces, and the fixture
text carries none); set_distinct_lines tokens carry no whitespace (the
key splits on ' ', and the fixture 300-char heads contain no tab or
newline — verified across sf0.001/0.01/0.1); html blocks contain no
'<'/'>' text content and no intra-block blank line (the regex
block-splitter cannot see a blank line inside one leaf block, lxml can
— the documented approximation boundary of the regex twin).
"""

from __future__ import annotations

import calendar
import datetime
import re

from hypothesis import example, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# str_html_to_text_v2  (parity_queries.py; ref tools/patchabbrev.py:48-85)

_BLOCK_CLOSE = re.compile(r"(?i)</(p|div|li|h[1-6]|blockquote)>")


def _html_v2_sql(raw: str) -> str:
    """Python mirror of the str_html_to_text_v2 SQL: closing leaf-block
    tags → blank lines, strip remaining tags, split paragraphs, flatten
    line wrap to single spaces, drop empty/pure-page-number blocks."""
    blocks = _BLOCK_CLOSE.sub("\n\n", raw)
    stripped = re.sub(r"<[^>]+>", "", blocks)
    paras = stripped.split("\n\n")
    flat = [re.sub(r"[ \t]+", " ", p.replace("\n", " ")).strip(" ") for p in paras]
    kept = [p for p in flat if p != "" and not re.fullmatch(r"\d+", p)]
    return "\n\n".join(kept)


def _html_v2_ref(block_texts: list[str]) -> str:
    """1:1 mirror of the reference's paragraph loop
    (patchabbrev.py:71-84): per-line whitespace collapse + strip, join
    non-empty lines with a space, drop empty / pure-digit blocks, join
    with blank lines, collapse 3+ newlines, strip."""
    paras = []
    for t in block_texts:
        lines = [re.sub(r"[ \t]+", " ", ln).strip() for ln in t.splitlines()]
        t2 = " ".join(ln for ln in lines if ln)
        if not t2 or re.fullmatch(r"\d+", t2):
            continue
        paras.append(t2)
    text = "\n\n".join(paras)
    return re.sub(r"\n{3,}", "\n\n", text).strip()


_WORDS = st.sampled_from(
    ["merger", "agreement", "12", "7", "x", "Item", "1.", "page", "of", ""]
)
_LINES_HTML = st.lists(_WORDS, min_size=0, max_size=6).map(" ".join).map(
    lambda s: s.replace("  ", " \t")  # exercise tab collapse
)
# a leaf block: 1..5 lines, none the EMPTY string (an empty line inside
# one block joins to '\n\n', which the regex twin reads as a paragraph
# boundary while lxml keeps it one block — the documented approximation
# boundary; whitespace-only lines like ' ' are fine and exercised)
_BLOCKS = st.lists(
    _LINES_HTML.map(lambda ln: ln if ln != "" else " "),
    min_size=1,
    max_size=5,
).map("\n".join)

_TAGS = st.sampled_from(
    [("<p>", "</p>"), ("<div class='a'>", "</DIV>"), ("<li>", "</li>"),
     ("<h2>", "</h2>"), ("<blockquote>", "</Blockquote>")]
)


@st.composite
def _html_docs(draw):
    blocks = draw(st.lists(_BLOCKS, min_size=0, max_size=5))
    parts, texts = [], []
    for b in blocks:
        op, cl = draw(_TAGS)
        inline = draw(st.booleans())
        body = b.replace("merger", "<b>merger</b>", 1) if inline else b
        parts.append(f"{op}{body}{cl}")
        texts.append(b)
    return "".join(parts), texts


@settings(max_examples=400, deadline=None)
@given(_html_docs())
@example(doc=("<p> 12 </p>", [" 12 "]))
@example(doc=("<p>wrapped\nline</p>", ["wrapped\nline"]))
@example(doc=("<p>a\t b </p><div>a</div>", ["a\t b ", "a"]))
def test_html_v2_sql_form_equals_reference(doc):
    raw, texts = doc
    assert _html_v2_sql(raw) == _html_v2_ref(texts)


# ---------------------------------------------------------------------------
# set_distinct_lines  (text_queries.py; ref ChunkProcessor.py:240-255)


def _distinct_lines_sql(text: str, sep: str) -> str:
    """Python mirror of the set_distinct_lines SQL: first occurrence per
    token (row_number()==1 over pos), blanks always kept, order by pos."""
    out, seen = [], set()
    for tk in text.split(sep):
        if tk == "":
            out.append(tk)
        elif tk not in seen:
            seen.add(tk)
            out.append(tk)
    return "\n".join(out)


def _normalize_chunks_ref(text: str, sep: str) -> str:
    """1:1 mirror of the reference loop (ChunkProcessor.py:240-255,
    __normalize_chunks): dedupe on the STRIPPED line, append the
    original, whitespace-only lines become ''."""
    unique, out = set(), []
    for line in text.split(sep):
        s = line.strip()
        if s:
            if s not in unique:
                unique.add(s)
                out.append(line)
        else:
            out.append("")
    return "\n".join(out)


_TOKENS = st.sampled_from(
    ["the", "merger", "agreement", "12", "a", "b", "x.", "THE", ""]
)
_TOKEN_TEXT = st.lists(_TOKENS, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=400, deadline=None)
@given(_TOKEN_TEXT)
@example("")
@example("a a")
@example("a  a")  # consecutive separators → empty token kept twice
@example("the merger the merger the")
def test_distinct_lines_sql_form_equals_reference(text):
    # whitespace-free tokens: strip() is the identity, so the reference's
    # strip-then-dedupe collapses to the SQL form's dedupe-on-raw (the
    # fixture's 300-char heads carry no tab/newline — module docstring)
    assert _distinct_lines_sql(text, " ") == _normalize_chunks_ref(text, " ")


# ---------------------------------------------------------------------------
# date_window  (functions/dates.py; ref CrawlerSupport.py:30-83)

_FLOOR = datetime.date(2001, 1, 1)


def _window_sql_form(d: datetime.date, m: int):
    """Python mirror of the date_window Column/CASE-WHEN algorithm
    (functions/dates.py date_window_lb/ub + duckdb_date_window_sql)."""
    raw = d.month - m
    lb_mon = raw + 12 if raw <= 0 else raw
    lb_yr = d.year - 1 if raw <= 0 else d.year
    dim = calendar.monthrange(lb_yr, lb_mon)[1]
    lb = (
        datetime.date(lb_yr, lb_mon, 1)
        if d.day > dim
        else datetime.date(lb_yr, lb_mon, d.day)
    )
    lb = max(lb, _FLOOR)
    raw = d.month + m
    ub_mon = raw - 12 if raw > 12 else raw
    ub_yr = d.year + 1 if raw > 12 else d.year
    dim = calendar.monthrange(ub_yr, ub_mon)[1]
    ub = (
        datetime.date(ub_yr, ub_mon + 1, 1)
        if d.day > dim
        else datetime.date(ub_yr, ub_mon, d.day)
    )
    return lb, ub


def _window_ref(d: datetime.date, m: int):
    """1:1 mirror of the reference (CrawlerSupport.py:50-81): replace()
    with try/except ValueError day-overflow fallbacks and the min-date
    floor."""
    lb_month, lb_year = d.month - m, d.year
    if lb_month <= 0:
        lb_month += 12
        lb_year -= 1
    try:
        lb = d.replace(year=lb_year, month=lb_month)
    except ValueError:
        lb = d.replace(year=lb_year, month=lb_month, day=1)
    if lb < _FLOOR:
        lb = _FLOOR
    ub_month, ub_year = d.month + m, d.year
    if ub_month > 12:
        ub_month -= 12
        ub_year += 1
    try:
        ub = d.replace(year=ub_year, month=ub_month)
    except ValueError:
        ub = d.replace(year=ub_year, month=ub_month + 1, day=1)
    return lb, ub


# ---------------------------------------------------------------------------
# str_company_loose  (parity_queries.py; ref Processor.py:30-64)

_MERGE_WORDS = {"net", "com", "org", "co"}


def _company_loose_sql(name: str) -> str:
    """Python mirror of the str_company_loose SQL: strip parens, split on
    [\\s_]+, merge at the MIN qualifying (non-last) domain-word index via
    slicing, then drop a trailing '& X' pair or the last word."""
    clean = re.sub(r"\(.*?\)", "", name)
    words = re.split(r"[\s_]+", clean.strip())
    pos = next(
        (
            i
            for i in range(len(words) - 1)
            if words[i].lower() in _MERGE_WORDS
        ),
        None,
    )
    if pos is not None:
        words = words[:pos] + [words[pos] + "." + words[pos + 1]] + words[pos + 2 :]
    if len(words) > 1:
        words = words[:-2] if words[-2] == "&" else words[:-1]
    return " ".join(words)


def _company_loose_ref(name: str) -> str:
    """1:1 mirror of the reference loop (Processor.py:30-64,
    extract_all_but_last_word): in-place merge of the first domain-like
    word with its successor (break after one), then the trailing-word
    drop."""
    clean_name = re.sub(r"\(.*?\)", "", name)
    words = re.split(r"[\s_]+", clean_name.strip())
    for i in range(len(words) - 1):
        if words[i].lower() in _MERGE_WORDS:
            words[i] = words[i] + "." + words[i + 1]
            words.pop(i + 1)
            break
    if len(words) > 1:
        if words[-2] == "&":
            words = words[:-2]
        else:
            words = words[:-1]
    return " ".join(words)


_NAME_PARTS = st.sampled_from(
    ["Acme", "Net", "net", "com", "Co", "CO", "&", "Group", "Inc",
     "(old name)", "(x (y)", "Holdings", "org", "Partners", ""]
)
_NAMES = st.lists(_NAME_PARTS, min_size=0, max_size=8).map(" ".join).map(
    lambda s: s.replace("Holdings ", "Holdings_")  # exercise the '_' split
)


@settings(max_examples=400, deadline=None)
@given(_NAMES)
@example("Net Acme Group")
@example("Acme (old name) & Partners")
@example("net net Inc")      # only the FIRST domain word merges
@example("Acme net")         # last word never merges
@example("& Co")
@example("")
def test_company_loose_sql_form_equals_reference(name):
    assert _company_loose_sql(name) == _company_loose_ref(name)


# ---------------------------------------------------------------------------
# str_mojibake_repair  (functions/strings.py; ref patchabbrev.py:25-33,53-56)


def test_mojibake_map_equals_reference_map():
    """The repo's translate() source/target strings must stay 1:1 with
    the reference's _CP1252_MOJIBAKE_MAP plus its NBSP->space rule
    (patchabbrev.py:25-33 and 53-56) -- a map-table pin rather than a
    property (translate is pointwise, so map equality IS the claim)."""
    import ast
    import inspect

    from mergeextractor_spark.functions import strings as S

    ref_map = {  # patchabbrev.py:25-33 verbatim, + NBSP from :53-56
        "\u0091": "\u2018",
        "\u0092": "\u2019",
        "\u0093": "\u201C",
        "\u0094": "\u201D",
        "\u0096": "\u2013",
        "\u0097": "\u2014",
        "\u0085": "\u2026",
        "\u00A0": " ",
    }
    src = inspect.getsource(S.mojibake_repair)
    # rebuild the map the repo function encodes (src/dst are the only
    # 8-char string constants; the docstring is longer)
    tree = ast.parse(src.replace("def mojibake_repair", "def f"), mode="exec")
    consts = [
        n.value
        for n in ast.walk(tree)
        if isinstance(n, ast.Constant)
        and isinstance(n.value, str)
        and len(n.value) == 8
    ]
    assert len(consts) == 2, consts
    srcs = [c for c in consts if "\u0091" in c]
    dsts = [c for c in consts if "\u2018" in c]
    assert len(srcs) == 1 and len(dsts) == 1
    got = dict(zip(srcs[0], dsts[0]))
    assert got == ref_map


@settings(max_examples=600, deadline=None)
@given(
    st.dates(datetime.date(1996, 1, 1), datetime.date(2035, 12, 31)),
    st.integers(1, 11),  # one-wrap envelope, same as the reference loop
)
@example(datetime.date(2001, 3, 15), 4)   # LB clamps to the floor
@example(datetime.date(2004, 2, 29), 11)  # leap day, double corner
@example(datetime.date(2003, 10, 31), 4)  # UB Feb 31 → Mar 1 roll
@example(datetime.date(2002, 3, 31), 4)   # LB Nov 31 → day-1 fallback
@example(datetime.date(2003, 12, 31), 4)  # UB Apr 31 → May 1 roll
def test_date_window_sql_form_equals_reference(d, m):
    assert _window_sql_form(d, m) == _window_ref(d, m)

# ---------------------------------------------------------------------------
# str_strip_toc  (functions/strings.py; ref Processor.py:149-150)


def _strip_toc_sql(text: str) -> str:
    """Python mirror of the (r9 two-pass) strip_toc_phrases twin."""
    p1 = re.sub(r"(?i)\btable\s*of\s*contents?\b|\btableofcontents?\b", "", text)
    return re.sub(r"(?i)table\s*of\s*contents?|tableofcontents?", "", p1)


def _strip_toc_ref(text: str) -> str:
    """1:1 mirror of the reference (Processor.py:149-150,
    normalize_text's two sequential re.sub calls)."""
    t = re.sub(
        r"\btable\s*of\s*contents?\b|\btableofcontents?\b",
        "",
        text,
        flags=re.IGNORECASE,
    )
    return re.sub(r"(?i)table\s*of\s*contents?|tableofcontents?", "", t)


_TOC_PARTS = st.sampled_from(
    ["table", "of", "contents", "content", " ", "x", "Table Of Contents",
     "tableofcontents", ".", "ta", "bleofcontents", "s", "see the", "\n"]
)
_TOC_TEXT = st.lists(_TOC_PARTS, min_size=0, max_size=8).map("".join)


@settings(max_examples=500, deadline=None)
@given(_TOC_TEXT)
# discovered failures of the PRE-r9 single-pass twin, kept as pins so a
# regression back to one combined pass cannot pass the suite:
@example("Table Of Contentsxs Table Of Contents")
@example("tatable.Table Of Contentscontent")
@example("tableofcontents. Table Of Contentsof")
@example("Table Of ContentsTable Of Contentstableofcontents table")
@example("")
def test_strip_toc_sql_form_equals_reference(text):
    assert _strip_toc_sql(text) == _strip_toc_ref(text)

# ---------------------------------------------------------------------------
# str_normalize_quotes  (functions/strings.py; ref patchabbrev.py:87-107)


def test_quote_map_exhaustively_equals_reference_rule():
    """The static translate() quote map must equal the reference's
    DYNAMIC unicodedata rule (patchabbrev.py:87-107: _EXTRA_QUOTES plus
    Pi/Pf chars whose name carries QUOTE/QUOTATION/GUILLEMET; singles by
    'SINGLE' in name or the four low/angle marks) at EVERY code point.
    The r9 audit found two map bugs this test now prevents: U+02BC
    MODIFIER LETTER APOSTROPHE folded despite being category Lm (not a
    quote to the reference), and the ornament quotes U+275B-275E
    missing."""
    import unicodedata as ud

    import ast
    import inspect

    from mergeextractor_spark.functions import strings as S

    extra = set("«»‹›‚‛“”„‟❛❜❝❞")

    def ref_fold(ch):
        cat = ud.category(ch)
        name = ud.name(ch, "")
        is_quote = ch in extra or (
            cat in ("Pi", "Pf")
            and ("QUOTE" in name or "QUOTATION" in name or "GUILLEMET" in name)
        )
        if not is_quote:
            return ch
        return "'" if ("SINGLE" in name or ch in set("‹›‚‛")) else '"'

    src = inspect.getsource(S.normalize_quotes)
    tree = ast.parse(src.replace("def normalize_quotes", "def f"), mode="exec")
    assigns = {
        t.id: n.value.value
        for n in ast.walk(tree)
        if isinstance(n, ast.Assign)
        for t in n.targets
        if isinstance(t, ast.Name) and isinstance(n.value, ast.Constant)
    }
    twin = {ch: "'" for ch in assigns["singles"]}
    twin.update({ch: '"' for ch in assigns["doubles"]})
    diffs = []
    for cp in range(0x110000):
        ch = chr(cp)
        r = ref_fold(ch)
        t = twin.get(ch, ch)
        if r != t:
            diffs.append((hex(cp), ud.name(ch, "?"), r, t))
    assert not diffs, diffs[:10]
