from mergeextractor_spark.operators.cascade import (
    FALLBACK_PHRASES,
    START_PHRASES,
    extract_passage,
    has_section_title,
    is_not_toc,
    locate_chunk_header,
    two_pass_passage,
)

NARR = (
    "On March 5, 2002, representatives of the two companies met to discuss "
    "a potential combination. The discussions continued through the spring "
    "and the definitive agreement was executed on September 9, 2002 after "
    "extensive negotiation of the exchange ratio and termination provisions."
)

GOOD_CHUNK = f"Background of the Merger\n\n{NARR}\n\n{NARR}"

TOC_CHUNK = (
    "Summary....3\n\nBackground of the Merger....17\n\nOpinion of the "
    "Advisor....24\n\nInterests of Directors....31\n\nWhere You Can Find "
    "More Information....40\n"
)


def test_locate_header_positive():
    assert locate_chunk_header(GOOD_CHUNK, START_PHRASES) == "background of the merger"


def test_locate_header_skip_terms():
    chunk = f"Amended and Restated Background of the Merger\n\n{NARR}"
    # sentence-level match rejected by skip terms; line-level may still fire,
    # but the title line then carries 'amended' → has_section_title rejects
    phrase = locate_chunk_header(chunk, START_PHRASES)
    if phrase:
        assert not has_section_title(chunk, phrase)


def test_bare_background_requires_exact_line():
    chunk = f"Background\n\n{NARR}\n\n{NARR}"
    assert locate_chunk_header(chunk, FALLBACK_PHRASES) == "Background"
    noisy = f"Some background information follows.\n\n{NARR}"
    assert locate_chunk_header(noisy, FALLBACK_PHRASES) is None


def test_section_title_short_paragraph():
    assert has_section_title(GOOD_CHUNK, "background of the merger")
    buried = f"{NARR} background of the merger {NARR}\nmore text\nthird line"
    assert not has_section_title(buried, "background of the merger")


def test_toc_rejected():
    assert not is_not_toc(TOC_CHUNK, "background of the merger")
    assert is_not_toc(GOOD_CHUNK, "background of the merger")


def test_extract_passage_full_cascade():
    passage = extract_passage(GOOD_CHUNK, START_PHRASES)
    assert passage is not None
    assert passage.startswith("Background of the Merger")
    assert len(passage) > 200


def test_extract_passage_rejects_short():
    short = "Background of the Merger\n\nToo short."
    assert extract_passage(short, START_PHRASES) is None


def test_extract_passage_rejects_stop_title():
    chunk = f"Background of the Merger and the Industry Overview\n\n{NARR}\n\n{NARR}"
    assert extract_passage(chunk, START_PHRASES) is None


def test_two_pass_prefers_specific_then_fallback():
    bare = f"Background\n\n{NARR}\n\n{NARR}"
    assert two_pass_passage(bare) is not None
    assert two_pass_passage(TOC_CHUNK) is None
