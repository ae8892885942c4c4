"""CCNet-style paragraph dedup: keep-first semantics, rebuild order, and
the delimiter-split production form (the registered fixture form is
oracle-checked via tools/selfcheck.py / the driver gate)."""

from pyspark.sql import functions as F

from mergeextractor_spark.operators.dedup import paragraph_dedup_df


def test_paragraph_dedup_keep_first_and_rebuild(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\nshared paragraph\ngamma"),
            (2, "shared paragraph\ndelta"),          # loses the shared para
            (3, "Shared Paragraph\nepsilon"),        # case-insensitive dup
            (4, "alpha beta\nshared paragraph\ngamma"),  # full dup of doc 1
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in paragraph_dedup_df(docs).collect()}
    assert out[1]["clean_text"] == "alpha beta\nshared paragraph\ngamma"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (3, 0)
    assert out[2]["clean_text"] == "delta"
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 1)
    # normalization is lower(): the cased copy still drops, original casing
    # of the KEPT paragraphs is preserved in the rebuild
    assert out[3]["clean_text"] == "epsilon"
    assert out[4]["clean_text"] == ""
    assert (out[4]["n_kept"], out[4]["n_dropped"]) == (0, 3)


def test_paragraph_dedup_blank_paragraphs_ignored(spark):
    docs = spark.createDataFrame(
        [(1, "a\n\n\nb"), (2, "  \nc")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in paragraph_dedup_df(docs).collect()}
    # runs of delimiters / whitespace-only paragraphs never enter the
    # hash space, so they can't alias each other into fake duplicates
    assert out[1]["clean_text"] == "a\nb"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 0
    assert out[2]["clean_text"] == "c"
