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


def test_span_merge_islands(spark, tmp_path):
    """Two disjoint shared runs -> two spans; overlapping windows of one
    25-token shared run merge into a single 25-token span."""
    import mergeextractor_spark.operators.dedup as dd

    shared_a = " ".join(f"a{i}" for i in range(25))   # 25 tokens -> 6 windows
    shared_b = " ".join(f"b{i}" for i in range(20))   # 20 tokens -> 1 window
    docs = spark.createDataFrame(
        [
            # doc 1: sharedA + unique gap + sharedB
            (1, shared_a + " " + " ".join(f"u{i}" for i in range(30)) + " " + shared_b),
            # doc 2: sharedA ... sharedB embedded in different unique text
            (2, " ".join(f"v{i}" for i in range(5)) + " " + shared_a
                + " " + " ".join(f"w{i}" for i in range(25)) + " " + shared_b),
        ],
        ["doc_id", "text"],
    )
    # drive the registered query's plan over the crafted corpus by writing
    # it as a one-table fixture dir
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = dd.dedup_span_merge(spark, sf).orderBy("doc_id", "span_id").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 2
    # doc 1's first span covers exactly the 25 sharedA tokens (1..25):
    # 6 overlapping windows merged into one maximal island
    s1 = by_doc[1][0]
    assert (s1["span_start"], s1["span_end"], s1["span_tokens"], s1["n_windows"]) == (
        1, 25, 25, 6,
    )
    # doc 1's second span is the single sharedB window
    s2 = by_doc[1][1]
    assert s2["span_tokens"] == 20 and s2["n_windows"] == 1
    # doc 2's sharedA span starts after its 5 unique lead tokens
    t1 = by_doc[2][0]
    assert (t1["span_start"], t1["span_tokens"]) == (6, 25)
