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


def test_paragraph_dedup_invariants_random_corpus(spark):
    """Seeded random corpus: (1) kept+dropped == non-blank paragraph count,
    (2) kept paragraphs are globally unique (case-folded), (3) a second
    dedup pass over the rebuilt corpus drops nothing (idempotence)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    shared_pool = [
        " ".join(rng.choices(vocab, k=rng.randint(3, 6))) for _ in range(8)
    ]
    docs = []
    for d in range(30):
        paras = []
        for _ in range(rng.randint(1, 6)):
            if rng.random() < 0.5:
                paras.append(rng.choice(shared_pool))
            else:
                paras.append(" ".join(rng.choices(vocab, k=rng.randint(3, 6))))
        docs.append((d, "\n".join(paras)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    out = paragraph_dedup_df(df).collect()
    n_paras = sum(
        len([p for p in text.split("\n") if p.strip()]) for _, text in docs
    )
    assert sum(r["n_kept"] + r["n_dropped"] for r in out) == n_paras

    kept = [
        p.lower()
        for r in out
        for p in r["clean_text"].split("\n")
        if p.strip()
    ]
    assert len(kept) == len(set(kept)) == sum(r["n_kept"] for r in out)

    again = spark.createDataFrame(
        [(r["doc_id"], r["clean_text"]) for r in out], ["doc_id", "text"]
    )
    out2 = paragraph_dedup_df(again).collect()
    assert sum(r["n_dropped"] for r in out2) == 0
