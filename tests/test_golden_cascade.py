"""Golden cascade corpus: the reference ships 10 curated positive and 8
curated negative "Background of the merger" snippets
(/root/reference/tools/createqueryembed.py:8-458, public SEC-filing
excerpts used to build its query embedding). This test seeds them
directly from the reference file (parsed with ``ast`` — never executed)
and asserts our cascade + embedding stages reproduce the reference's
behavior on all 18.

Two facts pinned here, established by hand-tracing the reference gates
(ChunkProcessor.py:34-169):

1. The CASCADE accepts all 10 positives, and rejects negatives 3/6/8 —
   but ACCEPTS negatives 1/2/4/5/7, in the reference too (e.g.
   negative_example4's two-line TOC entries pass has_section_title, and
   its toc_like/paragraph_like counts pass is_not_toc). The curated
   negatives are hard negatives for the EMBEDDING stage, not cascade
   rejects.
2. The reference's actual defense is the query embedding
   (mean(pos) − 1.5·mean(neg), createqueryembed.py:498-527): under it,
   every positive must outscore every negative — which holds for our
   hash-embedder stand-in as well.
"""

from __future__ import annotations

import ast
import math
import os

import pytest

from mergeextractor_spark.functions.embedding import hash_embed
from mergeextractor_spark.operators.cascade import two_pass_passage

_REF_FILE = "/root/reference/tools/createqueryembed.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF_FILE), reason="reference corpus not present"
)

CASCADE_REJECTED_NEGATIVES = {"negative_example3", "negative_example6", "negative_example8"}


def _load_snippets() -> dict[str, str]:
    """Pull the string literals out of the reference module WITHOUT
    executing it (untrusted content; ast only)."""
    tree = ast.parse(open(_REF_FILE).read())
    out = {}
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
            and isinstance(node.value, ast.Constant)
            and isinstance(node.value.value, str)
        ):
            name = node.targets[0].id
            if name.startswith("example") or name.startswith("negative_example"):
                out[name] = node.value.value
    return out


@pytest.fixture(scope="module")
def corpus():
    snips = _load_snippets()
    assert len(snips) == 18, f"expected 18 snippets, got {sorted(snips)}"
    pos = {n: s for n, s in snips.items() if not n.startswith("negative")}
    neg = {n: s for n, s in snips.items() if n.startswith("negative")}
    assert len(pos) == 10 and len(neg) == 8
    return pos, neg


def test_cascade_accepts_all_positives(corpus):
    pos, _ = corpus
    for name, snippet in pos.items():
        passage = two_pass_passage(snippet)
        assert passage is not None, f"{name} rejected by cascade"
        # the passage must start at the header line, not mid-snippet
        assert "background" in passage.splitlines()[0].lower(), name


def test_cascade_negative_pins(corpus):
    _, neg = corpus
    rejected = {n for n, s in neg.items() if two_pass_passage(s) is None}
    assert rejected == CASCADE_REJECTED_NEGATIVES


def _mean(vecs: list[list[float]]) -> list[float]:
    return [sum(c) / len(vecs) for c in zip(*vecs)]


def _cos(a: list[float], b: list[float]) -> float:
    na = math.sqrt(sum(x * x for x in a)) or 1.0
    nb = math.sqrt(sum(x * x for x in b)) or 1.0
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


def test_query_embedding_separates_pos_from_neg(corpus):
    """createqueryembed.py:498-527 semantics: q = mean(pos) − 1.5·mean(neg),
    normalized. Every positive must outscore every negative under cosine —
    this is the stage that filters the TOC-like negatives the cascade lets
    through."""
    pos, neg = corpus
    pv = [hash_embed(s) for s in pos.values()]
    nv = [hash_embed(s) for s in neg.values()]
    q = [a - 1.5 * b for a, b in zip(_mean(pv), _mean(nv))]
    assert min(_cos(q, v) for v in pv) > max(_cos(q, v) for v in nv)


def test_cascade_udf_matches_pure_python(corpus, spark):
    """The Spark plumbing (prefilter + pandas UDF) must agree with the
    pure-python cascade on the full corpus."""
    from mergeextractor_spark.operators.cascade import filter_background_chunks

    pos, neg = corpus
    rows = [{"name": n, "chunk": s} for n, s in {**pos, **neg}.items()]
    df = spark.createDataFrame(rows).coalesce(1)
    accepted = {r["name"] for r in filter_background_chunks(df).select("name").collect()}
    expected = {n for n, s in {**pos, **neg}.items() if two_pass_passage(s)}
    assert accepted == expected
