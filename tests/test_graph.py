"""Graph analytics: transition-matrix invariants and PageRank against a
numpy reference on crafted graphs."""

import numpy as np
import pytest

from mergeextractor_spark.operators.graph_queries import (
    PR_DAMPING,
    PR_ITERS,
    graph_item_transitions,
    pagerank,
)

SF = "/root/testdata/sf0.001"


def test_transition_probabilities_normalize(spark):
    rows = graph_item_transitions(spark, SF).collect()
    assert rows, "no transition edges derived from events"
    by_src = {}
    for r in rows:
        assert r.n >= 1 and 0.0 < r.p <= 1.0
        by_src.setdefault(r.src, 0.0)
        by_src[r.src] += r.p
    for src, total in by_src.items():
        # per-source probabilities sum to 1 (up to the 4dp rounding)
        assert abs(total - 1.0) < 1e-3, (src, total)


def _numpy_pagerank(edges, iters=PR_ITERS, d=PR_DAMPING):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for s, t, p in edges:
            nxt[idx[t]] += d * rank[idx[s]] * p
        rank = nxt
    return {node: rank[idx[node]] for node in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        # 3-cycle: uniform is the fixed point, every iterate stays 1/3
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)],
        # hub-and-spoke with a dangling sink (4 has no out-edges: its
        # mass leaks, the documented simplified-variant semantics)
        [(1, 2, 0.5), (1, 3, 0.5), (2, 4, 1.0), (3, 4, 1.0)],
        # asymmetric weights
        [(1, 2, 0.9), (1, 3, 0.1), (2, 1, 1.0), (3, 1, 1.0)],
    ],
)
def test_pagerank_matches_numpy_reference(spark, edges):
    df = spark.createDataFrame(edges, "src int, dst int, p double")
    got = {r.node: r.rank for r in pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-9), node


def test_pagerank_cycle_stays_uniform(spark):
    df = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)], "src int, dst int, p double"
    )
    got = {r.node: r.rank for r in pagerank(df).collect()}
    assert all(abs(v - 1.0 / 3.0) < 1e-12 for v in got.values())


def test_truncate_lineage_reliable_checkpoint_optin(spark, tmp_path):
    """Setting spark.mergeextractor.checkpointDir switches every iterative
    operator from executor-pinned localCheckpoint to durable reliable
    checkpoints (VERDICT r5 item 7) — and the default stays local."""
    from pyspark.sql import functions as F

    from mergeextractor_spark.operators._util import truncate_lineage

    sc = spark.sparkContext
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))

    # default path: no checkpoint dir -> localCheckpoint, nothing on disk
    assert sc.getCheckpointDir() is None
    out = truncate_lineage(df)
    assert out.count() == 100
    assert sc.getCheckpointDir() is None

    ckpt = tmp_path / "ckpt"
    spark.conf.set("spark.mergeextractor.checkpointDir", str(ckpt))
    try:
        # reliable mode without the startup-only cleaner conf warns ONCE
        # that superseded checkpoint files accumulate (ADVICE r6)
        import warnings

        truncate_lineage._warned_cleaner = False
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = truncate_lineage(df)
            assert out.count() == 100
            out2 = truncate_lineage(df)
            assert out2.count() == 100
        hits = [x for x in w if "cleanCheckpoints" in str(x.message)]
        assert len(hits) == 1, [str(x.message) for x in w]
        # reliable checkpoint wrote RDD blocks under the configured dir
        files = list(ckpt.rglob("*"))
        assert any(p.name.startswith("part-") for p in files), files
    finally:
        spark.conf.unset("spark.mergeextractor.checkpointDir")
        sc.setCheckpointDir(None)  # Option(null) resets to None JVM-side
    assert sc.getCheckpointDir() is None


def _tri(spark, edges):
    from mergeextractor_spark.operators.graph_queries import triangle_frame

    df = spark.createDataFrame(edges, "a int, b int")
    return triangle_frame(df).collect()[0]


def test_triangle_census_known_graphs(spark):
    # K4: C(4,3)=4 triangles, 12 wedges, clustering exactly 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _tri(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert abs(r.global_clustering - 1.0) < 1e-9

    # star S5: all wedges open, zero triangles
    star = [(0, b) for b in range(1, 6)]
    r = _tri(spark, star)
    assert (r.n_triangles, r.n_wedges) == (0, 10)
    assert r.global_clustering == 0.0

    # path 0-1-2-3: two wedges, no triangle
    r = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 3, 2, 0)

    # perfect matching: zero wedges -> clustering 0.0, not NULL (guard)
    r = _tri(spark, [(0, 1), (2, 3), (4, 5)])
    assert (r.n_wedges, r.n_triangles) == (0, 0)
    assert r.global_clustering == 0.0

    # K4 plus a pendant: same 4 triangles, wedges grow by the pendant's
    # apex contribution (deg(0) 3->4: +3 wedges at node 0)
    r = _tri(spark, k4 + [(0, 9)])
    assert (r.n_triangles, r.n_wedges) == (4, 15)
    assert abs(r.global_clustering - 12 / 15) < 1e-9


def test_triangle_census_matches_bruteforce_random(spark):
    # deterministic pseudo-random graph via md5 parity, checked against
    # an O(n^3) python count — the oriented decomposition drops nothing
    import hashlib
    import itertools

    nodes = list(range(24))
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if hashlib.md5(f"{a}-{b}".encode()).digest()[0] % 3 == 0
    ]
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    r = _tri(spark, edges)
    assert r.n_triangles == want
    assert r.n_edges == len(edges)
