"""Graph analytics over the event stream: the item-transition graph
(Markov next-item matrix) and damped PageRank over it.

The graph is DERIVED — consecutive items within each user's event
stream become directed, probability-weighted edges — so these two keys
also demonstrate the sessionize -> graph -> iterative-algorithm chain a
behavioral-analytics pipeline runs. PageRank is the canonical
iterative-join workload: each round is one edge-rank join + one
aggregate, with lineage truncated per round (localCheckpoint, the
dedup_components discipline) so round R never replays rounds 1..R-1.
The DuckDB oracle unrolls the same fixed iteration count as chained
CTEs — value-level parity for an iterative algorithm, not rows-only.

Scale posture (100 TB of events): transition extraction is one window
shuffle on user_id; the edge list aggregates to |items|^2 at most (far
smaller than the event stream); each PageRank round shuffles only
(node, rank) pairs and the node-count is a broadcast 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._util import t, r4

PR_DAMPING = 0.85
PR_ITERS = 5

_EDGES_SQL = r"""
    ev AS (
      SELECT user_id, ts, event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS item
      FROM events
    ),
    hops AS (
      SELECT item AS src,
             lead(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM ev
    ),
    ecnt AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      FROM hops WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    edges AS (
      SELECT src, dst, n,
             n::DOUBLE / sum(n) OVER (PARTITION BY src) AS p
      FROM ecnt
    )
"""


@register(
    "graph_item_transitions",
    oracle=f"""
    WITH {_EDGES_SQL}
    SELECT src, dst, n, round(p, 4) AS p
    FROM edges
    """,
    doc="Markov next-item transition matrix: order each user's event "
    "stream by time (event_id tiebreak), pair every item with its "
    "successor, and normalize counts into per-source transition "
    "probabilities — the 'users who touched X next touch Y' model "
    "behind session-based recommenders and funnel diagnostics. One "
    "window shuffle on user_id to form hops, then a map-side-combinable "
    "pair count; the normalizing window runs over the item-pair table "
    "(|items|^2 max), never the event stream.",
)
def graph_item_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _transition_edges(spark, sf_dir).select(
        "src", "dst", "n", r4(F.col("p")).alias("p")
    )


def _transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("item"),
    )
    hop_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hops = ev.select(
        F.col("item").alias("src"), F.lead("item").over(hop_w).alias("dst")
    ).filter(F.col("dst").isNotNull())
    ecnt = hops.groupBy("src", "dst").agg(F.count("*").cast("bigint").alias("n"))
    norm_w = W.partitionBy("src")
    return ecnt.withColumn(
        "p", F.col("n").cast("double") / F.sum("n").over(norm_w)
    )


def _pagerank_oracle() -> str:
    parts = [
        f"WITH {_EDGES_SQL}",
        """,
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    ncnt AS (SELECT count(*)::DOUBLE AS cnt FROM nodes),
    r0 AS (SELECT node, 1.0 / cnt AS rank FROM nodes CROSS JOIN ncnt)
    """,
    ]
    d = PR_DAMPING
    for k in range(1, PR_ITERS + 1):
        parts.append(
            f""",
    r{k} AS (
      SELECT n.node, (1.0 - {d}) / c.cnt + {d} * coalesce(s.m, 0.0) AS rank
      FROM nodes n CROSS JOIN ncnt c
      LEFT JOIN (SELECT e.dst AS node, sum(r.rank * e.p) AS m
                 FROM edges e JOIN r{k - 1} r ON r.node = e.src
                 GROUP BY e.dst) s
      ON s.node = n.node
    )"""
        )
    parts.append(
        f"""
    SELECT node AS item, round(rank, 4) AS pagerank
    FROM r{PR_ITERS}
    """
    )
    return "".join(parts)


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc=f"Damped PageRank (d={PR_DAMPING}, {PR_ITERS} fixed iterations) "
    "over the probability-weighted item-transition graph — 'which items "
    "sit at the center of user journeys'. Simplified variant: dangling "
    "nodes (no out-edges) leak their mass rather than redistributing it, "
    "identically in both engines. Each round is one rank-edge join, one "
    "aggregate on dst, and a left join back to the node set, with "
    "lineage truncated per round so the composed plan stays flat; the "
    "oracle unrolls the identical rounds as chained CTEs, so this "
    "iterative algorithm is value-checked, not rows-only. At 100 TB the "
    "per-round shuffle carries (node, rank) pairs only; the node count "
    "is a broadcast 1-row aggregate.",
    eager=True,  # construction runs the fixed-round propagation loop
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _transition_edges(spark, sf_dir).select("src", "dst", "p")
    ranks = pagerank(edges)
    return ranks.select(
        F.col("node").alias("item"), r4(F.col("rank")).alias("pagerank")
    )


def pagerank(
    edges: DataFrame, iters: int = PR_ITERS, damping: float = PR_DAMPING
) -> DataFrame:
    """Damped PageRank over a ``(src, dst, p)`` probability-weighted edge
    table; returns ``(node, rank)``. Lineage is truncated per round."""
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ncnt = F.broadcast(nodes.agg(F.count("*").cast("double").alias("cnt")))
    ranks = nodes.crossJoin(ncnt).select(
        "node", (F.lit(1.0) / F.col("cnt")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", (F.col("rank") * F.col("p")).alias("m"))
            .groupBy("dst")
            .agg(F.sum("m").alias("m"))
        )
        ranks = (
            nodes.crossJoin(ncnt)
            .join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("cnt")
                    + damping * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
