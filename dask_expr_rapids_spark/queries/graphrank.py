"""PageRank over the word-transition graph (TextRank, Mihalcea & Tarau
'04): nodes = corpus vocabulary, directed edges = bigram transitions
weighted by count, rank = the damped stationary distribution.  Central
words are the corpus' topical backbone — with connected components and
triangle counting this completes the engine's iterative-graph family.

Not in the reference (pandas algebra only,
``/root/reference/dask_expr/_collection.py``); SURVEY.md §2.13.

Determinism (the CC/k-means discipline): ranks live in integer
micro-units (1e12 total mass), edge probabilities are integer per-1e6
(``(c * 1e6) DIV out_total``), every propagation step is
non-negative-integer multiply + floor division — bit-identical on any
cluster size and in the DuckDB oracle, no float sum anywhere.

Scale posture: ONE corpus shuffle builds the bigram count table
(map-side combinable); every iteration thereafter runs on
vocabulary-sized relations (nodes, edges), shuffling on the word key.
3 fixed iterations; the rank relation is repartitioned once and the
per-iteration join reuses that partitioning.  Overflow headroom: rank
<= 1e12, p <= 1e6, so rank * p <= 1e18 < 2^63.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table, spread
from .registry import cache_scoped, register

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_PR_MASS = 10**12  # total rank mass, integer micro-units
_PR_PSCALE = 10**6  # edge-probability quantization
_PR_TOPK = 20
_PR_ITERS = 3


def _pr_iter_sql(prev: str, out: str) -> str:
    """One damped propagation step: r'(v) = (15*A + 85*S(v)) DIV 100,
    S(v) = sum over in-edges of (r(u) * p) DIV 1e6."""
    return f"""
    {out}_s AS (
      SELECT e.w2 AS node,
             SUM((r.rank * e.p) // {_PR_PSCALE}) AS s
      FROM edges e JOIN {prev} r ON e.w1 = r.node
      GROUP BY e.w2
    ),
    {out} AS (
      SELECT n.node,
             CAST((15 * n.a + 85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank,
             n.a
      FROM nodes n LEFT JOIN {out}_s s ON n.node = s.node
    )"""


@register(
    "pagerank_word_centrality",
    f"""
    WITH d AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS l
      FROM documents WHERE trim(text) <> ''
    ),
    bg AS (
      SELECT l[pos] AS w1, l[pos + 1] AS w2
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS pos) t
    ),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
    tot AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS w1tot FROM c12 GROUP BY w1),
    edges AS (
      SELECT c12.w1, c12.w2,
             CAST((c12.c * {_PR_PSCALE}) // tot.w1tot AS BIGINT) AS p
      FROM c12 JOIN tot ON c12.w1 = tot.w1
    ),
    allnodes AS (
      SELECT w1 AS node FROM c12 UNION SELECT w2 AS node FROM c12
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM allnodes),
    nodes AS (
      SELECT node, CAST({_PR_MASS} // nn.n AS BIGINT) AS a
      FROM allnodes CROSS JOIN nn
    ),
    r0 AS (SELECT node, a AS rank, a FROM nodes),
    {_pr_iter_sql('r0', 'r1')},
    {_pr_iter_sql('r1', 'r2')},
    {_pr_iter_sql('r2', 'r3')}
    SELECT node AS word, rank
    FROM r3 ORDER BY rank DESC, node LIMIT {_PR_TOPK}
    """,
)
def pagerank_word_centrality(spark, sf_dir):
    """Top-20 words by damped PageRank (d=0.85, 3 iterations) over the
    bigram transition graph; rank in integer micro-units of 1e12 total
    mass."""
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    docs = d.filter(F.trim("text") != "").select(F.split(norm, " ").alias("ws"))
    bg_arr = F.expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),"
        " (a, b) -> struct(a AS w1, b AS w2))"
    )
    exploded = docs.select(bg_arr.alias("bg")).select(F.explode("bg").alias("g"))
    c12 = cache_scoped(
        exploded.select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = c12.groupBy("w1").agg(F.sum("c").cast("long").alias("w1tot"))
    edges = cache_scoped(
        c12.join(tot, "w1").select(
            "w1", "w2", F.expr(f"(c * {_PR_PSCALE}) DIV w1tot").alias("p")
        )
    )
    allnodes = (
        c12.select(F.col("w1").alias("node"))
        .union(c12.select(F.col("w2").alias("node")))
        .distinct()
    )
    nn = allnodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    nodes = cache_scoped(
        allnodes.crossJoin(F.broadcast(nn)).select(
            "node", F.expr(f"CAST({_PR_MASS} DIV n AS BIGINT)").alias("a")
        )
    )
    ranks = nodes.select("node", F.col("a").alias("rank"), "a")
    for _ in range(_PR_ITERS):
        s = (
            edges.join(ranks.select(F.col("node").alias("w1"), "rank"), "w1")
            .select("w2", F.expr(f"(rank * p) DIV {_PR_PSCALE}").alias("contrib"))
            .groupBy(F.col("w2").alias("node"))
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = nodes.join(s, "node", "left").select(
            "node",
            F.expr("CAST((15 * a + 85 * COALESCE(s, 0)) DIV 100 AS BIGINT)").alias(
                "rank"
            ),
            "a",
        )
    return (
        ranks.select(F.col("node").alias("word"), "rank")
        .orderBy(F.desc("rank"), "word")
        .limit(_PR_TOPK)
    )


# --------------------------------------------------------------------------
# BFS k-hop frontier expansion over the (undirected) word co-occurrence
# graph — the reachability primitive under the CC / PageRank / triangle
# family.  The seed is the highest-degree word (ties broken
# lexicographically); each hop is one node-keyed join + anti-join against
# the visited set, so per-hop cost is frontier-degree-bounded and no
# relation ever exceeds vocabulary size past the single corpus shuffle
# that builds the edge list.  3 hops (small-world word graphs saturate
# fast); output is the per-hop frontier histogram.
# --------------------------------------------------------------------------
_BFS_HOPS = 3


@register(
    "bfs_khop_word_graph",
    f"""
    WITH d AS (
      SELECT string_split({_NORM_SQL}, ' ') AS l
      FROM documents WHERE trim(text) <> ''
    ),
    bg AS (
      SELECT DISTINCT l[pos] AS w1, l[pos + 1] AS w2
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS pos) t
      WHERE l[pos] <> l[pos + 1]
    ),
    edges AS (SELECT w1 AS a, w2 AS b FROM bg UNION SELECT w2, w1 FROM bg),
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY a),
    l0 AS (SELECT a AS node FROM deg ORDER BY deg DESC, a LIMIT 1),
    l1 AS (
      SELECT DISTINCT e.b AS node FROM edges e JOIN l0 ON e.a = l0.node
      WHERE e.b NOT IN (SELECT node FROM l0)
    ),
    l2 AS (
      SELECT DISTINCT e.b AS node FROM edges e JOIN l1 ON e.a = l1.node
      WHERE e.b NOT IN (SELECT node FROM l0)
        AND e.b NOT IN (SELECT node FROM l1)
    ),
    l3 AS (
      SELECT DISTINCT e.b AS node FROM edges e JOIN l2 ON e.a = l2.node
      WHERE e.b NOT IN (SELECT node FROM l0)
        AND e.b NOT IN (SELECT node FROM l1)
        AND e.b NOT IN (SELECT node FROM l2)
    )
    SELECT * FROM (
      SELECT 0 AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             MIN(node) AS min_word FROM l0
      UNION ALL
      SELECT 1, CAST(COUNT(*) AS BIGINT), MIN(node) FROM l1
      UNION ALL
      SELECT 2, CAST(COUNT(*) AS BIGINT), MIN(node) FROM l2
      UNION ALL
      SELECT 3, CAST(COUNT(*) AS BIGINT), MIN(node) FROM l3
    ) t
    """,
)
def bfs_khop_word_graph(spark, sf_dir):
    """3-hop BFS frontier histogram from the highest-degree word over the
    undirected distinct-bigram graph: per hop, frontier size and its
    lexicographically smallest member."""
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    docs = d.filter(F.trim("text") != "").select(F.split(norm, " ").alias("ws"))
    bg_arr = F.expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),"
        " (a, b) -> struct(a AS w1, b AS w2))"
    )
    bg = (
        docs.select(bg_arr.alias("bg"))
        .select(F.explode("bg").alias("g"))
        .select("g.w1", "g.w2")
        .filter(F.col("w1") != F.col("w2"))
        .distinct()
    )
    edges = cache_scoped(
        bg.select(F.col("w1").alias("a"), F.col("w2").alias("b")).union(
            bg.select(F.col("w2").alias("a"), F.col("w1").alias("b"))
        ).distinct()
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    seed = deg.orderBy(F.desc("deg"), F.asc("a")).limit(1).select(
        F.col("a").alias("node")
    )
    frontiers = [cache_scoped(seed)]
    for _ in range(_BFS_HOPS):
        prev = frontiers[-1]
        nxt = (
            edges.join(prev.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"))
            .distinct()
        )
        for seen in frontiers:
            nxt = nxt.join(seen, "node", "left_anti")
        frontiers.append(cache_scoped(nxt))
    parts = [
        f.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").alias("min_word"),
        ).select(
            F.lit(i).cast("int").alias("hop"), "n_nodes", "min_word"
        )
        for i, f in enumerate(frontiers)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
